"""Policy distillation (Rusu et al. 2015) — capability parity with
reference ``nnx_ppo/algorithms/distillation.py``.

1. Roll out the env with **student** actions; run the frozen teacher
   alongside on the same observations.
2. The teacher runs in eval (deterministic) mode, so its emitted
   ``rollout_extras`` holds the teacher action *mean* at every sampler
   position.
3. Train the student to minimise the NLL of the teacher mean under the
   student's distribution, by feeding the **teacher's** rollout_extras
   into the student's loss replay (≡ minimising KL(teacher‖student) up
   to H(teacher)).

Constraint (as in the reference, ``distillation.py:23-27``): teacher
and student must have isomorphic carry-state / rollout_extras trees.

TPU notes: identical program structure to ``ppo_step`` — one donated
jit program, ``lax.scan`` hot loops, optional data-parallel mesh with
shard-local minibatch permutations.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nnx_ppo_tpu.algorithms import rollout
from nnx_ppo_tpu.algorithms.config import (
    DistillationConfig,
    DistillationTrainConfig,
    DistillationTrainResult,
    VideoData,
)
from nnx_ppo_tpu.algorithms.metrics import _log_metric
from nnx_ppo_tpu.algorithms.ppo import _should_run, _to_host, make_optimizer
from nnx_ppo_tpu.algorithms.types import (
    DistillationState,
    DistillationTransition,
    LoggingLevel,
    RLEnv,
)
from nnx_ppo_tpu.algorithms.ppo import (
    _downcast_float_leaves,
    resolve_batch_major,
    resolve_store_dtype,
)
from nnx_ppo_tpu.core.struct import (
    combine,
    partition_params,
    pytree_dataclass,
    static_field,
    tree_where,
)
from nnx_ppo_tpu.networks.types import (
    ModuleState,
    StatefulModule,
    replay_sequence_nd,
)
from nnx_ppo_tpu.parallel.mesh import (
    constrain_batch,
    constrain_time_batch,
)
from nnx_ppo_tpu.parallel.permutation import minibatch_plan


def default_distillation_config() -> DistillationTrainConfig:
    return DistillationTrainConfig()


def distillation_single_transition(
    env: RLEnv,
    teacher: StatefulModule,
    student: StatefulModule,
    carry: tuple[ModuleState, ModuleState, Any],
    rng_keys_for_env_reset: jax.Array,
) -> tuple[tuple[ModuleState, ModuleState, Any], DistillationTransition]:
    """One batched step: student acts, teacher observes; both extras are
    recorded; both carries auto-reset on done (reference
    ``distillation.py:67-117``)."""
    student_state, teacher_state, env_state = carry

    student_out = student(student_state, env_state.obs)
    teacher_out = teacher(teacher_state, env_state.obs)

    next_env_state = jax.vmap(env.step)(env_state, student_out.output.actions)
    transition = DistillationTransition(
        obs=env_state.obs,
        student_output=student_out.output,
        rewards=next_env_state.reward,
        done=next_env_state.done.astype(bool),
        truncated=next_env_state.info.get(
            "truncated", jnp.zeros(next_env_state.done.shape, bool)
        ).astype(bool),
        next_obs=next_env_state.obs,
        metrics={"env": next_env_state.metrics, "student": student_out.metrics},
        student_rollout_extras=student_out.rollout_extras,
        teacher_rollout_extras=teacher_out.rollout_extras,
    )

    done = transition.done
    reset_env_states = jax.vmap(env.reset)(rng_keys_for_env_reset)
    next_env_state = tree_where(done, reset_env_states, next_env_state)

    next_student_state = tree_where(
        done, student.reset_state(student_out.next_state), student_out.next_state
    )
    next_teacher_state = tree_where(
        done, teacher.reset_state(teacher_out.next_state), teacher_out.next_state
    )
    return (next_student_state, next_teacher_state, next_env_state), transition


def distillation_unroll_env(
    env: RLEnv,
    env_state: Any,
    teacher: StatefulModule,
    student: StatefulModule,
    student_state: ModuleState,
    teacher_state: ModuleState,
    unroll_length: int,
    rng_key_for_env_reset: jax.Array,
):
    """Scan :func:`distillation_single_transition` over T steps."""
    batch_size = env_state.done.shape[0]
    rng_keys = jax.random.split(rng_key_for_env_reset, (unroll_length, batch_size))
    step = functools.partial(distillation_single_transition, env, teacher, student)
    (
        (final_student_state, final_teacher_state, final_env_state),
        rollout_data,
    ) = jax.lax.scan(step, (student_state, teacher_state, env_state), rng_keys)
    return final_student_state, final_teacher_state, final_env_state, rollout_data


@pytree_dataclass
class DistillationMinibatch:
    """Exactly the rollout-buffer slices the distillation loss consumes
    (obs + done + the teacher's extras) — the per-minibatch gathers skip
    the student outputs / rewards / next_obs / metrics entirely. Same
    layout contract as ``ppo.ReplayMinibatch``: sequence leaves are
    ``[T, B, ...]``, or ``[B, T, ...]`` when ``batch_major`` (gather
    rows feed the ND replay forward directly)."""

    obs: Any
    done: jax.Array  # [T, B] time-major; [B, T] batch-major
    teacher_rollout_extras: Any
    batch_major: bool = static_field(default=False)

    @classmethod
    def from_rollout(
        cls,
        rollout_data: DistillationTransition,
        batch_major: bool = False,
        store_dtype=None,
    ) -> "DistillationMinibatch":
        obs = rollout_data.obs
        if store_dtype is not None:
            # Downcast only the obs leaves (see
            # PPOConfig.replay_store_dtype); the teacher's extras stay
            # exact so the NLL target is unchanged.
            obs = _downcast_float_leaves(obs, store_dtype)
        seq = (
            obs,
            rollout_data.done,
            rollout_data.teacher_rollout_extras,
        )
        if batch_major:
            seq = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), seq)
        return cls(*seq, batch_major=batch_major)

    def constrain(self, mesh) -> "DistillationMinibatch":
        seq_constrain = constrain_batch if self.batch_major else constrain_time_batch
        return dataclasses.replace(
            self,
            obs=seq_constrain(self.obs, mesh),
            done=seq_constrain(self.done, mesh),
            teacher_rollout_extras=seq_constrain(self.teacher_rollout_extras, mesh),
        )

    def gather(self, sel, take_seq, take_batch):
        del take_batch  # no per-env leaves in this view
        return dataclasses.replace(
            self,
            obs=jax.tree.map(lambda x: take_seq(x, sel), self.obs),
            done=take_seq(self.done, sel),
            teacher_rollout_extras=jax.tree.map(
                lambda x: take_seq(x, sel), self.teacher_rollout_extras
            ),
        )


def distillation_loss(
    student_params: Any,
    student_rest: Any,
    student_state: ModuleState,
    rollout_data: Any,  # DistillationTransition stack or DistillationMinibatch
    logging_level: LoggingLevel,
    fused_replay: bool = False,
) -> tuple[jax.Array, dict[str, Any]]:
    """NLL of the teacher mean under the student's distribution: replay
    the student feeding the TEACHER's rollout_extras
    (reference ``distillation.py:160-233``).

    ``fused_replay`` runs the replay layer-wise over time
    (``StatefulModule.replay_sequence`` — see ``ppo.ppo_loss``); a
    batch-major :class:`DistillationMinibatch` runs it as one ND-batched
    ``[B, T]`` forward (:func:`replay_sequence_nd`)."""
    student = combine(student_params, student_rest)
    if isinstance(rollout_data, DistillationTransition):
        rollout_data = DistillationMinibatch.from_rollout(rollout_data)
    view = jax.lax.stop_gradient(rollout_data)

    if view.batch_major:
        output_seq, scanned_reg_loss, _ = replay_sequence_nd(
            student, student_state, view.obs, view.done.shape[1],
            view.teacher_rollout_extras,
        )
        loglikelihoods = output_seq.loglikelihoods
    elif fused_replay:
        output_seq, scanned_reg_loss, _ = student.replay_sequence(
            student_state,
            view.obs,
            view.done,
            view.teacher_rollout_extras,
        )
        loglikelihoods = output_seq.loglikelihoods
    else:

        def step_network(net_state, xs):
            obs, done, teacher_extras = xs
            out = student(net_state, obs, teacher_extras)
            new_state = tree_where(
                done, student.reset_state(out.next_state), out.next_state
            )
            return new_state, (out.output.loglikelihoods, out.regularization_loss)

        _, (loglikelihoods, scanned_reg_loss) = jax.lax.scan(
            step_network,
            student_state,
            (view.obs, view.done, view.teacher_rollout_extras),
        )

    per_head_nll = jax.tree.map(lambda ll: -jnp.mean(ll), loglikelihoods)
    nll_loss = functools.reduce(jnp.add, jax.tree.leaves(per_head_nll))

    # Student regularization (entropy, AR1, ...) is preserved; the
    # teacher's is intentionally ignored.
    regularization_losses = jax.tree.map(jnp.mean, scanned_reg_loss)
    regularization_loss = functools.reduce(
        jnp.add, jax.tree.leaves(regularization_losses), jnp.array(0.0)
    )
    total_loss = nll_loss + regularization_loss

    loss_metrics: dict[str, Any] = {}
    if LoggingLevel.LOSSES in logging_level:
        loss_metrics["losses/distillation_nll"] = nll_loss
        loss_metrics["losses/regularization"] = regularization_loss
    return total_loss, loss_metrics


def distillation_step(
    env: RLEnv,
    teacher: StatefulModule,
    distillation_state: DistillationState,
    config: DistillationConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> tuple[DistillationState, dict[str, Any]]:
    """One distillation iteration as a single XLA program (reference
    ``distillation.py:236-360``): dual rollout → E·M update scan →
    student stat fold → deferred state commit."""
    n_envs = config.n_envs
    logging_level = config.logging_level
    n_shards = 1 if mesh is None else mesh.shape["data"]

    reset_key, new_key = jax.random.split(distillation_state.rng_key)
    (
        next_student_state,
        next_teacher_state,
        next_env_state,
        rollout_data,
    ) = distillation_unroll_env(
        env,
        distillation_state.env_states,
        teacher,
        distillation_state.student,
        distillation_state.student_states,
        distillation_state.teacher_states,
        config.rollout_length,
        reset_key,
    )
    rollout_data = constrain_time_batch(rollout_data, mesh)

    params, student_rest = partition_params(distillation_state.student)
    grad_fn = jax.grad(distillation_loss, has_aux=True)
    # Slim per-minibatch view + extraction plan shared with ppo_step
    # (parallel/permutation.minibatch_plan); same measured trade-offs
    # as PPOConfig.shuffle_minibatches / rollout_layout.
    batch_major = resolve_batch_major(config, distillation_state.student)
    replay_view = DistillationMinibatch.from_rollout(
        rollout_data, batch_major, store_dtype=resolve_store_dtype(config)
    )
    replay_view = replay_view.constrain(mesh)
    selectors, take_seq, take_batch = minibatch_plan(
        n_envs,
        config.n_epochs,
        config.n_minibatches,
        n_shards,
        shuffle=config.shuffle_minibatches,
        key=new_key,
        batch_major=batch_major,
    )
    def update_step(carry, sel):
        params, opt_state = carry
        minibatch_data = replay_view.gather(sel, take_seq, take_batch)
        minibatch_data = minibatch_data.constrain(mesh)
        student_state_subset = jax.tree.map(
            lambda x: take_batch(x, sel), distillation_state.student_states
        )
        student_state_subset = constrain_batch(student_state_subset, mesh)
        grads, loss_metrics = grad_fn(
            params,
            student_rest,
            student_state_subset,
            minibatch_data,
            logging_level,
            fused_replay=config.fused_replay,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss_metrics

    (params, opt_state), loss_metrics = jax.lax.scan(
        update_step, (params, distillation_state.opt_state), selectors
    )
    student = combine(params, student_rest)

    total_steps = distillation_state.steps_taken + config.rollout_length * n_envs
    # Fold the student's own rollout extras into its running stats.
    student = student.update_statistics(rollout_data.student_rollout_extras)

    metrics: dict[str, Any] = {}
    for k, v in loss_metrics.items():
        _log_metric(metrics, k, v, config.logging_percentiles)
    if LoggingLevel.TRAIN_ROLLOUT_STATS in logging_level:
        _log_metric(
            metrics, "rollout_batch/reward", rollout_data.rewards,
            config.logging_percentiles,
        )
        _log_metric(
            metrics, "rollout_batch/action", rollout_data.student_output.actions,
            config.logging_percentiles,
        )
        metrics["rollout_batch/done_rate"] = rollout_data.done.mean()
        metrics["rollout_batch/truncation_rate"] = rollout_data.truncated.mean()
    if LoggingLevel.TRAINING_ENV_METRICS in logging_level:
        for k, v in rollout_data.metrics.items():
            _log_metric(metrics, k, v, config.logging_percentiles)
    metrics["total_steps"] = total_steps

    distillation_state = distillation_state.replace(
        student=student,
        opt_state=opt_state,
        student_states=next_student_state,
        teacher_states=next_teacher_state,
        env_states=next_env_state,
        rng_key=new_key,
        steps_taken=total_steps,
    )
    return distillation_state, metrics


def distillation_multi_step(
    env: RLEnv,
    teacher: StatefulModule,
    distillation_state: DistillationState,
    config: DistillationConfig,
    optimizer: optax.GradientTransformation,
    n_steps: int,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> tuple[DistillationState, dict[str, Any]]:
    """``n_steps`` distillation iterations fused into ONE XLA program
    (the dispatch-amortizing analogue of ``ppo.ppo_multi_step``).
    Returns the last iteration's metrics."""

    def body(state, _):
        state, metrics = distillation_step(
            env, teacher, state, config, optimizer, mesh
        )
        return state, metrics

    distillation_state, metrics_seq = jax.lax.scan(
        body, distillation_state, None, length=n_steps
    )
    return distillation_state, jax.tree.map(lambda m: m[-1], metrics_seq)


def new_distillation_state(
    env: RLEnv,
    teacher: StatefulModule,
    student: StatefulModule,
    n_envs: int,
    seed: int,
    learning_rate: float = 1e-4,
    gradient_clipping: Optional[float] = None,
    weight_decay: Optional[float] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> DistillationState:
    """Fresh DistillationState; the optimizer covers only the student's
    trainable params (reference ``distillation.py:363-419``)."""
    key = jax.random.key(seed)
    key, training_key = jax.random.split(key)

    env_init_keys = jax.random.split(key, n_envs)
    env_states = jax.jit(jax.vmap(env.reset))(env_init_keys)
    student_states = student.initialize_state(n_envs)
    teacher_states = teacher.initialize_state(n_envs)

    optimizer = make_optimizer(learning_rate, gradient_clipping, weight_decay)
    params, _ = partition_params(student)
    opt_state = optimizer.init(params)

    state = DistillationState(
        student=student,
        student_states=student_states,
        teacher_states=teacher_states,
        env_states=env_states,
        opt_state=opt_state,
        rng_key=training_key,
        steps_taken=jnp.array(0.0),
    )
    if mesh is not None:
        from nnx_ppo_tpu.parallel.mesh import place_batched, place_replicated

        state = DistillationState(
            student=place_replicated(state.student, mesh),
            student_states=place_batched(state.student_states, mesh),
            teacher_states=place_batched(state.teacher_states, mesh),
            env_states=place_batched(state.env_states, mesh),
            opt_state=place_replicated(state.opt_state, mesh),
            rng_key=place_replicated(state.rng_key, mesh),
            steps_taken=place_replicated(state.steps_taken, mesh),
        )
    return state


def train_distillation(
    env: RLEnv,
    teacher: StatefulModule,
    student: StatefulModule,
    config: Optional[DistillationTrainConfig] = None,
    *,
    total_steps: Optional[int] = None,
    seed: Optional[int] = None,
    log_fn: Optional[Callable[[dict[str, Any], int], None]] = None,
    video_fn: Optional[Callable[[VideoData], None]] = None,
    checkpoint_fn: Optional[Callable[[DistillationState, int], None]] = None,
    eval_env: Optional[RLEnv] = None,
    initial_state: Optional[DistillationState] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> DistillationTrainResult:
    """Train a student by distillation from a frozen teacher (reference
    ``distillation.py:422-603``)."""
    if config is None:
        config = default_distillation_config()
    if total_steps is not None:
        config = dataclasses.replace(
            config,
            distillation=dataclasses.replace(
                config.distillation, total_steps=total_steps
            ),
        )
    if seed is not None:
        config = dataclasses.replace(config, seed=seed)
    if eval_env is None:
        eval_env = env

    # Teacher runs deterministic so sampler extras == teacher mean.
    teacher = teacher.eval()

    if initial_state is None:
        distillation_state = new_distillation_state(
            env,
            teacher,
            student,
            config.distillation.n_envs,
            config.seed,
            config.distillation.learning_rate,
            config.distillation.gradient_clipping,
            config.distillation.weight_decay,
            mesh=mesh,
        )
    else:
        distillation_state = initial_state
    distillation_state = jax.tree.map(jnp.copy, distillation_state)

    optimizer = make_optimizer(
        config.distillation.learning_rate,
        config.distillation.gradient_clipping,
        config.distillation.weight_decay,
    )
    step_jit = jax.jit(
        functools.partial(
            distillation_step,
            env,
            teacher,
            config=config.distillation,
            optimizer=optimizer,
            mesh=mesh,
        ),
        donate_argnums=(0,),
    )
    eval_rollout_jit = jax.jit(
        functools.partial(
            rollout.eval_rollout,
            eval_env,
            n_envs=config.eval.n_envs,
            max_episode_length=config.eval.max_episode_length,
            logging_percentiles=config.eval.logging_percentiles,
        )
    )
    eval_render_jit = jax.jit(
        functools.partial(
            rollout.eval_rollout_for_render_scan,
            eval_env,
            max_episode_length=config.video.episode_length,
        )
    )

    eval_history: list[dict[str, Any]] = []
    last_eval_step = -config.eval.every_steps
    last_video_step = -config.video.every_steps
    last_checkpoint_step = -config.checkpoint_every_steps
    metrics: dict[str, Any] = {}
    n_iterations = 0

    def run_eval(student_module: StatefulModule) -> dict[str, Any]:
        eval_metrics = eval_rollout_jit(
            student_module.eval(), key=jax.random.key(config.seed)
        )
        return {
            k: _to_host(v)
            for k, v in dict(eval_metrics).items()
        }

    def run_video(student_module: StatefulModule, steps: int, iteration: int):
        if video_fn is None or not hasattr(eval_env, "render"):
            return
        render_key = jax.random.fold_in(jax.random.key(config.seed), iteration)
        stacked_states, final_state, episode_reward = eval_render_jit(
            student_module.eval(), key=render_key
        )
        trajectory = rollout.unstack_trajectory(
            stacked_states, final_state, config.video.episode_length
        )
        frames = getattr(eval_env, "render")(
            trajectory, **config.video.render_kwargs_dict
        )
        video_fn(
            VideoData(
                frames=np.stack(frames),
                step=steps,
                episode_reward=float(episode_reward),
                episode_length=config.video.episode_length,
            )
        )

    steps = int(distillation_state.steps_taken)
    if config.eval.enabled:
        eval_metrics = run_eval(distillation_state.student)
        metrics.update(eval_metrics)
        eval_history.append({"step": steps, **eval_metrics})
        last_eval_step = steps
    if config.video.enabled:
        run_video(distillation_state.student, steps, n_iterations)
        last_video_step = steps
    if checkpoint_fn is not None and _should_run(
        steps, last_checkpoint_step, config.checkpoint_every_steps
    ):
        checkpoint_fn(distillation_state, steps)
        last_checkpoint_step = steps
    if log_fn is not None and metrics:
        log_fn(metrics, steps)

    # Host-side step counting (no per-iteration device sync) with the
    # same bounded dispatch-ahead as train_ppo.
    from nnx_ppo_tpu.algorithms.ppo import BoundedDispatch

    steps_per_iter = config.distillation.n_envs * config.distillation.rollout_length
    initial_steps = steps
    dispatch = BoundedDispatch()
    while steps < config.distillation.total_steps:
        distillation_state, metrics = step_jit(distillation_state)
        dispatch.push(metrics)
        n_iterations += 1
        steps = initial_steps + n_iterations * steps_per_iter

        if config.eval.enabled and _should_run(
            steps, last_eval_step, config.eval.every_steps
        ):
            eval_metrics = run_eval(distillation_state.student)
            metrics.update(eval_metrics)
            eval_history.append({"step": steps, **eval_metrics})
            last_eval_step = steps
        if config.video.enabled and _should_run(
            steps, last_video_step, config.video.every_steps
        ):
            run_video(distillation_state.student, steps, n_iterations)
            last_video_step = steps
        if checkpoint_fn is not None and _should_run(
            steps, last_checkpoint_step, config.checkpoint_every_steps
        ):
            checkpoint_fn(distillation_state, steps)
            last_checkpoint_step = steps
        if log_fn is not None:
            log_fn(metrics, steps)

    return DistillationTrainResult(
        training_state=distillation_state,
        final_metrics=metrics,
        eval_history=eval_history,
        total_steps=int(distillation_state.steps_taken),
        total_iterations=n_iterations,
    )
