"""PPO: host training loop + one fused jitted train step.

Capability parity with reference ``nnx_ppo/algorithms/ppo.py``,
re-architected TPU-first:

* The train step is a single ``jax.jit`` program with the
  ``TrainingState`` **donated** (in-place buffer reuse on-chip) and all
  hyperparameters folded into one static ``PPOConfig``.
* All hot loops are ``lax.scan`` s: rollout over T, E·M gradient
  updates, replay over T inside the loss, reverse GAE (Pallas kernel on
  TPU, ``ops/gae.py``).
* Optional data-parallel mesh: env axis sharded on ``data``; gradients,
  normalizer statistics, and metrics reduce across chips via
  GSPMD-inserted all-reduces (see ``parallel/mesh.py``).
* Critical ordering invariant preserved from the reference
  (``ppo.py:338-346``): minibatches consume the *pre-rollout* carries;
  env/net state advance is committed only after all E·M updates.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nnx_ppo_tpu.algorithms import rollout
from nnx_ppo_tpu.algorithms.config import (
    PPOConfig,
    TrainConfig,
    TrainResult,
    VideoData,
)
from nnx_ppo_tpu.algorithms.metrics import compute_metrics, log_weight_stats
from nnx_ppo_tpu.algorithms.types import (
    LoggingLevel,
    RLEnv,
    TrainingState,
    Transition,
)
from nnx_ppo_tpu.core.struct import (
    combine,
    partition_params,
    pytree_dataclass,
    static_field,
    tree_where,
)
from nnx_ppo_tpu.networks.types import (
    StatefulModule,
    advance_state_keys,
    expand_state_over_time,
    replay_sequence_nd,
)
from nnx_ppo_tpu.ops.gae import gae  # re-exported; reference ppo.py:351
from nnx_ppo_tpu.parallel.mesh import (
    constrain_batch,
    constrain_time_batch,
    shard_training_state,
)
from nnx_ppo_tpu.parallel.permutation import minibatch_plan


class BoundedDispatch:
    """Bound host dispatch-ahead: track one fresh (non-donated) output
    leaf per iteration and block on the one from ``depth`` iterations
    ago. In steady state that work is long finished, so dispatch latency
    stays fully hidden while in-flight programs (and the buffers they
    pin) are bounded — an unbounded queue was observed to abort the
    runtime on the 8-device CPU mesh. Shared by train_ppo and
    train_distillation."""

    def __init__(self, depth: int = 16):
        self.depth = depth
        self._in_flight: collections.deque = collections.deque()

    def push(self, metrics: dict) -> None:
        leaves = jax.tree.leaves(metrics)
        if leaves:
            self._in_flight.append(leaves[0])
            if len(self._in_flight) > self.depth:
                jax.block_until_ready(self._in_flight.popleft())


def default_config() -> TrainConfig:
    """Return default training configuration."""
    return TrainConfig()


def _should_run(steps: int, last_step: int, every_steps: int) -> bool:
    """Check if a periodic action is due at this step count."""
    if every_steps <= 0:
        return False
    return (steps // every_steps) > (last_step // every_steps)


def make_optimizer(
    learning_rate: Any,  # float or optax schedule
    gradient_clipping: Optional[float] = None,
    weight_decay: Optional[float] = None,
    flatten: bool = False,
) -> optax.GradientTransformation:
    """The optax chain used by the trainer (reference ``ppo.py:555-569``):
    optional global-norm clipping + adam (or adamw when weight_decay).

    ``flatten=True`` wraps the chain in ``optax.flatten``: moment/param
    updates run on one concatenated vector instead of one kernel per
    param leaf. Measured device-time-neutral for small MLPs (the tiny
    adam kernels overlap other work); consider it for networks with
    hundreds of param leaves (e.g. large PopulationGraphs). Requires a
    non-empty param tree."""
    links = []
    if gradient_clipping is not None:
        links.append(optax.clip_by_global_norm(gradient_clipping))
    if weight_decay is None:
        links.append(optax.adam(learning_rate=learning_rate))
    elif isinstance(weight_decay, bool) and weight_decay:
        links.append(optax.adamw(learning_rate=learning_rate))
    else:
        links.append(
            optax.adamw(learning_rate=learning_rate, weight_decay=weight_decay)
        )
    opt = optax.chain(*links)
    return optax.flatten(opt) if flatten else opt


def new_training_state(
    env: RLEnv,
    networks: StatefulModule,
    n_envs: int,
    seed: int,
    learning_rate: float = 1e-4,
    gradient_clipping: Optional[float] = None,
    weight_decay: Optional[float] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> TrainingState:
    """Fresh TrainingState (reference ``ppo.py:534-572``): split seed,
    vmapped env reset over n_envs, per-env network carries, optax init.
    With a mesh, the state is placed sharded (env axis on ``data``).

    Pass ``optimizer`` explicitly when using a non-default optax chain —
    the ``opt_state`` initialized here must match the optimizer later
    given to ``ppo_step``."""
    key = jax.random.key(seed)
    key, training_key = jax.random.split(key)

    env_init_keys = jax.random.split(key, n_envs)
    env_states = jax.jit(jax.vmap(env.reset))(env_init_keys)
    network_states = networks.initialize_state(n_envs)

    if optimizer is None:
        optimizer = make_optimizer(learning_rate, gradient_clipping, weight_decay)
    params, _ = partition_params(networks)
    opt_state = optimizer.init(params)

    training_state = TrainingState(
        networks=networks,
        network_states=network_states,
        env_states=env_states,
        opt_state=opt_state,
        rng_key=training_key,
        steps_taken=jnp.array(0.0),
    )
    if mesh is not None:
        training_state = shard_training_state(training_state, mesh)
    return training_state


@pytree_dataclass
class ReplayMinibatch:
    """Exactly the rollout-buffer slices the PPO loss consumes.

    Built ONCE per iteration from the full ``Transition`` stack, then
    gathered per minibatch — so the E·M per-minibatch gathers move only
    loss-relevant bytes. Compared to gathering the raw ``Transition``
    (the round-≤4 layout), this drops the stored actions /
    value_estimates / env metrics AND the full ``next_obs`` history
    (the loss only ever reads ``next_obs[-1]``, for the T+1 value
    bootstrap — kept here as the per-env ``last_next_obs``): on the
    quadruped flagship that roughly halves per-minibatch gather
    traffic.

    ``batch_major`` (static) declares the layout:

    * False — sequence leaves keep the rollout scan's native
      ``[T, B, ...]`` stacking.
    * True (``PPOConfig.rollout_layout``) — every sequence leaf is
      stored ``[B, T, ...]`` (transposed once per iteration): the
      per-minibatch gather is a contiguous-row gather whose output
      feeds the ND-batched replay forward
      (:func:`replay_sequence_nd`) directly — no per-minibatch
      transpose and no flatten reshape (an explicit ``[B·T]`` flat
      layout was measured FAR slower: TPU gathers want few large rows,
      and the flatten reshape retiles).
    """

    obs: Any
    old_loglikelihoods: Any  # per-key tree; reference ppo.py:441
    rewards: Any
    done: jax.Array
    truncated: jax.Array
    rollout_extras: Any
    last_next_obs: Any  # [B, ...] — next_obs at t = T-1
    # Pre-advanced per-env carry for the T+1 bootstrap forward (flat
    # replay only): the T-long sequential key-split chain hoisted out
    # of the E·M minibatch losses (networks.types.advance_state_keys).
    bootstrap_net_state: Any = None
    batch_major: bool = static_field(default=False)

    @classmethod
    def from_rollout(
        cls,
        rollout_data: "Transition",
        batch_major: bool = False,
        store_dtype=None,
    ) -> "ReplayMinibatch":
        """Project a time-major ``[T, B, ...]`` Transition stack down to
        the loss's working set (transposing sequence leaves once when
        ``batch_major``). ``store_dtype`` (from
        :func:`resolve_store_dtype`) downcasts the float obs leaves —
        the view's dominant gather bytes — at store time; every other
        leaf (loglikelihoods, rewards, extras, flags) stays exact."""
        obs = rollout_data.obs
        last_next_obs = jax.tree.map(lambda x: x[-1], rollout_data.next_obs)
        if store_dtype is not None:
            obs = _downcast_float_leaves(obs, store_dtype)
            last_next_obs = _downcast_float_leaves(last_next_obs, store_dtype)
        seq = (
            obs,
            rollout_data.network_output.loglikelihoods,
            rollout_data.rollout_extras,
            rollout_data.rewards,
            rollout_data.done,
            rollout_data.truncated,
        )
        if batch_major:
            seq = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), seq)
        return cls(
            obs=seq[0],
            old_loglikelihoods=seq[1],
            rollout_extras=seq[2],
            rewards=seq[3],
            done=seq[4],
            truncated=seq[5],
            last_next_obs=last_next_obs,
            batch_major=batch_major,
        )

    def constrain(self, mesh) -> "ReplayMinibatch":
        """Pin the env axis of every leaf to the ``data`` mesh axis."""
        seq_constrain = constrain_batch if self.batch_major else constrain_time_batch
        return dataclasses.replace(
            self,
            obs=seq_constrain(self.obs, mesh),
            old_loglikelihoods=seq_constrain(self.old_loglikelihoods, mesh),
            rollout_extras=seq_constrain(self.rollout_extras, mesh),
            rewards=seq_constrain(self.rewards, mesh),
            done=seq_constrain(self.done, mesh),
            truncated=seq_constrain(self.truncated, mesh),
            last_next_obs=constrain_batch(self.last_next_obs, mesh),
            bootstrap_net_state=constrain_batch(self.bootstrap_net_state, mesh),
        )

    def gather(self, sel: jax.Array, take_seq, take_batch) -> "ReplayMinibatch":
        """Extract one minibatch (extractors from
        :func:`nnx_ppo_tpu.parallel.permutation.minibatch_plan`)."""
        return dataclasses.replace(
            self,
            obs=jax.tree.map(lambda x: take_seq(x, sel), self.obs),
            old_loglikelihoods=jax.tree.map(
                lambda x: take_seq(x, sel), self.old_loglikelihoods
            ),
            rollout_extras=jax.tree.map(
                lambda x: take_seq(x, sel), self.rollout_extras
            ),
            rewards=jax.tree.map(lambda x: take_seq(x, sel), self.rewards),
            done=take_seq(self.done, sel),
            truncated=take_seq(self.truncated, sel),
            last_next_obs=jax.tree.map(
                lambda x: take_batch(x, sel), self.last_next_obs
            ),
            bootstrap_net_state=jax.tree.map(
                lambda x: take_batch(x, sel), self.bootstrap_net_state
            ),
        )


def _downcast_float_leaves(tree: Any, dtype) -> Any:
    """Cast inexact-dtype leaves to ``dtype``; integers/bools pass
    through untouched (obs trees may carry discrete fields)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
        else x,
        tree,
    )


def resolve_store_dtype(config: Any):
    """Resolve ``replay_store_dtype`` (PPOConfig or DistillationConfig)
    to a dtype for :meth:`ReplayMinibatch.from_rollout`, or None for
    the exact float32 default."""
    name = config.replay_store_dtype
    if name == "float32":
        return None
    if name == "bfloat16":
        return jnp.bfloat16
    raise ValueError(
        f"unknown replay_store_dtype {name!r}; expected 'float32' or "
        "'bfloat16'"
    )


def resolve_batch_major(config: Any, networks: StatefulModule) -> bool:
    """Resolve ``rollout_layout`` against the network (``config`` is any
    config exposing ``rollout_layout``/``fused_replay`` —
    PPOConfig or DistillationConfig).

    Batch-major needs the whole-network flat replay
    (:func:`replay_sequence_nd`), which requires ``fused_replay`` and
    a fully replay-time-static network; ``auto`` picks it exactly then.
    """
    layout = config.rollout_layout
    if layout == "time_major":
        return False
    static = config.fused_replay and networks.replay_time_static
    if layout == "batch_major":
        if not static:
            raise ValueError(
                "rollout_layout='batch_major' requires fused_replay=True "
                "and a fully replay-time-static network (recurrent "
                "modules need the time-major scan replay); use "
                "'time_major' or 'auto'."
            )
        return True
    if layout != "auto":
        raise ValueError(f"unknown rollout_layout {layout!r}")
    return static


def ppo_step(
    env: RLEnv,
    training_state: TrainingState,
    config: PPOConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> tuple[TrainingState, dict[str, Any]]:
    """One PPO iteration as a single XLA program (reference
    ``ppo.py:254-348``): rollout → precompute all epoch×minibatch
    permutations → scan over E·M gradient updates → metrics →
    ``update_statistics`` → commit next env/net states.

    ``env``, ``config``, ``optimizer``, and ``mesh`` are static.
    """
    n_envs = config.n_envs
    logging_level = config.logging_level
    n_shards = 1 if mesh is None else mesh.shape["data"]

    # Three independent streams: env resets, minibatch permutations, and
    # the next iteration's base key (fold_in and split on the SAME key
    # draw from overlapping counter spaces — documented-unsafe dual use).
    reset_key, perm_key, new_key = jax.random.split(training_state.rng_key, 3)
    next_net_state, next_env_state, rollout_data = rollout.unroll_env(
        env,
        training_state.env_states,
        training_state.networks,
        training_state.network_states,
        config.rollout_length,
        reset_key,
    )
    rollout_data = constrain_time_batch(rollout_data, mesh)

    params, net_rest = partition_params(training_state.networks)
    grad_fn = jax.grad(ppo_loss, has_aux=True)

    # Project the rollout stack down to the loss's working set once per
    # iteration (optionally transposed to batch-major — see
    # ReplayMinibatch), then extract E·M minibatches from the view. With
    # shuffle, the per-minibatch gather is the FUSED form of shuffled
    # minibatching (an explicit permute-per-epoch + slice variant
    # measured SLOWER: the materialized permuted buffer costs more than
    # the gathers it saves).
    batch_major = resolve_batch_major(config, training_state.networks)
    replay_view = ReplayMinibatch.from_rollout(
        rollout_data, batch_major, store_dtype=resolve_store_dtype(config)
    )
    if batch_major:
        # Hoist the T+1-bootstrap key advance (T sequential splits) out
        # of the E·M minibatch losses; gather commutes with the per-env
        # advance, so the minibatch rows are exact.
        replay_view = dataclasses.replace(
            replay_view,
            bootstrap_net_state=advance_state_keys(
                training_state.network_states, config.rollout_length
            ),
        )
    replay_view = replay_view.constrain(mesh)
    selectors, take_seq, take_batch = minibatch_plan(
        n_envs,
        config.n_epochs,
        config.n_minibatches,
        n_shards,
        shuffle=config.shuffle_minibatches,
        key=perm_key,
        batch_major=batch_major,
    )
    def update_step(carry, sel):
        params, opt_state = carry
        minibatch_data = replay_view.gather(sel, take_seq, take_batch)
        minibatch_data = minibatch_data.constrain(mesh)
        net_state_subset = jax.tree.map(
            lambda x: take_batch(x, sel), training_state.network_states
        )
        net_state_subset = constrain_batch(net_state_subset, mesh)
        grads, loss_metrics = grad_fn(
            params,
            net_rest,
            net_state_subset,
            minibatch_data,
            clip_range=config.clip_range,
            normalize_advantages=config.normalize_advantages,
            combine_advantages=config.combine_advantages,
            discounting_factor=config.discounting_factor,
            gae_lambda=config.gae_lambda,
            critic_loss_weight=config.critic_loss_weight,
            logging_level=logging_level,
            fused_replay=config.fused_replay,
            single_device=mesh is None,
        )
        if LoggingLevel.GRAD_NORM in logging_level:
            loss_metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss_metrics

    (params, opt_state), loss_metrics = jax.lax.scan(
        update_step, (params, training_state.opt_state), selectors
    )
    networks = combine(params, net_rest)

    total_steps = training_state.steps_taken + config.rollout_length * n_envs
    metrics = compute_metrics(
        loss_metrics, rollout_data, logging_level, config.logging_percentiles
    )
    metrics["total_steps"] = total_steps
    if LoggingLevel.WEIGHTS in logging_level:
        log_weight_stats(metrics, networks, config.logging_percentiles)

    # Fold rollout statistics (Normalizer Welford etc.) after the updates.
    networks = networks.update_statistics(rollout_data.rollout_extras)

    # Commit env/net state advance only now — minibatches above consumed
    # the pre-rollout carries (reference invariant, ppo.py:338-346).
    training_state = training_state.replace(
        networks=networks,
        opt_state=opt_state,
        network_states=next_net_state,
        env_states=next_env_state,
        rng_key=new_key,
        steps_taken=total_steps,
    )
    return training_state, metrics


# Backward-compatible alias; the implementation lives next to the
# protocol (networks/types.py).
_expand_state_over_time = expand_state_over_time


def ppo_multi_step(
    env: RLEnv,
    training_state: TrainingState,
    config: PPOConfig,
    optimizer: optax.GradientTransformation,
    n_steps: int,
    mesh: Optional[jax.sharding.Mesh] = None,
    return_history: bool = False,
) -> tuple[TrainingState, dict[str, Any]]:
    """``n_steps`` PPO iterations fused into ONE XLA program.

    Host dispatch costs ~1 ms per program on remote/tunneled TPU
    runtimes; at sub-ms device step times that dominates. Scanning the
    train step amortizes it ``n_steps``× (the TPU-native analogue of the
    reference's dispatch-ahead host loop).

    ``return_history=True`` returns the full per-iteration metric stack
    (every leaf ``[n_steps, ...]``) — a device-side metrics ring buffer
    fetched once per call, so train-metric curve density is independent
    of ``steps_per_call`` (one scalar per iteration per metric; the
    payload is tiny next to the rollout buffers). Default returns only
    the last iteration's metrics."""

    def body(ts, _):
        ts, metrics = ppo_step(env, ts, config, optimizer, mesh)
        return ts, metrics

    # One scanned body (ppo_step is traced/compiled once).
    training_state, metrics_seq = jax.lax.scan(
        body, training_state, None, length=n_steps
    )
    if return_history:
        return training_state, metrics_seq
    return training_state, jax.tree.map(lambda m: m[-1], metrics_seq)


def ppo_loss(
    params: Any,
    net_rest: Any,
    network_state: Any,
    rollout_data: Any,  # Transition stack or ReplayMinibatch view
    clip_range: float,
    normalize_advantages: bool,
    combine_advantages: bool,
    discounting_factor: float,
    gae_lambda: float,
    critic_loss_weight: float,
    logging_level: LoggingLevel,
    fused_replay: bool = False,
    single_device: bool = True,
) -> tuple[jax.Array, dict[str, Any]]:
    """Clipped-surrogate PPO loss with replay (reference
    ``ppo.py:397-531``): re-run the network over [T] feeding stored
    ``rollout_extras``; reset carries per-env on ``done`` inside the
    scan; bootstrap the T+1 value with ``rollout_extras=None``; per-
    reward-key GAE; optional team-summed advantages; advantage
    normalization; 0.5·MSE critic; module regularization losses.

    When ``fused_replay`` is set, the replay runs **layer-wise over
    time** (``StatefulModule.replay_sequence``): replay-time-static
    layers batch over ``[T·B]`` on the MXU (all stochastic draws are
    snapshotted in the stored extras), recurrent layers scan only their
    own core with input projections hoisted out of the loop. Losses are
    identical to the step-wise scan up to float reduction order.

    ``rollout_data`` may be a full time-major ``Transition`` stack or a
    :class:`ReplayMinibatch` view (the form ``ppo_step`` passes). A
    batch-major view runs the replay as one ND-batched ``[B, T]``
    forward (:func:`replay_sequence_nd`); every reduction below is
    layout-free, and GAE transposes only the tiny per-key ``[B, T]``
    reward/value/flag arrays."""
    networks = combine(params, net_rest)
    if isinstance(rollout_data, Transition):
        rollout_data = ReplayMinibatch.from_rollout(rollout_data)
    view = jax.lax.stop_gradient(rollout_data)
    batch_major = view.batch_major

    if batch_major:
        T = view.done.shape[1]
        network_output, scanned_reg_loss, final_net_state = replay_sequence_nd(
            networks,
            network_state,
            view.obs,
            T,
            view.rollout_extras,
            final_state=view.bootstrap_net_state,
        )
    elif fused_replay:
        network_output, scanned_reg_loss, final_net_state = (
            networks.replay_sequence(
                network_state,
                view.obs,
                view.done,
                view.rollout_extras,
            )
        )
    else:

        def step_network(net_state, xs):
            obs, done, extras = xs
            out = networks(net_state, obs, extras)
            reset_states = networks.reset_state(out.next_state)
            new_net_state = tree_where(done, reset_states, out.next_state)
            return new_net_state, (out.output, out.regularization_loss)

        final_net_state, (network_output, scanned_reg_loss) = jax.lax.scan(
            step_network,
            network_state,
            (view.obs, view.done, view.rollout_extras),
        )

    # T+1 bootstrap: rollout_extras=None → samplers take the fresh-sample
    # path (only value_estimates are consumed).
    out_last = networks(final_net_state, view.last_next_obs)
    network_output_last = out_last.output

    # Flat done/truncated are shared across all reward keys.
    done = view.done
    truncated = view.truncated
    if isinstance(done, jax.Array):
        done = jax.tree.map(lambda _: done, view.rewards)
        truncated = jax.tree.map(lambda _: truncated, view.rewards)

    gae_tm = functools.partial(
        gae,
        lambda_=gae_lambda,
        gamma=discounting_factor,
        allow_pallas=single_device,
    )
    gae_fn = gae_tm
    if batch_major:
        # GAE needs a leading time axis; the per-key reward/value/flag
        # arrays are tiny (~minibatch·T floats) next to the obs/extras
        # buffers the batch-major layout keeps transpose-free.
        def gae_fn(rew, val, val_last, d, tr):
            adv_tb = gae_tm(
                rew.swapaxes(0, 1),
                val.swapaxes(0, 1),
                val_last,
                d.swapaxes(0, 1),
                tr.swapaxes(0, 1),
            )
            return adv_tb.swapaxes(0, 1)
    advantages = jax.tree.map(
        gae_fn,
        view.rewards,
        network_output.value_estimates,
        network_output_last.value_estimates,
        done,
        truncated,
    )
    advantages = jax.lax.stop_gradient(advantages)
    target_values = jax.lax.stop_gradient(
        jax.tree.map(jnp.add, network_output.value_estimates, advantages)
    )

    if combine_advantages:
        summed_advantage = functools.reduce(jnp.add, jax.tree.leaves(advantages))
        if isinstance(network_output.loglikelihoods, jax.Array):
            advantages = summed_advantage
        else:
            # Broadcast the team-summed advantage to the loglikelihoods
            # tree (value heads may exist on modules without actions).
            advantages = jax.tree.map(
                lambda _: summed_advantage, network_output.loglikelihoods
            )

    if normalize_advantages:
        advantages = jax.tree.map(
            lambda a: (a - a.mean()) / (a.std() + 1e-8), advantages
        )

    def clipped_loss(new_loglikelihoods, old_loglikelihoods, advantages):
        # Saturate the log-ratio before exp: tanh-squashed policies can
        # reach |delta-ll| in the hundreds once actions saturate, and
        # exp overflow would NaN-poison params (grad-clipping cannot
        # save a NaN). Inactive in the normal ratio range (e^30 ~ 1e13).
        log_ratios = jnp.clip(
            new_loglikelihoods - old_loglikelihoods, -30.0, 30.0
        )
        likelihood_ratios = jnp.exp(log_ratios)
        loss_cand1 = likelihood_ratios * advantages
        loss_cand2 = (
            jnp.clip(likelihood_ratios, 1 - clip_range, 1 + clip_range) * advantages
        )
        return -jnp.mean(jnp.minimum(loss_cand1, loss_cand2))

    actor_losses = jax.tree.map(
        clipped_loss,
        network_output.loglikelihoods,
        view.old_loglikelihoods,
        advantages,
    )
    critic_losses = jax.tree.map(
        lambda v, t: 0.5 * jnp.mean((v - t) ** 2),
        network_output.value_estimates,
        target_values,
    )
    # Entropy bonuses enter via module regularization losses.
    regularization_losses = jax.tree.map(jnp.mean, scanned_reg_loss)

    actor_loss = functools.reduce(jnp.add, jax.tree.leaves(actor_losses))
    critic_loss = functools.reduce(jnp.add, jax.tree.leaves(critic_losses))
    regularization_loss = functools.reduce(
        jnp.add, jax.tree.leaves(regularization_losses), jnp.array(0.0)
    )

    loss_metrics: dict[str, Any] = {}
    if LoggingLevel.LOSSES in logging_level:
        loss_metrics["losses/actor"] = actor_losses
        loss_metrics["losses/critic"] = critic_losses
        loss_metrics["losses/regularization"] = regularization_losses
    if LoggingLevel.ACTOR_EXTRA in logging_level:
        loss_metrics["losses/clipping_fraction"] = jax.tree.map(
            lambda new_ll, old_ll: jnp.mean(
                jnp.abs(jnp.exp(new_ll - old_ll) - 1.0) > clip_range
            ),
            network_output.loglikelihoods,
            view.old_loglikelihoods,
        )
    if LoggingLevel.CRITIC_EXTRA in logging_level:
        loss_metrics["losses/advantages"] = advantages
        loss_metrics["losses/critic_R^2"] = jax.tree.map(
            lambda l, tv: 1.0 - 2 * l / (jnp.var(tv) + 1e-8),
            critic_losses,
            target_values,
        )
    total_loss = actor_loss + critic_loss_weight * critic_loss + regularization_loss
    return total_loss, loss_metrics


def train_ppo(
    env: RLEnv,
    networks: StatefulModule,
    config: Optional[TrainConfig] = None,
    *,
    total_steps: Optional[int] = None,
    seed: Optional[int] = None,
    log_fn: Optional[Callable[[dict[str, Any], int], None]] = None,
    video_fn: Optional[Callable[[VideoData], None]] = None,
    checkpoint_fn: Optional[Callable[[TrainingState, int], None]] = None,
    eval_env: Optional[RLEnv] = None,
    initial_state: Optional[TrainingState] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> TrainResult:
    """Train a PPO agent (reference ``ppo.py:41-251``).

    Args mirror the reference; ``mesh`` additionally enables multi-chip
    data parallelism (env axis sharded over ``mesh['data']``).

    Returns a TrainResult with the final TrainingState (a plain pytree —
    pass it back as ``initial_state`` to resume exactly).
    """
    if config is None:
        config = default_config()
    if total_steps is not None:
        config = dataclasses.replace(
            config, ppo=dataclasses.replace(config.ppo, total_steps=total_steps)
        )
    if seed is not None:
        config = dataclasses.replace(config, seed=seed)
    if eval_env is None:
        eval_env = env

    if optimizer is None:
        learning_rate: Any = config.ppo.learning_rate
        if config.ppo.anneal_lr:
            # One schedule step per minibatch update; decay linearly to
            # 0 over the whole run. ceil() so the lr never actually
            # reaches 0 mid-run when total_steps isn't a multiple of
            # the per-iteration step count.
            #
            # Resume semantics: the horizon assumes the schedule count
            # starts at 0 with training. Resuming with a
            # checkpoint-restored `initial_state` continues the decay
            # correctly (its opt_state carries the schedule count); a
            # hand-built initial_state with a fresh opt_state re-anneals
            # from the initial lr over the full horizon.
            steps_per_iter = config.ppo.n_envs * config.ppo.rollout_length
            n_iters = -(-config.ppo.total_steps // steps_per_iter)
            n_updates = n_iters * config.ppo.n_epochs * config.ppo.n_minibatches
            learning_rate = optax.linear_schedule(
                init_value=config.ppo.learning_rate,
                end_value=0.0,
                transition_steps=max(n_updates, 1),
            )
        optimizer = make_optimizer(
            learning_rate,
            config.ppo.gradient_clipping,
            config.ppo.weight_decay,
        )

    if initial_state is None:
        training_state = new_training_state(
            env,
            networks,
            config.ppo.n_envs,
            config.seed,
            mesh=mesh,
            optimizer=optimizer,
        )
    else:
        training_state = initial_state

    # The train step donates the TrainingState buffers (in-place reuse on
    # chip). Copy any caller-owned arrays (the user's network module, a
    # restored checkpoint) so donation never invalidates buffers the
    # caller still holds.
    training_state = jax.tree.map(jnp.copy, training_state)

    if config.ppo.steps_per_call > 1:
        # return_history: per-iteration metrics come back as [steps_per_
        # call] stacks (device-side ring buffer) so the logged train
        # curve keeps per-iteration density regardless of fusion depth.
        ppo_step_jit = jax.jit(
            functools.partial(
                ppo_multi_step,
                env,
                config=config.ppo,
                optimizer=optimizer,
                n_steps=config.ppo.steps_per_call,
                mesh=mesh,
                return_history=log_fn is not None,
            ),
            donate_argnums=(0,),
        )
    else:
        ppo_step_jit = jax.jit(
            functools.partial(
                ppo_step, env, config=config.ppo, optimizer=optimizer, mesh=mesh
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
        ),
        static_argnums=(),
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
    measure_throughput = LoggingLevel.THROUGHPUT in config.ppo.logging_level

    def run_eval(networks: StatefulModule) -> dict[str, Any]:
        eval_networks = networks.eval()
        t0 = time.perf_counter() if measure_throughput else None
        eval_metrics = eval_rollout_jit(
            eval_networks, key=jax.random.key(config.seed)
        )
        if measure_throughput:
            jax.block_until_ready(eval_metrics)
            elapsed = time.perf_counter() - t0
            eval_metrics = dict(eval_metrics)
            eval_metrics["throughput/eval_sps"] = (
                config.eval.n_envs * config.eval.max_episode_length / elapsed
            )
        return {k: _to_host(v) for k, v in dict(eval_metrics).items()}

    def run_video(networks: StatefulModule, steps: int, iteration: int) -> dict:
        if video_fn is None or not hasattr(eval_env, "render"):
            return {}
        eval_networks = networks.eval()
        t0 = time.perf_counter() if measure_throughput else None
        render_key = jax.random.fold_in(jax.random.key(config.seed), iteration)
        stacked_states, final_state, episode_reward = eval_render_jit(
            eval_networks, key=render_key
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
        if measure_throughput:
            elapsed = time.perf_counter() - t0
            return {"throughput/video_sps": config.video.episode_length / elapsed}
        return {}

    # Initial eval/video/checkpoint at step 0.
    steps = int(training_state.steps_taken)
    if config.eval.enabled:
        eval_metrics = run_eval(training_state.networks)
        metrics.update(eval_metrics)
        eval_history.append({"step": steps, **eval_metrics})
        last_eval_step = steps
    if config.video.enabled:
        metrics.update(run_video(training_state.networks, steps, n_iterations))
        last_video_step = steps
    if checkpoint_fn is not None and _should_run(
        steps, last_checkpoint_step, config.checkpoint_every_steps
    ):
        checkpoint_fn(training_state, steps)
        last_checkpoint_step = steps
    if log_fn is not None and metrics:
        log_fn(metrics, steps)

    # Main training loop. Unlike the reference (which syncs on
    # ``int(steps_taken)`` every iteration, ``ppo.py:209``), the step
    # count is computed host-side — it advances by exactly
    # n_envs·rollout_length per iteration — so with no due callbacks the
    # host dispatches ahead and the device pipeline never drains.
    #
    # Dispatch-ahead is BOUNDED: each queued execution pins its buffers,
    # so an unbounded queue (hundreds of iterations between callback
    # points) can exhaust runtime resources — observed as intermittent
    # ``Fatal Python error: Aborted`` in the CPU client on the 8-device
    # mesh convergence test. Blocking on the result from PIPELINE_DEPTH
    # iterations ago keeps ≤ PIPELINE_DEPTH programs in flight while
    # still hiding per-program dispatch latency completely (the blocked-
    # on work is long finished in steady state).
    steps_per_iter = (
        config.ppo.n_envs * config.ppo.rollout_length * config.ppo.steps_per_call
    )
    steps_per_inner = config.ppo.n_envs * config.ppo.rollout_length
    metrics_are_history = config.ppo.steps_per_call > 1 and log_fn is not None
    initial_steps = steps
    dispatch = BoundedDispatch()
    while steps < config.ppo.total_steps:
        t0 = time.perf_counter() if measure_throughput else None
        prev_steps = steps
        training_state, metrics = ppo_step_jit(training_state)
        dispatch.push(metrics)
        n_iterations += 1
        steps = initial_steps + n_iterations * steps_per_iter
        elapsed = None
        if measure_throughput:
            # Time the step alone — BEFORE any host-side logging below.
            jax.block_until_ready(metrics)
            elapsed = time.perf_counter() - t0
        if metrics_are_history:
            # Device-side metric ring buffer: one host fetch per call,
            # then log every fused sub-iteration at its own step count
            # (the last row continues through the shared logging below).
            history = metrics
            spc = config.ppo.steps_per_call
            rows = [
                jax.tree.map(lambda m, i=i: m[i], history) for i in range(spc)
            ]
            metrics = rows[-1]
            for i, row in enumerate(rows[:-1]):
                log_fn(row, prev_steps + (i + 1) * steps_per_inner)
        if measure_throughput:
            metrics["throughput/train_sps"] = steps_per_iter / elapsed

        if config.eval.enabled and _should_run(
            steps, last_eval_step, config.eval.every_steps
        ):
            eval_metrics = run_eval(training_state.networks)
            metrics.update(eval_metrics)
            eval_history.append({"step": steps, **eval_metrics})
            last_eval_step = steps

        if config.video.enabled and _should_run(
            steps, last_video_step, config.video.every_steps
        ):
            metrics.update(run_video(training_state.networks, steps, n_iterations))
            last_video_step = steps

        if checkpoint_fn is not None and _should_run(
            steps, last_checkpoint_step, config.checkpoint_every_steps
        ):
            checkpoint_fn(training_state, steps)
            last_checkpoint_step = steps

        if log_fn is not None:
            log_fn(metrics, steps)

    return TrainResult(
        training_state=training_state,
        final_metrics=metrics,
        eval_history=eval_history,
        total_steps=int(training_state.steps_taken),
        total_iterations=n_iterations,
    )


def _to_host(v: Any) -> Any:
    return float(v) if hasattr(v, "shape") and v.shape == () else v
