"""ppo_multi_step: K fused train iterations must advance state exactly
like K separate ppo_step calls, and train_ppo must honor steps_per_call."""

import dataclasses
import functools

import jax
import numpy as np
import jax.numpy as jnp

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    PPOConfig,
    TrainConfig,
    make_optimizer,
    new_training_state,
    ppo_multi_step,
    ppo_step,
    train_ppo,
)
from nnx_ppo_tpu.envs import CartpoleBalance
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def _setup():
    env = EpisodeWrapper(CartpoleBalance(), max_len=20)
    net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
    cfg = PPOConfig(n_envs=8, rollout_length=5, n_epochs=2, n_minibatches=2)
    opt = make_optimizer(cfg.learning_rate)
    ts = new_training_state(env, net, cfg.n_envs, seed=0)
    return env, cfg, opt, ts


class TestMultiStep:
    def test_equals_repeated_single_steps(self):
        env, cfg, opt, ts = _setup()
        K = 3
        multi = jax.jit(
            functools.partial(
                ppo_multi_step, env, config=cfg, optimizer=opt, n_steps=K
            )
        )
        single = jax.jit(
            functools.partial(ppo_step, env, config=cfg, optimizer=opt)
        )
        ts_multi, m_multi = multi(ts)
        ts_single = ts
        for _ in range(K):
            ts_single, m_single = single(ts_single)
        assert int(ts_multi.steps_taken) == int(ts_single.steps_taken)
        # Same program semantics → identical params up to float noise.
        chex_ok = jax.tree.all(
            jax.tree.map(
                lambda a, b: jnp.allclose(a, b, rtol=1e-5, atol=1e-6),
                ts_multi.networks,
                ts_single.networks,
            )
        )
        assert chex_ok
        assert jnp.allclose(
            m_multi["losses/actor/mean"],
            m_single["losses/actor/mean"],
            rtol=1e-4,
            atol=1e-5,
        )

    def test_train_ppo_steps_per_call(self):
        env = EpisodeWrapper(CartpoleBalance(), max_len=20)
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        cfg = TrainConfig(
            ppo=PPOConfig(
                n_envs=8,
                rollout_length=5,
                total_steps=8 * 5 * 4,  # 4 iterations
                steps_per_call=2,
            ),
            eval=EvalConfig(enabled=False),
        )
        res = train_ppo(env, net, cfg)
        assert res.total_steps == 8 * 5 * 4
        assert res.total_iterations == 2  # 2 calls of 2 fused steps

    def test_metric_density_independent_of_steps_per_call(self):
        """With a log_fn, every fused sub-iteration is logged at its own
        step count (device-side metric ring buffer) — steps_per_call no
        longer trades metric cadence for dispatch amortization."""
        env = EpisodeWrapper(CartpoleBalance(), max_len=20)
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        logged: list[tuple[int, float]] = []

        def log_fn(metrics, step):
            if "losses/actor/mean" in metrics:
                logged.append((step, float(metrics["losses/actor/mean"])))

        cfg = TrainConfig(
            ppo=PPOConfig(
                n_envs=8,
                rollout_length=5,
                total_steps=8 * 5 * 8,  # 8 inner iterations
                steps_per_call=4,
            ),
            eval=EvalConfig(enabled=False),
        )
        train_ppo(env, net, cfg, log_fn=log_fn)
        steps_logged = [s for s, _ in logged]
        assert steps_logged == [40, 80, 120, 160, 200, 240, 280, 320]
        assert all(np.isfinite(v) for _, v in logged)


class TestDistillationFused:
    def test_fused_equals_scan(self):
        from nnx_ppo_tpu.algorithms.distillation import distillation_loss
        from nnx_ppo_tpu.algorithms.distillation import distillation_unroll_env
        from nnx_ppo_tpu.algorithms.types import LoggingLevel
        from nnx_ppo_tpu.core.struct import partition_params

        env = EpisodeWrapper(CartpoleBalance(), max_len=6)
        teacher = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(1)).eval()
        student = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(2))
        n_envs, T = 8, 5
        env_states = jax.vmap(env.reset)(
            jax.random.split(jax.random.key(3), n_envs)
        )
        s_state = student.initialize_state(n_envs)
        t_state = teacher.initialize_state(n_envs)
        _, _, _, data = distillation_unroll_env(
            env, env_states, teacher, student, s_state, t_state, T,
            jax.random.key(4),
        )
        params, rest = partition_params(student)
        l_scan, _ = distillation_loss(
            params, rest, s_state, data, LoggingLevel.LOSSES, fused_replay=False
        )
        l_fused, _ = distillation_loss(
            params, rest, s_state, data, LoggingLevel.LOSSES, fused_replay=True
        )
        assert jnp.allclose(l_scan, l_fused, rtol=1e-4, atol=1e-5)
