"""PPO algorithm integration tests (reference ``ppo_test.py`` strategy):
jit + repeated invocation, loss finiteness, normalizer accounting,
recurrent end-to-end, convergence gate."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    LoggingLevel,
    PPOConfig,
    TrainConfig,
    VideoConfig,
    make_optimizer,
    new_training_state,
    train_ppo,
)
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.core.struct import partition_params
from nnx_ppo_tpu.networks import (
    LSTM,
    Dense,
    NormalTanhSampler,
    Normalizer,
    PPOAdapter,
    Sequential,
    make_mlp,
    make_mlp_actor_critic,
)
from nnx_ppo_tpu.test_dummies import MoveToCenterEnv
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def make_net(key=0, normalize=True, entropy=1e-3):
    return make_mlp_actor_critic(
        2, 2, [32, 32], [32, 32], jax.random.key(key),
        normalize_obs=normalize, entropy_weight=entropy,
    )


def make_step(env, config):
    opt = make_optimizer(config.learning_rate)
    return jax.jit(
        functools.partial(ppo_step, env, config=config, optimizer=opt)
    ), opt


CFG = PPOConfig(
    n_envs=16,
    rollout_length=8,
    n_epochs=2,
    n_minibatches=2,
    logging_level=LoggingLevel.ALL & ~LoggingLevel.THROUGHPUT,
)


class TestPPOStep:
    def test_jit_and_repeat_no_stray_tracers(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net()
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        step, _ = make_step(env, CFG)
        for i in range(3):
            ts, metrics = step(ts)
            assert int(ts.steps_taken) == (i + 1) * CFG.n_envs * CFG.rollout_length
        for k, v in metrics.items():
            assert jnp.isfinite(v).all(), f"non-finite metric {k}"

    def test_params_change_and_are_finite(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net()
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        p0, _ = partition_params(ts.networks)
        step, _ = make_step(env, CFG)
        ts, _ = step(ts)
        p1, _ = partition_params(ts.networks)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, p1)
        assert max(jax.tree.leaves(diffs)) > 0
        for leaf in jax.tree.leaves(p1):
            assert jnp.isfinite(leaf).all()

    def test_normalizer_counter_equals_env_steps(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net(normalize=True)
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        step, _ = make_step(env, CFG)
        ts, _ = step(ts)
        ts, _ = step(ts)
        normalizer = ts.networks[0]
        assert isinstance(normalizer, Normalizer)
        assert float(normalizer.counter) == 2 * CFG.n_envs * CFG.rollout_length

    def test_grad_norm_metric_present(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net()
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        step, _ = make_step(env, CFG)
        _, metrics = step(ts)
        assert "grad_norm/mean" in metrics
        assert "weights/mean" in metrics

    def test_gradient_clipping_and_weight_decay_paths(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net()
        cfg = PPOConfig(
            n_envs=8, rollout_length=4, n_epochs=1, n_minibatches=1,
            gradient_clipping=0.5, weight_decay=1e-4,
        )
        ts = new_training_state(
            env, net, cfg.n_envs, seed=0,
            gradient_clipping=cfg.gradient_clipping, weight_decay=cfg.weight_decay,
        )
        opt = make_optimizer(cfg.learning_rate, cfg.gradient_clipping, cfg.weight_decay)
        step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
        ts, metrics = step(ts)
        assert jnp.isfinite(metrics["losses/actor/mean"])


class TestRecurrentPPO:
    def test_lstm_ppo_step_no_nans(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        k = jax.random.key(0)
        actor = Sequential.create([
            LSTM.create(2, 16, jax.random.fold_in(k, 0)),
            Dense.create(16, 4, jax.random.fold_in(k, 1)),
            NormalTanhSampler.create(jax.random.fold_in(k, 2), entropy_weight=1e-3),
        ])
        critic = make_mlp([2, 16, 1], jax.random.fold_in(k, 3),
                          activation_last_layer=False)
        net = PPOAdapter.create(action=actor, value=critic)
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        step, _ = make_step(env, CFG)
        for _ in range(2):
            ts, metrics = step(ts)
        for key_, v in metrics.items():
            assert jnp.isfinite(v).all(), f"non-finite {key_}"
        params, _ = partition_params(ts.networks)
        for leaf in jax.tree.leaves(params):
            assert jnp.isfinite(leaf).all()

    def test_lstm_carry_threads_through_replay(self):
        # Carry state from pre-rollout snapshot must slice per minibatch
        # without shape errors (the critical ordering invariant).
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        k = jax.random.key(1)
        actor = Sequential.create([
            LSTM.create(2, 8, jax.random.fold_in(k, 0)),
            Dense.create(8, 4, jax.random.fold_in(k, 1)),
            NormalTanhSampler.create(jax.random.fold_in(k, 2), entropy_weight=0.0),
        ])
        net = PPOAdapter.create(
            action=actor, value=make_mlp([2, 8, 1], k, activation_last_layer=False)
        )
        cfg = PPOConfig(n_envs=12, rollout_length=6, n_epochs=3, n_minibatches=3)
        ts = new_training_state(env, net, cfg.n_envs, seed=0)
        step, _ = make_step(env, cfg)
        ts, metrics = step(ts)
        assert jnp.isfinite(metrics["losses/actor/mean"])


class TestTrainPPO:
    def test_full_loop_with_callbacks(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net()
        logs, ckpts = [], []
        cfg = TrainConfig(
            ppo=PPOConfig(n_envs=8, rollout_length=4, total_steps=128,
                          n_epochs=1, n_minibatches=1),
            eval=EvalConfig(n_envs=4, max_episode_length=10, every_steps=64),
            video=VideoConfig(enabled=False),
            checkpoint_every_steps=64,
        )
        res = train_ppo(
            env, net, cfg,
            log_fn=lambda m, s: logs.append((s, m)),
            checkpoint_fn=lambda ts, s: ckpts.append(s),
        )
        assert res.total_steps >= 128
        assert len(logs) >= 4
        assert ckpts[0] == 0  # step-0 checkpoint
        assert len(res.eval_history) >= 2

    def test_total_steps_and_seed_overrides(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net()
        cfg = TrainConfig(
            ppo=PPOConfig(n_envs=8, rollout_length=4, total_steps=999),
            eval=EvalConfig(enabled=False),
            video=VideoConfig(enabled=False),
        )
        res = train_ppo(env, net, cfg, total_steps=64, seed=5)
        assert res.total_steps >= 64
        assert res.total_steps < 999


@pytest.mark.slow
def test_move_to_center_convergence():
    """End-to-end convergence gate (reference ``ppo_test.py:266-305``):
    episode_reward_mean > 95 on MoveToCenterEnv."""
    env = EpisodeWrapper(MoveToCenterEnv(), 200)
    net = make_mlp_actor_critic(
        2, 2, [32, 32, 32], [64, 64], jax.random.key(0),
        entropy_weight=3e-3, min_std=0.05,
    )
    cfg = TrainConfig(
        ppo=PPOConfig(
            n_envs=256, rollout_length=16, total_steps=1_500_000,
            learning_rate=5e-4, n_epochs=4, n_minibatches=4,
            # Without grad clipping this config converges and then
            # sometimes collapses (tanh-saturated actions -> exploding
            # importance ratios on negative advantages) — seed lottery.
            gradient_clipping=1.0,
        ),
        eval=EvalConfig(n_envs=64, max_episode_length=200, every_steps=500_000,
                        logging_percentiles=None),
        video=VideoConfig(enabled=False),
        seed=2,
    )
    res = train_ppo(env, net, cfg)
    final = res.eval_history[-1]["episode_reward/mean"]
    assert final > 95, f"converged to {final}, expected > 95"


class TestAnnealLR:
    def test_schedule_counts_updates_and_trains(self):
        import optax

        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_net()
        cfg = TrainConfig(
            ppo=PPOConfig(n_envs=8, rollout_length=4, total_steps=128,
                          n_epochs=2, n_minibatches=2, anneal_lr=True),
            eval=EvalConfig(enabled=False),
            video=VideoConfig(enabled=False),
        )
        res = train_ppo(env, net, cfg)
        # 128 steps / (8 envs * 4) = 4 iterations * E2 * M2 = 16 updates:
        # the schedule's count (the max count leaf in the optax state)
        # must have advanced once per minibatch update.
        counts = [
            int(leaf)
            for leaf in jax.tree.leaves(res.training_state.opt_state)
            if jnp.ndim(leaf) == 0 and jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.integer)
        ]
        assert max(counts) == 16
        assert jnp.isfinite(res.final_metrics["losses/actor/mean"])

    def test_annealed_diverges_from_fixed_lr(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)

        def run(anneal):
            cfg = TrainConfig(
                ppo=PPOConfig(n_envs=8, rollout_length=4, total_steps=256,
                              n_epochs=2, n_minibatches=2,
                              anneal_lr=anneal, learning_rate=1e-2),
                eval=EvalConfig(enabled=False),
                video=VideoConfig(enabled=False),
            )
            return train_ppo(env, make_net(), cfg)

        p_fixed = jax.tree.leaves(run(False).training_state.networks)[0]
        p_anneal = jax.tree.leaves(run(True).training_state.networks)[0]
        # Later updates are shrunk by the decaying lr, so the params
        # must differ from the fixed-lr run.
        assert not np.allclose(np.asarray(p_fixed), np.asarray(p_anneal))
