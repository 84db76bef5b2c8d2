"""Rollout machinery tests (reference ``rollout_test.py`` strategy):
reset lockstep, forward-call counting, eval latching."""

import jax
import jax.numpy as jnp
import numpy as np

from nnx_ppo_tpu.algorithms import eval_rollout, new_training_state, unroll_env
from nnx_ppo_tpu.test_dummies import (
    DummyCounterEnv,
    DummyCounterNet,
    MockEnv,
    MoveFromCenterEnv,
    ParrotEnv,
    RepeatAndCountNet,
)

N_ENVS = 16
N_STEPS = 50


class TestUnrollEnv:
    def test_dummy_counter_reward_exact(self):
        """Net carry resets in lockstep with env resets → every action
        matches steps-since-reset → total reward == T·B exactly."""
        env = DummyCounterEnv()
        net = DummyCounterNet()
        ts = new_training_state(env, net, N_ENVS, seed=0)
        _, _, data = jax.jit(
            lambda es, ns, k: unroll_env(env, es, net, ns, N_STEPS, k)
        )(ts.env_states, ts.network_states, jax.random.key(1))
        assert float(data.rewards.sum()) == N_STEPS * N_ENVS

    def test_network_called_exactly_T_times_per_env(self):
        env = MockEnv(obs_size=3, action_size=3, max_steps=4)
        net = RepeatAndCountNet()
        ts = new_training_state(env, net, N_ENVS, seed=0)
        final_net_state, _, _ = unroll_env(
            env, ts.env_states, net, ts.network_states, N_STEPS, jax.random.key(0)
        )
        assert int(final_net_state["n_calls"].sum()) == N_STEPS * N_ENVS

    def test_transition_shapes(self):
        env = MockEnv(obs_size=3, action_size=3, max_steps=4)
        net = RepeatAndCountNet()
        ts = new_training_state(env, net, N_ENVS, seed=0)
        _, _, data = unroll_env(
            env, ts.env_states, net, ts.network_states, N_STEPS, jax.random.key(0)
        )
        assert data.obs.shape == (N_STEPS, N_ENVS, 3)
        assert data.done.shape == (N_STEPS, N_ENVS)
        assert data.done.dtype == jnp.bool_
        assert data.rewards.shape == (N_STEPS, N_ENVS)

    def test_mock_env_resets_on_schedule(self):
        env = MockEnv(obs_size=2, action_size=2, max_steps=5)
        net = RepeatAndCountNet()
        ts = new_training_state(env, net, 4, seed=0)
        _, _, data = unroll_env(
            env, ts.env_states, net, ts.network_states, 20, jax.random.key(0)
        )
        # Done every 5 steps → 4 dones per env over 20 steps.
        assert int(data.done.sum()) == 4 * 4


class TestEvalRollout:
    def test_latch_and_masked_accumulation(self):
        env = MoveFromCenterEnv()
        net = RepeatAndCountNet()  # action == obs: moves outward-ish

        class OutwardNet(RepeatAndCountNet):
            pass

        metrics = eval_rollout(env, net, 8, 30, jax.random.key(0))
        assert "episode_reward/mean" in metrics
        assert "lifespan_mean" in metrics
        assert 0 <= float(metrics["lifespan_mean"]) <= 30

    def test_percentiles(self):
        env = MoveFromCenterEnv()
        net = RepeatAndCountNet()
        metrics = eval_rollout(
            env, net, 8, 10, jax.random.key(0), logging_percentiles=(0, 50, 100)
        )
        assert "episode_reward/p50" in metrics
        assert "lifespan/p0" in metrics
        assert float(metrics["lifespan/p0"]) <= float(metrics["lifespan/p100"])

    def test_parrot_env_reward_high_for_parrot_net(self):
        env = ParrotEnv(obs_size=(3,))
        net = RepeatAndCountNet()  # action = obs exactly → near-max reward
        metrics = eval_rollout(env, net, 8, 20, jax.random.key(0))
        assert float(metrics["episode_reward/mean"]) > 19.0
