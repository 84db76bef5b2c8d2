"""PyTree obs/actions/rewards through the full PPO pipeline
(reference ``ppo_test.py:356-444`` strategy), incl. multi-agent value
heads and combine_advantages."""

import functools

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.test_dummies import (
    DictObsActEnv,
    DictObsActNet,
    TwoArmEnv,
    TwoArmNet,
)


def run_steps(env, net, cfg, n=2):
    ts = new_training_state(env, net, cfg.n_envs, seed=0)
    opt = make_optimizer(cfg.learning_rate)
    step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
    metrics = None
    for _ in range(n):
        ts, metrics = step(ts)
    return ts, metrics


CFG = PPOConfig(n_envs=8, rollout_length=5, n_epochs=2, n_minibatches=2)


class TestDictObsAct:
    def test_ppo_step_dict_obs_actions(self):
        env = DictObsActEnv()
        net = DictObsActNet.create(jax.random.key(0))
        ts, metrics = run_steps(env, net, CFG)
        assert jnp.isfinite(metrics["losses/critic/mean"])
        assert int(ts.steps_taken) == 2 * CFG.n_envs * CFG.rollout_length

    def test_replay_uses_stored_dict_extras(self):
        env = DictObsActEnv()
        net = DictObsActNet.create(jax.random.key(0))
        state = net.initialize_state(3)
        obs = {"pos": jnp.ones((3, 2)), "vel": jnp.zeros((3, 2))}
        out = net(state, obs)
        replay = net(state, obs, out.rollout_extras)
        assert jnp.array_equal(
            replay.output.actions["force"], out.output.actions["force"]
        )


class TestTwoArm:
    def test_multi_agent_dict_rewards(self):
        env = TwoArmEnv()
        net = TwoArmNet.create(jax.random.key(0))
        ts, metrics = run_steps(env, net, CFG)
        # Per-reward-key losses logged as nested names.
        assert "losses/critic/arm1/mean" in metrics
        assert "losses/critic/arm2/mean" in metrics
        assert jnp.isfinite(metrics["losses/critic/arm1/mean"])

    def test_combine_advantages(self):
        env = TwoArmEnv()
        net = TwoArmNet.create(jax.random.key(0))
        cfg = PPOConfig(
            n_envs=8, rollout_length=5, n_epochs=2, n_minibatches=2,
            combine_advantages=True,
        )
        ts, metrics = run_steps(env, net, cfg)
        assert jnp.isfinite(metrics["losses/actor/arm1/mean"])
        assert jnp.isfinite(metrics["losses/actor/arm2/mean"])
