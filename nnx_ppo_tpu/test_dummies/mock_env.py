"""Scripted reset-schedule environment for rollout-machinery tests.

Original fixture for this repo's suite (fills the role of the
reference's ``test_dummies/mock_env.py``: an action-agnostic env whose
only dynamics are a deterministic done schedule, so tests can assert
auto-reset bookkeeping exactly). Written against this framework's
:class:`nnx_ppo_tpu.envs.types.State` pytree: the per-env observation
stream is driven by a PRNG key carried in ``state.data`` and advanced
by splitting, and the tick counter lives alongside it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State


class MockEnv:
    """Ignores actions; emits ``done`` every ``max_steps`` steps.

    Reward is a constant 1.0 per step (0.0 at reset), so
    ``rewards.sum() == T * B`` over any rollout — tests use this to
    prove no transition is dropped or double-counted across auto-resets.
    """

    def __init__(self, obs_size: int, action_size: int, max_steps: int = 5):
        self.obs_size = obs_size
        self.action_size = action_size
        self.max_steps = max_steps
        self.observation_size = obs_size

    def _fresh_obs(self, key: jax.Array) -> jax.Array:
        return jax.random.normal(key, (self.obs_size,))

    def reset(self, rng: jax.Array) -> State:
        obs_key, carry_key = jax.random.split(rng)
        return State(
            data={"key": carry_key, "ticks": jnp.zeros((), jnp.int32)},
            obs=self._fresh_obs(obs_key),
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            info={},
            metrics={},
        )

    def step(self, state: State, action: jax.Array) -> State:
        del action  # dynamics are purely schedule-driven
        obs_key, carry_key = jax.random.split(state.data["key"])
        ticks = state.data["ticks"] + 1
        return State(
            data={"key": carry_key, "ticks": ticks},
            obs=self._fresh_obs(obs_key),
            reward=jnp.ones(()),
            done=ticks >= self.max_steps,
            info={},
            metrics={},
        )
