"""Mock environment for testing stateful networks with rollouts
(capability parity with reference ``test_dummies/mock_env.py``)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass


@pytree_dataclass
class MockEnvState:
    """Simple mock environment state."""

    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    step_count: jax.Array
    info: dict[str, Any]
    metrics: dict[str, Any]


class MockEnv:
    """Random-obs env that resets every ``max_steps``; actions ignored."""

    def __init__(self, obs_size: int, action_size: int, max_steps: int = 5):
        self.obs_size = obs_size
        self.action_size = action_size
        self.max_steps = max_steps
        self.observation_size = obs_size

    def reset(self, rng: jax.Array) -> MockEnvState:
        (obs_key,) = jax.random.split(rng, 1)
        return MockEnvState(
            obs=jax.random.normal(obs_key, (self.obs_size,)),
            reward=jnp.array(0.0),
            done=jnp.array(False),
            step_count=jnp.array(0),
            info={},
            metrics={},
        )

    def step(self, state: MockEnvState, action: jax.Array) -> MockEnvState:
        key = jax.random.key(state.step_count + 1)
        new_obs = jax.random.normal(key, (self.obs_size,))
        new_step_count = state.step_count + 1
        done = new_step_count >= self.max_steps
        return MockEnvState(
            obs=new_obs,
            reward=jnp.array(1.0),
            done=done,
            step_count=new_step_count,
            info={},
            metrics={},
        )
