"""2-D analytic point env penalized near the origin (capability parity
with reference ``test_dummies/move_from_center_env.py``). Short
lifespans are preferred."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State


class MoveFromCenterEnv:
    """Continuous 2-D steps; negative reward shrinking toward the border;
    episode ends when the agent escapes past ``border_radius``."""

    def __init__(self, border_radius: float = 2.0):
        self.border_radius = border_radius

    def reset(self, rng: jax.Array) -> State:
        phi, rad = jax.random.uniform(rng, (2,))
        rad *= self.border_radius * 0.9
        pos = jnp.array(
            [jnp.cos(2 * jnp.pi * phi) * rad, jnp.sin(2 * jnp.pi * phi) * rad]
        )
        return self._get_state(dict(pos=pos))

    def step(self, state: State, action: jax.Array) -> State:
        action = jnp.clip(action, -1, 1)
        return self._get_state(dict(pos=state.data["pos"] + action))

    def _get_state(self, data) -> State:
        d = jnp.linalg.norm(data["pos"])
        reward = d / self.border_radius - 1.0
        return State(
            data=data,
            obs=data["pos"],
            info={},
            reward=reward,
            done=jnp.where(d > self.border_radius, 1.0, 0.0),
            metrics={},
        )

    @property
    def observation_size(self):
        return 2

    @property
    def action_size(self):
        return 2
