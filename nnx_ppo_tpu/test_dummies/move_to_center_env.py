"""2-D analytic point env rewarded near the origin (capability parity
with reference ``test_dummies/move_to_center_env.py``). Used as the
end-to-end convergence gate."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State


class MoveToCenterEnv:
    """Continuous 2-D steps; reward peaks at the origin; episode ends if
    the agent strays past ``border_radius``."""

    def __init__(self, reward_falloff: float = 0.5, border_radius: float = 2.0):
        self.reward_falloff = reward_falloff
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
        d_sqr = jnp.square(data["pos"]).sum()
        reward = jnp.exp(-(d_sqr / (self.reward_falloff**2) / 2))
        return State(
            data=data,
            obs=data["pos"] / 10.0,
            info={},
            reward=reward,
            done=jnp.where(d_sqr > self.border_radius**2, 1.0, 0.0),
            metrics={},
        )

    @property
    def observation_size(self):
        return 2

    @property
    def action_size(self):
        return 2
