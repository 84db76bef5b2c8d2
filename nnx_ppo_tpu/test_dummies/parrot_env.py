"""Env rewarding action ≈ previous obs (capability parity with
reference ``test_dummies/parrot_env.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State


class ParrotEnv:
    """Maximal reward when action == last obs."""

    def __init__(
        self, obs_size: int | tuple[int, ...] = (3,), reward_falloff: float = 0.5
    ):
        self.obs_size = obs_size if isinstance(obs_size, tuple) else (obs_size,)
        self.reward_falloff = reward_falloff

    def reset(self, rng: jax.Array) -> State:
        return self._get_obs(rng, None, None)

    def step(self, state: State, action: jax.Array) -> State:
        return self._get_obs(state.data["rng_key"], state.obs, action)

    def _get_obs(self, rng_key, obs, action) -> State:
        if action is not None:
            d_sqr = jnp.square(action - obs).sum()
            reward = jnp.exp(-(d_sqr / (self.reward_falloff**2) / 2))
        else:
            reward = jnp.array(0.0)
        obs_key, new_key = jax.random.split(rng_key)
        next_obs = jnp.tanh(jax.random.normal(obs_key, self.obs_size))
        return State(
            data=dict(rng_key=new_key),
            obs=next_obs,
            info={},
            reward=reward,
            done=jnp.array(0.0),
            metrics={},
        )

    @property
    def observation_size(self):
        return self.obs_size

    @property
    def action_size(self):
        return self.obs_size
