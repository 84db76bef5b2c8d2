"""Obs-echo environment: reward peaks when the action repeats the
previous observation.

Original fixture for this repo's suite (fills the role of the
reference's ``test_dummies/parrot_env.py``: a one-step-memory target
that a trivially-correct "repeat the obs" policy maximizes, used to
validate eval-rollout reward accounting). Written against this
framework's :class:`nnx_ppo_tpu.envs.types.State` pytree with the
observation-stream key carried in ``state.data``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State


class ParrotEnv:
    """Never-ending env; reward is a Gaussian bump in ‖action − prev_obs‖.

    A policy that outputs exactly the last observation earns reward ≈ 1
    every step (the tanh-squashed obs stream stays inside the action
    range, so perfect parroting is feasible).
    """

    def __init__(
        self, obs_size: int | tuple[int, ...] = (3,), reward_falloff: float = 0.5
    ):
        self.obs_size = obs_size if isinstance(obs_size, tuple) else (obs_size,)
        self.reward_falloff = reward_falloff

    def _next_obs(self, key: jax.Array) -> tuple[jax.Array, jax.Array]:
        obs_key, carry_key = jax.random.split(key)
        # tanh squash keeps obs within the sampler's action range.
        return jnp.tanh(jax.random.normal(obs_key, self.obs_size)), carry_key

    def _echo_reward(self, action: jax.Array, target: jax.Array) -> jax.Array:
        err = jnp.sum(jnp.square(action - target))
        return jnp.exp(-0.5 * err / self.reward_falloff**2)

    def reset(self, rng: jax.Array) -> State:
        obs, carry_key = self._next_obs(rng)
        return State(
            data={"key": carry_key},
            obs=obs,
            reward=jnp.zeros(()),
            done=jnp.zeros(()),
            info={},
            metrics={},
        )

    def step(self, state: State, action: jax.Array) -> State:
        obs, carry_key = self._next_obs(state.data["key"])
        return State(
            data={"key": carry_key},
            obs=obs,
            reward=self._echo_reward(action, state.obs),
            done=jnp.zeros(()),
            info={},
            metrics={},
        )

    @property
    def observation_size(self):
        return self.obs_size

    @property
    def action_size(self):
        return self.obs_size
