"""Constant reward scaling wrapper (capability parity with reference
``nnx_ppo/wrappers/reward_scaling_wrapper.py``)."""

from __future__ import annotations

from typing import Any

import jax

from nnx_ppo_tpu.algorithms.types import EnvState, RLEnv


class RewardScalingWrapper:
    def __init__(self, env: RLEnv, reward_scale: float) -> None:
        self.env = env
        self.reward_scale = reward_scale

    def reset(self, rng: jax.Array) -> EnvState:
        next_state = self.env.reset(rng)
        return next_state.replace(
            reward=jax.tree.map(lambda r: self.reward_scale * r, next_state.reward)
        )

    def step(self, state: EnvState, action: Any) -> EnvState:
        next_state = self.env.step(state, action)
        return next_state.replace(
            reward=jax.tree.map(lambda r: self.reward_scale * r, next_state.reward)
        )

    @property
    def observation_size(self) -> Any:
        return self.env.observation_size

    @property
    def action_size(self) -> Any:
        return self.env.action_size

    def __getattr__(self, name: str) -> Any:
        # Delegate anything else (render, observation specs, ...) to the
        # wrapped env so wrappers stay transparent to the video pipeline.
        if name == "env":
            # Only reached when 'env' is not yet in __dict__ (e.g. during
            # deepcopy/unpickle of an uninitialized instance) — must raise
            # instead of recursing.
            raise AttributeError(name)
        return getattr(self.env, name)
