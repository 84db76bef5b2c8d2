"""Time-limit truncation wrapper (capability parity with reference
``nnx_ppo/wrappers/episode_wrapper.py``).

Maintains ``info["step_counter"]`` and sets ``info["truncated"]`` +
forces ``done`` at ``max_len``. Initial step counters are **staggered**
— random in ``[0, max_len // 2)`` — so episodes across the batch don't
truncate in lockstep (keeps per-step reset work constant; on TPU this
also keeps the auto-reset branch divergence-free and the compiled step
shape static)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.algorithms.types import EnvState, RLEnv


class EpisodeWrapper:
    def __init__(self, env: RLEnv, max_len: int):
        self.env = env
        self.max_len = max_len

    def step(self, state: EnvState, action) -> EnvState:
        next_state = self.env.step(state, action)
        step_counter = state.info["step_counter"] + 1
        truncated = jnp.logical_or(
            next_state.info.get("truncated", False),
            step_counter >= self.max_len,
        )
        info = dict(next_state.info)
        info["step_counter"] = step_counter
        info["truncated"] = truncated
        return next_state.replace(
            info=info,
            done=jnp.logical_or(next_state.done.astype(bool), truncated).astype(
                jnp.float32
            ),
        )

    def reset(self, rng) -> EnvState:
        base_rng, step_counter_rng = jax.random.split(rng)
        next_state = self.env.reset(base_rng)
        info = dict(next_state.info)
        info["step_counter"] = jax.random.randint(
            step_counter_rng, (), 0, self.max_len // 2
        )
        info["truncated"] = jnp.array(False)
        return next_state.replace(info=info)

    @property
    def observation_size(self):
        return self.env.observation_size

    @property
    def action_size(self):
        return self.env.action_size

    def __getattr__(self, name):
        # Delegate anything else (render, observation specs, ...) to the
        # wrapped env so wrappers stay transparent to the video pipeline.
        if name == "env":
            # Only reached when 'env' is not yet in __dict__ (e.g. during
            # deepcopy/unpickle of an uninitialized instance) — must raise
            # instead of recursing.
            raise AttributeError(name)
        return getattr(self.env, name)
