"""Counter env + net proving carry resets stay in lockstep with env
resets (capability parity with reference ``test_dummies/dummy_counter.py``).

Reward is 1.0 iff the action equals the number of steps since the last
env reset; ``DummyCounterNet`` outputs its per-env carry counter — so
total reward over a rollout equals T·B exactly iff net-carry resets are
perfectly synchronized with env resets."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass
from nnx_ppo_tpu.envs.types import State
from nnx_ppo_tpu.networks import types


class DummyCounterEnv:
    """Reward 1.0 iff action == steps-since-reset; obs is always [0.0]."""

    def reset(self, rng: jax.Array) -> State:
        return State(
            data={
                "current_step": jnp.array(0),
                "reset_step": jax.random.randint(rng, (), 3, 10),
            },
            obs=jnp.zeros(1),
            info={"current_step": jnp.array(0)},
            reward=jnp.array(1.0),
            done=jnp.array(0.0),
            metrics={},
        )

    def step(self, state: State, action: jax.Array) -> State:
        data = {
            "current_step": state.data["current_step"] + 1,
            "reset_step": state.data["reset_step"],
        }
        done = (data["current_step"] >= data["reset_step"]).astype(jnp.float32)
        return State(
            data=data,
            obs=jnp.zeros(1),
            info={"current_step": data["current_step"]},
            reward=jnp.where(
                jnp.squeeze(action) == data["current_step"], 1.0, 0.0
            ),
            done=done,
            metrics=state.metrics,
        )


@pytree_dataclass
class DummyCounterNet(types.StatefulModule):
    """Outputs the number of steps since its carry was last reset."""

    def __call__(self, state, obs, rollout_extras: Any = None):
        old_counter = state["counter_state"]["counter"]
        new_counter = old_counter + 1
        new_state = {"counter_state": {"counter": new_counter}}
        return types.ModuleOutput(
            next_state=new_state,
            output=types.PPONetworkOutput(
                actions=new_counter.astype(float)[:, None],
                loglikelihoods=jnp.ones_like(old_counter, dtype=float),
                value_estimates=jnp.ones_like(old_counter, dtype=float),
            ),
            regularization_loss=jnp.array(0.0),
            metrics={},
            rollout_extras=None,
        )

    def initialize_state(self, batch_size: int) -> dict:
        return {"counter_state": {"counter": jnp.zeros(batch_size, dtype=int)}}

    def reset_state(self, prev_state):
        return jax.tree.map(jnp.zeros_like, prev_state)
