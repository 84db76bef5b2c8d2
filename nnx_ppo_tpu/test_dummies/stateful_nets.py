"""Stateful test networks (capability parity with reference
``test_dummies/stateful_nets.py``).

The reference's ``RepeatAndCountNet`` counts forward calls via a mutable
``nnx.Variable``. In the functional design hidden mutation inside jit is
impossible by construction, so the call counter lives in the per-env
carry instead: summing the final carry gives the total number of
(env, step) forward evaluations."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass
from nnx_ppo_tpu.networks import types


@pytree_dataclass
class RepeatAndCountNet(types.StatefulModule):
    """Outputs its input as the action; counts calls in its carry.

    ``carry["n_calls"]`` is ``[B]`` int32, incremented once per forward.
    NOTE: the counter is part of the carry, so it is zeroed by
    ``initialize_state`` and *survives* episode resets (``reset_state``
    keeps it) — total calls = ``carry["n_calls"].sum()``.
    """

    def __call__(self, state, obs, rollout_extras: Any = None):
        new_state = {"n_calls": state["n_calls"] + 1}
        batch_size = obs.shape[0]
        return types.ModuleOutput(
            next_state=new_state,
            output=types.PPONetworkOutput(
                actions=obs,
                loglikelihoods=jnp.ones(batch_size),
                value_estimates=jnp.ones(batch_size),
            ),
            regularization_loss=jnp.array(0.0),
            metrics={},
            rollout_extras=None,
        )

    def initialize_state(self, batch_size: int) -> dict:
        return {"n_calls": jnp.zeros(batch_size, dtype=jnp.int32)}

    def reset_state(self, prev_state):
        return prev_state  # Counting survives episode resets.
