"""PPOAdapter: two-port router from network output to ``PPONetworkOutput``.

Capability parity with the reference adapter
(``nnx_ppo/networks/adapter.py:61-133``): runs the ``action`` and
``value`` ports on the same upstream input and packages the results.
The action port must output a tree of *sampler dicts*
(``{"action", "log_likelihood"}`` payloads, recognised via ``is_leaf``);
the value port's output is used directly, with trailing singleton axes
squeezed (``[B, 1]`` → ``[B]``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass
from nnx_ppo_tpu.networks.types import (
    ModuleOutput,
    ModuleState,
    PPONetworkOutput,
    StatefulModule,
)

_SAMPLER_DICT_KEYS = frozenset({"action", "log_likelihood"})


def is_sampler_dict(x: Any) -> bool:
    return isinstance(x, dict) and _SAMPLER_DICT_KEYS.issubset(x.keys())


def _squeeze_trailing_one(v: Any) -> Any:
    if hasattr(v, "shape") and v.shape and v.shape[-1] == 1:
        return jnp.squeeze(v, axis=-1)
    return v


@pytree_dataclass
class PPOAdapter(StatefulModule):
    """Two-port router producing :class:`PPONetworkOutput`.

    Args:
        action: Action port; forward output must be a tree of sampler
            dicts ``{"action", "log_likelihood"}``.
        value: Value port; forward output becomes ``value_estimates``
            (trailing singleton axes squeezed).
    """

    action: StatefulModule
    value: StatefulModule

    @classmethod
    def create(cls, action: StatefulModule, value: StatefulModule) -> "PPOAdapter":
        return cls(action=action, value=value)

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        if rollout_extras is None:
            a_re = v_re = None
        else:
            a_re = rollout_extras["action"]
            v_re = rollout_extras["value"]

        a_out = self.action(state["action"], x, a_re)
        v_out = self.value(state["value"], x, v_re)

        actions = jax.tree.map(
            lambda d: d["action"], a_out.output, is_leaf=is_sampler_dict
        )
        loglikelihoods = jax.tree.map(
            lambda d: d["log_likelihood"], a_out.output, is_leaf=is_sampler_dict
        )
        value_estimates = jax.tree.map(_squeeze_trailing_one, v_out.output)

        return ModuleOutput(
            next_state={"action": a_out.next_state, "value": v_out.next_state},
            output=PPONetworkOutput(
                actions=actions,
                loglikelihoods=loglikelihoods,
                value_estimates=value_estimates,
            ),
            regularization_loss=a_out.regularization_loss
            + v_out.regularization_loss,
            metrics={"action": a_out.metrics, "value": v_out.metrics},
            rollout_extras={
                "action": a_out.rollout_extras,
                "value": v_out.rollout_extras,
            },
        )

    def initialize_state(self, batch_size: int) -> ModuleState:
        return {
            "action": self.action.initialize_state(batch_size),
            "value": self.value.initialize_state(batch_size),
        }

    @property
    def replay_time_static(self) -> bool:
        return self.action.replay_time_static and self.value.replay_time_static

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        a_re = None if extras_seq is None else extras_seq["action"]
        v_re = None if extras_seq is None else extras_seq["value"]
        a_out, a_reg, a_final = self.action.replay_sequence(
            state["action"], obs_seq, done_seq, a_re
        )
        v_out, v_reg, v_final = self.value.replay_sequence(
            state["value"], obs_seq, done_seq, v_re
        )
        output = PPONetworkOutput(
            actions=jax.tree.map(
                lambda d: d["action"], a_out, is_leaf=is_sampler_dict
            ),
            loglikelihoods=jax.tree.map(
                lambda d: d["log_likelihood"], a_out, is_leaf=is_sampler_dict
            ),
            value_estimates=jax.tree.map(_squeeze_trailing_one, v_out),
        )
        return (
            output,
            a_reg + v_reg,
            {"action": a_final, "value": v_final},
        )

    def reset_state(self, prev_state) -> ModuleState:
        return {
            "action": self.action.reset_state(prev_state["action"]),
            "value": self.value.reset_state(prev_state["value"]),
        }

    def update_statistics(self, rollout_extras) -> "PPOAdapter":
        return self.replace(
            action=self.action.update_statistics(rollout_extras["action"]),
            value=self.value.update_statistics(rollout_extras["value"]),
        )
