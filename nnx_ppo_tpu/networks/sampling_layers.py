"""Action samplers (capability parity with reference
``nnx_ppo/networks/sampling_layers.py:45-147``).

Sampler behaviour is driven by ``rollout_extras``:

* ``rollout_extras is None`` (ROLLOUT / INFERENCE): sample fresh and
  emit ``stop_gradient(raw_action)`` as the replay snapshot.
* ``rollout_extras is not None`` (LOSS_REPLAY): reuse the stored raw
  action for the log-likelihood under the *current* policy and the
  stored entropy noise for the entropy estimate. The key *split* still
  happens so the carry chain stays in lockstep with the rollout
  (reference ``sampling_layers.py:92-101``), but no random draw is
  consumed — replay is RNG-free, enabling the time-fused replay path
  (``StatefulModule.replay_time_static``).

The ``deterministic`` flag (set functionally by ``network.eval()``)
returns the distribution mean instead of sampling — orthogonal to
replay (reference ``sampling_layers.py:20-23``).

RNG (TPU-first design): per-env PRNG keys live in the carry state — see
``nnx_ppo_tpu/networks/types.py`` module docstring. The carry is a
``[B]`` key array; every forward splits each env's key into
(next, action-noise, entropy-noise), so the key advance is identical in
rollout, replay, and deterministic mode. Keys survive episode resets.
"""

from __future__ import annotations

import abc
from typing import Optional

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import field, pytree_dataclass, static_field
from nnx_ppo_tpu.networks.types import (
    ModuleOutput,
    StatefulModule,
    make_per_env_keys,
    split_per_env_keys,
)


class ActionSampler(StatefulModule, abc.ABC):
    """Base class for samplers: consume distribution parameters, emit a
    ``{"action", "log_likelihood"}`` dict plus replay extras."""

    deterministic: bool = False


@pytree_dataclass
class NormalTanhSampler(ActionSampler):
    """Normal distribution followed by tanh squashing.

    ``mean_and_std`` input is ``[B, 2 * action_dim]`` (mean ‖ raw-std);
    std is ``(softplus(raw_std) + min_std) * std_scale``. Entropy bonus
    enters as a *negative* regularization loss. Log-likelihood includes
    the numerically stable tanh log-det correction
    ``2 * (log 2 - z - softplus(-2 z))``.
    """

    base_key: jax.Array = field(role="rng")
    entropy_weight: float = static_field(default=0.0)
    min_std: float = static_field(default=1e-3)
    std_scale: float = static_field(default=1.0)
    deterministic: bool = static_field(default=False)

    @classmethod
    def create(
        cls,
        key: jax.Array,
        entropy_weight: float = 1e-2,
        min_std: float = 1e-3,
        std_scale: float = 1.0,
    ) -> "NormalTanhSampler":
        return cls(
            base_key=key,
            entropy_weight=entropy_weight,
            min_std=min_std,
            std_scale=std_scale,
        )

    def initialize_state(self, batch_size: int):
        return make_per_env_keys(self.base_key, batch_size)

    def reset_state(self, prev_state):
        # Per-env keys survive episode resets (fresh randomness, no reuse).
        return prev_state

    def __call__(
        self,
        state: jax.Array,
        mean_and_std: jax.Array,
        rollout_extras: Optional[dict] = None,
    ) -> ModuleOutput:
        next_keys, action_keys, entropy_keys = split_per_env_keys(state, 3)
        mean, std = jnp.split(mean_and_std, 2, axis=-1)
        std = (jax.nn.softplus(std) + self.min_std) * self.std_scale

        if rollout_extras is None:
            # ROLLOUT / INFERENCE: draw fresh noise from the carry keys
            # and snapshot everything replay needs into the extras.
            noise = jax.vmap(
                lambda k: jax.random.normal(k, mean.shape[1:], mean.dtype)
            )(action_keys)
            if self.deterministic:
                sampled_action = mean
            else:
                sampled_action = mean + std * noise
            raw_action = jax.lax.stop_gradient(sampled_action)
            entropy_noise = jax.vmap(
                lambda k: jax.random.normal(k, mean.shape[1:], mean.dtype)
            )(entropy_keys)
        else:
            # LOSS_REPLAY: consume the stored snapshot; no RNG is used,
            # which makes this module replay-time-static (see
            # ``StatefulModule.replay_time_static``).
            raw_action = rollout_extras["raw_action"]
            entropy_noise = rollout_extras["entropy_noise"]

        action = jnp.tanh(raw_action)
        loglikelihood = self._loglikelihood(raw_action, mean, std)
        entropy_cost = -self.entropy_weight * self._entropy(
            mean, std, entropy_noise
        )

        return ModuleOutput(
            next_state=next_keys,
            output={"action": action, "log_likelihood": loglikelihood},
            regularization_loss=entropy_cost,
            metrics={"mu": mean, "sigma": std},
            rollout_extras={
                "raw_action": raw_action,
                "entropy_noise": jax.lax.stop_gradient(entropy_noise),
            },
        )

    @property
    def replay_time_static(self) -> bool:
        return True

    def _loglikelihood(
        self, raw_action: jax.Array, mean: jax.Array, std: jax.Array
    ) -> jax.Array:
        z = raw_action
        log_unnormalized = -0.5 * jnp.square((z - mean) / std)
        log_normalization = 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(std)
        log_prob = log_unnormalized - log_normalization
        # Stable log|d/dz tanh(z)| (Brax-style; reference :130-133).
        log_det_jacobian = 2.0 * (jnp.log(2.0) - z - jax.nn.softplus(-2.0 * z))
        log_prob -= log_det_jacobian
        return jnp.sum(log_prob, axis=-1)

    def _entropy(
        self, mean: jax.Array, std: jax.Array, noise: jax.Array
    ) -> jax.Array:
        """Single-sample MC estimate of the tanh-Normal entropy; the
        noise is drawn at rollout time and stored in the extras so the
        replay estimate is bitwise-identical (and RNG-free)."""
        normal_entropy = 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(std)
        z = mean + std * jax.lax.stop_gradient(noise)
        log_det_jacobian = 2.0 * (jnp.log(2.0) - z - jax.nn.softplus(-2.0 * z))
        return jnp.sum(normal_entropy + log_det_jacobian, axis=-1)
