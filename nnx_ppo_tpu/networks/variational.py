"""Variational bottleneck layers (capability parity with reference
``nnx_ppo/networks/variational.py``).

Both layers keep **per-env PRNG keys in the carry state** (the
reference does this too — it is the pattern this framework generalizes
to all stochastic layers): keys advance by a per-env split every step
and *survive* episode resets; the AR1 variant additionally carries
``last_z`` with a NaN sentinel marking reset boundaries, made
gradient-safe via ``where(isnan(prev_z), z, prev_z)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import field, pytree_dataclass, static_field
from nnx_ppo_tpu.networks.types import (
    ModuleOutput,
    StatefulModule,
    advance_per_env_keys,
    make_per_env_keys,
    split_per_env_keys,
)


@pytree_dataclass
class VariationalBottleneck(StatefulModule):
    """Reparameterized normal sample from ``[B, 2*latent]`` (mean ‖
    log_std), KL vs N(0, 1) as regularization loss."""

    base_key: jax.Array = field(role="rng")
    latent_size: int = static_field()
    kl_weight: float = static_field(default=1.0)
    min_std: float = static_field(default=1e-6)

    @classmethod
    def create(
        cls,
        latent_size: int,
        key: jax.Array,
        kl_weight: float = 1.0,
        min_std: float = 1e-6,
    ) -> "VariationalBottleneck":
        return cls(
            base_key=key,
            latent_size=latent_size,
            kl_weight=kl_weight,
            min_std=min_std,
        )

    def _sample(self, eps: jax.Array, x: jax.Array):
        mean, log_std = jnp.split(x, 2, axis=-1)
        std = jax.nn.softplus(log_std) + self.min_std
        z = mean + std * eps
        kl_per_dim = 0.5 * (
            jnp.square(mean) + jnp.square(std) - 2 * jnp.log(std) - 1
        )
        kl_divergence = jnp.sum(kl_per_dim, axis=-1)
        return mean, std, z, kl_divergence

    def __call__(self, state: jax.Array, x, rollout_extras: Any = None) -> ModuleOutput:
        next_keys, sample_keys = split_per_env_keys(state, 2)
        if rollout_extras is None:
            eps = jax.vmap(
                lambda k: jax.random.normal(k, (self.latent_size,))
            )(sample_keys)
        else:
            # LOSS_REPLAY: the reparameterization noise is snapshotted in
            # the extras, so replay reproduces the rollout's z exactly
            # (with gradients through mean/std) without touching the
            # carry RNG chain — this module is replay-time-static.
            eps = rollout_extras
        mean, std, z, kl_divergence = self._sample(eps, x)
        return ModuleOutput(
            next_state=next_keys,
            output=z,
            regularization_loss=self.kl_weight * kl_divergence,
            metrics={"mu": mean, "sigma": std, "kl_divergence": kl_divergence},
            rollout_extras=jax.lax.stop_gradient(eps),
        )

    @property
    def replay_time_static(self) -> bool:
        return True

    def initialize_state(self, batch_size: int) -> jax.Array:
        return make_per_env_keys(self.base_key, batch_size)

    def reset_state(self, prev_state: jax.Array) -> jax.Array:
        # Keep the per-env RNG chains across env resets.
        return prev_state


@pytree_dataclass
class AR1VariationalBottleneck(StatefulModule):
    """Variational bottleneck + AR(1) smoothness penalty ‖z − prev_z‖².

    ``last_z`` uses a NaN sentinel at reset boundaries; it is replaced
    by ``z`` before the difference so both the loss contribution and
    the gradient are exactly zero on the first post-reset step
    (reference ``variational.py:177-181``).
    """

    base_key: jax.Array = field(role="rng")
    latent_size: int = static_field()
    kl_weight: float = static_field(default=1.0)
    min_std: float = static_field(default=1e-6)
    ar1_weight: float = static_field(default=1.0)
    backprop_through_time: bool = static_field(default=True)

    @classmethod
    def create(
        cls,
        latent_size: int,
        key: jax.Array,
        kl_weight: float = 1.0,
        min_std: float = 1e-6,
        ar1_weight: float = 1.0,
        backprop_through_time: bool = True,
    ) -> "AR1VariationalBottleneck":
        return cls(
            base_key=key,
            latent_size=latent_size,
            kl_weight=kl_weight,
            min_std=min_std,
            ar1_weight=ar1_weight,
            backprop_through_time=backprop_through_time,
        )

    def _z_and_kl(self, x: jax.Array, eps: jax.Array):
        mean, log_std = jnp.split(x, 2, axis=-1)
        std = jax.nn.softplus(log_std) + self.min_std
        z = mean + std * eps
        kl_per_dim = 0.5 * (
            jnp.square(mean) + jnp.square(std) - 2 * jnp.log(std) - 1
        )
        return mean, std, z, jnp.sum(kl_per_dim, axis=-1)

    def _ar1_penalty(self, z: jax.Array, prev_z: jax.Array) -> jax.Array:
        # NaN-sentinel-safe AR1 term: zero value AND zero gradient right
        # after a reset.
        if not self.backprop_through_time:
            prev_z = jax.lax.stop_gradient(prev_z)
        safe_prev_z = jnp.where(jnp.isnan(prev_z), z, prev_z)
        return jnp.mean(jnp.square(z - safe_prev_z), axis=-1)

    def __call__(self, state: dict, x, rollout_extras: Any = None) -> ModuleOutput:
        keys = state["keys"]
        next_keys, sample_keys = split_per_env_keys(keys, 2)
        if rollout_extras is None:
            eps = jax.vmap(
                lambda k: jax.random.normal(k, (self.latent_size,))
            )(sample_keys)
        else:
            # Stored reparameterization noise → replay reproduces the
            # rollout's z exactly (gradients through mean/std).
            eps = rollout_extras
        mean, std, z, kl_divergence = self._z_and_kl(x, eps)
        l2_diff = self._ar1_penalty(z, state["last_z"])

        return ModuleOutput(
            next_state={"keys": next_keys, "last_z": z},
            output=z,
            regularization_loss=self.kl_weight * kl_divergence
            + self.ar1_weight * l2_diff,
            metrics={
                "mu": mean,
                "sigma": std,
                "kl_divergence": kl_divergence,
                "l2_diff": l2_diff,
            },
            rollout_extras=jax.lax.stop_gradient(eps),
        )

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        """Vectorized sequence replay: with the reparameterization noise
        stored in the extras, every ``z_t`` is a batched function of
        ``(x_t, eps_t)``; the AR(1) penalty needs only the time-shifted
        z sequence with the NaN sentinel re-inserted at episode
        boundaries — no scan at all."""
        mean, std, z_seq, kl_seq = self._z_and_kl(obs_seq, extras_seq)

        nan = jnp.full_like(z_seq[0], jnp.nan)
        prev_z = jnp.concatenate([state["last_z"][None], z_seq[:-1]], axis=0)
        # A reset after step t-1 (done_seq[t-1]) makes prev_z NaN at t.
        reset_before = jnp.concatenate(
            [jnp.zeros_like(done_seq[:1]), done_seq[:-1]], axis=0
        ).astype(bool)
        prev_z = jnp.where(reset_before[..., None], nan, prev_z)
        l2_seq = self._ar1_penalty(z_seq, prev_z)

        final_last_z = jnp.where(done_seq[-1][..., None], nan, z_seq[-1])
        # Advance the per-env RNG chain exactly as the step-wise scan
        # would (T next-key splits), so the T+1 bootstrap forward draws
        # eps independent of every eps consumed during the rollout.
        final_keys = advance_per_env_keys(state["keys"], done_seq.shape[0])
        final_state = {"keys": final_keys, "last_z": final_last_z}
        reg_seq = self.kl_weight * kl_seq + self.ar1_weight * l2_seq
        return z_seq, reg_seq, final_state

    def initialize_state(self, batch_size: int) -> dict:
        return {
            "keys": make_per_env_keys(self.base_key, batch_size),
            "last_z": jnp.full((batch_size, self.latent_size), jnp.nan),
        }

    def reset_state(self, prev_state: dict) -> dict:
        # RNG chains survive resets; last_z returns to the NaN sentinel.
        return {
            "keys": prev_state["keys"],
            "last_z": jnp.full_like(prev_state["last_z"], jnp.nan),
        }
