"""Minibatch permutation indices, shard-locality aware.

The reference shuffles all envs globally per epoch
(``nnx_ppo/algorithms/ppo.py:284-294``). On a sharded env axis a global
permutation would turn every minibatch gather into an all-to-all over
ICI. Instead, on ``n_shards > 1`` we permute **within each shard block**
and compose each minibatch from an equal slice of every shard: the
gather is then communication-free (indices stay inside their shard) and
each minibatch still mixes data from all chips. With ``n_shards == 1``
this reduces to the reference's full global permutation.

This is an intentional, documented semantic deviation: the permutation
class is restricted (envs never migrate between shard blocks within an
epoch), which is statistically irrelevant for PPO minibatching since
env-to-shard assignment is itself arbitrary and i.i.d.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def minibatch_permutations(
    key: jax.Array,
    n_envs: int,
    n_epochs: int,
    n_minibatches: int,
    n_shards: int = 1,
) -> jax.Array:
    """Precompute all epoch×minibatch env-index permutations.

    Returns int32 ``[n_epochs * n_minibatches, n_envs // n_minibatches]``.
    Minibatch ``m`` of epoch ``e`` gathers ``x[:, inds[e * M + m]]``.
    """
    if n_envs % n_minibatches != 0:
        raise ValueError(
            f"n_envs ({n_envs}) must be divisible by n_minibatches ({n_minibatches})"
        )
    minibatch_size = n_envs // n_minibatches
    if n_shards > 1:
        if n_envs % n_shards != 0:
            raise ValueError(
                f"n_envs ({n_envs}) must be divisible by n_shards ({n_shards})"
            )
        if minibatch_size % n_shards != 0:
            raise ValueError(
                "minibatch size must be divisible by n_shards for shard-local "
                f"minibatching (got {minibatch_size} % {n_shards})"
            )

    def epoch_indices(epoch_idx: jax.Array) -> jax.Array:
        shuffle_key = jax.random.fold_in(key, epoch_idx)
        if n_shards == 1:
            perm = jax.random.permutation(shuffle_key, n_envs)
            return perm.reshape(n_minibatches, minibatch_size)
        per_shard = n_envs // n_shards
        shard_keys = jax.random.split(shuffle_key, n_shards)
        # [S, per_shard] local perms, offset into global env indices.
        local = jax.vmap(lambda k: jax.random.permutation(k, per_shard))(shard_keys)
        offsets = (jnp.arange(n_shards) * per_shard)[:, None]
        global_inds = local + offsets  # [S, per_shard]
        # Minibatch m takes columns [m*k : (m+1)*k] of every shard row,
        # k = per_shard // n_minibatches. Layout keeps each minibatch's
        # indices grouped by shard so the gather stays shard-local.
        k = per_shard // n_minibatches
        by_minibatch = global_inds.reshape(n_shards, n_minibatches, k)
        return jnp.transpose(by_minibatch, (1, 0, 2)).reshape(
            n_minibatches, minibatch_size
        )

    all_indices = jax.vmap(epoch_indices)(jnp.arange(n_epochs))
    return all_indices.reshape(n_epochs * n_minibatches, minibatch_size).astype(
        jnp.int32
    )


def minibatch_plan(
    n_envs: int,
    n_epochs: int,
    n_minibatches: int,
    n_shards: int = 1,
    *,
    shuffle: bool = True,
    key: Optional[jax.Array] = None,
    batch_major: bool = False,
) -> tuple[
    jax.Array,
    Callable[[Any, jax.Array], Any],
    Callable[[Any, jax.Array], Any],
]:
    """Build the E·M minibatch extraction plan shared by ``ppo_step``
    and ``distillation_step``.

    Returns ``(selectors, take_seq, take_batch)``:

    * ``selectors`` — ``[n_epochs · n_minibatches, ...]`` scan xs; one
      row per gradient update.
    * ``take_seq(leaf, sel)`` — extract one minibatch from a rollout
      *sequence* buffer: ``[T, B, ...]`` when time-major (env axis 1),
      ``[B, T, ...]`` when ``batch_major`` (env axis 0 — the gather's
      native output layout, see ``PPOConfig.rollout_layout``; an
      explicitly FLATTENED ``[B·T]`` row-gather variant was measured
      far slower on TPU — 7.7M vs 12.4M env-steps/s on the quadruped
      megakernel config — gathers want few large rows).
    * ``take_batch(leaf, sel)`` — extract one minibatch from a per-env
      ``[B, ...]`` leaf (network carries, bootstrap obs).

    ``shuffle=True`` uses :func:`minibatch_permutations` (per-minibatch
    permutation gathers — the measured fused-optimal form of shuffled
    minibatching). ``shuffle=False`` takes contiguous shard-local
    dynamic slices instead (no gathers; minibatches are fixed env
    blocks within an iteration).
    """
    if shuffle:
        if key is None:
            raise ValueError("shuffle=True requires a permutation key")
        selectors = minibatch_permutations(
            key, n_envs, n_epochs, n_minibatches, n_shards
        )

        def take_batch(x, inds):
            return x[inds]

        if batch_major:
            take_seq = take_batch
        else:

            def take_seq(x, inds):
                return x[:, inds]

        return selectors, take_seq, take_batch

    # Contiguous shard-local minibatch slices — no permutation gathers,
    # no post-gather layout copies (together ~16% of the step in the
    # quadruped device profile; +21% measured train_sps). Minibatch m =
    # rows [m·k, (m+1)·k) of every shard block; fresh rollouts still
    # re-randomize content each iteration.
    if n_envs % n_shards != 0:
        raise ValueError(
            f"n_envs ({n_envs}) must be divisible by n_shards ({n_shards})"
        )
    per_block = n_envs // n_shards
    if per_block % n_minibatches != 0:
        raise ValueError(
            "per-shard env count must be divisible by n_minibatches "
            f"(got {per_block} % {n_minibatches})"
        )
    k_quota = per_block // n_minibatches
    selectors = jnp.tile(jnp.arange(n_minibatches), n_epochs)

    def _block_slice(x, m, axis):
        shape = x.shape
        xs = x.reshape(shape[:axis] + (n_shards, per_block) + shape[axis + 1:])
        sl = jax.lax.dynamic_slice_in_dim(xs, m * k_quota, k_quota, axis=axis + 1)
        return sl.reshape(
            shape[:axis] + (n_shards * k_quota,) + shape[axis + 1:]
        )

    def take_seq(x, m):
        return _block_slice(x, m, 0 if batch_major else 1)

    def take_batch(x, m):
        return _block_slice(x, m, 0)

    return selectors, take_seq, take_batch
