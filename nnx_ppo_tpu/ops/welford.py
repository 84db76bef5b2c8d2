"""Streaming-moment (Welford) primitives as ``(count, mean, M2)`` triples.

The parallel-variance merge (Chan et al. 1979) is associative, which is
what makes it TPU-native: per-shard partial moments reduce to the global
moments with a single all-reduce, and GSPMD derives that collective
automatically when the sample axis is sharded. The :class:`Normalizer`
folds its ``[T, B, *feat]`` rollout history through these helpers
(capability parity with reference ``nnx_ppo/networks/normalizer.py:98-136``,
re-expressed as moment-triple algebra).
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_moments(samples, n_batch_axes: int = 1) -> tuple:
    """Moments of a batch along its ``n_batch_axes`` leading axes.

    Returns ``(count, mean, M2)`` where ``M2`` is the sum of squared
    deviations from the batch mean (so ``var = M2 / count``).

    Multi-axis reduction matters for sharding: folding a ``[T, B, *f]``
    rollout history with ``n_batch_axes=2`` reduces over the sharded
    env axis IN PLACE, which GSPMD lowers to per-shard partials + one
    all-reduce — whereas reshaping to ``[T·B, *f]`` first (collapsing a
    sharded axis into a replicated-major one) forces an ALL-GATHER of
    the whole history (caught by
    tests/test_parallel.py::TestNoCrossShardGathers).
    """
    axes = tuple(range(n_batch_axes))
    count = 1
    for a in axes:
        count *= samples.shape[a]
    mean = jnp.mean(samples, axis=axes)
    m2 = jnp.sum(jnp.square(samples - mean[(None,) * n_batch_axes]), axis=axes)
    return count, mean, m2


def merge_moments(a: tuple, b: tuple) -> tuple:
    """Associative merge of two ``(count, mean, M2)`` triples.

    Safe when either side is empty (``count == 0``): the weight of the
    empty side degenerates to zero instead of dividing by zero.
    """
    n_a, mean_a, m2_a = a
    n_b, mean_b, m2_b = b
    total = n_a + n_b
    weight_b = n_b / jnp.maximum(total, 1)
    shift = mean_b - mean_a
    mean = mean_a + shift * weight_b
    m2 = m2_a + m2_b + jnp.square(shift) * (n_a * weight_b)
    return total, mean, m2
