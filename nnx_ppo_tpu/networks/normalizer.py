"""Online (Welford) input normalizer.

Capability parity with the reference Normalizer
(``nnx_ppo/networks/normalizer.py:35-137``): the forward pass is
**read-only** on the running statistics and emits its raw input as
``rollout_extras``; statistics are folded in once per training step via
:meth:`update_statistics` with a single batched Welford merge over the
``[T, B, *feat]`` history. Before any data has been folded in, the
fallback standard deviation is 10.0 (reference ``normalizer.py:72-77``).

TPU / multi-chip notes: statistics live as ``stats``-role leaves —
checkpointed, excluded from gradients, replicated across the mesh. The
Welford merge reduces over the flattened ``T*B`` sample axis with
``jnp.mean`` / ``jnp.sum``; under `jit` + `NamedSharding` with the env
axis sharded on ``data``, GSPMD lowers these to per-shard partial
reductions + an ``all-reduce`` over ICI automatically — the associative
merge formula distributes cleanly (SURVEY §2.6(c)), so no explicit
``psum`` is needed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import field, pytree_dataclass, static_field
from nnx_ppo_tpu.ops.welford import batch_moments, merge_moments
from nnx_ppo_tpu.networks.types import (
    ModuleOutput,
    StatefulModule,
    canonicalize_tree,
)


@pytree_dataclass
class Normalizer(StatefulModule):
    """Standardizes ``x`` to zero mean / unit variance using running
    statistics. Supports arbitrary pytrees of features."""

    mean: Any = field(role="stats")
    M2: Any = field(role="stats")
    counter: jax.Array = field(role="stats")
    epsilon: float = static_field(default=1e-6)

    @classmethod
    def create(cls, shape, epsilon: float = 1e-6) -> "Normalizer":
        """``shape`` is an int, tuple, or pytree of ints/tuples."""
        if isinstance(shape, (tuple, list, int)):
            mean = jnp.zeros(shape)
            M2 = jnp.zeros(shape)
        else:
            shape = canonicalize_tree(shape)
            is_shape = lambda s: isinstance(s, (tuple, int))
            mean = jax.tree.map(jnp.zeros, shape, is_leaf=is_shape)
            M2 = jax.tree.map(jnp.zeros, shape, is_leaf=is_shape)
        return cls(mean=mean, M2=M2, counter=jnp.array(0.0), epsilon=epsilon)

    def _std(self) -> Any:
        # Pre-warm-up fallback std of 10.0 until the first fold.
        warm = self.counter > 0
        count = jnp.maximum(self.counter, 1.0)
        return jax.tree.map(
            lambda m2: jnp.where(
                warm, jnp.sqrt(jnp.maximum(m2 / count, self.epsilon)), 10.0
            ),
            self.M2,
        )

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        x = canonicalize_tree(x)
        std = self._std()
        output = jax.tree.map(lambda v, m, s: (v - m) / s, x, self.mean, std)
        # Always emit the raw input as rollout_extras; update_statistics
        # folds the [T, B, ...] history after the gradient phase.
        return ModuleOutput((), output, jnp.array(0.0), {}, rollout_extras=x)

    @property
    def replay_time_static(self) -> bool:
        return True

    def update_statistics(self, rollout_extras: Any) -> "Normalizer":
        """Fold the ``[T, B, *feat]`` history into the running stats.

        Each leaf's history collapses to a ``(count, mean, M2)`` triple
        (:func:`~nnx_ppo_tpu.ops.welford.batch_moments`) which merges
        into the running triple via the associative parallel-variance
        rule (:func:`~nnx_ppo_tpu.ops.welford.merge_moments`) — so the
        fold distributes over sharded batches as per-shard partials +
        one GSPMD all-reduce.
        """

        def fold_leaf(running_mean, running_m2, history):
            # Reduce over (T, B) in place — no [T·B] reshape: collapsing
            # the sharded env axis would force GSPMD to ALL-GATHER the
            # whole history instead of reducing per shard (see
            # ops/welford.batch_moments).
            merged = merge_moments(
                (self.counter, running_mean, running_m2),
                batch_moments(history, n_batch_axes=2),
            )
            return merged[1], merged[2]

        folded = jax.tree.map(fold_leaf, self.mean, self.M2, rollout_extras)
        new_mean, new_M2 = jax.tree.transpose(
            jax.tree.structure(self.mean), jax.tree.structure((0, 0)), folded
        )
        first = jax.tree.leaves(rollout_extras)[0]
        n_samples = first.shape[0] * first.shape[1]
        return self.replace(
            mean=new_mean, M2=new_M2, counter=self.counter + n_samples
        )
