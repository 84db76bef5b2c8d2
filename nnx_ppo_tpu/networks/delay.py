"""k-step delay layer (capability parity with reference
``nnx_ppo/networks/delay.py:18-95``).

Output at time t is the input from time t − k_steps; before the buffer
fills (and after every episode reset) the output is ``initial_value``.

Carry state::

    {"buffer": <pytree mirroring the input, leaves [B, k_steps, *leaf]>,
     "idx":    <[B] int32 circular write pointer>}

TPU note: the read/write is a per-env gather/scatter over the ring
axis. ``k_steps`` is tiny (single digits), so instead of a gather we
select with a one-hot mask over the ring axis — pure VPU elementwise
work that XLA fuses, avoiding scatter lowering on TPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass, static_field
from nnx_ppo_tpu.networks.types import ModuleOutput, StatefulModule


@pytree_dataclass
class Delay(StatefulModule):
    """k-step delay over an arbitrary input pytree."""

    k_steps: int = static_field()
    initial_value: float = static_field(default=0.0)
    leaf_shapes: tuple = static_field(default=())
    leaf_dtypes: tuple = static_field(default=())
    treedef: Any = static_field(default=None)

    @classmethod
    def create(
        cls, sample_input: Any, k_steps: int, initial_value: float = 0.0
    ) -> "Delay":
        """``sample_input`` is a single *unbatched* example of the input
        pytree — only its shapes/dtypes/structure are captured."""
        if k_steps < 1:
            raise ValueError(f"k_steps must be >= 1, got {k_steps}")
        leaves, treedef = jax.tree_util.tree_flatten(sample_input)
        return cls(
            k_steps=k_steps,
            initial_value=initial_value,
            leaf_shapes=tuple(tuple(leaf.shape) for leaf in leaves),
            leaf_dtypes=tuple(jnp.dtype(leaf.dtype).name for leaf in leaves),
            treedef=treedef,
        )

    def __call__(self, state: dict, x: Any, rollout_extras: Any = None) -> ModuleOutput:
        idx = state["idx"]  # [B]
        batch_size = idx.shape[0]
        # One-hot over the ring axis: [B, k]. Read and write the slot
        # pointed at by idx with masked selects (VPU-friendly; no
        # gather/scatter on TPU).
        onehot = jax.nn.one_hot(idx, self.k_steps, dtype=jnp.bool_)  # [B, k]

        def read(b: jax.Array) -> jax.Array:
            m = onehot.reshape(onehot.shape + (1,) * (b.ndim - 2))
            return jnp.sum(jnp.where(m, b, 0), axis=1).astype(b.dtype)

        def write(b: jax.Array, x_: jax.Array) -> jax.Array:
            m = onehot.reshape(onehot.shape + (1,) * (b.ndim - 2))
            return jnp.where(m, jnp.expand_dims(x_, 1), b)

        delayed = jax.tree.map(read, state["buffer"])
        new_buffer = jax.tree.map(write, state["buffer"], x)
        new_idx = (idx + 1) % self.k_steps

        return ModuleOutput(
            next_state={"buffer": new_buffer, "idx": new_idx},
            output=delayed,
            regularization_loss=jnp.zeros(batch_size),
            metrics={},
            rollout_extras=None,
        )

    def initialize_state(self, batch_size: int) -> dict:
        buffer_leaves = [
            jnp.full((batch_size, self.k_steps) + shape, self.initial_value, dtype)
            for shape, dtype in zip(self.leaf_shapes, self.leaf_dtypes)
        ]
        buffer = jax.tree_util.tree_unflatten(self.treedef, buffer_leaves)
        return {"buffer": buffer, "idx": jnp.zeros(batch_size, jnp.int32)}

    def reset_state(self, prev_state: dict) -> dict:
        return {
            "buffer": jax.tree.map(
                lambda b: jnp.full_like(b, self.initial_value),
                prev_state["buffer"],
            ),
            "idx": jnp.zeros_like(prev_state["idx"]),
        }
