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

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        """Vectorized sequence replay — no scan.

        The delayed output is a time-shifted view of the input sequence:
        ``out[t] = x[t-k]`` unless a reset happened in steps
        ``[t-k, t-1]`` (then ``initial_value``) or ``t < k`` in the
        first episode segment (then the pre-rollout carry buffer slot).
        The final carry is reconstructed from the last ``k`` inputs with
        the same reset masking. All selects are static-k one-hots —
        VPU-elementwise, fuses with neighboring layers' batched replay.

        Exactness vs the step-wise scan is covered by tests
        (``tests/test_fused_replay.py``).
        """
        del extras_seq
        k = self.k_steps
        T, B = done_seq.shape
        idx0 = state["idx"]  # [B]
        done_i = done_seq.astype(jnp.int32)

        # prev_cs[t] = number of dones strictly before step t.
        cs = jnp.cumsum(done_i, axis=0)
        prev_cs = jnp.concatenate([jnp.zeros((1, B), cs.dtype), cs[:-1]], axis=0)
        # Dones in the window [t-k, t-1] (prev_cs[t-k] := 0 for t < k).
        # Pad must be min(k, T) rows so T < k_steps stays shape-correct.
        prev_cs_km = jnp.concatenate(
            [jnp.zeros((min(k, T), B), cs.dtype), prev_cs[: max(T - k, 0)]],
            axis=0,
        )
        window_clear = (prev_cs - prev_cs_km) == 0  # [T, B]
        first_segment = prev_cs == 0
        t_range = jnp.arange(T)[:, None]  # [T, 1]

        # Carry-buffer reads for t < k in the first segment: slot
        # (idx0 + t) % k. One-hot over the ring axis, static t ≤ k rows.
        slots = (idx0[None, :] + jnp.arange(min(k, T))[:, None]) % k  # [k', B]
        onehot = jax.nn.one_hot(slots, k, dtype=jnp.bool_)  # [k', B, k]

        use_carry = first_segment & (t_range < k)  # [T, B]
        use_shift = window_clear & (t_range >= k)  # [T, B]

        def per_leaf(x: jax.Array, buf: jax.Array) -> jax.Array:
            # x [T, B, *f]; buf [B, k, *f]
            feat_dims = x.ndim - 2
            # x_shift[t] = x[t-k] (initial_value for t < k).
            pad = jnp.full((min(k, T), *x.shape[1:]), self.initial_value, x.dtype)
            x_shift = jnp.concatenate([pad, x[: max(T - k, 0)]], axis=0)
            m = onehot.reshape(onehot.shape + (1,) * feat_dims)
            carry_read = jnp.sum(
                jnp.where(m, buf[None], 0), axis=2
            ).astype(x.dtype)  # [k', B, *f]
            pad = jnp.full((T - carry_read.shape[0], *carry_read.shape[1:]),
                           self.initial_value, x.dtype)
            carry_read = jnp.concatenate([carry_read, pad], axis=0)  # [T, B, *f]

            expand = (...,) + (None,) * feat_dims
            out = jnp.full_like(x, self.initial_value)
            out = jnp.where(use_shift[expand], x_shift, out)
            out = jnp.where(use_carry[expand], carry_read, out)
            return out

        out_seq = jax.tree.map(per_leaf, obs_seq, state["buffer"])

        # ---- final carry reconstruction ----
        # Last reset index per env (-1 if none in the window).
        r = jnp.max(
            jnp.where(done_seq.astype(bool), t_range, -1), axis=0
        )  # [B]
        any_reset = r >= 0
        idx_T = jnp.where(any_reset, (T - 1 - r) % k, (idx0 + T) % k)  # [B]

        def final_leaf(x: jax.Array, buf: jax.Array) -> jax.Array:
            feat_dims = x.ndim - 2
            new_buf = buf
            for j in range(1, k + 1):
                slot = (idx_T - j) % k  # [B]
                t_w = T - j  # static write step
                if t_w >= 0:
                    written = x[t_w]
                    # Survives only if written strictly after the reset.
                    valid = t_w > r
                    val = jnp.where(
                        valid.reshape((B,) + (1,) * feat_dims),
                        written,
                        jnp.full_like(written, self.initial_value),
                    )
                else:
                    # Before the window: original carry content survives
                    # only if no reset happened at all.
                    src_slot = (idx0 + t_w) % k  # == slot when no reset
                    oh_src = jax.nn.one_hot(src_slot, k, dtype=jnp.bool_)
                    m_src = oh_src.reshape(oh_src.shape + (1,) * feat_dims)
                    carried = jnp.sum(
                        jnp.where(m_src, buf, 0), axis=1
                    ).astype(x.dtype)
                    val = jnp.where(
                        (~any_reset).reshape((B,) + (1,) * feat_dims),
                        carried,
                        jnp.full_like(carried, self.initial_value),
                    )
                oh = jax.nn.one_hot(slot, k, dtype=jnp.bool_)  # [B, k]
                m = oh.reshape(oh.shape + (1,) * feat_dims)
                new_buf = jnp.where(m, jnp.expand_dims(val, 1), new_buf)
            return new_buf

        final_buffer = jax.tree.map(final_leaf, obs_seq, state["buffer"])
        final_state = {"buffer": final_buffer, "idx": idx_T.astype(jnp.int32)}
        return out_seq, jnp.zeros((T, B)), final_state

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
