"""Recurrent layers: LSTM and GRU.

Capability parity with the reference LSTM
(``nnx_ppo/networks/recurrent.py:16-161``), plus a GRU (the BASELINE
benchmark suite includes a recurrent-GRU config). Implemented directly
on the MXU rather than wrapping flax cells: each step is two fused
matmuls — ``x @ W_i [in, G·H]`` and ``h @ W_h [H, G·H]`` — with all G
gates computed in one product each, so XLA tiles a single large matmul
per direction instead of G small ones.

Carry: ``(h, c)`` for LSTM, ``h`` for GRU, each ``[B, H]``. The carry is
reset at episode boundaries to zeros, or to a **trainable initial
state** broadcast over the batch when ``trainable_initial_state=True``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass, static_field
from nnx_ppo_tpu.networks.types import ModuleOutput, StatefulModule

LSTMCarry = tuple[jax.Array, jax.Array]


@pytree_dataclass
class LSTM(StatefulModule):
    """LSTM layer conforming to the StatefulModule interface.

    Gate layout along the last axis of the fused kernels: (i, f, g, o).
    """

    wi: jax.Array  # [in_features, 4 * hidden]
    wh: jax.Array  # [hidden, 4 * hidden]
    bias: jax.Array  # [4 * hidden]
    initial_h: Optional[jax.Array]  # [hidden] or None
    initial_c: Optional[jax.Array]
    gate_fn: Callable = static_field(default=jax.nn.sigmoid)
    activation_fn: Callable = static_field(default=jnp.tanh)
    # Unroll factor for the replay-time scan over T. Hypothesis tested
    # on v5e (suite `cartpole_gru_unroll*` pins, 2026-08-19): unrolling
    # the tiny [B, H]×[H, G·H] recurrence bodies HURTS — 12.96M
    # env-steps/s at unroll=1 vs 8.6M/7.8M at 4/8 (the larger loop body
    # defeats XLA's cross-iteration pipelining of the small matmuls),
    # so per-iteration scan bookkeeping is NOT the recurrent-replay
    # floor. Default stays 1; the knob remains for other shapes.
    replay_unroll: int = static_field(default=1)

    @classmethod
    def create(
        cls,
        in_features: int,
        hidden_features: int,
        key: jax.Array,
        *,
        gate_fn: Callable = jax.nn.sigmoid,
        activation_fn: Callable = jnp.tanh,
        kernel_init: Optional[Callable] = None,
        recurrent_kernel_init: Optional[Callable] = None,
        bias_init: Optional[Callable] = None,
        trainable_initial_state: bool = False,
    ) -> "LSTM":
        kernel_init = kernel_init or jax.nn.initializers.lecun_normal()
        recurrent_kernel_init = recurrent_kernel_init or jax.nn.initializers.orthogonal()
        bias_init = bias_init or jax.nn.initializers.zeros
        ki, kh = jax.random.split(key)
        # Per-gate init columns, concatenated — matches initializing four
        # separate [in, H] kernels then fusing.
        wi = jnp.concatenate(
            [
                kernel_init(jax.random.fold_in(ki, g), (in_features, hidden_features))
                for g in range(4)
            ],
            axis=1,
        )
        wh = jnp.concatenate(
            [
                recurrent_kernel_init(
                    jax.random.fold_in(kh, g), (hidden_features, hidden_features)
                )
                for g in range(4)
            ],
            axis=1,
        )
        bias = bias_init(key, (4 * hidden_features,))
        init = (
            jnp.zeros((hidden_features,)) if trainable_initial_state else None
        )
        return cls(
            wi=wi,
            wh=wh,
            bias=bias,
            initial_h=init,
            initial_c=init,
            gate_fn=gate_fn,
            activation_fn=activation_fn,
        )

    @property
    def in_features(self) -> int:
        return self.wi.shape[0]

    @property
    def hidden_features(self) -> int:
        return self.wh.shape[0]

    def __call__(self, state: LSTMCarry, x, rollout_extras: Any = None) -> ModuleOutput:
        h, c = state
        gates = (
            jnp.dot(x, self.wi, preferred_element_type=jnp.float32)
            + jnp.dot(h, self.wh, preferred_element_type=jnp.float32)
            + self.bias
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = self.gate_fn(f) * c + self.gate_fn(i) * self.activation_fn(g)
        new_h = self.gate_fn(o) * self.activation_fn(new_c)
        return ModuleOutput(
            next_state=(new_h, new_c),
            output=new_h,
            regularization_loss=jnp.zeros(x.shape[0]),
            metrics={},
            rollout_extras=None,
        )

    def initialize_state(self, batch_size: int) -> LSTMCarry:
        H = self.hidden_features
        if self.initial_h is not None:
            h = jnp.broadcast_to(self.initial_h, (batch_size, H))
            c = jnp.broadcast_to(self.initial_c, (batch_size, H))
        else:
            h = jnp.zeros((batch_size, H))
            c = jnp.zeros((batch_size, H))
        return (h, c)

    def reset_state(self, prev_state: LSTMCarry) -> LSTMCarry:
        if self.initial_h is not None:
            return (
                jnp.broadcast_to(self.initial_h, prev_state[0].shape),
                jnp.broadcast_to(self.initial_c, prev_state[1].shape),
            )
        return (jnp.zeros_like(prev_state[0]), jnp.zeros_like(prev_state[1]))

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        """Sequence replay with the input projection hoisted out of the
        scan: ``x @ W_i`` for all T steps runs as ONE ``[T·B, in]``
        matmul on the MXU; only the ``h``-dependent half stays
        sequential. ~Halves the sequential matmul count of recurrent
        replay (the T·E·M hot loop, reference ``ppo.py:415-431``)."""
        del extras_seq
        xi_seq = (
            jnp.dot(obs_seq, self.wi, preferred_element_type=jnp.float32)
            + self.bias
        )  # [T, B, 4H]

        def step(carry, xs):
            h, c = carry
            xi, done = xs
            gates = xi + jnp.dot(h, self.wh, preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            new_c = self.gate_fn(f) * c + self.gate_fn(i) * self.activation_fn(g)
            new_h = self.gate_fn(o) * self.activation_fn(new_c)
            reset_h, reset_c = self.reset_state((new_h, new_c))
            d = done[:, None]
            next_carry = (
                jnp.where(d, reset_h, new_h),
                jnp.where(d, reset_c, new_c),
            )
            return next_carry, new_h

        final, out_seq = jax.lax.scan(
            step, state, (xi_seq, done_seq), unroll=self.replay_unroll
        )
        return out_seq, jnp.zeros(done_seq.shape), final


@pytree_dataclass
class GRU(StatefulModule):
    """GRU layer (flax.GRUCell semantics): gates (r, z) and candidate n
    with ``n = tanh(x @ Wi_n + b_n + r * (h @ Wh_n))``."""

    wi: jax.Array  # [in_features, 3 * hidden]   (r, z, n)
    wh: jax.Array  # [hidden, 3 * hidden]
    bias: jax.Array  # [3 * hidden]
    initial_h: Optional[jax.Array]
    gate_fn: Callable = static_field(default=jax.nn.sigmoid)
    activation_fn: Callable = static_field(default=jnp.tanh)
    # See LSTM.replay_unroll.
    replay_unroll: int = static_field(default=1)

    @classmethod
    def create(
        cls,
        in_features: int,
        hidden_features: int,
        key: jax.Array,
        *,
        kernel_init: Optional[Callable] = None,
        recurrent_kernel_init: Optional[Callable] = None,
        trainable_initial_state: bool = False,
    ) -> "GRU":
        kernel_init = kernel_init or jax.nn.initializers.lecun_normal()
        recurrent_kernel_init = recurrent_kernel_init or jax.nn.initializers.orthogonal()
        ki, kh = jax.random.split(key)
        wi = jnp.concatenate(
            [
                kernel_init(jax.random.fold_in(ki, g), (in_features, hidden_features))
                for g in range(3)
            ],
            axis=1,
        )
        wh = jnp.concatenate(
            [
                recurrent_kernel_init(
                    jax.random.fold_in(kh, g), (hidden_features, hidden_features)
                )
                for g in range(3)
            ],
            axis=1,
        )
        return cls(
            wi=wi,
            wh=wh,
            bias=jnp.zeros((3 * hidden_features,)),
            initial_h=jnp.zeros((hidden_features,))
            if trainable_initial_state
            else None,
        )

    @property
    def hidden_features(self) -> int:
        return self.wh.shape[0]

    def __call__(self, state: jax.Array, x, rollout_extras: Any = None) -> ModuleOutput:
        h = state
        xi = jnp.dot(x, self.wi, preferred_element_type=jnp.float32) + self.bias
        hh = jnp.dot(h, self.wh, preferred_element_type=jnp.float32)
        xr, xz, xn = jnp.split(xi, 3, axis=-1)
        hr, hz, hn = jnp.split(hh, 3, axis=-1)
        r = self.gate_fn(xr + hr)
        z = self.gate_fn(xz + hz)
        n = self.activation_fn(xn + r * hn)
        new_h = (1.0 - z) * n + z * h
        return ModuleOutput(
            next_state=new_h,
            output=new_h,
            regularization_loss=jnp.zeros(x.shape[0]),
            metrics={},
            rollout_extras=None,
        )

    def initialize_state(self, batch_size: int) -> jax.Array:
        if self.initial_h is not None:
            return jnp.broadcast_to(
                self.initial_h, (batch_size, self.hidden_features)
            )
        return jnp.zeros((batch_size, self.hidden_features))

    def reset_state(self, prev_state: jax.Array) -> jax.Array:
        if self.initial_h is not None:
            return jnp.broadcast_to(self.initial_h, prev_state.shape)
        return jnp.zeros_like(prev_state)

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        """Sequence replay with the input projection hoisted out of the
        scan (see ``LSTM.replay_sequence``)."""
        del extras_seq
        xi_seq = (
            jnp.dot(obs_seq, self.wi, preferred_element_type=jnp.float32)
            + self.bias
        )  # [T, B, 3H]

        def step(h, xs):
            xi, done = xs
            hh = jnp.dot(h, self.wh, preferred_element_type=jnp.float32)
            xr, xz, xn = jnp.split(xi, 3, axis=-1)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            r = self.gate_fn(xr + hr)
            z = self.gate_fn(xz + hz)
            n = self.activation_fn(xn + r * hn)
            new_h = (1.0 - z) * n + z * h
            next_h = jnp.where(done[:, None], self.reset_state(new_h), new_h)
            return next_h, new_h

        final, out_seq = jax.lax.scan(
            step, state, (xi_seq, done_seq), unroll=self.replay_unroll
        )
        return out_seq, jnp.zeros(done_seq.shape), final
