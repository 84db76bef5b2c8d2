"""Dense layer (capability parity with reference
``nnx_ppo/networks/feedforward.py:13-51``), designed for the MXU.

TPU notes: the matmul is expressed as one batched ``[B, in] @ [in, out]``
dot — XLA tiles it onto the 128×128 systolic array and fuses the bias
add and activation into the same kernel. An optional ``compute_dtype``
(typically ``jnp.bfloat16``) casts the operands while accumulating in
float32 (``preferred_element_type``), doubling MXU throughput for large
widths. Parameters are stored in float32 for optimizer stability.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass, static_field
from nnx_ppo_tpu.networks.types import ModuleOutput, StatefulModule

# Deliberately un-parameterized: jax initializers take (key, shape[,
# dtype]) with a defaulted dtype, which strict Callable[...] params
# reject under the test suite's typeguard hook.
Initializer = Callable


@pytree_dataclass
class Dense(StatefulModule):
    """Linear layer + optional activation. Stateless (empty carry)."""

    kernel: jax.Array
    bias: Optional[jax.Array]
    activation: Optional[Callable] = static_field(default=None)
    compute_dtype: Any = static_field(default=None)

    @classmethod
    def create(
        cls,
        in_features: int,
        out_features: int,
        key: jax.Array,
        activation: Optional[Callable] = None,
        *,
        use_bias: bool = True,
        kernel_init: Optional[Initializer] = None,
        compute_dtype: Any = None,
    ) -> "Dense":
        if kernel_init is None:
            kernel_init = jax.nn.initializers.lecun_normal()
        kernel = kernel_init(key, (in_features, out_features), jnp.float32)
        bias = jnp.zeros((out_features,), jnp.float32) if use_bias else None
        return cls(
            kernel=kernel,
            bias=bias,
            activation=activation,
            compute_dtype=compute_dtype,
        )

    @property
    def in_features(self) -> int:
        return self.kernel.shape[0]

    @property
    def out_features(self) -> int:
        return self.kernel.shape[1]

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        kernel = self.kernel
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            kernel = kernel.astype(self.compute_dtype)
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias
        if self.activation is not None:
            y = self.activation(y)
        return ModuleOutput((), y, jnp.array(0.0), {}, None)

    @property
    def replay_time_static(self) -> bool:
        return True
