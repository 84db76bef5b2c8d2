"""Small batched linear-algebra kernels for articulated-body physics.

XLA's LAPACK-style ``cholesky``/``triangular_solve`` custom calls are
tuned for large matrices; for the tiny per-env systems of rigid-body
dynamics (n ≤ ~16 DoF) they leave ~3× on the table on TPU (measured
8192×5×5 solves: 4.8 ms via ``jax.scipy.linalg.solve(assume_a="pos")``
vs 1.7 ms here). :func:`cholesky_solve_small` fully unrolls the
factorization and the two triangular solves over the (static) matrix
dimension, so everything lowers to fused elementwise VPU ops over the
batch — no custom calls, no loops, vmap/scan/shard-transparent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


UNROLL_MAX_N = 10


def cholesky_solve_small(M: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve ``M x = rhs`` for symmetric positive-definite ``M``.

    Args:
      M: ``[..., n, n]`` SPD matrices (small static n; unrolled n² ops).
      rhs: ``[..., n]`` right-hand sides.

    Returns:
      ``[..., n]`` solutions. All ops are elementwise over the batch.

    For ``n <= UNROLL_MAX_N`` the factorization/solves are fully
    unrolled (measured ~3× over the LAPACK-style custom-call path for
    tiny per-env systems on TPU). Above that the unrolled graph's
    O(n³) scalar expressions dominate XLA *compile* time (an 18-dof
    quadruped inside a scanned substep pushed whole-program compiles
    past 10 minutes), so larger systems use the compact native
    ``cho_factor``/``cho_solve`` lowering instead.
    """
    n = M.shape[-1]
    if n > UNROLL_MAX_N:
        chol = jax.scipy.linalg.cholesky(M, lower=True)
        return jax.scipy.linalg.cho_solve((chol, True), rhs[..., None])[..., 0]
    if rhs.shape[-1] != n:
        raise ValueError(f"rhs last dim {rhs.shape[-1]} != n {n}")
    batch_shape = M.shape[:-2]
    zero = jnp.zeros(batch_shape, M.dtype)

    # Cholesky factorization M = L Lᵀ, unrolled over (i, j).
    L: list[list[jax.Array]] = [[zero] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j] - sum(
                (L[i][k] * L[j][k] for k in range(j)), zero
            )
            L[i][j] = jnp.sqrt(s) if i == j else s / L[j][j]

    # Forward substitution L y = rhs.
    y: list[jax.Array] = []
    for i in range(n):
        y.append(
            (rhs[..., i] - sum((L[i][k] * y[k] for k in range(i)), zero))
            / L[i][i]
        )

    # Back substitution Lᵀ x = y.
    x: list[jax.Array] = [zero] * n
    for i in reversed(range(n)):
        x[i] = (
            y[i] - sum((L[k][i] * x[k] for k in range(i + 1, n)), zero)
        ) / L[i][i]
    return jnp.stack(x, axis=-1)
