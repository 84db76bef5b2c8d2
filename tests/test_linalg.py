

"""Unit tests for the recursive triangular/SPD inverse kernels."""

import jax.numpy as jnp


def test_tri_lower_inverse_matches_dense():
    """Recursive block triangular inverse vs numpy, odd and even n."""
    import numpy as np

    from nnx_ppo_tpu.ops.linalg import (
        spd_inverse_from_factor,
        tri_lower_inverse,
    )

    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 5, 9, 18):
        A = rng.normal(size=(7, n, n)).astype(np.float32)
        L = np.tril(A) + 4.0 * np.eye(n, dtype=np.float32)
        X = np.asarray(tri_lower_inverse(jnp.asarray(L)))
        np.testing.assert_allclose(
            X @ L, np.broadcast_to(np.eye(n, dtype=np.float32), L.shape),
            atol=2e-5,
        )
        # SPD inverse from the factor: (L Lᵀ)⁻¹.
        Minv = np.asarray(spd_inverse_from_factor(jnp.asarray(L)))
        M = L @ np.swapaxes(L, -1, -2)
        np.testing.assert_allclose(
            Minv @ M, np.broadcast_to(np.eye(n, dtype=np.float32), M.shape),
            atol=5e-5,
        )
