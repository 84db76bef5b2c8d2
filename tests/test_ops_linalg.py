"""ops/linalg.py: unrolled small-SPD Cholesky solve vs scipy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.ops import cholesky_solve_small


@pytest.mark.parametrize("n", [1, 2, 5, 9])
def test_matches_scipy_solve(n):
    key = jax.random.key(n)
    A = jax.random.normal(key, (64, n, n))
    # Well-conditioned SPD (diagonally dominated), like a mass matrix.
    M = jnp.einsum("bij,bkj->bik", A, A) + n * jnp.eye(n)
    rhs = jax.random.normal(jax.random.key(n + 100), (64, n))
    expected = jax.scipy.linalg.solve(M, rhs[..., None], assume_a="pos")[..., 0]
    got = cholesky_solve_small(M, rhs)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_unbatched_and_jit():
    M = jnp.array([[4.0, 1.0], [1.0, 3.0]])
    rhs = jnp.array([1.0, 2.0])
    x = jax.jit(cholesky_solve_small)(M, rhs)
    np.testing.assert_allclose(M @ x, rhs, rtol=1e-6)


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        cholesky_solve_small(jnp.eye(3), jnp.ones(4))


def test_gradients_flow():
    M = jnp.array([[4.0, 1.0], [1.0, 3.0]])
    rhs = jnp.array([1.0, 2.0])
    g = jax.grad(lambda r: cholesky_solve_small(M, r).sum())(rhs)
    # d(sum(M^-1 r))/dr = M^-T @ ones
    expected = jnp.linalg.solve(M.T, jnp.ones(2))
    np.testing.assert_allclose(g, expected, rtol=1e-5)


def test_blocked_path_matches_numpy_n18():
    """n=18 (quadruped size) takes the blocked vectorized path; must
    match a float64 numpy solve."""
    import numpy as np

    rng = np.random.default_rng(0)
    B, n = 32, 18
    A = rng.normal(size=(B, n, n))
    M = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    rhs = rng.normal(size=(B, n))
    expected = np.linalg.solve(M, rhs[..., None])[..., 0]
    got = cholesky_solve_small(
        jnp.asarray(M, jnp.float32), jnp.asarray(rhs, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-3)


def test_blocked_equals_unrolled_small_n():
    import numpy as np
    from nnx_ppo_tpu.ops.linalg import cholesky_solve_blocked

    rng = np.random.default_rng(1)
    B, n = 16, 6
    A = rng.normal(size=(B, n, n))
    M = jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(cholesky_solve_blocked(M, rhs)),
        np.asarray(cholesky_solve_small(M, rhs)),
        rtol=1e-4, atol=1e-4,
    )
