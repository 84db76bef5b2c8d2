"""GAE correctness: scan vs a plain-NumPy reference loop, and the
Pallas kernel (interpret mode) vs scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.ops.gae import gae_pallas, gae_scan


def numpy_gae(rewards, values, last_value, done, truncated, lam, gamma):
    """Straightforward reverse loop (mirrors reference semantics:
    zero bootstrap on done, zero delta on truncated)."""
    T, B = rewards.shape
    vals = np.concatenate([values, last_value[None]], axis=0)
    adv = np.zeros((T, B))
    next_adv = np.zeros(B)
    for t in reversed(range(T)):
        next_value = np.where(done[t], 0.0, vals[t + 1])
        delta = rewards[t] + gamma * next_value - vals[t]
        delta = np.where(truncated[t], 0.0, delta)
        next_adv = delta + (1 - done[t]) * gamma * lam * next_adv
        adv[t] = next_adv
    return adv


def random_case(seed, T=13, B=7):
    rng = np.random.RandomState(seed)
    rewards = rng.randn(T, B).astype(np.float32)
    values = rng.randn(T, B).astype(np.float32)
    last_value = rng.randn(B).astype(np.float32)
    done = rng.rand(T, B) < 0.15
    truncated = done & (rng.rand(T, B) < 0.5)
    return rewards, values, last_value, done, truncated


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gae_scan_matches_numpy(seed):
    args = random_case(seed)
    lam, gamma = 0.95, 0.99
    got = gae_scan(*[jnp.asarray(a) for a in args], lam, gamma)
    want = numpy_gae(*args, lam, gamma)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gae_no_done_equals_discounted_sum():
    T, B = 5, 2
    rewards = np.ones((T, B), np.float32)
    values = np.zeros((T, B), np.float32)
    last = np.zeros(B, np.float32)
    done = np.zeros((T, B), bool)
    trunc = np.zeros((T, B), bool)
    adv = gae_scan(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(last),
        jnp.asarray(done), jnp.asarray(trunc), 1.0, 1.0,
    )
    np.testing.assert_allclose(adv[0], T)  # undiscounted return


def test_gae_pallas_interpret_matches_scan():
    args = random_case(7, T=16, B=128)
    lam, gamma = 0.9, 0.97
    jargs = [jnp.asarray(a) for a in args]
    want = gae_scan(*jargs, lam, gamma)
    got = gae_pallas(*jargs, lam, gamma, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gae_stops_gradient():
    args = [jnp.asarray(a) for a in random_case(3)]

    def loss(values):
        return gae_scan(args[0], values, args[2], args[3], args[4], 0.95, 0.99).sum()

    g = jax.grad(loss)(args[1])
    np.testing.assert_array_equal(g, jnp.zeros_like(args[1]))
