"""Vectorized replay_sequence of Delay and AR1VariationalBottleneck must
exactly reproduce the step-wise scan (outputs, reg losses, final carry)
under arbitrary done patterns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.core.struct import tree_where
from nnx_ppo_tpu.networks import AR1VariationalBottleneck, Delay


def _stepwise_replay_impl(module, state, obs_seq, done_seq, extras_seq):
    """Reference semantics: per-step __call__ + reset where done."""
    T = done_seq.shape[0]
    outs, regs = [], []
    s = state
    for t in range(T):
        e = None if extras_seq is None else jax.tree.map(lambda x: x[t], extras_seq)
        o = module(s, jax.tree.map(lambda x: x[t], obs_seq), e)
        outs.append(o.output)
        regs.append(o.regularization_loss)
        s = tree_where(done_seq[t], module.reset_state(o.next_state), o.next_state)
    stack = lambda xs: jax.tree.map(lambda *l: jnp.stack(l), *xs)
    return stack(outs), stack(regs), s


def stepwise_replay(module, state, obs_seq, done_seq, extras_seq):
    # jit with the module captured as a closure constant (modules with
    # PRNG-key leaves are unhashable, so they can't be static args).
    f = jax.jit(
        lambda s, o, d, e: _stepwise_replay_impl(module, s, o, d, e)
    )
    if extras_seq is None:
        return jax.jit(
            lambda s, o, d: _stepwise_replay_impl(module, s, o, d, None)
        )(state, obs_seq, done_seq)
    return f(state, obs_seq, done_seq, extras_seq)


@pytest.mark.parametrize("k,T", [(1, 9), (2, 9), (3, 9), (7, 9), (3, 2), (2, 1), (5, 4)])
@pytest.mark.parametrize("seed", [0, 1])
def test_delay_vectorized_matches_stepwise(k, T, seed):
    B, F = 5, 3
    delay = Delay.create(jnp.zeros(F), k_steps=k, initial_value=0.5)
    key = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    obs = jax.random.normal(k1, (T, B, F))
    done = jax.random.bernoulli(k2, 0.3, (T, B))

    # Non-trivial carry: step the delay a few times first (with resets)
    # so idx/buffer are mid-cycle.
    state = delay.initialize_state(B)
    warm = jax.random.normal(k3, (4, B, F))
    warm_done = jnp.zeros((4, B), bool).at[2, 1].set(True)
    _, _, state = stepwise_replay(delay, state, warm, warm_done, None)

    ref_out, _, ref_final = stepwise_replay(delay, state, obs, done, None)
    vec_out, _, vec_final = jax.jit(delay.replay_sequence)(state, obs, done, None)

    np.testing.assert_allclose(vec_out, ref_out, atol=1e-6)
    np.testing.assert_array_equal(vec_final["idx"], ref_final["idx"])
    np.testing.assert_allclose(
        vec_final["buffer"], ref_final["buffer"], atol=1e-6
    )


def test_delay_pytree_input():
    T, B = 6, 4
    sample = {"a": jnp.zeros(2), "b": jnp.zeros(3)}
    delay = Delay.create(sample, k_steps=2)
    obs = {
        "a": jax.random.normal(jax.random.key(0), (T, B, 2)),
        "b": jax.random.normal(jax.random.key(1), (T, B, 3)),
    }
    done = jax.random.bernoulli(jax.random.key(2), 0.25, (T, B))
    state = delay.initialize_state(B)
    ref_out, _, ref_final = stepwise_replay(delay, state, obs, done, None)
    vec_out, _, vec_final = jax.jit(delay.replay_sequence)(state, obs, done, None)
    for key in ("a", "b"):
        np.testing.assert_allclose(vec_out[key], ref_out[key], atol=1e-6)
        np.testing.assert_allclose(
            vec_final["buffer"][key], ref_final["buffer"][key], atol=1e-6
        )


@pytest.mark.parametrize("bptt", [True, False])
def test_ar1_vectorized_matches_stepwise(bptt):
    T, B, L = 7, 4, 3
    ar1 = AR1VariationalBottleneck.create(
        L, jax.random.key(0), kl_weight=0.3, ar1_weight=0.7,
        backprop_through_time=bptt,
    )
    obs = jax.random.normal(jax.random.key(1), (T, B, 2 * L))
    done = jax.random.bernoulli(jax.random.key(2), 0.3, (T, B))
    state = ar1.initialize_state(B)

    # Produce stored eps the way a rollout would (fresh per-step states
    # threaded), then replay both ways with those extras.
    extras = []
    s = state
    call = jax.jit(ar1.__call__)
    for t in range(T):
        o = call(s, obs[t])
        extras.append(o.rollout_extras)
        s = tree_where(done[t], ar1.reset_state(o.next_state), o.next_state)
    extras_seq = jnp.stack(extras)

    ref_out, ref_reg, ref_final = stepwise_replay(ar1, state, obs, done, extras_seq)
    vec_out, vec_reg, vec_final = jax.jit(ar1.replay_sequence)(
        state, obs, done, extras_seq
    )

    np.testing.assert_allclose(vec_out, ref_out, atol=1e-6)
    np.testing.assert_allclose(vec_reg, ref_reg, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        vec_final["last_z"], ref_final["last_z"], atol=1e-6
    )


def test_ar1_gradients_match_stepwise():
    """AR1 penalty gradients through the z chain must match the scan
    (incl. the NaN-sentinel zero-gradient at reset boundaries)."""
    T, B, L = 5, 3, 2
    ar1 = AR1VariationalBottleneck.create(L, jax.random.key(0))
    done = jnp.zeros((T, B), bool).at[2, 1].set(True)
    state = ar1.initialize_state(B)
    obs0 = jax.random.normal(jax.random.key(1), (T, B, 2 * L))
    extras = []
    s = state
    call = jax.jit(ar1.__call__)
    for t in range(T):
        o = call(s, obs0[t])
        extras.append(o.rollout_extras)
        s = tree_where(done[t], ar1.reset_state(o.next_state), o.next_state)
    extras_seq = jnp.stack(extras)

    def loss_step(obs):
        _, reg, _ = stepwise_replay(ar1, state, obs, done, extras_seq)
        return jnp.sum(jnp.stack(jax.tree.leaves(reg)))

    def loss_vec(obs):
        _, reg, _ = ar1.replay_sequence(state, obs, done, extras_seq)
        return jnp.sum(reg)

    g_step = jax.jit(jax.grad(loss_step))(obs0)
    g_vec = jax.jit(jax.grad(loss_vec))(obs0)
    np.testing.assert_allclose(g_vec, g_step, rtol=1e-5, atol=1e-6)
