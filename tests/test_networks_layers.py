"""Per-layer unit tests: shapes, state, reset, determinism, and the
critical minibatch-slicing consistency pattern (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.networks import (
    GRU,
    LSTM,
    AR1VariationalBottleneck,
    Delay,
    Dense,
    NormalTanhSampler,
    Normalizer,
    VariationalBottleneck,
)


def minibatch_slicing_consistent(module, x, inds, atol=1e-6):
    """out(state[inds], x[inds]) must equal out(state, x)[inds]."""
    state = module.initialize_state(x.shape[0])
    full = module(state, x)
    sliced_state = jax.tree.map(lambda s: s[inds], state)
    sub = module(sliced_state, x[inds])
    for a, b in zip(
        jax.tree.leaves((sub.output, sub.next_state)),
        jax.tree.leaves(
            jax.tree.map(
                lambda v: v[inds] if hasattr(v, "shape") else v,
                (full.output, full.next_state),
            )
        ),
    ):
        if jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_allclose(a, b, atol=atol)


class TestDense:
    def test_shapes_and_activation(self):
        layer = Dense.create(4, 8, jax.random.key(0), activation=jax.nn.relu)
        out = layer((), jnp.ones((3, 4)))
        assert out.output.shape == (3, 8)
        assert (out.output >= 0).all()
        assert out.next_state == ()

    def test_no_bias(self):
        layer = Dense.create(4, 8, jax.random.key(0), use_bias=False)
        assert layer.bias is None
        assert layer((), jnp.zeros((2, 4))).output.sum() == 0

    def test_bf16_compute(self):
        layer = Dense.create(4, 8, jax.random.key(0), compute_dtype=jnp.bfloat16)
        out = layer((), jnp.ones((3, 4)))
        assert out.output.dtype == jnp.float32  # f32 accumulation


class TestNormalTanhSampler:
    def make(self):
        return NormalTanhSampler.create(jax.random.key(1), entropy_weight=0.01)

    def test_rollout_emits_replayable_extras(self):
        sampler = self.make()
        state = sampler.initialize_state(6)
        x = jnp.tile(jnp.arange(8.0), (6, 1))  # [6, 2*4]
        out = sampler(state, x)
        assert out.output["action"].shape == (6, 4)
        # Replay with stored extras from the SAME state → identical loglik.
        replay = sampler(state, x, out.rollout_extras)
        np.testing.assert_allclose(
            replay.output["log_likelihood"], out.output["log_likelihood"], atol=1e-6
        )
        np.testing.assert_array_equal(replay.output["action"], out.output["action"])

    def test_rng_advances_in_replay(self):
        sampler = self.make()
        state = sampler.initialize_state(4)
        x = jnp.ones((4, 6))
        out = sampler(state, x)
        replay = sampler(state, x, out.rollout_extras)
        # Next per-env keys advance identically in rollout and replay.
        np.testing.assert_array_equal(
            jax.random.key_data(out.next_state),
            jax.random.key_data(replay.next_state),
        )

    def test_deterministic_returns_tanh_mean(self):
        sampler = self.make().eval()
        state = sampler.initialize_state(3)
        mean = jnp.array([[0.3, -0.2]])
        x = jnp.concatenate([jnp.tile(mean, (3, 1)), jnp.zeros((3, 2))], axis=-1)
        out = sampler(state, x)
        np.testing.assert_allclose(
            out.output["action"], jnp.tile(jnp.tanh(mean), (3, 1)), atol=1e-6
        )

    def test_actions_differ_across_envs_and_steps(self):
        sampler = self.make()
        state = sampler.initialize_state(4)
        x = jnp.zeros((4, 6))
        out1 = sampler(state, x)
        out2 = sampler(out1.next_state, x)
        assert not jnp.allclose(out1.output["action"][0], out1.output["action"][1])
        assert not jnp.allclose(out1.output["action"], out2.output["action"])

    def test_keys_survive_reset(self):
        sampler = self.make()
        state = sampler.initialize_state(4)
        assert sampler.reset_state(state) is state

    def test_minibatch_slicing(self):
        sampler = self.make()
        x = jax.random.normal(jax.random.key(2), (8, 6))
        state = sampler.initialize_state(8)
        inds = jnp.array([1, 5, 2])
        # Replay path (deterministic given extras) must slice consistently.
        full = sampler(state, x)
        sub = sampler(
            jax.tree.map(lambda s: s[inds], state),
            x[inds],
            jax.tree.map(lambda e: e[inds], full.rollout_extras),
        )
        np.testing.assert_allclose(
            sub.output["log_likelihood"],
            full.output["log_likelihood"][inds],
            atol=1e-6,
        )

    def test_entropy_regularization_ordering(self):
        sampler = NormalTanhSampler.create(jax.random.key(1), entropy_weight=1.0)
        state = sampler.initialize_state(4)
        # Higher (moderate) std → more entropy → more-negative reg loss.
        low = jnp.concatenate([jnp.zeros((4, 2)), -5 * jnp.ones((4, 2))], axis=-1)
        mid = jnp.concatenate([jnp.zeros((4, 2)), jnp.zeros((4, 2))], axis=-1)
        out_low = sampler(state, low)
        out_mid = sampler(state, mid)
        assert (out_mid.regularization_loss < out_low.regularization_loss).all()


class TestNormalizer:
    def test_prewarm_std_fallback(self):
        norm = Normalizer.create(3)
        out = norm((), jnp.full((2, 3), 20.0))
        np.testing.assert_allclose(out.output, 2.0)  # (20-0)/10

    def test_forward_never_writes(self):
        norm = Normalizer.create(3)
        x = jnp.ones((4, 3))
        _ = norm((), x)
        assert float(norm.counter) == 0.0
        assert jnp.all(norm.mean == 0)

    def test_welford_matches_true_moments(self):
        norm = Normalizer.create(4)
        data = jax.random.normal(jax.random.key(0), (10, 32, 4)) * 3.0 + 1.5
        # Fold in two chunks to exercise the merge.
        norm = norm.update_statistics(data[:5])
        norm = norm.update_statistics(data[5:])
        flat = np.asarray(data).reshape(-1, 4)
        np.testing.assert_allclose(np.asarray(norm.mean), flat.mean(0), rtol=1e-5)
        std = np.sqrt(np.asarray(norm.M2) / float(norm.counter))
        np.testing.assert_allclose(std, flat.std(0), rtol=1e-4)
        assert float(norm.counter) == 320

    def test_normalizes_after_update(self):
        norm = Normalizer.create(2)
        data = jax.random.normal(jax.random.key(1), (20, 64, 2)) * 5 + 3
        norm = norm.update_statistics(data)
        out = norm((), data.reshape(-1, 2))
        np.testing.assert_allclose(np.asarray(out.output).mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.output).std(0), 1.0, atol=1e-3)

    def test_pytree_shapes(self):
        norm = Normalizer.create({"a": 2, "b": (3,)})
        x = {"a": jnp.ones((4, 2)), "b": jnp.zeros((4, 3))}
        out = norm((), x)
        assert out.output["a"].shape == (4, 2)
        assert out.rollout_extras["a"] is x["a"]

    def test_emits_raw_input_as_extras(self):
        norm = Normalizer.create(3)
        x = jax.random.normal(jax.random.key(2), (4, 3))
        out = norm((), x)
        np.testing.assert_array_equal(out.rollout_extras, x)


class TestLSTM:
    def test_shapes_and_carry(self):
        lstm = LSTM.create(4, 16, jax.random.key(0))
        state = lstm.initialize_state(3)
        out = lstm(state, jnp.ones((3, 4)))
        assert out.output.shape == (3, 16)
        h, c = out.next_state
        assert h.shape == c.shape == (3, 16)
        assert not jnp.allclose(h, 0)

    def test_reset_zeros(self):
        lstm = LSTM.create(4, 8, jax.random.key(0))
        state = lstm(lstm.initialize_state(2), jnp.ones((2, 4))).next_state
        reset = lstm.reset_state(state)
        assert jnp.all(reset[0] == 0) and jnp.all(reset[1] == 0)

    def test_trainable_initial_state(self):
        lstm = LSTM.create(4, 8, jax.random.key(0), trainable_initial_state=True)
        assert lstm.initial_h is not None
        state = lstm.initialize_state(5)
        assert state[0].shape == (5, 8)
        from nnx_ppo_tpu.core.struct import partition_params

        params, _ = partition_params(lstm)
        assert params.initial_h is not None  # trainable

    def test_minibatch_slicing(self):
        lstm = LSTM.create(4, 8, jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (8, 4))
        minibatch_slicing_consistent(lstm, x, jnp.array([0, 3, 7]))

    def test_state_affects_output(self):
        lstm = LSTM.create(4, 8, jax.random.key(0))
        x = jnp.ones((2, 4))
        s0 = lstm.initialize_state(2)
        s1 = lstm(s0, x).next_state
        assert not jnp.allclose(lstm(s0, x).output, lstm(s1, x).output)


class TestGRU:
    def test_shapes(self):
        gru = GRU.create(4, 16, jax.random.key(0))
        out = gru(gru.initialize_state(3), jnp.ones((3, 4)))
        assert out.output.shape == (3, 16)

    def test_reset_and_slicing(self):
        gru = GRU.create(4, 8, jax.random.key(0))
        state = gru(gru.initialize_state(2), jnp.ones((2, 4))).next_state
        assert jnp.all(gru.reset_state(state) == 0)
        x = jax.random.normal(jax.random.key(1), (8, 4))
        minibatch_slicing_consistent(gru, x, jnp.array([2, 4]))


class TestDelay:
    def test_delays_by_k(self):
        delay = Delay.create(jnp.zeros(2), k_steps=3)
        state = delay.initialize_state(1)
        outs = []
        for t in range(6):
            out = delay(state, jnp.full((1, 2), float(t + 1)))
            outs.append(float(out.output[0, 0]))
            state = out.next_state
        assert outs == [0.0, 0.0, 0.0, 1.0, 2.0, 3.0]

    def test_initial_value(self):
        delay = Delay.create(jnp.zeros(2), k_steps=2, initial_value=7.0)
        out = delay(delay.initialize_state(3), jnp.zeros((3, 2)))
        assert jnp.all(out.output == 7.0)

    def test_reset_zeros_buffer(self):
        delay = Delay.create(jnp.zeros(1), k_steps=2)
        state = delay.initialize_state(1)
        state = delay(state, jnp.ones((1, 1))).next_state
        reset = delay.reset_state(state)
        assert jnp.all(reset["buffer"] == 0) and jnp.all(reset["idx"] == 0)

    def test_pytree_input(self):
        sample = {"a": jnp.zeros(2), "b": jnp.zeros(())}
        delay = Delay.create(sample, k_steps=2)
        state = delay.initialize_state(4)
        x = {"a": jnp.ones((4, 2)), "b": jnp.ones(4)}
        out = delay(state, x)
        assert out.output["a"].shape == (4, 2)
        assert out.output["b"].shape == (4,)

    def test_minibatch_slicing(self):
        delay = Delay.create(jnp.zeros(3), k_steps=2)
        x = jax.random.normal(jax.random.key(0), (6, 3))
        minibatch_slicing_consistent(delay, x, jnp.array([1, 4]))

    def test_k_must_be_positive(self):
        with pytest.raises(ValueError):
            Delay.create(jnp.zeros(1), k_steps=0)


class TestVariational:
    def test_output_and_kl(self):
        vb = VariationalBottleneck.create(3, jax.random.key(0), kl_weight=2.0)
        state = vb.initialize_state(4)
        x = jnp.zeros((4, 6))  # mean 0, log_std 0 → std ~ softplus(0)
        out = vb(state, x)
        assert out.output.shape == (4, 3)
        assert out.regularization_loss.shape == (4,)
        # KL(N(0, softplus(0)) || N(0,1)) > 0
        assert (out.regularization_loss > 0).all()

    def test_keys_survive_reset(self):
        vb = VariationalBottleneck.create(3, jax.random.key(0))
        state = vb.initialize_state(4)
        assert vb.reset_state(state) is state

    def test_ar1_nan_sentinel_zero_loss_and_grad(self):
        vb = AR1VariationalBottleneck.create(
            2, jax.random.key(0), kl_weight=0.0, ar1_weight=1.0
        )
        state = vb.initialize_state(3)
        assert jnp.isnan(state["last_z"]).all()

        def loss(x):
            out = vb(state, x)
            return out.regularization_loss.sum()

        x = jnp.ones((3, 4))
        # First post-reset step: AR1 term exactly zero, gradient finite.
        out = vb(state, x)
        np.testing.assert_allclose(out.metrics["l2_diff"], 0.0, atol=1e-7)
        g = jax.grad(loss)(x)
        assert jnp.isfinite(g).all()

    def test_ar1_penalizes_jumps(self):
        vb = AR1VariationalBottleneck.create(
            2, jax.random.key(0), kl_weight=0.0, ar1_weight=1.0, min_std=1e-6
        )
        state = vb.initialize_state(2)
        x0 = jnp.concatenate([jnp.zeros((2, 2)), -20 * jnp.ones((2, 2))], -1)
        out0 = vb(state, x0)  # z ≈ 0
        x1 = jnp.concatenate([5 * jnp.ones((2, 2)), -20 * jnp.ones((2, 2))], -1)
        out1 = vb(out0.next_state, x1)  # z ≈ 5 → big jump
        assert (out1.metrics["l2_diff"] > 20).all()

    def test_ar1_reset_restores_sentinel(self):
        vb = AR1VariationalBottleneck.create(2, jax.random.key(0))
        state = vb.initialize_state(2)
        state = vb(state, jnp.ones((2, 4))).next_state
        assert not jnp.isnan(state["last_z"]).any()
        reset = vb.reset_state(state)
        assert jnp.isnan(reset["last_z"]).all()
        np.testing.assert_array_equal(
            jax.random.key_data(reset["keys"]), jax.random.key_data(state["keys"])
        )


class TestWelfordOps:
    def test_multi_axis_moments_match_flat(self):
        """batch_moments(n_batch_axes=2) == the flat [T*B] reduction —
        the multi-axis form exists so a sharded env axis reduces in
        place (per-shard partials + all-reduce) instead of being
        all-gathered by the reshape (TestNoCrossShardGathers)."""
        import jax
        import numpy as np

        from nnx_ppo_tpu.ops.welford import batch_moments

        x = jax.random.normal(jax.random.key(3), (7, 11, 5))
        n2, m2, s2 = batch_moments(x, n_batch_axes=2)
        n1, m1, s1 = batch_moments(x.reshape(-1, 5))
        assert n2 == n1 == 77
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5)
