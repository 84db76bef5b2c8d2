"""Container routing tests: state/extras/metrics/reg-loss are routed
per child identically across all containers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.networks import (
    Concat,
    Dense,
    Filter,
    Flattener,
    Map,
    Merge,
    NormalTanhSampler,
    Normalizer,
    PPOAdapter,
    Parallel,
    Scale,
    Sequential,
    Splitter,
    make_mlp,
)


def key(i=0):
    return jax.random.key(i)


class TestSequential:
    def test_chain_and_state_routing(self):
        seq = Sequential.create(
            [Dense.create(4, 8, key(0), jax.nn.relu), Dense.create(8, 2, key(1))]
        )
        state = seq.initialize_state(3)
        assert len(state) == 2
        out = seq(state, jnp.ones((3, 4)))
        assert out.output.shape == (3, 2)
        assert len(out.next_state) == 2
        assert set(out.metrics.keys()) == {0, 1}

    def test_getitem_len(self):
        seq = make_mlp([4, 8, 2], key(0))
        assert len(seq) == 2
        assert isinstance(seq[0], Dense)

    def test_extras_routing_with_normalizer(self):
        seq = Sequential.create([Normalizer.create(4), Dense.create(4, 2, key(0))])
        state = seq.initialize_state(3)
        x = jnp.ones((3, 4))
        out = seq(state, x)
        # extras tuple: (normalizer's raw input, None for dense)
        np.testing.assert_array_equal(out.rollout_extras[0], x)
        assert out.rollout_extras[1] is None
        # replay accepts the emitted extras
        replay = seq(state, x, out.rollout_extras)
        np.testing.assert_allclose(replay.output, out.output)

    def test_update_statistics_functional(self):
        seq = Sequential.create([Normalizer.create(2), Dense.create(2, 2, key(0))])
        extras = (jnp.ones((5, 3, 2)), None)
        new_seq = seq.update_statistics(extras)
        assert float(new_seq[0].counter) == 15
        assert float(seq[0].counter) == 0  # original untouched

    def test_reg_loss_summed(self):
        class Reg(Dense):
            pass

        s1 = NormalTanhSampler.create(key(0), entropy_weight=1.0)
        seq = Sequential.create([Dense.create(4, 8, key(1)), s1])
        state = seq.initialize_state(2)
        out = seq(state, jnp.ones((2, 4)))
        np.testing.assert_allclose(
            out.regularization_loss,
            seq[1](state[1], seq[0](state[0], jnp.ones((2, 4))).output)
            .regularization_loss,
            atol=1e-6,
        )


class TestConcat:
    def test_per_key_dispatch_concat(self):
        c = Concat.create(
            a=Dense.create(2, 3, key(0)), b=Dense.create(4, 5, key(1))
        )
        state = c.initialize_state(2)
        x = {"a": jnp.ones((2, 2)), "b": jnp.ones((2, 4))}
        out = c(state, x)
        assert out.output.shape == (2, 8)
        assert set(out.next_state.keys()) == {"a", "b"}

    def test_positional_dict(self):
        c = Concat.create({"k 1": Dense.create(2, 3, key(0))})
        out = c(c.initialize_state(2), {"k 1": jnp.ones((2, 2))})
        assert out.output.shape == (2, 3)

    def test_both_forms_error(self):
        with pytest.raises(ValueError):
            Concat.create({"a": Dense.create(2, 3, key(0))}, b=Dense.create(2, 3, key(1)))

    def test_empty_error(self):
        with pytest.raises(ValueError):
            Concat.create()


class TestParallel:
    def test_fanout(self):
        p = Parallel.create(
            left=Dense.create(4, 2, key(0)), right=Dense.create(4, 3, key(1))
        )
        out = p(p.initialize_state(2), jnp.ones((2, 4)))
        assert out.output["left"].shape == (2, 2)
        assert out.output["right"].shape == (2, 3)


class TestSplitter:
    def test_named_slices(self):
        s = Splitter.create(a=2, b=3)
        out = s((), jnp.arange(12.0).reshape(2, 6))
        np.testing.assert_array_equal(out.output["a"], [[0, 1], [6, 7]])
        np.testing.assert_array_equal(out.output["b"], [[2, 3, 4], [8, 9, 10]])
        # excess feature (col 5/11) silently dropped

    def test_positive_sizes(self):
        with pytest.raises(ValueError):
            Splitter.create(a=0)


class TestFlattener:
    def test_flatten_all(self):
        f = Flattener.create()
        x = {"a": jnp.ones((2, 3, 4)), "b": jnp.ones((2, 5))}
        out = f((), x)
        assert out.output.shape == (2, 17)

    def test_preserve_levels(self):
        f = Flattener.create(preserve_levels=1)
        x = {"a": {"p": jnp.ones((2, 4)), "t": jnp.ones((2, 8))}, "b": jnp.ones((2, 6))}
        out = f((), x)
        assert out.output["a"].shape == (2, 12)
        assert out.output["b"].shape == (2, 6)

    def test_leaf_at_preserved_level_raises(self):
        f = Flattener.create(preserve_levels=2)
        with pytest.raises(TypeError):
            f((), {"a": jnp.ones((2, 3))})


class TestFilter:
    def test_str_tuple_callable(self):
        f = Filter.create(
            {
                "x": "a",
                "y": ("b", "c"),
                "z": lambda t: t["a"] * 2,
            }
        )
        x = {"a": jnp.ones((2, 3)), "b": {"c": jnp.zeros((2, 1))}}
        out = f((), x)
        assert out.output["x"].shape == (2, 3)
        assert out.output["y"].shape == (2, 1)
        np.testing.assert_array_equal(out.output["z"], 2 * x["a"])

    def test_bad_spec(self):
        with pytest.raises(TypeError):
            Filter.create({"x": 3})


class TestScaleMergeMap:
    def test_scale(self):
        s = Scale.create(2.5)
        out = s((), {"a": jnp.ones(3)})
        np.testing.assert_array_equal(out.output["a"], 2.5 * jnp.ones(3))

    def test_merge(self):
        m = Merge.create(
            one=Splitter.create(a=1),
            two=Splitter.create(b=2),
        )
        out = m(m.initialize_state(2), jnp.ones((2, 4)))
        assert set(out.output.keys()) == {"a", "b"}

    def test_merge_duplicate_key_error(self):
        m = Merge.create(one=Splitter.create(a=1), two=Splitter.create(a=2))
        with pytest.raises(ValueError):
            m(m.initialize_state(2), jnp.ones((2, 4)))

    def test_map_per_key(self):
        m = Map.create(p=Dense.create(2, 3, key(0)), q=Scale.create(3.0))
        x = {"p": jnp.ones((2, 2)), "q": jnp.ones((2, 5)), "extra": jnp.zeros((2, 1))}
        out = m(m.initialize_state(2), x)
        assert set(out.output.keys()) == {"p", "q"}
        np.testing.assert_array_equal(out.output["q"], 3 * x["q"])


class TestPPOAdapter:
    def make(self):
        actor = Sequential.create(
            [
                Dense.create(4, 4, key(0)),
                NormalTanhSampler.create(key(1), entropy_weight=0.0),
            ]
        )
        critic = Dense.create(4, 1, key(2))
        return PPOAdapter.create(action=actor, value=critic)

    def test_packages_output(self):
        ad = self.make()
        state = ad.initialize_state(3)
        out = ad(state, jnp.ones((3, 4)))
        ppo_out = out.output
        assert ppo_out.actions.shape == (3, 2)
        assert ppo_out.loglikelihoods.shape == (3,)
        assert ppo_out.value_estimates.shape == (3,)  # [B,1] squeezed

    def test_replay_routing(self):
        ad = self.make()
        state = ad.initialize_state(3)
        out = ad(state, jnp.ones((3, 4)))
        replay = ad(state, jnp.ones((3, 4)), out.rollout_extras)
        np.testing.assert_allclose(
            replay.output.loglikelihoods, out.output.loglikelihoods, atol=1e-6
        )

    def test_sampler_bank_tree(self):
        bank = Map.create(
            u=Sequential.create(
                [Dense.create(4, 2, key(0)), NormalTanhSampler.create(key(1), 0.0)]
            ),
            v=Sequential.create(
                [Dense.create(4, 4, key(2)), NormalTanhSampler.create(key(3), 0.0)]
            ),
        )
        trunk = Parallel.create(u=Scale.create(1.0), v=Scale.create(1.0))
        ad = PPOAdapter.create(
            action=Sequential.create([trunk, bank]),
            value=Dense.create(4, 1, key(4)),
        )
        state = ad.initialize_state(2)
        out = ad(state, jnp.ones((2, 4)))
        assert out.output.actions["u"].shape == (2, 1)
        assert out.output.actions["v"].shape == (2, 2)
        assert out.output.loglikelihoods["u"].shape == (2,)


class TestRoutingIsomorphismCheck:
    def test_sequential_rejects_mismatched_extras(self):
        """Silent zip truncation used to let a sampler re-sample in
        replay when distilling between non-isomorphic networks."""
        import pytest
        from nnx_ppo_tpu.networks import Dense, Sequential

        seq = Sequential.create(
            [Dense.create(3, 4, jax.random.key(0)), Dense.create(4, 2, jax.random.key(1))]
        )
        state = seq.initialize_state(2)
        x = jnp.ones((2, 3))
        with pytest.raises(ValueError, match="isomorphic"):
            seq(state, x, (None,))  # extras for only one layer
        with pytest.raises(ValueError, match="isomorphic"):
            seq(state[:1], x)  # carry for only one layer


class TestConcatOrderStability:
    def test_order_survives_pytree_roundtrip(self):
        """Dict pytrees re-sort keys on flatten; Concat must produce the
        same layout eagerly and after any tree operation (regression:
        insertion order silently permuted the concat under jit)."""
        c = Concat.create(z=Dense.create(2, 2, key(0)), a=Dense.create(2, 3, key(1)))
        state = c.initialize_state(4)
        x = {"z": jnp.ones((4, 2)), "a": jnp.ones((4, 2))}
        eager = c(state, x).output
        roundtrip = jax.tree.map(lambda v: v, c)
        after = roundtrip(state, x).output
        np.testing.assert_array_equal(eager, after)
        jitted = jax.jit(lambda m, s, x: m(s, x).output)(c, state, x)
        np.testing.assert_array_equal(eager, jitted)
        # Sorted order: 'a' (3 cols) first, then 'z' (2 cols).
        assert eager.shape == (4, 5)
