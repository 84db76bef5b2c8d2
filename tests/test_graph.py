"""PopulationGraph tests (reference ``graph_test.py`` strategy):
build/finalize validation, topo-order forward, delays, recurrence,
reset, and end-to-end inside a PPO step."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.networks import (
    Dense,
    NormalTanhSampler,
    PPOAdapter,
    Sequential,
    Filter,
)
from nnx_ppo_tpu.networks.graph import PopulationGraph
from nnx_ppo_tpu.test_dummies import MoveToCenterEnv
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def key(i=0):
    return jax.random.key(i)


def build_simple(activation=None):
    b = PopulationGraph.builder(key(0))
    b.add_input("inp", 2, input_from="x")
    b.add_population("hidden", 4, activation=activation)
    b.add_output("out", 3)
    b.connect("inp", "hidden")
    b.connect("hidden", "out")
    return b.finalize()


class TestBuild:
    def test_forward_shapes(self):
        g = build_simple(jnp.tanh)
        state = g.initialize_state(5)
        out = g(state, {"x": jnp.ones((5, 2))})
        assert out.output["out"].shape == (5, 3)

    def test_duplicate_population_error(self):
        b = PopulationGraph.builder(key(0))
        b.add_population("a", 2)
        with pytest.raises(ValueError):
            b.add_population("a", 3)

    def test_unknown_population_error(self):
        b = PopulationGraph.builder(key(0))
        b.add_population("a", 2)
        with pytest.raises(ValueError):
            b.connect("a", "nope")

    def test_delay0_cycle_detected(self):
        b = PopulationGraph.builder(key(0))
        b.add_population("a", 2)
        b.add_population("b", 2)
        b.connect("a", "b")
        b.connect("b", "a")
        with pytest.raises(ValueError, match="cycle"):
            b.finalize()

    def test_cycle_with_delay_allowed(self):
        b = PopulationGraph.builder(key(0))
        b.add_input("a", 2, input_from="x")
        b.add_output("b", 2)
        b.connect("a", "b")
        b.connect("b", "a", delay=1)  # recurrence via delay
        g = b.finalize()
        state = g.initialize_state(3)
        out = g(state, {"x": jnp.ones((3, 2))})
        assert out.output["b"].shape == (3, 2)

    def test_reciprocal(self):
        b = PopulationGraph.builder(key(0))
        b.add_population("a", 2)
        b.add_population("b", 3)
        b.connect("a", "b", delay=1, reciprocal=True)
        g = b.finalize()
        assert len(g.connections) == 2
        assert g.connections[1].src == "b"

    def test_reciprocal_with_transform_error(self):
        b = PopulationGraph.builder(key(0))
        b.add_population("a", 2)
        b.add_population("b", 2)
        with pytest.raises(ValueError):
            b.connect("a", "b", transform=Dense.create(2, 2, key(1)), reciprocal=True)

    def test_negative_delay_error(self):
        b = PopulationGraph.builder(key(0))
        b.add_population("a", 2)
        b.add_population("b", 2)
        with pytest.raises(ValueError):
            b.connect("a", "b", delay=-1)

    def test_output_to_renaming(self):
        b = PopulationGraph.builder(key(0))
        b.add_input("inp", 2, input_from="x")
        b.add_output("motor", 2, output_to="action_params")
        b.connect("inp", "motor")
        g = b.finalize()
        out = g(g.initialize_state(2), {"x": jnp.ones((2, 2))})
        assert "action_params" in out.output


class TestDelaySemantics:
    def build_delay_graph(self, d):
        # Identity transform so the delayed value is observable directly.
        class Identity(Dense):
            pass

        b = PopulationGraph.builder(key(0))
        b.add_input("inp", 1, input_from="x")
        b.add_output("out", 1)
        ident = Dense.create(1, 1, key(1), use_bias=True)
        ident = ident.replace(kernel=jnp.ones((1, 1)), bias=jnp.zeros((1,)))
        b.connect("inp", "out", transform=ident, delay=d)
        return b.finalize()

    @pytest.mark.parametrize("d", [1, 3])
    def test_delayed_read(self, d):
        g = self.build_delay_graph(d)
        state = g.initialize_state(1)
        outs = []
        for t in range(6):
            out = g(state, {"x": jnp.full((1, 1), float(t + 1))})
            outs.append(float(out.output["out"][0, 0]))
            state = out.next_state
        # Before fill: zeros; then input from t - d.
        expected = [0.0] * d + [float(t + 1) for t in range(6 - d)]
        assert outs == expected

    def test_reset_zeros_buffers(self):
        g = self.build_delay_graph(2)
        state = g.initialize_state(1)
        state = g(state, {"x": jnp.ones((1, 1))}).next_state
        reset = g.reset_state(state)
        assert jnp.all(reset["populations"]["inp"]["buffer"] == 0)
        assert jnp.all(reset["populations"]["inp"]["buffer_idx"] == 0)


class TestGraphInPPO:
    def test_graph_actor_ppo_step(self):
        b = PopulationGraph.builder(key(3))
        b.add_input("sensor", 2, input_from="obs")
        b.add_population("core", 8, activation=jnp.tanh)
        b.add_output("motor", 4)  # 2 * action_size for the sampler
        b.connect("sensor", "core")
        b.connect("core", "core", delay=1)  # recurrent self-loop
        b.connect("core", "motor")
        g = b.finalize()

        from nnx_ppo_tpu.networks import Flattener

        actor = Sequential.create(
            [
                Filter.create({"obs": lambda x: x}),
                g,
                Filter.create({"motor": "motor"}),
                Flattener.create(),
                NormalTanhSampler.create(key(4), entropy_weight=1e-3),
            ]
        )
        critic = Sequential.create([Dense.create(2, 16, key(5), jnp.tanh),
                                    Dense.create(16, 1, key(6))])
        net = PPOAdapter.create(action=actor, value=critic)

        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        cfg = PPOConfig(n_envs=8, rollout_length=5, n_epochs=2, n_minibatches=2)
        ts = new_training_state(env, net, cfg.n_envs, seed=0)
        opt = make_optimizer(cfg.learning_rate)
        step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
        for _ in range(2):
            ts, metrics = step(ts)
        assert jnp.isfinite(metrics["losses/actor/mean"])
        assert int(ts.steps_taken) == 2 * 8 * 5

    def test_update_statistics_routes_to_transforms(self):
        from nnx_ppo_tpu.networks import Normalizer

        b = PopulationGraph.builder(key(0))
        b.add_input("inp", 2, input_from="x")
        b.add_output("out", 2)
        b.connect("inp", "out", transform=Normalizer.create(2))
        g = b.finalize()
        state = g.initialize_state(4)
        out = g(state, {"x": jnp.ones((4, 2))})
        # Stack a fake time axis on the emitted extras and fold.
        extras = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (3,) + v.shape) if v is not None else v,
            out.rollout_extras,
            is_leaf=lambda v: v is None or hasattr(v, "shape"),
        )
        g2 = g.update_statistics(extras)
        assert float(g2.transforms[0].counter) == 12
        assert float(g.transforms[0].counter) == 0


class TestFusedSequenceReplay:
    """Time-fused graph ``replay_sequence`` must exactly reproduce the
    step-wise scan (outputs, reg, final carry) under arbitrary done
    patterns, nontrivial initial ring buffers, mixed delays, and
    recurrent edge transforms."""

    def build_graph(self, with_lstm=False):
        from nnx_ppo_tpu.networks import LSTM

        b = PopulationGraph.builder(key(7))
        b.add_input("inp", 3, input_from="x")
        b.add_population("core", 4, activation=jnp.tanh)
        b.add_output("out", 2)
        b.connect("inp", "core")
        b.connect("core", "core", delay=1)   # self-recurrence
        b.connect("inp", "core", delay=3)    # long skip delay
        if with_lstm:
            b.connect("core", "out", transform=LSTM.create(4, 2, key(8)))
        else:
            b.connect("core", "out")
        b.connect("core", "out", delay=2)
        return b.finalize()

    def _rollout_state(self, g, B, n_warm, warm_key):
        """Advance a fresh carry n_warm steps so ring buffers / LSTM
        carries are nontrivial at replay start (exercises the t<k
        initial-buffer read path)."""
        state = g.initialize_state(B)
        for t in range(n_warm):
            x = jax.random.normal(jax.random.fold_in(warm_key, t), (B, 3))
            state = g(state, {"x": x}).next_state
        return state

    @pytest.mark.parametrize("with_lstm", [False, True])
    @pytest.mark.parametrize("n_warm", [0, 2])
    def test_matches_stepwise(self, with_lstm, n_warm):
        from tests.test_sequence_replay_layers import stepwise_replay

        T, B = 7, 4
        g = self.build_graph(with_lstm)
        state = self._rollout_state(g, B, n_warm, jax.random.key(11))
        obs = {"x": jax.random.normal(jax.random.key(1), (T, B, 3))}
        done = jax.random.bernoulli(jax.random.key(2), 0.3, (T, B))

        ref_out, ref_reg, ref_final = stepwise_replay(g, state, obs, done, None)
        vec_out, vec_reg, vec_final = jax.jit(g.replay_sequence)(
            state, obs, done, None
        )

        np.testing.assert_allclose(
            vec_out["out"], ref_out["out"], rtol=1e-5, atol=1e-6
        )
        # Step-wise reg is scalar-per-step (graph sums children before
        # the [T, B] broadcast); fused accumulates per-edge [T, B] rows.
        np.testing.assert_allclose(
            np.asarray(vec_reg).mean(-1),
            np.asarray(ref_reg).reshape(T, -1).mean(-1),
            rtol=1e-5, atol=1e-6,
        )
        for a, b in zip(jax.tree.leaves(vec_final), jax.tree.leaves(ref_final)):
            if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
                np.testing.assert_array_equal(
                    jax.random.key_data(a), jax.random.key_data(b)
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
                )

    def test_gradients_match_stepwise(self):
        from tests.test_sequence_replay_layers import _stepwise_replay_impl

        T, B = 5, 3
        g = self.build_graph(False)
        state = self._rollout_state(g, B, 2, jax.random.key(13))
        obs0 = jax.random.normal(jax.random.key(1), (T, B, 3))
        done = jnp.zeros((T, B), bool).at[2, 1].set(True)

        def loss_step(x):
            out, _, _ = _stepwise_replay_impl(g, state, {"x": x}, done, None)
            return jnp.sum(out["out"] ** 2)

        def loss_vec(x):
            out, _, _ = g.replay_sequence(state, {"x": x}, done, None)
            return jnp.sum(out["out"] ** 2)

        g_step = jax.jit(jax.grad(loss_step))(obs0)
        g_vec = jax.jit(jax.grad(loss_vec))(obs0)
        np.testing.assert_allclose(g_vec, g_step, rtol=1e-5, atol=1e-6)


class TestCompileBudget:
    def test_bench_graph_trace_time_bounded(self):
        """Trace-size regression gate for the fused graph replay.

        The benchmark suite's ``population_graph`` config once recorded
        a 561 s warmup on the tunneled TPU; on a local backend the same
        program traces in ~2 s and compiles in ~12 s (the 561 s was
        remote-compile RPC overhead, not trace blowup). This pins the
        trace+lower cost of the FULL fused train program (10 fused PPO
        steps, n_envs=1024, T=30 — exactly ``benchmarks/suite.py``'s
        ``_population_graph``) so a future per-edge construction change
        that explodes the jaxpr fails loudly here instead of surfacing
        as a 10-minute bench warmup.
        """
        import time

        from nnx_ppo_tpu.envs import CartpoleBalance
        from nnx_ppo_tpu.networks import Flattener, make_mlp
        from nnx_ppo_tpu.algorithms.ppo import ppo_multi_step

        env = EpisodeWrapper(CartpoleBalance(), max_len=500)
        b = PopulationGraph.builder(key(3))
        b.add_input("sensor", env.observation_size, input_from="obs")
        b.add_population("core", 64, activation=jnp.tanh)
        b.add_output("motor", 2 * env.action_size)
        b.connect("sensor", "core")
        b.connect("core", "core", delay=1)
        b.connect("core", "motor")
        g = b.finalize()
        k = jax.random.split(key(4), 3)
        actor = Sequential.create([
            Filter.create({"obs": lambda x: x}),
            g,
            Filter.create({"motor": "motor"}),
            Flattener.create(),
            NormalTanhSampler.create(k[0], entropy_weight=1e-3),
        ])
        critic = make_mlp(
            [env.observation_size, 256, 1], k[1],
            activation_last_layer=False,
        )
        net = PPOAdapter.create(action=actor, value=critic)
        cfg = PPOConfig(n_envs=1024, rollout_length=30)
        ts = new_training_state(env, net, cfg.n_envs, seed=0)
        opt = make_optimizer(cfg.learning_rate)
        step = jax.jit(
            functools.partial(
                ppo_multi_step, env, config=cfg, optimizer=opt, n_steps=10
            ),
            donate_argnums=(0,),
        )
        t0 = time.perf_counter()
        step.lower(ts)
        elapsed = time.perf_counter() - t0
        assert elapsed < 60.0, (
            f"fused graph train program took {elapsed:.1f}s to trace+lower "
            "(budget 60s) — per-edge replay construction likely regressed"
        )
