"""Time-fused replay: the [T]-replay as one batched forward must be
bitwise-equivalent to the sequential scan path for replay-time-static
networks, and recurrent networks must fall back to the scan."""

import functools

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_loss, ppo_step
from nnx_ppo_tpu.algorithms.rollout import unroll_env
from nnx_ppo_tpu.core.struct import partition_params
from nnx_ppo_tpu.envs import CartpoleBalance, JoystickLocomotion
from nnx_ppo_tpu.networks import (
    GRU,
    Dense,
    NormalTanhSampler,
    PPOAdapter,
    Sequential,
    VariationalBottleneck,
    make_mlp_actor_critic,
)
from nnx_ppo_tpu.wrappers import EpisodeWrapper

LOSS_KW = dict(
    clip_range=0.2,
    normalize_advantages=True,
    combine_advantages=False,
    discounting_factor=0.99,
    gae_lambda=0.95,
    critic_loss_weight=1.0,
)


def _rollout(env, net, n_envs=8, T=6):
    from nnx_ppo_tpu.algorithms.config import PPOConfig as _C

    ts = new_training_state(env, net, n_envs, seed=0)
    _, _, data = unroll_env(
        env, ts.env_states, net, ts.network_states, T, jax.random.key(1)
    )
    return ts, data


class TestFlags:
    def test_mlp_actor_critic_is_time_static(self):
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        assert net.replay_time_static

    def test_gru_network_is_not(self):
        k = jax.random.split(jax.random.key(0), 3)
        net = PPOAdapter.create(
            action=Sequential.create(
                [
                    GRU.create(5, 8, k[0]),
                    Dense.create(8, 2, k[1]),
                    NormalTanhSampler.create(k[2]),
                ]
            ),
            value=Dense.create(5, 1, jax.random.key(9)),
        )
        assert not net.replay_time_static

    def test_variational_is_time_static(self):
        vb = VariationalBottleneck.create(4, jax.random.key(0))
        assert vb.replay_time_static


class TestLossEquivalence:
    def test_fused_equals_scan_mlp(self):
        from nnx_ppo_tpu.algorithms.types import LoggingLevel

        env = EpisodeWrapper(CartpoleBalance(), max_len=4)  # forces resets
        net = make_mlp_actor_critic(5, 1, [16, 16], [16], jax.random.key(0))
        ts, data = _rollout(env, net)
        params, rest = partition_params(net)
        kw = dict(LOSS_KW, logging_level=LoggingLevel.LOSSES)
        l_scan, m_scan = ppo_loss(
            params, rest, ts.network_states, data, fused_replay=False, **kw
        )
        l_fused, m_fused = ppo_loss(
            params, rest, ts.network_states, data, fused_replay=True, **kw
        )
        # Reduction order differs between paths → float noise only.
        assert jnp.allclose(l_scan, l_fused, rtol=1e-5, atol=1e-6), (
            l_scan,
            l_fused,
        )
        for key in m_scan:
            a, b = m_scan[key], m_fused[key]
            assert jax.tree.all(
                jax.tree.map(
                    lambda x, y: jnp.allclose(x, y, rtol=1e-5, atol=1e-6), a, b
                )
            ), key

    def test_fused_gradients_equal_scan(self):
        from nnx_ppo_tpu.algorithms.types import LoggingLevel

        env = EpisodeWrapper(CartpoleBalance(), max_len=4)
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        ts, data = _rollout(env, net)
        params, rest = partition_params(net)
        kw = dict(LOSS_KW, logging_level=LoggingLevel.NONE)
        g_scan = jax.grad(
            lambda p: ppo_loss(
                p, rest, ts.network_states, data, fused_replay=False, **kw
            )[0]
        )(params)
        g_fused = jax.grad(
            lambda p: ppo_loss(
                p, rest, ts.network_states, data, fused_replay=True, **kw
            )[0]
        )(params)
        assert jax.tree.all(
            jax.tree.map(
                lambda a, b: jnp.allclose(a, b, rtol=1e-5, atol=1e-6),
                g_scan,
                g_fused,
            )
        )

    def test_variational_replay_reproduces_rollout_z(self):
        vb = VariationalBottleneck.create(3, jax.random.key(0))
        state = vb.initialize_state(5)
        x = jax.random.normal(jax.random.key(1), (5, 6))
        out = vb(state, x)
        replay = vb(state, x, out.rollout_extras)
        assert jnp.array_equal(out.output, replay.output)

    def test_sampler_replay_is_rng_free(self):
        """Replay output must not depend on the carry keys at all."""
        s = NormalTanhSampler.create(jax.random.key(0), entropy_weight=0.1)
        state_a = s.initialize_state(4)
        state_b = s.reset_state(
            jax.vmap(lambda k: jax.random.split(k, 1)[0])(state_a)
        )
        x = jax.random.normal(jax.random.key(1), (4, 6))
        out = s(state_a, x)
        ra = s(state_a, x, out.rollout_extras)
        rb = s(state_b, x, out.rollout_extras)
        assert jnp.array_equal(ra.output["log_likelihood"], rb.output["log_likelihood"])
        assert jnp.array_equal(ra.regularization_loss, rb.regularization_loss)


class TestEndToEnd:
    def _step(self, env, net, **cfg_kw):
        cfg = PPOConfig(
            n_envs=8, rollout_length=5, n_epochs=2, n_minibatches=2, **cfg_kw
        )
        ts = new_training_state(env, net, cfg.n_envs, seed=0)
        opt = make_optimizer(cfg.learning_rate)
        step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
        for _ in range(2):
            ts, metrics = step(ts)
        return ts, metrics

    def test_ppo_step_fused_matches_unfused(self):
        env = EpisodeWrapper(CartpoleBalance(), max_len=10)
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        _, m_fused = self._step(env, net, fused_replay=True)
        _, m_scan = self._step(env, net, fused_replay=False)
        assert jnp.allclose(
            m_fused["losses/actor/mean"], m_scan["losses/actor/mean"],
            rtol=1e-5, atol=1e-6,
        )
        assert jnp.allclose(
            m_fused["losses/critic/mean"], m_scan["losses/critic/mean"],
            rtol=1e-5, atol=1e-6,
        )

    def test_recurrent_layerwise_replay_equals_whole_net_scan(self):
        """GRU nets use replay_sequence with hoisted input projections;
        the loss must match the exact whole-network scan."""
        from nnx_ppo_tpu.algorithms.types import LoggingLevel

        env = EpisodeWrapper(CartpoleBalance(), max_len=4)  # forces resets
        k = jax.random.split(jax.random.key(0), 5)
        net = PPOAdapter.create(
            action=Sequential.create(
                [
                    GRU.create(5, 8, k[0]),
                    Dense.create(8, 2, k[1]),
                    NormalTanhSampler.create(k[2]),
                ]
            ),
            value=Sequential.create(
                [GRU.create(5, 8, k[3]), Dense.create(8, 1, k[4])]
            ),
        )
        ts, data = _rollout(env, net)
        params, rest = partition_params(net)
        kw = dict(LOSS_KW, logging_level=LoggingLevel.LOSSES)
        l_scan, _ = ppo_loss(
            params, rest, ts.network_states, data, fused_replay=False, **kw
        )
        l_fused, _ = ppo_loss(
            params, rest, ts.network_states, data, fused_replay=True, **kw
        )
        assert jnp.allclose(l_scan, l_fused, rtol=1e-4, atol=1e-5), (
            l_scan,
            l_fused,
        )

    def test_lstm_layerwise_replay_matches_stepwise_forward(self):
        """LSTM.replay_sequence (hoisted projections) must reproduce the
        per-step __call__ outputs and final carry exactly, incl. resets."""
        from nnx_ppo_tpu.networks import LSTM
        from nnx_ppo_tpu.core.struct import tree_where

        lstm = LSTM.create(3, 7, jax.random.key(0))
        T, B = 5, 4
        obs = jax.random.normal(jax.random.key(1), (T, B, 3))
        done = jax.random.bernoulli(jax.random.key(2), 0.4, (T, B))
        state = lstm.initialize_state(B)

        seq_out, _, seq_final = lstm.replay_sequence(state, obs, done, None)

        s = state
        outs = []
        for t in range(T):
            o = lstm(s, obs[t])
            outs.append(o.output)
            s = tree_where(done[t], lstm.reset_state(o.next_state), o.next_state)
        assert jnp.allclose(seq_out, jnp.stack(outs), rtol=1e-5, atol=1e-6)
        for a, b in zip(seq_final, s):
            assert jnp.allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_recurrent_falls_back(self):
        env = EpisodeWrapper(CartpoleBalance(), max_len=10)
        k = jax.random.split(jax.random.key(0), 4)
        net = PPOAdapter.create(
            action=Sequential.create(
                [
                    GRU.create(5, 8, k[0]),
                    Dense.create(8, 2, k[1]),
                    NormalTanhSampler.create(k[2]),
                ]
            ),
            value=Dense.create(5, 1, k[3]),
        )
        assert not net.replay_time_static
        _, metrics = self._step(env, net, fused_replay=True)
        assert jnp.isfinite(metrics["losses/actor/mean"])
