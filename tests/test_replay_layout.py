"""Batch-major rollout-buffer layout (``PPOConfig.rollout_layout``).

The batch-major path must be a pure LAYOUT change: identical minibatch
membership, identical replay outputs (the flat [B·T] forward uses the
same per-(env, step) PRNG keys as the time-major fused path), and
training trajectories that match the time-major path to float-reduction
tolerance. Reference semantics anchor: nnx_ppo/algorithms/ppo.py:284-300
(minibatch membership) and :397-531 (loss).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import (
    ReplayMinibatch,
    ppo_step,
    resolve_batch_major,
    resolve_store_dtype,
)
from nnx_ppo_tpu.core.struct import partition_params
from nnx_ppo_tpu.envs import CartpoleBalance
from nnx_ppo_tpu.networks import (
    GRU,
    Dense,
    NormalTanhSampler,
    PPOAdapter,
    Sequential,
    make_mlp_actor_critic,
)
from nnx_ppo_tpu.networks.types import replay_sequence_nd
from nnx_ppo_tpu.parallel.permutation import minibatch_plan
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def _gru_net(key):
    k = jax.random.split(key, 5)
    actor = Sequential.create([
        GRU.create(5, 8, k[0]),
        Dense.create(8, 2, k[1]),
        NormalTanhSampler.create(k[2]),
    ])
    critic = Sequential.create([GRU.create(5, 8, k[3]), Dense.create(8, 1, k[4])])
    return PPOAdapter.create(action=actor, value=critic)


class TestMinibatchPlan:
    def test_shuffled_membership_identical_across_layouts(self):
        """take_seq must select the SAME (env, step) samples in both
        layouts."""
        key = jax.random.key(3)
        T = 5
        sel_tm, take_tm, _ = minibatch_plan(16, 2, 4, shuffle=True, key=key)
        sel_bm, take_bm, _ = minibatch_plan(
            16, 2, 4, shuffle=True, key=key, batch_major=True
        )
        assert jnp.array_equal(sel_tm, sel_bm)
        x_tm = jnp.arange(T * 16 * 3).reshape(T, 16, 3)  # [T, B, f]
        x_bm = jnp.swapaxes(x_tm, 0, 1)  # [B, T, f]
        for i in range(sel_tm.shape[0]):
            a = take_tm(x_tm, sel_tm[i])  # [T, B_mb, f]
            b = take_bm(x_bm, sel_bm[i])  # [B_mb, T, f]
            assert jnp.array_equal(a, jnp.swapaxes(b, 0, 1))

    def test_unshuffled_blocks_identical_across_layouts(self):
        T = 5
        sel, take_tm, _ = minibatch_plan(16, 1, 4, 2, shuffle=False)
        _, take_bm, _ = minibatch_plan(
            16, 1, 4, 2, shuffle=False, batch_major=True
        )
        x_tm = jnp.arange(T * 16).reshape(T, 16)
        x_bm = jnp.swapaxes(x_tm, 0, 1)
        for m in sel:
            b = take_bm(x_bm, m)
            assert jnp.array_equal(take_tm(x_tm, m), jnp.swapaxes(b, 0, 1))

    def test_unshuffled_validates_divisibility(self):
        # n_envs not divisible by n_shards
        with pytest.raises(ValueError, match="divisible"):
            minibatch_plan(10, 1, 2, 4, shuffle=False)
        # per-shard block not divisible by n_minibatches
        with pytest.raises(ValueError, match="divisible"):
            minibatch_plan(16, 1, 3, 4, shuffle=False)

    def test_shuffle_requires_key(self):
        with pytest.raises(ValueError, match="key"):
            minibatch_plan(16, 1, 2, shuffle=True)


class TestFlatReplayParity:
    def test_nd_replay_matches_time_major_fused(self):
        """replay_sequence_nd([B,T]) == replay_sequence([T,B]).T —
        same per-(env, step) sample keys, same outputs."""
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        assert net.replay_time_static
        T, B = 4, 6
        state = net.initialize_state(B)
        obs_tb = jax.random.normal(jax.random.key(1), (T, B, 5))
        done_tb = jnp.zeros((T, B), bool).at[2, 1].set(True)

        # Build extras by a rollout-style forward pass per step.
        def fwd(s, o):
            out = net(s, o)
            return out.next_state, out.rollout_extras

        _, extras_tb = jax.lax.scan(fwd, state, obs_tb)

        out_tm, reg_tm, fin_tm = net.replay_sequence(
            state, obs_tb, done_tb, extras_tb
        )

        def to_bt(x):
            return jnp.swapaxes(x, 0, 1)

        out_bm, reg_bm, fin_bm = replay_sequence_nd(
            net,
            state,
            to_bt(obs_tb),
            T,
            jax.tree.map(to_bt, extras_tb),
        )
        for a, b in zip(jax.tree.leaves(out_tm), jax.tree.leaves(out_bm)):
            np.testing.assert_allclose(
                np.asarray(a),
                np.swapaxes(np.asarray(b), 0, 1),
                rtol=1e-6,
                atol=1e-7,
            )
        np.testing.assert_allclose(
            np.asarray(reg_tm).mean(), np.asarray(reg_bm).mean(), rtol=1e-6
        )
        # Final carries (advanced keys) must agree exactly.
        for a, b in zip(jax.tree.leaves(fin_tm), jax.tree.leaves(fin_bm)):
            assert jnp.array_equal(jax.random.key_data(a), jax.random.key_data(b))

    def test_nd_replay_rejects_recurrent_nets(self):
        net = _gru_net(jax.random.key(0))
        state = net.initialize_state(4)
        obs = jnp.zeros((4, 3, 5))
        with pytest.raises(ValueError, match="replay-time-static"):
            replay_sequence_nd(net, state, obs, 3, None)


class TestLayoutResolution:
    def test_auto_picks_batch_major_for_static_nets(self):
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        assert resolve_batch_major(PPOConfig(), net) is True
        assert resolve_batch_major(PPOConfig(fused_replay=False), net) is False
        assert resolve_batch_major(PPOConfig(rollout_layout="time_major"), net) is False

    def test_auto_falls_back_for_recurrent_nets(self):
        net = _gru_net(jax.random.key(0))
        assert resolve_batch_major(PPOConfig(), net) is False
        with pytest.raises(ValueError, match="batch_major"):
            resolve_batch_major(PPOConfig(rollout_layout="batch_major"), net)

    def test_unknown_layout_rejected(self):
        net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
        with pytest.raises(ValueError, match="rollout_layout"):
            resolve_batch_major(PPOConfig(rollout_layout="colmajor"), net)


class TestEndToEndLayoutParity:
    def _train(self, layout, shuffle=True, n_steps=3):
        env = EpisodeWrapper(CartpoleBalance(), max_len=10)
        net = make_mlp_actor_critic(
            5, 1, [16], [16], jax.random.key(0), normalize_obs=True
        )
        cfg = PPOConfig(
            n_envs=8,
            rollout_length=5,
            n_epochs=2,
            n_minibatches=2,
            rollout_layout=layout,
            shuffle_minibatches=shuffle,
        )
        ts = new_training_state(env, net, cfg.n_envs, seed=0)
        opt = make_optimizer(cfg.learning_rate)
        step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
        for _ in range(n_steps):
            ts, metrics = step(ts)
        return ts, metrics

    @pytest.mark.parametrize("shuffle", [True, False])
    def test_batch_major_training_matches_time_major(self, shuffle):
        """Same seeds → same minibatches → same training trajectory
        (up to float reduction order) across layouts."""
        ts_bm, m_bm = self._train("batch_major", shuffle)
        ts_tm, m_tm = self._train("time_major", shuffle)
        p_bm, _ = partition_params(ts_bm.networks)
        p_tm, _ = partition_params(ts_tm.networks)
        for a, b in zip(jax.tree.leaves(p_bm), jax.tree.leaves(p_tm)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
        np.testing.assert_allclose(
            float(m_bm["losses/actor/mean"]),
            float(m_tm["losses/actor/mean"]),
            rtol=1e-4,
            atol=1e-6,
        )

    def test_view_downcasts_only_obs_leaves(self):
        """replay_store_dtype touches obs/last_next_obs float leaves
        only — loglikelihoods/rewards/extras/flags stay exact so the
        epoch-0 ratio==1 invariant is unaffected."""
        from nnx_ppo_tpu.algorithms.types import PPONetworkOutput, Transition

        T, B = 3, 4
        tr = Transition(
            obs={"x": jnp.ones((T, B, 2)), "idx": jnp.ones((T, B), jnp.int32)},
            network_output=PPONetworkOutput(
                actions=jnp.zeros((T, B, 1)),
                loglikelihoods=jnp.ones((T, B)),
                value_estimates=jnp.zeros((T, B)),
            ),
            rewards=jnp.ones((T, B)),
            done=jnp.zeros((T, B), bool),
            truncated=jnp.zeros((T, B), bool),
            next_obs={"x": jnp.ones((T, B, 2)), "idx": jnp.ones((T, B), jnp.int32)},
            metrics={},
        )
        view = ReplayMinibatch.from_rollout(tr, store_dtype=jnp.bfloat16)
        assert view.obs["x"].dtype == jnp.bfloat16
        assert view.obs["idx"].dtype == jnp.int32  # ints pass through
        assert view.last_next_obs["x"].dtype == jnp.bfloat16
        assert view.old_loglikelihoods.dtype == jnp.float32
        assert view.rewards.dtype == jnp.float32

    def test_unknown_store_dtype_rejected(self):
        with pytest.raises(ValueError, match="replay_store_dtype"):
            resolve_store_dtype(PPOConfig(replay_store_dtype="float8"))
        assert resolve_store_dtype(PPOConfig()) is None
        assert (
            resolve_store_dtype(PPOConfig(replay_store_dtype="bfloat16"))
            is jnp.bfloat16
        )

    def _train_store(
        self, store_dtype, compute_dtype=None, normalize_obs=False, n_steps=3
    ):
        env = EpisodeWrapper(CartpoleBalance(), max_len=10)
        net = make_mlp_actor_critic(
            5, 1, [16], [16], jax.random.key(0),
            compute_dtype=compute_dtype, normalize_obs=normalize_obs,
        )
        cfg = PPOConfig(
            n_envs=8,
            rollout_length=5,
            n_epochs=2,
            n_minibatches=2,
            replay_store_dtype=store_dtype,
        )
        ts = new_training_state(env, net, cfg.n_envs, seed=0)
        opt = make_optimizer(cfg.learning_rate)
        step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
        for _ in range(n_steps):
            ts, metrics = step(ts)
        return ts, metrics

    def test_bf16_store_exact_for_bf16_compute_nets(self):
        """A compute_dtype=bfloat16 stack (no obs normalization) casts
        obs to bf16 at its first layer, so storing the replay obs in
        bf16 performs the SAME rounding: training trajectories must be
        bitwise-identical. (With a Normalizer first the stats run in
        f32 and the store dtype is a documented rounding instead —
        covered by the f32 closeness test below.)"""
        ts_a, m_a = self._train_store("float32", compute_dtype=jnp.bfloat16)
        ts_b, m_b = self._train_store("bfloat16", compute_dtype=jnp.bfloat16)
        p_a, _ = partition_params(ts_a.networks)
        p_b, _ = partition_params(ts_b.networks)
        for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
            assert jnp.array_equal(a, b)
        assert float(m_a["losses/actor/mean"]) == float(m_b["losses/actor/mean"])

    def test_bf16_store_tracks_f32_training_for_f32_nets(self):
        """For f32 networks the bf16 store is a documented rounding of
        the replay obs (~3 decimal digits); short training trajectories
        must stay close to the exact path."""
        ts_a, _ = self._train_store("float32")
        ts_b, _ = self._train_store("bfloat16")
        p_a, _ = partition_params(ts_a.networks)
        p_b, _ = partition_params(ts_b.networks)
        for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.05, atol=5e-4
            )

    def test_view_from_rollout_roundtrip(self):
        """ReplayMinibatch.from_rollout transposes sequence leaves and
        slices the bootstrap obs."""
        from nnx_ppo_tpu.algorithms.types import PPONetworkOutput, Transition

        T, B = 3, 4
        tr = Transition(
            obs=jnp.arange(T * B * 2.0).reshape(T, B, 2),
            network_output=PPONetworkOutput(
                actions=jnp.zeros((T, B, 1)),
                loglikelihoods=jnp.arange(float(T * B)).reshape(T, B),
                value_estimates=jnp.zeros((T, B)),
            ),
            rewards=jnp.ones((T, B)),
            done=jnp.zeros((T, B), bool),
            truncated=jnp.zeros((T, B), bool),
            next_obs=jnp.arange(T * B * 2.0).reshape(T, B, 2) + 100,
            metrics={},
        )
        view = ReplayMinibatch.from_rollout(tr, batch_major=True)
        assert view.obs.shape == (B, T, 2)
        assert jnp.array_equal(view.obs, jnp.swapaxes(tr.obs, 0, 1))
        assert view.rewards.shape == (B, T)
        assert jnp.array_equal(view.last_next_obs, tr.next_obs[-1])
        assert view.batch_major
        view_tm = ReplayMinibatch.from_rollout(tr)
        assert view_tm.obs.shape == (T, B, 2)
        assert not view_tm.batch_major
