"""Checkpoint round-trip tests (reference ``checkpointing_test.py``
strategy): layout, exact equality of weights / normalizer stats / AR1
NaN sentinels / RNG keys / env states / steps_taken, callback cadence,
and resume."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    PPOConfig,
    TrainConfig,
    VideoConfig,
    make_optimizer,
    new_training_state,
    train_ppo,
)
from nnx_ppo_tpu.algorithms.checkpointing import (
    load_checkpoint,
    make_checkpoint_fn,
    save_checkpoint,
)
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.networks import (
    AR1VariationalBottleneck,
    Dense,
    NormalTanhSampler,
    PPOAdapter,
    Sequential,
    make_mlp,
    make_mlp_actor_critic,
)
from nnx_ppo_tpu.test_dummies import MoveToCenterEnv
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def make_env_net():
    env = EpisodeWrapper(MoveToCenterEnv(), 50)
    net = make_mlp_actor_critic(
        2, 2, [16, 16], [16, 16], jax.random.key(0), normalize_obs=True
    )
    return env, net


CFG = PPOConfig(n_envs=8, rollout_length=4, n_epochs=2, n_minibatches=2)


def assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            np.testing.assert_array_equal(
                jax.random.key_data(x), jax.random.key_data(y)
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg="leaf mismatch"
            )


class TestRoundTrip:
    def test_exact_state_roundtrip(self, tmp_path):
        env, net = make_env_net()
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        opt = make_optimizer(CFG.learning_rate)
        step = jax.jit(functools.partial(ppo_step, env, config=CFG, optimizer=opt))
        ts, _ = step(ts)  # advance so stats/opt-state are nontrivial

        ckpt_fn = make_checkpoint_fn(str(tmp_path), config=None)
        ckpt_fn(ts, 32)
        step_dir = tmp_path / "step_0000000032"
        assert (step_dir / "metadata.pkl").exists()
        assert (step_dir / "state").exists()

        template = new_training_state(env, net, CFG.n_envs, seed=123)
        template, _ = step(template)  # same structure, different values
        restored = load_checkpoint(str(step_dir), template)
        assert restored["step"] == 32
        assert_trees_equal(restored["training_state"], ts)

    def test_roundtrip_preserves_ar1_nan_sentinel(self, tmp_path):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        k = jax.random.key(0)
        actor = Sequential.create([
            Dense.create(2, 8, jax.random.fold_in(k, 0), jax.nn.relu),
            AR1VariationalBottleneck.create(4, jax.random.fold_in(k, 1)),
            Dense.create(4, 4, jax.random.fold_in(k, 2)),
            NormalTanhSampler.create(jax.random.fold_in(k, 3), 0.0),
        ])
        net = PPOAdapter.create(
            action=actor,
            value=make_mlp([2, 8, 1], jax.random.fold_in(k, 4),
                           activation_last_layer=False),
        )
        ts = new_training_state(env, net, 8, seed=0)
        # Fresh state: last_z all NaN.
        ckpt_fn = make_checkpoint_fn(str(tmp_path))
        ckpt_fn(ts, 0)
        template = new_training_state(env, net, 8, seed=9)
        restored = load_checkpoint(str(tmp_path / "step_0000000000"), template)
        last_z = restored["training_state"].network_states["action"][1]["last_z"]
        assert jnp.isnan(last_z).all()

    def test_architecture_mismatch_detected(self, tmp_path):
        env, net = make_env_net()
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        make_checkpoint_fn(str(tmp_path))(ts, 0)
        other_net = make_mlp_actor_critic(
            2, 2, [16, 16, 16], [16], jax.random.key(0)
        )
        other_ts = new_training_state(env, other_net, CFG.n_envs, seed=0)
        with pytest.raises(ValueError, match="mismatch"):
            load_checkpoint(str(tmp_path / "step_0000000000"), other_ts)

    def test_same_count_different_structure_raises(self, tmp_path):
        """Format v2 stores leaves under key-path names: restoring into
        a template with the same leaf count/shapes but different
        structure must raise a path mismatch, not silently misassign."""
        tree = {"weights": jnp.ones((2, 3)), "bias": jnp.zeros(3)}
        save_checkpoint(str(tmp_path / "step_0"), tree, 0)
        renamed = {"weights": jnp.ones((2, 3)), "scale": jnp.zeros(3)}
        with pytest.raises(ValueError, match="structure mismatch"):
            load_checkpoint(str(tmp_path / "step_0"), renamed)

    def test_legacy_v1_integer_indexed_loads(self, tmp_path):
        """v1 checkpoints (integer-indexed leaves, no format_version)
        stay loadable through the legacy path."""
        import pickle

        import orbax.checkpoint as ocp

        tree = {"bias": jnp.arange(3.0), "key": jax.random.key(42)}
        leaves = jax.tree.leaves(tree)  # order: bias, key
        step_dir = tmp_path / "step_0000000007"
        os.makedirs(step_dir)
        ckptr = ocp.StandardCheckpointer()
        try:
            ckptr.save(str(step_dir / "state"), {"0": leaves[0]})
        finally:
            ckptr.close()
        metadata = {
            "key_leaves": {
                1: {
                    "data": np.asarray(jax.random.key_data(leaves[1])),
                    "impl": str(jax.random.key_impl(leaves[1])),
                }
            },
            "n_leaves": 2,
            "step": 7,
            "config": None,
        }
        with open(step_dir / "metadata.pkl", "wb") as f:
            pickle.dump(metadata, f)

        template = {"bias": jnp.zeros(3), "key": jax.random.key(0)}
        restored = load_checkpoint(str(step_dir), template)
        assert restored["step"] == 7
        assert_trees_equal(restored["training_state"], tree)

    def test_config_stored(self, tmp_path):
        env, net = make_env_net()
        ts = new_training_state(env, net, CFG.n_envs, seed=0)
        cfg = TrainConfig(ppo=CFG, seed=7)
        make_checkpoint_fn(str(tmp_path), config=cfg)(ts, 0)
        restored = load_checkpoint(str(tmp_path / "step_0000000000"), ts)
        assert restored["config"].seed == 7


class TestTrainLoopIntegration:
    def test_cadence_includes_step_zero_and_resume(self, tmp_path):
        env, net = make_env_net()
        cfg = TrainConfig(
            ppo=PPOConfig(n_envs=8, rollout_length=4, total_steps=128,
                          n_epochs=1, n_minibatches=1),
            eval=EvalConfig(enabled=False),
            video=VideoConfig(enabled=False),
            checkpoint_every_steps=64,
        )
        res = train_ppo(
            env, net, cfg, checkpoint_fn=make_checkpoint_fn(str(tmp_path), cfg)
        )
        dirs = sorted(os.listdir(tmp_path))
        assert dirs[0] == "step_0000000000"
        assert len(dirs) >= 2

        # Resume from the last checkpoint → continues to higher steps.
        template = new_training_state(env, net, cfg.ppo.n_envs, seed=0)
        restored = load_checkpoint(str(tmp_path / dirs[-1]), template)
        res2 = train_ppo(
            env, net, cfg, total_steps=res.total_steps + 64,
            initial_state=restored["training_state"],
        )
        assert res2.total_steps > res.total_steps


class TestPolicyExport:
    def test_policy_only_roundtrip(self, tmp_path):
        """The named-leaf format is generic over any pytree — saving
        JUST the trained network gives a deployment artifact without
        optimizer moments / env states (docs/checkpointing.md). Load
        restores into a freshly-built architecture template."""
        from nnx_ppo_tpu.algorithms.checkpointing import (
            load_checkpoint,
            save_checkpoint,
        )
        from nnx_ppo_tpu.networks import make_mlp_actor_critic

        net = make_mlp_actor_critic(2, 2, [16], [16], jax.random.key(7))
        save_checkpoint(str(tmp_path / "policy"), net, step=0)

        template = make_mlp_actor_critic(2, 2, [16], [16],
                                         jax.random.key(99))
        restored = load_checkpoint(str(tmp_path / "policy"), template)
        loaded = restored["training_state"]  # generic pytree slot
        # Compare key-data-normalized leaf values.
        na = [np.asarray(jax.random.key_data(x))
              if "key" in str(jnp.result_type(x)) else np.asarray(x)
              for x in jax.tree.leaves(net)]
        nb = [np.asarray(jax.random.key_data(x))
              if "key" in str(jnp.result_type(x)) else np.asarray(x)
              for x in jax.tree.leaves(loaded)]
        for a, b in zip(na, nb):
            np.testing.assert_array_equal(a, b)
        # The wrong architecture fails loudly (named-path mismatch).
        wrong = make_mlp_actor_critic(2, 2, [16, 16], [16],
                                      jax.random.key(1))
        with pytest.raises(ValueError, match="mismatch"):
            load_checkpoint(str(tmp_path / "policy"), wrong)
