"""Checkpoint/restore across device topologies (SURVEY §4: sharded ↔
single-device), plus env states carrying PRNG-key leaves."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nnx_ppo_tpu.algorithms import (
    PPOConfig,
    load_checkpoint,
    make_optimizer,
    new_training_state,
    save_checkpoint,
)
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.envs import CartpoleBalance, JoystickLocomotion
from nnx_ppo_tpu.networks import (
    Concat,
    Dense,
    NormalTanhSampler,
    Parallel,
    PPOAdapter,
    Sequential,
    make_mlp,
    make_mlp_actor_critic,
)
from nnx_ppo_tpu.parallel import make_mesh
from nnx_ppo_tpu.parallel.mesh import shard_training_state
from nnx_ppo_tpu.wrappers import EpisodeWrapper

CFG = PPOConfig(n_envs=16, rollout_length=4, n_epochs=1, n_minibatches=2)


def _mlp_setup():
    env = EpisodeWrapper(CartpoleBalance(), max_len=20)
    net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
    return env, net


def test_sharded_save_single_device_restore(tmp_path):
    """Train sharded on an 8-device mesh, save, restore with a
    single-device template; resumed training must proceed."""
    env, net = _mlp_setup()
    opt = make_optimizer(CFG.learning_rate)

    mesh = make_mesh(8)
    ts = new_training_state(env, net, CFG.n_envs, seed=0, mesh=mesh)
    step_sharded = jax.jit(
        functools.partial(ppo_step, env, config=CFG, optimizer=opt, mesh=mesh)
    )
    ts, _ = step_sharded(ts)
    step_dir = tmp_path / "ckpt"
    save_checkpoint(str(step_dir), ts, step=64)

    template = new_training_state(env, net, CFG.n_envs, seed=3)  # no mesh
    restored = load_checkpoint(str(step_dir), template)["training_state"]
    step_single = jax.jit(
        functools.partial(ppo_step, env, config=CFG, optimizer=opt)
    )
    ts2, metrics = step_single(restored)
    assert jnp.isfinite(metrics["losses/actor/mean"])
    assert int(ts2.steps_taken) == 2 * CFG.n_envs * CFG.rollout_length
    # Weights survived the topology change exactly.
    for a, b in zip(jax.tree.leaves(ts.networks), jax.tree.leaves(restored.networks)):
        if jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_single_device_save_sharded_restore(tmp_path):
    env, net = _mlp_setup()
    opt = make_optimizer(CFG.learning_rate)
    ts = new_training_state(env, net, CFG.n_envs, seed=0)
    step_single = jax.jit(
        functools.partial(ppo_step, env, config=CFG, optimizer=opt)
    )
    ts, _ = step_single(ts)
    step_dir = tmp_path / "ckpt"
    save_checkpoint(str(step_dir), ts, step=64)

    mesh = make_mesh(8)
    template = new_training_state(env, net, CFG.n_envs, seed=3, mesh=mesh)
    restored = load_checkpoint(str(step_dir), template)["training_state"]
    restored = shard_training_state(restored, mesh)
    step_sharded = jax.jit(
        functools.partial(ppo_step, env, config=CFG, optimizer=opt, mesh=mesh)
    )
    ts2, metrics = step_sharded(restored)
    assert jnp.isfinite(metrics["losses/actor/mean"])


def test_env_state_with_prng_key_leaf_roundtrip(tmp_path):
    """JoystickLocomotion's env state carries a per-env PRNG key stream;
    exact resume must preserve it (key_data equality)."""
    env = EpisodeWrapper(JoystickLocomotion(), max_len=20)
    k = jax.random.split(jax.random.key(0), 7)
    net = Sequential.create(
        [
            Concat.create(
                proprio=Dense.create(14, 16, k[0], jax.nn.relu),
                command=Dense.create(3, 8, k[1], jax.nn.relu),
            ),
            PPOAdapter.create(
                action=Sequential.create(
                    [
                        Dense.create(24, 16, k[2], jax.nn.relu),
                        Dense.create(16, 16, k[3]),
                        NormalTanhSampler.create(k[4]),
                    ]
                ),
                value=Parallel.create(
                    tracking=make_mlp([24, 1], k[5], activation_last_layer=False),
                    penalty=make_mlp([24, 1], k[6], activation_last_layer=False),
                ),
            ),
        ]
    )
    cfg = PPOConfig(
        n_envs=8, rollout_length=4, n_epochs=1, n_minibatches=2,
        combine_advantages=True,
    )
    opt = make_optimizer(cfg.learning_rate)
    ts = new_training_state(env, net, cfg.n_envs, seed=0)
    step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
    ts, _ = step(ts)
    save_checkpoint(str(tmp_path / "ckpt"), ts, step=32)
    restored = load_checkpoint(str(tmp_path / "ckpt"), ts)["training_state"]

    np.testing.assert_array_equal(
        jax.random.key_data(ts.env_states.data["rng"]),
        jax.random.key_data(restored.env_states.data["rng"]),
    )
    ts2, metrics = step(restored)
    assert jnp.isfinite(metrics["losses/actor/mean"])
