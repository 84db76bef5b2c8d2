"""MJXEnv adapter executed for real on the MuJoCo-C callback backend.

The reference's primary workload is ``mujoco_playground`` MJX with a
backend-parametrized matrix (reference ``ppo_test.py:26-28,447-487``).
``mujoco-mjx`` isn't installable in every image, so these tests drive
the SAME adapter (``envs/mjx.py``) through the ``impl='mjc'`` backend
(``envs/mjc_backend.py``): the MuJoCo C engine via ``jax.pure_callback``
— real MuJoCo dynamics, not a fake — exercising the adapter's
reset/step/State plumbing, its vmap batching contract, and end-to-end
PPO training.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.envs import MJXCartpoleBalance, MJXEnv
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.wrappers import EpisodeWrapper


@pytest.fixture(scope="module")
def env():
    return MJXCartpoleBalance(impl="mjc")


def test_reset_step_protocol(env):
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (env.observation_size,)
    assert state.data.qpos.shape == (2,)
    nxt = jax.jit(env.step)(state, jnp.ones(env.action_size))
    assert nxt.obs.shape == (env.observation_size,)
    assert float(nxt.data.time) > float(state.data.time)
    assert jnp.isfinite(nxt.reward)
    # Pushing the cart right moves it right.
    assert float(nxt.data.qpos[0]) > float(state.data.qpos[0])


def test_step_matches_raw_mujoco(env):
    """The traced step is bit-for-bit (f32) the host mj_step loop."""
    state = env.reset(jax.random.key(1))
    action = jnp.asarray([0.37])
    nxt = jax.jit(env.step)(state, action)

    d = mujoco.MjData(env._mj_model)
    d.qpos[:] = np.asarray(state.data.qpos, np.float64)
    d.qvel[:] = np.asarray(state.data.qvel, np.float64)
    d.ctrl[:] = 0.37
    for _ in range(env.n_substeps):
        mujoco.mj_step(env._mj_model, d)
    np.testing.assert_allclose(
        np.asarray(nxt.data.qpos), d.qpos.astype(np.float32), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(nxt.data.qvel), d.qvel.astype(np.float32), rtol=1e-6
    )


def test_vmap_batch_matches_sequential(env):
    """broadcast_all batching: one callback for the whole env batch,
    same numbers as stepping each env alone."""
    B = 5
    keys = jax.random.split(jax.random.key(2), B)
    batch = jax.vmap(env.reset)(keys)
    actions = jax.random.uniform(jax.random.key(3), (B, 1), minval=-1)
    stepped = jax.jit(jax.vmap(env.step))(batch, actions)
    for b in range(B):
        single = env.step(
            jax.tree.map(lambda x, b=b: x[b], batch), actions[b]
        )
        np.testing.assert_allclose(
            np.asarray(stepped.data.qpos[b]),
            np.asarray(single.data.qpos),
            rtol=1e-6,
        )


def test_ppo_trains_on_mjc_backend(env):
    wrapped = EpisodeWrapper(env, max_len=25)
    net = make_mlp_actor_critic(
        wrapped.observation_size, wrapped.action_size, [16], [16],
        jax.random.key(0),
    )
    cfg = PPOConfig(n_envs=4, rollout_length=4, n_epochs=2, n_minibatches=2)
    ts = new_training_state(wrapped, net, cfg.n_envs, seed=0)
    opt = make_optimizer(cfg.learning_rate)
    step = jax.jit(functools.partial(ppo_step, wrapped, config=cfg,
                                     optimizer=opt))
    ts, metrics = step(ts)
    ts, metrics = step(ts)
    assert np.isfinite(float(metrics["losses/actor/mean"]))
    assert np.isfinite(float(metrics["losses/critic/mean"]))


def test_generic_mjmodel_wrap():
    """Any raw MjModel wraps as an RLEnv (default hooks)."""
    xml = """
    <mujoco><worldbody><body pos="0 0 1">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.04" mass="0.5"/>
    </body></worldbody></mujoco>
    """
    m = mujoco.MjModel.from_xml_string(xml)
    env = MJXEnv(m, n_substeps=2, impl="mjc")
    assert env.observation_size == 2 and env.action_size == 0
    s = env.reset(jax.random.key(0))
    s2 = env.step(s, jnp.zeros(0))
    assert jnp.isfinite(s2.obs).all()
