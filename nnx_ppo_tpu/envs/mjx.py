"""MJX (MuJoCo-XLA) environment adapter.

The reference's physics substrate is ``mujoco_playground`` (MJX
``impl="jax"`` / MuJoCo-Warp ``impl="warp"`` — reference
``ppo_test.py:26-28``). On TPU the jit-able path is MJX, which compiles
to XLA and shards over a data-parallel mesh like any other pytree env.

This module is **import-gated**: it needs the optional ``mujoco-mjx``
package (``pip install mujoco-mjx``). Everything else in the framework
is independent of it — any object satisfying the ``RLEnv`` protocol
plugs in, including ``mujoco_playground`` envs directly (their
``State`` already has obs/done/reward/info/metrics).

``MJXEnv`` wraps a raw ``mujoco.MjModel`` as a single unbatched
``RLEnv`` (the library vmaps to n_envs). Subclasses override the task
hooks ``_obs`` / ``_reward`` / ``_done`` / ``_init_qpos``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State

try:  # pragma: no cover - exercised only when mujoco-mjx is installed
    import mujoco
    from mujoco import mjx

    MJX_AVAILABLE = True
except ImportError:  # pragma: no cover
    mujoco = None
    mjx = None
    MJX_AVAILABLE = False


class MJXEnv:
    """A MuJoCo model as an ``RLEnv`` via MJX.

    Args:
      mj_model: a ``mujoco.MjModel`` (e.g. ``MjModel.from_xml_string``).
      n_substeps: physics substeps per env step (frame-skip).
      reset_noise: uniform qpos/qvel noise half-width at reset.
    """

    def __init__(self, mj_model: Any, n_substeps: int = 4, reset_noise: float = 0.05):
        if not MJX_AVAILABLE:
            raise ImportError(
                "MJXEnv requires the optional 'mujoco-mjx' package "
                "(pip install mujoco mujoco-mjx)."
            )
        self._mj_model = mj_model
        self._model = mjx.put_model(mj_model)
        self.n_substeps = n_substeps
        self.reset_noise = reset_noise
        self.action_size = mj_model.nu
        self.observation_size = self._obs(mjx.make_data(self._model)).shape[-1]

    # -- task hooks (override in subclasses) -------------------------------

    def _init_qpos(self, rng: jax.Array) -> tuple[jax.Array, jax.Array]:
        k1, k2 = jax.random.split(rng)
        nq, nv = self._mj_model.nq, self._mj_model.nv
        qpos = jnp.asarray(self._mj_model.qpos0) + self.reset_noise * (
            jax.random.uniform(k1, (nq,)) * 2.0 - 1.0
        )
        qvel = self.reset_noise * (jax.random.uniform(k2, (nv,)) * 2.0 - 1.0)
        return qpos, qvel

    def _obs(self, data: Any) -> jax.Array:
        return jnp.concatenate([data.qpos, data.qvel])

    def _reward(self, data: Any, action: jax.Array) -> Any:
        return jnp.zeros(())

    def _done(self, data: Any) -> jax.Array:
        return jnp.zeros((), jnp.float32)

    def _metrics(self, data: Any, reward: Any) -> dict:
        return {"reward": jax.tree.map(jnp.asarray, reward)}

    # -- RLEnv protocol -----------------------------------------------------

    def _state(self, data: Any, action: jax.Array) -> State:
        reward = self._reward(data, action)
        return State(
            data=data,
            obs=self._obs(data),
            reward=reward,
            done=self._done(data),
            info={},
            metrics=self._metrics(data, reward),
        )

    def reset(self, rng: jax.Array) -> State:
        qpos, qvel = self._init_qpos(rng)
        data = mjx.make_data(self._model)
        data = data.replace(qpos=qpos, qvel=qvel)
        data = mjx.forward(self._model, data)
        return self._state(data, jnp.zeros(self.action_size))

    def step(self, state: State, action: jax.Array) -> State:
        action = jnp.clip(jnp.asarray(action).reshape(self.action_size), -1.0, 1.0)
        data = state.data.replace(ctrl=action)

        def substep(d, _):
            return mjx.step(self._model, d), None

        data, _ = jax.lax.scan(substep, data, None, length=self.n_substeps)
        return self._state(data, action)

    # Host-side rendering for the video pipeline (works on SlimState
    # trajectories from ``eval_rollout_for_render_scan``).
    def render(self, trajectory: list, width: int = 320, height: int = 240):
        renderer = mujoco.Renderer(self._mj_model, height=height, width=width)
        mj_data = mujoco.MjData(self._mj_model)
        frames = []
        try:
            for slim in trajectory:
                import numpy as np

                mj_data.qpos[:] = np.asarray(slim.data.qpos)
                mj_data.qvel[:] = np.asarray(slim.data.qvel)
                mujoco.mj_forward(self._mj_model, mj_data)
                renderer.update_scene(mj_data)
                frames.append(renderer.render())
        finally:
            renderer.close()
        return frames


_CARTPOLE_XML = """
<mujoco model="cartpole">
  <option timestep="0.01"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <joint name="slide" type="slide" axis="1 0 0" range="-2.5 2.5"/>
      <geom type="box" size="0.2 0.1 0.05" mass="1"/>
      <body name="pole">
        <joint name="hinge" type="hinge" axis="0 1 0"/>
        <geom type="capsule" fromto="0 0 0 0 0 0.6" size="0.045" mass="0.1"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="slide" gear="10" ctrlrange="-1 1"/></actuator>
</mujoco>
"""


class MJXCartpoleBalance(MJXEnv):
    """MJX cartpole-balance: dm_control-style smooth reward, terminate on
    cart leaving the track or pole falling. Physics-backed counterpart of
    the analytic ``envs.classic.CartpoleBalance``."""

    def __init__(self, n_substeps: int = 2):
        if not MJX_AVAILABLE:
            raise ImportError("MJXCartpoleBalance requires 'mujoco-mjx'.")
        model = mujoco.MjModel.from_xml_string(_CARTPOLE_XML)
        super().__init__(model, n_substeps=n_substeps, reset_noise=0.05)

    def _obs(self, data: Any) -> jax.Array:
        x, theta = data.qpos[0], data.qpos[1]
        return jnp.stack([x, jnp.cos(theta), jnp.sin(theta), data.qvel[0], data.qvel[1]])

    def _reward(self, data: Any, action: jax.Array) -> jax.Array:
        upright = (jnp.cos(data.qpos[1]) + 1.0) / 2.0
        centered = jnp.exp(-0.5 * jnp.maximum(jnp.abs(data.qpos[0]) - 0.25, 0.0) ** 2)
        return upright * (1.0 + centered) / 2.0

    def _done(self, data: Any) -> jax.Array:
        fell = jnp.abs(data.qpos[1]) > 0.8
        off_track = jnp.abs(data.qpos[0]) > 2.4
        return jnp.logical_or(fell, off_track).astype(jnp.float32)
