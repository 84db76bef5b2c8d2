"""MuJoCo environment adapter (MJX / MuJoCo-C backends).

The reference's physics substrate is ``mujoco_playground`` with a
backend-parametrized implementation switch (MJX ``impl="jax"`` /
MuJoCo-Warp ``impl="warp"`` — reference ``ppo_test.py:26-28,447-487``).
This adapter mirrors that switch TPU-first:

* ``impl="mjx"`` — MuJoCo-XLA: compiles to XLA, shards over a
  data-parallel mesh like any other pytree env. The TPU path. Needs
  the optional ``mujoco-mjx`` package.
* ``impl="mjc"`` — the MuJoCo **C** engine through ``jax.pure_callback``
  (:mod:`nnx_ppo_tpu.envs.mjc_backend`): runs wherever plain
  ``mujoco`` is installed. The CPU development / ground-truth parity
  path.
* ``impl="auto"`` (default) — mjx if importable, else mjc.

Everything else in the framework is independent of this module — any
object satisfying the ``RLEnv`` protocol plugs in, including
``mujoco_playground`` envs directly (their ``State`` already has
obs/done/reward/info/metrics).

``MJXEnv`` wraps a raw ``mujoco.MjModel`` as a single unbatched
``RLEnv`` (the library vmaps to n_envs). Subclasses override the task
hooks ``_obs`` / ``_reward`` / ``_done`` / ``_init_qpos``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.mjc_backend import MJC_AVAILABLE, MJCBackend, mujoco
from nnx_ppo_tpu.envs.types import State

try:  # pragma: no cover - exercised only when mujoco-mjx is installed
    from mujoco import mjx

    MJX_AVAILABLE = True
except ImportError:  # pragma: no cover
    mjx = None
    MJX_AVAILABLE = False


class MJXEnv:
    """A MuJoCo model as an ``RLEnv`` via MJX or the C engine.

    Args:
      mj_model: a ``mujoco.MjModel`` (e.g. ``MjModel.from_xml_string``).
      n_substeps: physics substeps per env step (frame-skip).
      reset_noise: uniform qpos/qvel noise half-width at reset.
      impl: ``"auto"`` | ``"mjx"`` | ``"mjc"`` backend selection (see
        module docstring).
    """

    def __init__(
        self,
        mj_model: Any,
        n_substeps: int = 4,
        reset_noise: float = 0.05,
        impl: str = "auto",
    ):
        if impl not in ("auto", "mjx", "mjc"):
            raise ValueError(f"impl must be 'auto'|'mjx'|'mjc', got {impl!r}")
        if impl == "auto":
            impl = "mjx" if MJX_AVAILABLE else "mjc"
        if impl == "mjx" and not MJX_AVAILABLE:
            raise ImportError(
                "MJXEnv(impl='mjx') requires the optional 'mujoco-mjx' "
                "package (pip install mujoco mujoco-mjx)."
            )
        if impl == "mjc" and not MJC_AVAILABLE:
            raise ImportError(
                "MJXEnv(impl='mjc') requires the 'mujoco' package; "
                "for the XLA backend install 'mujoco-mjx'."
            )
        self.impl = impl
        self._mj_model = mj_model
        if impl == "mjx":
            self._model = mjx.put_model(mj_model)
            self._mjc: MJCBackend | None = None
        else:
            self._mjc = MJCBackend(mj_model)
            self._model = None
        self.n_substeps = n_substeps
        self.reset_noise = reset_noise
        self.action_size = mj_model.nu
        self.observation_size = self._obs(self._fresh_data()).shape[-1]

    def _fresh_data(self) -> Any:
        if self.impl == "mjx":
            return mjx.make_data(self._model)
        return self._mjc.make_data()

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
        data = self._fresh_data()
        data = data.replace(
            qpos=qpos.astype(data.qpos.dtype), qvel=qvel.astype(data.qvel.dtype)
        )
        if self.impl == "mjx":
            data = mjx.forward(self._model, data)
        return self._state(data, jnp.zeros(self.action_size))

    def step(self, state: State, action: jax.Array) -> State:
        action = jnp.clip(jnp.asarray(action).reshape(self.action_size), -1.0, 1.0)
        data = state.data.replace(ctrl=action.astype(state.data.ctrl.dtype))

        if self.impl == "mjc":
            # One host round-trip covers the whole frame-skip.
            data = self._mjc.step(data, n_substeps=self.n_substeps)
            return self._state(data, action)

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

    def __init__(self, n_substeps: int = 2, impl: str = "auto"):
        if not (MJX_AVAILABLE or MJC_AVAILABLE):
            raise ImportError("MJXCartpoleBalance requires 'mujoco'.")
        model = mujoco.MjModel.from_xml_string(_CARTPOLE_XML)
        super().__init__(model, n_substeps=n_substeps, reset_noise=0.05,
                         impl=impl)

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
