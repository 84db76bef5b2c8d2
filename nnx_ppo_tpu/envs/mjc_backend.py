"""MuJoCo-C physics backend for :class:`~nnx_ppo_tpu.envs.mjx.MJXEnv`.

The reference's MJX test matrix is parametrized over backend
implementations (reference ``nnx_ppo/algorithms/ppo_test.py:447-487``,
``impl="jax"`` / ``impl="warp"``). This module is the analogous second
implementation here: the same ``MJXEnv`` adapter running on the plain
MuJoCo **C** engine through ``jax.pure_callback`` — no ``mujoco-mjx``
needed, only ``mujoco`` itself. It is the CPU development/parity
backend; MJX (pure XLA) remains the TPU path.

Design notes (TPU-first framework, host-callback escape hatch):

* The callback state is the minimal MuJoCo state vector
  ``(qpos, qvel, act)`` plus ``ctrl`` — exactly what ``mj_step``
  consumes and produces. Everything else MuJoCo derives is
  recomputable on the host (``mj_forward``), so the traced pytree
  stays tiny and the device<->host traffic is a few hundred bytes per
  env per control step.
* Batching: the shim advertises ``vmap_method="broadcast_all"`` so a
  ``jax.vmap`` over envs arrives as one callback carrying the whole
  ``[B, ...]`` batch; the host loops envs into a single reused
  ``MjData`` (serialized by a lock — MjData is not thread-safe).
* ``n_substeps`` are folded INTO one callback per control step (the
  adapter passes its frame-skip down), so the host round-trip count is
  per control step, not per physics substep.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - exercised only when mujoco is installed
    import mujoco

    MJC_AVAILABLE = True
except ImportError:  # pragma: no cover
    mujoco = None
    MJC_AVAILABLE = False


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MJCData:
    """Traced MuJoCo state: the ``mj_step`` state vector + controls.

    Field subset of ``mjx.Data`` that the :class:`MJXEnv` adapter (and
    its task hooks) touch — ``qpos``/``qvel``/``act``/``ctrl``/``time``
    — so the two backends are drop-in interchangeable for adapter code.
    """

    qpos: jax.Array
    qvel: jax.Array
    act: jax.Array
    ctrl: jax.Array
    time: jax.Array

    def replace(self, **kw: Any) -> "MJCData":
        import dataclasses

        return dataclasses.replace(self, **kw)


class MJCBackend:
    """``put_model``/``make_data``/``step`` on the MuJoCo C engine.

    One instance owns one ``MjModel`` + a reused ``MjData`` scratch
    (lock-guarded). ``step`` is jit/vmap/scan-compatible via
    ``jax.pure_callback``.
    """

    def __init__(self, mj_model: Any):
        if not MJC_AVAILABLE:
            raise ImportError("MJCBackend requires the 'mujoco' package.")
        self.model = mj_model
        self._scratch = mujoco.MjData(mj_model)
        self._lock = threading.Lock()
        self.nq, self.nv, self.na, self.nu = (
            mj_model.nq, mj_model.nv, mj_model.na, mj_model.nu,
        )

    def make_data(self) -> MJCData:
        return MJCData(
            qpos=jnp.asarray(self.model.qpos0, jnp.float32),
            qvel=jnp.zeros((self.nv,), jnp.float32),
            act=jnp.zeros((self.na,), jnp.float32),
            ctrl=jnp.zeros((self.nu,), jnp.float32),
            time=jnp.zeros((), jnp.float32),
        )

    # -- host side ----------------------------------------------------------

    def _host_step(self, qpos, qvel, act, ctrl, time, n_substeps: int):
        qpos = np.atleast_2d(np.asarray(qpos, np.float64))
        qvel = np.atleast_2d(np.asarray(qvel, np.float64))
        act = np.asarray(act, np.float64).reshape(qpos.shape[0], self.na)
        ctrl = np.asarray(ctrl, np.float64).reshape(qpos.shape[0], self.nu)
        time = np.asarray(time, np.float64).reshape(qpos.shape[0])
        B = qpos.shape[0]
        out_qpos = np.empty_like(qpos)
        out_qvel = np.empty_like(qvel)
        out_act = np.empty_like(act)
        out_time = np.empty_like(time)
        with self._lock:
            d = self._scratch
            for b in range(B):
                mujoco.mj_resetData(self.model, d)
                d.qpos[:] = qpos[b]
                d.qvel[:] = qvel[b]
                if self.na:
                    d.act[:] = act[b]
                if self.nu:
                    d.ctrl[:] = ctrl[b]
                d.time = time[b]
                for _ in range(n_substeps):
                    mujoco.mj_step(self.model, d)
                out_qpos[b] = d.qpos
                out_qvel[b] = d.qvel
                if self.na:
                    out_act[b] = d.act
                out_time[b] = d.time
        f32 = lambda x: x.astype(np.float32)
        return f32(out_qpos), f32(out_qvel), f32(out_act), f32(out_time)

    # -- traced side ---------------------------------------------------------

    def step(self, data: MJCData, n_substeps: int = 1) -> MJCData:
        """Advance ``n_substeps`` physics steps (one host round-trip)."""
        shapes = (
            jax.ShapeDtypeStruct(data.qpos.shape, jnp.float32),
            jax.ShapeDtypeStruct(data.qvel.shape, jnp.float32),
            jax.ShapeDtypeStruct(data.act.shape, jnp.float32),
            jax.ShapeDtypeStruct(data.time.shape, jnp.float32),
        )

        def cb(qpos, qvel, act, ctrl, time):
            qp, qv, ac, t = self._host_step(
                qpos, qvel, act, ctrl, time, n_substeps
            )
            return (
                qp.reshape(qpos.shape), qv.reshape(qvel.shape),
                ac.reshape(act.shape), t.reshape(time.shape),
            )

        qpos, qvel, act, time = jax.pure_callback(
            cb, shapes, data.qpos, data.qvel, data.act, data.ctrl,
            data.time, vmap_method="broadcast_all",
        )
        return data.replace(qpos=qpos, qvel=qvel, act=act, time=time)
