"""3-D target reaching with a ball-shoulder manipulator.

The manipulation env family (alongside locomotion) on the in-repo
rigid-body engine — the reference framework is substrate-agnostic
(any ``RLEnv``; SURVEY §2.3/§2.6), so this fills the workload class its
MJX users get from manipulator tasks. Torque control (no PD: a
quaternion joint has no scalar position error), dense exp-distance
reward, per-episode targets drawn from the reachable shell using the
per-env key carried in ``State.data``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State
from nnx_ppo_tpu.physics.engine import fwd_kinematics, step
from nnx_ppo_tpu.physics.models.arm import (
    EE_OFFSET,
    FORE_LEN,
    SHOULDER_HEIGHT,
    UPPER_LEN,
    default_qpos,
    make_arm,
)


class ArmReacher:
    """Drive the end effector to a 3-D target and hold it there.

    Observation ``[18]``: shoulder quaternion (4) ‖ shoulder ω (3) ‖
    elbow angle/rate (2) ‖ end-effector position (3) ‖ target (3) ‖
    target − end-effector (3), positions relative to the shoulder.
    Action ``[4]``: torques (shoulder x/y/z in the child frame, elbow),
    scaled by ``torque_scale``. Reward: ``exp(-(d/σ)²) − ctrl penalty``.
    """

    observation_size: int = 18
    action_size: int = 4

    def __init__(
        self,
        torque_scale: float = 6.0,
        sigma: float = 0.15,
        ctrl_cost: float = 0.01,
        control_dt: float = 0.02,
        n_substeps: int = 4,
        target_radius: tuple[float, float] = (0.25, 0.6),
        substep_impl: str = "auto",
    ):
        self.model = make_arm()
        self.torque_scale = torque_scale
        self.sigma = sigma
        self.ctrl_cost = ctrl_cost
        self.control_dt = control_dt
        self.n_substeps = n_substeps
        self.physics_dt = control_dt / n_substeps
        self.target_radius = target_radius
        self.reach = UPPER_LEN + FORE_LEN
        # Manipulation megakernel (general-tree SoA): a control step of
        # the ball+hinge arm in ONE Pallas launch per tile, replacing
        # the sequential XLA substep chain — same dispatch policy as
        # LeggedJoystick.substep_impl ('auto' = kernel on TPU).
        if substep_impl not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"substep_impl must be 'auto'|'xla'|'pallas', got "
                f"{substep_impl!r}"
            )
        self.substep_impl = substep_impl
        self._scene_runner = None
        if substep_impl != "xla":
            from nnx_ppo_tpu.physics.pallas_step import (
                make_scene_control_step_runner,
            )

            self._scene_runner = make_scene_control_step_runner(
                (self.model,), (), self.physics_dt, n_substeps,
                force_pallas=(substep_impl == "pallas"),
            )

    # -- helpers ----------------------------------------------------------

    def _ee_pos(self, qpos: jax.Array) -> jax.Array:
        """End-effector position relative to the shoulder anchor."""
        kin = fwd_kinematics(self.model, qpos)
        tip_world = kin.p[1] + kin.E[1] @ jnp.asarray(EE_OFFSET, jnp.float32)
        return tip_world - jnp.array([0.0, 0.0, SHOULDER_HEIGHT])

    def _sample_target(self, key: jax.Array) -> jax.Array:
        k_dir, k_rad = jax.random.split(key)
        d = jax.random.normal(k_dir, (3,))
        d = d / jnp.linalg.norm(d)
        lo, hi = self.target_radius
        r = jax.random.uniform(k_rad, (), minval=lo, maxval=hi)
        return r * d

    def _obs(self, q: dict) -> jax.Array:
        qpos, qvel = q["qpos"], q["qvel"]
        ee = self._ee_pos(qpos)
        return jnp.concatenate(
            [
                qpos[0:4],  # shoulder quaternion
                qvel[0:3],  # shoulder ω (child frame)
                qpos[4:5],  # elbow angle
                qvel[3:4],  # elbow rate
                ee,
                q["target"],
                q["target"] - ee,
            ]
        )

    def _state(self, q: dict, action: jax.Array) -> State:
        ee = self._ee_pos(q["qpos"])
        dist = jnp.linalg.norm(q["target"] - ee)
        reward = jnp.exp(-((dist / self.sigma) ** 2)) - self.ctrl_cost * jnp.sum(
            jnp.square(action)
        )
        return State(
            data=q,
            obs=self._obs(q),
            reward=reward,
            done=jnp.float32(0.0),  # fixed-horizon; EpisodeWrapper truncates
            info={},
            metrics={"ee_distance": dist},
        )

    # -- rendering --------------------------------------------------------

    def render(self, trajectory, height: int = 240, width: int = 320):
        """Rasterize a trajectory of (Slim)States into HWC uint8 frames
        (side view, camera fixed at the shoulder): arm segments, end
        effector, and the episode target as a crosshair — completes the
        eval→render→video pipeline for the manipulation family with no
        graphics dependency."""
        import numpy as np

        model = self.model
        scale = height / 1.6
        cx, cy = width // 2, height // 2

        def to_px(x, z):
            # Shoulder-relative coords; x right, z up.
            return int(cx + x * scale), int(cy - z * scale)

        def draw_line(frame, a, b, color):
            n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1)) + 1
            for t in np.linspace(0.0, 1.0, 2 * n):
                px = int(a[0] + t * (b[0] - a[0]))
                py = int(a[1] + t * (b[1] - a[1]))
                if 0 <= px < width - 1 and 0 <= py < height - 1:
                    frame[py : py + 2, px : px + 2, :] = color

        frames = []
        anchor = np.array([0.0, 0.0, SHOULDER_HEIGHT], np.float32)
        for slim in trajectory:
            qpos = jnp.asarray(
                np.asarray(jax.device_get(slim.data["qpos"]), np.float32)
            )
            target = np.asarray(jax.device_get(slim.data["target"]))
            kin = fwd_kinematics(model, qpos)
            ps = [np.asarray(jax.device_get(p)) - anchor for p in kin.p]
            Es = [np.asarray(jax.device_get(E)) for E in kin.E]
            elbow = ps[1]
            tip = ps[1] + Es[1] @ np.asarray(EE_OFFSET, np.float32)

            frame = np.full((height, width, 3), 255, np.uint8)
            # Pedestal mark at the shoulder.
            frame[cy - 2 : cy + 3, cx - 2 : cx + 3, :] = (40, 40, 40)
            draw_line(frame, to_px(0.0, 0.0), to_px(elbow[0], elbow[2]),
                      (60, 60, 60))
            draw_line(frame, to_px(elbow[0], elbow[2]),
                      to_px(tip[0], tip[2]), (60, 60, 60))
            px, py = to_px(tip[0], tip[2])
            if 0 <= px < width - 4 and 0 <= py < height - 4:
                frame[py : py + 4, px : px + 4, :] = (200, 80, 40)
            # Target crosshair.
            tx, ty = to_px(target[0], target[2])
            draw_line(frame, (tx - 5, ty), (tx + 5, ty), (40, 40, 200))
            draw_line(frame, (tx, ty - 5), (tx, ty + 5), (40, 40, 200))
            frames.append(frame)
        return frames

    # -- protocol ---------------------------------------------------------

    def reset(self, rng: jax.Array) -> State:
        k_q, k_v, k_t = jax.random.split(rng, 3)
        qpos = jnp.asarray(default_qpos(self.model))
        # Small random shoulder tilt via the exponential map keeps the
        # quaternion valid for any noise draw.
        from nnx_ppo_tpu.physics.spatial import quat_integrate

        tilt = 0.3 * jax.random.normal(k_q, (3,))
        quat = quat_integrate(qpos[0:4], tilt, 1.0)
        qpos = jnp.concatenate([quat, qpos[4:]])
        qvel = 0.05 * jax.random.normal(k_v, (self.model.nv,))
        q = {"qpos": qpos, "qvel": qvel, "target": self._sample_target(k_t)}
        return self._state(q, jnp.zeros(self.action_size))

    def step(self, state: State, action: jax.Array) -> State:
        q = state.data
        tau = self.torque_scale * jnp.clip(action, -1.0, 1.0)
        if self._scene_runner is not None and (
            self.substep_impl == "pallas" or jax.default_backend() == "tpu"
        ):
            qpos, qvel, _ = self._scene_runner(q["qpos"], q["qvel"], tau)
        else:
            qpos, qvel, _ = step(
                self.model, q["qpos"], q["qvel"], tau, self.physics_dt,
                n_substeps=self.n_substeps,
            )
        new_q = {"qpos": qpos, "qvel": qvel, "target": q["target"]}
        return self._state(new_q, action)
