"""Object manipulation: push a free ball to a ground target.

The multi-tree scene workload (``physics/scene.py``): the ball-shoulder
arm (tree 0) and a free rolling ball (tree 1) interact only through the
cross-tree sphere contact between the end effector and the ball — the
contact force the policy must learn to aim. Extends the manipulation
family beyond reaching to dynamic object interaction (the workload
class MJX users get from pusher/striker tasks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State
from nnx_ppo_tpu.physics.model import FREE, ModelBuilder
from nnx_ppo_tpu.physics.models.arm import FORE_LEN, UPPER_LEN, make_arm
from nnx_ppo_tpu.physics.scene import Scene, scene_step
from nnx_ppo_tpu.physics.spatial import quat_integrate

BALL_RADIUS = 0.08
SHOULDER_HEIGHT = 0.55


def _make_ball() -> "object":
    b = ModelBuilder(gravity=-9.81)
    b.add_body(
        "ball",
        joint=FREE,
        mass=0.5,
        inertia=(2.0 / 5.0 * 0.5 * BALL_RADIUS**2,) * 3,
    )
    b.add_sphere_geom("ball", (0.0, 0.0, 0.0), BALL_RADIUS)
    # friction_vel / max_contact_force keep the explicit friction term
    # stable when the light free ball takes violent hits: the viscous
    # slope μ·fn_max/friction_vel must satisfy slope·dt/m_eff < 2 for
    # the smallest effective contact mass (the ball vs the forearm tip,
    # m_eff ≈ 0.06 kg at dt = 1.25 ms → slope < 96 N/(m/s)).
    return b.finalize(
        contact_stiffness=3_000.0,
        contact_damping=50.0,
        friction=0.6,
        friction_vel=1.0,
        max_contact_force=80.0,
    )


class ArmPush:
    """Push the ball to a 2-D ground target with the arm's end effector.

    Observation ``[22]``: shoulder quaternion (4) ‖ shoulder ω (3) ‖
    elbow angle/rate (2) ‖ end effector (3) ‖ ball (3) ‖ ball velocity
    (3) ‖ target xy (2) ‖ target − ball xy (2), positions relative to
    the arm base on the ground. Action ``[4]``: torques. Reward:
    ``exp(-(d_ball→target/σ)²) + 0.3·exp(-(d_ee→ball/σ)²) − ctrl``.
    """

    observation_size: int = 22
    action_size: int = 4

    def __init__(
        self,
        torque_scale: float = 6.0,
        sigma_target: float = 0.12,
        sigma_reach: float = 0.15,
        ctrl_cost: float = 0.005,
        control_dt: float = 0.02,
        n_substeps: int = 16,
        target_radius: tuple[float, float] = (0.25, 0.45),
        substep_impl: str = "auto",
    ):
        arm = make_arm(
            shoulder_height=SHOULDER_HEIGHT,
            friction_vel=1.0,
            max_contact_force=60.0,
        )
        ball = _make_ball()
        # Cross-tree contact: end-effector sphere (arm geom 0) vs ball.
        self.scene = Scene(models=(arm, ball), pairs=((0, 0, 1, 0),))
        self.torque_scale = torque_scale
        self.sigma_target = sigma_target
        self.sigma_reach = sigma_reach
        self.ctrl_cost = ctrl_cost
        self.control_dt = control_dt
        self.n_substeps = n_substeps
        self.physics_dt = control_dt / n_substeps
        self.target_radius = target_radius
        # Scene megakernel: arm + ball + their cross contact, all
        # n_substeps of a control step in ONE Pallas launch per tile.
        # A pusher_4096 device profile showed the XLA scene path at
        # ~4,400 kernel launches per train iteration, ~75% device-idle
        # (dispatch-bound) — the same pathology the locomotion
        # megakernel removed. 'auto' = kernel on TPU, XLA elsewhere.
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
                self.scene.models, self.scene.pairs, self.physics_dt,
                n_substeps, force_pallas=(substep_impl == "pallas"),
            )

    # -- helpers ----------------------------------------------------------

    def _ee_pos(self, arm_qpos: jax.Array) -> jax.Array:
        from nnx_ppo_tpu.physics.engine import fwd_kinematics
        from nnx_ppo_tpu.physics.models.arm import EE_OFFSET

        kin = fwd_kinematics(self.scene.models[0], arm_qpos)
        return kin.p[1] + kin.E[1] @ jnp.asarray(EE_OFFSET, jnp.float32)

    def _obs(self, q: dict) -> jax.Array:
        ee = self._ee_pos(q["arm_qpos"])
        ball = q["ball_qpos"][0:3]
        return jnp.concatenate(
            [
                q["arm_qpos"][0:4],
                q["arm_qvel"][0:3],
                q["arm_qpos"][4:5],
                q["arm_qvel"][3:4],
                ee,
                ball,
                q["ball_qvel"][3:6],
                q["target"],
                q["target"] - ball[0:2],
            ]
        )

    def _state(self, q: dict, action: jax.Array) -> State:
        ee = self._ee_pos(q["arm_qpos"])
        ball = q["ball_qpos"][0:3]
        d_bt = jnp.linalg.norm(q["target"] - ball[0:2])
        d_eb = jnp.linalg.norm(ball - ee)
        reward = (
            jnp.exp(-((d_bt / self.sigma_target) ** 2))
            + 0.3 * jnp.exp(-((d_eb / self.sigma_reach) ** 2))
            - self.ctrl_cost * jnp.sum(jnp.square(action))
        )
        # Terminate when the ball is knocked out of the workspace — the
        # episode carries no further signal and auto-reset restores a
        # fresh scene.
        escaped = jnp.linalg.norm(ball[0:2]) > 2.0
        return State(
            data=q,
            obs=self._obs(q),
            reward=reward,
            done=escaped.astype(jnp.float32),
            info={},
            metrics={"ball_to_target": d_bt, "ee_to_ball": d_eb},
        )

    # -- rendering --------------------------------------------------------

    def render(self, trajectory, height: int = 240, width: int = 320):
        """Rasterize a trajectory of (Slim)States into HWC uint8 frames:
        top-down view centered on the arm base — arm segments projected
        to the ground plane, end effector, the ball (circle, to scale),
        and the target as a crosshair. Completes the
        eval→render→video pipeline for the scene/object-interaction
        family with no graphics dependency."""
        import numpy as np

        from nnx_ppo_tpu.physics.engine import fwd_kinematics
        from nnx_ppo_tpu.physics.models.arm import EE_OFFSET

        scale = min(height, width) / 1.8  # ~0.9 m half-extent
        cx, cy = width // 2, height // 2

        def to_px(x, y):
            # World xy → screen: x right, y up.
            return int(cx + x * scale), int(cy - y * scale)

        def draw_line(frame, a, b, color):
            n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1)) + 1
            for t in np.linspace(0.0, 1.0, 2 * n):
                px = int(a[0] + t * (b[0] - a[0]))
                py = int(a[1] + t * (b[1] - a[1]))
                if 0 <= px < width - 1 and 0 <= py < height - 1:
                    frame[py : py + 2, px : px + 2, :] = color

        arm = self.scene.models[0]
        frames = []
        for slim in trajectory:
            q = {k: np.asarray(jax.device_get(v))
                 for k, v in slim.data.items()}
            kin = fwd_kinematics(arm, jnp.asarray(q["arm_qpos"]))
            ps = [np.asarray(jax.device_get(p)) for p in kin.p]
            Es = [np.asarray(jax.device_get(E)) for E in kin.E]
            elbow = ps[1]
            tip = ps[1] + Es[1] @ np.asarray(EE_OFFSET, np.float32)
            ball = q["ball_qpos"][0:3]
            target = q["target"]

            frame = np.full((height, width, 3), 255, np.uint8)
            # Base mark.
            frame[cy - 2 : cy + 3, cx - 2 : cx + 3, :] = (40, 40, 40)
            draw_line(frame, to_px(0.0, 0.0), to_px(elbow[0], elbow[1]),
                      (60, 60, 60))
            draw_line(frame, to_px(elbow[0], elbow[1]),
                      to_px(tip[0], tip[1]), (60, 60, 60))
            px, py = to_px(tip[0], tip[1])
            if 0 <= px < width - 4 and 0 <= py < height - 4:
                frame[py : py + 4, px : px + 4, :] = (200, 80, 40)
            # Ball, drawn to scale.
            bx, by = to_px(ball[0], ball[1])
            r = max(int(BALL_RADIUS * scale), 2)
            yy, xx = np.ogrid[-r : r + 1, -r : r + 1]
            disk = yy * yy + xx * xx <= r * r
            y0, x0 = by - r, bx - r
            for dy_i in range(2 * r + 1):
                for dx_i in range(2 * r + 1):
                    if disk[dy_i, dx_i]:
                        yq, xq = y0 + dy_i, x0 + dx_i
                        if 0 <= yq < height and 0 <= xq < width:
                            frame[yq, xq, :] = (80, 140, 60)
            # Target crosshair.
            tx, ty = to_px(target[0], target[1])
            draw_line(frame, (tx - 5, ty), (tx + 5, ty), (40, 40, 200))
            draw_line(frame, (tx, ty - 5), (tx, ty + 5), (40, 40, 200))
            frames.append(frame)
        return frames

    # -- protocol ---------------------------------------------------------

    def reset(self, rng: jax.Array) -> State:
        k_q, k_b, k_t = jax.random.split(rng, 3)
        tilt = 0.2 * jax.random.normal(k_q, (3,))
        quat = quat_integrate(jnp.array([1.0, 0.0, 0.0, 0.0]), tilt, 1.0)
        arm_qpos = jnp.concatenate([quat, jnp.zeros(1)])
        # Ball spawns on the ground within easy reach, never under the
        # hanging end effector.
        k_ba, k_br = jax.random.split(k_b)
        ang = jax.random.uniform(k_ba, (), minval=0.0, maxval=2.0 * jnp.pi)
        r = jax.random.uniform(k_br, (), minval=0.15, maxval=0.3)
        ball_xy = r * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
        ball_qpos = jnp.concatenate(
            [ball_xy, jnp.array([BALL_RADIUS]), jnp.array([1.0, 0, 0, 0])]
        )
        k_ta, k_tr = jax.random.split(k_t)
        t_ang = jax.random.uniform(k_ta, (), minval=0.0, maxval=2.0 * jnp.pi)
        lo, hi = self.target_radius
        t_r = jax.random.uniform(k_tr, (), minval=lo, maxval=hi)
        target = t_r * jnp.stack([jnp.cos(t_ang), jnp.sin(t_ang)])
        q = {
            "arm_qpos": arm_qpos,
            "arm_qvel": jnp.zeros(4),
            "ball_qpos": ball_qpos,
            "ball_qvel": jnp.zeros(6),
            "target": target,
        }
        return self._state(q, jnp.zeros(self.action_size))

    def step(self, state: State, action: jax.Array) -> State:
        q = state.data
        tau = self.torque_scale * jnp.clip(action, -1.0, 1.0)
        if self._scene_runner is not None and (
            self.substep_impl == "pallas" or jax.default_backend() == "tpu"
        ):
            arm = self.scene.models[0]
            qp, qv, _ = self._scene_runner(
                jnp.concatenate([q["arm_qpos"], q["ball_qpos"]]),
                jnp.concatenate([q["arm_qvel"], q["ball_qvel"]]),
                jnp.concatenate([tau, jnp.zeros(6)]),
            )
            arm_qpos, ball_qpos = qp[: arm.nq], qp[arm.nq :]
            arm_qvel, ball_qvel = qv[: arm.nv], qv[arm.nv :]
        else:
            (arm_qpos, ball_qpos), (arm_qvel, ball_qvel), _ = scene_step(
                self.scene,
                (q["arm_qpos"], q["ball_qpos"]),
                (q["arm_qvel"], q["ball_qvel"]),
                (tau, jnp.zeros(6)),
                self.physics_dt,
                n_substeps=self.n_substeps,
            )
        # Velocity clamps: the penalty contacts are explicit, and a
        # worst-case adversarial action sequence can drive the
        # light-ball/thin-forearm contact pair into its marginal
        # stability region — bound the state so a pathological hit
        # saturates instead of compounding (MJX/Brax envs guard the
        # same way). Ordinary dynamics sit far below these bounds.
        arm_qvel = jnp.clip(arm_qvel, -30.0, 30.0)
        ball_qvel = jnp.concatenate(
            [
                jnp.clip(ball_qvel[0:3], -150.0, 150.0),  # ω
                jnp.clip(ball_qvel[3:6], -20.0, 20.0),  # v
            ]
        )
        new_q = {
            "arm_qpos": arm_qpos,
            "arm_qvel": arm_qvel,
            "ball_qpos": ball_qpos,
            "ball_qvel": ball_qvel,
            "target": q["target"],
        }
        return self._state(new_q, action)
