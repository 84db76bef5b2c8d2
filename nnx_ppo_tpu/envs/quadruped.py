"""Joystick-commanded quadruped locomotion on the in-repo rigid-body
engine — the contact-rich benchmark workload standing in for the
``Go1JoystickFlatTerrain`` MJX config named in BASELINE.md (the
reference's primary physics substrate, mujoco_playground MJX —
``/root/reference/nnx_ppo/algorithms/ppo_test.py:26-28`` — is an
external dependency; ``physics/`` is this framework's TPU-native
equivalent).

Single-env protocol like every env here; the library vmaps it. Per
control step (50 Hz) the env runs 10 physics substeps at 500 Hz: each
substep assembles the 18×18 mass matrix (CRBA), bias forces (RNEA), and
8 sphere-ground contacts, then solves with the unrolled Cholesky — a
genuinely contact-rich per-step compute profile (≈40× the FLOPs of the
analytic cartpole).

Observation (dict)::

    {"proprio": [42]  (trunk ω (3) ‖ gravity dir in trunk frame (3) ‖
                       joint pos − default (12) ‖ joint vel (12) ‖
                       previous action (12)),
     "command": [3]   (vx*, vy*, ωz* in the trunk frame)}

Action: ``[12]`` joint-position targets around the default pose (PD:
P-gain explicit, D-gain implicit via model joint damping — see
``physics/engine.py::forward_dynamics``).

Reward (dict, per-key GAE like the reference's dict-reward support)::

    {"tracking": exp-tracking of commanded planar/yaw velocity,
     "penalty":  −(energy + action-rate + orientation + height) costs}

Termination: trunk tilt past ~60° or trunk height below 0.12 m.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nnx_ppo_tpu.envs.types import State
from nnx_ppo_tpu.physics.engine import forward_dynamics, integrate
from nnx_ppo_tpu.physics.models import make_quadruped
from nnx_ppo_tpu.physics.models.quadruped import (
    DEFAULT_JOINT_POSE,
    STAND_HEIGHT,
)
from nnx_ppo_tpu.physics.spatial import quat_to_rot


class QuadrupedJoystick:
    """Velocity-command tracking for a 12-actuator quadruped."""

    observation_size = {"proprio": 42, "command": 3}
    action_size: int = 12

    def __init__(
        self,
        kp: float = 60.0,
        action_scale: float = 0.5,
        control_dt: float = 0.02,
        n_substeps: int = 10,
        max_command: tuple[float, float, float] = (1.0, 0.5, 1.5),
        command_resample_prob: float = 0.004,
        tracking_sigma: float = 0.25,
    ):
        self.model = make_quadruped()
        self.kp = kp
        self.action_scale = action_scale
        self.control_dt = control_dt
        self.n_substeps = n_substeps
        self.physics_dt = control_dt / n_substeps
        self.max_command = jnp.asarray(max_command)
        self.command_resample_prob = command_resample_prob
        self.tracking_sigma = tracking_sigma
        self.default_pose = jnp.asarray(DEFAULT_JOINT_POSE, jnp.float32)

    # -- helpers ----------------------------------------------------------

    def _sample_command(self, key: jax.Array) -> jax.Array:
        return self.max_command * jax.random.uniform(
            key, (3,), minval=-1.0, maxval=1.0
        )

    def _obs(self, q: dict) -> dict:
        qpos, qvel = q["qpos"], q["qvel"]
        E = quat_to_rot(qpos[3:7])  # world_R_trunk
        gravity_dir = E.T @ jnp.array([0.0, 0.0, -1.0])
        proprio = jnp.concatenate(
            [
                qvel[0:3],  # trunk angular velocity (body frame)
                gravity_dir,
                qpos[7:] - self.default_pose,
                qvel[6:],
                q["prev_action"],
            ]
        )
        return {"proprio": proprio, "command": q["cmd"]}

    def _reward(self, q: dict, action: jax.Array, prev_action: jax.Array):
        qpos, qvel = q["qpos"], q["qvel"]
        E = quat_to_rot(qpos[3:7])
        # Planar velocity in the trunk's yaw frame ≈ body-frame v (the
        # trunk stays near-level; body-frame tracking is standard).
        v_body = qvel[3:6]
        w_body = qvel[0:3]
        cmd = q["cmd"]
        lin_err = jnp.sum(jnp.square(cmd[:2] - v_body[:2]))
        ang_err = jnp.square(cmd[2] - w_body[2])
        r_lin = jnp.exp(-lin_err / self.tracking_sigma)
        r_ang = jnp.exp(-ang_err / self.tracking_sigma)
        tracking = 0.7 * r_lin + 0.3 * r_ang

        up_alignment = (E.T @ jnp.array([0.0, 0.0, 1.0]))[2]  # 1 = level
        penalty = (
            0.002 * jnp.sum(jnp.square(action))
            + 0.01 * jnp.sum(jnp.square(action - prev_action))
            + 0.05 * jnp.square(qpos[2] - STAND_HEIGHT)
            + 0.02 * (1.0 - up_alignment)
        )
        return {"tracking": tracking, "penalty": -penalty}

    def _done(self, q: dict) -> jax.Array:
        qpos = q["qpos"]
        E = quat_to_rot(qpos[3:7])
        up = (E.T @ jnp.array([0.0, 0.0, 1.0]))[2]
        fallen = jnp.logical_or(up < 0.5, qpos[2] < 0.12)
        return fallen.astype(jnp.float32)

    def _state(self, q: dict, action: jax.Array, prev_action: jax.Array) -> State:
        reward = self._reward(q, action, prev_action)
        return State(
            data=q,
            obs=self._obs(q),
            reward=reward,
            done=self._done(q),
            info={},
            metrics={
                "trunk_height": q["qpos"][2],
                "speed": jnp.linalg.norm(q["qvel"][3:5]),
            },
        )

    # -- protocol ---------------------------------------------------------

    def reset(self, rng: jax.Array) -> State:
        k_pose, k_vel, k_cmd, k_carry = jax.random.split(rng, 4)
        joint_noise = 0.1 * jax.random.normal(k_pose, (12,))
        qpos = jnp.concatenate(
            [
                jnp.array([0.0, 0.0, STAND_HEIGHT]),
                jnp.array([1.0, 0.0, 0.0, 0.0]),
                self.default_pose + joint_noise,
            ]
        )
        qvel = 0.05 * jax.random.normal(k_vel, (self.model.nv,))
        q = {
            "qpos": qpos,
            "qvel": qvel,
            "cmd": self._sample_command(k_cmd),
            "key": k_carry,
            "prev_action": jnp.zeros(12),
        }
        zero = jnp.zeros(12)
        return self._state(q, zero, zero)

    def step(self, state: State, action: jax.Array) -> State:
        q = state.data
        action = jnp.clip(action, -1.0, 1.0)
        target = self.default_pose + self.action_scale * action

        def substep(carry, _):
            qp, qv = carry
            # PD recomputed every physics substep against the held
            # target (P explicit; D implicit via model joint damping).
            tau_j = self.kp * (target - qp[7:])
            tau = jnp.concatenate([jnp.zeros(6), tau_j])
            qacc, _ = forward_dynamics(
                self.model, qp, qv, tau, dt=self.physics_dt
            )
            qp, qv = integrate(self.model, qp, qv, qacc, self.physics_dt)
            return (qp, qv), None

        (qpos, qvel), _ = jax.lax.scan(
            substep, (q["qpos"], q["qvel"]), None, length=self.n_substeps
        )
        resample_key, cmd_key, carry_key = jax.random.split(q["key"], 3)
        resample = jax.random.bernoulli(
            resample_key, self.command_resample_prob
        )
        cmd = jnp.where(resample, self._sample_command(cmd_key), q["cmd"])
        new_q = {
            "qpos": qpos,
            "qvel": qvel,
            "cmd": cmd,
            "key": carry_key,
            "prev_action": action,
        }
        return self._state(new_q, action, q["prev_action"])
