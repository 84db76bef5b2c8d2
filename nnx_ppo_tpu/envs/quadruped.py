"""Joystick-commanded quadruped locomotion on the in-repo rigid-body
engine — the contact-rich benchmark workload standing in for the
``Go1JoystickFlatTerrain`` MJX config named in BASELINE.md (the
reference's primary physics substrate, mujoco_playground MJX —
``/root/reference/nnx_ppo/algorithms/ppo_test.py:26-28`` — is an
external dependency; ``physics/`` is this framework's TPU-native
equivalent).

Per control step (50 Hz) the env runs 10 physics substeps at 500 Hz:
each substep assembles the 18×18 mass matrix (CRBA), bias forces
(RNEA), 8 sphere-ground contacts, and an unrolled Cholesky solve —
a genuinely contact-rich per-step compute profile. See
:class:`nnx_ppo_tpu.envs.legged.LeggedJoystick` for the obs/action/
reward contract.
"""

from __future__ import annotations

from nnx_ppo_tpu.envs.legged import LeggedJoystick
from nnx_ppo_tpu.physics.models import make_quadruped
from nnx_ppo_tpu.physics.models.quadruped import (
    DEFAULT_JOINT_POSE,
    STAND_HEIGHT,
)


class QuadrupedJoystick(LeggedJoystick):
    """Velocity-command tracking for the 12-actuator Go1-class model."""

    observation_size = {"proprio": 42, "command": 3}
    action_size: int = 12

    def __init__(
        self,
        self_collision: bool = False,
        joint_limits: bool = False,
        **overrides,
    ):
        defaults = dict(
            kp=60.0,
            action_scale=0.5,
            max_command=(1.0, 0.5, 1.5),
        )
        defaults.update(overrides)
        super().__init__(
            make_quadruped(
                self_collision=self_collision, joint_limits=joint_limits
            ),
            DEFAULT_JOINT_POSE,
            STAND_HEIGHT,
            **defaults,
        )
