"""Joystick-commanded humanoid walking on the in-repo rigid-body
engine — the ``HumanoidWalk``-class workload from BASELINE.md with real
articulated dynamics (16-dof biped: free base + 10 actuated hinges, heel/toe contacts) instead of the
analytic stand-ins. See :class:`nnx_ppo_tpu.envs.legged.LeggedJoystick`
for the obs/action/reward contract.

Standing is actively unstable (as for the real robot): with pure
joint-space PD the pitch mode diverges in ~1–2 s, so the policy must
learn balance — termination thresholds are tuned for a ~0.8 m hip
height.
"""

from __future__ import annotations

from nnx_ppo_tpu.envs.legged import LeggedJoystick
from nnx_ppo_tpu.physics.models import make_humanoid
from nnx_ppo_tpu.physics.models.humanoid import (
    DEFAULT_JOINT_POSE,
    STAND_HEIGHT,
)


class HumanoidJoystick(LeggedJoystick):
    """Velocity-command walking for the 10-actuator biped."""

    observation_size = {"proprio": 36, "command": 3}
    action_size: int = 10

    def __init__(
        self,
        self_collision: bool = False,
        joint_limits: bool = False,
        **overrides,
    ):
        defaults = dict(
            kp=350.0,
            action_scale=0.4,
            max_command=(1.0, 0.3, 1.0),
            min_up=0.6,
            min_height=0.45,
            reset_joint_noise=0.05,
        )
        defaults.update(overrides)
        super().__init__(
            make_humanoid(
                self_collision=self_collision, joint_limits=joint_limits
            ),
            DEFAULT_JOINT_POSE,
            STAND_HEIGHT,
            **defaults,
        )
