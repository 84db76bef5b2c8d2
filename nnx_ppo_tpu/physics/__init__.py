"""TPU-native articulated rigid-body physics (the in-repo substrate
standing in for MJX — see ``physics/engine.py``)."""

from nnx_ppo_tpu.physics.engine import (
    bias_forces,
    forward_dynamics,
    fwd_kinematics,
    integrate,
    limit_torques,
    mass_matrix,
    step,
)
from nnx_ppo_tpu.physics.model import (
    BALL,
    FREE,
    HINGE,
    SLIDE,
    Model,
    ModelBuilder,
)
from nnx_ppo_tpu.physics.randomize import (
    DomainParams,
    DomainRandomization,
    privileged_vector,
)
from nnx_ppo_tpu.physics.scene import Scene, scene_forward, scene_step
from nnx_ppo_tpu.physics.terrain import Terrain, rough_terrain, stairs

__all__ = [
    "DomainParams",
    "DomainRandomization",
    "BALL",
    "FREE",
    "HINGE",
    "SLIDE",
    "Model",
    "ModelBuilder",
    "Scene",
    "Terrain",
    "rough_terrain",
    "stairs",
    "scene_forward",
    "scene_step",
    "bias_forces",
    "forward_dynamics",
    "fwd_kinematics",
    "integrate",
    "limit_torques",
    "mass_matrix",
    "step",
]
