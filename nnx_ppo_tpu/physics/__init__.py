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
from nnx_ppo_tpu.physics.engine_depthwise import (
    DepthPlan,
    forward_dynamics_dw,
    mass_matrix_dw,
    mass_matrix_factor_dw,
    mass_matrix_inverse_dw,
)
from nnx_ppo_tpu.physics.mjcf import (
    ActuatorSpec,
    MjcfImport,
    MjcfSceneImport,
    from_mjcf,
    from_mjcf_scene,
)
from nnx_ppo_tpu.physics.randomize import (
    DomainParams,
    DomainRandomization,
    privileged_vector,
)
from nnx_ppo_tpu.physics.scene import Scene, scene_forward, scene_step
from nnx_ppo_tpu.physics.terrain import (
    HeightGrid,
    Terrain,
    rough_terrain,
    stairs,
)

__all__ = [
    "ActuatorSpec",
    "DepthPlan",
    "DomainParams",
    "DomainRandomization",
    "MjcfImport",
    "MjcfSceneImport",
    "from_mjcf",
    "from_mjcf_scene",
    "forward_dynamics_dw",
    "mass_matrix_dw",
    "mass_matrix_factor_dw",
    "mass_matrix_inverse_dw",
    "BALL",
    "FREE",
    "HINGE",
    "SLIDE",
    "Model",
    "ModelBuilder",
    "HeightGrid",
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
