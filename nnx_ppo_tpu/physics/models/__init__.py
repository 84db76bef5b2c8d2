from nnx_ppo_tpu.physics.models.humanoid import make_humanoid
from nnx_ppo_tpu.physics.models.quadruped import make_quadruped

__all__ = ["make_humanoid", "make_quadruped"]
