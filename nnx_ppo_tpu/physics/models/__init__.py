from nnx_ppo_tpu.physics.models.quadruped import make_quadruped

__all__ = ["make_quadruped"]
