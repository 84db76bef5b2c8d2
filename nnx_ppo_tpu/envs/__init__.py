from nnx_ppo_tpu.envs.classic import CartpoleBalance, CartpoleSwingup, Pendulum
from nnx_ppo_tpu.envs.types import State

__all__ = ["CartpoleBalance", "CartpoleSwingup", "Pendulum", "State"]
