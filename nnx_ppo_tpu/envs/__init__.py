from nnx_ppo_tpu.envs.chain import NLinkSwingup
from nnx_ppo_tpu.envs.classic import CartpoleBalance, CartpoleSwingup, Pendulum
from nnx_ppo_tpu.envs.locomotion import JoystickLocomotion
from nnx_ppo_tpu.envs.mjc_backend import MJC_AVAILABLE, MJCBackend, MJCData
from nnx_ppo_tpu.envs.mjx import MJX_AVAILABLE, MJXCartpoleBalance, MJXEnv
from nnx_ppo_tpu.envs.humanoid import HumanoidJoystick
from nnx_ppo_tpu.envs.legged import LeggedJoystick, legged_from_mjcf
from nnx_ppo_tpu.envs.quadruped import QuadrupedJoystick
from nnx_ppo_tpu.envs.pusher import ArmPush
from nnx_ppo_tpu.envs.reacher import ArmReacher
from nnx_ppo_tpu.envs.types import State

__all__ = [
    "ArmPush",
    "ArmReacher",
    "CartpoleBalance",
    "CartpoleSwingup",
    "Pendulum",
    "JoystickLocomotion",
    "NLinkSwingup",
    "QuadrupedJoystick",
    "HumanoidJoystick",
    "LeggedJoystick",
    "legged_from_mjcf",
    "MJXEnv",
    "MJXCartpoleBalance",
    "MJX_AVAILABLE",
    "MJCBackend",
    "MJCData",
    "MJC_AVAILABLE",
    "State",
]
