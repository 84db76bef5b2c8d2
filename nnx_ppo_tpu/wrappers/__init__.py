from nnx_ppo_tpu.wrappers.episode_wrapper import EpisodeWrapper
from nnx_ppo_tpu.wrappers.reward_scaling_wrapper import RewardScalingWrapper

__all__ = ["EpisodeWrapper", "RewardScalingWrapper"]
