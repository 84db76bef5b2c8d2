from nnx_ppo_tpu.utils import profiling

__all__ = ["profiling"]
