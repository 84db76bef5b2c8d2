from nnx_ppo_tpu.ops.gae import gae, gae_pallas, gae_scan
from nnx_ppo_tpu.ops.linalg import cholesky_solve_small
from nnx_ppo_tpu.ops.welford import batch_moments, merge_moments

__all__ = [
    "gae",
    "gae_pallas",
    "gae_scan",
    "cholesky_solve_small",
    "batch_moments",
    "merge_moments",
]
