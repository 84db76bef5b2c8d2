from nnx_ppo_tpu.ops.gae import gae, gae_pallas, gae_scan

__all__ = ["gae", "gae_pallas", "gae_scan"]
