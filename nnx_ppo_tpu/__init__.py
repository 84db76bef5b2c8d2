"""nnx_ppo_tpu — a TPU-native PPO framework.

A from-scratch re-design of the capabilities of ``emiwar/nnx-ppo`` for
TPU hardware: immutable pytree modules, pure ``lax.scan`` hot loops, one
donated ``jit`` program per train step, Pallas kernels for sequential
recurrences, and first-class data-parallel device meshes
(``jax.sharding``) the reference lacks.
"""

__version__ = "0.6.0"

from nnx_ppo_tpu import algorithms, core, envs, networks, ops, parallel, wrappers

__all__ = [
    "algorithms",
    "core",
    "envs",
    "networks",
    "ops",
    "parallel",
    "wrappers",
]
