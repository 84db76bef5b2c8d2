"""Test configuration: force CPU with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY §4: multi-host testing via
``xla_force_host_platform_device_count``)."""

import os

# Force CPU: the suite is designed for the virtual 8-device CPU backend
# (sharding tests need 8 devices; a tunneled single-TPU JAX_PLATFORMS
# like "axon" would silently change the device topology). Override with
# NNX_PPO_TPU_TEST_PLATFORM for hardware runs of tpu-marked tests.
os.environ["JAX_PLATFORMS"] = os.environ.get(
    "NNX_PPO_TPU_TEST_PLATFORM", "cpu"
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough in environments whose site hooks force
# jax_platforms programmatically at import (e.g. a tunneled-TPU plugin
# setting "axon,cpu") — re-force the config AFTER importing jax, before
# any backend initializes, so the suite really runs on the virtual
# 8-device CPU topology.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite's wall-time is dominated by
# XLA compiles of full ppo_step programs; caching them across runs (and
# across tests in different processes) cuts repeat runs several-fold.
_cache_dir = os.environ.get(
    "NNX_PPO_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_compile_cache"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Runtime shape-check mode (reference nnx_ppo/conftest.py:10 keeps the
# whole package under a jaxtyping/beartype import hook during tests; we
# use typeguard, the checker available in this image). Every jaxtyping
# annotation in the package (gae, rollout, per-env key helpers, ...) is
# verified at call time for the whole suite. Disable with
# NNX_PPO_TPU_TYPECHECK=0 (e.g. when profiling test wall-time).
if os.environ.get("NNX_PPO_TPU_TYPECHECK", "1") != "0":
    try:
        import typeguard  # noqa: F401  (declared in the dev extra)
    except ImportError:
        typeguard = None
    if typeguard is not None:
        from jaxtyping import install_import_hook

        # Deliberately not used as a context manager: the hook must
        # stay active for the whole test session.
        install_import_hook("nnx_ppo_tpu", "typeguard.typechecked")
