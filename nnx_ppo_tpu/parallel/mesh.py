"""Device mesh + sharding layout for data-parallel PPO.

The reference has **no** multi-device support (SURVEY §2.6: no
pmap/pjit/shard_map/Mesh anywhere). This module adds the TPU-native
parallelism layer the north-star targets require:

* one mesh axis, ``data``, spanning all chips (ICI within a host /
  slice, DCN across hosts);
* env states, per-env network carries, and all rollout buffers sharded
  on ``data`` along the env axis;
* params, optimizer state, and the loop RNG key replicated;
* gradient all-reduce, normalizer-statistic merges, and metric
  reductions are *implicit*: they are plain ``jnp`` reductions over the
  sharded env axis inside one ``jit`` program, which GSPMD lowers to
  per-shard partials + ``all-reduce`` over ICI.

Multi-host bring-up goes through :func:`distributed_initialize`
(a thin wrapper over ``jax.distributed.initialize``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D mesh over (the first ``n_devices``) available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def distributed_initialize(**kwargs: Any) -> None:
    """Multi-host process bring-up (controller-less). Call once per host
    before creating the mesh. No-op if already initialized."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (the env axis) over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def _batch_leaf_sharding(
    leaf: Any, mesh: Mesh, n_shards: int, axis_name: str
) -> NamedSharding:
    # Unbatched shared fields (scalars, or leading dim not divisible by
    # the mesh) are replicated — mirrors tree_where's escape hatch.
    if getattr(leaf, "ndim", 0) == 0 or leaf.shape[0] % n_shards != 0:
        return replicated(mesh)
    return batch_sharded(mesh, axis_name)


def training_state_shardings(
    training_state: Any, mesh: Mesh, axis_name: str = DATA_AXIS
) -> Any:
    """Per-leaf ``NamedSharding`` pytree for a ``TrainingState``:
    env-batched leaves on ``data``, everything else replicated."""
    n_shards = mesh.shape[axis_name]

    def batched(tree: Any) -> Any:
        return jax.tree.map(
            lambda leaf: _batch_leaf_sharding(leaf, mesh, n_shards, axis_name), tree
        )

    def repl(tree: Any) -> Any:
        return jax.tree.map(lambda _: replicated(mesh), tree)

    return training_state.replace(
        networks=repl(training_state.networks),
        opt_state=repl(training_state.opt_state),
        network_states=batched(training_state.network_states),
        env_states=batched(training_state.env_states),
        rng_key=replicated(mesh),
        steps_taken=replicated(mesh),
    )


def global_device_put(x: Any, sharding: NamedSharding) -> jax.Array:
    """``device_put`` that also works when the mesh spans processes.

    In a multi-process (multi-host) run the sharding covers devices this
    process cannot address, so ``jax.device_put`` refuses it. Every
    process holds the same full host value (states/params are built
    deterministically from the shared seed), so each one materializes
    just its addressable shards via ``make_array_from_callback``.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    ):
        # Typed PRNG keys have no NumPy form: place the raw key data
        # (sharding specs only name leading dims, so the extra trailing
        # key-data dim is unaffected) and re-wrap.
        placed = global_device_put(jax.random.key_data(x), sharding)
        return jax.random.wrap_key_data(placed, impl=jax.random.key_impl(x))
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def place_replicated(tree: Any, mesh: Mesh) -> Any:
    """Device-put every leaf replicated on the mesh."""
    return jax.tree.map(lambda x: global_device_put(x, replicated(mesh)), tree)


def place_batched(tree: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put each leaf with dim 0 sharded on ``data`` (unbatched /
    indivisible leaves are replicated — same rule as
    :func:`training_state_shardings`)."""
    n_shards = mesh.shape[axis_name]
    return jax.tree.map(
        lambda x: global_device_put(
            x, _batch_leaf_sharding(x, mesh, n_shards, axis_name)
        ),
        tree,
    )


def shard_training_state(
    training_state: Any, mesh: Mesh, axis_name: str = DATA_AXIS
) -> Any:
    """Place a (host or single-device) TrainingState onto the mesh."""
    shardings = training_state_shardings(training_state, mesh, axis_name)
    return jax.tree.map(
        lambda x, s: global_device_put(x, s), training_state, shardings
    )


def constrain_batch(x: Any, mesh: Optional[Mesh], axis_name: str = DATA_AXIS) -> Any:
    """Sharding constraint pinning dim 0 of every (batched) leaf to
    ``data``. No-op without a mesh."""
    if mesh is None:
        return x
    n_shards = mesh.shape[axis_name]

    def constrain(leaf: Any) -> Any:
        if getattr(leaf, "ndim", 0) == 0 or leaf.shape[0] % n_shards != 0:
            return leaf
        return jax.lax.with_sharding_constraint(leaf, batch_sharded(mesh, axis_name))

    return jax.tree.map(constrain, x)


def constrain_time_batch(
    x: Any, mesh: Optional[Mesh], axis_name: str = DATA_AXIS
) -> Any:
    """Sharding constraint for ``[T, B, ...]`` rollout buffers: dim 1
    (env axis) on ``data``. No-op without a mesh."""
    if mesh is None:
        return x
    n_shards = mesh.shape[axis_name]
    spec = NamedSharding(mesh, P(None, axis_name))

    def constrain(leaf: Any) -> Any:
        if getattr(leaf, "ndim", 0) < 2 or leaf.shape[1] % n_shards != 0:
            return leaf
        return jax.lax.with_sharding_constraint(leaf, spec)

    return jax.tree.map(constrain, x)
