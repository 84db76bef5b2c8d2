"""Checkpointing: exact-resume snapshots of the full TrainingState.

Capability parity with reference ``nnx_ppo/algorithms/checkpointing.py``
(same ``{dir}/step_{step:010d}/`` layout, same exact-resume guarantee
including env states and per-env carries), simplified by the functional
design: the whole ``TrainingState`` is one pytree, so there is no
nnx-module surgery — we flatten it, store ordinary array leaves with
orbax (async-safe, multi-host aware: each leaf keeps its
``NamedSharding`` on restore), and PRNG-key leaves as raw
``key_data`` (orbax cannot serialize the ``key<fry>`` extended dtype —
same constraint the reference works around, ``checkpointing.py:22-39``).

Layout::

    {directory}/step_{step:010d}/
        state/          orbax checkpoint of all non-key array leaves
        metadata.pkl    key leaves (as uint32 key_data + impl), step,
                        optional TrainConfig
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np

from nnx_ppo_tpu.algorithms.config import TrainConfig
from nnx_ppo_tpu.algorithms.types import TrainingState


@runtime_checkable
class CheckpointCallback(Protocol):
    """Checkpoint callback protocol (matches train_ppo's checkpoint_fn)."""

    def __call__(self, training_state: TrainingState, step: int) -> None: ...


def _is_key_leaf(x: Any) -> bool:
    return isinstance(x, jax.Array) and jnp.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _split_leaves(tree: Any):
    """Flatten into (orbax-storable arrays dict, pickled key-leaf dict)."""
    leaves = jax.tree.leaves(tree)
    arrays: dict[str, Any] = {}
    key_leaves: dict[int, dict[str, Any]] = {}
    for i, leaf in enumerate(leaves):
        if _is_key_leaf(leaf):
            key_leaves[i] = {
                "data": np.asarray(jax.random.key_data(leaf)),
                "impl": str(jax.random.key_impl(leaf)),
            }
        else:
            arrays[str(i)] = leaf
    return arrays, key_leaves, len(leaves)


def save_checkpoint(
    step_dir: str,
    training_state: TrainingState,
    step: int,
    config: Optional[TrainConfig] = None,
) -> None:
    """Write one checkpoint directory (state/ + metadata.pkl)."""
    import orbax.checkpoint as ocp

    os.makedirs(step_dir, exist_ok=True)
    arrays, key_leaves, n_leaves = _split_leaves(training_state)

    checkpointer = ocp.StandardCheckpointer()
    try:
        checkpointer.save(os.path.join(step_dir, "state"), arrays)
    finally:
        checkpointer.close()  # ensure async writes complete

    metadata = {
        "key_leaves": key_leaves,
        "n_leaves": n_leaves,
        "step": step,
        "config": config,
    }
    with open(os.path.join(step_dir, "metadata.pkl"), "wb") as f:
        pickle.dump(metadata, f)


def make_checkpoint_fn(
    directory: str,
    config: Optional[TrainConfig] = None,
) -> CheckpointCallback:
    """Checkpoint callback writing ``{directory}/step_{step:010d}/``
    (reference ``checkpointing.py:42-114``). Resume via
    :func:`load_checkpoint`."""
    abs_directory = os.path.abspath(directory)

    def checkpoint_fn(training_state: TrainingState, step: int) -> None:
        step_dir = os.path.join(abs_directory, f"step_{step:010d}")
        save_checkpoint(step_dir, training_state, step, config)

    return checkpoint_fn


def load_checkpoint(path: str, training_state: TrainingState) -> dict[str, Any]:
    """Load a checkpoint saved by :func:`make_checkpoint_fn`.

    ``training_state`` is a structural template (e.g. from
    :func:`new_training_state` with the same architecture/n_envs —
    values are irrelevant, shardings are reused on restore so
    multi-host loads place each shard on its own devices).

    Returns ``{"training_state": ..., "step": int, "config": ...}``.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "metadata.pkl"), "rb") as f:
        metadata = pickle.load(f)

    leaves, treedef = jax.tree.flatten(training_state)
    if len(leaves) != metadata["n_leaves"]:
        raise ValueError(
            f"template has {len(leaves)} leaves but checkpoint has "
            f"{metadata['n_leaves']} — architecture mismatch"
        )

    abstract = {}
    for i, leaf in enumerate(leaves):
        if _is_key_leaf(leaf):
            continue
        sharding = leaf.sharding if isinstance(leaf, jax.Array) else None
        abstract[str(i)] = jax.ShapeDtypeStruct(
            jnp.shape(leaf), jnp.result_type(leaf), sharding=sharding
        )

    checkpointer = ocp.StandardCheckpointer()
    try:
        restored = checkpointer.restore(os.path.join(path, "state"), abstract)
    finally:
        checkpointer.close()

    new_leaves = []
    for i, leaf in enumerate(leaves):
        if i in metadata["key_leaves"]:
            entry = metadata["key_leaves"][i]
            new_leaves.append(
                jax.random.wrap_key_data(
                    jnp.asarray(entry["data"]), impl=entry["impl"]
                )
            )
        else:
            new_leaves.append(restored[str(i)])
    restored_state = jax.tree.unflatten(treedef, new_leaves)

    return {
        "training_state": restored_state,
        "step": metadata["step"],
        "config": metadata["config"],
    }
