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
        state/          orbax checkpoint of all non-key array leaves,
                        stored under structure-derived names
                        (``optimizer.0.mu. ... .kernel``)
        metadata.pkl    format_version, ordered leaf-name list, key
                        leaves (as uint32 key_data + impl), step,
                        optional TrainConfig

Format v2 stores every leaf under its pytree key-path name, so a
restore into a same-leaf-count but differently-structured template
fails with an explicit path mismatch instead of silently misassigning
leaves; v1 (integer-indexed) checkpoints remain loadable.
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


CHECKPOINT_FORMAT_VERSION = 2


def _is_key_leaf(x: Any) -> bool:
    return isinstance(x, jax.Array) and jnp.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _path_name(path: tuple) -> str:
    """Human-readable, structure-derived leaf name, e.g.
    ``optimizer.0.mu.networks.layers.1.kernel`` ('.'-joined so names
    stay valid storage keys for orbax's file-per-parameter layouts)."""
    from jax.tree_util import (
        DictKey,
        FlattenedIndexKey,
        GetAttrKey,
        SequenceKey,
    )

    parts = []
    for entry in path:
        if isinstance(entry, DictKey):
            parts.append(str(entry.key))
        elif isinstance(entry, SequenceKey):
            parts.append(str(entry.idx))
        elif isinstance(entry, GetAttrKey):
            parts.append(entry.name)
        elif isinstance(entry, FlattenedIndexKey):
            parts.append(str(entry.key))
        else:
            parts.append(str(entry))
    return ".".join(p.replace("/", "⁄") for p in parts) if parts else "<root>"


def _named_leaves(tree: Any) -> list[tuple[str, Any]]:
    """Flatten with key paths into unique ``(name, leaf)`` pairs.

    Named storage is what makes a restore into a structurally different
    template fail loudly (path mismatch) instead of silently
    misassigning same-count/same-shape leaves — see ``load_checkpoint``.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    named = [(_path_name(path), leaf) for path, leaf in flat]
    seen: set[str] = set()
    for name, _ in named:
        if name in seen:
            # A collision means two distinct key paths render to the
            # same name (e.g. a dict key containing '/'). Suffixing
            # would match the colliding slots purely by flatten order at
            # load time — exactly the silent cross-assignment the named
            # format exists to prevent — so refuse instead.
            raise ValueError(
                f"Checkpoint leaf name collision: {name!r} is produced "
                "by more than one key path. Rename the offending dict "
                "key (avoid '/' in keys) so every leaf has a unique path."
            )
        seen.add(name)
    return named


def _split_leaves(tree: Any):
    """Split named leaves into (orbax-storable arrays, pickled key leaves)."""
    arrays: dict[str, Any] = {}
    key_leaves: dict[str, dict[str, Any]] = {}
    names = []
    for name, leaf in _named_leaves(tree):
        names.append(name)
        if _is_key_leaf(leaf):
            key_leaves[name] = {
                "data": np.asarray(jax.random.key_data(leaf)),
                "impl": str(jax.random.key_impl(leaf)),
            }
        else:
            arrays[name] = leaf
    return arrays, key_leaves, names


def save_checkpoint(
    step_dir: str,
    training_state: Any,
    step: int,
    config: Optional[TrainConfig] = None,
) -> None:
    """Write one checkpoint directory (state/ + metadata.pkl).

    ``training_state`` is typically a TrainingState but may be any
    pytree (the format is generic named-leaf storage)."""
    import orbax.checkpoint as ocp

    os.makedirs(step_dir, exist_ok=True)
    arrays, key_leaves, names = _split_leaves(training_state)

    checkpointer = ocp.StandardCheckpointer()
    try:
        checkpointer.save(os.path.join(step_dir, "state"), arrays)
    finally:
        checkpointer.close()  # ensure async writes complete

    metadata = {
        "format_version": CHECKPOINT_FORMAT_VERSION,
        "key_leaves": key_leaves,
        "leaf_names": names,
        "n_leaves": len(names),
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


def load_checkpoint(path: str, training_state: Any) -> dict[str, Any]:
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

    version = metadata.get("format_version", 1)
    treedef = jax.tree.structure(training_state)
    named = _named_leaves(training_state)

    if version >= 2:
        template_names = [name for name, _ in named]
        ckpt_names = metadata["leaf_names"]
        if set(template_names) != set(ckpt_names):
            missing = sorted(set(ckpt_names) - set(template_names))
            extra = sorted(set(template_names) - set(ckpt_names))
            raise ValueError(
                "checkpoint/template structure mismatch:\n"
                f"  in checkpoint but not template: {missing[:10]}\n"
                f"  in template but not checkpoint: {extra[:10]}\n"
                "(named-leaf layout, format v2 — restoring into a "
                "different architecture is not supported)"
            )
        # Same name set in a different order (e.g. a dataclass field
        # reorder between save and load) restores fine: leaves are
        # stored BY NAME, so the template's own order drives the reads.
        storage_names = template_names
    else:
        # Legacy v1 layout: integer-indexed leaves in flatten order.
        if len(named) != metadata["n_leaves"]:
            raise ValueError(
                f"template has {len(named)} leaves but checkpoint has "
                f"{metadata['n_leaves']} — architecture mismatch"
            )
        storage_names = [str(i) for i in range(len(named))]
        metadata["key_leaves"] = {
            str(i): v for i, v in metadata["key_leaves"].items()
        }

    abstract = {}
    for storage_name, (_, leaf) in zip(storage_names, named):
        if _is_key_leaf(leaf):
            continue
        sharding = leaf.sharding if isinstance(leaf, jax.Array) else None
        abstract[storage_name] = jax.ShapeDtypeStruct(
            jnp.shape(leaf), jnp.result_type(leaf), sharding=sharding
        )

    checkpointer = ocp.StandardCheckpointer()
    try:
        restored = checkpointer.restore(os.path.join(path, "state"), abstract)
    finally:
        checkpointer.close()

    new_leaves = []
    for storage_name, (_, leaf) in zip(storage_names, named):
        if storage_name in metadata["key_leaves"]:
            entry = metadata["key_leaves"][storage_name]
            new_leaves.append(
                jax.random.wrap_key_data(
                    jnp.asarray(entry["data"]), impl=entry["impl"]
                )
            )
        else:
            new_leaves.append(restored[storage_name])
    restored_state = jax.tree.unflatten(treedef, new_leaves)

    return {
        "training_state": restored_state,
        "step": metadata["step"],
        "config": metadata["config"],
    }
