"""Pytree dataclasses and the functional module core.

This replaces two pieces of the reference design with TPU-first equivalents:

* ``nnx_ppo/jax_dataclass.py`` (reference): frozen-dataclass pytree
  registration. Here we use :func:`jax.tree_util.register_dataclass`,
  which takes the fast C++ flatten/unflatten path.
* flax.nnx's mutable-module object system (reference
  ``nnx_ppo/networks/types.py:39-113``): replaced by *modules that are
  pytrees*. Parameters are ordinary array leaves of the module; the
  whole network can be partitioned into (trainable params, everything
  else) with :func:`partition` / recombined with :func:`combine`, which
  keeps `jax.grad`, `optax`, `jax.jit` donation, and
  `jax.sharding.NamedSharding` annotations direct and visible — no
  graph tracing layer between the user and XLA.

Field roles
-----------
Every field of a :func:`pytree_dataclass` has a *role*:

* ``"param"`` (default for data fields) — trainable; included in the
  params partition. Child modules live in param fields; their own
  non-param fields are still excluded recursively.
* ``"stats"`` — persistent but not trained (e.g. Normalizer running
  statistics). Checkpointed, excluded from gradients.
* ``"rng"`` — PRNG base keys. Excluded from gradients.
* ``"static"`` — not a pytree leaf at all; part of the treedef
  (hashable metadata: sizes, activation fns, flags).
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Any, Callable, TypeVar

import jax

T = TypeVar("T")

_ROLE_KEY = "nnx_ppo_tpu_role"
_REGISTERED: set[type] = set()

PARAM = "param"
STATS = "stats"
RNG = "rng"
STATIC = "static"


def field(*, role: str = PARAM, **kwargs: Any) -> Any:
    """A dataclass field with an nnx_ppo_tpu role annotation."""
    if role not in (PARAM, STATS, RNG, STATIC):
        raise ValueError(f"Unknown field role: {role!r}")
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_ROLE_KEY] = role
    return dataclasses.field(metadata=metadata, **kwargs)


def static_field(**kwargs: Any) -> Any:
    """A field stored in the treedef (hashable metadata, not traced)."""
    return field(role=STATIC, **kwargs)


def field_role(f: dataclasses.Field) -> str:
    return f.metadata.get(_ROLE_KEY, PARAM)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Register ``cls`` as a frozen dataclass pytree node.

    Data fields become pytree children; ``static_field`` s become
    hashable treedef metadata (so they can drive Python control flow
    under ``jit`` and participate in the jit cache key).
    """
    cls = dataclasses.dataclass(frozen=True, repr=False)(cls)
    # Exempt the generated __init__ from runtime type-check hooks
    # (jaxtyping/typeguard, installed suite-wide by tests/conftest.py):
    # pytree reconstruction and mask building (param_mask, tree_where
    # internals) legitimately rebuild nodes with placeholder leaves
    # (booleans, Nones, tracers) via dataclasses.replace. Same rationale
    # as the reference's JaxDataclass bypassing __init__ in
    # tree_unflatten (nnx_ppo/jax_dataclass.py:3-11). Method bodies and
    # module functions remain fully checked.
    cls.__init__ = typing.no_type_check(cls.__init__)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if field_role(f) == STATIC:
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    _REGISTERED.add(cls)

    def replace(self: T, **changes: Any) -> T:
        return dataclasses.replace(self, **changes)

    def __repr__(self: Any) -> str:  # Compact repr: arrays as shape/dtype.
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if hasattr(v, "shape") and hasattr(v, "dtype"):
                v = f"Array{tuple(v.shape)}:{v.dtype}"
            parts.append(f"{f.name}={v}")
        return f"{type(self).__name__}({', '.join(parts)})"

    cls.replace = replace  # type: ignore[attr-defined]
    cls.__repr__ = __repr__
    return cls


def is_pytree_dataclass(obj: Any) -> bool:
    return type(obj) in _REGISTERED


def _data_fields(obj: Any):
    for f in dataclasses.fields(obj):
        role = field_role(f)
        if role != STATIC:
            yield f.name, role


def param_mask(tree: Any, ctx: bool = True) -> Any:
    """Boolean pytree (same treedef as ``tree``): True at trainable leaves.

    A leaf is trainable iff every enclosing dataclass field on its path
    has role ``"param"``.
    """

    def visit(node: Any) -> Any:
        if is_pytree_dataclass(node):
            changes = {
                name: param_mask(getattr(node, name), ctx and role == PARAM)
                for name, role in _data_fields(node)
            }
            return dataclasses.replace(node, **changes)
        return jax.tree.map(lambda _: ctx, node)

    if is_pytree_dataclass(tree):
        return visit(tree)
    return jax.tree.map(visit, tree, is_leaf=is_pytree_dataclass)


def partition(tree: Any, mask: Any) -> tuple[Any, Any]:
    """Split ``tree`` leaf-wise by a boolean mask pytree.

    Returns ``(selected, rest)``, both with the original treedef and
    ``None`` at excluded leaf positions (``None`` is an empty pytree
    node, so `jax.grad`/`optax` simply skip those positions).
    """
    left = jax.tree.map(lambda x, m: x if m else None, tree, mask)
    right = jax.tree.map(lambda x, m: None if m else x, tree, mask)
    return left, right


def partition_params(tree: Any) -> tuple[Any, Any]:
    """Split a module tree into (trainable params, everything else)."""
    return partition(tree, param_mask(tree))


def combine(*trees: Any) -> Any:
    """Inverse of :func:`partition`: overlay trees, first non-None wins."""

    def pick(*leaves: Any) -> Any:
        for leaf in leaves:
            if leaf is not None:
                return leaf
        return None

    return jax.tree.map(pick, *trees, is_leaf=lambda x: x is None)


def tree_set_attr(tree: Any, name: str, value: Any) -> Any:
    """Functionally set ``name`` on every pytree-dataclass node that has a
    *static* field of that name (e.g. flip ``deterministic`` for eval).
    """

    def visit(node: Any) -> Any:
        if is_pytree_dataclass(node):
            changes: dict[str, Any] = {}
            for f in dataclasses.fields(node):
                sub = getattr(node, f.name)
                if field_role(f) == STATIC:
                    if f.name == name:
                        changes[f.name] = value
                else:
                    new_sub = tree_set_attr(sub, name, value)
                    if new_sub is not sub:
                        changes[f.name] = new_sub
            if changes:
                return dataclasses.replace(node, **changes)
            return node
        return node  # ordinary leaf: unchanged

    # Map visit over the tree with dataclass nodes treated as leaves, so
    # nested modules inside generic containers are visited too.
    if is_pytree_dataclass(tree):
        return visit(tree)
    return jax.tree.map(visit, tree, is_leaf=is_pytree_dataclass)


def tree_where(cond: jax.Array, on_true: Any, on_false: Any) -> Any:
    """Batched pytree select: ``where(cond[B], on_true, on_false)`` with
    ``cond`` broadcast over each leaf's trailing dims.

    Leaves whose leading dim differs from ``cond`` (unbatched shared
    fields) are passed through from ``on_true`` unchanged — mirrors the
    reference's escape hatch (``nnx_ppo/algorithms/rollout.py:270-279``).
    """
    import jax.numpy as jnp

    def broadcast_where(x: Any, y: Any) -> Any:
        if x.ndim == 0 or x.shape[0] != cond.shape[0]:
            return x
        c = cond.reshape(cond.shape + (1,) * (x.ndim - cond.ndim))
        return jnp.where(c, x, y)

    return jax.tree.map(broadcast_where, on_true, on_false)
