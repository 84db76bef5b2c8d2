"""Utility modules: Flattener, Filter, Scale, Merge, Map.

Capability parity with the reference utilities
(``nnx_ppo/networks/utils.py:65-326``). Stateless layers are empty
pytrees; container utilities route children's carry/extras/metrics/
reg-loss identically to the main containers.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass, static_field
from nnx_ppo_tpu.networks.containers import _NamedContainer, _named_components
from nnx_ppo_tpu.networks.types import ModuleOutput, StatefulModule

FilterSpec = Union[str, tuple, Callable[[Any], Any]]


@pytree_dataclass
class Flattener(StatefulModule):
    """Flatten a pytree into one tensor (``preserve_levels=0``) or keep
    the top N levels of dict/list/tuple structure and flatten below.

    Reference: ``utils.py:65-116``.
    """

    preserve_levels: int = static_field(default=0)

    @classmethod
    def create(cls, preserve_levels: int = 0) -> "Flattener":
        if preserve_levels < 0:
            raise ValueError(f"preserve_levels must be >= 0, got {preserve_levels}")
        return cls(preserve_levels=preserve_levels)

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        return ModuleOutput(
            (), _flatten_at_depth(x, self.preserve_levels), jnp.array(0.0), {}, None
        )

    @property
    def replay_time_static(self) -> bool:
        return True


def _flatten_at_depth(x: Any, preserve_levels: int) -> Any:
    if preserve_levels == 0:
        leaves = jax.tree.leaves(x)
        return jnp.concatenate(
            [a.reshape((a.shape[0], -1)) for a in leaves], axis=-1
        )
    if isinstance(x, dict):
        return {k: _flatten_at_depth(v, preserve_levels - 1) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(_flatten_at_depth(v, preserve_levels - 1) for v in x)
    raise TypeError(
        "Flattener(preserve_levels > 0) requires dict/list/tuple at each "
        f"preserved level; encountered a leaf of type {type(x).__name__} "
        f"with {preserve_levels} levels still to preserve."
    )


@pytree_dataclass
class Filter(StatefulModule):
    """Declarative pytree extraction/projection.

    Spec entries are ``{output_key: extraction}`` where extraction is a
    string (top-level key), a tuple of strings/ints (nested path), or a
    callable applied to the full input. Reference: ``utils.py:119-165``.
    """

    spec: tuple[tuple[str, FilterSpec], ...] = static_field()

    @classmethod
    def create(cls, spec: dict[str, FilterSpec]) -> "Filter":
        if not isinstance(spec, dict):
            raise TypeError(f"Filter spec must be a dict; got {type(spec).__name__}")
        for out_key, sub in spec.items():
            if not isinstance(sub, (str, tuple)) and not callable(sub):
                raise TypeError(
                    f"Filter spec for {out_key!r} must be str, tuple, or "
                    f"callable; got {type(sub).__name__}"
                )
        return cls(spec=tuple(spec.items()))

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        output: dict[str, Any] = {}
        for out_key, sub in self.spec:
            if isinstance(sub, str):
                output[out_key] = x[sub]
            elif isinstance(sub, tuple):
                v = x
                for p in sub:
                    v = v[p]
                output[out_key] = v
            else:  # callable
                output[out_key] = sub(x)
        return ModuleOutput((), output, jnp.array(0.0), {}, None)

    @property
    def replay_time_static(self) -> bool:
        return True


@pytree_dataclass
class Scale(StatefulModule):
    """Multiply the input pytree by a fixed scalar. Reference:
    ``utils.py:168-182``."""

    factor: float = static_field()

    @classmethod
    def create(cls, factor: float) -> "Scale":
        return cls(factor=float(factor))

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        return ModuleOutput(
            state, jax.tree.map(lambda v: v * self.factor, x), jnp.array(0.0), {}, None
        )

    @property
    def replay_time_static(self) -> bool:
        return True


@pytree_dataclass
class Merge(_NamedContainer):
    """Run named children on the same input, each returning a dict;
    merge into one flat dict. Duplicate output keys are a hard error
    (at trace/build time). Reference: ``utils.py:185-256``.
    """

    components: dict[str, StatefulModule]

    @classmethod
    def create(cls, modules=None, /, **kwargs) -> "Merge":
        return cls(components=_named_components("Merge", modules, kwargs))

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        new_state, new_extras, outputs, reg_loss, metrics = self._run_children(
            state, rollout_extras, lambda key: x
        )
        merged: dict[str, Any] = {}
        for name in self.components:
            out = outputs[name]
            if not isinstance(out, dict):
                raise TypeError(
                    f"Merge component {name!r} must return a dict; got "
                    f"{type(out).__name__}"
                )
            for k, v in out.items():
                if k in merged:
                    raise ValueError(
                        f"Merge: duplicate key {k!r} produced by multiple components"
                    )
                merged[k] = v
        return ModuleOutput(new_state, merged, reg_loss, metrics, new_extras)

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        outputs, reg_seq, finals = self._replay_children_sequence(
            state, done_seq, extras_seq, lambda key: obs_seq
        )
        merged: dict[str, Any] = {}
        for name in self.components:
            for k, v in outputs[name].items():
                if k in merged:
                    raise ValueError(
                        f"Merge: duplicate key {k!r} produced by multiple components"
                    )
                merged[k] = v
        return merged, reg_seq, finals


@pytree_dataclass
class Map(_NamedContainer):
    """Per-key dispatch: dict input → dict output; each named child sees
    the upstream's same-named entry. Extra input keys are dropped.
    Reference: ``utils.py:259-326``.
    """

    components: dict[str, StatefulModule]

    @classmethod
    def create(cls, modules=None, /, **kwargs) -> "Map":
        return cls(components=_named_components("Map", modules, kwargs))

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        new_state, new_extras, outputs, reg_loss, metrics = self._run_children(
            state, rollout_extras, lambda key: x[key]
        )
        return ModuleOutput(new_state, outputs, reg_loss, metrics, new_extras)

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        outputs, reg_seq, finals = self._replay_children_sequence(
            state, done_seq, extras_seq, lambda key: obs_seq[key]
        )
        return outputs, reg_seq, finals
