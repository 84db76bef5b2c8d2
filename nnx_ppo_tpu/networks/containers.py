"""Composition containers: Sequential, Concat, Parallel, Splitter.

Capability parity with the reference containers
(``nnx_ppo/networks/containers.py:14-218``), as immutable pytree
modules. All containers obey the same 4-way routing contract: carry
state, ``rollout_extras``, ``metrics``, and ``regularization_loss`` are
split/merged per child identically. Carry states and extras are tuples
(Sequential) or dicts (named containers), so they slice per-minibatch
and shard over the env axis like any other pytree.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import field, pytree_dataclass, static_field
from nnx_ppo_tpu.networks.types import ModuleOutput, ModuleState, StatefulModule


def _named_components(
    name: str, modules: dict[str, StatefulModule] | None, kwargs: dict
) -> dict[str, StatefulModule]:
    if modules is not None and kwargs:
        raise ValueError(
            f"{name}: pass either a positional dict or keyword arguments, not both"
        )
    components = modules if modules is not None else kwargs
    if not components:
        raise ValueError(f"{name} requires at least one component")
    # Sort by name: JAX pytree flatten/unflatten re-sorts dict keys, so
    # an insertion-ordered dict would silently permute (e.g. Concat's
    # output layout) across any tree operation — jit, tree.map, grad.
    # Canonical sorted order makes eager and traced behavior identical.
    return dict(sorted(components.items()))


@pytree_dataclass
class Sequential(StatefulModule):
    """Ordered chain of modules. Carry/extras are per-layer tuples;
    metrics are keyed by integer layer index; reg-losses are summed.

    Reference: ``containers.py:14-52``.
    """

    layers: tuple[StatefulModule, ...]

    @classmethod
    def create(cls, layers) -> "Sequential":
        return cls(layers=tuple(layers))

    def _check_routing(self, state, rollout_extras) -> None:
        # Silent zip truncation on mismatched trees would make layers
        # consume the wrong extras (e.g. a sampler silently re-sampling
        # in replay when distilling between non-isomorphic networks).
        if len(state) != len(self.layers):
            raise ValueError(
                f"Sequential: carry has {len(state)} entries for "
                f"{len(self.layers)} layers — state tree is not isomorphic"
            )
        if rollout_extras is not None and len(rollout_extras) != len(self.layers):
            raise ValueError(
                f"Sequential: rollout_extras has {len(rollout_extras)} entries "
                f"for {len(self.layers)} layers — extras tree is not "
                "isomorphic (distillation requires teacher and student with "
                "isomorphic carry/extras trees)"
            )

    def __call__(self, state, obs, rollout_extras=None) -> ModuleOutput:
        self._check_routing(state, rollout_extras)
        new_state = []
        new_extras = []
        x = obs
        reg_loss = jnp.array(0.0)
        metrics: dict[int, Any] = {}
        for i, (layer, layer_state) in enumerate(zip(self.layers, state)):
            layer_extras = None if rollout_extras is None else rollout_extras[i]
            out = layer(layer_state, x, layer_extras)
            new_state.append(out.next_state)
            new_extras.append(out.rollout_extras)
            x = out.output
            reg_loss = reg_loss + out.regularization_loss
            metrics[i] = out.metrics
        return ModuleOutput(tuple(new_state), x, reg_loss, metrics, tuple(new_extras))

    def initialize_state(self, batch_size: int) -> ModuleState:
        return tuple(layer.initialize_state(batch_size) for layer in self.layers)

    def reset_state(self, prev_state) -> ModuleState:
        return tuple(
            layer.reset_state(s) for layer, s in zip(self.layers, prev_state)
        )

    def update_statistics(self, rollout_extras) -> "Sequential":
        new_layers = tuple(
            layer.update_statistics(extras)
            for layer, extras in zip(self.layers, rollout_extras)
        )
        return self.replace(layers=new_layers)

    def __getitem__(self, ind: int) -> StatefulModule:
        return self.layers[ind]

    def __len__(self) -> int:
        return len(self.layers)

    @property
    def replay_time_static(self) -> bool:
        return all(layer.replay_time_static for layer in self.layers)

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        self._check_routing(state, extras_seq)
        x = obs_seq
        reg_seq = 0.0
        finals = []
        for i, (layer, layer_state) in enumerate(zip(self.layers, state)):
            layer_extras = None if extras_seq is None else extras_seq[i]
            x, reg, final = layer.replay_sequence(
                layer_state, x, done_seq, layer_extras
            )
            reg_seq = reg_seq + reg
            finals.append(final)
        return x, reg_seq, tuple(finals)


class _NamedContainer(StatefulModule):
    """Shared routing for dict-keyed containers."""

    components: dict[str, StatefulModule]

    def _run_children(self, state, rollout_extras, input_for):
        new_state: dict[str, ModuleState] = {}
        new_extras: dict[str, Any] = {}
        outputs: dict[str, Any] = {}
        reg_loss = jnp.array(0.0)
        metrics: dict[str, Any] = {}
        for key, component in self.components.items():
            child_extras = None if rollout_extras is None else rollout_extras[key]
            out = component(state[key], input_for(key), child_extras)
            new_state[key] = out.next_state
            new_extras[key] = out.rollout_extras
            outputs[key] = out.output
            reg_loss = reg_loss + out.regularization_loss
            metrics[key] = out.metrics
        return new_state, new_extras, outputs, reg_loss, metrics

    def initialize_state(self, batch_size: int) -> ModuleState:
        return {k: c.initialize_state(batch_size) for k, c in self.components.items()}

    def reset_state(self, prev_state) -> ModuleState:
        return {
            k: c.reset_state(prev_state[k]) for k, c in self.components.items()
        }

    def update_statistics(self, rollout_extras):
        new_components = {
            k: c.update_statistics(rollout_extras[k])
            for k, c in self.components.items()
        }
        return self.replace(components=new_components)

    def __getitem__(self, key: str) -> StatefulModule:
        return self.components[key]

    @property
    def replay_time_static(self) -> bool:
        return all(c.replay_time_static for c in self.components.values())

    def _replay_children_sequence(self, state, done_seq, extras_seq, input_for):
        outputs: dict[str, Any] = {}
        finals: dict[str, ModuleState] = {}
        reg_seq = 0.0
        for key, component in self.components.items():
            child_extras = None if extras_seq is None else extras_seq[key]
            out, reg, final = component.replay_sequence(
                state[key], input_for(key), done_seq, child_extras
            )
            outputs[key] = out
            finals[key] = final
            reg_seq = reg_seq + reg
        return outputs, reg_seq, finals


@pytree_dataclass
class Concat(_NamedContainer):
    """Per-key dispatch + concat: dict input, single-tensor output.

    Each named child sees the upstream's same-named entry; child
    outputs are concatenated along the last axis **in sorted name
    order** (an intentional deviation from the reference's insertion
    order: plain-dict pytrees re-sort keys on flatten/unflatten, so
    sorted order is the only one stable under jit/tree operations).
    Reference: ``containers.py:55-112``.
    """

    components: dict[str, StatefulModule]

    @classmethod
    def create(cls, modules=None, /, **kwargs) -> "Concat":
        return cls(components=_named_components("Concat", modules, kwargs))

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        new_state, new_extras, outputs, reg_loss, metrics = self._run_children(
            state, rollout_extras, lambda key: x[key]
        )
        concated = jnp.concatenate(
            [outputs[k] for k in self.components], axis=-1
        )
        return ModuleOutput(new_state, concated, reg_loss, metrics, new_extras)

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        outputs, reg_seq, finals = self._replay_children_sequence(
            state, done_seq, extras_seq, lambda key: obs_seq[key]
        )
        concated = jnp.concatenate([outputs[k] for k in self.components], axis=-1)
        return concated, reg_seq, finals


@pytree_dataclass
class Parallel(_NamedContainer):
    """Same input to every named child → dict output (fan-out to heads).

    Reference: ``containers.py:115-176``.
    """

    components: dict[str, StatefulModule]

    @classmethod
    def create(cls, modules=None, /, **kwargs) -> "Parallel":
        return cls(components=_named_components("Parallel", modules, kwargs))

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        new_state, new_extras, outputs, reg_loss, metrics = self._run_children(
            state, rollout_extras, lambda key: x
        )
        return ModuleOutput(new_state, outputs, reg_loss, metrics, new_extras)

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        outputs, reg_seq, finals = self._replay_children_sequence(
            state, done_seq, extras_seq, lambda key: obs_seq
        )
        return outputs, reg_seq, finals


@pytree_dataclass
class Splitter(StatefulModule):
    """Split a flat tensor into named last-axis slices (dict output).

    Slices are taken in declaration order; excess input features are
    silently dropped (plain slicing semantics). Reference:
    ``containers.py:179-218``.
    """

    sizes: tuple[tuple[str, int], ...] = static_field()

    @classmethod
    def create(cls, **sizes: int) -> "Splitter":
        if not sizes:
            raise ValueError("Splitter requires at least one named slice")
        for k, v in sizes.items():
            if v <= 0:
                raise ValueError(f"slice size for {k!r} must be positive, got {v}")
        return cls(sizes=tuple(sizes.items()))

    def __call__(self, state, x, rollout_extras=None) -> ModuleOutput:
        outputs: dict[str, Any] = {}
        offset = 0
        for key, size in self.sizes:
            outputs[key] = x[..., offset : offset + size]
            offset += size
        return ModuleOutput((), outputs, jnp.array(0.0), {}, None)

    @property
    def replay_time_static(self) -> bool:
        return True
