"""Population-graph container (capability parity with reference
``nnx_ppo/networks/graph/graph.py:50-448``).

:class:`PopulationGraph` owns named :class:`Population` nodes and typed
:class:`Connection` edges. Each population sum-integrates its incoming
edges (plus ``obs[input_from]`` for input populations), applies its
activation once, and exposes outputs under ``output_to`` keys.
Connections carry integer delays; ``delay=0`` reads the source's
freshly computed output in the same step (topological order guarantees
availability), ``delay=k`` reads k steps back from a per-population
shared circular buffer.

Functional two-phase build (the one API deviation from the reference,
where ``finalize()`` mutates in place): construction happens on a
mutable :class:`PopulationGraphBuilder`, and ``finalize()`` **returns**
the frozen, jit-ready :class:`PopulationGraph` pytree. Validation
(delay-0 cycle detection via Kahn topo-sort, ``max_outgoing_delay``
computation) is identical to the reference (``graph.py:243-272``).

TPU note: ring-buffer reads/writes use one-hot masked selects over the
(tiny) delay axis instead of gather/scatter — pure VPU elementwise ops
that XLA fuses into the surrounding computation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass, static_field
from nnx_ppo_tpu.networks.feedforward import Dense
from nnx_ppo_tpu.networks.graph.connection import Connection
from nnx_ppo_tpu.networks.graph.population import Population
from nnx_ppo_tpu.networks.types import ModuleOutput, ModuleState, StatefulModule


class PopulationGraphBuilder:
    """Mutable builder: ``add_population`` / ``add_input`` /
    ``add_output`` / ``connect``, then ``finalize()`` → the frozen
    :class:`PopulationGraph` module."""

    def __init__(self, key: jax.Array):
        self._key = key
        self._n_keys = 0
        self._pops: dict[str, Population] = {}
        self._conns: list[Connection] = []
        self._transforms: list[StatefulModule] = []
        self._finalized = False

    def _next_key(self) -> jax.Array:
        self._n_keys += 1
        return jax.random.fold_in(self._key, self._n_keys)

    def add_population(
        self, name: str, size: int, *, activation: Optional[Callable] = None
    ) -> None:
        """Register an internal population."""
        self._add_population(
            name=name, size=size, activation=activation, input_from=None,
            output_to=None,
        )

    def add_input(
        self,
        name: str,
        size: int,
        *,
        input_from: str,
        activation: Optional[Callable] = None,
    ) -> None:
        """Register an input population reading ``obs[input_from]``
        (added to the integrated input alongside incoming edges)."""
        self._add_population(
            name=name, size=size, activation=activation, input_from=input_from,
            output_to=None,
        )

    def add_output(
        self,
        name: str,
        size: int,
        *,
        output_to: Optional[str] = None,
        activation: Optional[Callable] = None,
    ) -> None:
        """Register an output population exposed under ``output_to``
        (default: its own name) in the forward output dict."""
        self._add_population(
            name=name, size=size, activation=activation, input_from=None,
            output_to=output_to if output_to is not None else name,
        )

    def _add_population(self, *, name, size, activation, input_from, output_to):
        self._assert_not_finalized()
        if name in self._pops:
            raise ValueError(f"population {name!r} already exists")
        self._pops[name] = Population(
            name=name, size=size, activation=activation,
            input_from=input_from, output_to=output_to,
        )

    def connect(
        self,
        src: str,
        dst: str,
        *,
        transform: Optional[StatefulModule] = None,
        delay: int = 0,
        reciprocal: bool = False,
    ) -> None:
        """Directed edge ``src → dst``. ``transform`` defaults to a
        linear :class:`Dense` sized src→dst. ``reciprocal=True`` also
        adds ``dst → src`` with an independent default Dense."""
        if reciprocal and transform is not None:
            raise ValueError(
                "connect(reciprocal=True) requires the default transform; "
                "make two explicit connect() calls for custom transforms"
            )
        self._add_connection(src, dst, transform=transform, delay=delay)
        if reciprocal:
            self._add_connection(dst, src, transform=None, delay=delay)

    def _add_connection(self, src, dst, *, transform, delay):
        self._assert_not_finalized()
        if src not in self._pops:
            raise ValueError(f"unknown source population {src!r}")
        if dst not in self._pops:
            raise ValueError(f"unknown destination population {dst!r}")
        if transform is None:
            transform = Dense.create(
                self._pops[src].size, self._pops[dst].size, self._next_key()
            )
        self._conns.append(Connection(src=src, dst=dst, delay=delay))
        self._transforms.append(transform)

    def _assert_not_finalized(self):
        if self._finalized:
            raise RuntimeError("PopulationGraphBuilder already finalized")

    def finalize(self) -> "PopulationGraph":
        """Validate (delay-0 cycle detection, buffer sizing) and return
        the frozen graph module."""
        self._assert_not_finalized()
        self._finalized = True

        # max_outgoing_delay per source population.
        max_delay = {n: 0 for n in self._pops}
        for conn in self._conns:
            max_delay[conn.src] = max(max_delay[conn.src], conn.delay)
        pops = {
            n: Population(
                name=p.name, size=p.size, activation=p.activation,
                input_from=p.input_from, output_to=p.output_to,
                max_outgoing_delay=max_delay[n],
            )
            for n, p in self._pops.items()
        }

        # Kahn topo sort over delay-0 edges, insertion-order deterministic.
        delay0_succ = {n: [] for n in pops}
        in_degree = {n: 0 for n in pops}
        for conn in self._conns:
            if conn.delay == 0:
                delay0_succ[conn.src].append(conn.dst)
                in_degree[conn.dst] += 1
        ready = [n for n in pops if in_degree[n] == 0]
        topo: list[str] = []
        while ready:
            n = ready.pop(0)
            topo.append(n)
            for m in delay0_succ[n]:
                in_degree[m] -= 1
                if in_degree[m] == 0:
                    ready.append(m)
        if len(topo) != len(pops):
            unresolved = [n for n in pops if n not in topo]
            raise ValueError(
                f"delay-0 cycle detected involving populations: {unresolved}"
            )

        incoming = {n: () for n in pops}
        for i, conn in enumerate(self._conns):
            incoming[conn.dst] = incoming[conn.dst] + (i,)

        output_pops = tuple(
            (p.output_to, n) for n, p in pops.items() if p.output_to is not None
        )

        return PopulationGraph(
            transforms=tuple(self._transforms),
            populations=tuple(pops.values()),
            connections=tuple(self._conns),
            topo_order=tuple(topo),
            incoming=tuple(sorted(incoming.items())),
            output_pops=output_pops,
        )


@pytree_dataclass
class PopulationGraph(StatefulModule):
    """Finalized population graph. Use
    :meth:`PopulationGraph.builder` → build calls → ``finalize()``."""

    transforms: tuple  # connection transform modules (data)
    populations: tuple = static_field()  # Population specs
    connections: tuple = static_field()  # Connection specs
    topo_order: tuple = static_field()
    incoming: tuple = static_field()  # sorted ((pop_name, (conn_idx, ...)), ...)
    output_pops: tuple = static_field()  # ((output_key, pop_name), ...)

    @staticmethod
    def builder(key: jax.Array) -> PopulationGraphBuilder:
        return PopulationGraphBuilder(key)

    def _pop(self, name: str) -> Population:
        for p in self.populations:
            if p.name == name:
                return p
        raise KeyError(name)

    def _incoming_of(self, name: str) -> tuple:
        for n, inds in self.incoming:
            if n == name:
                return inds
        return ()

    def __call__(self, state: ModuleState, obs: Any, rollout_extras: Any = None):
        pop_state = state["populations"]
        conn_state = state["connections"]
        conn_extras = (
            (None,) * len(self.transforms)
            if rollout_extras is None
            else rollout_extras["connections"]
        )

        batch_size = jax.tree.leaves(obs)[0].shape[0]
        pops = {p.name: p for p in self.populations}

        new_pop_state: dict[str, dict] = {}
        new_conn_state: list[Any] = list(conn_state)
        new_conn_extras: list[Any] = [None] * len(self.transforms)
        current_outputs: dict[str, jax.Array] = {}
        reg_loss = jnp.array(0.0)
        metrics: dict[str, Any] = {}

        for pop_name in self.topo_order:
            pop = pops[pop_name]

            integrated = jnp.zeros((batch_size, pop.size))
            if pop.input_from is not None:
                integrated = integrated + obs[pop.input_from]

            for i in self._incoming_of(pop_name):
                conn = self.connections[i]
                src_pop = pops[conn.src]
                if conn.delay == 0:
                    src_out = current_outputs[conn.src]
                else:
                    L = src_pop.max_outgoing_delay
                    buf = pop_state[conn.src]["buffer"]  # [B, L, size]
                    idx = pop_state[conn.src]["buffer_idx"]  # [B]
                    read_idx = (idx - conn.delay) % L
                    onehot = jax.nn.one_hot(read_idx, L, dtype=buf.dtype)
                    src_out = jnp.einsum("bl,bls->bs", onehot, buf)

                conn_out = self.transforms[i](conn_state[i], src_out, conn_extras[i])
                new_conn_state[i] = conn_out.next_state
                new_conn_extras[i] = conn_out.rollout_extras
                integrated = integrated + conn_out.output
                # Keep per-sample shape ([B] or scalar) like every other
                # container — a batch-sum here would overweight edge
                # regularization by a factor of B after the loss mean.
                reg_loss = reg_loss + conn_out.regularization_loss

            activated = (
                pop.activation(integrated) if pop.activation is not None else integrated
            )
            current_outputs[pop_name] = activated

            updated: dict[str, Any] = {}
            if pop.max_outgoing_delay > 0:
                L = pop.max_outgoing_delay
                buf = pop_state[pop_name]["buffer"]
                idx = pop_state[pop_name]["buffer_idx"]
                mask = jax.nn.one_hot(idx, L, dtype=jnp.bool_)[:, :, None]
                updated["buffer"] = jnp.where(mask, activated[:, None, :], buf)
                updated["buffer_idx"] = (idx + 1) % L
            new_pop_state[pop_name] = updated

        outputs = {
            output_key: current_outputs[pop_name]
            for output_key, pop_name in self.output_pops
        }
        return ModuleOutput(
            next_state={
                "populations": new_pop_state,
                "connections": tuple(new_conn_state),
            },
            output=outputs,
            regularization_loss=reg_loss,
            metrics=metrics,
            rollout_extras={"connections": tuple(new_conn_extras)},
        )

    def update_statistics(self, rollout_extras: Any) -> "PopulationGraph":
        conn_extras = rollout_extras["connections"]
        new_transforms = tuple(
            t.update_statistics(e) for t, e in zip(self.transforms, conn_extras)
        )
        return self.replace(transforms=new_transforms)

    def initialize_state(self, batch_size: int) -> ModuleState:
        pop_state: dict[str, dict] = {}
        for pop in self.populations:
            entry: dict[str, Any] = {}
            if pop.max_outgoing_delay > 0:
                entry["buffer"] = jnp.zeros(
                    (batch_size, pop.max_outgoing_delay, pop.size)
                )
                entry["buffer_idx"] = jnp.zeros(batch_size, jnp.int32)
            pop_state[pop.name] = entry
        conn_state = tuple(
            t.initialize_state(batch_size) for t in self.transforms
        )
        return {"populations": pop_state, "connections": conn_state}

    def reset_state(self, prev_state: ModuleState) -> ModuleState:
        prev_pops = prev_state["populations"]
        prev_conns = prev_state["connections"]
        new_pops: dict[str, dict] = {}
        for pop in self.populations:
            entry: dict[str, Any] = {}
            if pop.max_outgoing_delay > 0:
                entry["buffer"] = jnp.zeros_like(prev_pops[pop.name]["buffer"])
                entry["buffer_idx"] = jnp.zeros_like(
                    prev_pops[pop.name]["buffer_idx"]
                )
            new_pops[pop.name] = entry
        new_conns = tuple(
            t.reset_state(prev_conns[i]) for i, t in enumerate(self.transforms)
        )
        return {"populations": new_pops, "connections": new_conns}
