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

from nnx_ppo_tpu.core.struct import pytree_dataclass, static_field, tree_where
from nnx_ppo_tpu.networks.feedforward import Dense
from nnx_ppo_tpu.networks.graph.connection import Connection
from nnx_ppo_tpu.networks.graph.population import Population
from nnx_ppo_tpu.networks.types import ModuleOutput, ModuleState, StatefulModule



def _ring_write(buf: jax.Array, idx: jax.Array, value: jax.Array, L: int):
    """One-hot masked ring-buffer write (shared by the step-wise
    forward, the recurrent-core replay scan, and the final-carry scan —
    fused-replay exactness requires all sites to match bit-for-bit).

    Returns ``(buf', idx')`` with ``value`` written at slot ``idx`` and
    the index advanced mod ``L``."""
    mask = jax.nn.one_hot(idx, L, dtype=jnp.bool_)[:, :, None]
    return jnp.where(mask, value[:, None, :], buf), (idx + 1) % L


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
                buf, idx = _ring_write(
                    pop_state[pop_name]["buffer"],
                    pop_state[pop_name]["buffer_idx"],
                    activated,
                    pop.max_outgoing_delay,
                )
                updated["buffer"] = buf
                updated["buffer_idx"] = idx
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

    def _condensation(self) -> tuple[tuple[str, ...], ...]:
        """SCC condensation of the *full* edge set (delay-0 AND delayed),
        in topological order, each SCC's members in global topo order.

        Populations in a singleton SCC with no self-edge have no time
        recurrence of their own — their whole activation sequence is a
        closed-form function of already-computed sequences. SCCs with
        cycles (necessarily through delayed edges; delay-0 cycles are
        rejected at finalize) are genuine time recurrences and must be
        scanned. Pure static-structure computation (trace-time only).
        """
        names = [p.name for p in self.populations]
        succ = {n: [] for n in names}
        for conn in self.connections:
            succ[conn.src].append(conn.dst)

        # Iterative Tarjan SCC.
        index: dict[str, int] = {}
        low: dict[str, int] = {}
        on_stack: set[str] = set()
        stack: list[str] = []
        sccs: list[tuple[str, ...]] = []
        counter = [0]

        def strongconnect(root: str) -> None:
            work = [(root, 0)]
            while work:
                v, pi = work[-1]
                if pi == 0:
                    index[v] = low[v] = counter[0]
                    counter[0] += 1
                    stack.append(v)
                    on_stack.add(v)
                recurse = False
                for j in range(pi, len(succ[v])):
                    w = succ[v][j]
                    if w not in index:
                        work[-1] = (v, j + 1)
                        work.append((w, 0))
                        recurse = True
                        break
                    if w in on_stack:
                        low[v] = min(low[v], index[w])
                if recurse:
                    continue
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    sccs.append(tuple(comp))
                work.pop()
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])

        for n in names:
            if n not in index:
                strongconnect(n)
        # Tarjan emits SCCs in reverse topological order.
        sccs.reverse()
        topo_pos = {n: i for i, n in enumerate(self.topo_order)}
        return tuple(
            tuple(sorted(comp, key=topo_pos.__getitem__)) for comp in sccs
        )

    def replay_sequence(self, state, obs_seq, done_seq, extras_seq):
        """Time-fused loss replay of the whole graph.

        Populations are partitioned by SCC condensation over the full
        edge set (:meth:`_condensation`):

        * **Acyclic populations** process the whole ``[T, B]`` sequence
          at once; every incoming edge transform replays via its own
          ``replay_sequence`` (fully batched over ``T·B`` for Dense &
          friends — T× larger MXU matmuls, no per-step dispatches). A
          delay-``k`` edge's input is closed-form: the source sequence
          shifted by ``k``, gated by "no episode reset in steps
          ``[t-k, t-1]``" (a done-prefix-sum mask; a reset wipes the
          write of the reset step too), with the first ``k`` steps read
          from the *initial carry's* ring buffer at the rotated slot.
        * **Recurrent cores** (SCCs with delayed cycles — delay-0
          cycles are rejected at finalize) run a minimal ``lax.scan``
          over T covering ONLY the core's populations and
          *intra-core* edges, with every edge arriving from outside the
          core precomputed in batch and fed as scan inputs — the
          hoisted-input-projection pattern (cf. the LSTM fused replay).
        * The final ring-buffer carry is recomputed by one cheap
          transform-free masked-write scan.

        Exactness vs the step-wise path (outputs, reg, final carry,
        gradients) is covered by ``tests/test_graph.py``
        (reference capability: step-wise only,
        ``nnx_ppo/networks/graph/graph.py:339-381``).
        """
        T, B = done_seq.shape
        pop_state = state["populations"]
        conn_state = state["connections"]
        conn_extras = (
            (None,) * len(self.transforms)
            if extras_seq is None
            else extras_seq["connections"]
        )
        pops = {p.name: p for p in self.populations}

        done_f = done_seq.astype(jnp.float32)
        # prefix[t] = number of dones in steps [0, t-1];  [T+1, B]
        prefix = jnp.concatenate(
            [jnp.zeros((1, B)), jnp.cumsum(done_f, axis=0)], axis=0
        )
        t_idx = jnp.arange(T)

        acts: dict[str, jax.Array] = {}
        new_conn_state: list[Any] = list(conn_state)
        reg_total = jnp.zeros((T, B))

        def delayed_src_seq(src_name: str, k: int) -> jax.Array:
            """Closed-form delayed read of an already-computed source."""
            src_pop = pops[src_name]
            L = src_pop.max_outgoing_delay
            act_src = acts[src_name]
            size = src_pop.size
            if k < T:
                shifted = jnp.concatenate(
                    [jnp.zeros((k, B, size)), act_src[: T - k]], axis=0
                )
            else:
                shifted = jnp.zeros((T, B, size))
            # Reads predating the replay window come from the initial
            # carry's ring buffer, k-t slots before the write position.
            buf0 = pop_state[src_name]["buffer"]  # [B, L, size]
            idx0 = pop_state[src_name]["buffer_idx"]  # [B]
            read_pos = (idx0[None, :] + (t_idx[:, None] - k)) % L
            onehot = jax.nn.one_hot(read_pos, L, dtype=buf0.dtype)
            init_read = jnp.einsum("tbl,bls->tbs", onehot, buf0)
            # No reset allowed in steps [max(t-k, 0), t-1].
            win_start = jnp.maximum(t_idx - k, 0)
            no_reset = (prefix[t_idx] - prefix[win_start]) == 0
            base = jnp.where((t_idx >= k)[:, None, None], shifted, init_read)
            return jnp.where(no_reset[:, :, None], base, 0.0)

        def external_edge_seq(i: int) -> jax.Array:
            """Batched replay of edge i whose source is already computed;
            accumulates reg and final carry."""
            nonlocal reg_total
            conn = self.connections[i]
            src_seq = (
                acts[conn.src]
                if conn.delay == 0
                else delayed_src_seq(conn.src, conn.delay)
            )
            out_seq, reg_seq, final_conn = self.transforms[i].replay_sequence(
                conn_state[i], src_seq, done_seq, conn_extras[i]
            )
            new_conn_state[i] = final_conn
            reg_total = reg_total + reg_seq
            return out_seq

        for group in self._condensation():
            has_cycle = len(group) > 1 or any(
                c.src == c.dst == group[0] for c in self.connections
            )
            if not has_cycle:
                pop_name = group[0]
                pop = pops[pop_name]
                integrated = jnp.zeros((T, B, pop.size))
                if pop.input_from is not None:
                    integrated = integrated + obs_seq[pop.input_from]
                for i in self._incoming_of(pop_name):
                    integrated = integrated + external_edge_seq(i)
                acts[pop_name] = (
                    pop.activation(integrated)
                    if pop.activation is not None
                    else integrated
                )
                continue

            # ---- recurrent core: minimal scan over T ----
            members = set(group)
            internal_edges: list[int] = []
            ext_inputs = {
                n: jnp.zeros((T, B, pops[n].size)) for n in group
            }
            for n in group:
                if pops[n].input_from is not None:
                    ext_inputs[n] = ext_inputs[n] + obs_seq[pops[n].input_from]
                for i in self._incoming_of(n):
                    if self.connections[i].src in members:
                        internal_edges.append(i)
                    else:
                        ext_inputs[n] = ext_inputs[n] + external_edge_seq(i)

            # In-scan ring buffers: only sources of internal delayed
            # edges need one during the scan.
            scan_buffered = sorted(
                {
                    self.connections[i].src
                    for i in internal_edges
                    if self.connections[i].delay > 0
                },
                key=list(self.topo_order).index,
            )
            init_carry = {
                "bufs": {
                    n: (
                        pop_state[n]["buffer"],
                        pop_state[n]["buffer_idx"],
                    )
                    for n in scan_buffered
                },
                "conns": {i: conn_state[i] for i in internal_edges},
            }
            internal_extras = {
                i: conn_extras[i] for i in internal_edges
            }

            def group_step(carry, xs, group=group, members=members,
                           internal_edges=internal_edges,
                           scan_buffered=scan_buffered):
                ext_t, extras_t, done_t = xs
                current: dict[str, jax.Array] = {}
                new_conns = dict(carry["conns"])
                reg_t = jnp.zeros((B,))
                for n in group:  # global topo order within the group
                    integrated = ext_t[n]
                    for i in self._incoming_of(n):
                        if i not in new_conns:  # external, precomputed
                            continue
                        conn = self.connections[i]
                        if conn.delay == 0:
                            src_out = current[conn.src]
                        else:
                            L = pops[conn.src].max_outgoing_delay
                            buf, idx = carry["bufs"][conn.src]
                            read_idx = (idx - conn.delay) % L
                            onehot = jax.nn.one_hot(read_idx, L,
                                                    dtype=buf.dtype)
                            src_out = jnp.einsum("bl,bls->bs", onehot, buf)
                        out = self.transforms[i](
                            carry["conns"][i], src_out, extras_t[i]
                        )
                        new_conns[i] = out.next_state
                        integrated = integrated + out.output
                        reg_t = reg_t + jnp.broadcast_to(
                            out.regularization_loss, (B,)
                        )
                    current[n] = (
                        pops[n].activation(integrated)
                        if pops[n].activation is not None
                        else integrated
                    )
                new_bufs = {}
                for n in scan_buffered:
                    buf, idx = _ring_write(
                        *carry["bufs"][n], current[n],
                        pops[n].max_outgoing_delay,
                    )
                    buf = jnp.where(done_t[:, None, None], 0.0, buf)
                    idx = jnp.where(done_t, 0, idx)
                    new_bufs[n] = (buf, idx)
                # Post-step done reset of internal transform carries.
                for i in internal_edges:
                    reset = self.transforms[i].reset_state(new_conns[i])
                    new_conns[i] = tree_where(done_t, reset, new_conns[i])
                return (
                    {"bufs": new_bufs, "conns": new_conns},
                    (current, reg_t),
                )

            final_carry, (group_acts, group_reg) = jax.lax.scan(
                group_step,
                init_carry,
                (ext_inputs, internal_extras, done_seq.astype(bool)),
            )
            for n in group:
                acts[n] = group_acts[n]
            reg_total = reg_total + group_reg
            for i in internal_edges:
                new_conn_state[i] = final_carry["conns"][i]

        outputs = {
            output_key: acts[pop_name]
            for output_key, pop_name in self.output_pops
        }

        # Final ring-buffer state: a transform-free masked-write scan
        # (write act[t], then zero everything where done[t] — matching
        # the step-wise order where reset wipes the same step's write).
        buffered = [p for p in self.populations if p.max_outgoing_delay > 0]
        if buffered:
            init = {
                p.name: (
                    pop_state[p.name]["buffer"],
                    pop_state[p.name]["buffer_idx"],
                )
                for p in buffered
            }
            act_stack = {p.name: acts[p.name] for p in buffered}

            def buf_step(carry, xs):
                acts_t, done_t = xs
                new_carry = {}
                for p in buffered:
                    buf, idx = _ring_write(
                        *carry[p.name], acts_t[p.name], p.max_outgoing_delay
                    )
                    buf = jnp.where(done_t[:, None, None], 0.0, buf)
                    idx = jnp.where(done_t, 0, idx)
                    new_carry[p.name] = (buf, idx)
                return new_carry, None

            final_bufs, _ = jax.lax.scan(
                buf_step, init, (act_stack, done_seq.astype(bool))
            )
        else:
            final_bufs = {}

        final_pop_state = {
            p.name: (
                {
                    "buffer": final_bufs[p.name][0],
                    "buffer_idx": final_bufs[p.name][1],
                }
                if p.max_outgoing_delay > 0
                else {}
            )
            for p in self.populations
        }
        final_state = {
            "populations": final_pop_state,
            "connections": tuple(new_conn_state),
        }
        return outputs, reg_total, final_state

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
