"""The StatefulModule protocol — the network/algorithm contract.

Capability-parity with the reference protocol
(``nnx_ppo/networks/types.py:39-113``), redesigned functionally for TPU:

* A module is an immutable **pytree** (params/stats/rng-keys are array
  leaves; sizes & flags are static treedef metadata). The whole network
  goes through `jax.jit` / `jax.grad` / `NamedSharding` directly.
* Two kinds of state, as in the reference:

  1. *module state* — the module's own leaves (params, running stats,
     RNG base keys). Never written from the forward path; statistics
     are folded in once per train step via :meth:`update_statistics`,
     which here is **functional** (returns a new module).
  2. *carry state* — an explicit per-env pytree threaded by the
     algorithm, reset at episode boundaries (RNN hiddens, delay
     buffers, per-env PRNG keys).

* ``rollout_extras`` is the ROLLOUT → LOSS_REPLAY channel: ``None``
  means ROLLOUT/INFERENCE (sample fresh, emit snapshot); non-``None``
  means LOSS_REPLAY (consume the stored snapshot). Identical semantics
  to the reference (``networks/types.py:60-66``).

RNG policy (TPU-first deviation from the reference)
----------------------------------------------------
The reference gives samplers a module-level mutable ``nnx.Rngs`` stream
(``sampling_layers.py:96``) and variational layers per-env keys in the
carry. Here **all** stochastic layers keep per-env keys in the carry:
it is pure (no hidden mutation inside jit), it shards over the env axis
with everything else, minibatch carry-slicing slices the keys
consistently, and replay advances RNG in lockstep automatically because
the replay scan threads the same carry. Keys survive episode resets
(``reset_state`` preserves them), matching the reference's variational
layers (``variational.py``).
"""

from __future__ import annotations

import abc
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jaxtyping import Key

from nnx_ppo_tpu.core import struct
from nnx_ppo_tpu.core.struct import pytree_dataclass, static_field

ModuleState = Any  # Any JAX pytree: (), (h, c), dict, per-env keys, ...


@pytree_dataclass
class PPONetworkOutput:
    """PPO-specific forward output, produced by ``PPOAdapter``.

    Mirrors the reference (``networks/types.py:16-26``). Each field may
    be a PyTree (dict actions / multi-head values).
    """

    actions: Any
    loglikelihoods: Any
    value_estimates: Any


@pytree_dataclass
class ModuleOutput:
    """Result of one module forward step.

    Same five channels as the reference ``StatefulModuleOutput``
    (``networks/types.py:29-36``).
    """

    next_state: ModuleState
    output: Any
    regularization_loss: Any  # scalar or [batch]
    metrics: dict
    rollout_extras: Any = None


# Alias for API parity with the reference name.
StatefulModuleOutput = ModuleOutput


class StatefulModule(abc.ABC):
    """Base class for network modules. Concrete subclasses are
    ``pytree_dataclass`` es; instances are immutable pytrees."""

    @abc.abstractmethod
    def __call__(
        self,
        module_state: ModuleState,
        obs: Any,
        rollout_extras: Any = None,
    ) -> ModuleOutput:
        """Run one (batched) forward step.

        Args:
          module_state: per-env carry, leading dim = batch.
          obs: observations pytree, leading dim = batch.
          rollout_extras: ``None`` in ROLLOUT/INFERENCE; the stored
            snapshot from ``Transition.rollout_extras`` in LOSS_REPLAY.
        """

    def initialize_state(self, batch_size: int) -> ModuleState:
        """Fresh per-env carry with leading dim ``batch_size``."""
        return ()

    def reset_state(self, prev_state: ModuleState) -> ModuleState:
        """Carry after an episode reset. Receives the previous carry so
        reset-surviving leaves (PRNG keys) can be preserved."""
        return prev_state

    def update_statistics(self, rollout_extras: Any) -> "StatefulModule":
        """Fold a rollout's worth of replay snapshots (``[T, B, ...]``
        leaves) into running statistics. Functional: returns the updated
        module. Default: no stats, returns self."""
        del rollout_extras
        return self

    def replay_sequence(
        self,
        module_state: ModuleState,
        obs_seq: Any,
        done_seq: jax.Array,
        extras_seq: Any,
    ) -> tuple[Any, jax.Array, ModuleState]:
        """Replay this module over a whole ``[T, B, ...]`` stored
        sequence (LOSS_REPLAY only — every step gets its stored extras).

        Returns ``(output_seq, reg_seq [T, B], final_state)``. The carry
        is reset per-env where ``done_seq[t]`` AFTER step t, exactly like
        the rollout (``rollout.single_transition``).

        Containers override this to run **layer-wise over time**: each
        child processes the full sequence before the next child runs —
        semantically identical to step-wise execution (children interact
        only through the data stream), but it lets every
        replay-time-static child batch over ``T·B`` on the MXU while
        genuinely recurrent children scan only their own small core.

        Default implementation: the batched ``vmap``-over-time forward
        for replay-time-static modules, a ``lax.scan`` otherwise.
        """
        T, B = done_seq.shape
        if self.replay_time_static:
            per_step = expand_state_over_time(module_state, T)

            def forward_t(state, obs, extras):
                out = self(state, obs, extras)
                return out.output, out.regularization_loss

            output_seq, reg_seq = jax.vmap(forward_t)(
                per_step, obs_seq, extras_seq
            )
            # Final carry: key leaves advance by the same chained
            # next-key split the sequential scan performs, so the T+1
            # bootstrap forward (extras=None → fresh draw) uses keys
            # independent of every sample key consumed during the
            # rollout. Non-key leaves are returned unchanged — legal
            # only because a replay-time-static module's non-key carry
            # must be constant across steps (see ``replay_time_static``).
            final_state = jax.tree.map(
                lambda x: advance_per_env_keys(x, T)
                if jnp.issubdtype(x.dtype, jax.dtypes.prng_key)
                else x,
                module_state,
            )
            return output_seq, _normalize_reg(reg_seq, T, B), final_state

        def step(state, xs):
            obs, done, extras = xs
            out = self(state, obs, extras)
            reset = self.reset_state(out.next_state)
            new_state = struct.tree_where(done, reset, out.next_state)
            return new_state, (out.output, out.regularization_loss)

        final_state, (output_seq, reg_seq) = jax.lax.scan(
            step, module_state, (obs_seq, done_seq, extras_seq)
        )
        return output_seq, _normalize_reg(reg_seq, T, B), final_state

    @property
    def replay_time_static(self) -> bool:
        """True iff in LOSS_REPLAY mode (``rollout_extras is not None``)
        this module's ``output`` and ``regularization_loss`` depend only
        on (params, input, stored extras) — *not* on carry values.

        When every module in a network is replay-time-static, the PPO
        loss replay runs as ONE batched ``[T·B]`` forward (``vmap`` over
        time) instead of a T-step sequential scan — the single biggest
        latency win in the update phase on TPU (T× fewer kernel
        dispatches, T× larger MXU matmuls). Modules achieve this by
        snapshotting *all* stochastic draws into ``rollout_extras``
        (e.g. the sampler stores its entropy noise, the variational
        bottleneck its reparameterization eps), so replay never touches
        the carry RNG chain.

        Additional invariant the fused path relies on: a
        replay-time-static module's **non-key carry leaves must be
        constant across steps** (empty, or PRNG keys). The fused final
        carry returns non-key leaves unchanged; a module whose non-key
        carry evolved per step would bootstrap from the t=0 value.
        Modules with meaningful evolving carries must either return
        False here or override ``replay_sequence``.

        Default False (conservative): genuinely recurrent modules
        (LSTM/GRU/Delay/AR1/PopulationGraph) and unknown user modules
        keep the exact sequential scan path.
        """
        return False

    # -- mode switching (functional analogue of nnx .eval()/.train()) --

    def eval(self) -> "StatefulModule":
        """Deterministic-inference variant (samplers emit the mean)."""
        return struct.tree_set_attr(self, "deterministic", True)

    def train(self) -> "StatefulModule":
        return struct.tree_set_attr(self, "deterministic", False)


def _normalize_reg(reg_seq: jax.Array, T: int, B: int) -> jax.Array:
    """Broadcast per-step regularization (scalar or [B] per step) to
    ``[T, B]`` so container summation across children is shape-stable."""
    if reg_seq.ndim == 1:
        reg_seq = reg_seq[:, None]
    return jnp.broadcast_to(reg_seq, (T, B))


def replay_sequence_nd(
    module: StatefulModule,
    module_state: ModuleState,
    obs_bt: Any,
    n_steps: int,
    extras_bt: Any,
    final_state: ModuleState = None,
) -> tuple[Any, jax.Array, ModuleState]:
    """Fused replay over **batch-major** ``[B, T, ...]`` buffers as ONE
    ND-batched forward.

    Requires ``module.replay_time_static`` (the whole network): the
    output at (b, t) depends only on (params, input, stored extras), so
    neither time ordering nor the per-env ``done`` resets matter — the
    entire replay collapses to a single MXU-sized forward with no
    ``vmap``-over-time axis at all. The forward runs DIRECTLY on the
    ``[B, T, ...]`` leaves (every static layer is elementwise or
    contracts the last axis, so leading batch rank is free): no
    flatten-to-``[B·T]`` reshape op sits between the minibatch gather
    and the matmuls, leaving XLA's layout assignment free to collapse
    the leading dims without a retiling copy. Measured on one v5e
    (quadruped megakernel config): an explicit flatten gather ran 7.7M
    env-steps/s vs 12.4M for gather-rows + in-loss reshape; this path
    removes the reshape too. The (b, t) PRNG key is ``split(k_b, T)[t]``
    — exactly the key the time-major fused path hands step t, so
    outputs match it bit-for-bit (modulo per-call reduction order).

    Returns ``(output_bt [B,T,...], reg_bt [B,T], final_state)``;
    ``final_state`` advances key leaves by the same chained next-key
    split as the sequential scan (T+1 bootstrap parity), or pass a
    pre-advanced carry (:func:`advance_state_keys`, hoisted out of
    per-minibatch losses) to skip the in-loss chain.
    """
    if not module.replay_time_static:
        raise ValueError(
            "replay_sequence_nd requires a fully replay-time-static "
            "network (every module's replay output independent of carry "
            "values); use the time-major replay_sequence path for "
            "recurrent networks."
        )
    T = n_steps
    first = jax.tree.leaves(obs_bt)[0]
    B = first.shape[0]

    def expand(leaf: jax.Array) -> jax.Array:
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            # [B] keys -> [B, T] per-step subkeys; (b, t) holds
            # split(k_b, T)[t].
            return jax.vmap(lambda k: jax.random.split(k, T))(leaf)
        # Non-key carries of a static module are constant across steps:
        # broadcast each env's value over its T samples.
        return jnp.broadcast_to(
            leaf[:, None], (leaf.shape[0], T) + leaf.shape[1:]
        )

    nd_state = jax.tree.map(expand, module_state)
    out = module(nd_state, obs_bt, extras_bt)
    reg = out.regularization_loss
    reg_bt = jnp.broadcast_to(reg, (B, T))
    if final_state is None:
        final_state = advance_state_keys(module_state, T)
    return out.output, reg_bt, final_state


def advance_state_keys(module_state: ModuleState, n_steps: int) -> ModuleState:
    """Advance every PRNG-key leaf of a per-env carry by ``n_steps``
    chained next-key splits (:func:`advance_per_env_keys`); non-key
    leaves pass through unchanged. The fused-replay final-carry rule,
    exposed so the T-long sequential split chain can be hoisted out of
    per-minibatch losses."""
    return jax.tree.map(
        lambda x: advance_per_env_keys(x, n_steps)
        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key)
        else x,
        module_state,
    )


def expand_state_over_time(module_state: ModuleState, unroll_length: int) -> Any:
    """Per-step carry trees ``[T, ...]`` for the time-fused replay.

    PRNG-key leaves get a distinct subkey per step (split once, batched);
    all other leaves are broadcast unchanged — legal because a
    replay-time-static module never reads carry values in replay."""

    def expand(leaf: jax.Array) -> jax.Array:
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            split = jax.vmap(lambda k: jax.random.split(k, unroll_length))(leaf)
            return jnp.swapaxes(split, 0, 1)  # [T, B]
        return jnp.broadcast_to(leaf[None], (unroll_length, *leaf.shape))

    return jax.tree.map(expand, module_state)


def split_per_env_keys(
    keys: "Key[jax.Array, '...']", num: int = 2
) -> "tuple[Key[jax.Array, '...'], ...]":
    """Split a ``[B]`` (or any-rank, e.g. the ND replay's ``[B, T]``)
    array of PRNG keys into ``num`` per-env subkey arrays — the
    carry-state RNG advance used by stochastic layers."""
    flat = keys.reshape(-1)
    split = jax.vmap(lambda k: jax.random.split(k, num))(flat)
    return tuple(split[:, i].reshape(keys.shape) for i in range(num))


def advance_per_env_keys(
    keys: "Key[jax.Array, 'batch']", n_steps: int
) -> "Key[jax.Array, 'batch']":
    """Advance a ``[B]`` per-env key array by ``n_steps`` chained
    next-key splits — the same ``split_per_env_keys(...)[0]`` chain the
    sequential scan walks, so fused sequence replay can hand the T+1
    bootstrap forward keys that match the step-wise path and are
    independent of every per-step sample key.

    Relies on *prefix stability* of the key impl: ``split(k, 2)[0] ==
    split(k, n)[0]`` for any n, so a module that splits into 3 per step
    (e.g. NormalTanhSampler) still lands on the same next carry key.
    Threefry (the JAX default) is prefix-stable; rbg/unsafe_rbg are
    not, so they are rejected here rather than silently diverging from
    the sequential path.
    """
    impl = str(jax.random.key_impl(keys))
    if "threefry" not in impl:
        raise NotImplementedError(
            f"advance_per_env_keys requires the prefix-stable threefry "
            f"key impl (split(k,2)[0] == split(k,n)[0]); got {impl!r}. "
            "Fused sequence replay would diverge from the sequential "
            "path under this impl — use jax_default_prng_impl=threefry2x32."
        )

    def step(k, _):
        return split_per_env_keys(k, 2)[0], None

    advanced, _ = jax.lax.scan(step, keys, None, length=n_steps)
    return advanced


def make_per_env_keys(
    base_key: "Key[jax.Array, '']", batch_size: int
) -> "Key[jax.Array, 'batch']":
    """Derive ``[batch_size]`` independent per-env keys from a base key."""
    return jax.random.split(base_key, batch_size)


def canonicalize_tree(obj: Any) -> Any:
    """Recursively convert Mappings (OrderedDict/FrozenDict/...) to plain
    dicts so pytree node types align (reference ``normalizer.py:18-32``)."""
    from collections.abc import Mapping

    if isinstance(obj, Mapping):
        return {k: canonicalize_tree(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [canonicalize_tree(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(canonicalize_tree(v) for v in obj)
    return obj


def batch_zeros(shape_tree: Any, batch_size: int, dtype: Any = jnp.float32) -> Any:
    """Zeros pytree with a prepended batch dim, from a shape pytree."""

    def mk(shape: Any) -> jax.Array:
        if isinstance(shape, int):
            shape = (shape,)
        return jnp.zeros((batch_size, *shape), dtype)

    return jax.tree.map(mk, shape_tree, is_leaf=lambda x: isinstance(x, (tuple, int)))
