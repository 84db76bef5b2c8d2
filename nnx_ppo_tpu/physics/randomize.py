"""Per-env domain randomization for the physics engine.

The reference's MJX workloads train sim-to-real policies with per-env
physical-parameter randomization (mass, friction, motor strength —
standard in the mujoco_playground training stacks the reference plugs
into). This module is the TPU-native equivalent for the in-repo engine:

* :class:`DomainParams` — a tiny pytree of *traced* per-env overrides
  the engine consumes (``physics/engine.py`` threads it through
  ``forward_dynamics``/``step``). ``None`` fields fall back to the
  static :class:`~nnx_ppo_tpu.physics.model.Model` constants at zero
  cost — the un-randomized trace is bit-identical to the engine without
  this feature.
* :class:`DomainRandomization` — a static range config with
  ``sample(key) -> DomainParams``; envs call it at ``reset`` and store
  the draw in their ``State.data``, so every episode (including
  auto-resets inside the rollout scan) gets a fresh draw and the whole
  batch stays ONE vmapped XLA program — no per-env recompilation, no
  host involvement.

Design note (why not randomize the Model): the Model is trace-time
static metadata (shapes, tree topology, numpy constants) — baking
per-env values into it would mean one compiled program per env. The
randomized quantities are deliberately the small set that enter the
dynamics as *multiplicative factors on traced arrays*: body spatial
inertias (mass_scale), the contact friction coefficient, viscous joint
damping, and actuator gain. Under ``vmap`` each becomes a ``[B]``
broadcast against the batched state — a handful of extra fused
multiplies per substep.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class DomainParams(NamedTuple):
    """Traced per-env physics overrides (``None`` = use the Model value).

    Fields are scalars (or ``[NB]`` for ``mass_scale``) *per env*; the
    framework's env vmap batches them to ``[B]`` like any other state
    leaf. ``None`` fields are empty pytree nodes — they cost nothing
    and keep the trace identical to the un-randomized engine.
    """

    # Multiplier on every body's spatial inertia (mass AND rotational
    # inertia — i.e. a density scale). Scalar or per-body [NB].
    mass_scale: Optional[jax.Array] = None
    # Absolute Coulomb friction coefficient (replaces Model.friction).
    friction: Optional[jax.Array] = None
    # Multiplier on per-dof viscous joint damping (both the bias-force
    # term and the implicit dt·D term, so implicit stability is kept).
    damping_scale: Optional[jax.Array] = None
    # Multiplier on actuator torque output. The ENGINE does not apply
    # this (it sees only the final tau); envs multiply their computed
    # joint torques by it — see LeggedJoystick.step.
    gain_scale: Optional[jax.Array] = None

    def body_scale(self, i: int) -> Optional[jax.Array]:
        """mass_scale factor for body ``i`` (handles scalar vs [NB])."""
        if self.mass_scale is None:
            return None
        if self.mass_scale.ndim == 0:
            return self.mass_scale
        return self.mass_scale[i]


def _sample_range(key: jax.Array, rng: tuple[float, float]) -> jax.Array:
    lo, hi = rng
    return jax.random.uniform(key, (), minval=lo, maxval=hi)


@dataclasses.dataclass(frozen=True)
class DomainRandomization:
    """Static uniform-range config; ``sample`` draws one env's params.

    A range of ``None`` leaves that field un-randomized (the engine then
    uses the Model constant and the field costs nothing). Defaults are
    the conventional sim-to-real ranges for legged locomotion.
    """

    mass_scale: Optional[tuple[float, float]] = (0.8, 1.2)
    friction: Optional[tuple[float, float]] = (0.4, 1.0)
    damping_scale: Optional[tuple[float, float]] = None
    gain_scale: Optional[tuple[float, float]] = (0.9, 1.1)

    def sample(self, key: jax.Array):
        # (returns DomainParams; annotation omitted — the suite's
        # typeguard hook cannot re-check NamedTuples of tracers)
        km, kf, kd, kg = jax.random.split(key, 4)
        return DomainParams(
            mass_scale=(
                _sample_range(km, self.mass_scale)
                if self.mass_scale is not None
                else None
            ),
            friction=(
                _sample_range(kf, self.friction)
                if self.friction is not None
                else None
            ),
            damping_scale=(
                _sample_range(kd, self.damping_scale)
                if self.damping_scale is not None
                else None
            ),
            gain_scale=(
                _sample_range(kg, self.gain_scale)
                if self.gain_scale is not None
                else None
            ),
        )

    @property
    def dim(self) -> int:
        """Length of :func:`privileged_vector` for draws from this
        config (one scalar per randomized field)."""
        return sum(
            r is not None
            for r in (self.mass_scale, self.friction, self.damping_scale,
                      self.gain_scale)
        )

    def identity(self, model):
        """Params pinned to 1×/Model values — same pytree structure as
        :meth:`sample` (required by ``tree_where`` auto-reset), but the
        dynamics exactly match the un-randomized engine. ``model`` is
        the :class:`~nnx_ppo_tpu.physics.model.Model` (supplies the
        nominal friction, the one absolute — not multiplicative —
        field)."""
        one = jnp.ones(())
        return DomainParams(
            mass_scale=one if self.mass_scale is not None else None,
            friction=(
                jnp.float32(model.friction)
                if self.friction is not None
                else None
            ),
            damping_scale=one if self.damping_scale is not None else None,
            gain_scale=one if self.gain_scale is not None else None,
        )


def privileged_vector(params) -> jax.Array:
    """Flatten a :class:`DomainParams` draw's non-None fields into one
    obs vector (fixed field order, scalars and per-body arrays alike;
    the argument is unannotated — the suite's typeguard hook cannot
    check NamedTuples of tracers).

    The standard asymmetric actor-critic setup: the CRITIC observes the
    true physics of its env (a privileged signal that exists only in
    sim), the actor does not — the value function stops paying variance
    for dynamics it cannot infer, while the policy stays deployable.
    Envs expose this as an ``obs["privileged"]`` stream
    (``LeggedJoystick(privileged_obs=True)``); route it away from the
    actor with a ``Filter`` head (see ``examples/legged_training.py``).
    """
    parts = [
        jnp.atleast_1d(x)
        for x in (params.mass_scale, params.friction,
                  params.damping_scale, params.gain_scale)
        if x is not None
    ]
    if not parts:
        raise ValueError("privileged_vector of an all-None DomainParams")
    return jnp.concatenate(parts)
