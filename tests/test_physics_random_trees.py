"""Property tests of the dynamics over RANDOM kinematic trees.

The model-specific tests (``test_physics.py``) pin exact behaviors on
the shipped robots; these cross-check engine identities that must hold
for ANY tree — random topology, mixed hinge/slide/ball joints, free or
fixed base, random inertial parameters:

- **Kinetic-energy identity**: ``½ q̇ᵀ M(q) q̇ == Σᵢ ½ vᵢᵀ Iᵢ vᵢ`` —
  the CRBA joint-space inertia against an independent sum over body
  spatial velocities/inertias. Exercises every X/S/I code path at once.
- **M is symmetric positive definite.**
- **Passive energy conservation**: an undamped, contact-free tree in
  gravity conserves E = T + V over a semi-implicit-Euler rollout
  (bounded drift at small dt).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.physics import ModelBuilder, forward_dynamics, step
from nnx_ppo_tpu.physics.engine import (
    _body_inertias,
    body_velocities,
    fwd_kinematics,
    mass_matrix,
)
from nnx_ppo_tpu.physics.model import BALL, FREE, HINGE, SLIDE


def _random_tree(seed: int, free_base: bool):
    rng = np.random.RandomState(seed)
    n_bodies = rng.randint(3, 8)
    b = ModelBuilder(gravity=-9.81)
    names = []
    for i in range(n_bodies):
        if i == 0:
            joint = FREE if free_base else rng.choice([HINGE, SLIDE, BALL])
            parent = None
        else:
            joint = rng.choice([HINGE, SLIDE, BALL])
            parent = names[rng.randint(0, i)]
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        name = f"b{i}"
        b.add_body(
            name,
            parent=parent,
            joint=joint,
            axis=tuple(axis),
            pos=tuple(0.4 * rng.normal(size=3)),
            mass=float(rng.uniform(0.2, 2.0)),
            com=tuple(0.15 * rng.normal(size=3)),
            inertia=tuple(rng.uniform(0.01, 0.1, size=3)),
        )
        names.append(name)
    return b.finalize()


def _random_state(model, seed: int):
    rng = np.random.RandomState(1000 + seed)
    qpos = []
    for jtype in model.joint_type:
        if jtype == FREE:
            quat = rng.normal(size=4)
            quat /= np.linalg.norm(quat)
            qpos.extend([*rng.normal(size=3), *quat])
        elif jtype == BALL:
            quat = rng.normal(size=4)
            quat /= np.linalg.norm(quat)
            qpos.extend(quat)
        else:
            qpos.append(rng.uniform(-1.0, 1.0))
    qvel = rng.uniform(-1.0, 1.0, size=model.nv)
    return (
        jnp.asarray(np.asarray(qpos), jnp.float32),
        jnp.asarray(qvel, jnp.float32),
    )


def _kinetic_energy_from_bodies(model, qpos, qvel):
    kin = fwd_kinematics(model, qpos)
    v = body_velocities(model, kin, qvel)
    I = _body_inertias(model)
    return sum(0.5 * float(vi @ (Ii @ vi)) for vi, Ii in zip(v, I))


def _potential_energy(model, qpos):
    kin = fwd_kinematics(model, qpos)
    pe = 0.0
    for i in range(model.n_bodies):
        com_w = kin.p[i] + kin.E[i] @ jnp.asarray(model.com[i], jnp.float32)
        pe += float(model.mass[i]) * (-model.gravity) * float(com_w[2])
    return pe


CASES = [(s, fb) for s in range(6) for fb in (False, True)]


class TestRandomTrees:
    @pytest.mark.parametrize("seed,free_base", CASES)
    def test_kinetic_energy_identity(self, seed, free_base):
        model = _random_tree(seed, free_base)
        qpos, qvel = _random_state(model, seed)
        kin = fwd_kinematics(model, qpos)
        M = np.asarray(mass_matrix(model, kin), np.float64)
        # armature defaults to 0, so M is pure CRBA here.
        t_crba = 0.5 * float(np.asarray(qvel) @ M @ np.asarray(qvel))
        t_bodies = _kinetic_energy_from_bodies(model, qpos, qvel)
        assert t_bodies > 0.0
        np.testing.assert_allclose(t_crba, t_bodies, rtol=2e-4)

    @pytest.mark.parametrize("seed,free_base", CASES[:6])
    def test_mass_matrix_spd(self, seed, free_base):
        model = _random_tree(seed, free_base)
        qpos, _ = _random_state(model, seed)
        kin = fwd_kinematics(model, qpos)
        M = np.asarray(mass_matrix(model, kin), np.float64)
        np.testing.assert_allclose(M, M.T, atol=1e-5)
        w = np.linalg.eigvalsh(M)
        assert w.min() > 0.0, w

    @pytest.mark.parametrize("seed", range(3))
    def test_passive_energy_conservation(self, seed):
        # Fixed-base (keeps the tree bounded), no damping, no geoms →
        # E = T + V must be conserved by the passive dynamics.
        model = _random_tree(2 * seed, free_base=False)
        qpos, qvel = _random_state(model, seed)
        qvel = 0.3 * qvel  # modest speeds: bounds integration error
        e0 = _kinetic_energy_from_bodies(model, qpos, qvel) + (
            _potential_energy(model, qpos)
        )
        dt = 2e-4
        qpos, qvel, _ = step(
            model, qpos, qvel, jnp.zeros(model.nv), dt, n_substeps=2500
        )
        assert bool(jnp.isfinite(qpos).all() and jnp.isfinite(qvel).all())
        e1 = _kinetic_energy_from_bodies(model, qpos, qvel) + (
            _potential_energy(model, qpos)
        )
        scale = max(abs(e0), 1.0)
        assert abs(e1 - e0) / scale < 0.02, (e0, e1)

    @pytest.mark.parametrize("seed", range(2))
    def test_forward_dynamics_consistent_with_energy_rate(self, seed):
        # Power balance: with gravity the only force, dT/dt = −dV/dt,
        # i.e. d(T+V)/dt ≈ 0 evaluated with the instantaneous qacc.
        model = _random_tree(seed + 20, free_base=True)
        qpos, qvel = _random_state(model, seed)
        qacc, _ = forward_dynamics(model, qpos, qvel, jnp.zeros(model.nv))
        eps = 1e-3

        def energy(qp, qv):
            return _kinetic_energy_from_bodies(model, qp, qv) + (
                _potential_energy(model, qp)
            )

        from nnx_ppo_tpu.physics.engine import integrate

        qp1, qv1 = integrate(model, qpos, qvel, qacc, eps)
        qp0, qv0 = integrate(model, qpos, qvel, qacc, -eps)
        de_dt = (energy(qp1, qv1) - energy(qp0, qv0)) / (2 * eps)
        e_ref = abs(energy(qpos, qvel)) + 1.0
        assert abs(de_dt) / e_ref < 0.05, de_dt
