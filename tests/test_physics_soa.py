"""The SoA substep (Pallas kernel math body) must exactly reproduce the
generic engine's fast path (``forward_dynamics`` with a held factor +
``integrate``) on the quadruped and humanoid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.physics.engine import (
    forward_dynamics,
    integrate,
    mass_matrix_factor,
)
from nnx_ppo_tpu.physics.engine_soa import substep_soa
from nnx_ppo_tpu.physics.models import make_humanoid, make_quadruped
from nnx_ppo_tpu.physics.models import humanoid as hu
from nnx_ppo_tpu.physics.models import quadruped as qd


def reference_substeps(model, qpos, qvel, target, kp, dt, n_sub):
    """Vmapped generic-engine fast path."""
    chol = jax.vmap(lambda q: mass_matrix_factor(model, q, dt=dt))(qpos)

    def one_env(qp, qv, tgt, L):
        for _ in range(n_sub):
            tau_j = kp * (tgt - qp[7:])
            tau = jnp.concatenate([jnp.zeros(6), tau_j])
            qacc, _ = forward_dynamics(model, qp, qv, tau, dt=dt, chol=L)
            qp, qv = integrate(model, qp, qv, qacc, dt)
        return qp, qv

    return jax.vmap(one_env)(qpos, qvel, target, chol)


def soa_substeps(model, qpos, qvel, target, kp, dt, n_sub):
    chol_m = jax.vmap(lambda q: mass_matrix_factor(model, q, dt=dt))(qpos)
    nv = model.nv
    qp = tuple(qpos[:, k] for k in range(qpos.shape[1]))
    qv = tuple(qvel[:, k] for k in range(nv))
    tgt = tuple(target[:, k] for k in range(target.shape[1]))
    chol = tuple(
        tuple(chol_m[:, i, j] for j in range(i + 1)) for i in range(nv)
    )
    for _ in range(n_sub):
        qp, qv, _ = substep_soa(model, qp, qv, tgt, chol, kp, dt)
    return jnp.stack(qp, axis=1), jnp.stack(qv, axis=1)


@pytest.mark.slow  # unrolled per-env reference path: minutes of CPU compile
@pytest.mark.parametrize(
    "make_model,default_qpos,kp",
    [
        (make_quadruped, qd.default_qpos, 60.0),
        (make_humanoid, hu.default_qpos, 350.0),
    ],
    ids=["quadruped", "humanoid"],
)
def test_soa_matches_generic_engine(make_model, default_qpos, kp):
    model = make_model()
    B, dt, n_sub = 8, 0.002, 10
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    base = jnp.asarray(default_qpos(model))
    qpos = jnp.tile(base, (B, 1))
    qpos = qpos.at[:, 7:].add(0.1 * jax.random.normal(k1, (B, model.nj)))
    qpos = qpos.at[:, 2].add(0.02 * jax.random.normal(k3, (B,)))
    qvel = 0.3 * jax.random.normal(k2, (B, model.nv))
    target = qpos[:, 7:]

    ref_qp, ref_qv = jax.jit(
        lambda a, b, c: reference_substeps(model, a, b, c, kp, dt, n_sub)
    )(qpos, qvel, target)
    soa_qp, soa_qv = jax.jit(
        lambda a, b, c: soa_substeps(model, a, b, c, kp, dt, n_sub)
    )(qpos, qvel, target)

    np.testing.assert_allclose(
        np.asarray(soa_qp), np.asarray(ref_qp), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(soa_qv), np.asarray(ref_qv), rtol=2e-3, atol=2e-3
    )


def test_pallas_kernel_interpret_matches_soa():
    """The Pallas substep kernel (interpret mode — platform-independent)
    must match the SoA XLA path bit-for-bit in structure (same math,
    only lane plumbing differs)."""
    from nnx_ppo_tpu.physics.pallas_step import pallas_substeps

    model = make_quadruped()
    B, dt, n_sub, kp = 128, 0.002, 3, 60.0
    k1, k2 = jax.random.split(jax.random.key(0))
    base = jnp.asarray(qd.default_qpos(model))
    qpos = jnp.tile(base, (B, 1)).at[:, 7:].add(
        0.1 * jax.random.normal(k1, (B, model.nj))
    )
    qvel = 0.3 * jax.random.normal(k2, (B, model.nv))
    target = qpos[:, 7:]
    chol = jax.vmap(lambda q: mass_matrix_factor(model, q, dt=dt))(qpos)

    ref_qp, ref_qv = soa_substeps(model, qpos, qvel, target, kp, dt, n_sub)
    pq, pv, pnormals = pallas_substeps(
        model, qpos, qvel, target, chol, kp, dt, n_sub,
        tile=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pq), np.asarray(ref_qp),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(ref_qv),
                               rtol=2e-3, atol=2e-3)
    assert pnormals.shape == (B, len(model.geom_body))
    # Standing at the default height, the foot spheres carry weight.
    assert np.asarray(pnormals).max() > 0.0


def test_soa_refuses_unsupported_contact_features():
    """The SoA body implements ground contacts only; a model with joint
    limits or collision pairs must be refused, not silently diverge from
    the generic engine."""
    model = make_quadruped(joint_limits=True)
    qpos = jnp.asarray(qd.default_qpos(model))
    args = (
        tuple(qpos),
        tuple(jnp.zeros(model.nv)),
        tuple(qpos[7:]),
        None,
        60.0,
        2e-3,
    )
    with pytest.raises(AssertionError, match="joint-range limits"):
        substep_soa(model, *args)
    model = make_quadruped(self_collision=True)
    with pytest.raises(AssertionError, match="collision pairs"):
        substep_soa(model, *args)
