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


def test_soa_refuses_unsupported_joint_types():
    """The SoA body supports free-base all-hinge trees; ball/slide-joint
    models must be refused, not silently diverge from the generic
    engine. (Limits, springs, and collision pairs ARE implemented —
    exactness covered by ``test_soa_full_features_match_generic``.)"""
    from nnx_ppo_tpu.physics.engine_soa import soa_unsupported_reason
    from nnx_ppo_tpu.physics.models.arm import make_arm

    model = make_arm()  # ball shoulder joint, fixed base
    assert soa_unsupported_reason(model) is not None
    qpos = jnp.zeros(model.nq)
    with pytest.raises(AssertionError):
        substep_soa(
            model,
            tuple(qpos),
            tuple(jnp.zeros(model.nv)),
            tuple(qpos[: model.nj]),
            None,
            60.0,
            2e-3,
        )
    # The full legged feature set is supported.
    assert soa_unsupported_reason(
        make_quadruped(self_collision=True, joint_limits=True)
    ) is None


def test_soa_full_features_match_generic():
    """Joint limits, joint springs, and self-collision pairs in the SoA
    substep must reproduce the generic engine's fast path (single
    substep: exact same held-factor semantics, no drift accumulation).

    Uses a deep-crouch pose (joints pushed past the Go1-like range
    stops, feet near each other) so limits AND pairs carry force, plus
    synthetic joint springs via ``dataclasses.replace``."""
    import dataclasses

    model = make_quadruped(self_collision=True, joint_limits=True)
    spring_k = np.zeros(model.nv, np.float32)
    spring_ref = np.zeros(model.nv, np.float32)
    spring_k[7:10] = 25.0  # three dofs get passive springs
    spring_ref[7:10] = 0.3
    model = dataclasses.replace(
        model, spring_stiffness=spring_k, spring_ref=spring_ref,
        friction_vel=0.25, max_contact_force=150.0,
    )

    B, dt, kp = 8, 0.002, 60.0
    k1, k2 = jax.random.split(jax.random.key(7))
    base = jnp.asarray(qd.default_qpos(model))
    qpos = jnp.tile(base, (B, 1))
    # Large joint perturbations: push past the range stops and bring
    # the feet close enough for pair penetration in some envs.
    qpos = qpos.at[:, 7:].add(0.6 * jax.random.normal(k1, (B, model.nj)))
    qpos = qpos.at[:, 2].add(-0.05)
    qvel = 0.5 * jax.random.normal(k2, (B, model.nv))
    target = qpos[:, 7:]

    ref_qp, ref_qv = jax.jit(
        lambda a, b, c: reference_substeps(model, a, b, c, kp, dt, 1)
    )(qpos, qvel, target)
    soa_qp, soa_qv = jax.jit(
        lambda a, b, c: soa_substeps(model, a, b, c, kp, dt, 1)
    )(qpos, qvel, target)

    np.testing.assert_allclose(
        np.asarray(soa_qp), np.asarray(ref_qp), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(soa_qv), np.asarray(ref_qv), rtol=2e-4, atol=2e-4
    )

    # The test must actually exercise the new force paths: rerun the
    # generic engine and check limit/pair forces are nonzero somewhere.
    from nnx_ppo_tpu.physics.engine import limit_torques

    tau_l = jax.vmap(lambda qp, qv: limit_torques(model, qp, qv))(
        qpos, qvel
    )
    assert float(jnp.abs(tau_l).max()) > 0.0, "no limit violation sampled"

    def last_normals(qp, qv, tgt):
        chol = mass_matrix_factor(model, qp, dt=dt)
        tau = jnp.concatenate([jnp.zeros(6), kp * (tgt - qp[7:])])
        _, normals = forward_dynamics(model, qp, qv, tau, dt=dt, chol=chol)
        return normals

    normals = jax.vmap(last_normals)(qpos, qvel, target)
    n_ground = len(model.geom_body)
    assert normals.shape[1] == n_ground + len(model.pair_geom_a)
    # SoA normals must match the generic layout and values.
    nv = model.nv
    qp_t = tuple(qpos[:, k] for k in range(qpos.shape[1]))
    qv_t = tuple(qvel[:, k] for k in range(nv))
    tgt_t = tuple(target[:, k] for k in range(target.shape[1]))
    chol_m = jax.vmap(lambda q: mass_matrix_factor(model, q, dt=dt))(qpos)
    chol_t = tuple(
        tuple(chol_m[:, i, j] for j in range(i + 1)) for i in range(nv)
    )
    _, _, soa_normals = substep_soa(model, qp_t, qv_t, tgt_t, chol_t, kp, dt)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(soa_normals, axis=1)),
        np.asarray(normals),
        rtol=1e-4, atol=1e-4,
    )


def test_soa_production_features_match_generic():
    """DR lanes (density/friction/damping/gain), analytic-terrain
    contacts, and the trunk push wrench in the SoA substep must
    reproduce the generic engine's full-feature path (one substep, same
    held-factor semantics)."""
    from nnx_ppo_tpu.physics.engine_soa import crba_chol_soa
    from nnx_ppo_tpu.physics.randomize import DomainParams
    from nnx_ppo_tpu.physics.terrain import rough_terrain

    model = make_quadruped()
    terrain = rough_terrain(seed=5, amplitude=0.06)
    B, dt, kp = 8, 0.002, 60.0
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    base = jnp.asarray(qd.default_qpos(model))
    qpos = jnp.tile(base, (B, 1))
    qpos = qpos.at[:, 7:].add(0.2 * jax.random.normal(k1, (B, model.nj)))
    qvel = 0.4 * jax.random.normal(k2, (B, model.nv))
    target = qpos[:, 7:]
    km, kf, kd, kg, kpu = jax.random.split(k3, 5)
    mass_s = jax.random.uniform(km, (B,), minval=0.8, maxval=1.2)
    fric = jax.random.uniform(kf, (B,), minval=0.4, maxval=1.0)
    damp_s = jax.random.uniform(kd, (B,), minval=0.7, maxval=1.3)
    gain_s = jax.random.uniform(kg, (B,), minval=0.9, maxval=1.1)
    push = 60.0 * jax.random.normal(kpu, (B, 3)).at[:, 2].set(0.0)

    def ref_one(qp, qv, tgt, m, f, d, g, pu):
        params = DomainParams(mass_scale=m, friction=f, damping_scale=d)
        chol = mass_matrix_factor(model, qp, dt=dt, params=params)
        tau = jnp.concatenate([jnp.zeros(6), g * kp * (tgt - qp[7:])])
        qacc, normals = forward_dynamics(
            model, qp, qv, tau, dt=dt, chol=chol, terrain=terrain,
            params=params, external_forces=[(0, qp[0:3], pu)],
        )
        qp, qv = integrate(model, qp, qv, qacc, dt)
        return qp, qv, normals

    ref_qp, ref_qv, ref_n = jax.jit(jax.vmap(ref_one))(
        qpos, qvel, target, mass_s, fric, damp_s, gain_s, push
    )

    def soa_batch(qpos, qvel, target, mass_s, fric, damp_s, gain_s, push):
        qp = tuple(qpos[:, k] for k in range(qpos.shape[1]))
        qv = tuple(qvel[:, k] for k in range(model.nv))
        tgt = tuple(target[:, k] for k in range(target.shape[1]))
        chol = crba_chol_soa(
            model, qp, dt, mass_scale=mass_s, damping_scale=damp_s
        )
        qp, qv, normals = substep_soa(
            model, qp, qv, tgt, chol, kp, dt,
            terrain=terrain, friction=fric, mass_scale=mass_s,
            damping_scale=damp_s, gain_scale=gain_s,
            push=(push[:, 0], push[:, 1], push[:, 2]),
        )
        return (
            jnp.stack(qp, axis=1),
            jnp.stack(qv, axis=1),
            jnp.stack(normals, axis=1),
        )

    soa_qp, soa_qv, soa_n = jax.jit(soa_batch)(
        qpos, qvel, target, mass_s, fric, damp_s, gain_s, push
    )

    np.testing.assert_allclose(
        np.asarray(soa_qp), np.asarray(ref_qp), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(soa_qv), np.asarray(ref_qv), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(soa_n), np.asarray(ref_n), rtol=1e-4, atol=1e-4
    )
    # The scenario must actually exercise the features: terrain
    # contacts carry force somewhere, and the in-kernel factor with DR
    # scales matches the engine's params factor.
    assert float(ref_n.max()) > 0.0, "no terrain contact sampled"


def test_crba_chol_soa_dr_scales_match_engine_factor():
    """The in-kernel CRBA+Cholesky with density/damping scales must
    reproduce ``mass_matrix_factor(params=...)`` entry-for-entry."""
    from nnx_ppo_tpu.physics.engine_soa import crba_chol_soa
    from nnx_ppo_tpu.physics.randomize import DomainParams

    model = make_quadruped()
    B, dt = 4, 0.002
    k1, k2, k3 = jax.random.split(jax.random.key(2), 3)
    base = jnp.asarray(qd.default_qpos(model))
    qpos = jnp.tile(base, (B, 1)).at[:, 7:].add(
        0.3 * jax.random.normal(k1, (B, model.nj))
    )
    mass_s = jax.random.uniform(k2, (B,), minval=0.7, maxval=1.3)
    damp_s = jax.random.uniform(k3, (B,), minval=0.5, maxval=1.5)

    ref = jax.vmap(
        lambda q, m, d: mass_matrix_factor(
            model, q, dt=dt,
            params=DomainParams(mass_scale=m, damping_scale=d),
        )
    )(qpos, mass_s, damp_s)
    qp = tuple(qpos[:, k] for k in range(qpos.shape[1]))
    soa_chol = crba_chol_soa(
        model, qp, dt, mass_scale=mass_s, damping_scale=damp_s
    )
    for i in range(model.nv):
        for j in range(i + 1):
            np.testing.assert_allclose(
                np.asarray(soa_chol[i][j]), np.asarray(ref[:, i, j]),
                rtol=2e-5, atol=2e-5,
            )


@pytest.mark.slow  # interpret-mode Pallas executes lane-by-lane on host
def test_pallas_kernel_interpret_full_features():
    """The Pallas kernel plumbing must carry the extended normals layout
    (ground + pairs) and match the SoA path on the full-feature model."""
    from nnx_ppo_tpu.physics.pallas_step import pallas_substeps

    model = make_quadruped(self_collision=True, joint_limits=True)
    B, dt, n_sub, kp = 128, 0.002, 2, 60.0
    k1, k2 = jax.random.split(jax.random.key(3))
    base = jnp.asarray(qd.default_qpos(model))
    qpos = jnp.tile(base, (B, 1)).at[:, 7:].add(
        0.5 * jax.random.normal(k1, (B, model.nj))
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
    assert pnormals.shape == (
        B, len(model.geom_body) + len(model.pair_geom_a)
    )


@pytest.mark.slow  # interpret-mode Pallas executes lane-by-lane on host
def test_pallas_fused_substeps_match_per_substep_launch():
    """``substeps_per_kernel`` must be pure launch batching: running all
    substeps inside one kernel launch (the fused-dispatch variant) must
    reproduce the per-substep-launch trajectory. Not bitwise — the
    compiler contracts FMAs differently when the substeps are one
    program — but to the same tolerance as the engine exactness gates."""
    from nnx_ppo_tpu.physics.pallas_step import pallas_substeps

    model = make_quadruped(self_collision=True, joint_limits=True)
    B, dt, n_sub, kp = 128, 0.002, 4, 60.0
    k1, k2 = jax.random.split(jax.random.key(7))
    base = jnp.asarray(qd.default_qpos(model))
    qpos = jnp.tile(base, (B, 1)).at[:, 7:].add(
        0.3 * jax.random.normal(k1, (B, model.nj))
    )
    qvel = 0.3 * jax.random.normal(k2, (B, model.nv))
    target = qpos[:, 7:]
    chol = jax.vmap(lambda q: mass_matrix_factor(model, q, dt=dt))(qpos)

    per = pallas_substeps(model, qpos, qvel, target, chol, kp, dt, n_sub,
                          tile=128, interpret=True, substeps_per_kernel=1)
    fused = pallas_substeps(model, qpos, qvel, target, chol, kp, dt, n_sub,
                            tile=128, interpret=True,
                            substeps_per_kernel=n_sub)
    for a, b in zip(per, fused):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )

    with pytest.raises(ValueError, match="multiple"):
        pallas_substeps(model, qpos, qvel, target, chol, kp, dt, n_sub,
                        tile=128, interpret=True, substeps_per_kernel=3)


def test_substep_runner_fused_knob_validation():
    """The runner resolves 0/-1 to 'all substeps' and rejects
    non-divisors at construction (not at first trace)."""
    from nnx_ppo_tpu.physics.pallas_step import make_substep_runner

    model = make_quadruped()
    make_substep_runner(model, 60.0, 2e-3, 10, substeps_per_kernel=-1)
    make_substep_runner(model, 60.0, 2e-3, 10, substeps_per_kernel=5)
    with pytest.raises(ValueError, match="multiple"):
        make_substep_runner(model, 60.0, 2e-3, 10, substeps_per_kernel=4)
