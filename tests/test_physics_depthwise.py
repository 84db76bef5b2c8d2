"""The depth-wise batched engine must reproduce the generic engine's
``forward_dynamics`` (qacc AND per-geom normal forces) on the real
robot models across every supported feature combination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.physics.engine import forward_dynamics, mass_matrix_factor
from nnx_ppo_tpu.physics.engine_depthwise import (
    DepthPlan,
    forward_dynamics_dw,
)
from nnx_ppo_tpu.physics.models import make_humanoid, make_quadruped
from nnx_ppo_tpu.physics.models import humanoid as hu
from nnx_ppo_tpu.physics.models import quadruped as qd
from nnx_ppo_tpu.physics.randomize import DomainParams
from nnx_ppo_tpu.physics.terrain import rough_terrain


def _random_states(model, default_qpos, B, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    base = jnp.asarray(default_qpos(model))
    qpos = jnp.tile(base, (B, 1))
    qpos = qpos.at[:, 7:].add(0.2 * jax.random.normal(k1, (B, model.nj)))
    qpos = qpos.at[:, 2].add(0.05 * jax.random.normal(k3, (B,)))
    qvel = 0.5 * jax.random.normal(k2, (B, model.nv))
    tau = jnp.concatenate(
        [
            jnp.zeros((B, 6)),
            2.0 * jax.random.normal(jax.random.key(seed + 1), (B, model.nj)),
        ],
        axis=-1,
    )
    return qpos, qvel, tau


def _assert_matches(model, plan, qpos, qvel, tau, **kw):
    """Batched generic vs depthwise forward dynamics agreement."""
    dt = 0.002

    ref = jax.jit(
        jax.vmap(
            lambda qp, qv, t: forward_dynamics(model, qp, qv, t, dt=dt, **kw)
        )
    )(qpos, qvel, tau)
    got = jax.jit(
        jax.vmap(
            lambda qp, qv, t: forward_dynamics_dw(
                model, plan, qp, qv, t, dt=dt, **kw
            )
        )
    )(qpos, qvel, tau)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=2e-4, atol=2e-3
    )


@pytest.mark.parametrize(
    "make_model,default_qpos",
    [(make_quadruped, qd.default_qpos), (make_humanoid, hu.default_qpos)],
    ids=["quadruped", "humanoid"],
)
def test_matches_generic(make_model, default_qpos):
    model = make_model()
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, default_qpos, B=4)
    _assert_matches(model, plan, qpos, qvel, tau)


def test_matches_with_held_factor():
    model = make_quadruped()
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=4)
    dt = 0.002
    chol = jax.jit(
        jax.vmap(lambda q: mass_matrix_factor(model, q, dt=dt))
    )(qpos)

    ref = jax.jit(
        jax.vmap(
            lambda qp, qv, t, L: forward_dynamics(
                model, qp, qv, t, dt=dt, chol=L
            )
        )
    )(qpos, qvel, tau, chol)
    got = jax.jit(
        jax.vmap(
            lambda qp, qv, t, L: forward_dynamics_dw(
                model, plan, qp, qv, t, dt=dt, chol=L
            )
        )
    )(qpos, qvel, tau, chol)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-4, atol=2e-3
    )


def test_matches_with_terrain():
    model = make_quadruped()
    plan = DepthPlan.build(model)
    terrain = rough_terrain(amplitude=0.06, seed=3)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=4, seed=5)
    _assert_matches(model, plan, qpos, qvel, tau, terrain=terrain)


def test_matches_with_joint_limits():
    model = make_quadruped(joint_limits=True)
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=4, seed=7)
    _assert_matches(model, plan, qpos, qvel, tau)


def test_matches_with_domain_params():
    model = make_quadruped()
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=1, seed=9)
    params = DomainParams(
        mass_scale=jnp.float32(1.15),
        friction=jnp.float32(0.5),
        damping_scale=jnp.float32(0.8),
    )
    dt = 0.002
    ref = jax.jit(
        lambda: forward_dynamics(
            model, qpos[0], qvel[0], tau[0], dt=dt, params=params
        )
    )()
    got = jax.jit(
        lambda: forward_dynamics_dw(
            model, plan, qpos[0], qvel[0], tau[0], dt=dt, params=params
        )
    )()
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=2e-4, atol=2e-3
    )


def test_matches_with_per_body_mass_scale():
    """DR mass_scale as a per-body [NB] array (not just a scalar) —
    the depthwise path gathers it per level."""
    model = make_quadruped()
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=1, seed=29)
    scale = jnp.asarray(
        1.0 + 0.3 * jax.random.normal(jax.random.key(30), (model.n_bodies,))
    ).clip(0.5, 1.5)
    params = DomainParams(mass_scale=scale)
    dt = 0.002
    ref = jax.jit(
        lambda: forward_dynamics(
            model, qpos[0], qvel[0], tau[0], dt=dt, params=params
        )
    )()
    got = jax.jit(
        lambda: forward_dynamics_dw(
            model, plan, qpos[0], qvel[0], tau[0], dt=dt, params=params
        )
    )()
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-4, atol=2e-3
    )


def test_matches_with_external_force():
    model = make_quadruped()
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=1, seed=11)
    qp, qv, t = qpos[0], qvel[0], tau[0]
    push = [(0, qp[0:3], jnp.array([25.0, -10.0, 0.0]))]
    dt = 0.002
    ref = jax.jit(
        lambda: forward_dynamics(
            model, qp, qv, t, dt=dt, external_forces=push
        )
    )()
    got = jax.jit(
        lambda: forward_dynamics_dw(
            model, plan, qp, qv, t, dt=dt, external_forces=push
        )
    )()
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-4, atol=2e-3
    )


@pytest.mark.parametrize(
    "make_model,default_qpos",
    [(make_quadruped, qd.default_qpos), (make_humanoid, hu.default_qpos)],
    ids=["quadruped", "humanoid"],
)
def test_mass_matrix_gram_form_matches_crba(make_model, default_qpos):
    """Gram-form M (common-frame axes + ancestor mask) == generic CRBA,
    including with the robot far from the world origin (conditioning)."""
    from nnx_ppo_tpu.physics.engine import fwd_kinematics, mass_matrix
    from nnx_ppo_tpu.physics.engine_depthwise import mass_matrix_dw

    model = make_model()
    plan = DepthPlan.build(model)
    qpos, _, _ = _random_states(model, default_qpos, B=4, seed=13)
    qpos = qpos.at[:, 0:2].add(30.0)  # walked 40+ m from the origin

    ref = jax.jit(
        jax.vmap(lambda q: mass_matrix(model, fwd_kinematics(model, q)))
    )(qpos)
    got = jax.jit(jax.vmap(lambda q: mass_matrix_dw(model, plan, q)))(qpos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-3
    )


def test_mass_matrix_factor_dw_matches():
    """Factor path (with implicit damping + DR) matches the generic
    factor through an actual solve."""
    from nnx_ppo_tpu.ops.linalg import cholesky_backsub
    from nnx_ppo_tpu.physics.engine_depthwise import mass_matrix_factor_dw

    model = make_quadruped()
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=2, seed=17)
    params = DomainParams(
        mass_scale=jnp.float32(0.9), damping_scale=jnp.float32(1.2)
    )
    dt = 0.002
    ref = jax.jit(
        jax.vmap(
            lambda q, r: cholesky_backsub(
                mass_matrix_factor(model, q, dt=dt, params=params), r
            )
        )
    )(qpos, tau)
    got = jax.jit(
        jax.vmap(
            lambda q, r: cholesky_backsub(
                mass_matrix_factor_dw(
                    model, plan, q, dt=dt, params=params
                ),
                r,
            )
        )
    )(qpos, tau)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-3
    )


def test_held_inverse_matches_held_factor():
    """The explicit-inverse fast path solves the same system as the
    held Cholesky factor (one matvec vs two substitutions)."""
    from nnx_ppo_tpu.physics.engine_depthwise import (
        mass_matrix_factor_dw,
        mass_matrix_inverse_dw,
    )

    model = make_quadruped()
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=4, seed=19)
    dt = 0.002
    ref = jax.jit(
        jax.vmap(
            lambda qp, qv, t: forward_dynamics_dw(
                model, plan, qp, qv, t, dt=dt,
                chol=mass_matrix_factor_dw(model, plan, qp, dt=dt),
            )[0]
        )
    )(qpos, qvel, tau)
    got = jax.jit(
        jax.vmap(
            lambda qp, qv, t: forward_dynamics_dw(
                model, plan, qp, qv, t, dt=dt,
                minv=mass_matrix_inverse_dw(model, plan, qp, dt=dt),
            )[0]
        )
    )(qpos, qvel, tau)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-3
    )


def test_matches_with_collision_pairs_quadruped():
    """self_collision quadruped: plan builds, dynamics + normal layout
    (ground geoms first, pairs appended) match the generic engine."""
    model = make_quadruped(self_collision=True)
    plan = DepthPlan.build(model)
    qpos, qvel, tau = _random_states(model, qd.default_qpos, B=4, seed=21)
    _assert_matches(model, plan, qpos, qvel, tau)


def test_matches_with_active_collision_pair():
    """A synthetic free-base model with two arms whose spheres overlap
    at the default pose: the pair force is genuinely active, and the
    depthwise dynamics + pair normals match the generic engine."""
    from nnx_ppo_tpu.physics.model import FREE, HINGE, ModelBuilder

    b = ModelBuilder()
    b.add_body("base", joint=FREE, mass=2.0, inertia=(0.02, 0.02, 0.02))
    for side, sign in (("L", 1.0), ("R", -1.0)):
        b.add_body(
            f"{side}_arm",
            parent="base",
            joint=HINGE,
            axis=(1.0, 0.0, 0.0),
            pos=(0.0, sign * 0.05, 0.0),
            mass=0.4,
            com=(0.0, sign * 0.1, 0.0),
            inertia=(0.002, 0.002, 0.002),
            damping=0.5,
        )
    # Sphere centers at y = ±0.08 (joint 0.05 + offset 0.03): 0.16 m
    # apart with radius 0.1 each → 0.04 m penetration at q = 0.
    ga = b.add_sphere_geom("L_arm", (0.0, 0.03, 0.0), 0.1)
    gb = b.add_sphere_geom("R_arm", (0.0, -0.03, 0.0), 0.1)
    b.add_collision_pair(ga, gb)
    model = b.finalize(contact_stiffness=800.0, contact_damping=20.0)
    plan = DepthPlan.build(model)

    key = jax.random.key(23)
    B = 4
    qpos = jnp.tile(
        jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]), (B, 1)
    )
    qpos = qpos.at[:, 7:].add(0.1 * jax.random.normal(key, (B, 2)))
    qvel = 0.3 * jax.random.normal(jax.random.key(24), (B, model.nv))
    tau = jnp.zeros((B, model.nv))
    _assert_matches(model, plan, qpos, qvel, tau)
    _, normals = jax.jit(
        jax.vmap(
            lambda qp, qv, t: forward_dynamics_dw(
                model, plan, qp, qv, t, dt=0.002
            )
        )
    )(qpos, qvel, tau)
    assert float(jnp.min(normals[:, -1])) > 0.0  # pair genuinely active


def _random_hinge_tree(seed: int):
    """Random free-base all-hinge tree with random contact spheres and
    (when possible) a collision pair — stresses depth grouping, the
    parent-slot gathers, segment-sum fan-ins, and geom/normal
    permutations on topologies the shipped robots don't cover."""
    from nnx_ppo_tpu.physics.model import FREE, HINGE, ModelBuilder

    rng = np.random.RandomState(seed)
    n_bodies = rng.randint(4, 10)
    b = ModelBuilder(gravity=-9.81)
    names = []
    geoms = []
    for i in range(n_bodies):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        name = f"b{i}"
        b.add_body(
            name,
            parent=None if i == 0 else names[rng.randint(0, i)],
            joint=FREE if i == 0 else HINGE,
            axis=tuple(axis),
            pos=tuple(0.4 * rng.normal(size=3)),
            mass=float(rng.uniform(0.2, 2.0)),
            com=tuple(0.15 * rng.normal(size=3)),
            inertia=tuple(rng.uniform(0.01, 0.1, size=3)),
            damping=float(rng.uniform(0.0, 1.0)),
            armature=float(rng.uniform(0.0, 0.02)),
        )
        names.append(name)
        if rng.rand() < 0.7:
            geoms.append(
                b.add_sphere_geom(
                    name,
                    tuple(0.2 * rng.normal(size=3)),
                    float(rng.uniform(0.03, 0.12)),
                )
            )
    pair_bodies_differ = [
        (ga, gb)
        for gi, ga in enumerate(geoms)
        for gb in geoms[gi + 1 :]
        if b._geom_body[ga] != b._geom_body[gb]
    ]
    if pair_bodies_differ:
        ga, gb = pair_bodies_differ[rng.randint(len(pair_bodies_differ))]
        b.add_collision_pair(ga, gb)
    return b.finalize(contact_stiffness=2_000.0, contact_damping=50.0)


@pytest.mark.parametrize("seed", range(6))
def test_random_trees_match_generic(seed):
    from nnx_ppo_tpu.physics.engine import fwd_kinematics, mass_matrix
    from nnx_ppo_tpu.physics.engine_depthwise import mass_matrix_dw

    model = _random_hinge_tree(seed)
    plan = DepthPlan.build(model)
    rng = np.random.RandomState(100 + seed)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    qpos = jnp.asarray(
        np.concatenate(
            [
                0.3 * rng.normal(size=2),
                [0.2 + 0.3 * rng.rand()],  # near the ground: contacts
                quat,
                rng.uniform(-1.0, 1.0, size=model.nv - 6),
            ]
        ),
        jnp.float32,
    )
    qvel = jnp.asarray(rng.uniform(-1.0, 1.0, size=model.nv), jnp.float32)
    tau = jnp.asarray(rng.normal(size=model.nv), jnp.float32)

    ref = jax.jit(
        lambda: forward_dynamics(model, qpos, qvel, tau, dt=0.002)
    )()
    got = jax.jit(
        lambda: forward_dynamics_dw(model, plan, qpos, qvel, tau, dt=0.002)
    )()
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=5e-4, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=5e-4, atol=5e-3
    )
    M_ref = jax.jit(
        lambda: mass_matrix(model, fwd_kinematics(model, qpos))
    )()
    M_got = jax.jit(lambda: mass_matrix_dw(model, plan, qpos))()
    np.testing.assert_allclose(
        np.asarray(M_got), np.asarray(M_ref), rtol=5e-4, atol=5e-3
    )


def test_unsupported_models_are_rejected():
    from nnx_ppo_tpu.physics.models.arm import make_arm

    with pytest.raises(ValueError):
        DepthPlan.build(make_arm())  # fixed base / ball joint
