"""Articulated rigid-body dynamics: CRBA + RNEA + penalty contacts.

The TPU-native physics substrate standing in for MJX (the reference's
external env backend, SURVEY §2.6). One env instance is a pure function
of (static :class:`~nnx_ppo_tpu.physics.model.Model`, ``qpos``,
``qvel``); the framework vmaps it to thousands of envs like every other
env. Design for the hardware:

* All body loops are unrolled at trace time (NB ≈ 13 for a quadruped) —
  under ``vmap`` every 6×6/3×3 product becomes a ``[B, 6, 6]`` batched
  op that XLA fuses and tiles; there are no gathers, no dynamic shapes,
  no custom calls.
* The joint-space equation ``M(q) q̈ = τ − C(q, q̇) + Jᵀf_contact`` is
  solved with the unrolled small-SPD Cholesky from ``ops/linalg.py``
  (same kernel the n-link chain env uses — measured ~3× over the
  LAPACK-style custom call at these sizes).
* Contacts are sphere-vs-ground penalty/compliant forces (spring-damper
  normal + smooth-Coulomb friction) — no LCP, fully differentiable,
  branch-free (`where` masks).

Algorithms follow Featherstone, *Rigid Body Dynamics Algorithms*:
RNEA (ch. 5) for bias forces with the gravity-as-base-acceleration
trick, CRBA (ch. 6) for the joint-space inertia matrix.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nnx_ppo_tpu.ops.linalg import (
    cholesky_backsub,
    cholesky_factor_blocked,
    cholesky_solve_small,
)
from nnx_ppo_tpu.physics.model import BALL, FREE, HINGE, SLIDE, Model
from nnx_ppo_tpu.physics.spatial import (
    crf,
    crm,
    motion_transform,
    quat_integrate,
    quat_to_rot,
    skew,
    spatial_inertia,
)


class Kinematics(NamedTuple):
    """Per-body frame data (tuples of per-body arrays, trace-time lists)."""

    X_up: tuple  # [6,6] motion transform parent→body, per body
    E: tuple  # [3,3] world_R_body, per body
    p: tuple  # [3] body origin in world, per body
    S: tuple  # [6, nd] joint motion subspace, per body


def _axis_rotation(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Active rotation by ``angle`` about unit ``axis`` (Rodrigues)."""
    K = skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def fwd_kinematics(model: Model, qpos: jax.Array):
    # (returns Kinematics; annotation omitted — the suite's typeguard
    # hook cannot evaluate local-NamedTuple forward refs on py3.12)
    X_up, E, p, S = [], [], [], []
    qslices = model.qpos_slices()
    for i, jtype in enumerate(model.joint_type):
        parent = model.parent[i]
        jpos = jnp.asarray(model.joint_pos[i], jnp.float32)
        qs, nqi = qslices[i]
        q_i = qpos[qs : qs + nqi]  # static slice: this joint's qpos
        if parent < 0:
            E_par, p_par = jnp.eye(3), jnp.zeros(3)
        else:
            E_par, p_par = E[parent], p[parent]
        if jtype == FREE:
            Ei = quat_to_rot(q_i[3:7])
            pi = q_i[0:3]
            # Transform from world coords into the base body frame.
            Xi = motion_transform(Ei.T, pi)
            Si = jnp.eye(6)
        elif jtype == HINGE:
            axis = jnp.asarray(model.joint_axis[i], jnp.float32)
            R_j = _axis_rotation(axis, q_i[0])  # parent_R_child
            Ei = E_par @ R_j
            pi = p_par + E_par @ jpos
            Xi = motion_transform(R_j.T, jpos)
            Si = jnp.concatenate([axis, jnp.zeros(3)])[:, None]
        elif jtype == SLIDE:
            axis = jnp.asarray(model.joint_axis[i], jnp.float32)
            trans = jpos + axis * q_i[0]  # origin slides along the axis
            Ei = E_par
            pi = p_par + E_par @ trans
            Xi = motion_transform(jnp.eye(3), trans)
            Si = jnp.concatenate([jnp.zeros(3), axis])[:, None]
        elif jtype == BALL:
            R_j = quat_to_rot(q_i)  # parent_R_child (active quaternion)
            Ei = E_par @ R_j
            pi = p_par + E_par @ jpos
            Xi = motion_transform(R_j.T, jpos)
            # 3 rotational dofs: ω expressed in the child frame.
            Si = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 3))], axis=0)
        else:  # pragma: no cover - builder validates joint types
            raise ValueError(f"unknown joint type {jtype!r}")
        X_up.append(Xi)
        E.append(Ei)
        p.append(pi)
        S.append(Si)
    return Kinematics(tuple(X_up), tuple(E), tuple(p), tuple(S))


def _body_inertias(model: Model, params=None) -> list[jax.Array]:
    """Per-body [6,6] spatial inertias; ``params``
    (:class:`~nnx_ppo_tpu.physics.randomize.DomainParams`) optionally
    scales them (density scale — mass and rotational inertia together,
    so the COM and the inertia SHAPE stay physical)."""
    out = []
    for i in range(model.n_bodies):
        I = spatial_inertia(
            jnp.float32(model.mass[i]),
            jnp.asarray(model.com[i], jnp.float32),
            jnp.asarray(model.inertia[i], jnp.float32),
        )
        if params is not None:
            s = params.body_scale(i)
            if s is not None:
                I = I * s
        out.append(I)
    return out


def body_velocities(model: Model, kin, qvel: jax.Array) -> list:
    """Spatial velocity of every body in its own frame."""
    v = []
    for i, (start, nd) in enumerate(model.dof_slices()):
        vj = kin.S[i] @ qvel[start : start + nd]
        parent = model.parent[i]
        v.append(vj if parent < 0 else kin.X_up[i] @ v[parent] + vj)
    return v


def bias_forces(
    model: Model, kin, qvel: jax.Array, v: list, params=None
) -> jax.Array:
    """RNEA with q̈=0: Coriolis + centrifugal + gravity + joint damping.

    ``params``: optional per-env
    :class:`~nnx_ppo_tpu.physics.randomize.DomainParams` (inertia /
    damping scales)."""
    NB = model.n_bodies
    I = _body_inertias(model, params)
    # Gravity trick: give the world an upward pseudo-acceleration.
    a_world = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, -model.gravity], jnp.float32)
    a, f = [], []
    for i, (start, nd) in enumerate(model.dof_slices()):
        vj = kin.S[i] @ qvel[start : start + nd]
        a_par = a_world if model.parent[i] < 0 else a[model.parent[i]]
        ai = kin.X_up[i] @ a_par + crm(v[i]) @ vj
        a.append(ai)
        f.append(I[i] @ ai + crf(v[i]) @ (I[i] @ v[i]))
    per_body = [None] * NB
    for i in reversed(range(NB)):
        per_body[i] = kin.S[i].T @ f[i]
        parent = model.parent[i]
        if parent >= 0:
            f[parent] = f[parent] + kin.X_up[i].T @ f[i]
    # dof_slices are contiguous in body order → one concat, no
    # dynamic-update-slices.
    C = jnp.concatenate(per_body)
    return C + _scaled_damping(model, params) * qvel


def mass_matrix(model: Model, kin, params=None) -> jax.Array:
    """CRBA joint-space inertia + armature diagonal. ``params``
    optionally scales the body inertias (armature — rotor inertia, a
    motor property — is deliberately NOT mass-scaled; randomize
    ``gain_scale`` for motor variation instead)."""
    NB = model.n_bodies
    slices = model.dof_slices()
    Ic = list(_body_inertias(model, params))
    for i in reversed(range(NB)):
        parent = model.parent[i]
        if parent >= 0:
            Ic[parent] = Ic[parent] + kin.X_up[i].T @ Ic[i] @ kin.X_up[i]
    M = jnp.zeros((model.nv, model.nv))
    for i in range(NB):
        si, ni = slices[i]
        F = Ic[i] @ kin.S[i]  # [6, ni]
        M = M.at[si : si + ni, si : si + ni].set(kin.S[i].T @ F)
        j = i
        while model.parent[j] >= 0:
            F = kin.X_up[j].T @ F
            j = model.parent[j]
            sj, nj_ = slices[j]
            block = kin.S[j].T @ F  # [nj_, ni]
            M = M.at[sj : sj + nj_, si : si + ni].set(block)
            M = M.at[si : si + ni, sj : sj + nj_].set(block.T)
    return M + jnp.diag(jnp.asarray(model.armature, jnp.float32))


def contact_generalized_forces(
    model: Model, kin, v: list, terrain=None, params=None
) -> tuple[jax.Array, jax.Array]:
    """Penalty contacts → (generalized force [nv], per-contact normal
    force [NG + NP] for metrics/termination: the NG ground contacts
    first, then the model's sphere-sphere pairs in declaration order).

    ``terrain``: optional :class:`~nnx_ppo_tpu.physics.terrain.Terrain`
    heightfield. ``None`` (default) keeps the exact flat-plane ground
    path (z = 0, normal = +z); with a terrain, penetration, normal, and
    friction plane come from the analytic surface at each geom's
    center (first-order surface approximation — exact for inclined
    planes, accurate while terrain wavelength ≫ sphere radius).

    Contact spatial forces are first accumulated per body, then mapped
    to generalized coordinates with ONE backward chain pass (the same
    ``Xᵀ`` propagation RNEA uses) — instead of walking the chain once
    per geom."""
    f_ext: list = [None] * model.n_bodies
    normals = []
    centers = geom_world_centers(model, kin)
    # Friction coefficient: per-env override (DomainParams) or the
    # static Model constant — a traced scalar either way below.
    friction = model.friction
    if params is not None and params.friction is not None:
        friction = params.friction

    def point_velocity(b: int, r_local: jax.Array) -> jax.Array:
        return body_point_velocity(kin, v, b, r_local)

    def apply_force(b: int, r_local: jax.Array, f_w: jax.Array) -> None:
        """Accumulate a world-frame point force as a spatial force at
        the body origin in body coords — propagated up the chain and
        projected on each joint subspace by the backward pass below (the
        same pass RNEA uses; no explicit Jacobian needed)."""
        f_b = kin.E[b].T @ f_w
        f_sp = jnp.concatenate([jnp.cross(r_local, f_b), f_b])
        f_ext[b] = f_sp if f_ext[b] is None else f_ext[b] + f_sp

    for g, b in enumerate(model.geom_body):
        offset = jnp.asarray(model.geom_offset[g], jnp.float32)
        radius = jnp.float32(model.geom_radius[g])
        E_b = kin.E[b]
        if terrain is None:
            # Flat-plane fast path: normal is the constant +z, so the
            # normal/tangential split is a static index pick.
            phi = radius - centers[g][2]  # penetration (>0 in contact)
            # Velocity of (and lever arm to) the CONTACT POINT — the
            # sphere's lowest point, one radius below the center in
            # world-z — not the center: a sphere rolling without
            # slipping then has zero tangential velocity (no spurious
            # kinetic friction), and the friction force exerts its
            # radius-length torque about the body.
            contact_offset = offset + E_b.T @ jnp.array(
                [0.0, 0.0, -1.0], jnp.float32
            ) * radius
            v_pt = point_velocity(b, contact_offset)
            active = phi > 0.0
            fn = jnp.where(
                active,
                jnp.maximum(
                    0.0,
                    model.contact_stiffness * phi
                    - model.contact_damping * v_pt[2],
                ),
                0.0,
            )
            if np.isfinite(model.max_contact_force):
                fn = jnp.minimum(fn, model.max_contact_force)
            vt = v_pt[:2]
            vt_norm = jnp.sqrt(jnp.sum(vt**2) + 1e-6)
            ft = -friction * fn * vt / jnp.maximum(
                vt_norm, model.friction_vel
            )
            f_w = jnp.concatenate([ft, fn[None]])
        else:
            # Heightfield: surface normal n from the analytic gradient
            # at the center's xy; gap along n ≈ vertical gap · n_z
            # (exact on planes). Contact point one radius down the
            # normal — same rolling-contact reasoning as above.
            c = centers[g]
            n = terrain.normal(c[:2])
            phi = radius - (c[2] - terrain.height(c[:2])) * n[2]
            contact_offset = offset + E_b.T @ (-n * radius)
            v_pt = point_velocity(b, contact_offset)
            vn = jnp.dot(n, v_pt)
            fn = jnp.where(
                phi > 0.0,
                jnp.maximum(
                    0.0,
                    model.contact_stiffness * phi
                    - model.contact_damping * vn,
                ),
                0.0,
            )
            if np.isfinite(model.max_contact_force):
                fn = jnp.minimum(fn, model.max_contact_force)
            vt = v_pt - vn * n
            vt_norm = jnp.sqrt(jnp.sum(vt**2) + 1e-6)
            ft = -friction * fn * vt / jnp.maximum(
                vt_norm, model.friction_vel
            )
            f_w = fn * n + ft
        normals.append(fn)
        apply_force(b, contact_offset, f_w)

    # Sphere-sphere pairs (explicit static list — self-collision). Same
    # spring-damper normal + smooth-Coulomb friction model as the ground
    # contacts, applied equal-and-opposite at the midpoint of the
    # penetration axis, so pair forces are internal: they conserve the
    # system's total momentum.
    for ga, gb in zip(model.pair_geom_a, model.pair_geom_b):
        ba, bb = model.geom_body[ga], model.geom_body[gb]
        f_w, c_w, fn = sphere_pair_force(
            centers[ga],
            centers[gb],
            jnp.float32(model.geom_radius[ga]),
            jnp.float32(model.geom_radius[gb]),
            stiffness=model.contact_stiffness,
            damping=model.contact_damping,
            friction=friction,
            friction_vel=model.friction_vel,
            max_force=model.max_contact_force,
            va_fn=lambda c, b=ba: point_velocity(b, kin.E[b].T @ (c - kin.p[b])),
            vb_fn=lambda c, b=bb: point_velocity(b, kin.E[b].T @ (c - kin.p[b])),
        )
        normals.append(fn)
        apply_force(bb, kin.E[bb].T @ (c_w - kin.p[bb]), f_w)
        apply_force(ba, kin.E[ba].T @ (c_w - kin.p[ba]), -f_w)

    tau = project_spatial_forces(model, kin, f_ext)
    if normals:
        return tau, jnp.stack(normals)
    return tau, jnp.zeros((0,))


def geom_world_centers(model: Model, kin) -> list:
    """World-frame centers of every contact sphere."""
    return [
        kin.p[b] + kin.E[b] @ jnp.asarray(model.geom_offset[g], jnp.float32)
        for g, b in enumerate(model.geom_body)
    ]


def body_point_velocity(kin, v: list, b: int, r_local: jax.Array) -> jax.Array:
    """World velocity of body ``b``'s material point at body-frame
    offset ``r_local``."""
    w, vl = v[b][:3], v[b][3:]
    return kin.E[b] @ (vl + jnp.cross(w, r_local))


def sphere_pair_force(
    xa: jax.Array,
    xb: jax.Array,
    ra,
    rb,
    *,
    stiffness: float,
    damping: float,
    friction: float,
    va_fn,
    vb_fn,
    friction_vel: float = 0.1,
    max_force: float = float("inf"),
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Penalty force between two spheres at world centers ``xa``/``xb``.

    ``va_fn``/``vb_fn`` map a world contact point to that body's material
    velocity there. Returns ``(f_world on b, contact point, fn)``; body a
    gets ``-f_world`` (equal-and-opposite at the same point, so the pair
    is momentum-conserving). Shared by intra-tree self-collision pairs
    and the cross-tree pairs of ``physics/scene.py``.
    """
    d = xb - xa
    dist = jnp.sqrt(jnp.sum(d**2) + 1e-12)
    n = d / dist  # contact normal, a → b
    phi = ra + rb - dist
    c_w = xa + n * (ra - 0.5 * phi)  # contact point, world
    v_rel = vb_fn(c_w) - va_fn(c_w)
    sep = jnp.dot(n, v_rel)  # separation rate (= -φ̇)
    fn = jnp.where(
        phi > 0.0,
        jnp.maximum(0.0, stiffness * phi - damping * sep),
        0.0,
    )
    if np.isfinite(max_force):
        fn = jnp.minimum(fn, max_force)
    vt = v_rel - sep * n
    vt_norm = jnp.sqrt(jnp.sum(vt**2) + 1e-6)
    ft = -friction * fn * vt / jnp.maximum(vt_norm, friction_vel)
    return fn * n + ft, c_w, fn


def project_spatial_forces(model: Model, kin, f_ext: list) -> jax.Array:
    """Map per-body spatial forces (body frame, at the body origin;
    ``None`` = no force) to generalized coordinates with one backward
    pass over the topologically-ordered tree — the same ``Xᵀ``
    propagation RNEA uses; no explicit Jacobian. MUTATES ``f_ext``."""
    per_body = []
    for i in reversed(range(model.n_bodies)):
        fi = f_ext[i]
        if fi is None:
            per_body.append(jnp.zeros(model.dof_slices()[i][1]))
            continue
        per_body.append(kin.S[i].T @ fi)
        parent = model.parent[i]
        if parent >= 0:
            up = kin.X_up[i].T @ fi
            f_ext[parent] = up if f_ext[parent] is None else f_ext[parent] + up
    return jnp.concatenate(per_body[::-1])


def project_world_point_forces(
    model: Model, kin, forces: list
) -> jax.Array:
    """Generalized torques from world-frame point forces: ``forces`` is
    a list of ``(body_index, point_world, f_world)``. Used by the scene
    layer to apply cross-tree contact forces to a tree."""
    f_ext: list = [None] * model.n_bodies
    for b, point_w, f_w in forces:
        r_local = kin.E[b].T @ (point_w - kin.p[b])
        f_b = kin.E[b].T @ f_w
        f_sp = jnp.concatenate([jnp.cross(r_local, f_b), f_b])
        f_ext[b] = f_sp if f_ext[b] is None else f_ext[b] + f_sp
    return project_spatial_forces(model, kin, f_ext)


def limit_torques(
    model: Model, qpos: jax.Array, qvel: jax.Array
) -> Optional[jax.Array]:
    """Joint-range penalty torques ``[nv]`` (spring-damper on the
    violation, damping active only while violating), or ``None`` when no
    dof is limited — models without limits pay zero ops.

    Limits apply to 1-dof (hinge/slide) joints. The per-dof qpos values
    are fetched with ONE static gather (qpos and qvel layouts diverge
    once quaternion joints exist); ±inf bounds fold to zero force, so
    the whole term is a handful of fused elementwise ops.
    """
    lower, upper = model.joint_lower, model.joint_upper
    if lower.size == 0 or not (
        np.isfinite(lower).any() or np.isfinite(upper).any()
    ):
        return None
    qpos_idx = np.zeros(model.nv, np.int32)
    limited = np.zeros(model.nv, np.float32)
    qslices, vslices = model.qpos_slices(), model.dof_slices()
    for i, jtype in enumerate(model.joint_type):
        (qs, _), (vs, _) = qslices[i], vslices[i]
        if jtype in (HINGE, SLIDE):
            qpos_idx[vs] = qs
            limited[vs] = float(
                np.isfinite(lower[vs]) or np.isfinite(upper[vs])
            )
    q = qpos[jnp.asarray(qpos_idx)]
    lo = jnp.asarray(lower, jnp.float32)
    hi = jnp.asarray(upper, jnp.float32)
    below = jnp.maximum(lo - q, 0.0)  # -inf bound → 0
    above = jnp.maximum(q - hi, 0.0)  # +inf bound → 0
    violating = ((below + above) > 0.0).astype(jnp.float32)
    tau = (
        model.limit_stiffness * (below - above)
        - model.limit_damping * violating * qvel
    )
    return tau * jnp.asarray(limited)


def spring_torques(
    model: Model, qpos: jax.Array
) -> Optional[jax.Array]:
    """Passive joint-spring torques ``−k·(q − ref)`` [nv] on 1-dof
    joints (MuJoCo ``jnt_stiffness``/``springref``; explicit — MuJoCo's
    Euler integrator also treats springs explicitly), or ``None`` when
    no dof has a spring — springless models pay zero ops. Same static
    qpos gather as :func:`limit_torques`."""
    k = model.spring_stiffness
    if k.size == 0 or not (k > 0).any():
        return None
    qpos_idx = np.zeros(model.nv, np.int32)
    one_dof = np.zeros(model.nv, np.float32)
    qslices, vslices = model.qpos_slices(), model.dof_slices()
    for i, jtype in enumerate(model.joint_type):
        (qs, _), (vs, _) = qslices[i], vslices[i]
        if jtype in (HINGE, SLIDE):
            qpos_idx[vs] = qs
            one_dof[vs] = 1.0
    q = qpos[jnp.asarray(qpos_idx)]
    return -jnp.asarray(k * one_dof, jnp.float32) * (
        q - jnp.asarray(model.spring_ref, jnp.float32)
    )


def mass_matrix_factor(
    model: Model, qpos: jax.Array, *, dt: float, params=None
) -> jax.Array:
    """Lower-Cholesky factor of ``M(q) + dt·D`` — for callers that hold
    the factor across several substeps (see ``forward_dynamics``
    ``chol=``). ``dt`` is required (keyword-only): the implicit
    joint-damping term is baked into the factor, so it MUST match the
    integration step the factor will be used with — pass ``dt=0.0``
    explicitly for undamped continuous dynamics. ``params``: optional
    per-env :class:`~nnx_ppo_tpu.physics.randomize.DomainParams` — must
    match the params later passed to ``forward_dynamics``."""
    kin = fwd_kinematics(model, qpos)
    M = mass_matrix(model, kin, params)
    if dt:
        M = M + dt * jnp.diag(_scaled_damping(model, params))
    return cholesky_factor_blocked(M)


def _scaled_damping(model: Model, params=None) -> jax.Array:
    damping = jnp.asarray(model.damping, jnp.float32)
    if params is not None and params.damping_scale is not None:
        damping = damping * params.damping_scale
    return damping


def forward_dynamics(
    model: Model,
    qpos: jax.Array,
    qvel: jax.Array,
    tau_applied: jax.Array,
    dt: float = 0.0,
    chol: Optional[jax.Array] = None,
    external_forces: Optional[list] = None,
    terrain=None,
    params=None,
) -> tuple[jax.Array, jax.Array]:
    """``(M + dt·D) q̈ = τ_applied + τ_contact − C`` (D = joint damping);
    also returns per-contact normal forces (ground geoms, then pairs).

    ``params``: optional per-env
    :class:`~nnx_ppo_tpu.physics.randomize.DomainParams` overrides
    (mass/damping scale, friction). ``None`` compiles to exactly the
    un-randomized program.

    ``terrain``: optional heightfield ground
    (:mod:`nnx_ppo_tpu.physics.terrain`); ``None`` = flat z=0 plane.

    Passing the integration ``dt`` makes the viscous joint-damping term
    implicit (damping force evaluated at the *new* velocity — MuJoCo's
    ``implicitfast`` discretization): stiff PD derivative gains can then
    be expressed as model damping and stay unconditionally stable
    instead of limiting the step size. ``dt=0`` is the plain continuous
    dynamics (used by analytic-exactness tests).

    ``external_forces``: optional world-frame point forces
    ``[(body_index, point_world, f_world)]`` applied on top of the
    tree's own contacts — the scene layer passes cross-tree contact
    forces here (``physics/scene.py``).

    ``chol``: optionally a precomputed :func:`mass_matrix_factor`. The
    CRBA build + factorization dominate the substep cost; holding the
    factor across a control step's substeps (joint angles move <0.05 rad
    in 20 ms, so M barely changes) trades a small integration
    approximation for skipping both — the ``reuse_mass_matrix`` option
    of the legged envs. The factor must have been built with the SAME
    ``dt`` (the implicit damping term is baked into it); when ``chol``
    is given, the ``dt`` argument here is not consulted."""
    kin = fwd_kinematics(model, qpos)
    v = body_velocities(model, kin, qvel)
    C = bias_forces(model, kin, qvel, v, params)
    tau_c, normals = contact_generalized_forces(model, kin, v, terrain, params)
    rhs = tau_applied + tau_c - C
    tau_l = limit_torques(model, qpos, qvel)
    if tau_l is not None:
        rhs = rhs + tau_l
    tau_s = spring_torques(model, qpos)
    if tau_s is not None:
        rhs = rhs + tau_s
    if external_forces:
        # World-frame point forces [(body, point_world, f_world)] from
        # outside this tree (the scene layer's cross-tree contacts).
        rhs = rhs + project_world_point_forces(model, kin, external_forces)
    if chol is not None:
        return cholesky_backsub(chol, rhs), normals
    M = mass_matrix(model, kin, params)
    if dt:
        M = M + dt * jnp.diag(_scaled_damping(model, params))
    qacc = cholesky_solve_small(M, rhs)
    return qacc, normals


def integrate(
    model: Model, qpos: jax.Array, qvel: jax.Array, qacc: jax.Array, dt: float
) -> tuple[jax.Array, jax.Array]:
    """Semi-implicit Euler: velocity first, then configuration
    (free-base / ball-joint orientations via the quaternion exponential
    map). Contiguous hinge/slide spans integrate as ONE vector op —
    all-hinge models lower to the same fused program as before ball
    joints existed."""
    qvel_new = qvel + dt * qacc
    quaternion_joints = any(t in (FREE, BALL) for t in model.joint_type)
    if not quaternion_joints:
        return qpos + dt * qvel_new, qvel_new

    segments = []
    qslices, vslices = model.qpos_slices(), model.dof_slices()
    linear_start: Optional[int] = None  # open hinge/slide run (qpos idx)
    linear_vstart = 0

    def flush(end_q, end_v):
        if linear_start is not None:
            segments.append(
                qpos[linear_start:end_q]
                + dt * qvel_new[linear_vstart:end_v]
            )

    for i, jtype in enumerate(model.joint_type):
        (qs, nqi), (vs, nvi) = qslices[i], vslices[i]
        if jtype in (HINGE, SLIDE):
            if linear_start is None:
                linear_start, linear_vstart = qs, vs
            continue
        flush(qs, vs)
        linear_start = None
        q_i, v_i = qpos[qs : qs + nqi], qvel_new[vs : vs + nvi]
        if jtype == FREE:
            E = quat_to_rot(q_i[3:7])
            segments.append(q_i[0:3] + dt * (E @ v_i[3:6]))
            segments.append(quat_integrate(q_i[3:7], v_i[0:3], dt))
        else:  # BALL: child-frame relative ω, same convention as FREE
            segments.append(quat_integrate(q_i, v_i, dt))
    flush(model.nq, model.nv)
    return jnp.concatenate(segments), qvel_new


def step(
    model: Model,
    qpos: jax.Array,
    qvel: jax.Array,
    tau_applied: jax.Array,
    dt: float,
    n_substeps: int = 1,
    terrain=None,
    params=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Advance ``n_substeps`` physics steps of ``dt`` under constant
    applied torque. Returns (qpos, qvel, last normal forces).
    ``params``: optional per-env domain-randomization overrides."""

    def substep(carry, _):
        qp, qv = carry
        qacc, normals = forward_dynamics(
            model, qp, qv, tau_applied, dt=dt, terrain=terrain,
            params=params,
        )
        qp, qv = integrate(model, qp, qv, qacc, dt)
        return (qp, qv), normals

    (qpos, qvel), normals = jax.lax.scan(
        substep, (qpos, qvel), None, length=n_substeps
    )
    return qpos, qvel, normals[-1]
