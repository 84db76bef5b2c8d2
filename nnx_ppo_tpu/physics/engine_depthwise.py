"""Depth-wise batched dynamics: bodies at equal tree depth in one op.

The generic engine (``engine.py``) unrolls its body loops body-by-body:
a quadruped's 12 leg bodies become 12 *sequential* chains of small
``[B, 3, 3]`` ops per pipeline stage, even though the four legs are
structurally independent. On TPU the substep is dispatch/fusion-bound
(hundreds of tiny kernels), so the sequential chain length — not the
FLOPs — sets the wall clock.

This module exploits the tree's width instead: bodies are grouped by
DEPTH (distance from the root), and every per-body quantity of one
level is stacked on a leading ``K`` axis. Each pipeline stage then runs
``depth`` batched ``[K, …]`` ops instead of ``n_bodies`` sequential
ones — for the quadruped (trunk + 4×3 legs) the kinematics/velocity/
RNEA chains shrink 13 → 4 levels with K = 4-wide ops, and under the
env ``vmap`` each op is ``[B, K, …]``: fewer, larger, better-fusing
kernels with identical math.

Depth is well-defined per body (depth(child) = depth(parent) + 1), and
a parent always sits exactly one level up, so inter-level data flow is
a static gather (``parent_slot``) downward and a ``segment_sum`` upward
— no dynamic shapes, no scatters with traced indices.

Scope (:func:`DepthPlan.build` raises ``ValueError`` otherwise, and
callers fall back to the generic engine): free-base models whose other
joints are all hinges — exactly the legged-robot family. Terrain,
joint limits, sphere-sphere collision pairs, domain randomization, and
external point forces are supported (the static pair list stays
per-pair, like the generic engine — a handful of fused chains on top
of the depth-batched stages). The fast path
is :func:`forward_dynamics_dw` with a held Cholesky factor (the
``reuse_mass_matrix`` mode of the legged envs); without ``chol`` the
mass matrix itself still comes from the generic CRBA (it is amortized
once per control step in the fast configs).

Exactness vs the generic engine: ``tests/test_physics_depthwise.py``
(same-state ``qacc``/normals agreement on the quadruped and humanoid,
with terrain / limits / DR / pushes).

Reference context: the reference's contact-rich workloads run on MJX
(external; ``/root/reference/nnx_ppo/algorithms/ppo_test.py:26-28``);
this is a TPU-native optimization of the in-repo substrate that stands
in for it.
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
    spd_inverse_from_factor,
)
from nnx_ppo_tpu.physics import engine as _engine
from nnx_ppo_tpu.physics.model import FREE, HINGE, Model
from nnx_ppo_tpu.physics.spatial import quat_to_rot


class Level(NamedTuple):
    """One tree depth: all per-body constants stacked on axis 0 (numpy,
    trace-time static)."""

    bodies: np.ndarray  # [K] body indices (model order)
    parent_slot: np.ndarray  # [K] index into the previous level's arrays
    axis: np.ndarray  # [K, 3] hinge axes (child frame)
    jpos: np.ndarray  # [K, 3] joint anchors (parent frame)
    dof_idx: np.ndarray  # [K] this body's dof position in qvel
    qpos_idx: np.ndarray  # [K] this body's angle position in qpos
    inertia: np.ndarray  # [K, 6, 6] spatial inertias about body origins


class GeomGroup(NamedTuple):
    """Contact spheres owned by bodies of one level, batched."""

    level: int
    slot: np.ndarray  # [G] owning body's index within the level
    offset: np.ndarray  # [G, 3] sphere centers (body frame)
    radius: np.ndarray  # [G]
    orig: np.ndarray  # [G] original geom indices (for the normals order)


class DepthPlan(NamedTuple):
    """Static depth decomposition of a :class:`Model`."""

    levels: tuple  # tuple[Level, ...]; levels[0] is the free root
    geom_groups: tuple  # tuple[GeomGroup, ...]
    root_inertia: np.ndarray  # [6, 6]
    dof_perm: np.ndarray  # joint-dof gather: C[6 + i] = concat(levels)[dof_perm[i]]
    normal_perm: np.ndarray  # normals reorder: out[i] = computed[normal_perm[i]]
    ancestor_mask: np.ndarray  # [NB, nv] 1.0 iff dof moves body (CRBA Gram form)
    mass: np.ndarray  # [NB] body masses (world-frame inertia rebuild)
    com: np.ndarray  # [NB, 3] body-frame COM offsets
    inertia_com: np.ndarray  # [NB, 3, 3] rotational inertias about the COM
    body_level: np.ndarray  # [NB] level index per body
    body_slot: np.ndarray  # [NB] slot within its level per body

    @staticmethod
    def build(model: Model):
        # (returns DepthPlan; annotation omitted — the suite's typeguard
        # hook cannot re-check nested NamedTuples)
        """Group bodies by depth. Raises ``ValueError`` for models
        outside the supported family (callers fall back to
        ``engine.forward_dynamics``)."""
        if not model.free_base:
            raise ValueError("depthwise engine requires a free-base model")
        if any(t != HINGE for t in model.joint_type[1:]):
            raise ValueError("depthwise engine supports hinge joints only")
        depth = [0] * model.n_bodies
        for i in range(1, model.n_bodies):
            depth[i] = depth[model.parent[i]] + 1
        n_levels = max(depth) + 1
        by_depth = [
            [i for i in range(model.n_bodies) if depth[i] == d]
            for d in range(n_levels)
        ]
        vslices = model.dof_slices()
        qslices = model.qpos_slices()
        inertias = [
            np.asarray(
                _np_spatial_inertia(
                    model.mass[i], model.com[i], model.inertia[i]
                ),
                np.float32,
            )
            for i in range(model.n_bodies)
        ]
        levels = []
        slot_of: dict[int, int] = {0: 0}
        root = Level(
            bodies=np.array([0]),
            parent_slot=np.array([-1]),
            axis=np.zeros((1, 3), np.float32),
            jpos=np.zeros((1, 3), np.float32),
            dof_idx=np.array([0]),
            qpos_idx=np.array([0]),
            inertia=inertias[0][None],
        )
        levels.append(root)
        for d in range(1, n_levels):
            bodies = by_depth[d]
            for b in bodies:
                slot_of[b] = bodies.index(b)
            levels.append(
                Level(
                    bodies=np.asarray(bodies),
                    parent_slot=np.asarray(
                        [slot_of[model.parent[b]] for b in bodies]
                    ),
                    axis=np.asarray(
                        [model.joint_axis[b] for b in bodies], np.float32
                    ),
                    jpos=np.asarray(
                        [model.joint_pos[b] for b in bodies], np.float32
                    ),
                    dof_idx=np.asarray([vslices[b][0] for b in bodies]),
                    qpos_idx=np.asarray([qslices[b][0] for b in bodies]),
                    inertia=np.stack([inertias[b] for b in bodies]),
                )
            )
        # Joint-dof assembly permutation: level-concat order → dof order.
        concat_dofs = np.concatenate(
            [lvl.dof_idx for lvl in levels[1:]]
        ) if n_levels > 1 else np.zeros(0, np.int64)
        dof_perm = np.argsort(concat_dofs)
        # Geoms grouped by owning level.
        groups = []
        order = []
        for d in range(n_levels):
            sel = [
                g
                for g, b in enumerate(model.geom_body)
                if depth[b] == d
            ]
            if not sel:
                continue
            groups.append(
                GeomGroup(
                    level=d,
                    slot=np.asarray(
                        [slot_of[model.geom_body[g]] for g in sel]
                    ),
                    offset=np.asarray(
                        [model.geom_offset[g] for g in sel], np.float32
                    ),
                    radius=np.asarray(
                        [model.geom_radius[g] for g in sel], np.float32
                    ),
                    orig=np.asarray(sel),
                )
            )
            order.extend(sel)
        normal_perm = (
            np.argsort(np.asarray(order))
            if order
            else np.zeros(0, np.int64)
        )
        # Ancestor mask for the Gram-form CRBA: dof d moves body b iff
        # d's joint is on b's root path (self included).
        anc = np.zeros((model.n_bodies, model.nv), np.float32)
        for b in range(model.n_bodies):
            j = b
            while j >= 0:
                s, n = vslices[j]
                anc[b, s : s + n] = 1.0
                j = model.parent[j]
        body_level = np.zeros(model.n_bodies, np.int64)
        body_slot = np.zeros(model.n_bodies, np.int64)
        for d, bodies in enumerate(by_depth):
            for s, b in enumerate(bodies):
                body_level[b] = d
                body_slot[b] = s
        return DepthPlan(
            levels=tuple(levels),
            geom_groups=tuple(groups),
            root_inertia=inertias[0],
            dof_perm=dof_perm,
            normal_perm=normal_perm,
            ancestor_mask=anc,
            mass=np.asarray(model.mass, np.float32),
            com=np.asarray(model.com, np.float32),
            inertia_com=np.asarray(model.inertia, np.float32),
            body_level=body_level,
            body_slot=body_slot,
        )

    @property
    def slot_map(self) -> dict:
        """body index → (level index, slot) for external-force routing."""
        out = {}
        for li, lvl in enumerate(self.levels):
            for s, b in enumerate(lvl.bodies):
                out[int(b)] = (li, s)
        return out


def _np_spatial_inertia(mass, com, inertia_com):
    cx = np.array(
        [
            [0.0, -com[2], com[1]],
            [com[2], 0.0, -com[0]],
            [-com[1], com[0], 0.0],
        ]
    )
    return np.block(
        [
            [inertia_com + mass * cx @ cx.T, mass * cx],
            [mass * cx.T, mass * np.eye(3)],
        ]
    )


# ----------------------------------------------------------------------
# Batched ([K, …]) spatial helpers — formula-identical to spatial.py.
# ----------------------------------------------------------------------


def _mv(M: jax.Array, v: jax.Array) -> jax.Array:
    """Batched matrix @ vector: [K, m, n] @ [K, n] → [K, m]."""
    return jnp.einsum("kij,kj->ki", M, v)


def _mtv(M: jax.Array, v: jax.Array) -> jax.Array:
    """Batched matrixᵀ @ vector: [K, n, m] @ [K, n] → [K, m]."""
    return jnp.einsum("kji,kj->ki", M, v)


def _rodrigues(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """[K, 3] unit axes, [K] angles → [K, 3, 3] active rotations."""
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )
    s = jnp.sin(angle)[:, None, None]
    c = jnp.cos(angle)[:, None, None]
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def _xup_motion(R_cp: jax.Array, r: jax.Array, v: jax.Array) -> jax.Array:
    """Motion transform of ``motion_transform(R_cp, r)`` applied to
    parent-frame spatial motion ``v`` ([K, 6]): ``(E w, E (l − r × w))``.
    """
    w, l = v[:, :3], v[:, 3:]
    return jnp.concatenate(
        [_mv(R_cp, w), _mv(R_cp, l - jnp.cross(r, w))], axis=-1
    )


def _xup_force_up(R_cp: jax.Array, r: jax.Array, f: jax.Array) -> jax.Array:
    """``Xᵀ f``: child-frame spatial force → parent frame ([K, 6]):
    ``(Eᵀ n + r × (Eᵀ f), Eᵀ f)`` with ``E = R_cp``."""
    n, fl = f[:, :3], f[:, 3:]
    fl_p = _mtv(R_cp, fl)
    return jnp.concatenate(
        [_mtv(R_cp, n) + jnp.cross(r, fl_p), fl_p], axis=-1
    )


def _crm_apply(v: jax.Array, u: jax.Array) -> jax.Array:
    """Spatial motion cross product ([K, 6]): ``v ×ₘ u``."""
    w, l = v[:, :3], v[:, 3:]
    uw, ul = u[:, :3], u[:, 3:]
    return jnp.concatenate(
        [jnp.cross(w, uw), jnp.cross(l, uw) + jnp.cross(w, ul)], axis=-1
    )


def _crf_apply(v: jax.Array, g: jax.Array) -> jax.Array:
    """Spatial force cross product ([K, 6]): ``v ×f g`` (= −crm(v)ᵀ g):
    ``(w × n + l × f, w × f)``."""
    w, l = v[:, :3], v[:, 3:]
    n, f = g[:, :3], g[:, 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(l, f), jnp.cross(w, f)], axis=-1
    )


def _level_inertias(plan, params) -> list:
    """Per-level [K, 6, 6] spatial inertias, DR mass-scaled if given."""
    out = []
    for lvl in plan.levels:
        I = jnp.asarray(lvl.inertia)
        if params is not None and params.mass_scale is not None:
            if params.mass_scale.ndim == 0:
                I = I * params.mass_scale
            else:
                I = I * params.mass_scale[jnp.asarray(lvl.bodies)][
                    :, None, None
                ]
        out.append(I)
    return out


# ----------------------------------------------------------------------
# Pipeline stages
# ----------------------------------------------------------------------


def fwd_kinematics_dw(model: Model, plan, qpos: jax.Array):
    """Per-level kinematics: lists of ``E`` [K, 3, 3] (world_R_body),
    ``p`` [K, 3] (world origins), ``R_cp`` [K, 3, 3] (child_R_parent;
    ``None`` at the root)."""
    E0 = quat_to_rot(qpos[3:7])[None]
    p0 = qpos[0:3][None]
    E, p, R_cp = [E0], [p0], [None]
    for lvl in plan.levels[1:]:
        q = qpos[jnp.asarray(lvl.qpos_idx)]  # [K]
        R_j = _rodrigues(jnp.asarray(lvl.axis), q)  # parent_R_child
        ps = jnp.asarray(lvl.parent_slot)
        E_par = E[-1][ps]
        p_par = p[-1][ps]
        E.append(jnp.einsum("kij,kjl->kil", E_par, R_j))
        p.append(p_par + _mv(E_par, jnp.asarray(lvl.jpos)))
        R_cp.append(jnp.swapaxes(R_j, -1, -2))
    return E, p, R_cp


def _velocities(plan, R_cp: list, qvel: jax.Array) -> list:
    """Per-level spatial velocities [K, 6] (own body frame)."""
    v = [qvel[0:6][None]]
    for li, lvl in enumerate(plan.levels[1:], start=1):
        ps = jnp.asarray(lvl.parent_slot)
        vi = _xup_motion(R_cp[li], jnp.asarray(lvl.jpos), v[-1][ps])
        qd = qvel[jnp.asarray(lvl.dof_idx)]  # [K]
        ang = jnp.asarray(lvl.axis) * qd[:, None]
        v.append(
            jnp.concatenate([vi[:, :3] + ang, vi[:, 3:]], axis=-1)
        )
    return v


def _body_gather(plan) -> np.ndarray:
    """Static gather indices: level-concat order → body order [NB]."""
    sizes = [len(lvl.bodies) for lvl in plan.levels]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    return offs[plan.body_level] + plan.body_slot


def mass_matrix_dw(
    model: Model, plan, qpos: jax.Array, params=None, kin=None
) -> jax.Array:
    """CRBA joint-space inertia in Gram form: ``M = Σ_b Φ_bᵀ I_b Φ_b``.

    The generic CRBA (``engine.mass_matrix``) walks every body's root
    path sequentially — O(n_bodies · depth) chained small matmuls. Here
    every dof's motion axis is expressed in ONE common frame (world
    axes at the BASE body's origin — frame-invariant result, and using
    the base keeps lever arms ~1 m for f32 conditioning regardless of
    where the robot has walked), each body's spatial inertia is rebuilt
    in that frame, and a static ``[NB, nv]`` ancestor mask selects
    which dofs move which body. M then assembles as two batched
    einsums over all bodies at once — depth-batched kinematics plus a
    handful of large fused ops, no per-body chains.

    ``kin``: optionally the ``fwd_kinematics_dw`` result to reuse.
    Includes the armature diagonal, like the generic CRBA.
    """
    if kin is None:
        kin = fwd_kinematics_dw(model, plan, qpos)
    E, p, _ = kin
    gather = jnp.asarray(_body_gather(plan))
    E_all = jnp.concatenate(E, axis=0)[gather]  # [NB, 3, 3]
    p_all = jnp.concatenate(p, axis=0)[gather]  # [NB, 3]
    p0 = p_all[0]

    # World-axes spatial inertia of every body about the base origin.
    m = jnp.asarray(plan.mass)
    c_rel = p_all + _mv(E_all, jnp.asarray(plan.com)) - p0  # COM − base
    Ic_w = jnp.einsum(
        "bij,bjk,blk->bil", E_all, jnp.asarray(plan.inertia_com), E_all
    )
    x, y, z = c_rel[:, 0], c_rel[:, 1], c_rel[:, 2]
    zero = jnp.zeros_like(x)
    cx = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )  # [NB, 3, 3] skew(c_rel)
    mm = m[:, None, None]
    I_O = jnp.concatenate(
        [
            jnp.concatenate(
                [Ic_w + mm * cx @ jnp.swapaxes(cx, -1, -2), mm * cx], -1
            ),
            jnp.concatenate(
                [mm * jnp.swapaxes(cx, -1, -2), mm * jnp.eye(3)[None]], -1
            ),
        ],
        -2,
    )  # [NB, 6, 6]
    if params is not None and params.mass_scale is not None:
        s = params.mass_scale
        I_O = I_O * (s if s.ndim == 0 else s[:, None, None])

    # Per-dof motion axes in the common frame ([nv, 6] rows).
    E0 = E[0][0]
    root_rows = jnp.concatenate(
        [
            jnp.concatenate([E0.T, jnp.zeros((3, 3))], -1),  # angular dofs
            jnp.concatenate([jnp.zeros((3, 3)), E0.T], -1),  # linear dofs
        ],
        0,
    )  # lever arm p − p0 = 0 at the base itself
    joint_rows = []
    for li, lvl in enumerate(plan.levels[1:], start=1):
        axis_w = _mv(E[li], jnp.asarray(lvl.axis))  # [K, 3]
        lever = p[li] - p0
        joint_rows.append(
            jnp.concatenate([axis_w, jnp.cross(lever, axis_w)], -1)
        )
    if joint_rows:
        phi = jnp.concatenate(
            [root_rows, jnp.concatenate(joint_rows, 0)[
                jnp.asarray(plan.dof_perm)
            ]],
            0,
        )
    else:
        phi = root_rows  # [nv, 6]

    phi_m = phi[None] * jnp.asarray(plan.ancestor_mask)[:, :, None]
    T = jnp.einsum("bvi,bij->bvj", phi_m, I_O)
    M = jnp.einsum("bvj,bwj->vw", T, phi_m)
    return M + jnp.diag(jnp.asarray(model.armature, jnp.float32))


def mass_matrix_factor_dw(
    model: Model, plan, qpos: jax.Array, *, dt: float, params=None
) -> jax.Array:
    """Lower-Cholesky factor of ``M + dt·D`` via the Gram-form CRBA —
    drop-in for ``engine.mass_matrix_factor`` on plan-supported models
    (same contract: the implicit joint-damping term is baked in, so
    ``dt`` must match the integration step)."""
    M = mass_matrix_dw(model, plan, qpos, params)
    if dt:
        M = M + dt * jnp.diag(_engine._scaled_damping(model, params))
    return cholesky_factor_blocked(M)


def mass_matrix_inverse_dw(
    model: Model, plan, qpos: jax.Array, *, dt: float, params=None
) -> jax.Array:
    """Explicit ``(M + dt·D)⁻¹`` via the Gram-form CRBA.

    The held-factor fast path still pays two triangular substitutions
    per substep — ``2·nv`` sequentially dependent levels (the longest
    dependency chain left in the depth-batched substep). Holding the
    explicit inverse instead makes the per-substep solve ONE batched
    matvec; the inverse is built once per control step by
    back-substituting the identity through the Cholesky factor
    (column-batched, so it costs one factor + one [nv]-wide backsub).
    Same approximation contract as ``reuse_mass_matrix`` (M held across
    the control step's substeps); SPD 18×18 systems with armature are
    well-conditioned, so the explicit inverse is float32-safe."""
    M = mass_matrix_dw(model, plan, qpos, params)
    if dt:
        M = M + dt * jnp.diag(_engine._scaled_damping(model, params))
    L = cholesky_factor_blocked(M)
    # Recursive triangular inverse + one matmul: O(log n) batched
    # stages. The previous per-column backsub over an identity unrolled
    # to ~n² tiny sequential ops and showed up as the dominant block of
    # the fastM control step in the TPU device profile.
    return spd_inverse_from_factor(L)


def forward_dynamics_dw(
    model: Model,
    plan,
    qpos: jax.Array,
    qvel: jax.Array,
    tau_applied: jax.Array,
    dt: float = 0.0,
    chol: Optional[jax.Array] = None,
    external_forces: Optional[list] = None,
    terrain=None,
    params=None,
    minv: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Depth-batched ``forward_dynamics`` — same contract as
    ``engine.forward_dynamics``. Returns ``(qacc [nv], contact normal
    forces in original geom order — ground geoms first, then pairs)``.

    ``minv``: optionally a held explicit inverse from
    :func:`mass_matrix_inverse_dw` — the solve becomes one batched
    matvec (fastest path; same held-M approximation as ``chol``).
    Takes precedence over ``chol``."""
    E, p, R_cp = fwd_kinematics_dw(model, plan, qpos)
    v = _velocities(plan, R_cp, qvel)
    I = _level_inertias(plan, params)

    # RNEA forward: accelerations with q̈ = 0, gravity as world accel.
    g_lin = jnp.array([0.0, 0.0, -model.gravity], jnp.float32)
    a0 = jnp.concatenate(
        [jnp.zeros(3), quat_to_rot(qpos[3:7]).T @ g_lin]
    )[None]
    a = [a0]
    for li, lvl in enumerate(plan.levels[1:], start=1):
        ps = jnp.asarray(lvl.parent_slot)
        ai = _xup_motion(R_cp[li], jnp.asarray(lvl.jpos), a[-1][ps])
        qd = qvel[jnp.asarray(lvl.dof_idx)]
        vj = jnp.concatenate(
            [jnp.asarray(lvl.axis) * qd[:, None], jnp.zeros_like(lvl.axis)],
            axis=-1,
        )
        a.append(ai + _crm_apply(v[li], vj))
    f = [
        jnp.einsum("kij,kj->ki", I[li], a[li])
        + _crf_apply(v[li], jnp.einsum("kij,kj->ki", I[li], v[li]))
        for li in range(len(plan.levels))
    ]

    # Contacts: fold spatial forces into f (subtract — external forces
    # enter the rhs positively and f feeds the bias side).
    normals = []
    friction = model.friction
    if params is not None and params.friction is not None:
        friction = params.friction
    for grp in plan.geom_groups:
        li = grp.level
        slot = jnp.asarray(grp.slot)
        E_g = E[li][slot]  # [G, 3, 3]
        p_g = p[li][slot]
        v_g = v[li][slot]
        offset = jnp.asarray(grp.offset)
        radius = jnp.asarray(grp.radius)
        c = p_g + _mv(E_g, offset)  # [G, 3] world centers
        if terrain is None:
            phi = radius - c[:, 2]
            # Contact point: one radius below the center in world z.
            down = -radius[:, None] * E_g[:, 2, :]  # Eᵀ @ (0,0,-r)
            contact_offset = offset + down
            w_g, l_g = v_g[:, :3], v_g[:, 3:]
            v_pt = _mv(E_g, l_g + jnp.cross(w_g, contact_offset))
            fn = jnp.where(
                phi > 0.0,
                jnp.maximum(
                    0.0,
                    model.contact_stiffness * phi
                    - model.contact_damping * v_pt[:, 2],
                ),
                0.0,
            )
            if np.isfinite(model.max_contact_force):
                fn = jnp.minimum(fn, model.max_contact_force)
            vt = v_pt[:, :2]
            vt_norm = jnp.sqrt(jnp.sum(vt**2, -1) + 1e-6)
            scale = -friction * fn / jnp.maximum(
                vt_norm, model.friction_vel
            )
            f_w = jnp.concatenate([scale[:, None] * vt, fn[:, None]], -1)
        else:
            xy = c[:, :2]
            n = jax.vmap(terrain.normal)(xy)  # [G, 3]
            h = jax.vmap(terrain.height)(xy)
            phi = radius - (c[:, 2] - h) * n[:, 2]
            contact_offset = offset + _mtv(E_g, -n * radius[:, None])
            w_g, l_g = v_g[:, :3], v_g[:, 3:]
            v_pt = _mv(E_g, l_g + jnp.cross(w_g, contact_offset))
            vn = jnp.sum(n * v_pt, -1)
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
            vt = v_pt - vn[:, None] * n
            vt_norm = jnp.sqrt(jnp.sum(vt**2, -1) + 1e-6)
            ft = (
                -friction * fn / jnp.maximum(vt_norm, model.friction_vel)
            )[:, None] * vt
            f_w = fn[:, None] * n + ft
        normals.append(fn)
        f_b = _mtv(E_g, f_w)
        f_sp = jnp.concatenate(
            [jnp.cross(contact_offset, f_b), f_b], axis=-1
        )  # [G, 6]
        K = len(plan.levels[li].bodies)
        f[li] = f[li] - jax.ops.segment_sum(f_sp, slot, num_segments=K)

    # Sphere-sphere collision pairs (explicit static list): same math
    # as the generic engine — equal-and-opposite at one world point,
    # momentum-conserving — but BATCHED over all P pairs at once. The
    # per-pair loop emitted ~40 tiny kernels per pair per substep;
    # batched, the cost is ~40 ops independent of P (the suite's
    # dispatch-bound *_full rows motivated this — see
    # docs/performance.md roofline analysis).
    if model.pair_geom_a:
        smap = plan.slot_map
        K_of = [len(lvl.bodies) for lvl in plan.levels]
        lvl_offset = np.cumsum([0] + K_of)
        # Flat (level-concatenated) pose/velocity tables: one concat
        # each, then every pair endpoint is a single static gather row.
        E_all = jnp.concatenate(E, axis=0)  # [sumK, 3, 3]
        p_all = jnp.concatenate(p, axis=0)  # [sumK, 3]
        v_all = jnp.concatenate(v, axis=0)  # [sumK, 6]

        def side(geoms):
            flat, lvls = [], []
            for g in geoms:
                li, s = smap[int(model.geom_body[g])]
                flat.append(lvl_offset[li] + s)
                lvls.append(li)
            return (
                jnp.asarray(np.array(flat, np.int32)),
                np.array(lvls, np.int32),
                np.array(flat, np.int64),
                jnp.asarray(
                    np.stack([model.geom_offset[g] for g in geoms])
                    .astype(np.float32)
                ),
                np.array(
                    [model.geom_radius[g] for g in geoms], np.float32
                ),
            )

        ia, lvl_a, flat_a, off_a, rad_a = side(model.pair_geom_a)
        ib, lvl_b, flat_b, off_b, rad_b = side(model.pair_geom_b)
        E_a, p_a, v_a = E_all[ia], p_all[ia], v_all[ia]
        E_b, p_b, v_b = E_all[ib], p_all[ib], v_all[ib]
        xa = p_a + _mv(E_a, off_a)  # [P, 3] world centers
        xb = p_b + _mv(E_b, off_b)
        d = xb - xa
        dist = jnp.sqrt(jnp.sum(d**2, -1) + 1e-12)
        n = d / dist[:, None]  # contact normal, a → b
        phi = (rad_a + rad_b) - dist
        c_w = xa + n * (rad_a - 0.5 * phi)[:, None]

        def point_vel(E_g, p_g, v_g):
            r_loc = _mtv(E_g, c_w - p_g)
            w_g, l_g = v_g[:, :3], v_g[:, 3:]
            return _mv(E_g, l_g + jnp.cross(w_g, r_loc))

        v_rel = point_vel(E_b, p_b, v_b) - point_vel(E_a, p_a, v_a)
        sep = jnp.sum(n * v_rel, -1)  # separation rate (= -φ̇)
        fn = jnp.where(
            phi > 0.0,
            jnp.maximum(
                0.0,
                model.contact_stiffness * phi - model.contact_damping * sep,
            ),
            0.0,
        )
        if np.isfinite(model.max_contact_force):
            fn = jnp.minimum(fn, model.max_contact_force)
        vt = v_rel - sep[:, None] * n
        vt_norm = jnp.sqrt(jnp.sum(vt**2, -1) + 1e-6)
        ft = (
            -friction * fn / jnp.maximum(vt_norm, model.friction_vel)
        )[:, None] * vt
        f_w = fn[:, None] * n + ft  # [P, 3] on body b; a gets -f_w
        pair_normals = fn

        f_sp_sides = []
        for E_g, p_g, sign in ((E_b, p_b, 1.0), (E_a, p_a, -1.0)):
            r_loc = _mtv(E_g, c_w - p_g)
            f_bd = _mtv(E_g, sign * f_w)
            f_sp_sides.append(
                jnp.concatenate([jnp.cross(r_loc, f_bd), f_bd], axis=-1)
            )
        f_sp_all = jnp.concatenate(f_sp_sides, axis=0)  # [2P, 6]
        ep_lvl = np.concatenate([lvl_b, lvl_a])
        ep_flat = np.concatenate([flat_b, flat_a])
        for li in range(len(plan.levels)):
            in_lvl = ep_lvl == li
            if not in_lvl.any():
                continue
            # Out-of-level rows masked to zero and routed to slot 0 —
            # no reliance on scatter drop semantics.
            ids = jnp.asarray(
                np.where(in_lvl, ep_flat - lvl_offset[li], 0).astype(np.int32)
            )
            mask = jnp.asarray(in_lvl.astype(np.float32))[:, None]
            f[li] = f[li] - jax.ops.segment_sum(
                f_sp_all * mask, ids, num_segments=K_of[li]
            )
    else:
        pair_normals = None

    # External world-frame point forces [(body, point_world, f_world)].
    if external_forces:
        smap = plan.slot_map
        for b, point_w, f_w in external_forces:
            li, s = smap[int(b)]
            E_b, p_b = E[li][s], p[li][s]
            r_local = E_b.T @ (point_w - p_b)
            f_b = E_b.T @ f_w
            f_sp = jnp.concatenate([jnp.cross(r_local, f_b), f_b])
            f[li] = f[li].at[s].add(-f_sp)

    # Backward pass: project on joint subspaces, propagate to parents.
    joint_vals = [None] * (len(plan.levels) - 1)
    for li in range(len(plan.levels) - 1, 0, -1):
        lvl = plan.levels[li]
        joint_vals[li - 1] = jnp.sum(
            jnp.asarray(lvl.axis) * f[li][:, :3], axis=-1
        )  # [K] Sᵀ f
        up = _xup_force_up(R_cp[li], jnp.asarray(lvl.jpos), f[li])
        K_par = len(plan.levels[li - 1].bodies)
        f[li - 1] = f[li - 1] + jax.ops.segment_sum(
            up, jnp.asarray(lvl.parent_slot), num_segments=K_par
        )

    C_joints = (
        jnp.concatenate(joint_vals)[jnp.asarray(plan.dof_perm)]
        if joint_vals
        else jnp.zeros(0)
    )
    C = jnp.concatenate([f[0][0], C_joints])
    C = C + _engine._scaled_damping(model, params) * qvel

    rhs = tau_applied - C
    tau_l = _engine.limit_torques(model, qpos, qvel)
    if tau_l is not None:
        rhs = rhs + tau_l
    tau_s = _engine.spring_torques(model, qpos)
    if tau_s is not None:
        rhs = rhs + tau_s

    if plan.geom_groups:
        all_normals = jnp.concatenate(normals)[
            jnp.asarray(plan.normal_perm)
        ]
    else:
        all_normals = jnp.zeros((0,))
    if pair_normals is not None:
        # Same output layout as the generic engine: the NG ground
        # normals first, then the pairs in declaration order.
        all_normals = jnp.concatenate([all_normals, pair_normals])

    if minv is not None:
        return minv @ rhs, all_normals
    if chol is not None:
        return cholesky_backsub(chol, rhs), all_normals
    M = mass_matrix_dw(model, plan, qpos, params, kin=(E, p, R_cp))
    if dt:
        M = M + dt * jnp.diag(_engine._scaled_damping(model, params))
    return cholesky_solve_small(M, rhs), all_normals
