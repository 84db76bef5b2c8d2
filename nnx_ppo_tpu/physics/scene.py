"""Multi-tree scenes: several kinematic trees + cross-tree contacts.

The engine proper (``engine.py``) is a pure function of ONE kinematic
tree. Object interaction (an arm pushing a ball, a robot kicking
debris) needs several independent trees in one world: each tree keeps
its own ``(qpos, qvel)`` and its own ground/self contacts, and the
scene layer adds sphere-sphere penalty contacts BETWEEN trees —
computed once in world frame and applied equal-and-opposite through
``forward_dynamics(external_forces=...)``, so cross-tree collisions
conserve the combined system's momentum exactly like intra-tree pairs.

Everything stays trace-time static (fixed tree list, fixed pair list)
and per-env pure, so scenes vmap over thousands of envs like single
trees do. Contact parameters for a cross pair are the arithmetic means
of the two trees' parameters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.physics.engine import (
    body_point_velocity,
    body_velocities,
    forward_dynamics,
    fwd_kinematics,
    geom_world_centers,
    integrate,
    sphere_pair_force,
)
from nnx_ppo_tpu.physics.model import Model


@dataclasses.dataclass(frozen=True)
class Scene:
    """Static scene description: the trees plus cross-tree contact
    pairs ``(tree_a, geom_a, tree_b, geom_b)`` (geom indices are local
    to their tree)."""

    models: tuple[Model, ...]
    pairs: tuple[tuple[int, int, int, int], ...] = ()

    def __post_init__(self):
        for ta, ga, tb, gb in self.pairs:
            if ta == tb:
                raise ValueError(
                    "cross-tree pair within one tree — use "
                    "ModelBuilder.add_collision_pair for self-collision"
                )
            for t, g in ((ta, ga), (tb, gb)):
                if not 0 <= t < len(self.models):
                    raise ValueError(f"tree index {t} out of range")
                if not 0 <= g < len(self.models[t].geom_body):
                    raise ValueError(
                        f"geom index {g} out of range for tree {t}"
                    )


def scene_forward(
    scene: Scene,
    qposs: tuple,
    qvels: tuple,
    taus: tuple,
    dt: float = 0.0,
    terrain=None,
) -> tuple[tuple, jax.Array]:
    """Per-tree forward dynamics with cross-tree contact coupling.

    Returns ``(qaccs per tree, cross-pair normal forces [NP])``. Each
    tree additionally feels its own ground/self contacts, joint limits,
    and implicit damping exactly as in :func:`engine.forward_dynamics`;
    ``terrain`` (heightfield ground) applies to every tree.
    """
    kins = [fwd_kinematics(m, qp) for m, qp in zip(scene.models, qposs)]
    vels = [
        body_velocities(m, k, qv)
        for m, k, qv in zip(scene.models, kins, qvels)
    ]
    centers = [geom_world_centers(m, k) for m, k in zip(scene.models, kins)]

    ext: list[list] = [[] for _ in scene.models]
    normals = []
    for ta, ga, tb, gb in scene.pairs:
        ma, mb = scene.models[ta], scene.models[tb]
        ba, bb = ma.geom_body[ga], mb.geom_body[gb]
        ka, kb = kins[ta], kins[tb]

        def va_fn(c, t=ta, b=ba):
            k = kins[t]
            return body_point_velocity(k, vels[t], b, k.E[b].T @ (c - k.p[b]))

        def vb_fn(c, t=tb, b=bb):
            k = kins[t]
            return body_point_velocity(k, vels[t], b, k.E[b].T @ (c - k.p[b]))

        f_w, c_w, fn = sphere_pair_force(
            centers[ta][ga],
            centers[tb][gb],
            jnp.float32(ma.geom_radius[ga]),
            jnp.float32(mb.geom_radius[gb]),
            stiffness=0.5 * (ma.contact_stiffness + mb.contact_stiffness),
            damping=0.5 * (ma.contact_damping + mb.contact_damping),
            friction=0.5 * (ma.friction + mb.friction),
            friction_vel=max(ma.friction_vel, mb.friction_vel),
            max_force=min(ma.max_contact_force, mb.max_contact_force),
            va_fn=va_fn,
            vb_fn=vb_fn,
        )
        normals.append(fn)
        ext[tb].append((bb, c_w, f_w))
        ext[ta].append((ba, c_w, -f_w))

    qaccs = tuple(
        forward_dynamics(
            m, qp, qv, tau, dt=dt, external_forces=ext[t] or None,
            terrain=terrain,
        )[0]
        for t, (m, qp, qv, tau) in enumerate(
            zip(scene.models, qposs, qvels, taus)
        )
    )
    cross = jnp.stack(normals) if normals else jnp.zeros((0,))
    return qaccs, cross


def scene_step(
    scene: Scene,
    qposs: tuple,
    qvels: tuple,
    taus: tuple,
    dt: float,
    n_substeps: int = 1,
    terrain=None,
) -> tuple[tuple, tuple, jax.Array]:
    """Advance every tree ``n_substeps`` semi-implicit-Euler steps under
    constant applied torques. Returns (qposs, qvels, last cross-pair
    normal forces)."""

    def substep(carry, _):
        qps, qvs = carry
        qaccs, cross = scene_forward(
            scene, qps, qvs, taus, dt=dt, terrain=terrain
        )
        nxt = [
            integrate(m, qp, qv, qa, dt)
            for m, qp, qv, qa in zip(scene.models, qps, qvs, qaccs)
        ]
        qps = tuple(x[0] for x in nxt)
        qvs = tuple(x[1] for x in nxt)
        return (qps, qvs), cross

    (qposs, qvels), cross = jax.lax.scan(
        substep, (qposs, qvels), None, length=n_substeps
    )
    return qposs, qvels, cross[-1]
