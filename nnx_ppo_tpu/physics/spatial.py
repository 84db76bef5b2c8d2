"""Spatial (6-D) vector algebra and quaternion helpers — the math core
of the rigid-body engine (Featherstone RBDA conventions).

The reference framework's physics substrate is MJX (external,
``mujoco_playground`` — SURVEY §2.6); this package is the TPU-native
in-repo equivalent: pure jax.numpy on static shapes, all body loops
unrolled at trace time, so the whole pipeline vmaps over thousands of
envs and lowers to fused VPU/MXU ops with zero custom calls.

Conventions:

* Spatial motion vectors are ``[ω(3); v(3)]`` (angular first), spatial
  forces ``[n(3); f(3)]`` (torque first), both expressed in the body's
  own coordinate frame at the body origin.
* ``(R, p)`` denotes a frame B placed at position ``p`` (in A coords)
  with rotation ``R = B_R_A`` mapping A-vectors to B-vectors.
* Quaternions are ``[w, x, y, z]`` scalar-first, normalized, and encode
  the body's orientation as an *active* rotation:
  ``world_vec = quat_to_rot(q) @ body_vec`` (MuJoCo ``xquat`` style).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """3×3 cross-product matrix: ``skew(v) @ u == cross(v, u)``."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.array(
        [[zero, -z, y], [z, zero, -x], [-y, x, zero]]
    )


def motion_transform(R: jax.Array, p: jax.Array) -> jax.Array:
    """Spatial motion transform ``B_X_A`` for frame B at ``(R, p)``.

    ``X = [[R, 0], [-R·skew(p), R]]`` — maps motion vectors expressed in
    A to the same vectors expressed in B (RBDA eq. 2.24–2.26).
    """
    Z = jnp.zeros((3, 3))
    return jnp.block([[R, Z], [-R @ skew(p), R]])


def transform_force(X_motion: jax.Array, f: jax.Array) -> jax.Array:
    """Transform a spatial force with the *inverse-transpose* rule:
    given the motion transform ``B_X_A``, forces map A←B via
    ``f_A = (B_X_A)ᵀ f_B`` (RBDA eq. 2.25)."""
    return X_motion.T @ f


def spatial_inertia(
    mass: jax.Array, com: jax.Array, inertia_com: jax.Array
) -> jax.Array:
    """6×6 spatial inertia of a body about its frame origin.

    Args:
      mass: scalar body mass.
      com: ``[3]`` center-of-mass offset in the body frame.
      inertia_com: ``[3, 3]`` rotational inertia about the COM.

    RBDA eq. 2.63: ``I = [[Ī + m·cₓcₓᵀ, m·cₓ], [m·cₓᵀ, m·1]]``.
    """
    cx = skew(com)
    return jnp.block(
        [
            [inertia_com + mass * cx @ cx.T, mass * cx],
            [mass * cx.T, mass * jnp.eye(3)],
        ]
    )


def crm(v: jax.Array) -> jax.Array:
    """Spatial cross-product matrix (motion × motion), RBDA eq. 2.31."""
    w, vl = v[:3], v[3:]
    Z = jnp.zeros((3, 3))
    return jnp.block([[skew(w), Z], [skew(vl), skew(w)]])


def crf(v: jax.Array) -> jax.Array:
    """Spatial cross-product matrix (motion × force), RBDA eq. 2.32:
    ``crf(v) == -crm(v).T``."""
    return -crm(v).T


# ----------------------------------------------------------------------
# Quaternions ([w, x, y, z], encode body_R_world)
# ----------------------------------------------------------------------


def quat_to_rot(q: jax.Array) -> jax.Array:
    """``world_R_body`` of a unit quaternion:
    ``world_vec = quat_to_rot(q) @ body_vec``."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_integrate(q: jax.Array, omega_body: jax.Array, dt) -> jax.Array:
    """Advance the orientation quaternion by body-frame angular velocity
    ``ω`` for ``dt`` via the exponential map (``q ← q ⊗ exp(ω·dt/2)``;
    exact for constant ω, renormalized against float drift)."""
    angle = jnp.linalg.norm(omega_body) * dt
    # sinc-safe half-angle axis update.
    half = 0.5 * angle
    # axis * sin(half): use sinc to avoid 0/0.
    axis_sin = 0.5 * dt * omega_body * jnp.sinc(half / jnp.pi)
    dq = jnp.concatenate([jnp.cos(half)[None], axis_sin])
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    axis = axis / jnp.linalg.norm(axis)
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)])
