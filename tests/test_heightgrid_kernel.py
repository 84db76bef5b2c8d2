"""HeightGrid (data) terrain on the Pallas megakernel path.

Grid terrain cannot be evaluated inside the kernel (Mosaic has no
full-shape-indices gather), so the env samples each ground geom's LOCAL
tangent plane ``h(x,y) = c + gx·x + gy·y`` from the grid in XLA once
per control step and feeds it as 3 lanes per geom
(``engine_soa.substep_soa(terrain_planes=...)``). Semantics: the plane
is frozen over the control step's substeps — exact whenever the local
surface is a plane (the contact model is itself first-order at the
sphere center), and within one control step of foot travel (~cm)
elsewhere. Capability anchor: the reference trains on mujoco_playground
rough/hfield tasks (SURVEY §2.6); the XLA per-substep bilinear path
remains the exact reference semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.envs import QuadrupedJoystick
from nnx_ppo_tpu.physics.engine_soa import (
    crba_chol_soa,
    soa_features_unsupported_reason,
    substep_soa,
)
from nnx_ppo_tpu.physics.models import make_quadruped
from nnx_ppo_tpu.physics.models import quadruped as qd
from nnx_ppo_tpu.physics.terrain import HeightGrid, inclined, rough_terrain


class TestPlaneLanes:
    def test_plane_lanes_match_analytic_inclined(self):
        """terrain_planes carrying a global plane == the analytic
        inclined() Terrain branch, lane for lane."""
        model = make_quadruped()
        sx, sy = 0.12, -0.07
        B, dt, kp = 8, 0.002, 60.0
        k1, k2 = jax.random.split(jax.random.key(3))
        base = jnp.asarray(qd.default_qpos(model))
        qpos = jnp.tile(base, (B, 1))
        qpos = qpos.at[:, 7:].add(0.2 * jax.random.normal(k1, (B, model.nj)))
        qvel = 0.4 * jax.random.normal(k2, (B, model.nv))
        target = qpos[:, 7:]

        def run(terrain, planes):
            qp = tuple(qpos[:, k] for k in range(model.nq))
            qv = tuple(qvel[:, k] for k in range(model.nv))
            tgt = tuple(target[:, k] for k in range(model.nj))
            chol = crba_chol_soa(model, qp, dt)
            qp, qv, normals = substep_soa(
                model, qp, qv, tgt, chol, kp, dt,
                terrain=terrain, terrain_planes=planes,
            )
            return jnp.stack(qp, 1), jnp.stack(qv, 1), jnp.stack(normals, 1)

        lane = jnp.zeros(B)
        plane = (lane, lane + sx, lane + sy)  # c=0, gx=sx, gy=sy
        planes = tuple(plane for _ in model.geom_body)
        a_qp, a_qv, a_n = jax.jit(lambda: run(inclined(sx, sy), None))()
        p_qp, p_qv, p_n = jax.jit(lambda: run(None, planes))()
        np.testing.assert_allclose(np.asarray(p_qp), np.asarray(a_qp),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(p_qv), np.asarray(a_qv),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(p_n), np.asarray(a_n),
                                   rtol=1e-4, atol=1e-4)
        assert float(a_n.max()) > 0.0, "no contact sampled"

    def test_mutual_exclusion(self):
        model = make_quadruped()
        base = jnp.asarray(qd.default_qpos(model))[None]
        qp = tuple(base[:, k] for k in range(model.nq))
        qv = tuple(jnp.zeros((1,)) for _ in range(model.nv))
        tgt = tuple(jnp.zeros((1,)) for _ in range(model.nj))
        chol = crba_chol_soa(model, qp, 0.002)
        lane = jnp.zeros(1)
        planes = tuple((lane, lane, lane) for _ in model.geom_body)
        with pytest.raises(AssertionError, match="mutually exclusive"):
            substep_soa(model, qp, qv, tgt, chol, 60.0, 0.002,
                        terrain=inclined(0.1), terrain_planes=planes)


class TestEnvKernelPath:
    def test_heightgrid_engages_kernel_runner(self):
        grid = HeightGrid.sample(rough_terrain(seed=2, amplitude=0.03),
                                 extent=8.0, n=64)
        env = QuadrupedJoystick(
            reuse_mass_matrix=True, substep_impl="pallas", n_substeps=2,
            terrain=grid,
        )
        assert env._control_runner is not None
        assert soa_features_unsupported_reason(terrain=grid) is None

    def test_env_heightgrid_plane_matches_analytic_plane(self):
        """A HeightGrid sampled from a perfect inclined plane through
        the kernel path == the analytic inclined() kernel path: the
        bilinear interpolant of a plane IS the plane, and the frozen
        tangent plane of a plane is exact — gates the whole lane
        plumbing (FK, grid sampling, packing, kernel unpack)."""
        sx, sy = 0.1, -0.06
        grid = HeightGrid.sample(inclined(sx, sy), extent=12.0, n=96)
        kw = dict(reuse_mass_matrix=True, substep_impl="pallas",
                  n_substeps=2, spawn_radius=3.0)
        env_g = QuadrupedJoystick(terrain=grid, **kw)
        env_a = QuadrupedJoystick(terrain=inclined(sx, sy), **kw)
        B = 4
        keys = jax.random.split(jax.random.key(0), B)
        s_g = jax.jit(jax.vmap(env_g.reset))(keys)
        s_a = jax.jit(jax.vmap(env_a.reset))(keys)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(s_g.obs)[0]),
            np.asarray(jax.tree.leaves(s_a.obs)[0]),
            rtol=1e-5, atol=1e-5,
        )
        act = 0.3 * jax.random.normal(jax.random.key(1), (B, env_g.action_size))
        step_g = jax.jit(jax.vmap(env_g.step))
        step_a = jax.jit(jax.vmap(env_a.step))
        for _ in range(2):
            s_g = step_g(s_g, act)
            s_a = step_a(s_a, act)
        np.testing.assert_allclose(
            np.asarray(s_g.data["qpos"]), np.asarray(s_a.data["qpos"]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(s_g.data["qvel"]), np.asarray(s_a.data["qvel"]),
            rtol=1e-3, atol=1e-3,
        )

    def test_env_heightgrid_kernel_close_to_xla_bilinear(self):
        """Rough HeightGrid: the kernel's frozen-tangent-plane step must
        track the XLA per-substep bilinear path within the one-control-
        step drift bound (loose tolerance — the two differ exactly by
        plane-vs-bilinear within ~mm of foot travel)."""
        grid = HeightGrid.sample(
            rough_terrain(seed=4, amplitude=0.04, wavelength=1.5),
            extent=10.0, n=160,
        )
        kw = dict(reuse_mass_matrix=True, n_substeps=2, spawn_radius=2.0)
        env_k = QuadrupedJoystick(terrain=grid, substep_impl="pallas", **kw)
        env_x = QuadrupedJoystick(terrain=grid, substep_impl="xla",
                                  depthwise=False, **kw)
        B = 4
        keys = jax.random.split(jax.random.key(7), B)
        s_k = jax.jit(jax.vmap(env_k.reset))(keys)
        s_x = jax.jit(jax.vmap(env_x.reset))(keys)
        act = 0.2 * jax.random.normal(jax.random.key(8), (B, env_k.action_size))
        s_k = jax.jit(jax.vmap(env_k.step))(s_k, act)
        s_x = jax.jit(jax.vmap(env_x.step))(s_x, act)
        np.testing.assert_allclose(
            np.asarray(s_k.data["qpos"]), np.asarray(s_x.data["qpos"]),
            atol=5e-3,
        )
