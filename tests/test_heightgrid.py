"""HeightGrid (bilinear data terrain) and MJCF hfield import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.physics.terrain import (
    HeightGrid,
    inclined,
    rough_terrain,
)


class TestBilinear:
    def test_node_and_midpoint_values(self):
        grid = HeightGrid(
            data=np.array([[0.0, 1.0], [2.0, 3.0]]),
            x0=0.0,
            y0=0.0,
            dx=1.0,
            dy=1.0,
        )
        assert float(grid.height(jnp.array([0.0, 0.0]))) == 0.0
        assert float(grid.height(jnp.array([1.0, 1.0]))) == 3.0
        assert float(grid.height(jnp.array([0.5, 0.5]))) == pytest.approx(1.5)
        # Gradient of the bilinear patch at the center.
        g = np.asarray(grid.grad(jnp.array([0.5, 0.5])))
        np.testing.assert_allclose(g, [2.0, 1.0])

    def test_gradient_zero_on_flat_extension(self):
        """Outside the grid, height() clamps flat — grad/normal must
        agree (regression: the edge cell's slope used to leak out and
        tilt contact normals on the extension)."""
        plane = inclined(slope_x=0.3, slope_y=0.1)
        grid = HeightGrid.sample(plane, extent=1.0, n=5)
        inside = jnp.array([0.5, -0.5])
        past_x = jnp.array([5.0, 0.0])  # clamped in x, inside in y
        corner = jnp.array([5.0, -7.0])  # fully outside
        assert float(jnp.abs(grid.grad(inside)).max()) > 0.05
        # The clamped surface is flat in x but still slopes in y.
        np.testing.assert_allclose(
            np.asarray(grid.grad(past_x)), [0.0, 0.1], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(grid.grad(corner)), [0.0, 0.0]
        )
        np.testing.assert_allclose(
            np.asarray(grid.normal(corner)), [0.0, 0.0, 1.0]
        )

    def test_flat_extension_outside(self):
        grid = HeightGrid(
            data=np.array([[1.0, 1.0], [1.0, 1.0]]),
            x0=-1.0,
            y0=-1.0,
            dx=2.0,
            dy=2.0,
        )
        assert float(grid.height(jnp.array([100.0, -50.0]))) == 1.0
        np.testing.assert_allclose(
            np.asarray(grid.normal(jnp.array([100.0, -50.0]))),
            [0.0, 0.0, 1.0],
        )

    def test_sampled_plane_is_exact(self):
        """A plane is bilinear-exact: the sampled grid reproduces the
        analytic inclined terrain's height AND normal everywhere."""
        plane = inclined(slope_x=0.2, slope_y=-0.1)
        grid = HeightGrid.sample(plane, extent=3.0, n=7)
        rng = np.random.RandomState(0)
        for _ in range(10):
            xy = jnp.asarray(rng.uniform(-2.5, 2.5, 2), jnp.float32)
            np.testing.assert_allclose(
                float(grid.height(xy)), float(plane.height(xy)), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(grid.normal(xy)),
                np.asarray(plane.normal(xy)),
                atol=1e-5,
            )

    def test_dense_sampling_approximates_rough_terrain(self):
        rough = rough_terrain(seed=4, amplitude=0.05, wavelength=1.5)
        grid = HeightGrid.sample(rough, extent=4.0, n=512)
        rng = np.random.RandomState(1)
        for _ in range(10):
            xy = jnp.asarray(rng.uniform(-3.5, 3.5, 2), jnp.float32)
            assert float(
                jnp.abs(grid.height(xy) - rough.height(xy))
            ) < 1e-3


class TestEngineOnHeightGrid:
    def test_quadruped_dynamics_match_analytic_terrain(self):
        """forward_dynamics on a densely sampled HeightGrid agrees with
        the analytic terrain it was sampled from (both engine paths)."""
        from nnx_ppo_tpu.physics.engine import forward_dynamics
        from nnx_ppo_tpu.physics.engine_depthwise import (
            DepthPlan,
            forward_dynamics_dw,
        )
        from nnx_ppo_tpu.physics.models import make_quadruped
        from nnx_ppo_tpu.physics.models import quadruped as qd

        model = make_quadruped()
        plan = DepthPlan.build(model)
        rough = rough_terrain(seed=2, amplitude=0.03, wavelength=1.5)
        grid = HeightGrid.sample(rough, extent=3.0, n=1024)
        key = jax.random.key(0)
        base = jnp.asarray(qd.default_qpos(model))
        qpos = base.at[7:].add(
            0.1 * jax.random.normal(key, (model.nj,))
        )
        qvel = 0.3 * jax.random.normal(key, (model.nv,))
        tau = jnp.zeros(model.nv)

        ref = jax.jit(
            lambda: forward_dynamics(
                model, qpos, qvel, tau, dt=0.002, terrain=rough
            )[0]
        )()
        for fd in (
            lambda t: forward_dynamics(
                model, qpos, qvel, tau, dt=0.002, terrain=t
            )[0],
            lambda t: forward_dynamics_dw(
                model, plan, qpos, qvel, tau, dt=0.002, terrain=t
            )[0],
        ):
            got = jax.jit(lambda: fd(grid))()
            # Dense grid: small interpolation error in contact forces.
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.5
            )


class TestHfieldImport:
    def test_mjcf_hfield_to_heightgrid(self):
        mujoco = pytest.importorskip("mujoco")
        from nnx_ppo_tpu.physics.mjcf import from_mjcf

        xml = """
        <mujoco>
          <asset><hfield name="hf" nrow="5" ncol="9" size="2 1 0.4 0.1"/></asset>
          <worldbody>
            <geom type="hfield" hfield="hf" pos="0.5 -0.25 0"/>
            <body pos="0 0 1"><freejoint/>
              <inertial pos="0 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
              <geom name="foot" type="sphere" size="0.05"/>
            </body>
          </worldbody>
        </mujoco>"""
        m = mujoco.MjModel.from_xml_string(xml)
        rng = np.random.RandomState(3)
        m.hfield_data[:] = rng.uniform(0.0, 1.0, m.hfield_data.shape)
        imp = from_mjcf(m)
        assert imp.has_ground and imp.terrain is not None
        assert imp.geom_names == ("foot",)  # hfield gave contact ground
        grid = imp.terrain
        # Grid extent from hfield size (radius 2 in x over 9 cols,
        # radius 1 in y over 5 rows), centered at the geom pos.
        assert grid.data.shape == (9, 5)
        assert grid.x0 == pytest.approx(0.5 - 2.0)
        assert grid.y0 == pytest.approx(-0.25 - 1.0)
        # Heights: normalized data × z_top + geom z, at exact nodes.
        rows = np.asarray(m.hfield_data).reshape(5, 9)
        xy = jnp.asarray([grid.x0 + 3 * grid.dx, grid.y0 + 2 * grid.dy])
        assert float(grid.height(xy)) == pytest.approx(
            rows[2, 3] * 0.4, abs=1e-6
        )

    def test_legged_from_mjcf_picks_up_terrain(self):
        mujoco = pytest.importorskip("mujoco")
        from nnx_ppo_tpu.envs import legged_from_mjcf

        xml = """
        <mujoco>
          <asset><hfield name="hf" nrow="17 " ncol="17" size="4 4 0.05 0.1"/></asset>
          <worldbody>
            <geom type="hfield" hfield="hf"/>
            <body name="trunk" pos="0 0 0.4">
              <freejoint/>
              <inertial pos="0 0 0" mass="4.0" diaginertia="0.05 0.05 0.04"/>
              <body name="L" pos="0 0.1 0">
                <joint name="Lh" type="hinge" axis="0 1 0" damping="1.0"/>
                <inertial pos="0 0 -0.18" mass="0.8"
                          diaginertia="0.006 0.006 0.001"/>
                <geom name="Lf" type="sphere" size="0.03" pos="0 0 -0.36"/>
              </body>
              <body name="R" pos="0 -0.1 0">
                <joint name="Rh" type="hinge" axis="0 1 0" damping="1.0"/>
                <inertial pos="0 0 -0.18" mass="0.8"
                          diaginertia="0.006 0.006 0.001"/>
                <geom name="Rf" type="sphere" size="0.03" pos="0 0 -0.36"/>
              </body>
            </body>
          </worldbody>
        </mujoco>"""
        env = legged_from_mjcf(xml, kp=50.0, spawn_radius=2.0)
        assert env.terrain is not None
        state = env.reset(jax.random.key(0))
        state = jax.jit(env.step)(state, jnp.zeros(2))
        assert np.isfinite(float(state.reward["tracking"]))
