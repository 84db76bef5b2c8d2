"""Heightfield terrain: geometry, mechanics on inclines, env integration.

Validates ``physics/terrain.py`` + the terrain branch of the engine's
ground contact (``engine.py::contact_generalized_forces``):

- the trivial terrain reproduces the flat-plane fast path exactly,
- surface normals match autodiff of the height function,
- a solid ball released on an inclined plane rolls at the analytic
  5/7·g·sinθ (normal/friction decomposition on a tilted surface),
- a ball settles ON a rough field (no tunnelling, correct rest height),
- the rough-terrain legged env spawns on, walks on, and terminates
  relative to the local ground.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.physics import (
    FREE,
    ModelBuilder,
    Terrain,
    forward_dynamics,
    rough_terrain,
    step,
)
from nnx_ppo_tpu.physics.models import make_quadruped
from nnx_ppo_tpu.physics.models.quadruped import (
    DEFAULT_JOINT_POSE,
    STAND_HEIGHT,
)
from nnx_ppo_tpu.physics.terrain import inclined


def _ball_model(radius=0.1, mass=1.0, friction=0.9):
    b = ModelBuilder(gravity=-9.81)
    b.add_body(
        "ball",
        joint=FREE,
        mass=mass,
        inertia=(2.0 / 5.0 * mass * radius**2,) * 3,
    )
    b.add_sphere_geom("ball", (0.0, 0.0, 0.0), radius)
    return b.finalize(friction=friction, friction_vel=0.01)


def _quadruped_contact_state():
    model = make_quadruped()
    qpos = jnp.concatenate(
        [
            jnp.array([0.0, 0.0, STAND_HEIGHT * 0.9]),  # feet in contact
            jnp.array([1.0, 0.0, 0.0, 0.0]),
            jnp.asarray(DEFAULT_JOINT_POSE, jnp.float32),
        ]
    )
    qvel = 0.1 * jnp.sin(jnp.arange(model.nv, dtype=jnp.float32))
    return model, qpos, qvel


class TestGeometry:
    def test_trivial_terrain_matches_flat_path(self):
        model, qpos, qvel = _quadruped_contact_state()
        tau = 0.3 * jnp.cos(jnp.arange(model.nv, dtype=jnp.float32))
        qacc_flat, fn_flat = forward_dynamics(model, qpos, qvel, tau, dt=1e-3)
        qacc_terr, fn_terr = forward_dynamics(
            model, qpos, qvel, tau, dt=1e-3, terrain=Terrain()
        )
        np.testing.assert_allclose(qacc_terr, qacc_flat, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(fn_terr, fn_flat, rtol=1e-5, atol=1e-6)

    def test_normal_matches_autodiff(self):
        terr = rough_terrain(seed=3, amplitude=0.08, wavelength=0.9)
        for xy in [jnp.array([0.3, -1.2]), jnp.array([4.0, 2.5])]:
            g_auto = jax.grad(lambda p: terr.height(p))(xy)
            np.testing.assert_allclose(terr.grad(xy), g_auto, rtol=1e-5)
            n = terr.normal(xy)
            # Unit length, and orthogonal to both surface tangents.
            np.testing.assert_allclose(jnp.linalg.norm(n), 1.0, rtol=1e-6)
            tx = jnp.array([1.0, 0.0, g_auto[0]])
            ty = jnp.array([0.0, 1.0, g_auto[1]])
            assert abs(float(n @ tx)) < 1e-5
            assert abs(float(n @ ty)) < 1e-5

    def test_stairs_geometry(self):
        from nnx_ppo_tpu.physics import stairs

        H, L = 0.08, 0.35
        terr = stairs(step_height=H, step_length=L, direction=(0.6, 0.8))
        d = jnp.array([0.6, 0.8])
        # One period along the climb direction rises exactly H.
        p0 = 1.3 * d
        p1 = p0 + L * d
        rise = float(terr.height(p1) - terr.height(p0))
        np.testing.assert_allclose(rise, H, rtol=1e-5)
        # Treads (s = kL) are exactly flat; mid-riser gradient = 2H/L.
        tread = 3 * L * d
        np.testing.assert_allclose(terr.grad(tread), 0.0, atol=1e-6)
        riser = (3.5 * L) * d
        g = terr.grad(riser)
        np.testing.assert_allclose(
            float(g @ d), 2 * H / L, rtol=1e-5
        )
        # No gradient across the climb direction.
        perp = jnp.array([-0.8, 0.6])
        assert abs(float(g @ perp)) < 1e-6
        # Monotone non-decreasing along the climb.
        ss = jnp.linspace(0.0, 3 * L, 200)
        hs = jax.vmap(lambda s: terr.height(s * d))(ss)
        assert float(jnp.min(jnp.diff(hs))) > -1e-7

    def test_rough_terrain_amplitude(self):
        terr = rough_terrain(seed=0, amplitude=0.05)
        xs = np.random.RandomState(0).uniform(-20, 20, (512, 2))
        hs = np.asarray(
            jax.vmap(terr.height)(jnp.asarray(xs, jnp.float32))
        )
        assert 0.02 < hs.std() < 0.1  # ≈ requested amplitude


class TestInclineMechanics:
    def test_ball_rolls_at_five_sevenths_g_sin_theta(self):
        # Solid sphere on an inclined plane with ample friction rolls
        # without slipping: a = g·sinθ / (1 + I/(m r²)) = (5/7)·g·sinθ.
        radius, theta = 0.1, 0.12
        model = _ball_model(radius=radius)
        terr = inclined(slope_x=float(np.tan(theta)))
        dt = 5e-4
        # Start resting on the surface at x=0 (h=0): penetration
        # settles within a few steps.
        qpos = jnp.array([0.0, 0.0, radius / np.cos(theta), 1, 0, 0, 0.0])
        qvel = jnp.zeros(6)
        from nnx_ppo_tpu.physics.spatial import quat_to_rot

        def v_world(qp, qv):
            # FREE-joint linear qvel is in the (rotating) body frame;
            # express in world frame before differencing across time.
            return np.asarray(quat_to_rot(qp[3:7]) @ qv[3:6])

        # Settle, then measure velocity growth over a window.
        qpos, qvel, _ = step(model, qpos, qvel, jnp.zeros(6), dt,
                             n_substeps=400, terrain=terr)
        v1 = v_world(qpos, qvel)
        t_win = 0.4
        qpos, qvel, _ = step(model, qpos, qvel, jnp.zeros(6), dt,
                             n_substeps=int(t_win / dt), terrain=terr)
        v2 = v_world(qpos, qvel)
        a_meas = np.linalg.norm(v2 - v1) / t_win
        a_true = (5.0 / 7.0) * 9.81 * np.sin(theta)
        assert abs(a_meas - a_true) / a_true < 0.08, (a_meas, a_true)
        # Rolls downhill (+x for positive slope_x going up with x? h =
        # tanθ·x increases with x, so downhill is -x).
        assert v2[0] < v1[0]

    def test_ball_settles_on_rough_field(self):
        radius = 0.1
        model = _ball_model(radius=radius)
        terr = rough_terrain(seed=1, amplitude=0.05, wavelength=1.5)
        xy0 = jnp.array([0.7, -0.4])
        h0 = terr.height(xy0)
        qpos = jnp.concatenate(
            [xy0, h0[None] + radius + 0.3, jnp.array([1.0, 0, 0, 0])]
        )
        qvel = jnp.zeros(6)
        qpos, qvel, fn = step(model, qpos, qvel, jnp.zeros(6), 1e-3,
                              n_substeps=3000, terrain=terr)
        xy = qpos[0:2]
        rest_gap = float(qpos[2] - terr.height(xy))
        # Resting on (slightly penetrating) the surface, not through it.
        assert radius - 0.03 < rest_gap < radius + 0.01, rest_gap
        assert float(jnp.linalg.norm(qvel[3:6])) < 0.25
        assert float(fn[0]) > 0.0  # in contact


class TestHeightScan:
    def _env(self, terr, n=3):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        return QuadrupedJoystick(terrain=terr, height_scan=n,
                                 height_scan_extent=0.4,
                                 reset_joint_noise=0.0)

    def test_rejects_scan_without_terrain(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        with pytest.raises(ValueError):
            QuadrupedJoystick(height_scan=3)

    def test_flat_scan_is_zero_at_stand_height(self):
        env = self._env(Terrain())
        s = env.reset(jax.random.key(0))
        assert env.observation_size["height_scan"] == 9
        np.testing.assert_allclose(
            np.asarray(s.obs["height_scan"]), 0.0, atol=1e-6
        )

    def test_slope_reads_negative_ahead_and_rotates_with_yaw(self):
        # Ground rising in +x: samples ahead of the trunk are higher
        # ground → smaller trunk clearance → negative scan values.
        slope = 0.1
        env = self._env(inclined(slope_x=slope))
        s = env.reset(jax.random.key(0))
        q = dict(s.data)
        qpos = q["qpos"]
        scan = env._height_scan_obs(qpos)
        n, e = 3, 0.4
        grid = np.asarray(scan).reshape(n, n)  # [dx index, dy index]
        x0 = float(qpos[0])
        # value(dx) = (stand + slope·x0) − slope·(x0+dx) − stand = −slope·dx
        np.testing.assert_allclose(grid[2, :], -slope * e, atol=1e-5)
        np.testing.assert_allclose(grid[0, :], slope * e, atol=1e-5)
        np.testing.assert_allclose(grid[1, :], 0.0, atol=1e-5)
        # Yaw π/2: a trunk-frame offset (dx, dy) lands at world
        # (−dy, dx), so the x-gradient moves to the dy axis with sign
        # flipped: value = −slope·world_dx = +slope·dy.
        qpos_rot = qpos.at[3:7].set(
            jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
        )
        grid_rot = np.asarray(env._height_scan_obs(qpos_rot)).reshape(n, n)
        np.testing.assert_allclose(grid_rot[:, 0], -slope * e, atol=1e-5)
        np.testing.assert_allclose(grid_rot[:, 2], slope * e, atol=1e-5)
        np.testing.assert_allclose(grid_rot[0, :], grid_rot[2, :], atol=1e-5)

    def test_scan_env_runs_under_jit(self):
        env = self._env(rough_terrain(seed=5, amplitude=0.03), n=5)
        assert env.observation_size["height_scan"] == 25

        @jax.jit
        def run(key):
            s = env.reset(key)
            s = env.step(s, jnp.zeros(env.action_size))
            return s

        s = run(jax.random.key(1))
        assert s.obs["height_scan"].shape == (25,)
        assert bool(jnp.isfinite(s.obs["height_scan"]).all())


class TestRoughLeggedEnv:
    @pytest.fixture(scope="class")
    def env(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        return QuadrupedJoystick(
            terrain=rough_terrain(seed=2, amplitude=0.03, wavelength=1.5)
        )

    def test_spawn_tracks_local_ground(self, env):
        keys = jax.random.split(jax.random.key(0), 8)
        states = jax.vmap(env.reset)(keys)
        qpos = states.data["qpos"]
        xys = np.asarray(qpos[:, 0:2])
        assert np.ptp(xys[:, 0]) > 0.5  # spawns actually spread out
        hs = np.asarray(jax.vmap(env.terrain.height)(qpos[:, 0:2]))
        np.testing.assert_allclose(
            np.asarray(qpos[:, 2]) - hs, env.stand_height, atol=1e-5
        )
        # Height metric is ground-relative.
        np.testing.assert_allclose(
            np.asarray(states.metrics["trunk_height"]),
            env.stand_height,
            atol=1e-5,
        )

    def test_steps_stay_finite_and_grounded(self, env):
        @jax.jit
        def run(key):
            s = env.reset(key)

            def body(s, _):
                s = env.step(s, jnp.zeros(env.action_size))
                return s, (s.data["qpos"], s.metrics["trunk_height"])

            return jax.lax.scan(body, s, None, length=25)

        _, (qpos, h) = run(jax.random.key(4))
        assert bool(jnp.isfinite(qpos).all())
        # Standing at the default pose: never tunnels through the
        # terrain, never launches.
        assert float(h.min()) > 0.05
        assert float(h.max()) < 1.0

    def test_done_is_ground_relative(self, env):
        s = env.reset(jax.random.key(0))
        q = dict(s.data)
        # Place the trunk at an absolute z that would be "fallen" on
        # flat ground but is healthy above a terrain bump — done must
        # consult the LOCAL ground, so craft a point where h > 0.
        terr = env.terrain
        xy = None
        for probe in np.linspace(-4, 4, 161):
            p = jnp.array([probe, 0.0], jnp.float32)
            if float(terr.height(p)) > 0.04:
                xy = p
                break
        assert xy is not None
        h_local = terr.height(xy)
        qpos = q["qpos"]
        qpos = qpos.at[0:2].set(xy)
        # Absolute z below flat-ground min_height but fine locally:
        z = h_local + env.min_height + 0.05
        qpos = qpos.at[2].set(z)
        q["qpos"] = qpos
        assert float(env._done(q)) == 0.0
        # And genuinely fallen relative to local ground:
        q2 = dict(q)
        q2["qpos"] = qpos.at[2].set(h_local + env.min_height - 0.05)
        assert float(env._done(q2)) == 1.0
