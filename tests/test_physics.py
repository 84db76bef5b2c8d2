"""Rigid-body engine validation.

The load-bearing gate is exactness against an independent analytic
model: a serial hinge chain built in the engine must produce the same
joint accelerations as the closed-form n-link pendulum equations used
by ``envs/chain.py`` (two completely different derivations — spatial
algebra CRBA/RNEA vs textbook Lagrangian — agreeing to float precision).
Plus conservation laws, contact sanity, and the quadruped model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.envs.chain import NLinkSwingup
from nnx_ppo_tpu.physics import ModelBuilder, forward_dynamics, step
from nnx_ppo_tpu.physics.engine import (
    body_velocities,
    contact_generalized_forces,
    fwd_kinematics,
    mass_matrix,
)
from nnx_ppo_tpu.physics.model import BALL, FREE, HINGE, SLIDE
from nnx_ppo_tpu.physics.models import make_quadruped
from nnx_ppo_tpu.physics.models.quadruped import default_qpos
from nnx_ppo_tpu.physics.spatial import quat_from_axis_angle, quat_to_rot


def build_chain_model(n, lengths, masses, damping=0.0, gravity=-9.8):
    """Serial pendulum in the x-z plane matching envs/chain.py: hinges
    about +y, segments along +z (up at q=0), a point mass at the distal
    end of each massless rod. Coordinate correspondence to the analytic
    model is handled in the test (absolute vs relative angles)."""
    b = ModelBuilder(gravity=gravity)
    prev = None
    for i in range(n):
        b.add_body(
            f"link{i}",
            parent=prev,
            joint=HINGE,
            axis=(0.0, 1.0, 0.0),
            pos=(0.0, 0.0, lengths[i - 1] if i > 0 else 0.0),
            mass=masses[i],
            com=(0.0, 0.0, lengths[i]),
            inertia=(0.0, 0.0, 0.0),  # point mass at the rod end
            damping=damping,
        )
        prev = f"link{i}"
    return b.finalize()


class TestChainExactness:
    @pytest.mark.parametrize("n", [1, 3, 5])
    def test_accelerations_match_analytic_pendulum(self, n):
        lengths = np.linspace(0.2, 0.4, n)
        masses = np.linspace(0.5, 1.5, n)
        env = NLinkSwingup(
            n_links=n, link_mass=1.0, dt=0.02, damping=0.0, gravity=9.8
        )
        # Overwrite env constants with the heterogeneous test values.
        env.lengths = jnp.asarray(lengths, jnp.float32)
        env.masses = jnp.asarray(masses, jnp.float32)
        env._tail_mass = jnp.cumsum(env.masses[::-1])[::-1]

        model = build_chain_model(n, lengths, masses, damping=0.0)

        # The analytic model's coordinates are ABSOLUTE link angles θ
        # (each from vertical); the engine's are RELATIVE joint angles
        # q. θ = L q with L lower-triangular ones, θ̈ = L q̈, and
        # generalized torques transform contravariantly: τ_q = Lᵀ τ_θ.
        # (Damping is off: the two models damp different coordinates.)
        L = np.tril(np.ones((n, n), np.float32))
        key = jax.random.key(0)
        for trial in range(3):
            key, k1, k2, k3 = jax.random.split(key, 4)
            theta = jax.random.uniform(k1, (n,), minval=-2.5, maxval=2.5)
            theta_dot = jax.random.uniform(k2, (n,), minval=-3.0, maxval=3.0)
            tau = jax.random.uniform(k3, (n,), minval=-2.0, maxval=2.0)

            analytic = env._accel(theta, theta_dot, tau)

            # Sign: with hinge axis +y and segments along +z, positive
            # engine angle tilts toward +x; both systems are symmetric
            # under a global sign flip, so map 1:1.
            q = jnp.linalg.solve(L, theta)
            qd = jnp.linalg.solve(L, theta_dot)
            engine_tau = L.T @ tau
            qacc, _ = forward_dynamics(model, q, qd, engine_tau)
            np.testing.assert_allclose(
                np.asarray(L @ qacc),
                np.asarray(analytic),
                rtol=2e-3,
                atol=2e-3,
            )

    def test_energy_conservation_passive(self):
        """Undamped, untorqued 3-link chain: total energy drift over a
        short horizon is integrator-order small."""
        n = 3
        lengths = np.full(n, 0.3)
        masses = np.full(n, 1.0)
        model = build_chain_model(n, lengths, masses, damping=0.0)
        q0 = jnp.array([0.6, -0.4, 0.2])
        qd0 = jnp.zeros(n)

        def energy(q, qd):
            kin = fwd_kinematics(model, q)
            M = mass_matrix(model, kin)
            ke = 0.5 * qd @ M @ qd
            pe = 0.0
            # Point masses at the distal end of each link.
            for i in range(n):
                tip_local = jnp.array([0.0, 0.0, lengths[i]])
                z = (kin.p[i] + kin.E[i] @ tip_local)[2]
                pe += masses[i] * 9.81 * z
            return ke + pe

        h = 1e-4
        qpos, qvel = q0, qd0
        e0 = float(energy(qpos, qvel))

        @jax.jit
        def advance(qpos, qvel):
            return step(model, qpos, qvel, jnp.zeros(n), h, n_substeps=500)

        for _ in range(4):  # 0.2 s total
            qpos, qvel, _ = advance(qpos, qvel)
        e1 = float(energy(qpos, qvel))
        assert abs(e1 - e0) < 2e-3 * max(1.0, abs(e0)), (e0, e1)


class TestFreeBody:
    def ball_model(self, gravity=0.0):
        b = ModelBuilder(gravity=gravity)
        b.add_body("ball", joint=FREE, mass=2.0, inertia=(0.08, 0.05, 0.03))
        return b.finalize()

    def test_momentum_conservation_no_gravity(self):
        """Free rigid body, no gravity/contact: world-frame linear and
        angular momentum are conserved under tumbling."""
        model = self.ball_model(gravity=0.0)
        qpos = jnp.array([0.0, 0.0, 5.0, 1.0, 0.0, 0.0, 0.0])
        qvel = jnp.array([3.0, 1.0, -2.0, 0.5, -0.2, 0.8])  # ω, v (body)

        def momenta(qpos, qvel):
            E = quat_to_rot(qpos[3:7])
            omega, v = qvel[0:3], qvel[3:6]
            I = jnp.diag(jnp.array([0.08, 0.05, 0.03]))
            lin = 2.0 * (E @ v)
            ang = E @ (I @ omega)
            return lin, ang

        lin0, ang0 = momenta(qpos, qvel)
        qpos, qvel, _ = jax.jit(
            lambda qp, qv: step(model, qp, qv, jnp.zeros(6), 1e-3,
                                n_substeps=400)
        )(qpos, qvel)
        lin1, ang1 = momenta(qpos, qvel)
        # Semi-implicit Euler has O(dt) momentum drift in the rotating
        # frame; 0.4 s of fast tumbling stays well under 1%.
        np.testing.assert_allclose(lin1, lin0, rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(ang1, ang0, rtol=1e-2, atol=1e-2)

    def test_projectile(self):
        """Ballistic flight matches closed form."""
        model = self.ball_model(gravity=-9.81)
        qpos = jnp.array([0.0, 0.0, 5.0, 1.0, 0.0, 0.0, 0.0])
        qvel = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 2.0])
        t = 0.5
        qpos, qvel, _ = jax.jit(
            lambda qp, qv: step(model, qp, qv, jnp.zeros(6), 1e-3,
                                n_substeps=500)
        )(qpos, qvel)
        np.testing.assert_allclose(float(qpos[0]), 1.0 * t, atol=1e-3)
        np.testing.assert_allclose(
            float(qpos[2]), 5.0 + 2.0 * t - 0.5 * 9.81 * t**2, atol=5e-3
        )

    def test_ball_settles_on_ground(self):
        """Dropped contact sphere comes to rest near zero penetration
        force balance: fn ≈ m·g."""
        b = ModelBuilder(gravity=-9.81)
        b.add_body("ball", joint=FREE, mass=2.0, inertia=(0.01, 0.01, 0.01))
        b.add_sphere_geom("ball", (0.0, 0.0, 0.0), 0.1)
        model = b.finalize(contact_stiffness=5_000.0, contact_damping=150.0)
        qpos = jnp.array([0.0, 0.0, 0.3, 1.0, 0.0, 0.0, 0.0])
        qvel = jnp.zeros(6)
        qpos, qvel, fn = jax.jit(
            lambda qp, qv: step(model, qp, qv, jnp.zeros(6), 2e-3,
                                n_substeps=1500)
        )(qpos, qvel)
        assert abs(float(qvel[5])) < 0.05  # settled
        np.testing.assert_allclose(float(fn[0]), 2.0 * 9.81, rtol=0.1)
        # Rests at radius minus static penetration fn/k.
        expected_z = 0.1 - 2.0 * 9.81 / 5_000.0
        np.testing.assert_allclose(float(qpos[2]), expected_z, atol=5e-3)


class TestSlideJoint:
    def test_cartpole_matches_analytic(self):
        """Slide(cart) + hinge(pole) reproduces the classic Barto-Sutton
        cart-pole accelerations (the analytic dynamics of
        ``envs/classic.py::_Cartpole``) exactly: the 4/3 factor there is
        the rod inertia about the pivot, i.e. I_com = m·l²/3 here."""
        M, m, l, g = 1.0, 0.1, 0.5, 9.8
        b = ModelBuilder(gravity=-g)
        b.add_body("cart", joint=SLIDE, axis=(1, 0, 0), mass=M,
                   inertia=(0.0, 0.0, 0.0))
        b.add_body("pole", parent="cart", joint=HINGE, axis=(0, 1, 0),
                   mass=m, com=(0.0, 0.0, l),
                   inertia=(m * l * l / 3, m * l * l / 3, 0.0))
        model = b.finalize()

        def analytic(th, thd, force):
            total = M + m
            ml = m * l
            c, s = np.cos(th), np.sin(th)
            temp = (force + ml * thd**2 * s) / total
            th_acc = (g * s - c * temp) / (
                l * (4.0 / 3.0 - m * c * c / total)
            )
            return temp - ml * th_acc * c / total, th_acc

        rng = np.random.default_rng(3)
        for _ in range(4):
            x, th, xd, thd, force = rng.uniform(-2.0, 2.0, 5)
            qacc, _ = forward_dynamics(
                model,
                jnp.array([x, th], jnp.float32),
                jnp.array([xd, thd], jnp.float32),
                jnp.array([force, 0.0], jnp.float32),
            )
            x_acc, th_acc = analytic(th, thd, force)
            np.testing.assert_allclose(
                np.asarray(qacc), [x_acc, th_acc], rtol=1e-4, atol=1e-4
            )

    def test_vertical_slide_free_fall(self):
        """An unforced vertical prismatic dof is plain free fall."""
        b = ModelBuilder(gravity=-9.81)
        b.add_body("mass", joint=SLIDE, axis=(0, 0, 1), mass=3.0,
                   inertia=(0.01, 0.01, 0.01))
        model = b.finalize()
        qacc, _ = forward_dynamics(
            model, jnp.array([0.4]), jnp.array([1.3]), jnp.zeros(1)
        )
        np.testing.assert_allclose(float(qacc[0]), -9.81, rtol=1e-5)


class TestBallJoint:
    I_SPH = 2.0 / 5.0 * 1.2 * 0.05**2  # small bob sphere inertia

    def pendulum(self, joint):
        b = ModelBuilder(gravity=-9.81)
        kwargs = {} if joint == BALL else {"axis": (0.0, 1.0, 0.0)}
        b.add_body("bob", joint=joint, mass=1.2, com=(0.0, 0.0, -0.4),
                   inertia=(self.I_SPH,) * 3, **kwargs)
        return b.finalize()

    def test_planar_matches_hinge(self):
        """A ball-joint pendulum started in-plane (ω along the hinge
        axis) follows the hinge-joint pendulum exactly — two different
        joint parameterizations of the same motion."""
        mb, mh = self.pendulum(BALL), self.pendulum(HINGE)
        th0, thd0 = 0.7, -0.3
        y_axis = jnp.array([0.0, 1.0, 0.0])
        qb = quat_from_axis_angle(y_axis, jnp.array(th0))
        qb, vb, _ = step(mb, qb, jnp.array([0.0, thd0, 0.0]),
                         jnp.zeros(3), 1e-3, n_substeps=1000)
        qh, vh, _ = step(mh, jnp.array([th0]), jnp.array([thd0]),
                         jnp.zeros(1), 1e-3, n_substeps=1000)
        np.testing.assert_allclose(
            np.asarray(qb),
            np.asarray(quat_from_axis_angle(y_axis, qh[0])),
            atol=1e-5,
        )
        np.testing.assert_allclose(float(vb[1]), float(vh[0]), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(vb[jnp.array([0, 2])]), 0.0, atol=1e-6
        )

    def test_energy_conservation_3d(self):
        """Spherical pendulum with out-of-plane velocity (genuinely 3-D
        motion: precession + nutation) conserves total energy."""
        model = self.pendulum(BALL)
        q0 = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]),
                                  jnp.array(0.9))
        v0 = jnp.array([0.2, 1.5, 3.0])

        def energy(q, w):
            kin = fwd_kinematics(model, q)
            ke = 0.5 * w @ mass_matrix(model, kin) @ w
            com_w = quat_to_rot(q) @ jnp.array([0.0, 0.0, -0.4])
            return ke + 1.2 * 9.81 * com_w[2]

        e0 = float(energy(q0, v0))
        q1, v1, _ = jax.jit(
            lambda q, w: step(model, q, w, jnp.zeros(3), 1e-4,
                              n_substeps=5000)
        )(q0, v0)
        e1 = float(energy(q1, v1))
        assert abs(e1 - e0) < 2e-3 * abs(e0), (e0, e1)


class TestSpherePairs:
    def test_static_penetration_force(self):
        """Held penetration φ with zero velocity → pair normal force is
        exactly k·φ, projected with opposite signs so the pair is
        internal (zero net generalized force on a dof carrying both
        bodies)."""
        b = ModelBuilder(gravity=0.0)
        b.add_body("a", joint=SLIDE, axis=(0, 0, 1), mass=1.0,
                   inertia=(0.01,) * 3)
        ga = b.add_sphere_geom("a", (0.0, 0.0, 0.0), 0.1)
        b.add_body("c", parent="a", joint=SLIDE, axis=(0, 0, 1),
                   pos=(0.0, 0.0, 0.15), mass=1.0, inertia=(0.01,) * 3)
        gc = b.add_sphere_geom("c", (0.0, 0.0, 0.0), 0.1)
        b.add_collision_pair(ga, gc)
        model = b.finalize(
            contact_stiffness=1000.0, contact_damping=0.0, friction=0.5
        )
        kin = fwd_kinematics(model, jnp.zeros(2))
        vel = body_velocities(model, kin, jnp.zeros(2))
        tau, normals = contact_generalized_forces(model, kin, vel)
        # Centers 0.15 apart, radii sum 0.2 → φ = 0.05, fn = 50. Geom a
        # also penetrates the ground by 0.1 → 100; geom c is clear.
        np.testing.assert_allclose(
            np.asarray(normals), [100.0, 0.0, 50.0], rtol=1e-5
        )
        # Child dof feels +50 (pushed up the axis); the base dof carries
        # both bodies, so the pair cancels and only the ground remains.
        np.testing.assert_allclose(
            np.asarray(tau), [100.0, 50.0], rtol=1e-5
        )

    def test_internal_forces_conserve_momentum(self):
        """Free-floating base + hinged arm with overlapping spheres, no
        gravity: the pair contact (with friction and damping) is
        internal, so total linear momentum is conserved through the
        collision."""
        b = ModelBuilder(gravity=0.0)
        b.add_body("base", joint=FREE, mass=1.0, inertia=(0.02,) * 3)
        g0 = b.add_sphere_geom("base", (0.0, 0.0, 0.0), 0.12)
        b.add_body("arm", parent="base", joint=HINGE, axis=(0, 1, 0),
                   mass=0.8, com=(0.2, 0.0, 0.0), inertia=(0.01,) * 3)
        g1 = b.add_sphere_geom("arm", (0.2, 0.0, 0.0), 0.12)
        b.add_collision_pair(g0, g1)
        model = b.finalize(
            contact_stiffness=2000.0, contact_damping=20.0, friction=0.6
        )
        qpos = jnp.array([0.0, 0.0, 5.0, 1.0, 0.0, 0.0, 0.0, 0.3])
        qvel = jnp.array([0.1, -0.2, 0.3, 0.5, 0.2, -0.1, 2.0])

        def momentum(qp, qv):
            kin = fwd_kinematics(model, qp)
            vel = body_velocities(model, kin, qv)
            lin = jnp.zeros(3)
            for i in range(model.n_bodies):
                w, vl = vel[i][:3], vel[i][3:]
                com = jnp.asarray(model.com[i], jnp.float32)
                v_com = kin.E[i] @ (vl + jnp.cross(w, com))
                lin = lin + model.mass[i] * v_com
            return lin

        p0 = momentum(qpos, qvel)
        qp, qv, fn = jax.jit(
            lambda a, b_: step(model, a, b_, jnp.zeros(7), 5e-4,
                               n_substeps=800)
        )(qpos, qvel)
        assert float(fn[-1]) > 0.0  # the pair really is in contact
        np.testing.assert_allclose(
            np.asarray(momentum(qp, qv)), np.asarray(p0), atol=1e-3
        )

    def test_builder_rejects_bad_pairs(self):
        b = ModelBuilder()
        b.add_body("a", joint=SLIDE, axis=(0, 0, 1), mass=1.0)
        ga = b.add_sphere_geom("a", (0.0, 0.0, 0.0), 0.1)
        gb = b.add_sphere_geom("a", (0.2, 0.0, 0.0), 0.1)
        with pytest.raises(ValueError):
            b.add_collision_pair(ga, ga)  # self
        with pytest.raises(ValueError):
            b.add_collision_pair(ga, gb)  # same body
        with pytest.raises(ValueError):
            b.add_collision_pair(ga, 7)  # out of range


class TestJointLimits:
    def limited_pendulum(self, limit):
        b = ModelBuilder(gravity=-9.81)
        b.add_body("rod", joint=HINGE, axis=(0.0, 1.0, 0.0), mass=1.0,
                   com=(0.0, 0.0, -0.3), inertia=(0.03, 0.03, 0.001),
                   damping=0.5, limit=limit)
        return b.finalize()

    def test_unlimited_model_pays_nothing(self):
        from nnx_ppo_tpu.physics import limit_torques

        model = self.limited_pendulum(None)
        assert limit_torques(model, jnp.zeros(1), jnp.zeros(1)) is None

    def test_static_violation_torque(self):
        from nnx_ppo_tpu.physics import limit_torques

        model = self.limited_pendulum((-0.5, 0.5))
        tau = limit_torques(model, jnp.array([0.7]), jnp.zeros(1))
        np.testing.assert_allclose(
            float(tau[0]), -model.limit_stiffness * 0.2, rtol=1e-5
        )
        tau = limit_torques(model, jnp.array([-0.6]), jnp.zeros(1))
        np.testing.assert_allclose(
            float(tau[0]), model.limit_stiffness * 0.1, rtol=1e-5
        )
        # Inside the range: exactly zero (damping gated by violation).
        tau = limit_torques(model, jnp.array([0.3]), jnp.array([5.0]))
        assert float(tau[0]) == 0.0

    def test_swing_settles_at_limit(self):
        """A pendulum swung hard against its range comes to rest at the
        spring equilibrium just past the limit instead of swinging
        through."""
        model = self.limited_pendulum((-0.4, 0.4))
        qpos, qvel = jnp.array([0.0]), jnp.array([6.0])
        qpos, qvel, _ = jax.jit(
            lambda qp, qv: step(model, qp, qv, jnp.zeros(1), 1e-3,
                                n_substeps=4000)
        )(qpos, qvel)
        assert abs(float(qvel[0])) < 0.05  # settled
        # Gravity pulls back toward hanging; rest is within the range or
        # a hair past the limit (penalty-spring compliance), never deep.
        assert -0.45 < float(qpos[0]) < 0.45, float(qpos[0])

    def test_limit_respected_in_quadruped(self):
        """With joint_limits=True, driving the knees hard past their
        range stalls near the bound; without limits the same command
        folds much further."""
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        action = jnp.tile(jnp.array([0.0, 0.0, 1.0]), 4)  # extend knees
        knees = {}
        for limited in (False, True):
            env = QuadrupedJoystick(joint_limits=limited, kp=200.0,
                                    action_scale=1.5)
            state = env.reset(jax.random.key(0))
            stepf = jax.jit(env.step)
            for _ in range(25):
                state = stepf(state, action)
            knees[limited] = float(state.data["qpos"][9])  # FR knee
        # Knee range is [-2.82, -0.89]; the PD target (-1.6 + 1.5) sits
        # far above the -0.89 bound.
        assert knees[True] < -0.80, knees
        assert knees[False] > knees[True] + 0.2, knees

    def test_builder_rejects_bad_limits(self):
        b = ModelBuilder()
        with pytest.raises(ValueError):
            b.add_body("x", joint=BALL, mass=1.0, limit=(-1.0, 1.0))
        b2 = ModelBuilder()
        with pytest.raises(ValueError):
            b2.add_body("x", joint=HINGE, mass=1.0, limit=(1.0, -1.0))


class TestQuadruped:
    def test_stands_under_pd_control(self):
        """PD control toward the nominal pose keeps the trunk near
        standing height with all four feet loaded."""
        model = make_quadruped()
        qpos = jnp.asarray(default_qpos(model))
        qvel = jnp.zeros(model.nv)
        target = qpos[7:]

        @jax.jit
        def control_step(qpos, qvel):
            # Derivative gain lives in model.damping (implicit — see
            # engine.forward_dynamics); only the P term is explicit.
            tau_j = 60.0 * (target - qpos[7:])
            tau = jnp.concatenate([jnp.zeros(6), tau_j])
            return step(model, qpos, qvel, tau, 0.002, n_substeps=10)

        for _ in range(100):  # 2 seconds
            qpos, qvel, fn = control_step(qpos, qvel)
        trunk_z = float(qpos[2])
        assert 0.25 < trunk_z < 0.34, trunk_z
        foot_forces = np.asarray(fn[:4])
        assert (foot_forces > 5.0).all(), foot_forces
        # Total vertical support ≈ weight.
        total_mass = float(np.sum(model.mass))
        np.testing.assert_allclose(
            foot_forces.sum(), total_mass * 9.81, rtol=0.25
        )

    def test_falls_without_actuation(self):
        model = make_quadruped()
        qpos = jnp.asarray(default_qpos(model))
        qvel = jnp.zeros(model.nv)
        qpos, qvel, _ = jax.jit(
            lambda qp, qv: step(model, qp, qv, jnp.zeros(model.nv), 0.002,
                                n_substeps=500)
        )(qpos, qvel)
        assert float(qpos[2]) < 0.2  # collapsed


class TestHumanoid:
    def test_stands_briefly_under_pd(self):
        """Joint-space PD holds the biped upright for 1 simulated second
        (balance itself is actively unstable — the RL task); feet load
        with the body weight."""
        from nnx_ppo_tpu.physics.models import make_humanoid
        from nnx_ppo_tpu.physics.models.humanoid import (
            default_qpos as humanoid_qpos,
        )

        model = make_humanoid()
        qpos = jnp.asarray(humanoid_qpos(model))
        qvel = jnp.zeros(model.nv)
        target = qpos[7:]

        @jax.jit
        def control_step(qpos, qvel):
            tau_j = 350.0 * (target - qpos[7:])
            tau = jnp.concatenate([jnp.zeros(6), tau_j])
            return step(model, qpos, qvel, tau, 0.002, n_substeps=10)

        for _ in range(50):  # 1 second
            qpos, qvel, fn = control_step(qpos, qvel)
        assert float(qpos[2]) > 0.7, float(qpos[2])
        total_mass = float(np.sum(model.mass))
        np.testing.assert_allclose(
            float(fn[:4].sum()), total_mass * 9.81, rtol=0.3
        )

    def test_env_protocol_and_ppo(self):
        from nnx_ppo_tpu.envs import HumanoidJoystick

        env = HumanoidJoystick()
        state = env.reset(jax.random.key(0))
        assert state.obs["proprio"].shape == (36,)
        assert float(state.done) == 0.0
        nxt = jax.jit(env.step)(state, jnp.zeros(10))
        assert jnp.isfinite(nxt.reward["tracking"])


class TestMassMatrixReuse:
    def test_reuse_close_to_exact_over_control_step(self):
        """With the factor held over 10 substeps (20 ms), the state
        after ONE control step stays close to the exact-dynamics state
        (joint angles move little, so M is nearly constant; longer
        horizons diverge through the chaotic contact dynamics for both
        integrators alike)."""
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        exact = QuadrupedJoystick()
        fast = QuadrupedJoystick(reuse_mass_matrix=True)
        s_e = exact.reset(jax.random.key(0))
        s_f = fast.reset(jax.random.key(0))
        a = 0.3 * jnp.sin(jnp.arange(12.0))
        s_e = exact.step(s_e, a)
        s_f = fast.step(s_f, a)
        np.testing.assert_allclose(
            np.asarray(s_f.data["qpos"]),
            np.asarray(s_e.data["qpos"]),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(s_f.data["qvel"]),
            np.asarray(s_e.data["qvel"]),
            atol=1e-1,
        )

    def test_reuse_stands(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        env = QuadrupedJoystick(reuse_mass_matrix=True)
        state = env.reset(jax.random.key(0))
        step = jax.jit(env.step)
        for _ in range(50):  # 1 s
            state = step(state, jnp.zeros(12))
        assert float(state.data["qpos"][2]) > 0.15
        assert not bool(state.done)
