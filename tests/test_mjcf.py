"""MJCF import cross-validated against the MuJoCo C engine itself.

``physics/mjcf.py`` translates compiled MjModels into engine Models;
these tests assert the translated SMOOTH dynamics (mass matrix, bias,
gravity, damping, armature) match ``mj_fullM``/``mj_forward`` to float
tolerance — two fully independent implementations agreeing on the same
robot — plus geometry (world geom centers) and contact-import rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from nnx_ppo_tpu.physics.engine import (
    forward_dynamics,
    fwd_kinematics,
    geom_world_centers,
    mass_matrix,
    step,
)
from nnx_ppo_tpu.physics.mjcf import from_mjcf, from_mjcf_scene

# A gnarly fixed-base arm: rotated child frames (body_quat), off-origin
# joint anchors (jnt_pos), off-axis COMs, full per-joint damping /
# armature / asymmetric inertia — everything the frame unroll must get
# right at once.
ARM_XML = """
<mujoco>
  <option gravity="0 0 -9.81"/>
  <compiler angle="radian"/>
  <worldbody>
    <body name="upper" pos="0.1 0.2 1.0" quat="0.9238795 0 0.3826834 0">
      <joint name="shoulder" type="hinge" axis="0 1 0" pos="0.02 0 0.03"
             damping="0.7" armature="0.015"/>
      <inertial pos="0.05 0.01 -0.15" mass="1.4"
                fullinertia="0.011 0.013 0.007 0.0005 0.0002 0.0008"/>
      <body name="fore" pos="0 0 -0.3" quat="0.9659258 0.2588190 0 0">
        <joint name="elbow" type="hinge" axis="1 0 0" pos="0 0.01 0"
               damping="0.4" armature="0.008"/>
        <inertial pos="0 -0.02 -0.12" mass="0.8"
                  diaginertia="0.006 0.006 0.001"/>
        <body name="wrist_weld" pos="0 0 -0.25" quat="0.7071068 0 0 0.7071068">
          <inertial pos="0.01 0 -0.02" mass="0.3"
                    diaginertia="0.0012 0.0011 0.0007"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

FREE_TREE_XML = """
<mujoco>
  <option gravity="0 0 -9.81"/>
  <compiler angle="radian"/>
  <worldbody>
    <body name="trunk" pos="0.3 -0.2 0.9" quat="0.9914449 0 0.1305262 0">
      <freejoint/>
      <inertial pos="0.02 0 0.05" mass="3.1" diaginertia="0.04 0.05 0.03"/>
      <body name="leg" pos="0.1 0.05 -0.1" quat="0.9961947 0.0871557 0 0">
        <joint type="hinge" axis="0 1 0" pos="0 0 0.02" damping="0.9"
               armature="0.01"/>
        <inertial pos="0 0 -0.2" mass="0.6" diaginertia="0.004 0.004 0.0008"/>
        <body name="foot" pos="0 0 -0.35">
          <joint type="hinge" axis="1 0 0" damping="0.3" armature="0.005"/>
          <inertial pos="0.02 0 -0.05" mass="0.2"
                    diaginertia="0.0008 0.0009 0.0004"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _mj_state(xml, qpos, qvel, tau):
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.qfrc_applied[:] = tau
    mujoco.mj_forward(m, d)
    M = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M)
    return m, d, M


class TestFixedBaseArm:
    def test_mass_matrix_matches_mujoco(self):
        imp = from_mjcf(ARM_XML)
        rng = np.random.RandomState(0)
        for _ in range(3):
            qpos = rng.uniform(-1.2, 1.2, size=2)
            _, _, M_mj = _mj_state(ARM_XML, qpos, np.zeros(2), np.zeros(2))
            kin = fwd_kinematics(imp.model, jnp.asarray(qpos, jnp.float32))
            M = np.asarray(mass_matrix(imp.model, kin))
            np.testing.assert_allclose(M, M_mj, rtol=1e-4, atol=1e-6)

    def test_qacc_matches_mujoco(self):
        imp = from_mjcf(ARM_XML)
        rng = np.random.RandomState(1)
        for _ in range(3):
            qpos = rng.uniform(-1.2, 1.2, size=2)
            qvel = rng.uniform(-2.0, 2.0, size=2)
            tau = rng.uniform(-3.0, 3.0, size=2)
            _, d, _ = _mj_state(ARM_XML, qpos, qvel, tau)
            qacc, _ = forward_dynamics(
                imp.model,
                jnp.asarray(qpos, jnp.float32),
                jnp.asarray(qvel, jnp.float32),
                jnp.asarray(tau, jnp.float32),
            )
            np.testing.assert_allclose(
                np.asarray(qacc), d.qacc, rtol=2e-4, atol=2e-3
            )

    def test_welded_body_merged(self):
        imp = from_mjcf(ARM_XML)
        # wrist_weld carries no joint: merged into 'fore'.
        assert imp.body_names == ("upper", "fore")
        assert imp.model.n_bodies == 2
        # Combined mass is exact.
        np.testing.assert_allclose(imp.model.mass[1], 0.8 + 0.3)


class TestFreeBaseTree:
    def test_qacc_matches_mujoco(self):
        imp = from_mjcf(FREE_TREE_XML)
        m = mujoco.MjModel.from_xml_string(FREE_TREE_XML)
        rng = np.random.RandomState(2)
        for _ in range(3):
            qpos = np.array(m.qpos0).copy()
            qpos[0:3] += 0.2 * rng.randn(3)
            quat = rng.randn(4)
            qpos[3:7] = quat / np.linalg.norm(quat)
            qpos[7:] = rng.uniform(-1.0, 1.0, size=m.nq - 7)
            qvel_mj = rng.uniform(-1.5, 1.5, size=m.nv)
            tau_mj = rng.uniform(-2.0, 2.0, size=m.nv)
            _, d, _ = _mj_state(FREE_TREE_XML, qpos, qvel_mj, tau_mj)

            # Convert velocity AND generalized force to engine dofs.
            # Free-base force dofs: MuJoCo [f_world(3), n_body(3)] →
            # engine [n_body(3), f_body(3)] with f_body = Eᵀ f_world.
            qvel = imp.qvel_from_mujoco(qpos, qvel_mj)
            E = np.asarray(
                fwd_kinematics(imp.model, jnp.asarray(qpos, jnp.float32)).E[0]
            )
            tau = np.asarray(tau_mj, np.float64).copy()
            tau[0:3] = tau_mj[3:6]
            tau[3:6] = E.T @ tau_mj[0:3]

            qacc, _ = forward_dynamics(
                imp.model,
                jnp.asarray(qpos, jnp.float32),
                jnp.asarray(qvel, jnp.float32),
                jnp.asarray(tau, jnp.float32),
            )
            expect = imp.qacc_from_mujoco(qpos, qvel_mj, d.qacc)
            np.testing.assert_allclose(
                np.asarray(qacc), expect, rtol=5e-4, atol=5e-3
            )

    def test_qpos0_and_geometry(self):
        xml = FREE_TREE_XML.replace(
            '<body name="foot" pos="0 0 -0.35">',
            '<body name="foot" pos="0 0 -0.35">'
            '<geom name="toe" type="sphere" size="0.04" pos="0.03 0 -0.06"/>',
        ).replace(
            "<worldbody>",
            '<worldbody><geom name="floor" type="plane" size="5 5 0.1"/>',
        )
        imp = from_mjcf(xml)
        assert imp.has_ground and imp.geom_names == ("toe",)
        m = mujoco.MjModel.from_xml_string(xml)
        d = mujoco.MjData(m)
        d.qpos[:] = m.qpos0
        mujoco.mj_forward(m, d)
        kin = fwd_kinematics(imp.model, jnp.asarray(imp.qpos0))
        centers = geom_world_centers(imp.model, kin)
        g_mj = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "toe")
        np.testing.assert_allclose(
            np.asarray(centers[0]), d.geom_xpos[g_mj], rtol=1e-5, atol=1e-5
        )


class TestTrajectoryParity:
    def test_mj_step_trajectory_matches(self):
        """Whole-trajectory agreement with ``mj_step``: MuJoCo's Euler
        integrator uses the same semi-implicit scheme with implicit
        joint damping as the engine, so 150 steps (0.3 s) of the
        passive arm stay within float noise — integrator semantics, not
        just instantaneous accelerations, match."""
        imp = from_mjcf(ARM_XML)
        m = mujoco.MjModel.from_xml_string(ARM_XML)
        m.opt.timestep = 0.002
        d = mujoco.MjData(m)
        rng = np.random.RandomState(5)
        q0 = rng.uniform(-0.8, 0.8, 2)
        v0 = rng.uniform(-1.0, 1.0, 2)
        d.qpos[:] = q0
        d.qvel[:] = v0
        mj_traj = []
        for _ in range(150):
            mujoco.mj_step(m, d)
            mj_traj.append(d.qpos.copy())

        def scan_steps(qp, qv):
            def body(c, _):
                qp, qv = c
                qp, qv, _ = step(
                    imp.model, qp, qv, jnp.zeros(2), 0.002, n_substeps=1
                )
                return (qp, qv), qp

            _, traj = jax.lax.scan(body, (qp, qv), None, length=150)
            return traj

        traj = jax.jit(scan_steps)(
            jnp.asarray(q0, jnp.float32), jnp.asarray(v0, jnp.float32)
        )
        np.testing.assert_allclose(
            np.asarray(traj), np.asarray(mj_traj), atol=5e-5
        )


class TestActuatorImport:
    XML = """
    <mujoco><compiler angle="radian"/><worldbody>
    <body pos="0 0 1"><joint name="j1" type="hinge" axis="0 1 0"/>
     <inertial pos="0 0 -0.2" mass="1" diaginertia="0.01 0.01 0.002"/>
     <body pos="0 0 -0.4"><joint name="j2" type="hinge" axis="0 1 0"/>
      <inertial pos="0 0 -0.2" mass="0.5" diaginertia="0.005 0.005 0.001"/>
     </body></body></worldbody>
    <actuator>
      <motor name="m1" joint="j1" gear="20" ctrlrange="-1 1"/>
      <position name="p2" joint="j2" kp="45" kv="2.5" ctrlrange="-0.8 0.8"/>
    </actuator></mujoco>"""

    def test_specs(self):
        imp = from_mjcf(self.XML)
        a1, a2 = imp.actuators
        assert (a1.kind, a1.joint, a1.dof, a1.gear) == ("motor", "j1", 0, 20.0)
        assert a1.ctrlrange == (-1.0, 1.0)
        assert (a2.kind, a2.joint, a2.dof) == ("position", "j2", 1)
        assert (a2.kp, a2.kv) == (45.0, 2.5)


class TestContactImportRules:
    def test_floorless_pairs_refuse(self):
        """<pair> contacts in a floorless MJCF must not vanish silently
        — the import refuses and points at force_contacts."""
        xml = """
        <mujoco><worldbody>
          <body pos="0 0 1"><freejoint/>
            <inertial pos="0 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
            <geom name="ga" type="sphere" size="0.1"/>
            <body pos="0.15 0 0"><joint type="hinge" axis="0 0 1"/>
              <inertial pos="0 0 0" mass="0.5" diaginertia="0.004 0.004 0.004"/>
              <geom name="gb" type="sphere" size="0.1"/>
            </body>
          </body>
        </worldbody>
        <contact><pair geom1="ga" geom2="gb"/></contact></mujoco>"""
        with pytest.raises(ValueError, match="force_contacts"):
            from_mjcf(xml)
        imp = from_mjcf(xml, force_contacts=True)
        assert imp.model.pair_geom_a == (0,)

    def test_no_floor_no_contacts(self):
        imp = from_mjcf(
            FREE_TREE_XML.replace(
                '<body name="foot" pos="0 0 -0.35">',
                '<body name="foot" pos="0 0 -0.35">'
                '<geom name="toe" type="sphere" size="0.04"/>',
            )
        )
        assert not imp.has_ground
        assert imp.model.geom_radius.size == 0
        assert "toe" in imp.skipped_geoms

    def test_ball_rests_on_imported_floor(self):
        xml = """
        <mujoco>
          <option gravity="0 0 -9.81"/>
          <worldbody>
            <geom name="floor" type="plane" size="3 3 0.1"/>
            <body name="ball" pos="0 0 0.5">
              <freejoint/>
              <inertial pos="0 0 0" mass="1.0" diaginertia="0.004 0.004 0.004"/>
              <geom name="sphere" type="sphere" size="0.1" friction="0.6 0.005 0.0001"/>
            </body>
          </worldbody>
        </mujoco>"""
        imp = from_mjcf(xml, contact_stiffness=4_000.0, contact_damping=80.0)
        assert imp.has_ground
        assert imp.model.friction == pytest.approx(0.6)
        qpos = jnp.asarray(imp.qpos0)
        qvel = jnp.zeros(6)
        run = jax.jit(
            lambda qp, qv: step(
                imp.model, qp, qv, jnp.zeros(6), 0.002, n_substeps=600
            )
        )
        qpos, qvel, _ = run(qpos, qvel)
        # Rests just above one radius (static penalty penetration).
        assert 0.08 < float(qpos[2]) <= 0.101
        assert abs(float(qvel[5])) < 0.05

    def test_pair_import(self):
        xml = """
        <mujoco>
          <worldbody>
            <geom name="floor" type="plane" size="3 3 0.1"/>
            <body name="a" pos="0 0 0.5"><freejoint/>
              <inertial pos="0 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
              <geom name="ga" type="sphere" size="0.1"/>
              <body name="b" pos="0.15 0 0">
                <joint type="hinge" axis="0 0 1"/>
                <inertial pos="0 0 0" mass="0.5" diaginertia="0.004 0.004 0.004"/>
                <geom name="gb" type="sphere" size="0.1"/>
              </body>
            </body>
          </worldbody>
          <contact><pair geom1="ga" geom2="gb"/></contact>
        </mujoco>"""
        imp = from_mjcf(xml)
        assert imp.model.pair_geom_a == (0,)
        assert imp.model.pair_geom_b == (1,)


class TestJointRef:
    XML = """
    <mujoco><option gravity="0 0 -9.81"/><compiler angle="radian"/>
    <worldbody>
      <body pos="0 0 1">
        <joint name="h" type="hinge" axis="0 1 0" ref="1.0" damping="0.2"/>
        <inertial pos="0 0 -0.25" mass="1.0" diaginertia="0.01 0.01 0.002"/>
        <body pos="0 0 -0.5">
          <joint name="s" type="slide" axis="0 0 1" ref="0.3"/>
          <inertial pos="0 0 -0.1" mass="0.4" diaginertia="0.003 0.003 0.001"/>
        </body>
      </body>
    </worldbody></mujoco>"""

    def test_hinge_and_slide_ref_match_mujoco(self):
        """MuJoCo moves joints by (q − ref); the engine by q. The ref
        folds into the frame unroll (hinge) / anchor shift (slide), so
        dynamics agree at ANY q — including qpos0 = ref itself."""
        imp = from_mjcf(self.XML)
        rng = np.random.RandomState(3)
        for qpos in (np.asarray(imp.qpos0, np.float64),
                     rng.uniform(-1.0, 1.0, 2)):
            qvel = rng.uniform(-1.0, 1.0, 2)
            tau = rng.uniform(-2.0, 2.0, 2)
            _, d, M_mj = _mj_state(self.XML, qpos, qvel, tau)
            qacc, _ = forward_dynamics(
                imp.model,
                jnp.asarray(qpos, jnp.float32),
                jnp.asarray(qvel, jnp.float32),
                jnp.asarray(tau, jnp.float32),
            )
            np.testing.assert_allclose(
                np.asarray(qacc), d.qacc, rtol=2e-4, atol=2e-3
            )
            kin = fwd_kinematics(imp.model, jnp.asarray(qpos, jnp.float32))
            np.testing.assert_allclose(
                np.asarray(mass_matrix(imp.model, kin)),
                M_mj,
                rtol=1e-4,
                atol=1e-6,
            )


class TestBallFrameConversion:
    XML = """
    <mujoco><option gravity="0 0 -9.81"/><compiler angle="radian"/>
    <worldbody>
      <body pos="0 0 1" quat="0.9238795 0 0.3826834 0">
        <joint name="b" type="ball" damping="0.1"/>
        <inertial pos="0.02 0 -0.2" mass="1.1" diaginertia="0.01 0.009 0.003"/>
      </body>
    </worldbody></mujoco>"""

    def test_ball_dofs_conjugated(self):
        """A ball joint on a rotated body frame: mj angular dofs live in
        the mj body frame, engine dofs in the unrolled frame — the
        converters must conjugate by W_R (regression: they used to pass
        ball dofs through unchanged)."""
        imp = from_mjcf(self.XML)
        assert len(imp.ball_dof_rotations) == 1
        rng = np.random.RandomState(7)
        quat = rng.randn(4)
        quat /= np.linalg.norm(quat)
        qvel_mj = rng.uniform(-1.0, 1.0, 3)
        m = mujoco.MjModel.from_xml_string(self.XML)
        d = mujoco.MjData(m)
        d.qpos[:] = quat
        d.qvel[:] = qvel_mj
        mujoco.mj_forward(m, d)

        # Engine state: conjugate the quaternion like qpos0 does.
        from nnx_ppo_tpu.physics.mjcf import _mat_to_quat, _quat_mul

        dof, W_R = imp.ball_dof_rotations[0]
        qA = _mat_to_quat(W_R)
        qAinv = qA * np.array([1.0, -1.0, -1.0, -1.0])
        qpos = _quat_mul(_quat_mul(qA, quat), qAinv)
        qvel = imp.qvel_from_mujoco(qpos, qvel_mj)
        tau = np.zeros(3)
        qacc, _ = forward_dynamics(
            imp.model,
            jnp.asarray(qpos, jnp.float32),
            jnp.asarray(qvel, jnp.float32),
            jnp.asarray(tau, jnp.float32),
        )
        expect = imp.qacc_from_mujoco(qpos, qvel_mj, d.qacc)
        np.testing.assert_allclose(
            np.asarray(qacc), expect, rtol=5e-4, atol=5e-3
        )


class TestLeggedFromMjcf:
    XML = """
    <mujoco><option gravity="0 0 -9.81"/><compiler angle="radian"/>
    <worldbody>
      <geom name="floor" type="plane" size="5 5 0.1"/>
      <body name="trunk" pos="0 0 0.4">
        <freejoint/>
        <inertial pos="0 0 0" mass="4.0" diaginertia="0.05 0.05 0.04"/>
        <body name="L" pos="0 0.1 0">
          <joint name="Lh" type="hinge" axis="0 1 0" damping="1.0"/>
          <inertial pos="0 0 -0.18" mass="0.8" diaginertia="0.006 0.006 0.001"/>
          <geom name="Lf" type="sphere" size="0.03" pos="0 0 -0.36"/>
        </body>
        <body name="R" pos="0 -0.1 0">
          <joint name="Rh" type="hinge" axis="0 1 0" damping="1.0"/>
          <inertial pos="0 0 -0.18" mass="0.8" diaginertia="0.006 0.006 0.001"/>
          <geom name="Rf" type="sphere" size="0.03" pos="0 0 -0.36"/>
        </body>
      </body>
    </worldbody>
    <actuator>
      <position joint="Lh" kp="50" kv="2" ctrlrange="-0.6 0.6"/>
      <position joint="Rh" kp="50" kv="2" ctrlrange="-0.6 0.6"/>
    </actuator></mujoco>"""

    def test_env_wiring(self):
        from nnx_ppo_tpu.envs import legged_from_mjcf

        env = legged_from_mjcf(self.XML, n_feet=2)
        assert env.kp == 50.0  # from the position actuators
        # kv folded into implicit joint damping: 1.0 (model) + 2.0 (kv).
        np.testing.assert_allclose(env.model.damping[6:], [3.0, 3.0])
        # Per-joint action scale from the ctrlrange half-widths.
        np.testing.assert_allclose(np.asarray(env.action_scale), [0.6, 0.6])
        assert env.stand_height == pytest.approx(0.4)
        assert env._plan is not None  # depthwise auto-selected

        state = env.reset(jax.random.key(0))
        step = jax.jit(env.step)
        for _ in range(25):  # 0.5 s of PD stand at the zero pose
            state = step(state, jnp.zeros(2))
        assert float(state.done) == 0.0
        assert 0.3 < float(state.data["qpos"][2]) < 0.45

    def test_motor_ctrlranges_are_not_action_scales(self):
        """Motor torque ctrlranges (e.g. ±23.7 N·m on a Go1) must NOT
        be misread as position-target half-widths."""
        from nnx_ppo_tpu.envs import legged_from_mjcf

        xml = self.XML.replace(
            '<position joint="Lh" kp="50" kv="2" ctrlrange="-0.6 0.6"/>',
            '<motor joint="Lh" gear="1" ctrlrange="-23.7 23.7"/>',
        ).replace(
            '<position joint="Rh" kp="50" kv="2" ctrlrange="-0.6 0.6"/>',
            '<motor joint="Rh" gear="1" ctrlrange="-23.7 23.7"/>',
        )
        env = legged_from_mjcf(xml, kp=40.0, n_feet=2)
        assert float(env.action_scale) == 0.5  # scalar fallback

    def test_requires_position_actuators_or_kp(self):
        from nnx_ppo_tpu.envs import legged_from_mjcf

        xml = self.XML.split("<actuator>")[0] + "</mujoco>"
        with pytest.raises(ValueError, match="kp"):
            legged_from_mjcf(xml)
        env = legged_from_mjcf(xml, kp=40.0)
        assert env.kp == 40.0 and float(env.action_scale) == 0.5


_GYM_ASSETS = (
    "/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets"
)


class TestRealModels:
    """The published gymnasium MuJoCo robots — ant (free base + welds +
    capsules), half_cheetah (planar root, joint springs), hopper /
    walker2d (planar roots via stacked slide-slide-hinge), humanoid
    (23 dof, free base + stacked joints + springs), point,
    inverted_pendulum — all import and their smooth dynamics match the
    MuJoCo C engine at random states."""

    @pytest.mark.parametrize(
        "name,tol",
        [
            ("ant", 1e-4),
            ("half_cheetah", 1e-4),
            ("hopper", 1e-4),
            ("walker2d", 1e-3),
            ("humanoid", 1e-2),
            ("point", 1e-4),
            ("inverted_pendulum", 1e-4),
        ],
    )
    def test_smooth_dynamics_match(self, name, tol):
        import dataclasses
        import os

        path = f"{_GYM_ASSETS}/{name}.xml"
        if not os.path.exists(path):
            pytest.skip("gymnasium assets not available")
        imp = from_mjcf(path)
        # Strip contacts and limits for the SMOOTH comparison: the
        # engine's penalty limits/contacts intentionally differ from
        # MuJoCo's constraint solver (we disable both sides).
        model = dataclasses.replace(
            imp.model,
            joint_lower=np.full(imp.model.nv, -np.inf),
            joint_upper=np.full(imp.model.nv, np.inf),
            geom_body=(),
            geom_offset=np.zeros((0, 3)),
            geom_radius=np.zeros(0),
            pair_geom_a=(),
            pair_geom_b=(),
        )
        m = mujoco.MjModel.from_xml_path(path)
        m.opt.disableflags |= (
            mujoco.mjtDisableBit.mjDSBL_CONTACT
            | mujoco.mjtDisableBit.mjDSBL_LIMIT
        )
        rng = np.random.RandomState(0)
        for _ in range(3):
            qpos = np.array(m.qpos0)
            for j in range(m.njnt):
                if int(m.jnt_type[j]) in (2, 3):
                    qpos[int(m.jnt_qposadr[j])] += 0.3 * rng.randn()
            qvel_mj = 0.5 * rng.randn(m.nv)
            d = mujoco.MjData(m)
            d.qpos[:] = qpos
            d.qvel[:] = qvel_mj
            mujoco.mj_forward(m, d)
            qacc, _ = forward_dynamics(
                model,
                jnp.asarray(qpos, jnp.float32),
                jnp.asarray(imp.qvel_from_mujoco(qpos, qvel_mj),
                            jnp.float32),
                jnp.zeros(m.nv),
            )
            expect = imp.qacc_from_mujoco(qpos, qvel_mj, d.qacc)
            rel = np.max(
                np.abs(np.asarray(qacc) - expect) / (1.0 + np.abs(expect))
            )
            assert rel < tol, f"{name}: rel err {rel:.2e}"

    _DM_SUITE = (
        "/opt/venv/lib/python3.12/site-packages/dm_control/suite"
    )

    @pytest.mark.parametrize(
        "name,tol",
        [
            ("cartpole", 1e-4),
            ("pendulum", 1e-4),
            ("acrobot", 1e-4),
            ("cheetah", 1e-4),
            ("walker", 1e-3),
            ("hopper", 1e-3),
            ("reacher", 1e-4),
            ("humanoid", 1e-2),  # 27 dof
        ],
    )
    def test_dm_control_suite_matches(self, name, tol):
        """Second independent model zoo: the dm_control suite robots
        compile (their own defaults/includes), import, and match
        mj_forward — same protocol as the gymnasium sweep."""
        import dataclasses
        import os

        path = f"{self._DM_SUITE}/{name}.xml"
        if not os.path.exists(path):
            pytest.skip("dm_control assets not available")
        m = mujoco.MjModel.from_xml_path(path)
        imp = from_mjcf(m)
        model = dataclasses.replace(
            imp.model,
            joint_lower=np.full(imp.model.nv, -np.inf),
            joint_upper=np.full(imp.model.nv, np.inf),
            geom_body=(),
            geom_offset=np.zeros((0, 3)),
            geom_radius=np.zeros(0),
            pair_geom_a=(),
            pair_geom_b=(),
        )
        m.opt.disableflags |= (
            mujoco.mjtDisableBit.mjDSBL_CONTACT
            | mujoco.mjtDisableBit.mjDSBL_LIMIT
        )
        rng = np.random.RandomState(0)
        for _ in range(2):
            qpos = np.array(m.qpos0)
            for j in range(m.njnt):
                if int(m.jnt_type[j]) in (2, 3):
                    qpos[int(m.jnt_qposadr[j])] += 0.3 * rng.randn()
            qvel_mj = 0.5 * rng.randn(m.nv)
            d = mujoco.MjData(m)
            d.qpos[:] = qpos
            d.qvel[:] = qvel_mj
            mujoco.mj_forward(m, d)
            qacc, _ = forward_dynamics(
                model,
                jnp.asarray(qpos, jnp.float32),
                jnp.asarray(
                    imp.qvel_from_mujoco(qpos, qvel_mj), jnp.float32
                ),
                jnp.zeros(m.nv),
            )
            expect = imp.qacc_from_mujoco(qpos, qvel_mj, d.qacc)
            rel = np.max(
                np.abs(np.asarray(qacc) - expect) / (1.0 + np.abs(expect))
            )
            assert rel < tol, f"{name}: rel err {rel:.2e}"

    def test_dm_control_multi_tree_scene(self):
        """dm_control's finger (manipulator + free spinner) is a
        two-tree world: the scene importer splits it."""
        import os

        path = f"{self._DM_SUITE}/finger.xml"
        if not os.path.exists(path):
            pytest.skip("dm_control assets not available")
        imp = from_mjcf_scene(mujoco.MjModel.from_xml_path(path))
        assert len(imp.scene.models) == 2

    def test_imported_ant_stands(self):
        """End-to-end on a real third-party robot: gymnasium's ant,
        imported and wrapped by legged_from_mjcf (range-center default
        pose, contact settings scaled to its ~0.9 kg mass), stands
        under PD without falling or launching."""
        import os

        from nnx_ppo_tpu.envs import legged_from_mjcf

        path = f"{_GYM_ASSETS}/ant.xml"
        if not os.path.exists(path):
            pytest.skip("gymnasium assets not available")
        imp = from_mjcf(path)
        lo = imp.model.joint_lower[6:]
        hi = imp.model.joint_upper[6:]
        pose = np.where(np.isfinite(lo), 0.5 * (lo + hi), 0.0)
        env = legged_from_mjcf(
            path,
            kp=20.0,
            n_feet=4,
            reuse_mass_matrix=True,
            default_pose=pose,
            stand_height=0.55,
            reset_joint_noise=0.02,
            min_height=0.2,
            contact_stiffness=800.0,
            contact_damping=30.0,
            model_overrides=dict(
                max_contact_force=100.0,
                friction_vel=0.3,
                limit_stiffness=300.0,
                limit_damping=5.0,
            ),
        )
        assert env._plan is not None  # depthwise auto-selected
        state = env.reset(jax.random.key(0))
        step = jax.jit(env.step)
        for _ in range(100):  # 2 s
            state = step(state, jnp.zeros(env.action_size))
        assert float(state.done) == 0.0
        assert 0.3 < float(state.data["qpos"][2]) < 0.7

    def test_swimmer_fluid_rejected(self):
        import os

        path = f"{_GYM_ASSETS}/swimmer.xml"
        if not os.path.exists(path):
            pytest.skip("gymnasium assets not available")
        with pytest.raises(ValueError, match="fluid"):
            from_mjcf(path)


class TestJointSprings:
    def test_static_spring_deflection(self):
        """A hinge with a spring and gravity settles where
        k·(q − ref) = m·g·l·sin(q): check the imported passive torque
        via the analytic static balance residual at mujoco's own
        equilibrium."""
        xml = """
        <mujoco><option gravity="0 0 -9.81"/><compiler angle="radian"/>
        <worldbody><body pos="0 0 1">
          <joint name="h" type="hinge" axis="0 1 0" stiffness="30"
                 springref="0.5" damping="2.0"/>
          <inertial pos="0 0 -0.3" mass="1.0" diaginertia="0.01 0.01 0.002"/>
        </body></worldbody></mujoco>"""
        imp = from_mjcf(xml)
        np.testing.assert_allclose(imp.model.spring_stiffness, [30.0])
        np.testing.assert_allclose(imp.model.spring_ref, [0.5])
        m = mujoco.MjModel.from_xml_string(xml)
        m.opt.timestep = 0.002
        d = mujoco.MjData(m)
        for _ in range(4000):  # settle to the spring-gravity balance
            mujoco.mj_step(m, d)
        q_eq = float(d.qpos[0])
        qacc, _ = forward_dynamics(
            imp.model,
            jnp.asarray([q_eq], jnp.float32),
            jnp.zeros(1),
            jnp.zeros(1),
        )
        assert abs(float(qacc[0])) < 1e-3  # same equilibrium


class TestErrors:
    def test_multi_joint_body_decomposes(self):
        """A body with stacked joints (MuJoCo composes them in
        declaration order, first joint outermost) splits into massless
        chained links; dynamics match mj_forward."""
        xml = """
        <mujoco><compiler angle="radian"/><worldbody><body pos="0 0 1">
          <joint name="sx" type="slide" axis="1 0 0" damping="0.3"/>
          <joint name="hy" type="hinge" axis="0 1 0" pos="0.1 0 0.2"
                 damping="0.2"/>
          <inertial pos="0.3 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
        </body></worldbody></mujoco>"""
        imp = from_mjcf(xml)
        assert imp.model.n_bodies == 2  # synthetic link + content link
        assert imp.model.mass[0] == 0.0 and imp.model.mass[1] == 1.0
        assert imp.body_names == ("sx", "body1")
        rng = np.random.RandomState(11)
        for _ in range(3):
            qpos = rng.uniform(-0.8, 0.8, 2)
            qvel = rng.uniform(-1.0, 1.0, 2)
            tau = rng.uniform(-2.0, 2.0, 2)
            _, d, _ = _mj_state(xml, qpos, qvel, tau)
            qacc, _ = forward_dynamics(
                imp.model,
                jnp.asarray(qpos, jnp.float32),
                jnp.asarray(qvel, jnp.float32),
                jnp.asarray(tau, jnp.float32),
            )
            np.testing.assert_allclose(
                np.asarray(qacc), d.qacc, rtol=2e-4, atol=2e-3
            )

    def test_two_trees_rejected_by_single_import(self):
        xml = """
        <mujoco><worldbody>
          <body pos="0 0 1"><joint type="hinge" axis="1 0 0"/>
            <inertial pos="0 0 0" mass="1" diaginertia="0.01 0.01 0.01"/></body>
          <body pos="1 0 1"><joint type="hinge" axis="1 0 0"/>
            <inertial pos="0 0 0" mass="1" diaginertia="0.01 0.01 0.01"/></body>
        </worldbody></mujoco>"""
        with pytest.raises(ValueError, match="kinematic trees"):
            from_mjcf(xml)


SCENE_XML = """
<mujoco>
  <option gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="arm_base" pos="0 0 0.12">
      <joint name="swing" type="hinge" axis="0 0 1" damping="0.5"/>
      <inertial pos="0.15 0 0" mass="1.2" diaginertia="0.01 0.01 0.004"/>
      <geom name="tip" type="capsule" size="0.05 0.1" pos="0.3 0 0"
            quat="0.7071068 0 0.7071068 0"/>
    </body>
    <body name="ball" pos="0.42 -0.2 0.1">
      <freejoint/>
      <inertial pos="0 0 0" mass="0.4" diaginertia="0.002 0.002 0.002"/>
      <geom name="ball_g" type="sphere" size="0.08" friction="0.5 0.005 0.0001"/>
    </body>
  </worldbody>
  <contact><pair geom1="tip" geom2="ball_g"/></contact>
</mujoco>
"""


class TestSceneImport:
    def test_capsule_two_sphere_import(self):
        imp = from_mjcf_scene(SCENE_XML)
        arm = imp.imports[0]
        # The capsule imports as one sphere per cap center; the geom
        # frame's z (rotated onto world x by the quat) sets the axis.
        assert arm.geom_names == ("tip_cap0", "tip_cap1")
        np.testing.assert_allclose(
            np.asarray(arm.model.geom_offset),
            [[0.4, 0.0, 0.0], [0.2, 0.0, 0.0]],
            atol=1e-6,
        )
        np.testing.assert_allclose(arm.model.geom_radius, [0.05, 0.05])
        ball = imp.imports[1]
        assert ball.geom_names == ("ball_g",)
        assert ball.model.free_base

    def test_cross_tree_pair_and_dynamics(self):
        from nnx_ppo_tpu.physics.scene import scene_step

        imp = from_mjcf_scene(SCENE_XML)
        assert len(imp.scene.models) == 2
        # The capsule's two spheres each pair against the ball.
        assert imp.scene.pairs == ((0, 0, 1, 0), (0, 1, 1, 0))
        # Swing the arm into the ball: the ball must get pushed.
        qposs = tuple(jnp.asarray(q) for q in imp.qpos0s)
        qvels = (jnp.asarray([-3.0]), jnp.zeros(6))
        taus = (jnp.asarray([-1.5]), jnp.zeros(6))  # drive through damping
        run = jax.jit(
            lambda qp, qv: scene_step(
                imp.scene, qp, qv, taus, 0.002, n_substeps=400
            )
        )
        qposs, qvels, _ = run(qposs, qvels)
        ball_qpos = np.asarray(qposs[1])
        moved = np.linalg.norm(ball_qpos[0:2] - np.array([0.42, -0.2]))
        assert moved > 0.05  # contact transferred momentum
