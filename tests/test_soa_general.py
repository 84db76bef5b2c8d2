"""The general-tree SoA path (``engine_soa_general``) must exactly
reproduce the generic engine on the manipulation models: the rooted
ball+hinge arm (``engine.step`` semantics — exact per-substep factor)
and the two-tree arm+ball pusher scene (``scene.scene_step``)."""

import jax
import jax.numpy as jnp
import numpy as np

from nnx_ppo_tpu.physics.engine import step as engine_step
from nnx_ppo_tpu.physics.engine_soa_general import (
    scene_substep_soa,
    soa_general_unsupported_reason,
    substep_soa_g,
)
from nnx_ppo_tpu.physics.models.arm import default_qpos, make_arm
from nnx_ppo_tpu.physics.scene import Scene, scene_step

DT = 0.00125
N_SUB = 4


def _arm_states(B, key):
    model = make_arm(contact_stiffness=3000.0, contact_damping=50.0,
                     friction=0.6, friction_vel=1.0, max_contact_force=80.0)
    k1, k2, k3 = jax.random.split(key, 3)
    base = jnp.asarray(default_qpos(model))
    qpos = jnp.tile(base, (B, 1))
    # Random shoulder tilt + elbow angle via per-env quat perturbation.
    from nnx_ppo_tpu.physics.spatial import quat_integrate

    tilts = 0.5 * jax.random.normal(k1, (B, 3))
    quats = jax.vmap(lambda q, w: quat_integrate(q, w, 1.0))(
        qpos[:, 0:4], tilts
    )
    qpos = jnp.concatenate(
        [quats, 0.8 * jax.random.normal(k2, (B, 1))], axis=1
    )
    qvel = 0.5 * jax.random.normal(k3, (B, model.nv))
    return model, qpos, qvel


def _lanes(x):
    return tuple(x[:, k] for k in range(x.shape[1]))


def _stack(lanes):
    return jnp.stack(lanes, axis=1)


class TestGeneralTree:
    def test_supported_reasons(self):
        model = make_arm()
        assert soa_general_unsupported_reason(model) is None

    def test_arm_substeps_match_engine_step(self):
        """Rooted BALL+HINGE tree with an elbow limit, constant torque,
        exact per-substep dynamics — engine.step is the reference."""
        B = 8
        model, qpos, qvel = _arm_states(B, jax.random.key(0))
        tau = 1.5 * jax.random.normal(jax.random.key(1), (B, model.nv))

        ref_qp, ref_qv, ref_n = jax.jit(
            jax.vmap(
                lambda qp, qv, t: engine_step(
                    model, qp, qv, t, DT, n_substeps=N_SUB
                )
            )
        )(qpos, qvel, tau)

        def soa_run(qpos, qvel, tau):
            qp, qv = _lanes(qpos), _lanes(qvel)
            tl = _lanes(tau)
            normals = None
            for _ in range(N_SUB):
                qp, qv, normals = substep_soa_g(model, qp, qv, tl, DT)
            return _stack(qp), _stack(qv), _stack(normals)

        soa_qp, soa_qv, soa_n = jax.jit(soa_run)(qpos, qvel, tau)
        np.testing.assert_allclose(
            np.asarray(soa_qp), np.asarray(ref_qp), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(soa_qv), np.asarray(ref_qv), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(soa_n), np.asarray(ref_n), rtol=1e-4, atol=1e-4
        )

    def test_free_ball_tree_matches_engine(self):
        """A single free rigid body (the pusher's ball) under gravity
        with ground contact."""
        from nnx_ppo_tpu.envs.pusher import _make_ball

        model = _make_ball()
        B = 8
        k1, k2 = jax.random.split(jax.random.key(2))
        pos = jnp.concatenate(
            [
                0.3 * jax.random.normal(k1, (B, 2)),
                0.05 + 0.2 * jax.random.uniform(k2, (B, 1)),
            ],
            axis=1,
        )
        quat = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (B, 1))
        qpos = jnp.concatenate([pos, quat], axis=1)
        qvel = 1.0 * jax.random.normal(jax.random.key(3), (B, model.nv))
        tau = jnp.zeros((B, model.nv))

        ref_qp, ref_qv, _ = jax.jit(
            jax.vmap(
                lambda qp, qv, t: engine_step(
                    model, qp, qv, t, DT, n_substeps=N_SUB
                )
            )
        )(qpos, qvel, tau)

        def soa_run(qpos, qvel, tau):
            qp, qv, tl = _lanes(qpos), _lanes(qvel), _lanes(tau)
            for _ in range(N_SUB):
                qp, qv, _ = substep_soa_g(model, qp, qv, tl, DT)
            return _stack(qp), _stack(qv)

        soa_qp, soa_qv = jax.jit(soa_run)(qpos, qvel, tau)
        np.testing.assert_allclose(
            np.asarray(soa_qp), np.asarray(ref_qp), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(soa_qv), np.asarray(ref_qv), rtol=2e-4, atol=2e-4
        )


class TestScene:
    def test_pusher_scene_matches_scene_step(self):
        """Two-tree scene with a cross-tree contact pair: the SoA scene
        substep == scene.scene_step, including through contact."""
        from nnx_ppo_tpu.envs.pusher import _make_ball

        arm = make_arm(contact_stiffness=3000.0, contact_damping=50.0,
                       friction=0.6, friction_vel=1.0,
                       max_contact_force=80.0)
        ball = _make_ball()
        scene = Scene(models=(arm, ball), pairs=((0, 0, 1, 0),))
        B = 8
        _, arm_qpos, arm_qvel = _arm_states(B, jax.random.key(4))
        # Place the ball near the end effector's reachable shell so the
        # cross pair actually fires for some envs.
        k1, k2 = jax.random.split(jax.random.key(5))
        pos = jnp.concatenate(
            [
                0.25 * jax.random.normal(k1, (B, 2)),
                0.08 + 0.35 * jax.random.uniform(k2, (B, 1)),
            ],
            axis=1,
        )
        quat = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (B, 1))
        ball_qpos = jnp.concatenate([pos, quat], axis=1)
        # Env 0: arm at the hanging rest pose (ee at (0, 0, 0.35)) with
        # the ball center 0.09 m below it — inside the 0.11 m contact
        # shell, so the cross pair definitely fires somewhere.
        arm_qpos = arm_qpos.at[0].set(jnp.asarray(default_qpos(arm)))
        arm_qvel = arm_qvel.at[0].set(0.0)
        ball_qpos = ball_qpos.at[0, 0:3].set(
            jnp.array([0.0, 0.0, 1.0 - 0.65 - 0.09])
        )
        ball_qvel = 0.5 * jax.random.normal(jax.random.key(6), (B, 6))
        ball_qvel = ball_qvel.at[0].set(0.0)
        tau_arm = 2.0 * jax.random.normal(jax.random.key(7), (B, arm.nv))
        tau_ball = jnp.zeros((B, 6))

        def ref_one(aq, av, bq, bv, t):
            (aq2, bq2), (av2, bv2), cross = scene_step(
                scene, (aq, bq), (av, bv), (t, jnp.zeros(6)), DT,
                n_substeps=N_SUB,
            )
            return aq2, av2, bq2, bv2, cross

        r_aq, r_av, r_bq, r_bv, r_cross = jax.jit(jax.vmap(ref_one))(
            arm_qpos, arm_qvel, ball_qpos, ball_qvel, tau_arm
        )

        def soa_run(aq, av, bq, bv, t, tb):
            qposs = (_lanes(aq), _lanes(bq))
            qvels = (_lanes(av), _lanes(bv))
            taus = (_lanes(t), _lanes(tb))
            cross = None
            for _ in range(N_SUB):
                qposs, qvels, _, cross = scene_substep_soa(
                    (arm, ball), scene.pairs, qposs, qvels, taus, DT
                )
            return (
                _stack(qposs[0]), _stack(qvels[0]),
                _stack(qposs[1]), _stack(qvels[1]),
                _stack(cross),
            )

        s_aq, s_av, s_bq, s_bv, s_cross = jax.jit(soa_run)(
            arm_qpos, arm_qvel, ball_qpos, ball_qvel, tau_arm, tau_ball
        )
        np.testing.assert_allclose(np.asarray(s_aq), np.asarray(r_aq),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_av), np.asarray(r_av),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(s_bq), np.asarray(r_bq),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_bv), np.asarray(r_bv),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(s_cross), np.asarray(r_cross), rtol=1e-4, atol=1e-4
        )
        # The scenario must actually exercise the cross pair.
        assert float(np.asarray(r_cross).max()) > 0.0, "no cross contact"


class TestEnvKernelPath:
    def test_reacher_pallas_matches_xla(self):
        from nnx_ppo_tpu.envs import ArmReacher

        env_x = ArmReacher(n_substeps=2, substep_impl="xla")
        env_p = ArmReacher(n_substeps=2, substep_impl="pallas")
        B = 4
        keys = jax.random.split(jax.random.key(0), B)
        s_x = jax.jit(jax.vmap(env_x.reset))(keys)
        s_p = jax.jit(jax.vmap(env_p.reset))(keys)
        act = 0.5 * jax.random.normal(jax.random.key(1), (B, 4))
        for _ in range(2):
            s_x = jax.jit(jax.vmap(env_x.step))(s_x, act)
            s_p = jax.jit(jax.vmap(env_p.step))(s_p, act)
        np.testing.assert_allclose(
            np.asarray(s_p.data["qpos"]), np.asarray(s_x.data["qpos"]),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(s_p.obs), np.asarray(s_x.obs), rtol=1e-4, atol=1e-4
        )

    def test_pusher_pallas_matches_xla(self):
        from nnx_ppo_tpu.envs.pusher import ArmPush

        env_x = ArmPush(n_substeps=3, substep_impl="xla")
        env_p = ArmPush(n_substeps=3, substep_impl="pallas")
        B = 4
        keys = jax.random.split(jax.random.key(2), B)
        s_x = jax.jit(jax.vmap(env_x.reset))(keys)
        s_p = jax.jit(jax.vmap(env_p.reset))(keys)
        act = 0.5 * jax.random.normal(jax.random.key(3), (B, 4))
        for _ in range(2):
            s_x = jax.jit(jax.vmap(env_x.step))(s_x, act)
            s_p = jax.jit(jax.vmap(env_p.step))(s_p, act)
        for k in ("arm_qpos", "ball_qpos", "arm_qvel", "ball_qvel"):
            np.testing.assert_allclose(
                np.asarray(s_p.data[k]), np.asarray(s_x.data[k]),
                rtol=2e-4, atol=2e-4, err_msg=k,
            )
