"""Multi-tree scenes (`physics/scene.py`): cross-tree contact physics
and the ArmPush object-manipulation env built on them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.physics import ModelBuilder
from nnx_ppo_tpu.physics.model import FREE
from nnx_ppo_tpu.physics.scene import Scene, scene_step
from nnx_ppo_tpu.physics.spatial import quat_to_rot


def _ball(mass, radius, gravity=0.0):
    b = ModelBuilder(gravity=gravity)
    b.add_body("b", joint=FREE, mass=mass, inertia=(0.01,) * 3)
    b.add_sphere_geom("b", (0.0, 0.0, 0.0), radius)
    return b.finalize(
        contact_stiffness=3_000.0, contact_damping=30.0, friction=0.5
    )


class TestScene:
    def test_cross_collision_conserves_momentum(self):
        """Two free balls (different masses) colliding head-on far above
        the ground: the cross-tree penalty contact is internal to the
        combined system, so total momentum is conserved and the balls
        separate."""
        scene = Scene(models=(_ball(1.0, 0.1), _ball(2.0, 0.15)),
                      pairs=((0, 0, 1, 0),))
        qa = jnp.array([0.0, 0.0, 5.0, 1.0, 0.0, 0.0, 0.0])
        qb = jnp.array([0.3, 0.0, 5.0, 1.0, 0.0, 0.0, 0.0])
        va = jnp.array([0.0, 0.0, 0.0, 2.0, 0.0, 0.0])
        vb = jnp.array([0.0, 0.0, 0.0, -1.0, 0.0, 0.0])

        def momentum(qps, qvs):
            p = jnp.zeros(3)
            for m, qp, qv in zip((1.0, 2.0), qps, qvs):
                p = p + m * (quat_to_rot(qp[3:7]) @ qv[3:6])
            return p

        p0 = momentum((qa, qb), (va, vb))
        (qps, qvs, cross) = jax.jit(
            lambda a, b, c, d: scene_step(
                scene, (a, b), (c, d), (jnp.zeros(6), jnp.zeros(6)),
                5e-4, n_substeps=600,
            )
        )(qa, qb, va, vb)
        np.testing.assert_allclose(
            np.asarray(momentum(qps, qvs)), np.asarray(p0), atol=1e-5
        )
        # They actually collided and bounced apart.
        assert float(qvs[0][3]) < 0.0 < float(qvs[1][3])

    def test_no_pair_trees_are_independent(self):
        """Without a cross pair, each tree evolves exactly as a
        standalone engine.step run (the scene layer adds nothing)."""
        from nnx_ppo_tpu.physics import step as engine_step

        ma, mb = _ball(1.0, 0.1, gravity=-9.81), _ball(2.0, 0.15,
                                                       gravity=-9.81)
        scene = Scene(models=(ma, mb))
        qa = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0])
        qb = jnp.array([0.1, 0.0, 2.0, 1.0, 0.0, 0.0, 0.0])
        va = jnp.array([0.1, 0.0, 0.0, 0.5, 0.0, 0.0])
        vb = jnp.zeros(6)
        (qps, qvs, _) = scene_step(
            scene, (qa, qb), (va, vb), (jnp.zeros(6), jnp.zeros(6)),
            2e-3, n_substeps=50,
        )
        ra = engine_step(ma, qa, va, jnp.zeros(6), 2e-3, n_substeps=50)
        rb = engine_step(mb, qb, vb, jnp.zeros(6), 2e-3, n_substeps=50)
        np.testing.assert_allclose(np.asarray(qps[0]), np.asarray(ra[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(qps[1]), np.asarray(rb[0]),
                                   atol=1e-6)

    def test_three_trees_chain_of_pairs(self):
        # Three free balls in a row, pairs (0,1) and (1,2): pushing the
        # first transfers momentum down the chain while the combined
        # system's momentum stays conserved (gravity off).
        import numpy as np

        from nnx_ppo_tpu.physics import Scene, scene_step
        from nnx_ppo_tpu.physics.model import FREE, ModelBuilder
        from nnx_ppo_tpu.physics.spatial import quat_to_rot

        def ball():
            b = ModelBuilder(gravity=0.0)
            b.add_body("b", joint=FREE, mass=1.0, inertia=(0.004,) * 3)
            b.add_sphere_geom("b", (0.0, 0.0, 0.0), 0.1)
            return b.finalize()

        models = (ball(), ball(), ball())
        scene = Scene(models=models, pairs=((0, 0, 1, 0), (1, 0, 2, 0)))
        spacing = 0.25
        qposs = tuple(
            jnp.array([i * spacing, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0])
            for i in range(3)
        )
        v0 = 2.0
        qvels = (
            jnp.array([0.0, 0.0, 0.0, v0, 0.0, 0.0]),  # body-frame +x
            jnp.zeros(6),
            jnp.zeros(6),
        )
        taus = tuple(jnp.zeros(6) for _ in range(3))
        qposs, qvels, _ = scene_step(
            scene, qposs, qvels, taus, dt=1e-3, n_substeps=600
        )

        def p_world(qp, qv):
            return np.asarray(quat_to_rot(qp[3:7]) @ qv[3:6])

        ps = [p_world(qp, qv) for qp, qv in zip(qposs, qvels)]
        total = np.sum(ps, axis=0)
        np.testing.assert_allclose(total, [v0, 0.0, 0.0], atol=2e-3)
        # Momentum reached the last ball through the middle one.
        assert ps[2][0] > 0.3
        # Balls stay ordered along x (no tunnelling through each other).
        xs = [float(qp[0]) for qp in qposs]
        assert xs[0] < xs[1] < xs[2]

    def test_scene_validation(self):
        m = _ball(1.0, 0.1)
        with pytest.raises(ValueError):
            Scene(models=(m, m), pairs=((0, 0, 0, 0),))  # same tree
        with pytest.raises(ValueError):
            Scene(models=(m, m), pairs=((0, 0, 2, 0),))  # tree range
        with pytest.raises(ValueError):
            Scene(models=(m, m), pairs=((0, 3, 1, 0),))  # geom range


class TestArmPush:
    def test_protocol_and_ball_rests(self):
        from nnx_ppo_tpu.envs import ArmPush

        env = ArmPush()
        state = env.reset(jax.random.key(0))
        assert state.obs.shape == (22,)
        stepf = jax.jit(env.step)
        for _ in range(25):  # 0.5 s without arm torque
            state = stepf(state, jnp.zeros(4))
        # Ball settles at radius minus the static penetration, no drift.
        assert abs(float(state.data["ball_qpos"][2]) - 0.078) < 2e-3
        assert float(jnp.linalg.norm(state.data["ball_qvel"][3:5])) < 1e-3

    def test_strike_moves_ball(self):
        """A directed swing (shoulder −y torque + slight elbow flex)
        drives the end effector through the ball, which rolls off along
        +x — the cross-tree contact transfers real momentum."""
        from nnx_ppo_tpu.envs import ArmPush

        env = ArmPush()
        state = env.reset(jax.random.key(0))
        q = dict(state.data)
        q["ball_qpos"] = jnp.array([0.25, 0.0, 0.08, 1.0, 0.0, 0.0, 0.0])
        q["arm_qpos"] = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0])
        q["arm_qvel"] = jnp.zeros(4)
        q["ball_qvel"] = jnp.zeros(6)
        state = env._state(q, jnp.zeros(4))
        stepf = jax.jit(env.step)
        action = jnp.array([0.0, -1.0, 0.0, 0.15])
        top_speed = 0.0
        for _ in range(40):
            state = stepf(state, action)
            top_speed = max(
                top_speed,
                float(jnp.linalg.norm(state.data["ball_qvel"][3:6])),
            )
        assert top_speed > 0.5, top_speed
        assert float(state.data["ball_qpos"][0]) > 0.5  # rolled away +x

    def test_adversarial_actions_stay_finite(self):
        """Bang-bang torque schedules are the worst case for the
        explicit light-ball contacts (they excite the marginal friction/
        damping modes) — the contact-force cap, friction regularization,
        and velocity clamps must keep every state finite. Regression for
        a real divergence (ball velocity → 1e13 → NaN) found during the
        first training run."""
        from nnx_ppo_tpu.envs import ArmPush

        env = ArmPush()
        B = 8
        states = jax.vmap(env.reset)(
            jax.random.split(jax.random.key(0), B)
        )
        stepf = jax.jit(jax.vmap(env.step))
        key = jax.random.key(1)
        action = jnp.zeros((B, 4))
        for i in range(300):
            if i % 10 == 0:
                key, k = jax.random.split(key)
                action = jnp.sign(
                    jax.random.uniform(k, (B, 4), minval=-1.0, maxval=1.0)
                )
            states = stepf(states, action)
        assert bool(jnp.all(jnp.isfinite(states.obs)))
        assert bool(jnp.all(jnp.isfinite(states.reward)))

    def test_ppo_step_runs(self):
        from nnx_ppo_tpu.envs import ArmPush
        from nnx_ppo_tpu.wrappers import EpisodeWrapper
        from nnx_ppo_tpu.networks import make_mlp_actor_critic
        import functools

        from nnx_ppo_tpu.algorithms import (
            PPOConfig,
            make_optimizer,
            new_training_state,
        )
        from nnx_ppo_tpu.algorithms.ppo import ppo_step

        env = EpisodeWrapper(ArmPush(), 100)
        net = make_mlp_actor_critic(22, 4, [32], [32], jax.random.key(0))
        cfg = PPOConfig(n_envs=8, rollout_length=4, n_epochs=2,
                        n_minibatches=2)
        ts = new_training_state(env, net, cfg.n_envs, seed=0)
        opt = make_optimizer(cfg.learning_rate)
        step = jax.jit(
            functools.partial(ppo_step, env, config=cfg, optimizer=opt)
        )
        ts, metrics = step(ts)
        assert jnp.isfinite(metrics["losses/actor/mean"])
        assert int(ts.steps_taken) == 8 * 4
