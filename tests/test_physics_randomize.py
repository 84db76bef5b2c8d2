"""Domain randomization: engine overrides + env integration.

Physics gates (closed-form, not statistical):

* mass_scale is a density scale → with gravity off and pure applied
  torque, accelerations scale EXACTLY by 1/scale; under gravity alone a
  pendulum's acceleration is mass-independent (Galileo), so mass_scale
  must leave it unchanged.
* friction override: a sliding ball decelerates under the model's
  friction and coasts exactly when the per-env override is 0.
* None params compile to the identical program (bit-equal trajectories).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.physics import (
    DomainParams,
    DomainRandomization,
    ModelBuilder,
    forward_dynamics,
    step,
)
from nnx_ppo_tpu.physics.engine import mass_matrix_factor
from tests.test_physics import build_chain_model


def ball_model(friction=0.8):
    b = ModelBuilder()
    b.add_body("ball", joint="free", mass=1.0, inertia=(0.004,) * 3)
    b.add_sphere_geom("ball", (0.0, 0.0, 0.0), 0.1)
    return b.finalize(friction=friction, friction_vel=0.05)


class TestEngineOverrides:
    def test_none_and_empty_params_bit_identical(self):
        model = build_chain_model(3, [0.5] * 3, [1.0] * 3, damping=0.1)
        q = jnp.array([0.3, -0.2, 0.1])
        qd = jnp.array([1.0, 0.0, -0.5])
        tau = jnp.array([0.2, 0.0, 0.1])
        a0, _ = forward_dynamics(model, q, qd, tau, dt=0.002)
        a1, _ = forward_dynamics(
            model, q, qd, tau, dt=0.002, params=DomainParams()
        )
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    def test_mass_scale_inverts_torque_response(self):
        # gravity off, no damping: M(q) q̈ = τ, M linear in inertia →
        # doubling the density exactly halves the acceleration.
        model = build_chain_model(3, [0.5] * 3, [1.0] * 3, gravity=0.0)
        q = jnp.array([0.4, 0.1, -0.3])
        qd = jnp.zeros(3)
        tau = jnp.array([1.0, -0.5, 0.25])
        a1, _ = forward_dynamics(model, q, qd, tau)
        a2, _ = forward_dynamics(
            model, q, qd, tau, params=DomainParams(mass_scale=jnp.float32(2.0))
        )
        np.testing.assert_allclose(
            np.asarray(a2), np.asarray(a1) / 2.0, rtol=1e-5
        )

    def test_gravity_response_is_mass_independent(self):
        # Pure gravity (τ=0, q̇=0): both M and the gravity bias scale
        # with density, so q̈ is invariant — the engine-level Galileo
        # check that mass_scale hits inertia AND weight consistently.
        model = build_chain_model(2, [0.4, 0.6], [1.0, 2.0])
        q = jnp.array([0.7, -0.4])
        zero = jnp.zeros(2)
        a1, _ = forward_dynamics(model, q, zero, zero)
        a3, _ = forward_dynamics(
            model, q, zero, zero,
            params=DomainParams(mass_scale=jnp.float32(3.0)),
        )
        np.testing.assert_allclose(np.asarray(a3), np.asarray(a1), rtol=1e-4)

    def test_per_body_mass_scale(self):
        # A [NB] mass_scale with all-equal entries must match the
        # scalar form exactly.
        model = build_chain_model(3, [0.5] * 3, [1.0] * 3, gravity=0.0)
        q = jnp.array([0.4, 0.1, -0.3])
        tau = jnp.array([1.0, -0.5, 0.25])
        a_s, _ = forward_dynamics(
            model, q, jnp.zeros(3), tau,
            params=DomainParams(mass_scale=jnp.float32(1.7)),
        )
        a_v, _ = forward_dynamics(
            model, q, jnp.zeros(3), tau,
            params=DomainParams(mass_scale=jnp.full((3,), 1.7)),
        )
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_v), rtol=1e-6)

    def test_damping_scale(self):
        # q̇-proportional bias: qacc difference between damping_scale
        # 0 and 1 equals M⁻¹ D q̇.
        model = build_chain_model(2, [0.5] * 2, [1.0] * 2, damping=0.5,
                                  gravity=0.0)
        q = jnp.zeros(2)
        qd = jnp.array([2.0, -1.0])
        a_off, _ = forward_dynamics(
            model, q, qd, jnp.zeros(2),
            params=DomainParams(damping_scale=jnp.float32(0.0)),
        )
        a_on, _ = forward_dynamics(
            model, q, qd, jnp.zeros(2),
            params=DomainParams(damping_scale=jnp.float32(1.0)),
        )
        a_ref, _ = forward_dynamics(model, q, qd, jnp.zeros(2))
        np.testing.assert_allclose(np.asarray(a_on), np.asarray(a_ref),
                                   rtol=1e-6)
        assert not np.allclose(np.asarray(a_off), np.asarray(a_on))

    def test_friction_zero_override_coasts(self):
        # Ball resting on the plane, sliding at vx: with the model's
        # friction it decelerates; with a per-env friction=0 override
        # the horizontal velocity is untouched.
        model = ball_model(friction=0.8)
        qpos = jnp.array([0.0, 0.0, 0.098, 1.0, 0.0, 0.0, 0.0])
        qvel = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
        tau = jnp.zeros(6)

        def roll(params):
            qp, qv, _ = step(model, qpos, qvel, tau, 0.002, n_substeps=50,
                             params=params)
            return float(qv[3])

        vx_frictionless = roll(DomainParams(friction=jnp.float32(0.0)))
        vx_friction = roll(None)
        assert vx_friction < 0.95  # model friction decelerates the slide
        assert abs(vx_frictionless - 1.0) < 1e-4  # override: pure coast

    def test_vmap_params_match_individual_runs(self):
        model = build_chain_model(3, [0.5] * 3, [1.0] * 3, gravity=0.0)
        q = jnp.array([0.4, 0.1, -0.3])
        tau = jnp.array([1.0, -0.5, 0.25])
        scales = jnp.array([0.7, 1.0, 1.6])

        def accel(s):
            a, _ = forward_dynamics(
                model, q, jnp.zeros(3), tau,
                params=DomainParams(mass_scale=s),
            )
            return a

        batched = jax.vmap(accel)(scales)
        for i, s in enumerate(scales):
            # vmap changes XLA fusion order → last-ulp differences only.
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(accel(s)), rtol=1e-4
            )

    def test_factor_matches_full_solve_same_params(self):
        # mass_matrix_factor(params) + backsub must agree with the
        # direct solve when the factor is built at the SAME qpos/params.
        model = build_chain_model(3, [0.5] * 3, [1.0] * 3, damping=0.2)
        q = jnp.array([0.3, -0.2, 0.1])
        qd = jnp.array([1.0, 0.0, -0.5])
        tau = jnp.array([0.2, 0.0, 0.1])
        params = DomainParams(
            mass_scale=jnp.float32(1.3), damping_scale=jnp.float32(0.6)
        )
        chol = mass_matrix_factor(model, q, dt=0.002, params=params)
        a_chol, _ = forward_dynamics(
            model, q, qd, tau, chol=chol, params=params
        )
        a_full, _ = forward_dynamics(
            model, q, qd, tau, dt=0.002, params=params
        )
        np.testing.assert_allclose(np.asarray(a_chol), np.asarray(a_full),
                                   rtol=1e-4, atol=1e-5)


class TestSampler:
    def test_sample_within_ranges_and_varies(self):
        cfg = DomainRandomization(
            mass_scale=(0.8, 1.2),
            friction=(0.4, 1.0),
            damping_scale=(0.9, 1.1),
            gain_scale=(0.9, 1.1),
        )
        draws = jax.vmap(cfg.sample)(jax.random.split(jax.random.key(0), 64))
        for field, (lo, hi) in [
            ("mass_scale", cfg.mass_scale),
            ("friction", cfg.friction),
            ("damping_scale", cfg.damping_scale),
            ("gain_scale", cfg.gain_scale),
        ]:
            x = np.asarray(getattr(draws, field))
            assert x.shape == (64,)
            assert (x >= lo).all() and (x <= hi).all()
            assert x.std() > 0.01  # actually varies across envs

    def test_none_range_gives_none_field(self):
        cfg = DomainRandomization(mass_scale=(0.8, 1.2), friction=None,
                                  damping_scale=None, gain_scale=None)
        p = cfg.sample(jax.random.key(1))
        assert p.friction is None and p.gain_scale is None
        assert p.mass_scale is not None

    def test_identity_matches_sample_structure_and_nominal_dynamics(self):
        cfg = DomainRandomization()
        model = ball_model(friction=0.8)
        ident = cfg.identity(model)
        sample = cfg.sample(jax.random.key(2))
        assert (
            jax.tree_util.tree_structure(ident)
            == jax.tree_util.tree_structure(sample)
        )
        qpos = jnp.array([0.0, 0.0, 0.098, 1.0, 0.0, 0.0, 0.0])
        qvel = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
        qp_i, qv_i, _ = step(model, qpos, qvel, jnp.zeros(6), 0.002,
                             n_substeps=20, params=ident)
        qp_n, qv_n, _ = step(model, qpos, qvel, jnp.zeros(6), 0.002,
                             n_substeps=20, params=None)
        np.testing.assert_allclose(np.asarray(qv_i), np.asarray(qv_n),
                                   rtol=1e-6, atol=1e-7)


class TestEnvIntegration:
    def make_env(self, **kw):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        return QuadrupedJoystick(randomize=DomainRandomization(), **kw)

    def test_reset_draws_and_step_threads(self):
        env = self.make_env()
        s0 = env.reset(jax.random.key(0))
        s1 = env.reset(jax.random.key(1))
        assert "dr" in s0.data
        # Distinct episodes draw distinct physics.
        assert float(s0.data["dr"].mass_scale) != float(
            s1.data["dr"].mass_scale
        )
        nxt = jax.jit(env.step)(s0, jnp.zeros(12))
        assert jnp.isfinite(nxt.reward["tracking"])
        # The draw rides along unchanged within the episode.
        assert float(nxt.data["dr"].friction) == float(
            s0.data["dr"].friction
        )

    def test_randomization_changes_trajectory(self):
        env = self.make_env()
        s0 = env.reset(jax.random.key(0))
        step_fn = jax.jit(env.step)
        heavy = s0.replace(
            data=dict(
                s0.data,
                dr=s0.data["dr"]._replace(mass_scale=jnp.float32(1.5)),
            )
        )
        light = s0.replace(
            data=dict(
                s0.data,
                dr=s0.data["dr"]._replace(mass_scale=jnp.float32(0.7)),
            )
        )
        a = jnp.tile(jnp.float32(0.3), (12,))
        qa = step_fn(heavy, a).data["qvel"]
        qb = step_fn(light, a).data["qvel"]
        assert not np.allclose(np.asarray(qa), np.asarray(qb), atol=1e-4)

    def test_reuse_mass_matrix_path(self):
        env = self.make_env(reuse_mass_matrix=True)
        s = env.reset(jax.random.key(3))
        step_fn = jax.jit(env.step)
        for _ in range(5):
            s = step_fn(s, jnp.zeros(12))
        assert np.isfinite(np.asarray(s.data["qvel"])).all()

    def test_vmapped_batch_one_program(self):
        env = self.make_env()
        keys = jax.random.split(jax.random.key(0), 8)
        states = jax.vmap(env.reset)(keys)
        assert states.data["dr"].mass_scale.shape == (8,)
        nxt = jax.jit(jax.vmap(env.step))(states, jnp.zeros((8, 12)))
        assert np.isfinite(np.asarray(nxt.data["qvel"])).all()


class TestPrivilegedObs:
    def full_cfg(self):
        return DomainRandomization(
            mass_scale=(0.8, 1.2), friction=(0.4, 1.0),
            damping_scale=(0.9, 1.1), gain_scale=(0.9, 1.1),
        )

    def test_stream_shape_and_values(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick
        from nnx_ppo_tpu.physics import privileged_vector

        cfg = self.full_cfg()
        assert cfg.dim == 4
        env = QuadrupedJoystick(randomize=cfg, privileged_obs=True)
        assert env.observation_size["privileged"] == 4
        s = env.reset(jax.random.key(0))
        np.testing.assert_array_equal(
            np.asarray(s.obs["privileged"]),
            np.asarray(privileged_vector(s.data["dr"])),
        )
        # And through step (obs rebuilt from the carried draw).
        nxt = jax.jit(env.step)(s, jnp.zeros(12))
        np.testing.assert_array_equal(
            np.asarray(nxt.obs["privileged"]),
            np.asarray(s.obs["privileged"]),
        )

    def test_requires_randomize(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        with pytest.raises(ValueError, match="privileged_obs"):
            QuadrupedJoystick(privileged_obs=True)

    def test_partial_config_dim(self):
        cfg = DomainRandomization(mass_scale=(0.8, 1.2), friction=None,
                                  damping_scale=None, gain_scale=None)
        assert cfg.dim == 1
        from nnx_ppo_tpu.physics import privileged_vector

        v = privileged_vector(cfg.sample(jax.random.key(0)))
        assert v.shape == (1,)

    def test_asymmetric_actor_blind_critic_sees(self):
        # Library-level asymmetric actor-critic: actor port's Concat
        # consumes only proprio/command, critic port's also consumes
        # privileged. Perturbing the privileged stream must leave the
        # (deterministic) action bit-identical and move the value.
        from nnx_ppo_tpu.networks import (
            Concat, Dense, NormalTanhSampler, PPOAdapter, Sequential,
        )

        k = jax.random.split(jax.random.key(0), 8)
        obs_spec = {"proprio": 6, "command": 3, "privileged": 4}
        enc_a = Concat.create(
            proprio=Dense.create(6, 16, k[0], jax.nn.swish),
            command=Dense.create(3, 8, k[1], jax.nn.swish),
        )
        enc_c = Concat.create(
            proprio=Dense.create(6, 16, k[2], jax.nn.swish),
            command=Dense.create(3, 8, k[3], jax.nn.swish),
            privileged=Dense.create(4, 8, k[4], jax.nn.swish),
        )
        net = PPOAdapter.create(
            action=Sequential.create([
                enc_a,
                Dense.create(24, 4, k[5]),
                NormalTanhSampler.create(k[6]),
            ]),
            value=Sequential.create([enc_c, Dense.create(32, 1, k[7])]),
        ).eval()  # deterministic actions — isolate the routing
        carry = net.initialize_state(2)
        obs = {
            "proprio": jnp.ones((2, 6)),
            "command": jnp.zeros((2, 3)),
            "privileged": jnp.ones((2, 4)),
        }
        out1 = net(carry, obs)
        obs2 = dict(obs, privileged=2.0 * obs["privileged"])
        out2 = net(carry, obs2)
        np.testing.assert_array_equal(
            np.asarray(out1.output.actions), np.asarray(out2.output.actions)
        )
        assert not np.allclose(
            np.asarray(out1.output.value_estimates),
            np.asarray(out2.output.value_estimates),
        )
