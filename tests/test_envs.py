"""Built-in env suite: protocol compliance, physics sanity, and PPO
smoke tests for the analytic envs (classic / locomotion / chain) plus
the import-gated MJX adapter."""

import functools

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.algorithms.rollout import unroll_env
from nnx_ppo_tpu.envs import (
    MJC_AVAILABLE,
    MJX_AVAILABLE,
    CartpoleBalance,
    JoystickLocomotion,
    NLinkSwingup,
    Pendulum,
)
from nnx_ppo_tpu.networks import (
    Concat,
    Dense,
    NormalTanhSampler,
    Parallel,
    PPOAdapter,
    Sequential,
    make_mlp,
    make_mlp_actor_critic,
)
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def _ppo_smoke(env, networks, n_envs=8, rollout_length=5, n_steps=2, **cfg_kwargs):
    cfg = PPOConfig(
        n_envs=n_envs, rollout_length=rollout_length, n_epochs=2, n_minibatches=2,
        **cfg_kwargs,
    )
    ts = new_training_state(env, networks, cfg.n_envs, seed=0)
    opt = make_optimizer(cfg.learning_rate)
    step = jax.jit(functools.partial(ppo_step, env, config=cfg, optimizer=opt))
    metrics = None
    for _ in range(n_steps):
        ts, metrics = step(ts)
    return ts, metrics


class TestNLinkSwingup:
    def test_shapes_and_protocol(self):
        env = NLinkSwingup(n_links=3)
        state = env.reset(jax.random.key(0))
        assert state.obs.shape == (9,)
        nxt = env.step(state, jnp.zeros(3))
        assert nxt.obs.shape == (9,)
        assert jnp.isfinite(nxt.reward)

    def test_hanging_is_stable(self):
        # Exactly hanging down with zero velocity and zero torque stays put.
        env = NLinkSwingup(n_links=4)
        state = env.reset(jax.random.key(0))
        q = {"theta": jnp.full((4,), jnp.pi), "theta_dot": jnp.zeros(4)}
        state = state.replace(data=q, obs=env._obs(q))
        for _ in range(5):
            state = env.step(state, jnp.zeros(4))
        assert jnp.allclose(state.data["theta"], jnp.pi, atol=1e-4)
        assert jnp.allclose(state.data["theta_dot"], 0.0, atol=1e-4)

    def test_energy_bounded_without_torque(self):
        # Damped passive dynamics: swing decays, never blows up.
        env = NLinkSwingup(n_links=3)
        state = env.reset(jax.random.key(1))
        step = jax.jit(lambda s: env.step(s, jnp.zeros(3)))
        for _ in range(50):
            state = step(state)
        assert jnp.all(jnp.isfinite(state.data["theta_dot"]))
        assert jnp.all(jnp.abs(state.data["theta_dot"]) < 25.0)

    def test_single_link_matches_pendulum_family(self):
        # n_links=1 reduces to a classic pendulum: gravity torque alone
        # accelerates a horizontal pole downward.
        env = NLinkSwingup(n_links=1, damping=0.0)
        q = {"theta": jnp.array([jnp.pi / 2]), "theta_dot": jnp.zeros(1)}
        acc = env._accel(q["theta"], q["theta_dot"], jnp.zeros(1))
        # M = m l^2, g_vec = -g l sin(pi/2) m  =>  acc = +g / l > 0
        assert acc[0] > 0.0
        assert jnp.allclose(acc[0], env.gravity / env.lengths[0], rtol=1e-5)

    def test_vmapped_rollout_and_ppo_step(self):
        env = EpisodeWrapper(NLinkSwingup(n_links=3), max_len=20)
        net = make_mlp_actor_critic(
            env.observation_size, env.action_size, [32], [32], jax.random.key(0)
        )
        ts, metrics = _ppo_smoke(env, net)
        assert jnp.isfinite(metrics["losses/actor/mean"])
        assert jnp.isfinite(metrics["losses/critic/mean"])


def _joystick_net(key):
    """Multi-stream network: per-stream Dense encoders → concat →
    actor/critic (BASELINE config 3 shape)."""
    env = JoystickLocomotion()
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    enc = Concat.create(
        proprio=Dense.create(env.observation_size["proprio"], 32, k1, jax.nn.relu),
        command=Dense.create(env.observation_size["command"], 32, k2, jax.nn.relu),
    )
    actor = Sequential.create(
        [
            Dense.create(64, 32, k3, jax.nn.relu),
            Dense.create(32, 2 * env.action_size, k4),
            NormalTanhSampler.create(k5),
        ]
    )
    # Dict reward ⇒ dict value head (one critic per reward key).
    critic = Parallel.create(
        tracking=make_mlp([64, 32, 1], k6, jax.nn.relu, activation_last_layer=False),
        penalty=make_mlp([64, 32, 1], k7, jax.nn.relu, activation_last_layer=False),
    )
    return Sequential.create([enc, PPOAdapter.create(action=actor, value=critic)])


class TestJoystickLocomotion:
    def test_dict_obs_shapes(self):
        env = JoystickLocomotion()
        state = env.reset(jax.random.key(0))
        assert state.obs["proprio"].shape == (14,)
        assert state.obs["command"].shape == (3,)
        assert set(state.reward) == {"tracking", "penalty"}

    def test_tracking_reward_peaks_on_command(self):
        env = JoystickLocomotion()
        state = env.reset(jax.random.key(0))
        q = dict(state.data)
        q["vel"] = q["cmd"]  # perfect tracking
        r = env._reward(q, jnp.zeros(8), jnp.zeros(8))
        assert r["tracking"] > 0.99

    def test_unroll_and_ppo_step_multistream(self):
        env = EpisodeWrapper(JoystickLocomotion(), max_len=25)
        net = _joystick_net(jax.random.key(0))
        # One policy, dict rewards ⇒ team-summed advantages (the
        # reference's combine_advantages path, ``ppo.py:460-474``).
        ts, metrics = _ppo_smoke(env, net, combine_advantages=True)
        assert jnp.isfinite(metrics["losses/actor/mean"])
        # Dict reward → per-key critic losses.
        assert "losses/critic/tracking/mean" in metrics
        assert "losses/critic/penalty/mean" in metrics

    def test_command_resample_uses_per_env_stream(self):
        env = JoystickLocomotion(command_resample_prob=1.0)
        state = env.reset(jax.random.key(0))
        nxt = env.step(state, jnp.zeros(8))
        # With prob 1 the command always resamples.
        assert not jnp.allclose(nxt.data["cmd"], state.data["cmd"])


class TestClassicRolloutJit:
    def test_unroll_pendulum(self):
        env = EpisodeWrapper(Pendulum(), max_len=10)
        net = make_mlp_actor_critic(
            env.observation_size, env.action_size, [16], [16], jax.random.key(0)
        )
        n_envs = 4
        keys = jax.random.split(jax.random.key(1), n_envs)
        env_states = jax.vmap(env.reset)(keys)
        net_states = net.initialize_state(n_envs)
        _, _, data = jax.jit(
            lambda es, ns: unroll_env(env, es, net, ns, 6, jax.random.key(2))
        )(env_states, net_states)
        assert data.rewards.shape == (6, n_envs)
        assert jnp.all(jnp.isfinite(data.rewards))


@pytest.mark.skipif(
    not (MJX_AVAILABLE or MJC_AVAILABLE),
    reason="neither mujoco-mjx nor mujoco installed",
)
class TestMJX:
    def test_mjx_cartpole_rollout(self):
        # impl='auto': mjx when installed, else the MuJoCo-C callback
        # backend — either way the adapter trains end-to-end.
        from nnx_ppo_tpu.envs import MJXCartpoleBalance

        env = EpisodeWrapper(MJXCartpoleBalance(), max_len=20)
        net = make_mlp_actor_critic(
            env.observation_size, env.action_size, [16], [16], jax.random.key(0)
        )
        _ppo_smoke(env, net, n_envs=4, rollout_length=3, n_steps=1)


def test_mjx_import_gate():
    """Requesting the MJX backend without mujoco-mjx raises clearly."""
    from nnx_ppo_tpu.envs import MJXCartpoleBalance

    if not MJX_AVAILABLE:
        with pytest.raises(ImportError, match="mujoco-mjx"):
            MJXCartpoleBalance(impl="mjx")


def _quadruped_net(key):
    """Quadruped actor-critic: stream encoders -> concat -> actor +
    per-reward-key critics (dict reward => dict value head)."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    enc = Concat.create(
        proprio=Dense.create(42, 64, k1, jax.nn.relu),
        command=Dense.create(3, 16, k2, jax.nn.relu),
    )
    actor = Sequential.create([
        Dense.create(80, 64, k3, jax.nn.relu),
        Dense.create(64, 24, k4),
        NormalTanhSampler.create(k5),
    ])
    critic = Parallel.create(
        tracking=make_mlp([80, 64, 1], k6, jax.nn.relu,
                          activation_last_layer=False),
        penalty=make_mlp([80, 64, 1], k7, jax.nn.relu,
                         activation_last_layer=False),
    )
    return Sequential.create([enc, PPOAdapter.create(action=actor, value=critic)])


class TestQuadrupedJoystick:
    def test_protocol_and_shapes(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        env = QuadrupedJoystick()
        state = env.reset(jax.random.key(0))
        assert state.obs["proprio"].shape == (42,)
        assert state.obs["command"].shape == (3,)
        assert set(state.reward) == {"tracking", "penalty"}
        nxt = env.step(state, jnp.zeros(12))
        assert nxt.obs["proprio"].shape == (42,)
        assert float(nxt.done) == 0.0  # standing start doesn't terminate

    def test_zero_action_stands(self):
        """Holding the default pose target keeps the trunk up for 1 s of
        vmapped simulation (contact + PD stability under vmap)."""
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        env = QuadrupedJoystick()
        B = 4
        states = jax.vmap(env.reset)(jax.random.split(jax.random.key(0), B))

        @jax.jit
        def advance(states):
            return jax.vmap(env.step, in_axes=(0, None))(states, jnp.zeros(12))

        for _ in range(50):
            states = advance(states)
        z = np.asarray(states.data["qpos"][:, 2])
        assert (z > 0.15).all(), z
        assert not np.asarray(states.done).any()

    def test_falls_when_folded(self):
        """Folding the left legs while extending the right ones rolls
        the trunk over until termination triggers. (The drive is
        deliberately asymmetric: a symmetric fold settles into a stable
        sit above the height threshold, and near-marginal poses flip
        outcome on float-level engine differences.)"""
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        env = QuadrupedJoystick()
        state = env.reset(jax.random.key(1))
        fold, extend = [0.0, 1.0, -1.0], [0.0, -1.0, 1.0]
        # Leg order FR, FL, RR, RL; fold the left (FL/RL) side.
        action = jnp.asarray(extend + fold + extend + fold)
        step = jax.jit(env.step)
        done = 0.0
        for _ in range(100):
            state = step(state, action)
            done = max(done, float(state.done))
        assert done == 1.0

    def test_contact_metrics_reflect_stance(self):
        """Standing still, all four feet carry the robot: the contact
        metrics report 4 feet in contact and a total normal force near
        the robot's weight (reset states report the same metric keys
        with zeros so auto-reset keeps a uniform pytree)."""
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        env = QuadrupedJoystick()
        state = env.reset(jax.random.key(0))
        assert float(state.metrics["foot_contacts"]) == 0.0
        assert float(state.metrics["contact_force"]) == 0.0
        step = jax.jit(env.step)
        for _ in range(25):  # settle 0.5 s
            state = step(state, jnp.zeros(12))
        assert float(state.metrics["foot_contacts"]) == 4.0
        weight = float(np.sum(env.model.mass)) * 9.81
        np.testing.assert_allclose(
            float(state.metrics["contact_force"]), weight, rtol=0.25
        )

    def test_self_collision_variant_steps(self):
        """The self-collision model (4 foot-pair contacts) satisfies the
        same protocol and stays standing — the pairs are separated in
        nominal stance, so they must not inject forces."""
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        env = QuadrupedJoystick(self_collision=True)
        assert len(env.model.pair_geom_a) == 4
        state = env.reset(jax.random.key(0))
        step = jax.jit(env.step)
        for _ in range(25):
            state = step(state, jnp.zeros(12))
        assert float(state.data["qpos"][2]) > 0.15
        assert not bool(state.done)

    def test_ppo_step_runs(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        env = EpisodeWrapper(QuadrupedJoystick(), 200)
        net = _quadruped_net(jax.random.key(0))
        ts, metrics = _ppo_smoke(
            env, net, n_envs=8, rollout_length=4, n_steps=1,
            combine_advantages=True,
        )
        assert jnp.isfinite(metrics["losses/actor/mean"])
        assert int(ts.steps_taken) == 8 * 4


class TestArmReacher:
    """Manipulation family on the engine's ball joint (models/arm.py)."""

    def test_protocol_and_shapes(self):
        from nnx_ppo_tpu.envs import ArmReacher

        env = ArmReacher()
        state = env.reset(jax.random.key(0))
        assert state.obs.shape == (18,)
        assert float(state.done) == 0.0
        nxt = jax.jit(env.step)(state, jnp.zeros(4))
        assert jnp.isfinite(nxt.reward)
        # Shoulder quaternion in obs stays unit-norm through stepping.
        np.testing.assert_allclose(
            float(jnp.linalg.norm(nxt.obs[0:4])), 1.0, atol=1e-5
        )

    def test_targets_are_reachable_and_per_env(self):
        from nnx_ppo_tpu.envs import ArmReacher

        env = ArmReacher()
        B = 16
        states = jax.vmap(env.reset)(jax.random.split(jax.random.key(3), B))
        t = np.asarray(states.data["target"])
        radii = np.linalg.norm(t, axis=1)
        assert (radii >= 0.25 - 1e-5).all() and (radii <= 0.6 + 1e-5).all()
        assert (radii <= env.reach).all()
        assert len(np.unique(t.round(4), axis=0)) == B  # distinct targets

    def test_reward_gradient_toward_target(self):
        """Moving the end effector onto the target maximizes reward."""
        from nnx_ppo_tpu.envs import ArmReacher

        env = ArmReacher()
        state = env.reset(jax.random.key(0))
        q = dict(state.data)
        # Place the target exactly at the current end effector.
        q["target"] = env._ee_pos(q["qpos"])
        on_target = env._state(q, jnp.zeros(4))
        assert float(on_target.reward) > 0.99
        assert float(on_target.reward) > float(state.reward)

    def test_torque_moves_arm(self):
        from nnx_ppo_tpu.envs import ArmReacher

        env = ArmReacher()
        state = env.reset(jax.random.key(1))
        stepf = jax.jit(env.step)
        spun = state
        for _ in range(10):
            spun = stepf(spun, jnp.array([0.0, 1.0, 0.0, 0.0]))
        assert float(spun.data["qvel"][1]) > 1.0

    def test_ppo_step_runs(self):
        from nnx_ppo_tpu.envs import ArmReacher

        env = EpisodeWrapper(ArmReacher(), 100)
        net = make_mlp_actor_critic(
            env.observation_size, env.action_size, [32], [32],
            jax.random.key(0),
        )
        ts, metrics = _ppo_smoke(env, net, n_envs=8, rollout_length=4,
                                 n_steps=1)
        assert jnp.isfinite(metrics["losses/actor/mean"])


class TestRobustnessTools:
    """Sensor noise + push disturbances (sim-to-real training aids)."""

    def test_obs_noise_applies_to_sensors_only(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        clean = QuadrupedJoystick()
        noisy = QuadrupedJoystick(obs_noise=0.05)
        key = jax.random.key(0)
        s_clean, s_noisy = clean.reset(key), noisy.reset(key)
        # Same underlying state (the sensor is noisy, not the world)...
        np.testing.assert_array_equal(
            np.asarray(s_clean.data["qpos"]), np.asarray(s_noisy.data["qpos"])
        )
        # ...different proprio reading, clean command channel.
        d = np.asarray(s_noisy.obs["proprio"] - s_clean.obs["proprio"])
        assert 0.0 < np.abs(d).max() < 0.5
        np.testing.assert_array_equal(
            np.asarray(s_clean.obs["command"]), np.asarray(s_noisy.obs["command"])
        )
        # Fresh draw each step (no frozen noise pattern).
        n1 = jax.jit(noisy.step)(s_noisy, jnp.zeros(12))
        n2 = jax.jit(noisy.step)(n1, jnp.zeros(12))
        assert not np.allclose(
            np.asarray(n1.obs["proprio"] - jax.jit(clean.step)(s_clean, jnp.zeros(12)).obs["proprio"]),
            np.asarray(n2.obs["proprio"] - jax.jit(clean.step)(jax.jit(clean.step)(s_clean, jnp.zeros(12)), jnp.zeros(12)).obs["proprio"]),
        )

    def test_push_changes_trunk_velocity(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        base = QuadrupedJoystick()
        pushed = QuadrupedJoystick(push_prob=1.0, push_force=150.0)
        key = jax.random.key(1)
        s0 = base.reset(key)
        a = jnp.zeros(12)
        v_base = jax.jit(base.step)(s0, a).data["qvel"][3:5]
        v_push = jax.jit(pushed.step)(s0, a).data["qvel"][3:5]
        # A 150 N horizontal shove for 20 ms on a ~15 kg robot moves the
        # planar velocity by ~0.2 m/s.
        assert float(jnp.linalg.norm(v_push - v_base)) > 0.05

    def test_push_prob_zero_force_positive_still_pushless(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick

        base = QuadrupedJoystick()
        gated = QuadrupedJoystick(push_prob=0.0, push_force=150.0)
        key = jax.random.key(2)
        s0 = base.reset(key)
        a = jnp.zeros(12)
        qv_b = jax.jit(base.step)(s0, a).data["qvel"]
        qv_g = jax.jit(gated.step)(s0, a).data["qvel"]
        # bernoulli(p=0) never fires: dynamics match the push-free env
        # (the push env consumes an extra RNG split, so compare physics,
        # which is key-independent given the same start state/action).
        np.testing.assert_allclose(np.asarray(qv_b), np.asarray(qv_g),
                                   rtol=1e-5, atol=1e-6)

    def test_trains_with_all_tools(self):
        from nnx_ppo_tpu.envs import QuadrupedJoystick
        from nnx_ppo_tpu.physics import DomainRandomization

        env = QuadrupedJoystick(
            randomize=DomainRandomization(), obs_noise=0.02,
            push_prob=0.1, push_force=40.0, reuse_mass_matrix=True,
        )
        _ppo_smoke(
            EpisodeWrapper(env, max_len=40), _quadruped_net(jax.random.key(3)),
            combine_advantages=True,
        )
