"""Data-parallel mesh tests: permutation structure, sharded-vs-single
numeric parity of the full train step, and normalizer stat sync.

Runs on the 8-virtual-device CPU backend set up in conftest.py
(SURVEY §4: the multi-device testing the reference lacks).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.algorithms import (
    PPOConfig,
    make_optimizer,
    new_training_state,
)
from nnx_ppo_tpu.algorithms.ppo import ppo_step
from nnx_ppo_tpu.core.struct import partition_params
from nnx_ppo_tpu.networks import Normalizer, make_mlp_actor_critic
from nnx_ppo_tpu.parallel import make_mesh, minibatch_permutations
from nnx_ppo_tpu.test_dummies import MoveToCenterEnv
from nnx_ppo_tpu.wrappers import EpisodeWrapper


class TestMinibatchPermutations:
    def test_single_shard_is_full_permutation(self):
        inds = minibatch_permutations(jax.random.key(0), 16, 3, 4, n_shards=1)
        assert inds.shape == (12, 4)
        for e in range(3):
            epoch = np.asarray(inds[e * 4 : (e + 1) * 4]).ravel()
            np.testing.assert_array_equal(np.sort(epoch), np.arange(16))

    def test_sharded_stays_block_local(self):
        n_envs, shards, M = 32, 4, 2
        inds = minibatch_permutations(jax.random.key(0), n_envs, 2, M, n_shards=shards)
        per_shard = n_envs // shards
        k = per_shard // M
        for row in np.asarray(inds):
            # Each minibatch: equal share from every shard block, grouped.
            for s in range(shards):
                chunk = row[s * k : (s + 1) * k]
                assert ((chunk >= s * per_shard) & (chunk < (s + 1) * per_shard)).all()

    def test_sharded_covers_all_envs_per_epoch(self):
        inds = minibatch_permutations(jax.random.key(1), 32, 1, 4, n_shards=4)
        np.testing.assert_array_equal(np.sort(np.asarray(inds).ravel()), np.arange(32))

    def test_epochs_differ(self):
        inds = minibatch_permutations(jax.random.key(0), 64, 2, 1, n_shards=1)
        assert not np.array_equal(inds[0], inds[1])

    def test_divisibility_errors(self):
        with pytest.raises(ValueError):
            minibatch_permutations(jax.random.key(0), 10, 1, 4)
        with pytest.raises(ValueError):
            minibatch_permutations(jax.random.key(0), 12, 1, 4, n_shards=8)


def _run_step(mesh, n_shards_for_perm_match, *, n_epochs=1, n_minibatches=1,
              n_steps=1):
    """ppo_step iterations on ``mesh``. With ``n_epochs=n_minibatches=1``
    the permutation is the identity composition, so sharded and
    single-device runs compare directly. For E/M > 1 the single-device
    run must be fed the SAME shard-local permutations the mesh run uses
    — pass ``n_shards_for_perm_match`` > 1 to force that (isolates GSPMD
    numerics from the shard-local-minibatch semantic deviation)."""
    # Patch the permutation module itself: ppo_step routes through
    # parallel.permutation.minibatch_plan, which resolves
    # minibatch_permutations from its own module globals at call time.
    import nnx_ppo_tpu.parallel.permutation as ppo_mod

    env = EpisodeWrapper(MoveToCenterEnv(), 50)
    net = make_mlp_actor_critic(
        2, 2, [16, 16], [16, 16], jax.random.key(0), normalize_obs=True
    )
    config = PPOConfig(
        n_envs=32,
        rollout_length=6,
        n_epochs=n_epochs,
        n_minibatches=n_minibatches,
    )
    opt = make_optimizer(config.learning_rate)
    ts = new_training_state(env, net, config.n_envs, seed=0, mesh=mesh)

    orig_perm = ppo_mod.minibatch_permutations
    forced = n_shards_for_perm_match

    def forced_perm(key, n_envs, n_ep, n_mb, n_shards=1):
        return orig_perm(key, n_envs, n_ep, n_mb, max(n_shards, forced))

    ppo_mod.minibatch_permutations = forced_perm
    try:
        step = jax.jit(
            functools.partial(ppo_step, env, config=config, optimizer=opt,
                              mesh=mesh)
        )
        for _ in range(n_steps):
            ts, metrics = step(ts)
    finally:
        ppo_mod.minibatch_permutations = orig_perm
    return ts, metrics


class TestShardedParity:
    def test_sharded_matches_single_device(self):
        mesh = make_mesh(8)
        ts_m, metrics_m = _run_step(mesh, 8)
        ts_s, metrics_s = _run_step(None, 1)

        p_m, _ = partition_params(ts_m.networks)
        p_s, _ = partition_params(ts_s.networks)
        for a, b in zip(jax.tree.leaves(p_m), jax.tree.leaves(p_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        np.testing.assert_allclose(
            float(metrics_m["losses/actor/mean"]),
            float(metrics_s["losses/actor/mean"]),
            atol=1e-5,
        )

    def test_sharded_matches_single_device_multi_minibatch(self):
        """E=2/M=4 exact parity: the mesh run vs a single-device run fed
        the *same* shard-local permutations. Isolates GSPMD numerics
        from the shard-local-minibatch semantic deviation — the gather,
        per-minibatch gradients, and all 8 sequential updates must agree
        (VERDICT r1 item 3: previously only proven at E=M=1)."""
        mesh = make_mesh(8)
        ts_m, metrics_m = _run_step(mesh, 8, n_epochs=2, n_minibatches=4,
                                    n_steps=2)
        ts_s, metrics_s = _run_step(None, 8, n_epochs=2, n_minibatches=4,
                                    n_steps=2)

        p_m, _ = partition_params(ts_m.networks)
        p_s, _ = partition_params(ts_s.networks)
        for a, b in zip(jax.tree.leaves(p_m), jax.tree.leaves(p_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        np.testing.assert_allclose(
            float(metrics_m["losses/actor/mean"]),
            float(metrics_s["losses/actor/mean"]),
            atol=1e-5,
        )
        # Env-state advance must agree too (same rollout, same resets).
        np.testing.assert_allclose(
            np.asarray(ts_m.env_states.obs),
            np.asarray(ts_s.env_states.obs),
            atol=1e-5,
        )

    def test_unshuffled_minibatches_run_sharded(self):
        """``shuffle_minibatches=False`` (contiguous shard-local slices
        instead of permutation gathers — the measured +21% knob) must
        run on the mesh with finite losses and advance the step count;
        every env must still be consumed exactly once per epoch (the
        slices partition the batch)."""
        mesh = make_mesh(8)
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_mlp_actor_critic(
            2, 2, [16, 16], [16, 16], jax.random.key(0), normalize_obs=True
        )
        config = PPOConfig(
            n_envs=32, rollout_length=6, n_epochs=2, n_minibatches=4,
            shuffle_minibatches=False,
        )
        opt = make_optimizer(config.learning_rate)
        ts = new_training_state(env, net, config.n_envs, seed=0, mesh=mesh)
        step = jax.jit(
            functools.partial(ppo_step, env, config=config, optimizer=opt,
                              mesh=mesh)
        )
        ts, metrics = step(ts)
        assert jnp.isfinite(metrics["losses/actor/mean"])
        assert int(ts.steps_taken) == 32 * 6
        # Normalizer consumed the full rollout exactly once.
        assert float(ts.networks[0].counter) == 32 * 6

    @pytest.mark.slow
    def test_unshuffled_minibatches_converge(self):
        """Statistical gate for the +21% knob: training with contiguous
        (unshuffled) minibatches reaches the same MoveToCenter reward
        band as the shuffled default."""
        from nnx_ppo_tpu.algorithms import EvalConfig, TrainConfig, train_ppo

        env = EpisodeWrapper(MoveToCenterEnv(
            reward_falloff=1.0, border_radius=10.0), 200)
        net = make_mlp_actor_critic(
            2, 2, [64, 64], [64, 64], jax.random.key(3), normalize_obs=True
        )
        cfg = TrainConfig(
            ppo=PPOConfig(n_envs=256, rollout_length=20, n_epochs=4,
                          n_minibatches=4, shuffle_minibatches=False),
            eval=EvalConfig(every_steps=500_000, n_envs=64,
                            max_episode_length=100,
                            logging_percentiles=None),
            seed=3,
        )
        result = train_ppo(env, net, cfg, total_steps=1_500_000)
        best = max(
            float(e["episode_reward/mean"]) for e in result.eval_history
        )
        assert best > 80.0, f"unshuffled minibatches underperform: best={best}"

    @pytest.mark.slow
    def test_sharded_multi_minibatch_converges(self):
        """Statistical gate: shard-local minibatching (the intentional
        semantic deviation) trains MoveToCenter to the same reward band
        as single-device on the 8-virtual-device mesh with M>1."""
        from nnx_ppo_tpu.algorithms import EvalConfig, TrainConfig, train_ppo

        mesh = make_mesh(8)
        env = EpisodeWrapper(MoveToCenterEnv(
            reward_falloff=1.0, border_radius=10.0), 200)
        net = make_mlp_actor_critic(
            2, 2, [64, 64], [64, 64], jax.random.key(3), normalize_obs=True
        )
        cfg = TrainConfig(
            ppo=PPOConfig(n_envs=256, rollout_length=20, n_epochs=4,
                          n_minibatches=4),
            eval=EvalConfig(every_steps=500_000, n_envs=64,
                            max_episode_length=100,
                            logging_percentiles=None),
            seed=3,
        )
        result = train_ppo(env, net, cfg, total_steps=1_500_000, mesh=mesh)
        best = max(
            float(e["episode_reward/mean"]) for e in result.eval_history
        )
        assert best > 80.0, f"mesh M=4 training underperforms: best={best}"

    def test_normalizer_stats_globally_synced(self):
        mesh = make_mesh(8)
        ts_m, _ = _run_step(mesh, 8)
        ts_s, _ = _run_step(None, 1)
        norm_m = ts_m.networks[0]
        norm_s = ts_s.networks[0]
        assert isinstance(norm_m, Normalizer)
        assert float(norm_m.counter) == float(norm_s.counter) == 32 * 6
        np.testing.assert_allclose(
            np.asarray(norm_m.mean), np.asarray(norm_s.mean), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(norm_m.M2), np.asarray(norm_s.M2), rtol=1e-4, atol=1e-5
        )

    def test_state_sharding_layout(self):
        mesh = make_mesh(8)
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_mlp_actor_critic(2, 2, [16], [16], jax.random.key(0))
        ts = new_training_state(env, net, 32, seed=0, mesh=mesh)
        # Env states sharded over data; params replicated.
        env_sharding = ts.env_states.obs.sharding
        assert env_sharding.spec[0] == "data"
        p, _ = partition_params(ts.networks)
        kernel = jax.tree.leaves(p)[0]
        assert kernel.sharding.is_fully_replicated


class TestShardedPhysics:
    @pytest.mark.parametrize("randomized", [False, True])
    def test_quadruped_trains_on_mesh(self, randomized):
        """The contact-rich physics env (CRBA/RNEA/contacts per substep)
        shards over the 8-virtual-device data mesh like any analytic
        env: one sharded ppo_step with a dict-obs multi-stream net runs
        to completion with finite losses. ``randomized=True`` adds
        per-env domain randomization — the DomainParams NamedTuple in
        the env state must shard over the data axis like every other
        per-env leaf."""
        from nnx_ppo_tpu.envs import QuadrupedJoystick
        from nnx_ppo_tpu.physics import DomainRandomization
        from nnx_ppo_tpu.networks import (
            Concat,
            Dense,
            NormalTanhSampler,
            Parallel,
            PPOAdapter,
            Sequential,
            make_mlp,
        )

        mesh = make_mesh(8)
        env = EpisodeWrapper(
            QuadrupedJoystick(
                randomize=DomainRandomization() if randomized else None
            ),
            50,
        )
        k = jax.random.split(jax.random.key(0), 7)
        enc = Concat.create(
            proprio=Dense.create(42, 32, k[0], jax.nn.relu),
            command=Dense.create(3, 8, k[1], jax.nn.relu),
        )
        actor = Sequential.create([
            Dense.create(40, 32, k[2], jax.nn.relu),
            Dense.create(32, 24, k[3]),
            NormalTanhSampler.create(k[4]),
        ])
        critic = Parallel.create(
            tracking=make_mlp([40, 16, 1], k[5], activation_last_layer=False),
            penalty=make_mlp([40, 16, 1], k[6], activation_last_layer=False),
        )
        net = Sequential.create(
            [enc, PPOAdapter.create(action=actor, value=critic)]
        )
        config = PPOConfig(
            n_envs=16, rollout_length=2, n_epochs=1, n_minibatches=2,
            combine_advantages=True,
        )
        opt = make_optimizer(config.learning_rate)
        ts = new_training_state(env, net, config.n_envs, seed=0, mesh=mesh)
        step = jax.jit(
            functools.partial(ppo_step, env, config=config, optimizer=opt,
                              mesh=mesh)
        )
        ts, metrics = step(ts)
        assert jnp.isfinite(metrics["losses/actor/mean"])
        assert int(ts.steps_taken) == 16 * 2

    @pytest.mark.parametrize("features", [False, True],
                             ids=["bare", "production"])
    def test_pallas_kernel_partitions_over_mesh(self, features):
        """The physics megakernel must PARTITION over the data axis —
        not get all-gathered. Without a partitioning rule the SPMD
        partitioner treats the pallas_call as an opaque custom call and
        replicates the whole global batch on every device (measured:
        4 all-gathers, fully-replicated output — zero scaling); the
        custom_partitioning rule in pallas_step.py gives every device
        its local env shard. Asserts (a) no all-gather in the compiled
        program, (b) the output stays sharded on ``data``, and (c) the
        sharded result equals the single-device kernel result.
        ``production`` adds DR + push extras and terrain — the extra
        operand must partition too. Interpret mode (CPU), tiny shapes.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nnx_ppo_tpu.envs import QuadrupedJoystick

        mesh = make_mesh(8)
        B = 16
        kwargs = dict(
            reuse_mass_matrix=True, substep_impl="pallas", n_substeps=1
        )
        if features:
            from nnx_ppo_tpu.physics import DomainRandomization
            from nnx_ppo_tpu.physics.terrain import rough_terrain

            kwargs.update(
                randomize=DomainRandomization(),
                push_prob=0.5, push_force=40.0,
                terrain=rough_terrain(seed=3),
            )
        env = QuadrupedJoystick(**kwargs)
        states = jax.vmap(env.reset)(
            jax.random.split(jax.random.key(0), B)
        )
        actions = 0.2 * jax.random.normal(
            jax.random.key(1), (B, env.action_size)
        )

        def shard(x):
            spec = P(*(("data",) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        states_s = jax.tree.map(shard, states)
        actions_s = shard(actions)
        step = jax.jit(jax.vmap(env.step))
        compiled = step.lower(states_s, actions_s).compile()
        assert "all-gather" not in compiled.as_text(), (
            "megakernel operands were all-gathered — the "
            "custom_partitioning rule did not engage"
        )
        out = step(states_s, actions_s)
        assert out.data["qpos"].sharding.spec == P("data")

        dev0 = jax.devices()[0]
        out1 = jax.jit(jax.vmap(env.step))(
            jax.tree.map(lambda x: jax.device_put(x, dev0), states),
            jax.device_put(actions, dev0),
        )
        np.testing.assert_allclose(
            np.asarray(out.data["qpos"]), np.asarray(out1.data["qpos"]),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out.data["qvel"]), np.asarray(out1.data["qvel"]),
            rtol=1e-6, atol=1e-6,
        )


class TestNoCrossShardGathers:
    def test_train_step_has_no_cross_shard_data_gathers(self):
        """With shard-local minibatch permutations, no rollout/replay
        DATA crosses shards in the compiled train step: no all-to-all,
        no collective-permute, and every all-gather is a tiny s32 INDEX
        materialization (GSPMD replicating the 64-byte per-minibatch
        selector slice before each shard-local buffer gather — inherent
        to a sharded gather with replicated indices, and measured
        immune to sharding constraints on the selectors). This is the
        HLO-level gate behind the weak-scaling table
        (benchmarks/weak_scaling.py; SURVEY §2.6, BASELINE ≥85%
        retention target)."""
        import re
        mesh = make_mesh(8)
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        net = make_mlp_actor_critic(
            2, 2, [16, 16], [16, 16], jax.random.key(0), normalize_obs=True
        )
        config = PPOConfig(
            n_envs=32, rollout_length=5, n_epochs=2, n_minibatches=2
        )
        opt = make_optimizer(config.learning_rate)
        ts = new_training_state(env, net, config.n_envs, seed=0, mesh=mesh)
        hlo = (
            jax.jit(
                functools.partial(
                    ppo_step, env, config=config, optimizer=opt, mesh=mesh
                )
            )
            .lower(ts)
            .compile()
            .as_text()
        )
        for op in ("all-to-all", "collective-permute"):
            assert op not in hlo, f"unexpected {op} in the train step"
        # Every all-gather must be an s32 index-vector materialization
        # of at most a few hundred bytes — never env-batched f32 data.
        for m in re.finditer(r"all-gather[^=]*= (\w+)\[([\d,]*)\]", hlo):
            dtype, dims = m.group(1), m.group(2)
            n_elems = 1
            for d in dims.split(","):
                if d:
                    n_elems *= int(d)
            assert dtype == "s32" and n_elems <= 256, (
                f"data-sized all-gather in the train step: "
                f"{dtype}[{dims}]"
            )
        assert "all-reduce" in hlo  # grads/stats still reduce globally
