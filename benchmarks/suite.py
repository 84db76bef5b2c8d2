"""Benchmark suite: the five BASELINE.md configs, measured on whatever
devices are visible (one real TPU chip under the driver; a fake
N-device CPU mesh with ``JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=N``).

Each config measures steady-state ``throughput/train_sps`` =
n_envs · rollout_length / wall-clock per fused train step with
``jax.block_until_ready`` barriers (the reference's methodology,
``nnx_ppo/algorithms/ppo.py:210-214``).

Run:  python benchmarks/suite.py [config-name ...]
Prints one JSON line per config.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Honor an explicit JAX_PLATFORMS env var: this image's site hook forces
# the tunneled-TPU platform programmatically at import, and a wedged
# tunnel HANGS backend init instead of falling back (same pattern as
# bench.py / __graft_entry__.py).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: reruns of the same configs skip the
# 10-60s XLA compile (cache keys include program + flags + platform).
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), '../.jax_cache'))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_multi_step
from nnx_ppo_tpu.envs import CartpoleBalance, JoystickLocomotion, NLinkSwingup
from nnx_ppo_tpu.networks import (
    GRU,
    Concat,
    Dense,
    NormalTanhSampler,
    Parallel,
    PPOAdapter,
    Sequential,
    make_mlp,
    make_mlp_actor_critic,
)
from nnx_ppo_tpu.parallel import make_mesh
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def _mlp_cartpole(compute_dtype=None, replay_store_dtype="float32"):
    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    net = make_mlp_actor_critic(
        env.observation_size, env.action_size, [64] * 4, [256] * 2,
        jax.random.key(0), entropy_weight=1e-3, compute_dtype=compute_dtype,
    )
    return env, net, PPOConfig(
        n_envs=1024, rollout_length=30,
        replay_store_dtype=replay_store_dtype,
    )


def _mlp_wide(compute_dtype="bfloat16", n_envs=8192):
    # MXU-saturation config: the analytic flagship env with production-
    # scale MLPs (actor 4x1024, critic 2x2048) so the train step is
    # matmul-dominated rather than dispatch/latency-bound — the config
    # whose MFU (benchmarks/roofline.py) measures TPU compute
    # utilization instead of framework overhead.
    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    net = make_mlp_actor_critic(
        env.observation_size, env.action_size, [1024] * 4, [2048] * 2,
        jax.random.key(0), entropy_weight=1e-3, compute_dtype=compute_dtype,
    )
    return env, net, PPOConfig(n_envs=n_envs, rollout_length=20)


def _gru_cartpole(replay_unroll=None):
    import dataclasses

    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    k = jax.random.split(jax.random.key(0), 6)

    def gru(i, h, key):
        g = GRU.create(i, h, key)
        if replay_unroll is not None:
            g = dataclasses.replace(g, replay_unroll=replay_unroll)
        return g

    actor = Sequential.create([
        gru(env.observation_size, 64, k[0]),
        Dense.create(64, 2 * env.action_size, k[1]),
        NormalTanhSampler.create(k[2], entropy_weight=1e-3),
    ])
    critic = Sequential.create([
        gru(env.observation_size, 64, k[3]),
        Dense.create(64, 1, k[4]),
    ])
    net = PPOAdapter.create(action=actor, value=critic)
    return env, net, PPOConfig(n_envs=1024, rollout_length=30)


def _dict_obs_multistream():
    env = EpisodeWrapper(JoystickLocomotion(), max_len=500)
    k = jax.random.split(jax.random.key(0), 7)
    enc = Concat.create(
        proprio=Dense.create(
            env.observation_size["proprio"], 64, k[0], jax.nn.relu
        ),
        command=Dense.create(env.observation_size["command"], 32, k[1], jax.nn.relu),
    )
    actor = Sequential.create([
        Dense.create(96, 64, k[2], jax.nn.relu),
        Dense.create(64, 2 * env.action_size, k[3]),
        NormalTanhSampler.create(k[4], entropy_weight=1e-3),
    ])
    critic = Parallel.create(
        tracking=make_mlp([96, 64, 1], k[5], activation_last_layer=False),
        penalty=make_mlp([96, 64, 1], k[6], activation_last_layer=False),
    )
    net = Sequential.create([enc, PPOAdapter.create(action=actor, value=critic)])
    return env, net, PPOConfig(
        n_envs=1024, rollout_length=30, combine_advantages=True
    )


def _locomotion_4096():
    # Quadruped-class joystick task at 4096 envs with obs normalization
    # (BASELINE config 4 shape; analytic substrate — see envs/locomotion.py).
    env = EpisodeWrapper(JoystickLocomotion(), max_len=500)
    k = jax.random.split(jax.random.key(0), 7)
    enc = Concat.create(
        proprio=Sequential.create([
            Dense.create(env.observation_size["proprio"], 128, k[0], jax.nn.relu),
        ]),
        command=Dense.create(env.observation_size["command"], 32, k[1], jax.nn.relu),
    )
    actor = Sequential.create([
        Dense.create(160, 128, k[2], jax.nn.relu),
        Dense.create(128, 2 * env.action_size, k[3]),
        NormalTanhSampler.create(k[4], entropy_weight=1e-3),
    ])
    critic = Parallel.create(
        tracking=make_mlp([160, 128, 1], k[5], activation_last_layer=False),
        penalty=make_mlp([160, 128, 1], k[6], activation_last_layer=False),
    )
    net = Sequential.create([enc, PPOAdapter.create(action=actor, value=critic)])
    return env, net, PPOConfig(
        n_envs=4096, rollout_length=20, combine_advantages=True
    )


def _heavy_physics_8192():
    # Articulated-body physics at 8192 envs (BASELINE config 5 class:
    # mass-matrix assembly + Cholesky solve per env per substep).
    env = EpisodeWrapper(NLinkSwingup(n_links=5), max_len=500)
    net = make_mlp_actor_critic(
        env.observation_size, env.action_size, [256, 256], [256, 256],
        jax.random.key(0), entropy_weight=1e-3,
    )
    return env, net, PPOConfig(n_envs=8192, rollout_length=20)


def _legged_physics(
    env_name,
    n_envs=2048,
    reuse_mass_matrix=False,
    self_collision=False,
    joint_limits=False,
    rough=False,
    height_scan=0,
    randomize=False,
    push=False,
    normalize=False,
    depthwise=None,
    substep_impl="auto",
    pallas_substeps_per_kernel=1,
    pallas_in_kernel_factor=True,
    shuffle_minibatches=True,
    replay_store_dtype="float32",
):
    # Real contact-rich rigid-body physics (physics/ engine) through the
    # full PPO pipeline — the Go1JoystickFlatTerrain / HumanoidWalk
    # workload classes from BASELINE.md on the in-repo MJX-equivalent
    # substrate: per control step, 10 substeps x (CRBA [nv,nv] + RNEA +
    # sphere contacts + blocked Cholesky).
    from nnx_ppo_tpu.envs import HumanoidJoystick, QuadrupedJoystick

    if env_name == "mjcf_quadruped":
        import os
        import sys

        examples_dir = os.path.join(
            os.path.dirname(__file__), "..", "examples"
        )
        if examples_dir not in sys.path:
            sys.path.insert(0, examples_dir)
        from mjcf_import import make_env

        def env_cls(**kw):
            # The MJCF XML fixes the collision/limit surface; only the
            # generic LeggedJoystick options pass through.
            if kw.pop("self_collision", False) or kw.pop(
                "joint_limits", False
            ):
                raise ValueError(
                    "mjcf_quadruped variants are defined by the XML"
                )
            return make_env(**kw)
    else:
        env_cls = {"quadruped": QuadrupedJoystick,
                   "humanoid": HumanoidJoystick}[env_name]
    extra = {}
    if rough:
        from nnx_ppo_tpu.physics import rough_terrain

        terr = rough_terrain(seed=2, amplitude=0.03, wavelength=1.5)
        if rough == "grid":
            # Data terrain: the same rough field sampled onto a
            # HeightGrid (the MJCF-hfield workload class) — rides the
            # megakernel as frozen per-control-step tangent-plane lanes
            # (tests/test_heightgrid_kernel.py).
            from nnx_ppo_tpu.physics.terrain import HeightGrid

            terr = HeightGrid.sample(terr, extent=12.0, n=256)
        extra["terrain"] = terr
        if height_scan:
            extra["height_scan"] = height_scan
    if randomize:
        from nnx_ppo_tpu.physics import DomainRandomization

        extra["randomize"] = DomainRandomization(
            mass_scale=(0.8, 1.2), friction=(0.4, 1.0),
            damping_scale=(0.9, 1.1), gain_scale=(0.9, 1.1),
        )
    if push:
        # Standard disturbance-rejection curriculum: ~1 push/s at 50 Hz
        # control, 50 N horizontal for one control step.
        extra["push_prob"] = 0.02
        extra["push_force"] = 50.0
    env = EpisodeWrapper(
        env_cls(
            reuse_mass_matrix=reuse_mass_matrix,
            self_collision=self_collision,
            joint_limits=joint_limits,
            depthwise=depthwise,
            substep_impl=substep_impl,
            pallas_substeps_per_kernel=pallas_substeps_per_kernel,
            pallas_in_kernel_factor=pallas_in_kernel_factor,
            **extra,
        ),
        max_len=500,
    )
    # Sizes from the constructed env (EpisodeWrapper delegates), so
    # MJCF-imported configs need no hardcoded duplicates.
    proprio = env.observation_size["proprio"]
    n_act = env.action_size
    k = jax.random.split(jax.random.key(0), 7)
    enc = Concat.create(
        proprio=Dense.create(proprio, 128, k[0], jax.nn.relu),
        command=Dense.create(3, 32, k[1], jax.nn.relu),
    )
    actor = Sequential.create([
        Dense.create(160, 128, k[2], jax.nn.relu),
        Dense.create(128, 2 * n_act, k[3]),
        NormalTanhSampler.create(k[4], entropy_weight=1e-3),
    ])
    critic = Parallel.create(
        tracking=make_mlp([160, 128, 1], k[5], activation_last_layer=False),
        penalty=make_mlp([160, 128, 1], k[6], activation_last_layer=False),
    )
    net = Sequential.create([enc, PPOAdapter.create(action=actor, value=critic)])
    if normalize:
        # BASELINE config #4 says "obs normalization": running Welford
        # stats over the dict obs — adds the extras channel + a
        # device-side stats fold per train step.
        from nnx_ppo_tpu.networks import Normalizer

        net = Sequential.create(
            [Normalizer.create(env.observation_size), net]
        )
    return env, net, PPOConfig(
        n_envs=n_envs, rollout_length=20, combine_advantages=True,
        shuffle_minibatches=shuffle_minibatches,
        replay_store_dtype=replay_store_dtype,
    )


def _reacher_4096():
    # Manipulation family: ball-joint shoulder arm, torque control.
    from nnx_ppo_tpu.envs import ArmReacher

    env = EpisodeWrapper(ArmReacher(), max_len=150)
    net = make_mlp_actor_critic(
        env.observation_size, env.action_size, [128, 128], [256, 256],
        jax.random.key(0), entropy_weight=2e-3, normalize_obs=True,
    )
    return env, net, PPOConfig(n_envs=4096, rollout_length=20)


def _pusher_4096():
    # Object interaction: multi-tree scene (arm + free ball coupled by a
    # cross-tree contact, physics/scene.py) — two mass-matrix solves per
    # substep plus the cross-pair force.
    from nnx_ppo_tpu.envs import ArmPush

    env = EpisodeWrapper(ArmPush(), max_len=200)
    net = make_mlp_actor_critic(
        env.observation_size, env.action_size, [128, 128], [256, 256],
        jax.random.key(0), entropy_weight=2e-3, normalize_obs=True,
    )
    return env, net, PPOConfig(n_envs=4096, rollout_length=20)


def _population_graph():
    # Recurrent population graph actor (round-1 measurement setup:
    # sensor -> core(64, tanh) with a delay-1 self-loop -> motor).
    # Round 1 recorded 2.4M sps with the exact per-step replay scan;
    # this config now exercises the SCC-condensed fused replay
    # (graph.py replay_sequence).
    from nnx_ppo_tpu.networks import Flattener, Filter
    from nnx_ppo_tpu.networks.graph import PopulationGraph

    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    b = PopulationGraph.builder(jax.random.key(3))
    b.add_input("sensor", env.observation_size, input_from="obs")
    b.add_population("core", 64, activation=jax.numpy.tanh)
    b.add_output("motor", 2 * env.action_size)
    b.connect("sensor", "core")
    b.connect("core", "core", delay=1)
    b.connect("core", "motor")
    g = b.finalize()
    k = jax.random.split(jax.random.key(4), 3)
    actor = Sequential.create([
        Filter.create({"obs": lambda x: x}),
        g,
        Filter.create({"motor": "motor"}),
        Flattener.create(),
        NormalTanhSampler.create(k[0], entropy_weight=1e-3),
    ])
    critic = make_mlp(
        [env.observation_size, 256, 1], k[1], activation_last_layer=False
    )
    net = PPOAdapter.create(action=actor, value=critic)
    return env, net, PPOConfig(n_envs=1024, rollout_length=30)




CONFIGS = {
    "cartpole_mlp": _mlp_cartpole,
    "cartpole_mlp_bf16": functools.partial(_mlp_cartpole, compute_dtype="bfloat16"),
    "mlp_wide_bf16_8192": _mlp_wide,
    "mlp_wide_f32_8192": functools.partial(_mlp_wide, compute_dtype=None),
    "cartpole_gru": _gru_cartpole,
    # Replay-scan unroll A/B pins (networks/recurrent.py replay_unroll).
    "cartpole_gru_unroll1": functools.partial(_gru_cartpole,
                                              replay_unroll=1),
    "cartpole_gru_unroll4": functools.partial(_gru_cartpole,
                                              replay_unroll=4),
    "dict_obs_multistream": _dict_obs_multistream,
    "locomotion_4096": _locomotion_4096,
    "heavy_physics_8192": _heavy_physics_8192,
    "quadruped_2048": functools.partial(_legged_physics, "quadruped"),
    "quadruped_8192": functools.partial(_legged_physics, "quadruped",
                                        n_envs=8192),
    "humanoid_2048": functools.partial(_legged_physics, "humanoid"),
    "quadruped_2048_fastM": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True
    ),
    # XLA depthwise pin of the held-factor path (on TPU, 'auto' configs
    # take the Pallas in-kernel-factor megakernel; this row measures
    # what the pure-XLA engine does on the same workload).
    "quadruped_2048_fastM_xla": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True,
        substep_impl="xla",
    ),
    # Pallas physics megakernel (physics/pallas_step.py): the whole
    # fastM substep chain fused into one kernel per env tile —
    # collapses the ~hundreds of tiny sequential VPU kernels/substep
    # the XLA path dispatches. 'pallas' forces the kernel (raises if
    # the model is unsupported); compare against the *_fastM rows.
    "quadruped_2048_pallas": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True,
        substep_impl="pallas",
    ),
    "quadruped_8192_pallas": functools.partial(
        _legged_physics, "quadruped", n_envs=8192,
        reuse_mass_matrix=True, substep_impl="pallas",
    ),
    "humanoid_2048_pallas": functools.partial(
        _legged_physics, "humanoid", reuse_mass_matrix=True,
        substep_impl="pallas",
    ),
    # Pin: Pallas substeps with the factor still built XLA-side (the
    # pre-in-kernel-factor path), for measuring what moving CRBA+chol
    # into the kernel is worth.
    "quadruped_2048_pallas_xlafactor": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True,
        substep_impl="pallas", pallas_in_kernel_factor=False,
        pallas_substeps_per_kernel=-1,
    ),
    # Fully-fused variant: ALL substeps of a control step unrolled
    # inside ONE Pallas launch (intermediates VMEM-resident across
    # substeps, one dispatch per control step). Separate configs
    # because the 10x-larger Mosaic program is the known compile risk.
    "quadruped_2048_pallas_fused": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True,
        substep_impl="pallas", pallas_substeps_per_kernel=-1,
    ),
    "quadruped_8192_pallas_fused": functools.partial(
        _legged_physics, "quadruped", n_envs=8192,
        reuse_mass_matrix=True, substep_impl="pallas",
        pallas_substeps_per_kernel=-1,
    ),
    "humanoid_2048_pallas_fused": functools.partial(
        _legged_physics, "humanoid", reuse_mass_matrix=True,
        substep_impl="pallas", pallas_substeps_per_kernel=-1,
    ),
    # Generic (body-sequential) engine pin, for comparing against the
    # depth-wise batched default on supported models.
    "quadruped_2048_fastM_generic": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True,
        depthwise=False, substep_impl="xla",
    ),
    # Exact-dynamics generic pins (per-substep CRBA + factorization,
    # no held factor): isolates whether the depthwise engine's
    # Gram-form mass matrix helps or hurts the exact path on TPU.
    "quadruped_2048_generic": functools.partial(
        _legged_physics, "quadruped", depthwise=False,
        substep_impl="xla",
    ),
    "humanoid_2048_generic": functools.partial(
        _legged_physics, "humanoid", depthwise=False,
        substep_impl="xla",
    ),
    "humanoid_2048_fastM_generic": functools.partial(
        _legged_physics, "humanoid", reuse_mass_matrix=True,
        depthwise=False, substep_impl="xla",
    ),
    "quadruped_8192_fastM": functools.partial(
        _legged_physics, "quadruped", n_envs=8192, reuse_mass_matrix=True
    ),
    "humanoid_2048_fastM": functools.partial(
        _legged_physics, "humanoid", reuse_mass_matrix=True
    ),
    # Full-featured contact model: foot self-collision pairs + joint
    # range stops on top of the ground contacts — measures the marginal
    # cost of the round-2 engine extensions.
    "quadruped_2048_full": functools.partial(
        _legged_physics, "quadruped", self_collision=True, joint_limits=True
    ),
    "humanoid_2048_full": functools.partial(
        _legged_physics, "humanoid", self_collision=True, joint_limits=True
    ),
    # Full contact feature set on the held (M+dt·D)⁻¹ fast path — the
    # _full configs above pay a per-substep factorization; these show
    # the full model at fastM cost (VERDICT r2 item 4 lever).
    "quadruped_2048_full_fastM": functools.partial(
        _legged_physics, "quadruped", self_collision=True,
        joint_limits=True, reuse_mass_matrix=True,
    ),
    "humanoid_2048_full_fastM": functools.partial(
        _legged_physics, "humanoid", self_collision=True,
        joint_limits=True, reuse_mass_matrix=True,
    ),
    # ...and through the Pallas megakernel (pairs/limits/springs are in
    # the SoA feature set).
    "quadruped_2048_full_pallas": functools.partial(
        _legged_physics, "quadruped", self_collision=True,
        joint_limits=True, reuse_mass_matrix=True, substep_impl="pallas",
    ),
    # Heightfield ground (physics/terrain.py): per-geom analytic
    # normal/penetration instead of the flat-plane fast path. Since
    # round 4 the analytic terrain rides the megakernel — on TPU,
    # 'auto' takes the in-kernel-refactor Pallas path.
    "quadruped_2048_rough": functools.partial(
        _legged_physics, "quadruped", rough=True
    ),
    "quadruped_2048_rough_xla": functools.partial(
        _legged_physics, "quadruped", rough=True, substep_impl="xla"
    ),
    # Data (HeightGrid/hfield) terrain — previously pinned to the XLA
    # substep chain (75k); now rides the megakernel via frozen
    # tangent-plane lanes. The _xla row keeps the exact per-substep
    # bilinear reference semantics measurable.
    "quadruped_2048_heightgrid": functools.partial(
        _legged_physics, "quadruped", rough="grid", reuse_mass_matrix=True,
    ),
    "quadruped_2048_heightgrid_xla": functools.partial(
        _legged_physics, "quadruped", rough="grid", substep_impl="xla",
        reuse_mass_matrix=True,
    ),
    # Per-env domain randomization: the traced mass/friction/damping/
    # gain overrides. Since round 4 these are extra lanes of the
    # megakernel ('auto' → Pallas on TPU); the _xla pin preserves the
    # round-3 cliff baseline (75k env-steps/s on v5e).
    "quadruped_2048_dr": functools.partial(
        _legged_physics, "quadruped", randomize=True
    ),
    "quadruped_2048_dr_xla": functools.partial(
        _legged_physics, "quadruped", randomize=True, substep_impl="xla"
    ),
    "quadruped_2048_dr_pallas": functools.partial(
        _legged_physics, "quadruped", randomize=True,
        reuse_mass_matrix=True, substep_impl="pallas",
    ),
    # Contiguous-slice minibatching (PPOConfig.shuffle_minibatches=False):
    # drops the per-minibatch permutation gathers + their layout copies
    # (~16% of the step in the device profile) for fixed env blocks.
    "quadruped_2048_pallas_noshuffle": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True,
        substep_impl="pallas", shuffle_minibatches=False,
    ),
    # The env construction users get with NO knobs: QuadrupedJoystick()
    # — exact dynamics (no held factor), 'auto' dispatch. On TPU this
    # routes to the in-kernel-refactor megakernel (VERDICT r3 weak #2:
    # the default path deserves its own measured row).
    "quadruped_2048_default": functools.partial(
        _legged_physics, "quadruped"
    ),
    # Sim-to-real production class: DR + pushes + rough terrain + obs
    # normalization, held factor, kernel path — the feature set
    # BASELINE's Go1JoystickFlatTerrain class conventionally trains
    # with, all riding the megakernel since round 4.
    "quadruped_2048_production": functools.partial(
        _legged_physics, "quadruped", randomize=True, push=True,
        rough=True, normalize=True, reuse_mass_matrix=True,
    ),
    "quadruped_2048_production_pallas": functools.partial(
        _legged_physics, "quadruped", randomize=True, push=True,
        rough=True, normalize=True, reuse_mass_matrix=True,
        substep_impl="pallas",
    ),
    "quadruped_2048_production_noshuffle": functools.partial(
        _legged_physics, "quadruped", randomize=True, push=True,
        rough=True, normalize=True, reuse_mass_matrix=True,
        shuffle_minibatches=False,
    ),
    # bf16 replay-store A/B (PPOConfig.replay_store_dtype): halves the
    # obs bytes the E·M per-minibatch gathers move. Exact for
    # bf16-compute stacks; bf16-rounded replay obs otherwise.
    "quadruped_2048_pallas_bf16store": functools.partial(
        _legged_physics, "quadruped", reuse_mass_matrix=True,
        substep_impl="pallas", replay_store_dtype="bfloat16",
    ),
    "quadruped_2048_production_bf16store": functools.partial(
        _legged_physics, "quadruped", randomize=True, push=True,
        rough=True, normalize=True, reuse_mass_matrix=True,
        substep_impl="pallas", replay_store_dtype="bfloat16",
    ),
    "cartpole_mlp_bf16store": functools.partial(
        _mlp_cartpole, replay_store_dtype="bfloat16",
    ),
    # BASELINE config-fidelity rows: #4 = Go1 class @ 4096 envs WITH
    # obs normalization; #5 = humanoid @ 8192 envs.
    "quadruped_4096_norm": functools.partial(
        _legged_physics, "quadruped", n_envs=4096, normalize=True,
        reuse_mass_matrix=True,
    ),
    "quadruped_4096_pallas": functools.partial(
        _legged_physics, "quadruped", n_envs=4096,
        reuse_mass_matrix=True, substep_impl="pallas",
    ),
    "humanoid_8192_pallas": functools.partial(
        _legged_physics, "humanoid", n_envs=8192,
        reuse_mass_matrix=True, substep_impl="pallas",
    ),
    "population_graph": _population_graph,
    "reacher_4096": _reacher_4096,
    "pusher_4096": _pusher_4096,
    # MJCF-imported quadruped (examples/mjcf_import.py XML →
    # physics/mjcf.py → LeggedJoystick): measures that the import path
    # produces the same-throughput-class model as the native builder.
    "mjcf_quadruped_2048": functools.partial(
        _legged_physics, "mjcf_quadruped", reuse_mass_matrix=True
    ),
}


STEPS_PER_CALL = 10
# Variance policy (VERDICT r4 weak #5): every row is the MEDIAN of
# N_REPEATS barrier-bounded windows from one process, with the raw
# per-window values kept in the row — a single anomalous window (first
# touch, thermal, tunnel hiccup) can no longer silently become a
# regression baseline.
N_REPEATS = 3


def _measure_window(step, ts, iters, n_per_iter):
    s0 = int(ts.steps_taken)  # forced scalar readout = honest barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, metrics = step(ts)
    # Derive throughput from the device-side step counter behind a forced
    # scalar readout — block_until_ready alone has been observed to
    # return early on tunneled runtimes.
    s1 = int(ts.steps_taken)
    elapsed = time.perf_counter() - t0
    assert s1 - s0 == n_per_iter * iters
    return ts, metrics, (s1 - s0) / elapsed


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def _row_common(config, n_devices, compile_s, sps_windows, note=None) -> dict:
    result = {
        "train_sps": round(_median(sps_windows)),
        # Raw per-window values + policy, so the row survives its own
        # variance (VERDICT r4 weak #5).
        "sps_windows": [round(s) for s in sps_windows],
        "aggregation": f"median_of_{len(sps_windows)}",
        "n_envs": config.n_envs,
        "rollout_length": config.rollout_length,
        "n_devices": n_devices,
        "warmup_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
        "platform": jax.devices()[0].platform,
        # Row semantics: minibatch shuffle + resolved buffer layout are
        # the two knobs that change what a number MEANS.
        "shuffle": getattr(config, "shuffle_minibatches", True),
        # Runtime-era tag: rows from different sessions/runtimes are
        # not comparable (VERDICT r3 weak #3) — every row is dated.
        "date": time.strftime("%Y-%m-%d"),
        "jax": jax.__version__,
    }
    if note:
        result["note"] = note
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if stats and "peak_bytes_in_use" in stats:
        result["hbm_peak_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
        if "bytes_limit" in stats:
            result["hbm_limit_gb"] = round(stats["bytes_limit"] / 2**30, 2)
    return result


def bench(name: str, warmup: int = 2, iters: int = 10,
          profile: bool = False, repeats: int = N_REPEATS) -> dict:
    import jax.numpy as jnp

    from nnx_ppo_tpu.algorithms.ppo import resolve_batch_major

    env, net, config = CONFIGS[name]()
    n_devices = len(jax.devices())
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    optimizer = make_optimizer(config.learning_rate)
    ts = new_training_state(env, net, config.n_envs, seed=0, mesh=mesh)
    step = jax.jit(
        functools.partial(
            ppo_multi_step, env, config=config, optimizer=optimizer,
            n_steps=STEPS_PER_CALL, mesh=mesh,
        ),
        donate_argnums=(0,),
    )
    t_compile = time.perf_counter()
    for _ in range(warmup):
        ts, metrics = step(ts)
    int(ts.steps_taken)
    compile_s = time.perf_counter() - t_compile

    profile_dir = None
    if profile:
        # Device trace of the measured iterations (VERDICT round-2
        # item 3): view with xprof / Perfetto. The trace covers the
        # same barrier-bounded window the sps number reports.
        profile_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "results", "profiles", name,
        )
        os.makedirs(profile_dir, exist_ok=True)
        jax.profiler.start_trace(profile_dir)
    n_per_iter = config.n_envs * config.rollout_length * STEPS_PER_CALL
    sps_windows = []
    for _ in range(repeats if not profile else 1):
        ts, metrics, sps = _measure_window(step, ts, iters, n_per_iter)
        sps_windows.append(sps)
    if profile_dir is not None:
        jax.profiler.stop_trace()
    actor_loss = float(metrics["losses/actor/mean"])
    assert jnp.isfinite(actor_loss)
    result = {"config": name}
    result.update(
        _row_common(config, n_devices, compile_s, sps_windows)
    )
    result["rollout_layout"] = (
        "batch_major" if resolve_batch_major(config, net) else "time_major"
    )
    return result


# --------------------------------------------------------- distillation
# TPU throughput rows for the distillation algorithm (VERDICT r4 weak
# #4: the only shipped algorithm with no TPU evidence). The hot path is
# a dual rollout (teacher eval forward + student forward per env step,
# megakernel env) + the student's teacher-extras NLL replay. Teacher
# weights are fresh — throughput does not depend on policy quality.


def _distill_quadruped(shuffle_minibatches=True, n_envs=2048):
    from nnx_ppo_tpu.algorithms.config import DistillationConfig

    import jax.numpy as jnp

    env, teacher, _ = CONFIGS["quadruped_2048_fastM"]()
    # Student: same architecture, independent init (the distillation
    # contract needs isomorphic state/extras trees). A student identical
    # in params to the teacher would make the NLL degenerate; jitter the
    # params deterministically.
    _, student, _ = CONFIGS["quadruped_2048_fastM"]()
    from nnx_ppo_tpu.core.struct import combine, partition_params

    p, rest = partition_params(student)
    p = jax.tree.map(
        lambda x: x
        + 0.01 * jnp.sign(jnp.sin(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape))
        if hasattr(x, "shape") and x.dtype == jnp.float32
        else x,
        p,
    )
    student = combine(p, rest)
    cfg = DistillationConfig(
        n_envs=n_envs,
        rollout_length=20,
        shuffle_minibatches=shuffle_minibatches,
    )
    return env, teacher.eval(), student, cfg


DISTILL_CONFIGS = {
    "distill_quadruped_2048": functools.partial(_distill_quadruped),
    "distill_quadruped_2048_noshuffle": functools.partial(
        _distill_quadruped, shuffle_minibatches=False
    ),
}


def bench_distill(name: str, warmup: int = 2, iters: int = 10,
                  repeats: int = N_REPEATS) -> dict:
    import jax.numpy as jnp

    from nnx_ppo_tpu.algorithms.distillation import (
        distillation_multi_step,
        new_distillation_state,
    )
    from nnx_ppo_tpu.algorithms.ppo import resolve_batch_major

    env, teacher, student, config = DISTILL_CONFIGS[name]()
    n_devices = len(jax.devices())
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    optimizer = make_optimizer(config.learning_rate)
    state = new_distillation_state(
        env, teacher, student, config.n_envs, seed=0, mesh=mesh
    )
    step = jax.jit(
        functools.partial(
            distillation_multi_step,
            env,
            teacher,
            config=config,
            optimizer=optimizer,
            n_steps=STEPS_PER_CALL,
            mesh=mesh,
        ),
        donate_argnums=(0,),
    )
    t_compile = time.perf_counter()
    for _ in range(warmup):
        state, metrics = step(state)
    int(state.steps_taken)
    compile_s = time.perf_counter() - t_compile
    n_per_iter = config.n_envs * config.rollout_length * STEPS_PER_CALL
    sps_windows = []
    for _ in range(repeats):
        state, metrics, sps = _measure_window(step, state, iters, n_per_iter)
        sps_windows.append(sps)
    nll = float(metrics["losses/distillation_nll/mean"])
    assert jnp.isfinite(nll)
    result = {"config": name, "algo": "distillation"}
    result.update(_row_common(config, n_devices, compile_s, sps_windows))
    result["rollout_layout"] = (
        "batch_major" if resolve_batch_major(config, student) else "time_major"
    )
    return result


def main() -> None:
    argv = sys.argv[1:]
    profile = "--profile" in argv
    names = [a for a in argv if not a.startswith("--")] or (
        list(CONFIGS) + list(DISTILL_CONFIGS)
    )
    if len(names) == 1:
        if names[0] in DISTILL_CONFIGS:
            print(json.dumps(bench_distill(names[0])), flush=True)
        else:
            print(json.dumps(bench(names[0], profile=profile)), flush=True)
        return
    # One subprocess per config: live executables/buffers from an earlier
    # config degrade later in-process measurements by 10-50x (observed on
    # the tunneled single-chip setup), so isolate each run.
    import subprocess

    for name in names:
        cmd = [sys.executable, __file__, name]
        if profile:
            cmd.append("--profile")
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
