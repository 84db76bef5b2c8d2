"""Policy distillation on the contact-rich quadruped: train a teacher
with PPO, then distill it into a half-width student (Rusu-2015, the
reference's distillation capability exercised on real articulated
physics instead of cartpole).

    python examples/distill_quadruped.py [--teacher-steps N]
        [--distill-steps N] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import dataclasses

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    PPOConfig,
    TrainConfig,
    train_distillation,
    train_ppo,
)
from nnx_ppo_tpu.algorithms.distillation import default_distillation_config
from nnx_ppo_tpu.algorithms.rollout import eval_rollout
from nnx_ppo_tpu.envs import QuadrupedJoystick
from nnx_ppo_tpu.wrappers import EpisodeWrapper

from examples.legged_training import make_net


def small_net(key):
    """Half-width student with the same structure (isomorphic
    state/extras trees are required by the distillation contract)."""

    from nnx_ppo_tpu.networks import (
        Concat,
        Dense,
        NormalTanhSampler,
        Normalizer,
        Parallel,
        PPOAdapter,
        Sequential,
        make_mlp,
    )

    k = jax.random.split(key, 7)
    obs_spec = QuadrupedJoystick.observation_size
    enc = Concat.create(
        proprio=Dense.create(obs_spec["proprio"], 128, k[0], jax.nn.swish),
        command=Dense.create(obs_spec["command"], 16, k[1], jax.nn.swish),
    )
    actor = Sequential.create([
        Dense.create(144, 64, k[2], jax.nn.swish),
        Dense.create(64, 2 * QuadrupedJoystick.action_size, k[3]),
        NormalTanhSampler.create(k[4], entropy_weight=2e-3, min_std=0.1),
    ])
    critic = Parallel.create(
        tracking=make_mlp([144, 128, 1], k[5], jax.nn.swish,
                          activation_last_layer=False),
        penalty=make_mlp([144, 128, 1], k[6], jax.nn.swish,
                         activation_last_layer=False),
    )
    return Sequential.create([
        Normalizer.create(obs_spec),
        enc,
        PPOAdapter.create(action=actor, value=critic),
    ])


def eval_tracking(env, net, n_envs=128, length=500):
    metrics = jax.jit(
        lambda: eval_rollout(env, net.eval(), n_envs, length,
                             jax.random.key(123))
    )()
    return float(metrics["episode_reward/tracking/mean"])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--teacher-steps", type=int, default=30_000_000)
    parser.add_argument("--distill-steps", type=int, default=10_000_000)
    parser.add_argument("--n-envs", type=int, default=2048)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    env = EpisodeWrapper(
        QuadrupedJoystick(reuse_mass_matrix=True), max_len=500
    )
    teacher = make_net(
        QuadrupedJoystick.observation_size,
        QuadrupedJoystick.action_size,
        jax.random.key(0),
    )
    cfg = TrainConfig(
        ppo=PPOConfig(
            n_envs=args.n_envs, rollout_length=20, learning_rate=3e-4,
            n_epochs=4, n_minibatches=4, gradient_clipping=1.0,
            combine_advantages=True, steps_per_call=5,
        ),
        eval=EvalConfig(enabled=False),
    )
    t0 = time.perf_counter()
    result = train_ppo(env, teacher, cfg, total_steps=args.teacher_steps)
    teacher = result.training_state.networks
    t_reward = eval_tracking(env, teacher)
    print(f"teacher: tracking {t_reward:.1f} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    student = small_net(jax.random.key(1))
    t0 = time.perf_counter()
    d_cfg = default_distillation_config()
    d_cfg = dataclasses.replace(
        d_cfg,
        distillation=dataclasses.replace(
            d_cfg.distillation, n_envs=args.n_envs
        ),
    )
    d_result = train_distillation(
        env, teacher, student, d_cfg, total_steps=args.distill_steps
    )
    student = d_result.training_state.student
    s_reward = eval_tracking(env, student)
    print(f"student: tracking {s_reward:.1f} after distillation "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    print(f"recovery: {100 * s_reward / max(t_reward, 1e-6):.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
