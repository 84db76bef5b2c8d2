"""Train the arm to push a free ball to ground targets with PPO.

The object-interaction flagship run (``envs/pusher.py`` on the
multi-tree scene layer, ``physics/scene.py``). Writes the eval
learning curve to ``benchmarks/results/pusher_curve.csv``.

    python examples/arm_pushing.py [--total-steps N] [--cpu]
"""

from __future__ import annotations

import argparse
import csv
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

from nnx_ppo_tpu.algorithms import EvalConfig, PPOConfig, TrainConfig, train_ppo
from nnx_ppo_tpu.envs import ArmPush
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--total-steps", type=int, default=30_000_000)
    parser.add_argument("--n-envs", type=int, default=2048)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    if args.out is None:
        args.out = os.path.join(
            os.path.dirname(__file__), "../benchmarks/results/pusher_curve.csv"
        )

    env = EpisodeWrapper(ArmPush(), max_len=200)
    net = make_mlp_actor_critic(
        env.observation_size,
        env.action_size,
        [128, 128],
        [256, 256],
        jax.random.key(args.seed),
        entropy_weight=2e-3,
        normalize_obs=True,
    )
    cfg = TrainConfig(
        ppo=PPOConfig(
            n_envs=args.n_envs,
            rollout_length=20,
            learning_rate=3e-4,
            n_epochs=4,
            n_minibatches=4,
            gradient_clipping=1.0,
            steps_per_call=5,
        ),
        eval=EvalConfig(
            every_steps=max(args.total_steps // 25, 1),
            n_envs=128,
            max_episode_length=200,
            logging_percentiles=None,
        ),
        seed=args.seed,
    )

    t0 = time.perf_counter()
    result = train_ppo(env, net, cfg, total_steps=args.total_steps)
    wall = time.perf_counter() - t0

    rows = []
    for entry in result.eval_history:
        rows.append(
            {
                "step": entry["step"],
                "reward": round(float(entry["episode_reward/mean"]), 3),
            }
        )
        print(rows[-1], flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["step", "reward"])
        writer.writeheader()
        writer.writerows(rows)
    print(
        f"done: {args.total_steps} steps in {wall:.0f}s = "
        f"{args.total_steps / wall:,.0f} sps",
        flush=True,
    )


if __name__ == "__main__":
    main()
