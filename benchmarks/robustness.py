"""Does domain randomization buy robustness? Train nominal vs DR
policies, evaluate both under off-nominal physics.

Trains two quadruped joystick policies with identical nets/hypers/seed:

* ``nominal`` — fixed Model physics (friction 0.8, 1.0× mass/gain);
* ``dr``      — per-episode ``DomainRandomization`` draws.

Both are then evaluated (``eval_rollout``, 256 envs × 500 steps) on a
grid of PINNED physics — degenerate randomization ranges ``(v, v)``
pin every env in the eval batch to one (friction, mass_scale) point —
covering in-distribution and extrapolated corners. Writes
``benchmarks/results/robustness.csv`` rows
``policy,friction,mass_scale,tracking,lifespan``.

Run on the TPU chip (~6 min at the 15M-step default):

    python benchmarks/robustness.py [--train-steps N] [--cpu]
"""

from __future__ import annotations

import argparse
import csv
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../examples"))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from legged_training import make_net

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    PPOConfig,
    TrainConfig,
    train_ppo,
)
from nnx_ppo_tpu.algorithms.rollout import eval_rollout
from nnx_ppo_tpu.envs import QuadrupedJoystick
from nnx_ppo_tpu.physics import DomainRandomization
from nnx_ppo_tpu.wrappers import EpisodeWrapper

TRAIN_DR = DomainRandomization(
    mass_scale=(0.8, 1.2),
    friction=(0.4, 1.0),
    damping_scale=(0.9, 1.1),
    gain_scale=(0.9, 1.1),
)
# Eval grid: nominal center, in-distribution corners, and one
# extrapolated low-friction / heavy point outside the training ranges.
EVAL_GRID = [
    (0.8, 1.0),  # nominal
    (0.4, 1.2),  # in-distribution corner: slippery + heavy
    (1.0, 0.8),  # in-distribution corner: grippy + light
    (0.3, 1.3),  # extrapolated: beyond both training ranges
    (0.25, 1.0),  # extrapolated: ice
]


def pinned_env(friction: float, mass_scale: float) -> EpisodeWrapper:
    """Every reset draws exactly (friction, mass_scale) — degenerate
    ranges make `uniform(v, v) == v` — so one eval batch measures one
    physics point while reusing the randomized env's compiled step."""
    return EpisodeWrapper(
        QuadrupedJoystick(
            randomize=DomainRandomization(
                mass_scale=(mass_scale, mass_scale),
                friction=(friction, friction),
                damping_scale=(1.0, 1.0),
                gain_scale=(1.0, 1.0),
            ),
            reuse_mass_matrix=True,
        ),
        max_len=500,
    )


def train(randomize, seed: int, total_steps: int, n_envs: int):
    inner = QuadrupedJoystick(randomize=randomize, reuse_mass_matrix=True)
    env = EpisodeWrapper(inner, max_len=500)
    net = make_net(inner.observation_size, inner.action_size,
                   jax.random.key(seed))
    cfg = TrainConfig(
        ppo=PPOConfig(
            n_envs=n_envs, rollout_length=20, learning_rate=3e-4,
            n_epochs=4, n_minibatches=4, gradient_clipping=1.0,
            combine_advantages=True, steps_per_call=5,
        ),
        eval=EvalConfig(every_steps=total_steps, n_envs=64,
                        max_episode_length=500),
        seed=seed,
    )
    res = train_ppo(env, net, cfg, total_steps=total_steps)
    return res.training_state.networks.eval()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-steps", type=int, default=15_000_000)
    parser.add_argument("--n-envs", type=int, default=2048)
    parser.add_argument("--eval-envs", type=int, default=256)
    parser.add_argument("--eval-len", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "results/robustness.csv"))
    args = parser.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    rows = []
    for name, randomize in [("nominal", None), ("dr", TRAIN_DR)]:
        t0 = time.time()
        policy = train(randomize, args.seed, args.train_steps, args.n_envs)
        print(f"{name}: trained {args.train_steps} steps "
              f"in {time.time() - t0:.0f}s", flush=True)
        for friction, mass in EVAL_GRID:
            ev = jax.jit(functools.partial(
                eval_rollout, pinned_env(friction, mass),
                n_envs=args.eval_envs,
                max_episode_length=args.eval_len,
                logging_percentiles=None,
            ))(policy, key=jax.random.key(123))
            row = dict(
                policy=name, friction=friction, mass_scale=mass,
                tracking=round(float(ev["episode_reward/tracking/mean"]), 2),
                lifespan=round(float(ev["lifespan_mean"]), 1),
            )
            rows.append(row)
            print(row, flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
