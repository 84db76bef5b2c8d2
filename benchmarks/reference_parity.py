"""Learning-curve parity: reference implementation vs this framework.

Runs the reference (`/root/reference` — emiwar/nnx-ppo, flax.nnx) and
this repo's `train_ppo` on the *identical* environment object, identical
hyperparameters, and matched network architecture / seeds, then writes
each run's eval learning curve to one shared CSV for side-by-side
comparison (north star in BASELINE.md: "reward curve parity with
reference within seed variance"; harness mirrors
``/root/reference/examples/compare_with_brax.py:96-127``).

One SHARED env object is passed to *both* frameworks (both declare a
structural ``RLEnv`` protocol), with matched nets/hypers/eval
semantics (done-latch, alive-masked reward accumulation):

* ``--env move_to_center`` (default): this repo's
  ``MoveToCenterEnv(reward_falloff=1.0, border_radius=10.0)`` — the
  same analytic spec the reference's own convergence gate uses
  (``/root/reference/nnx_ppo/algorithms/ppo_test.py:266-305``);
  100-step eval windows.
* ``--env cartpole``: ``EpisodeWrapper(CartpoleBalance(), 500)`` — the
  BASELINE north-star env; 500-step eval windows (note: staggered
  truncation makes the achievable eval ceiling ≈375, not 500).

Each env writes to its own default CSV
(``parity_curves.csv`` / ``parity_cartpole.csv``).

Usage::

    # one run (one impl, one seed) — prints curve rows, appends to CSV
    python benchmarks/reference_parity.py --impl tpu --seed 22 \
        --env cartpole --total-steps 3000000

    # everything (3 seeds x 2 impls), sequential subprocesses
    python benchmarks/reference_parity.py --all --env cartpole
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

EVAL_ENVS = 64

# Per-env settings: (eval cadence, eval episode length, hidden sizes,
# sampler entropy weight).
ENV_SETTINGS = {
    "move_to_center": (100_000, 100, [128, 128], 1e-2),
    "cartpole": (200_000, 500, [64, 64], 1e-3),
}


def _make_env(name: str):
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    if name == "move_to_center":
        from nnx_ppo_tpu.test_dummies import MoveToCenterEnv

        return MoveToCenterEnv(reward_falloff=1.0, border_radius=10.0)
    from nnx_ppo_tpu.envs import CartpoleBalance
    from nnx_ppo_tpu.wrappers import EpisodeWrapper

    return EpisodeWrapper(CartpoleBalance(), max_len=500)


def _reward_mean(metrics: dict) -> float:
    for key in ("episode_reward/mean", "episode_reward_mean"):
        if key in metrics:
            return float(metrics[key])
    raise KeyError(f"no episode_reward mean in {sorted(metrics)}")


def run_reference(env_name: str, seed: int, total_steps: int):
    sys.path.insert(0, REFERENCE)
    import dataclasses

    from flax import nnx
    from nnx_ppo.algorithms import config as ref_config
    from nnx_ppo.algorithms import ppo as ref_ppo
    from nnx_ppo.networks import factories as ref_factories

    eval_every, eval_len, hidden, entropy = ENV_SETTINGS[env_name]
    env = _make_env(env_name)
    nets = ref_factories.make_mlp_actor_critic(
        env.observation_size,
        env.action_size,
        actor_hidden_sizes=hidden,
        critic_hidden_sizes=hidden,
        rngs=nnx.Rngs(seed, action_sampling=seed),
        entropy_weight=entropy,
    )
    cfg = ref_config.TrainConfig(
        eval=dataclasses.replace(
            ref_config.EvalConfig(),
            every_steps=eval_every,
            n_envs=EVAL_ENVS,
            max_episode_length=eval_len,
            logging_percentiles=None,
        ),
        seed=seed,
    )
    result = ref_ppo.train_ppo(env, nets, cfg, total_steps=total_steps)
    return [
        (int(entry["step"]), _reward_mean(entry))
        for entry in result.eval_history
    ]


def run_tpu(env_name: str, seed: int, total_steps: int):
    import dataclasses

    import jax

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from nnx_ppo_tpu.algorithms import EvalConfig, TrainConfig, train_ppo
    from nnx_ppo_tpu.networks import make_mlp_actor_critic

    eval_every, eval_len, hidden, entropy = ENV_SETTINGS[env_name]
    env = _make_env(env_name)
    nets = make_mlp_actor_critic(
        env.observation_size,
        env.action_size,
        hidden,
        hidden,
        jax.random.key(seed),
        entropy_weight=entropy,
    )
    cfg = TrainConfig(
        eval=dataclasses.replace(
            EvalConfig(),
            every_steps=eval_every,
            n_envs=EVAL_ENVS,
            max_episode_length=eval_len,
            logging_percentiles=None,
        ),
        seed=seed,
    )
    result = train_ppo(env, nets, cfg, total_steps=total_steps)
    return [
        (int(entry["step"]), _reward_mean(entry))
        for entry in result.eval_history
    ]


def append_csv(out: str, impl: str, seed: int, curve, wall_s: float) -> None:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    exists = os.path.exists(out)
    with open(out, "a", newline="") as f:
        writer = csv.writer(f)
        if not exists:
            writer.writerow(["impl", "seed", "step", "episode_reward_mean",
                            "wall_seconds"])
        for step, reward in curve:
            writer.writerow([impl, seed, step, f"{reward:.4f}", f"{wall_s:.1f}"])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--impl", choices=["reference", "tpu"])
    parser.add_argument("--env", choices=list(ENV_SETTINGS),
                        default="move_to_center")
    parser.add_argument("--seed", type=int, default=22)
    parser.add_argument("--total-steps", type=int, default=2_000_000)
    parser.add_argument("--out", default=None,
                        help="CSV path (default: per-env file under "
                             "benchmarks/results/)")
    parser.add_argument("--all", action="store_true",
                        help="run 3 seeds x 2 impls as subprocesses")
    parser.add_argument("--seeds", type=int, nargs="+", default=[22, 23, 24])
    args = parser.parse_args()
    if not args.all and args.impl is None:
        parser.error("--impl is required unless --all is given")
    if args.out is None:
        # Per-env default file: mixing envs in one CSV would be
        # indistinguishable (rows carry no env column).
        name = ("parity_curves.csv" if args.env == "move_to_center"
                else f"parity_{args.env}.csv")
        args.out = os.path.join(REPO, "benchmarks", "results", name)

    if args.all:
        for impl in ("tpu", "reference"):
            for seed in args.seeds:
                cmd = [
                    sys.executable, os.path.abspath(__file__),
                    "--impl", impl, "--seed", str(seed),
                    "--env", args.env,
                    "--total-steps", str(args.total_steps),
                    "--out", args.out,
                ]
                print(f"=== {impl} seed={seed} ===", flush=True)
                subprocess.run(cmd, check=True)
        return

    # Force CPU for both impls — apples-to-apples, and the env var alone
    # is not enough where site hooks force a tunneled-TPU platform
    # programmatically (see tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    start = time.perf_counter()
    runner = run_reference if args.impl == "reference" else run_tpu
    curve = runner(args.env, args.seed, args.total_steps)
    wall = time.perf_counter() - start
    append_csv(args.out, args.impl, args.seed, curve, wall)
    for step, reward in curve:
        print(f"{args.impl} seed={args.seed} step={step} reward={reward:.2f}",
              flush=True)
    print(f"wall: {wall:.1f}s", flush=True)


if __name__ == "__main__":
    main()
