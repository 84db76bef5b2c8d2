"""Train CartpoleBalance with Weights & Biases logging + videos.

Capability parity with reference ``examples/wandb_logging.py``: 1024
envs × rollout 30, periodic eval, optional video callback. Falls back
to stdout logging when wandb is not installed.

Run:  python examples/wandb_logging.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    LoggingLevel,
    PPOConfig,
    TrainConfig,
    VideoConfig,
    train_ppo,
    wandb_video_fn,
)
from nnx_ppo_tpu.envs import CartpoleBalance
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def main() -> None:
    try:
        import wandb

        wandb.init(project="nnx-ppo-tpu", name="cartpole-balance")
        log_fn = lambda metrics, step: wandb.log(dict(metrics), step=step)
        video_fn = wandb_video_fn()
    except ImportError:
        print("wandb not installed — logging to stdout")
        log_fn = lambda metrics, step: print(
            step,
            {
                k: round(float(v), 4)
                for k, v in metrics.items()
                if hasattr(v, "shape") and v.shape == () or isinstance(v, float)
            },
        )
        video_fn = None

    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    networks = make_mlp_actor_critic(
        env.observation_size,
        env.action_size,
        actor_hidden_sizes=[64, 64, 64, 64],
        critic_hidden_sizes=[256, 256],
        key=jax.random.key(0),
        entropy_weight=1e-3,
    )
    config = TrainConfig(
        ppo=PPOConfig(
            n_envs=1024,
            rollout_length=30,
            total_steps=10_000_000,
            learning_rate=3e-4,
            logging_level=LoggingLevel.BASIC | LoggingLevel.THROUGHPUT,
        ),
        eval=EvalConfig(n_envs=128, max_episode_length=500, every_steps=1_000_000),
        video=VideoConfig(enabled=False),
    )
    result = train_ppo(env, networks, config, log_fn=log_fn, video_fn=video_fn)
    print("final eval:", result.eval_history[-1])


if __name__ == "__main__":
    main()
