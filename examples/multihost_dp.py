"""Data-parallel PPO over a TPU slice (single- or multi-host).

The parallelism layer the reference lacks (SURVEY §2.6): a 1-D ``data``
mesh over all chips; envs/carries/rollout buffers sharded, params
replicated, gradient + normalizer reductions over ICI via GSPMD.

Single host (uses all local chips):
    python examples/multihost_dp.py
Multi-host (run on every host of the slice):
    python examples/multihost_dp.py --distributed
Local smoke test without TPUs:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multihost_dp.py --total-steps 10000
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    LoggingLevel,
    PPOConfig,
    TrainConfig,
    VideoConfig,
    train_ppo,
)
from nnx_ppo_tpu.envs import CartpoleBalance
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.parallel import distributed_initialize, make_mesh
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--n-envs", type=int, default=8192)
    parser.add_argument("--total-steps", type=int, default=20_000_000)
    args = parser.parse_args()

    if args.distributed:
        distributed_initialize()

    mesh = make_mesh()  # 1-D 'data' axis over all visible chips
    print(f"mesh: {mesh} ({mesh.size} devices)")

    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    networks = make_mlp_actor_critic(
        env.observation_size,
        env.action_size,
        [64, 64, 64, 64],
        [256, 256],
        jax.random.key(0),
        entropy_weight=1e-3,
    )
    config = TrainConfig(
        ppo=PPOConfig(
            n_envs=args.n_envs,
            rollout_length=30,
            total_steps=args.total_steps,
            learning_rate=3e-4,
            logging_level=LoggingLevel.BASIC | LoggingLevel.THROUGHPUT,
        ),
        eval=EvalConfig(n_envs=256, max_episode_length=500,
                        every_steps=args.total_steps // 4),
        video=VideoConfig(enabled=False),
    )
    result = train_ppo(
        env,
        networks,
        config,
        mesh=mesh,
        log_fn=lambda m, s: print(
            s, {k: float(v) for k, v in m.items() if "throughput" in k}
        ),
    )
    print("final eval:", result.eval_history[-1])


if __name__ == "__main__":
    main()
