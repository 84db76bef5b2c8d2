"""Train a multi-stream policy on JoystickLocomotion (dict obs/rewards).

Demonstrates the BASELINE "quadruped joystick" workload shape:

* dict observations routed to per-stream encoders (``Concat``),
* dict rewards with one critic head per key (``Parallel``) and
  team-summed advantages (``combine_advantages=True``),
* observation normalization on the proprio stream,
* data-parallel mesh over all visible chips.

Run:  python examples/joystick_locomotion.py [total_steps]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from nnx_ppo_tpu.algorithms import EvalConfig, PPOConfig, TrainConfig, train_ppo
from nnx_ppo_tpu.envs import JoystickLocomotion
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
from nnx_ppo_tpu.parallel import make_mesh
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def make_network(env: JoystickLocomotion, key: jax.Array):
    k = jax.random.split(key, 7)
    encoder = Concat.create(
        proprio=Sequential.create(
            [
                Normalizer.create(env.observation_size["proprio"]),
                Dense.create(env.observation_size["proprio"], 128, k[0], jax.nn.relu),
            ]
        ),
        command=Dense.create(env.observation_size["command"], 32, k[1], jax.nn.relu),
    )
    actor = Sequential.create(
        [
            Dense.create(160, 128, k[2], jax.nn.relu),
            Dense.create(128, 2 * env.action_size, k[3]),
            NormalTanhSampler.create(k[4], entropy_weight=1e-3),
        ]
    )
    critic = Parallel.create(
        tracking=make_mlp([160, 128, 1], k[5], activation_last_layer=False),
        penalty=make_mlp([160, 128, 1], k[6], activation_last_layer=False),
    )
    return Sequential.create([encoder, PPOAdapter.create(action=actor, value=critic)])


def main() -> None:
    total_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    raw_env = JoystickLocomotion()
    env = EpisodeWrapper(raw_env, max_len=500)
    networks = make_network(raw_env, jax.random.key(0))

    n_devices = len(jax.devices())
    mesh = make_mesh() if n_devices > 1 else None

    config = TrainConfig(
        ppo=PPOConfig(
            n_envs=4096,
            rollout_length=20,
            total_steps=total_steps,
            learning_rate=3e-4,
            combine_advantages=True,
            steps_per_call=10,
        ),
        eval=EvalConfig(every_steps=500_000, n_envs=256, max_episode_length=500,
                        logging_percentiles=None),
    )

    def log_fn(metrics, step):
        tracked = metrics.get("episode_reward/tracking/mean")
        if tracked is not None:
            print(f"step {step:>10,}  eval tracking reward {tracked:8.2f}")

    result = train_ppo(env, networks, config, log_fn=log_fn, mesh=mesh)
    print("final:", {k: v for k, v in result.final_metrics.items() if "episode" in k})


if __name__ == "__main__":
    main()
