"""Headline benchmark: PPO train-step throughput (env-steps/s).

Flagship config from BASELINE.md: CartpoleBalance, MLP actor 64x4 /
critic 256x2, 1024 envs, rollout T=30, 4 epochs x 4 minibatches, obs
normalization on. Measures steady-state `throughput/train_sps` =
n_envs * rollout_length / wall-clock per fused train step, with
`jax.block_until_ready` barriers (the reference's metric,
``nnx_ppo/algorithms/ppo.py:210-214``).

Prints ONE JSON line:
    {"metric": "train_sps", "value": N, "unit": "env_steps/s",
     "vs_baseline": N / 1e7}
vs_baseline is the fraction of the BASELINE.json north star (10M
aggregate env-steps/s on a v5p-16 slice); this run uses however many
chips are visible (1 under the driver).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax

# Honor an explicit JAX_PLATFORMS env var: this image's site hook
# forces the tunneled-TPU platform programmatically at import, and a
# wedged tunnel HANGS backend init instead of falling back — an
# explicit env choice must win (same pattern as __graft_entry__).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: reruns of the same configs skip the
# 10-60s XLA compile (cache keys include program + flags + platform).
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache'))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nnx_ppo_tpu.algorithms import PPOConfig, make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_multi_step
from nnx_ppo_tpu.envs import CartpoleBalance
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.parallel import make_mesh
from nnx_ppo_tpu.wrappers import EpisodeWrapper

N_ENVS = 1024
ROLLOUT_LENGTH = 30
STEPS_PER_CALL = 10  # PPO iterations fused per XLA program (amortizes
                     # host dispatch; see PPOConfig.steps_per_call)
WARMUP_ITERS = 2
MEASURE_ITERS = 10


def main() -> None:
    n_devices = len(jax.devices())
    mesh = make_mesh(n_devices) if n_devices > 1 else None

    env = EpisodeWrapper(CartpoleBalance(), max_len=500)
    networks = make_mlp_actor_critic(
        env.observation_size,
        env.action_size,
        [64, 64, 64, 64],
        [256, 256],
        jax.random.key(0),
        normalize_obs=True,
        entropy_weight=1e-3,
    )
    config = PPOConfig(
        n_envs=N_ENVS,
        rollout_length=ROLLOUT_LENGTH,
        learning_rate=3e-4,
        n_epochs=4,
        n_minibatches=4,
    )
    optimizer = make_optimizer(config.learning_rate)
    training_state = new_training_state(
        env, networks, config.n_envs, seed=0, mesh=mesh
    )
    step = jax.jit(
        functools.partial(
            ppo_multi_step,
            env,
            config=config,
            optimizer=optimizer,
            n_steps=STEPS_PER_CALL,
            mesh=mesh,
        ),
        donate_argnums=(0,),
    )

    for _ in range(WARMUP_ITERS):
        training_state, metrics = step(training_state)
    s0 = int(training_state.steps_taken)  # forced readout = honest barrier

    t0 = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        training_state, metrics = step(training_state)
    s1 = int(training_state.steps_taken)
    elapsed = time.perf_counter() - t0
    assert s1 - s0 == N_ENVS * ROLLOUT_LENGTH * STEPS_PER_CALL * MEASURE_ITERS

    sps = (s1 - s0) / elapsed
    print(
        json.dumps(
            {
                "metric": "train_sps",
                "value": round(sps),
                "unit": "env_steps/s",
                "vs_baseline": round(sps / 1e7, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
