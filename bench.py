"""Headline benchmark: PPO train-step throughput (env-steps/s).

Flagship config from BASELINE.md: CartpoleBalance, MLP actor 64x4 /
critic 256x2, 1024 envs, rollout T=30, 4 epochs x 4 minibatches, obs
normalization on. Measures steady-state `throughput/train_sps` =
n_envs * rollout_length / wall-clock per fused train step, with
`jax.block_until_ready` barriers (the reference's metric,
``nnx_ppo/algorithms/ppo.py:210-214``).

Prints ONE JSON line:
    {"metric": "train_sps", "value": N, "unit": "env_steps/s",
     "vs_baseline": N / 1e7, "platform": "...", "n_devices": N}
vs_baseline is the fraction of the BASELINE.json north star (10M
aggregate env-steps/s on a v5p-16 slice); this run uses however many
chips are visible (1 under the driver).

Wedge-proofing: this image's site hook forces the tunneled-TPU
("axon") platform programmatically at `import jax`, and a wedged
tunnel HANGS backend init instead of falling back. So the parent
process imports NO jax at all; it probes each candidate platform in a
subprocess under a hard timeout, runs the actual bench in a child
(also under a timeout), and falls back default -> cpu. A JSON line is
ALWAYS emitted, even on total failure (value 0, error field), so the
driver records something every round.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

PROBE_TIMEOUT_S = 240  # tunnel contact can be slow; wedge = silence
BENCH_TIMEOUT_S = 2700  # flagship compile 20-40s + 12 iters, plus the
                        # physics-class leg (Mosaic compile ~90-190s)

_PROBE_SRC = """
import os, jax
plat = os.environ.get("NNX_BENCH_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
ds = jax.devices()
print("PROBE_OK", ds[0].platform, len(ds), flush=True)
"""


def _child_env(platform: "str | None") -> dict:
    env = dict(os.environ)
    if platform is not None:
        env["NNX_BENCH_PLATFORM"] = platform
    else:
        env.pop("NNX_BENCH_PLATFORM", None)
    return env


def _probe(platform: "str | None") -> "tuple[str, int] | None":
    """Resolve (actual_platform, n_devices) for a candidate, or None."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            env=_child_env(platform),
            capture_output=True,
            text=True,
            timeout=PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        print(f"[bench] probe of platform={platform!r} timed out "
              f"({PROBE_TIMEOUT_S}s) — backend wedged", file=sys.stderr)
        return None
    if out.returncode != 0:
        print(f"[bench] probe of platform={platform!r} failed:\n"
              f"{out.stderr[-2000:]}", file=sys.stderr)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            _, plat, n = line.split()
            return plat, int(n)
    return None


def _emit(payload: dict) -> None:
    print(json.dumps(payload), flush=True)


def main() -> None:
    explicit = os.environ.get("JAX_PLATFORMS")
    # Explicit JAX_PLATFORMS wins; otherwise try the image default
    # (the site hook's tunneled TPU) then cpu.
    candidates: "list[str | None]" = (
        [explicit, "cpu"] if explicit else [None, "cpu"]
    )
    tried = []
    for cand in candidates:
        probed = _probe(cand)
        if probed is None:
            tried.append(str(cand))
            continue
        plat, ndev = probed
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=_child_env(cand),
                capture_output=True,
                text=True,
                timeout=BENCH_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] bench run on platform={plat} timed out "
                  f"({BENCH_TIMEOUT_S}s)", file=sys.stderr)
            tried.append(f"{cand} (run timeout)")
            continue
        sys.stderr.write(out.stderr)
        line = _last_json_line(out.stdout)
        if out.returncode == 0 and line is not None:
            _emit(line)
            return
        print(f"[bench] bench run on platform={plat} failed rc="
              f"{out.returncode}", file=sys.stderr)
        tried.append(f"{cand} (rc={out.returncode})")
    _emit(
        {
            "metric": "train_sps",
            "value": 0,
            "unit": "env_steps/s",
            "vs_baseline": 0.0,
            "platform": "none",
            "n_devices": 0,
            "error": f"no jax backend usable; tried {tried}",
        }
    )


def _last_json_line(text: str) -> "dict | None":
    for line in reversed(text.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj
    return None


# ---------------------------------------------------------------- child

N_ENVS = 1024
ROLLOUT_LENGTH = 30
STEPS_PER_CALL = 10  # PPO iterations fused per XLA program (amortizes
                     # host dispatch; see PPOConfig.steps_per_call)
WARMUP_ITERS = 2
MEASURE_ITERS = 10


def run_bench() -> None:
    import jax

    plat = os.environ.get("NNX_BENCH_PLATFORM")
    if plat:
        # Must happen AFTER import jax (the site hook runs at import
        # and would otherwise re-force the tunneled platform) and
        # BEFORE any backend touch.
        jax.config.update("jax_platforms", plat)

    # Persistent compilation cache: reruns of the same configs skip the
    # 10-60s XLA compile (cache keys include program + flags + platform).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import functools
    import time

    from nnx_ppo_tpu.algorithms import (
        PPOConfig,
        make_optimizer,
        new_training_state,
    )
    from nnx_ppo_tpu.algorithms.ppo import ppo_multi_step
    from nnx_ppo_tpu.envs import CartpoleBalance
    from nnx_ppo_tpu.networks import make_mlp_actor_critic
    from nnx_ppo_tpu.parallel import make_mesh
    from nnx_ppo_tpu.wrappers import EpisodeWrapper

    devices = jax.devices()
    n_devices = len(devices)
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
    payload = {
        "metric": "train_sps",
        "value": round(sps),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / 1e7, 4),
        "platform": devices[0].platform,
        "n_devices": n_devices,
    }

    # Physics-class leg (VERDICT r3 #5): the north-star workload class
    # is contact-rich legged locomotion, not the analytic flagship —
    # report the production-feature quadruped (DR + push + rough
    # terrain, held factor, Pallas megakernel on TPU) in the same JSON
    # line so BENCH_r*.json tracks it every round. Skipped on CPU (the
    # kernel path is TPU-only; the XLA fallback at 2048 envs would
    # dominate the bench budget without measuring anything relevant).
    if devices[0].platform != "cpu":
        try:
            payload.update(_physics_bench(mesh))
        except Exception as e:  # never fail the flagship number
            payload["physics_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(payload), flush=True)


def _physics_bench(mesh) -> dict:
    import functools
    import time

    import jax

    from nnx_ppo_tpu.algorithms import (
        PPOConfig,
        make_optimizer,
        new_training_state,
    )
    from nnx_ppo_tpu.algorithms.ppo import ppo_multi_step
    from nnx_ppo_tpu.envs import QuadrupedJoystick
    from nnx_ppo_tpu.networks import (
        Concat,
        Dense,
        NormalTanhSampler,
        Parallel,
        PPOAdapter,
        Sequential,
        make_mlp,
    )
    from nnx_ppo_tpu.physics import DomainRandomization
    from nnx_ppo_tpu.physics.terrain import rough_terrain
    from nnx_ppo_tpu.wrappers import EpisodeWrapper

    env = EpisodeWrapper(
        QuadrupedJoystick(
            reuse_mass_matrix=True,
            randomize=DomainRandomization(
                mass_scale=(0.8, 1.2), friction=(0.4, 1.0),
                damping_scale=(0.9, 1.1), gain_scale=(0.9, 1.1),
            ),
            push_prob=0.02, push_force=50.0,
            terrain=rough_terrain(seed=2, amplitude=0.03, wavelength=1.5),
        ),
        max_len=500,
    )
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
    net = Sequential.create(
        [enc, PPOAdapter.create(action=actor, value=critic)]
    )
    def run(shuffle: bool) -> float:
        config = PPOConfig(
            n_envs=2048, rollout_length=20, combine_advantages=True,
            shuffle_minibatches=shuffle,
        )
        optimizer = make_optimizer(config.learning_rate)
        ts = new_training_state(env, net, config.n_envs, seed=0, mesh=mesh)
        step = jax.jit(
            functools.partial(
                ppo_multi_step, env, config=config, optimizer=optimizer,
                n_steps=STEPS_PER_CALL, mesh=mesh,
            ),
            donate_argnums=(0,),
        )
        for _ in range(WARMUP_ITERS):
            ts, _ = step(ts)
        s0 = int(ts.steps_taken)
        t0 = time.perf_counter()
        for _ in range(MEASURE_ITERS):
            ts, _ = step(ts)
        s1 = int(ts.steps_taken)
        return (s1 - s0) / (time.perf_counter() - t0)

    # Both minibatch semantics, named explicitly (VERDICT r4 weak #6):
    # physics_sps = the reference's shuffled minibatching;
    # physics_sps_noshuffle = the contiguous-slice mode
    # (PPOConfig.shuffle_minibatches=False — convergence-gated,
    # tests/test_parallel.py::test_unshuffled_minibatches_converge).
    return {
        "physics_sps": round(run(True)),
        "physics_sps_noshuffle": round(run(False)),
        "physics_config": "quadruped_2048_production-class "
                          "(DR+push+rough, held factor, auto kernel); "
                          "physics_sps=shuffled (reference semantics), "
                          "_noshuffle=contiguous slices",
    }


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_bench()
    else:
        main()
