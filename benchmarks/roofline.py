"""Roofline / MFU accounting for the benchmark suite configs.

For each suite config this lowers the EXACT fused train program the
suite measures (``ppo_multi_step``, 10 steps/call) and reads XLA's own
cost model off the compiled executable (``compiled.cost_analysis()``):
total FLOPs and HBM bytes accessed per call. Dividing by the
env-steps per call gives *flops/env-step* and *bytes/env-step* —
static program properties, independent of which backend executed them
(the HLO is the same modulo fusion detail; we lower for the requested
platform).

Joined with a measured ``train_sps`` row from
``results/suite_v5e.jsonl`` this yields:

  * achieved FLOP/s   = flops_per_env_step * train_sps
  * MFU               = achieved / peak_flops
  * achieved GB/s     = bytes_per_env_step * train_sps
  * HBM utilization   = achieved / peak_bandwidth
  * arithmetic intensity (flops/byte) vs the machine balance point —
    i.e. which roof the config lives under.

Peaks default to TPU v5e (bf16 197 TFLOP/s, HBM 819 GB/s). Note
fp32-dominated configs can't reach bf16 peak; the table also reports
utilization against the fp32 MXU roof (~1/2 of bf16 on v5e).

Usage:
    python benchmarks/roofline.py [config ...]    # default: all with
                                                  # measured rows
    python benchmarks/roofline.py --platform cpu  # lower for cpu

Writes/updates ``results/roofline.csv`` and prints the table. This is
the VERDICT round-2 item-3 accounting; the companion device profile is
captured by ``suite.py --profile`` (see docs/performance.md).
"""

from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Honor an explicit platform request BEFORE any backend touch; default
# cpu — lowering/cost analysis does not need the (possibly wedged)
# tunneled TPU, and the FLOP counts are platform-stable.
_plat = "cpu"
if "--platform" in sys.argv:
    _plat = sys.argv[sys.argv.index("--platform") + 1]
jax.config.update("jax_platforms", _plat)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.jax_cache"),
)

import functools

from nnx_ppo_tpu.algorithms import make_optimizer, new_training_state
from nnx_ppo_tpu.algorithms.ppo import ppo_multi_step

import suite

# TPU v5e single-chip peaks (public spec: 197 bf16 TFLOP/s, 16 GB HBM
# @ 819 GB/s; fp32 matmul runs at ~half the bf16 MXU rate).
PEAK_BF16_FLOPS = 197e12
PEAK_FP32_FLOPS = 98.5e12
PEAK_HBM_BPS = 819e9

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def measured_sps() -> dict:
    """Latest measured train_sps per config from suite_v5e.jsonl."""
    out = {}
    path = os.path.join(RESULTS, "suite_v5e.jsonl")
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if "config" in row and "train_sps" in row:
                out[row["config"]] = row  # last write wins
    return out


def analyze(name: str) -> dict:
    env, net, config = suite.CONFIGS[name]()
    optimizer = make_optimizer(config.learning_rate)
    ts = new_training_state(env, net, config.n_envs, seed=0)
    step = jax.jit(
        functools.partial(
            ppo_multi_step, env, config=config, optimizer=optimizer,
            n_steps=suite.STEPS_PER_CALL,
        ),
        donate_argnums=(0,),
    )
    compiled = step.lower(ts).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax: one dict per device program
        cost = cost[0]
    env_steps_per_call = (
        config.n_envs * config.rollout_length * suite.STEPS_PER_CALL
    )
    flops_call = float(cost.get("flops", 0.0))
    bytes_call = float(cost.get("bytes accessed", 0.0))
    return {
        "config": name,
        "n_envs": config.n_envs,
        "flops_per_env_step": flops_call / env_steps_per_call,
        "bytes_per_env_step": bytes_call / env_steps_per_call,
        "intensity_flops_per_byte": (
            flops_call / bytes_call if bytes_call else float("nan")
        ),
        "lowered_platform": jax.devices()[0].platform,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--platform" in sys.argv:  # drop its value operand too
        val = sys.argv[sys.argv.index("--platform") + 1]
        args = [a for a in args if a != val]
    meas = measured_sps()
    names = args or [n for n in suite.CONFIGS if n in meas] or list(
        suite.CONFIGS
    )

    rows = []
    for name in names:
        r = analyze(name)
        m = meas.get(name)
        if m:
            sps = m["train_sps"]
            achieved_flops = r["flops_per_env_step"] * sps
            achieved_bw = r["bytes_per_env_step"] * sps
            r.update(
                train_sps=sps,
                measured_on=m.get("device", "?"),
                achieved_tflops=achieved_flops / 1e12,
                mfu_bf16=achieved_flops / PEAK_BF16_FLOPS,
                mfu_fp32=achieved_flops / PEAK_FP32_FLOPS,
                hbm_gbps=achieved_bw / 1e9,
                hbm_util=achieved_bw / PEAK_HBM_BPS,
            )
        rows.append(r)
        print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in r.items()}), flush=True)

    os.makedirs(RESULTS, exist_ok=True)
    out = os.path.join(RESULTS, "roofline.csv")
    fields = sorted({k for r in rows for k in r}, key=lambda k: (
        k not in ("config", "n_envs", "train_sps"), k))
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
