"""Roofline / MFU accounting for the benchmark suite configs.

Loop-aware ANALYTIC accounting. An earlier version of this tool read
``compiled.cost_analysis()['flops']`` off the lowered train program —
that number is wrong for this workload: XLA's cost model counts a
``while``-loop body ONCE, ignoring the trip count (verified directly:
a 10x ``lax.scan`` over a 512x512 matmul reports the same flops as a
single matmul). The fused train program nests scans (K steps/call x
[T-step rollout + ExM minibatch updates] x physics substeps), so the
old numbers were low by the product of the enclosing trip counts
(~160x for the flagship). This version counts flops from the program
STRUCTURE instead, which we know exactly:

MXU flops (the conventional MFU numerator — dense-matmul work):
  every trainable kernel with ndim >= 2 of P total multiply-entries
  does per sample: 2P (forward). Per collected env-step the train
  program runs 1 rollout forward, E replay forwards + backwards
  (backward = 2x forward: dgrad + wgrad), and E/T bootstrap forwards:

      mxu_flops/env-step = 2P * (1 + 3E + E/T)

  Physics-engine flops are deliberately EXCLUDED: the engine is
  scalar/VPU spatial algebra (see docs/physics.md), not MXU work —
  configs whose time goes there show it as LOW MFU at equal network
  size, which is exactly the signal this table is for.

HBM bytes (lower bound on the dominant streams per iteration):
  rollout buffer written once + gathered E times; per minibatch
  update the param/optimizer stream (params read+write, adam m+v
  read+write, grads write ~= 7x param bytes); scan carries (env +
  net state) round-tripping per rollout step:

      bytes/iter >= (1+E)*bytes(rollout) + E*M*7*bytes(params)
                    + 2T*bytes(carry)

  Real traffic adds intermediates/activations, so utilization columns
  are lower bounds — good enough to place configs against the roofs.

Joined with measured ``train_sps`` rows from ``results/suite_v5e.jsonl``
(last write per config wins) this yields achieved FLOP/s, MFU vs the
bf16 and fp32 MXU roofs, and HBM utilization. Note JAX's DEFAULT
matmul precision on TPU runs f32 operands through single-pass bf16
MXU passes, so the bf16 roof is the relevant one for f32 configs too.

Peaks default to TPU v5e (bf16 197 TFLOP/s, HBM 819 GB/s).

Usage:
    python benchmarks/roofline.py [config ...]   # default: all with
                                                 # measured rows

Writes/updates ``results/roofline.csv`` (merging by config name —
analyzing a subset refreshes those rows and keeps the rest) and prints
one JSON row per config. Everything is computed from shapes
(``jax.eval_shape``) — no compilation, no device. Light configs
analyze in seconds; heavy ones (physics env construction + tracing)
can take minutes on a slow CPU host.
"""

from __future__ import annotations

import csv
import functools
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from nnx_ppo_tpu.algorithms import new_training_state, rollout
from nnx_ppo_tpu.core.struct import partition_params

import suite

# TPU v5e single-chip peaks (public spec: 197 bf16 TFLOP/s, 16 GB HBM
# @ 819 GB/s; fp32 matmul runs at ~half the bf16 MXU rate — but see
# the docstring: DEFAULT precision makes bf16 the operative roof).
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


def _tree_bytes(tree) -> int:
    return sum(
        int(math.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree.leaves(tree)
        if hasattr(l, "shape")
    )


def analyze(name: str) -> dict:
    env, net, config = suite.CONFIGS[name]()
    E, M = config.n_epochs, config.n_minibatches
    T, B = config.rollout_length, config.n_envs

    # Shapes only — no arrays are materialized, no program compiled.
    ts = jax.eval_shape(
        lambda: new_training_state(env, net, config.n_envs, seed=0)
    )
    params, _ = partition_params(ts.networks)
    leaves = jax.tree.leaves(params)
    P = sum(int(math.prod(l.shape)) for l in leaves if len(l.shape) >= 2)
    param_bytes = _tree_bytes(params)

    mxu_flops_env_step = 2.0 * P * (1 + 3 * E + E / T)

    _, _, rollout_data = jax.eval_shape(
        lambda env_states, networks, net_states, key: rollout.unroll_env(
            env, env_states, networks, net_states, T, key
        ),
        ts.env_states,
        net,
        ts.network_states,
        jax.eval_shape(lambda: jax.random.key(0)),
    )
    rollout_bytes = _tree_bytes(rollout_data)
    carry_bytes = _tree_bytes(ts.env_states) + _tree_bytes(ts.network_states)

    bytes_iter = (
        (1 + E) * rollout_bytes
        + E * M * 7 * param_bytes
        + 2 * T * carry_bytes
    )
    bytes_env_step = bytes_iter / (T * B)

    return {
        "config": name,
        "n_envs": B,
        "matmul_params": P,
        "mxu_flops_per_env_step": mxu_flops_env_step,
        "hbm_bytes_lb_per_env_step": bytes_env_step,
        "intensity_flops_per_byte": mxu_flops_env_step / bytes_env_step,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
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
            achieved_flops = r["mxu_flops_per_env_step"] * sps
            achieved_bw = r["hbm_bytes_lb_per_env_step"] * sps
            r.update(
                train_sps=sps,
                measured_on=m.get("device", "?"),
                achieved_mxu_tflops=achieved_flops / 1e12,
                mfu_bf16=achieved_flops / PEAK_BF16_FLOPS,
                mfu_fp32=achieved_flops / PEAK_FP32_FLOPS,
                hbm_gbps_lb=achieved_bw / 1e9,
                hbm_util_lb=achieved_bw / PEAK_HBM_BPS,
            )
        rows.append(r)
        print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in r.items()}), flush=True)

    os.makedirs(RESULTS, exist_ok=True)
    out = os.path.join(RESULTS, "roofline.csv")
    # Merge by config name: analyzing a subset must not drop the other
    # committed rows (ADVICE r3).
    merged: "dict[str, dict]" = {}
    if os.path.exists(out):
        with open(out, newline="") as f:
            for row in csv.DictReader(f):
                merged[row["config"]] = row
    for r in rows:
        merged[r["config"]] = r
    rows_out = list(merged.values())
    fields = sorted({k for r in rows_out for k in r}, key=lambda k: (
        k not in ("config", "n_envs", "train_sps"), k))
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows_out)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
