"""Empirically anchor the analytic roofline against a device trace.

The analytic tool (``roofline.py``) counts MXU flops from program
structure — its first revision was ~160× wrong (it trusted
``compiled.cost_analysis()``, which ignores while-loop trip counts), so
the replacement earns one empirical cross-check per headline config
(VERDICT r3 item 6): sum the profiler's per-op-instance ``model_flops``
over a measured window (each dynamic instance of an op inside a loop is
its own event, so trip counts are real here) and compare flops/env-step
against the analytic count.

The window's env-step count comes from the trace itself (the "Steps"
track carries one event per jit invocation) times the suite's
steps-per-call × n_envs × rollout_length (read from the config's suite
row).

Usage:
    python benchmarks/roofline_anchor.py <config> <trace.json.gz>

Prints one JSON line and merges ``measured_flops_per_env_step`` /
``measured_vs_analytic`` into ``results/roofline.csv``.
"""
from __future__ import annotations

import csv
import gzip
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")
STEPS_PER_CALL = 10  # suite.py constant


def load_trace(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f)["traceEvents"]


def suite_row(config: str) -> dict:
    row = None
    for name in ("suite_v5e_r4.jsonl", "suite_v5e.jsonl"):
        p = os.path.join(RESULTS, name)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for line in f:
                r = json.loads(line)
                if r.get("config") == config:
                    row = r  # last (most recent) wins
        if row:
            return row
    raise SystemExit(f"no suite row for {config!r} in results/")


def main() -> None:
    config, trace_path = sys.argv[1], sys.argv[2]
    events = load_trace(trace_path)
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = {k for k, n in thread_names.items() if n == "XLA Ops"}
    steps_track = {k for k, n in thread_names.items() if n == "Steps"}

    invocations = 0
    measured_flops = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in steps_track:
            invocations += 1
        elif key in ops:
            a = e.get("args") or {}
            # Containers ('while') report their body's flops ONCE on
            # top of the per-iteration child events — skip them; every
            # dynamic instance of a real op is its own event.
            if a.get("hlo_category") == "while":
                continue
            measured_flops += float(a.get("model_flops", 0) or 0)

    row = suite_row(config)
    env_steps = (
        invocations * STEPS_PER_CALL * row["n_envs"] * row["rollout_length"]
    )
    measured_per_step = measured_flops / env_steps

    roofline_csv = os.path.join(RESULTS, "roofline.csv")
    with open(roofline_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    analytic_per_step = None
    for r in rows:
        if r["config"] == config:
            analytic_per_step = (
                float(r["achieved_mxu_tflops"]) * 1e12 / float(r["train_sps"])
            )
            r["measured_flops_per_env_step"] = round(measured_per_step)
            r["measured_vs_analytic"] = round(
                measured_per_step / analytic_per_step, 4
            )
    if analytic_per_step is None:
        raise SystemExit(f"no roofline.csv row for {config!r}")

    # Plain union of keys: csv.DictReader fills short/missing trailing
    # columns with None, so filtering None-valued keys out of fieldnames
    # would make DictWriter (extrasaction='raise') reject those rows.
    fields = sorted(
        {k for r in rows for k in r},
        key=lambda k: (k not in ("config", "n_envs", "train_sps"), k),
    )
    with open(roofline_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)

    print(json.dumps({
        "config": config,
        "invocations_in_window": invocations,
        "env_steps_in_window": env_steps,
        "measured_flops_per_env_step": round(measured_per_step),
        "analytic_flops_per_env_step": round(analytic_per_step),
        "measured_vs_analytic": round(measured_per_step / analytic_per_step, 4),
    }))


if __name__ == "__main__":
    main()
