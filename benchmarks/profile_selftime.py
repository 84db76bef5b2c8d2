"""Self-time table from a jax.profiler Chrome trace (vm.trace.json.gz).

Computes true SELF time (event duration minus nested children) on the
device "XLA Ops" track — the table that found the round-3 in-kernel-
factor win (docs/performance.md "Device profile"). Events on the ops
track nest (while-loop bodies inside `while`, fusions inside both), so
plain duration sums double-count containers.

Usage: python benchmarks/profile_selftime.py <trace.json.gz> [top_n]
"""
from __future__ import annotations

import gzip
import json
import re
import sys
from collections import defaultdict


def load(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f)


def _basename(name: str) -> str:
    return re.sub(r"\.\d+$", "", name)


def self_times(events, ops_tracks):
    """Map op base-name -> (self ms, count) via a well-nested stack."""
    xs = sorted(
        (
            e for e in events
            if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in ops_tracks
        ),
        key=lambda e: (e["ts"], -e.get("dur", 0)),
    )
    self_ms: dict = defaultdict(float)
    count: dict = defaultdict(int)
    grand = 0.0
    # stack entries: [end_ts, name, dur, child_dur]
    stack: list = []

    def pop():
        nonlocal grand
        end, name, dur, child = stack.pop()
        self_t = (dur - child) / 1e3
        self_ms[name] += self_t
        grand += self_t
        if stack:
            stack[-1][3] += dur

    for e in xs:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and ts >= stack[-1][0]:
            pop()
        stack.append([ts + dur, _basename(e["name"]), dur, 0.0])
        count[_basename(e["name"])] += 1
    while stack:
        pop()
    return self_ms, count, grand


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    events = load(path)["traceEvents"]
    thread_names = {}
    process_names = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e["args"]["name"]
        elif e.get("name") == "process_name":
            process_names[e["pid"]] = e["args"].get("name", "")
    ops_tracks = {
        k for k, n in thread_names.items()
        if n == "XLA Ops" and "TPU" in process_names.get(k[0], "")
    } or {k for k, n in thread_names.items() if n == "XLA Ops"}

    self_ms, count, grand = self_times(events, ops_tracks)
    rows = sorted(self_ms.items(), key=lambda kv: -kv[1])[:top_n]
    print(f"{'self-time ms':>12}  {'share':>6}  {'count':>6}  op")
    for name, ms in rows:
        print(f"{ms:12.1f}  {ms/grand*100:5.1f}%  {count[name]:6d}  {name}")
    print(f"{grand:12.1f}  total device busy time")


if __name__ == "__main__":
    main()
