#!/bin/bash
# Round-3 follow-up TPU campaign: measure only what the first campaign
# (tpu_campaign.sh, completed 2026-08-18) did NOT record:
#   A. fully-fused Pallas megakernel variants (all substeps of a
#      control step in ONE launch) + the pure-XLA pin for contrast
#   B. feature configs never measured on TPU (rough terrain, domain
#      randomization, pusher manipulation)
#   C. a device profile of the in-kernel-factor megakernel path
#   D. bench.py (also warms the persistent compile cache for the
#      driver's end-of-round BENCH run)
# Same conventions as tpu_campaign.sh: tiny-compile probe, exclusive
# chip, hard timeouts, rows appended to results/suite_v5e.jsonl.
set -u
cd "$(dirname "$0")"
OUT=results/suite_v5e.jsonl
MARKER=/tmp/tpu_campaign2_done

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: x * 2 + 1)(jnp.ones((8, 128))).block_until_ready()
d = jax.devices()[0]
assert d.platform != 'cpu', d.platform
print('MEASURABLE')
" 2>/dev/null | grep -q MEASURABLE
}

run_cfg() {
  local name=$1 tmo=$2 extra=${3:-}
  echo "[campaign2 $(date +%H:%M:%S)] $name" >&2
  row=$(timeout "$tmo" python suite.py "$name" $extra 2>/tmp/campaign2_${name}.err | tail -1)
  if [ -n "$row" ] && [[ "$row" == {* ]]; then
    echo "$row" >> "$OUT"
    echo "$row"
  else
    echo "[campaign2] FAILED $name (see /tmp/campaign2_${name}.err)" >&2
  fi
}

probe || { echo "[campaign2] backend not measurable" >&2; exit 1; }
echo "[campaign2 $(date +%H:%M:%S)] backend MEASURABLE — starting" >&2

# Phase A: fused-dispatch megakernel variants (compile-risk: the
# whole-control-step Mosaic program is ~10x larger) + XLA pin.
for c in quadruped_2048_pallas_fused humanoid_2048_pallas_fused \
         quadruped_8192_pallas_fused quadruped_2048_fastM_xla; do
  run_cfg "$c" 1200
done

# Phase B: feature configs (terrain / DR / manipulation).
for c in quadruped_2048_rough quadruped_2048_dr pusher_4096; do
  run_cfg "$c" 1500
done

# Phase C: device profile of the in-kernel-factor megakernel.
echo "[campaign2 $(date +%H:%M:%S)] profile run" >&2
timeout 1500 python suite.py quadruped_2048_pallas --profile \
  > /tmp/campaign2_profile.out 2>&1 \
  && echo "[campaign2] profile captured under results/profiles/" >&2 \
  || echo "[campaign2] profile run FAILED" >&2

# Phase D: headline bench (also warms the compile cache the driver's
# end-of-round bench run will hit).
( cd .. && timeout 2400 python bench.py > /tmp/campaign2_bench.out 2>&1 ) \
  && cat /tmp/campaign2_bench.out || echo "[campaign2] bench FAILED" >&2

date > "$MARKER"
echo "[campaign2 $(date +%H:%M:%S)] DONE" >&2
