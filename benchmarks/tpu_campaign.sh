#!/bin/bash
# Unattended TPU measurement campaign for the tunneled (axon) runtime.
#
# The tunnel wedges for hours at a time (see docs/performance.md and
# the memory notes): devices may enumerate while the compile RPC path
# is dead. This script probes with a REAL tiny compile, and the moment
# the backend is measurable it runs the round-3 measurement list
# sequentially (one process at a time — the chip lock is exclusive),
# appending rows to results/suite_v5e.jsonl. Safe to leave running: it
# exits after one full campaign, and every stage has a hard timeout.
#
# Usage: nohup bash benchmarks/tpu_campaign.sh >> /tmp/tpu_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")"
OUT=results/suite_v5e.jsonl
MARKER=/tmp/tpu_campaign_done

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
  echo "[campaign $(date +%H:%M:%S)] $name" >&2
  row=$(timeout "$tmo" python suite.py "$name" $extra 2>/tmp/campaign_${name}.err | tail -1)
  if [ -n "$row" ] && [[ "$row" == {* ]]; then
    echo "$row" >> "$OUT"
    echo "$row"
  else
    echo "[campaign] FAILED $name (see /tmp/campaign_${name}.err)" >&2
  fi
}

# Phase 0: wait (up to ~11h) for a measurable backend.
for i in $(seq 1 66); do
  if probe; then break; fi
  echo "[campaign $(date +%H:%M:%S)] probe $i: not measurable" >&2
  sleep 300
done
probe || { echo "[campaign] gave up: backend never measurable" >&2; exit 1; }
echo "[campaign $(date +%H:%M:%S)] backend MEASURABLE — starting" >&2

# Phase 1: depthwise-engine refresh (VERDICT r2 item 1).
for c in quadruped_2048_fastM quadruped_2048_fastM_generic \
         humanoid_2048_fastM humanoid_2048_fastM_generic \
         quadruped_2048 humanoid_2048 mjcf_quadruped_2048; do
  run_cfg "$c" 1500
done

# Phase 2: full contact model on the held-inverse path (item 4).
for c in quadruped_2048_full_fastM humanoid_2048_full_fastM \
         quadruped_2048_full quadruped_8192_fastM; do
  run_cfg "$c" 1500
done

# Phase 3: MXU-saturation + flagship re-check.
for c in mlp_wide_bf16_8192 mlp_wide_f32_8192 cartpole_mlp; do
  run_cfg "$c" 1800
done

# Phase 4: Pallas megakernel (short timeout — the remote Mosaic
# compile is known to wedge on composite programs; a FAILED row here
# is itself a result).
for c in quadruped_2048_pallas quadruped_2048_full_pallas; do
  run_cfg "$c" 1200
done

# Phase 5: device profile of the contact workload (item 3 companion).
echo "[campaign $(date +%H:%M:%S)] profile run" >&2
timeout 1800 python suite.py quadruped_8192_fastM --profile \
  > /tmp/campaign_profile.out 2>&1 \
  && echo "[campaign] profile captured under results/profiles/" >&2 \
  || echo "[campaign] profile run FAILED" >&2

# Phase 6: headline bench.
( cd .. && timeout 2400 python bench.py > /tmp/campaign_bench.out 2>&1 ) \
  && cat /tmp/campaign_bench.out || echo "[campaign] bench FAILED" >&2

date > "$MARKER"
echo "[campaign $(date +%H:%M:%S)] DONE" >&2
