#!/bin/bash
# Round-5 refresh campaign: the tunneled TPU came back after the wedge
# that forced suite_v5e_r5.jsonl to be assembled from measurement-session
# logs. This sweep re-measures the round-5 headliners in ONE session so
# the snapshot is a genuine single-batch sweep (rows carry fresh dates).
# Conventions as tpu_campaign3.sh: tiny-compile probe, hard timeouts,
# one subprocess per config.
set -u
cd "$(dirname "$0")"
OUT=results/suite_v5e.jsonl
SNAP=results/suite_v5e_r5.jsonl

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
  local name=$1 tmo=$2
  echo "[campaign5 $(date +%H:%M:%S)] $name" >&2
  row=$(timeout "$tmo" python suite.py "$name" 2>/tmp/campaign5_${name}.err | tail -1)
  if [ -n "$row" ] && [[ "$row" == {* ]]; then
    echo "$row" >> "$OUT"
    echo "$row" >> "$SNAP"
    echo "$row"
  else
    echo "[campaign5] FAILED $name (see /tmp/campaign5_${name}.err)" >&2
  fi
}

probe || { echo "[campaign5] backend not measurable" >&2; exit 1; }
echo "[campaign5 $(date +%H:%M:%S)] backend MEASURABLE — starting" >&2

# The 9 round-5 headliners, freshest-evidence-first.
for c in quadruped_2048_pallas quadruped_2048_production_pallas \
         pusher_4096 reacher_4096 quadruped_2048_heightgrid \
         distill_quadruped_2048 distill_quadruped_2048_noshuffle \
         cartpole_mlp quadruped_2048_heightgrid_xla; do
  run_cfg "$c" 1800
done
echo "[campaign5 $(date +%H:%M:%S)] done" >&2
