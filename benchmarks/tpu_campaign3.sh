#!/bin/bash
# Round-4 TPU campaign.
#   A. The round-4 headline: production-realism features ON the
#      megakernel path (DR / rough terrain / pushes rode the 160×
#      slower exact-XLA path in round 3) + the no-knobs default env.
#   B. BASELINE config-fidelity rows (#4: Go1 class @4096 envs w/ obs
#      normalization; #5: humanoid @8192).
#   C. XLA pins so the cliff baselines stay reproducible by name.
#   D. One COHERENT dated snapshot of the whole suite in a single
#      session (VERDICT r3 weak #3: performance.md mixed rows from ≥3
#      runtime eras) — every row now carries date + jax version.
# Conventions as tpu_campaign.sh: tiny-compile probe, hard timeouts,
# rows appended to results/suite_v5e.jsonl (the full snapshot also
# lands in results/suite_v5e_r4.jsonl for the docs tables).
set -u
cd "$(dirname "$0")"
OUT=results/suite_v5e.jsonl
SNAP=results/suite_v5e_r4.jsonl

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
  echo "[campaign3 $(date +%H:%M:%S)] $name" >&2
  row=$(timeout "$tmo" python suite.py "$name" 2>/tmp/campaign3_${name}.err | tail -1)
  if [ -n "$row" ] && [[ "$row" == {* ]]; then
    echo "$row" >> "$OUT"
    echo "$row" >> "$SNAP"
    echo "$row"
  else
    echo "[campaign3] FAILED $name (see /tmp/campaign3_${name}.err)" >&2
  fi
}

probe || { echo "[campaign3] backend not measurable" >&2; exit 1; }
echo "[campaign3 $(date +%H:%M:%S)] backend MEASURABLE — starting" >&2

# Phase A: feature set on the kernel path (the round-4 headline).
for c in quadruped_2048_dr quadruped_2048_rough quadruped_2048_production \
         quadruped_2048_default quadruped_2048_dr_pallas \
         quadruped_2048_production_pallas; do
  run_cfg "$c" 1800
done

# Phase B: BASELINE config fidelity.
for c in quadruped_4096_norm quadruped_4096_pallas humanoid_8192_pallas; do
  run_cfg "$c" 1800
done

# Phase C: XLA pins (cliff baselines, reproducible by name).
for c in quadruped_2048_dr_xla quadruped_2048_rough_xla; do
  run_cfg "$c" 1500
done

# Phase D: coherent snapshot of the rest of the suite, one session.
for c in cartpole_mlp cartpole_mlp_bf16 mlp_wide_bf16_8192 \
         mlp_wide_f32_8192 cartpole_gru dict_obs_multistream \
         locomotion_4096 heavy_physics_8192 \
         quadruped_2048 quadruped_8192 humanoid_2048 \
         quadruped_2048_fastM quadruped_2048_fastM_xla \
         quadruped_2048_pallas quadruped_8192_pallas \
         humanoid_2048_pallas quadruped_2048_full_pallas \
         quadruped_2048_full_fastM humanoid_2048_full_fastM \
         population_graph reacher_4096 pusher_4096 \
         mjcf_quadruped_2048; do
  run_cfg "$c" 1500
done

echo "[campaign3 $(date +%H:%M:%S)] done" >&2
