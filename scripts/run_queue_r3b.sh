#!/bin/bash
# Round-3 queue B: sphere-pass A/Bs on final_scene (MXU kernel at 1008
# spheres, SPH_K capacity sweep against the measured needy histogram —
# docs/logs/needy_r3.log) + the fixed parity report rerun (VERDICT item 6).
# Bounded: ends at ALL DONE, no residual process.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/tmp/queue_r3b.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

run() { # run SCENE NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" env "$@" timeout 1800 python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== sphere-pass A/B on final_scene ==="
run final_scene 800 800 500 ART_TPU_MXU_SPHERES=1
run final_scene 800 800 500 ART_TPU_SPH_K=16384
run final_scene 800 800 500 ART_TPU_SPH_K=24576
run original_scene 800 800 500 ART_TPU_MXU_SPHERES=1

say "=== parity report (fixed out/ dir) ==="
yield_wait; flock "$LOCK" timeout 3600 python scripts/parity_report.py >> "$LOG" 2>&1
say "parity rc=$?"

say "ALL DONE"
