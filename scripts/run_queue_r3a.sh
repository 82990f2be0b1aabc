#!/bin/bash
# Round-3 queue A: combined-defaults A/B (VERDICT r2 item 2), standalone
# bench validation (item 1), fresh final_scene ablation at the new
# defaults (item 4), and the parity-report regeneration (item 6).
#
# TPU-slot discipline: every python holds /tmp/tpu.lock and yields to the
# driver's bench.py between runs (scripts/tpu_slot.sh).  The queue is
# BOUNDED — it ends at ALL DONE with no residual process.
#
# Usage: bash scripts/run_queue_r3a.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/tmp/queue_r3a.log}"
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
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

# -- 1. combined-defaults A/B ------------------------------------------------
# Defaults now = COMPACT_SPH on (where gated) + FLUSH_WIN=48.  Show the
# combination beats each component alone and the old defaults.
say "=== combined defaults A/B ==="
run final_scene 800 800 500 X=1                                   # new defaults
run final_scene 800 800 500 ART_TPU_NO_COMPACT_SPH=1              # flushwin only
run final_scene 800 800 500 ART_TPU_FLUSH_WIN=0                   # compact only
run final_scene 800 800 500 ART_TPU_NO_COMPACT_SPH=1 ART_TPU_FLUSH_WIN=0  # old defaults
run original_scene 800 800 500 X=1
run original_scene 800 800 500 ART_TPU_NO_COMPACT_SPH=1 ART_TPU_FLUSH_WIN=0
run bouncing_spheres 1200 800 500 X=1                             # xorwow layout!
run bouncing_spheres 1200 800 500 ART_TPU_FLUSH_WIN=0

# -- 2. standalone driver-bench validation ------------------------------------
# bench.py manages its own lock + yield sentinel; run it bare.
say "=== bench.py standalone (driver contract) ==="
timeout 3600 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

# -- 3. fresh final_scene ablation at new defaults (VERDICT item 4) -----------
say "=== final_scene ablation @ new defaults ==="
run final_scene 800 800 500 ART_TPU_DBG=fake_media
run final_scene 800 800 500 ART_TPU_DBG=fake_quads
run final_scene 800 800 500 ART_TPU_DBG=fake_boxes
run final_scene 800 800 500 ART_TPU_DBG=fake_spheres
run final_scene 800 800 500 ART_TPU_DBG=fake_image
run final_scene 800 800 500 ART_TPU_DBG=fake_turb
run final_scene 800 800 500 ART_TPU_DBG=fake_shade
run final_scene 800 800 500 ART_TPU_NO_FLUSH=1
run final_scene 800 800 500 ART_TPU_NO_FUSED_REFILL=1

# -- 4. parity report regeneration (VERDICT item 6) ----------------------------
say "=== parity report (all scenes incl earth + self-goldens) ==="
yield_wait; flock "$LOCK" python scripts/parity_report.py >> "$LOG" 2>&1
say "parity rc=$?"

say "ALL DONE"
