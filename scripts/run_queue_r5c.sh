#!/bin/bash
# Round-5 queue C: final_scene + original_scene iteration decomposition
# at round-5 defaults (hit-gated needy, wide-tier fetch) — data for the
# VERDICT item-4/8 perf pushes (final >= 80, original >= 70).
#
# Each fake_* stub is dependency-preserving (CLAUDE.md); one process per
# row because the flags are read at import.
#
# Usage: bash scripts/run_queue_r5c.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5c.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# chain: wait for r5b
while [ -f /tmp/q5b.pid ] && kill -0 "$(cat /tmp/q5b.pid)" 2>/dev/null; do
  sleep 60
done
say "r5b done; starting"

run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 2400 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== final_scene decomposition (defaults) ==="
run final_scene 800 800 500 X=1
run final_scene 800 800 500 ART_TPU_DBG=fake_spheres
run final_scene 800 800 500 ART_TPU_DBG=fake_boxes
run final_scene 800 800 500 ART_TPU_DBG=fake_media
run final_scene 800 800 500 ART_TPU_DBG=fake_image
run final_scene 800 800 500 ART_TPU_DBG=fake_shade
run final_scene 800 800 500 ART_TPU_NO_FLUSH=1

say "=== original_scene decomposition ==="
run original_scene 800 800 500 ART_TPU_DBG=fake_spheres
run original_scene 800 800 500 ART_TPU_DBG=fake_image
run original_scene 800 800 500 ART_TPU_DBG=fake_turb
run original_scene 800 800 500 ART_TPU_DBG=fake_boxes
say "ALL DONE"
