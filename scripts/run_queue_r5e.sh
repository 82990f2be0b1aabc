#!/bin/bash
# Round-5 queue E: end-of-round artifact refresh at round-5 defaults
# (VERDICT item 6).
#
# 1. Official renders + timings.json for the scenes round 5 moved
#    (earth wide-tier fetch; final/original occlusion gate; simple_light
#    image fetch gating) + bouncing for headline continuity.
# 2. Full parity-report regeneration (docs/parity_report.json) with the
#    cornell_box legacy_walls fix.
#
# Run AFTER r5d settles the defaults.
#
# Usage: bash scripts/run_queue_r5e.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5e.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# chain: wait for r5d
while [ -f /tmp/q5d.pid ] && kill -0 "$(cat /tmp/q5d.pid)" 2>/dev/null; do
  sleep 60
done
say "r5d done; starting"

say "=== official renders (round-5-moved scenes) ==="
for s in earth simple_light original_scene final_scene bouncing_spheres; do
  say "render: $s"
  yield_wait; flock "$LOCK" timeout 3600 python scripts/render_official.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "=== parity report (all scenes, legacy_walls fix) ==="
yield_wait; flock "$LOCK" timeout 5400 python scripts/parity_report.py >> "$LOG" 2>&1
say "rc=$?"
say "ALL DONE"
