#!/bin/bash
# Round-4 queue D: end-of-round artifact refresh at the post-A/B defaults.
#
# 1. Official renders + timings.json for every scene this round's
#    changes touch (baked shade covers all staged scenes but bouncing;
#    the skip kernel covers final/original; SP elision covers
#    quads/checkered).  bouncing_spheres is re-timed too so
#    timings.json is uniformly at round-4 defaults.
# 2. Parity report regeneration (docs/parity_report.json) so the
#    committed report reflects the shipped defaults.
#
# Run AFTER queues r4a/r4b/r4c have fixed the defaults.
#
# Usage: bash scripts/run_queue_r4d.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4d.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "probing tunnel..."
until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

say "=== official renders (cheap 500-spp scenes first) ==="
for s in earth perlin quads checkered_spheres three_spheres cornell_smoke; do
  say "render: $s"
  yield_wait; flock "$LOCK" python scripts/render_official.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "=== official renders (10000-spp scenes) ==="
for s in simple_light_book cornell_box simple_light bouncing_spheres original_scene final_scene; do
  say "render: $s"
  yield_wait; flock "$LOCK" python scripts/render_official.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "=== parity report ==="
yield_wait; flock "$LOCK" python scripts/parity_report.py >> "$LOG" 2>&1
say "rc=$?"

say "ALL DONE"
