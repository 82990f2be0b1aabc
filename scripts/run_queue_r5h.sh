#!/bin/bash
# Round-5 queue H (last): refresh the remaining official renders so
# timings.json is uniformly at round-5 defaults.  Hard deadline gate.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5h.log}"
DEADLINE_EPOCH="${DEADLINE_EPOCH:-$(( $(date +%s) + 3300 ))}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
gate() {
  if [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
    say "DEADLINE reached — cutting remaining rows"; say "ALL DONE (cut)"; exit 0
  fi
}
for s in cornell_smoke quads checkered_spheres three_spheres perlin cornell_box simple_light_book; do
  gate
  say "render: $s"
  yield_wait; flock "$LOCK" timeout 1500 python scripts/render_official.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done
say "ALL DONE"
