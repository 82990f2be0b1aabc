#!/bin/bash
# Round-3 queue I: refresh the cheap official renders whose committed
# timings predate the shade+flush-kernel default (earth 88.2 measured
# 91.4 at the new default; cornell_smoke benched 360 vs recorded 331),
# plus the flagship bouncing render.  Each is seconds-to-minutes; the
# expensive fresh ones (original r3g, final r3h) are not re-run.
# Bounded: ends at ALL DONE, no residual process.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r3i.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

say "=== official render refresh at shade-kernel defaults ==="
for s in cornell_smoke earth perlin quads checkered_spheres simple_light_book bouncing_spheres; do
  say "render_official: $s"
  yield_wait; flock "$LOCK" timeout 2400 python scripts/render_official.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "ALL DONE"
