#!/bin/bash
# Round-3 queue D: artifact refresh + sharded-TPU overhead + bench check.
#   1. Regenerate docs/renders/full/{*.png,timings.json} at current
#      defaults (VERDICT r2 weak #5 / item 6: committed numbers must not
#      contradict the logs).
#   2. Official-config sharded render on the 1-device TPU mesh
#      (VERDICT r2 item 8: quantify shard_map overhead).
#   3. bench.py standalone (driver contract rc=0 on the current tree).
# Bounded: ends at ALL DONE, no residual process.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r3d.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

say "=== official renders at current defaults ==="
for s in three_spheres cornell_smoke quads checkered_spheres earth perlin \
         cornell_box bouncing_spheres simple_light simple_light_book \
         original_scene final_scene; do
  say "render_official: $s"
  yield_wait; flock "$LOCK" timeout 3000 python scripts/render_official.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "=== sharded 1-device TPU mesh: official-config overhead ==="
for s in cornell_smoke quads; do
  say "exp_sharded_tpu: $s"
  yield_wait; flock "$LOCK" timeout 1800 python scripts/exp_sharded_tpu.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "=== bench.py standalone ==="
yield_wait; flock "$LOCK" timeout 2400 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

say "ALL DONE"
