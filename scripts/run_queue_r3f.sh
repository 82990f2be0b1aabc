#!/bin/bash
# Round-3 queue F (post shade-kernel flip): finish the r3d artifact
# refresh at the new defaults + sharded-TPU overhead + bench + the next
# probes (MXU+shade combined on final, bouncing ablation).
# Bounded: ends at ALL DONE, no residual process.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r3f.log}"
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
  yield_wait; flock "$LOCK" env "$@" timeout 2400 python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== official renders at new defaults (r3d tail) ==="
for s in original_scene final_scene; do
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

# bench.py manages its own lock + yield sentinel; run it BARE — an outer
# flock deadlocks bench against its own wrapper (it waits on /tmp/tpu.lock
# internally).  NOTE: this queue was superseded by run_queue_r3g.sh.
say "=== bench.py standalone (driver contract at new defaults) ==="
timeout 2400 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

say "=== next probes ==="
run final_scene 800 800 500 ART_TPU_MXU_SPHERES=1
run bouncing_spheres 1200 800 500 ART_TPU_DBG=fake_spheres
run bouncing_spheres 1200 800 500 ART_TPU_DBG=fake_shade
run bouncing_spheres 1200 800 500 ART_TPU_DBG=fake_intersect
run bouncing_spheres 1200 800 500 ART_TPU_NO_FLUSH=1
run bouncing_spheres 1200 800 500 ART_TPU_NO_FUSED_REFILL=1

say "ALL DONE"
