#!/bin/bash
# Round-3 queue G (shade+flush kernel flipped to DEFAULT): golden-parity
# spot check at the new default on the staged-path scenes it affects,
# bench standalone (driver contract), then the r3d artifact tail refresh
# (official original/final renders at the new defaults) and the bouncing
# ablation probes from the unfinished r3f queue.
# Bounded: ends at ALL DONE, no residual process.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r3g.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

say "=== golden parity at new default (shade+flush kernel ON) ==="
yield_wait; flock "$LOCK" timeout 2400 python scripts/parity_report.py \
  bouncing_spheres original_scene earth >> "$LOG" 2>&1
say "rc=$?"

# bench.py manages its own lock + yield sentinel; run it BARE — an outer
# flock deadlocks bench against its own wrapper for its full 1800 s
# lock-wait (observed 01:07, queue_r3g.log "bench rc=143": the step was
# killed and re-run bare out-of-band).
say "=== bench.py standalone (driver contract at new defaults) ==="
timeout 2400 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

say "=== official renders at new defaults (r3d tail) ==="
for s in original_scene final_scene; do
  say "render_official: $s"
  yield_wait; flock "$LOCK" timeout 3000 python scripts/render_official.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "=== full parity_report regen at new defaults ==="
yield_wait; flock "$LOCK" timeout 3600 python scripts/parity_report.py >> "$LOG" 2>&1
say "rc=$?"

run() { # run SCENE NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" env "$@" timeout 2400 python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== bouncing ablation probes at new defaults ==="
run bouncing_spheres 1200 800 500 ART_TPU_DBG=fake_spheres
run bouncing_spheres 1200 800 500 ART_TPU_DBG=fake_shade
run bouncing_spheres 1200 800 500 ART_TPU_DBG=fake_intersect
run bouncing_spheres 1200 800 500 ART_TPU_NO_FLUSH=1
run bouncing_spheres 1200 800 500 ART_TPU_NO_FUSED_REFILL=1

say "=== sharded 1-device TPU mesh: official-config overhead ==="
for s in cornell_smoke quads; do
  say "exp_sharded_tpu: $s"
  yield_wait; flock "$LOCK" timeout 1800 python scripts/exp_sharded_tpu.py "$s" >> "$LOG" 2>&1
  say "rc=$?"
done

say "ALL DONE"
