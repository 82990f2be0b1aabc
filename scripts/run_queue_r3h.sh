#!/bin/bash
# Round-3 queue H: resume the r3g tail that was cut at round-snapshot
# time.  Order is by evidence value: bench standalone (driver contract
# at the shade-kernel defaults) first, then the stale final_scene
# official render (timings.json still carries the pre-compact-sph 43.3),
# then the full parity_report regen, then the bouncing ablation probes
# and the sharded-overhead runs.  Bounded: ends at ALL DONE, no residual
# process (VERDICT r2 weak #1 rule).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r3h.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

# bench.py manages its own lock + yield sentinel; run it BARE (an outer
# flock deadlocks it against its own wrapper — queue_r3g.log rc=143).
say "=== bench.py standalone (driver contract at new defaults) ==="
timeout 2400 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

say "=== official final_scene render at new defaults (stale 43.3 fix) ==="
yield_wait; flock "$LOCK" timeout 3000 python scripts/render_official.py final_scene >> "$LOG" 2>&1
say "rc=$?"

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
