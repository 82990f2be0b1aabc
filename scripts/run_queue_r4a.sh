#!/bin/bash
# Round-4 queue A: needy-skip binned sphere kernel A/Bs on the real chip.
#
# Measures the new block-pruned tail kernel (ops/pallas_kernels.py
# _sphere_skip_kernel) against round 3's defaults on the two
# tail-cluster scenes, sweeps the bin count, and guards the headline
# scene (which must be unaffected — its gate never fires).
#
# Protocol: every python under flock /tmp/tpu.lock, yield_wait before
# each run (driver bench priority), no outer timeouts on TPU compiles.
#
# Usage: bash scripts/run_queue_r4a.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4a.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "probing tunnel..."
until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

# ART_TPU_NO_BAKED_SHADE=1 pins the (independent) baked-shade variable
# introduced the same round, so these rows vary ONLY the sphere path;
# queue r4b A/Bs the baked shade kernel separately.
B=ART_TPU_NO_BAKED_SHADE=1

say "=== skip-kernel A/B: final_scene ==="
run final_scene 800 800 500 $B                                   # NEW default: compact + skip fallback
run final_scene 800 800 500 $B ART_TPU_NO_SPH_SKIP=1             # r3 default: compact + dense fallback
run final_scene 800 800 500 $B ART_TPU_NO_COMPACT_SPH=1          # skip only (no compaction)
run final_scene 800 800 500 $B ART_TPU_COMPACT_SKIP=1            # compact tail pass also binned
run final_scene 800 800 500 $B ART_TPU_NO_COMPACT_SPH=1 ART_TPU_NO_SPH_SKIP=1  # plain dense control

say "=== bin-count sweep (skip only, final_scene) ==="
run final_scene 800 800 500 $B ART_TPU_NO_COMPACT_SPH=1 ART_TPU_SPH_BINS=1
run final_scene 800 800 500 $B ART_TPU_NO_COMPACT_SPH=1 ART_TPU_SPH_BINS=8
run final_scene 800 800 500 $B ART_TPU_NO_COMPACT_SPH=1 ART_TPU_SPH_BINS=32

say "=== original_scene ==="
run original_scene 800 800 500 $B
run original_scene 800 800 500 $B ART_TPU_NO_SPH_SKIP=1
run original_scene 800 800 500 $B ART_TPU_NO_COMPACT_SPH=1

say "=== guard: headline scene unaffected ==="
run bouncing_spheres 1200 800 500 $B

say "ALL DONE"
