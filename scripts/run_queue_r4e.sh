#!/bin/bash
# Round-4 queue E: cell-binned sphere kernel A/Bs on the real chip.
#
# Two new paths behind ART_TPU_SPH_CELLBIN=1 (ops/pallas_kernels.py
# _sphere_cellbin_kernel):
#   * bouncing_spheres-class: the WHOLE small-sphere set (moving
#     included, per-row materials) in a 4x4 2-D lattice — the headline
#     scene's ~490-row dense scan gets block-level pruning with an
#     occlusion bound (t_near <= best_t).
#   * tail-cluster scenes: the 1000-ball cluster in a 3x3x3 lattice
#     (pack_tail2d_spheres) — rear cells prune via the occlusion bound
#     where queue r4a's 1-D y-bins could not.
#
# Usage: bash scripts/run_queue_r4e.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4e.log}"
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

say "=== cellbin A/B: bouncing (headline) ==="
run bouncing_spheres 1200 800 500 ART_TPU_SPH_CELLBIN=1
run bouncing_spheres 1200 800 500 X=1                      # dense control (current default)

say "=== tail-lattice A/B: final_scene ==="
# NB: with ART_TPU_SPH_CELLBIN=1 the cellbin branch takes priority over
# the compact/skip chain, so this is the pure head-dense + tail-lattice
# form vs queue r4a's rows (baked shade pinned off on both sides there).
run final_scene 800 800 500 ART_TPU_SPH_CELLBIN=1 ART_TPU_NO_BAKED_SHADE=1
run original_scene 800 800 500 ART_TPU_SPH_CELLBIN=1 ART_TPU_NO_BAKED_SHADE=1

say "=== compact + tail-lattice fallback ==="
run final_scene 800 800 500 ART_TPU_COMPACT_CELLBIN=1 ART_TPU_NO_BAKED_SHADE=1
run original_scene 800 800 500 ART_TPU_COMPACT_CELLBIN=1 ART_TPU_NO_BAKED_SHADE=1

say "=== cellbin lattice sweep: bouncing (cut-safe) ==="
run bouncing_spheres 1200 800 500 ART_TPU_SPH_CELLBIN=1 ART_TPU_CELLBIN_GRID=3
run bouncing_spheres 1200 800 500 ART_TPU_SPH_CELLBIN=1 ART_TPU_CELLBIN_GRID=6

say "ALL DONE"
