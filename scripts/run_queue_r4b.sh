#!/bin/bash
# Round-4 queue B: baked-consts shade kernel A/Bs on the real chip.
#
# Default vs ART_TPU_NO_BAKED_SHADE=1 (plane-fed fetch path) on every
# staged-path scene class the gate covers: image-dominated (earth),
# image+noise+metal+dielectric (final), noodle (original), felt +
# uv_offset image (simple_light), solids+media (cornell_smoke), noise
# (perlin).  Sphere-path flags stay at defaults (whatever queue r4a
# selected is orthogonal — both arms here share it).
#
# Usage: bash scripts/run_queue_r4b.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4b.log}"
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

say "=== baked shade kernel A/B ==="
# Decision-critical pairs first (earth/final/original drive the verdict
# targets); the cheap confirmation pairs (simple_light, cornell_smoke,
# perlin) follow and may be cut by the end-of-round bound.
run earth 1200 600 500 X=1
run earth 1200 600 500 ART_TPU_NO_BAKED_SHADE=1
run final_scene 800 800 500 X=1
run final_scene 800 800 500 ART_TPU_NO_BAKED_SHADE=1
run original_scene 800 800 500 X=1
run original_scene 800 800 500 ART_TPU_NO_BAKED_SHADE=1

say "=== SP chain elision + block-skipped dielectric ==="
run quads 1200 600 500 X=1                       # SP default, metal+diel chains now elided
run checkered_spheres 1200 600 500 X=1           # SP default, elided chains
run three_spheres 1200 600 500 X=1               # staged baseline (baked shade)
run three_spheres 1200 600 500 ART_TPU_SP=1      # SP w/ block-skipped diel fix-up
run three_spheres 1200 600 500 ART_TPU_SP=1 ART_TPU_SP_DENSE_DIEL=1  # r3 dense form

say "=== baked shade confirmation pairs (cut-safe) ==="
run simple_light 1200 600 500 X=1
run simple_light 1200 600 500 ART_TPU_NO_BAKED_SHADE=1
run cornell_smoke 600 600 500 X=1
run cornell_smoke 600 600 500 ART_TPU_NO_BAKED_SHADE=1
run perlin 1200 600 500 X=1
run perlin 1200 600 500 ART_TPU_NO_BAKED_SHADE=1

say "ALL DONE"
