#!/bin/bash
# Round-4 queue C: measurement-rigor items.
#
# 1. Parity brightness-deficit analysis (VERDICT r3 Weak #3):
#    clamped vs unclamped means over an spp ladder for the two flagged
#    scenes (scripts/exp_parity_bias.py).
# 2. Sharded-overhead remeasure with shape-exact warm-up (Weak #2) on
#    two scenes; unsharded controls must land within ~5% of the
#    official timings.
#
# Usage: bash scripts/run_queue_r4c.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4c.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "probing tunnel..."
until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

say "=== parity brightness-deficit ladder ==="
# Two rungs (was three): each (scene, spp) is a fresh program shape and
# a ~10-min remote compile; 128 -> 1024 shows the clamped-mean
# convergence direction just as well as 128 -> 512 -> 2048.
yield_wait; flock "$LOCK" python scripts/exp_parity_bias.py 128 1024 >> "$LOG" 2>&1
say "rc=$?"

say "=== sharded overhead, shape-exact warm-up ==="
yield_wait; flock "$LOCK" python scripts/exp_sharded_tpu.py cornell_smoke 600 600 500 >> "$LOG" 2>&1
say "rc=$?"
yield_wait; flock "$LOCK" python scripts/exp_sharded_tpu.py quads 1200 600 500 >> "$LOG" 2>&1
say "rc=$?"

run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== compact-branch cost decomposition (final_scene) ==="
# The end-to-end compact win (65.64 vs 64.01 r3) is ~10x below the
# per-branch cost model's prediction.  Pin where the model is wrong:
# branch RATIO at production slots (stats row) and per-branch COST
# (forced rows; compact-forced renders a wrong image past K — t_iter
# is the only meaningful output).
run final_scene 800 800 500 ART_TPU_NO_BAKED_SHADE=1 ART_TPU_NO_SPH_SKIP=1 ART_TPU_STATS_NEEDY=1
run final_scene 800 800 500 ART_TPU_NO_BAKED_SHADE=1 ART_TPU_NO_SPH_SKIP=1 ART_TPU_SPH_FORCE_BRANCH=dense
run final_scene 800 800 500 ART_TPU_NO_BAKED_SHADE=1 ART_TPU_NO_SPH_SKIP=1 ART_TPU_SPH_FORCE_BRANCH=compact

say "ALL DONE"
