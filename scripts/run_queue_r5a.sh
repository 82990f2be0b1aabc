#!/bin/bash
# Round-5 queue A: the verdict's cheap-measurement openers.
#
#   1. On-chip sharded-overhead receipt on the FIXED memoized path
#      (VERDICT r4 item 2; retracts/replaces the 0.157 row).
#   2. Interleaved A/B quads dense-vs-elide (VERDICT item 1a: settle
#      ART_TPU_SP_ELIDE, re-pin quads' dense number with a same-session
#      median).
#   3. Interleaved A/B final_scene control-vs-MXU_SPHERES (VERDICT
#      item 5: orthogonal win never measured on top of baked shade).
#   4. earth 1.466 ms/iter decomposition (VERDICT item 3 prep): which
#      share is the image fetch vs shade vs intersect.
#
# ab_interleaved.py manages flock/yield itself (parent never imports
# jax); plain rows use the standard slot discipline.
#
# Usage: bash scripts/run_queue_r5a.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5a.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "probing tunnel..."
until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

say "=== 1. sharded overhead receipt (fixed memoized path) ==="
yield_wait; flock "$LOCK" timeout 2400 python scripts/exp_sharded_tpu.py cornell_smoke 600 600 400 >> "$LOG" 2>&1
say "rc=$?"

say "=== 2. interleaved A/B: quads dense vs SP_ELIDE ==="
timeout 7200 python scripts/ab_interleaved.py quads 1200 600 500 \
  --arm dense: --arm elide:ART_TPU_SP_ELIDE=1 --reps 4 --inner 2 >> "$LOG" 2>&1
say "rc=$?"

say "=== 3. interleaved A/B: final_scene control vs MXU_SPHERES ==="
timeout 7200 python scripts/ab_interleaved.py final_scene 800 800 500 \
  --arm control: --arm mxu:ART_TPU_MXU_SPHERES=1 --reps 4 --inner 2 >> "$LOG" 2>&1
say "rc=$?"

say "=== 4. earth decomposition (fake_* stubs, one process each) ==="
run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 2400 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}
run earth 1200 600 500 X=1
run earth 1200 600 500 ART_TPU_DBG=fake_image
run earth 1200 600 500 ART_TPU_DBG=fake_shade
run earth 1200 600 500 ART_TPU_DBG=fake_intersect
run earth 1200 600 500 ART_TPU_NO_COMPACT_FETCH=1
say "ALL DONE"
