#!/bin/bash
# Round-4 queue F: consolidated end-of-round decision rows.
#
# Replaces the r4e sweep tail + r4b + r4c chain, which did not fit the
# round window.  Cut-safe ordering — decision-critical first:
#
#   1-2.  baked-shade default A/B arms the verdict targets ride on
#         (earth >= 100, final at defaults) AND warm the exact shapes
#         the driver's bench.py compiles (final/quads/cornell/earth at
#         defaults; bouncing's default shape is already cached from the
#         r4e dense control row).
#   3-4.  bench-shape warm + SP-elision validation (quads) and
#         cornell_smoke at the bench config.
#   5-6.  the remaining A/B arms (earth plane-fed control, original at
#         defaults vs queue r4a's 61.16 pinned-off row).
#   7.    sharded-overhead remeasure with shape-exact warm-up (VERDICT
#         r3 Weak #2) — cornell at 400 spp so the unsharded control is
#         the SAME program as row 4 / bench.py.
#   8.    parity brightness-deficit ladder (VERDICT r3 Weak #3).
#   9.    second sharded-overhead scene (quads), cuttable.
#
# Every row start is gated on DEADLINE_EPOCH (default 03:45 UTC of the
# round-4 window) so no runner is alive near round end (CLAUDE.md hard
# rule), and each row is timeout-bounded.
#
# Usage: bash scripts/run_queue_r4f.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4f.log}"
DEADLINE_EPOCH="${DEADLINE_EPOCH:-1787283900}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

gate() {
  if [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
    say "DEADLINE reached — cutting remaining rows"
    say "ALL DONE (cut)"
    exit 0
  fi
}

say "probing tunnel..."
until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  gate
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  gate
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 1500 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== baked-shade default A/B + bench-shape warm ==="
run earth 1200 600 500 X=1
run final_scene 800 800 500 X=1
run quads 1200 600 500 X=1
run cornell_smoke 600 600 400 X=1
run earth 1200 600 500 ART_TPU_NO_BAKED_SHADE=1
run original_scene 800 800 500 X=1

say "=== sharded overhead, shape-exact warm-up (cornell@bench config) ==="
gate
say "run: exp_sharded_tpu cornell_smoke 600 600 400"
yield_wait; flock "$LOCK" timeout 2400 python scripts/exp_sharded_tpu.py cornell_smoke 600 600 400 >> "$LOG" 2>&1
say "rc=$?"

say "=== parity brightness-deficit ladder ==="
gate
say "run: exp_parity_bias 128 1024"
yield_wait; flock "$LOCK" timeout 2400 python scripts/exp_parity_bias.py 128 1024 >> "$LOG" 2>&1
say "rc=$?"

say "=== sharded overhead, second scene (cuttable) ==="
gate
say "run: exp_sharded_tpu quads 1200 600 500"
yield_wait; flock "$LOCK" timeout 2400 python scripts/exp_sharded_tpu.py quads 1200 600 500 >> "$LOG" 2>&1
say "rc=$?"

say "ALL DONE"
