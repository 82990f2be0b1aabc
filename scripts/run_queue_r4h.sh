#!/bin/bash
# Round-4 queue H: quads-regression bisect + the r4g remainder.
#
# quads at round-4 defaults measured 205.30 Mrays/s (queue_r4g.log)
# against 294.21 at round-3 close (queue_r3c.log) — a -30% regression
# on a bench-swept scene.  CPU AOT cross-lowering shows the round-4
# program is structurally intact (same single fused SP launch, ~7 KB
# SMALLER Mosaic payload after the material-chain elision), so either
# a Mosaic codegen pessimization hides in the smaller kernel or the
# chip/tunnel is in a slow state.  Row 1 decides: the EXACT round-3
# code (git worktree @83b99d7, shared compile cache) measured
# back-to-back with today's chip state.
#   ~294  -> code regression: bisect c846b32 vs 781a97f next round,
#            flip the SP elision off if implicated.
#   ~205  -> environmental: defaults are fine, note the session drift.
#
# Then the verdict receipts (sharded overhead, parity ladder) and the
# cuttable A/B completeness arms.
#
# Usage: bash scripts/run_queue_r4h.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4h.log}"
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

say "=== bisect: quads on round-3-close code (worktree @83b99d7) ==="
gate
say "run: [r3code] quads 1200 600 500"
yield_wait; flock "$LOCK" timeout 1500 python /tmp/r3code/scripts/exp_shortpath.py quads 1200 600 500 >> "$LOG" 2>&1
say "rc=$?"

say "=== sharded overhead, shape-exact warm-up (VERDICT r3 Weak #2) ==="
gate
say "run: exp_sharded_tpu cornell_smoke 600 600 400"
yield_wait; flock "$LOCK" timeout 2400 python scripts/exp_sharded_tpu.py cornell_smoke 600 600 400 >> "$LOG" 2>&1
say "rc=$?"

say "=== parity brightness-deficit ladder (VERDICT r3 Weak #3) ==="
gate
say "run: exp_parity_bias 128 1024"
yield_wait; flock "$LOCK" timeout 2400 python scripts/exp_parity_bias.py 128 1024 >> "$LOG" 2>&1
say "rc=$?"

say "=== A/B completeness arms (cuttable) ==="
run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  gate
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 1500 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}
run earth 1200 600 500 ART_TPU_NO_BAKED_SHADE=1
run original_scene 800 800 500 X=1

say "ALL DONE"
