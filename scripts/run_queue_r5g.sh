#!/bin/bash
# Round-5 queue G (final, bounded): WFETCH_K trim A/B on earth + a
# complete per-scene ledger at round-5 defaults.  DEADLINE-gated so no
# runner is alive near round end (CLAUDE.md hard rule).
#
# Usage: bash scripts/run_queue_r5g.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5g.log}"
DEADLINE_EPOCH="${DEADLINE_EPOCH:-$(( $(date +%s) + 4500 ))}"
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

say "=== interleaved A/B: earth WFETCH_K 49152 vs 45056 ==="
gate
timeout 3600 python scripts/ab_interleaved.py earth 1200 600 500 \
  --arm k49:ART_TPU_WFETCH_K=49152 --arm k44:ART_TPU_WFETCH_K=45056 \
  --reps 3 --inner 2 >> "$LOG" 2>&1
say "rc=$?"

say "=== per-scene ledger at round-5 defaults ==="
run() { # run NAME NX NY SPP
  local name=$1 nx=$2 ny=$3 spp=$4
  gate
  say "run: $name $nx $ny $spp"
  yield_wait; flock "$LOCK" timeout 1800 env X=1 python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}
run checkered_spheres 1200 600 500
run perlin 1200 600 500
run cornell_box 600 600 500
run three_spheres 1200 675 500
run simple_light_book 1200 600 500
say "ALL DONE"
