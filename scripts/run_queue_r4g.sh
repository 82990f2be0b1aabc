#!/bin/bash
# Round-4 queue G: re-prioritized remainder of queue r4f.
#
# r4f's earth row compiled for 24 min, pushing the verdict-item rows
# (sharded overhead, parity ladder) past the end-of-round deadline, so
# the runner was stopped after launching its final_scene row and the
# remaining rows reordered: bench shapes + verdict receipts FIRST, A/B
# completeness arms last (cuttable).  Results append to queue_r4g.log;
# read r4f.log + r4g.log together.
#
# Usage: bash scripts/run_queue_r4g.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r4g.log}"
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

run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  gate
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 1500 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== bench shapes (quads SP-elision, cornell) ==="
run quads 1200 600 500 X=1
run cornell_smoke 600 600 400 X=1

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
run earth 1200 600 500 ART_TPU_NO_BAKED_SHADE=1
run original_scene 800 800 500 X=1

say "=== sharded overhead, second scene (cuttable) ==="
gate
say "run: exp_sharded_tpu quads 1200 600 500"
yield_wait; flock "$LOCK" timeout 2400 python scripts/exp_sharded_tpu.py quads 1200 600 500 >> "$LOG" 2>&1
say "rc=$?"

say "ALL DONE"
