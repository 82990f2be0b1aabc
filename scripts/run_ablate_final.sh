#!/bin/bash
# Fine-grained final_scene iteration-budget ablation on the real chip.
# Run AFTER scripts/run_ab_static.sh finishes (flock serializes anyway).
# Each variant is its own python process (flags read at import); every
# invocation holds /tmp/tpu.lock (CLAUDE.md one-process rule).
#
# Usage: bash scripts/run_ablate_final.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/tmp/ablate_final.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

run() { # run ENVSPEC...
  say "ablate: $*"
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py final_scene 800 800 500 \
    >> "$LOG" 2>&1
  say "rc=$?"
}

run X=1                                  # full (baseline)
run ART_TPU_DBG=fake_media               # both constant media elided
run ART_TPU_DBG=fake_quads               # quad kernel elided
run ART_TPU_DBG=fake_boxes               # grid/box kernel elided
run ART_TPU_DBG=fake_spheres             # sphere kernel elided
run ART_TPU_DBG=fake_image               # image texel fetch elided
run ART_TPU_DBG=fake_turb                # 7-octave perlin turbulence elided
run ART_TPU_DBG=fake_shade               # material scatter/shade elided
run ART_TPU_NO_FLUSH=1                   # fb flush elided
say "--- candidate A/Bs (not ablations) ---"
run ART_TPU_COMPACT_TURB=1               # compacted marble turbulence

# original_scene: compacted NOODLE turbulence (same flag; one noodle
# sphere among ~1410 objects).  fake_turb first to bound the win.
runo() { # runo ENVSPEC...
  say "original: $*"
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py original_scene 800 800 500 \
    >> "$LOG" 2>&1
  say "rc=$?"
}
runo ART_TPU_DBG=fake_turb               # dense-noodle-turb cost bound
runo ART_TPU_COMPACT_TURB=1              # compacted noodle turbulence

# adaptive small flush window (cond fallback to the worst-case window);
# the static window is ~112 rows at official configs, typical live span
# ~10 rows — MXU flush cost is linear in rows.
run ART_TPU_FLUSH_WIN=24                 # final_scene
run ART_TPU_FLUSH_WIN=48
runb() { # runb ENVSPEC...
  say "bouncing: $*"
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py bouncing_spheres 1200 800 500 \
    >> "$LOG" 2>&1
  say "rc=$?"
}
runb ART_TPU_FLUSH_WIN=24
runb ART_TPU_FLUSH_WIN=48
runq() { # runq ENVSPEC...
  say "quads: $*"
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py quads 1200 600 500 \
    >> "$LOG" 2>&1
  say "rc=$?"
}
runq X=1                                 # warm baseline for the pair
runq ART_TPU_FLUSH_WIN=24
say "ALL DONE (candidates)"
say "ALL DONE"
