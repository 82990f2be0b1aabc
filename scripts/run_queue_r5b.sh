#!/bin/bash
# Round-5 queue B: the wide-tier compacted image fetch on the real chip.
#
#   1. On-chip parity: wide tier vs dense fetch must be BIT-EXACT
#      (earth exercises tier 2 every iteration; final_scene checks the
#      hit-gated tier-1 cond).
#   2. Interleaved A/B earth dense-vs-wide (the VERDICT item-3 lever:
#      CPU histogram says ~31% of lanes are image-needy once gated by
#      rec.hit, so the wide tier replaces the 0.93 ms dense gather).
#   3. Interleaved A/B final_scene: hit-gating alone moves more
#      dispatches onto the tier-1 compact branch; measure vs the
#      all-dense fetch to re-pin the scene.
#   4. simple_light + original_scene single rows (cache-warm configs)
#      at the new defaults.
#
# Waits for queue r5a (same lock discipline) to finish first.
#
# Usage: bash scripts/run_queue_r5b.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5b.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# wait for r5a to finish so interleaved arms stay grouped
while [ -f /tmp/q5a.pid ] && kill -0 "$(cat /tmp/q5a.pid)" 2>/dev/null; do
  sleep 60
done
say "r5a done; starting"

say "=== 1. on-chip parity: wide vs dense fetch ==="
yield_wait; flock "$LOCK" timeout 2400 python - >> "$LOG" 2>&1 <<'EOF'
import os, subprocess, sys, tempfile
import numpy as np
def render(scene, env, out, nx, ny, spp):
    e = dict(os.environ); e.update(env)
    code = (
        "import sys;"
        "from art_tpu.models import build_scene;"
        "from art_tpu.render.renderer import RenderConfig, render_scene;"
        "import numpy as np;"
        "nx,ny,spp=int(sys.argv[3]),int(sys.argv[4]),int(sys.argv[5]);"
        "fb,_=render_scene(build_scene(sys.argv[1],nx,ny),RenderConfig(nx=nx,ny=ny,spp=spp));"
        "np.save(sys.argv[2], np.asarray(fb))"
    )
    subprocess.run([sys.executable, "-c", code, scene, out,
                    str(nx), str(ny), str(spp)], env=e, check=True)
for scene, nx, ny, spp in [("earth", 256, 128, 32), ("final_scene", 200, 200, 16)]:
    a, b = tempfile.mktemp(suffix=".npy"), tempfile.mktemp(suffix=".npy")
    render(scene, {"ART_TPU_WFETCH_K": "0"}, a, nx, ny, spp)
    render(scene, {}, b, nx, ny, spp)
    x, y = np.load(a), np.load(b)
    corr = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    print(f"parity {scene} wide-vs-dense: corr={corr:.8f} "
          f"max|d|={np.abs(x-y).max():.4g} bitexact={bool((x==y).all())}")
EOF
say "rc=$?"

say "=== 2. interleaved A/B: earth dense vs wide fetch ==="
timeout 7200 python scripts/ab_interleaved.py earth 1200 600 500 \
  --arm dense:ART_TPU_WFETCH_K=0 --arm wide: --reps 4 --inner 2 >> "$LOG" 2>&1
say "rc=$?"

say "=== 3. interleaved A/B: final_scene all-dense vs gated compact ==="
timeout 7200 python scripts/ab_interleaved.py final_scene 800 800 500 \
  --arm nofetch:ART_TPU_NO_COMPACT_FETCH=1 --arm gated: --reps 3 --inner 2 >> "$LOG" 2>&1
say "rc=$?"

say "=== 4. single rows at new defaults ==="
run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 2400 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}
run simple_light 1200 600 500 X=1
run original_scene 800 800 500 X=1
say "ALL DONE"
