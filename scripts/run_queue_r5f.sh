#!/bin/bash
# Round-5 queue F: the recentered tail MXU fallback (ART_TPU_MXU_TAIL)
# on the real chip — the remaining final_scene >= 80 candidate.
#
# Usage: bash scripts/run_queue_r5f.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5f.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# chain: wait for r5e
while [ -f /tmp/q5e.pid ] && kill -0 "$(cat /tmp/q5e.pid)" 2>/dev/null; do
  sleep 60
done
say "r5e done; starting"

say "=== parity: MXU tail vs planar dense (final small, on-chip) ==="
yield_wait; flock "$LOCK" timeout 2400 python - >> "$LOG" 2>&1 <<'EOF'
import os, subprocess, sys, tempfile
import numpy as np
def render(env, out):
    e = dict(os.environ); e.update(env)
    code = (
        "import sys;"
        "from art_tpu.models import build_scene;"
        "from art_tpu.render.renderer import RenderConfig, render_scene;"
        "import numpy as np;"
        "fb,_=render_scene(build_scene('final_scene',200,200),RenderConfig(nx=200,ny=200,spp=32));"
        "np.save(sys.argv[1], np.asarray(fb))"
    )
    subprocess.run([sys.executable, "-c", code, out], env=e, check=True)
a, b = tempfile.mktemp(suffix=".npy"), tempfile.mktemp(suffix=".npy")
render({}, a)
render({"ART_TPU_MXU_TAIL": "1"}, b)
x, y = np.load(a), np.load(b)
corr = np.corrcoef(x.ravel(), y.ravel())[0, 1]
print(f"parity final mxu-tail vs default: corr={corr:.6f} "
      f"max|d|={np.abs(x-y).max():.4g} mean|d|={np.abs(x-y).mean():.4g}")
EOF
say "rc=$?"

say "=== interleaved A/B: final control vs MXU tail ==="
timeout 7200 python scripts/ab_interleaved.py final_scene 800 800 500 \
  --arm control: --arm mxutail:ART_TPU_MXU_TAIL=1 --reps 3 --inner 2 >> "$LOG" 2>&1
say "rc=$?"

say "=== original_scene single rows ==="
run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 2400 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}
run original_scene 800 800 500 ART_TPU_MXU_TAIL=1
run original_scene 800 800 500 X=1
say "ALL DONE"
