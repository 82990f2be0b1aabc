#!/bin/bash
# Round-5 queue D: the occlusion-gate decision + SPH_K follow-ups on the
# tail-cluster scenes (VERDICT items 4/8).
#
# Usage: bash scripts/run_queue_r5d.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r5d.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# chain: wait for r5c
while [ -f /tmp/q5c.pid ] && kill -0 "$(cat /tmp/q5c.pid)" 2>/dev/null; do
  sleep 60
done
say "r5c done; starting"

say "=== parity: occlusion gate on vs off (final_scene small) ==="
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
        "fb,_=render_scene(build_scene('final_scene',200,200),RenderConfig(nx=200,ny=200,spp=16));"
        "np.save(sys.argv[1], np.asarray(fb))"
    )
    subprocess.run([sys.executable, "-c", code, out], env=e, check=True)
a, b = tempfile.mktemp(suffix=".npy"), tempfile.mktemp(suffix=".npy")
render({"ART_TPU_NO_OCC_GATE": "1"}, a)
render({}, b)
x, y = np.load(a), np.load(b)
print(f"parity final occgate on-vs-off: bitexact={bool((x==y).all())} "
      f"max|d|={np.abs(x-y).max():.4g}")
EOF
say "rc=$?"

say "=== interleaved A/B: final occlusion gate ==="
timeout 7200 python scripts/ab_interleaved.py final_scene 800 800 500 \
  --arm nogate:ART_TPU_NO_OCC_GATE=1 --arm gate: --reps 3 --inner 2 >> "$LOG" 2>&1
say "rc=$?"

say "=== SPH_K sweep on final (single rows, compare to r5d A/B gate arm) ==="
run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" timeout 2400 env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}
run final_scene 800 800 500 ART_TPU_SPH_K=16384
run final_scene 800 800 500 ART_TPU_SPH_K=24576
run original_scene 800 800 500 X=1
run original_scene 800 800 500 ART_TPU_NO_OCC_GATE=1
say "ALL DONE"
