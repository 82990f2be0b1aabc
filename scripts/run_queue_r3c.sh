#!/bin/bash
# Round-3 queue C: short-path megakernel (ops/sp_kernel.py) A/B + on-chip
# parity on the gated scenes (VERDICT r2 item 5 — target quads >= 400
# Mrays/s with image parity vs the staged path).
# Bounded: ends at ALL DONE, no residual process.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/tmp/queue_r3c.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

run() { # run SCENE NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" env "$@" timeout 1800 python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== short-path megakernel A/B ==="
run quads 1200 600 500 X=1
run quads 1200 600 500 ART_TPU_NO_SP=1
run checkered_spheres 1200 600 500 X=1
run checkered_spheres 1200 600 500 ART_TPU_NO_SP=1
run three_spheres 1200 600 500 X=1
run three_spheres 1200 600 500 ART_TPU_NO_SP=1

say "=== on-chip parity: SP vs staged (200x200@16) ==="
yield_wait; flock "$LOCK" timeout 3600 python - >> "$LOG" 2>&1 <<'EOF'
import os, subprocess, sys, tempfile
import numpy as np
def render(scene, env, out):
    e = dict(os.environ); e.update(env)
    code = (
        "import sys;"
        "from art_tpu.models import build_scene;"
        "from art_tpu.render.renderer import RenderConfig, render_scene;"
        "import numpy as np;"
        "fb,_=render_scene(build_scene(sys.argv[1],200,200),RenderConfig(nx=200,ny=200,spp=16));"
        "np.save(sys.argv[2], np.asarray(fb))"
    )
    subprocess.run([sys.executable, "-c", code, scene, out], env=e, check=True)
for scene in ["quads", "checkered_spheres", "three_spheres"]:
    a, b = tempfile.mktemp(suffix=".npy"), tempfile.mktemp(suffix=".npy")
    render(scene, {}, a)                      # SP default-on
    render(scene, {"ART_TPU_NO_SP": "1"}, b)  # staged path
    x, y = np.load(a), np.load(b)
    corr = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    print(f"parity {scene} SP vs staged: corr={corr:.6f} "
          f"max|d|={np.abs(x-y).max():.4g} mean|d|={np.abs(x-y).mean():.4g}")
EOF
say "parity rc=$?"

say "ALL DONE"
