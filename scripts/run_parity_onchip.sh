#!/bin/bash
# On-chip parity of the new static kernels vs their looped forms.
# (Re-run of the parity tail of run_ab_static.sh, which was cut short.)
# Usage: bash scripts/run_parity_onchip.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/tmp/parity_onchip.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

say "parity: static kernels vs looped forms (200x200@16)"
yield_wait; flock "$LOCK" python - >> "$LOG" 2>&1 <<'EOF'
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
for scene, env in [
    ("final_scene", {"ART_TPU_NO_GRID_STATIC": "1"}),
    ("bouncing_spheres", {"ART_TPU_SPH_STATIC": "1"}),
    ("original_scene", {"ART_TPU_SPH_STATIC": "1"}),
    ("final_scene", {"ART_TPU_FLUSH_WIN": "24"}),
    ("final_scene", {"ART_TPU_COMPACT_TURB": "1"}),
    ("original_scene", {"ART_TPU_COMPACT_TURB": "1"}),
]:
    a, b = tempfile.mktemp(suffix=".npy"), tempfile.mktemp(suffix=".npy")
    render(scene, {}, a)
    render(scene, env, b)
    x, y = np.load(a), np.load(b)
    corr = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    print(f"parity {scene} vs {env}: corr={corr:.6f} "
          f"max|d|={np.abs(x-y).max():.4g} mean|d|={np.abs(x-y).mean():.4g}")
EOF
say "ALL DONE"
