#!/bin/bash
# A/B the compacted tail-sphere pass (ART_TPU_COMPACT_SPH) on the real
# chip: throughput on the two cluster scenes at K=8192/16384, then
# on-chip parity vs the dense kernel.  Same serialization protocol as
# run_ab_static.sh (every python holds /tmp/tpu.lock).
# Usage: bash scripts/run_ab_compact_sph.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/tmp/ab_compact_sph.log}"
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
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

run final_scene 800 800 500 ART_TPU_COMPACT_SPH=1
run final_scene 800 800 500 ART_TPU_COMPACT_SPH=1 ART_TPU_SPH_K=16384
run original_scene 800 800 500 ART_TPU_COMPACT_SPH=1
run original_scene 800 800 500 ART_TPU_COMPACT_SPH=1 ART_TPU_SPH_K=16384

say "parity: compacted tail spheres vs dense (200x200@16)"
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
for scene in ("final_scene", "original_scene"):
    a, b = tempfile.mktemp(suffix=".npy"), tempfile.mktemp(suffix=".npy")
    render(scene, {}, a)
    render(scene, {"ART_TPU_COMPACT_SPH": "1"}, b)
    x, y = np.load(a), np.load(b)
    corr = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    print(f"parity {scene} COMPACT_SPH: corr={corr:.6f} "
          f"max|d|={np.abs(x-y).max():.4g} mean|d|={np.abs(x-y).mean():.4g}")
EOF
say "ALL DONE"
