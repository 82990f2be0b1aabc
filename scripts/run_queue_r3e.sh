#!/bin/bash
# Round-3 queue E: fused shade+flush kernel (ops/shade_kernel.py) A/B +
# on-chip parity (opt-in ART_TPU_SHADE_KERNEL=1 vs staged defaults) on
# the generic-scene path: bouncing (headline), final, original, earth,
# cornell_smoke.  Fresh same-process controls for the two decision scenes.
# Bounded: ends at ALL DONE, no residual process.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/root/repo/docs/logs/queue_r3e.log}"
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
  yield_wait; flock "$LOCK" env "$@" timeout 2400 python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

say "=== fused shade+flush kernel A/B ==="
run bouncing_spheres 1200 800 500 ART_TPU_SHADE_KERNEL=1
run bouncing_spheres 1200 800 500 X=1
run final_scene 800 800 500 ART_TPU_SHADE_KERNEL=1
run final_scene 800 800 500 X=1
run original_scene 800 800 500 ART_TPU_SHADE_KERNEL=1
run earth 1200 600 500 ART_TPU_SHADE_KERNEL=1
run cornell_smoke 600 600 400 ART_TPU_SHADE_KERNEL=1

say "=== SP-noise extension A/B (perlin marble in the megakernel) ==="
run perlin 1200 600 500 X=1
run perlin 1200 600 500 ART_TPU_NO_SP=1
run simple_light_book 1200 600 500 X=1
run simple_light_book 1200 600 500 ART_TPU_NO_SP=1

say "=== on-chip parity: shade kernel vs staged (200x200@16) ==="
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
for scene in ["bouncing_spheres", "final_scene", "cornell_smoke"]:
    a, b = tempfile.mktemp(suffix=".npy"), tempfile.mktemp(suffix=".npy")
    render(scene, {"ART_TPU_SHADE_KERNEL": "1"}, a)
    render(scene, {}, b)  # staged default
    x, y = np.load(a), np.load(b)
    corr = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    print(f"parity {scene} shade-kernel vs staged: corr={corr:.6f} "
          f"max|d|={np.abs(x-y).max():.4g} mean|d|={np.abs(x-y).mean():.4g}")
# SP-noise extension parity (perlin marble inlined into the short-path
# megakernel): SP default-on vs staged
for scene in ["perlin", "simple_light_book"]:
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
