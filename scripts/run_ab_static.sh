#!/bin/bash
# Orchestrate the queued static-kernel A/Bs on the real chip.
#
# Waits for the axon tunnel (probe loop, docs/PERF_NOTES.md outage
# playbook), then runs each measurement as its OWN python process (env
# flags are read at import), strictly one at a time, no outer timeouts
# on TPU work (SIGTERM mid-compile can crash the remote worker).
#
# Every python invocation (probe included) holds /tmp/tpu.lock — the
# "one Python process while TPU work runs" rule (CLAUDE.md).  Interactive
# CPU-side work must take the same lock (flock /tmp/tpu.lock ...).
#
# Usage: bash scripts/run_ab_static.sh [logfile]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG="${1:-/tmp/ab_static.log}"
source "$(dirname "$0")/tpu_slot.sh"
: > "$LOG"

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# -- wait for the tunnel ----------------------------------------------------
say "probing tunnel..."
until yield_wait; flock "$LOCK" timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  say "tunnel down, retrying"
  sleep 240
done
say "tunnel UP"

run() { # run NAME NX NY SPP [ENV=V ...]
  local name=$1 nx=$2 ny=$3 spp=$4; shift 4
  say "run: $name $nx $ny $spp  env: $*"
  yield_wait; flock "$LOCK" env "$@" python scripts/exp_shortpath.py "$name" "$nx" "$ny" "$spp" \
    >> "$LOG" 2>&1
  say "rc=$?"
}

# -- throughput A/Bs, highest-value first (outage may cut the queue short) ---
# 1) the NEW DEFAULT (grid-static box kernel) must compile+run on the real
#    Mosaic backend before anything else — bench.py's final_scene sweep and
#    every official render depend on it.
run final_scene 800 800 500
# 2) headline sanity (cache-warm program, fast)
run bouncing_spheres 1200 800 500
# 3) the final_scene A/B pair for the default + the static-sphere candidate
run final_scene 800 800 500 ART_TPU_NO_GRID_STATIC=1
run final_scene 800 800 500 ART_TPU_SPH_STATIC=1
# 4) bouncing candidates: fully-static vs SMEM-table vs deeper unroll
run bouncing_spheres 1200 800 500 ART_TPU_SPH_STATIC=1
run bouncing_spheres 1200 800 500 ART_TPU_SPH_SMEM=1
run bouncing_spheres 1200 800 500 ART_TPU_SPH_UNROLL=64
run final_scene 800 800 500 ART_TPU_SPH_UNROLL=64
# 5) original: sphere-static (hollow glass => pos_r False, carry-r path)
run original_scene 800 800 500
run original_scene 800 800 500 ART_TPU_SPH_STATIC=1
# compact-fetch capacity (MXU scatter cost is linear in K)
run original_scene 800 800 500 ART_TPU_FETCH_K=4096
run simple_light 1200 600 500
run simple_light 1200 600 500 ART_TPU_FETCH_K=4096

# -- on-chip parity: new kernels vs their looped forms -----------------------
say "parity: grid-static vs looped grid (final_scene 200x200@16)"
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
