#!/bin/bash
# Measure bouncing_spheres throughput per flush mode (real TPU).
# Every python invocation holds /tmp/tpu.lock (CLAUDE.md one-process rule)
# and uses the persistent compile cache.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for mode in aos drop planar planar_drop; do
  echo "=== FLUSH=$mode ==="
  flock /tmp/tpu.lock env ART_TPU_FLUSH=$mode PYTHONPATH=/root/repo:$PYTHONPATH python -u - <<'PY'
import time
from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene
scene = build_scene("bouncing_spheres", 1200, 800)
cfg = RenderConfig(nx=1200, ny=800, spp=100)
render_scene(scene, cfg)
rates = []
for _ in range(2):
    _, stats = render_scene(scene, cfg)
    rates.append(stats["mrays_per_sec"])
print(f"rate={max(rates):.2f} Mrays/s (runs: {rates[0]:.2f}, {rates[1]:.2f})", flush=True)
PY
done
