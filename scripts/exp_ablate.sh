#!/bin/bash
# Production-loop ablation budget (real TPU), all at spp=100.
# Every python invocation holds /tmp/tpu.lock (CLAUDE.md one-process rule)
# and uses the persistent compile cache.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
run() {
  echo "=== $1 ==="
  flock /tmp/tpu.lock env $2 PYTHONPATH=/root/repo:$PYTHONPATH python -u - <<'PY'
from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene
scene = build_scene("bouncing_spheres", 1200, 800)
cfg = RenderConfig(nx=1200, ny=800, spp=100)
render_scene(scene, cfg)
rates = []
iters = 0
for _ in range(2):
    _, stats = render_scene(scene, cfg)
    rates.append(stats["mrays_per_sec"])
    secs = stats["seconds"]; iters = stats["iterations"]
print(f"rate={max(rates):.2f} Mrays/s t_iter={secs/iters*1e3:.3f} ms iters={iters}", flush=True)
PY
}
run "full" ""
run "no-flush" "ART_TPU_NO_FLUSH=1"
run "fake-intersect" "ART_TPU_DBG=fake_intersect"
run "fake-shade" "ART_TPU_DBG=fake_shade"
run "fake-both" "ART_TPU_DBG=fake_intersect,fake_shade"
