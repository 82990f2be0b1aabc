"""Profile one scene's production iteration under the ablation stubs.

Short-path scenes (quads ~77, checkered ~136 Mrays/s) are bounded by
per-iteration fixed cost, not intersection work (PERF_NOTES round-2
closing lever 3).  This driver renders a scene once and prints t_iter;
run it under different ablation env vars (one process each — the flags
are read at import):

    for v in "" "ART_TPU_DBG=fake_intersect" "ART_TPU_DBG=fake_shade" \
             "ART_TPU_DBG=fake_intersect,fake_shade" "ART_TPU_NO_FLUSH=1" \
             "ART_TPU_NO_FUSED_REFILL=1" "ART_TPU_NO_KERNEL_RNG=1"; do
      env $v python scripts/exp_shortpath.py quads 1200 600 500
    done
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "quads"
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    ny = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 500
    tag = ",".join(
        f"{k}={os.environ[k]}" for k in sorted(os.environ)
        if k.startswith("ART_TPU_")
    ) or "full"
    scene = build_scene(name, nx, ny)
    cfg = RenderConfig(nx=nx, ny=ny, spp=spp)
    render_scene(scene, cfg)  # compile + warm
    _, st = render_scene(scene, cfg)
    t_iter = st["seconds"] / max(st["iterations"], 1) * 1e3
    print(
        f"[{tag:44s}] {name}: {st['mrays_per_sec']:7.2f} Mrays/s  "
        f"t_iter {t_iter:.3f} ms  iters {st['iterations']}  occ {st.get('occupancy', -1):.3f}"
    )


if __name__ == "__main__":
    main()
