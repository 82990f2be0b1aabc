"""Production-wavefront ablation timing.

Runs the REAL render path (render_scene) twice (warm-up compile + measured)
and prints rate / t_iter.  Ablation is controlled by env vars read at
import time, so run ONE VARIANT PER PROCESS:

    python scripts/profile_wavefront.py [scene] [spp]
    ART_TPU_NO_FLUSH=1 python scripts/profile_wavefront.py
    ART_TPU_DBG=fake_intersect python scripts/profile_wavefront.py
    ART_TPU_DBG=fake_shade python scripts/profile_wavefront.py

The stubs are dependency-preserving (docs/PERF_NOTES.md): each variant's
delta vs the full run charges that stage without letting XLA DCE the rest.
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene

scene_name = sys.argv[1] if len(sys.argv) > 1 else "bouncing_spheres"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 100
nx, ny = 1200, 800

scene = build_scene(scene_name, nx, ny)
tile = int(os.environ.get("ART_PROF_TILE", 1 << 16))
cfg = RenderConfig(nx=nx, ny=ny, spp=spp, max_tile_pixels=tile)
render_scene(scene, cfg, verbose=True)  # compile + warm
fb, stats = render_scene(scene, cfg, verbose=True)
t_iter = stats["seconds"] / max(stats["iterations"], 1) * 1e3
print(
    f"VARIANT dbg={os.environ.get('ART_TPU_DBG', '-')}"
    f" noflush={os.environ.get('ART_TPU_NO_FLUSH', '-')}"
    f" flush={os.environ.get('ART_TPU_FLUSH', 'auto')}"
    f" scene={scene_name} spp={spp}"
    f" rate={stats['mrays_per_sec']:.2f}Mrays/s"
    f" iters={stats['iterations']} t_iter={t_iter:.3f}ms"
    f" occ={stats['occupancy']:.3f}"
)
