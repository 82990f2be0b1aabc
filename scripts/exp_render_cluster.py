"""End-to-end render throughput: cluster culling on vs off (real TPU)."""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene

SCENES = [("bouncing_spheres", 1200, 800, 100), ("final_scene", 800, 800, 50)]

for name, nx, ny, spp in SCENES:
    scene = build_scene(name, nx, ny)
    cfg = RenderConfig(nx=nx, ny=ny, spp=spp)
    render_scene(scene, cfg)  # compile + warm
    rates = []
    for _ in range(2):
        _, stats = render_scene(scene, cfg)
        rates.append(stats["mrays_per_sec"])
    print(
        f"{name}: {max(rates):.2f} Mrays/s (runs: "
        + ", ".join(f"{r:.2f}" for r in rates)
        + f") occ={stats['occupancy']:.3f}",
        flush=True,
    )
