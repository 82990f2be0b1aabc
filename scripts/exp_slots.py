"""Experiment: wavefront pool size sweep on the bench scene (real TPU).

Measures steady-state Mrays/s of render_scene at 1200x800 for several
tpu_slots values.  Bigger pools amortize per-iteration fixed costs (scatter
target, fusion launch overheads) against linear VPU work.
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene

NX, NY = 1200, 800
SPP = 50

scene = build_scene("bouncing_spheres", NX, NY)

for slots_pow in (17, 18, 19):
    cfg = RenderConfig(nx=NX, ny=NY, spp=SPP, tpu_slots=1 << slots_pow)
    t0 = time.perf_counter()
    _, stats = render_scene(scene, cfg)  # compile + run
    compile_run = time.perf_counter() - t0
    _, stats = render_scene(scene, cfg)  # steady state
    print(
        f"slots=2^{slots_pow} mrays={stats['mrays_per_sec']:.2f} "
        f"occ={stats['occupancy']:.3f} iters={stats['iterations']} "
        f"secs={stats['seconds']:.2f} (first={compile_run:.1f}s)",
        flush=True,
    )
