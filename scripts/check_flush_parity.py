"""TPU image-parity check: ART_TPU_FLUSH variants must agree to bf16 tol.

Renders the same small frame with two flush modes (passed as argv) in one
process by monkeypatching integrator._FLUSH_ENV, and compares.
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np

from art_tpu.models import build_scene
from art_tpu.render import integrator
from art_tpu.render.renderer import RenderConfig, render_scene

mode_a = sys.argv[1] if len(sys.argv) > 1 else "pallas"
mode_b = sys.argv[2] if len(sys.argv) > 2 else "aos"

scene = build_scene("bouncing_spheres", 640, 400)
cfg = RenderConfig(nx=640, ny=400, spp=32)

from art_tpu.render import renderer

integrator._FLUSH_ENV = mode_a
fa, _ = render_scene(scene, cfg, verbose=True)
# the flush mode is not part of the jit cache key: force a retrace
renderer._wavefront_jit.clear_cache()
integrator._FLUSH_ENV = mode_b
fb, _ = render_scene(scene, cfg, verbose=True)

diff = np.abs(fa - fb)
rel = diff / (np.abs(fb) + 1e-3)
print(
    f"modes {mode_a} vs {mode_b}: max_abs={diff.max():.5f} "
    f"mean_abs={diff.mean():.6f} p99_rel={np.quantile(rel, 0.99):.5f}"
)
assert np.quantile(rel, 0.999) < 0.02 and diff.mean() < 2e-3, "flush mismatch"
print("OK")
