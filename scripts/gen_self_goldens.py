"""Generate committed self-golden statistics for scenes without a reference
golden PNG (cornell_smoke: the reference images/ has no smoke render;
three_spheres: our extra scene).

Writes tests/goldens/<scene>.json with the downsampled 16x8 luminance grid
of a deterministic CPU render.  test_parity.py compares fresh renders
against these within Monte-Carlo tolerance, so regressions in media/
emission/dielectric code turn CI red even without a reference image.
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys

# CPU-only by design: re-exec tunnel-free BEFORE jax import so the axon
# sitecustomize never dials the TPU tunnel (it would disrupt concurrent
# TPU jobs and hang during outages — see CLAUDE.md).
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    _env = dict(os.environ)
    _env.pop("PALLAS_AXON_POOL_IPS")
    _env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, *sys.argv], _env)

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
GRID = (16, 8)

# scene -> (nx, ny, spp, seed)
SELF = {
    "cornell_smoke": (96, 96, 96, 3),
    "three_spheres": (96, 54, 48, 3),
}


def down(img):
    return np.asarray(
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
            GRID, Image.BILINEAR),
        np.float32,
    ) / 255.0


os.makedirs(OUT_DIR, exist_ok=True)
for name, (nx, ny, spp, seed) in SELF.items():
    if len(sys.argv) > 1 and name not in sys.argv[1:]:
        continue
    scene = build_scene(name, nx, ny)
    fb, _ = render_scene(scene, RenderConfig(nx=nx, ny=ny, spp=spp, seed=seed))
    g = down(np.clip(fb[::-1], 0, 1))
    data = {
        "scene": name,
        "nx": nx, "ny": ny, "spp": spp, "seed": seed,
        "grid": [GRID[0], GRID[1]],
        "lum": np.round(g.mean(-1), 5).ravel().tolist(),
        "mean_rgb": np.round(g.mean((0, 1)), 5).tolist(),
    }
    path = os.path.join(OUT_DIR, f"{name}.json")
    with open(path, "w") as f:
        json.dump(data, f)
    print(f"wrote {path} mean={data['mean_rgb']}", flush=True)
