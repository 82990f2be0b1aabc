"""Quantify the parity-report brightness deficit (VERDICT r3 Weak #3).

docs/parity_report.json shows bouncing_spheres and final_scene ~12%
darker than their goldens at 128 spp.  Hypothesis (proven for cornell in
round 3): the comparison clamps radiance to [0,1] before averaging, and
a low-spp Monte-Carlo estimate has bright outlier pixels (fireflies)
whose clamping removes energy asymmetrically — the goldens were rendered
at 10000 spp where the estimator variance (hence the clamping loss) is
tiny.  If that is the whole story:

* the UNCLAMPED mean is spp-independent (unbiased estimator) and sits
  at or above the golden mean;
* the CLAMPED mean rises monotonically toward the golden mean as spp
  grows.

    python scripts/exp_parity_bias.py [spp ...]

Prints one row per (scene, spp): clamped mean RGB, unclamped mean RGB,
golden mean RGB, clipped-pixel fraction.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
from PIL import Image

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene

GOLDEN_DIR = "/root/reference/images"
CASES = [("bouncing_spheres", "utk.png"), ("final_scene", "finalScene.png")]
NX = 240


def main():
    spps = [int(a) for a in sys.argv[1:]] or [128, 512, 2048]
    for name, golden_file in CASES:
        gold = np.asarray(
            Image.open(f"{GOLDEN_DIR}/{golden_file}").convert("RGB"),
            np.float32,
        ) / 255.0
        gh, gw = gold.shape[:2]
        ny = max(8, int(round(NX * gh / gw)))
        gmean = gold.mean((0, 1))
        scene = build_scene(name, NX, ny)
        for spp in spps:
            fb, _ = render_scene(
                scene, RenderConfig(nx=NX, ny=ny, spp=spp)
            )
            mc = np.clip(fb, 0.0, 1.0).mean((0, 1))
            mu = fb.mean((0, 1))
            frac = float((fb > 1.0).any(axis=-1).mean())
            print(
                f"[{name} spp={spp:5d}] clamped {mc.round(4)}  "
                f"unclamped {mu.round(4)}  golden {gmean.round(4)}  "
                f"clipped_px {frac:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
