"""Statistical parity vs the reference golden renders (SURVEY.md §4).

The reference's de-facto regression suite is its 18 golden PNGs.  These
tests render cheap deterministic scenes on CPU and require the downsampled
image statistics to match the goldens — the quantitative version of the
reference's compare-by-eye workflow.

Measured parity on TPU at higher spp (scripts/parity_report.py):
checkered 1.000 / perlin 0.999 / quads 1.000 / cornell 0.991 /
simple_light 0.999 / final 0.998 / original 0.999 luminance correlation;
bouncing_spheres is distributional only (curand scene layout differs).
"""

import numpy as np
import pytest
from PIL import Image

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene

GOLDEN_DIR = "/root/reference/images"
GRID = (16, 8)


def _compare(name, golden_file, nx, spp, seed=3):
    gold = np.asarray(
        Image.open(f"{GOLDEN_DIR}/{golden_file}").convert("RGB"), np.float32
    ) / 255.0
    gh, gw = gold.shape[:2]
    ny = max(8, int(round(nx * gh / gw)))
    scene = build_scene(name, nx, ny)
    fb, _ = render_scene(scene, RenderConfig(nx=nx, ny=ny, spp=spp, seed=seed))
    ours = np.clip(fb[::-1], 0.0, 1.0)

    def down(img):
        return np.asarray(
            Image.fromarray((img * 255).astype(np.uint8)).resize(GRID, Image.BILINEAR),
            np.float32,
        ) / 255.0

    a, b = down(ours), down(gold)
    corr = float(np.corrcoef(a.mean(-1).ravel(), b.mean(-1).ravel())[0, 1])
    mean_diff = float(np.abs(a.mean((0, 1)) - b.mean((0, 1))).max())
    return corr, mean_diff


@pytest.mark.parametrize(
    "scene,golden,nx,spp",
    [
        ("quads", "quads.png", 96, 24),
        ("checkered_spheres", "checkered.png", 96, 24),
    ],
)
def test_golden_statistics(scene, golden, nx, spp):
    corr, mean_diff = _compare(scene, golden, nx, spp)
    assert corr > 0.95, f"{scene}: luminance correlation {corr:.3f}"
    assert mean_diff < 0.06, f"{scene}: per-channel mean diff {mean_diff:.3f}"
