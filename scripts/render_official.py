"""Render scenes at their OFFICIAL reference configs (models/scenes._DEFAULTS,
mirroring /root/reference main.cu) and save PNGs + timing to
docs/renders/full/.

    python scripts/render_official.py [scene ...]

Uses the persistent compile cache; every render records wall-clock and
Mrays/s into docs/renders/full/timings.json (merged across runs).
"""

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
from PIL import Image

from art_tpu.models import build_scene, scene_defaults
from art_tpu.render.renderer import RenderConfig, render_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "renders", "full")


def main():
    names = sys.argv[1:]
    os.makedirs(OUT, exist_ok=True)
    tpath = os.path.join(OUT, "timings.json")
    timings = {}
    if os.path.exists(tpath):
        timings = json.load(open(tpath))
    for name in names:
        cfg_d = scene_defaults(name)
        nx, ny, spp = cfg_d["nx"], cfg_d["ny"], cfg_d["spp"]
        print(f"[{name}] official {nx}x{ny} spp={spp}", flush=True)
        scene = build_scene(name, nx, ny)
        fb, stats = render_scene(scene, RenderConfig(nx=nx, ny=ny, spp=spp), verbose=True)
        img = np.clip(fb[::-1], 0.0, 1.0)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(OUT, f"{name}_official.png")
        )
        timings[name] = {
            "nx": nx, "ny": ny, "spp": spp,
            "seconds": round(stats["seconds"], 2),
            "mrays_per_sec": round(stats["mrays_per_sec"], 2),
        }
        json.dump(timings, open(tpath, "w"), indent=1)
        print(f"[{name}] {stats['seconds']:.1f}s {stats['mrays_per_sec']:.1f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
