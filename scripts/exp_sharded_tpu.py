"""Quantify shard_map overhead on real TPU: official-config render through
render_scene_sharded on a 1-device ('px','spp') mesh vs the unsharded
single-chip path (VERDICT r2 item 8 — "record one official-config sharded
render on the 1-device TPU mesh").

    python scripts/exp_sharded_tpu.py SCENE [NX NY SPP]

Prints both throughputs and the overhead ratio; asserts the images agree
(the sharded path re-partitions pixels, radiance must match statistically).
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

from art_tpu.models import build_scene, scene_defaults
from art_tpu.parallel.sharding import make_mesh, render_scene_sharded
from art_tpu.render.renderer import RenderConfig, render_scene


def main():
    name = sys.argv[1]
    d = scene_defaults(name)
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else d["nx"]
    ny = int(sys.argv[3]) if len(sys.argv) > 3 else d["ny"]
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else d["spp"]
    scene = build_scene(name, nx, ny)
    cfg = RenderConfig(nx=nx, ny=ny, spp=spp)

    # Warm both paths at the TIMED shape: spp=1 warm-up compiles a
    # DIFFERENT program (plan_batches derives spp_chunk/n_slots from
    # spp), so its "warm" run still paid compile/cache-deserialize in
    # the timed numbers — the unsharded controls read 2-4x below the
    # same configs' official timings (VERDICT r3 Weak #2).  Shape-exact
    # warm-up makes the timed pair steady-state.
    mesh = make_mesh((1, 1))
    render_scene_sharded(scene, cfg, mesh)
    render_scene(scene, cfg)

    fb_s, st_s = render_scene_sharded(scene, cfg, mesh)
    fb_u, st_u = render_scene(scene, cfg)
    ratio = st_s["mrays_per_sec"] / st_u["mrays_per_sec"]
    print(
        f"[sharded 1-dev TPU] {name} {nx}x{ny}@{spp}: "
        f"sharded {st_s['mrays_per_sec']:.2f} Mrays/s ({st_s['seconds']:.2f}s)  "
        f"unsharded {st_u['mrays_per_sec']:.2f} Mrays/s ({st_u['seconds']:.2f}s)  "
        f"ratio {ratio:.3f}",
        flush=True,
    )
    ms, mu = np.asarray(fb_s).mean(axis=(0, 1)), np.asarray(fb_u).mean(axis=(0, 1))
    print(f"mean sharded {ms}  unsharded {mu}  max|dmean| {np.abs(ms - mu).max():.4f}",
          flush=True)
    assert np.isfinite(fb_s).all()
    assert np.abs(ms - mu).max() < 0.05, "sharded/unsharded images diverge"


if __name__ == "__main__":
    main()
