"""Component-level microbenchmarks on the current backend.

Times each stage of the wavefront bounce at a fixed ray count to find the
bottleneck: intersection, attribute gathers, shading, RNG, full bounce.
"""

import sys
import time

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.vecmath import T_MIN
from art_tpu.models import build_scene
from art_tpu.ops import intersect, shade
from art_tpu.render.integrator import trace

R = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
SCENE = sys.argv[2] if len(sys.argv) > 2 else "bouncing_spheres"

scene = build_scene(SCENE, 400, 200)
tables = scene.tables
key = jax.random.PRNGKey(0)

o = jax.random.uniform(key, (R, 3), jnp.float32) * 20 - 10
o = o.at[:, 1].set(5.0)
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
tm = jax.random.uniform(jax.random.PRNGKey(2), (R,), jnp.float32)


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:8.2f} ms  {R/dt/1e6:8.1f} Mrays/s")
    return dt


print(f"scene={SCENE} R={R} spheres={tables.n_spheres} quads={tables.n_quads} "
      f"boxes={tables.n_boxes} media={tables.n_media}")

bench("sphere_candidates", lambda: intersect.sphere_candidates(tables, o, d, tm, T_MIN))
bench("closest_surface (full)", lambda: intersect.closest_surface(tables, o, d, tm, T_MIN))

rec = jax.jit(lambda: intersect.closest_surface(tables, o, d, tm, T_MIN))()
jax.block_until_ready(rec)
bench("sphere_attributes only", lambda: intersect.sphere_attributes(tables, o, d, tm, rec.t, rec.mat))
bench("shade", lambda: shade.shade(tables, d, rec, key))
bench("rng ball+choice", lambda: (
    artrng.random_in_unit_ball(artrng.fold(key, 1), R),
    artrng.uniform(artrng.fold(key, 2), (R,)),
))
bench("media", lambda: intersect.apply_media(tables, o, d, T_MIN, rec, key))

bg = jnp.zeros(3, jnp.float32)
for depth in (1, 2, 5):
    bench(f"trace depth={depth}", lambda depth=depth: trace(tables, o, d, tm, key, bg, False, depth), iters=5)
bench("trace depth=50", lambda: trace(tables, o, d, tm, key, bg, False, 50), iters=3)
