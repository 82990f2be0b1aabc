"""Per-op timing at R=131072 to find the 27ms/iter gap."""

import time

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.vecmath import T_MIN
from art_tpu.models import build_scene
from art_tpu.ops.intersect import closest_surface, sphere_attributes
from art_tpu.ops.shade import shade
from art_tpu.ops.texture_eval import eval_texture

R = 131072
P = 80000

scene = build_scene("bouncing_spheres", 400, 200)
tables = scene.tables
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (R, 3)) * 20 - 10
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
tm = jax.random.uniform(jax.random.PRNGKey(2), (R,))
pix = jax.random.randint(jax.random.PRNGKey(3), (R,), 0, P)
idx = jax.random.randint(jax.random.PRNGKey(6), (R,), 0, tables.n_spheres)
fb = jnp.zeros((P, 3))
rad = jax.random.uniform(jax.random.PRNGKey(4), (R, 3))
active = jax.random.uniform(jax.random.PRNGKey(5), (R,)) < 0.5
U = artrng.uniform(key, (R, 10))
tvals = jax.random.uniform(jax.random.PRNGKey(7), (R,)) * 10


def bench(name, fn, iters=30):
    f = jax.jit(fn)
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.3f} ms", flush=True)


bench("uniform (R,10)", lambda: artrng.uniform(key, (R, 10)))
bench("cumsum (R,)", lambda: jnp.cumsum(active.astype(jnp.int32)))
bench("scatter fb.at[pix].add", lambda: fb.at[pix].add(rad))
bench("gather mat params x4", lambda: (
    tables.mat_type[idx], tables.mat_tex[idx],
    tables.mat_rgb[idx], tables.mat_fuzz[idx],
))
bench("sphere_attributes", lambda: sphere_attributes(tables, o, d, tm, tvals, idx, False))
bench("eval_texture (checker scene)", lambda: eval_texture(
    tables, tables.mat_tex[idx], U[:, 0], U[:, 1], o))
rec = jax.jit(lambda: closest_surface(tables, o, d, tm, T_MIN))()
jax.block_until_ready(rec)
bench("closest_surface (pallas+attrs)", lambda: closest_surface(tables, o, d, tm, T_MIN))
bench("shade full", lambda: shade(tables, d, rec, U[:, 0:3], U[:, 3]))
