"""Microbenchmark the wavefront loop-body pieces at production shapes."""

import time

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.vecmath import T_MIN
from art_tpu.models import build_scene
from art_tpu.ops.intersect import apply_media, closest_surface
from art_tpu.ops.shade import shade

R = 17189
P = 80000

scene = build_scene("bouncing_spheres", 400, 200)
tables = scene.tables
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (R, 3)) * 20 - 10
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
tm = jax.random.uniform(jax.random.PRNGKey(2), (R,))
pix = jax.random.randint(jax.random.PRNGKey(3), (R,), 0, P)
fb = jnp.zeros((P, 3))
rad = jax.random.uniform(jax.random.PRNGKey(4), (R, 3))
active = jax.random.uniform(jax.random.PRNGKey(5), (R,)) < 0.5
pix_ids = jnp.arange(P, dtype=jnp.int32)


def bench(name, fn, iters=50):
    f = jax.jit(fn)
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.3f} ms")


bench("uniform block (R,10)", lambda: artrng.uniform(key, (R, 10)))
bench("cumsum refill rank", lambda: jnp.cumsum((~active).astype(jnp.int32)))
bench("gather pix_ids[p_row]", lambda: pix_ids[pix % P])
bench("scatter fb.at[pix].add", lambda: fb.at[pix].add(rad))
bench("closest_surface R=17k S=488", lambda: closest_surface(tables, o, d, tm, T_MIN))
rec = jax.jit(lambda: closest_surface(tables, o, d, tm, T_MIN))()
jax.block_until_ready(rec)
U = artrng.uniform(key, (R, 10))
bench("shade", lambda: shade(tables, d, rec, U[:, 0:3], U[:, 3]))


# full body via fori_loop to amortize dispatch
def body100():
    def body(i, carry):
        fbx, radx = carry
        recx = closest_surface(tables, o, d, tm, T_MIN)
        scx = shade(tables, d, recx, U[:, 0:3], U[:, 3])
        fbx = fbx.at[pix].add(jnp.where(recx.hit[:, None], scx.attenuation, radx))
        return fbx, scx.direction
    return jax.lax.fori_loop(0, 20, body, (fb, rad))


t0 = time.perf_counter()
out = jax.jit(body100)()
jax.block_until_ready(out)
print(f"compile+20 iters: {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
out = jax.jit(body100)()
jax.block_until_ready(out)
print(f"20 fused iters: {(time.perf_counter()-t0)*1e3/20:.3f} ms/iter")
