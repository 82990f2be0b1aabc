"""How does the fused bounce body scale with slot count R?"""

import time

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.vecmath import T_MIN
from art_tpu.models import build_scene
from art_tpu.ops.intersect import closest_surface
from art_tpu.ops.shade import shade

scene = build_scene("bouncing_spheres", 400, 200)
tables = scene.tables
P = 80000

for R in (17189, 65536, 131072, 262144):
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (R, 3)) * 20 - 10
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    tm = jax.random.uniform(jax.random.PRNGKey(2), (R,))
    pix = jax.random.randint(jax.random.PRNGKey(3), (R,), 0, P)
    fb = jnp.zeros((P, 3))
    U = artrng.uniform(key, (R, 10))

    def body_loop(fb0, with_scatter):
        def body(i, carry):
            fbx, dacc = carry
            recx = closest_surface(tables, o, dacc, tm, T_MIN)
            scx = shade(tables, dacc, recx, U[:, 0:3], U[:, 3])
            if with_scatter:
                fbx = fbx.at[pix].add(
                    jnp.where(recx.hit[:, None], scx.attenuation, 0.0)
                )
            else:
                fbx = fbx + jnp.sum(scx.attenuation) * 1e-9
            return fbx, scx.direction
        return jax.lax.fori_loop(0, 10, body, (fb0, d))

    for with_scatter in (True, False):
        f = jax.jit(lambda fb0: body_loop(fb0, with_scatter))
        jax.block_until_ready(f(fb))
        t0 = time.perf_counter()
        out = f(fb)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        tag = "with-scatter" if with_scatter else "no-scatter  "
        print(f"R={R:7d} {tag} {dt*1e3:8.3f} ms/iter  {R/dt/1e6:8.1f} Mray-slots/s")
