"""Bisect the wavefront body cost: fixed fori_loop with stages toggled."""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.camera import rays_from_uniforms
from art_tpu.core.vecmath import T_MIN
from art_tpu.models import build_scene
from art_tpu.ops.intersect import HitRecord, closest_surface
from art_tpu.ops.shade import shade
from art_tpu.render.integrator import background_color

R = 131072
P = 80000
NX, NY = 400, 200
ITERS = 30

scene = build_scene("bouncing_spheres", NX, NY)
tables = scene.tables
cam = scene.camera
key = jax.random.PRNGKey(0)
bg = jnp.zeros(3, jnp.float32)


def make_loop(use_uniform, use_refill, use_intersect, use_shade, use_scatter):
    def run(o0, d0, tm0, fb0, pix0):
        def body(i, carry):
            o, d, tm, fb, pix, thr, rad, act = carry
            if use_uniform:
                U = artrng.uniform(artrng.fold(key, i), (R, 10))
            else:
                U = jnp.full((R, 10), 0.5, jnp.float32)

            if use_refill:
                dead = ~act
                di = dead.astype(jnp.int32)
                rank = jnp.cumsum(di) - di
                q = jnp.int32(0) + rank
                take = dead & (q < P * 64)
                p_row = q % P
                pixel = jnp.minimum(p_row, P - 1)
                ii = (pixel % NX).astype(jnp.float32)
                jj = (pixel // NX).astype(jnp.float32)
                s = (ii + U[:, 4]) / NX
                t = (jj + U[:, 5]) / NY
                o_new, d_new, tm_new = rays_from_uniforms(cam, s, t, U[:, 6:8], U[:, 8])
                t3 = take[:, None]
                o = jnp.where(t3, o_new, o)
                d = jnp.where(t3, d_new, d)
                tm = jnp.where(take, tm_new, tm)
                pix = jnp.where(take, p_row, pix)
                act = act | take

            if use_intersect:
                rec = closest_surface(tables, o, d, tm, T_MIN)
            else:
                rec = HitRecord(
                    hit=act, t=jnp.ones((R,)), p=o, normal=d,
                    u=jnp.zeros((R,)), v=jnp.zeros((R,)),
                    mat=jnp.zeros((R,), jnp.int32),
                )

            if use_shade:
                sc = shade(tables, d, rec, U[:, 0:3], U[:, 3])
                bgc = background_color(d, bg, False)
                miss = act & ~rec.hit
                rad = rad + jnp.where(miss[:, None], thr * bgc, 0.0)
                live = act & rec.hit
                rad = rad + jnp.where(live[:, None], thr * sc.emitted, 0.0)
                surv = live & sc.scattered
                thr = jnp.where(surv[:, None], thr * sc.attenuation, thr)
                o = jnp.where(surv[:, None], rec.p, o)
                d = jnp.where(surv[:, None], sc.direction, d)
                act = surv
            else:
                act = act & (rec.t < 1e29)

            if use_scatter:
                died = ~act
                fb = fb.at[pix].add(jnp.where(died[:, None], rad, 0.0))

            return o, d, tm, fb, pix, thr, rad, act

        init = (
            o0, d0, tm0, fb0, pix0,
            jnp.ones((R, 3)), jnp.zeros((R, 3)),
            jnp.zeros((R,), bool),
        )
        out = jax.lax.fori_loop(0, ITERS, body, init)
        return out[3], out[0]

    return jax.jit(run)


o0 = jax.random.uniform(key, (R, 3)) * 20 - 10
d0 = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
tm0 = jax.random.uniform(jax.random.PRNGKey(2), (R,))
fb0 = jnp.zeros((P, 3))
pix0 = jnp.zeros((R,), jnp.int32)

variants = [
    ("full", (1, 1, 1, 1, 1)),
    ("no-scatter", (1, 1, 1, 1, 0)),
    ("no-shade", (1, 1, 1, 0, 1)),
    ("no-intersect", (1, 1, 0, 1, 1)),
    ("no-refill", (1, 0, 1, 1, 1)),
    ("no-uniform", (0, 1, 1, 1, 1)),
    ("intersect-only", (0, 0, 1, 0, 0)),
]
name = sys.argv[1] if len(sys.argv) > 1 else None
for vname, flags in variants:
    if name and vname != name:
        continue
    f = make_loop(*flags)
    jax.block_until_ready(f(o0, d0, tm0, fb0, pix0))
    t0 = time.perf_counter()
    out = f(o0, d0, tm0, fb0, pix0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{vname:16s} {dt*1e3:8.3f} ms/iter", flush=True)
