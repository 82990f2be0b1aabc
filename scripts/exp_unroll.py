"""Test the fori_loop-backedge-overhead hypothesis: fully/partially unroll
the sphere loop and measure.

If each fori iteration costs ~600 cycles of pipeline overhead, UNROLL
8 -> 16 -> 32 -> full should approach the pure-ALU floor (~0.6-0.7 ms).
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.core.vecmath import BIG
from art_tpu.models import build_scene

R = 131072
ITERS = 50
_LANES = 128
_SUB = 64

tables = build_scene("bouncing_spheres", 64, 32).tables
S = tables.n_spheres  # 488

key = jax.random.PRNGKey(0)
o = (jax.random.uniform(key, (R, 3), jnp.float32) - 0.5) * 20
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
tm0 = jax.random.uniform(jax.random.PRNGKey(2), (R,), jnp.float32)
op = (o[:, 0], o[:, 1], o[:, 2])
dp = (d[:, 0], d[:, 1], d[:, 2])


def make_kernel(unroll):
    def kernel(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tm_ref, t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
               *, n_spheres, t_min):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tm = tm_ref[:]
        a = dx * dx + dy * dy + dz * dz
        neg_inv_a = -1.0 / a
        ta2 = -t_min * a

        zeros = jnp.zeros(ox.shape, jnp.float32)
        init = (
            jnp.full(ox.shape, BIG, jnp.float32),
            zeros, zeros, zeros,
            jnp.full(ox.shape, 1.0, jnp.float32),
            zeros,
        )

        def candidate(s):
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            r = sph_ref[s, 6]
            m = sph_ref[s, 7]
            cx = cx + tm * sph_ref[s, 3]
            cy = cy + tm * sph_ref[s, 4]
            cz = cz + tm * sph_ref[s, 5]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            s2 = jnp.where(b + sq < ta2, sq, -sq)
            cand = (b + s2) * neg_inv_a
            ok = (disc > 0.0) & (cand > t_min)
            return cand, cx, cy, cz, r, m, ok

        def update(carry, cand):
            best_t, bcx, bcy, bcz, br, bm = carry
            t, cx, cy, cz, r, m, ok = cand
            better = ok & (t < best_t)
            return (
                jnp.where(better, t, best_t),
                jnp.where(better, cx, bcx),
                jnp.where(better, cy, bcy),
                jnp.where(better, cz, bcz),
                jnp.where(better, r, br),
                jnp.where(better, m, bm),
            )

        n_pad = -(-n_spheres // unroll) * unroll
        if n_pad == unroll:
            carry = init
            for k in range(n_spheres):
                carry = update(carry, candidate(k))
        else:
            def body(i, carry):
                s = i * unroll
                for k in range(unroll):
                    carry = update(carry, candidate(s + k))
                return carry

            carry = jax.lax.fori_loop(0, n_pad // unroll, body, init)

        best_t, bcx, bcy, bcz, br, bm = carry
        inv_r = 1.0 / br
        t_ref[:] = best_t
        nx_ref[:] = (ox + best_t * dx - bcx) * inv_r
        ny_ref[:] = (oy + best_t * dy - bcy) * inv_r
        nz_ref[:] = (oz + best_t * dz - bcz) * inv_r
        mat_ref[:] = bm.astype(jnp.int32)

    return kernel


def make_call(unroll):
    def call(tm):
        rows = R // _LANES
        grid = rows // _SUB
        spec = pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        comps = tuple(x.reshape(rows, _LANES) for x in (*op, *dp, tm))
        f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
        i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
        t, nx, ny, nz, m = pl.pallas_call(
            functools.partial(make_kernel(unroll), n_spheres=S, t_min=1e-3),
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 7,
            out_specs=(spec,) * 5,
            out_shape=(f32, f32, f32, f32, i32),
        )(tables.sph_packed, *comps)
        return (t + nx + m.astype(jnp.float32)).reshape(R)

    return call


def timeit(name, fn):
    def body(i, tm):
        return jnp.clip(fn(tm) * 1e-6, 0.0, 1.0)

    f = jax.jit(lambda tm: jax.lax.fori_loop(0, ITERS, body, tm))
    t0 = time.perf_counter()
    jax.block_until_ready(f(tm0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(f(tm0))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:18s} {dt*1e3:7.3f} ms/iter (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    for u in (8, 16, 32, 488):
        timeit(f"unroll={u}", make_call(u))
