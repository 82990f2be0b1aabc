"""Microbench sphere-kernel variants in a dependency-preserving fori_loop.

Each variant runs ITERS iterations with the output t feeding back into the
ray time input (prevents DCE, keeps data on-chip). Reports ms/iter.
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
from art_tpu.ops import pallas_kernels as pk

R = 131072
ITERS = 50

tables = build_scene("bouncing_spheres", 64, 32).tables
S = tables.n_spheres
print(f"spheres={S}", file=sys.stderr)

key = jax.random.PRNGKey(0)
o = (jax.random.uniform(key, (R, 3), jnp.float32) - 0.5) * 20
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
tm0 = jax.random.uniform(jax.random.PRNGKey(2), (R,), jnp.float32)
op = (o[:, 0], o[:, 1], o[:, 2])
dp = (d[:, 0], d[:, 1], d[:, 2])


def run_loop(fn):
    def body(i, tm):
        out = fn(tm)
        # fold output back in: keeps the chain alive, stays in [0,1)-ish
        return jnp.clip(out * 1e-6, 0.0, 1.0)

    return jax.jit(lambda tm: jax.lax.fori_loop(0, ITERS, body, tm))


def timeit(name, fn):
    f = run_loop(fn)
    jax.block_until_ready(f(tm0))
    t0 = time.perf_counter()
    jax.block_until_ready(f(tm0))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:7.3f} ms/iter", flush=True)


# ---- v0: current production kernel (attrs in-kernel) ----
def v0(tm):
    t, n, u, v, m = pk.sphere_hit_attrs_planar(
        tables.sph_packed, op, dp, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=False,
    )
    return t + n[0] + m.astype(jnp.float32)


# ---- v1: trimmed candidate math, same attr carry ----
_LANES = 128
_SUB = 64


def _kernel_v1(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tm_ref, t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
               *, n_spheres, t_min, moving):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    a = dx * dx + dy * dy + dz * dz
    neg_inv_a = -1.0 / a
    ta2 = -t_min * a  # t1 > t_min  <=>  (b + sq) < ta2

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
        if moving:
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
        w = b + sq
        s2 = jnp.where(w < ta2, sq, -sq)  # pick t1 if t1 > t_min else t2
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

    UNROLL = 8
    def body(i, carry):
        s = i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate(s + k))
        return carry

    nu = (n_spheres + UNROLL - 1) // UNROLL
    best_t, bcx, bcy, bcz, br, bm = jax.lax.fori_loop(0, nu, body, init)

    inv_r = 1.0 / br
    t_ref[:] = best_t
    nx_ref[:] = (ox + best_t * dx - bcx) * inv_r
    ny_ref[:] = (oy + best_t * dy - bcy) * inv_r
    nz_ref[:] = (oz + best_t * dz - bcz) * inv_r
    mat_ref[:] = bm.astype(jnp.int32)


def call_v1(tm):
    rows = R // _LANES
    grid = rows // _SUB
    spec = pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    comps = tuple(x.reshape(rows, _LANES) for x in (*op, *dp, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, m = pl.pallas_call(
        functools.partial(_kernel_v1, n_spheres=S, t_min=1e-3, moving=True),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 7,
        out_specs=(spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
    )(tables.sph_packed, *comps)
    return (t + nx + m.astype(jnp.float32)).reshape(R)


# ---- v2: t-only keypack (floor: no attribute carry at all) ----
def _kernel_v2(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tm_ref, t_ref, idx_ref, *, n_spheres, t_min, moving):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    a = dx * dx + dy * dy + dz * dz
    neg_inv_a = -1.0 / a
    ta2 = -t_min * a

    MAXKEY = jnp.int32(0x7F7FFFFF)
    init = (
        jnp.full(ox.shape, BIG, jnp.float32),
        jnp.full(ox.shape, MAXKEY, jnp.int32),
    )

    def candidate(s):
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        r = sph_ref[s, 6]
        if moving:
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
        w = b + sq
        s2 = jnp.where(w < ta2, sq, -sq)
        cand = (b + s2) * neg_inv_a
        ok = (disc > 0.0) & (cand > t_min)
        bits = pltpu.bitcast(cand, jnp.int32)
        key = (bits & jnp.int32(~0x7FF)) | jnp.int32(s)
        key = jnp.where(ok, key, MAXKEY)
        tm_ok = jnp.where(ok, cand, BIG)
        return tm_ok, key

    def update(carry, cand):
        best_t, best_k = carry
        t, k = cand
        return jnp.minimum(best_t, t), jnp.minimum(best_k, k)

    UNROLL = 8
    def body(i, carry):
        s = i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate(s + k))
        return carry

    nu = (n_spheres + UNROLL - 1) // UNROLL
    best_t, best_k = jax.lax.fori_loop(0, nu, body, init)
    t_ref[:] = best_t
    idx_ref[:] = best_k & jnp.int32(0x7FF)


def call_v2(tm):
    rows = R // _LANES
    grid = rows // _SUB
    spec = pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    comps = tuple(x.reshape(rows, _LANES) for x in (*op, *dp, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, idx = pl.pallas_call(
        functools.partial(_kernel_v2, n_spheres=S, t_min=1e-3, moving=True),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 7,
        out_specs=(spec, spec),
        out_shape=(f32, i32),
    )(tables.sph_packed, *comps)
    return (t + idx.astype(jnp.float32)).reshape(R)


if __name__ == "__main__":
    which = sys.argv[1:] or ["v0", "v1", "v2"]
    for name, fn in (("v0-current", v0), ("v1-trimmed", call_v1), ("v2-keypack-floor", call_v2)):
        if name.split("-")[0] in which:
            timeit(name, fn)
