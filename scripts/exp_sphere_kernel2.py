"""Round 2 of sphere-kernel microbenches: isolate the bottleneck.

v3  minimal per-sphere work (load 1 scalar, 2 vops) -> loop/scalar floor
v4  keypack + tree-min over the unroll group (break serial min chain)
v5  keypack, UNROLL=16 tree
v6  v2 keypack but moving=False (cost of the 3 center FMAs)
v7  keypack + no sqrt (disc-only pseudo metric) -> sqrt cost
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
S = tables.n_spheres

key = jax.random.PRNGKey(0)
o = (jax.random.uniform(key, (R, 3), jnp.float32) - 0.5) * 20
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
tm0 = jax.random.uniform(jax.random.PRNGKey(2), (R,), jnp.float32)
op = (o[:, 0], o[:, 1], o[:, 2])
dp = (d[:, 0], d[:, 1], d[:, 2])


def run_loop(fn):
    def body(i, tm):
        out = fn(tm)
        return jnp.clip(out * 1e-6, 0.0, 1.0)

    return jax.jit(lambda tm: jax.lax.fori_loop(0, ITERS, body, tm))


def timeit(name, fn):
    f = run_loop(fn)
    jax.block_until_ready(f(tm0))
    t0 = time.perf_counter()
    jax.block_until_ready(f(tm0))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:7.3f} ms/iter", flush=True)


def make_call(kernel, n_out_i32=1, n_out_f32=1, **kw):
    def call(tm):
        rows = R // _LANES
        grid = rows // _SUB
        spec = pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        comps = tuple(x.reshape(rows, _LANES) for x in (*op, *dp, tm))
        f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
        i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
        outs = (f32,) * n_out_f32 + (i32,) * n_out_i32
        res = pl.pallas_call(
            functools.partial(kernel, **kw),
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 7,
            out_specs=(spec,) * len(outs),
            out_shape=outs,
        )(tables.sph_packed, *comps)
        acc = res[0]
        for r in res[1:]:
            acc = acc + r.astype(jnp.float32)
        return acc.reshape(R)

    return call


# ---- v3: minimal work per sphere ----
def _kernel_v3(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tm_ref, t_ref, *, n_spheres):
    ox = ox_ref[:]
    best = jnp.full(ox.shape, BIG, jnp.float32)

    UNROLL = 8
    def body(i, best):
        s = i * UNROLL
        for k in range(UNROLL):
            cx = sph_ref[s + k, 0]
            best = jnp.minimum(best, jnp.abs(ox - cx))
        return best

    nu = (n_spheres + UNROLL - 1) // UNROLL
    t_ref[:] = jax.lax.fori_loop(0, nu, body, best)


# ---- shared candidate for keypack variants ----
def _cand(sph_ref, s, ox, oy, oz, dx, dy, dz, tm, a, neg_inv_a, ta2, t_min,
          moving=True, do_sqrt=True):
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
    if do_sqrt:
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    else:
        sq = jnp.maximum(disc, 0.0)  # pseudo (wrong math, same op count sans sqrt)
    w = b + sq
    s2 = jnp.where(w < ta2, sq, -sq)
    cand = (b + s2) * neg_inv_a
    ok = (disc > 0.0) & (cand > t_min)
    bits = pltpu.bitcast(cand, jnp.int32)
    key = (bits & jnp.int32(~0x7FF)) | jnp.int32(s)
    key = jnp.where(ok, key, jnp.int32(0x7F7FFFFF))
    t = jnp.where(ok, cand, BIG)
    return t, key


def _make_keypack_kernel(unroll, tree, moving=True, do_sqrt=True):
    def kernel(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tm_ref, t_ref, idx_ref, *, n_spheres, t_min):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tm = tm_ref[:]
        a = dx * dx + dy * dy + dz * dz
        neg_inv_a = -1.0 / a
        ta2 = -t_min * a

        init = (
            jnp.full(ox.shape, BIG, jnp.float32),
            jnp.full(ox.shape, 0x7F7FFFFF, jnp.int32),
        )

        def body(i, carry):
            s = i * unroll
            cands = [
                _cand(sph_ref, s + k, ox, oy, oz, dx, dy, dz, tm, a,
                      neg_inv_a, ta2, t_min, moving=moving, do_sqrt=do_sqrt)
                for k in range(unroll)
            ]
            if tree:
                while len(cands) > 1:
                    nxt = []
                    for j in range(0, len(cands), 2):
                        (t1, k1), (t2, k2) = cands[j], cands[j + 1]
                        nxt.append((jnp.minimum(t1, t2), jnp.minimum(k1, k2)))
                    cands = nxt
                t, k = cands[0]
                return jnp.minimum(carry[0], t), jnp.minimum(carry[1], k)
            else:
                bt, bk = carry
                for t, k in cands:
                    bt = jnp.minimum(bt, t)
                    bk = jnp.minimum(bk, k)
                return bt, bk

        nu = (n_spheres + unroll - 1) // unroll
        best_t, best_k = jax.lax.fori_loop(0, nu, body, init)
        t_ref[:] = best_t
        idx_ref[:] = best_k & jnp.int32(0x7FF)

    return kernel


if __name__ == "__main__":
    timeit("v3-minimal", make_call(_kernel_v3, n_out_i32=0, n_out_f32=1, n_spheres=S))
    timeit("v2-keypack-seq", make_call(
        _make_keypack_kernel(8, tree=False), n_spheres=S, t_min=1e-3))
    timeit("v4-keypack-tree8", make_call(
        _make_keypack_kernel(8, tree=True), n_spheres=S, t_min=1e-3))
    timeit("v5-keypack-tree16", make_call(
        _make_keypack_kernel(16, tree=True), n_spheres=S, t_min=1e-3))
    timeit("v6-static-tree8", make_call(
        _make_keypack_kernel(8, tree=True, moving=False), n_spheres=S, t_min=1e-3))
    timeit("v7-nosqrt-tree8", make_call(
        _make_keypack_kernel(8, tree=True, do_sqrt=False), n_spheres=S, t_min=1e-3))
