"""Block-synchronous 2-level BVH sphere kernel experiment.

Spheres are packed in BVH-leaf order into clusters of 8 with precomputed
[t0,t1]-union AABBs; the kernel slab-tests each cluster against the whole
64x128 ray block (bounded by the running per-lane best_t) and skips the
cluster's 8 candidate evaluations with @pl.when when no lane can hit it.

Validated against the production kernel, then timed on a realistic ray mix
(coherent camera-primary blocks + incoherent bounce rays).
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.core.vecmath import BIG
from art_tpu.core.camera import rays_from_uniforms_p
from art_tpu.models import build_scene
from art_tpu.ops import pallas_kernels as pk
from art_tpu.ops.bvh import build_bvh

R = 131072
ITERS = 50
_LANES = 128
_SUB = 64
CLUSTER = 8

scene = build_scene("bouncing_spheres", 1200, 800)
tables = scene.tables
S = tables.n_spheres


# ---- host: BVH-leaf-order clustering ----
def cluster_spheres(tables):
    c0 = np.asarray(tables.sph_center)
    vel = np.asarray(tables.sph_vel)
    r = np.abs(np.asarray(tables.sph_radius))
    # union of t=0 and t=1 boxes (reference sphere bbox, src/sphere.cuh:33-37)
    bmin = np.minimum(c0, c0 + vel) - r[:, None]
    bmax = np.maximum(c0, c0 + vel) + r[:, None]
    tree = build_bvh(bmin, bmax)
    order = tree.prim[tree.prim >= 0]  # preorder leaf sequence
    assert len(order) == S

    from art_tpu.ops.pallas_kernels import _sphere_rows

    packed = _sphere_rows(tables)[order]  # (S,9) reordered, scene order
    S_pad = -(-S // CLUSTER) * CLUSTER
    pad = np.zeros((S_pad - S, 9), np.float32)
    packed = np.concatenate([packed, pad], axis=0)

    n_cl = S_pad // CLUSTER
    cl_min = np.full((n_cl, 3), np.inf, np.float32)
    cl_max = np.full((n_cl, 3), -np.inf, np.float32)
    for c in range(n_cl):
        idxs = order[c * CLUSTER:(c + 1) * CLUSTER]
        if len(idxs) == 0:
            cl_min[c] = 0
            cl_max[c] = 0
            continue
        cl_min[c] = bmin[idxs].min(0)
        cl_max[c] = bmax[idxs].max(0)
    # pack cluster AABB as (n_cl, 8): min(3) max(3) pad pad
    cl = np.zeros((n_cl, 8), np.float32)
    cl[:, 0:3] = cl_min
    cl[:, 3:6] = cl_max
    return jnp.asarray(packed), jnp.asarray(cl), n_cl


sph_cl, cl_box, N_CL = cluster_spheres(tables)
print(f"spheres={S} clusters={N_CL}", file=sys.stderr)


def _safe(x):
    mag = jnp.abs(x)
    sign = jnp.where(x >= 0.0, 1.0, -1.0)
    return jnp.where(mag < 1e-12, sign * 1e-12, x)


def _cluster_kernel(sph_ref, cl_ref, ox_ref, oy_ref, oz_ref,
                    dx_ref, dy_ref, dz_ref, tm_ref,
                    t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                    bt_s, bcx_s, bcy_s, bcz_s, br_s, bm_s,
                    *, n_clusters: int, t_min: float, moving: bool):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    ix = 1.0 / _safe(dx)
    iy = 1.0 / _safe(dy)
    iz = 1.0 / _safe(dz)

    bt_s[:] = jnp.full(ox.shape, BIG, jnp.float32)
    bcx_s[:] = jnp.zeros(ox.shape, jnp.float32)
    bcy_s[:] = jnp.zeros(ox.shape, jnp.float32)
    bcz_s[:] = jnp.zeros(ox.shape, jnp.float32)
    br_s[:] = jnp.ones(ox.shape, jnp.float32)
    bm_s[:] = jnp.zeros(ox.shape, jnp.float32)

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
        t1 = (-b - sq) * inv_a
        t2 = (-b + sq) * inv_a
        cand = jnp.where(t1 > t_min, t1, t2)
        ok = (disc > 0.0) & (cand > t_min)
        return cand, cx, cy, cz, r, m, ok

    def cluster_body(c, _):
        mn_x = cl_ref[c, 0]
        mn_y = cl_ref[c, 1]
        mn_z = cl_ref[c, 2]
        mx_x = cl_ref[c, 3]
        mx_y = cl_ref[c, 4]
        mx_z = cl_ref[c, 5]
        tax = (mn_x - ox) * ix
        tbx = (mx_x - ox) * ix
        tay = (mn_y - oy) * iy
        tby = (mx_y - oy) * iy
        taz = (mn_z - oz) * iz
        tbz = (mx_z - oz) * iz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(tax, tbx), jnp.minimum(tay, tby)),
            jnp.minimum(taz, tbz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(tax, tbx), jnp.maximum(tay, tby)),
            jnp.maximum(taz, tbz),
        )
        best_now = bt_s[:]
        hit = jnp.maximum(t0, t_min) <= jnp.minimum(t1, best_now)

        @pl.when(jnp.any(hit))
        def _():
            best_t = bt_s[:]
            bcx = bcx_s[:]
            bcy = bcy_s[:]
            bcz = bcz_s[:]
            br = br_s[:]
            bm = bm_s[:]
            for k in range(CLUSTER):
                t, cx, cy, cz, r, m, ok = candidate(c * CLUSTER + k)
                better = ok & (t < best_t)
                best_t = jnp.where(better, t, best_t)
                bcx = jnp.where(better, cx, bcx)
                bcy = jnp.where(better, cy, bcy)
                bcz = jnp.where(better, cz, bcz)
                br = jnp.where(better, r, br)
                bm = jnp.where(better, m, bm)
            bt_s[:] = best_t
            bcx_s[:] = bcx
            bcy_s[:] = bcy
            bcz_s[:] = bcz
            br_s[:] = br
            bm_s[:] = bm

        return 0

    jax.lax.fori_loop(0, n_clusters, cluster_body, 0)

    best_t = bt_s[:]
    inv_r = 1.0 / br_s[:]
    t_ref[:] = best_t
    nx_ref[:] = (ox + best_t * dx - bcx_s[:]) * inv_r
    ny_ref[:] = (oy + best_t * dy - bcy_s[:]) * inv_r
    nz_ref[:] = (oz + best_t * dz - bcz_s[:]) * inv_r
    mat_ref[:] = bm_s[:].astype(jnp.int32)


def call_cluster(op, dp, tm):
    rows = R // _LANES
    grid = rows // _SUB
    spec = pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    comps = tuple(x.reshape(rows, _LANES) for x in (*op, *dp, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    scr = [pltpu.VMEM((_SUB, _LANES), jnp.float32)] * 6
    t, nx, ny, nz, m = pl.pallas_call(
        functools.partial(
            _cluster_kernel, n_clusters=N_CL, t_min=1e-3, moving=True
        ),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [spec] * 7,
        out_specs=(spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
        scratch_shapes=scr,
    )(sph_cl, cl_box, *comps)
    return (t.reshape(R), (nx.reshape(R), ny.reshape(R), nz.reshape(R)),
            m.reshape(R))


def call_brute(op, dp, tm):
    t, n, u, v, m = pk.sphere_hit_attrs_planar(
        tables.sph_packed, op, dp, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=False,
    )
    return t, n, m


# ---- realistic ray mix ----
def realistic_rays(frac_fresh=0.58, seed=0):
    """58% coherent camera primaries (consecutive pixels), 42% bounce rays
    from ground-level origins with upward-hemisphere directions."""
    nx, ny = 1200, 800
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 8)
    # camera rays for a contiguous pixel window per block region
    pix = (jnp.arange(R, dtype=jnp.int32) * 7919) % (nx * ny)
    # make ~58% contiguous: first part consecutive from a random base
    base = 123456
    pixc = (base + jnp.arange(R, dtype=jnp.int32)) % (nx * ny)
    i = (pixc % nx).astype(jnp.float32)
    j = (pixc // nx).astype(jnp.float32)
    s = (i + jax.random.uniform(ks[0], (R,))) / nx
    t = (j + jax.random.uniform(ks[1], (R,))) / ny
    o_cam, d_cam, tm_cam = rays_from_uniforms_p(
        scene.camera, s, t,
        jax.random.uniform(ks[2], (R,)), jax.random.uniform(ks[3], (R,)),
        jax.random.uniform(ks[4], (R,)),
    )
    # bounce rays: origins on the ground plane region, random directions
    obx = (jax.random.uniform(ks[5], (R,)) - 0.5) * 24
    obz = (jax.random.uniform(ks[6], (R,)) - 0.5) * 24
    oby = jnp.full((R,), 0.2, jnp.float32)
    db = jax.random.normal(ks[7], (R, 3))
    fresh = (jax.random.uniform(jax.random.PRNGKey(99), (R,)) < frac_fresh)
    o = tuple(jnp.where(fresh, o_cam[c], (obx, oby, obz)[c]) for c in range(3))
    d = tuple(jnp.where(fresh, d_cam[c], db[:, c]) for c in range(3))
    tm = jnp.where(fresh, tm_cam, jax.random.uniform(jax.random.PRNGKey(7), (R,)))
    return o, d, tm


def timeit(name, fn, o, d, tm):
    def body(i, tm):
        t, n, m = fn(o, d, tm)
        return jnp.clip((t + n[0] + m.astype(jnp.float32)) * 1e-6, 0.0, 1.0)

    f = jax.jit(lambda tm: jax.lax.fori_loop(0, ITERS, body, tm))
    jax.block_until_ready(f(tm))
    t0 = time.perf_counter()
    jax.block_until_ready(f(tm))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    # --- correctness vs brute on mixed rays ---
    o, d, tm = realistic_rays()
    t_c, n_c, m_c = jax.jit(call_cluster)(o, d, tm)
    t_b, n_b, m_b = jax.jit(call_brute)(o, d, tm)
    hit = np.asarray(t_b) < BIG * 0.5
    tc = np.asarray(t_c)[hit]
    tb = np.asarray(t_b)[hit]
    ok = np.isclose(tc, tb, rtol=1e-4, atol=1e-4)
    print(f"correctness: hit={hit.mean():.3f} agree={ok.mean():.6f}", flush=True)
    assert ok.mean() > 0.9999, "cluster kernel diverges from brute force"

    # --- speed on mixes ---
    timeit("brute (mixed rays)", call_brute, o, d, tm)
    timeit("cluster (mixed rays)", call_cluster, o, d, tm)
    o2, d2, tm2 = realistic_rays(frac_fresh=1.0, seed=1)
    timeit("brute (all primary)", call_brute, o2, d2, tm2)
    timeit("cluster (all primary)", call_cluster, o2, d2, tm2)
    o3, d3, tm3 = realistic_rays(frac_fresh=0.0, seed=2)
    timeit("cluster (all bounce)", call_cluster, o3, d3, tm3)
