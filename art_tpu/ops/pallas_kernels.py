"""Pallas TPU kernels for the intersection hot path.

The XLA brute-force intersection (ops/intersect.py) materializes (R, N)
candidate arrays in HBM — bandwidth-bound.  These kernels keep the whole
scene table and all per-sphere candidates in VMEM, streaming only the ray
SoA in and the per-ray winner (t, index) out: traffic drops from
O(R*N) to O(R), leaving the VPU as the limit.

Ray components are laid out component-planar as (R/128, 128) f32 so every
vector op runs on full 8x128 VPU tiles; the kernel grid tiles the ray axis.
The sphere loop is a `fori_loop` over the VMEM-resident table (hundreds of
bytes per sphere — the largest reference scene table is ~32 KB).

Used automatically on TPU backends; the jnp path remains the portable
reference implementation (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.core.vecmath import BIG

_LANES = 128
_SUBLANES = 64  # ray-block rows: 64x128 = 8192 rays per program
RAY_BLOCK = _SUBLANES * _LANES
# Sphere-loop unroll factor (pack_spheres pads segments to 32 so both 16
# and 32 are legal).  32 measured +5% over 16 on bouncing_spheres
# (114.1 vs 108.3 Mrays/s, docs/PERF_NOTES.md).
_SPH_UNROLL = int(__import__("os").environ.get("ART_TPU_SPH_UNROLL", "32"))
# Sphere table in SMEM instead of VMEM (opt-in A/B, ART_TPU_SPH_SMEM=1):
# the per-sphere scalar loads are the kernel's co-limiting cost
# (docs/PERF_NOTES.md, expanded-quadratic A/B) and SMEM is the TPU's
# scalar memory — a VMEM scalar read may lower to a vector load + lane
# extract.
_SPH_SMEM = bool(__import__("os").environ.get("ART_TPU_SPH_SMEM"))


def _sphere_kernel(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tm_ref, t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                   *, n_static: int, t_min: float, n_moving: int,
                   expand: bool = False, n_tail: int = 0,
                   tail_r: float = 1.0, tail_mat: float = 0.0,
                   pos_r: bool = False):
    """Closest sphere hit with winner attributes computed in-kernel.

    Carrying the winning sphere's (time-evaluated) center/radius/material
    through the min-update lets the kernel emit the shading normal and
    material id directly — avoiding a slow per-ray HBM gather over the
    sphere table afterwards (reference normal math: src/sphere.cuh:69-86).
    Spherical UV (acos/atan2) is computed by the caller — Mosaic has no
    acos lowering.

    pack_spheres sorts moving spheres to the front (rows [0, n_moving),
    already padded to an UNROLL multiple) followed by n_static real static
    rows plus inert tail padding; the scan runs as two loops so static
    spheres skip the center-motion FMAs entirely (mixed scenes like
    final_scene are 1006/1007 static).

    Two further op/load cuts (both builder-gated, measured for
    final_scene's 1000-ball cluster — docs/PERF_NOTES.md r2):

    * ``pos_r``: when every scene radius is positive the signed radius
      never flips a normal, so the carry drops the per-sphere ``r``
      load + select and the normal is normalized post-loop with one
      rsqrt (the reference normal (p-c)/r is unit up to fp anyway).
    * ``n_tail``: pack_spheres sorts the largest (radius, material)-
      uniform static group to the end of the static segment; those
      rows run in a third loop whose carry is just (t, cx, cy, cz) —
      radius/material are compile-time constants merged in once after
      the loops.  2 fewer scalar loads and 1-2 fewer selects per
      sphere on the dominant segment.
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    a = dx * dx + dy * dy + dz * dz
    neg_inv_a = -1.0 / a
    ta2 = -t_min * a  # t1 > t_min  <=>  (b + sq) < ta2  (a > 0)

    carry_r = not pos_r
    zeros = jnp.zeros(ox.shape, jnp.float32)
    init = (
        (jnp.full(ox.shape, BIG, jnp.float32),)  # t
        + (zeros, zeros, zeros)  # center at ray time
        + ((jnp.full(ox.shape, 1.0, jnp.float32),) if carry_r else ())
        + (zeros,)  # material id (as f32)
    )

    def _roots(b, c):
        """Candidate t from quadratic coefficients (shared by all forms).

        Misses are rejected by NaN propagation: disc < 0 makes sqrt(disc)
        NaN, which flows through to ``cand`` and fails every comparison in
        ``update`` — saving the max(disc, 0) clamp, the strict disc > 0
        compare, and an AND per sphere.  One semantic hair vs the jnp
        reference: an exactly-zero discriminant (true tangent, measure-zero
        under fp) is accepted here and rejected there."""
        disc = b * b - a * c
        sq = jnp.sqrt(disc)  # NaN on miss, by design
        # fused t1/t2 fallback: t = (-b - sign*sq)/a with the near root
        # taken when t1 > t_min, i.e. (b + sq) < -t_min*a
        s2 = jnp.where(b + sq < ta2, sq, -sq)
        return (b + s2) * neg_inv_a

    def candidate(s, moving):
        """Main-carry candidate (t, cx, cy, cz[, r], m) for sphere s."""
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        m = sph_ref[s, 7]
        r2 = sph_ref[s, 8]
        if moving:
            cx = cx + tm * sph_ref[s, 3]
            cy = cy + tm * sph_ref[s, 4]
            cz = cz + tm * sph_ref[s, 5]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
        cand = _roots(b, c)
        if carry_r:
            return cand, cx, cy, cz, sph_ref[s, 6], m
        return cand, cx, cy, cz, m

    if expand:
        # expanded-quadratic static form: b = o.d - c.d,
        # c' = |o|^2 - 2 o.c + K with K = |c|^2 - r^2 precomputed
        # (pack_spheres col 9).  3 fewer VPU ops/sphere than the oc build;
        # the builder's sph_expand gate bounds the cancellation error at
        # (|c|^2+1)*6*2^-23 << r^2 for every static sphere.
        oo = ox * ox + oy * oy + oz * oz
        od = ox * dx + oy * dy + oz * dz
        ox2, oy2, oz2 = 2.0 * ox, 2.0 * oy, 2.0 * oz

        def _expand_bc(cx, cy, cz, K):
            b = od - (cx * dx + cy * dy + cz * dz)  # == oc.d
            c = (oo + K) - (cx * ox2 + cy * oy2 + cz * oz2)  # == |oc|^2-r^2
            return b, c

        def candidate_static(s):
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            m = sph_ref[s, 7]
            b, c = _expand_bc(cx, cy, cz, sph_ref[s, 9])
            cand = _roots(b, c)
            if carry_r:
                return cand, cx, cy, cz, sph_ref[s, 6], m
            return cand, cx, cy, cz, m

        def candidate_tail(s):
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            b, c = _expand_bc(cx, cy, cz, sph_ref[s, 9])
            return _roots(b, c), cx, cy, cz
    else:
        def candidate_static(s):
            return candidate(s, False)

        def candidate_tail(s):
            # r2 stays a per-row load: pad rows reject via r2 = -1
            # (a compile-time r2 would need un-rejectable pad centers)
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            r2 = sph_ref[s, 8]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            return _roots(b, c), cx, cy, cz

    def update(carry, cand):
        # carry/cand: (t, cx, cy, cz[, r][, m]) — parallel layouts
        better = (cand[0] > t_min) & (cand[0] < carry[0])  # false on NaN
        return tuple(jnp.where(better, n, c) for n, c in zip(cand, carry))

    # unrolled to amortize the fori_loop backedge overhead (~1.2 us per
    # iteration measured on v5e — scripts/exp_unroll.py); every table
    # segment is padded to an UNROLL multiple by pack_spheres
    UNROLL = _SPH_UNROLL

    def body_moving(i, carry):
        s = i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate(s + k, True))
        return carry

    def body_static(i, carry):
        s = n_moving + i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate_static(s + k))
        return carry

    # Static split: the main loop covers the first n_static - n_tail real
    # rows rounded UP to UNROLL (the overlap rows are real tail spheres —
    # processing them with the full update is correct, just unsplit); the
    # tail loop covers the rest of the padded static segment.
    n_main_real = n_static - n_tail
    n_main = min(
        -(-n_main_real // UNROLL) * UNROLL if n_main_real else 0,
        -(-n_static // UNROLL) * UNROLL,
    )
    n_tail_rows = -(-n_static // UNROLL) * UNROLL - n_main

    def body_tail(i, carry):
        s = n_moving + n_main + i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate_tail(s + k))
        return carry

    carry = init
    if n_moving:
        carry = jax.lax.fori_loop(0, n_moving // UNROLL, body_moving, carry)
    if n_main:
        carry = jax.lax.fori_loop(0, n_main // UNROLL, body_static, carry)
    if n_tail_rows:
        zt = (jnp.full(ox.shape, BIG, jnp.float32), zeros, zeros, zeros)
        tc = jax.lax.fori_loop(0, n_tail_rows // UNROLL, body_tail, zt)
        t2, cx2, cy2, cz2 = tc
        better = t2 < carry[0]  # both loops honor t_min already
        merged = [
            jnp.where(better, t2, carry[0]),
            jnp.where(better, cx2, carry[1]),
            jnp.where(better, cy2, carry[2]),
            jnp.where(better, cz2, carry[3]),
        ]
        if carry_r:
            merged.append(jnp.where(better, tail_r, carry[4]))
        merged.append(jnp.where(better, tail_mat, carry[-1]))
        carry = tuple(merged)

    best_t, bcx, bcy, bcz = carry[:4]
    bm = carry[-1]

    # winner attributes (src/sphere.cuh:69-86); garbage on miss lanes, which
    # the caller blends out by hit mask
    if not carry_r:
        # miss lanes have best_t = BIG whose |p|^2 overflows f32 inside
        # the rsqrt below; clamp t for the (masked-out) normal only —
        # t_ref still gets the unclamped best_t
        t_n = jnp.minimum(best_t, 1e18)
    else:
        t_n = best_t
    px = ox + t_n * dx - bcx
    py = oy + t_n * dy - bcy
    pz = oz + t_n * dz - bcz
    if carry_r:
        inv_r = 1.0 / carry[4]
    else:
        # all radii positive: (p-c)/r == unit(p-c) up to fp; one rsqrt
        # replaces the per-sphere r carry + select
        inv_r = jax.lax.rsqrt(px * px + py * py + pz * pz)
    t_ref[:] = best_t
    nx_ref[:] = px * inv_r
    ny_ref[:] = py * inv_r
    nz_ref[:] = pz * inv_r
    mat_ref[:] = bm.astype(jnp.int32)


def _ray_grid(R: int):
    assert R % RAY_BLOCK == 0, R
    rows = R // _LANES
    grid = rows // _SUBLANES
    spec = pl.BlockSpec(
        (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return rows, grid, spec


def sphere_hit_attrs_planar(
    sph_packed: jnp.ndarray,  # (S, 10) pack_spheres rows (moving-first)
    o,  # 3-tuple of (R,) planes
    d,  # 3-tuple of (R,) planes
    tm: jnp.ndarray,  # (R,)
    *,
    n_moving: int,  # padded moving-segment size (pack_spheres)
    n_static: int,  # real static count (pack_spheres)
    needs_uv: bool,
    expand: bool = False,  # expanded-quadratic static loop (builder-gated)
    n_tail: int = 0,  # uniform (r, mat) static tail count (pack_spheres)
    tail_r: float = 1.0,
    tail_mat: float = 0.0,
    pos_r: bool = False,  # every scene radius positive (builder-gated)
    interpret: bool = False,
):
    """Per-ray closest sphere hit with attributes:
    returns (t, normal 3-tuple, u, v, mat), each (R,).

    R must be a multiple of RAY_BLOCK (8192)."""
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, mat = pl.pallas_call(
        functools.partial(
            _sphere_kernel, n_static=n_static, t_min=1e-3, n_moving=n_moving,
            expand=expand, n_tail=n_tail, tail_r=tail_r, tail_mat=tail_mat,
            pos_r=pos_r,
        ),
        grid=(grid,),
        in_specs=[_sph_table_spec()] + [ray_spec] * 7,
        out_specs=(ray_spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
        interpret=interpret,
    )(sph_packed, *comps)
    return _sphere_uv_epilogue(t, nx, ny, nz, mat, R, needs_uv)


def _sph_table_spec():
    return pl.BlockSpec(
        memory_space=pltpu.SMEM if _SPH_SMEM else pltpu.VMEM
    )


def _sphere_uv_epilogue(t, nx, ny, nz, mat, R, needs_uv):
    normal = (nx.reshape(R), ny.reshape(R), nz.reshape(R))
    if needs_uv:
        # spherical uv from the (signed) normal (src/sphere.cuh:42-49);
        # acos/atan2 have no Mosaic lowering, so this stays outside.
        theta = jnp.arccos(jnp.clip(-normal[1], -1.0, 1.0))
        phi = jnp.arctan2(-normal[2], normal[0]) + jnp.pi
        u = phi * (0.5 / jnp.pi)
        v = theta * (1.0 / jnp.pi)
    else:
        u = v = jnp.zeros((R,), jnp.float32)
    return t.reshape(R), normal, u, v, mat.reshape(R)


def static_sphere_cells(
    sph_packed, n_moving_pad: int, n_static: int, n_tail: int
) -> tuple:
    """Compile-time constant rows for _sphere_static_kernel.

    Returns (moving, main, tail) in packed order: ``moving`` rows are
    (cx0, cy0, cz0, vx, vy, vz, r, mat, r2) — the real (unpadded) moving
    spheres; ``main`` rows are (cx, cy, cz, r, mat, r2, K) covering the
    first n_static - n_tail real static rows; ``tail`` rows are
    (cx, cy, cz, r2, K) for the (radius, material)-uniform group
    pack_spheres sorted to the segment end.  Values are taken verbatim
    from the packed table so the static kernel's candidate math sees
    bit-identical constants."""
    import numpy as np

    p = np.asarray(sph_packed)
    # real moving rows: pad rows have r2 == -1
    mov = p[:n_moving_pad]
    mov = mov[mov[:, 8] > 0.0]
    moving = tuple(
        (float(r[0]), float(r[1]), float(r[2]), float(r[3]), float(r[4]),
         float(r[5]), float(r[6]), float(r[7]), float(r[8]))
        for r in mov
    )
    stat = p[n_moving_pad : n_moving_pad + n_static]
    n_main = n_static - n_tail
    main = tuple(
        (float(r[0]), float(r[1]), float(r[2]), float(r[6]), float(r[7]),
         float(r[8]), float(r[9]))
        for r in stat[:n_main]
    )
    tail = tuple(
        (float(r[0]), float(r[1]), float(r[2]), float(r[8]), float(r[9]))
        for r in stat[n_main:]
    )
    return moving, main, tail


def _sphere_static_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                          tm_ref, t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                          *, moving: tuple, main: tuple, tail: tuple,
                          tail_r: float, tail_mat: float, pos_r: bool,
                          expand: bool, t_min: float):
    """Fully-static sphere loop: every sphere's (center, velocity,
    radius, material, K) is a compile-time constant baked into the
    unrolled instruction stream (builder: tables.sph_static_cells) —
    zero table loads and no padding rows (the looped kernel pads each
    segment to the 32x unroll).  Moving centers evaluate as
    c0 + tm * v with immediate operands (bouncing_spheres is 409
    moving / 79 static — the moving segment dominates the headline
    scene's loads).

    Candidate math is case-equal to _sphere_kernel — same NaN-reject
    roots, same expanded/standard quadratic forms, same carry layouts and
    tail-merge rule — so hit sets match (t can wobble by ulps: separate
    programs fuse mul+add differently).

    ``moving`` rows are (cx0, cy0, cz0, vx, vy, vz, r, mat, r2);
    ``main`` rows are (cx, cy, cz, r, mat, r2, K); ``tail`` rows are
    (cx, cy, cz, r2, K) shared-attribute rows merged once post-loop."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    a = dx * dx + dy * dy + dz * dz
    neg_inv_a = -1.0 / a
    ta2 = -t_min * a

    def _roots(b, c):
        # NaN-reject form (see _sphere_kernel._roots)
        disc = b * b - a * c
        sq = jnp.sqrt(disc)
        s2 = jnp.where(b + sq < ta2, sq, -sq)
        return (b + s2) * neg_inv_a

    def update(carry, cand):
        better = (cand[0] > t_min) & (cand[0] < carry[0])  # false on NaN
        return tuple(jnp.where(better, n, c) for n, c in zip(cand, carry))

    carry_r = not pos_r
    zeros = jnp.zeros(ox.shape, jnp.float32)
    carry = (
        (jnp.full(ox.shape, BIG, jnp.float32),)  # t
        + (zeros, zeros, zeros)  # center (at ray time for moving)
        + ((jnp.full(ox.shape, 1.0, jnp.float32),) if carry_r else ())
        + (zeros,)  # material id (as f32)
    )

    if expand:
        # expanded-quadratic static form; K = |c|^2 - r^2 is free here
        # (compile-time), unlike the looped kernel's per-sphere K load
        oo = ox * ox + oy * oy + oz * oz
        od = ox * dx + oy * dy + oz * dz
        ox2, oy2, oz2 = 2.0 * ox, 2.0 * oy, 2.0 * oz

        def bc(cx, cy, cz, r2, K):
            b = od - (cx * dx + cy * dy + cz * dz)  # == oc.d
            c = (oo + K) - (cx * ox2 + cy * oy2 + cz * oz2)
            return b, c
    else:
        def bc(cx, cy, cz, r2, K):
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            return b, c

    if moving:
        tm = tm_ref[:]
        for cx0, cy0, cz0, vx, vy, vz, r, m, r2 in moving:
            # zero-velocity components elide their FMA entirely (the
            # reference bouncing scene's movers all have vx == 0:
            # vel = (0, 0.5*rnd, 0.25*(rnd-0.5)), models/scenes.py) —
            # exactly equal to the looped kernel's c0 + tm*0.0
            cx = cx0 if vx == 0.0 else cx0 + tm * vx
            cy = cy0 if vy == 0.0 else cy0 + tm * vy
            cz = cz0 if vz == 0.0 else cz0 + tm * vz
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            cand = _roots(b, c)
            carry = update(
                carry,
                (cand, cx, cy, cz) + ((r,) if carry_r else ()) + (m,),
            )

    for cx, cy, cz, r, m, r2, K in main:
        cand = _roots(*bc(cx, cy, cz, r2, K))
        carry = update(
            carry,
            (cand, cx, cy, cz) + ((r,) if carry_r else ()) + (m,),
        )

    if tail:
        tc = (jnp.full(ox.shape, BIG, jnp.float32), zeros, zeros, zeros)
        for cx, cy, cz, r2, K in tail:
            tc = update(tc, (_roots(*bc(cx, cy, cz, r2, K)), cx, cy, cz))
        t2, cx2, cy2, cz2 = tc
        better = t2 < carry[0]  # both accumulations honor t_min already
        merged = [
            jnp.where(better, t2, carry[0]),
            jnp.where(better, cx2, carry[1]),
            jnp.where(better, cy2, carry[2]),
            jnp.where(better, cz2, carry[3]),
        ]
        if carry_r:
            merged.append(jnp.where(better, tail_r, carry[4]))
        merged.append(jnp.where(better, tail_mat, carry[-1]))
        carry = tuple(merged)

    best_t, bcx, bcy, bcz = carry[:4]
    bm = carry[-1]

    # winner attributes — identical epilogue to _sphere_kernel
    if not carry_r:
        t_n = jnp.minimum(best_t, 1e18)
    else:
        t_n = best_t
    px = ox + t_n * dx - bcx
    py = oy + t_n * dy - bcy
    pz = oz + t_n * dz - bcz
    if carry_r:
        inv_r = 1.0 / carry[4]
    else:
        inv_r = jax.lax.rsqrt(px * px + py * py + pz * pz)
    t_ref[:] = best_t
    nx_ref[:] = px * inv_r
    ny_ref[:] = py * inv_r
    nz_ref[:] = pz * inv_r
    mat_ref[:] = bm.astype(jnp.int32)


def sphere_static_hit_attrs(
    o,  # 3-tuple of (R,) planes
    d,
    tm,
    *,
    cells: tuple,  # tables.sph_static_cells == (moving, main, tail)
    tail_r: float,
    tail_mat: float,
    pos_r: bool,
    expand: bool,
    needs_uv: bool,
    interpret: bool = False,
):
    """sphere_hit_attrs_planar with every sphere baked at compile time
    (same outputs; no table input at all)."""
    moving, main, tail = cells
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, mat = pl.pallas_call(
        functools.partial(
            _sphere_static_kernel, moving=moving, main=main, tail=tail,
            tail_r=tail_r, tail_mat=tail_mat, pos_r=pos_r, expand=expand,
            t_min=1e-3,
        ),
        grid=(grid,),
        in_specs=[ray_spec] * 7,
        out_specs=(ray_spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
        interpret=interpret,
    )(*comps)
    return _sphere_uv_epilogue(t, nx, ny, nz, mat, R, needs_uv)


# ---------------------------------------------------------------------------
# MXU sphere intersection (bilinear-feature matmul formulation)
# ---------------------------------------------------------------------------

_MXU_NL = 512  # rays per matmul column block
_MXU_ROWS = 8  # sublane rows per grid step: 8*512 = 4096 rays


def sphere_mxu_features(sph_packed, n_spheres: int):
    """Precompute the bilinear feature factorization of the sphere quadratic.

    For ray (o, d, tm) and sphere (c0, v, r) with c(tm) = c0 + tm*v, the
    quadratic coefficients b' = oc.d and c' = |oc|^2 - r^2 expand into
    bilinear forms <ray features, sphere features>:

        B[s, r] = c(tm).d      = <[d, tm*d],                 [c0, v]>
        C[s, r] = c' - |o|^2   = <[-2o, -2tm*o, 1, tm, tm^2],
                                  [c0, v, |c0|^2 - r^2, 2 c0.v, |v|^2]>

    so one (2*S_pad, 16) @ (16, NL) MXU matmul per ray block replaces the
    per-sphere scalar loop's dot products (~2/3 of the brute kernel's VPU
    work).  Returns (F (2*S_pad, 16) f32, attrT (8, S_pad) f32, S_pad)
    where attrT is the transposed packed table for the winner-attribute
    one-hot fetch.

    Precision: each dot product term is f32-rounded, so c' carries an
    absolute error of ~|c|^2 * 2^-23 (catastrophic cancellation vs the
    direct |o-c|^2 form).  The winner's t is Newton-refined in-kernel from
    the cancellation-free direct form; the builder additionally gates this
    path to scenes whose coordinate scale keeps the *candidate selection*
    error below t_min (SceneTables.mxu_spheres_ok).
    """
    import numpy as np

    p = np.asarray(sph_packed)[:n_spheres]
    c0 = p[:, 0:3]
    v = p[:, 3:6]
    r = p[:, 6]
    m = p[:, 7]
    S_pad = -(-n_spheres // 128) * 128
    F = np.zeros((2 * S_pad, 16), np.float32)
    F[:n_spheres, 0:3] = c0
    F[:n_spheres, 3:6] = v
    F[S_pad : S_pad + n_spheres, 6:9] = -2.0 * c0
    F[S_pad : S_pad + n_spheres, 9:12] = -2.0 * v
    F[S_pad : S_pad + n_spheres, 12] = np.sum(c0 * c0, axis=-1) - r * r
    F[S_pad : S_pad + n_spheres, 13] = 2.0 * np.sum(c0 * v, axis=-1)
    F[S_pad : S_pad + n_spheres, 14] = np.sum(v * v, axis=-1)
    # pad spheres: all-zero features => C = 0, c' = |o|^2 > 0, disc <= 0
    attrT = np.zeros((8, S_pad), np.float32)
    attrT[0:3, :n_spheres] = c0.T
    attrT[3:6, :n_spheres] = v.T
    attrT[6, :n_spheres] = r
    attrT[6, n_spheres:] = 1.0  # never selected; avoids 1/r = inf on pads
    attrT[7, :n_spheres] = m
    return jnp.asarray(F), jnp.asarray(attrT), S_pad


def _sphere_mxu_kernel(F_ref, attrT_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                       t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                       rf_s, *, s_pad: int, t_min: float):
    """Closest sphere hit via the bilinear-feature MXU formulation.

    Per sublane row of the ray block: build the (16, NL) ray-feature
    matrix, one f32 matmul against the sphere features gives the B/C
    coefficient planes for all spheres at once ((S_pad, NL), spheres on
    sublanes, rays on lanes), the per-pair root selection runs ~15 VPU ops
    (vs ~38 in the scalar-loop kernel), the winner is an argmin over
    sublanes, and its attributes come from a one-hot matmul against the
    transposed sphere table.  The winner's t is Newton-refined against the
    cancellation-free direct quadratic (see sphere_mxu_features).
    """
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s_pad, _MXU_NL), 0)

    for row in range(_MXU_ROWS):
        rs = slice(row, row + 1)
        ox, oy, oz = ox_ref[rs, :], oy_ref[rs, :], oz_ref[rs, :]
        dx, dy, dz = dx_ref[rs, :], dy_ref[rs, :], dz_ref[rs, :]
        tm = tm_ref[rs, :]

        rf_s[0:1, :] = dx
        rf_s[1:2, :] = dy
        rf_s[2:3, :] = dz
        rf_s[3:4, :] = tm * dx
        rf_s[4:5, :] = tm * dy
        rf_s[5:6, :] = tm * dz
        rf_s[6:7, :] = ox
        rf_s[7:8, :] = oy
        rf_s[8:9, :] = oz
        rf_s[9:10, :] = tm * ox
        rf_s[10:11, :] = tm * oy
        rf_s[11:12, :] = tm * oz
        rf_s[12:13, :] = jnp.ones(tm.shape, jnp.float32)
        rf_s[13:14, :] = tm
        rf_s[14:15, :] = tm * tm
        rf_s[15:16, :] = jnp.zeros(tm.shape, jnp.float32)

        BC = jax.lax.dot_general(
            F_ref[:, :], rf_s[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # f32 passes, NOT bf16
        )  # (2*S_pad, NL)
        B = BC[0:s_pad, :]
        C = BC[s_pad : 2 * s_pad, :]

        a = dx * dx + dy * dy + dz * dz
        neg_inv_a = -1.0 / a
        od = ox * dx + oy * dy + oz * dz
        o2 = ox * ox + oy * oy + oz * oz
        # acceptance margin: candidate t carries the expanded-quadratic
        # rounding error, so accept against 2*t_min — a false self-hit
        # (true root 0 rounded past t_min) is rejected, while legitimate
        # hits closer than 2e-3 to a surface are vanishingly rare
        t_sel = 2.0 * t_min
        ta2 = -t_sel * a

        b = od - B  # oc.d, broadcast (1, NL) rows over spheres
        c = C + o2  # |oc|^2 - r^2
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        s2 = jnp.where(b + sq < ta2, sq, -sq)
        cand = (b + s2) * neg_inv_a
        ok = (disc > 0.0) & (cand > t_sel)
        tc = jnp.where(ok, cand, BIG)

        best = jnp.min(tc, axis=0, keepdims=True)  # (1, NL)
        hit = best < BIG * 0.5
        sid = jnp.min(
            jnp.where(tc == best, iota_s, s_pad), axis=0, keepdims=True
        )
        oh = (iota_s == sid).astype(jnp.float32)  # (S_pad, NL)
        A = jax.lax.dot_general(
            attrT_ref[:, :], oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, NL) winner rows; exact (one-hot selects full-precision rows)

        cx = A[0:1, :] + tm * A[3:4, :]
        cy = A[1:2, :] + tm * A[4:5, :]
        cz = A[2:3, :] + tm * A[5:6, :]
        r = A[6:7, :]

        # Newton step on the direct (cancellation-free) quadratic restores
        # the hit t to brute-force accuracy: t -= f(t)/f'(t) with
        # f(t) = |o + t d - c|^2 - r^2.
        px = ox + best * dx - cx
        py = oy + best * dy - cy
        pz = oz + best * dz - cz
        f = px * px + py * py + pz * pz - r * r
        fp = 2.0 * (dx * px + dy * py + dz * pz)
        t_fix = best - f / jnp.where(jnp.abs(fp) > 1e-12, fp, 1.0)
        t_out = jnp.where(hit & (jnp.abs(fp) > 1e-12), t_fix, best)

        inv_r = 1.0 / r
        nx = (ox + t_out * dx - cx) * inv_r
        ny = (oy + t_out * dy - cy) * inv_r
        nz = (oz + t_out * dz - cz) * inv_r

        t_ref[rs, :] = jnp.where(hit, t_out, BIG)
        nx_ref[rs, :] = nx
        ny_ref[rs, :] = ny
        nz_ref[rs, :] = nz
        mat_ref[rs, :] = jnp.where(
            hit, A[7:8, :].astype(jnp.int32), 0
        )


def sphere_hit_attrs_mxu(
    F: jnp.ndarray,  # (2*S_pad, 16) from sphere_mxu_features
    attrT: jnp.ndarray,  # (8, S_pad)
    o,  # 3-tuple of (R,) planes
    d,
    tm: jnp.ndarray,
    *,
    s_pad: int,
    needs_uv: bool,
    interpret: bool = False,
):
    """MXU-formulation equivalent of sphere_hit_attrs_planar (same outputs:
    (t, normal 3-tuple, u, v, mat), each (R,))."""
    R = o[0].shape[0]
    blk = _MXU_ROWS * _MXU_NL
    assert R % blk == 0, R
    rows = R // _MXU_NL
    grid = rows // _MXU_ROWS
    ray_spec = pl.BlockSpec(
        (_MXU_ROWS, _MXU_NL), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def plane(x):
        return x.reshape(rows, _MXU_NL)

    comps = tuple(plane(c) for c in (*o, *d, tm))
    f32 = jax.ShapeDtypeStruct((rows, _MXU_NL), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _MXU_NL), jnp.int32)
    t, nx, ny, nz, mat = pl.pallas_call(
        functools.partial(_sphere_mxu_kernel, s_pad=s_pad, t_min=1e-3),
        grid=(grid,),
        in_specs=[tab_spec, tab_spec] + [ray_spec] * 7,
        out_specs=(ray_spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
        scratch_shapes=[pltpu.VMEM((16, _MXU_NL), jnp.float32)],
        interpret=interpret,
    )(F, attrT, *comps)
    return _sphere_uv_epilogue(t, nx, ny, nz, mat, R, needs_uv)


# ---------------------------------------------------------------------------
# Block-synchronous cluster culling (2-level BVH, TPU-native)
# ---------------------------------------------------------------------------

SPHERE_CLUSTER = 64  # spheres per cluster (BVH-leaf-order groups; coarse so the per-cluster block check costs ~1%)


def _sphere_cluster_kernel(sph_ref, cl_ref, ox_ref, oy_ref, oz_ref,
                           dx_ref, dy_ref, dz_ref, tm_ref,
                           t_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                           bt_s, bcx_s, bcy_s, bcz_s, br_s, bm_s,
                           *, n_clusters: int, t_min: float, moving: bool):
    """Closest sphere hit with block-level cluster culling.

    The per-ray recursive BVH of the reference (src/bvh.cuh:95-106) has no
    efficient vector form (divergent pointer chasing); the TPU-native
    equivalent is block-synchronous: spheres are packed in BVH-leaf order
    into clusters of SPHERE_CLUSTER with precomputed union AABBs, and each
    cluster is slab-tested against the whole ray block (bounded by the
    running per-lane best_t, the shrinking-tmax trick of bvh.cuh:97).  If no
    lane can hit the cluster, its candidates are skipped with @pl.when —
    saving both the vector math and the per-sphere scalar-load overhead.
    Results are exactly equal to the brute-force kernel (the slab test is
    conservative).
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    a = dx * dx + dy * dy + dz * dz
    neg_inv_a = -1.0 / a
    ta2 = -t_min * a
    ix = 1.0 / _safe_div_dir(dx)
    iy = 1.0 / _safe_div_dir(dy)
    iz = 1.0 / _safe_div_dir(dz)

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
        s2 = jnp.where(b + sq < ta2, sq, -sq)
        cand = (b + s2) * neg_inv_a
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
        hit = jnp.maximum(t0, t_min) <= jnp.minimum(t1, bt_s[:])

        @pl.when(jnp.any(hit))
        def _():
            best_t = bt_s[:]
            bcx = bcx_s[:]
            bcy = bcy_s[:]
            bcz = bcz_s[:]
            br = br_s[:]
            bm = bm_s[:]
            for k in range(SPHERE_CLUSTER):
                t, cx, cy, cz, r, m, ok = candidate(c * SPHERE_CLUSTER + k)
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


def sphere_hit_attrs_clustered(
    sph_cl_packed: jnp.ndarray,  # (S_pad, 9) BVH-leaf-ordered _sphere_rows
    sph_cl_box: jnp.ndarray,  # (C, 8) cluster AABBs [min(3) max(3) 0 0]
    o,  # 3-tuple of (R,) planes
    d,
    tm: jnp.ndarray,
    *,
    n_clusters: int,
    moving: bool,
    needs_uv: bool,
    interpret: bool = False,
):
    """Cluster-culled equivalent of sphere_hit_attrs_planar (same outputs)."""
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    scratch = [pltpu.VMEM((_SUBLANES, _LANES), jnp.float32)] * 6
    t, nx, ny, nz, mat = pl.pallas_call(
        functools.partial(
            _sphere_cluster_kernel,
            n_clusters=n_clusters, t_min=1e-3, moving=moving,
        ),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [ray_spec] * 7,
        out_specs=(ray_spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(sph_cl_packed, sph_cl_box, *comps)
    return _sphere_uv_epilogue(t, nx, ny, nz, mat, R, needs_uv)


def cluster_spheres(tables):
    """Host-side: BVH-leaf-order sphere clustering for the culled kernel.

    Returns (sph_cl_packed (S_pad, 9), sph_cl_box (C, 8), n_clusters)."""
    import numpy as np

    from art_tpu.ops.bvh import cluster_primitives, sphere_world_bounds

    bmin, bmax = sphere_world_bounds(
        np.asarray(tables.sph_center), np.asarray(tables.sph_vel),
        np.asarray(tables.sph_radius),
    )
    packed = _sphere_rows(tables)[: tables.n_spheres]
    reordered, boxes, n_cl, _ = cluster_primitives(
        bmin, bmax, packed, SPHERE_CLUSTER
    )
    return jnp.asarray(reordered), jnp.asarray(boxes), n_cl


def _sphere_rows(tables):
    """(S, 9) [cx cy cz vx vy vz radius mat r2] rows in ORIGINAL scene
    order (numpy) — shared by pack_spheres / cluster_spheres."""
    import numpy as np

    center = np.asarray(tables.sph_center)
    vel = np.asarray(tables.sph_vel)
    radius = np.asarray(tables.sph_radius)
    S = center.shape[0]
    rows = np.zeros((S, 9), np.float32)
    rows[:, 0:3] = center
    rows[:, 3:6] = vel
    rows[:, 6] = radius
    rows[:, 7] = np.asarray(tables.sph_mat)
    rows[:, 8] = radius * radius
    return rows


# Minimum size of a (radius, material)-uniform static group for the
# kernel's constant-attribute tail loop to be worth a third fori_loop.
_TAIL_MIN = 192


def pack_spheres(tables) -> tuple[jnp.ndarray, int, int, tuple]:
    """Kernel-ordered sphere table: [cx cy cz vx vy vz radius mat r2 K].

    Returns (packed (Sm_pad + Ss_pad, 10), n_moving_pad, n_static,
    (n_tail, tail_r, tail_mat, pos_r)) with moving spheres sorted to the
    front so the kernel's static loop skips the center-motion FMAs, and
    the largest (radius, material)-uniform static group (>= _TAIL_MIN
    rows, e.g. final_scene's 1000-ball cluster) sorted to the END of the
    static rows for the kernel's constant-attribute tail loop.  The
    reorder is invisible outside the kernel — winner attributes come out
    of the kernel itself, the jnp reference path indexes the unordered
    ``tables.sph_*`` columns.

    Column 8 is the precomputed r*r the kernel's quadratic uses (column 6
    keeps the SIGNED radius for the hollow-glass normal flip).  Each
    segment is padded to a multiple of lcm(32, ART_TPU_SPH_UNROLL); pad rows
    get r2 = -1 so disc = (oc.d)^2 - |d|^2(|oc|^2 + 1) < 0 strictly
    (Cauchy-Schwarz) and the NaN-reject can never accept them.

    Column 9 is K = |c|^2 - r^2 for the expanded-quadratic static loop
    (c' = |o|^2 - 2 o.c + K), which trades the oc build for 3 fewer VPU
    ops per sphere; pad rows get K = 1e30 so c' is hugely positive and
    disc = b^2 - a*c' < 0 strictly (Cauchy-Schwarz again: b^2 <= a*|o|^2
    < a*c').  The builder gates the expanded form by coordinate scale
    (see sph_expand)."""
    import numpy as np

    rows = _sphere_rows(tables)
    is_moving = np.any(rows[:, 3:6] != 0.0, axis=1)
    mov, stat = rows[is_moving], rows[~is_moving]
    pos_r = bool(np.all(rows[:, 6] > 0.0)) if len(rows) else True
    # Largest (radius, material)-uniform static group -> tail position.
    n_tail, tail_r, tail_mat = 0, 1.0, 0.0
    if len(stat) >= _TAIL_MIN:
        keys, counts = np.unique(stat[:, 6:8], axis=0, return_counts=True)
        k = int(np.argmax(counts))
        if counts[k] >= _TAIL_MIN:
            tail_r, tail_mat = float(keys[k, 0]), float(keys[k, 1])
            sel = (stat[:, 6] == tail_r) & (stat[:, 7] == tail_mat)
            stat = np.concatenate([stat[~sel], stat[sel]], axis=0)
            n_tail = int(counts[k])
    # Pad each segment to a multiple of the kernel unroll: the moving
    # loop's n_moving // UNROLL bound silently DROPS real rows if the pad
    # is finer than UNROLL, and the static loop's ceil bound reads up to
    # the next UNROLL multiple (out of the array if the pad is finer).
    # lcm(32, UNROLL) keeps every ART_TPU_SPH_UNROLL value safe (a bare
    # max(32, UNROLL) breaks non-divisors like 24: 2 iterations of 24
    # cover only 48 of 64 padded rows).
    pad = 32 * _SPH_UNROLL // math.gcd(32, _SPH_UNROLL)
    sm_pad = -(-len(mov) // pad) * pad if len(mov) else 0
    ss_pad = -(-len(stat) // pad) * pad
    out = np.zeros((sm_pad + ss_pad, 10), np.float32)
    out[:, 8] = -1.0
    out[:, 9] = 1e30
    out[: len(mov), :9] = mov
    out[sm_pad : sm_pad + len(stat), :9] = stat
    real = np.zeros(len(out), bool)
    real[: len(mov)] = True
    real[sm_pad : sm_pad + len(stat)] = True
    c = out[real, 0:3].astype(np.float64)
    out[real, 9] = (np.sum(c * c, axis=1) - out[real, 8].astype(np.float64)).astype(
        np.float32
    )
    return jnp.asarray(out), sm_pad, len(stat), (n_tail, tail_r, tail_mat, pos_r)


def pack_tail_spheres(sph_packed, n_moving_pad: int, n_static: int,
                      n_tail: int):
    """Tail-only packed table + conservative cluster AABB.

    Feeds the compacted tail-sphere pass (ops/compact_sphere.py): the
    (radius, material)-uniform tail group (e.g. the 1000-ball cluster of
    final_scene/original_scene, src/main.cu:547-552) occupies a compact
    AABB, so most rays can skip its 1000 rows entirely after one slab
    test.  Returns ``(tail_packed, tail_box)`` where ``tail_packed`` is
    the tail rows re-based to row 0 and padded with inert rows (same
    r2 = -1 / K = 1e30 Cauchy-Schwarz rejection as :func:`pack_spheres`),
    and ``tail_box = (x0, y0, z0, x1, y1, z1)`` python floats bounding
    every tail sphere (centers +- |r|) inflated by an fp-safety margin.
    ``(zeros, ())`` when the scene has no tail."""
    import numpy as np

    if not n_tail:
        return jnp.zeros((1, 10), jnp.float32), ()
    pk = np.asarray(sph_packed)
    lo = n_moving_pad + (n_static - n_tail)
    rows = pk[lo : n_moving_pad + n_static]
    pad = 32 * _SPH_UNROLL // math.gcd(32, _SPH_UNROLL)
    n_pad = -(-len(rows) // pad) * pad
    out = np.zeros((n_pad, 10), np.float32)
    out[:, 8] = -1.0
    out[:, 9] = 1e30
    out[: len(rows)] = rows
    c = rows[:, 0:3].astype(np.float64)
    r = np.abs(rows[:, 6:7].astype(np.float64))
    lo3 = (c - r).min(axis=0)
    hi3 = (c + r).max(axis=0)
    eps = 1e-3 + 1e-6 * float(np.max(np.abs(np.concatenate([lo3, hi3]))))
    box = tuple(float(v) for v in np.concatenate([lo3 - eps, hi3 + eps]))
    return jnp.asarray(out), box


# ---------------------------------------------------------------------------
# Needy-skip binned sphere kernel (tail-cluster scenes)
# ---------------------------------------------------------------------------

# Minimum tail size for the skip kernel (same class gate as the compacted
# pass: only the final_scene/original_scene 1000-ball clusters qualify).
SKIP_MIN_TAIL = 512
# Bin count for the skip kernel's contiguous tail segments (build-time).
_SPH_BINS = int(__import__("os").environ.get("ART_TPU_SPH_BINS", "16"))


def pack_skip_spheres(sph_packed, n_moving_pad: int, n_static: int,
                      n_tail: int, axis: int, nbins: int):
    """Kernel table + compile-time bin metadata for _sphere_skip_kernel.

    Re-lays pack_spheres output as [moving | main | tail bin 0 | bin 1 |
    ...]: the tail cluster's rows are sorted along world axis ``axis``
    and split into ``nbins`` equal-count contiguous segments, each padded
    to the unroll multiple with inert rows (r2 = -1 / K = 1e30, the same
    Cauchy-Schwarz rejection as pack_spheres).  Returns

        (table (N, 10), (n_moving_rows, n_main_rows,
                         ((row0, row1, box6), ...)))

    where each bin's ``box6 = (x0, y0, z0, x1, y1, z1)`` bounds its member
    spheres (centers +- |r|, fp-inflated) — the kernel prunes a whole ray
    block past any bin whose conservative slab test no lane passes.
    Row ranges are UNROLL-aligned by construction (no overlap)."""
    import numpy as np

    pk = np.asarray(sph_packed)
    pad = 32 * _SPH_UNROLL // math.gcd(32, _SPH_UNROLL)
    mov = pk[:n_moving_pad]
    n_main_real = n_static - n_tail
    main = pk[n_moving_pad : n_moving_pad + n_main_real]
    tail = pk[n_moving_pad + n_main_real : n_moving_pad + n_static]
    tail = tail[np.argsort(tail[:, axis], kind="stable")]

    def pad_rows(rows):
        n_p = -(-len(rows) // pad) * pad
        out = np.zeros((n_p, 10), np.float32)
        out[:, 8] = -1.0
        out[:, 9] = 1e30
        out[: len(rows)] = rows
        return out

    segs = [mov]
    if n_main_real:
        segs.append(pad_rows(main))
    n_main_rows = sum(len(s) for s in segs) - len(mov)
    row0 = len(mov) + n_main_rows
    edges = np.linspace(0, n_tail, nbins + 1).round().astype(int)
    bins = []
    for i in range(nbins):
        rows = tail[edges[i] : edges[i + 1]]
        if not len(rows):
            continue
        seg = pad_rows(rows)
        c = rows[:, 0:3].astype(np.float64)
        r = np.abs(rows[:, 6:7].astype(np.float64))
        lo3 = (c - r).min(axis=0)
        hi3 = (c + r).max(axis=0)
        eps = 1e-3 + 1e-6 * float(np.max(np.abs(np.concatenate([lo3, hi3]))))
        box = tuple(float(v) for v in np.concatenate([lo3 - eps, hi3 + eps]))
        bins.append((int(row0), int(row0 + len(seg)), box))
        segs.append(seg)
        row0 += len(seg)
    table = np.concatenate(segs, axis=0)
    return jnp.asarray(table), (int(len(mov)), int(n_main_rows), tuple(bins))


def _slab_interval(box, o, d, t_min: float):
    """Conservative ray/AABB overlap of the (t_min, inf) segment — the
    same predicate as compact_sphere.tail_box_needy (zero direction
    components replaced by +1e-20: errs toward 'crosses', never away)."""
    x0, y0, z0, x1, y1, z1 = box
    t_near = jnp.full(o[0].shape, t_min, jnp.float32)
    t_far = jnp.full(o[0].shape, BIG, jnp.float32)
    for lo, hi, oc, dc in ((x0, x1, o[0], d[0]),
                           (y0, y1, o[1], d[1]),
                           (z0, z1, o[2], d[2])):
        inv = 1.0 / jnp.where(dc == 0.0, 1e-20, dc)
        ta = (lo - oc) * inv
        tb = (hi - oc) * inv
        t_near = jnp.maximum(t_near, jnp.minimum(ta, tb))
        t_far = jnp.minimum(t_far, jnp.maximum(ta, tb))
    return t_far >= t_near


def _sphere_skip_kernel(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                        dz_ref, tm_ref, t_ref, nx_ref, ny_ref, nz_ref,
                        mat_ref,
                        *, n_moving: int, n_main: int, bins: tuple,
                        tail_box: tuple, tail_r: float, tail_mat: float,
                        t_min: float, expand: bool, pos_r: bool):
    """Closest sphere hit with block-level tail-cluster pruning.

    The dense tail loop tests every ray against all ~1000 cluster rows —
    58% of final_scene's iteration budget (docs/logs/queue_r3a.log) even
    though only 0-55% of a dispatch's rays can reach the cluster AABB.
    Per-lane masking cannot reduce VPU work, and the adaptive compaction
    (ops/compact_sphere.py) caps out at K lanes; this kernel prunes at
    the granularity Mosaic CAN skip at — the whole (64, 128) ray block:

    1. head loops (moving + main rows) run dense, epilogue written to the
       output refs unconditionally;
    2. one conservative slab test marks lanes that can reach the tail
       cluster; `@pl.when(any(needy))` guards the whole tail stage;
    3. the tail rows are pre-sorted into ``bins`` contiguous segments
       along one world axis (pack_skip_spheres) — each bin's loop runs
       under its own `@pl.when(any lane crosses the bin AABB))` and
       closest-t-merges its winner into the already-written outputs.

    The wavefront pool is approximately pixel-sorted (refill rank =
    prefix sum over slot order), so a ray block is a contiguous image
    span whose rays either face the cluster or don't — and within a
    facing block, span few of the axis bins.  Candidate math (NaN-reject
    roots, expanded/standard quadratic, t_min semantics) is case-equal
    to _sphere_kernel; cross-bin ties may pick a different equally-valid
    winner than the dense kernel's first-wins scan (measure-zero).

    Replaces the reference's per-thread BVH descent over the cluster
    (src/bvh.cuh:95-106) with block-synchronous interval pruning."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    a = dx * dx + dy * dy + dz * dz
    neg_inv_a = -1.0 / a
    ta2 = -t_min * a

    def _roots(b, c):
        # NaN-reject form (see _sphere_kernel._roots)
        disc = b * b - a * c
        sq = jnp.sqrt(disc)
        s2 = jnp.where(b + sq < ta2, sq, -sq)
        return (b + s2) * neg_inv_a

    def update(carry, cand):
        better = (cand[0] > t_min) & (cand[0] < carry[0])  # false on NaN
        return tuple(jnp.where(better, n, c) for n, c in zip(cand, carry))

    carry_r = not pos_r
    zeros = jnp.zeros(ox.shape, jnp.float32)

    if expand:
        oo = ox * ox + oy * oy + oz * oz
        od = ox * dx + oy * dy + oz * dz
        ox2, oy2, oz2 = 2.0 * ox, 2.0 * oy, 2.0 * oz

        def bc(s):
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            b = od - (cx * dx + cy * dy + cz * dz)
            c = (oo + sph_ref[s, 9]) - (cx * ox2 + cy * oy2 + cz * oz2)
            return b, c, cx, cy, cz
    else:
        def bc(s):
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - sph_ref[s, 8]
            return b, c, cx, cy, cz

    def candidate_moving(s):
        cx = sph_ref[s, 0] + tm * sph_ref[s, 3]
        cy = sph_ref[s, 1] + tm * sph_ref[s, 4]
        cz = sph_ref[s, 2] + tm * sph_ref[s, 5]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - sph_ref[s, 8]
        cand = _roots(b, c)
        if carry_r:
            return cand, cx, cy, cz, sph_ref[s, 6], sph_ref[s, 7]
        return cand, cx, cy, cz, sph_ref[s, 7]

    def candidate_main(s):
        b, c, cx, cy, cz = bc(s)
        cand = _roots(b, c)
        if carry_r:
            return cand, cx, cy, cz, sph_ref[s, 6], sph_ref[s, 7]
        return cand, cx, cy, cz, sph_ref[s, 7]

    def candidate_tail(s):
        b, c, cx, cy, cz = bc(s)
        return _roots(b, c), cx, cy, cz

    UNROLL = _SPH_UNROLL

    def body_moving(i, carry):
        s = i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate_moving(s + k))
        return carry

    def body_main(i, carry):
        s = n_moving + i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate_main(s + k))
        return carry

    def body_tail(i, carry):
        s = i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate_tail(s + k))
        return carry

    carry = (
        (jnp.full(ox.shape, BIG, jnp.float32),)
        + (zeros, zeros, zeros)
        + ((jnp.full(ox.shape, 1.0, jnp.float32),) if carry_r else ())
        + (zeros,)
    )
    if n_moving:
        carry = jax.lax.fori_loop(0, n_moving // UNROLL, body_moving, carry)
    if n_main:
        carry = jax.lax.fori_loop(0, n_main // UNROLL, body_main, carry)

    # head epilogue, written unconditionally (identical to _sphere_kernel)
    best_t, bcx, bcy, bcz = carry[:4]
    bm = carry[-1]
    t_n = best_t if carry_r else jnp.minimum(best_t, 1e18)
    px = ox + t_n * dx - bcx
    py = oy + t_n * dy - bcy
    pz = oz + t_n * dz - bcz
    inv_r = (1.0 / carry[4]) if carry_r else jax.lax.rsqrt(
        px * px + py * py + pz * pz
    )
    t_ref[:] = best_t
    nx_ref[:] = px * inv_r
    ny_ref[:] = py * inv_r
    nz_ref[:] = pz * inv_r
    mat_ref[:] = bm.astype(jnp.int32)

    needy = _slab_interval(tail_box, (ox, oy, oz), (dx, dy, dz), t_min)

    @pl.when(jnp.any(needy))
    def _():
        for row0, row1, box in bins:
            cross = needy & _slab_interval(
                box, (ox, oy, oz), (dx, dy, dz), t_min
            )

            @pl.when(jnp.any(cross))
            def _(row0=row0, row1=row1):
                zt = (jnp.full(ox.shape, BIG, jnp.float32),
                      zeros, zeros, zeros)
                t2, cx2, cy2, cz2 = jax.lax.fori_loop(
                    row0 // UNROLL, row1 // UNROLL, body_tail, zt
                )
                prev_t = t_ref[:]
                better = t2 < prev_t  # bin loop honors t_min already
                t2n = t2 if carry_r else jnp.minimum(t2, 1e18)
                px2 = ox + t2n * dx - cx2
                py2 = oy + t2n * dy - cy2
                pz2 = oz + t2n * dz - cz2
                inv2 = (1.0 / tail_r) if carry_r else jax.lax.rsqrt(
                    px2 * px2 + py2 * py2 + pz2 * pz2
                )
                t_ref[:] = jnp.where(better, t2, prev_t)
                nx_ref[:] = jnp.where(better, px2 * inv2, nx_ref[:])
                ny_ref[:] = jnp.where(better, py2 * inv2, ny_ref[:])
                nz_ref[:] = jnp.where(better, pz2 * inv2, nz_ref[:])
                mat_ref[:] = jnp.where(
                    better, jnp.int32(int(tail_mat)), mat_ref[:]
                )


def sphere_skip_hit_attrs(
    sph_skip_packed: jnp.ndarray,  # (N, 10) pack_skip_spheres table
    o,  # 3-tuple of (R,) planes
    d,
    tm: jnp.ndarray,  # (R,)
    *,
    meta: tuple,  # (n_moving_rows, n_main_rows, bins) from pack_skip_spheres
    tail_box: tuple,  # conservative whole-cluster AABB (pack_tail_spheres)
    tail_r: float,
    tail_mat: float,
    pos_r: bool,
    expand: bool,
    needs_uv: bool,
    interpret: bool = False,
):
    """sphere_hit_attrs_planar drop-in with block-level tail pruning
    (same outputs; tail-cluster scenes only)."""
    n_moving, n_main, bins = meta
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, mat = pl.pallas_call(
        functools.partial(
            _sphere_skip_kernel, n_moving=n_moving, n_main=n_main,
            bins=bins, tail_box=tail_box, tail_r=tail_r, tail_mat=tail_mat,
            t_min=1e-3, expand=expand, pos_r=pos_r,
        ),
        grid=(grid,),
        in_specs=[_sph_table_spec()] + [ray_spec] * 7,
        out_specs=(ray_spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
        interpret=interpret,
    )(sph_skip_packed, *comps)
    return _sphere_uv_epilogue(t, nx, ny, nz, mat, R, needs_uv)


# ---------------------------------------------------------------------------
# Cell-binned sphere kernel (many-small-spheres scenes, mixed moving/static)
# ---------------------------------------------------------------------------

# Minimum binnable-sphere count for the cell-binned kernel.
CELLBIN_MIN = 128
# Unroll for the per-cell loops (cells hold ~30 rows; the head keeps
# _SPH_UNROLL).  Every cell segment is padded to this multiple.
_CELLBIN_UNROLL = int(__import__("os").environ.get("ART_TPU_CELLBIN_UNROLL", "8"))
_CELLBIN_GRID = int(__import__("os").environ.get("ART_TPU_CELLBIN_GRID", "4"))


def pack_cellbin_spheres(sph_packed, n_moving_pad: int, n_static: int,
                         gx: int = 0, gz: int = 0):
    """Kernel table + compile-time cell metadata for _sphere_cellbin_kernel.

    Re-lays pack_spheres output as [head moving | head static | cell 0
    moving | cell 0 static | cell 1 moving | ...]: spheres are assigned
    to a ``gx x gz`` cell lattice over the two largest-extent world axes
    of their swept AABBs (center at t=0 and t=1, +- |r| — the reference's
    moving-sphere bbox rule, src/sphere.cuh:33-37); spheres whose extent
    along either lattice axis exceeds 1.5 cells (e.g. the r=1000 ground
    sphere) stay in the dense head.  Each cell's moving/static segments
    are padded to _CELLBIN_UNROLL with inert rows (r2 = -1 / K = 1e30,
    the pack_spheres Cauchy-Schwarz rejection).

    Returns ``(table (N, 10), (head_m_rows, head_s_rows, cells,
    union_box))`` where each cell is ``(m0, m1, s0, s1, box6)`` row
    ranges + its members' conservative swept AABB, and ``union_box``
    bounds every binned sphere.  ``(table, None)`` when fewer than
    CELLBIN_MIN spheres are binnable."""
    import numpy as np

    gx = gx or _CELLBIN_GRID
    gz = gz or _CELLBIN_GRID
    pk = np.asarray(sph_packed)
    real = pk[:, 8] > 0.0  # pad rows carry r2 = -1
    rows = pk[real]
    if len(rows) < CELLBIN_MIN:
        return jnp.asarray(pk), None
    c0 = rows[:, 0:3].astype(np.float64)
    c1 = c0 + rows[:, 3:6].astype(np.float64)
    r = np.abs(rows[:, 6:7].astype(np.float64))
    lo = np.minimum(c0, c1) - r
    hi = np.maximum(c0, c1) + r
    ext = hi - lo
    # Lattice bounds must exclude scene-spanning outliers (the r=1000
    # ground sphere would inflate the cell size ~90x): prefilter to rows
    # within 8x the median extent, THEN drop rows spanning > 1.5 cells.
    med = np.median(ext, axis=0)
    small = np.all(ext <= 8.0 * med + 1e-12, axis=1)
    if int(small.sum()) < CELLBIN_MIN:
        return jnp.asarray(pk), None
    span = hi[small].max(axis=0) - lo[small].min(axis=0)
    ax0, ax1 = np.argsort(span)[-2:]  # two largest-extent axes
    ax0, ax1 = int(min(ax0, ax1)), int(max(ax0, ax1))
    lo0, hi0 = lo[small, ax0].min(), hi[small, ax0].max()
    lo1, hi1 = lo[small, ax1].min(), hi[small, ax1].max()
    cell0 = (hi0 - lo0) / gx
    cell1 = (hi1 - lo1) / gz
    binnable = (
        small
        & (ext[:, ax0] <= 1.5 * cell0)
        & (ext[:, ax1] <= 1.5 * cell1)
    )
    if int(binnable.sum()) < CELLBIN_MIN:
        return jnp.asarray(pk), None
    head = rows[~binnable]
    binned = rows[binnable]
    blo, bhi = lo[binnable], hi[binnable]
    mid = 0.5 * (blo + bhi)
    i0 = np.clip(((mid[:, ax0] - lo0) / max(cell0, 1e-30)).astype(int), 0, gx - 1)
    i1 = np.clip(((mid[:, ax1] - lo1) / max(cell1, 1e-30)).astype(int), 0, gz - 1)
    cell_of = i0 * gz + i1

    U = _CELLBIN_UNROLL
    # The head must end on a U-aligned row: the kernel's cell loops run
    # fori(m0//U, m1//U) and a head padded only to lcm(32, SPH_UNROLL)
    # would misalign every cell range for non-divisor U values (silently
    # dropping rows at segment ends).
    pad_head = 32 * _SPH_UNROLL // math.gcd(32, _SPH_UNROLL)
    pad_head = pad_head * U // math.gcd(pad_head, U)

    def pad_rows(rr, pad):
        if not len(rr):
            return np.zeros((0, 10), np.float32)
        n_p = -(-len(rr) // pad) * pad
        out = np.zeros((n_p, 10), np.float32)
        out[:, 8] = -1.0
        out[:, 9] = 1e30
        out[: len(rr)] = rr
        return out

    def split_mov(rr):
        is_mov = np.any(rr[:, 3:6] != 0.0, axis=1)
        return rr[is_mov], rr[~is_mov]

    hm_rows, hs_rows = split_mov(head)
    segs = [pad_rows(hm_rows, pad_head), pad_rows(hs_rows, pad_head)]
    head_m, head_s = len(segs[0]), len(segs[1])
    row0 = head_m + head_s
    cells = []
    for ci in range(gx * gz):
        rr = binned[cell_of == ci]
        if not len(rr):
            continue
        sel = cell_of == ci
        clo = blo[sel].min(axis=0)
        chi = bhi[sel].max(axis=0)
        eps = 1e-3 + 1e-6 * float(np.max(np.abs(np.concatenate([clo, chi]))))
        box = tuple(float(v) for v in np.concatenate([clo - eps, chi + eps]))
        mv, st = split_mov(rr)
        mseg, sseg = pad_rows(mv, U), pad_rows(st, U)
        cells.append((int(row0), int(row0 + len(mseg)),
                      int(row0 + len(mseg)), int(row0 + len(mseg) + len(sseg)),
                      box))
        segs += [mseg, sseg]
        row0 += len(mseg) + len(sseg)
    ulo = blo.min(axis=0)
    uhi = bhi.max(axis=0)
    ueps = 1e-3 + 1e-6 * float(np.max(np.abs(np.concatenate([ulo, uhi]))))
    union = tuple(float(v) for v in np.concatenate([ulo - ueps, uhi + ueps]))
    table = np.concatenate(segs, axis=0)
    return jnp.asarray(table), (int(head_m), int(head_s), tuple(cells), union)


def pack_tail2d_spheres(sph_packed, n_moving_pad: int, n_static: int,
                        n_tail: int, g: int = 3):
    """Tail-cluster 3-D lattice packing for _sphere_cellbin_kernel.

    pack_skip_spheres' 1-D y-bins cannot prune cluster-FACING blocks:
    every y-slab spans the cluster's full depth, so each slab's entry
    face IS the cluster front and every bin crosses.  This packing cuts
    the tail into a (g x g x g) lattice instead — boxes tight in all
    three axes, so no camera-axis guess is needed — and relies on the
    cellbin kernel's occlusion bound (t_near <= best_t) to drop REAR
    cells once nearer-cell hits have been merged.  Head = the moving +
    main rows (dense, as in _sphere_skip_kernel); returns the same
    ``(table, meta)`` contract as pack_cellbin_spheres."""
    import numpy as np

    pk = np.asarray(sph_packed)
    # U-align the head end for non-divisor unrolls (see pack_cellbin).
    pad = 32 * _SPH_UNROLL // math.gcd(32, _SPH_UNROLL)
    pad = pad * _CELLBIN_UNROLL // math.gcd(pad, _CELLBIN_UNROLL)
    mov = pk[:n_moving_pad]
    n_main_real = n_static - n_tail
    main = pk[n_moving_pad : n_moving_pad + n_main_real]
    tail = pk[n_moving_pad + n_main_real : n_moving_pad + n_static]

    def pad_rows(rr, p):
        if not len(rr):
            return np.zeros((0, 10), np.float32)
        n_p = -(-len(rr) // p) * p
        out = np.zeros((n_p, 10), np.float32)
        out[:, 8] = -1.0
        out[:, 9] = 1e30
        out[: len(rr)] = rr
        return out

    c = tail[:, 0:3].astype(np.float64)
    r = np.abs(tail[:, 6:7].astype(np.float64))
    lo = c - r
    hi = c + r
    lo3 = lo.min(axis=0)
    cell3 = np.maximum((hi.max(axis=0) - lo3) / g, 1e-30)
    mid = 0.5 * (lo + hi)
    idx3 = np.clip(((mid - lo3) / cell3).astype(int), 0, g - 1)
    cell_of = (idx3[:, 0] * g + idx3[:, 1]) * g + idx3[:, 2]

    U = _CELLBIN_UNROLL
    head_mov = pad_rows(mov[pk[:n_moving_pad, 8] > 0.0] if len(mov) else mov,
                        pad)
    head_main = pad_rows(main, pad)
    segs = [head_mov, head_main]
    head_m, head_s = len(head_mov), len(head_main)
    row0 = head_m + head_s
    cells = []
    for ci in range(g * g * g):
        sel = cell_of == ci
        rr = tail[sel]
        if not len(rr):
            continue
        clo = lo[sel].min(axis=0)
        chi = hi[sel].max(axis=0)
        eps = 1e-3 + 1e-6 * float(np.max(np.abs(np.concatenate([clo, chi]))))
        box = tuple(float(v) for v in np.concatenate([clo - eps, chi + eps]))
        seg = pad_rows(rr, U)
        # tail rows are static: moving segment empty
        cells.append((int(row0), int(row0), int(row0),
                      int(row0 + len(seg)), box))
        segs.append(seg)
        row0 += len(seg)
    ulo = lo.min(axis=0)
    uhi = hi.max(axis=0)
    ueps = 1e-3 + 1e-6 * float(np.max(np.abs(np.concatenate([ulo, uhi]))))
    union = tuple(float(v) for v in np.concatenate([ulo - ueps, uhi + ueps]))
    table = np.concatenate(segs, axis=0)
    return jnp.asarray(table), (int(head_m), int(head_s), tuple(cells), union)


def _slab_interval_tmax(box, o, d, t_min: float, tmax):
    """_slab_interval with an occlusion bound: a cell whose entry point
    lies beyond the ray's current closest hit cannot improve it."""
    x0, y0, z0, x1, y1, z1 = box
    t_near = jnp.full(o[0].shape, t_min, jnp.float32)
    t_far = jnp.full(o[0].shape, BIG, jnp.float32)
    for lo, hi, oc, dc in ((x0, x1, o[0], d[0]),
                           (y0, y1, o[1], d[1]),
                           (z0, z1, o[2], d[2])):
        inv = 1.0 / jnp.where(dc == 0.0, 1e-20, dc)
        ta = (lo - oc) * inv
        tb = (hi - oc) * inv
        t_near = jnp.maximum(t_near, jnp.minimum(ta, tb))
        t_far = jnp.minimum(t_far, jnp.maximum(ta, tb))
    return (t_far >= t_near) & (t_near <= tmax)


def _sphere_cellbin_kernel(sph_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                           dz_ref, tm_ref, t_ref, nx_ref, ny_ref, nz_ref,
                           mat_ref,
                           *, head_m: int, head_s: int, cells: tuple,
                           union_box: tuple, t_min: float, expand: bool,
                           pos_r: bool):
    """Closest sphere hit with block-level cell pruning over the whole
    sphere set (mixed moving/static, per-row materials).

    _sphere_skip_kernel prunes a single (r, mat)-uniform static tail
    cluster; bouncing_spheres-class scenes (src/main.cu:160-244: 22x22
    lattice of ~390 moving + ~95 static small spheres, per-sphere
    materials) have no such tail, so round 3 left them on the dense
    ~490-row scan.  This kernel generalizes the block-pruning idea:

    1. head rows (the r=1000 ground + anything spanning > 1.5 cells)
       run dense, epilogue written unconditionally;
    2. the rest live in compile-time (gx x gz) lattice cells over the
       two largest-extent world axes (pack_cellbin_spheres); each cell's
       moving+static loops run under `@pl.when(any lane crosses the cell
       AABB *before its current closest hit*)` — the occlusion bound
       (t_near <= best_t) prunes cells behind the ground hit the head
       loop just stored, which a plain slab test cannot;
    3. each surviving cell closest-t-merges its winner (center, signed
       radius, material carried per-row) into the stored outputs.

    Candidate math is case-equal to _sphere_kernel; cross-cell ties may
    pick a different equally-valid winner than the dense first-wins scan
    (measure-zero).  Replaces the reference's per-thread BVH descent
    (src/bvh.cuh:95-106) with block-synchronous lattice pruning."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    a = dx * dx + dy * dy + dz * dz
    neg_inv_a = -1.0 / a
    ta2 = -t_min * a

    def _roots(b, c):
        disc = b * b - a * c
        sq = jnp.sqrt(disc)
        s2 = jnp.where(b + sq < ta2, sq, -sq)
        return (b + s2) * neg_inv_a

    def update(carry, cand):
        better = (cand[0] > t_min) & (cand[0] < carry[0])  # false on NaN
        return tuple(jnp.where(better, n, c) for n, c in zip(cand, carry))

    carry_r = not pos_r
    zeros = jnp.zeros(ox.shape, jnp.float32)

    if expand:
        oo = ox * ox + oy * oy + oz * oz
        od = ox * dx + oy * dy + oz * dz
        ox2, oy2, oz2 = 2.0 * ox, 2.0 * oy, 2.0 * oz

        def bc(s):
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            b = od - (cx * dx + cy * dy + cz * dz)
            c = (oo + sph_ref[s, 9]) - (cx * ox2 + cy * oy2 + cz * oz2)
            return b, c, cx, cy, cz
    else:
        def bc(s):
            cx = sph_ref[s, 0]
            cy = sph_ref[s, 1]
            cz = sph_ref[s, 2]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - sph_ref[s, 8]
            return b, c, cx, cy, cz

    def candidate_moving(s):
        cx = sph_ref[s, 0] + tm * sph_ref[s, 3]
        cy = sph_ref[s, 1] + tm * sph_ref[s, 4]
        cz = sph_ref[s, 2] + tm * sph_ref[s, 5]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - sph_ref[s, 8]
        cand = _roots(b, c)
        if carry_r:
            return cand, cx, cy, cz, sph_ref[s, 6], sph_ref[s, 7]
        return cand, cx, cy, cz, sph_ref[s, 7]

    def candidate_static(s):
        b, c, cx, cy, cz = bc(s)
        cand = _roots(b, c)
        if carry_r:
            return cand, cx, cy, cz, sph_ref[s, 6], sph_ref[s, 7]
        return cand, cx, cy, cz, sph_ref[s, 7]

    def body_at(U, candidate):
        def body(i, carry):
            s = i * U
            for k in range(U):
                carry = update(carry, candidate(s + k))
            return carry

        return body

    init = (
        (jnp.full(ox.shape, BIG, jnp.float32),)
        + (zeros, zeros, zeros)
        + ((jnp.full(ox.shape, 1.0, jnp.float32),) if carry_r else ())
        + (zeros,)
    )
    UH = _SPH_UNROLL
    carry = init
    if head_m:
        carry = jax.lax.fori_loop(
            0, head_m // UH, body_at(UH, candidate_moving), carry
        )
    if head_s:
        body = body_at(UH, candidate_static)

        def body_off(i, c):
            return body(i + head_m // UH, c)

        carry = jax.lax.fori_loop(0, head_s // UH, body_off, carry)

    best_t, bcx, bcy, bcz = carry[:4]
    bm = carry[-1]
    t_n = best_t if carry_r else jnp.minimum(best_t, 1e18)
    px = ox + t_n * dx - bcx
    py = oy + t_n * dy - bcy
    pz = oz + t_n * dz - bcz
    inv_r = (1.0 / carry[4]) if carry_r else jax.lax.rsqrt(
        px * px + py * py + pz * pz
    )
    t_ref[:] = best_t
    nx_ref[:] = px * inv_r
    ny_ref[:] = py * inv_r
    nz_ref[:] = pz * inv_r
    mat_ref[:] = bm.astype(jnp.int32)

    UC = _CELLBIN_UNROLL
    needy = _slab_interval_tmax(
        union_box, (ox, oy, oz), (dx, dy, dz), t_min, t_ref[:]
    )

    @pl.when(jnp.any(needy))
    def _():
        for m0, m1, s0, s1, box in cells:
            cross = needy & _slab_interval_tmax(
                box, (ox, oy, oz), (dx, dy, dz), t_min, t_ref[:]
            )

            @pl.when(jnp.any(cross))
            def _(m0=m0, m1=m1, s0=s0, s1=s1):
                zt = init
                if m1 > m0:
                    zt = jax.lax.fori_loop(
                        m0 // UC, m1 // UC,
                        body_at(UC, candidate_moving), zt,
                    )
                if s1 > s0:
                    zt = jax.lax.fori_loop(
                        s0 // UC, s1 // UC,
                        body_at(UC, candidate_static), zt,
                    )
                t2, cx2, cy2, cz2 = zt[:4]
                m2 = zt[-1]
                prev_t = t_ref[:]
                better = t2 < prev_t  # cell loop honors t_min already
                t2n = t2 if carry_r else jnp.minimum(t2, 1e18)
                px2 = ox + t2n * dx - cx2
                py2 = oy + t2n * dy - cy2
                pz2 = oz + t2n * dz - cz2
                inv2 = (1.0 / zt[4]) if carry_r else jax.lax.rsqrt(
                    px2 * px2 + py2 * py2 + pz2 * pz2
                )
                t_ref[:] = jnp.where(better, t2, prev_t)
                nx_ref[:] = jnp.where(better, px2 * inv2, nx_ref[:])
                ny_ref[:] = jnp.where(better, py2 * inv2, ny_ref[:])
                nz_ref[:] = jnp.where(better, pz2 * inv2, nz_ref[:])
                mat_ref[:] = jnp.where(
                    better, m2.astype(jnp.int32), mat_ref[:]
                )


def sphere_cellbin_hit_attrs(
    sph_cellbin_packed: jnp.ndarray,  # (N, 10) pack_cellbin_spheres table
    o,  # 3-tuple of (R,) planes
    d,
    tm: jnp.ndarray,  # (R,)
    *,
    meta: tuple,  # (head_m, head_s, cells, union_box) from pack
    pos_r: bool,
    expand: bool,
    needs_uv: bool,
    interpret: bool = False,
):
    """sphere_hit_attrs_planar drop-in with block-level lattice-cell
    pruning (same outputs; many-small-spheres scenes)."""
    head_m, head_s, cells, union_box = meta
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d, tm))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, mat = pl.pallas_call(
        functools.partial(
            _sphere_cellbin_kernel, head_m=head_m, head_s=head_s,
            cells=cells, union_box=union_box, t_min=1e-3, expand=expand,
            pos_r=pos_r,
        ),
        grid=(grid,),
        in_specs=[_sph_table_spec()] + [ray_spec] * 7,
        out_specs=(ray_spec,) * 5,
        out_shape=(f32, f32, f32, f32, i32),
        interpret=interpret,
    )(sph_cellbin_packed, *comps)
    return _sphere_uv_epilogue(t, nx, ny, nz, mat, R, needs_uv)


# ---------------------------------------------------------------------------
# Quads
# ---------------------------------------------------------------------------


def _quad_kernel(qd_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t_ref, idx_ref, *, n_quads: int, t_min: float):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    init_t = jnp.full(ox.shape, BIG, jnp.float32)
    init_i = jnp.full(ox.shape, -1, jnp.int32)

    def body(q, carry):
        best_t, best_i = carry
        nx_, ny_, nz_ = qd_ref[q, 0], qd_ref[q, 1], qd_ref[q, 2]
        D = qd_ref[q, 3]
        ax, ay, az, ca = qd_ref[q, 4], qd_ref[q, 5], qd_ref[q, 6], qd_ref[q, 7]
        bx, by, bz, cb = qd_ref[q, 8], qd_ref[q, 9], qd_ref[q, 10], qd_ref[q, 11]

        nd = nx_ * dx + ny_ * dy + nz_ * dz
        no = nx_ * ox + ny_ * oy + nz_ * oz
        t = (D - no) / nd
        alpha = (ax * ox + ay * oy + az * oz) + t * (ax * dx + ay * dy + az * dz) - ca
        beta = (bx * ox + by * oy + bz * oz) + t * (bx * dx + by * dy + bz * dz) - cb
        valid = (
            (jnp.abs(nd) >= 1e-8)
            & (t > t_min)
            & (alpha >= 0.0) & (alpha <= 1.0)
            & (beta >= 0.0) & (beta <= 1.0)
        )
        t = jnp.where(valid, t, BIG)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, q, best_i)
        return best_t, best_i

    # unrolled to amortize fori backedge overhead; pad rows have a zero
    # normal (nd == 0 -> parallel-miss reject)
    UNROLL = 8
    nu = (n_quads + UNROLL - 1) // UNROLL

    def ubody(i, carry):
        q = i * UNROLL
        for k in range(UNROLL):
            carry = body(q + k, carry)
        return carry

    best_t, best_i = jax.lax.fori_loop(0, nu, ubody, (init_t, init_i))
    t_ref[:] = best_t
    idx_ref[:] = best_i


def quad_closest_hit_planar(
    qd_packed: jnp.ndarray,  # (Q, 12) [n(3), D, avec(3), ca, bvec(3), cb]
    o,  # 3-tuple of (R,) planes
    d,
    *,
    n_quads: int,
    interpret: bool = False,
):
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d))
    t_out, idx_out = pl.pallas_call(
        functools.partial(_quad_kernel, n_quads=n_quads, t_min=1e-3),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        interpret=interpret,
    )(qd_packed, *comps)
    return t_out.reshape(R), idx_out.reshape(R)


def pack_quads(tables) -> jnp.ndarray:
    Q = tables.quad_n.shape[0]
    Q_pad = -(-Q // 8) * 8
    out = jnp.zeros((Q_pad, 12), jnp.float32)
    out = out.at[:Q, 0:3].set(tables.quad_n)
    out = out.at[:Q, 3].set(tables.quad_d)
    out = out.at[:Q, 4:7].set(tables.quad_avec)
    out = out.at[:Q, 7].set(tables.quad_ca)
    out = out.at[:Q, 8:11].set(tables.quad_bvec)
    out = out.at[:Q, 11].set(tables.quad_cb)
    return out


# ---------------------------------------------------------------------------
# Oriented boxes
# ---------------------------------------------------------------------------


def _safe_div_dir(x):
    mag = jnp.abs(x)
    sign = jnp.where(x >= 0.0, 1.0, -1.0)
    return jnp.where(mag < 1e-12, sign * 1e-12, x)


def _box_kernel(bx_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, mat_ref,
                *, n_boxes: int, t_min: float, rotated: bool):
    """Closest box hit (slab test) with winner attributes computed in-kernel.

    Equivalent to the reference compound6 six-quad scan (src/quad.cuh:124-139)
    with the make_box per-face UV (src/quad.cuh:145-162).  The winning box's
    12 packed params are carried through the min-update; face identification
    and UV are derived once after the loop.
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    zeros = jnp.zeros(ox.shape, jnp.float32)
    # Non-rotated scenes: pack_boxes folded the translation into min/max, so
    # the carry drops cos/sin/off (5 fewer selects per box per ray) and the
    # candidate skips the local-frame translation (3 fewer subs).
    init = (
        jnp.full(ox.shape, BIG, jnp.float32),
        zeros, zeros, zeros,  # bmin
        zeros + 1.0, zeros + 1.0, zeros + 1.0,  # bmax
    ) + (
        (zeros + 1.0, zeros, zeros, zeros, zeros) if rotated else ()  # cos sin off
    ) + (
        zeros,  # mat
    )

    def candidate(b):
        mnx, mny, mnz = bx_ref[b, 0], bx_ref[b, 1], bx_ref[b, 2]
        mxx, mxy, mxz = bx_ref[b, 3], bx_ref[b, 4], bx_ref[b, 5]
        m = bx_ref[b, 11]

        ldx, ldy, ldz = dx, dy, dz
        if rotated:
            offx, offy, offz = bx_ref[b, 8], bx_ref[b, 9], bx_ref[b, 10]
            lox = ox - offx
            loy = oy - offy
            loz = oz - offz
            ct, st = bx_ref[b, 6], bx_ref[b, 7]
            lox, loz = ct * lox - st * loz, st * lox + ct * loz
            ldx, ldz = ct * ldx - st * ldz, st * ldx + ct * ldz
            extra = (ct, st, offx, offy, offz)
        else:
            lox, loy, loz = ox, oy, oz
            extra = ()

        ix = 1.0 / _safe_div_dir(ldx)
        iy = 1.0 / _safe_div_dir(ldy)
        iz = 1.0 / _safe_div_dir(ldz)
        tax = (mnx - lox) * ix
        tbx = (mxx - lox) * ix
        tay = (mny - loy) * iy
        tby = (mxy - loy) * iy
        taz = (mnz - loz) * iz
        tbz = (mxz - loz) * iz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(tax, tbx), jnp.minimum(tay, tby)),
            jnp.minimum(taz, tbz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(tax, tbx), jnp.maximum(tay, tby)),
            jnp.maximum(taz, tbz),
        )
        through = t0 < t1
        t = jnp.where(
            through & (t0 > t_min),
            t0,
            jnp.where(through & (t1 > t_min), t1, BIG),
        )
        return t, (mnx, mny, mnz, mxx, mxy, mxz) + extra + (m,)

    def update(carry, cand):
        best_t = carry[0]
        t, params = cand
        better = t < best_t

        def sel(new, old):
            return jnp.where(better, new, old)

        return (sel(t, best_t),) + tuple(
            sel(p, c) for p, c in zip(params, carry[1:])
        )

    UNROLL = 16
    def body(i, carry):
        b = i * UNROLL
        for k in range(UNROLL):
            carry = update(carry, candidate(b + k))
        return carry

    nu = (n_boxes + UNROLL - 1) // UNROLL
    out = jax.lax.fori_loop(0, nu, body, init)
    best_t, mnx, mny, mnz, mxx, mxy, mxz = out[:7]
    if rotated:
        ct, st, offx, offy, offz = out[7:12]
    else:
        ones = jnp.ones(ox.shape, jnp.float32)
        zeros = jnp.zeros(ox.shape, jnp.float32)
        ct, st = ones, zeros
        offx = offy = offz = zeros
    bm = out[-1]

    _box_write_winner_attrs(
        ox, oy, oz, dx, dy, dz, best_t,
        mnx, mny, mnz, mxx, mxy, mxz, ct, st, offx, offy, offz, bm,
        t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, mat_ref,
        rotated=rotated,
    )


def _box_write_winner_attrs(ox, oy, oz, dx, dy, dz, best_t,
                            mnx, mny, mnz, mxx, mxy, mxz, ct, st,
                            offx, offy, offz, bm,
                            t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref,
                            mat_ref, *, rotated: bool):
    """Shared post-pass: face identification + make_box UV for the winning
    box (src/quad.cuh:145-162), written to the output refs."""
    # --- winner attributes: re-run the slab once for face identification ---
    lox = ox - offx
    loy = oy - offy
    loz = oz - offz
    ldx, ldy, ldz = dx, dy, dz
    if rotated:
        lox, loz = ct * lox - st * loz, st * lox + ct * loz
        ldx, ldz = ct * ldx - st * ldz, st * ldx + ct * ldz

    ix = 1.0 / _safe_div_dir(ldx)
    iy = 1.0 / _safe_div_dir(ldy)
    iz = 1.0 / _safe_div_dir(ldz)
    t0x = jnp.minimum((mnx - lox) * ix, (mxx - lox) * ix)
    t1x = jnp.maximum((mnx - lox) * ix, (mxx - lox) * ix)
    t0y = jnp.minimum((mny - loy) * iy, (mxy - loy) * iy)
    t1y = jnp.maximum((mny - loy) * iy, (mxy - loy) * iy)
    t0z = jnp.minimum((mnz - loz) * iz, (mxz - loz) * iz)
    t1z = jnp.maximum((mnz - loz) * iz, (mxz - loz) * iz)
    t_entry = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
    t_exit = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
    axis_entry = jnp.where(t0x >= jnp.maximum(t0y, t0z), 0,
                           jnp.where(t0y >= t0z, 1, 2))
    axis_exit = jnp.where(t1x <= jnp.minimum(t1y, t1z), 0,
                          jnp.where(t1y <= t1z, 1, 2))
    is_entry = jnp.abs(best_t - t_entry) <= jnp.abs(best_t - t_exit)
    axis = jnp.where(is_entry, axis_entry, axis_exit)

    ax = axis == 0
    ay = axis == 1
    d_axis = jnp.where(ax, ldx, jnp.where(ay, ldy, ldz))
    sgn = jnp.where(d_axis >= 0.0, 1.0, -1.0)
    n_val = -sgn  # shading normal faces against the ray
    outward_sgn = jnp.where(is_entry, -sgn, sgn)

    nlx = jnp.where(ax, n_val, 0.0)
    nly = jnp.where(ay, n_val, 0.0)
    nlz = jnp.where(ax | ay, 0.0, n_val)
    if rotated:
        # world = R(theta) * local
        nwx = ct * nlx + st * nlz
        nwz = -st * nlx + ct * nlz
    else:
        nwx, nwz = nlx, nlz

    x = lox + best_t * ldx
    y = loy + best_t * ldy
    z = loz + best_t * ldz
    wx = mxx - mnx
    wy = mxy - mny
    wz = mxz - mnz
    pos_face = outward_sgn > 0.0
    ua = jnp.where(
        ax,
        jnp.where(pos_face, (mxz - z) / wz, (z - mnz) / wz),
        jnp.where(
            ay,
            (x - mnx) / wx,
            jnp.where(pos_face, (x - mnx) / wx, (mxx - x) / wx),
        ),
    )
    va = jnp.where(
        ax,
        (y - mny) / wy,
        jnp.where(
            ay,
            jnp.where(pos_face, (mxz - z) / wz, (z - mnz) / wz),
            (y - mny) / wy,
        ),
    )

    t_ref[:] = best_t
    nx_ref[:] = nwx
    ny_ref[:] = nly
    nz_ref[:] = nwz
    u_ref[:] = ua
    v_ref[:] = va
    mat_ref[:] = bm.astype(jnp.int32)


def box_hit_attrs_planar(
    bx_packed: jnp.ndarray,  # (B, 12) [min(3), max(3), cos, sin, off(3), mat]
    o,  # 3-tuple of (R,) planes
    d,
    *,
    n_boxes: int,
    rotated: bool,
    interpret: bool = False,
):
    """Per-ray closest box hit with attributes:
    returns (t, normal 3-tuple, u, v, mat), each (R,)."""
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, u, v, mat = pl.pallas_call(
        functools.partial(
            _box_kernel, n_boxes=n_boxes, t_min=1e-3, rotated=rotated
        ),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 6,
        out_specs=(ray_spec,) * 7,
        out_shape=(f32, f32, f32, f32, f32, f32, i32),
        interpret=interpret,
    )(bx_packed, *comps)
    return (
        t.reshape(R),
        (nx.reshape(R), ny.reshape(R), nz.reshape(R)),
        u.reshape(R),
        v.reshape(R),
        mat.reshape(R),
    )


# ---------------------------------------------------------------------------
# Grid-box field kernel (shared-slab factorization over a regular lattice)
# ---------------------------------------------------------------------------


def _decode_cell(bcell, kz: int):
    """Split a flat f32 cell id into (ix, iz) lattice coordinates.

    floor(bcell * f32(1/kz)) alone is off by one whenever f32(1/kz)
    rounds below 1/kz (first at kz=41, where 41*f32(1/41) < 1), so apply
    the same one-step fixup refill_kernel uses for its reciprocal-floor
    divisions: clamp iz back into [0, kz) and carry into ix.
    """
    ix_f = jnp.floor(bcell * (1.0 / kz))
    iz_f = bcell - ix_f * kz
    over = iz_f >= kz
    under = iz_f < 0
    ix_f = jnp.where(over, ix_f + 1, jnp.where(under, ix_f - 1, ix_f))
    iz_f = jnp.where(over, iz_f - kz, jnp.where(under, iz_f + kz, iz_f))
    return ix_f, iz_f


def _box_grid_kernel(hb_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, mat_ref,
                     zsc,
                     *, kx: int, kz: int, x0: float, z0: float, w: float,
                     y0: float, t_min: float, uniform_mat: float = -1.0):
    """Closest hit over a (kx, kz) regular AABB grid with shared floor.

    Exploits the lattice structure the brute kernel can't see: the x-plane
    crossings of column ix are ``ex0 + ix * (w/dx)`` (one FMA per column,
    amortized over kz cells), the kz z-slabs are precomputed once into VMEM
    scratch, and the shared-floor y plane is computed once — leaving ~20
    VPU ops per cell vs ~37 for a brute AABB test.  Replaces the
    reference's per-box BVH traversal for the ground field
    (src/main.cu:509-514) with structure baked at scene compile.

    hb_ref is (kx, 2*kz): height y1 at [ix, 2*iz], material at
    [ix, 2*iz+1].  Empty cells have y1 == y0 (zero height: the strict
    t0 < t1 test can never pass).

    ``uniform_mat >= 0`` (builder-gated: every grid box shares one
    material, true for both reference ground fields) drops the per-cell
    material load and carry select — the winner material is the
    compile-time constant.
    """
    uni = uniform_mat >= 0.0
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    ixv = 1.0 / _safe_div_dir(dx)
    iyv = 1.0 / _safe_div_dir(dy)
    izv = 1.0 / _safe_div_dir(dz)
    ex0 = (x0 - ox) * ixv
    sxv = w * ixv
    ez0 = (z0 - oz) * izv
    szv = w * izv
    ty0p = (y0 - oy) * iyv  # shared floor plane

    for izc in range(kz):
        ta = ez0 + float(izc) * szv
        tb = ta + szv
        zsc[0, izc, :, :] = jnp.minimum(ta, tb)
        zsc[1, izc, :, :] = jnp.maximum(ta, tb)

    zeros = jnp.zeros(ox.shape, jnp.float32)
    init = (
        jnp.full(ox.shape, BIG, jnp.float32),  # t
        zeros,  # winning cell id (as f32)
        zeros + jnp.float32(y0),  # winning cell height
    ) + (() if uni else (zeros,))  # material id (as f32)

    def body(ixc, carry):
        fix = ixc.astype(jnp.float32)
        ta = ex0 + fix * sxv
        tb = ta + sxv
        xlo = jnp.minimum(ta, tb)
        xhi = jnp.maximum(ta, tb)
        for izc in range(kz):
            h = hb_ref[ixc, 2 * izc]
            ty1 = (h - oy) * iyv
            ylo = jnp.minimum(ty0p, ty1)
            yhi = jnp.maximum(ty0p, ty1)
            t0 = jnp.maximum(jnp.maximum(xlo, zsc[0, izc, :, :]), ylo)
            t1 = jnp.minimum(jnp.minimum(xhi, zsc[1, izc, :, :]), yhi)
            through = t0 < t1
            t = jnp.where(
                through & (t0 > t_min),
                t0,
                jnp.where(through & (t1 > t_min), t1, BIG),
            )
            better = t < carry[0]
            cellf = (ixc * kz + izc).astype(jnp.float32)
            cand = (t, cellf, h) + (
                () if uni else (hb_ref[ixc, 2 * izc + 1],)
            )
            carry = tuple(jnp.where(better, n, c) for n, c in zip(cand, carry))
        return carry

    carry = jax.lax.fori_loop(0, kx, body, init)
    best_t, bcell, bh = carry[:3]
    bm = jnp.full(ox.shape, uniform_mat, jnp.float32) if uni else carry[3]

    # Reconstruct the winner AABB arithmetically from its cell id (exact:
    # the builder verified x0 + k*w reproduces every box bound bit-for-bit).
    ix_f, iz_f = _decode_cell(bcell, kz)
    mnx = jnp.float32(x0) + ix_f * jnp.float32(w)
    mnz = jnp.float32(z0) + iz_f * jnp.float32(w)
    ones = jnp.ones(ox.shape, jnp.float32)
    _box_write_winner_attrs(
        ox, oy, oz, dx, dy, dz, best_t,
        mnx, ones * jnp.float32(y0), mnz,
        mnx + jnp.float32(w), bh, mnz + jnp.float32(w),
        ones, zeros, zeros, zeros, zeros, bm,
        t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, mat_ref,
        rotated=False,
    )


def box_grid_hit_attrs(
    box_grid: jnp.ndarray,  # (kx, kz, 2) [y1, mat] (tables.box_grid)
    o,  # 3-tuple of (R,) planes
    d,
    *,
    kx: int,
    kz: int,
    x0: float,
    z0: float,
    w: float,
    y0: float,
    uniform_mat: float = -1.0,
    interpret: bool = False,
):
    """Grid-field equivalent of box_hit_attrs_planar (same outputs)."""
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, u, v, mat = pl.pallas_call(
        functools.partial(
            _box_grid_kernel, kx=kx, kz=kz, x0=x0, z0=z0, w=w, y0=y0,
            t_min=1e-3, uniform_mat=uniform_mat,
        ),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 6,
        out_specs=(ray_spec,) * 7,
        out_shape=(f32, f32, f32, f32, f32, f32, i32),
        scratch_shapes=[pltpu.VMEM((2, kz, _SUBLANES, _LANES), jnp.float32)],
        interpret=interpret,
    )(box_grid.reshape(kx, 2 * kz), *comps)
    return (
        t.reshape(R),
        (nx.reshape(R), ny.reshape(R), nz.reshape(R)),
        u.reshape(R),
        v.reshape(R),
        mat.reshape(R),
    )


def _box_grid_static_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                            t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref,
                            mat_ref,
                            *, cells: tuple, kx: int, kz: int, x0: float,
                            z0: float, w: float, y0: float, t_min: float,
                            uniform_mat: float):
    """Fully-static grid form: every cell's (height, material) is a
    compile-time constant (builder bakes tables.box_grid_cells).

    The loop over cells is unrolled in Python and grouped by height, so
    the y-slab (ty1/ylo/yhi) is computed ONCE per distinct height instead
    of once per cell, column x-slabs and row z-slabs are computed once per
    column/row and reused from registers, and there are no table loads at
    all — ~14 VPU ops per cell vs ~19 for the looped grid kernel.  Empty
    cells are simply absent.  Candidate t math is case-equal to
    _box_grid_kernel's select tree, so hit sets match (t can wobble by
    ulps — separate programs fuse mul+add differently); exact ties
    between cells may pick a different (equally valid) winner cell
    because the merge order is height-grouped, not row-major.

    ``cells`` is ((height, mat, ((ix, iz), ...)), ...).
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    uni = uniform_mat >= 0.0

    ixv = 1.0 / _safe_div_dir(dx)
    iyv = 1.0 / _safe_div_dir(dy)
    izv = 1.0 / _safe_div_dir(dz)
    ex0 = (x0 - ox) * ixv
    sxv = w * ixv
    ez0 = (z0 - oz) * izv
    szv = w * izv
    ty0p = (y0 - oy) * iyv  # shared floor plane

    xcache: dict = {}
    zcache: dict = {}

    def xslab(ix):
        if ix not in xcache:
            ta = ex0 + float(ix) * sxv
            tb = ta + sxv
            xcache[ix] = (jnp.minimum(ta, tb), jnp.maximum(ta, tb))
        return xcache[ix]

    def zslab(iz):
        if iz not in zcache:
            ta = ez0 + float(iz) * szv
            tb = ta + szv
            zcache[iz] = (jnp.minimum(ta, tb), jnp.maximum(ta, tb))
        return zcache[iz]

    best_t = jnp.full(ox.shape, BIG, jnp.float32)
    zeros = jnp.zeros(ox.shape, jnp.float32)
    bcell = zeros
    bh = zeros + jnp.float32(y0)
    bm = None if uni else zeros

    for h, m, group in cells:
        ty1 = (jnp.float32(h) - oy) * iyv  # same form as the looped kernel
        ylo = jnp.minimum(ty0p, ty1)
        yhi = jnp.maximum(ty0p, ty1)
        for ix, iz in group:
            xlo, xhi = xslab(ix)
            zlo, zhi = zslab(iz)
            t0 = jnp.maximum(jnp.maximum(xlo, zlo), ylo)
            t1 = jnp.minimum(jnp.minimum(xhi, zhi), yhi)
            # case-equal refactor of the looped kernel's select tree:
            # t0 > t_min takes the entry plane, else the exit plane
            teff = jnp.where(t0 > t_min, t0, t1)
            better = (t0 < t1) & (teff > t_min) & (teff < best_t)
            best_t = jnp.where(better, teff, best_t)
            bcell = jnp.where(better, jnp.float32(ix * kz + iz), bcell)
            bh = jnp.where(better, jnp.float32(h), bh)
            if not uni:
                bm = jnp.where(better, jnp.float32(m), bm)
    if uni:
        bm = jnp.full(ox.shape, uniform_mat, jnp.float32)

    ix_f, iz_f = _decode_cell(bcell, kz)
    mnx = jnp.float32(x0) + ix_f * jnp.float32(w)
    mnz = jnp.float32(z0) + iz_f * jnp.float32(w)
    ones = jnp.ones(ox.shape, jnp.float32)
    _box_write_winner_attrs(
        ox, oy, oz, dx, dy, dz, best_t,
        mnx, ones * jnp.float32(y0), mnz,
        mnx + jnp.float32(w), bh, mnz + jnp.float32(w),
        ones, zeros, zeros, zeros, zeros, bm,
        t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, mat_ref,
        rotated=False,
    )


def box_grid_static_hit_attrs(
    o,  # 3-tuple of (R,) planes
    d,
    *,
    cells: tuple,  # tables.box_grid_cells
    kx: int,
    kz: int,
    x0: float,
    z0: float,
    w: float,
    y0: float,
    uniform_mat: float = -1.0,
    interpret: bool = False,
):
    """box_grid_hit_attrs with the cell table baked at compile time."""
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, u, v, mat = pl.pallas_call(
        functools.partial(
            _box_grid_static_kernel, cells=cells, kx=kx, kz=kz, x0=x0,
            z0=z0, w=w, y0=y0, t_min=1e-3, uniform_mat=uniform_mat,
        ),
        grid=(grid,),
        in_specs=[ray_spec] * 6,
        out_specs=(ray_spec,) * 7,
        out_shape=(f32, f32, f32, f32, f32, f32, i32),
        interpret=interpret,
    )(*comps)
    return (
        t.reshape(R),
        (nx.reshape(R), ny.reshape(R), nz.reshape(R)),
        u.reshape(R),
        v.reshape(R),
        mat.reshape(R),
    )


BOX_CLUSTER = 64  # boxes per cluster (BVH-leaf-order groups)


def _box_cluster_kernel(bx_ref, cl_ref, ox_ref, oy_ref, oz_ref,
                        dx_ref, dy_ref, dz_ref,
                        t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, mat_ref,
                        scratch,
                        *, n_clusters: int, t_min: float, rotated: bool):
    """Closest box hit with block-level cluster culling (see
    _sphere_cluster_kernel for the design rationale).  The 13 winner
    parameters live in one (13, SUB, LANES) VMEM scratch buffer."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    wix = 1.0 / _safe_div_dir(dx)
    wiy = 1.0 / _safe_div_dir(dy)
    wiz = 1.0 / _safe_div_dir(dz)

    zeros = jnp.zeros(ox.shape, jnp.float32)
    scratch[0] = jnp.full(ox.shape, BIG, jnp.float32)  # best_t
    for i in (1, 2, 3):  # bmin
        scratch[i] = zeros
    for i in (4, 5, 6):  # bmax
        scratch[i] = zeros + 1.0
    scratch[7] = zeros + 1.0  # cos
    scratch[8] = zeros  # sin
    for i in (9, 10, 11):  # off
        scratch[i] = zeros
    scratch[12] = zeros  # mat

    def candidate(b):
        mnx, mny, mnz = bx_ref[b, 0], bx_ref[b, 1], bx_ref[b, 2]
        mxx, mxy, mxz = bx_ref[b, 3], bx_ref[b, 4], bx_ref[b, 5]
        offx, offy, offz = bx_ref[b, 8], bx_ref[b, 9], bx_ref[b, 10]
        m = bx_ref[b, 11]

        lox = ox - offx
        loy = oy - offy
        loz = oz - offz
        ldx, ldy, ldz = dx, dy, dz
        if rotated:
            ct, st = bx_ref[b, 6], bx_ref[b, 7]
            lox, loz = ct * lox - st * loz, st * lox + ct * loz
            ldx, ldz = ct * ldx - st * ldz, st * ldx + ct * ldz
        else:
            ct = jnp.float32(1.0)
            st = jnp.float32(0.0)

        ix = 1.0 / _safe_div_dir(ldx)
        iy = 1.0 / _safe_div_dir(ldy)
        iz = 1.0 / _safe_div_dir(ldz)
        tax = (mnx - lox) * ix
        tbx = (mxx - lox) * ix
        tay = (mny - loy) * iy
        tby = (mxy - loy) * iy
        taz = (mnz - loz) * iz
        tbz = (mxz - loz) * iz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(tax, tbx), jnp.minimum(tay, tby)),
            jnp.minimum(taz, tbz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(tax, tbx), jnp.maximum(tay, tby)),
            jnp.maximum(taz, tbz),
        )
        through = t0 < t1
        t = jnp.where(
            through & (t0 > t_min),
            t0,
            jnp.where(through & (t1 > t_min), t1, BIG),
        )
        return t, (mnx, mny, mnz, mxx, mxy, mxz, ct, st, offx, offy, offz, m)

    def cluster_body(c, _):
        mn_x = cl_ref[c, 0]
        mn_y = cl_ref[c, 1]
        mn_z = cl_ref[c, 2]
        mx_x = cl_ref[c, 3]
        mx_y = cl_ref[c, 4]
        mx_z = cl_ref[c, 5]
        tax = (mn_x - ox) * wix
        tbx = (mx_x - ox) * wix
        tay = (mn_y - oy) * wiy
        tby = (mx_y - oy) * wiy
        taz = (mn_z - oz) * wiz
        tbz = (mx_z - oz) * wiz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(tax, tbx), jnp.minimum(tay, tby)),
            jnp.minimum(taz, tbz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(tax, tbx), jnp.maximum(tay, tby)),
            jnp.maximum(taz, tbz),
        )
        hit = jnp.maximum(t0, t_min) <= jnp.minimum(t1, scratch[0])

        @pl.when(jnp.any(hit))
        def _():
            carry = [scratch[i] for i in range(13)]
            for k in range(BOX_CLUSTER):
                t, params = candidate(c * BOX_CLUSTER + k)
                better = t < carry[0]
                carry[0] = jnp.where(better, t, carry[0])
                for j, p in enumerate(params):
                    carry[j + 1] = jnp.where(better, p, carry[j + 1])
            for i in range(13):
                scratch[i] = carry[i]

        return 0

    jax.lax.fori_loop(0, n_clusters, cluster_body, 0)

    _box_write_winner_attrs(
        ox, oy, oz, dx, dy, dz, scratch[0],
        scratch[1], scratch[2], scratch[3], scratch[4], scratch[5],
        scratch[6], scratch[7], scratch[8], scratch[9], scratch[10],
        scratch[11], scratch[12],
        t_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref, mat_ref,
        rotated=rotated,
    )


def box_hit_attrs_clustered(
    box_cl_packed: jnp.ndarray,  # (B_pad, 12) BVH-leaf-ordered box rows
    box_cl_box: jnp.ndarray,  # (C, 8) world-space cluster AABBs
    o,
    d,
    *,
    n_clusters: int,
    rotated: bool,
    interpret: bool = False,
):
    """Cluster-culled equivalent of box_hit_attrs_planar (same outputs)."""
    R = o[0].shape[0]
    rows, grid, ray_spec = _ray_grid(R)

    def plane(x):
        return x.reshape(rows, _LANES)

    comps = tuple(plane(c) for c in (*o, *d))
    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    t, nx, ny, nz, u, v, mat = pl.pallas_call(
        functools.partial(
            _box_cluster_kernel,
            n_clusters=n_clusters, t_min=1e-3, rotated=rotated,
        ),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [ray_spec] * 6,
        out_specs=(ray_spec,) * 7,
        out_shape=(f32, f32, f32, f32, f32, f32, i32),
        scratch_shapes=[pltpu.VMEM((13, _SUBLANES, _LANES), jnp.float32)],
        interpret=interpret,
    )(box_cl_packed, box_cl_box, *comps)
    return (
        t.reshape(R),
        (nx.reshape(R), ny.reshape(R), nz.reshape(R)),
        u.reshape(R),
        v.reshape(R),
        mat.reshape(R),
    )


def cluster_boxes(tables):
    """Host-side: BVH-leaf-order box clustering for the culled kernel.

    Returns (box_cl_packed (B_pad, 12), box_cl_box (C, 8), n_clusters)."""
    import numpy as np

    from art_tpu.ops.bvh import box_world_bounds, cluster_primitives

    bmin, bmax = box_world_bounds(
        np.asarray(tables.box_min), np.asarray(tables.box_max),
        np.asarray(tables.box_cos), np.asarray(tables.box_sin),
        np.asarray(tables.box_off),
    )
    packed = np.asarray(pack_boxes(tables))[: tables.n_boxes]
    # pad rows must be inert: zero-size box at the origin never passes the
    # strict t0 < t1 test
    reordered, boxes, n_cl, _ = cluster_primitives(
        bmin, bmax, packed, BOX_CLUSTER,
        pad_row=np.array([0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0], np.float32),
    )
    return jnp.asarray(reordered), jnp.asarray(boxes), n_cl


def pack_boxes(tables) -> jnp.ndarray:
    """(B_pad, 12) packed box table: [min(3) max(3) cos sin off(3) mat].

    Padded to a multiple of 16 for the unrolled kernel loop; pad rows are
    zero-size boxes (t_entry == t_exit, never `through`).

    When the scene has no rotated boxes the translation offsets are folded
    into min/max (world-space AABBs, off := 0) so the kernel's non-rotated
    path skips the local-frame translation and its winner carry entirely."""
    B = tables.box_min.shape[0]
    B_pad = -(-B // 16) * 16
    out = jnp.zeros((B_pad, 12), jnp.float32)
    if tables.has_rotated_boxes:
        out = out.at[:B, 0:3].set(tables.box_min)
        out = out.at[:B, 3:6].set(tables.box_max)
        out = out.at[:B, 8:11].set(tables.box_off)
    else:
        out = out.at[:B, 0:3].set(tables.box_min + tables.box_off)
        out = out.at[:B, 3:6].set(tables.box_max + tables.box_off)
    out = out.at[:B, 6].set(tables.box_cos)
    out = out.at[:B, 7].set(tables.box_sin)
    out = out.at[:B, 11].set(tables.box_mat.astype(jnp.float32))
    return out
