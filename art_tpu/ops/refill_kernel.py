"""Fused wavefront-refill Pallas kernel.

The refill stage of the persistent ray pool (render/integrator.py) is pure
elementwise work plus one global prefix sum, but as XLA ops inside the
while-loop body it fragments into dozens of small fusions whose dispatch
overheads dominate (~0.5-1.0 ms/iter measured, vs ~0.1 ms of actual math —
docs/PERF_NOTES.md round 2).  This kernel performs the whole stage in one
launch:

* global work-stealing rank: block-local exclusive cumsum of the dead mask
  + a running scalar carry in SMEM across the (sequential) TPU grid;
* queue element -> (sample, pixel) decomposition and sub-pixel jitter
  (reference src/main.cu:119-125);
* thin-lens + shutter camera ray generation (src/camera.cuh:35-47);
* masked merge of the fresh rays into the pool state planes.

The queue id is tracked as a (sample_base, pixel_base) pair so all integer
arithmetic stays below 2^18 and is exact in f32 (n_q itself can exceed the
f32-exact integer range).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 64
RAY_BLOCK = _SUBLANES * _LANES
_GROUP = 16  # sublane rows per flush dot (see ops/flush_kernel.py)


def _refill_kernel(scal_ref, cam_ref,
                   uj0_ref, uj1_ref, ul0_ref, ul1_ref, ut_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                   t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
                   bounce_ref, pix_ref, act_ref,
                   oxo, oyo, ozo, dxo, dyo, dzo, tmo,
                   t0o, t1o, t2o, r0o, r1o, r2o,
                   bounceo, pixo, acto, tko,
                   carry_smem):
    """Thin wrapper: uniforms arrive as input refs (XLA threefry path)."""
    _refill_body(
        scal_ref, cam_ref,
        uj0_ref[:], uj1_ref[:], ul0_ref[:], ul1_ref[:], ut_ref[:],
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
        t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
        bounce_ref, pix_ref, act_ref,
        oxo, oyo, ozo, dxo, dyo, dzo, tmo,
        t0o, t1o, t2o, r0o, r1o, r2o,
        bounceo, pixo, acto, tko, carry_smem,
    )


def _refill_compute(scal_ref, cam_ref,
                    uj0, uj1, ul0, ul1, ut,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                    t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
                    bounce_ref, pix_ref, act_ref,
                    carry_smem, zero_dead_radiance=False):
    """Refill stage as VALUES (shared by _refill_body and the short-path
    megakernel, ops/sp_kernel.py, which keeps bouncing the refilled rays
    in-register instead of writing them out).

    One grid step = one (SUBLANES, LANES) slot block.

    scal_ref (SMEM i32): [p_base, s_base, spp, P, pix_offset, total_pixels,
                          nx, ny]
    cam_ref  (SMEM f32): [origin(3), llc(3), horizontal(3), vertical(3),
                          u(3), v(3), lens_radius, time0, time1]
    carry_smem (SMEM i32 scratch): running dead count across blocks
    (updated here).

    Returns a dict of the 16 refilled state planes plus nothing else;
    the take-count total lives in carry_smem[1].
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_smem[0] = 0
        carry_smem[1] = 0

    act = act_ref[:]
    dead = act == 0
    dead_i = dead.astype(jnp.int32)

    # ---- global exclusive rank of each dead slot ----
    # Mosaic has no cumsum lowering; prefix sums run on the MXU as
    # triangular matmuls (exact in f32: counts <= 8192 << 2^24).
    dead_f = dead_i.astype(jnp.float32)
    li = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    lower_lanes = (li <= lj).astype(jnp.float32)  # (LANES, LANES)
    lane_inc = jnp.dot(
        dead_f, lower_lanes, preferred_element_type=jnp.float32
    )  # inclusive prefix along lanes
    row_tot = lane_inc[:, _LANES - 1:_LANES]  # (SUB, 1)
    si = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _SUBLANES), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _SUBLANES), 1)
    strict_lower = (sj < si).astype(jnp.float32)  # (SUB, SUB)
    row_off = jnp.dot(
        strict_lower, row_tot, preferred_element_type=jnp.float32
    )  # exclusive prefix of row totals
    rank = (
        carry_smem[0]
        + (row_off + (lane_inc - dead_f)).astype(jnp.int32)
    )

    p_base = scal_ref[0]
    s_base = scal_ref[1]
    spp = scal_ref[2]
    P = scal_ref[3]
    pix_offset = scal_ref[4]
    total_pixels = scal_ref[5]
    nx = scal_ref[6]
    ny = scal_ref[7]

    # queue id = (p_base, s_base) + rank with rank + s_base < R + spp:
    # SAMPLE-major order — qr = s_base + rank; pixel row advances by
    # qr // spp and sample = qr % spp.  Consecutive queue ids map to the
    # SAME pixel (spp in a row), so live pixels always form a narrow
    # monotone band: the windowed framebuffer flush (ops/flush_kernel.py)
    # depends on this.  All integer arithmetic stays below 2^18+spp and is
    # exact in f32 (n_q itself can exceed the f32-exact integer range).
    qr = s_base + rank
    qrf = qr.astype(jnp.float32)
    sppf = spp.astype(jnp.float32)
    j = jnp.floor(qrf * (1.0 / sppf)).astype(jnp.int32)
    rem = qr - j * spp
    # one-step correction for the reciprocal rounding
    over = rem >= spp
    under = rem < 0
    j = jnp.where(over, j + 1, jnp.where(under, j - 1, j))
    rem = jnp.where(over, rem - spp, jnp.where(under, rem + spp, rem))
    p_row = p_base + j
    take = dead & (p_row < P)
    pixel = jnp.minimum(pix_offset + p_row, total_pixels - 1)
    # pixel < total_pixels <= 2^24: i/j decomposition exact in f32
    pixf = pixel.astype(jnp.float32)
    nxf = nx.astype(jnp.float32)
    pj = jnp.floor(pixf * (1.0 / nxf)).astype(jnp.int32)
    pi = pixel - pj * nx
    over = pi >= nx
    under = pi < 0
    pj = jnp.where(over, pj + 1, jnp.where(under, pj - 1, pj))
    pi = jnp.where(over, pi - nx, jnp.where(under, pi + nx, pi))

    s = (pi.astype(jnp.float32) + uj0) / nxf
    t = (pj.astype(jnp.float32) + uj1) / ny.astype(jnp.float32)

    # ---- thin-lens + shutter camera (src/camera.cuh:35-47) ----
    lens_radius = cam_ref[18]
    time0 = cam_ref[19]
    time1 = cam_ref[20]
    r = lens_radius * jnp.sqrt(ul0)
    phi = (2.0 * jnp.pi) * ul1
    rdx = r * jnp.cos(phi)
    rdy = r * jnp.sin(phi)
    tm_new = time0 + ut * (time1 - time0)

    o_new = []
    d_new = []
    for c in range(3):
        oc = cam_ref[0 + c] + rdx * cam_ref[12 + c] + rdy * cam_ref[15 + c]
        dc = (cam_ref[3 + c] + s * cam_ref[6 + c] + t * cam_ref[9 + c]) - oc
        o_new.append(oc)
        d_new.append(dc)

    # ---- masked merge into the pool ----
    ones = jnp.ones(act.shape, jnp.float32)
    zeros = jnp.zeros(act.shape, jnp.float32)
    # Seam-merged flush mode: every dead slot's radiance was flushed to the
    # framebuffer just above, so zero it for ALL dead slots (not only taken
    # ones) — a dead slot kept past queue exhaustion must not be re-added.
    rz = dead if zero_dead_radiance else take
    vals = dict(
        ox=jnp.where(take, o_new[0], ox_ref[:]),
        oy=jnp.where(take, o_new[1], oy_ref[:]),
        oz=jnp.where(take, o_new[2], oz_ref[:]),
        dx=jnp.where(take, d_new[0], dx_ref[:]),
        dy=jnp.where(take, d_new[1], dy_ref[:]),
        dz=jnp.where(take, d_new[2], dz_ref[:]),
        tm=jnp.where(take, tm_new, tm_ref[:]),
        t0=jnp.where(take, ones, t0_ref[:]),
        t1=jnp.where(take, ones, t1_ref[:]),
        t2=jnp.where(take, ones, t2_ref[:]),
        r0=jnp.where(rz, zeros, r0_ref[:]),
        r1=jnp.where(rz, zeros, r1_ref[:]),
        r2=jnp.where(rz, zeros, r2_ref[:]),
        bounce=jnp.where(take, 0, bounce_ref[:]),
        pix=jnp.where(take, p_row, pix_ref[:]),
        act=((act != 0) | take).astype(jnp.int32),
    )

    # ---- carries ----
    carry_smem[0] = carry_smem[0] + jnp.sum(dead_i)
    carry_smem[1] = carry_smem[1] + jnp.sum(take.astype(jnp.int32))
    return vals


def _refill_body(scal_ref, cam_ref,
                 uj0, uj1, ul0, ul1, ut,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                 t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
                 bounce_ref, pix_ref, act_ref,
                 oxo, oyo, ozo, dxo, dyo, dzo, tmo,
                 t0o, t1o, t2o, r0o, r1o, r2o,
                 bounceo, pixo, acto, tko,
                 carry_smem, zero_dead_radiance=False):
    """_refill_compute + plane writeback (see its docstring).

    tko: (1, 1) i32 output — total taken count (written at the last block).
    """
    vals = _refill_compute(
        scal_ref, cam_ref, uj0, uj1, ul0, ul1, ut,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
        t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
        bounce_ref, pix_ref, act_ref,
        carry_smem, zero_dead_radiance=zero_dead_radiance,
    )
    for ref, name in zip(
        (oxo, oyo, ozo, dxo, dyo, dzo, tmo, t0o, t1o, t2o, r0o, r1o, r2o,
         bounceo, pixo, acto),
        _REFILL_NAMES_F + _REFILL_NAMES_I,
    ):
        ref[:] = vals[name]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        tko[0, 0] = carry_smem[1]


def _make_rng_kernel(n_media: int):
    """Refill kernel variant that also GENERATES every uniform the bounce
    needs via the TPU hardware PRNG (pltpu.prng_random_bits), seeded per
    (iteration, grid block): kills the per-iteration XLA threefry block.

    Extra outputs (after the 16 state planes + take count): ball(3),
    choice(1), media(n_media) uniform planes for the downstream shade/media
    stages; the jitter/lens/time draws are consumed in-kernel.
    """

    def kernel(*refs):
        (scal_ref, cam_ref, seed_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
         t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
         bounce_ref, pix_ref, act_ref) = refs[:19]
        outs = refs[19:19 + 16]
        tko = refs[19 + 16]
        u_outs = refs[19 + 17:19 + 17 + 4 + n_media]
        carry_smem = refs[-1]

        b = pl.program_id(0)
        # max 2 seed values: mix the grid block id into the first
        pltpu.prng_seed(seed_ref[0] ^ (b * jnp.int32(-1640531527)), seed_ref[1])

        shape = ox_ref.shape

        def u01():
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            # Mosaic has no uint32->f32 cast; after >>8 the sign bit is
            # clear, so the int32 bitcast has the same value
            top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
            return top24.astype(jnp.float32) * (1.0 / 16777216.0)

        uj0, uj1, ul0, ul1, ut = u01(), u01(), u01(), u01(), u01()
        for uo in u_outs:
            uo[:] = u01()

        _refill_body(
            scal_ref, cam_ref, uj0, uj1, ul0, ul1, ut,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
            bounce_ref, pix_ref, act_ref,
            *outs, tko, carry_smem,
        )

    return kernel


def fused_refill_rng(
    state_planes,
    key2: jnp.ndarray,  # (2,) int32 per-iteration seed material
    cam_vec: jnp.ndarray,  # (21,) f32 packed camera
    scal: jnp.ndarray,  # (8,) i32 [p_base, s_base, spp, P, pix_offset, total, nx, ny]
    n_media: int,
):
    """fused_refill + hardware-PRNG uniforms.

    Returns (new_planes dict, take_count (), u_ball 3-tuple, u_choice,
    u_media tuple of n_media planes)."""
    R = state_planes["ox"].shape[0]
    assert R % RAY_BLOCK == 0, R  # ragged pools silently truncate the grid
    rows = R // _LANES
    grid = rows // _SUBLANES
    spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def plane(x):
        return x.reshape(rows, _LANES)

    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)

    names_f = ["ox", "oy", "oz", "dx", "dy", "dz", "tm",
               "t0", "t1", "t2", "r0", "r1", "r2"]
    names_i = ["bounce", "pix", "act"]
    n_u = 4 + n_media

    ins = (
        [scal, cam_vec, key2]
        + [plane(state_planes[n]) for n in names_f]
        + [plane(state_planes[n]) for n in names_i]
    )
    outs = pl.pallas_call(
        _make_rng_kernel(n_media),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 + [spec] * 16,
        out_specs=(spec,) * 16
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        + (spec,) * n_u,
        out_shape=tuple(
            [f32] * 13 + [i32] * 3
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
            + [f32] * n_u
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
    )(*ins)

    new = {}
    for k, name in enumerate(names_f + names_i):
        new[name] = outs[k].reshape(R)
    take_count = outs[16][0, 0]
    us = [outs[17 + i].reshape(R) for i in range(n_u)]
    return new, take_count, tuple(us[0:3]), us[3], tuple(us[4:])


def fused_refill(
    state_planes,  # dict of pool planes, see below
    uniforms,  # (uj0, uj1, ul0, ul1, ut) each (R,)
    cam_vec: jnp.ndarray,  # (21,) f32 packed camera
    scal: jnp.ndarray,  # (8,) i32 [p_base, s_base, spp, P, pix_offset, total, nx, ny]
    *,
    interpret: bool = False,
):
    """Returns (new_planes dict, take_count ())."""
    R = state_planes["ox"].shape[0]
    assert R % RAY_BLOCK == 0, R  # ragged pools silently truncate the grid
    rows = R // _LANES
    grid = rows // _SUBLANES
    spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def plane(x):
        return x.reshape(rows, _LANES)

    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)

    names_f = ["ox", "oy", "oz", "dx", "dy", "dz", "tm",
               "t0", "t1", "t2", "r0", "r1", "r2"]
    names_i = ["bounce", "pix", "act"]

    ins = (
        [scal, cam_vec]
        + [plane(u) for u in uniforms]
        + [plane(state_planes[n]) for n in names_f]
        + [plane(state_planes[n]) for n in names_i]
    )
    outs = pl.pallas_call(
        _refill_kernel,
        grid=(grid,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [spec] * (5 + 16)
        ),
        out_specs=(spec,) * 16 + (
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=tuple([f32] * 13 + [i32] * 3
                        + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(*ins)

    new = {}
    for k, name in enumerate(names_f + names_i):
        new[name] = outs[k].reshape(R)
    take_count = outs[16][0, 0]
    return new, take_count


# ---------------------------------------------------------------------------
# Seam-merged flush + refill
# ---------------------------------------------------------------------------
#
# In the loop body [refill -> bounce -> flush], the flush of iteration i is
# immediately followed by the refill of iteration i+1, and both are
# elementwise/MXU passes over the same slot blocks.  Rotating the seam into
# ONE kernel (flush the radiance of every currently-dead slot, then refill)
# removes a pallas launch plus the XLA window glue per iteration.  The
# rotation is exact:
#   * a slot that died in bounce i is dead at the top of iteration i+1 and
#     its radiance planes still hold the dead value -> flushed here;
#   * a dead slot that could not be refilled (queue exhausted) had its
#     radiance zeroed when first flushed (zero_dead_radiance above), so
#     re-flushing it accumulates exact zeros;
#   * slots that die in the FINAL bounce are flushed by one standalone
#     flush_accumulate call after the while_loop (render/integrator.py).


def _flush_dead(b, base_ref, pix, dead, r0, r1, r2, fb_ref, fbo,
                oh_s, w_s, n_hi: int):
    """One-hot MXU accumulate of dead slots' radiance into the fb window
    (same layout/trick as ops/flush_kernel._flush_kernel)."""
    hi = jax.lax.shift_right_logical(pix, 7) - base_ref[0]
    lo = jax.lax.bitwise_and(pix, 127)
    ok = dead & (hi >= 0) & (hi < n_hi)
    hi = jnp.where(ok, hi, n_hi)

    @pl.when(b == 0)
    def _():
        fbo[:] = fb_ref[:]

    from art_tpu.ops.flush_kernel import one_hot_accumulate

    one_hot_accumulate(hi, lo, (r0, r1, r2), fbo, oh_s, w_s, n_hi=n_hi)


def _make_rng_flush_kernel(n_media: int, n_hi: int):
    """_make_rng_kernel + the seam-merged framebuffer flush."""

    def kernel(*refs):
        (scal_ref, cam_ref, seed_ref, base_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
         t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
         bounce_ref, pix_ref, act_ref, fb_ref) = refs[:21]
        outs = refs[21:21 + 16]
        tko = refs[21 + 16]
        u_outs = refs[21 + 17:21 + 17 + 4 + n_media]
        fbo = refs[21 + 17 + 4 + n_media]
        carry_smem, oh_s, w_s = refs[-3:]

        b = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] ^ (b * jnp.int32(-1640531527)), seed_ref[1])
        shape = ox_ref.shape

        def u01():
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
            return top24.astype(jnp.float32) * (1.0 / 16777216.0)

        uj0, uj1, ul0, ul1, ut = u01(), u01(), u01(), u01(), u01()
        for uo in u_outs:
            uo[:] = u01()

        dead = act_ref[:] == 0
        _flush_dead(
            b, base_ref, pix_ref[:], dead,
            r0_ref[:], r1_ref[:], r2_ref[:],
            fb_ref, fbo, oh_s, w_s, n_hi,
        )
        _refill_body(
            scal_ref, cam_ref, uj0, uj1, ul0, ul1, ut,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
            bounce_ref, pix_ref, act_ref,
            *outs, tko, carry_smem, zero_dead_radiance=True,
        )

    return kernel


def _make_flush_kernel(n_hi: int):
    """Uniforms-as-inputs variant (interpret-mode testable)."""

    def kernel(*refs):
        (scal_ref, cam_ref, base_ref,
         uj0_ref, uj1_ref, ul0_ref, ul1_ref, ut_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
         t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
         bounce_ref, pix_ref, act_ref, fb_ref) = refs[:25]
        outs = refs[25:25 + 16]
        tko = refs[25 + 16]
        fbo = refs[25 + 17]
        carry_smem, oh_s, w_s = refs[-3:]

        b = pl.program_id(0)
        dead = act_ref[:] == 0
        _flush_dead(
            b, base_ref, pix_ref[:], dead,
            r0_ref[:], r1_ref[:], r2_ref[:],
            fb_ref, fbo, oh_s, w_s, n_hi,
        )
        _refill_body(
            scal_ref, cam_ref,
            uj0_ref[:], uj1_ref[:], ul0_ref[:], ul1_ref[:], ut_ref[:],
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
            bounce_ref, pix_ref, act_ref,
            *outs, tko, carry_smem, zero_dead_radiance=True,
        )

    return kernel


_REFILL_NAMES_F = ["ox", "oy", "oz", "dx", "dy", "dz", "tm",
                   "t0", "t1", "t2", "r0", "r1", "r2"]
_REFILL_NAMES_I = ["bounce", "pix", "act"]


def _flush_scratch(n_hi: int):
    return [
        pltpu.SMEM((2,), jnp.int32),
        pltpu.VMEM((n_hi, _GROUP * _LANES), jnp.bfloat16),
        pltpu.VMEM((3 * _LANES, _GROUP * _LANES), jnp.bfloat16),
    ]


def fused_refill_flush_rng(
    state_planes,
    key2: jnp.ndarray,  # (2,) int32 per-iteration seed material
    cam_vec: jnp.ndarray,  # (21,) f32 packed camera
    scal: jnp.ndarray,  # (8,) i32
    fb: jnp.ndarray,  # (n_hi, 384) f32 accumulator window
    base,  # () int32 first fb row the window covers
    n_media: int,
):
    """Seam-merged flush+refill with hardware-PRNG uniforms.

    Returns (new_planes, take_count, u_ball, u_choice, u_media, fb_out)."""
    R = state_planes["ox"].shape[0]
    assert R % RAY_BLOCK == 0, R  # ragged pools silently truncate the grid
    rows = R // _LANES
    grid = rows // _SUBLANES
    n_hi = fb.shape[0]
    spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec((n_hi, 3 * _LANES), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)

    def plane(x):
        return x.reshape(rows, _LANES)

    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    n_u = 4 + n_media

    ins = (
        [scal, cam_vec, key2, jnp.reshape(base, (1,)).astype(jnp.int32)]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_F]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_I]
        + [fb]
    )
    outs = pl.pallas_call(
        _make_rng_flush_kernel(n_media, n_hi),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
        + [spec] * 16 + [fb_spec],
        out_specs=(spec,) * 16
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        + (spec,) * n_u
        + (fb_spec,),
        out_shape=tuple(
            [f32] * 13 + [i32] * 3
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
            + [f32] * n_u
            + [jax.ShapeDtypeStruct((n_hi, 3 * _LANES), jnp.float32)]
        ),
        scratch_shapes=_flush_scratch(n_hi),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*ins)

    new = {}
    for k, name in enumerate(_REFILL_NAMES_F + _REFILL_NAMES_I):
        new[name] = outs[k].reshape(R)
    take_count = outs[16][0, 0]
    us = [outs[17 + i].reshape(R) for i in range(n_u)]
    fb_out = outs[17 + n_u]
    return new, take_count, tuple(us[0:3]), us[3], tuple(us[4:]), fb_out


def fused_refill_flush(
    state_planes,
    uniforms,  # (uj0, uj1, ul0, ul1, ut) each (R,)
    cam_vec: jnp.ndarray,
    scal: jnp.ndarray,
    fb: jnp.ndarray,  # (n_hi, 384)
    base,
    *,
    interpret: bool = False,
):
    """Seam-merged flush+refill, uniforms as inputs (testable in interpret
    mode).  Returns (new_planes, take_count, fb_out)."""
    R = state_planes["ox"].shape[0]
    assert R % RAY_BLOCK == 0, R  # ragged pools silently truncate the grid
    rows = R // _LANES
    grid = rows // _SUBLANES
    n_hi = fb.shape[0]
    spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec((n_hi, 3 * _LANES), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)

    def plane(x):
        return x.reshape(rows, _LANES)

    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)

    ins = (
        [scal, cam_vec, jnp.reshape(base, (1,)).astype(jnp.int32)]
        + [plane(u) for u in uniforms]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_F]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_I]
        + [fb]
    )
    outs = pl.pallas_call(
        _make_flush_kernel(n_hi),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [spec] * (5 + 16) + [fb_spec],
        out_specs=(spec,) * 16
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        + (fb_spec,),
        out_shape=tuple(
            [f32] * 13 + [i32] * 3
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
            + [jax.ShapeDtypeStruct((n_hi, 3 * _LANES), jnp.float32)]
        ),
        scratch_shapes=_flush_scratch(n_hi),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*ins)

    new = {}
    for k, name in enumerate(_REFILL_NAMES_F + _REFILL_NAMES_I):
        new[name] = outs[k].reshape(R)
    take_count = outs[16][0, 0]
    return new, take_count, outs[17]


def pack_camera(cam) -> jnp.ndarray:
    """(21,) f32: origin, llc, horizontal, vertical, u, v, lens_r, t0, t1."""
    return jnp.concatenate([
        cam.origin, cam.lower_left_corner, cam.horizontal, cam.vertical,
        cam.u, cam.v,
        jnp.stack([cam.lens_radius, cam.time0, cam.time1]),
    ]).astype(jnp.float32)
