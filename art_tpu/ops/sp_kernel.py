"""Short-path megakernel: refill + intersect + shade in ONE Pallas launch.

Short-path scenes (quads ~263, checkered ~136 Mrays/s steady-state) are
bounded by per-iteration fixed cost — XLA glue between the refill kernel,
the intersection kernels and the masked shade — not by intersection work
(docs/PERF_NOTES.md round-2 "short-path scenes re-measured": quads t_iter
0.488 ms = intersect+shade 0.24 + flush 0.11 + refill/glue 0.15).  For
small fully-static scenes every primitive and material parameter can be a
compile-time immediate, which makes the whole bounce ~10^2 VPU ops per
ray — cheap enough to fuse the entire loop body except the framebuffer
flush into the refill kernel (ops/refill_kernel.py) and cut the
per-iteration launch/glue cost to one kernel + the flush.

This inverts the reference's megakernel (src/main.cu:107-133) a second
time: the wavefront pool stays (persistent slots, queue refill), but the
per-bounce pipeline collapses back into one program once the scene is
small enough to live in immediates.

Builder gate (scene/builder.py, tables.sp_consts): no boxes, no media, no
moving spheres, <= 16 primitives, materials in {lambertian, metal,
dielectric, diffuse_light}, textures solid or checker-of-solids.  Covers
the reference's quads (src/main.cu:331-358), checkered_spheres
(src/main.cu:246-280) and the book-1 three_spheres scene.  The
integrator additionally keeps dielectric scenes on the staged path at
defaults (measured loss: three_spheres 322 fused vs 351 staged Mrays/s,
docs/logs/queue_r3c.log — ART_TPU_SP=1 forces them fused); measured wins
at defaults: quads 294 vs 228, checkered_spheres 528 vs 320.

Semantics mirror the unfused path bit-for-bit with ONE exception: Mosaic
has no `cbrt` lowering, so the in-ball radius cube root
(ops/shade.py:_ball_from_uniforms_p) is computed as exp(log(u)/3) —
identical distribution, ~1-ulp different values, so SP-on vs SP-off
images agree statistically, not bitwise (gated in tests/test_sp_kernel.py
and the on-chip parity runs).

sp_consts layout (nested tuple of f32-rounded python floats — static
pytree metadata, hashable):

    (spheres, quads, mats)
    spheres: ((cx, cy, cz, r, mat_id), ...)            # static only
    quads:   ((nx, ny, nz, D, ax, ay, az, ca,
               bx, by, bz, cb, mat_id), ...)           # pack_quads layout
    mats:    ((type, fuzz, ref_idx, m_r, m_g, m_b,     # metal albedo
               tex_kind, s_r, s_g, s_b,                # solid / checker even
               inv_scale, o_r, o_g, o_b), ...)         # checker odd

tex_kind: 0 solid, 1 checker-of-solids, 2 perlin marble (noise scale in
the inv_scale slot; the gather-free turbulence hash chain inlines — see
_sp_bounce).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.ops.refill_kernel import (
    _LANES,
    _REFILL_NAMES_F,
    _REFILL_NAMES_I,
    _SUBLANES,
    RAY_BLOCK,
    _refill_compute,
)

BIG = 1e30
T_MIN = 1e-3
# A/B switch: force the dielectric refract/Schlick chain back to the
# dense always-evaluated form (round-3 behavior, measured 322 vs 351
# staged Mrays/s on three_spheres) instead of the block-skipped
# @pl.when fix-up used under ART_TPU_SP_ELIDE for dielectric scenes.
_SP_DENSE_DIEL = bool(__import__("os").environ.get("ART_TPU_SP_DENSE_DIEL"))
# Per-family chain elision (python-False masks compile absent scatter
# chains away entirely).  Despite a ~9% SMALLER Mosaic payload, the
# elided quads program measured 205.30 Mrays/s vs 271.61 for the dense
# round-3 form back-to-back on the same chip (docs/logs/queue_r4g.log
# vs queue_r4h.log bisect rows) — a Mosaic scheduling effect, not an op
# -count one.  The dense mtype-plane form is therefore the DEFAULT;
# ART_TPU_SP_ELIDE=1 re-enables elision for measurement.
_SP_ELIDE = bool(__import__("os").environ.get("ART_TPU_SP_ELIDE"))


def _sp_bounce(consts, gradient: bool, max_depth: int, bg_ref, vals,
               u_ball, u_choice):
    """One bounce over refilled block values -> (new vals dict, died).

    Mirrors integrator._bounce_step -> closest_surface_p -> shade_p with
    every primitive/material parameter an immediate.  Same candidate
    semantics as the Pallas kernels (_sphere_kernel NaN-propagation roots,
    _quad_kernel plane test), same masked-blend shading as shade_p
    (reference scatter math: src/material.cuh:75-160; integrator loop:
    src/main.cu:44-87)."""
    spheres, quads, mats = consts
    o = (vals["ox"], vals["oy"], vals["oz"])
    d = (vals["dx"], vals["dy"], vals["dz"])
    act = vals["act"] != 0
    thr = (vals["t0"], vals["t1"], vals["t2"])
    rad = (vals["r0"], vals["r1"], vals["r2"])

    shape = o[0].shape
    zeros = jnp.zeros(shape, jnp.float32)
    ones = jnp.ones(shape, jnp.float32)

    a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    inv_dlen = 1.0 / jnp.sqrt(a)

    # ---- closest hit over baked primitives ----
    # carry: t, (A,B,C), S, Tn, m — normal = S*(p-ABC) + Tn*ABC:
    # sphere (ABC=center, S=1/r, Tn=0) -> (p-c)/r (signed-radius
    # semantics, src/sphere.cuh:69-71); quad (ABC=n, S=0, Tn=+-1) ->
    # ray-facing normal (src/quad.cuh:84-86).
    best = (jnp.full(shape, BIG, jnp.float32),
            zeros, zeros, zeros, zeros, zeros, zeros)

    def update(best, cand):
        better = (cand[0] > T_MIN) & (cand[0] < best[0])
        return tuple(jnp.where(better, n, c) for n, c in zip(cand, best))

    if spheres:
        neg_inv_a = -1.0 / a
        ta2 = -T_MIN * a
        for (cx, cy, cz, r, m) in spheres:
            ocx = o[0] - cx
            ocy = o[1] - cy
            ocz = o[2] - cz
            b = ocx * d[0] + ocy * d[1] + ocz * d[2]
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - a * c
            sq = jnp.sqrt(disc)  # NaN on miss (fails every compare)
            s2 = jnp.where(b + sq < ta2, sq, -sq)
            t = (b + s2) * neg_inv_a
            best = update(
                best,
                (t, jnp.full(shape, cx, jnp.float32),
                 jnp.full(shape, cy, jnp.float32),
                 jnp.full(shape, cz, jnp.float32),
                 jnp.full(shape, 1.0 / r, jnp.float32), zeros,
                 jnp.full(shape, float(m), jnp.float32)),
            )

    for (qnx, qny, qnz, D, ax, ay, az, ca, bx, by, bz, cb, m) in quads:
        nd = qnx * d[0] + qny * d[1] + qnz * d[2]
        no = qnx * o[0] + qny * o[1] + qnz * o[2]
        t = (D - no) / nd
        alpha = (ax * o[0] + ay * o[1] + az * o[2]) + t * (
            ax * d[0] + ay * d[1] + az * d[2]) - ca
        beta = (bx * o[0] + by * o[1] + bz * o[2]) + t * (
            bx * d[0] + by * d[1] + bz * d[2]) - cb
        valid = (
            (jnp.abs(nd) >= 1e-8)
            & (t > T_MIN)
            & (alpha >= 0.0) & (alpha <= 1.0)
            & (beta >= 0.0) & (beta <= 1.0)
        )
        t = jnp.where(valid, t, BIG)
        flip = jnp.where(nd > 0.0, -1.0, 1.0)
        best = update(
            best,
            (t, jnp.full(shape, qnx, jnp.float32),
             jnp.full(shape, qny, jnp.float32),
             jnp.full(shape, qnz, jnp.float32),
             zeros, flip, jnp.full(shape, float(m), jnp.float32)),
        )

    best_t, A, B, C, S, Tn, best_m = best
    hit = best_t < BIG
    p = (o[0] + best_t * d[0], o[1] + best_t * d[1], o[2] + best_t * d[2])
    n = (S * (p[0] - A) + Tn * A,
         S * (p[1] - B) + Tn * B,
         S * (p[2] - C) + Tn * C)

    # ---- background (src/main.cu:58-67) ----
    if gradient:
        tbg = 0.5 * (d[1] * inv_dlen + 1.0)
        bg = (1.0 - 0.5 * tbg, 1.0 - 0.3 * tbg, ones)
    else:
        bg = (jnp.full(shape, bg_ref[0], jnp.float32),
              jnp.full(shape, bg_ref[1], jnp.float32),
              jnp.full(shape, bg_ref[2], jnp.float32))
    miss = act & ~hit
    rad = tuple(rad[c] + jnp.where(miss, thr[c] * bg[c], 0.0)
                for c in range(3))

    # ---- shared turbulence for marble textures (src/texture.cuh:62-76):
    # turb(p, 7) is scale-independent, so ONE evaluation serves every
    # noise material.  The hash chain is gather-free integer math
    # (ops/perlin_kernel.py) and sin lowers in Mosaic, so the whole
    # marble formula inlines.  Misses carry p ~ 1e30 — clamp to keep the
    # int casts defined (the value is masked out by `sel` below). ----
    if any(m[6] == 2 for m in mats):
        from art_tpu.ops.perlin_kernel import _noise

        pt = tuple(jnp.where(hit, p[c], 0.0) for c in range(3))
        turb = jnp.zeros(shape, jnp.float32)
        weight = 1.0
        tx_, ty_, tz_ = pt
        for _ in range(7):
            turb = turb + weight * _noise(tx_, ty_, tz_)
            weight *= 0.5
            tx_, ty_, tz_ = tx_ * 2.0, ty_ * 2.0, tz_ * 2.0
        turb = jnp.abs(turb)
    else:
        turb = None

    # ---- per-material parameter resolve (immediates by winner id).
    # Under ART_TPU_SP_ELIDE per-family masks accumulate directly
    # (python False when a family is absent), so unused scatter chains
    # below compile to NOTHING.  Default is the dense mtype-plane form:
    # the elided program, though smaller, measured 24% SLOWER on quads
    # (see _SP_ELIDE note at the top of this module). ----
    fuzz = zeros
    ref_idx = ones
    texv = (zeros, zeros, zeros)  # lambertian albedo / light emission
    malb = (zeros, zeros, zeros)  # metal albedo
    if _SP_ELIDE:
        is_metal = is_diel = is_light = False
    else:
        mtype = zeros

    def _or(m, sel):
        return sel if m is False else (m | sel)

    for j, (ty, fz, ri, m_r, m_g, m_b, tk, s_r, s_g, s_b,
            isc, o_r, o_g, o_b) in enumerate(mats):
        sel = best_m == float(j)
        if not _SP_ELIDE:
            mtype = jnp.where(sel, float(ty), mtype)
        if ty == 1:  # metal
            if _SP_ELIDE:
                is_metal = _or(is_metal, sel)
            fuzz = jnp.where(sel, fz, fuzz)
            malb = tuple(jnp.where(sel, v, malb[c])
                         for c, v in enumerate((m_r, m_g, m_b)))
        elif ty == 2:  # dielectric
            if _SP_ELIDE:
                is_diel = _or(is_diel, sel)
            ref_idx = jnp.where(sel, ri, ref_idx)
        else:  # lambertian / diffuse_light: texture-backed
            if ty == 3 and _SP_ELIDE:
                is_light = _or(is_light, sel)
            if tk == 1:  # checker (src/texture.cuh:35-42)
                xi = jnp.floor(isc * p[0]).astype(jnp.int32)
                yi = jnp.floor(isc * p[1]).astype(jnp.int32)
                zi = jnp.floor(isc * p[2]).astype(jnp.int32)
                even = ((xi + yi + zi) & 1) == 0
                tv = (jnp.where(even, s_r, o_r),
                      jnp.where(even, s_g, o_g),
                      jnp.where(even, s_b, o_b))
            elif tk == 2:  # perlin marble (src/texture.cuh:62-76)
                t = 0.5 * (1.0 + jnp.sin(isc * p[2] + 10.0 * turb))
                tv = (t, t, t)
            else:
                tv = (s_r, s_g, s_b)
            texv = tuple(jnp.where(sel, tv[c], texv[c]) for c in range(3))

    if not _SP_ELIDE:
        is_metal = mtype == 1.0
        is_diel = mtype == 2.0
        is_light = mtype == 3.0

    def sel3(mask, a_val, b_val):
        return b_val if mask is False else jnp.where(mask, a_val, b_val)

    # ---- emission (src/material.cuh:169-172) ----
    live_hit = act & hit
    if is_light is not False:
        emit_mask = live_hit & is_light
        rad = tuple(rad[c] + jnp.where(emit_mask, thr[c] * texv[c], 0.0)
                    for c in range(3))

    # ---- shared in-ball sample (ops/shade.py:_ball_from_uniforms_p;
    # cbrt has no Mosaic lowering -> exp(log/3), see module docstring) ----
    z = 2.0 * u_ball[0] - 1.0
    phi = (2.0 * jnp.pi) * u_ball[1]
    sball = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    rball = jnp.exp(jnp.log(u_ball[2]) * (1.0 / 3.0))
    ball = (rball * sball * jnp.cos(phi), rball * sball * jnp.sin(phi),
            rball * z)

    # ---- lambertian (src/material.cuh:75-87) ----
    direction = (n[0] + ball[0], n[1] + ball[1], n[2] + ball[2])

    ud = (d[0] * inv_dlen, d[1] * inv_dlen, d[2] * inv_dlen)

    # ---- metal (src/material.cuh:90-110) ----
    metal_alive = True
    mdir = None
    if is_metal is not False:
        udn = ud[0] * n[0] + ud[1] * n[1] + ud[2] * n[2]
        refl = (ud[0] - 2.0 * udn * n[0], ud[1] - 2.0 * udn * n[1],
                ud[2] - 2.0 * udn * n[2])
        mdir = (refl[0] + fuzz * ball[0], refl[1] + fuzz * ball[1],
                refl[2] + fuzz * ball[2])
        metal_alive = (
            mdir[0] * n[0] + mdir[1] * n[1] + mdir[2] * n[2]
        ) > 0.0
        if _SP_ELIDE:
            direction = tuple(jnp.where(is_metal, mdir[c], direction[c])
                              for c in range(3))

    def _diel_dir():
        # ---- dielectric (src/material.cuh:113-159, book-1 form) ----
        d_dot_n = d[0] * n[0] + d[1] * n[1] + d[2] * n[2]
        inside = d_dot_n > 0.0
        own = (jnp.where(inside, -n[0], n[0]),
               jnp.where(inside, -n[1], n[1]),
               jnp.where(inside, -n[2], n[2]))
        nio = jnp.where(inside, ref_idx, 1.0 / ref_idx)
        cos_raw = d_dot_n * inv_dlen
        cos_inside = jnp.sqrt(jnp.maximum(
            0.0, 1.0 - ref_idx * ref_idx * (1.0 - cos_raw * cos_raw)))
        cosine = jnp.where(inside, cos_inside, -cos_raw)
        dt = ud[0] * own[0] + ud[1] * own[1] + ud[2] * own[2]
        disc = 1.0 - nio * nio * (1.0 - dt * dt)
        can_refract = disc > 0.0
        root = jnp.sqrt(jnp.maximum(disc, 0.0))
        refr = (nio * (ud[0] - own[0] * dt) - own[0] * root,
                nio * (ud[1] - own[1] * dt) - own[1] * root,
                nio * (ud[2] - own[2] * dt) - own[2] * root)
        r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
        r0 = r0 * r0
        x = 1.0 - cosine
        x2 = x * x
        schl = r0 + (1.0 - r0) * (x2 * x2 * x)
        reflect_prob = jnp.where(can_refract, schl, 1.0)
        diel_reflect = u_choice < reflect_prob
        ddn2 = 2.0 * d_dot_n
        drefl = (d[0] - ddn2 * n[0], d[1] - ddn2 * n[1],
                 d[2] - ddn2 * n[2])
        return tuple(jnp.where(diel_reflect, drefl[c], refr[c])
                     for c in range(3))

    diel_fixup = None
    if _SP_ELIDE and is_diel is not False and not _SP_DENSE_DIEL:
        # Block-skipped dielectric (VERDICT r3 Weak #4): the base path
        # treats dielectric winners as lambertian-direction survivors
        # with attenuation 1 (their thr/o/rad/death outputs are already
        # exact — a dielectric always scatters with attenuation 1,
        # src/material.cuh:117-123); only the direction planes need the
        # refract/Schlick chain, applied as a @pl.when fix-up to the
        # stored refs when the block holds any live dielectric winner.
        # Blocks off the glass (pixel-coherent pool) skip the chain.
        def diel_fixup(dxo_ref, dyo_ref, dzo_ref, fix_mask):
            @pl.when(jnp.any(fix_mask))
            def _():
                ddir = _diel_dir()
                dxo_ref[:] = jnp.where(fix_mask, ddir[0], dxo_ref[:])
                dyo_ref[:] = jnp.where(fix_mask, ddir[1], dyo_ref[:])
                dzo_ref[:] = jnp.where(fix_mask, ddir[2], dzo_ref[:])
    elif _SP_ELIDE and is_diel is not False:
        ddir = _diel_dir()
        direction = tuple(jnp.where(is_diel, ddir[c], direction[c])
                          for c in range(3))
    elif not _SP_ELIDE:
        # Dense default: the round-3 single nested end-blend, kept
        # byte-faithful to the measured-fast form.
        ddir = _diel_dir()
        direction = tuple(
            jnp.where(is_diel, ddir[c],
                      jnp.where(is_metal, mdir[c], direction[c]))
            for c in range(3)
        )

    # ---- blend by tag + integrate (src/main.cu:71-83) ----
    atten = tuple(
        sel3(is_diel, 1.0, sel3(is_metal, malb[c], texv[c]))
        for c in range(3)
    )
    scattered = True
    if is_light is not False:
        scattered = ~is_light
    if is_metal is not False:
        m_ok = ~is_metal | metal_alive
        scattered = m_ok if scattered is True else (scattered & m_ok)
    survived = live_hit if scattered is True else (live_hit & scattered)
    thr = tuple(jnp.where(survived, thr[c] * atten[c], thr[c])
                for c in range(3))
    o_out = tuple(jnp.where(survived, p[c], o[c]) for c in range(3))
    d_out = tuple(jnp.where(survived, direction[c], d[c]) for c in range(3))

    bounce = vals["bounce"] + act.astype(jnp.int32)
    still = survived & (bounce < max_depth)
    died = act & ~still

    out = dict(vals)
    out.update(
        ox=o_out[0], oy=o_out[1], oz=o_out[2],
        dx=d_out[0], dy=d_out[1], dz=d_out[2],
        t0=thr[0], t1=thr[1], t2=thr[2],
        r0=rad[0], r1=rad[1], r2=rad[2],
        bounce=bounce,
        act=still.astype(jnp.int32),
    )
    if diel_fixup is not None:
        fix_mask = is_diel & survived
        fixer = diel_fixup
        diel_fixup = lambda dx_r, dy_r, dz_r: fixer(
            dx_r, dy_r, dz_r, fix_mask
        )
    return out, died, diel_fixup


def _make_sp_rng_kernel(consts, n_media: int, max_depth: int,
                        gradient: bool):
    """Production variant: every uniform from the TPU hardware PRNG, in
    the SAME draw order as the unfused path (refill 5, ball 3, choice 1,
    media n — ops/refill_kernel._make_rng_kernel) so the two paths see
    identical sample streams."""

    def kernel(*refs):
        (scal_ref, cam_ref, seed_ref, bg_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
         t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
         bounce_ref, pix_ref, act_ref) = refs[:20]
        outs = refs[20:20 + 16]
        tko = refs[20 + 16]
        diedo = refs[20 + 17]
        carry_smem = refs[-1]

        b = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] ^ (b * jnp.int32(-1640531527)),
                        seed_ref[1])
        shape = ox_ref.shape

        def u01():
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
            return top24.astype(jnp.float32) * (1.0 / 16777216.0)

        uj0, uj1, ul0, ul1, ut = u01(), u01(), u01(), u01(), u01()
        u_ball = (u01(), u01(), u01())
        u_choice = u01()
        for _ in range(n_media):  # keep the stream aligned (gate: no media)
            u01()

        vals = _refill_compute(
            scal_ref, cam_ref, uj0, uj1, ul0, ul1, ut,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
            bounce_ref, pix_ref, act_ref, carry_smem,
        )
        out, died, diel_fix = _sp_bounce(
            consts, gradient, max_depth, bg_ref, vals, u_ball, u_choice
        )
        for ref, name in zip(outs, _REFILL_NAMES_F + _REFILL_NAMES_I):
            ref[:] = out[name]
        if diel_fix is not None:
            names = _REFILL_NAMES_F + _REFILL_NAMES_I
            diel_fix(outs[names.index("dx")], outs[names.index("dy")],
                     outs[names.index("dz")])
        diedo[:] = died.astype(jnp.int32)

        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            tko[0, 0] = carry_smem[1]

    return kernel


def _make_sp_kernel(consts, n_media: int, max_depth: int, gradient: bool):
    """Uniforms-as-inputs variant (interpret-mode testable)."""

    def kernel(*refs):
        (scal_ref, cam_ref, bg_ref) = refs[:3]
        u_refs = refs[3:3 + 9 + n_media]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
         t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
         bounce_ref, pix_ref, act_ref) = refs[3 + 9 + n_media:
                                              3 + 9 + n_media + 16]
        outs = refs[3 + 9 + n_media + 16:3 + 9 + n_media + 32]
        tko = refs[3 + 9 + n_media + 32]
        diedo = refs[3 + 9 + n_media + 33]
        carry_smem = refs[-1]

        uj0, uj1, ul0, ul1, ut = (u_refs[i][:] for i in range(5))
        u_ball = (u_refs[5][:], u_refs[6][:], u_refs[7][:])
        u_choice = u_refs[8][:]

        vals = _refill_compute(
            scal_ref, cam_ref, uj0, uj1, ul0, ul1, ut,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
            bounce_ref, pix_ref, act_ref, carry_smem,
        )
        out, died, diel_fix = _sp_bounce(
            consts, gradient, max_depth, bg_ref, vals, u_ball, u_choice
        )
        for ref, name in zip(outs, _REFILL_NAMES_F + _REFILL_NAMES_I):
            ref[:] = out[name]
        if diel_fix is not None:
            names = _REFILL_NAMES_F + _REFILL_NAMES_I
            diel_fix(outs[names.index("dx")], outs[names.index("dy")],
                     outs[names.index("dz")])
        diedo[:] = died.astype(jnp.int32)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            tko[0, 0] = carry_smem[1]

    return kernel


def _make_sp_flush_rng_kernel(consts, n_media: int, max_depth: int,
                              gradient: bool, n_hi: int):
    """_make_sp_rng_kernel + the framebuffer flush of THIS iteration's
    died rays merged in.  Unlike the seam-flush experiment (which lost:
    it re-read the radiance planes from HBM one iteration later,
    ops/refill_kernel.py), the died radiance here is still in-register
    when the flush runs — the merge saves the standalone flush launch and
    its window slice/update glue without any extra plane stream."""
    from art_tpu.ops.refill_kernel import _flush_dead

    def kernel(*refs):
        (scal_ref, cam_ref, seed_ref, bg_ref, base_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
         t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
         bounce_ref, pix_ref, act_ref, fb_ref) = refs[:22]
        outs = refs[22:22 + 16]
        tko = refs[22 + 16]
        diedo = refs[22 + 17]
        fbo = refs[22 + 18]
        carry_smem, oh_s, w_s = refs[-3:]

        b = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] ^ (b * jnp.int32(-1640531527)),
                        seed_ref[1])
        shape = ox_ref.shape

        def u01():
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
            return top24.astype(jnp.float32) * (1.0 / 16777216.0)

        uj0, uj1, ul0, ul1, ut = u01(), u01(), u01(), u01(), u01()
        u_ball = (u01(), u01(), u01())
        u_choice = u01()
        for _ in range(n_media):
            u01()

        vals = _refill_compute(
            scal_ref, cam_ref, uj0, uj1, ul0, ul1, ut,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            t0_ref, t1_ref, t2_ref, r0_ref, r1_ref, r2_ref,
            bounce_ref, pix_ref, act_ref, carry_smem,
        )
        out, died, diel_fix = _sp_bounce(
            consts, gradient, max_depth, bg_ref, vals, u_ball, u_choice
        )
        _flush_dead(
            b, base_ref, out["pix"], died,
            out["r0"], out["r1"], out["r2"],
            fb_ref, fbo, oh_s, w_s, n_hi,
        )
        for ref, name in zip(outs, _REFILL_NAMES_F + _REFILL_NAMES_I):
            ref[:] = out[name]
        if diel_fix is not None:
            names = _REFILL_NAMES_F + _REFILL_NAMES_I
            diel_fix(outs[names.index("dx")], outs[names.index("dy")],
                     outs[names.index("dz")])
        diedo[:] = died.astype(jnp.int32)

        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            tko[0, 0] = carry_smem[1]

    return kernel


def sp_step_flush_rng(
    state_planes,
    key2: jnp.ndarray,  # (2,) int32 per-iteration seed material
    cam_vec: jnp.ndarray,  # (21,) f32 packed camera
    scal: jnp.ndarray,  # (8,) i32
    bg: jnp.ndarray,  # (3,) f32 background color (solid mode)
    fb: jnp.ndarray,  # (n_hi, 384) f32 accumulator window
    base,  # () int32 first fb row the window covers
    *,
    consts,
    n_media: int,
    max_depth: int,
    gradient: bool,
):
    """Fully-fused iteration: refill + intersect + shade + fb flush.

    Returns (new_planes dict, take_count (), died (R,) bool, fb_out)."""
    from art_tpu.ops.refill_kernel import _flush_scratch

    R = state_planes["ox"].shape[0]
    assert R % RAY_BLOCK == 0, R
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
        [scal, cam_vec, key2, bg.astype(jnp.float32),
         jnp.reshape(base, (1,)).astype(jnp.int32)]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_F]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_I]
        + [fb]
    )
    outs = pl.pallas_call(
        _make_sp_flush_rng_kernel(consts, n_media, max_depth, gradient,
                                  n_hi),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        + [spec] * 16 + [fb_spec],
        out_specs=(spec,) * 16
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        + (spec,)
        + (fb_spec,),
        out_shape=tuple(
            [f32] * 13 + [i32] * 3
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
            + [i32]
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
    return new, outs[16][0, 0], outs[17].reshape(R) != 0, outs[18]


def _call(kernel, n_scal_ins, uniforms, state_planes, extra_ins):
    R = state_planes["ox"].shape[0]
    assert R % RAY_BLOCK == 0, R
    rows = R // _LANES
    grid = rows // _SUBLANES
    spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def plane(x):
        return x.reshape(rows, _LANES)

    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    ins = (
        extra_ins
        + [plane(u) for u in uniforms]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_F]
        + [plane(state_planes[n]) for n in _REFILL_NAMES_I]
    )
    return kernel, ins, spec, f32, i32, grid, rows, R


def sp_step_rng(
    state_planes,
    key2: jnp.ndarray,  # (2,) int32 per-iteration seed material
    cam_vec: jnp.ndarray,  # (21,) f32 packed camera
    scal: jnp.ndarray,  # (8,) i32
    bg: jnp.ndarray,  # (3,) f32 background color (solid mode)
    *,
    consts,
    n_media: int,
    max_depth: int,
    gradient: bool,
):
    """Fused refill+bounce with hardware-PRNG uniforms.

    Returns (new_planes dict, take_count (), died (R,) bool)."""
    kernel, ins, spec, f32, i32, grid, rows, R = _call(
        _make_sp_rng_kernel(consts, n_media, max_depth, gradient),
        4, [], state_planes,
        [scal, cam_vec, key2, bg.astype(jnp.float32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4 + [spec] * 16,
        out_specs=(spec,) * 16
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        + (spec,),
        out_shape=tuple(
            [f32] * 13 + [i32] * 3
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
            + [i32]
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
    )(*ins)
    new = {}
    for k, name in enumerate(_REFILL_NAMES_F + _REFILL_NAMES_I):
        new[name] = outs[k].reshape(R)
    return new, outs[16][0, 0], outs[17].reshape(R) != 0


def sp_step(
    state_planes,
    uniforms,  # 9 + n_media planes: jitter2, lens2, time, ball3, choice, media...
    cam_vec: jnp.ndarray,
    scal: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    consts,
    n_media: int,
    max_depth: int,
    gradient: bool,
    interpret: bool = False,
):
    """Uniforms-as-inputs variant (interpret-mode testable).

    Returns (new_planes dict, take_count (), died (R,) bool)."""
    n_u = 9 + n_media
    assert len(uniforms) == n_u, (len(uniforms), n_u)
    kernel, ins, spec, f32, i32, grid, rows, R = _call(
        _make_sp_kernel(consts, n_media, max_depth, gradient),
        3, list(uniforms), state_planes,
        [scal, cam_vec, bg.astype(jnp.float32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [spec] * (n_u + 16),
        out_specs=(spec,) * 16
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
        + (spec,),
        out_shape=tuple(
            [f32] * 13 + [i32] * 3
            + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
            + [i32]
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(*ins)
    new = {}
    for k, name in enumerate(_REFILL_NAMES_F + _REFILL_NAMES_I):
        new[name] = outs[k].reshape(R)
    return new, outs[16][0, 0], outs[17].reshape(R) != 0
