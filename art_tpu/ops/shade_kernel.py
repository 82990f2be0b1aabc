"""Fused shade+flush kernel: the staged path's whole bounce tail in ONE
Pallas launch.

After the intersection kernels and the texture/material fetches produce
per-ray planes, the remaining work of an iteration — background + miss
radiance, emission, the full scatter chain (lambertian / metal /
dielectric / diffuse_light / isotropic, reference src/material.cuh:46-201
and the integrator loop src/main.cu:44-87), throughput/radiance update,
death bookkeeping, and the framebuffer flush of this iteration's died
rays — is ~10^2 elementwise VPU ops over ~35 planes.  As jnp it compiles
to many XLA fusions whose intermediates round-trip HBM (measured ~0.36 ms
of final_scene's 1.925 ms t_iter, fake_shade ablation in
docs/PERF_NOTES.md) plus a separate flush launch (~0.07 ms).  This kernel
streams each plane exactly once and flushes the died radiance while it is
still in-register — the same property that made the short-path
megakernel's merged flush win where the seam experiment (which re-read
radiance planes from HBM one iteration later) lost.

Unlike the short-path megakernel (ops/sp_kernel.py, compile-time scene
immediates, tiny static scenes only) this kernel is GENERIC: material
parameters arrive as per-ray planes fetched outside (ops/gather.take_rows
one-hot MXU fetch + ops/texture_eval), so it serves every scene —
bouncing_spheres' 488 distinct albedos included.

Semantics mirror shade_p + the integrator tail bit-for-bit with ONE
exception: Mosaic has no ``cbrt`` lowering, so the in-ball radius cube
root (ops/shade.py:_ball_from_uniforms_p) is ``exp(log(u)/3)`` —
identical distribution, ~1-ulp different values (same note as
ops/sp_kernel.py; gated statistically in tests/test_shade_kernel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from art_tpu.ops.refill_kernel import (
    _LANES,
    _SUBLANES,
    RAY_BLOCK,
    _flush_dead,
)

# Plane order of the kernel's ray-state inputs/outputs.
_STATE_F = ("ox", "oy", "oz", "dx", "dy", "dz",
            "t0", "t1", "t2", "r0", "r1", "r2")
_STATE_I = ("bounce", "pix", "act")
# Hit-record + per-ray material/texture parameter planes (inputs only).
_REC_F = ("px", "py", "pz", "nx", "ny", "nz",
          "mtype", "fuzz", "refidx", "ma0", "ma1", "ma2",
          "tx0", "tx1", "tx2", "ub0", "ub1", "ub2", "uch")
# Baked-consts mode (tables.shade_consts): material/texture parameters
# are compile-time immediates keyed by the material-id plane; only
# special leaf values (image texel / turbulence colors) arrive as sp
# planes when the scene has them.
_REC_BAKED = ("px", "py", "pz", "nx", "ny", "nz", "mat",
              "ub0", "ub1", "ub2", "uch")
_REC_SP = ("sp0", "sp1", "sp2")


def rec_names(consts) -> tuple:
    """Input-plane names of the shade kernel's hit-record block."""
    if consts is None:
        return _REC_F
    return _REC_BAKED + (_REC_SP if consts[1] else ())


def _baked_params(mats, specials, mi, p, sp):
    """Material/texture parameters from compile-time constants.

    ``mats[i] = (mtype, fuzz, ref_idx, metal_rgb3, tex_kind, tex_data)``
    with tex_kind 0 = solid rgb, 1 = checker-of-solids
    (inv_scale, even_rgb3, odd_rgb3), 2 = special (value rides the sp
    planes — scene/builder._shade_consts).  Returns (type masks dict,
    fuzz, ref_idx, metal_albedo 3-tuple, tex_val 3-tuple); absent
    material families yield python-False masks so their scatter chains
    compile to nothing (the sp_consts trick, generalized)."""
    shape = mi.shape

    def mask_of(ids):
        m = False
        for i in ids:
            mm = mi == jnp.float32(i)
            m = mm if m is False else (m | mm)
        return m

    def blend(pairs, default):
        acc = jnp.full(shape, default, jnp.float32)
        for i, val in pairs:
            if val != default:
                acc = jnp.where(mi == jnp.float32(i), val, acc)
        return acc

    ids = {t: [i for i, mm in enumerate(mats) if mm[0] == t]
           for t in (1, 2, 3, 4)}
    masks = dict(
        metal=mask_of(ids[1]), diel=mask_of(ids[2]),
        light=mask_of(ids[3]), iso=mask_of(ids[4]),
    )
    fuzz = blend([(i, mats[i][1]) for i in ids[1]], 0.0)
    ref_idx = blend([(i, mats[i][2]) for i in ids[2]], 1.0)
    malb = tuple(
        blend([(i, mats[i][3][c]) for i in ids[1]], 0.0) for c in range(3)
    )
    # texture value for the texture-backed families (lambertian 0,
    # light 3, isotropic 4): solid blends, checker parity, sp planes
    solid = [(i, mm[5]) for i, mm in enumerate(mats)
             if mm[0] in (0, 3, 4) and mm[4] == 0]
    texv = tuple(blend([(i, rgb[c]) for i, rgb in solid], 0.0)
                 for c in range(3))
    for i, mm in enumerate(mats):
        if mm[4] != 1:
            continue
        isc, even, odd = mm[5]
        xi = jnp.floor(isc * p[0]).astype(jnp.int32)
        yi = jnp.floor(isc * p[1]).astype(jnp.int32)
        zi = jnp.floor(isc * p[2]).astype(jnp.int32)
        is_even = ((xi + yi + zi) & 1) == 0
        m = mi == jnp.float32(i)
        texv = tuple(
            jnp.where(m, jnp.where(is_even, even[c], odd[c]), texv[c])
            for c in range(3)
        )
    if specials:
        spm = mask_of([s[0] for s in specials])
        texv = tuple(jnp.where(spm, sp[c], texv[c]) for c in range(3))
    return masks, fuzz, ref_idx, malb, texv


def _shade_math(gradient: bool, max_depth: int, bg_ref, v, consts=None):
    """The bounce tail over per-ray planes -> (state outs dict, died).

    ``v`` maps every _STATE_F/_STATE_I name, the rec_names(consts) block
    and "hit" to its block value.  Mirrors integrator._bounce_step's
    post-intersect half: background_color_p + shade_p (reference scatter
    math: src/material.cuh:75-201) + the integrate/death tail
    (src/main.cu:58-87).  With ``consts`` the material/texture
    parameters are compile-time immediates (_baked_params) and absent
    material families skip their whole scatter chain."""
    o = (v["ox"], v["oy"], v["oz"])
    d = (v["dx"], v["dy"], v["dz"])
    thr = (v["t0"], v["t1"], v["t2"])
    rad = (v["r0"], v["r1"], v["r2"])
    p = (v["px"], v["py"], v["pz"])
    n = (v["nx"], v["ny"], v["nz"])
    u_ball = (v["ub0"], v["ub1"], v["ub2"])
    u_choice = v["uch"]
    act = v["act"] != 0
    hit = v["hit"] != 0

    shape = o[0].shape
    ones = jnp.ones(shape, jnp.float32)

    if consts is None:
        texv = (v["tx0"], v["tx1"], v["tx2"])
        malb = (v["ma0"], v["ma1"], v["ma2"])
        mtype, fuzz, ref_idx = v["mtype"], v["fuzz"], v["refidx"]
        is_metal = mtype == 1.0
        is_diel = mtype == 2.0
        is_light = mtype == 3.0
        is_iso = mtype == 4.0
    else:
        mats, specials = consts
        sp = tuple(v[k] for k in _REC_SP) if specials else None
        masks, fuzz, ref_idx, malb, texv = _baked_params(
            mats, specials, v["mat"], p, sp
        )
        is_metal, is_diel = masks["metal"], masks["diel"]
        is_light, is_iso = masks["light"], masks["iso"]

    a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    inv_dlen = 1.0 / jnp.sqrt(a)

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
    if is_metal is not False:
        udn = ud[0] * n[0] + ud[1] * n[1] + ud[2] * n[2]
        refl = (ud[0] - 2.0 * udn * n[0], ud[1] - 2.0 * udn * n[1],
                ud[2] - 2.0 * udn * n[2])
        mdir = (refl[0] + fuzz * ball[0], refl[1] + fuzz * ball[1],
                refl[2] + fuzz * ball[2])
        metal_alive = (
            mdir[0] * n[0] + mdir[1] * n[1] + mdir[2] * n[2]
        ) > 0.0

    # ---- dielectric (src/material.cuh:113-159, book-1 form) ----
    if is_diel is not False:
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
        ddir = tuple(jnp.where(diel_reflect, drefl[c], refr[c])
                     for c in range(3))

    # ---- blend by tag + integrate (src/main.cu:71-83; isotropic media
    # scatter uniformly in the ball, src/constant_medium.cuh) ----
    def sel(mask, a_val, b_val):
        return b_val if mask is False else jnp.where(mask, a_val, b_val)

    direction = tuple(
        sel(is_iso, ball[c],
            sel(is_diel, ddir[c] if is_diel is not False else None,
                sel(is_metal, mdir[c] if is_metal is not False else None,
                    direction[c])))
        for c in range(3)
    )
    atten = tuple(
        sel(is_diel, 1.0, sel(is_metal, malb[c], texv[c]))
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

    bounce = v["bounce"] + act.astype(jnp.int32)
    still = survived & (bounce < max_depth)
    died = act & ~still

    out = dict(
        ox=o_out[0], oy=o_out[1], oz=o_out[2],
        dx=d_out[0], dy=d_out[1], dz=d_out[2],
        t0=thr[0], t1=thr[1], t2=thr[2],
        r0=rad[0], r1=rad[1], r2=rad[2],
        bounce=bounce, pix=v["pix"],
        act=still.astype(jnp.int32),
    )
    return out, died


def _make_shade_flush_kernel(max_depth: int, gradient: bool, n_hi: int,
                             consts=None):
    rec_f = rec_names(consts)

    def kernel(*refs):
        bg_ref, base_ref = refs[:2]
        n_state = len(_STATE_F) + len(_STATE_I)
        state_refs = refs[2:2 + n_state]
        hit_ref = refs[2 + n_state]
        rec_refs = refs[3 + n_state:3 + n_state + len(rec_f)]
        fb_ref = refs[3 + n_state + len(rec_f)]
        outs = refs[4 + n_state + len(rec_f):
                    4 + n_state + len(rec_f) + n_state]
        diedo = refs[4 + 2 * n_state + len(rec_f)]
        fbo = refs[5 + 2 * n_state + len(rec_f)]
        oh_s, w_s = refs[-2:]

        v = {name: r[:] for name, r in
             zip(_STATE_F + _STATE_I, state_refs)}
        v["hit"] = hit_ref[:]
        v.update({name: r[:] for name, r in zip(rec_f, rec_refs)})

        out, died = _shade_math(gradient, max_depth, bg_ref, v, consts)
        _flush_dead(
            pl.program_id(0), base_ref, out["pix"], died,
            out["r0"], out["r1"], out["r2"],
            fb_ref, fbo, oh_s, w_s, n_hi,
        )
        for ref, name in zip(outs, _STATE_F + _STATE_I):
            ref[:] = out[name]
        diedo[:] = died.astype(jnp.int32)

    return kernel


def shade_flush(
    state_planes,  # dict with _STATE_F + _STATE_I planes, each (R,)
    hit,  # (R,) bool
    rec_planes,  # dict with rec_names(consts) planes, each (R,) f32
    bg: jnp.ndarray,  # (3,) f32 background color (solid mode)
    fb: jnp.ndarray,  # (n_hi, 384) f32 accumulator window
    base,  # () int32 first fb row the window covers
    *,
    max_depth: int,
    gradient: bool,
    consts=None,  # tables.shade_consts: baked material/texture immediates
    interpret: bool = False,
):
    """Fused bounce tail: shade + integrate + fb flush of died rays.

    Returns (new_state dict (_STATE_F+_STATE_I), died (R,) bool, fb_out).
    """
    R = state_planes["ox"].shape[0]
    assert R % RAY_BLOCK == 0, R
    rows = R // _LANES
    grid = rows // _SUBLANES
    n_hi = fb.shape[0]
    rec_f = rec_names(consts)
    spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec((n_hi, 3 * _LANES), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)

    def plane(x):
        return x.reshape(rows, _LANES)

    f32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    n_state = len(_STATE_F) + len(_STATE_I)
    ins = (
        [bg.astype(jnp.float32),
         jnp.reshape(base, (1,)).astype(jnp.int32)]
        + [plane(state_planes[n]) for n in _STATE_F]
        + [plane(state_planes[n]) for n in _STATE_I]
        + [plane(hit.astype(jnp.int32))]
        + [plane(rec_planes[n].astype(jnp.float32)) for n in rec_f]
        + [fb]
    )
    from art_tpu.ops.flush_kernel import _GROUP

    outs = pl.pallas_call(
        _make_shade_flush_kernel(max_depth, gradient, n_hi, consts),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [spec] * (n_state + 1 + len(rec_f))
        + [fb_spec],
        out_specs=(spec,) * n_state + (spec,) + (fb_spec,),
        out_shape=tuple(
            [f32] * len(_STATE_F) + [i32] * len(_STATE_I)
            + [i32]
            + [jax.ShapeDtypeStruct((n_hi, 3 * _LANES), jnp.float32)]
        ),
        scratch_shapes=[
            pltpu.VMEM((n_hi, _GROUP * _LANES), jnp.bfloat16),
            pltpu.VMEM((3 * _LANES, _GROUP * _LANES), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*ins)
    new = {}
    for k, name in enumerate(_STATE_F + _STATE_I):
        new[name] = outs[k].reshape(R)
    return new, outs[n_state].reshape(R) != 0, outs[n_state + 1]
