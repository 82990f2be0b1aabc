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


def _shade_math(gradient: bool, max_depth: int, bg_ref, v):
    """The bounce tail over per-ray planes -> (state outs dict, died).

    ``v`` maps every _STATE_F/_STATE_I/_REC_F name plus "hit" to its
    block value.  Mirrors integrator._bounce_step's post-intersect half:
    background_color_p + shade_p (reference scatter math:
    src/material.cuh:75-201) + the integrate/death tail
    (src/main.cu:58-87)."""
    o = (v["ox"], v["oy"], v["oz"])
    d = (v["dx"], v["dy"], v["dz"])
    thr = (v["t0"], v["t1"], v["t2"])
    rad = (v["r0"], v["r1"], v["r2"])
    p = (v["px"], v["py"], v["pz"])
    n = (v["nx"], v["ny"], v["nz"])
    texv = (v["tx0"], v["tx1"], v["tx2"])
    malb = (v["ma0"], v["ma1"], v["ma2"])
    mtype, fuzz, ref_idx = v["mtype"], v["fuzz"], v["refidx"]
    u_ball = (v["ub0"], v["ub1"], v["ub2"])
    u_choice = v["uch"]
    act = v["act"] != 0
    hit = v["hit"] != 0

    shape = o[0].shape
    ones = jnp.ones(shape, jnp.float32)

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

    is_metal = mtype == 1.0
    is_diel = mtype == 2.0
    is_light = mtype == 3.0
    is_iso = mtype == 4.0

    # ---- emission (src/material.cuh:169-172) ----
    live_hit = act & hit
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

    # ---- metal (src/material.cuh:90-110) ----
    ud = (d[0] * inv_dlen, d[1] * inv_dlen, d[2] * inv_dlen)
    udn = ud[0] * n[0] + ud[1] * n[1] + ud[2] * n[2]
    refl = (ud[0] - 2.0 * udn * n[0], ud[1] - 2.0 * udn * n[1],
            ud[2] - 2.0 * udn * n[2])
    mdir = (refl[0] + fuzz * ball[0], refl[1] + fuzz * ball[1],
            refl[2] + fuzz * ball[2])
    metal_alive = (mdir[0] * n[0] + mdir[1] * n[1] + mdir[2] * n[2]) > 0.0

    # ---- dielectric (src/material.cuh:113-159, book-1 form) ----
    d_dot_n = d[0] * n[0] + d[1] * n[1] + d[2] * n[2]
    inside = d_dot_n > 0.0
    own = (jnp.where(inside, -n[0], n[0]), jnp.where(inside, -n[1], n[1]),
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
    drefl = (d[0] - ddn2 * n[0], d[1] - ddn2 * n[1], d[2] - ddn2 * n[2])
    ddir = tuple(jnp.where(diel_reflect, drefl[c], refr[c])
                 for c in range(3))

    # ---- blend by tag + integrate (src/main.cu:71-83; isotropic media
    # scatter uniformly in the ball, src/constant_medium.cuh) ----
    direction = tuple(
        jnp.where(is_iso, ball[c],
                  jnp.where(is_diel, ddir[c],
                            jnp.where(is_metal, mdir[c], direction[c])))
        for c in range(3)
    )
    atten = tuple(
        jnp.where(is_diel, 1.0, jnp.where(is_metal, malb[c], texv[c]))
        for c in range(3)
    )
    scattered = ~is_light & (~is_metal | metal_alive)
    survived = live_hit & scattered
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


def _make_shade_flush_kernel(max_depth: int, gradient: bool, n_hi: int):
    def kernel(*refs):
        bg_ref, base_ref = refs[:2]
        n_state = len(_STATE_F) + len(_STATE_I)
        state_refs = refs[2:2 + n_state]
        hit_ref = refs[2 + n_state]
        rec_refs = refs[3 + n_state:3 + n_state + len(_REC_F)]
        fb_ref = refs[3 + n_state + len(_REC_F)]
        outs = refs[4 + n_state + len(_REC_F):
                    4 + n_state + len(_REC_F) + n_state]
        diedo = refs[4 + 2 * n_state + len(_REC_F)]
        fbo = refs[5 + 2 * n_state + len(_REC_F)]
        oh_s, w_s = refs[-2:]

        v = {name: r[:] for name, r in
             zip(_STATE_F + _STATE_I, state_refs)}
        v["hit"] = hit_ref[:]
        v.update({name: r[:] for name, r in zip(_REC_F, rec_refs)})

        out, died = _shade_math(gradient, max_depth, bg_ref, v)
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
    rec_planes,  # dict with _REC_F planes, each (R,) f32
    bg: jnp.ndarray,  # (3,) f32 background color (solid mode)
    fb: jnp.ndarray,  # (n_hi, 384) f32 accumulator window
    base,  # () int32 first fb row the window covers
    *,
    max_depth: int,
    gradient: bool,
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
        + [plane(rec_planes[n].astype(jnp.float32)) for n in _REC_F]
        + [fb]
    )
    from art_tpu.ops.flush_kernel import _GROUP

    outs = pl.pallas_call(
        _make_shade_flush_kernel(max_depth, gradient, n_hi),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [spec] * (n_state + 1 + len(_REC_F))
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
