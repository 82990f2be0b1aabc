"""Interpret-mode equivalence: fused shade+flush kernel
(ops/shade_kernel.py) vs the staged jnp composition
(integrator._bounce_step tail + ops/flush_kernel.flush_accumulate).

The kernel consumes the SAME per-ray parameter planes the jnp path
computes (take_rows + eval_texture_p run outside both), so the only
numeric divergence is the in-ball cube root (exp(log(u)/3) vs jnp.cbrt —
no Mosaic cbrt lowering, see the module docstring): scatter directions
differ by ~1 ulp, and a <=2-ray budget absorbs knife-edge discrete flips
(metal graze sign)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.models import build_scene
from art_tpu.ops.flush_kernel import flush_accumulate
from art_tpu.ops.intersect import apply_media_p, closest_surface_p
from art_tpu.ops.refill_kernel import RAY_BLOCK
from art_tpu.ops.shade import shade_params_p
from art_tpu.ops.shade_kernel import shade_flush
from art_tpu.render.integrator import T_MIN, _bounce_step

R = RAY_BLOCK
MAX_DEPTH = 50
N_HI = 16  # window rows; pix drawn within N_HI*128

FLOAT_NAMES = ("ox", "oy", "oz", "dx", "dy", "dz",
               "t0", "t1", "t2", "r0", "r1", "r2")


def _random_inputs(seed, frac_active=0.8):
    ks = jax.random.split(jax.random.PRNGKey(seed), 32)
    o = tuple(jax.random.uniform(ks[i], (R,), jnp.float32) * 8 - 4
              for i in range(3))
    d = tuple(jax.random.uniform(ks[3 + i], (R,), jnp.float32) * 2 - 1
              for i in range(3))
    tm = jax.random.uniform(ks[6], (R,), jnp.float32)
    thr = tuple(jax.random.uniform(ks[7 + i], (R,), jnp.float32)
                for i in range(3))
    rad = tuple(jax.random.uniform(ks[10 + i], (R,), jnp.float32) * 0.2
                for i in range(3))
    bounce = jax.random.randint(ks[13], (R,), 0, MAX_DEPTH, jnp.int32)
    pix = jax.random.randint(ks[14], (R,), 0, N_HI * 128, jnp.int32)
    active = jax.random.uniform(ks[15], (R,)) < frac_active
    u_ball = tuple(jax.random.uniform(ks[16 + i], (R,), jnp.float32)
                   for i in range(3))
    u_choice = jax.random.uniform(ks[19], (R,), jnp.float32)
    fb0 = jax.random.uniform(ks[20], (N_HI, 384), jnp.float32)
    return o, d, tm, thr, rad, bounce, pix, active, u_ball, u_choice, fb0


def _run_case(scene_name, seed):
    scene = build_scene(scene_name, 96, 48)
    tables = scene.tables
    (o, d, tm, thr, rad, bounce, pix, active,
     u_ball, u_choice, fb0) = _random_inputs(seed)
    n_media = max(tables.n_media, 1)
    u_media = jnp.stack([
        jax.random.uniform(jax.random.PRNGKey(900 + seed + i), (R,),
                           jnp.float32)
        for i in range(n_media)
    ])
    background = jnp.asarray(scene.background, jnp.float32)

    # ---- kernel path ----
    surf = closest_surface_p(tables, o, d, tm, T_MIN)
    rec = apply_media_p(tables, o, d, T_MIN, surf, u_media, time=tm)
    mtype_f, fuzz, refidx, malb, texv = shade_params_p(tables, rec)
    state_pl = dict(
        ox=o[0], oy=o[1], oz=o[2], dx=d[0], dy=d[1], dz=d[2],
        t0=thr[0], t1=thr[1], t2=thr[2],
        r0=rad[0], r1=rad[1], r2=rad[2],
        bounce=bounce, pix=pix, act=active.astype(jnp.int32),
    )
    rec_pl = dict(
        px=rec.p[0], py=rec.p[1], pz=rec.p[2],
        nx=rec.normal[0], ny=rec.normal[1], nz=rec.normal[2],
        mtype=mtype_f, fuzz=fuzz, refidx=refidx,
        ma0=malb[0], ma1=malb[1], ma2=malb[2],
        tx0=texv[0], tx1=texv[1], tx2=texv[2],
        ub0=u_ball[0], ub1=u_ball[1], ub2=u_ball[2],
        uch=u_choice,
    )
    new, died_k, fb_k = shade_flush(
        state_pl, rec.hit, rec_pl, background, fb0, jnp.int32(0),
        max_depth=MAX_DEPTH, gradient=scene.gradient_bg, interpret=True,
    )

    # ---- staged jnp reference ----
    o2, d2, thr2, rad2, survived = _bounce_step(
        tables, o, d, tm, thr, rad, active,
        u_ball, u_choice, u_media, background, scene.gradient_bg,
    )
    bounce2 = bounce + active.astype(jnp.int32)
    still = survived & (bounce2 < MAX_DEPTH)
    died_ref = active & ~still
    fb_ref = flush_accumulate(
        pix, died_ref, rad2, fb0, base=jnp.int32(0), interpret=True
    )

    # Discrete agreement with a tiny knife-edge budget (metal graze).
    act_mism = int(np.sum(np.asarray(new["act"]) != np.asarray(
        still.astype(jnp.int32))))
    died_mism = int(np.sum(np.asarray(died_k) != np.asarray(died_ref)))
    assert act_mism <= 2, act_mism
    assert died_mism <= 2, died_mism
    agree = (
        (np.asarray(new["act"]) == np.asarray(still.astype(jnp.int32)))
        & (np.asarray(died_k) == np.asarray(died_ref))
    )
    np.testing.assert_array_equal(np.asarray(new["bounce"]),
                                  np.asarray(bounce2))
    np.testing.assert_array_equal(np.asarray(new["pix"]), np.asarray(pix))
    want = dict(
        ox=o2[0], oy=o2[1], oz=o2[2], dx=d2[0], dy=d2[1], dz=d2[2],
        t0=thr2[0], t1=thr2[1], t2=thr2[2],
        r0=rad2[0], r1=rad2[1], r2=rad2[2],
    )
    for name in FLOAT_NAMES:
        a = np.asarray(new[name])[agree]
        b = np.asarray(want[name])[agree]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5,
                                   err_msg=name)
    # Flush: the kernel's one-hot MXU accumulate must equal the standalone
    # flush kernel's, up to the died-set budget above (bf16 products are
    # deterministic on both paths).
    if died_mism == 0 and act_mism == 0:
        np.testing.assert_allclose(
            np.asarray(fb_k), np.asarray(fb_ref), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("name", ["three_spheres", "cornell_smoke",
                                  "final_scene"])
@pytest.mark.parametrize("seed", [0, 7])
def test_shade_flush_matches_staged(name, seed):
    _run_case(name, seed)
