"""Baked-consts shade kernel (tables.shade_consts) vs the plane-fed
fetch path.

Both variants run the SAME kernel math (ops/shade_kernel._shade_math);
the baked mode derives material/texture parameters from compile-time
immediates keyed by the material-id plane (plus eval_special_p for
image/turbulence leaves) instead of the staged take_rows + eval_texture_p
planes.  The one-hot row fetch is exact and the baked immediates are the
same f32 table values, so outputs must agree to FMA-fusion ulps; the
discrete outputs (act, died) must agree exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.models import build_scene
from art_tpu.ops.intersect import apply_media_p, closest_surface_p
from art_tpu.ops.refill_kernel import RAY_BLOCK
from art_tpu.ops.shade import shade_params_p
from art_tpu.ops.shade_kernel import shade_flush
from art_tpu.ops.texture_eval import eval_special_p
from art_tpu.render.integrator import T_MIN

R = RAY_BLOCK
MAX_DEPTH = 50
N_HI = 16


def _random_inputs(seed, frac_active=0.9):
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


# Scenes spanning the gate's texture kinds: solids+checker (cornell_smoke
# incl. isotropic media mats), image (earth), image+noise+metal+dielectric
# (final_scene), felt+uv_offset-image (simple_light), noodle (original).
@pytest.mark.parametrize(
    "scene_name",
    ["final_scene", "earth", "simple_light", "cornell_smoke",
     "original_scene"],
)
def test_baked_matches_plane_fed(scene_name):
    scene = build_scene(scene_name, 96, 48)
    tables = scene.tables
    assert tables.shade_consts is not None
    (o, d, tm, thr, rad, bounce, pix, active,
     u_ball, u_choice, fb0) = _random_inputs(seed=4)
    n_media = max(tables.n_media, 1)
    u_media = jnp.stack([
        jax.random.uniform(jax.random.PRNGKey(904 + i), (R,), jnp.float32)
        for i in range(n_media)
    ])
    background = jnp.asarray(scene.background, jnp.float32)

    surf = closest_surface_p(tables, o, d, tm, T_MIN)
    rec = apply_media_p(tables, o, d, T_MIN, surf, u_media, time=tm)
    state_pl = dict(
        ox=o[0], oy=o[1], oz=o[2], dx=d[0], dy=d[1], dz=d[2],
        t0=thr[0], t1=thr[1], t2=thr[2],
        r0=rad[0], r1=rad[1], r2=rad[2],
        bounce=bounce, pix=pix, act=active.astype(jnp.int32),
    )
    rec_common = dict(
        px=rec.p[0], py=rec.p[1], pz=rec.p[2],
        nx=rec.normal[0], ny=rec.normal[1], nz=rec.normal[2],
        ub0=u_ball[0], ub1=u_ball[1], ub2=u_ball[2], uch=u_choice,
    )

    # ---- plane-fed path ----
    mtype_f, fuzz, refidx, malb, texv = shade_params_p(tables, rec)
    rec_a = dict(
        rec_common, mtype=mtype_f, fuzz=fuzz, refidx=refidx,
        ma0=malb[0], ma1=malb[1], ma2=malb[2],
        tx0=texv[0], tx1=texv[1], tx2=texv[2],
    )
    new_a, died_a, fb_a = shade_flush(
        state_pl, rec.hit, rec_a, background, fb0, jnp.int32(0),
        max_depth=MAX_DEPTH, gradient=scene.gradient_bg, interpret=True,
    )

    # ---- baked path ----
    consts = tables.shade_consts
    rec_b = dict(rec_common, mat=rec.mat.astype(jnp.float32))
    if consts[1]:
        sp = eval_special_p(tables, consts[1], rec.mat, rec.u, rec.v,
                            rec.p)
        rec_b.update(sp0=sp[0], sp1=sp[1], sp2=sp[2])
    new_b, died_b, fb_b = shade_flush(
        state_pl, rec.hit, rec_b, background, fb0, jnp.int32(0),
        max_depth=MAX_DEPTH, gradient=scene.gradient_bg, consts=consts,
        interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(died_b), np.asarray(died_a))
    np.testing.assert_array_equal(
        np.asarray(new_b["act"]), np.asarray(new_a["act"])
    )
    np.testing.assert_array_equal(
        np.asarray(new_b["bounce"]), np.asarray(new_a["bounce"])
    )
    for k in ("ox", "oy", "oz", "dx", "dy", "dz",
              "t0", "t1", "t2", "r0", "r1", "r2"):
        np.testing.assert_allclose(
            np.asarray(new_b[k]), np.asarray(new_a[k]),
            rtol=2e-6, atol=2e-6, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(fb_b), np.asarray(fb_a), rtol=1e-5, atol=1e-5
    )


def test_gate_rejects_many_materials():
    """bouncing_spheres (~490 distinct albedos) must stay plane-fed."""
    tb = build_scene("bouncing_spheres", 64, 32).tables
    assert tb.shade_consts is None
