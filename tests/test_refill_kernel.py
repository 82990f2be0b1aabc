"""Interpret-mode equivalence: fused Pallas refill kernel vs the jnp refill
stage of render_wavefront (same rank order, same camera math)."""

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core.camera import make_camera, rays_from_uniforms_p
from art_tpu.ops.refill_kernel import RAY_BLOCK, fused_refill, pack_camera

R = RAY_BLOCK * 2


def _jnp_refill(planes, uniforms, cam, next_q, spp, P, pix_offset,
                total_pixels, nx, ny):
    n_q = P * spp
    active = planes["act"] != 0
    dead = ~active
    dead_i = dead.astype(jnp.int32)
    rank = jnp.cumsum(dead_i) - dead_i
    q = next_q + rank
    take = dead & (q < n_q)
    p_row = q // spp  # sample-major (windowed-flush invariant)
    pixel = jnp.minimum(pix_offset + p_row, total_pixels - 1)
    i = (pixel % nx).astype(jnp.float32)
    j = (pixel // nx).astype(jnp.float32)
    uj0, uj1, ul0, ul1, ut = uniforms
    s = (i + uj0) / nx
    t = (j + uj1) / ny
    o_new, d_new, tm_new = rays_from_uniforms_p(cam, s, t, ul0, ul1, ut)
    out = {}
    for c, n in enumerate(("ox", "oy", "oz")):
        out[n] = jnp.where(take, o_new[c], planes[n])
    for c, n in enumerate(("dx", "dy", "dz")):
        out[n] = jnp.where(take, d_new[c], planes[n])
    out["tm"] = jnp.where(take, tm_new, planes["tm"])
    for n in ("t0", "t1", "t2"):
        out[n] = jnp.where(take, 1.0, planes[n])
    for n in ("r0", "r1", "r2"):
        out[n] = jnp.where(take, 0.0, planes[n])
    out["bounce"] = jnp.where(take, 0, planes["bounce"])
    out["pix"] = jnp.where(take, p_row, planes["pix"])
    out["act"] = (active | take).astype(jnp.int32)
    return out, jnp.sum(take.astype(jnp.int32))


def _random_state(seed, frac_active):
    ks = jax.random.split(jax.random.PRNGKey(seed), 20)
    planes = {}
    for i, n in enumerate(("ox", "oy", "oz", "dx", "dy", "dz", "tm",
                           "t0", "t1", "t2", "r0", "r1", "r2")):
        planes[n] = jax.random.uniform(ks[i], (R,), jnp.float32) * 7 - 3
    planes["bounce"] = jax.random.randint(ks[13], (R,), 0, 50, jnp.int32)
    planes["pix"] = jax.random.randint(ks[14], (R,), 0, 999, jnp.int32)
    planes["act"] = (
        jax.random.uniform(ks[15], (R,)) < frac_active
    ).astype(jnp.int32)
    uniforms = tuple(
        jax.random.uniform(ks[16], (5, R), jnp.float32)[i] for i in range(5)
    )
    return planes, uniforms


def _run_case(seed, frac_active, next_q, spp=7, P=1000, pix_offset=64000,
              total_pixels=64800, nx=360, ny=180):
    cam = make_camera(
        lookfrom=(13, 2, 3), lookat=(0, 0, 0), vup=(0, 1, 0),
        vfov_degrees=30.0, aspect=2.0, aperture=0.1, focus_dist=10.0,
        time0=0.0, time1=1.0,
    )
    planes, uniforms = _random_state(seed, frac_active)
    scal = jnp.asarray(
        [next_q // spp, next_q % spp, spp, P, pix_offset, total_pixels, nx, ny],
        jnp.int32,
    )
    got, got_count = fused_refill(
        planes, uniforms, pack_camera(cam), scal, interpret=True
    )
    want, want_count = _jnp_refill(
        planes, uniforms, cam, next_q, spp, P, pix_offset,
        total_pixels, nx, ny,
    )
    assert int(got_count) == int(want_count)
    for n in want:
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(want[n]), rtol=1e-5, atol=1e-5,
            err_msg=n,
        )


def test_fused_refill_mixed_pool():
    _run_case(0, frac_active=0.4, next_q=123)


def test_fused_refill_queue_nearly_exhausted():
    # next_q close to n_q: only part of the dead slots can take
    _run_case(1, frac_active=0.3, next_q=7 * 1000 - 500)


def test_fused_refill_queue_exhausted():
    _run_case(2, frac_active=0.5, next_q=7 * 1000)


def test_fused_refill_all_dead_cold_start():
    _run_case(3, frac_active=0.0, next_q=0)


def test_fused_refill_large_queue_ids():
    # sample*P arithmetic beyond the f32-exact range: the (sample, pixel)
    # decomposition must stay exact
    _run_case(4, frac_active=0.4, next_q=411 * 65536 + 65000,
              spp=500, P=65536, pix_offset=0, total_pixels=960000,
              nx=1200, ny=800)


# ---------------------------------------------------------------------------
# Seam-merged flush + refill (ops/refill_kernel.fused_refill_flush)
# ---------------------------------------------------------------------------


def _run_seam_case(seed, frac_active, next_q, base_row, spp=7, P=1000,
                   pix_offset=64000, total_pixels=64800, nx=360, ny=180,
                   n_hi=16):
    from art_tpu.ops.flush_kernel import flush_accumulate
    from art_tpu.ops.refill_kernel import fused_refill_flush

    cam = make_camera(
        lookfrom=(13, 2, 3), lookat=(0, 0, 0), vup=(0, 1, 0),
        vfov_degrees=30.0, aspect=2.0, aperture=0.1, focus_dist=10.0,
        time0=0.0, time1=1.0,
    )
    planes, uniforms = _random_state(seed, frac_active)
    # pix values inside and outside the window
    planes["pix"] = jax.random.randint(
        jax.random.PRNGKey(seed + 100), (R,), 0, P, jnp.int32
    )
    fb = jax.random.uniform(
        jax.random.PRNGKey(seed + 200), (n_hi, 384), jnp.float32
    )
    base = jnp.int32(base_row)
    scal = jnp.asarray(
        [next_q // spp, next_q % spp, spp, P, pix_offset, total_pixels, nx, ny],
        jnp.int32,
    )
    got, got_count, got_fb = fused_refill_flush(
        planes, uniforms, pack_camera(cam), scal, fb, base, interpret=True
    )

    # reference: flush every dead slot's radiance, then jnp refill with the
    # all-dead radiance-zeroing rule
    dead = planes["act"] == 0
    want_fb = flush_accumulate(
        planes["pix"], dead,
        (planes["r0"], planes["r1"], planes["r2"]),
        fb, base=base, interpret=True,
    )
    want, want_count = _jnp_refill(
        planes, uniforms, cam, next_q, spp, P, pix_offset,
        total_pixels, nx, ny,
    )
    for n in ("r0", "r1", "r2"):
        want[n] = jnp.where(dead, 0.0, want[n])

    assert int(got_count) == int(want_count)
    for n in want:
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(want[n]), rtol=1e-5, atol=1e-5,
            err_msg=n,
        )
    np.testing.assert_allclose(
        np.asarray(got_fb), np.asarray(want_fb), rtol=1e-5, atol=1e-5
    )


def test_seam_flush_refill_mixed_pool():
    _run_seam_case(10, frac_active=0.4, next_q=123, base_row=0)


def test_seam_flush_refill_windowed_base():
    # window starting mid-framebuffer: out-of-window dead slots are dropped
    _run_seam_case(11, frac_active=0.3, next_q=2000, base_row=3)


def test_seam_flush_refill_all_dead():
    _run_seam_case(12, frac_active=0.0, next_q=0, base_row=1)


def test_seam_flush_refill_queue_exhausted():
    # dead slots that cannot refill still flush (their radiance then zeroes)
    _run_seam_case(13, frac_active=0.5, next_q=7 * 1000, base_row=0)
