"""AOT Mosaic lowering checks for every production Pallas kernel.

Interpret-mode equivalence tests (test_pallas_kernels.py) validate the
MATH but execute the kernels as plain jnp — they cannot catch a missing
Mosaic lowering (e.g. cumsum, arccos, per-lane gather; see CLAUDE.md).
Historically only a real-TPU render caught those, hours after the bug
landed.  ``jax.jit(f).trace(...).lower(lowering_platforms=('tpu',))``
runs the Pallas->Mosaic lowering pipeline ON CPU, so an unsupported op in
any kernel body fails HERE, in CI.

(This validates lowering, not the Mosaic->LLO backend compile or
runtime behavior — those still need the real chip.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.models import build_scene
from art_tpu.ops import pallas_kernels as pk

RB = pk.RAY_BLOCK


def _lower_tpu(f, *args):
    jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))


def _rays(with_tm=True, R=RB):
    o = tuple(jnp.zeros((R,), jnp.float32) for _ in range(3))
    d = (jnp.ones((R,), jnp.float32),) * 3
    if with_tm:
        return o, d, jnp.zeros((R,), jnp.float32)
    return o, d


@pytest.fixture(scope="module")
def bouncing():
    return build_scene("bouncing_spheres", 64, 32).tables


@pytest.fixture(scope="module")
def final():
    return build_scene("final_scene", 64, 64).tables


def test_sphere_looped_lowers(bouncing):
    """Production flag combination for the headline scene, plus the
    SMEM-table variant (ART_TPU_SPH_SMEM)."""
    o, d, tm = _rays()

    def f(o, d, tm, smem):
        old = pk._SPH_SMEM
        pk._SPH_SMEM = smem
        try:
            return pk.sphere_hit_attrs_planar(
                bouncing.sph_packed, o, d, tm,
                n_moving=bouncing.sph_n_moving_pad,
                n_static=bouncing.sph_n_static,
                needs_uv=True, expand=bouncing.sph_expand,
                n_tail=bouncing.sph_n_tail, tail_r=bouncing.sph_tail_r,
                tail_mat=bouncing.sph_tail_mat, pos_r=bouncing.sph_pos_r,
            )
        finally:
            pk._SPH_SMEM = old

    _lower_tpu(lambda o, d, tm: f(o, d, tm, False), o, d, tm)
    _lower_tpu(lambda o, d, tm: f(o, d, tm, True), o, d, tm)


@pytest.mark.parametrize("scene", ["bouncing", "final"])
def test_sphere_static_lowers(scene, bouncing, final):
    tb = {"bouncing": bouncing, "final": final}[scene]
    o, d, tm = _rays()
    _lower_tpu(
        lambda o, d, tm: pk.sphere_static_hit_attrs(
            o, d, tm, cells=tb.sph_static_cells, tail_r=tb.sph_tail_r,
            tail_mat=tb.sph_tail_mat, pos_r=tb.sph_pos_r,
            expand=tb.sph_expand, needs_uv=True,
        ),
        o, d, tm,
    )


def test_sphere_skip_lowers(final):
    """Needy-skip binned kernel: jnp.any reductions + nested pl.when
    regions + per-bin fori_loops must all lower (both quadratic forms)."""
    assert final.sph_skip_bins is not None
    o, d, tm = _rays()
    for expand in (bool(final.sph_expand), False):
        _lower_tpu(
            lambda o, d, tm, e=expand: pk.sphere_skip_hit_attrs(
                final.sph_skip_packed, o, d, tm,
                meta=final.sph_skip_bins, tail_box=final.sph_tail_box,
                tail_r=final.sph_tail_r, tail_mat=final.sph_tail_mat,
                pos_r=final.sph_pos_r, expand=e, needs_uv=True,
            ),
            o, d, tm,
        )


def test_sphere_cellbin_lowers(bouncing):
    """Cell-binned kernel: per-cell pl.when regions with moving+static
    fori_loops and occlusion-bounded slab tests must lower (both
    quadratic forms)."""
    assert bouncing.sph_cellbin_meta is not None
    o, d, tm = _rays()
    for expand in (False, True):
        _lower_tpu(
            lambda o, d, tm, e=expand: pk.sphere_cellbin_hit_attrs(
                bouncing.sph_cellbin_packed, o, d, tm,
                meta=bouncing.sph_cellbin_meta,
                pos_r=bouncing.sph_pos_r, expand=e, needs_uv=True,
            ),
            o, d, tm,
        )


def test_sphere_cluster_lowers(bouncing):
    assert bouncing.n_sphere_clusters > 0
    o, d, tm = _rays()
    _lower_tpu(
        lambda o, d, tm: pk.sphere_hit_attrs_clustered(
            bouncing.sph_cl_packed, bouncing.sph_cl_box, o, d, tm,
            n_clusters=bouncing.n_sphere_clusters, moving=True,
            needs_uv=True,
        ),
        o, d, tm,
    )


def test_sphere_mxu_lowers(bouncing):
    assert bouncing.mxu_sphere_pad > 0
    o, d, tm = _rays()
    _lower_tpu(
        lambda o, d, tm: pk.sphere_hit_attrs_mxu(
            bouncing.sph_mxu_feat, bouncing.sph_mxu_attr, o, d, tm,
            s_pad=bouncing.mxu_sphere_pad, needs_uv=True,
        ),
        o, d, tm,
    )


def test_quad_and_box_lowers():
    # cornell_box keeps its rotated boxes in the box table (cornell_smoke
    # wraps them in ConstantMedium -> media boundaries instead)
    tb = build_scene("cornell_box", 64, 64).tables
    o, d = _rays(with_tm=False)
    _lower_tpu(
        lambda o, d: pk.quad_closest_hit_planar(
            tb.quad_packed, o, d, n_quads=tb.n_quads
        ),
        o, d,
    )
    assert tb.has_rotated_boxes
    _lower_tpu(
        lambda o, d: pk.box_hit_attrs_planar(
            tb.box_packed, o, d, n_boxes=tb.n_boxes, rotated=True
        ),
        o, d,
    )
    _lower_tpu(
        lambda o, d: pk.box_hit_attrs_planar(
            tb.box_packed, o, d, n_boxes=tb.n_boxes, rotated=False
        ),
        o, d,
    )


def test_box_grid_lowers(final):
    o, d = _rays(with_tm=False)
    kw = dict(
        kx=final.box_grid_kx, kz=final.box_grid_kz, x0=final.box_grid_x0,
        z0=final.box_grid_z0, w=final.box_grid_w, y0=final.box_grid_y0,
        uniform_mat=final.box_grid_mat,
    )
    _lower_tpu(
        lambda o, d: pk.box_grid_hit_attrs(final.box_grid, o, d, **kw), o, d
    )
    _lower_tpu(
        lambda o, d: pk.box_grid_static_hit_attrs(
            o, d, cells=final.box_grid_cells, **kw
        ),
        o, d,
    )


def test_box_cluster_lowers(final):
    assert final.n_box_clusters > 0
    o, d = _rays(with_tm=False)
    _lower_tpu(
        lambda o, d: pk.box_hit_attrs_clustered(
            final.box_cl_packed, final.box_cl_box, o, d,
            n_clusters=final.n_box_clusters, rotated=False,
        ),
        o, d,
    )


def test_flush_kernel_lowers():
    from art_tpu.ops.flush_kernel import flush_accumulate

    pix = jnp.zeros((RB,), jnp.int32)
    died = jnp.zeros((RB,), bool)
    radiance = tuple(jnp.zeros((RB,), jnp.float32) for _ in range(3))
    fb = jnp.zeros((16, 384), jnp.float32)
    _lower_tpu(
        lambda pix, died, radiance, fb: flush_accumulate(
            pix, died, radiance, fb, base=jnp.int32(0)
        ),
        pix, died, radiance, fb,
    )


def test_turbulence_kernel_lowers():
    from art_tpu.ops.perlin_kernel import turb_pallas

    p = tuple(jnp.zeros((RB,), jnp.float32) for _ in range(3))
    _lower_tpu(lambda px, py, pz: turb_pallas(px, py, pz, depth=7), *p)
    # per-lane octave count (NOODLE textures) adds an input plane
    dm = jnp.zeros((RB,), jnp.int32)
    _lower_tpu(
        lambda px, py, pz, dm: turb_pallas(px, py, pz, depth=7, depth_mask=dm),
        *p, dm,
    )


def test_refill_kernels_lower(bouncing):
    """All three fused-refill forms, incl. the hardware-PRNG paths."""
    from art_tpu.models import build_scene as bs
    from art_tpu.ops.refill_kernel import (
        fused_refill,
        fused_refill_flush_rng,
        fused_refill_rng,
        pack_camera,
    )

    cam_vec = pack_camera(bs("bouncing_spheres", 64, 32).camera)
    z = jnp.zeros((RB,), jnp.float32)
    zi = jnp.zeros((RB,), jnp.int32)
    planes = dict(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=z, tm=z,
        t0=z, t1=z, t2=z, r0=z, r1=z, r2=z,
        bounce=zi, pix=zi, act=zi,
    )
    scal = jnp.zeros((8,), jnp.int32)
    key2 = jnp.zeros((2,), jnp.int32)
    uni = tuple(z for _ in range(5))
    _lower_tpu(
        lambda p, u, c, s: fused_refill(p, u, c, s), planes, uni, cam_vec,
        scal,
    )
    _lower_tpu(
        lambda p, k, c, s: fused_refill_rng(p, k, c, s, n_media=2),
        planes, key2, cam_vec, scal,
    )
    window = jnp.zeros((16, 384), jnp.float32)
    _lower_tpu(
        lambda p, k, c, s, w: fused_refill_flush_rng(
            p, k, c, s, w, jnp.int32(0), n_media=2
        ),
        planes, key2, cam_vec, scal, window,
    )


@pytest.mark.parametrize("scene_name", ["bouncing_spheres", "final_scene"])
def test_full_wavefront_step_lowers(scene_name, monkeypatch):
    """The WHOLE production render step — fused refill (hardware PRNG) +
    Pallas intersection + shade + windowed Pallas flush composed under
    one jit — must cross-lower for TPU.  ART_TPU_FORCE_PALLAS turns every
    backend gate (core/platform.tpu_paths) to the TPU decision on this
    CPU host; catches wiring regressions interpret-mode math tests miss.
    final_scene additionally routes the grid-static box kernel, the
    compacted image fetch, and the turbulence kernel."""
    monkeypatch.setenv("ART_TPU_FORCE_PALLAS", "1")
    from art_tpu.render.integrator import render_wavefront

    scene = build_scene(scene_name, 64, 64)
    key = jax.random.PRNGKey(0)
    bg = jnp.asarray(scene.background, jnp.float32)
    jitted = jax.jit(
        render_wavefront,
        static_argnames=(
            "spp", "tile_pixels", "total_pixels", "nx", "ny",
            "max_depth", "gradient_bg", "n_slots",
        ),
    )
    jitted.trace(
        scene.tables, scene.camera, jnp.int32(0), key=key, background=bg,
        spp=8, tile_pixels=1024, total_pixels=64 * 64, nx=64, ny=64,
        max_depth=8, gradient_bg=scene.gradient_bg, n_slots=RB,
    ).lower(lowering_platforms=("tpu",))


def test_full_wavefront_step_lowers_adaptive_flush_window(monkeypatch):
    """ART_TPU_FLUSH_WIN's lax.cond over two flush window shapes must
    cross-lower inside the full render step."""
    monkeypatch.setenv("ART_TPU_FORCE_PALLAS", "1")
    from art_tpu.render import integrator

    monkeypatch.setattr(integrator, "_FLUSH_WIN", 16)
    from art_tpu.render.integrator import render_wavefront

    scene = build_scene("bouncing_spheres", 256, 128)
    key = jax.random.PRNGKey(0)
    bg = jnp.asarray(scene.background, jnp.float32)
    jitted = jax.jit(
        render_wavefront,
        static_argnames=(
            "spp", "tile_pixels", "total_pixels", "nx", "ny",
            "max_depth", "gradient_bg", "n_slots",
        ),
    )
    # tile_pixels 32768 -> n_hi_pallas 256 with a 24-row worst-case window
    # (R=8192, spp=50, depth=8): both the small (16) and fallback windows
    # exist and the cond composes them
    jitted.trace(
        scene.tables, scene.camera, jnp.int32(0), key=key, background=bg,
        spp=50, tile_pixels=32768, total_pixels=256 * 128, nx=256, ny=128,
        max_depth=8, gradient_bg=scene.gradient_bg, n_slots=RB,
    ).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("scene_name", ["final_scene", "original_scene"])
def test_full_wavefront_step_lowers_compact_sphere(scene_name, monkeypatch):
    """ART_TPU_COMPACT_SPH's compacted tail-sphere pass (head kernel +
    MXU ray-id compaction + K-batch tail kernel + row scatter under
    lax.cond) must cross-lower inside the full render step.  Pool = 2x
    RAY_BLOCK so R > SPH_K engages the split (the intersect gate is
    dense-only otherwise)."""
    monkeypatch.setenv("ART_TPU_FORCE_PALLAS", "1")
    from art_tpu.ops import intersect

    monkeypatch.setattr(intersect, "_COMPACT_SPH", True)
    from art_tpu.render.integrator import render_wavefront

    scene = build_scene(scene_name, 64, 64)
    key = jax.random.PRNGKey(0)
    bg = jnp.asarray(scene.background, jnp.float32)
    jitted = jax.jit(
        render_wavefront,
        static_argnames=(
            "spp", "tile_pixels", "total_pixels", "nx", "ny",
            "max_depth", "gradient_bg", "n_slots",
        ),
    )
    jitted.trace(
        scene.tables, scene.camera, jnp.int32(0), key=key, background=bg,
        spp=8, tile_pixels=1024, total_pixels=64 * 64, nx=64, ny=64,
        max_depth=8, gradient_bg=scene.gradient_bg, n_slots=2 * RB,
    ).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("scene_name", ["final_scene", "original_scene"])
def test_full_wavefront_step_lowers_compact_turb(scene_name, monkeypatch):
    """ART_TPU_COMPACT_TURB's compacted-turbulence step (flush-kernel
    scatter + K-batch turb kernel under lax.cond) must cross-lower inside
    the full render step — final_scene routes the marble (NOISE) branch,
    original_scene the NOODLE branch (per-lane octave plane).  Pool = 2x
    RAY_BLOCK so R > K engages the compact branch (at R <= FETCH_K the
    gate is dense-only)."""
    monkeypatch.setenv("ART_TPU_FORCE_PALLAS", "1")
    from art_tpu.ops import texture_eval as te

    monkeypatch.setattr(te, "_COMPACT_TURB", True)
    from art_tpu.render.integrator import render_wavefront

    scene = build_scene(scene_name, 64, 64)
    key = jax.random.PRNGKey(0)
    bg = jnp.asarray(scene.background, jnp.float32)
    jitted = jax.jit(
        render_wavefront,
        static_argnames=(
            "spp", "tile_pixels", "total_pixels", "nx", "ny",
            "max_depth", "gradient_bg", "n_slots",
        ),
    )
    jitted.trace(
        scene.tables, scene.camera, jnp.int32(0), key=key, background=bg,
        spp=8, tile_pixels=1024, total_pixels=64 * 64, nx=64, ny=64,
        max_depth=8, gradient_bg=scene.gradient_bg, n_slots=2 * RB,
    ).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize(
    "scene_name", ["quads", "three_spheres", "checkered_spheres",
                   "perlin", "simple_light_book"]
)
def test_sp_kernel_lowers(scene_name):
    """Short-path megakernel (ops/sp_kernel.py): both RNG and
    uniforms-as-inputs variants cross-lower for every gated scene."""
    from art_tpu.ops.refill_kernel import pack_camera
    from art_tpu.ops.sp_kernel import sp_step, sp_step_rng

    scene = build_scene(scene_name, 64, 32)
    assert scene.tables.sp_consts is not None
    cam_vec = pack_camera(scene.camera)
    z = jnp.zeros((RB,), jnp.float32)
    zi = jnp.zeros((RB,), jnp.int32)
    planes = dict(
        ox=z, oy=z, oz=z, dx=z, dy=z, dz=z, tm=z,
        t0=z, t1=z, t2=z, r0=z, r1=z, r2=z,
        bounce=zi, pix=zi, act=zi,
    )
    scal = jnp.zeros((8,), jnp.int32)
    key2 = jnp.zeros((2,), jnp.int32)
    bg = jnp.zeros((3,), jnp.float32)
    kw = dict(
        consts=scene.tables.sp_consts, n_media=1, max_depth=50,
        gradient=scene.gradient_bg,
    )
    _lower_tpu(
        lambda p, k, c, s, b: sp_step_rng(p, k, c, s, b, **kw),
        planes, key2, cam_vec, scal, bg,
    )
    uni = tuple(z for _ in range(10))
    _lower_tpu(
        lambda p, u, c, s, b: sp_step(p, u, c, s, b, **kw),
        planes, uni, cam_vec, scal, bg,
    )
    from art_tpu.ops.sp_kernel import sp_step_flush_rng

    window = jnp.zeros((16, 384), jnp.float32)
    _lower_tpu(
        lambda p, k, c, s, b, w: sp_step_flush_rng(
            p, k, c, s, b, w, jnp.int32(0), **kw
        ),
        planes, key2, cam_vec, scal, bg, window,
    )


@pytest.mark.parametrize("scene_name", ["quads", "perlin"])
def test_full_wavefront_step_lowers_sp(monkeypatch, scene_name):
    """The full render step with the short-path megakernel engaged
    (use_sp gate on: kernel RNG + sp_consts) cross-lowers — incl. the
    inline-turbulence marble form (perlin)."""
    monkeypatch.setenv("ART_TPU_FORCE_PALLAS", "1")
    from art_tpu.render.integrator import render_wavefront

    scene = build_scene(scene_name, 64, 32)
    assert scene.tables.sp_consts is not None
    key = jax.random.PRNGKey(0)
    bg = jnp.asarray(scene.background, jnp.float32)
    jitted = jax.jit(
        render_wavefront,
        static_argnames=(
            "spp", "tile_pixels", "total_pixels", "nx", "ny",
            "max_depth", "gradient_bg", "n_slots",
        ),
    )
    jitted.trace(
        scene.tables, scene.camera, jnp.int32(0), key=key, background=bg,
        spp=8, tile_pixels=1024, total_pixels=64 * 32, nx=64, ny=32,
        max_depth=8, gradient_bg=scene.gradient_bg, n_slots=RB,
    ).lower(lowering_platforms=("tpu",))


def test_shade_flush_kernel_lowers():
    """Fused shade+flush kernel (ops/shade_kernel.py) cross-lowers: the
    scatter chain, the exp(log/3) ball root, and the in-kernel one-hot
    MXU flush all have Mosaic lowerings."""
    from art_tpu.ops.shade_kernel import _REC_F, _STATE_F, _STATE_I, shade_flush

    z = jnp.zeros((RB,), jnp.float32)
    zi = jnp.zeros((RB,), jnp.int32)
    state = {n: z for n in _STATE_F}
    state.update({n: zi for n in _STATE_I})
    rec = {n: z for n in _REC_F}
    hit = jnp.zeros((RB,), bool)
    bg = jnp.zeros((3,), jnp.float32)
    window = jnp.zeros((16, 384), jnp.float32)
    for gradient in (False, True):
        _lower_tpu(
            lambda s, h, r, b, w: shade_flush(
                s, h, r, b, w, jnp.int32(0),
                max_depth=50, gradient=gradient,
            ),
            state, hit, rec, bg, window,
        )


def test_shade_flush_baked_lowers():
    """Baked-consts shade kernel mode: the in-kernel material blends,
    checker parity (floor + int cast + bitwise and) and sp-plane routing
    must lower for the gate's texture-kind span (solids+checker /
    image / image+noise+metal+dielectric)."""
    from art_tpu.ops.shade_kernel import (
        _STATE_F,
        _STATE_I,
        rec_names,
        shade_flush,
    )

    z = jnp.zeros((RB,), jnp.float32)
    zi = jnp.zeros((RB,), jnp.int32)
    hit = jnp.zeros((RB,), bool)
    bg = jnp.zeros((3,), jnp.float32)
    window = jnp.zeros((16, 384), jnp.float32)
    for scene_name in ("final_scene", "earth", "cornell_smoke"):
        consts = build_scene(scene_name, 64, 64).tables.shade_consts
        assert consts is not None
        state = {n: z for n in _STATE_F}
        state.update({n: zi for n in _STATE_I})
        rec = {n: z for n in rec_names(consts)}
        _lower_tpu(
            lambda s, h, r, b, w, c=consts: shade_flush(
                s, h, r, b, w, jnp.int32(0),
                max_depth=50, gradient=False, consts=c,
            ),
            state, hit, rec, bg, window,
        )


@pytest.mark.parametrize("scene_name", ["final_scene", "cornell_smoke"])
def test_full_wavefront_step_lowers_shade_kernel(scene_name, monkeypatch):
    """The full render step with the fused shade+flush kernel engaged
    (the r3 default; ART_TPU_NO_SHADE_KERNEL reverts) cross-lowers, incl. the adaptive-window
    lax.cond over two kernel window shapes."""
    monkeypatch.setenv("ART_TPU_FORCE_PALLAS", "1")
    from art_tpu.render import integrator

    monkeypatch.setattr(integrator, "_SHADE_K", True)
    monkeypatch.setattr(integrator, "_FLUSH_WIN", 16)
    from art_tpu.render.integrator import render_wavefront

    scene = build_scene(scene_name, 256, 128)
    key = jax.random.PRNGKey(0)
    bg = jnp.asarray(scene.background, jnp.float32)
    jitted = jax.jit(
        render_wavefront,
        static_argnames=(
            "spp", "tile_pixels", "total_pixels", "nx", "ny",
            "max_depth", "gradient_bg", "n_slots",
        ),
    )
    jitted.trace(
        scene.tables, scene.camera, jnp.int32(0), key=key, background=bg,
        spp=50, tile_pixels=32768, total_pixels=256 * 128, nx=256, ny=128,
        max_depth=8, gradient_bg=scene.gradient_bg, n_slots=RB,
    ).lower(lowering_platforms=("tpu",))


def test_table_gather_u24_lowers():
    """Wide-tier route-back kernel (ops/flush_kernel.table_gather_u24)."""
    from art_tpu.ops.flush_kernel import table_gather_u24

    tab = jnp.zeros((49152,), jnp.int32)
    idx = jnp.zeros((2 * RB,), jnp.int32)
    _lower_tpu(lambda t, i: table_gather_u24(t, i), tab, idx)


def test_wide_compact_gather_lowers():
    """All three tiers of the adaptive image fetch, production shapes
    (earth: R = 2^17, atlas 2^19, K2 = 49152)."""
    from art_tpu.ops.compact_fetch import compact_gather

    data = jnp.zeros((1 << 19,), jnp.uint32)
    flat = jnp.zeros((1 << 17,), jnp.int32)
    needy = jnp.zeros((1 << 17,), bool)
    _lower_tpu(
        lambda d, f, n: compact_gather(d, f, n, max_value_bits=24),
        data, flat, needy,
    )


def test_sphere_mxu_tail_lowers(final):
    """Recentered tail MXU tables at s_pad=1024 (ART_TPU_MXU_TAIL)."""
    assert final.mxu_tail_pad == 1024
    o, d, tm = _rays(R=2 * RB)

    def f(o, d, tm):
        return pk.sphere_hit_attrs_mxu(
            final.sph_mxu_tail_feat, final.sph_mxu_tail_attr, o, d, tm,
            s_pad=final.mxu_tail_pad, needs_uv=False,
        )

    _lower_tpu(f, o, d, tm)
