"""Interpret-mode equivalence: the Pallas TPU intersection kernels vs the
portable jnp reference path.

The suite forces a CPU backend (conftest), so the production kernels in
ops/pallas_kernels.py would otherwise run only in ad-hoc TPU renders.
Here every kernel executes via ``pl.pallas_call(..., interpret=True)`` on
the *real scene tables* against random ray batches and must match the jnp
candidates/attributes path (ops/intersect.py) to fp tolerance — CI fails
if the kernel and reference math ever diverge (VERDICT r1 weakness #2/#5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.core.vecmath import BIG, T_MIN
from art_tpu.models import build_scene
from art_tpu.ops import intersect
from art_tpu.ops import pallas_kernels as pk

RB = pk.RAY_BLOCK  # kernels require R to be a multiple of this


def _ray_batch(seed, n, origin_span=20.0, origin_center=(0.0, 3.0, 0.0)):
    """Random rays covering the scene volume, planar tuples."""
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    o = (
        jax.random.uniform(k0, (n, 3), jnp.float32) - 0.5
    ) * origin_span + jnp.asarray(origin_center, jnp.float32)
    d = jax.random.normal(k1, (n, 3), jnp.float32)
    # keep direction lengths realistic (camera rays are not normalized)
    tm = jax.random.uniform(k2, (n,), jnp.float32)
    op = (o[:, 0], o[:, 1], o[:, 2])
    dp = (d[:, 0], d[:, 1], d[:, 2])
    return op, dp, tm


def _hit_mask(t):
    return np.asarray(t) < BIG * 0.5


def _assert_two_tier(actual, desired, tight_rtol, tight_atol, frac=0.98,
                     loose_rtol=2e-2, loose_atol=1e-2, loose_budget=0):
    """All lanes within loose tolerance; >= frac within tight tolerance.

    Near-tangent hits (disc ~ 0) legitimately amplify fp association-order
    differences between the kernel and the broadcast jnp path into ~1e-3
    relative t differences; a genuine math divergence fails the loose tier.
    ``loose_budget`` admits that many isolated knife-edge lanes (a true
    tangent graze makes t itself ill-conditioned: dt ~ sqrt(eps)); scene
    layouts occasionally place one in a fixed ray batch (e.g. the r3
    XORWOW bouncing layout puts 1/5204 at rel 0.096 for the MXU kernel).
    Returns the tight-agreement mask so attribute checks can condition on
    it (budgeted lanes are excluded from it).
    """
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    loose = np.isclose(actual, desired, rtol=loose_rtol, atol=loose_atol)
    n_out = int((~loose).sum())
    if n_out > loose_budget:
        np.testing.assert_allclose(
            actual, desired, rtol=loose_rtol, atol=loose_atol
        )
    tight = np.isclose(actual, desired, rtol=tight_rtol, atol=tight_atol)
    assert tight.mean() >= frac, f"only {tight.mean():.4f} within tight tol"
    return tight


def test_sphere_kernel_matches_jnp_candidates():
    """bouncing_spheres: 488 spheres incl. moving + signed radius."""
    tables = build_scene("bouncing_spheres", 64, 32).tables
    o, d, tm = _ray_batch(0, RB)

    t_k, n_k, u_k, v_k, mat_k = pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=True, interpret=True,
    )
    t_j, idx_j = intersect.sphere_candidates_p(tables, o, d, tm, T_MIN)
    n_j, u_j, v_j, mat_j = intersect.sphere_attributes_p(
        tables, o, d, tm, t_j, idx_j, needs_uv=True
    )

    hit = _hit_mask(t_j)
    assert hit.any() and (~hit).any(), "batch should mix hits and misses"
    np.testing.assert_array_equal(_hit_mask(t_k), hit)
    tight = _assert_two_tier(
        np.asarray(t_k)[hit], np.asarray(t_j)[hit], tight_rtol=2e-5, tight_atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(mat_k)[hit][tight], np.asarray(mat_j)[hit][tight]
    )
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(n_k[c])[hit][tight], np.asarray(n_j[c])[hit][tight],
            rtol=1e-3, atol=2e-3,
        )
    np.testing.assert_allclose(
        np.asarray(u_k)[hit][tight], np.asarray(u_j)[hit][tight], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_k)[hit][tight], np.asarray(v_j)[hit][tight], atol=1e-3
    )


def test_sphere_kernel_nondivisor_unroll(monkeypatch):
    """ART_TPU_SPH_UNROLL values that don't divide 32 (e.g. 24) must not
    drop real rows or read past the table: pack_spheres pads segments to
    lcm(32, UNROLL).  Hit sets must equal the jnp path exactly."""
    import math as _math

    from art_tpu.scene import materials as M
    from art_tpu.scene import objects as O
    from art_tpu.scene.builder import SceneBuilder

    monkeypatch.setattr(pk, "_SPH_UNROLL", 24)
    rng = np.random.default_rng(7)
    mat = M.Lambertian((0.5, 0.5, 0.5))
    objs = []
    for i in range(50):  # moving: 50 % 24 != 0 and 50 > 2*24
        c = tuple((rng.random(3) - 0.5) * 16.0 + np.array([0.0, 3.0, 0.0]))
        c2 = tuple(np.asarray(c) + (rng.random(3) - 0.5))
        objs.append(O.Sphere(c, 0.5 + rng.random(), mat, center2=c2))
    for i in range(60):  # static: forces the ceil-bound tail reads
        c = tuple((rng.random(3) - 0.5) * 16.0 + np.array([0.0, 3.0, 0.0]))
        objs.append(O.Sphere(c, 0.5 + rng.random(), mat))
    b = SceneBuilder()
    b.add(*objs)
    b.set_camera(lookfrom=(0, 3, 20), lookat=(0, 3, 0), vup=(0, 1, 0),
                 vfov_degrees=40.0, aspect=1.0, aperture=0.0, focus_dist=20.0)
    tables = b.compile().tables

    lcm = 32 * 24 // _math.gcd(32, 24)
    assert tables.sph_n_moving_pad % lcm == 0
    assert tables.sph_packed.shape[0] % lcm == 0

    o, d, tm = _ray_batch(23, RB)
    t_k, *_ = pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=False, interpret=True,
    )
    t_j, _ = intersect.sphere_candidates_p(tables, o, d, tm, T_MIN)
    np.testing.assert_array_equal(_hit_mask(t_k), _hit_mask(t_j))
    hit = _hit_mask(t_j)
    assert hit.any()
    _assert_two_tier(
        np.asarray(t_k)[hit], np.asarray(t_j)[hit], tight_rtol=2e-5,
        tight_atol=1e-5,
    )


def test_sphere_kernel_expanded_matches_standard():
    """The expanded-quadratic static loop (pack_spheres col 9, builder
    sph_expand gate) must agree with the jnp reference path to the same
    tiers as the standard form — hit sets identical, t within fp slack."""
    tables = build_scene("bouncing_spheres", 64, 32).tables
    assert tables.sph_expand, "bouncing must pass the expansion safety gate"
    o, d, tm = _ray_batch(5, RB)

    t_e, n_e, _, _, mat_e = pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=False, expand=True, interpret=True,
    )
    t_j, idx_j = intersect.sphere_candidates_p(tables, o, d, tm, T_MIN)
    n_j, _, _, mat_j = intersect.sphere_attributes_p(
        tables, o, d, tm, t_j, idx_j, needs_uv=False
    )

    hit = _hit_mask(t_j)
    hit_e = _hit_mask(t_e)
    # expanded rounding may flip a few grazing hits; sets must agree ~exactly
    assert (hit_e == hit).mean() > 0.999
    both = hit & hit_e
    tight = _assert_two_tier(
        np.asarray(t_e)[both], np.asarray(t_j)[both],
        tight_rtol=1e-4, tight_atol=1e-4, frac=0.97,
    )
    np.testing.assert_array_equal(
        np.asarray(mat_e)[both][tight], np.asarray(mat_j)[both][tight]
    )
    for c in range(3):
        # atol 1e-2: grazing lanes that pass the t tier can still amplify
        # the expansion's rounding into ~1e-2 normal shifts (observed: 1
        # lane in 5268 at 8e-3)
        np.testing.assert_allclose(
            np.asarray(n_e[c])[both][tight], np.asarray(n_j[c])[both][tight],
            rtol=1e-3, atol=1e-2,
        )


def test_sphere_kernel_tail_and_pos_r_match_baseline_kernel():
    """final_scene: the 1000-ball uniform cluster triggers the constant-
    attribute tail loop, and the all-positive radii trigger the pos_r
    carry cut (radius recovered via one rsqrt).  Both are pure carry/load
    restructurings of the SAME candidate math, so they must reproduce the
    baseline (expand-only) kernel near-exactly — hits and materials
    identical, t bit-comparable, normals within the one extra
    normalization rounding.  (A direct jnp comparison would only re-test
    the expanded quadratic's known grazing-ray slack at this scene's
    coordinate scale — identical tight-fraction measured with and without
    the tail/pos_r paths.)"""
    tables = build_scene("final_scene", 64, 32).tables
    assert tables.sph_n_tail >= 900, "cluster should be tail-grouped"
    assert tables.sph_pos_r, "final_scene has no hollow glass"
    o, d, tm = _ray_batch(
        7, RB, origin_span=700.0, origin_center=(250.0, 250.0, 200.0)
    )

    base = dict(
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=True, expand=True, interpret=True,
    )
    t_0, n_0, u_0, v_0, mat_0 = pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm, **base
    )
    t_k, n_k, u_k, v_k, mat_k = pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_tail=tables.sph_n_tail, tail_r=tables.sph_tail_r,
        tail_mat=tables.sph_tail_mat, pos_r=True, **base,
    )

    hit = _hit_mask(t_0)
    assert hit.any() and (~hit).any(), "batch should mix hits and misses"
    np.testing.assert_array_equal(_hit_mask(t_k), hit)
    # tail-loop winners must actually occur for this to test anything
    assert (np.asarray(mat_k)[hit] == int(tables.sph_tail_mat)).any()
    np.testing.assert_array_equal(np.asarray(mat_k)[hit], np.asarray(mat_0)[hit])
    np.testing.assert_allclose(
        np.asarray(t_k)[hit], np.asarray(t_0)[hit], rtol=1e-6, atol=1e-6
    )
    for c in range(3):
        # pos_r normalizes unit(p - c) while the baseline divides by r; a
        # grazing hit point sits ~1e-3 r off the sphere, so the two can
        # differ by that much (the unit form is the more exact one)
        np.testing.assert_allclose(
            np.asarray(n_k[c])[hit], np.asarray(n_0[c])[hit],
            rtol=1e-3, atol=2e-3,
        )
    np.testing.assert_allclose(np.asarray(u_k)[hit], np.asarray(u_0)[hit], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_k)[hit], np.asarray(v_0)[hit], atol=1e-3)


def test_expansion_gate_rejects_small_far_spheres():
    """A tiny sphere far from the origin must disable the expansion (its
    cancellation error would exceed 1% of r^2)."""
    from art_tpu.scene.builder import SceneBuilder
    from art_tpu.scene import materials as M, objects as O

    b = SceneBuilder()
    b.add(O.Sphere((5000.0, 0.0, 0.0), 0.05, M.Lambertian((0.5, 0.5, 0.5))))
    b.set_camera(lookfrom=(0, 0, 10), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov_degrees=40.0, aspect=1.0, aperture=0.0, focus_dist=10.0)
    assert not b.compile().tables.sph_expand


def test_sphere_kernel_inside_hits_use_far_root():
    """Rays from inside a sphere: the t2 fallback paths must agree
    (jnp gates t1/t2 separately; the kernel selects then masks)."""
    tables = build_scene("three_spheres", 64, 32).tables
    # origins inside the big glass sphere at (0,0,-1) r=0.5 region
    o, d, tm = _ray_batch(1, RB, origin_span=0.4, origin_center=(0.0, 0.0, -1.0))
    t_k, _, _, _, mat_k = pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=False, interpret=True,
    )
    t_j, _ = intersect.sphere_candidates_p(tables, o, d, tm, T_MIN)
    hit = _hit_mask(t_j)
    assert hit.mean() > 0.9  # inside geometry: almost everything hits
    np.testing.assert_array_equal(_hit_mask(t_k), hit)
    _assert_two_tier(
        np.asarray(t_k)[hit], np.asarray(t_j)[hit], tight_rtol=2e-5, tight_atol=1e-5
    )


def test_quad_kernel_matches_jnp_candidates():
    """cornell: 6 quads (axis-aligned, inward normals)."""
    tables = build_scene("cornell_box", 64, 64).tables
    assert tables.n_quads > 0
    o, d, tm = _ray_batch(2, RB, origin_span=500.0, origin_center=(278, 278, 0))

    t_k, idx_k = pk.quad_closest_hit_planar(
        tables.quad_packed, o, d, n_quads=tables.n_quads, interpret=True
    )
    t_j, idx_j = intersect.quad_candidates_p(tables, o, d, T_MIN)

    hit = _hit_mask(t_j)
    assert hit.any() and (~hit).any()
    np.testing.assert_array_equal(_hit_mask(t_k), hit)
    np.testing.assert_allclose(
        np.asarray(t_k)[hit], np.asarray(t_j)[hit], rtol=2e-5, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(idx_k)[hit], np.asarray(idx_j)[hit])


def test_box_kernel_matches_jnp_rotated():
    """cornell: two rotated+translated boxes — full attribute comparison."""
    tables = build_scene("cornell_box", 64, 64).tables
    assert tables.n_boxes > 0 and tables.has_rotated_boxes
    o, d, tm = _ray_batch(3, RB, origin_span=600.0, origin_center=(278, 200, 100))

    t_k, n_k, u_k, v_k, mat_k = pk.box_hit_attrs_planar(
        tables.box_packed, o, d,
        n_boxes=tables.n_boxes, rotated=tables.has_rotated_boxes,
        interpret=True,
    )
    t_j, idx_j = intersect.box_candidates_p(tables, o, d, T_MIN)
    n_j, u_j, v_j, mat_j = intersect.box_attributes_p(tables, o, d, t_j, idx_j)

    hit = _hit_mask(t_j)
    assert hit.any() and (~hit).any()
    np.testing.assert_array_equal(_hit_mask(t_k), hit)
    np.testing.assert_allclose(
        np.asarray(t_k)[hit], np.asarray(t_j)[hit], rtol=2e-5, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(mat_k)[hit], np.asarray(mat_j)[hit])
    # face identification can legitimately differ exactly on box edges;
    # require 99.9% agreement and exact agreement away from edges
    n_k0 = np.asarray(n_k[0])[hit]
    n_j0 = np.asarray(n_j[0])[hit]
    agree = np.isclose(n_k0, n_j0, atol=2e-4)
    assert agree.mean() > 0.999
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(n_k[c])[hit][agree], np.asarray(n_j[c])[hit][agree],
            rtol=1e-4, atol=2e-4,
        )
    np.testing.assert_allclose(
        np.asarray(u_k)[hit][agree], np.asarray(u_j)[hit][agree], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_k)[hit][agree], np.asarray(v_j)[hit][agree], atol=1e-3
    )


def test_box_kernel_matches_jnp_axis_aligned():
    """final_scene ground: 400 axis-aligned boxes (rotated=False branch)."""
    tables = build_scene("final_scene", 64, 64).tables
    assert tables.n_boxes >= 400
    o, d, tm = _ray_batch(4, RB, origin_span=2200.0, origin_center=(0, 200, 0))

    t_k, _, _, _, mat_k = pk.box_hit_attrs_planar(
        tables.box_packed, o, d,
        n_boxes=tables.n_boxes, rotated=tables.has_rotated_boxes,
        interpret=True,
    )
    t_j, idx_j = intersect.box_candidates_p(tables, o, d, T_MIN)
    hit = _hit_mask(t_j)
    assert hit.any() and (~hit).any()
    np.testing.assert_array_equal(_hit_mask(t_k), hit)
    np.testing.assert_allclose(
        np.asarray(t_k)[hit], np.asarray(t_j)[hit], rtol=2e-5, atol=1e-3
    )


def test_box_grid_kernel_matches_brute():
    """The shared-slab grid kernel must agree with the brute box kernel on
    the final_scene ground field (the builder must detect the 20x20 grid),
    including full winner attributes."""
    tables = build_scene("final_scene", 64, 64).tables
    assert tables.box_grid_kx == 20 and tables.box_grid_kz == 20
    o, d, tm = _ray_batch(6, RB, origin_span=2200.0, origin_center=(0, 200, 0))

    t_g, n_g, u_g, v_g, m_g = pk.box_grid_hit_attrs(
        tables.box_grid, o, d,
        kx=tables.box_grid_kx, kz=tables.box_grid_kz,
        x0=tables.box_grid_x0, z0=tables.box_grid_z0,
        w=tables.box_grid_w, y0=tables.box_grid_y0, interpret=True,
    )
    t_b, n_b, u_b, v_b, m_b = pk.box_hit_attrs_planar(
        tables.box_packed, o, d,
        n_boxes=tables.n_boxes, rotated=False, interpret=True,
    )
    hit = _hit_mask(t_b)
    assert hit.any() and (~hit).any()
    np.testing.assert_array_equal(_hit_mask(t_g), hit)
    np.testing.assert_allclose(
        np.asarray(t_g)[hit], np.asarray(t_b)[hit], rtol=2e-5, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(m_g)[hit], np.asarray(m_b)[hit])
    # Adjacent grid cells share planes EXACTLY, so a ray grazing a shared
    # edge ties in t and the two kernels may pick different (equally valid)
    # winner cells with different UVs; face id can likewise flip on a box's
    # own edges.  t/mat/hit-mask above are strict; require full attribute
    # agreement on >= 99% of hits (ties are a measure-zero-ish edge set).
    agree = np.ones(int(hit.sum()), bool)
    for c in range(3):
        agree &= np.isclose(
            np.asarray(n_g[c])[hit], np.asarray(n_b[c])[hit],
            rtol=1e-4, atol=2e-4,
        )
    agree &= np.isclose(np.asarray(u_g)[hit], np.asarray(u_b)[hit], atol=1e-3)
    agree &= np.isclose(np.asarray(v_g)[hit], np.asarray(v_b)[hit], atol=1e-3)
    assert agree.mean() > 0.99, agree.mean()

    # final_scene's ground boxes share one material -> the builder gates
    # the constant-material kernel form; it must be bit-identical to the
    # mixed-material form (same candidate math, one fewer carry).
    assert tables.box_grid_mat >= 0.0
    t_u, n_u, u_u, v_u, m_u = pk.box_grid_hit_attrs(
        tables.box_grid, o, d,
        kx=tables.box_grid_kx, kz=tables.box_grid_kz,
        x0=tables.box_grid_x0, z0=tables.box_grid_z0,
        w=tables.box_grid_w, y0=tables.box_grid_y0,
        uniform_mat=tables.box_grid_mat, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(t_u), np.asarray(t_g))
    np.testing.assert_array_equal(np.asarray(m_u)[hit], np.asarray(m_g)[hit])
    for c in range(3):
        np.testing.assert_array_equal(
            np.asarray(n_u[c])[hit], np.asarray(n_g[c])[hit]
        )
    np.testing.assert_array_equal(np.asarray(u_u)[hit], np.asarray(u_g)[hit])
    np.testing.assert_array_equal(np.asarray(v_u)[hit], np.asarray(v_g)[hit])
    # final_scene must bake the compile-time cell table (the static kernel
    # is the production path); its equivalence is gated on a small grid by
    # test_box_grid_static_kernel_matches_looped (400 interpret-mode
    # unrolled cells trace for minutes — too slow for CI).
    assert tables.box_grid_cells is not None
    assert sum(len(g) for _, _, g in tables.box_grid_cells) == 400


def test_box_grid_static_kernel_matches_looped():
    """The fully-static (compile-time cell table) grid kernel is a
    case-equal refactor of the looped kernel's candidate math: hit masks
    must be identical and t fp-equal (separate programs fuse mul+add
    differently by ulps); exact cell ties may resolve to a different
    winner (height-grouped merge order), so attributes get a >=99% bar.  Uses a
    synthetic 8x8 field (64 boxes = the detection minimum) with repeated
    heights (exercises grouping) and two materials (exercises the
    non-uniform static path)."""
    from art_tpu.scene.builder import SceneBuilder
    from art_tpu.scene.materials import Lambertian, Metal
    from art_tpu.scene.objects import Box

    m1, m2 = Lambertian((0.5, 0.5, 0.5)), Metal((0.8, 0.8, 0.8), 0.1)
    b = SceneBuilder()
    for ix in range(8):
        for iz in range(8):
            h = 1.0 + ((ix * 13 + iz * 37) % 5)  # 5 distinct heights
            b.add(Box(
                (ix * 10.0, 0.0, iz * 10.0),
                (ix * 10.0 + 10.0, h, iz * 10.0 + 10.0),
                m1 if (ix + iz) % 2 else m2,
            ))
    b.set_camera(
        lookfrom=(40, 30, -40), lookat=(40, 0, 40), vup=(0, 1, 0),
        vfov_degrees=60.0, aspect=1.0, aperture=0.0, focus_dist=10.0,
    )
    tables = b.compile().tables
    assert tables.box_grid_kx == 8 and tables.box_grid_kz == 8
    assert tables.box_grid_mat < 0.0  # mixed materials
    assert tables.box_grid_cells is not None
    assert len(tables.box_grid_cells) == 10  # 5 heights x 2 materials

    o, d, tm = _ray_batch(9, RB, origin_span=160.0, origin_center=(40, 10, 40))
    kw = dict(
        kx=tables.box_grid_kx, kz=tables.box_grid_kz,
        x0=tables.box_grid_x0, z0=tables.box_grid_z0,
        w=tables.box_grid_w, y0=tables.box_grid_y0, interpret=True,
    )
    t_g, n_g, u_g, v_g, m_g = pk.box_grid_hit_attrs(tables.box_grid, o, d, **kw)
    t_s, n_s, u_s, v_s, m_s = pk.box_grid_static_hit_attrs(
        o, d, cells=tables.box_grid_cells, uniform_mat=-1.0, **kw
    )
    hit = _hit_mask(t_g)
    assert hit.any() and (~hit).any()
    np.testing.assert_array_equal(_hit_mask(t_s), hit)
    # case-equal math, but the two kernels compile as separate programs
    # whose mul+add fusion differs by ulps
    np.testing.assert_allclose(
        np.asarray(t_s)[hit], np.asarray(t_g)[hit], rtol=2e-5, atol=1e-3
    )
    agree = np.asarray(m_s)[hit] == np.asarray(m_g)[hit]
    for c in range(3):
        agree &= np.isclose(
            np.asarray(n_s[c])[hit], np.asarray(n_g[c])[hit],
            rtol=1e-4, atol=2e-4,
        )
    agree &= np.isclose(np.asarray(u_s)[hit], np.asarray(u_g)[hit], atol=1e-3)
    agree &= np.isclose(np.asarray(v_s)[hit], np.asarray(v_g)[hit], atol=1e-3)
    assert agree.mean() > 0.99, agree.mean()


def test_sphere_cluster_kernel_matches_brute():
    """Block-synchronous cluster culling must be exactly equal to the
    brute-force kernel (the slab test is conservative)."""
    tables = build_scene("bouncing_spheres", 64, 32).tables
    assert tables.n_sphere_clusters > 0
    o, d, tm = _ray_batch(5, RB)

    t_c, n_c, u_c, v_c, m_c = pk.sphere_hit_attrs_clustered(
        tables.sph_cl_packed, tables.sph_cl_box, o, d, tm,
        n_clusters=tables.n_sphere_clusters, moving=tables.has_moving,
        needs_uv=True, interpret=True,
    )
    t_b, n_b, u_b, v_b, m_b = pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=True, interpret=True,
    )
    hit = _hit_mask(t_b)
    assert hit.any()
    np.testing.assert_array_equal(_hit_mask(t_c), hit)
    # identical candidate math over the same sphere set -> near bit-equal
    # (order-of-min differences only on exact fp ties)
    tight = _assert_two_tier(
        np.asarray(t_c)[hit], np.asarray(t_b)[hit],
        tight_rtol=1e-6, tight_atol=1e-6, frac=0.999,
    )
    np.testing.assert_array_equal(
        np.asarray(m_c)[hit][tight], np.asarray(m_b)[hit][tight]
    )
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(n_c[c])[hit][tight], np.asarray(n_b[c])[hit][tight],
            rtol=1e-5, atol=1e-5,
        )


def test_box_cluster_kernel_matches_brute():
    """final_scene: 400+ axis-aligned ground boxes through the clustered
    box kernel vs brute force."""
    tables = build_scene("final_scene", 64, 64).tables
    assert tables.n_box_clusters > 0
    o, d, tm = _ray_batch(6, RB, origin_span=2200.0, origin_center=(0, 200, 0))

    t_c, n_c, u_c, v_c, m_c = pk.box_hit_attrs_clustered(
        tables.box_cl_packed, tables.box_cl_box, o, d,
        n_clusters=tables.n_box_clusters, rotated=tables.has_rotated_boxes,
        interpret=True,
    )
    t_b, n_b, u_b, v_b, m_b = pk.box_hit_attrs_planar(
        tables.box_packed, o, d,
        n_boxes=tables.n_boxes, rotated=tables.has_rotated_boxes,
        interpret=True,
    )
    hit = _hit_mask(t_b)
    assert hit.any()
    np.testing.assert_array_equal(_hit_mask(t_c), hit)
    tight = _assert_two_tier(
        np.asarray(t_c)[hit], np.asarray(t_b)[hit],
        tight_rtol=1e-6, tight_atol=1e-5, frac=0.999,
    )
    np.testing.assert_array_equal(
        np.asarray(m_c)[hit][tight], np.asarray(m_b)[hit][tight]
    )
    np.testing.assert_allclose(
        np.asarray(u_c)[hit][tight], np.asarray(u_b)[hit][tight],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(v_c)[hit][tight], np.asarray(v_b)[hit][tight],
        rtol=1e-4, atol=1e-4,
    )


def test_flush_kernel_matches_scatter():
    """ops/flush_kernel.py: the in-VMEM one-hot MXU flush must equal a
    direct per-pixel scatter-add to bf16-rounding tolerance."""
    from art_tpu.ops.flush_kernel import flush_accumulate

    R = RB
    n_hi = 16  # P = 2048 pixels
    P = n_hi * 128
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(7), 3)
    pix = jax.random.randint(k0, (R,), 0, P, jnp.int32)
    died = jax.random.uniform(k1, (R,)) < 0.3
    rad = jax.random.uniform(k2, (R, 3), jnp.float32) * 3.0
    fb0 = jnp.ones((n_hi, 384), jnp.float32)  # non-zero initial acc

    out = flush_accumulate(
        pix, died, (rad[:, 0], rad[:, 1], rad[:, 2]), fb0, interpret=True
    )

    # reference: fb[p//128, c*128 + p%128] += rad[r, c] for died r
    ref = np.ones((3, P), np.float32)
    w = np.where(np.asarray(died))[0]
    np.add.at(ref[0], np.asarray(pix)[w], np.asarray(rad)[w, 0])
    np.add.at(ref[1], np.asarray(pix)[w], np.asarray(rad)[w, 1])
    np.add.at(ref[2], np.asarray(pix)[w], np.asarray(rad)[w, 2])
    got = (
        np.asarray(out).reshape(n_hi, 3, 128).transpose(1, 0, 2).reshape(3, P)
    )
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_turb_kernel_matches_jnp():
    """ops/perlin_kernel.turb_pallas must reproduce perlin.turb_p exactly
    (identical uint32 hash chain and f32 arithmetic), with and without a
    per-lane octave mask."""
    from art_tpu.ops import perlin
    from art_tpu.ops.perlin_kernel import turb_pallas

    R = RB
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    px = jax.random.uniform(ks[0], (R,), jnp.float32) * 600.0 - 100.0
    py = jax.random.uniform(ks[1], (R,), jnp.float32) * 400.0
    pz = jax.random.uniform(ks[2], (R,), jnp.float32) * 500.0 - 200.0

    got = turb_pallas(px, py, pz, 7, interpret=True)
    want = perlin.turb_p(px, py, pz, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    oct = jax.random.randint(ks[3], (R,), 1, 8, jnp.int32)
    got_m = turb_pallas(px, py, pz, 7, depth_mask=oct, interpret=True)
    want_m = perlin.turb_p(px, py, pz, 7, depth_mask=oct)
    np.testing.assert_allclose(
        np.asarray(got_m), np.asarray(want_m), rtol=1e-6, atol=1e-6
    )


def test_flush_kernel_windowed_matches_full():
    """The windowed flush (fb slice + base offset) must equal slicing the
    full-fb flush result, given died pixels confined to the window band."""
    from art_tpu.ops.flush_kernel import flush_accumulate

    R = RB
    n_hi = 32
    W_h = 8
    base_row = 13
    P0, P1 = base_row * 128, (base_row + W_h) * 128
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(11), 3)
    pix = jax.random.randint(k0, (R,), P0, P1, jnp.int32)  # in-band only
    died = jax.random.uniform(k1, (R,)) < 0.4
    rad = jax.random.uniform(k2, (R, 3), jnp.float32)
    rads = (rad[:, 0], rad[:, 1], rad[:, 2])
    fb = jax.random.uniform(jax.random.PRNGKey(12), (n_hi, 384), jnp.float32)

    full = flush_accumulate(pix, died, rads, fb, interpret=True)
    slab = flush_accumulate(
        pix, died, rads,
        jax.lax.dynamic_slice(fb, (base_row, 0), (W_h, 384)),
        base=jnp.int32(base_row), interpret=True,
    )
    got = jax.lax.dynamic_update_slice(fb, slab, (base_row, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=1e-6)


def test_sphere_mxu_kernel_matches_jnp():
    """The bilinear-feature MXU sphere kernel must agree with the jnp path
    on the builder-gated bouncing_spheres tables (moving + signed radius).

    Hit/miss may legitimately flip on near-tangent lanes (the expanded
    quadratic rounds disc differently), so the comparison is restricted to
    lanes where both paths agree on hit — but that agreement must cover
    ~all lanes."""
    tables = build_scene("bouncing_spheres", 64, 32).tables
    assert tables.mxu_sphere_pad > 0, "builder should gate this scene in"
    o, d, tm = _ray_batch(11, RB)

    t_m, n_m, u_m, v_m, mat_m = pk.sphere_hit_attrs_mxu(
        tables.sph_mxu_feat, tables.sph_mxu_attr, o, d, tm,
        s_pad=tables.mxu_sphere_pad, needs_uv=True, interpret=True,
    )
    t_j, idx_j = intersect.sphere_candidates_p(tables, o, d, tm, T_MIN)
    n_j, u_j, v_j, mat_j = intersect.sphere_attributes_p(
        tables, o, d, tm, t_j, idx_j, needs_uv=True
    )

    hit_m = _hit_mask(t_m)
    hit_j = _hit_mask(t_j)
    assert hit_j.any() and (~hit_j).any()
    assert (hit_m == hit_j).mean() > 0.999, "hit/miss disagreement"
    both = hit_m & hit_j
    # tight_atol floor 1e-3: short-range hits on the r=1000 ground sphere
    # carry ~1e-4..1e-3 *absolute* f32 noise in BOTH paths (|p| ~ 1000 makes
    # f = |p|^2 - r^2 round at that scale), so relative-only comparison is
    # beyond either path's true accuracy there; winner identity is exact.
    tight = _assert_two_tier(
        np.asarray(t_m)[both], np.asarray(t_j)[both],
        tight_rtol=2e-5, tight_atol=1e-3, loose_budget=2,
    )
    np.testing.assert_array_equal(
        np.asarray(mat_m)[both][tight], np.asarray(mat_j)[both][tight]
    )
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(n_m[c])[both][tight], np.asarray(n_j[c])[both][tight],
            rtol=1e-3, atol=4e-3,
        )
    # 2e-3: the r3 XORWOW bouncing layout leaves one near-tangent lane in
    # this fixed batch whose UV (acos/atan2 of an ill-conditioned normal)
    # lands at 1.3e-3 between the two paths.
    np.testing.assert_allclose(
        np.asarray(u_m)[both][tight], np.asarray(u_j)[both][tight], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_m)[both][tight], np.asarray(v_j)[both][tight], atol=2e-3
    )


def test_sphere_mxu_gate_rejects_large_scenes():
    """final_scene's ~500-unit coordinates must stay on the exact path."""
    tables = build_scene("final_scene", 64, 64).tables
    assert tables.mxu_sphere_pad == 0


def _hand_packed_spheres(seed, n_mov, n_main, n_tail, tail_r, tail_mat,
                         neg_radius=False):
    """Build a pack_spheres-layout table directly (moving rows padded to
    32 at the front, then main-static rows, then the (tail_r, tail_mat)-
    uniform tail, padded to 32; pad rows r2=-1, K=1e30) so the static
    kernel's tail path can be exercised below pack_spheres' _TAIL_MIN."""
    rng = np.random.default_rng(seed)
    n_stat = n_main + n_tail
    sm_pad = -(-n_mov // 32) * 32 if n_mov else 0
    ss_pad = -(-n_stat // 32) * 32
    out = np.zeros((sm_pad + ss_pad, 10), np.float32)
    out[:, 8] = -1.0
    out[:, 9] = 1e30

    def fill(rows, radii, mats, moving):
        n = len(radii)
        c = (rng.random((n, 3)) - 0.5) * 16.0 + np.array([0.0, 3.0, 0.0])
        rows[:, 0:3] = c
        if moving:
            rows[:, 3:6] = (rng.random((n, 3)) - 0.5) * 1.5
            rows[:, 3] = 0.0  # vx == 0, as the reference movers; the
            # static kernel elides the zero-velocity FMA — must stay
            # exactly equal to the looped kernel's c0 + tm*0.0
        rows[:, 6] = radii
        rows[:, 7] = mats
        rows[:, 8] = np.float32(radii) * np.float32(radii)
        rows[:, 9] = (
            np.sum(rows[:, 0:3].astype(np.float64) ** 2, axis=1)
            - rows[:, 8].astype(np.float64)
        ).astype(np.float32)

    if n_mov:
        fill(out[:n_mov], rng.random(n_mov) * 1.5 + 0.5,
             rng.integers(0, 5, n_mov), True)
    main_r = rng.random(n_main) * 2.0 + 0.5
    if neg_radius:
        main_r[0] = -main_r[0]  # hollow-glass signed radius
    fill(out[sm_pad : sm_pad + n_main], main_r,
         rng.integers(0, 5, n_main), False)
    fill(out[sm_pad + n_main : sm_pad + n_stat],
         np.full(n_tail, tail_r), np.full(n_tail, tail_mat), False)
    return jnp.asarray(out), sm_pad, n_stat


@pytest.mark.parametrize(
    "n_mov,expand,neg_radius",
    [(8, False, True), (8, True, False), (0, False, False)],
)
def test_sphere_static_kernel_matches_looped(n_mov, expand, neg_radius):
    """The fully-static (baked-constant) sphere kernel is a case-equal
    refactor of the looped kernel: hit sets must agree (up to grazing
    flips) and t to fp slack — even interpret mode compiles per program,
    so mul+add fusion differs by ulps and near-tangent lanes amplify it.
    Covers the moving fori_loop + static main + tail merge, both
    quadratic forms, and both radius-carry modes.  Sized so the looped
    kernel's own tail loop runs (n_main=5 -> its 32-row main loop covers
    27 tail rows, the remaining 8 + pads go through its tail path)."""
    tail_r, tail_mat = 0.35, 7.0
    packed, n_moving_pad, n_static = _hand_packed_spheres(
        42 + n_mov, n_mov, 5, 35, tail_r, tail_mat, neg_radius=neg_radius
    )
    pos_r = not neg_radius
    o, d, tm = _ray_batch(11 + n_mov, RB, origin_span=24.0)

    kw = dict(needs_uv=True, interpret=True)
    t_l, n_l, u_l, v_l, m_l = pk.sphere_hit_attrs_planar(
        packed, o, d, tm, n_moving=n_moving_pad, n_static=n_static,
        expand=expand, n_tail=35, tail_r=tail_r, tail_mat=tail_mat,
        pos_r=pos_r, **kw,
    )
    cells = pk.static_sphere_cells(packed, n_moving_pad, n_static, 35)
    assert len(cells[0]) == n_mov
    assert len(cells[1]) == 5 and len(cells[2]) == 35
    t_s, n_s, u_s, v_s, m_s = pk.sphere_static_hit_attrs(
        o, d, tm, cells=cells,
        tail_r=tail_r, tail_mat=tail_mat, pos_r=pos_r, expand=expand, **kw,
    )

    hit = _hit_mask(t_l)
    hit_s = _hit_mask(t_s)
    assert hit.any() and (~hit).any()
    assert (hit_s == hit).mean() > 0.999
    both = hit & hit_s
    tight = _assert_two_tier(
        np.asarray(t_s)[both], np.asarray(t_l)[both],
        tight_rtol=2e-5, tight_atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(m_s)[both][tight], np.asarray(m_l)[both][tight]
    )
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(n_s[c])[both][tight], np.asarray(n_l[c])[both][tight],
            rtol=1e-3, atol=2e-3,
        )
    np.testing.assert_allclose(
        np.asarray(u_s)[both][tight], np.asarray(u_l)[both][tight], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_s)[both][tight], np.asarray(v_l)[both][tight], atol=1e-3
    )


def test_sphere_static_cells_baked_for_reference_scenes():
    """The builder bakes sph_static_cells for every reference scene size
    (largest: final_scene's 1008) with the pack_spheres split — bouncing
    is moving-dominated (409 moving / 79 static), so the moving segment
    must be baked too."""
    tb = build_scene("bouncing_spheres", 64, 32).tables
    mov, main, tail = tb.sph_static_cells
    assert len(mov) + len(main) + len(tail) == tb.n_spheres == 488
    assert len(main) + len(tail) == tb.sph_n_static
    assert len(tail) == tb.sph_n_tail
    assert len(mov) > 300  # moving-dominated headline scene
    tf = build_scene("final_scene", 64, 64).tables
    mov_f, main_f, tail_f = tf.sph_static_cells
    assert len(tail_f) == tf.sph_n_tail == 1000
    assert len(mov_f) + len(main_f) + len(tail_f) == tf.n_spheres


def test_decode_cell_exact_for_all_small_grids():
    """Winner-cell decode must invert ix*kz+iz exactly for every grid the
    builder can accept.  floor(bcell * f32(1/kz)) alone is off by one
    whenever f32(1/kz) rounds below 1/kz (first at kz=41: 41*f32(1/41)<1);
    _decode_cell's one-step fixup must repair every such case."""
    for kz in range(1, 129):
        kx = max(2, min(64, 4096 // kz))
        ix = np.repeat(np.arange(kx, dtype=np.float32), kz)
        iz = np.tile(np.arange(kz, dtype=np.float32), kx)
        bcell = jnp.asarray(ix * kz + iz)
        ix_f, iz_f = pk._decode_cell(bcell, kz)
        np.testing.assert_array_equal(np.asarray(ix_f), ix, err_msg=f"kz={kz}")
        np.testing.assert_array_equal(np.asarray(iz_f), iz, err_msg=f"kz={kz}")
