"""Closed-form intersection cases for each primitive segment."""

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core.vecmath import BIG, T_MIN
from art_tpu.ops import intersect
from art_tpu.scene.builder import SceneBuilder
from art_tpu.scene.materials import Dielectric, Lambertian
from art_tpu.scene.objects import Box, ConstantMedium, Quad, RotateY, Sphere, Translate


def _scene(*objs, cam=True):
    b = SceneBuilder()
    b.add(*objs)
    b.set_camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vup=(0, 1, 0),
        vfov_degrees=90.0, aspect=1.0, aperture=0.0, focus_dist=1.0,
    )
    return b.compile()


def _rays(origins, directions):
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(directions, jnp.float32)
    t = jnp.zeros((o.shape[0],), jnp.float32)
    return o, d, t


MAT = Lambertian((0.5, 0.5, 0.5))


def test_sphere_hit_distance_and_normal():
    sc = _scene(Sphere((0, 0, -3), 1.0, MAT))
    o, d, tm = _rays([[0, 0, 0]], [[0, 0, -1]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(rec.p[0], [0, 0, -2], atol=1e-5)
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)


def test_sphere_inside_hit_uses_far_root():
    sc = _scene(Sphere((0, 0, 0), 2.0, MAT))
    o, d, tm = _rays([[0, 0, 0]], [[0, 0, -1]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    # geometric normal points outward: (p - c)/r = (0,0,-1)
    np.testing.assert_allclose(rec.normal[0], [0, 0, -1], atol=1e-5)


def test_negative_radius_flips_normal():
    sc = _scene(Sphere((0, 0, -3), -1.0, MAT))
    o, d, tm = _rays([[0, 0, 0]], [[0, 0, -1]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(rec.normal[0], [0, 0, -1], atol=1e-5)


def test_moving_sphere_position_at_time():
    sc = _scene(Sphere((0, 0, -3), 1.0, MAT, center2=(10, 0, -3)))
    o = jnp.asarray([[0, 0, 0], [10, 0, 0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    t = jnp.asarray([0.0, 1.0], jnp.float32)
    rec = intersect.closest_surface(sc.tables, o, d, t, T_MIN)
    assert bool(rec.hit[0]) and bool(rec.hit[1])
    np.testing.assert_allclose(np.asarray(rec.t), [2.0, 2.0], rtol=1e-4)


def test_sphere_uv_poles_and_equator():
    # UV computation is statically gated on UV-dependent textures being
    # present; call the attribute path with needs_uv=True directly.
    sc = _scene(Sphere((0, 0, 0), 1.0, MAT))
    # hit +x point from outside: normal (1,0,0) -> phi = atan2(0,1)+pi = pi -> u=0.5
    o, d, tm = _rays([[3, 0, 0]], [[-1, 0, 0]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    _, _, u, v, _ = intersect.sphere_attributes(
        sc.tables, o, d, tm, rec.t, jnp.zeros((1,), jnp.int32), needs_uv=True
    )
    np.testing.assert_allclose(float(u[0]), 0.5, atol=1e-5)
    np.testing.assert_allclose(float(v[0]), 0.5, atol=1e-5)
    # top pole: normal (0,1,0) -> theta = acos(-1) = pi -> v=1
    o, d, tm = _rays([[0, 3, 0]], [[0, -1, 0]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    _, _, u, v, _ = intersect.sphere_attributes(
        sc.tables, o, d, tm, rec.t, jnp.zeros((1,), jnp.int32), needs_uv=True
    )
    np.testing.assert_allclose(float(v[0]), 1.0, atol=1e-4)


def test_quad_hit_and_interior_reject():
    sc = _scene(Quad((-1, -1, -2), (2, 0, 0), (0, 2, 0), MAT))
    o = jnp.asarray([[0, 0, 0], [5, 5, 0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    rec = intersect.closest_surface(sc.tables, o, d, t, T_MIN)
    assert bool(rec.hit[0])
    assert not bool(rec.hit[1])  # outside the quad
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(rec.u[0]), 0.5, atol=1e-5)  # alpha
    np.testing.assert_allclose(float(rec.v[0]), 0.5, atol=1e-5)  # beta
    # shading normal faces the ray
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)


def test_quad_parallel_ray_misses():
    sc = _scene(Quad((-1, -1, -2), (2, 0, 0), (0, 2, 0), MAT))
    o, d, tm = _rays([[0, 0, 0]], [[1, 0, 0]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert not bool(rec.hit[0])


def test_box_entry_exit_faces():
    sc = _scene(Box((-1, -1, -4), (1, 1, -2), MAT))
    # outside: entry at z=-2
    o, d, tm = _rays([[0, 0, 0]], [[0, 0, -1]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)
    # inside: exit face, shading normal against ray
    o, d, tm = _rays([[0, 0, -3]], [[0, 0, -1]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)


def test_box_matches_six_quads():
    """Box slab test must agree with the reference's 6-quad decomposition."""
    a, b = (-1.0, -0.5, -4.0), (1.5, 1.0, -2.0)
    box_scene = _scene(Box(a, b, MAT))

    # 6 quads per make_box (src/quad.cuh:145-162)
    mn = np.minimum(a, b)
    mx = np.maximum(a, b)
    dx = (mx[0] - mn[0], 0, 0)
    dy = (0, mx[1] - mn[1], 0)
    dz = (0, 0, mx[2] - mn[2])
    ndz = (0, 0, -(mx[2] - mn[2]))
    ndx = (-(mx[0] - mn[0]), 0, 0)
    quads = [
        Quad((mn[0], mn[1], mx[2]), dx, dy, MAT),
        Quad((mx[0], mn[1], mx[2]), ndz, dy, MAT),
        Quad((mx[0], mn[1], mn[2]), ndx, dy, MAT),
        Quad((mn[0], mn[1], mn[2]), dz, dy, MAT),
        Quad((mn[0], mx[1], mx[2]), dx, ndz, MAT),
        Quad((mn[0], mn[1], mn[2]), dx, dz, MAT),
    ]
    quad_scene = _scene(*quads)

    rng = np.random.default_rng(42)
    o = rng.uniform(-3, 3, size=(256, 3)).astype(np.float32)
    o[:, 2] = rng.uniform(-1, 1, size=256)  # in front of the box
    tgt = rng.uniform(-1.5, 1.5, size=(256, 3)).astype(np.float32)
    tgt[:, 2] = -3.0
    d = tgt - o
    t = jnp.zeros((256,), jnp.float32)

    rb = intersect.closest_surface(box_scene.tables, jnp.asarray(o), jnp.asarray(d), t, T_MIN)
    rq = intersect.closest_surface(quad_scene.tables, jnp.asarray(o), jnp.asarray(d), t, T_MIN)
    np.testing.assert_array_equal(np.asarray(rb.hit), np.asarray(rq.hit))
    hits = np.asarray(rb.hit)
    np.testing.assert_allclose(
        np.asarray(rb.t)[hits], np.asarray(rq.t)[hits], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rb.normal)[hits], np.asarray(rq.normal)[hits], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rb.u)[hits], np.asarray(rq.u)[hits], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rb.v)[hits], np.asarray(rq.v)[hits], atol=1e-4
    )


def test_rotated_translated_box():
    """Instanced box (cornell transform) hit from the front."""
    obj = Translate(RotateY(Box((0, 0, 0), (165, 330, 165), MAT), 15.0), (265, 0, 295))
    sc = _scene(obj)
    # Ray down the cornell axis toward the tall box
    o, d, tm = _rays([[347.5, 165.0, -800.0]], [[0.0, 0.0, 1.0]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert bool(rec.hit[0])
    p = np.asarray(rec.p[0])
    # hit point must lie on the rotated box surface: transform back and check
    import math

    th = math.radians(15.0)
    c, s = math.cos(th), math.sin(th)
    q = p - np.array([265.0, 0.0, 295.0])
    q = np.array([c * q[0] - s * q[2], q[1], s * q[0] + c * q[2]])
    assert -1e-3 <= q[0] <= 165 + 1e-3
    assert -1e-3 <= q[1] <= 330 + 1e-3
    assert -1e-3 <= q[2] <= 165 + 1e-3
    # and at least one coordinate on a face
    on_face = (
        min(abs(q[0]), abs(q[0] - 165)) < 1e-2
        or min(abs(q[2]), abs(q[2] - 165)) < 1e-2
    )
    assert on_face


def test_medium_scatter_statistics():
    """Exponential free-flight through a unit-density slab-like sphere."""
    density = 0.5
    med = ConstantMedium(Sphere((0, 0, -10), 4.0, Dielectric(1.5)), density, (1, 1, 1))
    sc = _scene(med)
    n = 4096
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    t = jnp.zeros((n,), jnp.float32)
    surf = intersect.closest_surface(sc.tables, o, d, t, T_MIN)
    assert not bool(np.asarray(surf.hit).any())  # media only, no surfaces
    u_med = jax.random.uniform(jax.random.PRNGKey(7), (1, n), jnp.float32)
    rec = intersect.apply_media(sc.tables, o, d, T_MIN, surf, u_med)
    hit = np.asarray(rec.hit)
    # P(scatter) = 1 - exp(-density * 8) ~ 0.9817 through the 8-long chord
    p_hit = hit.mean()
    assert abs(p_hit - (1 - np.exp(-density * 8.0))) < 0.02
    ts = np.asarray(rec.t)[hit]
    assert ts.min() >= 6.0 - 1e-4 and ts.max() <= 14.0 + 1e-4
    # conditional mean depth of truncated exponential
    depth = ts - 6.0
    lam = density
    L = 8.0
    expected = 1 / lam - L * np.exp(-lam * L) / (1 - np.exp(-lam * L))
    assert abs(depth.mean() - expected) < 0.1


def test_medium_blocked_by_closer_surface():
    med = ConstantMedium(Sphere((0, 0, -10), 4.0, Dielectric(1.5)), 10.0, (1, 1, 1))
    wall = Quad((-5, -5, -5), (10, 0, 0), (0, 10, 0), MAT)
    sc = _scene(med, wall)
    o, d, tm = _rays([[0, 0, 0]], [[0, 0, -1]])
    surf = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    u_med = jax.random.uniform(jax.random.PRNGKey(0), (1, 1), jnp.float32)
    rec = intersect.apply_media(sc.tables, o, d, T_MIN, surf, u_med)
    # wall at z=-5 is before the medium entry at z=-6: must hit the wall
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 5.0, rtol=1e-5)


def test_box_rotated_180_degrees():
    """sin(180deg) == 0 but cos == -1: the rotation must not be skipped
    (regression: has_rotated_boxes was gated on sin != 0 only)."""
    obj = Translate(RotateY(Box((0, 0, 0), (2, 1, 1), MAT), 180.0), (0, 0, -5))
    sc = _scene(obj)
    assert sc.tables.has_rotated_boxes
    # rotated box occupies x in [-2, 0], z in [-6, -5] after the translate;
    # the unrotated box would occupy x in [0, 2] and this ray would miss
    o, d, tm = _rays([[-1, 0.5, 0]], [[0, 0, -1]])
    rec = intersect.closest_surface(sc.tables, o, d, tm, T_MIN)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 5.0, rtol=1e-4)
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-5)


def test_medium_boundary_general_path_compiles():
    """A non-Sphere/Box medium boundary no longer fails: it compiles to the
    kind-2 general two-traversal path (reference src/constant_medium.cuh:16-34
    accepts any hittable; full behavior tests in tests/test_media_general.py)."""
    quad_boundary = Quad((0, 0, -5), (1, 0, 0), (0, 1, 0), MAT)
    med = ConstantMedium(quad_boundary, 0.5, (1, 1, 1))
    sc = _scene(med)
    assert sc.tables.med_kinds == (2,)
    assert sc.tables.gb_quad_meds == (0,)


def test_distinct_media_keep_distinct_phase_materials():
    """Regression: the compiler's id()-keyed caches must pin temporaries.

    Each ConstantMedium builds a temporary Isotropic phase material during
    compile; if it is garbage-collected, a later medium's material can reuse
    the same id() and silently inherit the first medium's albedo (observed
    as cornell_smoke's white/black smokes collapsing to one color,
    PYTHONHASHSEED-dependent)."""
    import numpy as np

    med_white = ConstantMedium(Sphere((0, 0, -5), 1.0, Dielectric(1.5)), 1.0, (1, 1, 1))
    med_black = ConstantMedium(Sphere((0, 0, 5), 1.0, Dielectric(1.5)), 1.0, (0, 0, 0))
    sc = _scene(med_white, med_black)
    t = sc.tables
    m0, m1 = int(t.med_mat[0]), int(t.med_mat[1])
    assert m0 != m1
    tex0 = int(t.mat_tex[m0])
    tex1 = int(t.mat_tex[m1])
    np.testing.assert_allclose(np.asarray(t.tex_rgb[tex0]), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(t.tex_rgb[tex1]), [0, 0, 0])
