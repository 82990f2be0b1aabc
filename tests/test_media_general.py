"""General (kind-2) ConstantMedium boundaries.

The reference accepts ANY hittable as a constant_medium boundary and
resolves the interval with two closest-hit traversals
(src/constant_medium.cuh:38-44).  The analytic sphere/box path covers all
reference scenes; these tests pin the general path: a boundary that does
not reduce to one analytic primitive (Group, Quad, unions) must produce
the SAME intervals/scatters as the analytic path where they overlap, and
reference first/second-hit semantics where they do not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.ops.intersect import HitRecordP, _gb_first_hit, apply_media_p
from art_tpu.scene import objects as O
from art_tpu.scene.builder import SceneBuilder
from art_tpu.core.vecmath import BIG

R = 64


def _tables(*objs):
    b = SceneBuilder()
    b.add(*objs)
    b.set_camera(lookfrom=(0, 0, 10), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov_degrees=40.0, aspect=1.0, aperture=0.0, focus_dist=10.0)
    return b.compile().tables


def _rays(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    o = tuple(jax.random.uniform(ks[c], (R,), jnp.float32) * 20 - 10 for c in range(3))
    d = tuple(jax.random.uniform(ks[3 + c], (R,), jnp.float32) * 2 - 1 for c in range(3))
    return o, d


def _miss_surf():
    z = jnp.zeros((R,), jnp.float32)
    return HitRecordP(
        hit=jnp.zeros((R,), bool), t=jnp.full((R,), BIG, jnp.float32),
        p=(z, z, z), normal=(z + 1, z, z), u=z, v=z,
        mat=jnp.zeros((R,), jnp.int32),
    )


def _apply(tables, o, d, seed=1):
    u = jax.random.uniform(jax.random.PRNGKey(seed), (tables.n_media, R))
    return apply_media_p(tables, o, d, 0.001, _miss_surf(), u)


MAT = None


def _mat():
    from art_tpu.scene import materials as M

    return M.Lambertian((0.5, 0.5, 0.5))


def test_group_box_matches_analytic_box():
    """Group([Box]) routes through the general path but must scatter
    identically to the analytic box-boundary medium."""
    box = O.Box((-3, -2, -4), (2, 3, 1), _mat())
    t_analytic = _tables(O.ConstantMedium(box, 0.35, (1, 1, 1)))
    t_general = _tables(O.ConstantMedium(O.Group(box), 0.35, (1, 1, 1)))
    assert t_analytic.med_kinds == (1,)
    assert t_general.med_kinds == (2,)
    assert t_general.gb_box_meds == (0,)

    o, d = _rays()
    ra = _apply(t_analytic, o, d)
    rg = _apply(t_general, o, d)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rg.hit))
    np.testing.assert_allclose(
        np.asarray(ra.t), np.asarray(rg.t), rtol=1e-6, atol=1e-6
    )


def test_group_sphere_matches_analytic_sphere():
    sph = O.Sphere((0.5, -1.0, 2.0), 3.0, _mat())
    t_analytic = _tables(O.ConstantMedium(sph, 0.5, (1, 1, 1)))
    t_general = _tables(
        O.ConstantMedium(O.Group(sph), 0.5, (1, 1, 1))
    )
    assert t_general.med_kinds == (2,)
    o, d = _rays(3)
    ra = _apply(t_analytic, o, d)
    rg = _apply(t_general, o, d)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rg.hit))
    np.testing.assert_allclose(
        np.asarray(ra.t), np.asarray(rg.t), rtol=1e-6, atol=1e-6
    )


def test_transformed_group_boundary():
    """Translate/RotateY outside the Group must bake into the gb rows the
    same way they bake into regular geometry."""
    box = O.Box((-1, -1, -1), (1, 1, 1), _mat())
    med_a = O.ConstantMedium(
        O.Translate(O.RotateY(box, 30.0), (2, 0, -1)), 0.4, (1, 1, 1)
    )
    med_g = O.ConstantMedium(
        O.Translate(O.RotateY(O.Group(box), 30.0), (2, 0, -1)), 0.4, (1, 1, 1)
    )
    t_a = _tables(med_a)
    t_g = _tables(med_g)
    assert t_a.med_kinds == (1,) and t_g.med_kinds == (2,)
    o, d = _rays(7)
    ra = _apply(t_a, o, d)
    rg = _apply(t_g, o, d)
    np.testing.assert_array_equal(np.asarray(ra.hit), np.asarray(rg.hit))
    np.testing.assert_allclose(
        np.asarray(ra.t), np.asarray(rg.t), rtol=1e-5, atol=1e-5
    )


def test_union_first_second_hit_semantics():
    """Two disjoint boxes along +z: the interval must span the FIRST box
    only (rec1 = its entry, rec2 = the next hit = its exit), exactly the
    reference's two-traversal result for a list boundary."""
    b1 = O.Box((-1, -1, 0), (1, 1, 2), _mat())    # nearer box, z in [0, 2]
    b2 = O.Box((-1, -1, 5), (1, 1, 7), _mat())    # farther box, z in [5, 7]
    t = _tables(O.ConstantMedium(O.Group(b1, b2), 123.0, (1, 1, 1)))
    assert t.med_kinds == (2,)
    assert t.gb_box_meds == (0, 0)

    z = jnp.zeros((R,), jnp.float32)
    o = (z, z, z - 10.0)           # origin (0,0,-10)
    d = (z, z, z + 1.0)            # +z rays
    time = jnp.zeros((R,), jnp.float32)
    t1, h1 = _gb_first_hit(t, 0, o, d, time, jnp.full((R,), -BIG))
    t2, h2 = _gb_first_hit(t, 0, o, d, time, t1 + 1e-4)
    assert bool(h1.all()) and bool(h2.all())
    np.testing.assert_allclose(np.asarray(t1), 10.0, rtol=1e-6)  # entry b1
    np.testing.assert_allclose(np.asarray(t2), 12.0, rtol=1e-6)  # exit b1

    # huge density => scatter within ~0.12 of the first box's entry
    # (max free flight = -ln(1e-6)/123)
    rec = _apply(t, o, d)
    assert bool(rec.hit.all())
    np.testing.assert_allclose(np.asarray(rec.t), 10.0, atol=0.15)


def test_quad_boundary_is_volumeless():
    """A bare Quad boundary compiles (general path) but produces no
    scatter: its second hit never exists."""
    quad = O.Quad((-1, -1, 0), (2, 0, 0), (0, 2, 0), _mat())
    t = _tables(O.ConstantMedium(quad, 5.0, (1, 1, 1)))
    assert t.med_kinds == (2,)
    o, d = _rays(11)
    rec = _apply(t, o, d)
    assert not bool(rec.hit.any())


def test_moving_sphere_boundary_uses_ray_time():
    """A moving-sphere boundary must evaluate its center at the ray's
    shutter time (reference r.time() threading, src/sphere.cuh:51-59)."""
    sph = O.Sphere((0, 0, 0), 1.0, _mat(), center2=(6, 0, 0))
    t = _tables(O.ConstantMedium(O.Group(sph), 50.0, (1, 1, 1)))
    z = jnp.zeros((R,), jnp.float32)
    o = (z, z, z - 10.0)
    d = (z, z, z + 1.0)  # +z through the t=0 center only
    u = jax.random.uniform(jax.random.PRNGKey(2), (1, R))
    rec0 = apply_media_p(t, o, d, 0.001, _miss_surf(), u, time=z)
    rec1 = apply_media_p(t, o, d, 0.001, _miss_surf(), u, time=z + 1.0)
    assert bool(rec0.hit.all())      # sphere at origin at t=0
    assert not bool(rec1.hit.any())  # sphere moved to x=6 at t=1


def test_bare_moving_sphere_boundary_routes_general():
    """A moving sphere passed DIRECTLY as the boundary (no Group) must not
    take the analytic static-sphere fast path — that path has no velocity
    row and would freeze the medium at the t=0 center."""
    sph = O.Sphere((0, 0, 0), 1.0, _mat(), center2=(6, 0, 0))
    t = _tables(O.ConstantMedium(sph, 50.0, (1, 1, 1)))
    assert t.med_kinds == (2,)
    z = jnp.zeros((R,), jnp.float32)
    o = (z, z, z - 10.0)
    d = (z, z, z + 1.0)
    u = jax.random.uniform(jax.random.PRNGKey(2), (1, R))
    rec0 = apply_media_p(t, o, d, 0.001, _miss_surf(), u, time=z)
    rec1 = apply_media_p(t, o, d, 0.001, _miss_surf(), u, time=z + 1.0)
    assert bool(rec0.hit.all())      # sphere at origin at t=0
    assert not bool(rec1.hit.any())  # sphere moved to x=6 at t=1


def test_nested_medium_boundary_raises():
    inner = O.ConstantMedium(
        O.Box((-1, -1, -1), (1, 1, 1), _mat()), 1.0, (1, 1, 1)
    )
    with pytest.raises(TypeError, match="cannot contain another"):
        _tables(O.ConstantMedium(O.Group(inner), 1.0, (1, 1, 1)))


def test_empty_boundary_raises():
    with pytest.raises(TypeError, match="no geometry"):
        _tables(O.ConstantMedium(O.Group(), 1.0, (1, 1, 1)))


def test_general_medium_full_render():
    """End-to-end smoke: a two-sphere union boundary renders finite,
    nonzero output through the full integrator."""
    from art_tpu.models import build_scene  # noqa: F401  (import parity)
    from art_tpu.render.renderer import RenderConfig, render_scene
    from art_tpu.scene.builder import SceneBuilder
    from art_tpu.scene import materials as M

    b = SceneBuilder()
    b.add(
        O.Sphere((0, -1000, 0), 1000.0, M.Lambertian((0.6, 0.6, 0.6))),
        O.ConstantMedium(
            O.Group(
                O.Sphere((-1, 1, 0), 1.0, _mat()),
                O.Sphere((1, 1, 0), 1.0, _mat()),
            ),
            2.0,
            (0.2, 0.4, 0.9),
        ),
    )
    b.set_camera(lookfrom=(0, 2, 8), lookat=(0, 1, 0), vup=(0, 1, 0),
                 vfov_degrees=30.0, aspect=16 / 9, aperture=0.0, focus_dist=8.0)
    b.set_background(gradient=True)
    scene = b.compile()
    fb, _ = render_scene(scene, RenderConfig(nx=64, ny=36, spp=4))
    fb = np.asarray(fb)
    assert np.isfinite(fb).all()
    assert fb.min() >= 0.0
    assert fb.mean() > 0.01
