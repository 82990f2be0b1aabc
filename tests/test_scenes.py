"""Scene builders: counts, determinism, and exact deterministic hashes."""

import numpy as np
import pytest

from art_tpu.models import SCENES, build_scene, scene_defaults
from art_tpu.models.scenes import random_in_unit_cube, rotate_y_deg


def test_random_in_unit_cube_exact():
    """Bit-exact vs a direct uint64-masked port of src/util.cuh:3-11."""

    def ref(seed):
        s = (1103515245 * (seed + 1) + 12345) & 0xFFFFFFFF
        out = []
        for _ in range(3):
            s ^= (s << 13) & 0xFFFFFFFF
            s &= 0xFFFFFFFF
            s ^= s >> 17
            s ^= (s << 5) & 0xFFFFFFFF
            s &= 0xFFFFFFFF
            out.append((s & 0xFFFFFF) * (1.0 / 16777216.0))
        return np.array(out)

    for seed in [0, 1, 7, 999, 123456]:
        np.testing.assert_allclose(random_in_unit_cube(seed), ref(seed), rtol=0, atol=0)
        p = random_in_unit_cube(seed)
        assert np.all((0.0 <= p) & (p < 1.0))


def test_ground_box_height_hash():
    # y1 = 1 + 100*((ix*13 + iz*37) % 100)/100  (src/main.cu:513)
    sc = build_scene("final_scene", 80, 80)
    t = sc.tables
    assert t.n_boxes == 400
    heights = np.asarray(t.box_max[:, 1])
    k = 0
    for ix in range(20):
        for iz in range(20):
            expected = 1.0 + 100.0 * ((ix * 13 + iz * 37) % 100) / 100.0
            np.testing.assert_allclose(heights[k], expected, rtol=1e-6)
            k += 1


def test_bouncing_spheres_structure():
    sc = build_scene("bouncing_spheres", 120, 60)
    t = sc.tables
    # 1 ground + 484 small + 3 big = 488
    assert t.n_spheres == 488
    assert t.has_moving  # diffuse movers exist
    # ground radius 1000 at (0,-1000,-1)
    np.testing.assert_allclose(np.asarray(t.sph_center)[0], [0, -1000, -1], atol=1e-5)
    # deterministic rebuild
    sc2 = build_scene("bouncing_spheres", 120, 60)
    np.testing.assert_array_equal(np.asarray(t.sph_center), np.asarray(sc2.tables.sph_center))


def test_cornell_structure():
    sc = build_scene("cornell_box", 60, 60)
    t = sc.tables
    assert t.n_quads == 6
    assert t.n_boxes == 2
    assert t.n_spheres == 2  # glass shell pair
    assert t.has_rotated_boxes
    # hollow shell has negative radius
    radii = np.asarray(t.sph_radius)
    assert (radii < 0).sum() == 1
    # left wall at x=0: natural normal from cross(u,v) is +x; the reference's
    # inward=true flips the *geometric* normal to -x (src/quad.cuh:35) — the
    # shading normal is re-oriented against the ray at hit time.
    normals = np.asarray(t.quad_n)
    assert normals[0][0] < -0.99


def test_cornell_smoke_media():
    sc = build_scene("cornell_smoke", 60, 60)
    t = sc.tables
    assert t.n_media == 2
    assert t.med_kinds == (1, 1)
    assert t.n_boxes == 0  # smoke boxes are media-only, not surfaces
    nid = np.asarray(t.med_neg_inv_density)
    np.testing.assert_allclose(nid, -100.0, rtol=1e-5)  # -1/0.01


def test_final_scene_counts():
    sc = build_scene("final_scene", 80, 80)
    t = sc.tables
    assert t.n_boxes == 400
    # 1 moving + glass + metal + fog-boundary + earth + perlin + 1000 cluster = 1006
    assert t.n_spheres == 1006
    assert t.n_quads == 1  # area light
    assert t.n_media == 2
    assert t.med_kinds == (0, 0)
    assert t.has_moving


def test_cluster_transform_exact():
    sc = build_scene("final_scene", 80, 80)
    centers = np.asarray(sc.tables.sph_center)
    # cluster occupies the last 1000 sphere rows
    p0 = random_in_unit_cube(0) * 165.0
    p0 = rotate_y_deg(p0, 15.0) + np.array([-100.0, 270.0, 395.0])
    np.testing.assert_allclose(centers[-1000], p0, rtol=1e-5)


def test_all_scenes_build():
    for name in SCENES:
        d = scene_defaults(name)
        sc = build_scene(name, 64, 64)
        assert sc.camera is not None
        assert d["nx"] > 0 and d["spp"] > 0


def test_simple_light_structure():
    sc = build_scene("simple_light", 120, 60)
    t = sc.tables
    assert t.n_spheres == 4  # ground + ball + coat + light sphere
    assert t.n_quads == 1  # light quad
    # felt + image + uv_offset textures present
    assert 5 in t.tex_types_present  # FELT
    assert 6 in t.tex_types_present  # UV_OFFSET
    assert 2 in t.tex_types_present  # IMAGE


def test_unknown_scene_raises():
    with pytest.raises(KeyError):
        build_scene("nope")


def test_nested_with_material_outermost_wins():
    """with_material rewrites rec.mat_ptr AFTER the inner hit returns
    (src/hittable.cuh:154-178), so in a nested chain the OUTERMOST
    override is the one the integrator sees."""
    from art_tpu.scene import materials as M
    from art_tpu.scene import objects as O
    from art_tpu.scene.builder import SceneBuilder

    base = M.Lambertian((0.1, 0.1, 0.1))
    inner = M.Lambertian((0.9, 0.0, 0.0))
    outer = M.Metal((0.0, 0.9, 0.0), fuzz=0.25)
    b = SceneBuilder()
    b.add(O.WithMaterial(O.WithMaterial(O.Sphere((0, 0, 0), 1.0, base), inner), outer))
    b.set_camera(lookfrom=(0, 0, 5), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov_degrees=40.0, aspect=1.0, aperture=0.0, focus_dist=5.0)
    t = b.compile().tables
    mid = int(np.asarray(t.sph_mat)[0])
    row = np.asarray(t.mat_packed)[mid]
    from art_tpu.scene.tables import MatType
    assert int(row[0]) == int(MatType.METAL)
    assert row[2] == np.float32(0.25)  # fuzz carries the outer override


def test_general_boundary_needs_no_material():
    """Boundary geometry is never shaded; a material-less primitive in a
    general medium boundary must compile, and a boundary-only material
    must not widen the mat table."""
    from art_tpu.scene import materials as M
    from art_tpu.scene import objects as O
    from art_tpu.scene.builder import SceneBuilder
    def build(boundary_mat):
        b = SceneBuilder()
        b.add(O.ConstantMedium(
            O.Group((
                O.Sphere((0, 0, 0), 1.0, boundary_mat),
                O.Sphere((0.5, 0, 0), 1.0, boundary_mat),
            )),
            0.5,
            (0.8, 0.8, 0.8),
        ))
        b.set_camera(lookfrom=(0, 0, 5), lookat=(0, 0, 0), vup=(0, 1, 0),
                     vfov_degrees=40.0, aspect=1.0, aperture=0.0,
                     focus_dist=5.0)
        return b.compile().tables

    t_none = build(None)  # must not raise
    assert int(np.asarray(t_none.med_kind)[0]) == 2
    # a unique boundary material must not intern a dead row
    t_uniq = build(M.Metal((0.123, 0.456, 0.789), fuzz=0.9))
    assert t_uniq.mat_packed.shape[0] == t_none.mat_packed.shape[0]
