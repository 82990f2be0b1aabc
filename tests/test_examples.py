"""The examples and docs/API.md quick-start must stay runnable."""

import io
import sys

import numpy as np

sys.path.insert(0, "examples")

from art_tpu.render.renderer import RenderConfig, render_scene
from art_tpu.utils.ppm import read_ppm, write_ppm


def test_custom_scene_example_renders():
    from custom_scene import build

    scene = build(aspect=80 / 45)
    # exercises: moving sphere, hollow glass group, rotated box, general
    # (Group-boundary) medium, emissive quad, checker + marble textures
    assert scene.tables.n_spheres >= 4
    assert scene.tables.n_boxes >= 1
    assert scene.tables.n_quads >= 1
    assert scene.tables.n_media >= 1

    fb, stats = render_scene(scene, RenderConfig(nx=80, ny=45, spp=2))
    assert np.isfinite(fb).all() and (fb >= 0).all()
    assert fb.max() > 0  # the light reaches something
    s = io.StringIO()
    write_ppm(fb, s)
    back = read_ppm(s.getvalue())
    assert back.shape == (45, 80, 3)


def test_api_quickstart_snippet():
    """The docs/API.md quick-start, verbatim logic at micro size: gradient
    sky must be visible (top scanline blue) — guards against the camera
    framing regressing onto the ground sphere."""
    from art_tpu.scene.builder import SceneBuilder
    from art_tpu.scene.materials import Lambertian, Metal
    from art_tpu.scene.objects import Sphere

    scene = (
        SceneBuilder()
        .add(
            Sphere((0, 0, -1), 0.5, Lambertian((0.1, 0.2, 0.5))),
            Sphere((0, -100.5, -1), 100.0, Lambertian((0.8, 0.8, 0.0))),
            Sphere((1, 0, -1), 0.5, Metal((0.8, 0.6, 0.2), fuzz=0.3)),
        )
        .set_background((0, 0, 0), gradient=True)
        .set_camera(
            lookfrom=(2, 1.2, 2), lookat=(0, 0, -1), vup=(0, 1, 0),
            vfov_degrees=40.0, aspect=16 / 9, aperture=0.1,
        )
        .compile()
    )
    fb, _ = render_scene(scene, RenderConfig(nx=80, ny=45, spp=4))
    top = fb[-1].mean(axis=0)  # row 0 is the bottom scanline
    assert top[2] > 0.9 and top[2] >= top[1] >= top[0]  # blue-dominant sky
