import jax.numpy as jnp
import numpy as np

from art_tpu.ops.texture_eval import eval_texture
from art_tpu.scene.builder import SceneBuilder
from art_tpu.scene.materials import Lambertian
from art_tpu.scene.objects import Sphere
from art_tpu.scene.textures import (
    Checker,
    ImageTexture,
    NoiseTexture,
    SolidColor,
    UVOffset,
)


def _tables(texture):
    b = SceneBuilder()
    b.add(Sphere((0, 0, 0), 1.0, Lambertian(texture)))
    b.set_camera(
        lookfrom=(0, 0, 1), lookat=(0, 0, 0), vup=(0, 1, 0),
        vfov_degrees=90.0, aspect=1.0,
    )
    sc = b.compile()
    return sc.tables


def _eval(tables, tex_id, u, v, p):
    return np.asarray(
        eval_texture(
            tables,
            jnp.full((len(u),), tex_id, jnp.int32),
            jnp.asarray(u, jnp.float32),
            jnp.asarray(v, jnp.float32),
            jnp.asarray(p, jnp.float32),
        )
    )


def test_solid_color():
    t = _tables(SolidColor((0.2, 0.4, 0.6)))
    out = _eval(t, 0, [0.5], [0.5], [[0, 0, 0]])
    np.testing.assert_allclose(out[0], [0.2, 0.4, 0.6], rtol=1e-6)


def test_checker_parity():
    # scale=1 -> inv_scale=1; parity of floor(x)+floor(y)+floor(z)
    tex = Checker(1.0, SolidColor((1, 1, 1)), SolidColor((0, 0, 0)))
    t = _tables(tex)
    tex_id = int(np.argmax(np.asarray(t.tex_type) == 1))  # CHECKER row
    pts = [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [1.5, 1.5, 0.5], [-0.5, 0.5, 0.5]]
    out = _eval(t, tex_id, [0] * 4, [0] * 4, pts)
    # sums of floors: 0 (even), 1 (odd), 2 (even), -1 (odd)
    np.testing.assert_allclose(out[:, 0], [1, 0, 1, 0], atol=1e-6)


def test_image_texture_nearest_and_flip():
    img = np.zeros((2, 4, 3), np.uint8)
    img[0, 0] = [255, 0, 0]  # top-left in image space
    img[1, 3] = [0, 0, 255]  # bottom-right
    t = _tables(ImageTexture(img))
    # u=0, v=1 -> i=0, j=(1-1)*2=0 -> top-left red (v flip, src/texture.cuh:55)
    out = _eval(t, 0, [0.0, 0.99], [1.0, 0.0], [[0, 0, 0]] * 2)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 1], atol=1e-6)


def test_uv_offset_wraps():
    img = np.zeros((1, 4, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 2] = [0, 255, 0]
    base = ImageTexture(img)
    t = _tables(UVOffset(base, 0.5))  # u + 0.5 wraps
    tex_id = int(np.argmax(np.asarray(t.tex_type) == 6))  # UV_OFFSET row
    out = _eval(t, tex_id, [0.55, 0.05], [0.5, 0.5], [[0, 0, 0]] * 2)
    # u=0.55 + 0.5 -> 0.05 -> texel 0 (red); u=0.05+0.5 -> 0.55 -> texel 2 (green)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)


def test_noise_texture_range():
    t = _tables(NoiseTexture(4.0))
    pts = np.random.default_rng(0).uniform(-5, 5, (128, 3))
    out = _eval(t, 0, [0] * 128, [0] * 128, pts)
    # marble value in [0,1], grayscale
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(out[:, 0], out[:, 1], rtol=1e-6)
    assert out[:, 0].std() > 0.05


def test_checker_shared_across_materials_dedup():
    checker = Checker(0.32, SolidColor((0.2, 0.3, 0.1)), SolidColor((0.9, 0.9, 0.9)))
    lam = Lambertian(checker)
    b = SceneBuilder()
    b.add(Sphere((0, -10, 0), 10.0, lam), Sphere((0, 10, 0), 10.0, lam))
    b.set_camera(
        lookfrom=(13, 2, 3), lookat=(0, 0, 0), vup=(0, 1, 0),
        vfov_degrees=20.0, aspect=2.0,
    )
    sc = b.compile()
    # one shared material and 3 textures (checker + 2 solids)
    assert sc.tables.mat_type.shape[0] == 1
    assert sc.tables.tex_type.shape[0] == 3
