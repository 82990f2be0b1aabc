"""Randomized scene-level differential test.

The production Pallas intersection dispatch — ``closest_surface_p`` with
every backend gate answering TPU (ART_TPU_FORCE_PALLAS) and every
``pallas_call`` executed in interpret mode — must match the portable jnp
path on scenes *generated at random*, not just the 10 fixed reference
scenes.  This covers builder-gate combinations the fixed scenes never
exercise together: a >=192-row (radius, material)-uniform tail next to a
hollow (negative-radius) shell (pos_r False => carry-r path), moving and
static spheres in one small pool, rotated and axis-aligned boxes in one
table, arbitrary Translate/RotateY chains.

tests/test_pallas_kernels.py checks each kernel in isolation on the real
scene tables; this file checks the *dispatch wiring* end to end (winner
selection across primitive families included).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl_module

from art_tpu.core.vecmath import BIG, T_MIN
from art_tpu.ops import intersect
from art_tpu.ops import pallas_kernels as pk
from art_tpu.scene.builder import SceneBuilder
from art_tpu.scene.materials import Dielectric, DiffuseLight, Lambertian, Metal
from art_tpu.scene.objects import Box, Quad, RotateY, Sphere, Translate
from art_tpu.scene.textures import Checker, SolidColor

RB = pk.RAY_BLOCK


def _random_scene(seed: int):
    rng = np.random.default_rng(seed)

    def vec(lo, hi, n=3):
        return tuple(float(x) for x in rng.uniform(lo, hi, n))

    mats = [
        Lambertian(vec(0.1, 0.9)),
        Lambertian(Checker(0.5, SolidColor(vec(0, 1)), SolidColor(vec(0, 1)))),
        Metal(vec(0.5, 1.0), float(rng.uniform(0, 1))),
        Dielectric(1.5),
        DiffuseLight(vec(1, 6)),
    ]

    b = SceneBuilder()
    b.add(Sphere((0.0, -1000.0, 0.0), 1000.0, mats[1]))  # ground

    # mixed static spheres
    for _ in range(int(rng.integers(4, 12))):
        b.add(Sphere(vec(-8, 8), float(rng.uniform(0.3, 1.5)),
                     mats[int(rng.integers(len(mats)))]))
    # moving spheres
    for _ in range(int(rng.integers(2, 5))):
        c = vec(-8, 8)
        b.add(Sphere(c, float(rng.uniform(0.2, 0.8)),
                     mats[int(rng.integers(len(mats)))],
                     center2=tuple(c[i] + rng.uniform(-0.5, 0.5)
                                   for i in range(3))))
    # hollow shell: negative radius => builder pos_r gate False
    b.add(Sphere((3.0, 1.0, 3.0), 1.0, Dielectric(1.5)))
    b.add(Sphere((3.0, 1.0, 3.0), -0.9, Dielectric(1.5)))

    # (radius, material)-uniform cluster big enough to trigger the
    # constant-attribute tail loop (pack_spheres _TAIL_MIN = 192)
    tail_mat = mats[0]
    for _ in range(200):
        b.add(Sphere(vec(-30, 30), 0.5, tail_mat))

    # quads (random parallelograms)
    for _ in range(int(rng.integers(2, 5))):
        b.add(Quad(vec(-8, 8), vec(-3, 3), vec(-3, 3),
                   mats[int(rng.integers(len(mats)))]))

    # boxes: axis-aligned + transformed
    for _ in range(2):
        a = np.array(vec(-8, 8))
        b.add(Box(tuple(a), tuple(a + rng.uniform(0.5, 3.0, 3)),
                  mats[int(rng.integers(len(mats)))]))
    for _ in range(2):
        a = np.array(vec(-8, 8))
        box = Box(tuple(a), tuple(a + rng.uniform(0.5, 3.0, 3)),
                  mats[int(rng.integers(len(mats)))])
        b.add(Translate(RotateY(box, float(rng.uniform(-80, 80))),
                        vec(-2, 2)))

    b.set_camera(lookfrom=(13, 2, 3), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov_degrees=30.0, aspect=1.0)
    return b.compile()


def _ray_batch(seed: int, n: int):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    o = (jax.random.uniform(k0, (n, 3), jnp.float32) - 0.5) * 24.0
    o = o + jnp.asarray([0.0, 4.0, 0.0], jnp.float32)
    d = jax.random.normal(k1, (n, 3), jnp.float32)
    tm = jax.random.uniform(k2, (n,), jnp.float32)
    return (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), tm


def _interpret_pallas(monkeypatch):
    """Force every backend gate TPU-wards and every pallas_call to
    interpret mode so the production dispatch executes on this CPU host."""
    monkeypatch.setenv("ART_TPU_FORCE_PALLAS", "1")
    orig = pl_module.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl_module, "pallas_call", patched)


@pytest.mark.parametrize("seed", [11, 23])
def test_random_scene_dispatch_matches_jnp(seed, monkeypatch):
    scene = _random_scene(seed)
    tables = scene.tables
    # the generated scene must actually trigger the special kernel forms
    assert tables.sph_n_tail >= 192
    assert not tables.sph_pos_r  # hollow shell present
    assert tables.n_boxes >= 4 and tables.quad_n.shape[0] >= 2

    o, d, tm = _ray_batch(seed, RB)
    rec_j = intersect.closest_surface_p(tables, o, d, tm, T_MIN)

    _interpret_pallas(monkeypatch)
    assert intersect._use_pallas(RB)
    rec_k = intersect.closest_surface_p(tables, o, d, tm, T_MIN)

    hit_j = np.asarray(rec_j.hit)
    hit_k = np.asarray(rec_k.hit)
    assert hit_j.any() and (~hit_j).any()
    # hit sets identical up to measure-zero tangents (none expected on
    # random float inputs)
    np.testing.assert_array_equal(hit_k, hit_j)

    t_j = np.asarray(rec_j.t)
    t_k = np.asarray(rec_k.t)
    # all hits within loose tolerance; near-tie winners may swap between
    # equal-t objects, so gate attributes on tight-t agreement
    np.testing.assert_allclose(t_k[hit_j], t_j[hit_j], rtol=2e-2, atol=1e-2)
    tight = np.isclose(t_k, t_j, rtol=2e-4, atol=1e-4) & hit_j
    assert tight.mean() / max(hit_j.mean(), 1e-9) >= 0.98

    mat_match = np.asarray(rec_k.mat) == np.asarray(rec_j.mat)
    assert (mat_match | ~tight).mean() >= 0.995

    check = tight & mat_match
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(rec_k.normal[c])[check],
            np.asarray(rec_j.normal[c])[check],
            rtol=5e-3, atol=5e-3,
        )
    np.testing.assert_allclose(
        np.asarray(rec_k.u)[check], np.asarray(rec_j.u)[check],
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(rec_k.v)[check], np.asarray(rec_j.v)[check],
        rtol=5e-3, atol=5e-3,
    )
