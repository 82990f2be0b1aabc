"""Material scatter physics against the reference formulas."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.ops.intersect import HitRecord
from art_tpu.ops.shade import shade
from art_tpu.scene.builder import SceneBuilder
from art_tpu.scene.materials import (
    Dielectric,
    DiffuseLight,
    Isotropic,
    Lambertian,
    Metal,
)
from art_tpu.scene.objects import Sphere


def _tables(*mats):
    b = SceneBuilder()
    for i, m in enumerate(mats):
        b.add(Sphere((i * 3.0, 0, 0), 1.0, m))
    b.set_camera(
        lookfrom=(0, 0, 5), lookat=(0, 0, 0), vup=(0, 1, 0),
        vfov_degrees=60.0, aspect=1.0,
    )
    return b.compile().tables


def _rec(n, mat_id, normal=(0.0, 0.0, 1.0)):
    return HitRecord(
        hit=jnp.ones((n,), bool),
        t=jnp.ones((n,), jnp.float32),
        p=jnp.zeros((n, 3), jnp.float32),
        normal=jnp.tile(jnp.asarray([normal], jnp.float32), (n, 1)),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        mat=jnp.full((n,), mat_id, jnp.int32),
    )


def shade_with_key(tables, d, rec, key):
    """Test helper: derive the uniform block shade() now expects."""
    n = d.shape[0]
    u = jax.random.uniform(key, (n, 4), jnp.float32)
    return shade(tables, d, rec, u[:, 0:3], u[:, 3])


def test_lambertian_scatter_distribution():
    t = _tables(Lambertian((0.8, 0.4, 0.2)))
    n = 8192
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out = shade_with_key(t, d, _rec(n, 0), jax.random.PRNGKey(0))
    assert bool(np.all(np.asarray(out.scattered)))
    np.testing.assert_allclose(np.asarray(out.attenuation)[0], [0.8, 0.4, 0.2], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.emitted), 0.0, atol=1e-7)
    dirs = np.asarray(out.direction)
    # dir = n + ball: mean = n, z-component positive-biased
    np.testing.assert_allclose(dirs.mean(0), [0, 0, 1], atol=0.02)
    # |dir - n| <= 1 (ball radius)
    assert np.max(np.linalg.norm(dirs - np.array([0, 0, 1]), axis=-1)) <= 1.0 + 1e-5


def test_metal_mirror_and_absorb():
    t = _tables(Metal((0.9, 0.9, 0.9), 0.0))
    n = 4
    d = jnp.tile(jnp.asarray([[1.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out = shade_with_key(t, d, _rec(n, 0), jax.random.PRNGKey(0))
    # perfect mirror: unit(d) reflected about n=(0,0,1)
    exp = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
    np.testing.assert_allclose(np.asarray(out.direction), np.tile(exp, (n, 1)), atol=1e-5)
    assert bool(np.all(np.asarray(out.scattered)))
    # grazing + fuzz can absorb: shoot parallel-ish ray with huge fuzz
    t2 = _tables(Metal((0.9, 0.9, 0.9), 1.0))
    n = 4096
    d = jnp.tile(jnp.asarray([[1.0, 0.0, -0.01]], jnp.float32), (n, 1))
    out2 = shade_with_key(t2, d, _rec(n, 0), jax.random.PRNGKey(1))
    frac_absorbed = 1.0 - np.asarray(out2.scattered).mean()
    assert 0.2 < frac_absorbed < 0.8  # roughly half the fuzz sphere is below surface


def test_dielectric_normal_incidence_schlick_rate():
    ref_idx = 1.5
    t = _tables(Dielectric(ref_idx))
    n = 20000
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out = shade_with_key(t, d, _rec(n, 0), jax.random.PRNGKey(2))
    assert bool(np.all(np.asarray(out.scattered)))
    np.testing.assert_allclose(np.asarray(out.attenuation), 1.0, atol=1e-6)
    dirs = np.asarray(out.direction)
    refracted = dirs[:, 2] < 0  # continues through
    r0 = ((1 - ref_idx) / (1 + ref_idx)) ** 2
    assert abs((1.0 - refracted.mean()) - r0) < 0.01
    # refracted direction at normal incidence is straight through
    np.testing.assert_allclose(
        dirs[refracted], np.tile([0, 0, -1], (refracted.sum(), 1)), atol=1e-5
    )


def test_dielectric_tir_always_reflects():
    # from inside glass at a grazing angle beyond critical
    t = _tables(Dielectric(1.5))
    n = 256
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.3]], jnp.float32), (n, 1))  # exiting
    out = shade_with_key(t, d, _rec(n, 0), jax.random.PRNGKey(3))
    dirs = np.asarray(out.direction)
    # reflect(d, n) = d - 2(d.n)n = (1, 0, -0.3)
    np.testing.assert_allclose(dirs, np.tile([1.0, 0.0, -0.3], (n, 1)), atol=1e-5)


def test_diffuse_light_emits_and_dies():
    t = _tables(DiffuseLight((4.0, 3.0, 2.0)))
    n = 8
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out = shade_with_key(t, d, _rec(n, 0), jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(out.emitted), np.tile([4, 3, 2], (n, 1)), rtol=1e-6)
    assert not bool(np.any(np.asarray(out.scattered)))


def test_isotropic_uniform_directions():
    t = _tables(Isotropic((0.5, 0.5, 0.5)))
    n = 8192
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out = shade_with_key(t, d, _rec(n, 0), jax.random.PRNGKey(5))
    dirs = np.asarray(out.direction)
    np.testing.assert_allclose(dirs.mean(0), [0, 0, 0], atol=0.02)
    assert np.max(np.linalg.norm(dirs, axis=-1)) <= 1.0 + 1e-5
    assert bool(np.all(np.asarray(out.scattered)))
