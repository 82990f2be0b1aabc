"""Perlin hash chain vs an independent pure-Python uint32 implementation.

The reference noise is permutation-free integer hashing
(src/perlin.cuh:6-32); these tests pin our jnp port to the same bit
behavior via a numpy-scalar reimplementation of the published formulas.
"""

import jax.numpy as jnp
import numpy as np

from art_tpu.ops import perlin

M32 = 0xFFFFFFFF


def py_wanghash(x: int) -> int:
    x &= M32
    x = ((x ^ 61) ^ (x >> 16)) & M32
    x = (x * 9) & M32
    x = (x ^ (x >> 4)) & M32
    x = (x * 0x27D4EB2D) & M32
    x = (x ^ (x >> 15)) & M32
    return x


def py_mix3(x: int, y: int, z: int) -> int:
    return ((x & M32) * 73856093 ^ (y & M32) * 19349663 ^ (z & M32) * 83492791) & M32


def py_u2m11(h: int) -> float:
    return float((h >> 8) & 0x00FFFFFF) * (1.0 / 8388607.5) - 1.0


def test_wanghash_matches():
    xs = [0, 1, 2, 61, 12345, 0xDEADBEEF, 0xFFFFFFFF]
    ours = np.asarray(perlin.wanghash(jnp.asarray(xs, jnp.uint32)))
    for x, o in zip(xs, ours):
        assert int(o) == py_wanghash(x), x


def test_mix3_matches_including_negatives():
    cases = [(0, 0, 0), (1, 2, 3), (-1, -2, -3), (100, -5, 7)]
    for x, y, z in cases:
        ours = int(
            np.asarray(
                perlin.mix3(
                    jnp.asarray([x], jnp.int32),
                    jnp.asarray([y], jnp.int32),
                    jnp.asarray([z], jnp.int32),
                )
            )[0]
        )
        # C casts int -> unsigned int by two's complement
        assert ours == py_mix3(x & M32, y & M32, z & M32)


def test_u2m11_range_and_values():
    hs = [0, 0xFFFFFFFF, 0x12345678]
    ours = np.asarray(perlin.u2m11(jnp.asarray(hs, jnp.uint32)))
    for h, o in zip(hs, ours):
        assert abs(float(o) - py_u2m11(h)) < 1e-6
        assert -1.0 <= float(o) <= 1.0


def test_grad_is_unit():
    g = np.asarray(
        perlin.grad(
            jnp.arange(-5, 5, dtype=jnp.int32),
            jnp.arange(0, 10, dtype=jnp.int32),
            jnp.arange(5, 15, dtype=jnp.int32),
        )
    )
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-5)


def test_noise_deterministic_and_bounded():
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-10, 10, size=(256, 3)), jnp.float32
    )
    n1 = np.asarray(perlin.noise(pts))
    n2 = np.asarray(perlin.noise(pts))
    np.testing.assert_array_equal(n1, n2)
    assert np.all(np.abs(n1) <= 1.0 + 1e-5)
    assert n1.std() > 0.01  # actually varies


def test_noise_zero_at_lattice():
    # gradient noise is exactly 0 at integer lattice points
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [-4.0, 5.0, -6.0]])
    np.testing.assert_allclose(np.asarray(perlin.noise(pts)), 0.0, atol=1e-6)


def test_turb_depth_masking():
    pts = jnp.asarray(np.random.default_rng(1).uniform(-3, 3, size=(64, 3)), jnp.float32)
    full = np.asarray(perlin.turb(pts, 7))
    masked = np.asarray(
        perlin.turb(pts, 7, depth_mask=jnp.full((64,), 7, jnp.int32))
    )
    np.testing.assert_allclose(full, masked, rtol=1e-6)
    d2 = np.asarray(perlin.turb(pts, 2))
    d2m = np.asarray(perlin.turb(pts, 7, depth_mask=jnp.full((64,), 2, jnp.int32)))
    np.testing.assert_allclose(d2, d2m, rtol=1e-6)
