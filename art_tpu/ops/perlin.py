"""Hash-based gradient Perlin noise, bit-reproducing the reference hashes.

The reference uses permutation-table-free gradient noise built from integer
hashes (wanghash + spatial mix, reference src/perlin.cuh:6-32).  The hashes
below are the same uint32 arithmetic, vectorized over point batches, so the
procedural textures are deterministic and bit-comparable with the CUDA
build (up to libm sin/pow differences in downstream texture formulas).
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.core.vecmath import dot

_U32 = jnp.uint32


def wanghash(x: jnp.ndarray) -> jnp.ndarray:
    """Wang hash on uint32 (reference src/perlin.cuh:6-13)."""
    x = x.astype(_U32)
    x = (x ^ _U32(61)) ^ (x >> 16)
    x = x * _U32(9)
    x = x ^ (x >> 4)
    x = x * _U32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x


def mix3(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Spatial lattice hash (reference src/perlin.cuh:14-16)."""
    return (
        x.astype(_U32) * _U32(73856093)
        ^ y.astype(_U32) * _U32(19349663)
        ^ z.astype(_U32) * _U32(83492791)
    )


def u2m11(h: jnp.ndarray) -> jnp.ndarray:
    """Map uint32 -> [-1, 1] using the upper-24-bit trick (src/perlin.cuh:18-21)."""
    bits = (h >> 8) & _U32(0x00FFFFFF)
    return bits.astype(jnp.float32) * jnp.float32(1.0 / 8388607.5) - 1.0


def grad(xi: jnp.ndarray, yi: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """Pseudo-random unit gradient per lattice point (src/perlin.cuh:28-32)."""
    h = wanghash(mix3(xi, yi, zi))
    v = jnp.stack(
        [u2m11(h), u2m11(wanghash(h)), u2m11(wanghash(h ^ _U32(0x9E3779B9)))],
        axis=-1,
    )
    return v / jnp.sqrt(jnp.maximum(dot(v, v), 1e-30))[..., None]


def _smooth(t: jnp.ndarray) -> jnp.ndarray:
    return t * t * (3.0 - 2.0 * t)


def noise(p: jnp.ndarray) -> jnp.ndarray:
    """Gradient noise over a (..., 3) point batch (src/perlin.cuh:34-70)."""
    pf = jnp.floor(p)
    u = p[..., 0] - pf[..., 0]
    v = p[..., 1] - pf[..., 1]
    w = p[..., 2] - pf[..., 2]
    i = pf[..., 0].astype(jnp.int32)
    j = pf[..., 1].astype(jnp.int32)
    k = pf[..., 2].astype(jnp.int32)

    uu, vv, ww = _smooth(u), _smooth(v), _smooth(w)
    accum = jnp.zeros(p.shape[:-1], jnp.float32)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                g = grad(i + di, j + dj, k + dk)
                weight = jnp.stack([u - di, v - dj, w - dk], axis=-1)
                s = (
                    (uu if di else (1.0 - uu))
                    * (vv if dj else (1.0 - vv))
                    * (ww if dk else (1.0 - ww))
                )
                accum = accum + s * dot(g, weight)
    return accum


def turb(p: jnp.ndarray, depth: int, depth_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Turbulence |sum w_i * noise(2^i p)| (src/perlin.cuh:72-82).

    ``depth`` is the static unroll bound; ``depth_mask`` (optional, (...,)
    int32) zeroes octaves at index >= per-point depth so textures with
    different octave counts can share one evaluation.
    """
    accum = jnp.zeros(p.shape[:-1], jnp.float32)
    temp = p
    weight = 1.0
    for i in range(depth):
        term = weight * noise(temp)
        if depth_mask is not None:
            term = jnp.where(i < depth_mask, term, 0.0)
        accum = accum + term
        weight *= 0.5
        temp = temp * 2.0
    return jnp.abs(accum)
