"""Pallas turbulence kernel: fused multi-octave Perlin noise.

The jnp ``perlin.turb_p`` evaluates 7 octaves x 8 lattice corners of
integer-hash gradient noise as ~60 separate XLA ops per corner whose
intermediates round-trip through HBM between fusions — measured at
~0.22 ms/iter on final_scene (ART_TPU_DBG=fake_turb ablation,
docs/PERF_NOTES.md) vs a ~0.1 ms op floor.  This kernel runs the whole
chain in VMEM.  The hash arithmetic is the reference's exact uint32 chain
(wanghash/mix3/u2m11, src/perlin.cuh:6-32), so results match the jnp path
bit-for-bit (both are f32 evaluations of identical operations).

The trailing ``sin`` of the marble formula stays OUTSIDE (no Mosaic
lowering for transcendentals); the kernel returns turb(p, depth) only.
``depth_mask`` (per-lane octave count, NOODLE textures) is supported as an
optional input plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 64
RAY_BLOCK = _SUBLANES * _LANES
_U32 = jnp.uint32


def _wanghash(x):
    x = (x ^ _U32(61)) ^ (x >> 16)
    x = x * _U32(9)
    x = x ^ (x >> 4)
    x = x * _U32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x


def _u2m11(h):
    bits = (h >> 8) & _U32(0x00FFFFFF)
    # Mosaic has no u32->f32 lowering; bits fit in 24 bits so the i32 hop
    # is exact.
    return (
        bits.astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / 8388607.5)
        - 1.0
    )


def _grad(xi, yi, zi):
    h = _wanghash(
        xi.astype(_U32) * _U32(73856093)
        ^ yi.astype(_U32) * _U32(19349663)
        ^ zi.astype(_U32) * _U32(83492791)
    )
    gx = _u2m11(h)
    gy = _u2m11(_wanghash(h))
    gz = _u2m11(_wanghash(h ^ _U32(0x9E3779B9)))
    inv = 1.0 / jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
    return gx * inv, gy * inv, gz * inv


def _noise(px, py, pz):
    fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    u, v, w = px - fx, py - fy, pz - fz
    i = fx.astype(jnp.int32)
    j = fy.astype(jnp.int32)
    k = fz.astype(jnp.int32)
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)
    accum = jnp.zeros_like(px)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                gx, gy, gz = _grad(i + di, j + dj, k + dk)
                s = (
                    (uu if di else (1.0 - uu))
                    * (vv if dj else (1.0 - vv))
                    * (ww if dk else (1.0 - ww))
                )
                accum = accum + s * (
                    gx * (u - di) + gy * (v - dj) + gz * (w - dk)
                )
    return accum


def _turb_kernel(px_ref, py_ref, pz_ref, out_ref, *, depth: int):
    _turb_body(px_ref, py_ref, pz_ref, None, out_ref, depth=depth)


def _turb_kernel_masked(px_ref, py_ref, pz_ref, dm_ref, out_ref, *, depth: int):
    _turb_body(px_ref, py_ref, pz_ref, dm_ref, out_ref, depth=depth)


def _turb_body(px_ref, py_ref, pz_ref, dm_ref, out_ref, *, depth: int):
    """Shared octave loop; dm_ref=None compiles the unmasked form (the
    per-lane where() drops out entirely, keeping it cost-free)."""
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    dm = None if dm_ref is None else dm_ref[:]
    accum = jnp.zeros_like(px)
    weight = 1.0
    for i in range(depth):
        term = weight * _noise(px, py, pz)
        accum = accum + (term if dm is None else jnp.where(i < dm, term, 0.0))
        weight *= 0.5
        px, py, pz = px * 2.0, py * 2.0, pz * 2.0
    out_ref[:] = jnp.abs(accum)


def turb_pallas(px, py, pz, depth: int, depth_mask=None, *, interpret: bool = False):
    """Drop-in for perlin.turb_p on TPU-aligned batches (R % 8192 == 0)."""
    R = px.shape[0]
    assert R % RAY_BLOCK == 0, R
    rows = R // _LANES
    grid = rows // _SUBLANES
    spec = pl.BlockSpec(
        (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def plane(x):
        return x.reshape(rows, _LANES)

    out_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    if depth_mask is None:
        out = pl.pallas_call(
            functools.partial(_turb_kernel, depth=depth),
            grid=(grid,),
            in_specs=[spec] * 3,
            out_specs=spec,
            out_shape=out_shape,
            interpret=interpret,
        )(plane(px), plane(py), plane(pz))
    else:
        out = pl.pallas_call(
            functools.partial(_turb_kernel_masked, depth=depth),
            grid=(grid,),
            in_specs=[spec] * 4,
            out_specs=spec,
            out_shape=out_shape,
            interpret=interpret,
        )(plane(px), plane(py), plane(pz), plane(depth_mask.astype(jnp.int32)))
    return out.reshape(R)
