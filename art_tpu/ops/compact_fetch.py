"""Adaptive compaction for the per-ray image-texel fetch.

The dense per-ray atlas gather is the single most expensive op of
image-textured scenes: XLA lowers a random (R,) gather to a scalar-serial
loop (~7 cycles/element => ~0.93 ms at R=2^17), and masking does not help
because the cost is per-ELEMENT, not per-useful-element
(docs/PERF_NOTES.md "image gather is a hardware floor").  But in
final_scene only ~5% of rays per bounce hit an image-textured surface.

The earlier compact-then-gather experiment (scripts/exp_compact_gather.py)
failed because the compaction step itself was an XLA scatter with R
updates (1.23 ms — scatter is serial over updates).  This module replaces
that step with the one-hot MXU scatter already powering the framebuffer
flush (ops/flush_kernel.py): ranks become one-hot rows, values ride the
matmul as byte-split bf16-exact channels, and the whole R->K compaction
costs one ~(K, C*128) x (R-lane) accumulation (~0.1 ms) instead of a
serial scatter.  Pipeline per bounce:

1. ``rank = exclusive_cumsum(needy)`` — vectorized log-step, ~free;
2. ``slots = flush_accumulate(pix=rank, died=needy, values)`` — MXU
   scatter of (flat texel index, ray id) into K compacted slots, each
   split into three bytes (integers <= 255 are exact in bf16, and each
   slot receives exactly one update, so the f32 accumulation is exact);
3. ``texels = atlas[flat_k]`` — a K-element gather (~7 cyc/elem but K
   is 16-32x smaller than R);
4. ``out.at[ray_k].set(texels)`` — an XLA scatter with K updates
   (serial over updates, but only K of them).

Correctness does not depend on the needy count: a ``lax.cond`` falls back
to the dense gather whenever more than K rays want a texel this bounce
(e.g. the earth scene, where EVERY surface is image-textured), so the
compact path is an exact, adaptive fast path, never an approximation.
Empty compacted slots scatter to row index R with mode='drop'.

The reference has no analog (per-thread pointer-chased texture reads,
src/texture.cuh:51-59); this is wavefront-native restructuring.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from art_tpu.ops.flush_kernel import RAY_BLOCK, flush_accumulate

# Compacted slot count: must be a multiple of 128 (one-hot rows) and
# above the per-bounce needy-ray population of the mixed pool
# (final_scene: ~5% of 2^17 = ~6.5k).  Beyond the cap the cond takes the
# dense branch, so this is a tuning knob only.  Measured on v5e
# (docs/PERF_NOTES.md): 8192 beats 16384 on every image scene that
# compacts (final 55.2 vs 53.2, original 51.6 vs 50.2, simple_light 117.0
# vs 112.1) — the scatter kernel's MXU cost is linear in K and the needy
# population stays well under 8k.
FETCH_K = int(os.environ.get("ART_TPU_FETCH_K", "8192"))

# Wide-tier capacity for image-dense scenes (earth: ~31% of lanes hit an
# image-textured surface every iteration once the needy mask is gated by
# rec.hit — far above FETCH_K but far below R).  The wide tier replaces
# the serial K-scatter route-back with the one-hot MXU table gather
# (ops/flush_kernel.table_gather_u24), so its cost is
# flush_accumulate(K2) ~0.1 ms + K2-element texel gather + MXU gather
# ~0.1 ms instead of the R-element dense gather (~0.93 ms at R=2^17).
# 0 disables the tier.
WFETCH_K = int(os.environ.get("ART_TPU_WFETCH_K", "49152"))


def _bytes3(x: jnp.ndarray):
    """Split a non-negative int32 (< 2^24) into three bf16-exact bytes."""
    xf = x.astype(jnp.int32)
    return (
        (xf & 0xFF).astype(jnp.float32),
        ((xf >> 8) & 0xFF).astype(jnp.float32),
        ((xf >> 16) & 0xFF).astype(jnp.float32),
    )


def _unbytes3(b0, b1, b2) -> jnp.ndarray:
    return (
        b0.astype(jnp.int32)
        + (b1.astype(jnp.int32) << 8)
        + (b2.astype(jnp.int32) << 16)
    )


def compact_gather(
    data: jnp.ndarray,  # (T,) flat atlas (any dtype XLA can gather/scatter)
    flat_idx: jnp.ndarray,  # (R,) int32 texel index per ray (any value ok
    #                         on non-needy lanes; must be in-range on needy)
    needy: jnp.ndarray,  # (R,) bool — lanes that actually want a texel
    *,
    k: int = 0,  # compacted capacity (0 = FETCH_K)
    max_value_bits: int = 32,  # static bound on data's values; <= 24
    #                            additionally enables the wide tier
    interpret: bool = False,
) -> jnp.ndarray:
    """data[flat_idx] on needy lanes, 0 elsewhere — via adaptive compaction.

    Exact: compact, wide and dense branches agree bit-for-bit on needy
    lanes.
    """
    R = flat_idx.shape[0]
    K = k or FETCH_K

    def dense(_):
        return jnp.where(needy, data[jnp.clip(flat_idx, 0, data.shape[0] - 1)],
                         jnp.zeros((), data.dtype))

    # _bytes3 carries 24 bits: both the texel index (< atlas size) and the
    # ray id (< R) must fit or the compact branch would corrupt indices.
    if (
        R % RAY_BLOCK != 0 or K % 128 != 0 or R <= K
        or data.shape[0] > (1 << 24) or R > (1 << 24)
    ):
        return dense(None)

    cnt = jnp.sum(needy.astype(jnp.int32))

    def compact(_):
        needy_i = needy.astype(jnp.int32)
        rank = jnp.cumsum(needy_i) - needy_i  # exclusive
        ray_id = jnp.arange(R, dtype=jnp.int32)
        fb0 = jnp.zeros((K // 128, 6 * 128), jnp.float32)
        slots = flush_accumulate(
            rank, needy,
            _bytes3(flat_idx) + _bytes3(ray_id),
            fb0, interpret=interpret,
        )
        # slot k's channel c lives at [k >> 7, c*128 + (k & 127)]
        ch = slots.reshape(K // 128, 6, 128)
        ch = jnp.moveaxis(ch, 1, 0).reshape(6, K)
        flat_k = _unbytes3(ch[0], ch[1], ch[2])
        ray_k = _unbytes3(ch[3], ch[4], ch[5])
        kvalid = jnp.arange(K, dtype=jnp.int32) < cnt
        # masked gather: empty slots fetch nothing (the earth A/B showed
        # the TPU gather lowers cheaper under a where mask — r5)
        texel_k = jnp.where(
            kvalid, data[jnp.clip(flat_k, 0, data.shape[0] - 1)],
            jnp.zeros((), data.dtype),
        )
        # route empty slots (k >= cnt) out of bounds so 'drop' ignores them
        ray_k = jnp.where(kvalid, ray_k, R)
        return (
            jnp.zeros((R,), data.dtype).at[ray_k].set(texel_k, mode="drop")
        )

    def wide(_):
        # Wide tier (K < cnt <= K2): same one-hot compaction at K2 slots
        # but payload = texel index only; the route-back reads
        # texels[rank[i]] through the MXU table gather instead of a
        # serial K2-update scatter.  Exact on needy lanes (every step is
        # integer-exact, see table_gather_u24), zeros elsewhere.
        from art_tpu.ops.flush_kernel import table_gather_u24

        needy_i = needy.astype(jnp.int32)
        rank = jnp.cumsum(needy_i) - needy_i  # exclusive
        fb0 = jnp.zeros((K2 // 128, 3 * 128), jnp.float32)
        slots = flush_accumulate(
            rank, needy, _bytes3(flat_idx), fb0, interpret=interpret
        )
        ch = slots.reshape(K2 // 128, 3, 128)
        ch = jnp.moveaxis(ch, 1, 0).reshape(3, K2)
        flat_k = _unbytes3(ch[0], ch[1], ch[2])
        # masked gather (empty slots fetch nothing) + zero so non-needy
        # lanes carrying rank == cnt route to a zero row
        texel_k = jnp.where(
            jnp.arange(K2, dtype=jnp.int32) < cnt,
            data[jnp.clip(flat_k, 0, data.shape[0] - 1)].astype(jnp.int32),
            0,
        )
        out = table_gather_u24(texel_k, rank, interpret=interpret)
        return jnp.where(needy, out, 0).astype(data.dtype)

    K2 = WFETCH_K
    wide_ok = (
        K < K2 < R
        and K2 % 128 == 0
        and jnp.issubdtype(data.dtype, jnp.integer)
        # table_gather_u24 byte-splits texels: 24-bit packed RGB only
        # (ImageAtlas packs R|G<<8|B<<16, utils/images.py)
        and max_value_bits <= 24
    )
    over = (
        (lambda a: jax.lax.cond(cnt <= K2, wide, dense, a))
        if wide_ok
        else dense
    )
    return jax.lax.cond(cnt <= K, compact, over, None)


def compact_ray_ids(
    needy: jnp.ndarray,  # (R,) bool
    k: int,  # compacted capacity (multiple of 128)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """(k,) int32: slot j = ray id of the j-th needy lane (queue order).

    Slots at or beyond the needy count are garbage (zero) — route them
    out of range before scattering through them.  This is the shared
    one-hot-MXU compaction step of :func:`compact_apply` and the
    compacted tail-sphere pass (ops/compact_sphere.py); requires
    ``R % RAY_BLOCK == 0``, ``k % 128 == 0`` and ``R < 2^24`` (byte-split
    payload), which callers gate statically."""
    R = needy.shape[0]
    needy_i = needy.astype(jnp.int32)
    rank = jnp.cumsum(needy_i) - needy_i  # exclusive
    ray_id = jnp.arange(R, dtype=jnp.int32)
    fb0 = jnp.zeros((k // 128, 3 * 128), jnp.float32)
    slots = flush_accumulate(
        rank, needy, _bytes3(ray_id), fb0, interpret=interpret
    )
    ch = slots.reshape(k // 128, 3, 128)
    ch = jnp.moveaxis(ch, 1, 0).reshape(3, k)
    return _unbytes3(ch[0], ch[1], ch[2])


def compact_apply(
    fn,  # vector function: N (K,)-f32 arrays -> one (K,) f32 array
    inputs,  # tuple of (R,) f32 arrays (fn's arguments, per ray)
    needy: jnp.ndarray,  # (R,) bool — lanes whose fn value is consumed
    *,
    k: int = 0,  # compacted capacity (0 = FETCH_K); must keep fn's
    #              alignment requirements (turb_pallas wants K % 8192 == 0)
    interpret: bool = False,
) -> jnp.ndarray:
    """``where(needy, fn(*inputs), 0)`` — with fn evaluated at only K
    compacted lanes when few rays need it.

    Same adaptive pipeline as :func:`compact_gather`, but the compacted
    payload is just the ray id (3 bytes): gather fn's inputs at the K
    survivor lanes, run fn on the 16x-smaller batch, scatter results back
    with K updates.  The compaction itself is exact (integer payload);
    fn's values can differ from an eager dense evaluation in the last
    ulps because XLA may fuse fn's mul+add chains differently (FMA
    contraction) inside the compiled cond branches — immaterial for
    Monte-Carlo shading.  A ``lax.cond`` takes the dense branch whenever
    cnt > K (e.g. the perlin scene, where every ray evaluates
    turbulence).  Targets final_scene's 7-octave marble turbulence (one
    perlin sphere among ~1410 objects — the turb kernel otherwise runs
    dense at R every bounce; reference analog is the per-thread
    conditional texture::value call, src/texture.cuh:67-71).
    """
    R = inputs[0].shape[0]
    K = k or FETCH_K

    def dense(_):
        return jnp.where(needy, fn(*inputs), 0.0)

    if R % RAY_BLOCK != 0 or K % RAY_BLOCK != 0 or R <= K or R > (1 << 24):
        return dense(None)

    cnt = jnp.sum(needy.astype(jnp.int32))

    def compact(_):
        ray_k = compact_ray_ids(needy, K, interpret=interpret)
        ray_kc = jnp.clip(ray_k, 0, R - 1)
        vals = fn(*(x[ray_kc] for x in inputs))
        # route empty slots (k >= cnt) out of bounds so 'drop' ignores them
        ray_k = jnp.where(jnp.arange(K, dtype=jnp.int32) < cnt, ray_k, R)
        return jnp.zeros((R,), jnp.float32).at[ray_k].set(vals, mode="drop")

    return jax.lax.cond(cnt <= K, compact, dense, None)
