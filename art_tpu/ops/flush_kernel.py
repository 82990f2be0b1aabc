"""Pallas framebuffer-flush kernel: in-VMEM one-hot MXU accumulation.

The XLA matmul flush (render/integrator.py, docs/PERF_NOTES.md round 2)
replaced the colliding scatter-add with ``fb += onehot(hi)^T @ W`` — but XLA
materializes both one-hot operands in HBM (~230 MB/iteration at R=2^17,
P=2^16), so the flush pays more for operand bandwidth than for the matmul.
This kernel builds the one-hots in VMEM and accumulates into a
VMEM-resident planar framebuffer, leaving only the unavoidable MXU work
(2*R*3P/128 FLOPs) plus the (R,) input streams.

Layout trick (everything stays in the natural sublane-lane layout — no
transposes):  for a ray sub-block of GROUP sublane rows starting at s0,

    ohT[h, k*128+l]        = (hi[s0+k, l] == h)          (N_HI, GROUP*128)
    W [c*128+w, k*128+l]   = (lo[s0+k, l] == w) * radc   (384,  GROUP*128)
    fb (N_HI, 384)        += dot(ohT, W^T)               contract lanes (NT)

Both operands index rays along *lanes*, so every build is a broadcast
compare against ``broadcasted_iota`` over sublanes, and the contraction
runs over the lane axis of both (dot_general ``(((1,), (1,)), ((), ()))``).
All three channels ride one dot per group (stacked along the N axis).

The framebuffer layout matches the XLA matmul flush: (N_HI, 384) with
pixel ``p = hi*128 + lo`` channel c at ``[hi, c*128+lo]``.

bf16 note: operands are cast to bf16 exactly like the XLA flush; each died
sample is rounded once (~0.4% relative, far below Monte-Carlo noise) and
accumulated in exact f32.  CI gates matmul-vs-scatter image equality.

**Windowed mode** (the production path): the MXU work is n_hi*384*R MACs —
structural in the framebuffer row count.  Under sample-major queue order
(spp consecutive queue ids share a pixel, ops/refill_kernel.py) the live
pixel set is a monotone band bounded by R*max_depth/spp pixels, so the
integrator passes only a dynamic fb WINDOW plus its base row; rows shrink
512 -> 112 at spp=500 (flush 0.41 -> 0.10 ms/iter).  Hardware A/B: window
vs full-fb results identical to 12 digits (docs/PERF_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 64  # ray rows per grid block: 8192 rays
RAY_BLOCK = _SUBLANES * _LANES
_GROUP = 16  # sublane rows contracted per dot: K = GROUP*128 = 2048
# (GROUP=32 exceeds the 16 MB scoped-vmem limit: 17.3 MB with the dot's
# internal transpose copy of the 384-row W operand)


def _flush_kernel(base_ref, pix_ref, died_ref, *rest,
                  n_hi: int, n_chan: int = 3, group: int = _GROUP):
    rad_refs = rest[:n_chan]
    fb_ref, out_ref, oh_s, w_s = rest[n_chan:]
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = fb_ref[:]

    pix = pix_ref[:]
    died = died_ref[:] != 0
    # The fb operand may be a WINDOW of the full accumulator starting at
    # row base (sample-major queue order keeps live pixels in a narrow
    # monotone band — render/integrator.py sizes the window from the
    # R*max_depth/spp bound, so in-range is an invariant, not a filter).
    hi = jax.lax.shift_right_logical(pix, 7) - base_ref[0]
    lo = jax.lax.bitwise_and(pix, 127)
    # lanes not flushing route to one-hot row n_hi (no row matches)
    ok = died & (hi >= 0) & (hi < n_hi)
    hi = jnp.where(ok, hi, n_hi)

    rads = tuple(r[:] for r in rad_refs)
    one_hot_accumulate(
        hi, lo, rads, out_ref, oh_s, w_s,
        n_hi=n_hi, n_chan=n_chan, group=group,
    )


def one_hot_accumulate(hi, lo, rads, out_ref, oh_s, w_s,
                       *, n_hi: int, n_chan: int = 3, group: int = _GROUP):
    """The shared one-hot MXU scatter body: accumulate each lane's
    ``rads`` channels into ``out_ref[hi, c*128 + lo]`` by building
    (n_hi x K) one-hot rows and a (n_chan*128 x K) value operand, then
    contracting on the MXU.  Lanes routed to row ``n_hi`` are dropped
    (no one-hot row matches).  Callers: the standalone flush kernel above
    and the seam-merged refill+flush (ops/refill_kernel._flush_dead) —
    keep ONE copy so fixes to the flush math apply to both paths."""
    # dim-0 iotas are identical for every lane group: build once
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n_hi, _LANES), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)

    for g in range(_SUBLANES // group):
        s0 = g * group
        for k in range(group):
            sl = slice(k * _LANES, (k + 1) * _LANES)
            hrow = hi[s0 + k : s0 + k + 1, :]  # (1, LANES)
            lrow = lo[s0 + k : s0 + k + 1, :]
            oh_s[:, sl] = (hrow == hi_iota).astype(jnp.bfloat16)
            lmask = (lrow == lo_iota).astype(jnp.bfloat16)
            for c in range(n_chan):
                w_s[c * _LANES : (c + 1) * _LANES, sl] = lmask * rads[c][
                    s0 + k : s0 + k + 1, :
                ].astype(jnp.bfloat16)
        out_ref[:, :] += jax.lax.dot_general(
            oh_s[:, :], w_s[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _table_gather_kernel(idx_ref, tab_ref, out_ref, rowsel_s, *, n_rows):
    """out[r, l] = u24 value of tab row hi, column-block byte lanes lo.

    Per lane-row: one-hot row select on the MXU ((n_rows, 384) x
    (n_rows, LANES) contraction over rows), then a VPU lane-column
    select + byte recombine.  Exactness: table bytes <= 255 are bf16-
    exact, the one-hot is 0/1, the f32 accumulation sums exactly one
    nonzero term per output, and the u24 recombine stays < 2^24 (f32-
    exact).  Out-of-range indices match no one-hot row -> 0."""
    idx = idx_ref[:]
    hi = jax.lax.shift_right_logical(idx, 7)
    lo = jax.lax.bitwise_and(idx, 127)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, _LANES), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    for r in range(_SUBLANES):
        hrow = hi[r : r + 1, :]  # (1, LANES)
        lrow = lo[r : r + 1, :]
        oh = (hrow == hi_iota).astype(jnp.bfloat16)  # (n_rows, LANES)
        rowsel_s[:, :] = jax.lax.dot_general(
            tab_ref[:, :], oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3*LANES, LANES): [c*128+w, lane] = tab[hi[lane], c*128+w]
        lmask = (lrow == lo_iota).astype(jnp.float32)  # [w, lane]
        b0 = jnp.sum(rowsel_s[0:_LANES, :] * lmask, axis=0)
        b1 = jnp.sum(rowsel_s[_LANES : 2 * _LANES, :] * lmask, axis=0)
        b2 = jnp.sum(rowsel_s[2 * _LANES : 3 * _LANES, :] * lmask, axis=0)
        out_ref[r, :] = b0 + 256.0 * b1 + 65536.0 * b2


def table_gather_u24(
    table: jnp.ndarray,  # (T,) integer table, values < 2^24
    idx: jnp.ndarray,  # (R,) int32; out-of-range indices return 0
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """``table[idx]`` as an in-VMEM one-hot MXU gather -> (R,) int32.

    XLA lowers a random (R,) gather to a ~7-cycle/element scalar loop
    regardless of table size (docs/PERF_NOTES.md "hardware floor"); this
    kernel's cost is MXU work ~ R*T MACs instead, which wins for small
    tables (T <= ~64k at R = 2^17: ~0.1 ms vs 0.93 ms serial).  Powers
    the wide-tier compacted image fetch's route-back
    (ops/compact_fetch.py): out[i] = texel_slots[rank[i]]."""
    T = table.shape[0]
    R = idx.shape[0]
    assert T % _LANES == 0 and R % RAY_BLOCK == 0, (T, R)
    n_rows = T // _LANES
    t = table.astype(jnp.int32)
    tab_b = jnp.concatenate(
        [
            (t & 0xFF).reshape(n_rows, _LANES),
            ((t >> 8) & 0xFF).reshape(n_rows, _LANES),
            ((t >> 16) & 0xFF).reshape(n_rows, _LANES),
        ],
        axis=1,
    ).astype(jnp.bfloat16)
    rows = R // _LANES
    ray_spec = pl.BlockSpec(
        (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (n_rows, 3 * _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_table_gather_kernel, n_rows=n_rows),
        grid=(rows // _SUBLANES,),
        in_specs=[ray_spec, tab_spec],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * _LANES, _LANES), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(idx.reshape(rows, _LANES), tab_b)
    return out.reshape(R).astype(jnp.int32)


def flush_accumulate(
    pix: jnp.ndarray,  # (R,) int32 framebuffer row of each slot
    died: jnp.ndarray,  # (R,) bool — flush these slots' radiance
    radiance,  # tuple of (R,) f32 value channels (3 for the fb flush)
    fb: jnp.ndarray,  # (n_hi, C*128) f32 accumulator (or a window of it)
    *,
    base=None,  # () int32 first fb row this window covers (None = 0)
    interpret: bool = False,
) -> jnp.ndarray:
    """fb[p//128 - base, c*128 + p%128] += radiance[c][r] for every died
    slot r (pixel p = pix[r]); returns the updated accumulator window.

    Channel values are rounded once to bf16 (exact for the fb flush's
    Monte-Carlo purposes, and exact, period, for integers <= 256 — the
    compact-fetch kernel in ops/compact_fetch.py relies on that by
    byte-splitting its payloads)."""
    R = pix.shape[0]
    assert R % RAY_BLOCK == 0, R
    rows = R // _LANES
    grid = rows // _SUBLANES
    n_hi = fb.shape[0]
    n_chan = len(radiance)
    assert fb.shape[1] == n_chan * _LANES, (fb.shape, n_chan)
    # larger W operands blow the 16 MB scoped-vmem limit at GROUP=16
    group = _GROUP if n_chan <= 3 else _GROUP // 2
    if base is None:
        base = jnp.int32(0)

    ray_spec = pl.BlockSpec(
        (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    fb_spec = pl.BlockSpec(
        (n_hi, n_chan * _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def plane(x):
        return x.reshape(rows, _LANES)

    return pl.pallas_call(
        functools.partial(_flush_kernel, n_hi=n_hi, n_chan=n_chan, group=group),
        grid=(grid,),
        in_specs=[base_spec] + [ray_spec] * (2 + n_chan) + [fb_spec],
        out_specs=fb_spec,
        out_shape=jax.ShapeDtypeStruct((n_hi, n_chan * _LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_hi, group * _LANES), jnp.bfloat16),
            pltpu.VMEM((n_chan * _LANES, group * _LANES), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        jnp.reshape(base, (1,)).astype(jnp.int32),
        plane(pix),
        plane(died.astype(jnp.int32)),
        *[plane(r) for r in radiance],
        fb,
    )
