"""Compacted tail-sphere intersection: skip the 1000-ball cluster for
rays that cannot reach it.

final_scene/original_scene spend ~59% of each bounce iteration in the
sphere kernel (ablation, docs/PERF_NOTES.md), and ~99% of its rows are
the (radius, material)-uniform 1000-ball cluster (reference
src/main.cu:547-552) — a compact AABB in one corner of the scene that
most rays' paths never cross.  Per-lane culling is anti-TPU (masking
does not reduce VPU work), but the adaptive one-hot MXU compaction that
already powers the image-texel fetch (ops/compact_fetch.py) applies
directly:

1. ``needy = slab(tail AABB)`` — ~15 VPU ops per ray, dense, ~free;
2. compact the needy ray ids into K slots (MXU scatter, ~0.1 ms);
3. one row-gather of the packed (R, 6) ray planes at K indices
   (XLA's serial gather prices per ROW, not per element —
   docs/PERF_NOTES.md u32-repack finding — so one (K,)-row gather
   replaces six (K,) gathers);
4. run the tail-only sphere kernel at K << R lanes;
5. scatter (t, normal) back as one (K, 4) -> (R, 4) row update and
   merge with the dense "head" pass (moving + non-tail statics) by
   closest t.

Exactness: a ``lax.cond`` falls back to the unsplit dense kernel
whenever more than K rays are needy, and the slab predicate is
conservative (inflated box, safe-direction division), so the compact
path can only skip spheres no ray could hit.  The split changes no
comparison semantics: head rows and tail rows run the same candidate
updates as the unsplit kernel's main/tail loops, and the head loop's
UNROLL-overlap rows (real tail spheres) are simply tested twice —
harmless for a strict closest-t merge.

The reference has no analog (its BVH prunes per thread,
src/bvh.cuh:95-106 — measured 144x slower on TPU as per-lane descent);
this is the wavefront-native form of the same pruning.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from art_tpu.core.vecmath import BIG
from art_tpu.ops.compact_fetch import compact_ray_ids

# Compacted lane capacity: multiple of RAY_BLOCK (8192) for the tail
# kernel's ray grid.  Beyond the cap the cond takes the dense branch, so
# this is a tuning knob, not a correctness bound.
SPH_K = int(os.environ.get("ART_TPU_SPH_K", "8192"))
# Opt-in (A/B pending): run the COMPACT branch's K-lane tail pass through
# the binned skip kernel too — compaction preserves slot (pixel) order, so
# compacted blocks stay coherent and the per-bin whens can still prune.
_COMPACT_SKIP = bool(os.environ.get("ART_TPU_COMPACT_SKIP"))
# Measurement-only (wrong image when cnt > K): force the adaptive cond to
# its compact / dense branch unconditionally, isolating each branch's
# per-iteration cost from the branch-ratio question (the end-to-end
# compact win is far below the per-branch cost model's prediction —
# this pins whether the gap is branch cost or branch ratio).
_FORCE_BRANCH = os.environ.get("ART_TPU_SPH_FORCE_BRANCH", "")


def tail_box_needy(box, o, d, t_min: float) -> jnp.ndarray:
    """(R,) bool — conservative: True whenever the ray's (t_min, inf)
    segment could intersect the tail cluster's inflated AABB.

    Zero direction components are replaced by +1e-20 (not IEEE inf
    semantics): an inside-slab origin then spans the whole line and an
    outside origin yields a one-sided huge interval — both err toward
    needy, never away (the box kernels' _safe_div_dir rationale,
    ops/intersect.py)."""
    ok, _ = tail_box_interval(box, o, d, t_min)
    return ok


def tail_box_interval(box, o, d, t_min: float):
    """((R,) bool could-hit, (R,) conservative entry t) for the inflated
    tail AABB — the entry value lets callers occlusion-gate needy against
    an already-known closer hit (any tail-sphere hit has t >= entry)."""
    x0, y0, z0, x1, y1, z1 = box
    t_near = jnp.full(o[0].shape, t_min, jnp.float32)
    t_far = jnp.full(o[0].shape, BIG, jnp.float32)
    for lo, hi, oc, dc in ((x0, x1, o[0], d[0]),
                           (y0, y1, o[1], d[1]),
                           (z0, z1, o[2], d[2])):
        inv = 1.0 / jnp.where(dc == 0.0, 1e-20, dc)
        ta = (lo - oc) * inv
        tb = (hi - oc) * inv
        t_near = jnp.maximum(t_near, jnp.minimum(ta, tb))
        t_far = jnp.minimum(t_far, jnp.maximum(ta, tb))
    return t_far >= t_near, t_near


def sphere_hit_attrs_split(
    tables,
    o,  # 3-tuple of (R,) planes
    d,  # 3-tuple of (R,) planes
    tm: jnp.ndarray,  # (R,)
    *,
    needs_uv: bool,
    expand: bool,
    pos_r: bool,
    k: int = 0,  # compacted capacity (0 = SPH_K)
    occ_t: jnp.ndarray | None = None,  # (R,) closest OTHER-primitive hit:
    #        rays whose cluster entry lies beyond it are exact to skip
    use_mxu_tail: bool = False,  # recentered tail MXU kernel as the
    #        over-K dense fallback (r5 experiment)
    use_skip: bool = False,  # block-pruned skip kernel as the fallback
    use_cellbin: bool = False,  # 3-D tail-lattice kernel as the fallback
    interpret: bool = False,
):
    """Drop-in for sphere_hit_attrs_planar on tail-cluster scenes:
    returns (t, normal 3-tuple, u, v, mat), each (R,).

    Caller gates statically: sph_n_tail > 0, sph_tail_box non-empty,
    R % RAY_BLOCK == 0, R > K, R < 2^24.  With ``use_skip`` the over-K
    fallback is the block-pruned skip kernel
    (pallas_kernels._sphere_skip_kernel) instead of the dense scan —
    the 25-55%-needy cluster-facing dispatches then still prune at
    (64, 128)-block granularity (caller gates sph_skip_bins)."""
    from art_tpu.ops.pallas_kernels import (
        _sphere_uv_epilogue,
        sphere_hit_attrs_planar,
        sphere_skip_hit_attrs,
    )

    R = o[0].shape[0]
    K = k or SPH_K
    n_tail = tables.sph_n_tail
    common = dict(
        expand=expand, pos_r=pos_r, needs_uv=False, interpret=interpret
    )

    needy, t_entry = tail_box_interval(tables.sph_tail_box, o, d, 1e-3)
    if os.environ.get("ART_TPU_STATS_NEEDY"):  # debug: gate effectiveness
        raw = needy
        gated = needy & (t_entry <= occ_t) if occ_t is not None else needy

        def _log(r, g, n):
            print(f"[stats_needy] raw {int(r)} gated {int(g)} / {int(n)}",
                  flush=True)

        jax.debug.callback(_log, jnp.sum(raw.astype(jnp.int32)),
                           jnp.sum(gated.astype(jnp.int32)), needy.shape[0])
    if occ_t is not None:
        # Occlusion gate (r5): a tail-sphere hit is >= the cluster entry,
        # so a ray already holding a closer quad/box hit cannot improve
        # through the tail — dropping it never changes the closest-t
        # merge.  Cluster-facing dispatches' needy population drops from
        # 25-55% toward the truly-reachable set, flipping more of them
        # onto the compact branch.
        needy = needy & (t_entry <= occ_t)
    cnt = jnp.sum(needy.astype(jnp.int32))

    def dense(_):
        if use_mxu_tail and tables.mxu_tail_pad:
            # Recentered tail MXU fallback (r5 experiment): head planar
            # pass + the 1000-row tail as one bilinear-feature MXU kernel
            # per ray block (pallas_kernels._sphere_mxu_kernel), with ray
            # origins shifted into cluster-local coordinates (t and
            # normals are translation-invariant).  NOT bit-equal to the
            # planar tail (expanded-quadratic rounding, 2*t_min margin) —
            # opt-in until parity + A/B receipts.
            from art_tpu.ops.pallas_kernels import sphere_hit_attrs_mxu

            t_h, n_h, _, _, m_h = sphere_hit_attrs_planar(
                tables.sph_packed, o, d, tm,
                n_moving=tables.sph_n_moving_pad,
                n_static=tables.sph_n_static - n_tail,
                n_tail=0, **common,
            )
            gx, gy, gz = tables.sph_tail_centroid
            oG = (o[0] - gx, o[1] - gy, o[2] - gz)
            t_c, n_c, _, _, _ = sphere_hit_attrs_mxu(
                tables.sph_mxu_tail_feat, tables.sph_mxu_tail_attr,
                oG, d, tm, s_pad=tables.mxu_tail_pad,
                needs_uv=False, interpret=interpret,
            )
            better = t_c < t_h
            return (
                jnp.where(better, t_c, t_h),
                jnp.where(better, n_c[0], n_h[0]),
                jnp.where(better, n_c[1], n_h[1]),
                jnp.where(better, n_c[2], n_h[2]),
                jnp.where(better, jnp.int32(int(tables.sph_tail_mat)), m_h),
            )
        if use_cellbin:
            # 3-D tail-lattice kernel (pack_tail2d_spheres layout): rear
            # cells prune via the occlusion bound for the 25-55%-needy
            # cluster-facing dispatches this fallback exists for.
            from art_tpu.ops.pallas_kernels import sphere_cellbin_hit_attrs

            t, n, _, _, m = sphere_cellbin_hit_attrs(
                tables.sph_cellbin_packed, o, d, tm,
                meta=tables.sph_cellbin_meta, **common,
            )
            return t, *n, m
        if use_skip:
            t, n, _, _, m = sphere_skip_hit_attrs(
                tables.sph_skip_packed, o, d, tm,
                meta=tables.sph_skip_bins, tail_box=tables.sph_tail_box,
                tail_r=tables.sph_tail_r, tail_mat=tables.sph_tail_mat,
                **common,
            )
            return t, *n, m
        t, n, _, _, m = sphere_hit_attrs_planar(
            tables.sph_packed, o, d, tm,
            n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
            n_tail=n_tail, tail_r=tables.sph_tail_r,
            tail_mat=tables.sph_tail_mat, **common,
        )
        return t, *n, m

    def compact(_):
        # Head pass at R: moving spheres + the non-tail statics.  The
        # static loop rounds n_static up to UNROLL, re-testing a few
        # real tail rows with the full (non-tail) candidate — correct,
        # just redundant (~UNROLL rows of ~1000).
        t_h, n_h, _, _, m_h = sphere_hit_attrs_planar(
            tables.sph_packed, o, d, tm,
            n_moving=tables.sph_n_moving_pad,
            n_static=tables.sph_n_static - n_tail,
            n_tail=0, **common,
        )
        ray_k = compact_ray_ids(needy, K, interpret=interpret)
        packed_in = jnp.stack([*o, *d], axis=1)  # (R, 6)
        slot = jnp.arange(K, dtype=jnp.int32)
        # masked row gather: empty slots (>= cnt) fetch nothing (the
        # earth A/B showed the TPU gather lowers cheaper under a where
        # mask — r5); zero rays are inert in the tail kernel
        rows_k = jnp.where(
            (slot < cnt)[:, None], packed_in[jnp.clip(ray_k, 0, R - 1)], 0.0
        )
        oK = (rows_k[:, 0], rows_k[:, 1], rows_k[:, 2])
        dK = (rows_k[:, 3], rows_k[:, 4], rows_k[:, 5])
        if use_skip and _COMPACT_SKIP:
            # Tail-only skip call: head segments skipped via meta
            # (0, 0, bins); compaction is order-preserving, so the K
            # lanes stay pixel-coherent and the bin whens keep pruning.
            t_c, n_c, _, _, _ = sphere_skip_hit_attrs(
                tables.sph_skip_packed, oK, dK,
                jnp.zeros((K,), jnp.float32),
                meta=(0, 0, tables.sph_skip_bins[2]),
                tail_box=tables.sph_tail_box,
                tail_r=tables.sph_tail_r, tail_mat=tables.sph_tail_mat,
                **common,
            )
        else:
            t_c, n_c, _, _, _ = sphere_hit_attrs_planar(
                tables.sph_tail_packed, oK, dK,
                jnp.zeros((K,), jnp.float32),
                n_moving=0, n_static=n_tail, n_tail=n_tail,
                tail_r=tables.sph_tail_r, tail_mat=tables.sph_tail_mat,
                **common,
            )
        # One (K, 4) -> (R, 4) row scatter; empty slots (>= cnt) route to
        # row R and drop.  Non-needy rows stay 0, remapped to BIG below
        # (a real candidate t is always > t_min > 0; a tail miss is BIG).
        vals = jnp.stack([t_c, *n_c], axis=1)
        out = jnp.zeros((R, 4), jnp.float32).at[
            jnp.where(slot < cnt, ray_k, R)
        ].set(vals, mode="drop")
        t_cl = jnp.where(out[:, 0] > 0.0, out[:, 0], BIG)
        better = t_cl < t_h
        return (
            jnp.where(better, t_cl, t_h),
            jnp.where(better, out[:, 1], n_h[0]),
            jnp.where(better, out[:, 2], n_h[1]),
            jnp.where(better, out[:, 3], n_h[2]),
            jnp.where(better, jnp.int32(int(tables.sph_tail_mat)), m_h),
        )

    if _FORCE_BRANCH == "compact":  # measurement only (see module top)
        t, nx, ny, nz, m = compact(None)
    elif _FORCE_BRANCH == "dense":
        t, nx, ny, nz, m = dense(None)
    else:
        t, nx, ny, nz, m = jax.lax.cond(cnt <= K, compact, dense, None)
    return _sphere_uv_epilogue(t, nx, ny, nz, m, R, needs_uv)
