"""Flat SoA scene tables — the TPU-native scene representation.

The reference builds a device-side object graph with virtual dispatch
(``hittable**`` lists + ``bvh_node`` built by a <<<1,1>>> kernel,
reference src/main.cu:160-635).  TPUs can't chase pointers or dispatch
virtually, so the whole scene compiles host-side into type-segmented flat
tables:

* spheres   — center0/velocity/signed-radius/material (src/sphere.cuh:21-38);
* quads     — Q/u/v/w/normal/D/material with instancing *baked in* at build
  time: a ``translate(rotate_y(quad))`` is exactly an affinely transformed
  quad, so no per-ray transform work remains (src/hittable.cuh:40-149);
* boxes     — oriented boxes (object-space AABB + y-rotation + offset),
  a TPU-first redesign of the reference ``compound6`` 6-quad container
  (src/quad.cuh:94-162): one slab test replaces six quad tests;
* media     — constant-density participating media keyed by a convex
  boundary (sphere or oriented box), replacing the reference
  ``constant_medium`` double-traversal (src/constant_medium.cuh:36-64);
* materials — integer-tagged rows replacing the material vtable
  (src/material.cuh:46-201);
* textures  — integer-tagged rows with child links replacing the texture
  vtable (src/texture.cuh:9-164).

Counts are static pytree metadata so per-scene jit specializes away empty
segments.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from enum import IntEnum

import jax
import jax.numpy as jnp

from art_tpu.utils.images import ImageAtlas


class MatType(IntEnum):
    """Material tags (replaces the material vtable, src/material.cuh:46-201)."""

    LAMBERTIAN = 0
    METAL = 1
    DIELECTRIC = 2
    DIFFUSE_LIGHT = 3
    ISOTROPIC = 4


class TexType(IntEnum):
    """Texture tags (replaces the texture vtable, src/texture.cuh:9-164)."""

    SOLID = 0
    CHECKER = 1
    IMAGE = 2
    NOISE = 3
    NOODLE = 4
    FELT = 5
    UV_OFFSET = 6


def _static():
    return field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneTables:
    # ---- spheres (reference src/sphere.cuh) ----
    sph_center: jnp.ndarray  # (S,3) center at t=0
    sph_vel: jnp.ndarray  # (S,3) center(t) = center + t*vel
    sph_radius: jnp.ndarray  # (S,) SIGNED (negative radius = inward normals, src/main.cu:439)
    sph_mat: jnp.ndarray  # (S,) int32

    # ---- quads (reference src/quad.cuh; instancing baked in) ----
    quad_q: jnp.ndarray  # (Q,3)
    quad_u: jnp.ndarray  # (Q,3)
    quad_v: jnp.ndarray  # (Q,3)
    quad_w: jnp.ndarray  # (Q,3)  n / dot(n,n)
    quad_n: jnp.ndarray  # (Q,3)  unit normal, inward flip applied
    quad_d: jnp.ndarray  # (Q,)   plane constant dot(n, Q)
    quad_mat: jnp.ndarray  # (Q,) int32
    # Precomputed triple-product vectors so the (alpha, beta) interior test
    # (src/quad.cuh:73-75) becomes pure (R,3)@(3,Q) matmuls:
    #   alpha = dot(w, cross(p-Q, v)) = dot(v x w, p) - dot(v x w, Q)
    #   beta  = dot(w, cross(u, p-Q)) = dot(w x u, p) - dot(w x u, Q)
    quad_avec: jnp.ndarray  # (Q,3)  v x w
    quad_bvec: jnp.ndarray  # (Q,3)  w x u
    quad_ca: jnp.ndarray  # (Q,)   dot(v x w, Q)
    quad_cb: jnp.ndarray  # (Q,)   dot(w x u, Q)

    # ---- oriented boxes (redesign of compound6, src/quad.cuh:94-162) ----
    box_min: jnp.ndarray  # (B,3) object-space AABB min
    box_max: jnp.ndarray  # (B,3)
    box_cos: jnp.ndarray  # (B,)  y-rotation cos (1 for axis-aligned)
    box_sin: jnp.ndarray  # (B,)  y-rotation sin (0 for axis-aligned)
    box_off: jnp.ndarray  # (B,3) world offset
    box_mat: jnp.ndarray  # (B,) int32

    # ---- constant media (reference src/constant_medium.cuh) ----
    med_kind: jnp.ndarray  # (C,) int32: 0=sphere boundary, 1=box boundary,
    #                         2=general boundary (gb_* tables; see med_kinds)
    med_center: jnp.ndarray  # (C,3) sphere center
    med_radius: jnp.ndarray  # (C,)
    med_min: jnp.ndarray  # (C,3) box bounds
    med_max: jnp.ndarray  # (C,3)
    med_cos: jnp.ndarray  # (C,)
    med_sin: jnp.ndarray  # (C,)
    med_off: jnp.ndarray  # (C,3)
    med_neg_inv_density: jnp.ndarray  # (C,)  -1/density
    med_mat: jnp.ndarray  # (C,) int32 (isotropic phase material)
    # General (kind-2) medium boundaries: the reference accepts ANY
    # hittable as a constant_medium boundary (src/constant_medium.cuh:16-34).
    # Media whose boundary does not reduce to one analytic sphere/box
    # compile their boundary subtree into these rows; apply_media_p
    # evaluates first/second closest hits over each medium's subset
    # brute-force (cold jnp path — no reference scene needs one).
    gb_sph: jnp.ndarray  # (Gs, 7)  [cx cy cz vx vy vz radius]
    gb_quad: jnp.ndarray  # (Gq, 16) [q(3) u(3) v(3) w(3) n(3) d]
    gb_box: jnp.ndarray  # (Gb, 11) [min(3) max(3) cos sin off(3)]

    # ---- materials ----
    mat_type: jnp.ndarray  # (M,) int32 MatType
    mat_tex: jnp.ndarray  # (M,) int32 texture id (lambertian/light/isotropic)
    mat_rgb: jnp.ndarray  # (M,3) metal albedo
    mat_fuzz: jnp.ndarray  # (M,) metal fuzz (clamped <= 1 at build)
    mat_ref_idx: jnp.ndarray  # (M,) dielectric index

    # ---- textures ----
    tex_type: jnp.ndarray  # (T,) int32 TexType
    tex_rgb: jnp.ndarray  # (T,3) solid color / felt base / noodle color
    tex_rgb2: jnp.ndarray  # (T,3) noodle gap color
    tex_params: jnp.ndarray  # (T,8) per-type scalar params
    tex_child: jnp.ndarray  # (T,2) int32 child texture ids (checker even/odd; uv_offset base)
    tex_img: jnp.ndarray  # (T,) int32 atlas image id
    atlas: ImageAtlas

    # ---- kernel-packed copies (built once at compile; see ops/pallas_kernels) ----
    sph_packed: jnp.ndarray  # (S, 10) [cx cy cz vx vy vz radius mat r2 K]
    # Tail rows re-based to row 0 (pack_tail_spheres) for the compacted
    # tail-sphere pass (ops/compact_sphere.py): the uniform cluster runs
    # at K << R compacted lanes when few rays' slabs cross its AABB.
    sph_tail_packed: jnp.ndarray  # (T_pad, 10)
    # Skip-kernel layout (pack_skip_spheres): [moving | main | tail bins],
    # tail rows sorted + split into contiguous axis bins for the
    # block-level pruned kernel (pallas_kernels._sphere_skip_kernel).
    sph_skip_packed: jnp.ndarray  # (N, 10)
    # Cell-binned layout (pack_cellbin_spheres): [head moving | head
    # static | cell segments], every small sphere (moving included)
    # assigned to a 2-D lattice cell for the block-level pruned kernel
    # (pallas_kernels._sphere_cellbin_kernel).
    sph_cellbin_packed: jnp.ndarray  # (N, 10)
    quad_packed: jnp.ndarray  # (Q, 12)
    box_packed: jnp.ndarray  # (B, 12)
    # Cluster-culling copies (BVH-leaf order + per-cluster AABBs; the
    # TPU-native 2-level BVH, ops/pallas_kernels.py)
    sph_cl_packed: jnp.ndarray  # (S_pad, 9) [cx cy cz vx vy vz r mat r2]
    sph_cl_box: jnp.ndarray  # (Cs, 8) [min(3) max(3) 0 0]
    box_cl_packed: jnp.ndarray  # (B_pad, 12)
    box_cl_box: jnp.ndarray  # (Cb, 8)
    # ---- row-packed lookup tables (one fetch per bounce; see ops/gather) ----
    mat_packed: jnp.ndarray  # (M, 8)  [type tex fuzz ref_idx r g b mat?]
    tex_packed: jnp.ndarray  # (T, 18) [type p0..p7 child0 child1 img rgb(3) rgb2(3)]
    quad_attr_packed: jnp.ndarray  # (Q, 16) [q(3) u(3) v(3) w(3) n(3) mat]
    # MXU-formulation sphere tables (ops/pallas_kernels.sphere_mxu_features)
    sph_mxu_feat: jnp.ndarray  # (2*S_pad, 16) bilinear quadratic features
    sph_mxu_attr: jnp.ndarray  # (8, S_pad) transposed packed table
    # Tail-only MXU tables, RECENTERED on the tail centroid so the
    # bilinear form's |c|^2-scale cancellation stays below t_min even in
    # scenes whose absolute coordinates fail the whole-table gate
    # (final/original's cluster sits ~500 from the origin but spans
    # ~165).  Experiment path ART_TPU_MXU_TAIL (ops/compact_sphere.py).
    sph_mxu_tail_feat: jnp.ndarray  # (2*T_pad, 16)
    sph_mxu_tail_attr: jnp.ndarray  # (8, T_pad)
    # Grid-box height/material table (Kx, Kz, 2) [y1, mat] — detect_box_grid
    box_grid: jnp.ndarray
    # Flattened escape-link sphere BVH (ops/bvh.pack_bvh rows
    # [min(3) max(3) escape prim]) for the opt-in per-ray descent path
    # (ART_TPU_BVH=1, ops/intersect.bvh_sphere_candidates_p) — the direct
    # analog of the reference's bvh_node::hit (src/bvh.cuh:95-106).
    sph_bvh: jnp.ndarray  # (Mn, 8)

    # ---- static metadata (specializes the compiled trace per scene) ----
    n_spheres: int = _static()
    n_quads: int = _static()
    n_boxes: int = _static()
    n_media: int = _static()
    n_sphere_clusters: int = _static()
    n_box_clusters: int = _static()
    n_sph_bvh_nodes: int = _static()  # 0 = no sphere BVH built
    med_kinds: tuple = _static()  # per-medium boundary kind: 0=sphere, 1=box, 2=general
    # Per-primitive owning-medium ids of the kind-2 boundary tables (static
    # so the trace only visits each medium's own subset).
    gb_sph_meds: tuple = _static()
    gb_quad_meds: tuple = _static()
    gb_box_meds: tuple = _static()
    has_moving: bool = _static()
    has_rotated_boxes: bool = _static()
    tex_types_present: tuple = _static()  # sorted tuple of TexType ints present
    # Padded sphere count of the MXU intersection path; 0 disables it
    # (scene coordinate scale too large for the expanded quadratic — see
    # sphere_mxu_features precision note).
    mxu_sphere_pad: int = _static()
    # Padded tail count of the recentered tail MXU path; 0 disables.
    mxu_tail_pad: int = _static()
    sph_tail_centroid: tuple = _static()
    # Moving/static segmentation of sph_packed (pack_spheres): padded
    # moving-block size and real static count for the split kernel loops.
    sph_n_moving_pad: int = _static()
    sph_n_static: int = _static()
    # Constant-attribute static tail (pack_spheres): the largest
    # (radius, material)-uniform static group (>= 192 rows) sorted to the
    # end of the static segment; the kernel's tail loop drops its radius/
    # material loads + selects (final_scene's 1000-ball cluster).
    sph_n_tail: int = _static()
    sph_tail_r: float = _static()
    sph_tail_mat: float = _static()
    # Conservative AABB (x0, y0, z0, x1, y1, z1) of every tail sphere
    # (pack_tail_spheres); () when no tail.  Compile-time floats for the
    # compacted tail pass's slab predicate.
    sph_tail_box: tuple = _static()
    # True when every sphere radius in the scene is positive (no hollow
    # glass): the kernel drops the signed-radius carry and normalizes the
    # winner normal with one rsqrt instead.
    sph_pos_r: bool = _static()
    # Expanded-quadratic static sphere loop (pack_spheres col 9): enabled
    # when the worst-case cancellation error (|c|^2+1)*6*2^-23 stays below
    # 1% of r^2 for every static sphere (builder gate).
    sph_expand: bool = _static()
    # Regular-grid box field (builder.detect_box_grid): when every box in
    # the scene is an unrotated AABB on one (Kx, Kz) footprint grid with a
    # shared floor, the shared-slab grid kernel replaces the brute scan.
    # box_grid_kx == 0 disables.  (x0, z0, w, y0) are compile-time floats.
    box_grid_kx: int = _static()
    box_grid_kz: int = _static()
    box_grid_x0: float = _static()
    box_grid_z0: float = _static()
    box_grid_w: float = _static()
    box_grid_y0: float = _static()
    # Shared material id when EVERY grid box uses one material (the
    # reference ground field, src/main.cu:509-514): the grid kernel drops
    # the per-cell material load + select.  -1.0 = mixed materials.
    box_grid_mat: float = _static()
    # Compile-time cell table for the fully-static grid kernel
    # (pallas_kernels._box_grid_static_kernel): ((height, mat,
    # ((ix, iz), ...)), ...) grouped by (height, mat) so the y-slab is
    # computed once per distinct height.  None = use the looped kernel
    # (grid too large to unroll).
    box_grid_cells: tuple | None = _static()
    # Compile-time bin metadata for the needy-skip sphere kernel
    # (pallas_kernels._sphere_skip_kernel): (n_moving_rows, n_main_rows,
    # ((row0, row1, box6), ...)) per pack_skip_spheres.  None = scene has
    # no qualifying tail cluster.
    sph_skip_bins: tuple | None = _static()
    # Compile-time cell metadata for the cell-binned sphere kernel
    # (pallas_kernels._sphere_cellbin_kernel): (head_m_rows, head_s_rows,
    # ((m0, m1, s0, s1, box6), ...), union_box6) per
    # pack_cellbin_spheres.  None = too few binnable spheres.
    sph_cellbin_meta: tuple | None = _static()
    # Compile-time sphere table for the fully-static sphere kernel
    # (pallas_kernels._sphere_static_kernel): (moving, main, tail) per
    # static_sphere_cells.  None = scene too large to unroll (> 2048
    # spheres).  Opt-in via ART_TPU_SPH_STATIC (pending TPU A/B).
    sph_static_cells: tuple | None = _static()
    # Compile-time scene constants for the short-path megakernel
    # (ops/sp_kernel.py): (spheres, quads, mats) nested tuple, see that
    # module's docstring.  None = scene fails the SP gate (boxes, media,
    # moving spheres, > 16 prims, or non-solid/checker textures).
    sp_consts: tuple | None = _static()
    # Baked material/texture constants for the generic fused shade
    # kernel (scene/builder._shade_consts): (mats, specials) or None
    # (> 24 materials or an unresolvable texture tree).
    shade_consts: tuple | None = _static()


def _z(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def empty_tables() -> dict:
    """One-row dummy segments; static counts of 0 gate them out of the trace."""
    return dict(
        sph_center=_z((1, 3)),
        sph_vel=_z((1, 3)),
        sph_radius=jnp.ones((1,), jnp.float32),
        sph_mat=_z((1,), jnp.int32),
        quad_q=_z((1, 3)),
        quad_u=jnp.asarray([[1.0, 0, 0]], jnp.float32),
        quad_v=jnp.asarray([[0, 1.0, 0]], jnp.float32),
        quad_w=jnp.asarray([[0, 0, 1.0]], jnp.float32),
        quad_n=jnp.asarray([[0, 0, 1.0]], jnp.float32),
        quad_d=_z((1,)),
        quad_mat=_z((1,), jnp.int32),
        quad_avec=jnp.asarray([[1.0, 0, 0]], jnp.float32),
        quad_bvec=jnp.asarray([[0, 1.0, 0]], jnp.float32),
        quad_ca=_z((1,)),
        quad_cb=_z((1,)),
        box_min=_z((1, 3)),
        box_max=jnp.ones((1, 3), jnp.float32),
        box_cos=jnp.ones((1,), jnp.float32),
        box_sin=_z((1,)),
        box_off=_z((1, 3)),
        box_mat=_z((1,), jnp.int32),
        med_kind=_z((1,), jnp.int32),
        med_center=_z((1, 3)),
        med_radius=jnp.ones((1,), jnp.float32),
        med_min=_z((1, 3)),
        med_max=jnp.ones((1, 3), jnp.float32),
        med_cos=jnp.ones((1,), jnp.float32),
        med_sin=_z((1,)),
        med_off=_z((1, 3)),
        med_neg_inv_density=-jnp.ones((1,), jnp.float32),
        med_mat=_z((1,), jnp.int32),
        gb_sph=_z((1, 7)),
        gb_quad=_z((1, 16)),
        gb_box=_z((1, 11)),
        mat_type=_z((1,), jnp.int32),
        mat_tex=_z((1,), jnp.int32),
        mat_rgb=jnp.ones((1, 3), jnp.float32),
        mat_fuzz=_z((1,)),
        mat_ref_idx=jnp.ones((1,), jnp.float32),
        tex_type=_z((1,), jnp.int32),
        tex_rgb=jnp.ones((1, 3), jnp.float32),
        tex_rgb2=_z((1, 3)),
        tex_params=_z((1, 8)),
        tex_child=_z((1, 2), jnp.int32),
        tex_img=_z((1,), jnp.int32),
        atlas=ImageAtlas.empty(),
        sph_packed=_z((1, 10)),
        sph_tail_packed=_z((1, 10)),
        sph_skip_packed=_z((1, 10)),
        sph_cellbin_packed=_z((1, 10)),
        quad_packed=_z((1, 12)),
        box_packed=_z((1, 12)),
        sph_cl_packed=_z((1, 9)),
        sph_cl_box=_z((1, 8)),
        box_cl_packed=_z((1, 12)),
        box_cl_box=_z((1, 8)),
        mat_packed=_z((1, 8)),
        tex_packed=_z((1, 18)),
        quad_attr_packed=_z((1, 16)),
        sph_mxu_feat=_z((2, 16)),
        sph_mxu_attr=_z((8, 1)),
        sph_mxu_tail_feat=_z((2, 16)),
        sph_mxu_tail_attr=_z((8, 1)),
        box_grid=_z((1, 1, 2)),
        sph_bvh=_z((1, 8)),
        n_spheres=0,
        n_quads=0,
        n_boxes=0,
        n_media=0,
        n_sphere_clusters=0,
        n_box_clusters=0,
        n_sph_bvh_nodes=0,
        med_kinds=(),
        gb_sph_meds=(),
        gb_quad_meds=(),
        gb_box_meds=(),
        has_moving=False,
        has_rotated_boxes=False,
        tex_types_present=(),
        mxu_sphere_pad=0,
        mxu_tail_pad=0,
        sph_tail_centroid=(),
        sph_n_moving_pad=0,
        sph_n_static=0,
        sph_n_tail=0,
        sph_tail_r=1.0,
        sph_tail_mat=0.0,
        sph_tail_box=(),
        sph_pos_r=False,
        sph_expand=False,
        box_grid_kx=0,
        box_grid_kz=0,
        box_grid_x0=0.0,
        box_grid_z0=0.0,
        box_grid_w=1.0,
        box_grid_y0=0.0,
        box_grid_mat=-1.0,
        box_grid_cells=None,
        sph_skip_bins=None,
        sph_cellbin_meta=None,
        sph_static_cells=None,
        sp_consts=None,
        shade_consts=None,
    )
