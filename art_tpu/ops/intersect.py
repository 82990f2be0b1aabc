"""Type-segmented batched intersection — the hot path of the tracer.

TPU-native inversion of the reference's virtual ``hit()`` dispatch through a
recursive BVH (reference src/bvh.cuh:95-106): each primitive type is
intersected for the *whole wavefront at once* as dense (R, N) math, the
heavy ray x primitive contractions are expressed as (R,3)@(3,N) matmuls so
XLA maps them onto the MXU, and the closest hit is a masked min-reduction.
Per-type winners are then re-evaluated on gathered per-ray parameters to
reconstruct hit attributes without materializing (R, N, 3) intermediates.

Participating media (reference src/constant_medium.cuh:36-64) are resolved
after the surface pass: each medium's convex boundary yields an analytic
[entry, exit] interval — equivalent to the reference's two boundary
traversals — followed by masked exponential free-flight sampling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from art_tpu.core.vecmath import (
    BIG,
    cross,
    dot,
    ray_at,
    rotate_y,
    rotate_y_inv,
)
from art_tpu.scene.tables import SceneTables

_PARALLEL_EPS = 1e-8  # quad parallel-plane epsilon (src/quad.cuh:64)
_DIR_EPS = 1e-12  # slab-test division guard


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    """SoA hit record over the ray batch (reference src/hittable.cuh:13-21)."""

    hit: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,)
    p: jnp.ndarray  # (R,3)
    normal: jnp.ndarray  # (R,3) shading normal
    u: jnp.ndarray  # (R,)
    v: jnp.ndarray  # (R,)
    mat: jnp.ndarray  # (R,) int32


def _safe_dir(d: jnp.ndarray) -> jnp.ndarray:
    """Clamp direction components away from zero for slab division.

    Equivalent to the reference quad parallel-miss (src/quad.cuh:64): an
    exactly-parallel ray cannot enter/exit through that slab axis.
    """
    mag = jnp.abs(d)
    sign = jnp.where(d >= 0.0, 1.0, -1.0)
    return jnp.where(mag < _DIR_EPS, sign * _DIR_EPS, d)


# --------------------------------------------------------------------------
# Spheres
# --------------------------------------------------------------------------

def sphere_candidates(tables: SceneTables, o, d, time, t_min):
    """Best sphere hit per ray: (t_best (R,), idx (R,)).

    Half-b quadratic with the center evaluated at the ray's shutter time
    (reference src/sphere.cuh:51-89).  The oc-dot products are expanded so
    the ray x sphere contraction is two (R,3)@(3,S) matmuls:
        oc.d  = o.d - c(t).d,   oc.oc = |o|^2 - 2 o.c(t) + |c(t)|^2
    with c(t) = c0 + t*vel.
    """
    c0 = tables.sph_center  # (S,3)
    r = tables.sph_radius  # (S,)
    a = dot(d, d)  # (R,)
    od = dot(o, d)  # (R,)
    oo = dot(o, o)  # (R,)

    d_c0 = d @ c0.T  # (R,S)
    o_c0 = o @ c0.T  # (R,S)
    c0_sq = jnp.sum(c0 * c0, axis=-1)  # (S,)

    if tables.has_moving:
        vel = tables.sph_vel
        d_vel = d @ vel.T
        o_vel = o @ vel.T
        c0_vel = jnp.sum(c0 * vel, axis=-1)
        vel_sq = jnp.sum(vel * vel, axis=-1)
        tcol = time[:, None]
        cd = d_c0 + tcol * d_vel  # c(t) . d
        co = o_c0 + tcol * o_vel  # o . c(t)
        c_sq = c0_sq[None, :] + 2.0 * tcol * c0_vel[None, :] + (tcol * tcol) * vel_sq[None, :]
    else:
        cd = d_c0
        co = o_c0
        c_sq = c0_sq[None, :]

    b = od[:, None] - cd  # oc.d (half-b)
    csq = oo[:, None] - 2.0 * co + c_sq - (r * r)[None, :]
    disc = b * b - a[:, None] * csq
    s = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = (1.0 / a)[:, None]
    t1 = (-b - s) * inv_a
    t2 = (-b + s) * inv_a
    valid = disc > 0.0  # strict, as in the reference (src/sphere.cuh:61)
    t1ok = valid & (t1 > t_min)
    t2ok = valid & (t2 > t_min)
    t = jnp.where(t1ok, t1, jnp.where(t2ok, t2, BIG))
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_best = jnp.min(t, axis=1)
    return t_best, idx


def sphere_attributes(tables: SceneTables, o, d, time, t, idx, needs_uv: bool = True):
    """Reconstruct normal/uv for the winning sphere (src/sphere.cuh:69-86).

    ``needs_uv`` is static; scenes with no UV-dependent textures skip the
    arccos/atan2 transcendentals entirely.
    """
    c0 = tables.sph_center[idx]
    r = tables.sph_radius[idx]
    if tables.has_moving:
        c = c0 + time[:, None] * tables.sph_vel[idx]
    else:
        c = c0
    p = ray_at(o, d, t)
    normal = (p - c) / r[:, None]  # signed radius flips hollow-shell normals
    if needs_uv:
        # spherical uv from the (signed) normal (src/sphere.cuh:42-49)
        theta = jnp.arccos(jnp.clip(-normal[:, 1], -1.0, 1.0))
        phi = jnp.arctan2(-normal[:, 2], normal[:, 0]) + jnp.pi
        u = phi / (2.0 * jnp.pi)
        v = theta / jnp.pi
    else:
        u = v = jnp.zeros_like(t)
    return p, normal, u, v, tables.sph_mat[idx]


# --------------------------------------------------------------------------
# Quads
# --------------------------------------------------------------------------

def quad_candidates(tables: SceneTables, o, d, t_min):
    """Best quad hit per ray (plane hit + interior test, src/quad.cuh:60-90)."""
    n = tables.quad_n  # (Q,3)
    nd = d @ n.T  # (R,Q)
    no = o @ n.T
    t = (tables.quad_d[None, :] - no) / nd
    oa = o @ tables.quad_avec.T
    da = d @ tables.quad_avec.T
    ob = o @ tables.quad_bvec.T
    db = d @ tables.quad_bvec.T
    alpha = oa + t * da - tables.quad_ca[None, :]
    beta = ob + t * db - tables.quad_cb[None, :]
    valid = (
        (jnp.abs(nd) >= _PARALLEL_EPS)
        & (t > t_min)
        & (alpha >= 0.0)
        & (alpha <= 1.0)
        & (beta >= 0.0)
        & (beta <= 1.0)
    )
    t = jnp.where(valid, t, BIG)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_best = jnp.min(t, axis=1)
    return t_best, idx


def quad_attributes(tables: SceneTables, o, d, t, idx):
    """Reconstruct (alpha, beta) + ray-facing normal for the winning quad."""
    q = tables.quad_q[idx]
    uvec = tables.quad_u[idx]
    vvec = tables.quad_v[idx]
    w = tables.quad_w[idx]
    n = tables.quad_n[idx]
    p = ray_at(o, d, t)
    pl = p - q
    alpha = dot(w, cross(pl, vvec))
    beta = dot(w, cross(uvec, pl))
    # shading normal faces against the ray (src/quad.cuh:84-86)
    flip = dot(n, d) > 0.0
    normal = jnp.where(flip[:, None], -n, n)
    return p, normal, alpha, beta, tables.quad_mat[idx]


# --------------------------------------------------------------------------
# Oriented boxes (slab test; replaces compound6's six quad tests)
# --------------------------------------------------------------------------

def _box_ray_to_object(tables, o, d):
    """Per-box object-space ray components as (R,B) outer-broadcast arrays."""
    off = tables.box_off  # (B,3)
    ox = o[:, 0:1] - off[None, :, 0]  # (R,B)
    oy = o[:, 1:2] - off[None, :, 1]
    oz = o[:, 2:3] - off[None, :, 2]
    dx = jnp.broadcast_to(d[:, 0:1], ox.shape)
    dy = jnp.broadcast_to(d[:, 1:2], ox.shape)
    dz = jnp.broadcast_to(d[:, 2:3], ox.shape)
    if tables.has_rotated_boxes:
        # local = R(-theta) * world (src/hittable.cuh:118-127)
        cos_t = tables.box_cos[None, :]
        sin_t = tables.box_sin[None, :]
        ox, oz = cos_t * ox - sin_t * oz, sin_t * ox + cos_t * oz
        dx, dz = cos_t * dx - sin_t * dz, sin_t * dx + cos_t * dz
    return ox, oy, oz, dx, dy, dz


def _slab_interval(bmin, bmax, ox, oy, oz, dx, dy, dz):
    """(t_entry, t_exit) per (ray, box); entry > exit means miss (src/aabb.cuh:45-61)."""
    t_entry = jnp.full_like(ox, -BIG)
    t_exit = jnp.full_like(ox, BIG)
    for axis, (oc, dc) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
        inv = 1.0 / _safe_dir(dc)
        ta = (bmin[None, :, axis] - oc) * inv
        tb = (bmax[None, :, axis] - oc) * inv
        t0 = jnp.minimum(ta, tb)
        t1 = jnp.maximum(ta, tb)
        t_entry = jnp.maximum(t_entry, t0)
        t_exit = jnp.minimum(t_exit, t1)
    return t_entry, t_exit


def box_candidates(tables: SceneTables, o, d, t_min):
    """Best box hit per ray.

    Equivalent to compound6's closest-hit over 6 faces (src/quad.cuh:124-139):
    the candidate ts of a convex box are exactly {entry, exit}, so pick entry
    if it is past t_min, else exit.
    """
    ox, oy, oz, dx, dy, dz = _box_ray_to_object(tables, o, d)
    t_entry, t_exit = _slab_interval(tables.box_min, tables.box_max, ox, oy, oz, dx, dy, dz)
    through = t_entry < t_exit
    entry_ok = through & (t_entry > t_min)
    exit_ok = through & (t_exit > t_min)
    t = jnp.where(entry_ok, t_entry, jnp.where(exit_ok, t_exit, BIG))
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_best = jnp.min(t, axis=1)
    return t_best, idx


def box_attributes(tables: SceneTables, o, d, t, idx):
    """Face normal + the reference's per-face UV (make_box faces, src/quad.cuh:145-162)."""
    bmin = tables.box_min[idx]  # (R,3)
    bmax = tables.box_max[idx]
    cos_t = tables.box_cos[idx]
    sin_t = tables.box_sin[idx]
    off = tables.box_off[idx]

    o_obj = rotate_y_inv(o - off, cos_t, sin_t)
    d_obj = rotate_y_inv(d, cos_t, sin_t)

    # Re-run the per-axis slab to identify entry/exit face.
    inv = 1.0 / _safe_dir(d_obj)
    ta = (bmin - o_obj) * inv
    tb = (bmax - o_obj) * inv
    t0 = jnp.minimum(ta, tb)  # (R,3)
    t1 = jnp.maximum(ta, tb)
    t_entry = jnp.max(t0, axis=-1)
    axis_entry = jnp.argmax(t0, axis=-1)
    axis_exit = jnp.argmin(t1, axis=-1)
    # t equals either t_entry or t_exit; classify by distance.
    is_entry = jnp.abs(t - t_entry) <= jnp.abs(t - jnp.min(t1, axis=-1))
    axis = jnp.where(is_entry, axis_entry, axis_exit)

    d_axis = jnp.take_along_axis(d_obj, axis[:, None], axis=-1)[:, 0]
    sgn = jnp.where(d_axis >= 0.0, 1.0, -1.0)
    # Shading normal always faces against the ray; outward face normal is
    # -sgn (entry) or +sgn (exit).
    n_obj = -sgn
    outward_sgn = jnp.where(is_entry, -sgn, sgn)

    normal_obj = (
        jnp.zeros((t.shape[0], 3), jnp.float32)
        .at[jnp.arange(t.shape[0]), axis]
        .set(n_obj)
    )
    normal = rotate_y(normal_obj, cos_t, sin_t)

    p_obj = o_obj + t[:, None] * d_obj
    x, y, z = p_obj[:, 0], p_obj[:, 1], p_obj[:, 2]
    wx = bmax[:, 0] - bmin[:, 0]
    wy = bmax[:, 1] - bmin[:, 1]
    wz = bmax[:, 2] - bmin[:, 2]
    pos_face = outward_sgn > 0.0

    # Face UV per make_box parameterization (src/quad.cuh:154-159).
    ax = axis == 0
    ay = axis == 1
    ua = jnp.where(
        ax,
        jnp.where(pos_face, (bmax[:, 2] - z) / wz, (z - bmin[:, 2]) / wz),
        jnp.where(
            ay,
            (x - bmin[:, 0]) / wx,
            jnp.where(pos_face, (x - bmin[:, 0]) / wx, (bmax[:, 0] - x) / wx),
        ),
    )
    va = jnp.where(
        ax,
        (y - bmin[:, 1]) / wy,
        jnp.where(
            ay,
            jnp.where(pos_face, (bmax[:, 2] - z) / wz, (z - bmin[:, 2]) / wz),
            (y - bmin[:, 1]) / wy,
        ),
    )

    p = ray_at(o, d, t)
    return p, normal, ua, va, tables.box_mat[idx]


# --------------------------------------------------------------------------
# Closest surface hit across all segments
# --------------------------------------------------------------------------

def _use_pallas(R: int) -> bool:
    """Use the fused Pallas intersection kernels on TPU backends.

    The jnp path stays as the portable reference implementation (CPU tests);
    it is also the fallback when the ray count doesn't tile the kernel grid.
    """
    import os

    if os.environ.get("ART_TPU_NO_PALLAS"):
        return False
    from art_tpu.ops.pallas_kernels import RAY_BLOCK

    return jax.default_backend() == "tpu" and R % RAY_BLOCK == 0


def closest_surface(tables: SceneTables, o, d, time, t_min) -> HitRecord:
    R = o.shape[0]
    # UV coordinates only feed image/uv_offset textures; skip the
    # transcendentals when the scene has none (static specialization).
    needs_uv = bool({2, 6} & set(tables.tex_types_present))
    t_best = jnp.full((R,), BIG, jnp.float32)
    winner = jnp.full((R,), -1, jnp.int32)  # 0=sphere 1=quad 2=box
    idx_s = idx_q = idx_b = jnp.zeros((R,), jnp.int32)

    use_pallas = _use_pallas(R)
    if use_pallas:
        from art_tpu.ops import pallas_kernels as pk

    if tables.n_spheres:
        if use_pallas:
            t_s, idx_s = pk.sphere_closest_hit_pallas(
                tables.sph_packed, o, d, time,
                n_spheres=tables.n_spheres, moving=tables.has_moving,
            )
            idx_s = jnp.maximum(idx_s, 0)
        else:
            t_s, idx_s = sphere_candidates(tables, o, d, time, t_min)
        better = t_s < t_best
        t_best = jnp.where(better, t_s, t_best)
        winner = jnp.where(better, 0, winner)
    if tables.n_quads:
        if use_pallas:
            t_q, idx_q = pk.quad_closest_hit_pallas(
                tables.quad_packed, o, d, n_quads=tables.n_quads
            )
            idx_q = jnp.maximum(idx_q, 0)
        else:
            t_q, idx_q = quad_candidates(tables, o, d, t_min)
        better = t_q < t_best
        t_best = jnp.where(better, t_q, t_best)
        winner = jnp.where(better, 1, winner)
    if tables.n_boxes:
        if use_pallas:
            t_b, idx_b = pk.box_closest_hit_pallas(
                tables.box_packed, o, d,
                n_boxes=tables.n_boxes, rotated=tables.has_rotated_boxes,
            )
            idx_b = jnp.maximum(idx_b, 0)
        else:
            t_b, idx_b = box_candidates(tables, o, d, t_min)
        better = t_b < t_best
        t_best = jnp.where(better, t_b, t_best)
        winner = jnp.where(better, 2, winner)

    hit = winner >= 0
    p = jnp.zeros((R, 3), jnp.float32)
    normal = jnp.zeros((R, 3), jnp.float32).at[:, 0].set(1.0)
    uu = jnp.zeros((R,), jnp.float32)
    vv = jnp.zeros((R,), jnp.float32)
    mat = jnp.zeros((R,), jnp.int32)

    def blend(sel, attrs):
        nonlocal p, normal, uu, vv, mat
        p_i, n_i, u_i, v_i, m_i = attrs
        sel3 = sel[:, None]
        p = jnp.where(sel3, p_i, p)
        normal = jnp.where(sel3, n_i, normal)
        uu = jnp.where(sel, u_i, uu)
        vv = jnp.where(sel, v_i, vv)
        mat = jnp.where(sel, m_i, mat)

    if tables.n_spheres:
        blend(
            winner == 0,
            sphere_attributes(tables, o, d, time, t_best, idx_s, needs_uv),
        )
    if tables.n_quads:
        blend(winner == 1, quad_attributes(tables, o, d, t_best, idx_q))
    if tables.n_boxes:
        blend(winner == 2, box_attributes(tables, o, d, t_best, idx_b))

    return HitRecord(hit=hit, t=t_best, p=p, normal=normal, u=uu, v=vv, mat=mat)


# --------------------------------------------------------------------------
# Constant media (exponential free-flight in convex boundaries)
# --------------------------------------------------------------------------

def apply_media(
    tables: SceneTables, o, d, t_min, surf: HitRecord, u_media: jnp.ndarray
) -> HitRecord:
    """Overlay medium scatter events on the surface hit record.

    Statistically equivalent to the reference's in-traversal medium sampling
    (src/constant_medium.cuh:36-64): for each medium, the boundary interval
    over (-inf, inf) is clipped to [t_min, t_surface], an exponential
    free-flight distance is drawn, and the closest accepted scatter wins.

    ``u_media`` is a (R, >=n_media) block of U[0,1) samples, one column per
    medium.
    """
    if not tables.n_media:
        return surf

    R = o.shape[0]
    ray_len = jnp.sqrt(dot(d, d))
    len_ok = (ray_len > 0.0) & jnp.isfinite(ray_len)

    best_t = surf.t
    best_med = jnp.full((R,), -1, jnp.int32)

    for m in range(tables.n_media):
        kind = tables.med_kinds[m]  # static per scene build
        if kind == 0:
            c = tables.med_center[m]
            r = tables.med_radius[m]
            oc = o - c[None, :]
            a = dot(d, d)
            b = dot(oc, d)
            csq = dot(oc, oc) - r * r
            disc = b * b - a * csq
            s = jnp.sqrt(jnp.maximum(disc, 0.0))
            entry = (-b - s) / a
            exit_ = (-b + s) / a
            bnd_ok = disc > 0.0
        else:
            cos_t = tables.med_cos[m]
            sin_t = tables.med_sin[m]
            off = tables.med_off[m]
            o_obj = rotate_y_inv(o - off[None, :], cos_t, sin_t)
            d_obj = rotate_y_inv(d, cos_t, sin_t)
            inv = 1.0 / _safe_dir(d_obj)
            ta = (tables.med_min[m][None, :] - o_obj) * inv
            tb = (tables.med_max[m][None, :] - o_obj) * inv
            t0 = jnp.minimum(ta, tb)
            t1 = jnp.maximum(ta, tb)
            entry = jnp.max(t0, axis=-1)
            exit_ = jnp.min(t1, axis=-1)
            bnd_ok = entry < exit_

        # second boundary hit must be separated by 1e-4 (src/constant_medium.cuh:40)
        bnd_ok = bnd_ok & ((exit_ - entry) > 1e-4)
        rec1 = jnp.maximum(entry, t_min)
        rec2 = jnp.minimum(exit_, best_t)
        ok = bnd_ok & (rec1 < rec2) & len_ok
        distance_inside = (rec2 - rec1) * ray_len

        u01 = jnp.maximum(1e-6, u_media[:, m])
        hit_distance = tables.med_neg_inv_density[m] * jnp.log(u01)
        scatter = ok & (hit_distance <= distance_inside)
        t_m = rec1 + hit_distance / ray_len

        accept = scatter & (t_m < best_t)
        best_t = jnp.where(accept, t_m, best_t)
        best_med = jnp.where(accept, m, best_med)

    in_medium = best_med >= 0
    p = jnp.where(in_medium[:, None], ray_at(o, d, best_t), surf.p)
    arb_normal = jnp.zeros((R, 3), jnp.float32).at[:, 0].set(1.0)
    normal = jnp.where(in_medium[:, None], arb_normal, surf.normal)
    mat = jnp.where(in_medium, tables.med_mat[jnp.maximum(best_med, 0)], surf.mat)
    return HitRecord(
        hit=surf.hit | in_medium,
        t=best_t,
        p=p,
        normal=normal,
        u=jnp.where(in_medium, 0.0, surf.u),
        v=jnp.where(in_medium, 0.0, surf.v),
        mat=mat,
    )
