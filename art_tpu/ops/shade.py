"""Masked material shading — emission + scatter for the whole wavefront.

Replaces the reference's virtual ``material::scatter/emitted`` dispatch
(reference src/material.cuh:46-201) with type-tag masking: every material
family present is evaluated for the full ray batch and blended by mask.
Random draws come from counter-based keys (see art_tpu.core.rng), with the
rejection loops replaced by equal-distribution analytic samplers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from art_tpu.core import rng as artrng
from art_tpu.core.vecmath import dot, length, reflect, refract, schlick, unit_vector
from art_tpu.ops.intersect import HitRecord
from art_tpu.ops.texture_eval import eval_texture
from art_tpu.scene.tables import MatType, SceneTables


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScatterResult:
    emitted: jnp.ndarray  # (R,3) emission at the hit
    attenuation: jnp.ndarray  # (R,3)
    direction: jnp.ndarray  # (R,3) new ray direction (unnormalized, as in reference)
    scattered: jnp.ndarray  # (R,) bool — False = absorbed (light / fuzzy-metal graze)


def shade(
    tables: SceneTables,
    d: jnp.ndarray,  # (R,3) incoming ray direction
    rec: HitRecord,
    u_ball: jnp.ndarray,  # (R,3) uniforms for the ball sample
    u_choice: jnp.ndarray,  # (R,) uniform for the reflect/refract choice
) -> ScatterResult:
    mtype = tables.mat_type[rec.mat]
    tex_id = tables.mat_tex[rec.mat]
    n = rec.normal

    # One texture evaluation serves lambertian/isotropic attenuation and
    # diffuse_light emission (all are texture-backed rows).
    tex_val = eval_texture(tables, tex_id, rec.u, rec.v, rec.p)

    is_lambert = mtype == MatType.LAMBERTIAN
    is_metal = mtype == MatType.METAL
    is_dielectric = mtype == MatType.DIELECTRIC
    is_light = mtype == MatType.DIFFUSE_LIGHT
    is_isotropic = mtype == MatType.ISOTROPIC

    # ---- emission (src/material.cuh:169-172): lights only ----
    emitted = jnp.where(is_light[:, None], tex_val, 0.0)

    # ---- shared samples ----
    ball = artrng.ball_from_uniforms(u_ball)
    choice = u_choice

    # ---- lambertian (src/material.cuh:75-87): dir = n + ball ----
    lambert_dir = n + ball

    # ---- metal (src/material.cuh:90-110) ----
    fuzz = tables.mat_fuzz[rec.mat]
    metal_refl = reflect(unit_vector(d), n)
    metal_dir = metal_refl + fuzz[:, None] * ball
    metal_alive = dot(metal_dir, n) > 0.0

    # ---- dielectric (src/material.cuh:113-159), book-1 form ----
    ref_idx = tables.mat_ref_idx[rec.mat]
    d_dot_n = dot(d, n)
    inside = d_dot_n > 0.0
    outward_n = jnp.where(inside[:, None], -n, n)
    ni_over_nt = jnp.where(inside, ref_idx, 1.0 / ref_idx)
    dlen = length(d)
    cos_raw = d_dot_n / dlen
    cos_inside = jnp.sqrt(
        jnp.maximum(0.0, 1.0 - ref_idx * ref_idx * (1.0 - cos_raw * cos_raw))
    )
    cosine = jnp.where(inside, cos_inside, -cos_raw)
    can_refract, refracted = refract(d, outward_n, ni_over_nt)
    reflect_prob = jnp.where(can_refract, schlick(cosine, ref_idx), 1.0)
    diel_reflect = choice < reflect_prob
    diel_dir = jnp.where(diel_reflect[:, None], reflect(d, n), refracted)

    # ---- isotropic (src/material.cuh:185-201): dir = ball ----

    # ---- blend by material tag ----
    direction = lambert_dir
    direction = jnp.where(is_metal[:, None], metal_dir, direction)
    direction = jnp.where(is_dielectric[:, None], diel_dir, direction)
    direction = jnp.where(is_isotropic[:, None], ball, direction)

    attenuation = tex_val  # lambertian / isotropic
    attenuation = jnp.where(is_metal[:, None], tables.mat_rgb[rec.mat], attenuation)
    attenuation = jnp.where(is_dielectric[:, None], 1.0, attenuation)

    scattered = ~is_light & (~is_metal | metal_alive)
    return ScatterResult(
        emitted=emitted,
        attenuation=attenuation,
        direction=direction,
        scattered=scattered,
    )
