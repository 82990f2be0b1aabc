"""Vectorized texture evaluation over hit batches.

Replaces the reference's virtual ``texture::value(u,v,p)`` dispatch
(reference src/texture.cuh:9-164) with a two-phase masked evaluation:

1. *Redirect phase* (static MAX_TEX_DEPTH iterations): wrapper textures
   resolve to a leaf id — ``checker`` picks its even/odd child from the 3-D
   lattice parity (src/texture.cuh:35-42), ``uv_offset`` rotates/clamps the
   UVs and forwards to its base (src/texture.cuh:151-164).
2. *Leaf phase*: each leaf type present in the scene (static metadata) is
   evaluated once for the whole batch and blended by type mask — solid,
   image (nearest texel, v-flip, src/texture.cuh:51-59), perlin marble
   (src/texture.cuh:67-71), noodle stripes (src/texture.cuh:94-100) and
   felt mottling (src/texture.cuh:122-141).

Absent leaf types compile to nothing, so e.g. the Cornell scenes never pay
for Perlin noise.
"""

from __future__ import annotations

import jax.numpy as jnp

from art_tpu.ops import perlin
from art_tpu.scene.tables import SceneTables, TexType

MAX_TEX_DEPTH = 3  # wrapper chains in the reference are depth <= 2
_TURB_MAX = 7  # noise_texture uses turb(p, 7) (src/texture.cuh:69)


def _smoothstep(edge0, edge1, x):
    """Cubic Hermite smoothstep (reference src/texture.cuh:78-82)."""
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def eval_texture(
    tables: SceneTables,
    tex_id: jnp.ndarray,  # (R,) int32
    u: jnp.ndarray,  # (R,)
    v: jnp.ndarray,  # (R,)
    p: jnp.ndarray,  # (R,3)
) -> jnp.ndarray:  # (R,3)
    present = set(tables.tex_types_present)
    tex_id = jnp.clip(tex_id, 0, tables.tex_type.shape[0] - 1)

    # ---- phase 1: resolve wrappers to leaves ----
    if TexType.CHECKER in present or TexType.UV_OFFSET in present:
        for _ in range(MAX_TEX_DEPTH):
            ttype = tables.tex_type[tex_id]
            if TexType.CHECKER in present:
                inv_scale = tables.tex_params[tex_id, 0]
                lat = jnp.floor(inv_scale[:, None] * p).astype(jnp.int32)
                is_even = ((lat[:, 0] + lat[:, 1] + lat[:, 2]) & 1) == 0
                child = jnp.where(
                    is_even, tables.tex_child[tex_id, 0], tables.tex_child[tex_id, 1]
                )
                is_checker = ttype == TexType.CHECKER
                tex_id = jnp.where(is_checker, child, tex_id)
            if TexType.UV_OFFSET in present:
                ttype = tables.tex_type[tex_id] if TexType.CHECKER in present else ttype
                du = tables.tex_params[tex_id, 0]
                dv = tables.tex_params[tex_id, 1]
                is_off = ttype == TexType.UV_OFFSET
                uu = u + du
                uu = uu - jnp.floor(uu)  # wrap to [0,1)
                vv = jnp.clip(v + dv, 0.0, 1.0)
                u = jnp.where(is_off, uu, u)
                v = jnp.where(is_off, vv, v)
                tex_id = jnp.where(is_off, tables.tex_child[tex_id, 0], tex_id)

    # ---- phase 2: leaf evaluation ----
    ttype = tables.tex_type[tex_id]
    out = tables.tex_rgb[tex_id]  # SOLID default (also felt base / fallthrough)

    if TexType.IMAGE in present:
        img_val = tables.atlas.sample(tables.tex_img[tex_id], u, v)
        out = jnp.where((ttype == TexType.IMAGE)[:, None], img_val, out)

    needs_turb = present & {TexType.NOISE, TexType.NOODLE, TexType.FELT}
    if needs_turb:
        if TexType.NOISE in present:
            # marble: 0.5*(1 + sin(scale*z + 10*turb(p,7)))  (src/texture.cuh:67-71)
            scale = tables.tex_params[tex_id, 0]
            tb = perlin.turb(p, _TURB_MAX)
            s = jnp.sin(scale * p[:, 2] + 10.0 * tb)
            t = 0.5 * (1.0 + s)
            out = jnp.where((ttype == TexType.NOISE)[:, None], t[:, None], out)

        if TexType.NOODLE in present:
            # warped stripes (src/texture.cuh:94-100); params = [k, A, f, oct, dx, dy, dz]
            prm = tables.tex_params[tex_id]
            k, amp, f = prm[:, 0], prm[:, 1], prm[:, 2]
            oct = prm[:, 3].astype(jnp.int32)
            d = prm[:, 4:7]
            un = jnp.sum(p * d, axis=-1)
            wig = perlin.turb(p * f[:, None], _TURB_MAX, depth_mask=oct)
            stripes = jnp.abs(jnp.sin(k * un + amp * wig))
            t = _smoothstep(0.75, 0.98, stripes)
            col = (1.0 - t)[:, None] * tables.tex_rgb2[tex_id] + t[:, None] * tables.tex_rgb[tex_id]
            out = jnp.where((ttype == TexType.NOODLE)[:, None], col, out)

        if TexType.FELT in present:
            # mottling + directional fibers (src/texture.cuh:122-141);
            # params = [m_scale, m_amt, f_scale, f_amt]
            prm = tables.tex_params[tex_id]
            m_scale, m_amt, f_scale, f_amt = prm[:, 0], prm[:, 1], prm[:, 2], prm[:, 3]
            m = perlin.noise(p * m_scale[:, None])
            phase = p[:, 0] * f_scale + 2.0 * perlin.turb(p * 0.5, 2)
            fibers = 0.5 * (1.0 + jnp.sin(phase))
            gain = 1.0 + m_amt * (m - 0.5) + f_amt * (fibers - 0.5)
            gain = jnp.clip(gain, 0.7, 1.2)
            col = tables.tex_rgb[tex_id] * gain[:, None]
            out = jnp.where((ttype == TexType.FELT)[:, None], col, out)

    return out
