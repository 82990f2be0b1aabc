"""Cell-binned sphere kernel (pallas_kernels._sphere_cellbin_kernel).

The lattice-pruned kernel must agree with the unsplit sphere kernel on
every lane: the union slab and the per-cell AABB slabs are conservative
(the occlusion bound t_near <= best_t can only drop cells strictly
behind the current closest hit), the cells partition the binned rows
exactly, and the candidate math per (ray, sphere) pair mirrors
_sphere_kernel — so disagreement means a pruned cell some ray could
hit.  Closest-t selection is order-independent for distinct candidates,
so interpret-mode t is bit-exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.models import build_scene
from art_tpu.ops import pallas_kernels as pk

R = pk.RAY_BLOCK


@pytest.fixture(scope="module")
def bouncing():
    return build_scene("bouncing_spheres", 64, 32).tables


def _rays(tables, seed, aim_frac):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    o = tuple(
        jax.random.uniform(k, (R,), jnp.float32, -30.0, 30.0)
        for k in jax.random.split(ks[0], 3)
    )
    d = tuple(
        jax.random.normal(k, (R,), jnp.float32)
        for k in jax.random.split(ks[1], 3)
    )
    x0, y0, z0, x1, y1, z1 = tables.sph_cellbin_meta[3]
    cx, cy, cz = (x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2
    aim = jax.random.uniform(ks[2], (R,)) < aim_frac
    jit = tuple(
        jax.random.uniform(k, (R,), jnp.float32, -0.4, 0.4)
        for k in jax.random.split(ks[3], 3)
    )
    d = (
        jnp.where(aim, cx + jit[0] * (x1 - x0) - o[0], d[0]),
        jnp.where(aim, cy + jit[1] * (y1 - y0) - o[1], d[1]),
        jnp.where(aim, cz + jit[2] * (z1 - z0) - o[2], d[2]),
    )
    tm = jax.random.uniform(ks[0], (R,), jnp.float32)
    return o, d, tm


def _planar(tables, o, d, tm, expand):
    return pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=True, expand=expand,
        n_tail=tables.sph_n_tail, tail_r=tables.sph_tail_r,
        tail_mat=tables.sph_tail_mat, pos_r=tables.sph_pos_r,
        interpret=True,
    )


def _cellbin(tables, o, d, tm, expand):
    return pk.sphere_cellbin_hit_attrs(
        tables.sph_cellbin_packed, o, d, tm,
        meta=tables.sph_cellbin_meta,
        pos_r=tables.sph_pos_r, expand=expand, needs_uv=True,
        interpret=True,
    )


@pytest.mark.parametrize(
    "aim_frac,expand", [(0.5, False), (1.0, False), (0.5, True)]
)
def test_cellbin_matches_planar(aim_frac, expand, bouncing):
    """All pruning regimes (none aimed / half / all): winner t, mat and
    attributes must match the dense kernel on every lane; one half-aimed
    case covers the expanded-quadratic candidate form."""
    o, d, tm = _rays(bouncing, seed=3, aim_frac=aim_frac)
    t0, n0, u0, v0, m0 = _planar(bouncing, o, d, tm, expand)
    t1, n1, u1, v1, m1 = _cellbin(bouncing, o, d, tm, expand)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
    hit = np.asarray(t0) < 1e29
    np.testing.assert_array_equal(np.asarray(m1)[hit], np.asarray(m0)[hit])
    for a, b in zip(n1, n0):
        np.testing.assert_allclose(
            np.asarray(a)[hit], np.asarray(b)[hit], atol=1e-6
        )
    np.testing.assert_allclose(np.asarray(u1)[hit], np.asarray(u0)[hit],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1)[hit], np.asarray(v0)[hit],
                               atol=1e-6)


def test_cells_partition_binned_rows(bouncing):
    """pack_cellbin_spheres invariants: head + cells cover every real
    sphere row exactly once, ranges are _CELLBIN_UNROLL-aligned, each
    cell box bounds its members' swept AABBs (center at t=0 and t=1,
    +- |r|), and pad rows are inert."""
    head_m, head_s, cells, union = bouncing.sph_cellbin_meta
    tab = np.asarray(bouncing.sph_cellbin_packed)
    U = pk._CELLBIN_UNROLL
    assert head_m % pk._SPH_UNROLL == 0
    assert head_s % pk._SPH_UNROLL == 0

    def live_rows(lo, hi):
        rows = tab[lo:hi]
        live = rows[:, 8] > 0.0
        assert (rows[~live, 8] == -1.0).all()
        assert (rows[~live, 9] == 1e30).all()
        return rows[live]

    seen = [live_rows(0, head_m), live_rows(head_m, head_m + head_s)]
    for m0, m1, s0, s1, box in cells:
        assert m0 % U == 0 and m1 % U == 0 and s0 % U == 0 and s1 % U == 0
        assert m1 > m0 or s1 > s0
        rows = np.concatenate([live_rows(m0, m1), live_rows(s0, s1)])
        # moving segment really moving, static really static
        assert (live_rows(m0, m1)[:, 3:6] != 0).any(axis=1).all()
        assert (live_rows(s0, s1)[:, 3:6] == 0).all()
        c0 = rows[:, 0:3]
        c1 = c0 + rows[:, 3:6]
        r = np.abs(rows[:, 6:7])
        lo = np.minimum(c0, c1) - r
        hi = np.maximum(c0, c1) + r
        x0, y0, z0, x1, y1, z1 = box
        assert (lo >= np.array([x0, y0, z0]) - 1e-5).all()
        assert (hi <= np.array([x1, y1, z1]) + 1e-5).all()
        seen.append(rows)
    got = np.concatenate(seen, axis=0)
    pk_np = np.asarray(bouncing.sph_packed)
    real = pk_np[pk_np[:, 8] > 0.0]
    assert len(got) == len(real)
    key = lambda a: np.lexsort(a.T[::-1])
    np.testing.assert_array_equal(got[key(got)], real[key(real)])


def test_cellbin_gates():
    """three_spheres is far below CELLBIN_MIN (no tables);
    bouncing_spheres gets the full cell lattice; final_scene (>= 512-row
    uniform tail) gets the tail-2D lattice with the moving+main head."""
    assert build_scene("bouncing_spheres", 64, 32).tables.sph_cellbin_meta \
        is not None
    assert build_scene("three_spheres", 64, 36).tables.sph_cellbin_meta is None
    fin = build_scene("final_scene", 64, 64).tables
    head_m, head_s, cells, union = fin.sph_cellbin_meta
    assert head_m > 0  # the moving sphere
    live = sum(
        int((np.asarray(fin.sph_cellbin_packed[m0:s1, 8]) > 0).sum())
        for m0, _, _, s1, _ in cells
    )
    assert live == fin.sph_n_tail
    assert all(m0 == m1 for m0, m1, _, _, _ in cells)  # tail is static


def test_split_with_cellbin_fallback_matches():
    """sphere_hit_attrs_split(use_cellbin=True): the over-K fallback
    becomes the tail-lattice kernel; full-aim rays at R = 2K force that
    branch."""
    from art_tpu.ops.compact_sphere import sphere_hit_attrs_split

    fin = build_scene("final_scene", 64, 64).tables
    R2 = 2 * pk.RAY_BLOCK
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    o = tuple(
        jax.random.uniform(k, (R2,), jnp.float32, -500.0, 900.0)
        for k in jax.random.split(ks[0], 3)
    )
    x0, y0, z0, x1, y1, z1 = fin.sph_tail_box
    jit = tuple(
        jax.random.uniform(k, (R2,), jnp.float32, -0.4, 0.4)
        for k in jax.random.split(ks[1], 3)
    )
    d = (
        (x0 + x1) / 2 + jit[0] * (x1 - x0) - o[0],
        (y0 + y1) / 2 + jit[1] * (y1 - y0) - o[1],
        (z0 + z1) / 2 + jit[2] * (z1 - z0) - o[2],
    )
    tm = jax.random.uniform(ks[2], (R2,), jnp.float32)
    expand = bool(fin.sph_expand)
    t0, *_ = pk.sphere_hit_attrs_planar(
        fin.sph_packed, o, d, tm,
        n_moving=fin.sph_n_moving_pad, n_static=fin.sph_n_static,
        needs_uv=True, expand=expand,
        n_tail=fin.sph_n_tail, tail_r=fin.sph_tail_r,
        tail_mat=fin.sph_tail_mat, pos_r=fin.sph_pos_r,
        interpret=True,
    )
    t1, *_ = sphere_hit_attrs_split(
        fin, o, d, tm, needs_uv=True, expand=expand,
        pos_r=fin.sph_pos_r, k=pk.RAY_BLOCK, use_cellbin=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_tail2d_matches_planar():
    """final_scene through the cellbin kernel with the tail-2D packing:
    winner t must match the dense kernel on every lane (half-aimed rays
    exercise head, cells, and the occlusion bound)."""
    fin = build_scene("final_scene", 64, 64).tables
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    o = tuple(
        jax.random.uniform(k, (R,), jnp.float32, -500.0, 900.0)
        for k in jax.random.split(ks[0], 3)
    )
    d = tuple(
        jax.random.normal(k, (R,), jnp.float32)
        for k in jax.random.split(ks[1], 3)
    )
    x0, y0, z0, x1, y1, z1 = fin.sph_cellbin_meta[3]
    aim = jax.random.uniform(ks[2], (R,)) < 0.5
    jit = tuple(
        jax.random.uniform(k, (R,), jnp.float32, -0.4, 0.4)
        for k in jax.random.split(ks[3], 3)
    )
    d = (
        jnp.where(aim, (x0 + x1) / 2 + jit[0] * (x1 - x0) - o[0], d[0]),
        jnp.where(aim, (y0 + y1) / 2 + jit[1] * (y1 - y0) - o[1], d[1]),
        jnp.where(aim, (z0 + z1) / 2 + jit[2] * (z1 - z0) - o[2], d[2]),
    )
    tm = jax.random.uniform(ks[0], (R,), jnp.float32)
    expand = bool(fin.sph_expand)
    t0, *_ = _planar(fin, o, d, tm, expand)
    t1, *_ = _cellbin(fin, o, d, tm, expand)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
