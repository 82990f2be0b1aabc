"""Needy-skip binned sphere kernel (pallas_kernels._sphere_skip_kernel).

The block-pruned kernel must agree with the unsplit sphere kernel on
every lane: the whole-cluster slab and the per-bin AABB slabs are
conservative, the bins partition the tail rows exactly, and the
candidate math per (ray, sphere) pair mirrors _sphere_kernel — so
disagreement means a pruned bin some ray could hit.  In interpret mode
the accumulation order differences (bins are y-sorted) cannot move t:
closest-t selection is order-independent for distinct candidates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.models import build_scene
from art_tpu.ops import pallas_kernels as pk
from art_tpu.ops.compact_sphere import sphere_hit_attrs_split

R = pk.RAY_BLOCK


@pytest.fixture(scope="module")
def final():
    return build_scene("final_scene", 64, 64).tables


@pytest.fixture(scope="module")
def original():
    return build_scene("original_scene", 64, 64).tables


def _rays(tables, seed, aim_frac):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    o = tuple(
        jax.random.uniform(k, (R,), jnp.float32, -500.0, 900.0)
        for k in jax.random.split(ks[0], 3)
    )
    d = tuple(
        jax.random.normal(k, (R,), jnp.float32)
        for k in jax.random.split(ks[1], 3)
    )
    x0, y0, z0, x1, y1, z1 = tables.sph_tail_box
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


def _skip(tables, o, d, tm, expand):
    return pk.sphere_skip_hit_attrs(
        tables.sph_skip_packed, o, d, tm,
        meta=tables.sph_skip_bins, tail_box=tables.sph_tail_box,
        tail_r=tables.sph_tail_r, tail_mat=tables.sph_tail_mat,
        pos_r=tables.sph_pos_r, expand=expand, needs_uv=True,
        interpret=True,
    )


@pytest.mark.parametrize(
    "scene,aim_frac", [("final", 0.05), ("final", 1.0), ("original", 0.5)]
)
def test_skip_matches_planar(scene, aim_frac, final, original):
    """Representative needy regimes (few / all aimed on final, half on
    original — the 0.0/0.05 x 2-scene matrix cost ~10 min of suite wall
    for the same branch coverage): winner t, mat and attributes must
    match the dense kernel on every lane.  Both kernels run the
    identical candidate expressions on identical rows, so t is bit-exact
    in interpret mode (selection, not recomputation)."""
    tables = {"final": final, "original": original}[scene]
    o, d, tm = _rays(tables, seed=3, aim_frac=aim_frac)
    expand = bool(tables.sph_expand)
    t0, n0, u0, v0, m0 = _planar(tables, o, d, tm, expand)
    t1, n1, u1, v1, m1 = _skip(tables, o, d, tm, expand)
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


def test_skip_matches_planar_standard_quadratic(final):
    """expand=False path (standard oc-form tail candidates)."""
    o, d, tm = _rays(final, seed=7, aim_frac=0.3)
    t0, *_ = _planar(final, o, d, tm, expand=False)
    t1, *_ = _skip(final, o, d, tm, expand=False)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_split_with_skip_fallback_matches(final):
    """sphere_hit_attrs_split(use_skip=True): the over-K fallback becomes
    the skip kernel; full-aim rays at R = 2K force that branch (K must be
    a RAY_BLOCK multiple — the compacted tail kernel's ray-grid rule)."""
    global R
    R_saved, R = R, 2 * pk.RAY_BLOCK
    try:
        o, d, tm = _rays(final, seed=5, aim_frac=1.0)
    finally:
        R = R_saved
    t0, *_ = pk.sphere_hit_attrs_planar(
        final.sph_packed, o, d, tm,
        n_moving=final.sph_n_moving_pad, n_static=final.sph_n_static,
        needs_uv=True, expand=bool(final.sph_expand),
        n_tail=final.sph_n_tail, tail_r=final.sph_tail_r,
        tail_mat=final.sph_tail_mat, pos_r=final.sph_pos_r,
        interpret=True,
    )
    t1, *_ = sphere_hit_attrs_split(
        final, o, d, tm, needs_uv=True, expand=bool(final.sph_expand),
        pos_r=final.sph_pos_r, k=pk.RAY_BLOCK, use_skip=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_bins_partition_tail_rows(final):
    """pack_skip_spheres invariants: bins cover every tail row exactly
    once, ranges are UNROLL-aligned, each bin box bounds its members
    (center +- |r|), and pad rows are inert."""
    n_mov, n_main, bins = final.sph_skip_bins
    tab = np.asarray(final.sph_skip_packed)
    U = pk._SPH_UNROLL
    assert n_mov % U == 0 if n_mov else True
    # head rows: the real moving + main rows of sph_packed, reordered only
    pk_np = np.asarray(final.sph_packed)
    real_tail = pk_np[
        final.sph_n_moving_pad
        + (final.sph_n_static - final.sph_n_tail) : final.sph_n_moving_pad
        + final.sph_n_static
    ]
    seen = []
    for row0, row1, box in bins:
        assert row0 % U == 0 and row1 % U == 0 and row1 > row0
        rows = tab[row0:row1]
        live = rows[:, 8] > 0.0
        c, r = rows[live, 0:3], np.abs(rows[live, 6:7])
        x0, y0, z0, x1, y1, z1 = box
        assert ((c - r) >= np.array([x0, y0, z0]) - 1e-6).all()
        assert ((c + r) <= np.array([x1, y1, z1]) + 1e-6).all()
        # inert padding never accepted: r2 == -1 and K == 1e30
        assert (rows[~live, 8] == -1.0).all()
        assert (rows[~live, 9] == 1e30).all()
        seen.append(rows[live])
    got = np.concatenate(seen, axis=0)
    assert len(got) == final.sph_n_tail
    # same multiset of rows as the packed tail segment (sorted by bin axis)
    key = lambda a: np.lexsort(a.T[::-1])
    np.testing.assert_array_equal(got[key(got)], real_tail[key(real_tail)])


def test_no_skip_bins_for_non_cluster_scenes():
    """bouncing_spheres has no (r, mat)-uniform tail: the gate must not
    build skip tables for it."""
    tb = build_scene("bouncing_spheres", 64, 32).tables
    assert tb.sph_skip_bins is None
