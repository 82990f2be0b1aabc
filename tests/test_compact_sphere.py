"""Compacted tail-sphere pass (ops/compact_sphere.py).

The split path (dense head + slab-culled, MXU-compacted tail at K lanes)
must agree with the unsplit sphere kernel on every lane: the compaction
routing is exact (integer byte-split payload), the slab predicate is
conservative, and the candidate math per (ray, sphere) pair is the same
kernel code — so disagreement means a culled sphere some ray could hit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.models import build_scene
from art_tpu.ops import pallas_kernels as pk
from art_tpu.ops.compact_sphere import sphere_hit_attrs_split, tail_box_needy

R = 2 * pk.RAY_BLOCK  # must exceed K for the compact branch to engage
K = pk.RAY_BLOCK


@pytest.fixture(scope="module")
def final():
    return build_scene("final_scene", 64, 64).tables


@pytest.fixture(scope="module")
def original():
    return build_scene("original_scene", 64, 64).tables


def _rays(tables, seed, aim_frac):
    """Random rays; a fraction aimed straight at the tail cluster so the
    compacted branch always has real tail hits to misroute if broken."""
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
    # jitter targets inside the box so aimed rays hit distinct spheres
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


def _planar(tables, o, d, tm, expand=None):
    return pk.sphere_hit_attrs_planar(
        tables.sph_packed, o, d, tm,
        n_moving=tables.sph_n_moving_pad, n_static=tables.sph_n_static,
        needs_uv=True,
        expand=tables.sph_expand if expand is None else expand,
        n_tail=tables.sph_n_tail, tail_r=tables.sph_tail_r,
        tail_mat=tables.sph_tail_mat, pos_r=tables.sph_pos_r,
        interpret=True,
    )


def _split(tables, o, d, tm, k=K, expand=None):
    return sphere_hit_attrs_split(
        tables, o, d, tm,
        needs_uv=True,
        expand=tables.sph_expand if expand is None else expand,
        pos_r=tables.sph_pos_r, k=k, interpret=True,
    )


@pytest.mark.parametrize("scene", ["final", "original"])
def test_split_matches_planar_sparse(scene, final, original):
    """Few aimed rays: the compact branch runs; every tail hit must
    survive the cull + compaction round trip.  expand=False so both
    paths' candidate math agrees to plain-FMA ulps (the expanded
    quadratic's builder-bounded cancellation would otherwise amplify
    fusion differences between the two compiled cond programs to ~1e-3
    — see test_split_matches_planar_expand_defaults)."""
    tables = {"final": final, "original": original}[scene]
    o, d, tm = _rays(tables, seed=2, aim_frac=0.03)
    needy = tail_box_needy(tables.sph_tail_box, o, d, 1e-3)
    assert int(needy.sum()) <= K, "fixture must exercise the compact branch"
    # the aimed rays really do hit tail spheres (mat == tail_mat)
    t0, n0, u0, v0, m0 = _planar(tables, o, d, tm, expand=False)
    tail_hits = (np.asarray(t0) < 1e29) & (
        np.asarray(m0) == int(tables.sph_tail_mat)
    )
    assert tail_hits.sum() > 100
    t1, n1, u1, v1, m1 = _split(tables, o, d, tm, expand=False)
    hit = np.asarray(t0) < 1e29
    # A culling/routing bug loses (or invents) whole hits — t jumps to
    # the next surface or BIG.  Grazing hits (disc ~ 0) amplify one-ulp
    # FMA differences between the two compiled programs through sqrt, so
    # the bound is loose-ish but far below any lost-hit discontinuity.
    np.testing.assert_allclose(
        np.asarray(t1), np.asarray(t0), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(m1)[hit], np.asarray(m0)[hit])
    # Attribute checks on lanes where both paths provably picked the same
    # winner: cross-program fp noise measured <= ~1e-4 relative on t
    # (near-tangent cancellation amplification), inter-sphere t spacing
    # ~1e-2 — 3e-4 separates them cleanly.  Normal/uv noise scales as
    # t_err * |d| / r (unnormalized aimed directions are ~500 long), so
    # ~1e-2 absolute; a routing bug is O(1) wrong.
    same = hit & np.isclose(np.asarray(t1), np.asarray(t0), rtol=3e-4)
    assert same.sum() > 0.99 * hit.sum()
    for a, b in zip(n1, n0):
        np.testing.assert_allclose(
            np.asarray(a)[same], np.asarray(b)[same], atol=1e-2
        )
    np.testing.assert_allclose(
        np.asarray(u1)[same], np.asarray(u0)[same], atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(v1)[same], np.asarray(v0)[same], atol=1e-2
    )


def test_split_matches_planar_expand_defaults(final):
    """Scene-default flags (expanded quadratic on): t may differ between
    the two compiled programs by the expand form's builder-bounded
    cancellation noise (< 1% of r^2 propagated through sqrt — observed
    ~1e-4 relative), never more."""
    o, d, tm = _rays(final, seed=2, aim_frac=0.03)
    t0, _, _, _, m0 = _planar(final, o, d, tm)
    t1, _, _, _, m1 = _split(final, o, d, tm)
    hit = np.asarray(t0) < 1e29
    np.testing.assert_allclose(
        np.asarray(t1), np.asarray(t0), rtol=2e-3, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(m1)[hit], np.asarray(m0)[hit])


def test_split_overflow_falls_back(final):
    """Every ray aimed at the cluster: cnt > K forces the dense branch,
    which must be exactly the unsplit kernel."""
    o, d, tm = _rays(final, seed=5, aim_frac=1.0)
    needy = tail_box_needy(final.sph_tail_box, o, d, 1e-3)
    assert int(needy.sum()) > K
    t0, *_ = _planar(final, o, d, tm)
    t1, *_ = _split(final, o, d, tm)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_needy_is_conservative(final):
    """No ray whose closest sphere hit is a TAIL sphere may be culled."""
    o, d, tm = _rays(final, seed=11, aim_frac=0.2)
    needy = np.asarray(tail_box_needy(final.sph_tail_box, o, d, 1e-3))
    t0, _, _, _, m0 = _planar(final, o, d, tm)
    tail_win = (np.asarray(t0) < 1e29) & (
        np.asarray(m0) == int(final.sph_tail_mat)
    )
    assert tail_win.sum() > 100
    assert needy[tail_win].all()


def test_zero_dir_components_conservative(final):
    """Axis-parallel rays (zero direction components) through the cluster
    must still be needy — the safe-division replacement errs to needy."""
    x0, y0, z0, x1, y1, z1 = final.sph_tail_box
    cy, cz = (y0 + y1) / 2, (z0 + z1) / 2
    o = (
        jnp.full((R,), x0 - 50.0, jnp.float32),
        jnp.full((R,), cy, jnp.float32),
        jnp.full((R,), cz, jnp.float32),
    )
    d = (
        jnp.ones((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
    )
    needy = tail_box_needy(final.sph_tail_box, o, d, 1e-3)
    assert bool(needy.all())


def test_tail_box_contains_all_tail_spheres(final):
    """pack_tail_spheres' AABB must bound center +- |r| of every tail row
    (slab conservatism rests on it)."""
    pk_np = np.asarray(final.sph_packed)
    lo = final.sph_n_moving_pad + (final.sph_n_static - final.sph_n_tail)
    rows = pk_np[lo : final.sph_n_moving_pad + final.sph_n_static]
    x0, y0, z0, x1, y1, z1 = final.sph_tail_box
    c, r = rows[:, 0:3], np.abs(rows[:, 6:7])
    assert ((c - r) >= np.array([x0, y0, z0]) - 1e-6).all()
    assert ((c + r) <= np.array([x1, y1, z1]) + 1e-6).all()
    # and the tail-only table's real rows are exactly these rows
    tp = np.asarray(final.sph_tail_packed)
    np.testing.assert_array_equal(tp[: len(rows)], rows)
    assert (tp[len(rows) :, 8] == -1.0).all()  # inert padding


def test_mxu_tail_fallback_close_to_planar():
    """Recentered tail MXU fallback (ART_TPU_MXU_TAIL): same hit set as
    the planar dense pass, t within expanded-quadratic tolerance, mats
    equal.  Winner swaps are allowed only between overlapping tail
    spheres (the cluster has ~3.4k overlapping pairs), which shows up as
    rare normal mismatches — bounded here."""
    import numpy as np

    from art_tpu.models import build_scene
    import art_tpu.ops.compact_sphere as cs

    t = build_scene("final_scene", 64, 64).tables
    assert t.mxu_tail_pad > 0 and t.sph_tail_centroid
    R = 8192
    rng = np.random.default_rng(1)
    ctr = np.array(t.sph_tail_centroid)
    o = ctr + rng.normal(0, 400, (R, 3))
    tgt = ctr + rng.normal(0, 120, (R, 3))
    d = tgt - o
    o = jnp.asarray(o.T.astype(np.float32))
    d = jnp.asarray(d.T.astype(np.float32))
    tm = jnp.zeros((R,), jnp.float32)
    kw = dict(needs_uv=False, expand=t.sph_expand, pos_r=t.sph_pos_r,
              interpret=True)
    saved = cs._FORCE_BRANCH
    cs._FORCE_BRANCH = "dense"
    try:
        a = cs.sphere_hit_attrs_split(t, tuple(o), tuple(d), tm, **kw)
        b = cs.sphere_hit_attrs_split(
            t, tuple(o), tuple(d), tm, use_mxu_tail=True, **kw
        )
    finally:
        cs._FORCE_BRANCH = saved
    ta, tb = np.asarray(a[0]), np.asarray(b[0])
    assert ((ta < 1e9) == (tb < 1e9)).all()
    m = ta < 1e9
    rel = np.abs(ta[m] - tb[m]) / np.maximum(ta[m], 1e-6)
    assert np.percentile(rel, 99) < 1e-3
    na = np.stack([np.asarray(x) for x in a[1]], 1)[m]
    nb = np.stack([np.asarray(x) for x in b[1]], 1)[m]
    assert (np.abs(na - nb).max(1) > 1e-2).mean() < 0.005
    assert (np.asarray(a[4])[m] == np.asarray(b[4])[m]).all()
