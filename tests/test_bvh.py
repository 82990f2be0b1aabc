"""Flattened escape-link BVH: structure invariants + traversal vs brute force."""

import jax.numpy as jnp
import numpy as np

from art_tpu.models import build_scene
from art_tpu.ops.bvh import build_bvh, traverse_closest

BIG = np.float32(1e30)


def _sphere_boxes(tables):
    c = np.asarray(tables.sph_center)
    r = np.abs(np.asarray(tables.sph_radius))[:, None]
    v = np.asarray(tables.sph_vel)
    # bbox over shutter [0,1] like the reference moving-sphere ctor
    c0, c1 = c, c + v
    mn = np.minimum(c0, c1) - r
    mx = np.maximum(c0, c1) + r
    return mn, mx


def test_structure_invariants():
    sc = build_scene("bouncing_spheres", 64, 32)
    mn, mx = _sphere_boxes(sc.tables)
    tree = build_bvh(mn, mx)
    n = mn.shape[0]
    M = tree.n_nodes
    assert M == 2 * n - 1  # full binary tree over n leaves
    # every primitive appears exactly once as a leaf
    leaves = tree.prim[tree.prim >= 0]
    assert sorted(leaves.tolist()) == list(range(n))
    # escape links are monotone and bound the subtree
    for i in range(M):
        assert i < tree.escape[i] <= M
    # root box covers everything
    np.testing.assert_allclose(tree.bbox_min[0], mn.min(axis=0), rtol=1e-6)
    np.testing.assert_allclose(tree.bbox_max[0], mx.max(axis=0), rtol=1e-6)
    # children boxes contained in parents (preorder: child of i is i+1)
    for i in range(M):
        if tree.prim[i] < 0:
            j = i + 1
            assert np.all(tree.bbox_min[i] <= tree.bbox_min[j] + 1e-5)
            assert np.all(tree.bbox_max[i] >= tree.bbox_max[j] - 1e-5)


def test_traversal_matches_brute_force():
    sc = build_scene("bouncing_spheres", 64, 32)
    t = sc.tables
    mn, mx = _sphere_boxes(t)
    tree = build_bvh(mn, mx)

    rng = np.random.default_rng(0)
    R = 512
    o = rng.uniform(-14, 14, (R, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.1, 6.0, R)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    time = np.float32(0.3)

    c = np.asarray(t.sph_center) + time * np.asarray(t.sph_vel)
    r = np.asarray(t.sph_radius)

    def brute():
        oc = o[:, None, :] - c[None, :, :]
        a = np.sum(d * d, -1)[:, None]
        b = np.sum(oc * d[:, None, :], -1)
        csq = np.sum(oc * oc, -1) - (r * r)[None, :]
        disc = b * b - a * csq
        s = np.sqrt(np.maximum(disc, 0))
        t1 = (-b - s) / a
        t2 = (-b + s) / a
        valid = disc > 0
        tt = np.where(valid & (t1 > 1e-3), t1, np.where(valid & (t2 > 1e-3), t2, BIG))
        return tt.min(1), tt.argmin(1)

    bt, bp = brute()

    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    cj = jnp.asarray(c)
    rj = jnp.asarray(r)

    def prim_t_fn(pidx, active):
        cc = cj[pidx]
        rr = rj[pidx]
        oc = oj - cc
        a = jnp.sum(dj * dj, -1)
        b = jnp.sum(oc * dj, -1)
        csq = jnp.sum(oc * oc, -1) - rr * rr
        disc = b * b - a * csq
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - s) / a
        t2 = (-b + s) / a
        valid = disc > 0
        tt = jnp.where(valid & (t1 > 1e-3), t1, jnp.where(valid & (t2 > 1e-3), t2, BIG))
        return jnp.where(active, tt, BIG)

    t_best, p_best = traverse_closest(tree, prim_t_fn, oj, dj, 1e-3)
    t_best = np.asarray(t_best)
    p_best = np.asarray(p_best)

    hits_b = bt < 1e29
    hits_t = t_best < 1e29
    np.testing.assert_array_equal(hits_b, hits_t)
    np.testing.assert_allclose(t_best[hits_t], bt[hits_b], rtol=1e-3)
    # winning primitive matches wherever the closest hit is unambiguous
    agree = (p_best[hits_t] == bp[hits_b]).mean()
    assert agree > 0.99


def test_render_path_bvh_candidates_match_brute():
    """The ART_TPU_BVH render-path intersection (bvh_sphere_candidates_p
    over tables.sph_bvh built at scene compile) must equal the brute
    candidate pass for real scene tables and random rays."""
    from art_tpu.ops.intersect import (
        bvh_sphere_candidates_p,
        sphere_candidates_p,
    )

    sc = build_scene("bouncing_spheres", 64, 32)
    t = sc.tables
    assert t.n_sph_bvh_nodes == 2 * t.n_spheres - 1

    rng = np.random.default_rng(7)
    R = 512
    o_np = rng.uniform(-14, 14, (R, 3)).astype(np.float32)
    o_np[:, 1] = rng.uniform(0.1, 6.0, R)
    d_np = rng.normal(size=(R, 3)).astype(np.float32)
    time = jnp.asarray(rng.uniform(0, 1, R).astype(np.float32))
    o = tuple(jnp.asarray(o_np[:, c]) for c in range(3))
    d = tuple(jnp.asarray(d_np[:, c]) for c in range(3))

    bt, bi = sphere_candidates_p(t, o, d, time, 1e-3)
    vt, vi = bvh_sphere_candidates_p(t, o, d, time, 1e-3)
    bt, bi, vt, vi = (np.asarray(x) for x in (bt, bi, vt, vi))

    hits_b = bt < 1e29
    hits_v = vt < 1e29
    np.testing.assert_array_equal(hits_b, hits_v)
    np.testing.assert_allclose(vt[hits_v], bt[hits_b], rtol=1e-3)
    assert (vi[hits_v] == bi[hits_b]).mean() > 0.99
