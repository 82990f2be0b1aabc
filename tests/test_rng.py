import jax
import numpy as np

from art_tpu.core import rng as artrng


def test_unit_disk_distribution():
    pts = np.asarray(artrng.random_in_unit_disk(jax.random.PRNGKey(0), 20000))
    r2 = (pts**2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    # uniform disk: E[r^2] = 1/2, E[x] = E[y] = 0
    assert abs(r2.mean() - 0.5) < 0.02
    assert abs(pts[:, 0].mean()) < 0.02
    assert abs(pts[:, 1].mean()) < 0.02


def test_unit_ball_distribution():
    pts = np.asarray(artrng.random_in_unit_ball(jax.random.PRNGKey(1), 20000))
    r = np.sqrt((pts**2).sum(-1))
    assert r.max() <= 1.0 + 1e-6
    # uniform ball: E[r] = 3/4, CDF(r) = r^3
    assert abs(r.mean() - 0.75) < 0.02
    assert abs(np.mean(r < 0.5) - 0.125) < 0.02
    for axis in range(3):
        assert abs(pts[:, axis].mean()) < 0.02


def test_fold_decorrelates():
    k = jax.random.PRNGKey(0)
    a = np.asarray(artrng.uniform(artrng.fold(k, 1), (1000,)))
    b = np.asarray(artrng.uniform(artrng.fold(k, 2), (1000,)))
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.1
    # and determinism
    a2 = np.asarray(artrng.uniform(artrng.fold(k, 1), (1000,)))
    np.testing.assert_array_equal(a, a2)
