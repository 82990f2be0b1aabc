import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core.camera import generate_rays, make_camera


def _pinhole():
    return make_camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vup=(0, 1, 0),
        vfov_degrees=90.0, aspect=2.0, aperture=0.0, focus_dist=1.0,
    )


def test_center_ray_points_at_lookat():
    cam = _pinhole()
    s = jnp.asarray([0.5])
    t = jnp.asarray([0.5])
    o, d, tm = generate_rays(cam, s, t, jax.random.PRNGKey(0))
    np.testing.assert_allclose(o[0], [0, 0, 0], atol=1e-6)
    dn = np.asarray(d[0]) / np.linalg.norm(d[0])
    np.testing.assert_allclose(dn, [0, 0, -1], atol=1e-5)
    assert float(tm[0]) == 0.0  # time0 == time1 == 0


def test_corner_rays_match_fov():
    # vfov 90 deg, focus 1 => half-height = 1, half-width = aspect
    cam = _pinhole()
    s = jnp.asarray([0.0, 1.0])
    t = jnp.asarray([0.0, 1.0])
    o, d, _ = generate_rays(cam, s, t, jax.random.PRNGKey(0))
    np.testing.assert_allclose(d[0], [-2.0, -1.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(d[1], [2.0, 1.0, -1.0], atol=1e-5)


def test_shutter_time_range():
    cam = make_camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vup=(0, 1, 0),
        vfov_degrees=90.0, aspect=1.0, aperture=0.0, focus_dist=1.0,
        time0=0.25, time1=0.75,
    )
    n = 1000
    s = jnp.full((n,), 0.5)
    _, _, tm = generate_rays(cam, s, s, jax.random.PRNGKey(3))
    tm = np.asarray(tm)
    assert tm.min() >= 0.25 and tm.max() <= 0.75
    assert abs(tm.mean() - 0.5) < 0.02


def test_lens_offset_within_aperture():
    cam = make_camera(
        lookfrom=(1, 2, 3), lookat=(0, 0, 0), vup=(0, 1, 0),
        vfov_degrees=40.0, aspect=1.0, aperture=0.5, focus_dist=5.0,
    )
    n = 1000
    s = jnp.full((n,), 0.5)
    o, _, _ = generate_rays(cam, s, s, jax.random.PRNGKey(4))
    r = np.linalg.norm(np.asarray(o) - np.array([1, 2, 3]), axis=-1)
    assert r.max() <= 0.25 + 1e-5  # lens_radius = aperture/2


def test_focus_plane_convergence():
    # rays through different lens points converge at the focus plane
    cam = make_camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vup=(0, 1, 0),
        vfov_degrees=90.0, aspect=1.0, aperture=1.0, focus_dist=3.0,
    )
    n = 64
    s = jnp.full((n,), 0.5)
    o, d, _ = generate_rays(cam, s, s, jax.random.PRNGKey(5))
    # point at parameter 1.0 is on the focus plane for all rays
    p = np.asarray(o) + np.asarray(d)
    np.testing.assert_allclose(p, np.broadcast_to([0, 0, -3.0], p.shape), atol=1e-5)
