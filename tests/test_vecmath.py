import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.core import vecmath as vm


def test_dot_cross_unit():
    a = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.asarray([[4.0, 5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(vm.dot(a, b), [32.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(
        vm.cross(a, b)[0], np.cross([1, 2, 3], [4, 5, 6]), rtol=1e-6
    )
    u = vm.unit_vector(a)
    np.testing.assert_allclose(vm.length(u), [1.0, 1.0], rtol=1e-6)


def test_reflect():
    # 45-degree mirror: v=(1,-1,0) off n=(0,1,0) -> (1,1,0)
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vm.reflect(v, n)[0], [1.0, 1.0, 0.0], atol=1e-6)


def test_refract_straight_through():
    # normal incidence, eta=1 -> direction preserved
    v = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    ok, r = vm.refract(v, n, jnp.asarray([1.0]))
    assert bool(ok[0])
    np.testing.assert_allclose(r[0], [0.0, -1.0, 0.0], atol=1e-6)


def test_refract_tir():
    # grazing exit from dense medium: total internal reflection
    v = jnp.asarray([[1.0, -0.1, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    ok, _ = vm.refract(v, n, jnp.asarray([1.5]))
    assert not bool(ok[0])


def test_schlick_bounds():
    # at normal incidence, R = ((1-n)/(1+n))^2; at grazing, R -> 1
    r0 = vm.schlick(jnp.asarray(1.0), jnp.asarray(1.5))
    np.testing.assert_allclose(float(r0), ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-5)
    rg = vm.schlick(jnp.asarray(0.0), jnp.asarray(1.5))
    np.testing.assert_allclose(float(rg), 1.0, rtol=1e-5)


def test_rotate_y_roundtrip():
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    c, s = jnp.cos(0.7), jnp.sin(0.7)
    q = vm.rotate_y(p, c, s)
    back = vm.rotate_y_inv(q, c, s)
    np.testing.assert_allclose(back, p, atol=1e-6)


def test_rotate_y_matches_reference_formula():
    # world = (c*x + s*z, y, -s*x + c*z)  (src/main.cu:491-496)
    import math

    th = math.radians(15.0)
    p = jnp.asarray([[2.0, 5.0, -3.0]])
    out = vm.rotate_y(p, jnp.float32(math.cos(th)), jnp.float32(math.sin(th)))
    exp = [
        math.cos(th) * 2.0 + math.sin(th) * -3.0,
        5.0,
        -math.sin(th) * 2.0 + math.cos(th) * -3.0,
    ]
    np.testing.assert_allclose(out[0], exp, rtol=1e-5)
