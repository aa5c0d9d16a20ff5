"""Math-core parity tests — the batched counterpart of the reference's 24
inline vec3 unit tests (vec3.rs:260-450), plus optics identities the
reference never tested."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributed_raytracer_tpu.core import rng as drng
from distributed_raytracer_tpu.core import vecmath as vm


@pytest.fixture
def rand_vecs():
    rng = np.random.default_rng(7)
    return rng.normal(size=(64, 3)).astype(np.float32), rng.normal(
        size=(64, 3)
    ).astype(np.float32)


def test_dot(rand_vecs):
    u, v = rand_vecs
    np.testing.assert_allclose(
        np.asarray(vm.dot(jnp.asarray(u), jnp.asarray(v))),
        np.sum(u * v, -1),
        rtol=1e-5,
    )


def test_dot_exact():
    # vec3.rs:421-426 uses exact integer-valued inputs
    u = jnp.asarray([[1.0, 2.0, 3.0]])
    v = jnp.asarray([[4.0, -5.0, 6.0]])
    assert float(vm.dot(u, v)[0]) == 1 * 4 + 2 * -5 + 3 * 6


def test_cross(rand_vecs):
    u, v = rand_vecs
    np.testing.assert_allclose(
        np.asarray(vm.cross(jnp.asarray(u), jnp.asarray(v))),
        np.cross(u, v),
        rtol=1e-5,
        atol=1e-6,
    )


def test_cross_exact():
    # vec3.rs:429-435
    u = jnp.asarray([[1.0, 0.0, 0.0]])
    v = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(vm.cross(u, v))[0], [0.0, 0.0, 1.0])


def test_unit_vector(rand_vecs):
    u, _ = rand_vecs
    out = np.asarray(vm.unit_vector(jnp.asarray(u)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    # zero vector -> zero, not NaN
    z = np.asarray(vm.unit_vector(jnp.zeros((1, 3))))
    assert np.all(z == 0.0)


def test_length(rand_vecs):
    u, _ = rand_vecs
    np.testing.assert_allclose(
        np.asarray(vm.length(jnp.asarray(u))), np.linalg.norm(u, axis=-1), rtol=1e-5
    )


def test_near_zero():
    v = jnp.asarray([[1e-7, 1e-7, 1e-7], [1e-3, 0.0, 0.0], [0.0, 0.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(vm.near_zero(v)), [True, False, True])


def test_reflect():
    # reflect((1,-1,0), (0,1,0)) = (1,1,0) — mirror about y (vec3.rs:97-102)
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(vm.reflect(v, n))[0], [1.0, 1.0, 0.0])


def test_reflect_preserves_length(rand_vecs):
    u, n = rand_vecs
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    out = np.asarray(vm.reflect(jnp.asarray(u), jnp.asarray(n)))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(u, axis=-1), rtol=1e-5
    )


def test_refract_straight_through():
    # normal incidence, eta=1 -> direction unchanged (vec3.rs:104-109)
    uv = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(vm.refract(uv, n, jnp.asarray([1.0])))
    np.testing.assert_allclose(out[0], [0.0, -1.0, 0.0], atol=1e-6)


def test_refract_snell():
    # 45-degree incidence into eta = 1/1.5: check Snell's law sin_t = sin_i*eta
    s = np.sqrt(0.5).astype(np.float32)
    uv = jnp.asarray([[s, -s, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    eta = 1.0 / 1.5
    out = np.asarray(vm.refract(uv, n, jnp.asarray([eta])))[0]
    sin_t = abs(out[0]) / np.linalg.norm(out)
    np.testing.assert_allclose(sin_t, s * eta, rtol=1e-5)


def test_lerp_endpoints():
    a = jnp.ones((4, 3))
    b = jnp.zeros((4, 3))
    np.testing.assert_allclose(np.asarray(vm.lerp(a, b, jnp.zeros(4))), 1.0)
    np.testing.assert_allclose(np.asarray(vm.lerp(a, b, jnp.ones(4))), 0.0)


# --- samplers ---


def test_unit_vector_sampler():
    key = jax.random.PRNGKey(0)
    v = np.asarray(drng.unit_vector(key, 4096))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-5)
    # isotropy: mean near zero, component variance near 1/3
    assert np.all(np.abs(v.mean(0)) < 0.05)
    np.testing.assert_allclose(v.var(0), 1 / 3, atol=0.03)


def test_in_unit_disk_sampler():
    key = jax.random.PRNGKey(1)
    p = np.asarray(drng.in_unit_disk(key, 4096))
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert np.all(r <= 1.0)
    assert np.all(p[:, 2] == 0.0)
    # uniform disk: E[r^2] = 1/2
    np.testing.assert_allclose((r**2).mean(), 0.5, atol=0.02)


def test_square_jitter():
    key = jax.random.PRNGKey(2)
    o = np.asarray(drng.square_jitter(key, 4096))
    assert np.all(o[:, :2] >= -0.5) and np.all(o[:, :2] < 0.5)
    assert np.all(o[:, 2] == 0.0)
    np.testing.assert_allclose(o[:, :2].mean(0), 0.0, atol=0.02)
