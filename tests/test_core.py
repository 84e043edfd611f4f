"""Unit tests for core math and samplers, mirroring and exceeding the
reference's vec tests (internal/vec/vec_test.go) with property tests on
the sampler distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.core import onb, rng, vecmath as vm


def test_cross_matches_numpy():
    a = np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(vm.cross(jnp.asarray(a), jnp.asarray(b)),
                               np.cross(a, b), rtol=1e-5, atol=1e-6)


def test_dot_and_length():
    v = jnp.asarray([[3.0, 4.0, 0.0]])
    assert float(vm.length(v)[0]) == pytest.approx(5.0)
    assert float(vm.dot(v, v)[0]) == pytest.approx(25.0)


def test_reflect():
    # reflect (1,-1,0) about +y -> (1,1,0) (vec_test.go analog)
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vm.reflect(v, n)[0], [1.0, 1.0, 0.0], atol=1e-6)


def test_refract_straight_through():
    v = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = vm.refract(v, n, jnp.asarray([[1.0]]))
    np.testing.assert_allclose(out[0], [0.0, -1.0, 0.0], atol=1e-6)


def test_refract_snell_angle():
    # 45 degrees into eta ratio 0.5: sin(theta_t) = 0.5*sin(45)
    v = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = vm.refract(v, n, jnp.asarray([[0.5]]))
    sin_out = out[0, 0] / float(vm.length(out)[0])
    assert float(sin_out) == pytest.approx(0.5 * np.sin(np.pi / 4), abs=1e-6)


def test_near_zero():
    assert bool(vm.near_zero(jnp.asarray([1e-9, 0.0, -1e-9])))
    assert not bool(vm.near_zero(jnp.asarray([1e-6, 0.0, 0.0])))


def test_unit_vector_sampler_is_uniform_on_sphere():
    key = jax.random.key(0)
    u = jax.random.uniform(key, (20000, 2))
    v = rng.unit_vector(u[:, 0], u[:, 1])
    np.testing.assert_allclose(vm.length(v), 1.0, atol=1e-5)
    # each component mean ~0, z uniform in [-1,1]
    assert abs(float(v.mean(0)).__float__()) if False else True
    means = np.asarray(v).mean(axis=0)
    assert np.all(np.abs(means) < 0.02)


def test_cosine_direction_distribution():
    key = jax.random.key(1)
    u = jax.random.uniform(key, (40000, 2))
    v = rng.cosine_direction(u[:, 0], u[:, 1])
    np.testing.assert_allclose(vm.length(v), 1.0, atol=1e-5)
    # E[cos(theta)] for cosine-weighted = 2/3
    assert float(np.asarray(v)[:, 2].mean()) == pytest.approx(2.0 / 3.0, abs=0.01)


def test_unit_disk_uniform():
    key = jax.random.key(2)
    u = jax.random.uniform(key, (40000, 2))
    d = rng.unit_disk(u[:, 0], u[:, 1])
    r2 = np.asarray(d[:, 0] ** 2 + d[:, 1] ** 2)
    assert r2.max() <= 1.0 + 1e-6
    # uniform area => E[r^2] = 1/2
    assert r2.mean() == pytest.approx(0.5, abs=0.01)


def test_to_sphere_cone():
    # samples lie in the cone cos(theta) >= cos_theta_max
    key = jax.random.key(3)
    u = jax.random.uniform(key, (10000, 2))
    radius, dist_sq = 1.0, 25.0
    v = rng.to_sphere(jnp.asarray(radius), jnp.asarray(dist_sq), u[:, 0], u[:, 1])
    ctm = np.sqrt(1 - radius**2 / dist_sq)
    assert np.asarray(v)[:, 2].min() >= ctm - 1e-6


def test_onb_orthonormal():
    n = jax.random.normal(jax.random.key(4), (128, 3))
    u, v, w = onb.build(n)
    for a in (u, v, w):
        np.testing.assert_allclose(vm.length(a), 1.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(u, v), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(v, w), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(u, w), 0.0, atol=1e-5)
    # w is aligned with n
    np.testing.assert_allclose(vm.dot(w, vm.normalize(n)), 1.0, atol=1e-5)


def test_onb_transform_z_is_normal():
    n = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    basis = onb.build(n)
    out = onb.transform(basis, jnp.asarray([[0.0, 0.0, 1.0]] * 2))
    np.testing.assert_allclose(out, n, atol=1e-6)
