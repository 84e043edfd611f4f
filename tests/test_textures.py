"""Texture evaluation tests (hittable/texture.go, hittable/perlin.go)."""

import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.integrator.sampling import texture_value
from go_raytracer_tpu.scene import perlin as perlin_mod
from go_raytracer_tpu.scene.builder import SceneBuilder


def _eval(scene, tex_id, u, v, p):
    n = len(u)
    return np.asarray(texture_value(
        scene, jnp.full((n,), tex_id, dtype=jnp.int32),
        jnp.asarray(u, dtype=jnp.float32), jnp.asarray(v, dtype=jnp.float32),
        jnp.asarray(p, dtype=jnp.float32)))


def test_solid_color():
    b = SceneBuilder()
    t = b.solid((0.1, 0.2, 0.3))
    s = b.build()
    out = _eval(s, t, [0.5], [0.5], [[1, 2, 3]])
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.3], atol=1e-6)


def test_checker_parity():
    b = SceneBuilder()
    t = b.checker(1.0, (1, 1, 1), (0, 0, 0))
    s = b.build()
    # floor parity: (0.5,0.5,0.5)->(0,0,0) even sum=0 -> even color
    # (1.5,0.5,0.5)->sum 1 -> odd
    out = _eval(s, t, [0, 0, 0], [0, 0, 0],
                [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.5, 0.5, 0.5]])
    np.testing.assert_allclose(out[0], [1, 1, 1])
    np.testing.assert_allclose(out[1], [0, 0, 0])
    np.testing.assert_allclose(out[2], [0, 0, 0])  # floor(-0.5)=-1: odd sum


def test_checker_scale():
    b = SceneBuilder()
    t = b.checker(0.32, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9))  # book1 ground
    s = b.build()
    out = _eval(s, t, [0], [0], [[0.0, -0.16, 0.0]])
    # floor(-0.16/0.32) = floor(-0.5) = -1 -> odd
    np.testing.assert_allclose(out[0], [0.9, 0.9, 0.9], atol=1e-6)


def test_image_texture_lookup_and_vflip():
    b = SceneBuilder()
    img = np.zeros((2, 2, 3), dtype=np.float32)
    img[0, 0] = (1, 0, 0)  # top-left
    img[1, 0] = (0, 0, 1)  # bottom-left
    t = b.image_texture(img)
    s = b.build()
    # reference quirk preserved: i = int(u*(W-1)) never reaches the last
    # column for u<1 (texture.go:80-81), so only column 0 is addressable
    # on a 2-wide image. v=0.999 -> vv=0.001 -> top row; v=0 -> vv=1 ->
    # bottom row (v is flipped, texture.go:78).
    out = _eval(s, t, [0.0, 0.5], [0.999, 0.0], [[0, 0, 0]] * 2)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 1], atol=1e-6)


def test_noise_perlin_range_and_continuity():
    b = SceneBuilder()
    t = b.noise_texture(1.0, "perlin", seed=42)
    s = b.build()
    p = np.random.default_rng(0).uniform(-10, 10, (256, 3))
    out = _eval(s, t, np.zeros(256), np.zeros(256), p)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)  # 0.5*(1+noise in [-1,1])
    assert out.std() > 0.01  # not constant
    # grayscale
    np.testing.assert_allclose(out[:, 0], out[:, 1])


def test_noise_marble_range():
    b = SceneBuilder()
    t = b.noise_texture(4.0, "marble", seed=42)
    s = b.build()
    p = np.random.default_rng(1).uniform(-3, 3, (128, 3))
    out = _eval(s, t, np.zeros(128), np.zeros(128), p)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)  # 0.5*(1+sin)
    assert out.std() > 0.01


def test_noise_turbulent_nonnegative():
    b = SceneBuilder()
    t = b.noise_texture(1.0, "turbulent", seed=7)
    s = b.build()
    p = np.random.default_rng(2).uniform(-3, 3, (128, 3))
    out = _eval(s, t, np.zeros(128), np.zeros(128), p)
    assert np.all(out >= 0.0)
    assert out.std() > 0.001


def test_perlin_noise_is_smooth():
    seed = perlin_mod.make_seed(np.random.default_rng(5))
    p = jnp.asarray([[0.3, 0.4, 0.5]])
    eps = 1e-3
    p2 = p + jnp.asarray([[eps, 0, 0]])
    n1 = float(perlin_mod.noise(seed, p)[0])
    n2 = float(perlin_mod.noise(seed, p2)[0])
    assert abs(n1 - n2) < 0.05  # continuous in space


def test_perlin_gradients_are_unit_and_hash_deterministic():
    """Corner gradients are unit vectors (perlin.go:27 normalizes) and the
    hash is a pure function of (corner, seed)."""
    i = jnp.arange(-50, 50, dtype=jnp.int32)
    g = perlin_mod._gradient(i, i * 3 + 1, -i, np.uint32(123), jnp.float32)
    norm = np.sqrt(np.asarray(g[0])**2 + np.asarray(g[1])**2 + np.asarray(g[2])**2)
    np.testing.assert_allclose(norm, 1.0, atol=1e-4)
    g2 = perlin_mod._gradient(i, i * 3 + 1, -i, np.uint32(123), jnp.float32)
    for a, b2 in zip(g, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    # different seed -> different field
    g3 = perlin_mod._gradient(i, i * 3 + 1, -i, np.uint32(77), jnp.float32)
    assert not np.allclose(np.asarray(g[0]), np.asarray(g3[0]))


def test_perlin_noise_statistics_match_reference_class():
    """Distributional parity with perlin.go:34-54: zero-mean, bounded,
    non-degenerate variance over a large sample of points."""
    seed = perlin_mod.make_seed(np.random.default_rng(9))
    p = jnp.asarray(np.random.default_rng(4).uniform(-20, 20, (20000, 3)))
    n = np.asarray(perlin_mod.noise(seed, p))
    assert abs(n.mean()) < 0.02
    assert 0.05 < n.std() < 0.5
    assert np.all(np.abs(n) <= 1.0 + 1e-5)


def test_distinct_noise_textures_have_distinct_tables():
    b = SceneBuilder()
    t1 = b.noise_texture(1.0, "perlin")
    t2 = b.noise_texture(1.0, "perlin")
    s = b.build()
    assert s.perlin.count == 2
    p = np.random.default_rng(3).uniform(-4, 4, (64, 3))
    o1 = _eval(s, t1, np.zeros(64), np.zeros(64), p)
    o2 = _eval(s, t2, np.zeros(64), np.zeros(64), p)
    assert not np.allclose(o1, o2)  # per-texture tables (perlin.go:20-31)
