"""Camera tests: viewport math and ray generation semantics
(camera/camera.go:179-290)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.render.camera import Camera, generate_rays


def test_defaults_match_reference():
    c = Camera()
    assert c.aspect_ratio == 1.0
    assert c.width == 100
    assert c.samples_per_pixel == 100
    assert c.max_depth == 10
    assert c.vertical_fov == 90
    assert c.focus_distance == 10
    assert c.max_contribution == 1.5


def test_image_height_and_spp():
    c = Camera(aspect_ratio=16 / 9, width=400)
    assert c.image_height == 225
    c.samples_per_pixel = 250
    assert c.spp_effective == 225  # floor(sqrt(250))^2 (camera.go:211-212)
    c.samples_per_pixel = 10
    assert c.spp_effective == 9


def test_center_ray_points_at_look_at():
    c = Camera(width=101, aspect_ratio=1.0, vertical_fov=40)
    c.position((0, 0, 5), (0, 0, 0))
    arr = c.derived()
    # center pixel of a 101x101 image
    pid = jnp.asarray([50 * 101 + 50], dtype=jnp.int32)
    o, d, t = generate_rays(arr, 101, pid, jnp.asarray(0.0), jnp.asarray(0.0),
                            jax.random.key(0))
    dn = np.asarray(d[0] / np.linalg.norm(d[0]))
    np.testing.assert_allclose(dn, [0, 0, -1], atol=2e-2)  # jitter within pixel
    np.testing.assert_allclose(np.asarray(o[0]), [0, 0, 5], atol=1e-6)


def test_fov_sets_viewport_extent():
    c = Camera(width=200, aspect_ratio=1.0, vertical_fov=90, focus_distance=1.0)
    c.position((0, 0, 1), (0, 0, 0))
    arr = c.derived()
    # corner pixels should subtend ~45 degrees vertically
    top = jnp.asarray([100], dtype=jnp.int32)  # row 0, col 100
    o, d, t = generate_rays(arr, 200, top, jnp.asarray(0.0), jnp.asarray(0.0),
                            jax.random.key(1))
    dn = np.asarray(d[0] / np.linalg.norm(d[0]))
    assert dn[1] == pytest.approx(np.sin(np.pi / 4), abs=0.02)


def test_defocus_spreads_origins():
    c = Camera(width=50, defocus_angle=2.0, focus_distance=5.0)
    c.position((0, 0, 5), (0, 0, 0))
    arr = c.derived()
    pid = jnp.zeros(512, dtype=jnp.int32)
    o, d, t = generate_rays(arr, 50, pid, jnp.asarray(0.0), jnp.asarray(0.0),
                            jax.random.key(2))
    spread = np.asarray(o).std(axis=0)
    assert spread[0] > 1e-3 and spread[1] > 1e-3
    # all rays still converge on the focus plane point
    focus_pts = np.asarray(o + d)  # t=1 reaches the pixel sample on the plane
    assert focus_pts[:, 2].std() < 1e-5


def test_ray_times_uniform():
    c = Camera(width=50)
    c.position((0, 0, 5), (0, 0, 0))
    arr = c.derived()
    pid = jnp.zeros(2048, dtype=jnp.int32)
    _, _, t = generate_rays(arr, 50, pid, jnp.asarray(0.0), jnp.asarray(0.0),
                            jax.random.key(3))
    t = np.asarray(t)
    assert 0 <= t.min() and t.max() < 1
    assert t.mean() == pytest.approx(0.5, abs=0.03)


def test_stratification_partitions_pixel():
    c = Camera(width=50, samples_per_pixel=4)  # spp_sqrt = 2
    c.position((0, 0, 5), (0, 0, 0))
    arr = c.derived()
    pid = jnp.zeros(256, dtype=jnp.int32)
    # stratum (0,0) vs (1,0) should shift pixel samples by half a pixel in x
    o0, d0, _ = generate_rays(arr, 50, pid, jnp.asarray(0.0), jnp.asarray(0.0),
                              jax.random.key(4))
    o1, d1, _ = generate_rays(arr, 50, pid, jnp.asarray(1.0), jnp.asarray(0.0),
                              jax.random.key(4))
    # direction x-components differ systematically between strata
    assert float(jnp.mean(d1[:, 0] - d0[:, 0])) > 0
