"""Ray-regeneration integrator tests: exact accounting invariants and
statistical agreement with the plain wavefront renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.render import renderer
from go_raytracer_tpu.render.camera import Camera
from go_raytracer_tpu.scene.builder import SceneBuilder


def empty_scene(bg=(1.0, 1.0, 1.0)):
    b = SceneBuilder(background=bg)
    m = b.lambertian((0.5, 0.5, 0.5))
    b.sphere((0, 0, 1e8), 1.0, m)  # far away, never hit
    b.add_light(b.quad((0, 0, 1e8), (1, 0, 0), (0, 1, 0), b.diffuse_light((1, 1, 1))))
    return b.build()


def box_scene():
    b = SceneBuilder(background=(0, 0, 0))
    white = b.lambertian((0.73, 0.73, 0.73))
    red = b.lambertian((0.65, 0.05, 0.05))
    light = b.diffuse_light((10, 10, 10))
    b.quad((-4, 0, -4), (8, 0, 0), (0, 0, 8), white)
    b.quad((-4, 0, -4), (0, 4, 0), (0, 0, 8), red)
    lq = b.quad((-1, 3.9, -1), (2, 0, 0), (0, 0, 2), light)
    b.sphere((1, 1, 0), 1.0, b.metal((0.9, 0.9, 0.9), 0.1))
    b.add_light(lq)
    return b.build()


def test_every_item_contributes_exactly_once():
    """Empty scene with background 1: every (pixel, stratum) path returns
    exactly the background, so the image must be exactly 1.0 — a strict
    check of the queue/refill/harvest bookkeeping."""
    scene = empty_scene()
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(0),
                                    n_lanes=128, backend="xla")
    np.testing.assert_allclose(img, 1.0, atol=1e-6)
    assert stats["paths"] == 16 * 16 * 9
    # every path is exactly one segment here
    assert stats["segments"] == 16 * 16 * 9


def test_queue_smaller_than_lanes():
    scene = empty_scene(bg=(0.25, 0.5, 0.75))
    cam = Camera(width=4, aspect_ratio=1.0, samples_per_pixel=1, max_depth=2)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(1),
                                    n_lanes=512, backend="xla")
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)


def test_regen_is_deterministic():
    scene = box_scene()
    cam = Camera(width=8, aspect_ratio=1.0, samples_per_pixel=4, max_depth=5)
    cam.position((0, 2, 6), (0, 1, 0))
    img1, _ = regen.render_regen(scene, cam, jax.random.key(3), n_lanes=256,
                                 backend="xla")
    img2, _ = regen.render_regen(scene, cam, jax.random.key(3), n_lanes=256,
                                 backend="xla")
    np.testing.assert_array_equal(img1, img2)


def test_regen_matches_plain_renderer_statistically():
    scene = box_scene()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=49, max_depth=8)
    cam.position((0, 2, 6), (0, 1, 0))
    img_r, st_r = regen.render_regen(scene, cam, jax.random.key(5),
                                     n_lanes=1024, backend="xla")
    img_p, st_p = renderer.render(scene, cam, key=jax.random.key(9),
                                  mode="scan", backend="xla")
    # same expected image, independent sample sets: means agree within MC noise
    m_r = img_r.mean(axis=(0, 1))
    m_p = img_p.mean(axis=(0, 1))
    np.testing.assert_allclose(m_r, m_p, rtol=0.1, atol=5e-3)
    # identical path counts
    assert st_r["paths"] == 12 * 12 * 49


def test_occupancy_beats_plain_wavefront():
    scene = box_scene()
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=16, max_depth=16)
    cam.position((0, 2, 6), (0, 1, 0))
    _, st = regen.render_regen(scene, cam, jax.random.key(7), n_lanes=256,
                               backend="xla")
    # plain wavefront occupancy here would be avg_len/(depth+1) ~= 0.15;
    # on this tiny workload the queue drains within one window, so the
    # drain tail caps occupancy well below the large-render figure (~0.5)
    assert st["occupancy"] > 0.25
