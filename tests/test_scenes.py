"""Scene construction tests: all eight reference scenes compile to device
tables with the expected primitive counts and light lists (main.go:19-414)."""

import numpy as np
import pytest

from go_raytracer_tpu.scenes import registry


def test_cornell_box_tables():
    scene, cam = registry.cornell_box()
    # 5 walls + 1 light; the two rotated boxes fuse to slab rows
    # (types.Boxes with rotation, round 5)
    assert scene.quads.count == 6
    assert scene.boxes.count == 2 and scene.has_rot_boxes
    assert scene.lights.n == 1
    assert not scene.has_media
    assert cam.width == 600 and cam.max_depth == 50
    assert cam.spp_effective == 100


def test_cornell_smoke_tables():
    scene, cam = registry.cornell_smoke()
    assert scene.quads.count == 6  # walls + light only; boxes became media
    assert scene.media.count == 2
    assert scene.has_media
    assert cam.spp_effective == 9  # floor(sqrt(10))^2 quirk (camera.go:211)


def test_book1_tables():
    scene, cam = registry.book1(seed=3)
    # ground + 3 big + sun + random small spheres
    assert scene.spheres.count > 100
    assert scene.lights.n == 1
    assert scene.textures.kind[0] is not None
    assert cam.defocus_angle == 0.6


def test_book2_tables():
    scene, cam = registry.book2(seed=3)
    # the 400 axis-aligned floor boxes fuse to slab rows (types.Boxes);
    # only the light stays a quad
    assert scene.boxes.count == 20 * 20
    assert scene.quads.count == 1
    # cluster + 6 feature/boundary spheres (the global fog's 5000-radius
    # boundary is NOT in the world — main.go:139-140 adds only the medium)
    assert scene.spheres.count == 1000 + 6
    assert scene.media.count == 2
    assert scene.has_image and scene.has_noise


def test_book3_lights_include_glass_sphere():
    scene, _ = registry.book3()
    assert scene.lights.n == 2


def test_simple_light_single_quad_light():
    scene, _ = registry.simple_light()
    assert scene.lights.n == 1
    assert scene.has_noise


def test_quads_scene():
    scene, cam = registry.quads_scene()
    assert scene.quads.count == 5
    assert scene.has_image
    assert cam.vertical_fov == 80


def test_model_example_procedural_fallback():
    scene, cam = registry.model_example(obj_path="definitely_missing.obj")
    assert scene.triangles.count > 10000
    assert scene.lights.n == 1  # the sun sphere
    assert cam.max_contribution == 2.0


def test_registry_lookup():
    assert registry.get_scene(6)[0] == "cornellBox"
    assert registry.get_scene("cornellBox")[1] is registry.cornell_box
