"""Fused axis-aligned boxes (types.Boxes) vs the six-quad expansion.

The builder fuses an axis-aligned, uv-independent box into one slab-test
row (scene/builder.box). These tests pin the fusion gate and verify the
fused primitive reproduces the six-quad decomposition's hits — t, outward
normal, front_face, material — on both backends.
"""

import jax
import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.render.camera import Camera
from go_raytracer_tpu.render import renderer
from go_raytracer_tpu.scene.builder import SceneBuilder, Transform
from go_raytracer_tpu.ops import trace


def _pair_of_builders(rotate=False):
    """Two identical scenes: fused boxes vs forced six-quad expansion.
    With `rotate`, every box gets a rotate-Y + translate transform (the
    Cornell-box pattern, main.go:297-305) — fused rows then carry the
    rotation columns."""
    scenes = []
    for fuse in (True, False):
        b = SceneBuilder(background=(0.4, 0.5, 0.6))
        white = b.lambertian((0.73, 0.73, 0.73))
        green = b.metal((0.8, 0.85, 0.88), 0.1)
        rng = np.random.default_rng(7)
        for i in range(12):
            lo = rng.uniform(-4, 3, 3)
            hi = lo + rng.uniform(0.3, 1.8, 3)
            if rotate:
                tr = Transform(rotate_y_deg=float(rng.uniform(-80, 80)),
                               translate=tuple(rng.uniform(-1, 1, 3)))
                b.box(lo - (lo + hi) / 2, hi - (lo + hi) / 2,
                      white if i % 2 else green, transform=tr, fuse=fuse)
            else:
                b.box(lo, hi, white if i % 2 else green, fuse=fuse)
        b.sphere((0, -1004.5, 0), 1000.0, white)
        light = b.diffuse_light((8, 8, 8))
        lid = b.quad((-1, 4.5, -1), (2, 0, 0), (0, 0, 2), light)
        b.add_light(lid)
        scenes.append(b.build())
    return scenes


def test_fusion_gate():
    """uv-free boxes fuse (rotated ones carry the rotation row); an
    image texture does not."""
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    img = b.lambertian(tex=b.image_texture(np.full((4, 4, 3), 0.5,
                                                   np.float32)))
    ids = b.box((0, 0, 0), (1, 2, 3), m)
    assert ids == [("box", 0)]
    # rotation fuses too (round 5): object-space bounds + rotation row
    ids = b.box((0, 0, 0), (1, 2, 3), m, transform=Transform(rotate_y_deg=18.0))
    assert ids == [("box", 1)]
    ids = b.box((0, 0, 0), (1, 2, 3), img)
    assert all(k == "quad" for k, _ in ids)
    # translation keeps alignment -> fuses with identity rotation
    ids = b.box((0, 0, 0), (1, 2, 3), m, transform=Transform(translate=(5, 0, 1)))
    assert ids == [("box", 2)]
    scene = b.build()
    assert scene.boxes.count == 3 and scene.has_boxes and scene.has_rot_boxes
    bxn = np.asarray(scene.boxes.sin_t)
    assert bxn[0] == 0.0 and bxn[1] != 0.0 and bxn[2] == 0.0


def test_box_trace_matches_quads():
    """Closest-hit records agree ray-for-ray between the fused table and
    the six-quad expansion (t, normal, front_face, mat), including rays
    born inside a box (exit-face hit)."""
    fused, expanded = _pair_of_builders()
    rng = np.random.default_rng(3)
    n = 4096
    o = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    tm = jnp.zeros((n,), jnp.float32)
    u_med = jnp.full((n, fused.media.count), 0.5, jnp.float32)
    ha = trace.trace(fused, o, d, tm, u_med)
    hb = trace.trace(expanded, o, d, tm, u_med)
    np.testing.assert_array_equal(np.asarray(ha.hit), np.asarray(hb.hit))
    m = np.asarray(ha.hit)
    np.testing.assert_allclose(np.asarray(ha.t)[m], np.asarray(hb.t)[m],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ha.normal)[m],
                               np.asarray(hb.normal)[m], atol=2e-4)
    np.testing.assert_array_equal(np.asarray(ha.front_face)[m],
                                  np.asarray(hb.front_face)[m])
    np.testing.assert_array_equal(np.asarray(ha.mat_id)[m],
                                  np.asarray(hb.mat_id)[m])


def test_rot_box_trace_matches_quads():
    """Rotated fused rows reproduce the baked six-quad decomposition's
    hits — t, outward normal, front_face, material — to FP tolerance
    (the quad path bakes the rotation at build time in f64; the fused row
    rotates the ray at trace time in f32)."""
    fused, expanded = _pair_of_builders(rotate=True)
    assert fused.has_rot_boxes
    rng = np.random.default_rng(5)
    n = 4096
    o = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    tm = jnp.zeros((n,), jnp.float32)
    u_med = jnp.full((n, fused.media.count), 0.5, jnp.float32)
    ha = trace.trace(fused, o, d, tm, u_med)
    hb = trace.trace(expanded, o, d, tm, u_med)
    agree = np.asarray(ha.hit) == np.asarray(hb.hit)
    # razor-thin slab hits may flip under f32 rotation; require near-total
    # agreement and exact attribute parity on the agreeing lanes
    assert agree.mean() > 0.999
    m = np.asarray(ha.hit) & agree
    # skip lanes whose winning t differs (different primitive won by FP)
    ta, tb = np.asarray(ha.t)[m], np.asarray(hb.t)[m]
    same = np.isclose(ta, tb, rtol=1e-4, atol=1e-4)
    assert same.mean() > 0.999
    np.testing.assert_allclose(np.asarray(ha.normal)[m][same],
                               np.asarray(hb.normal)[m][same], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ha.mat_id)[m][same],
                                  np.asarray(hb.mat_id)[m][same])


def test_rot_box_render_matches_quads_pallas_regen():
    """The megakernel's rotated-box candidate (bounce._box_candidate with
    box_rot) agrees with the baked six-quad expansion end-to-end."""
    fused, expanded = _pair_of_builders(rotate=True)
    cam = _cam()
    key = jax.random.key(13)
    ia, _ = regen.render_regen(fused, cam, key, n_lanes=4096,
                               backend="pallas")
    ib, _ = regen.render_regen(expanded, cam, key, n_lanes=4096,
                               backend="pallas")
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=2e-3, atol=2e-3)


def _cam(width=24):
    cam = Camera(width=width, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=6)
    cam.position((6, 3, 8), (0, 0, 0))
    return cam


def test_box_render_matches_quads_wavefront():
    """Same sampling sequence, same hits -> near-identical images through
    the XLA wavefront integrator."""
    fused, expanded = _pair_of_builders()
    cam = _cam()
    key = jax.random.key(11)
    ia, _ = renderer.render(fused, cam, key=key, backend="xla", verbose=False)
    ib, _ = renderer.render(expanded, cam, key=key, backend="xla", verbose=False)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=1e-3, atol=1e-3)


def test_box_render_matches_quads_pallas_regen():
    """The megakernel's box section (bounce._box_candidate) agrees with
    the six-quad expansion through the production regen path."""
    fused, expanded = _pair_of_builders()
    cam = _cam()
    key = jax.random.key(12)
    ia, sa = regen.render_regen(fused, cam, key, n_lanes=4096,
                                backend="pallas")
    ib, sb = regen.render_regen(expanded, cam, key, n_lanes=4096,
                                backend="pallas")
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib),
                               rtol=1e-3, atol=1e-3)
