"""Pallas bounce megakernel vs the XLA bounce: identical uniforms ->
near-identical outputs (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.integrator import wavefront
from go_raytracer_tpu.ops.pallas import bounce as pb
from go_raytracer_tpu.scene.builder import SceneBuilder


def cornell_like():
    b = SceneBuilder(background=(0.05, 0.1, 0.15))
    red = b.lambertian((0.65, 0.05, 0.05))
    white = b.lambertian((0.73, 0.73, 0.73))
    checker = b.lambertian(tex=b.checker(2.0, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))
    light = b.diffuse_light((15, 15, 15))
    metal = b.metal((0.8, 0.85, 0.9), 0.2)
    glass = b.dielectric(1.5)
    b.quad((555, 0, 0), (0, 555, 0), (0, 0, 555), red)
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), white)
    # checker on the z=555 wall: hits land in cell interiors (a checker on
    # the y=0 floor would put every hit exactly on a cell boundary, where
    # f32 rounding legitimately flips parity between backends)
    b.quad((0, 0, 555), (555, 0, 0), (0, 555, 0), checker)
    lq = b.quad((343, 550, 332), (-130, 0, 0), (0, 0, -105), light)
    b.sphere((190, 90, 190), 90, glass)
    b.sphere((400, 90, 120), 90, metal, center2=(400, 120, 120))
    ls = b.sphere((130, 500, 130), 40, light)
    b.add_light(lq)
    b.add_light(ls)
    return b.build()


def test_supported_flags():
    s = cornell_like()
    assert pb.supported(s)
    # media and noise textures are in-kernel now; image textures and
    # triangles still fall back to XLA
    b = SceneBuilder()
    b.quad((0, 0, 0), (1, 0, 0), (0, 1, 0), b.lambertian(tex=b.noise_texture(1.0)))
    b.add_light(b.quad((0, 0, 5), (1, 0, 0), (0, 1, 0), b.diffuse_light((1, 1, 1))))
    assert pb.supported(b.build())
    b2 = SceneBuilder()
    b2.triangle([(0, 0, 0), (1, 0, 0), (0, 1, 0)], b2.lambertian((0.5, 0.5, 0.5)))
    b2.add_light(b2.quad((0, 0, 5), (1, 0, 0), (0, 1, 0), b2.diffuse_light((1, 1, 1))))
    assert not pb.supported(b2.build())


def test_pallas_bounce_matches_xla_bounce():
    s = cornell_like()
    n = 512
    rs = np.random.default_rng(0)
    o = jnp.asarray(rs.uniform(50, 500, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)) * 300, dtype=jnp.float32)
    t = jnp.asarray(rs.uniform(0, 1, n), dtype=jnp.float32)
    alive = jnp.ones(n, dtype=bool)
    u = jax.random.uniform(jax.random.key(3), (n, wavefront.N_FIXED_U))

    E1, W1, cf1, no1, nd1, na1 = wavefront._bounce(s, o, d, t, alive, u)

    E2, W2, cf2, no2, nd2, na2, _ = pb.bounce(
        pb.pack_scene(s), pb.scene_statics(s), o, d, t, alive, u,
        s.background, interpret=True)

    np.testing.assert_array_equal(np.asarray(na1), np.asarray(na2))
    np.testing.assert_array_equal(np.asarray(cf1), np.asarray(cf2))
    np.testing.assert_allclose(np.asarray(no1), np.asarray(no2), rtol=2e-4, atol=2e-3)
    # weights/emissions agree everywhere; directions only matter on lanes
    # that continue (terminated lanes' directions are don't-care). NaN lanes
    # (e.g. inside-light-sphere pdf quirk) must be NaN in both.
    cont = np.asarray(na1)
    for a, b_, mask in ((E1, E2, None), (W1, W2, None), (nd1, nd2, cont)):
        a = np.asarray(a)
        b_ = np.asarray(b_)
        if mask is not None:
            a, b_ = a[mask], b_[mask]
        nan_a = np.isnan(a)
        assert (nan_a == np.isnan(b_)).all()
        np.testing.assert_allclose(a[~nan_a], b_[~nan_a], rtol=2e-3, atol=2e-3)


def _compare_bounce(s, n=512, seed=0, origin_rng=(50, 500), dir_scale=300,
                    rtol=2e-3, atol=2e-3):
    rs = np.random.default_rng(seed)
    o = jnp.asarray(rs.uniform(*origin_rng, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)) * dir_scale, dtype=jnp.float32)
    t = jnp.asarray(rs.uniform(0, 1, n), dtype=jnp.float32)
    alive = jnp.ones(n, dtype=bool)
    n_u = wavefront.N_FIXED_U + s.media.count
    u = jax.random.uniform(jax.random.key(3), (n, n_u))
    E1, W1, cf1, no1, nd1, na1 = wavefront._bounce(s, o, d, t, alive, u)
    E2, W2, cf2, no2, nd2, na2, img = pb.bounce(
        pb.pack_scene(s), pb.scene_statics(s), o, d, t, alive, u,
        s.background, interpret=True)
    W2 = pb.patch_image_weight(s, W2, img)
    np.testing.assert_array_equal(np.asarray(na1), np.asarray(na2))
    np.testing.assert_array_equal(np.asarray(cf1), np.asarray(cf2))
    np.testing.assert_allclose(np.asarray(no1), np.asarray(no2),
                               rtol=2e-4, atol=2e-3)
    cont = np.asarray(na1)
    for a, b_, mask in ((E1, E2, None), (W1, W2, None), (nd1, nd2, cont)):
        a, b_ = np.asarray(a), np.asarray(b_)
        if mask is not None:
            a, b_ = a[mask], b_[mask]
        nan_a = np.isnan(a)
        assert (nan_a == np.isnan(b_)).all()
        np.testing.assert_allclose(a[~nan_a], b_[~nan_a], rtol=rtol, atol=atol)


def test_pallas_bounce_media_matches_xla():
    """cornellSmoke-class scene: box + sphere constant media resolved
    in-kernel (medium.go:27-58 span + free-flight semantics)."""
    b = SceneBuilder(background=(0, 0, 0))
    white = b.lambertian((0.73, 0.73, 0.73))
    b.quad((555, 0, 0), (0, 555, 0), (0, 0, 555), b.lambertian((0.12, 0.45, 0.15)))
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), white)
    lq = b.quad((343, 550, 332), (-130, 0, 0), (0, 0, -105), b.diffuse_light((7, 7, 7)))
    b.add_light(lq)
    b.constant_medium_box((0, 0, 0), (165, 330, 165), 0.01, albedo=(0, 0, 0),
                          rotate_y_deg=15, translate=(265, 0, 295))
    b.constant_medium_sphere((130, 150, 130), 100, 0.02, albedo=(0.8, 0.4, 0.2))
    s = b.build()
    assert pb.supported(s)
    _compare_bounce(s, seed=5)


def test_pallas_bounce_noise_matches_xla():
    """simpleLight-class scene: marble/perlin/turbulence textures evaluated
    in-kernel with the hash-gradient noise."""
    b = SceneBuilder(background=(0, 0, 0))
    b.sphere((0, -1000, 0), 1000, b.lambertian(tex=b.noise_texture(4, "marble", seed=11)))
    b.sphere((0, 2, 0), 2, b.lambertian(tex=b.noise_texture(1.5, "perlin", seed=12)))
    b.sphere((5, 2, 0), 2, b.lambertian(tex=b.noise_texture(2.0, "turbulent", seed=13)))
    q = b.quad((3, 1, -2), (2, 0, 0), (0, 2, 0), b.diffuse_light((4, 4, 4)))
    b.add_light(q)
    s = b.build()
    assert pb.supported(s)
    # f32 hit-point rounding is amplified ~2^7*10 by the marble formula's
    # 7-octave turbulence + sin, so noise scenes get looser tolerances
    _compare_bounce(s, seed=7, origin_rng=(-8, 8), dir_scale=5,
                    rtol=3e-2, atol=2e-2)


def test_pallas_bounce_block_looped_sections_match_xla():
    """book1-class scene: enough spheres+quads to exercise the fori-loop
    block path (sections larger than UNROLL_ROWS)."""
    rs = np.random.default_rng(2)
    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    for _ in range(3 * pb.UNROLL_ROWS + 5):
        c = rs.uniform(-10, 10, 3)
        b.sphere(tuple(c), rs.uniform(0.2, 0.8),
                 b.lambertian(tuple(rs.uniform(0.1, 0.9, 3))))
    for _ in range(pb.UNROLL_ROWS + 9):
        q = rs.uniform(-10, 10, 3)
        b.quad(tuple(q), (rs.uniform(0.5, 2), 0, 0), (0, rs.uniform(0.5, 2), 0),
               b.metal(tuple(rs.uniform(0.5, 1, 3)), rs.uniform(0, 0.5)))
    lq = b.quad((0, 12, 0), (3, 0, 0), (0, 0, 3), b.diffuse_light((5, 5, 5)))
    b.add_light(lq)
    s = b.build()
    st = pb.scene_statics(s)
    assert st["n_sph"] > pb.UNROLL_ROWS and st["n_quad"] > pb.UNROLL_ROWS
    _compare_bounce(s, seed=9, origin_rng=(-12, 12), dir_scale=8)


def test_pallas_bounce_image_matches_xla():
    """quads-class scene: image textures via the kernel's (uv, id, ratio)
    outputs + the XLA patch_image_weight gather."""
    rs = np.random.default_rng(1)
    img = rs.uniform(0, 1, (16, 24, 3)).astype(np.float32)
    b = SceneBuilder(background=(0.7, 0.8, 1.0))
    earth = b.lambertian(tex=b.image_texture(img))
    b.quad((-3, -2, 5), (0, 0, -4), (0, 4, 0), earth)
    b.sphere((2, 0, 2), 1.5, b.lambertian(tex=b.image_texture(img)))
    b.quad((-2, -3, 5), (4, 0, 0), (0, 0, -4), b.lambertian((0.2, 0.8, 0.8)))
    lq = b.quad((-2, -2, 0), (4, 0, 0), (0, 4, 0), b.diffuse_light((3, 3, 3)))
    b.add_light(lq)
    s = b.build()
    assert pb.supported(s)
    _compare_bounce(s, seed=4, origin_rng=(-6, 6), dir_scale=4)


def test_pallas_radiance_path_matches_xla():
    s = cornell_like()
    n = 256
    o = jnp.tile(jnp.asarray([[278.0, 278.0, -800.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 800.0]]), (n, 1)) + \
        jax.random.normal(jax.random.key(1), (n, 3)) * 150
    t = jnp.zeros(n)
    key = jax.random.key(7)
    L_xla, st1 = wavefront.radiance(s, o, d, t, key, 8, 1.5,
                                    mode="scan", backend="xla")
    L_pl, st2 = wavefront.radiance(s, o, d, t, key, 8, 1.5,
                                   mode="scan", backend="pallas")
    a = np.nan_to_num(np.asarray(L_xla))
    b = np.nan_to_num(np.asarray(L_pl))
    # path tracing is chaotic: a near-tie hit decided differently by f32
    # rounding sends the rest of that path elsewhere. Require the vast
    # majority of lanes to agree tightly and the means to match.
    close = np.abs(a - b) <= 5e-3 + 5e-3 * np.abs(a)
    assert close.mean() > 0.97, f"only {close.mean():.3f} lanes agree"
    np.testing.assert_allclose(a.mean(0), b.mean(0), rtol=2e-2, atol=2e-3)
    assert abs(int(st1["segments"]) - int(st2["segments"])) <= \
        0.01 * int(st1["segments"]) + 8


def test_pallas_bounce_kitchen_sink_matches_xla():
    """Every feature at once — all five materials, checker + all three
    noise variants + image + solid textures, two media, fused boxes, a
    motion sphere — so the scene-specialized shared material columns
    (bounce._mat_layout: fuzz|ref_idx, inv_scale|noise scale,
    seed|image id, albedo folded into even/odd) are exercised against
    each other in one table."""
    b = SceneBuilder(background=(0.02, 0.03, 0.05))
    img = np.zeros((8, 8, 3), np.float32)
    img[::2, ::2] = (1.0, 0.4, 0.2)
    mats = [
        b.lambertian((0.6, 0.5, 0.4)),
        b.lambertian(tex=b.checker(55.0, (0.1, 0.6, 0.2), (0.9, 0.8, 0.1))),
        b.lambertian(tex=b.noise_texture(0.02, "perlin", seed=5)),
        b.lambertian(tex=b.noise_texture(0.02, "marble", seed=6)),
        b.lambertian(tex=b.noise_texture(0.02, "turbulent", seed=7)),
        b.lambertian(tex=b.image_texture(img)),
        b.metal((0.9, 0.7, 0.6), 0.3),
        b.dielectric(1.7),
    ]
    light = b.diffuse_light((9, 9, 9))
    b.quad((555, 0, 0), (0, 555, 0), (0, 0, 555), mats[1])
    b.quad((0, 0, 555), (555, 0, 0), (0, 555, 0), mats[2])
    b.sphere((190, 90, 190), 80, mats[3])
    b.sphere((400, 90, 120), 70, mats[6], center2=(400, 130, 120))
    b.sphere((120, 420, 300), 60, mats[7])
    b.sphere((300, 300, 300), 50, mats[5])
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), mats[4])
    b.box((80, 0, 80), (200, 110, 200), mats[0])          # fused
    b.box((320, 0, 330), (430, 160, 440), mats[6])        # fused, metal
    lq = b.quad((343, 550, 332), (-130, 0, 0), (0, 0, -105), light)
    b.add_light(lq)
    b.constant_medium_sphere((450, 60, 450), 55, 0.01, albedo=(0.9, 0.9, 0.9))
    b.constant_medium_box((30, 0, 380), (140, 120, 500), 0.008,
                          albedo=(0.6, 0.7, 0.9), rotate_y_deg=12.0,
                          translate=(10, 0, -5))
    s = b.build()
    assert s.has_boxes and s.boxes.count == 2
    assert pb.supported(s)
    # slightly wider tolerance than the per-feature tests: grazing box
    # edges can pick a different face axis between the XLA divide and the
    # kernel's multiply-by-reciprocal slab forms (few lanes, ~1e-2)
    _compare_bounce(s, n=1024, seed=11, rtol=2e-2, atol=2e-2)


def test_pallas_bounce_hollow_bubble_sphere_matches_xla():
    """Negative-radius bubble (hollow glass, RTiOW 11.5): the deferred
    sphere-normal resolve divides by the SIGNED radius, so the bubble's
    inward-facing outward normal and front flag must survive the slim
    carry (sign test (root*|d|^2 - h)*r)."""
    b = SceneBuilder(background=(0.3, 0.4, 0.5))
    glass = b.dielectric(1.5)
    white = b.lambertian((0.7, 0.7, 0.7))
    b.sphere((0, 0, -3), 1.0, glass)
    b.sphere((0, 0, -3), -0.85, glass)     # bubble shell
    b.sphere((0, -101, 0), 100.0, white)
    b.add_light(b.quad((-1, 4, -4), (2, 0, 0), (0, 0, 2),
                       b.diffuse_light((6, 6, 6))))
    s = b.build()
    _compare_bounce(s, n=512, seed=2, origin_rng=(-4, 4), dir_scale=3)
