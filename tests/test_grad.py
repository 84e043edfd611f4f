"""Differentiability: gradients of rendered radiance w.r.t. scene
parameters, checked against central finite differences (BASELINE.md
gradient-parity target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.integrator import wavefront
from go_raytracer_tpu.parallel import mesh as pmesh
from go_raytracer_tpu.scene.builder import SceneBuilder


def _scene():
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), b.lambertian((0.6, 0.5, 0.4)))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), b.diffuse_light((3, 3, 3)))
    b.add_light(q)
    return b.build()


def _render_mean(scene, params, key, n=512, depth=4):
    sc = pmesh.apply_params(scene, params)
    o = jnp.tile(jnp.asarray([[0.0, 2.0, 3.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.05, -0.6, -1.0]]), (n, 1))
    t = jnp.zeros(n)
    L, _ = wavefront.radiance(sc, o, d, t, key, depth, 1.5, mode="scan")
    return L.mean()


def test_grad_matches_finite_differences():
    scene = _scene()
    params = pmesh.extract_params(scene)
    key = jax.random.key(11)

    f = lambda p: _render_mean(scene, p, key)
    g = jax.grad(f)(params)

    # check the ground albedo's red channel and the light's red emission
    for path, idx in [("tex_color", (0, 0)), ("tex_color", (1, 0))]:
        eps = 1e-2
        p_plus = jax.tree_util.tree_map(lambda x: x, params)
        p_minus = jax.tree_util.tree_map(lambda x: x, params)
        p_plus[path] = params[path].at[idx].add(eps)
        p_minus[path] = params[path].at[idx].add(-eps)
        fd = (float(f(p_plus)) - float(f(p_minus))) / (2 * eps)
        an = float(g[path][idx])
        # same RNG key -> same paths -> FD is exact up to smoothness of the
        # clamp; the estimator is continuous in albedo/emission.
        assert an == pytest.approx(fd, rel=5e-2, abs=1e-4), (path, idx)
        assert abs(an) > 1e-5, f"gradient unexpectedly zero for {path}{idx}"


def test_grad_background():
    scene = _scene()
    params = pmesh.extract_params(scene)
    key = jax.random.key(3)
    f = lambda p: _render_mean(scene, p, key)
    g = jax.grad(f)(params)
    # paths that bounce off the finite ground quad and escape carry
    # nonzero throughput into the background term, so the gradient is
    # strictly positive in every channel
    assert float(jnp.abs(g["background"]).min()) > 1e-6
    assert bool(jnp.isfinite(g["background"]).all())


def _fd_check(f, params, path, idx, eps, rel, abs_tol=1e-4, min_mag=1e-5):
    g = jax.grad(f)(params)
    p_plus = dict(params)
    p_minus = dict(params)
    p_plus[path] = params[path].at[idx].add(eps)
    p_minus[path] = params[path].at[idx].add(-eps)
    fd = (float(f(p_plus)) - float(f(p_minus))) / (2 * eps)
    an = float(g[path][idx])
    assert np.isfinite(an), (path, idx)
    assert an == pytest.approx(fd, rel=rel, abs=abs_tol), (path, idx, an, fd)
    assert abs(an) > min_mag, f"gradient unexpectedly zero for {path}{idx}"


def test_grad_fuzz_matches_fd():
    """Metal fuzz is reparameterized (reflect + fuzz * unit_vec): the
    pathwise gradient flows fuzz -> bounce direction -> diffuse-wall hit
    point -> smoothly varying light-sampling geometry. Checked against
    central differences with common random numbers."""
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    b.quad((-20, 0, -20), (40, 0, 0), (0, 0, 40),
           b.metal((0.9, 0.9, 0.9), 0.3))                # fuzzy floor
    b.quad((-20, -20, -8), (40, 0, 0), (0, 40, 0),
           b.lambertian((0.7, 0.7, 0.7)))                # back wall
    # ceiling light FACING DOWN so wall-scattered rays see its front face;
    # the wall hit point (a smooth function of fuzz via the bounce
    # direction) then modulates the light-sampling pdf smoothly
    q = b.quad((-1, 7, -5), (2, 0, 0), (0, 0, 2), b.diffuse_light((8, 8, 8)))
    b.add_light(q)
    scene = b.build()
    params = pmesh.extract_params(scene)

    def f(p):
        sc = pmesh.apply_params(scene, p)
        n = 4096
        o = jnp.tile(jnp.asarray([[0.0, 3.0, 4.0]]), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, -0.55, -1.0]]), (n, 1))
        L, _ = wavefront.radiance(sc, o, d, jnp.zeros(n), jax.random.key(7),
                                  3, 10.0, mode="scan")
        return jnp.nan_to_num(L).mean()

    _fd_check(f, params, "fuzz", (0,), eps=2e-3, rel=0.15, abs_tol=2e-3,
              min_mag=1e-4)


def test_grad_ref_idx_matches_fd():
    """Dielectric index gradient through the Schlick reflect/refract
    choice: the score-function factor (value 1, gradient L * dlog p) makes
    the branch probability differentiable. Validated on a configuration
    whose ONLY ref_idx sensitivity is that branch probability — a glass
    pane between two infinite emissive planes of different brightness
    (deterministic boundary terms like moving TIR/silhouette edges are
    edge-sampling territory and explicitly out of scope). FD is averaged
    over independent sample sets since branch flips make the two
    estimators agree only in expectation."""
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    # dim emissive "floor" below the pane, bright emissive "ceiling" above
    b.quad((-200, 0, -200), (400, 0, 0), (0, 0, 400), b.diffuse_light((1, 1, 1)))
    b.quad((-100, 2.5, -100), (0, 0, 200), (200, 0, 0), b.dielectric(1.5))
    q = b.quad((-200, 9, 200), (0, 0, -400), (400, 0, 0), b.diffuse_light((3, 3, 3)))
    b.add_light(q)
    scene = b.build()
    params = pmesh.extract_params(scene)
    from go_raytracer_tpu.scene import types as T
    diel = int(np.argmax(np.asarray(scene.materials.kind) == T.MAT_DIELECTRIC))
    n = 8192

    def f(p, key_i):
        sc = pmesh.apply_params(scene, p)
        o = jnp.tile(jnp.asarray([[0.0, 5.0, 6.0]]), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, -0.6, -1.0]]), (n, 1)) + \
            jax.random.normal(jax.random.key(100 + key_i), (n, 3)) * 0.1
        L, _ = wavefront.radiance(sc, o, d, jnp.zeros(n),
                                  jax.random.key(200 + key_i), 3, 10.0,
                                  mode="scan")
        return jnp.nan_to_num(L).mean()

    gf = jax.jit(jax.grad(lambda p, k: f(p, k)), static_argnums=1)
    fj = jax.jit(f, static_argnums=1)
    K = 6
    eps = 1e-2
    ads, fds = [], []
    for k in range(K):
        ads.append(float(gf(params, k)["ref_idx"][diel]))
        pp = dict(params)
        pm = dict(params)
        pp["ref_idx"] = params["ref_idx"].at[diel].add(eps)
        pm["ref_idx"] = params["ref_idx"].at[diel].add(-eps)
        fds.append((float(fj(pp, k)) - float(fj(pm, k))) / (2 * eps))
    ad, fd = float(np.mean(ads)), float(np.mean(fds))
    assert np.isfinite(ad) and abs(ad) > 1e-3
    assert ad == pytest.approx(fd, rel=0.2, abs=0.02), (ad, fd)


def test_grad_medium_density_matches_fd():
    """Constant-medium density gradient via the transit-likelihood score
    channel (sampled distances are stop_grad'd, so this is the only
    density channel — no double counting)."""
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    b.constant_medium_box((-2, -2, -2), (2, 2, 2), 0.4, albedo=(0.8, 0.8, 0.8))
    q = b.quad((-3, -3, -6), (6, 0, 0), (0, 6, 0), b.diffuse_light((4, 4, 4)))
    b.add_light(q)
    scene = b.build()
    params = pmesh.extract_params(scene)

    def f(p):
        sc = pmesh.apply_params(scene, p)
        n = 8192
        o = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1)) + \
            jax.random.normal(jax.random.key(4), (n, 3)) * 0.1
        L, _ = wavefront.radiance(sc, o, d, jnp.zeros(n), jax.random.key(5),
                                  6, 1.5, mode="scan")
        return jnp.nan_to_num(L).mean()

    # param is -1/density; denser fog attenuates the light behind it
    _fd_check(f, params, "med_neg_inv_density", (0,), eps=2e-2, rel=0.15,
              abs_tol=2e-3)


def test_grad_camera_translation_matches_fd():
    """Camera-origin gradient: translating the camera shifts `center` and
    `pixel00` together; everything downstream is the differentiable
    wavefront."""
    scene = _scene()
    cam_arrays = None

    from go_raytracer_tpu.render import camera as camera_mod
    from go_raytracer_tpu.render.camera import Camera
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=1, max_depth=3,
                 vertical_fov=60)
    cam.position((0, 2.5, 4), (0, 0, 0))
    cam_arrays = cam.derived()
    ids = jnp.arange(16 * 16, dtype=jnp.int32)

    def f_delta(delta):
        arr = cam_arrays.replace(center=cam_arrays.center + delta,
                                 pixel00=cam_arrays.pixel00 + delta)
        o, d, t = camera_mod.generate_rays(arr, 16, ids, jnp.zeros(()),
                                           jnp.zeros(()), jax.random.key(6))
        L, _ = wavefront.radiance(scene, o, d, t, jax.random.key(8), 3, 1.5,
                                  mode="scan")
        return jnp.nan_to_num(L).mean()

    g = jax.grad(f_delta)(jnp.zeros(3))
    assert bool(jnp.isfinite(g).all())
    for axis in range(3):
        eps = 1e-3
        e = jnp.zeros(3).at[axis].set(eps)
        fd = (float(f_delta(e)) - float(f_delta(-e))) / (2 * eps)
        assert float(g[axis]) == pytest.approx(fd, rel=0.1, abs=1e-3), axis
    assert float(jnp.abs(g).max()) > 1e-4


def test_grad_is_deterministic():
    scene = _scene()
    params = pmesh.extract_params(scene)
    key = jax.random.key(5)
    g1 = jax.grad(lambda p: _render_mean(scene, p, key))(params)
    g2 = jax.grad(lambda p: _render_mean(scene, p, key))(params)
    for k in g1:
        np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g2[k]))


def test_grad_scale_cornell_fd():
    """Scale regression for GRAD.md's FD table (VERDICT round-4 item 5):
    the pathwise-tight parameter rows (albedo, emission, background) on
    the REAL cornellBox scene at 64x64 @ 8spp, depth 10 — the config
    class where round 4 found two backward-poisoning NaN bugs that toy
    scenes missed."""
    from go_raytracer_tpu.render import camera as camera_mod
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.cornell_box()
    cam.width = 64
    cam.aspect_ratio = 1.0
    cam.samples_per_pixel = 8
    cam.max_depth = 10
    arrays = cam.derived()
    w = cam.width
    npix = w * cam.image_height
    sqrt_spp = cam.spp_sqrt
    n_strata = sqrt_spp * sqrt_spp
    ids = jnp.tile(jnp.arange(npix, dtype=jnp.int32), n_strata)
    st = jnp.repeat(jnp.arange(n_strata, dtype=jnp.int32), npix)
    s_i = (st // sqrt_spp).astype(jnp.float32)
    s_j = (st % sqrt_spp).astype(jnp.float32)
    key = jax.random.key(5)
    params = pmesh.extract_params(scene)

    def f(p):
        sc = pmesh.apply_params(scene, p)
        k_rays, k_path = jax.random.split(key)
        o, d, t = camera_mod.generate_rays(arrays, w, ids, s_i, s_j, k_rays)
        L, _ = wavefront.radiance(sc, o, d, t, k_path, cam.max_depth,
                                  cam.max_contribution, mode="scan")
        return jnp.nan_to_num(L).mean()

    g = jax.jit(jax.grad(f))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.isfinite(leaf).all())
    f_j = jax.jit(f)

    def fd(path, idx, eps):
        def shift(sign):
            p2 = dict(params)
            p2[path] = params[path].at[idx].add(sign * eps)
            return float(f_j(p2))
        return (shift(+1) - shift(-1)) / (2 * eps)

    # white-wall albedo R (texture row 0), light emission R, background G
    emit_rows = np.where(np.asarray(scene.materials.kind) == 3)[0]
    emit_tex = int(np.asarray(scene.materials.tex_id)[emit_rows[0]])
    checks = [
        ("tex_color", (0, 0), 1e-2, 0.05),
        ("tex_color", (emit_tex, 0), 1e-1, 0.05),
        ("background", (1,), 1e-2, 0.05),
    ]
    for path, idx, eps, rel in checks:
        a = float(g[path][idx])
        d_fd = fd(path, idx, eps)
        assert a == pytest.approx(d_fd, rel=rel, abs=5e-5), (path, idx)


def _cam_grad_vs_fd(scene, eps=1e-3, n=4096, depth=3):
    """Camera-x translation: (analytic, FD) through the scan wavefront
    with common random numbers."""
    from go_raytracer_tpu.render import camera as camera_mod
    from go_raytracer_tpu.render.camera import Camera

    cam = Camera(width=64, aspect_ratio=1.0, samples_per_pixel=1,
                 max_depth=depth, vertical_fov=50)
    cam.position((0, 0, 6), (0, 0, 0))
    arrays = cam.derived()
    ids = jnp.arange(64 * 64, dtype=jnp.int32)

    def f(dx):
        delta = jnp.asarray([dx, 0.0, 0.0]) if jnp.ndim(dx) == 0 else dx
        arr = arrays.replace(center=arrays.center + delta,
                             pixel00=arrays.pixel00 + delta)
        o, d, t = camera_mod.generate_rays(arr, 64, ids, jnp.zeros(()),
                                           jnp.zeros(()), jax.random.key(6))
        L, _ = wavefront.radiance(scene, o, d, t, jax.random.key(8), depth,
                                  1.5, mode="scan")
        return jnp.nan_to_num(L).mean()

    g = float(jax.grad(f)(jnp.zeros(())))
    fd = (float(f(jnp.asarray(eps))) - float(f(jnp.asarray(-eps)))) / (2 * eps)
    return g, fd


def test_grad_camera_boundary_term_controlled():
    """VERDICT round-4 item 6: the camera-origin FD gap is a moving-
    discontinuity boundary term, not a bug. A FLAT-radiance scene (black
    sphere, constant background, no textures) makes the decomposition
    exact: every value a path computes is independent of the camera
    origin, so the TRUE interior (pathwise) derivative is zero and
    everything FD measures is the silhouette boundary term — pixel-flip
    quanta of size jump/(n_pixels * 2eps) under common random numbers.
    The analytic gradient must be ~0 (machine noise) while FD is
    dominated by at least one silhouette flip. The silhouette-FREE
    counterpart (test_grad_camera_translation_matches_fd) shows the
    opposite regime: shading varies, no silhouette, analytic == FD."""
    from go_raytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder(background=(2.0, 2.0, 2.0))
    b.sphere((0.8, 0.0, 0.0), 1.0, b.lambertian((0.02, 0.02, 0.02)))
    q = b.quad((50, 50, 50), (1, 0, 0), (0, 1, 0), b.diffuse_light((1, 1, 1)))
    b.add_light(q)
    g_s, fd_s = _cam_grad_vs_fd(b.build())
    # interior derivative: exactly zero up to accumulation noise
    assert abs(g_s) < 1e-6, g_s
    # FD: carries at least one boundary flip (one pixel's jump of ~2
    # radiance over 4096 pixels across 2e-3 of translation ~ 0.24)
    assert abs(fd_s) > 0.05, fd_s


def test_grad_camera_boundary_term_scales_with_jump():
    """Companion scaling check: with the geometry (and therefore the
    set of silhouette pixel flips under common random numbers) held
    FIXED, the FD residual must scale LINEARLY in the silhouette
    radiance jump. Scaling the background brightness of the black-
    sphere scene scales the jump exactly; the measured residual ratio
    matches the brightness ratio — boundary-term behaviour, not
    noise."""
    from go_raytracer_tpu.scene.builder import SceneBuilder

    resids = []
    for bg in (0.6, 2.0):
        b = SceneBuilder(background=(bg,) * 3)
        b.sphere((0.8, 0.0, 0.0), 1.0, b.lambertian((0.02,) * 3))
        q = b.quad((50, 50, 50), (1, 0, 0), (0, 1, 0),
                   b.diffuse_light((1, 1, 1)))
        b.add_light(q)
        g, fd = _cam_grad_vs_fd(b.build())
        assert abs(g) < 1e-6  # interior derivative stays ~0 throughout
        resids.append(abs(fd - g))
    ratio = resids[1] / resids[0]
    assert ratio == pytest.approx(2.0 / 0.6, rel=0.1), resids
