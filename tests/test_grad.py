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


def test_grad_is_deterministic():
    scene = _scene()
    params = pmesh.extract_params(scene)
    key = jax.random.key(5)
    g1 = jax.grad(lambda p: _render_mean(scene, p, key))(params)
    g2 = jax.grad(lambda p: _render_mean(scene, p, key))(params)
    for k in g1:
        np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g2[k]))
