"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py):
sharded rendering matches single-device rendering, and the sharded
training step runs and reduces loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.parallel import mesh as pmesh
from go_raytracer_tpu.render.camera import Camera
from go_raytracer_tpu.scene.builder import SceneBuilder


def tiny_scene():
    b = SceneBuilder(background=(0.1, 0.15, 0.2))
    b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), b.lambertian((0.6, 0.5, 0.4)))
    b.sphere((0, 1, 0), 1.0, b.metal((0.9, 0.9, 0.9), 0.1))
    q = b.quad((-1, 5, -1), (2, 0, 0), (0, 0, 2), b.diffuse_light((4, 4, 4)))
    b.add_light(q)
    return b.build()


def test_mesh_shapes():
    m = pmesh.make_mesh(8)
    assert m.devices.size == 8
    assert set(m.axis_names) == {"data", "sample"}


def test_sharded_render_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    scene = tiny_scene()
    cam = Camera(width=24, aspect_ratio=1.0, samples_per_pixel=4, max_depth=4)
    cam.position((0, 2, 8), (0, 1, 0))

    m1 = pmesh.make_mesh(1)
    m8 = pmesh.make_mesh(8)
    img1, _ = pmesh.render_sharded(scene, cam, m1, key=jax.random.key(5))
    img8, _ = pmesh.render_sharded(scene, cam, m8, key=jax.random.key(5))
    # same key + partitionable threefry => identical sample streams
    np.testing.assert_allclose(img1, img8, atol=1e-5)


def test_train_step_runs_and_improves():
    scene = tiny_scene()
    cam = Camera(width=8, aspect_ratio=1.0, samples_per_pixel=1, max_depth=2)
    cam.position((0, 2, 8), (0, 1, 0))
    m = pmesh.make_mesh(8)
    with m:
        train_step, params, opt_state, ids = pmesh.make_train_step(
            scene, cam, m, n_rays=64, n_sample_batches=2, max_depth=2,
            learning_rate=5e-2)
        target = jnp.zeros((64, 3), dtype=jnp.float32)
        losses = []
        for i in range(5):
            params, opt_state, loss = train_step(
                params, opt_state, ids, jax.random.key(i), target)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # descending toward the black target


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64 * 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
