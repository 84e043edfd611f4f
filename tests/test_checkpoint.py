"""Checkpoint/resume tests (render/checkpoint.py + renderer integration)."""

import os

import jax
import numpy as np

from go_raytracer_tpu.render import checkpoint, renderer
from go_raytracer_tpu.render.camera import Camera
from go_raytracer_tpu.scene.builder import SceneBuilder


def scene_and_cam():
    b = SceneBuilder(background=(0.1, 0.2, 0.3))
    b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), b.lambertian((0.6, 0.6, 0.6)))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), b.diffuse_light((5, 5, 5)))
    b.add_light(q)
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 2, 8), (0, 1, 0))
    return b.build(), cam


def test_save_load_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")
    acc = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    meta = {"scene": np.bytes_(b"test"), "width": 8, "height": 8,
            "spp": 9, "max_depth": 4}
    checkpoint.save(path, acc, 5, meta)
    loaded = checkpoint.load(path)
    assert loaded is not None
    acc2, nxt, meta2 = loaded
    np.testing.assert_array_equal(acc, acc2)
    assert nxt == 5
    assert checkpoint.compatible(meta2, meta)


def test_incompatible_meta_rejected(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")
    meta_a = {"scene": np.bytes_(b"a"), "width": 8, "height": 8,
              "spp": 9, "max_depth": 4}
    meta_b = dict(meta_a, width=16)
    checkpoint.save(path, np.zeros((4, 3)), 1, meta_a)
    _, _, loaded_meta = checkpoint.load(path)
    assert not checkpoint.compatible(loaded_meta, meta_b)


def test_corrupt_checkpoint_ignored(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")
    with open(path, "wb") as fh:
        fh.write(b"not an npz")
    assert checkpoint.load(path) is None


def test_resumed_render_matches_uninterrupted(tmp_path):
    """Render with per-group checkpointing, then resume from a mid-way
    checkpoint: the final image must equal the uninterrupted render."""
    scene, cam = scene_and_cam()
    key = jax.random.key(11)

    img_full, _ = renderer.render(scene, cam, key=key, mode="scan",
                                  backend="xla", strata_per_launch=3)

    # simulate a crash right after the first checkpoint write
    path = os.path.join(tmp_path, "r.npz")
    real_save = checkpoint.save
    calls = {"n": 0}

    def crashing_save(*a, **kw):
        real_save(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt("simulated preemption")

    checkpoint.save = crashing_save
    try:
        import pytest

        with pytest.raises(KeyboardInterrupt):
            renderer.render(scene, cam, key=key, mode="scan", backend="xla",
                            strata_per_launch=3, checkpoint_path=path,
                            checkpoint_every=1, scene_name="t")
    finally:
        checkpoint.save = real_save

    _, groups_done, _ = checkpoint.load(path)
    assert groups_done == 1  # only the first group landed

    # resume: must complete the remaining groups and match the full render
    img_resumed, _ = renderer.render(scene, cam, key=key, mode="scan",
                                     backend="xla", strata_per_launch=3,
                                     checkpoint_path=path,
                                     checkpoint_every=1, scene_name="t")
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)
