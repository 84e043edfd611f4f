"""Golden regression test: a small deterministic Cornell render must stay
bit-stable (same key, same platform/dtype) across refactors. Regenerate
with tests/golden/regen.py only for intentional semantic changes."""

import os

import jax
import numpy as np

from go_raytracer_tpu.render import renderer
from go_raytracer_tpu.scenes import registry

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cornell_32.npz")


def test_cornell_golden_regression():
    scene, cam = registry.cornell_box()
    cam.width = 32
    cam.samples_per_pixel = 4
    cam.max_depth = 4
    img, _ = renderer.render(scene, cam, key=jax.random.key(42),
                             mode="scan", backend="xla")
    ref = np.load(GOLDEN)["img"]
    # same threefry stream + same op graph: tight tolerance (allows minor
    # XLA scheduling differences, catches any semantic drift)
    np.testing.assert_allclose(np.asarray(img), ref, rtol=1e-4, atol=1e-5)
