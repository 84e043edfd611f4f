"""Regenerate the golden render after an intentional semantic change:
    python tests/golden/regen.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from go_raytracer_tpu.render import renderer  # noqa: E402
from go_raytracer_tpu.scenes import registry  # noqa: E402

scene, cam = registry.cornell_box()
cam.width = 32
cam.samples_per_pixel = 4
cam.max_depth = 4
img, _ = renderer.render(scene, cam, key=jax.random.key(42), mode="scan",
                         backend="xla")
np.savez_compressed("tests/golden/cornell_32.npz", img=np.asarray(img))
print("golden regenerated:", img.shape)
