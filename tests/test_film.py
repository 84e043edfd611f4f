"""Film/tonemap tests mirroring the reference's PrintColor cases
(vec/color.go:23-46, vec_test.go:140-154)."""

import os

import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.render import film


def test_tonemap_reference_case():
    # reference test expectation: (0, 1, 1.5) -> "0 255 255" after gamma+clamp
    out = np.asarray(film.tonemap(jnp.asarray([[0.0, 1.0, 1.5]])))
    assert out.tolist() == [[0, 255, 255]]


def test_tonemap_nan_goes_black():
    out = np.asarray(film.tonemap(jnp.asarray([[float("nan"), 0.25, float("nan")]])))
    assert out.tolist() == [[0, 128, 0]]


def test_tonemap_negative_clamped():
    out = np.asarray(film.tonemap(jnp.asarray([[-1.0, 0.0, 0.04]])))
    # sqrt(0.04)=0.2 -> 51.2 -> 51
    assert out.tolist() == [[0, 0, 51]]


def test_tonemap_infinity_saturates():
    out = np.asarray(film.tonemap(jnp.asarray([[float("inf"), 1e9, 1.0]])))
    assert out.tolist() == [[255, 255, 255]]


def test_ppm_roundtrip(tmp_path):
    img = np.asarray([[[0, 128, 255], [1, 2, 3]]], dtype=np.int32)
    path = os.path.join(tmp_path, "t.ppm")
    film.write_ppm(path, img)
    with open(path) as fh:
        content = fh.read().split()
    assert content[:4] == ["P3", "2", "1", "255"]
    assert content[4:] == ["0", "128", "255", "1", "2", "3"]


def test_png_write(tmp_path):
    img = np.zeros((4, 4, 3), dtype=np.int32)
    img[..., 0] = 200
    path = os.path.join(tmp_path, "t.png")
    film.write_png(path, img)
    from PIL import Image

    back = np.asarray(Image.open(path))
    assert back.shape == (4, 4, 3)
    assert back[0, 0, 0] == 200
