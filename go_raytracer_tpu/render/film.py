"""Film: tonemap + image writers.

Tonemap semantics match PrintColor (internal/vec/color.go:23-46) exactly:
per-component NaN -> 0, gamma-2 via sqrt (non-positive -> 0), clamp to
[0, 0.99999], scale by 256 and truncate to int.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def tonemap(linear: jnp.ndarray) -> jnp.ndarray:
    """Linear radiance (..., 3) -> uint8-valued int32 in [0, 255]."""
    c = jnp.nan_to_num(linear, nan=0.0, posinf=jnp.inf, neginf=-jnp.inf)
    c = jnp.where(c > 0, jnp.sqrt(jnp.maximum(c, 0.0)), 0.0)  # color.go:14-19
    c = jnp.clip(c, 0.0, 0.99999)                              # color.go:11,41-43
    return (c * 256.0).astype(jnp.int32)


def write_ppm(path: str, rgb: np.ndarray):
    """P3 PPM matching the reference output layout (camera.go:160,
    color.go:45): header then one 'r g b' line per pixel."""
    rgb = np.asarray(rgb)
    h, w, _ = rgb.shape
    with open(path, "w") as fh:
        fh.write(f"P3\n{w} {h}\n255\n")
        flat = rgb.reshape(-1, 3)
        fh.write("\n".join(f"{r} {g} {b}" for r, g, b in flat))
        fh.write("\n")


def write_png(path: str, rgb: np.ndarray):
    from PIL import Image

    Image.fromarray(np.asarray(rgb, dtype=np.uint8)).save(path)


def write_image(path: str, rgb: np.ndarray):
    if path.endswith(".ppm"):
        write_ppm(path, rgb)
    else:
        write_png(path, rgb)
