"""Thin-lens camera with stratified sampling and motion-blur ray times.

Reproduces the reference camera's configuration surface and viewport math
(camera/camera.go:24-62 public fields, 179-253 initialize, 256-290 ray
generation) as a pure function: a batch of (pixel index, stratum) pairs and
an RNG key map to a bundle of rays. Effective spp is floor(sqrt(spp))^2
exactly as in the reference (camera.go:211-212).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.core import rng, vecmath as vm

Vec = Tuple[float, float, float]


@dataclasses.dataclass
class Camera:
    """Public configuration mirrors camera.go:24-36; zero values take the
    reference defaults in `initialize` (camera.go:179-207)."""

    aspect_ratio: float = 1.0
    width: int = 100
    samples_per_pixel: int = 100
    max_depth: int = 10
    vertical_fov: float = 90.0
    defocus_angle: float = 0.0
    focus_distance: float = 10.0
    background: Vec = (0.0, 0.0, 0.0)
    max_contribution: float = 1.5
    # regeneration start cadence hint (0 = renderer default). Tuned per
    # scene: closed scenes with long paths (Cornell) amortize best at 4;
    # open scenes whose paths die in 1-2 bounces idle dead lanes between
    # restarts and run ~1.5-1.8x faster at 2 (docs/PERFORMANCE.md).
    regen_cadence: int = 0
    # measured mean path length (traced segments per path) for this scene's
    # reference config; sizes the in-kernel-queue window so one window
    # covers the whole render (regen._auto_refill). 0 = generic default.
    regen_len: float = 0.0

    look_from: Vec = (0.0, 0.0, 0.0)
    look_at: Vec = (0.0, 0.0, -1.0)
    vup: Vec = (0.0, 1.0, 0.0)

    def position(self, look_from: Vec, look_at: Vec, vup: Vec = (0, 1, 0)):
        """PositionCamera (camera.go:65-81)."""
        self.look_from = tuple(look_from)
        self.look_at = tuple(look_at)
        self.vup = tuple(vup)
        return self

    # -------------------------------------------------------------- derived
    @property
    def image_height(self) -> int:
        return max(1, int(self.width / self.aspect_ratio))  # camera.go:209

    @property
    def spp_sqrt(self) -> int:
        return int(math.sqrt(self.samples_per_pixel))  # camera.go:211

    @property
    def spp_effective(self) -> int:
        return self.spp_sqrt * self.spp_sqrt

    def derived(self, dtype=jnp.float32) -> "CameraArrays":
        """Viewport math (camera.go:215-246) in float64 on host, cast last."""
        lf = np.asarray(self.look_from, dtype=np.float64)
        la = np.asarray(self.look_at, dtype=np.float64)
        vup = np.asarray(self.vup, dtype=np.float64)

        h = math.tan(math.radians(self.vertical_fov) / 2.0)
        vp_h = 2.0 * h * self.focus_distance
        vp_w = vp_h * (self.width / self.image_height)

        w = lf - la
        w /= np.linalg.norm(w)
        u = np.cross(vup, w)
        u /= np.linalg.norm(u)
        v = np.cross(w, u)

        viewport_u = u * vp_w
        viewport_v = -v * vp_h
        du = viewport_u / self.width
        dv = viewport_v / self.image_height
        top_left = lf - w * self.focus_distance - viewport_u / 2 - viewport_v / 2
        pixel00 = top_left + 0.5 * (du + dv)

        defocus_radius = self.focus_distance * math.tan(
            math.radians(self.defocus_angle / 2.0))
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return CameraArrays(
            center=f(lf), pixel00=f(pixel00), du=f(du), dv=f(dv),
            defocus_u=f(u * defocus_radius), defocus_v=f(v * defocus_radius),
            defocus_angle=self.defocus_angle,
            recip_spp_sqrt=1.0 / self.spp_sqrt,
        )


import flax.struct as _struct


@_struct.dataclass
class CameraArrays:
    """Derived camera tables as a pytree so jitted render loops can take the
    camera as an argument (defocus_angle gates a python branch and
    recip_spp_sqrt is baked into ray math -> static fields)."""

    center: jnp.ndarray
    pixel00: jnp.ndarray
    du: jnp.ndarray
    dv: jnp.ndarray
    defocus_u: jnp.ndarray
    defocus_v: jnp.ndarray
    defocus_angle: float = _struct.field(pytree_node=False, default=0.0)
    recip_spp_sqrt: float = _struct.field(pytree_node=False, default=0.1)


def generate_rays(arrays: CameraArrays, width: int, pixel_ids: jnp.ndarray,
                  s_i: jnp.ndarray, s_j: jnp.ndarray, key: jax.Array,
                  dtype=jnp.float32):
    """Rays for flat pixel ids (row-major j*width+i) at stratum (s_i, s_j).

    getRay (camera.go:256-270): stratified jitter in the pixel footprint,
    optional defocus-disk origin, uniform ray time for motion blur.
    """
    n = pixel_ids.shape[0]
    i = (pixel_ids % width).astype(dtype)
    j = (pixel_ids // width).astype(dtype)
    u = jax.random.uniform(key, (n, 5), dtype=dtype)

    # sampleSquareStratified (camera.go:277-282)
    off_x = (s_i + u[:, 0]) * arrays.recip_spp_sqrt - 0.5
    off_y = (s_j + u[:, 1]) * arrays.recip_spp_sqrt - 0.5

    pixel_sample = (arrays.pixel00[None, :]
                    + (i + off_x)[:, None] * arrays.du[None, :]
                    + (j + off_y)[:, None] * arrays.dv[None, :])

    if arrays.defocus_angle > 0:
        disk = rng.unit_disk(u[:, 2], u[:, 3])  # defocusDiskSample (camera.go:285-290)
        origin = (arrays.center[None, :]
                  + disk[:, 0:1] * arrays.defocus_u[None, :]
                  + disk[:, 1:2] * arrays.defocus_v[None, :])
    else:
        origin = jnp.broadcast_to(arrays.center[None, :], (n, 3))

    direction = pixel_sample - origin
    time = u[:, 4]  # camera.go:268
    return origin, direction, time
