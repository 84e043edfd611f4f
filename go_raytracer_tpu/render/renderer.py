"""Render orchestration: stratified sample loop, pixel-chunk batching, and
on-device accumulation.

Replaces the reference's goroutine row pool (camera/camera.go:90-153) with a
device-side data-parallel loop: pixels are flattened, chunked to bound HBM
footprint, and each (stratum, chunk) launch renders one stratified sample
for a bundle of pixels with a jit-compiled wavefront pass. Accumulation
happens on device with a donated accumulator; the image only crosses to the
host once at the end (mirroring the reference's write-at-end in
main.go:442-479).
"""

from __future__ import annotations

import math
import time as _time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.integrator import wavefront
from go_raytracer_tpu.render import camera as camera_mod
from go_raytracer_tpu.render import film
from go_raytracer_tpu.scene import types as T
from go_raytracer_tpu.utils import progress


def render(scene: T.Scene, cam: camera_mod.Camera, key: Optional[jax.Array] = None,
           mode: str = "while", ray_batch: int = 1 << 17, dtype=jnp.float32,
           verbose: bool = False):
    """Render the scene; returns (linear image (H, W, 3) float, stats dict)."""
    if key is None:
        key = jax.random.key(0)
    arrays = cam.derived(dtype=dtype)
    h, w = cam.image_height, cam.width
    npix = h * w
    sqrt_spp = cam.spp_sqrt

    chunk = min(ray_batch, npix)
    nchunks = math.ceil(npix / chunk)
    npad = nchunks * chunk

    @partial(jax.jit, donate_argnums=(0,))
    def step(acc, step_key, s_i, s_j, ids):
        k_rays, k_path = jax.random.split(step_key)
        o, d, t = camera_mod.generate_rays(arrays, w, ids, s_i, s_j, k_rays, dtype=dtype)
        radiance, stats = wavefront.radiance(
            scene, o, d, t, k_path, cam.max_depth, cam.max_contribution, mode=mode)
        return acc.at[ids].add(radiance), stats["segments"]

    acc = jnp.zeros((npad, 3), dtype=dtype)
    ids_np = np.arange(npad, dtype=np.int32)
    total_steps = sqrt_spp * sqrt_spp * nchunks
    bar = progress.Bar(total_steps, enabled=verbose)
    segments = 0
    t0 = _time.perf_counter()
    for s_i in range(sqrt_spp):
        for s_j in range(sqrt_spp):
            for c in range(nchunks):
                step_key = jax.random.fold_in(key, (s_i * sqrt_spp + s_j) * nchunks + c)
                ids = jnp.asarray(ids_np[c * chunk:(c + 1) * chunk])
                acc, seg = step(acc, step_key,
                                jnp.asarray(s_i, dtype=dtype),
                                jnp.asarray(s_j, dtype=dtype), ids)
                segments += int(seg)
                bar.tick()
    acc.block_until_ready()
    elapsed = _time.perf_counter() - t0
    bar.close()

    linear = np.asarray(acc[:npix]).reshape(h, w, 3) / (sqrt_spp * sqrt_spp)
    stats = {
        "elapsed_s": elapsed,
        "segments": segments,
        "paths": npix * sqrt_spp * sqrt_spp,
        "rays_per_s": segments / elapsed if elapsed > 0 else float("nan"),
        "paths_per_s": npix * sqrt_spp * sqrt_spp / elapsed if elapsed > 0 else float("nan"),
    }
    return linear, stats


def render_to_file(scene: T.Scene, cam: camera_mod.Camera, path: str, **kw):
    linear, stats = render(scene, cam, **kw)
    rgb = np.asarray(film.tonemap(jnp.asarray(linear)))
    film.write_image(path, rgb)
    return stats
