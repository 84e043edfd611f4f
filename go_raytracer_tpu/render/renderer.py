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
from go_raytracer_tpu.render import checkpoint as checkpoint_mod
from go_raytracer_tpu.render import film
from go_raytracer_tpu.scene import types as T
from go_raytracer_tpu.utils import progress


def render(scene: T.Scene, cam: camera_mod.Camera, key: Optional[jax.Array] = None,
           mode: str = "while", ray_batch: int = 1 << 17, dtype=jnp.float32,
           verbose: bool = False, checkpoint_path: Optional[str] = None,
           checkpoint_every: int = 8, scene_name: str = "",
           strata_per_launch: int = 0, backend: str = "auto"):
    """Render the scene; returns (linear image (H, W, 3) float, stats dict).

    Launch structure: pixels are chunked to `ray_batch` to bound HBM, and
    `strata_per_launch` stratified samples run inside one jit launch (a
    device-side fori_loop) to amortize dispatch latency — important when
    the accelerator sits behind a high-latency tunnel. 0 = all strata in
    one launch per chunk.

    With checkpoint_path set, the accumulator is checkpointed every
    `checkpoint_every` launch groups, and a matching prior checkpoint
    resumes the render (render/checkpoint.py)."""
    if key is None:
        key = jax.random.key(0)
    arrays = cam.derived(dtype=dtype)
    h, w = cam.image_height, cam.width
    npix = h * w
    sqrt_spp = cam.spp_sqrt
    total_strata = sqrt_spp * sqrt_spp

    # lane-align the chunk so the pallas backend stays eligible
    chunk = min(ray_batch, ((npix + 127) // 128) * 128)
    nchunks = math.ceil(npix / chunk)
    npad = nchunks * chunk
    k_strata = strata_per_launch or total_strata
    k_strata = min(k_strata, total_strata)
    n_groups = math.ceil(total_strata / k_strata)

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("n_local",))
    def launch(acc, base_key, stratum0, ids, n_local):
        def body(i, carry):
            acc_c, segs = carry
            stratum = stratum0 + i
            s_i = (stratum // sqrt_spp).astype(dtype)
            s_j = (stratum % sqrt_spp).astype(dtype)
            k_rays, k_path = jax.random.split(jax.random.fold_in(base_key, i))
            o, d, t = camera_mod.generate_rays(arrays, w, ids, s_i, s_j,
                                               k_rays, dtype=dtype)
            radiance, stats = wavefront.radiance(
                scene, o, d, t, k_path, cam.max_depth, cam.max_contribution,
                mode=mode, backend=backend)
            # f32 accumulator: int32 overflows past ~2.1e9 lane-steps on
            # large renders; stats precision loss is negligible
            return (acc_c.at[ids].add(radiance),
                    segs + stats["segments"].astype(jnp.float32))

        return jax.lax.fori_loop(0, n_local, body, (acc, jnp.float32(0)))

    start_group = 0
    acc = None
    meta = checkpoint_mod.meta_for(scene_name, cam)
    if checkpoint_path:
        loaded = checkpoint_mod.load(checkpoint_path)
        if loaded is not None and checkpoint_mod.compatible(loaded[2], meta):
            acc = jnp.asarray(loaded[0], dtype=dtype)
            start_group = loaded[1]
    if acc is None:
        acc = jnp.zeros((npad, 3), dtype=dtype)

    ids_np = np.arange(npad, dtype=np.int32)
    bar = progress.Bar((n_groups - start_group) * nchunks, enabled=verbose)
    segments = 0
    t0 = _time.perf_counter()
    for group in range(start_group, n_groups):
        stratum0 = group * k_strata
        n_local = min(k_strata, total_strata - stratum0)
        for c in range(nchunks):
            base_key = jax.random.fold_in(key, group * nchunks + c)
            ids = jnp.asarray(ids_np[c * chunk:(c + 1) * chunk])
            acc, seg = launch(acc, base_key, jnp.asarray(stratum0, jnp.int32),
                              ids, n_local=n_local)
            segments += int(seg)
            bar.tick()
        if checkpoint_path and ((group + 1) % checkpoint_every == 0
                                or group + 1 == n_groups):
            checkpoint_mod.save(checkpoint_path, np.asarray(acc), group + 1, meta)
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
