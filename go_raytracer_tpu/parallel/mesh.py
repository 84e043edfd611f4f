"""Multi-chip parallelism: device meshes, sharded rendering, and a sharded
differentiable (inverse-rendering) training step.

The reference's only parallelism is a goroutine-per-image-row pool with a
semaphore (camera/camera.go:112-132); the TPU-native equivalents
(SURVEY.md §2 'Parallelism & communication') are:

* data parallelism over pixels/rays  -> mesh axis "data"
* sample-batch parallelism over spp  -> mesh axis "sample"
* gradient/tile reduction            -> XLA collectives (psum) inserted by
  jit from sharding annotations, riding ICI within a slice
* multi-host RNG                     -> jax.random.fold_in on process index

No NCCL/MPI analog exists or is needed: shardings are declared, collectives
are compiler-inserted.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from go_raytracer_tpu.integrator import wavefront
from go_raytracer_tpu.render import camera as camera_mod
from go_raytracer_tpu.scene import types as T


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("data", "sample")) -> Mesh:
    """Mesh over the first n devices. With the default two axes, "data"
    shards pixels/rays and "sample" shards stratified sample batches
    (most-square factorization); a single axis gives a flat 1-D mesh
    (e.g. for the per-device regen queues)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axes) == 1:
        return Mesh(np.array(devs), axes)
    best = (n, 1)
    for d in range(1, int(np.sqrt(n)) + 1):
        if n % d == 0:
            best = (n // d, d)
    return Mesh(np.array(devs).reshape(best), axes)


def host_key(key: jax.Array) -> jax.Array:
    """Distinct per-host stream (SURVEY.md §2: sample-batch sharding)."""
    return jax.random.fold_in(key, jax.process_index())


def render_sharded(scene: T.Scene, cam: camera_mod.Camera, mesh: Mesh,
                  key: Optional[jax.Array] = None, mode: str = "while",
                  dtype=jnp.float32):
    """Single-launch sharded render of the full image: rays are sharded over
    every mesh axis; the radiance accumulator stays device-resident and
    sharded. Suitable for benchmarking multi-chip scaling."""
    if key is None:
        key = jax.random.key(0)
    arrays = cam.derived(dtype=dtype)
    h, w = cam.image_height, cam.width
    npix = h * w
    n_dev = mesh.devices.size
    npad = ((npix + n_dev - 1) // n_dev) * n_dev
    sqrt_spp = cam.spp_sqrt

    ray_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    ids = jax.device_put(jnp.arange(npad, dtype=jnp.int32), ray_sharding)

    @jax.jit
    def one_stratum(acc, step_key, s_i, s_j):
        k_rays, k_path = jax.random.split(step_key)
        o, d, t = camera_mod.generate_rays(arrays, w, ids, s_i, s_j, k_rays, dtype=dtype)
        L, stats = wavefront.radiance(scene, o, d, t, k_path, cam.max_depth,
                                      cam.max_contribution, mode=mode)
        return acc + L, stats["segments"]

    acc = jax.device_put(jnp.zeros((npad, 3), dtype=dtype), ray_sharding)
    segments = 0
    for s_i in range(sqrt_spp):
        for s_j in range(sqrt_spp):
            sk = jax.random.fold_in(key, s_i * sqrt_spp + s_j)
            acc, seg = one_stratum(acc, sk,
                                   jnp.asarray(s_i, dtype=dtype),
                                   jnp.asarray(s_j, dtype=dtype))
            segments += int(seg)
    img = np.asarray(acc[:npix]).reshape(h, w, 3) / (sqrt_spp * sqrt_spp)
    return img, {"segments": segments}


def extract_params(scene: T.Scene):
    """Differentiable scene parameters for inverse rendering: texture
    colors (albedos + emission), metal fuzz, dielectric index, medium
    density (as -1/density), and background."""
    return {
        "tex_color": scene.textures.color,
        "tex_even": scene.textures.even,
        "tex_odd": scene.textures.odd,
        "fuzz": scene.materials.fuzz,
        "ref_idx": scene.materials.ref_idx,
        "med_neg_inv_density": scene.media.neg_inv_density,
        "background": scene.background,
    }


def apply_params(scene: T.Scene, params) -> T.Scene:
    return scene.replace(
        textures=scene.textures.replace(
            color=params["tex_color"], even=params["tex_even"],
            odd=params["tex_odd"]),
        materials=scene.materials.replace(fuzz=params["fuzz"],
                                          ref_idx=params["ref_idx"]),
        media=scene.media.replace(
            neg_inv_density=params["med_neg_inv_density"]),
        background=params["background"],
    )


def make_train_step(scene: T.Scene, cam: camera_mod.Camera, mesh: Mesh,
                    n_rays: int, n_sample_batches: int, max_depth: int,
                    learning_rate: float = 1e-2, dtype=jnp.float32):
    """Sharded differentiable render + MSE loss + adam update.

    Rays are laid out (n_sample_batches, n_rays, ...) with the sample axis
    sharded over mesh axis "sample" and the ray axis over "data"; scene
    parameters are replicated, so jit inserts a gradient all-reduce over
    both axes (the TPU counterpart of the reference's join-at-the-end row
    pool, camera.go:123)."""
    import optax

    arrays = cam.derived(dtype=dtype)
    w = cam.width
    opt = optax.adam(learning_rate)
    axis_names = tuple(mesh.axis_names)
    ray_sharding = NamedSharding(mesh, P(axis_names[1], axis_names[0]))
    rep = NamedSharding(mesh, P())

    def loss_fn(params, base_scene, ids, key, target):
        sc = apply_params(base_scene, params)

        def render_batch(batch_ids, batch_key):
            k_rays, k_path = jax.random.split(batch_key)
            o, d, t = camera_mod.generate_rays(
                arrays, w, batch_ids,
                jnp.zeros((), dtype), jnp.zeros((), dtype), k_rays, dtype=dtype)
            L, _ = wavefront.radiance(sc, o, d, t, k_path, max_depth,
                                      cam.max_contribution, mode="scan")
            return L

        keys = jax.random.split(key, ids.shape[0])
        L = jax.vmap(render_batch)(ids, keys)  # (S, N, 3)
        img = L.mean(axis=0)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def train_step(params, opt_state, ids, key, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, ids, key, target)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params = jax.device_put(extract_params(scene), rep)
    opt_state = opt.init(params)
    ids = jax.device_put(
        jnp.tile(jnp.arange(n_rays, dtype=jnp.int32)[None], (n_sample_batches, 1)),
        ray_sharding)
    return train_step, params, opt_state, ids
