"""Ray-regeneration wavefront: persistent lanes with a pixel-sample queue.

The plain wavefront (integrator/wavefront.py) runs max_depth+1 steps per
stratified sample with every lane allocated to one path; since the average
path length is ~4-8 bounces, most lane-steps are dead weight (~8% occupancy
on the Cornell box at depth 50). Here a fixed pool of N lanes processes a
queue of (pixel, stratum) work items: whenever a lane's path terminates, it
immediately starts the next item — the TPU analog of persistent-threads
path tracing.

Correctness of the per-level firefly clamp (camera.go:330-341) is preserved
by the same two-pass structure: the forward pass records per-step
(E, W, clamp?, pixel, path-start?) planes into a generation window, and a
reverse scan evaluates L = clamp?(E + W*L_child) per lane. Lane timelines
concatenate multiple paths; terminal steps have W = 0, which resets the
recursion across path boundaries, and the radiance of each path is
harvested into the framebuffer at its start marker.

Window structure: `window = refill_len + (max_depth+1)` steps. Refills stop
after `refill_len`, so every started path completes inside its window and
no path state crosses windows. The host loops windows until the queue
drains (one scalar readback per window).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from go_raytracer_tpu.integrator import wavefront
from go_raytracer_tpu.render import camera as camera_mod
from go_raytracer_tpu.scene import types as T


def render_regen(scene: T.Scene, cam: camera_mod.Camera, key,
                 n_lanes: int = 1 << 17, refill_len: int = 0,
                 backend: str = "auto", dtype=jnp.float32):
    """Render the full image with ray regeneration.

    Returns (linear image (H, W, 3), stats). `refill_len` defaults to
    2*(max_depth+1), giving ~2/3 occupancy-weighted window efficiency.
    """
    arrays = cam.derived(dtype=dtype)
    h, w = cam.image_height, cam.width
    npix = h * w
    sqrt_spp = cam.spp_sqrt
    n_strata = sqrt_spp * sqrt_spp
    total_items = npix * n_strata
    d1 = cam.max_depth + 1
    refill = refill_len or 2 * d1
    window = refill + d1
    n = n_lanes
    n_u = wavefront.N_FIXED_U + scene.media.count

    zero_state = (
        jnp.zeros((n, 3), dtype),                  # o
        jnp.ones((n, 3), dtype),                   # d
        jnp.zeros((n,), dtype),                    # time
        jnp.zeros((n,), bool),                     # alive
        jnp.zeros((n,), jnp.int32),                # pixel id
    )

    use_pallas = False
    from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce
    if backend in ("auto", "pallas"):
        use_pallas = backend == "pallas" or (
            pallas_bounce.supported(scene) and n % 128 == 0)
    if use_pallas:
        prims, lights_packed = pallas_bounce.pack_scene(scene)

    def do_bounce(o, d, t, alive, u):
        if use_pallas:
            return pallas_bounce.bounce(
                prims, lights_packed, o, d, t, alive,
                u[:, :pallas_bounce.N_U], scene.background,
                n_prims=prims.shape[0], n_lights=lights_packed.shape[0],
                n_lights_live=scene.lights.n, has_metal=scene.has_metal,
                has_dielectric=scene.has_dielectric,
                interpret=jax.default_backend() != "tpu")
        return wavefront._bounce(scene, o, d, t, alive, u)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_window(acc, state, next_item, base_key):
        def fwd_step(carry, inputs):
            state, next_item = carry
            step_key, do_refill = inputs
            o, d, t, alive, pix = state
            k_u, k_rays = jax.random.split(step_key)

            dead = ~alive
            # assign queue items to dead lanes (vectorized rank via cumsum)
            rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
            item = next_item + rank
            take = do_refill & dead & (item < total_items)
            stratum = item // npix
            pid = item % npix
            s_i = (stratum // sqrt_spp).astype(dtype)
            s_j = (stratum % sqrt_spp).astype(dtype)
            o_n, d_n, t_n = camera_mod.generate_rays(
                arrays, w, pid, s_i, s_j, k_rays, dtype=dtype)
            o = jnp.where(take[:, None], o_n, o)
            d = jnp.where(take[:, None], d_n, d)
            t = jnp.where(take, t_n, t)
            pix = jnp.where(take, item, pix)  # lane carries its ITEM id
            alive = alive | take
            next_item = next_item + jnp.sum(take.astype(jnp.int32))

            u = jax.random.uniform(k_u, (n, n_u), dtype=dtype)
            E, W, cf, no, nd, na = do_bounce(o, d, t, alive, u)
            dead2 = ~alive
            E = jnp.where(dead2[:, None], 0.0, E)
            W = jnp.where(dead2[:, None], 0.0, W)
            seg = jnp.sum(alive.astype(jnp.int32))
            rec = (E, W, cf & alive, take, pix)
            return ((no, nd, t, na, pix), next_item), (rec, seg)

        step_keys = jax.random.split(base_key, window)
        do_refills = jnp.arange(window) < refill
        (state, next_item), ((Es, Ws, CFs, STs, ITs), segs) = jax.lax.scan(
            fwd_step, (state, next_item), (step_keys, do_refills))

        # reverse harvest: L = clamp?(E + W*L); at start markers write L to
        # the path's private item slot — collision-free scatter-set (every
        # path owns exactly one slot), far cheaper than scatter-add into
        # the framebuffer on TPU.
        def rev_step(carry, xs):
            L, acc = carry
            E, W, cf, started, item = xs
            raw = E + W * L
            L = jnp.where(cf[:, None],
                          wavefront.clamp_contribution(raw, cam.max_contribution),
                          raw)
            slot = jnp.where(started, item, total_items)  # OOB -> dropped
            acc = acc.at[slot].set(L, mode="drop", unique_indices=True)
            L = jnp.where(started[:, None], 0.0, L)
            return (L, acc), None

        (l_final, acc), _ = jax.lax.scan(
            rev_step, (jnp.zeros((n, 3), dtype), acc),
            (Es, Ws, CFs, STs, ITs), reverse=True)
        return acc, state, next_item, jnp.sum(segs)

    acc = jnp.zeros((total_items, 3), dtype)
    state = zero_state
    next_item = jnp.int32(0)
    segments = 0
    n_windows = 0
    import time as _time
    t0 = _time.perf_counter()
    while True:
        wkey = jax.random.fold_in(key, n_windows)
        acc, state, next_item, seg = run_window(acc, state, next_item, wkey)
        segments += int(seg)
        n_windows += 1
        if int(next_item) >= total_items:
            break
    acc.block_until_ready()
    elapsed = _time.perf_counter() - t0

    import numpy as np
    # item = stratum * npix + pixel -> average over strata
    linear = np.asarray(
        jnp.mean(acc.reshape(n_strata, npix, 3), axis=0)).reshape(h, w, 3)
    stats = {
        "elapsed_s": elapsed,
        "segments": segments,
        "paths": total_items,
        "rays_per_s": segments / elapsed if elapsed > 0 else float("nan"),
        "paths_per_s": total_items / elapsed if elapsed > 0 else float("nan"),
        "windows": n_windows,
        "occupancy": segments / (n_windows * window * n),
    }
    return linear, stats
