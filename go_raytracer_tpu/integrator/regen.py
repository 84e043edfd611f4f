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
(E, W, clamp?, path-start?) planes into a generation window, and a reverse
scan evaluates L = clamp?(E + W*L_child) per lane. Lane timelines
concatenate multiple paths; terminal steps have W = 0, which resets the
recursion across path boundaries. Each path's radiance is harvested into
its private slot of an item-indexed buffer WITHOUT scatters (TPU scatters
serialize per-row): refills form a prefix of the dead lanes, so a step's
started lanes are already in item order — a batched per-row stable sort on
the 1-bit started flag compacts them, and rows land with sequential
contiguous dynamic-update-slices at their recorded item bases. The
framebuffer is the per-pixel mean over strata at the end.

Window structure: `window = refill_len + (max_depth+1)` steps (rounded up
to a multiple of the start cadence). Refills stop after `refill_len`, so
every started path completes inside its window and no path state crosses
windows (a per-lane depth counter force-terminates paths at exactly
max_depth+1 levels, camera.go:293-296). The host loops windows until the
queue drains (one scalar readback per window).

Start cadence: lanes restart only every `cadence` steps. On the Pallas
path the kernel then executes `cadence` bounce steps per invocation
(refill blending at the first inner step only), so the per-step XLA
bookkeeping AND the number of harvest rows to compact both shrink by the
cadence; measured best on the v5e at cadence 4 (126.7M rays/s on the
Cornell flagship vs 97M at cadence 1).

The window function is a module-level jit so repeated renders (and the
benchmark) reuse the compiled executable.
"""

from __future__ import annotations

import os
import time as _time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.integrator import wavefront
from go_raytracer_tpu.render import camera as camera_mod
from go_raytracer_tpu.scene import types as T


def _window_impl(scene: T.Scene, arrays: camera_mod.CameraArrays,
                 acc, state, next_item, base_key, item_base, item_end, *,
                 width, npix, sqrt_spp, window, refill, cadence,
                 n_u, max_depth, max_contribution, use_pallas, interpret,
                 reorder=False):
    """One generation window over [item_base, item_end) — the shard-local
    core shared by the single-device and shard_map paths. `acc` rows are
    relative to item_base.

    `reorder` (dense-primitive scenes, pallas path only): lanes are sorted into spatially
    coherent order (direction octant + origin Morton cell, dead lanes
    last) before every kernel call, enabling the kernel's per-block AABB
    cull — tile-uniform skips only pay off when a tile's rays agree on
    which blocks matter (the unsorted variant measured 16% SLOWER on
    book1, docs/PERFORMANCE.md). The permutation is recorded per outer
    step and unwound inside the reverse scan (one unique-key lane sort)
    so lane timelines stay consistent across the sort boundaries."""
    n = state[0].shape[0]
    dtype = state[0].dtype
    reorder = reorder and use_pallas

    if use_pallas:
        from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce

        tables = pallas_bounce.pack_scene(scene, cull=reorder)
        statics = pallas_bounce.scene_statics(scene)
        statics["cull"] = reorder
        cam_row = pallas_bounce.pack_camera(arrays)
        if reorder:
            blk = tables[3]
            blo = jnp.min(blk[:, 0:3], axis=0)
            bext = jnp.maximum(jnp.max(blk[:, 3:6], axis=0) - blo, 1e-6)

    def coherence_sort(ox, oy, oz, dx, dy, dz, t, alive, item_id, depth):
        """Sort the lane pool by (octant, 27-bit origin Morton); dead lanes
        (key MAX) form a contiguous tail where the refill's consecutive —
        hence spatially coherent — camera rays will land. iota as a second
        sort key gives a total order: deterministic without is_stable."""
        from go_raytracer_tpu.ops.pallas import bounce as pb
        morton = pb._morton30(jnp.stack([ox, oy, oz], axis=-1), blo, bext)
        octant = ((dx > 0).astype(jnp.int32) << 2) \
            | ((dy > 0).astype(jnp.int32) << 1) \
            | (dz > 0).astype(jnp.int32)
        key = (octant << 27) | (morton >> 3)
        key = jnp.where(alive, key, jnp.int32(0x7FFFFFFF))
        iota = jnp.arange(n, dtype=jnp.int32)
        (_, _, perm, ox, oy, oz, dx, dy, dz, t, alive_i, item_id,
         depth) = jax.lax.sort(
            (key, iota, iota, ox, oy, oz, dx, dy, dz, t,
             alive.astype(jnp.int32), item_id, depth),
            dimension=0, num_keys=2, is_stable=False)
        return ox, oy, oz, dx, dy, dz, t, alive_i > 0, item_id, depth, perm

    def refill_assign(next_item, alive, do_refill):
        """Queue items -> dead lanes (vectorized rank via cumsum); takes
        form a PREFIX of dead lanes, so taken lanes in lane order map to
        consecutive items next_item, next_item+1, ..."""
        dead = ~alive
        rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        item = next_item + rank
        take = do_refill & dead & (item < item_end)
        stratum = item // npix
        pid = item % npix
        s_i = (stratum // sqrt_spp).astype(dtype)
        s_j = (stratum % sqrt_spp).astype(dtype)
        return take, item, pid, s_i, s_j

    def fwd_step_fused(carry, inputs):
        """`cadence` bounce steps in ONE kernel call: PRNG, camera ray-gen,
        bounces, depth cap (ops/pallas/bounce.bounce_fused with
        n_inner=cadence; the queue refill — the only part needing XLA's
        integer bookkeeping — happens just before the first inner step).

        Records stay in the kernel's native component-plane layout
        ((cadence, N) per color channel, free reshapes only) — the round-2
        profile showed the scan's record management (the (N,3) interleave +
        per-step stacking this replaces) costing 22.6ms vs 16.5ms for the
        kernel itself."""
        state, next_item = carry
        seed_i32, do_refill = inputs
        ox, oy, oz, dx, dy, dz, t, alive, item_id, depth = state
        if reorder:
            (ox, oy, oz, dx, dy, dz, t, alive, item_id, depth,
             perm) = coherence_sort(ox, oy, oz, dx, dy, dz, t, alive,
                                    item_id, depth)
        ni_step = next_item
        take, item, pid, s_i, s_j = refill_assign(next_item, alive, do_refill)
        pi = (pid % width).astype(dtype)
        pj = (pid // width).astype(dtype)
        (rec_planes, img_planes, segc, nox, noy, noz, ndx, ndy, ndz, ntm,
         alive2, depth2) = \
            pallas_bounce.bounce_fused(
                tables, statics, cam_row, scene.background, seed_i32,
                ox, oy, oz, dx, dy, dz, t, alive.astype(jnp.int32), depth,
                take.astype(jnp.int32), pi, pj, s_i, s_j,
                has_defocus=arrays.defocus_angle > 0, max_depth=max_depth,
                n_inner=cadence, interpret=interpret)
        item_id = jnp.where(take, item, item_id)
        next_item = next_item + jnp.sum(take.astype(jnp.int32))
        Er, Eg, Eb, Wr, Wg, Wb, CF = rec_planes
        # image-texture patch (texture.go:70-86), batched over the whole
        # cadence block of record planes
        Wr, Wg, Wb = pallas_bounce.patch_image_weight_planes(
            scene, Wr, Wg, Wb, img_planes)
        rec = (Er, Eg, Eb, Wr, Wg, Wb, CF, take, ni_step) + \
            ((perm,) if reorder else ())
        seg = jnp.sum(segc)
        state2 = (nox, noy, noz, ndx, ndy, ndz, ntm, alive2 > 0, item_id,
                  depth2)
        return (state2, next_item), (rec, seg)

    def fwd_step(carry, inputs):
        state, next_item = carry
        step_key, do_refill = inputs
        ox, oy, oz, dx, dy, dz, t, alive, item_id, depth = state
        # the XLA fallback bounce works on (N, 3) vectors; the stack/split
        # at this boundary is the layout cost the pallas path avoids
        o = jnp.stack([ox, oy, oz], axis=-1)
        d = jnp.stack([dx, dy, dz], axis=-1)
        k_u, k_rays = jax.random.split(step_key)

        ni_step = next_item  # first item id assigned this step
        take, item, pid, s_i, s_j = refill_assign(next_item, alive, do_refill)
        o_n, d_n, t_n = camera_mod.generate_rays(
            arrays, width, pid, s_i, s_j, k_rays, dtype=dtype)
        o = jnp.where(take[:, None], o_n, o)
        d = jnp.where(take[:, None], d_n, d)
        t = jnp.where(take, t_n, t)
        item_id = jnp.where(take, item, item_id)
        depth = jnp.where(take, 0, depth)
        alive = alive | take
        next_item = next_item + jnp.sum(take.astype(jnp.int32))

        u = jax.random.uniform(k_u, (n, n_u), dtype=dtype)
        E, W, cf, no, nd, na = wavefront._bounce(scene, o, d, t, alive, u)
        dead2 = ~alive
        E = jnp.where(dead2[:, None], 0.0, E)
        W = jnp.where(dead2[:, None], 0.0, W)
        seg = jnp.sum(alive.astype(jnp.int32))
        # depth cap (camera.go:293-296): this step is the path's
        # (depth+1)-th surface interaction; a path receives exactly
        # max_depth+1 levels, after which its child contributes black —
        # force-terminate the lane so the reverse scan's freshly reset
        # L = 0 plays that black child.
        na = na & (depth < max_depth)
        depth = jnp.where(alive, depth + 1, depth)
        rec = (E, W, cf & alive, take, ni_step)
        state2 = (no[:, 0], no[:, 1], no[:, 2], nd[:, 0], nd[:, 1],
                  nd[:, 2], t, na, item_id, depth)
        return (state2, next_item), (rec, seg)

    outer = window // cadence
    refill_outer = -(-refill // cadence)
    if use_pallas:
        # one scan iteration = `cadence` kernel-internal bounce steps
        osteps = jnp.arange(outer) * cadence
        do_refills = osteps < refill
        seeds = jax.random.randint(base_key, (outer,), jnp.iinfo(jnp.int32).min,
                                   jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        (state, next_item), (rec_ys, segs) = jax.lax.scan(
            fwd_step_fused, (state, next_item), (seeds, do_refills))
        # ys shapes: E*/W*/CF (outer, cadence, N); STs (outer, N); NIs (outer,)
        (Er, Eg, Eb, Wr, Wg, Wb, CF, STs, NIs) = rec_ys[:9]
        PERMs = rec_ys[9] if reorder else None
    else:
        steps = jnp.arange(window)
        do_refills = (steps < refill) & (steps % cadence == 0)
        step_keys = jax.random.split(base_key, window)
        (state, next_item), ((Es, Ws, CFs, STs_w, NIs_w), segs) = jax.lax.scan(
            fwd_step, (state, next_item), (step_keys, do_refills))
        # convert per-step (window, N, 3) records to the unified
        # component-plane outer layout (slow fallback path only)
        comp = lambda x, c: x[..., c].reshape(outer, cadence, n)
        Er, Eg, Eb = (comp(Es, c) for c in range(3))
        Wr, Wg, Wb = (comp(Ws, c) for c in range(3))
        CF = CFs.reshape(outer, cadence, n)
        STs = STs_w.reshape(outer, cadence, n)[:, 0]   # refills only at j==0
        NIs = NIs_w.reshape(outer, cadence)[:, 0]

    # reverse harvest: L = clamp?(E + W*L), one OUTER step (cadence bounce
    # levels, unrolled) per scan iteration — 4x fewer scan iterations and
    # one harvest row per outer step instead of one per bounce. TPU
    # scatters serialize (~75ns/row — the original per-step scatter-set was
    # 97% of window time) and a single global sort of window*N entries is
    # ~2/3 of window time, so instead: within a step the taken lanes are a
    # PREFIX of dead lanes in lane order, i.e. already in slot order. A
    # batched per-row stable sort by the 1-bit started flag compacts each
    # step's harvests to the row front, and rows land with sequential
    # contiguous dynamic-update-slices at their recorded item bases —
    # later rows' zero padding only ever overwrites item rows that a later
    # row then fills with real data.
    def rev_outer(L, xs):
        er, eg, eb, wr, wg, wb, cf, started = xs[:8]
        Lr, Lg, Lb = L
        for j in reversed(range(cadence)):
            raw_r = er[j] + wr[j] * Lr
            raw_g = eg[j] + wg[j] * Lg
            raw_b = eb[j] + wb[j] * Lb
            # firefly clamp (camera.go:334-341): rescale so the component
            # sum <= max_contribution; NaN sums compare false (Go parity)
            s = raw_r + raw_g + raw_b
            over = (cf[j] != 0) & (s > max_contribution)
            scale = jnp.where(over, max_contribution / jnp.where(over, s, 1.0),
                              1.0)
            Lr, Lg, Lb = raw_r * scale, raw_g * scale, raw_b * scale
        hr = jnp.where(started, Lr, 0.0)
        hg = jnp.where(started, Lg, 0.0)
        hb = jnp.where(started, Lb, 0.0)
        Lr = jnp.where(started, 0.0, Lr)
        Lg = jnp.where(started, 0.0, Lg)
        Lb = jnp.where(started, 0.0, Lb)
        if reorder:
            # unwind this outer step's lane sort so L lines up with the
            # PREVIOUS outer step's records (perm is a unique key: one
            # unstable lane-wide sort restores pre-sort order exactly)
            _, Lr, Lg, Lb = jax.lax.sort((xs[8], Lr, Lg, Lb),
                                         dimension=0, num_keys=1,
                                         is_stable=False)
        return (Lr, Lg, Lb), (hr, hg, hb)

    zero_l = jnp.zeros((n,), dtype)
    rev_xs = (Er, Eg, Eb, Wr, Wg, Wb, CF, STs) + \
        ((PERMs,) if reorder else ())
    _, (Hr, Hg, Hb) = jax.lax.scan(
        rev_outer, (zero_l, zero_l, zero_l), rev_xs, reverse=True)

    # only refill outer steps can start paths: compact/write those rows
    # only (static slice — drain-tail rows carry no harvests)
    starts = STs[:refill_outer]
    NIs_s = NIs[:refill_outer]
    if os.environ.get("GRT_COMPACT") == "1":
        # Pallas streaming compactor (ops/pallas/compact.py): correct and
        # tail-garbage-safe, but MEASURED 48ms vs the sort's 14.3ms on the
        # v5e (115.7M vs 163-174M headline) — 13k sequential 128-lane
        # chunk iterations of dynamic rolls + a branch each; kept
        # env-gated for future (8,128)-chunk experiments
        from go_raytracer_tpu.ops.pallas import compact as pcompact

        hr, hg, hb = pcompact.compact_rows(
            starts, Hr[:refill_outer], Hg[:refill_outer],
            Hb[:refill_outer], interpret=interpret)
    else:
        keys = jnp.logical_not(starts).astype(jnp.int8)  # started first
        _, hr, hg, hb = jax.lax.sort(
            (keys, Hr[:refill_outer], Hg[:refill_outer],
             Hb[:refill_outer]),
            dimension=-1, num_keys=1, is_stable=True)
    rows = jnp.stack([hr, hg, hb], axis=-1)  # (n_start_rows, N, 3)

    def write_row(acc_c, xs):
        row, ni_s = xs
        return jax.lax.dynamic_update_slice(
            acc_c, row, (ni_s - item_base, jnp.int32(0))), None

    acc, _ = jax.lax.scan(write_row, acc, (rows, NIs_s))
    # one packed scalar pair -> ONE host readback per window (each separate
    # int() readback pays a full tunnel round trip, ~25ms)
    return acc, state, jnp.stack([next_item, jnp.sum(segs)])


@partial(jax.jit, donate_argnums=(2, 3),
         static_argnames=("width", "npix", "sqrt_spp", "total_items",
                          "window", "refill", "cadence", "n_u", "max_depth",
                          "max_contribution", "use_pallas", "interpret",
                          "reorder"))
def _run_window(scene: T.Scene, arrays: camera_mod.CameraArrays,
                acc, state, next_item, base_key, *,
                width, npix, sqrt_spp, total_items, window, refill, cadence,
                n_u, max_depth, max_contribution, use_pallas, interpret,
                reorder=False):
    return _window_impl(
        scene, arrays, acc, state, next_item, base_key,
        jnp.int32(0), jnp.int32(total_items),
        width=width, npix=npix, sqrt_spp=sqrt_spp, window=window,
        refill=refill, cadence=cadence, n_u=n_u, max_depth=max_depth,
        max_contribution=max_contribution, use_pallas=use_pallas,
        interpret=interpret, reorder=reorder)


def _auto_reorder(use_pallas, reorder):
    """Coherence-reorder policy: explicit bool wins; "auto" currently
    resolves to OFF — measured on the v5e (scripts/ab_reorder.py), the
    per-step lane sorts cost about what the block cull saves (book1
    100spp: 26.8M unsorted vs 24.6M sorted; book2 25spp: +0.7%), so the
    machinery stays available for experiments but is not the default."""
    if isinstance(reorder, bool):
        return reorder and use_pallas
    return False


def _init_state(n: int, dtype):
    """Fresh lane-pool state: flat (N,) component planes (ox oy oz dx dy
    dz, time, alive, item id, bounces done) — (N, 3) vectors never enter
    the scan carry, so the fused kernel's plane conversions stay free
    reshapes instead of strided slice/stack ops per iteration."""
    z = lambda: jnp.zeros((n,), dtype)  # distinct buffers: state is donated
    return (z(), z(), z(), z(), z(), jnp.ones((n,), dtype),  # d = +z unit
            z(), jnp.zeros((n,), bool),
            jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))


def _resolve_cadence(cadence: int, cam) -> int:
    """0 = auto: the camera's per-scene hint (registry-tuned), else 1."""
    if cadence > 0:
        return cadence
    return cam.regen_cadence if getattr(cam, "regen_cadence", 0) > 0 else 1


def render_regen_sharded(scene: T.Scene, cam: camera_mod.Camera, mesh, key,
                         n_lanes: int = 1 << 17, refill_len: int = 0,
                         cadence: int = 0, backend: str = "auto",
                         reorder="auto", dtype=jnp.float32):
    """Multi-device regeneration render over a 1-D `jax.sharding.Mesh`.

    TPU-native scaling design: the (pixel, stratum) queue is split into one
    contiguous item range per device and each device runs an INDEPENDENT
    persistent-lane queue over its range (its own lane pool, refill cursor,
    RNG stream via fold_in on the mesh axis index) — zero per-step
    collectives; data only crosses ICI when the final sharded accumulator
    is assembled into the image. This is the regen analog of SURVEY.md §2's
    pixel/sample sharding, applied to the fast path.

    Returns (linear image (H, W, 3), stats) with per-shard item/segment
    accounting in stats."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    for a in mesh.axis_names[1:]:
        if mesh.shape[a] != 1:
            raise ValueError("render_regen_sharded expects a 1-D mesh")
    n_dev = mesh.shape[axis]
    cadence = _resolve_cadence(cadence, cam)
    arrays = cam.derived(dtype=dtype)
    h, w = cam.image_height, cam.width
    npix = h * w
    sqrt_spp = cam.spp_sqrt
    n_strata = sqrt_spp * sqrt_spp
    total_items = npix * n_strata
    d1 = cam.max_depth + 1
    refill = refill_len or 4 * d1
    n = n_lanes  # per device
    n_u = wavefront.N_FIXED_U + scene.media.count
    chunk = (total_items + n_dev - 1) // n_dev

    from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce
    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_bounce.supported(scene) and n % 4096 == 0)
    if scene.has_tri_bvh and not use_pallas:
        cadence = 1  # see render_regen: cadence>1 mesh windows crash compile
    window = -(-(refill + d1) // cadence) * cadence
    statics = dict(width=w, npix=npix, sqrt_spp=sqrt_spp, window=window,
                   refill=refill, cadence=cadence, n_u=n_u,
                   max_depth=cam.max_depth,
                   max_contribution=cam.max_contribution,
                   use_pallas=use_pallas,
                   interpret=jax.default_backend() != "tpu",
                   reorder=_auto_reorder(use_pallas, reorder))

    dev = lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape)
    state = tuple(dev(x) for x in _init_state(n, dtype))
    acc = jnp.zeros((n_dev, chunk + n, 3), dtype)
    next_items = jnp.arange(n_dev, dtype=jnp.int32) * chunk

    spec = P(axis)
    rep = P()
    shard = NamedSharding(mesh, spec)
    acc = jax.device_put(acc, shard)
    state = tuple(jax.device_put(s, shard) for s in state)
    next_items = jax.device_put(next_items, shard)

    def body(scene_a, arrays_a, acc_s, state_s, next_s, wkey):
        i = jax.lax.axis_index(axis)
        base = i * jnp.int32(chunk)
        end = jnp.minimum(base + chunk, total_items)
        bkey = jax.random.fold_in(wkey, i)
        acc2, state2, cur = _window_impl(
            scene_a, arrays_a, acc_s[0], tuple(x[0] for x in state_s),
            next_s[0], bkey, base, end, **statics)
        next2, seg = cur[0], cur[1]
        # replicated outputs (psum over ICI) so the host loop never reads a
        # sharded array — required for multi-host operation
        seg_all = jax.lax.psum(seg, axis)
        done_all = jax.lax.psum((next2 >= end).astype(jnp.int32), axis)
        rem_all = jax.lax.psum(jnp.maximum(end - next2, 0), axis)
        # per-shard segment counts for the work-balance metric, gathered to
        # a replicated vector (tiny, once per window)
        seg_vec = jax.lax.all_gather(seg, axis)
        return (acc2[None], tuple(x[None] for x in state2), next2[None],
                seg_all, done_all, rem_all, seg_vec)

    sharded_window = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, spec, spec, spec, rep),
        out_specs=(spec, spec, spec, rep, rep, rep, rep),
        check_rep=False))

    segments = 0
    seg_per_shard = np.zeros(n_dev, dtype=np.int64)
    n_windows = 0
    window_times = []
    t0 = _time.perf_counter()
    # Depth-1 window pipelining (see render_regen): the queue cursors chain
    # device-side through `next_items`, so window k+1 can be dispatched
    # before window k's replicated scalars are read back, hiding the
    # per-window host dispatch/readback round trip. A remaining-items
    # estimate keeps the tail honest (sync instead of dispatching a
    # speculative no-op window when the in-flight one likely drains the
    # queue); the first window is always synced to learn the estimate.
    pending = None
    rem_i = None            # remaining items after the last SYNCED window
    s_est = None            # items started per window, from the last sync
    done = False

    def sync(cur):
        nonlocal segments, seg_per_shard, rem_i, s_est, done
        seg_all, done_all, rem_all, seg_vec = cur
        segments += int(seg_all)
        seg_per_shard += np.asarray(seg_vec, dtype=np.int64)
        rem_new = int(rem_all)
        if rem_i is not None and rem_i > rem_new:
            s_est = rem_i - rem_new
        rem_i = rem_new
        done = int(done_all) == n_dev

    while not done:
        if pending is not None and s_est is not None \
                and rem_i <= 1.25 * s_est:
            sync(pending)
            pending = None
            continue
        wt0 = _time.perf_counter()
        wkey = jax.random.fold_in(key, n_windows)
        (acc, state, next_items, seg_all, done_all, rem_all,
         seg_vec) = sharded_window(scene, arrays, acc, state, next_items,
                                   wkey)
        cur = (seg_all, done_all, rem_all, seg_vec)
        n_windows += 1
        if pending is not None:
            sync(pending)
            pending = cur
        elif s_est is None:
            sync(cur)
        else:
            pending = cur
        window_times.append(_time.perf_counter() - wt0)
    if pending is not None:
        sync(pending)
    elapsed = _time.perf_counter() - t0

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        acc = multihost_utils.process_allgather(acc, tiled=False)
    acc_np = np.asarray(acc)[:, :chunk].reshape(n_dev * chunk, 3)
    linear = acc_np[:total_items].reshape(n_strata, npix, 3).mean(axis=0)
    linear = linear.reshape(h, w, 3)
    stats = {
        "elapsed_s": elapsed,
        "segments": segments,
        "paths": total_items,
        "rays_per_s": segments / elapsed if elapsed > 0 else float("nan"),
        "paths_per_s": total_items / elapsed if elapsed > 0 else float("nan"),
        "windows": n_windows,
        "window_s": window_times,
        "devices": n_dev,
        "segments_per_shard": seg_per_shard.tolist(),
        "work_balance": float(seg_per_shard.min() / max(seg_per_shard.max(), 1)),
        "occupancy": segments / max(n_windows * window * n * n_dev, 1),
    }
    return linear, stats


def render_regen(scene: T.Scene, cam: camera_mod.Camera, key,
                 n_lanes: int = 1 << 17, refill_len: int = 0,
                 cadence: int = 0, backend: str = "auto", reorder="auto",
                 dtype=jnp.float32,
                 checkpoint_path=None, checkpoint_every: int = 4,
                 scene_name: str = "", verbose: bool = False):
    """Render the full image with ray regeneration — the production path.

    Returns (linear image (H, W, 3), stats). `refill_len` defaults to
    4*(max_depth+1) (measured best on the Cornell workload). `cadence` > 1
    restarts lanes only every `cadence` steps — fewer harvest rows to
    compact at the cost of lane idle time between paths.

    Checkpoint/resume: between windows no path state is in flight (every
    started path completes inside its window), so (accumulator, queue
    cursor, window count) is a consistent checkpoint; a matching prior
    checkpoint resumes the queue where it left off.
    """
    from go_raytracer_tpu.render import checkpoint as checkpoint_mod
    from go_raytracer_tpu.utils import progress
    cadence = _resolve_cadence(cadence, cam)
    arrays = cam.derived(dtype=dtype)
    h, w = cam.image_height, cam.width
    npix = h * w
    sqrt_spp = cam.spp_sqrt
    n_strata = sqrt_spp * sqrt_spp
    total_items = npix * n_strata
    d1 = cam.max_depth + 1
    # 4x(depth+1) refill measured best on the cornell workload (occupancy
    # 0.51 vs 0.42 at 2x; the drain tail amortizes over a longer window)
    refill = refill_len or 4 * d1
    window = -(-(refill + d1) // cadence) * cadence
    n = n_lanes
    n_u = wavefront.N_FIXED_U + scene.media.count

    from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce
    # the fused kernel tiles lanes as (32, 128) blocks
    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_bounce.supported(scene) and n % 4096 == 0)
    if scene.has_tri_bvh and not use_pallas:
        if n > (1 << 16):
            # mesh scenes run the traversal kernel once per bounce step
            # inside the window scan; 128k-lane windows push a single device
            # execution past the point where the tunneled worker gets killed
            # (empirically 64k-lane windows complete, 128k crash the worker)
            n = 1 << 16
        # cadence > 1 on this path buys little (it amortizes the FUSED
        # kernel's XLA bookkeeping, which this path doesn't use) and its
        # window graph at reference depth (d50 -> 256-step scan + 4-level
        # unrolled reverse) reproducibly crashes the remote TPU compile
        # helper; cadence 1 compiles, runs at 0.8 occupancy, and measured
        # 1.08M rays/s on modelExample (vs 396k in round 2)
        cadence = 1
        window = refill + d1

    state = _init_state(n, dtype)
    # `n_lanes` tail rows absorb the final window's row-padding writes
    acc = jnp.zeros((total_items + n, 3), dtype)
    next_item = jnp.int32(0)
    segments = 0
    n_windows = 0
    meta = checkpoint_mod.meta_for(scene_name, cam)
    meta["lanes"] = n
    if checkpoint_path:
        loaded = checkpoint_mod.load(checkpoint_path)
        if loaded is not None and checkpoint_mod.compatible(loaded[2], meta) \
                and loaded[0].shape == acc.shape:
            acc_np, next_i, lmeta = loaded
            acc = jnp.asarray(acc_np, dtype=dtype)
            next_item = jnp.int32(next_i)
            n_windows = int(lmeta.get("windows", 0))
    bar = progress.Bar(total_items, enabled=verbose)
    bar.tick(int(next_item))
    next_i = int(next_item)
    window_times = []
    t0 = _time.perf_counter()

    # Window pipelining: the device executes a window in ~2/3 of its wall
    # time — the rest is the host->tunnel dispatch + cursor-readback round
    # trip (~20ms/window measured on the v5e tunnel). Chaining the queue
    # cursor DEVICE-side (next window consumes the previous window's
    # packed cursor array, no host value in between) lets window k+1 be
    # dispatched before window k's readback, hiding that tax. A
    # starts-per-window estimate keeps the tail honest: when the in-flight
    # window likely drains the queue, sync instead of dispatching a
    # speculative no-op window (the first window is always synced to learn
    # the estimate, so single-window renders behave exactly as before).
    pending = None          # cursor array of the in-flight window
    s_est = None            # starts per window, from the last sync
    next_dev = next_item

    def sync(cur):
        nonlocal next_i, segments, s_est
        prev = next_i
        next_i, seg = (int(x) for x in np.asarray(cur))  # one readback
        segments += seg
        if next_i > prev:
            s_est = next_i - prev
        bar.tick(next_i - bar.done)

    while next_i < total_items:
        if pending is not None and s_est is not None \
                and total_items - next_i <= 1.25 * s_est:
            sync(pending)        # in-flight window likely finishes the queue
            pending = None
            continue
        wt0 = _time.perf_counter()
        wkey = jax.random.fold_in(key, n_windows)
        acc, state, cur = _run_window(
            scene, arrays, acc, state, next_dev, wkey,
            width=w, npix=npix, sqrt_spp=sqrt_spp, total_items=total_items,
            window=window, refill=refill, cadence=cadence, n_u=n_u,
            max_depth=cam.max_depth,
            max_contribution=cam.max_contribution, use_pallas=use_pallas,
            interpret=jax.default_backend() != "tpu",
            reorder=_auto_reorder(use_pallas, reorder))
        next_dev = cur[0]
        n_windows += 1
        if pending is not None:
            sync(pending)        # overlaps with the window just dispatched
            pending = cur
        elif s_est is None:
            sync(cur)            # first window: learn starts-per-window
        else:
            pending = cur
        window_times.append(_time.perf_counter() - wt0)
        if checkpoint_path and n_windows % checkpoint_every == 0:
            if pending is not None:
                sync(pending)    # acc must match the saved cursor
                pending = None
            meta["windows"] = n_windows
            checkpoint_mod.save(checkpoint_path, np.asarray(acc),
                                next_i, meta)
    if pending is not None:
        sync(pending)            # final (possibly no-op) in-flight window
    if checkpoint_path and window_times:
        # final save after the pipeline drains, so a finished render always
        # leaves a completed checkpoint (resume = zero new windows)
        meta["windows"] = n_windows
        checkpoint_mod.save(checkpoint_path, np.asarray(acc), next_i, meta)
    acc.block_until_ready()
    bar.close()
    elapsed = _time.perf_counter() - t0

    # item = stratum * npix + pixel -> average over strata
    linear = np.asarray(
        jnp.mean(acc[:total_items].reshape(n_strata, npix, 3),
                 axis=0)).reshape(h, w, 3)
    stats = {
        "elapsed_s": elapsed,
        "segments": segments,
        "paths": total_items,
        "rays_per_s": segments / elapsed if elapsed > 0 else float("nan"),
        "paths_per_s": total_items / elapsed if elapsed > 0 else float("nan"),
        "windows": n_windows,
        "window_s": window_times,
        "occupancy": segments / (n_windows * window * n),
    }
    return linear, stats
