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

import functools
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
                 reorder=False, inkernel=False, harvest="xla",
                 early_exit=True, use_ext=False):
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
    inkernel = inkernel and use_pallas and not reorder
    use_ext = use_ext and not use_pallas

    if use_pallas or use_ext:
        from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce

        tables = pallas_bounce.pack_scene(scene, cull=reorder)
        statics = pallas_bounce.scene_statics(scene, ext=use_ext)
        statics["cull"] = reorder
        cam_row = pallas_bounce.pack_camera(arrays)
        if reorder:
            blk = tables[3]
            blo = jnp.min(blk[:, 0:3], axis=0)
            bext = jnp.maximum(jnp.max(blk[:, 3:6], axis=0) - blo, 1e-6)

    if use_ext:
        # mesh scenes: the binned/walk closest hit + triangle attribute
        # gathers stay XLA (per-lane gathers have no Mosaic lowering);
        # everything else — dense primitive sections, media, all five
        # materials, textures, mixture light sampling — runs in the fused
        # bounce kernel via the ext-hit fold (pallas_bounce.bounce with
        # ext planes). Replaces the whole-XLA wavefront._bounce shell
        # (~5 ms/level at 64k lanes on the v5e, round-5 S8 profile).
        from go_raytracer_tpu.ops import intersect as ix_mod
        from go_raytracer_tpu.ops.trace import T_MIN as trace_T_MIN

        def mesh_bounce(o, d, t, alive, u):
            t_cap = jnp.full((n,), jnp.inf, dtype)
            # cheap dense-class caps prune the mesh traversal (the
            # cross-class shrinking rayT.Max, trace.trace)
            if scene.has_spheres:
                ts = ix_mod.sphere_ts(scene.spheres, o, d, t,
                                      trace_T_MIN, jnp.inf)
                t_cap = jnp.minimum(t_cap, ts.min(axis=1))
            if scene.has_quads:
                ts = ix_mod.quad_ts(scene.quads, o, d, trace_T_MIN, jnp.inf)
                t_cap = jnp.minimum(t_cap, ts.min(axis=1))
            if scene.has_boxes:
                ts = ix_mod.box_ts(scene.boxes, o, d, trace_T_MIN, jnp.inf)
                t_cap = jnp.minimum(t_cap, ts.min(axis=1))
            ext = pallas_bounce.mesh_ext_planes(
                scene, statics, o, d, t_cap, alive, interpret=interpret)
            E, W, cf, no, nd, na, img = pallas_bounce.bounce(
                tables, statics, o, d, t, alive, u, scene.background,
                interpret=interpret, ext=ext)
            W = pallas_bounce.patch_image_weight(scene, W, img)
            return E, W, cf, no, nd, na

        bounce_fn = mesh_bounce
    else:
        bounce_fn = functools.partial(wavefront._bounce, scene)

    if inkernel:
        # ---- in-kernel queue scheduler (ops/pallas/bounce.bounce_fused_q):
        # the dynamic item queue's refill runs at EVERY bounce level inside
        # the kernel (sequential-grid SMEM cursor), so a lane restarts the
        # step its path dies — per-step-refill occupancy with the queue's
        # perfect load balance, and cadence becomes pure shell
        # amortization. Starts can happen at any level, so the records
        # carry per-level started planes and each level's item base is
        # next_item + exclusive-cumsum of the per-level take counts (items
        # are assigned contiguously per level in flat lane order).
        outer = window // cadence

        # GRT_DIRECT_REC=1: the kernel writes records in place into the
        # whole-window buffers (scalar-prefetched level base + aliased
        # outputs, bounce_fused_q_direct) instead of returning per-step
        # planes the loop body DUSes. Measured round 5 on the single-chip
        # cornell window: a NEGATIVE (~660 vs 720M rays/s — the strided
        # in-place output writes cost the kernel ~4 ms, more than the
        # ~3 ms of DUS shell they remove), so the default stays the plane
        # path; kept selectable for the shard_map overhead experiments
        # (pallas outputs are the suspected host-staging trigger there).
        # Image scenes always use the plane path (the XLA uv patch must
        # see each step's planes).
        direct = (not scene.has_image
                  and os.environ.get("GRT_DIRECT_REC", "0") == "1")

        def _seed4(seed_i32, refill_rem, next_item):
            return jnp.stack([seed_i32, refill_rem, next_item,
                              item_end.astype(jnp.int32)
                              if hasattr(item_end, "astype")
                              else jnp.int32(item_end)])

        def fwd_step_ik(carry, inputs):
            state, next_item = carry
            seed_i32, refill_rem = inputs
            ox, oy, oz, dx, dy, dz, t, alive, item_id, depth = state
            (rec_planes, img_planes, segc, tc, nox, noy, noz, ndx, ndy,
             ndz, ntm, alive2, depth2) = \
                pallas_bounce.bounce_fused_q(
                    tables, statics, cam_row, scene.background,
                    _seed4(seed_i32, refill_rem, next_item),
                    ox, oy, oz, dx, dy, dz, t, alive.astype(jnp.int32),
                    depth, has_defocus=arrays.defocus_angle > 0,
                    max_depth=max_depth, n_inner=cadence, width=width,
                    sqrt_spp=sqrt_spp, npix=npix, interpret=interpret)
            # merged record planes: V = E or W (disjoint by material
            # semantics), FL bits = clamp | emit<<1 | started<<2
            Vr, Vg, Vb, FL = rec_planes
            Vr, Vg, Vb = pallas_bounce.patch_image_weight_planes(
                scene, Vr, Vg, Vb, img_planes)
            bases = next_item + jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(tc)[:-1]])
            next_item = next_item + jnp.sum(tc)
            rec = (Vr, Vg, Vb, FL, bases)
            state2 = (nox, noy, noz, ndx, ndy, ndz, ntm, alive2 > 0,
                      item_id, depth2)
            return (state2, next_item), (rec, jnp.sum(segc))

        osteps = jnp.arange(outer, dtype=jnp.int32) * cadence
        refill_rems = jnp.clip(refill - osteps, 0, cadence)
        seeds = jax.random.randint(base_key, (outer,),
                                   jnp.iinfo(jnp.int32).min,
                                   jnp.iinfo(jnp.int32).max,
                                   dtype=jnp.int32)
        # Forward pass as a while_loop with EARLY DRAIN EXIT instead of a
        # static scan: once every lane is dead and no refill level (or
        # item) remains, the remaining outer steps are pure idle — for
        # short-path scenes the all-dead tail is 20-40% of the window
        # (quads len 1.47: levels ~130-250 of a 251-level window). The
        # record buffers stay zero there, which the reverse recursion
        # treats as identity (L enters the written levels as 0 and no
        # started rows are emitted), so results are bit-identical to the
        # scan.
        rows_l = n // 128
        if direct:
            # whole-window record buffers written IN PLACE by the kernel
            # (scalar-prefetched level base + aliased outputs) — no
            # per-step record DUS in the loop body
            bufs = (jnp.zeros((outer * cadence, rows_l, 128), dtype),
                    jnp.zeros((outer * cadence, rows_l, 128), dtype),
                    jnp.zeros((outer * cadence, rows_l, 128), dtype),
                    jnp.zeros((outer * cadence, rows_l, 128), jnp.int32))
        else:
            bufs = tuple(jnp.zeros((outer, cadence, n), dt)
                         for dt in (dtype, dtype, dtype, jnp.int32))
        # unwritten (early-exited) steps: their all-zero harvest rows are
        # still scanned by write_row_ik, so their item base must point at
        # the accumulator's n-lane padding tail (item_end), NOT item 0 —
        # a zero base would overwrite the first level's real rows
        nis_buf = jnp.full((outer, cadence), item_end, jnp.int32)
        # Segment counter as two int32 words (lo holds 30 bits): one
        # workload-sized window can cover the whole render, and a large
        # custom config (~2k x 2k @1000spp) exceeds int32 segments; the
        # per-step count (<= cadence * n ~ 2^20) never overflows lo
        # before the carry is moved. Stats only — the image is unaffected.
        seg0 = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

        def fwd_cond(c):
            i, state_c, next_c, _, _, _ = c
            alive = state_c[7]
            refilling = (next_c < (item_end.astype(jnp.int32)
                                   if hasattr(item_end, "astype")
                                   else jnp.int32(item_end))) \
                & (i * cadence < refill)
            if not early_exit:
                return i < outer
            return (i < outer) & (jnp.any(alive) | refilling)

        def fwd_body(c):
            i, state_c, next_c, bufs_c, nis_c, segs_c = c
            if direct:
                (ox, oy, oz, dx, dy, dz, t, alive, item_id,
                 depth) = state_c
                (*bufs2, segc, tc, nox, noy, noz, ndx, ndy, ndz, ntm,
                 alive2, depth2) = pallas_bounce.bounce_fused_q_direct(
                    tables, statics, cam_row, scene.background,
                    _seed4(seeds[i], refill_rems[i], next_c),
                    i * jnp.int32(cadence), bufs_c,
                    ox, oy, oz, dx, dy, dz, t, alive.astype(jnp.int32),
                    depth, has_defocus=arrays.defocus_angle > 0,
                    max_depth=max_depth, n_inner=cadence, width=width,
                    sqrt_spp=sqrt_spp, npix=npix, interpret=interpret)
                bufs2 = tuple(bufs2)
                nis = next_c + jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), jnp.cumsum(tc)[:-1]])
                next2 = next_c + jnp.sum(tc)
                state2 = (nox, noy, noz, ndx, ndy, ndz, ntm, alive2 > 0,
                          item_id, depth2)
                seg = jnp.sum(segc)
            else:
                (state2, next2), (rec, seg) = fwd_step_ik(
                    (state_c, next_c), (seeds[i], refill_rems[i]))
                *planes, nis = rec
                bufs2 = tuple(
                    jax.lax.dynamic_update_slice(b, p[None], (i, 0, 0))
                    for b, p in zip(bufs_c, planes))
            nis_c = jax.lax.dynamic_update_slice(
                nis_c, nis[None], (i, jnp.int32(0)))
            lo, hi = segs_c
            lo = lo + seg.astype(jnp.int32)
            hi = hi + (lo >> 30)
            lo = lo & jnp.int32((1 << 30) - 1)
            return (i + 1, state2, next2, bufs2, nis_c, (lo, hi))

        _, state, next_item, bufs, nis_buf, segs = jax.lax.while_loop(
            fwd_cond, fwd_body,
            (jnp.int32(0), state, next_item, bufs, nis_buf, seg0))
        # (window, rows, 128) -> (outer, cadence, N): a free reshape (the
        # level-major linear order is identical)
        (Vr, Vg, Vb, FL) = tuple(b.reshape(outer, cadence, n) for b in bufs)
        NIs = nis_buf

        # reverse harvest with PER-LEVEL starts: same clamp recursion,
        # one (hr, hg, hb) row per bounce level. Merged V/FL records:
        # raw = emit ? V : V * L (a vertex never has both E and W).
        def rev_outer_ik(L, xs):
            vr, vg, vb, fl = xs
            Lr, Lg, Lb = L
            hs = [None] * cadence
            for j in reversed(range(cadence)):
                emit = (fl[j] & 2) != 0
                raw_r = jnp.where(emit, vr[j], vr[j] * Lr)
                raw_g = jnp.where(emit, vg[j], vg[j] * Lg)
                raw_b = jnp.where(emit, vb[j], vb[j] * Lb)
                # firefly clamp (camera.go:334-341); NaN sums compare
                # false (Go parity)
                s = raw_r + raw_g + raw_b
                over = ((fl[j] & 1) != 0) & (s > max_contribution)
                scale = jnp.where(
                    over, max_contribution / jnp.where(over, s, 1.0), 1.0)
                Lr, Lg, Lb = raw_r * scale, raw_g * scale, raw_b * scale
                started = (fl[j] & 4) != 0
                hs[j] = (jnp.where(started, Lr, 0.0),
                         jnp.where(started, Lg, 0.0),
                         jnp.where(started, Lb, 0.0))
                Lr = jnp.where(started, 0.0, Lr)
                Lg = jnp.where(started, 0.0, Lg)
                Lb = jnp.where(started, 0.0, Lb)
            hr = jnp.stack([h[0] for h in hs])       # (cadence, N)
            hg = jnp.stack([h[1] for h in hs])
            hb = jnp.stack([h[2] for h in hs])
            return (Lr, Lg, Lb), (hr, hg, hb)

        # Epilogue. The sort's cost is linear in refill ROWS and the
        # in-kernel queue has one per LEVEL (refill=204 by default, 4x the
        # cadence-4 queue's 51) — here the fused Pallas harvest
        # (ops/pallas/harvest.reverse_harvest_levels, one grid step per
        # level, compaction cost independent of how many levels can
        # start) is the default; harvest="xla" reverts to scan+sort.
        if harvest == "fused":
            from go_raytracer_tpu.ops.pallas import harvest as pharvest

            hr, hg, hb = pharvest.reverse_harvest_levels(
                Vr, Vg, Vb, FL,
                cadence=cadence, refill_levels=refill,
                max_contribution=max_contribution, interpret=interpret)
        else:
            zl = jnp.zeros((n,), dtype)
            _, (Hr, Hg, Hb) = jax.lax.scan(
                rev_outer_ik, (zl, zl, zl),
                (Vr, Vg, Vb, FL), reverse=True)
            # only the first `refill` LEVELS can start paths
            lvl = lambda x: x.reshape(outer * cadence, n)[:refill]
            starts = (lvl(FL) & 4) != 0
            keys = jnp.logical_not(starts).astype(jnp.int8)  # started first
            _, hr, hg, hb = jax.lax.sort(
                (keys, lvl(Hr), lvl(Hg), lvl(Hb)),
                dimension=-1, num_keys=1, is_stable=True)
        NIs_s = NIs.reshape(outer * cadence)[:refill]
        rows = jnp.stack([hr, hg, hb], axis=-1)      # (refill, N, 3)

        def write_row_ik(acc_c, xs):
            row, ni_s = xs
            return jax.lax.dynamic_update_slice(
                acc_c, row, (ni_s - item_base, jnp.int32(0))), None

        acc, _ = jax.lax.scan(write_row_ik, acc, (rows, NIs_s))
        return acc, state, jnp.stack([next_item, segs[0], segs[1]])

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
        # merged V/FL record planes (see fwd_step_ik)
        Vr, Vg, Vb, FL = rec_planes
        # image-texture patch (texture.go:70-86), batched over the whole
        # cadence block of record planes
        Vr, Vg, Vb = pallas_bounce.patch_image_weight_planes(
            scene, Vr, Vg, Vb, img_planes)
        rec = (Vr, Vg, Vb, FL, take, ni_step) + \
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
        E, W, cf, no, nd, na = bounce_fn(o, d, t, alive, u)
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
        # merge to the V/FL record format (E and W are disjoint: lights/
        # background terminate, scatterers don't emit — materials.go)
        emit = jnp.any(E != 0.0, axis=-1)
        V = jnp.where(emit[:, None], E, W)
        fl = ((cf & alive).astype(jnp.int32)
              | (emit.astype(jnp.int32) << 1))
        rec = (V, fl, take, ni_step)
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
        # ys shapes: V*/FL (outer, cadence, N); STs (outer, N); NIs (outer,)
        (Vr, Vg, Vb, FL, STs, NIs) = rec_ys[:6]
        PERMs = rec_ys[6] if reorder else None
    else:
        steps = jnp.arange(window)
        do_refills = (steps < refill) & (steps % cadence == 0)
        step_keys = jax.random.split(base_key, window)
        (state, next_item), ((Vs, FLs, STs_w, NIs_w), segs) = jax.lax.scan(
            fwd_step, (state, next_item), (step_keys, do_refills))
        # convert per-step (window, N, 3) records to the unified
        # component-plane outer layout (slow fallback path only)
        comp = lambda x, c: x[..., c].reshape(outer, cadence, n)
        Vr, Vg, Vb = (comp(Vs, c) for c in range(3))
        FL = FLs.reshape(outer, cadence, n)
        STs = STs_w.reshape(outer, cadence, n)[:, 0]   # refills only at j==0
        NIs = NIs_w.reshape(outer, cadence)[:, 0]

    # reverse harvest: L = clamp?(E + W*L), evaluated backward over the
    # recorded bounce levels, then each refill row's started lanes
    # compacted to the row front (lane order == item order) so the
    # accumulator writes are contiguous dynamic-update-slices.
    #
    # GRT_HARVEST=fused (pallas path only): ONE fused Pallas grid pass
    # (ops/pallas/harvest.py) does the clamp recursion AND a bit-decomposed
    # whole-row stable partition in VMEM. Standalone it beats the XLA
    # epilogue (~3ms vs ~9ms at 128k lanes x 256 levels on the v5e), but
    # at the WINDOW level it measures a wash at every cadence (within the
    # tunnel's noise; docs/PERFORMANCE.md round-3 table) — the round-2
    # "14.3ms harvest sort" cost it was built to remove no longer exists
    # after the record-plane/material-carry rework — and its Mosaic
    # compile is not covered by the persistent cache (~50s per fresh
    # process per config). Default: XLA scan+sort.
    #
    # Fallback: one OUTER step (cadence bounce levels, unrolled) per scan
    # iteration — 4x fewer scan iterations and one harvest row per outer
    # step instead of one per bounce. TPU scatters serialize (~75ns/row —
    # the original per-step scatter-set was 97% of window time) and a
    # single global sort of window*N entries is ~2/3 of window time, so
    # instead: within a step the taken lanes are a PREFIX of dead lanes in
    # lane order, i.e. already in slot order. A batched per-row stable
    # sort by the 1-bit started flag compacts each step's harvests to the
    # row front, and rows land with sequential contiguous
    # dynamic-update-slices at their recorded item bases — later rows'
    # zero/garbage tail padding only ever overwrites item rows that a
    # later row (or the next window's first row) then fills with real
    # data.
    refill_outer_s = refill_outer  # static
    if use_pallas and not reorder and harvest == "fused":
        from go_raytracer_tpu.ops.pallas import harvest as pharvest

        hr, hg, hb = pharvest.reverse_harvest(
            Vr, Vg, Vb, FL, STs,
            cadence=cadence, refill_outer=refill_outer_s,
            max_contribution=max_contribution, interpret=interpret)
        NIs_s = NIs[:refill_outer_s]
        rows = jnp.stack([hr, hg, hb], axis=-1)

        def write_row(acc_c, xs):
            row, ni_s = xs
            return jax.lax.dynamic_update_slice(
                acc_c, row, (ni_s - item_base, jnp.int32(0))), None

        acc, _ = jax.lax.scan(write_row, acc, (rows, NIs_s))
        seg_t = jnp.sum(segs)
        return acc, state, jnp.stack(
            [next_item, seg_t & jnp.int32((1 << 30) - 1), seg_t >> 30])

    def rev_outer(L, xs):
        vr, vg, vb, fl, started = xs[:5]
        Lr, Lg, Lb = L
        for j in reversed(range(cadence)):
            emit = (fl[j] & 2) != 0
            raw_r = jnp.where(emit, vr[j], vr[j] * Lr)
            raw_g = jnp.where(emit, vg[j], vg[j] * Lg)
            raw_b = jnp.where(emit, vb[j], vb[j] * Lb)
            # firefly clamp (camera.go:334-341): rescale so the component
            # sum <= max_contribution; NaN sums compare false (Go parity)
            s = raw_r + raw_g + raw_b
            over = ((fl[j] & 1) != 0) & (s > max_contribution)
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
            _, Lr, Lg, Lb = jax.lax.sort((xs[5], Lr, Lg, Lb),
                                         dimension=0, num_keys=1,
                                         is_stable=False)
        return (Lr, Lg, Lb), (hr, hg, hb)

    zero_l = jnp.zeros((n,), dtype)
    rev_xs = (Vr, Vg, Vb, FL, STs) + \
        ((PERMs,) if reorder else ())
    _, (Hr, Hg, Hb) = jax.lax.scan(
        rev_outer, (zero_l, zero_l, zero_l), rev_xs, reverse=True)

    # only refill outer steps can start paths: compact/write those rows
    # only (static slice — drain-tail rows carry no harvests)
    starts = STs[:refill_outer]
    NIs_s = NIs[:refill_outer]
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
    # one packed scalar triple -> ONE host readback per window (each
    # separate int() readback pays a full tunnel round trip, ~25ms)
    seg_t = jnp.sum(segs)
    return acc, state, jnp.stack(
        [next_item, seg_t & jnp.int32((1 << 30) - 1), seg_t >> 30])


@partial(jax.jit, donate_argnums=(2, 3),
         static_argnames=("width", "npix", "sqrt_spp", "total_items",
                          "window", "refill", "cadence", "n_u", "max_depth",
                          "max_contribution", "use_pallas", "interpret",
                          "reorder", "inkernel", "harvest", "early_exit",
                          "use_ext"))
def _run_window(scene: T.Scene, arrays: camera_mod.CameraArrays,
                acc, state, next_item, base_key, *,
                width, npix, sqrt_spp, total_items, window, refill, cadence,
                n_u, max_depth, max_contribution, use_pallas, interpret,
                reorder=False, inkernel=False, harvest="xla",
                early_exit=True, use_ext=False):
    return _window_impl(
        scene, arrays, acc, state, next_item, base_key,
        jnp.int32(0), jnp.int32(total_items),
        width=width, npix=npix, sqrt_spp=sqrt_spp, window=window,
        refill=refill, cadence=cadence, n_u=n_u, max_depth=max_depth,
        max_contribution=max_contribution, use_pallas=use_pallas,
        interpret=interpret, reorder=reorder, inkernel=inkernel,
        harvest=harvest, early_exit=early_exit, use_ext=use_ext)


def _pos_tables(npix: int, n_strata: int, n: int):
    """Static positional schedule: lane L owns the contiguous block
    [lane_base[L], lane_base[L]+quota[L]) of the PIXEL-MAJOR item index
    (item = pixel*n_strata + stratum), blocks as even as possible
    (quota differs by at most 1). Because a lane's items are consecutive,
    they span at most G = max(last_pix-first_pix)+1 pixels — G is tiny
    (2-5 for every reference config), which is what lets the harvest
    accumulate into per-lane pixel slots instead of compacting 128k-lane
    rows with a sort (docs/PERFORMANCE.md)."""
    total = npix * n_strata
    q, r = divmod(total, n)
    lanes = np.arange(n, dtype=np.int64)
    quota = np.full(n, q, np.int64)
    quota[:r] += 1
    lane_base = lanes * q + np.minimum(lanes, r)
    first_pix = lane_base // n_strata
    last_pix = (lane_base + np.maximum(quota, 1) - 1) // n_strata
    G = int((last_pix - first_pix).max()) + 1
    return (quota.astype(np.int32), lane_base.astype(np.int32),
            first_pix.astype(np.int32), G)


def _window_impl_pos(scene: T.Scene, arrays: camera_mod.CameraArrays,
                     Br, Bg, Bb, state, quota, lane_base, first_pix,
                     base_key, *,
                     width, npix, sqrt_spp, n_strata, G, window, refill,
                     cadence, n_u, max_depth, max_contribution, use_pallas,
                     interpret):
    """One generation window under the POSITIONAL schedule.

    Versus the item-queue `_window_impl`: a lane's next item is always
    `lane_base + k` (k = its start count, state plane 8), so the refill
    needs no rank cumsum and the queue cursor disappears; the reverse
    scan carries a per-lane start countdown and emits each harvest's
    pixel-slot index g = pixel(item) - first_pix in [0, G), and the
    harvests land in the (G, N) accumulators with G masked row-reduces —
    no 128k-lane compaction sort, no item-indexed accumulator, no
    row-write scan. The film is one host bincount of B at render end.
    The price is static load balance: lanes with unluckily long paths
    finish their quota late, so the drain tail is a few sparse windows
    instead of one (measured ~5-10% at 100spp; the sort it replaces was
    ~30% of window device time)."""
    n = state[0].shape[0]
    dtype = state[0].dtype

    if use_pallas:
        from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce

        tables = pallas_bounce.pack_scene(scene, cull=False)
        statics = pallas_bounce.scene_statics(scene)
        statics["cull"] = False
        cam_row = pallas_bounce.pack_camera(arrays)

    def refill_assign(k, alive, do_refill):
        take = do_refill & (~alive) & (k < quota)
        item = lane_base + k              # this start's global item id
        pid = item // n_strata
        stratum = item % n_strata
        s_i = (stratum // sqrt_spp).astype(dtype)
        s_j = (stratum % sqrt_spp).astype(dtype)
        return take, pid, s_i, s_j

    def fwd_step_fused(state, seed2):
        """In-kernel scheduler (bounce.bounce_fused_pos): the kernel
        refills dead lanes at EVERY inner bounce step (per-lane take
        needs no global cumsum), so there is no cadence idle between a
        path's death and its lane's next start. State carries the item
        pointer as (pi, pj, si, sj, rem) small-integer f32 planes."""
        (ox, oy, oz, dx, dy, dz, t, alive, depth,
         pi, pj, si, sj, rem) = state
        (rec_planes, img_planes, segc, nox, noy, noz, ndx, ndy, ndz, ntm,
         alive2, depth2, pi2, pj2, si2, sj2, rem2) = \
            pallas_bounce.bounce_fused_pos(
                tables, statics, cam_row, scene.background, seed2,
                ox, oy, oz, dx, dy, dz, t, alive.astype(jnp.int32), depth,
                pi, pj, si, sj, rem,
                has_defocus=arrays.defocus_angle > 0, max_depth=max_depth,
                n_inner=cadence, width=width, sqrt_spp=sqrt_spp,
                interpret=interpret)
        Er, Eg, Eb, Wr, Wg, Wb, CF, STp = rec_planes
        Wr, Wg, Wb = pallas_bounce.patch_image_weight_planes(
            scene, Wr, Wg, Wb, img_planes)
        rec = (Er, Eg, Eb, Wr, Wg, Wb, CF, STp)
        state2 = (nox, noy, noz, ndx, ndy, ndz, ntm, alive2 > 0, depth2,
                  pi2, pj2, si2, sj2, rem2)
        return state2, (rec, jnp.sum(segc))

    def fwd_step(state, inputs):
        step_key, do_refill = inputs
        ox, oy, oz, dx, dy, dz, t, alive, k, depth = state
        o = jnp.stack([ox, oy, oz], axis=-1)
        d = jnp.stack([dx, dy, dz], axis=-1)
        k_u, k_rays = jax.random.split(step_key)
        take, pid, s_i, s_j = refill_assign(k, alive, do_refill)
        o_n, d_n, t_n = camera_mod.generate_rays(
            arrays, width, pid, s_i, s_j, k_rays, dtype=dtype)
        o = jnp.where(take[:, None], o_n, o)
        d = jnp.where(take[:, None], d_n, d)
        t = jnp.where(take, t_n, t)
        k2 = k + take.astype(jnp.int32)
        depth = jnp.where(take, 0, depth)
        alive = alive | take
        u = jax.random.uniform(k_u, (n, n_u), dtype=dtype)
        E, W, cf, no, nd, na = wavefront._bounce(scene, o, d, t, alive, u)
        dead2 = ~alive
        E = jnp.where(dead2[:, None], 0.0, E)
        W = jnp.where(dead2[:, None], 0.0, W)
        seg = jnp.sum(alive.astype(jnp.int32))
        na = na & (depth < max_depth)
        depth = jnp.where(alive, depth + 1, depth)
        rec = (E, W, cf & alive, take)
        state2 = (no[:, 0], no[:, 1], no[:, 2], nd[:, 0], nd[:, 1],
                  nd[:, 2], t, na, k2, depth)
        return state2, (rec, seg)

    outer = window // cadence
    refill_outer = -(-refill // cadence)
    zero_l = jnp.zeros((n,), dtype)
    if use_pallas:
        osteps = jnp.arange(outer, dtype=jnp.int32) * cadence
        refill_rem = jnp.clip(refill - osteps, 0, cadence)
        seeds = jax.random.randint(base_key, (outer,),
                                   jnp.iinfo(jnp.int32).min,
                                   jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        seed2 = jnp.stack([seeds, refill_rem], axis=1)  # (outer, 2)
        state, (rec_ys, segs) = jax.lax.scan(fwd_step_fused, state, seed2)
        (Er, Eg, Eb, Wr, Wg, Wb, CF, STs) = rec_ys   # STs (outer, cad, N)
        k_after = quota - jnp.round(state[13]).astype(jnp.int32)

        # reverse harvest with in-scan slot accumulation: the clamp
        # recursion as in the queue schedule, plus the item-pointer
        # RETREAT (exact inverse of the kernel's per-start advance) so
        # each harvest knows its pixel slot g, accumulated straight into
        # the carried (G, N) planes — no H materialization, no sort
        fpix_f = first_pix.astype(dtype)
        wf = jnp.float32(width)
        sqf = jnp.float32(sqrt_spp)

        def rev_outer(carry, xs):
            Lr, Lg, Lb, pi, pj, si, sj, Br, Bg, Bb = carry
            er, eg, eb, wr, wg, wb, cf, stp = xs
            for j in reversed(range(cadence)):
                raw_r = er[j] + wr[j] * Lr
                raw_g = eg[j] + wg[j] * Lg
                raw_b = eb[j] + wb[j] * Lb
                s = raw_r + raw_g + raw_b
                over = (cf[j] != 0) & (s > max_contribution)
                scale = jnp.where(
                    over, max_contribution / jnp.where(over, s, 1.0), 1.0)
                Lr, Lg, Lb = raw_r * scale, raw_g * scale, raw_b * scale
                started = stp[j] != 0
                sj_r = sj - 1.0
                bor_s = sj_r < -0.5
                sj_r = jnp.where(bor_s, sqf - 1.0, sj_r)
                si_r = si - jnp.where(bor_s, 1.0, 0.0)
                bor_i = si_r < -0.5
                si_r = jnp.where(bor_i, sqf - 1.0, si_r)
                ret_p = bor_s & bor_i
                pi_r = pi - jnp.where(ret_p, 1.0, 0.0)
                bor_p = pi_r < -0.5
                pi_r = jnp.where(bor_p, wf - 1.0, pi_r)
                pj_r = pj - jnp.where(bor_p, 1.0, 0.0)
                pi = jnp.where(started, pi_r, pi)
                pj = jnp.where(started, pj_r, pj)
                si = jnp.where(started, si_r, si)
                sj = jnp.where(started, sj_r, sj)
                g = pj * wf + pi - fpix_f
                for gi in range(G):
                    m = started & (g == float(gi))
                    Br = Br.at[gi].add(jnp.where(m, Lr, 0.0))
                    Bg = Bg.at[gi].add(jnp.where(m, Lg, 0.0))
                    Bb = Bb.at[gi].add(jnp.where(m, Lb, 0.0))
                Lr = jnp.where(started, 0.0, Lr)
                Lg = jnp.where(started, 0.0, Lg)
                Lb = jnp.where(started, 0.0, Lb)
            return (Lr, Lg, Lb, pi, pj, si, sj, Br, Bg, Bb), None

        init = (zero_l, zero_l, zero_l,
                state[9], state[10], state[11], state[12], Br, Bg, Bb)
        carry, _ = jax.lax.scan(rev_outer, init,
                                (Er, Eg, Eb, Wr, Wg, Wb, CF, STs),
                                reverse=True)
        Br, Bg, Bb = carry[7], carry[8], carry[9]
    else:
        steps = jnp.arange(window)
        do_refills = (steps < refill) & (steps % cadence == 0)
        step_keys = jax.random.split(base_key, window)
        state, ((Es, Ws, CFs, STs_w), segs) = jax.lax.scan(
            fwd_step, state, (step_keys, do_refills))
        comp = lambda x, c: x[..., c].reshape(outer, cadence, n)
        Er, Eg, Eb = (comp(Es, c) for c in range(3))
        Wr, Wg, Wb = (comp(Ws, c) for c in range(3))
        CF = CFs.reshape(outer, cadence, n)
        STs = STs_w.reshape(outer, cadence, n)[:, 0]
        k_after = state[8]

        # reverse harvest: identical clamp recursion, plus a per-lane
        # start countdown so each harvest knows its item (= lane_base + k)
        # and thus its pixel slot g without any recorded cursor
        def rev_outer(carry, xs):
            Lr, Lg, Lb, cnt = carry
            er, eg, eb, wr, wg, wb, cf, started = xs
            for j in reversed(range(cadence)):
                raw_r = er[j] + wr[j] * Lr
                raw_g = eg[j] + wg[j] * Lg
                raw_b = eb[j] + wb[j] * Lb
                s = raw_r + raw_g + raw_b
                over = (cf[j] != 0) & (s > max_contribution)
                scale = jnp.where(
                    over, max_contribution / jnp.where(over, s, 1.0), 1.0)
                Lr, Lg, Lb = raw_r * scale, raw_g * scale, raw_b * scale
            cnt2 = cnt - started.astype(jnp.int32)
            g = jnp.where(started,
                          (lane_base + cnt2) // n_strata - first_pix, -1)
            hr = jnp.where(started, Lr, 0.0)
            hg = jnp.where(started, Lg, 0.0)
            hb = jnp.where(started, Lb, 0.0)
            Lr = jnp.where(started, 0.0, Lr)
            Lg = jnp.where(started, 0.0, Lg)
            Lb = jnp.where(started, 0.0, Lb)
            return (Lr, Lg, Lb, cnt2), (hr, hg, hb, g)

        _, (Hr, Hg, Hb, Gm) = jax.lax.scan(
            rev_outer, (zero_l, zero_l, zero_l, k_after),
            (Er, Eg, Eb, Wr, Wg, Wb, CF, STs), reverse=True)

        Hr, Hg, Hb, Gm = (x[:refill_outer] for x in (Hr, Hg, Hb, Gm))
        for gi in range(G):
            m = Gm == gi
            Br = Br.at[gi].add(jnp.sum(jnp.where(m, Hr, 0.0), axis=0))
            Bg = Bg.at[gi].add(jnp.sum(jnp.where(m, Hg, 0.0), axis=0))
            Bb = Bb.at[gi].add(jnp.sum(jnp.where(m, Hb, 0.0), axis=0))

    # k never exceeds quota, so sum(k) == total_items <=> all lanes done:
    # the packed cursor pair has the same meaning as the queue schedule's
    cur = jnp.stack([jnp.sum(k_after), jnp.sum(segs)])
    return Br, Bg, Bb, state, cur


@partial(jax.jit, donate_argnums=(2, 3, 4, 5),
         static_argnames=("width", "npix", "sqrt_spp", "n_strata", "G",
                          "window", "refill", "cadence", "n_u", "max_depth",
                          "max_contribution", "use_pallas", "interpret"))
def _run_window_pos(scene: T.Scene, arrays: camera_mod.CameraArrays,
                    Br, Bg, Bb, state, quota, lane_base, first_pix,
                    base_key, *,
                    width, npix, sqrt_spp, n_strata, G, window, refill,
                    cadence, n_u, max_depth, max_contribution, use_pallas,
                    interpret):
    return _window_impl_pos(
        scene, arrays, Br, Bg, Bb, state, quota, lane_base, first_pix,
        base_key, width=width, npix=npix, sqrt_spp=sqrt_spp,
        n_strata=n_strata, G=G, window=window, refill=refill,
        cadence=cadence, n_u=n_u, max_depth=max_depth,
        max_contribution=max_contribution, use_pallas=use_pallas,
        interpret=interpret)


def _init_state_pos(n, dtype, use_pallas, quota_np, base_np, n_strata,
                    width, k_np=None):
    """Fresh (or resumed-at-k) positional lane state. Pallas layout (14
    planes): (o xyz, d xyz, t, alive, depth, pi, pj, si, sj, rem) — the
    item pointer decomposed into exact small-integer f32 planes the
    in-kernel scheduler advances. XLA-fallback layout: the 10-plane
    `_init_state` with the start count k at plane 8."""
    k0 = np.zeros(n, np.int64) if k_np is None \
        else np.asarray(k_np, np.int64)
    if not use_pallas:
        st = _init_state(n, dtype)
        return st[:8] + (jnp.asarray(k0, jnp.int32), st[9])
    item = base_np.astype(np.int64) + k0
    pix = item // n_strata
    strat = item % n_strata
    sqrt_spp = int(round(np.sqrt(n_strata)))
    z = lambda: jnp.zeros((n,), dtype)
    f = lambda a: jnp.asarray(a, dtype)
    return (z(), z(), z(), z(), z(), jnp.ones((n,), dtype), z(),
            jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
            f(pix % width), f(pix // width),
            f(strat // sqrt_spp), f(strat % sqrt_spp),
            f(np.maximum(quota_np.astype(np.int64) - k0, 0)))


def _pos_state_k(state, quota_np, use_pallas):
    """The per-lane start count k from either positional state layout
    (for checkpointing)."""
    if use_pallas:
        rem = np.asarray(state[13])
        return (quota_np.astype(np.int64)
                - np.round(rem).astype(np.int64)).astype(np.int32)
    return np.asarray(state[8])


def _pos_film(Br, Bg, Bb, first_pix_np, npix, n_strata, h, w):
    """Film assembly from the positional accumulators: one bincount per
    channel over the static (slot -> pixel) map; slots a lane never owns
    hold exact zeros, so clipping their (out-of-range) pixel ids is
    harmless."""
    G = Br.shape[0]
    pix = first_pix_np[None, :] + np.arange(G, dtype=np.int64)[:, None]
    flat = pix.clip(0, npix - 1).ravel()
    chans = [np.bincount(flat, weights=np.asarray(Bc, dtype=np.float64).ravel(),
                         minlength=npix) for Bc in (Br, Bg, Bb)]
    return (np.stack(chans, axis=-1) / n_strata).reshape(h, w, 3) \
        .astype(np.float32)


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


@functools.partial(jax.jit, static_argnames=("total_items", "n_strata",
                                              "npix", "h", "w"))
def _assemble_image(acc, *, total_items, n_strata, npix, h, w):
    """Final film assembly on device, as ONE jitted program: the eager
    slice+reshape+mean path dispatched one tunneled op each (~240-330ms
    of post-render latency on the v5e); this reduces on-device and
    transfers only the (h, w, 3) image. Module-level so the jit cache
    persists across renders."""
    return jnp.mean(acc[:total_items].reshape(n_strata, npix, 3),
                    axis=0).reshape(h, w, 3)


def _auto_refill(total_items: int, n: int, d1: int, cadence: int,
                 cam) -> int:
    """Workload-sized refill for the in-kernel queue: enough start levels
    that one window consumes the whole item queue. Expected traced
    segments per lane = (items / lanes) x mean path length; the scene's
    `regen_len` hint is that mean, measured at the reference config
    (stats: segments / paths). Shorter windows split the render and pay
    one ~d1-level drain tail (plus one dispatch round trip) per split;
    longer ones run pure drain. Capped so the (window, n) record planes +
    harvest buffers (~56 B/lane/level) stay well inside the v5e's 16 GB
    HBM, and floored at the old queue's 4x(depth+1)."""
    est_len = getattr(cam, "regen_len", 0.0) or 3.0
    # 3% pad: if the hint undersizes (len varies with seed), a second
    # mostly-empty window runs — one drain tail + dispatch round trip —
    # so slight overshoot is the cheaper miss, but padding is drain:
    # cornell at refill 816 (~workload) runs 594M rays/s, at 872 (+8%)
    # 564M. Floor d1: below that the drain dominates any window.
    # Measured (book3, len 5.54, 137 segments/lane): floor 4*d1 gives
    # occupancy 0.53, workload-sized 0.73.
    need = int(total_items / n * est_len * 1.03) + 1
    cap = max(d1, int((8 << 30) / (56 * n)))
    # above the cap, split the workload into equal windows: 2678 levels
    # at cap 1170 runs [1170, 1170, 338-drain] at occupancy 0.68, but
    # three even 893s run ~full (the last window's drain is the only
    # partial stretch)
    k = -(-need // cap)
    refill = max(d1, -(-need // k))
    return -(-refill // cadence) * cadence


def _resolve_cadence(cadence: int, cam) -> int:
    """0 = auto: the camera's per-scene hint (registry-tuned), else 1."""
    if cadence > 0:
        return cadence
    return cam.regen_cadence if getattr(cam, "regen_cadence", 0) > 0 else 1


def _render_regen_sharded_pos(scene, arrays, cam, mesh, key, n,
                              n_dev, dtype, *, axis, spec, rep, shard,
                              npix, n_strata, total_items, width, h,
                              sqrt_spp, window, refill, cadence, n_u,
                              use_pallas, interpret):
    """Positional-schedule core of render_regen_sharded: the global lane
    pool (n_dev * n lanes) owns static item blocks; each device carries
    the lane-sharded slice of the quota/base/first-pix tables and its own
    (G, n) accumulators. Per-window cross-device traffic is two psums and
    one tiny all_gather of replicated scalars."""
    from jax import shard_map

    n_tot = n_dev * n
    quota_np, base_np, fpix_np, G = _pos_tables(npix, n_strata, n_tot)
    to_dev = lambda a: jax.device_put(jnp.asarray(a), shard)
    quota = to_dev(quota_np)
    lane_base = to_dev(base_np)
    first_pix = to_dev(fpix_np)
    # positional state (built over the GLOBAL lane pool, then lane-sharded;
    # layout depends on the backend — see _init_state_pos)
    state = _init_state_pos(n_tot, dtype, use_pallas, quota_np, base_np,
                            n_strata, width)
    state = tuple(jax.device_put(s.reshape((n_dev, n) + s.shape[1:]), shard)
                  for s in state)
    B = [jax.device_put(jnp.zeros((n_dev, G, n), dtype), shard)
         for _ in range(3)]
    # int32 cumulative per-shard segments: bounded by windows*window*n
    # per shard — fine up to ~2e9 segments/shard (s64 needs jax x64)
    seg_cum = jnp.zeros((n_dev,), jnp.int32)

    pos_statics = dict(width=width, npix=npix, sqrt_spp=sqrt_spp,
                       n_strata=n_strata, G=G, window=window, refill=refill,
                       cadence=cadence, n_u=n_u, max_depth=cam.max_depth,
                       max_contribution=cam.max_contribution,
                       use_pallas=use_pallas, interpret=interpret)

    def body(scene_a, arrays_a, Br_s, Bg_s, Bb_s, state_s, q_s, b_s, f_s,
             seg_cum_r, wkey):
        i = jax.lax.axis_index(axis)
        bkey = jax.random.fold_in(wkey, i)
        Br2, Bg2, Bb2, state2, cur = _window_impl_pos(
            scene_a, arrays_a, Br_s[0], Bg_s[0], Bb_s[0],
            tuple(x[0] for x in state_s), q_s, b_s, f_s, bkey,
            **pos_statics)
        started_all = jax.lax.psum(cur[0], axis)
        seg_all = jax.lax.psum(cur[1], axis)
        # per-shard cumulative segments carried ON DEVICE so the host
        # never syncs mid-pipeline for the work-balance metric
        seg_cum2 = seg_cum_r + jax.lax.all_gather(cur[1], axis)
        return (Br2[None], Bg2[None], Bb2[None],
                tuple(x[None] for x in state2),
                jnp.stack([started_all, seg_all]), seg_cum2)

    sharded_window = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, spec, spec, spec, spec, spec, spec, spec,
                  rep, rep),
        out_specs=(spec, spec, spec, spec, rep, rep),
        check_vma=False))

    from go_raytracer_tpu.utils import progress
    bar = progress.Bar(total_items, enabled=False)

    state_box = [state]

    def dispatch(wkey):
        nonlocal seg_cum
        (B[0], B[1], B[2], state_box[0],
         cur, seg_cum) = sharded_window(
            scene, arrays, B[0], B[1], B[2], state_box[0],
            quota, lane_base, first_pix, seg_cum, wkey)
        return cur

    t0 = _time.perf_counter()
    _, segments, n_windows, window_times = _window_pipeline(
        dispatch, total_items, key, 0, bar)
    seg_per_shard = np.asarray(seg_cum, dtype=np.int64)
    elapsed = _time.perf_counter() - t0

    Bs = [np.asarray(c) for c in B]
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        Bs = [multihost_utils.process_allgather(c, tiled=False) for c in B]
        Bs = [np.asarray(c) for c in Bs]
    # (n_dev, G, n) -> global (G, n_tot) with lane = d*n + local
    Bg_ = [c.transpose(1, 0, 2).reshape(G, n_tot) for c in Bs]
    linear = _pos_film(Bg_[0], Bg_[1], Bg_[2], fpix_np, npix, n_strata,
                       h, width)
    stats = {
        "elapsed_s": elapsed,
        "segments": segments,
        "paths": total_items,
        "rays_per_s": segments / elapsed if elapsed > 0 else float("nan"),
        "paths_per_s": total_items / elapsed if elapsed > 0 else float("nan"),
        "windows": n_windows,
        "window_s": window_times,
        "devices": n_dev,
        "schedule": "positional",
        "segments_per_shard": seg_per_shard.tolist(),
        "work_balance": float(seg_per_shard.min()
                              / max(seg_per_shard.max(), 1)),
        "occupancy": segments / max(n_windows * window * n * n_dev, 1),
    }
    return linear, stats


def render_regen_sharded(scene: T.Scene, cam: camera_mod.Camera, mesh, key,
                         n_lanes: int = 1 << 17, refill_len: int = 0,
                         cadence: int = 0, backend: str = "auto",
                         reorder="auto", schedule: str = "auto",
                         dtype=jnp.float32):
    """Multi-device regeneration render over a 1-D `jax.sharding.Mesh`.

    TPU-native scaling design: the (pixel, stratum) work is split per
    device and each device runs an INDEPENDENT persistent-lane pool over
    its share (its own refill cursor and RNG stream via fold_in on the
    mesh axis index) — zero per-step collectives; data only crosses ICI
    when the per-window replicated scalars are reduced and when the final
    sharded accumulator is assembled into the image. This is the regen
    analog of SURVEY.md §2's pixel/sample sharding, applied to the fast
    path. With `schedule="queue"` each device owns a contiguous item
    range; with "positional" the global lane pool (n_dev * n_lanes lanes)
    owns static per-lane blocks (`_pos_tables`) and the per-device tables
    are just lane-sharded slices of the global ones.

    Returns (linear image (H, W, 3), stats) with per-shard item/segment
    accounting in stats."""
    from jax import shard_map
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
    n = n_lanes  # per device
    n_u = wavefront.N_FIXED_U + scene.media.count
    chunk = (total_items + n_dev - 1) // n_dev

    from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce
    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_bounce.supported(scene) and n % 4096 == 0)
    use_ext = (backend in ("auto", "pallas") and not use_pallas
               and scene.has_tri_bvh
               and pallas_bounce.supported_ext(scene) and n % 4096 == 0
               and os.environ.get("GRT_MESH_EXT", "1") == "1")
    # "auto" matches render_regen: in-kernel queue when the fused kernel
    # carries the scene; per-device refill sized to the device's chunk
    inkernel = (schedule in ("auto", "queue_ik")
                and use_pallas and not _auto_reorder(use_pallas, reorder))
    refill = refill_len or (_auto_refill(chunk, n, d1, cadence, cam)
                            if inkernel else 4 * d1)
    if scene.has_tri_bvh and not use_pallas:
        cadence = 1  # see render_regen: cadence>1 mesh windows crash compile
    window = -(-(refill + d1) // cadence) * cadence
    statics = dict(width=w, npix=npix, sqrt_spp=sqrt_spp, window=window,
                   refill=refill, cadence=cadence, n_u=n_u,
                   max_depth=cam.max_depth,
                   max_contribution=cam.max_contribution,
                   use_pallas=use_pallas,
                   interpret=jax.default_backend() != "tpu",
                   reorder=_auto_reorder(use_pallas, reorder),
                   inkernel=inkernel,
                   harvest=os.environ.get(
                       "GRT_HARVEST",
                       "fused" if inkernel else "xla"),
                   early_exit=os.environ.get("GRT_NO_EARLY_EXIT") != "1",
                   use_ext=use_ext)

    spec = P(axis)
    rep = P()
    shard = NamedSharding(mesh, spec)

    # materialize the initial sharded state ON DEVICE via out_shardings:
    # eager device_put with a NamedSharding reshards THROUGH THE HOST on
    # the tunneled backend (measured ~0.7 s hidden in the first window's
    # sync for a 131k-lane pool — 6x the whole window)
    @functools.partial(jax.jit, out_shardings=shard)
    def _sharded_state():
        dev = lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape)
        return tuple(dev(x) for x in _init_state(n, dtype))

    state = _sharded_state()

    # "auto" matches render_regen's resolution
    if schedule == "positional":
        return _render_regen_sharded_pos(
            scene, arrays, cam, mesh, key, n, n_dev, dtype,
            axis=axis, spec=spec, rep=rep, shard=shard, npix=npix,
            n_strata=n_strata, total_items=total_items, width=w, h=h,
            sqrt_spp=sqrt_spp, window=window, refill=refill,
            cadence=cadence, n_u=n_u, use_pallas=use_pallas,
            interpret=statics["interpret"])

    @functools.partial(jax.jit, out_shardings=(shard, shard))
    def _sharded_acc():
        return (jnp.zeros((n_dev, chunk + n, 3), dtype),
                jnp.arange(n_dev, dtype=jnp.int32) * chunk)

    acc, next_items = _sharded_acc()

    def body(scene_a, arrays_a, acc_s, state_s, next_s, wkey):
        i = jax.lax.axis_index(axis)
        base = i * jnp.int32(chunk)
        end = jnp.minimum(base + chunk, total_items)
        bkey = jax.random.fold_in(wkey, i)
        acc2, state2, cur = _window_impl(
            scene_a, arrays_a, acc_s[0], tuple(x[0] for x in state_s),
            next_s[0], bkey, base, end, **statics)
        # cursor = [next_item, seg_lo, seg_hi] (30-bit segment words; a
        # whole-render window can exceed int32 segments on large configs)
        next2, seg_lo, seg_hi = cur[0], cur[1], cur[2]
        # replicated outputs so the host loop never reads a sharded array —
        # required for multi-host operation. Segment words are NOT psum'd
        # on device: each per-shard lo word is < 2^30 by construction, but
        # their int32 sum overflows once n_dev * lo >= 2^31; the
        # all-gathered per-shard vector (tiny, once per window) carries the
        # exact words and the host sums them in int64
        done_all = jax.lax.psum((next2 >= end).astype(jnp.int32), axis)
        rem_all = jax.lax.psum(jnp.maximum(end - next2, 0), axis)
        seg_vec = jnp.stack([jax.lax.all_gather(seg_lo, axis),
                             jax.lax.all_gather(seg_hi, axis)])
        return (acc2[None], tuple(x[None] for x in state2), next2[None],
                done_all, rem_all, seg_vec)

    sharded_window = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, spec, spec, spec, rep),
        out_specs=(spec, spec, spec, rep, rep, rep),
        check_vma=False), donate_argnums=(2, 3, 4))

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
        done_all, rem_all, seg_vec = cur
        vec = np.asarray(seg_vec, dtype=np.int64)
        shard_segs = vec[0] + (vec[1] << 30)
        segments += int(shard_segs.sum())
        seg_per_shard += shard_segs
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
        (acc, state, next_items, done_all, rem_all,
         seg_vec) = sharded_window(scene, arrays, acc, state, next_items,
                                   wkey)
        cur = (done_all, rem_all, seg_vec)
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

    # film assembly ON DEVICE (jitted, replicated output): reading the
    # raw sharded accumulator to host cost 15.7 s through the tunnel for
    # the full cornell config (434 MB at ~30 MB/s) — the round-3 jitted
    # assembly had only been applied to the unsharded path. The jit's
    # replicated out_sharding makes every host read its own addressable
    # copy (multi-host safe), and only the (h, w, 3) image crosses to
    # the host.
    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, rep))
    def _assemble_sharded(acc_s):
        flat = acc_s[:, :chunk].reshape(n_dev * chunk, 3)
        lin = flat[:total_items].reshape(n_strata, npix, 3).mean(axis=0)
        return lin.reshape(h, w, 3)

    linear = np.asarray(_assemble_sharded(acc))
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


def _window_pipeline(dispatch, total_items, key, n_windows, bar,
                     checkpoint_cb=None, checkpoint_every=4, start_i=0):
    """Depth-1 window pipeline shared by both schedules.

    The device executes a window in ~2/3 of its wall time — the rest is
    the host->tunnel dispatch + cursor-readback round trip (~20ms/window
    measured on the v5e tunnel). `dispatch(wkey)` launches one window
    (chaining all state device-side) and returns its packed
    [items-started-cursor, segments] device pair; the pipeline reads each
    pair one window late so window k+1 is already in flight during
    window k's readback. A starts-per-window estimate keeps the tail
    honest: when the in-flight window likely drains the work, sync
    instead of dispatching a speculative no-op window (the first window
    is always synced to learn the estimate, so single-window renders
    behave exactly as the unpipelined loop). Returns
    (final cursor, segments, n_windows, per-dispatch wall times)."""
    segments = 0
    next_i = start_i
    window_times = []
    pending = None          # cursor pair of the in-flight window
    s_est = None            # starts per window, from the last sync

    def sync(cur):
        nonlocal next_i, segments, s_est
        prev = next_i
        vals = [int(x) for x in np.asarray(cur)]         # one readback
        next_i = vals[0]
        # [next_item, seg] or [next_item, seg_lo, seg_hi] (30-bit words)
        seg = vals[1] + (vals[2] << 30 if len(vals) > 2 else 0)
        segments += seg
        if next_i > prev:
            s_est = next_i - prev
        bar.tick(next_i - bar.done)

    while next_i < total_items:
        if pending is not None and s_est is not None \
                and total_items - next_i <= 1.25 * s_est:
            sync(pending)    # in-flight window likely finishes the work
            pending = None
            continue
        wt0 = _time.perf_counter()
        cur = dispatch(jax.random.fold_in(key, n_windows))
        n_windows += 1
        if pending is not None:
            sync(pending)    # overlaps with the window just dispatched
            pending = cur
        elif s_est is None:
            sync(cur)        # first window: learn starts-per-window
        else:
            pending = cur
        window_times.append(_time.perf_counter() - wt0)
        if checkpoint_cb and n_windows % checkpoint_every == 0:
            if pending is not None:
                sync(pending)    # saved state must match the saved cursor
                pending = None
            checkpoint_cb(next_i, n_windows)
    if pending is not None:
        sync(pending)        # final (possibly no-op) in-flight window
    if checkpoint_cb and window_times:
        # final save after the pipeline drains, so a finished render
        # always leaves a completed checkpoint (resume = zero new windows)
        checkpoint_cb(next_i, n_windows)
    return next_i, segments, n_windows, window_times


def render_regen(scene: T.Scene, cam: camera_mod.Camera, key,
                 n_lanes: int = 1 << 17, refill_len: int = 0,
                 cadence: int = 0, backend: str = "auto", reorder="auto",
                 schedule: str = "auto", harvest: str = "auto",
                 dtype=jnp.float32,
                 checkpoint_path=None, checkpoint_every: int = 4,
                 scene_name: str = "", verbose: bool = False):
    """Render the full image with ray regeneration — the production path.

    Returns (linear image (H, W, 3), stats). `refill_len` defaults to
    4*(max_depth+1) (measured best on the Cornell workload). `cadence` > 1
    restarts lanes only every `cadence` steps — fewer harvest rows to
    compact at the cost of lane idle time between paths.

    `schedule` picks the work assignment: "queue_ik" = dynamic item queue
    with the refill INSIDE the fused kernel at every bounce level
    (bounce_fused_q: a dead lane restarts the step its path dies; no
    cadence/occupancy tradeoff), "queue" = the same queue refilled from
    XLA at the cadence boundary (rank-cumsum refill + sort-compacted
    harvest), "positional" = static per-lane item blocks (`_pos_tables`:
    no cumsum, no harvest sort — measured negative: per-lane quota
    variance stretches the drain; see docs/PERFORMANCE.md). "auto"
    resolves to queue_ik whenever the fused kernel carries the scene
    (v5e, cornell 100spp: 594M rays/s at occupancy 0.93 vs queue's
    252.9M), else queue.

    Checkpoint/resume: between windows no path state is in flight (every
    started path completes inside its window), so (accumulator, cursor,
    window count) is a consistent checkpoint; a matching prior checkpoint
    resumes where it left off (per-schedule format).
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
    n = n_lanes
    n_u = wavefront.N_FIXED_U + scene.media.count

    from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce
    # the fused kernel tiles lanes as (32, 128) blocks
    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_bounce.supported(scene) and n % 4096 == 0)
    # mesh scenes (supported() excludes triangles): the EXT-HIT mode runs
    # the binned/walk closest hit + attribute gathers in XLA and hands
    # the per-lane hit planes to the fused bounce kernel, which carries
    # everything else (materials/lights/media/textures) — replacing the
    # whole-XLA wavefront shell. GRT_MESH_EXT=0 reverts to the XLA shell.
    use_ext = (backend in ("auto", "pallas") and not use_pallas
               and scene.has_tri_bvh
               and pallas_bounce.supported_ext(scene) and n % 4096 == 0
               and os.environ.get("GRT_MESH_EXT", "1") == "1")
    # "auto" resolves to the in-kernel queue (bounce_fused_q: the dynamic
    # item queue's refill runs at EVERY bounce level inside the kernel, so
    # a dead lane restarts the step its path dies) whenever the fused
    # kernel carries the scene; "queue" keeps the refill in XLA at the
    # cadence boundary; "positional" is the measured-negative static
    # schedule kept for experiments. Measured (v5e, cornell 100spp):
    # queue_ik 594M rays/s at occupancy 0.93 vs queue 252.9M.
    positional = schedule == "positional"
    inkernel = (schedule in ("auto", "queue_ik")
                and use_pallas and not _auto_reorder(use_pallas, reorder))
    # Window length. The old queue pays a refill cumsum + harvest sort per
    # window, and 4x(depth+1) measured best there. The in-kernel queue
    # restarts lanes every step, so the only per-window overhead left is
    # the drain tail (the last ~d1 levels where no new paths start) — the
    # best window covers the WHOLE workload: paths-per-lane x mean path
    # length (the scene's measured `regen_len` hint). Measured sweep
    # (cornell 100spp, c4): refill 204 -> 447M, 816 (~= workload) -> 594M,
    # 1632 (2x workload: pure drain) -> 349M.
    refill = refill_len or (_auto_refill(total_items, n, d1, cadence, cam)
                            if inkernel else 4 * d1)
    window = -(-(refill + d1) // cadence) * cadence
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

    # harvest epilogue: "fused" = ops/pallas/harvest kernel, "xla" =
    # reverse scan + rowwise sort. Resolved HERE (not inside the jitted
    # window — an env read inside jit is not part of the cache key, which
    # silently invalidated the first round-3 A/B) and threaded as a
    # static arg. "auto": the GRT_HARVEST env if set, else fused for the
    # in-kernel queue (its per-LEVEL sort rows are 4x the cadence-4
    # queue's) and xla otherwise.
    if harvest == "auto":
        harvest = os.environ.get("GRT_HARVEST",
                                 "fused" if inkernel else "xla")
    state = _init_state(n, dtype)
    n_windows = 0
    meta = checkpoint_mod.meta_for(scene_name, cam)
    meta["lanes"] = n
    interpret = jax.default_backend() != "tpu"
    bar = progress.Bar(total_items, enabled=verbose)

    if positional:
        quota_np, base_np, fpix_np, G = _pos_tables(npix, n_strata, n)
        quota = jnp.asarray(quota_np)
        lane_base = jnp.asarray(base_np)
        first_pix = jnp.asarray(fpix_np)
        B = [jnp.zeros((G, n), dtype) for _ in range(3)]
        meta["schedule"] = np.bytes_(b"positional")
        start_i = 0
        k_resume = None
        if checkpoint_path:
            loaded = checkpoint_mod.load(checkpoint_path)
            if loaded is not None \
                    and checkpoint_mod.compatible(loaded[2], meta) \
                    and loaded[0].shape == (3, G, n) \
                    and loaded[2].get("schedule") == meta["schedule"]:
                B = [jnp.asarray(loaded[0][c], dtype=dtype) for c in range(3)]
                extra = checkpoint_mod.load_extra(checkpoint_path)
                if "k" in extra and extra["k"].shape == (n,):
                    k_resume = extra["k"]
                    start_i = int(loaded[1])
                    n_windows = int(loaded[2].get("windows", 0))
        state = _init_state_pos(n, dtype, use_pallas, quota_np, base_np,
                                n_strata, w, k_np=k_resume)
        bar.tick(start_i)

        def dispatch(wkey):
            nonlocal B, state
            B[0], B[1], B[2], state, cur = _run_window_pos(
                scene, arrays, B[0], B[1], B[2], state,
                quota, lane_base, first_pix, wkey,
                width=w, npix=npix, sqrt_spp=sqrt_spp, n_strata=n_strata,
                G=G, window=window, refill=refill, cadence=cadence,
                n_u=n_u, max_depth=cam.max_depth,
                max_contribution=cam.max_contribution,
                use_pallas=use_pallas, interpret=interpret)
            return cur

        def checkpoint_cb(ni, nw):
            meta["windows"] = nw
            checkpoint_mod.save(
                checkpoint_path,
                np.stack([np.asarray(c) for c in B]), ni, meta,
                extra={"k": _pos_state_k(state, quota_np, use_pallas)})
    else:
        # `n_lanes` tail rows absorb the final window's row-padding writes
        acc = jnp.zeros((total_items + n, 3), dtype)
        start_i = 0
        if checkpoint_path:
            loaded = checkpoint_mod.load(checkpoint_path)
            if loaded is not None \
                    and checkpoint_mod.compatible(loaded[2], meta) \
                    and loaded[0].shape == acc.shape:
                acc = jnp.asarray(loaded[0], dtype=dtype)
                start_i = int(loaded[1])
                n_windows = int(loaded[2].get("windows", 0))
        bar.tick(start_i)
        next_dev = jnp.int32(start_i)

        def dispatch(wkey):
            nonlocal acc, state, next_dev
            acc, state, cur = _run_window(
                scene, arrays, acc, state, next_dev, wkey,
                width=w, npix=npix, sqrt_spp=sqrt_spp,
                total_items=total_items, window=window, refill=refill,
                cadence=cadence, n_u=n_u, max_depth=cam.max_depth,
                max_contribution=cam.max_contribution,
                use_pallas=use_pallas, interpret=interpret,
                reorder=_auto_reorder(use_pallas, reorder),
                inkernel=inkernel, harvest=harvest,
                early_exit=os.environ.get("GRT_NO_EARLY_EXIT") != "1",
                use_ext=use_ext)
            next_dev = cur[0]
            return cur

        def checkpoint_cb(ni, nw):
            meta["windows"] = nw
            checkpoint_mod.save(checkpoint_path, np.asarray(acc), ni, meta)

    t0 = _time.perf_counter()
    next_i, segments, n_windows, window_times = _window_pipeline(
        dispatch, total_items, key, n_windows, bar,
        checkpoint_cb=checkpoint_cb if checkpoint_path else None,
        checkpoint_every=checkpoint_every, start_i=start_i)
    if positional:
        for c in B:
            c.block_until_ready()
    else:
        acc.block_until_ready()
    bar.close()
    elapsed = _time.perf_counter() - t0

    if positional:
        linear = _pos_film(B[0], B[1], B[2], fpix_np, npix, n_strata, h, w)
    else:
        # item = stratum * npix + pixel -> average over strata
        linear = np.asarray(_assemble_image(
            acc, total_items=total_items, n_strata=n_strata, npix=npix,
            h=h, w=w))
    stats = {
        "elapsed_s": elapsed,
        "segments": segments,
        "paths": total_items,
        "rays_per_s": segments / elapsed if elapsed > 0 else float("nan"),
        "paths_per_s": total_items / elapsed if elapsed > 0 else float("nan"),
        "windows": n_windows,
        "window_s": window_times,
        "schedule": ("positional" if positional
                     else "queue_ik" if inkernel else "queue"),
        "occupancy": segments / max(n_windows * window * n, 1),
    }
    return linear, stats
