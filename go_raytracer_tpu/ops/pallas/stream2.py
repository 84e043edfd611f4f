"""Persistent-block binned mesh intersector, v2 (round 5).

v1 (ops/pallas/stream.py + ops/trace.binned_closest) pays three XLA
programs per traversal round — a 14-plane lax.sort, an (N, K) candidate
scan, and the stream kernel — and carries K/32 processed-bit planes
through every sort, which caps K at ~128-256 and therefore forces fat
(512-tri) clusters: the round-5 S8 profile shows the resulting dense
Möller–Trumbore streams are 62% of the whole render.

v2 moves the WHOLE round loop inside one Pallas kernel. Each 8-row
block (1024 rays) loops — in-kernel candidate scan over the packed
cluster-box lines, block range reduce, dense group stream, processed-
interval marking — until none of its lanes has a candidate left. Lanes
never move inside the kernel, so the processed set is BLOCK-UNIFORM
(every mark is a block-wide interval): it lives as a handful of SCALAR
i32 words in the while carry and never rides a sort. K is no longer
capped by sort width, clusters shrink (default 128 tris, K <= 1024),
and the streamed triangle volume drops ~4x. Blocks drain independently
(no global phase structure, no tail-round pool shrink), and the
per-level XLA shell is ONE coherence sort + ONE kernel launch.

A frontier-only variant (per-lane (near, k) lexicographic cursor, no
processed set) was built first and measured 40x SLOWER on the v5e:
without interval marking a block settles one cluster per lane per round
while still streaming its whole [min, max] pick range, so wide early
rounds are pure waste. The interval marking makes them productive —
every cluster a block streams is settled for every lane (v1's
invariant).

Ray grouping: lanes are sorted once per level by (direction octant,
origin Morton cell) — geometric locality, which the round-3 simulation
measured tighter than leading-candidate grouping — so a block's lanes
pick neighbouring clusters and its streamed range stays narrow.

Exact semantics: identical Möller–Trumbore arithmetic and winner
selection as v1/the BVH8 walk (traverse8.make_mt_group); shrinking
(T_MIN, t_best) interval seeded from the per-ray cap (bvh.go:69-82);
front-to-back candidate order + strict near < t_best candidacy
reproduce the BVH early-out. Winners bit-match the walk
(tests/test_binned.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.ops.pallas.stream import _mt_entry
from go_raytracer_tpu.ops.pallas.traverse8 import T_MIN, _entry

LANE = 128
TILE_ROWS = 8
_MAX_ROUNDS = 4096  # safety backstop
import os
_RANGE_W = int(os.environ.get("GRT_B2_RANGE", "32"))  # clusters per round


def _stream2_kernel(k2, n_oct, tri_ref, box_ref, gs_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    t_ref, idx_ref,
                    t_out, idx_out):
    """One 8-row block's COMPLETE binned traversal: rounds of
    [candidate scan -> range reduce -> stream -> interval mark] until no
    lane in the block has an unprocessed candidate cluster."""
    n_mask = (k2 + 31) // 32
    rows = [
        tuple(ref[pl.ds(s, 1), :] for ref in
              (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref))
        for s in range(TILE_ROWS)
    ]
    tiny = 1e-30
    invs = []
    for s in range(TILE_ROWS):
        ox, oy, oz, dx, dy, dz = rows[s]
        sd = lambda v: jnp.where(jnp.abs(v) < tiny,
                                 jnp.where(v < 0, -tiny, tiny), v)
        invs.append((1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)))
    iota8i = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    iota8 = iota8i.astype(jnp.float32)
    big_k = jnp.float32(k2)

    def scan_all(t_bests, masks):
        """Per-lane nearest unprocessed hit cluster for all 8 rows at
        once (octet-OUTER so one box-line load serves every row).
        `masks` = n_mask SCALAR i32 words — the processed set is BLOCK-
        uniform. Returns (pks, any, min_k, max_k)."""

        def oct_body(m, carry):
            e = _entry(box_ref, m)
            kid = jnp.float32(8.0) * m.astype(jnp.float32) + iota8
            # the octet's 8 kids are bits [8m, 8m+8) = one byte of
            # scalar mask word m>>2; select the word by traced index
            word = m >> 2
            mw = masks[0]
            for j in range(1, n_mask):
                mw = jnp.where(word == j, masks[j], mw)
            byte = jnp.right_shift(mw, (m & 3) << 3)
            bits = jnp.bitwise_and(jnp.right_shift(byte, iota8i), 1)
            free = bits == 0                                   # (8, 1)
            out = []
            for s in range(TILE_ROWS):
                bn, bk = carry[2 * s], carry[2 * s + 1]
                ox, oy, oz = rows[s][0], rows[s][1], rows[s][2]
                ivx, ivy, ivz = invs[s]
                tx0 = (e[:, 0:1] - ox) * ivx
                tx1 = (e[:, 3:4] - ox) * ivx
                ty0 = (e[:, 1:2] - oy) * ivy
                ty1 = (e[:, 4:5] - oy) * ivy
                tz0 = (e[:, 2:3] - oz) * ivz
                tz1 = (e[:, 5:6] - oz) * ivz
                near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.minimum(tz0, tz1))
                far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                              jnp.maximum(ty0, ty1)),
                                  jnp.maximum(tz0, tz1))
                near = jnp.maximum(near, T_MIN)
                ok = near < jnp.minimum(far, t_bests[s])
                ok = jnp.logical_and(ok, free)
                nearm = jnp.where(ok, near, jnp.inf)
                rmin = jnp.min(nearm, axis=0, keepdims=True)   # (1, 128)
                # ok-masked: an all-miss octet (rmin = inf) must not emit
                # a phantom pick (livelocks the block)
                kmin = jnp.min(jnp.where(
                    jnp.logical_and(ok, nearm <= rmin), kid, big_k),
                    axis=0, keepdims=True)
                better = jnp.logical_or(
                    rmin < bn, jnp.logical_and(rmin == bn, kmin < bk))
                out.append(jnp.where(better, rmin, bn))
                out.append(jnp.where(better, kmin, bk))
            return tuple(out)

        init = []
        for s in range(TILE_ROWS):
            init.append(jnp.full((1, LANE), jnp.inf, jnp.float32))
            init.append(jnp.full((1, LANE), big_k, jnp.float32))
        res = jax.lax.fori_loop(0, n_oct, oct_body, tuple(init))
        pks = tuple(res[2 * s + 1] for s in range(TILE_ROWS))
        kmin = big_k
        kmax = jnp.float32(-1.0)
        for s in range(TILE_ROWS):
            kmin = jnp.minimum(kmin, jnp.min(pks[s]))
            kmax = jnp.maximum(kmax, jnp.max(jnp.where(pks[s] < big_k,
                                                       pks[s], -1.0)))
        return pks, kmax >= 0.0, kmin, kmax

    t0 = tuple(t_ref[pl.ds(s, 1), :] for s in range(TILE_ROWS))
    i0 = tuple(idx_ref[pl.ds(s, 1), :] for s in range(TILE_ROWS))
    masks0 = tuple(jnp.int32(0) for _ in range(n_mask))
    pks, has, kmin, kmax = scan_all(t0, masks0)

    def cond(c):
        i, _, _, _, has, _, _ = c
        return jnp.logical_and(i < _MAX_ROUNDS, has)

    def body(c):
        (i, t_bests, idxs, masks, has, kmin, kmax) = c
        a = kmin.astype(jnp.int32)
        # WINDOWED range: an outlier lane can stretch [min, max] across
        # the table; capping the round at _RANGE_W clusters keeps every
        # round front-to-back productive (nearest clusters settle first,
        # t_best shrinks, later rounds prune the far picks)
        b = jnp.minimum(kmax.astype(jnp.int32), a + _RANGE_W - 1)
        glo = gs_ref[a]
        ghi = gs_ref[b + 1]

        def g_body(g, carry):
            e = _entry(tri_ref, g)
            out = []
            for s in range(TILE_ROWS):
                ox, oy, oz, dx, dy, dz = rows[s]
                out.append(_mt_entry(e, ox, oy, oz, dx, dy, dz,
                                     carry[2 * s], carry[2 * s + 1]))
            return tuple(x for pair in out for x in pair)

        init = []
        for s in range(TILE_ROWS):
            init.append(t_bests[s])
            init.append(idxs[s])
        res = jax.lax.fori_loop(glo, ghi, g_body, tuple(init))
        t2 = tuple(res[2 * s] for s in range(TILE_ROWS))
        i2 = tuple(res[2 * s + 1] for s in range(TILE_ROWS))
        # every cluster in [a, b] was streamed against every lane of the
        # block: mark scalar bits [a, b+1)
        full = jnp.int32(-1)
        new_masks = []
        for j in range(n_mask):
            lo_b = jnp.clip(a - 32 * j, 0, 32)
            hi_b = jnp.clip(b + 1 - 32 * j, 0, 32)
            hi_bits = jnp.where(hi_b >= 32, full,
                                (jnp.int32(1) << hi_b) - 1)
            lo_bits = jnp.where(lo_b >= 32, full,
                                (jnp.int32(1) << lo_b) - 1)
            new_masks.append(masks[j] | jnp.bitwise_and(hi_bits, ~lo_bits))
        new_masks = tuple(new_masks)
        pks2, has2, kmin2, kmax2 = scan_all(t2, new_masks)
        return (i + 1, t2, i2, new_masks, has2, kmin2, kmax2)

    state = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, i0, masks0, has, kmin, kmax))
    t_fin, i_fin = state[1], state[2]
    for s in range(TILE_ROWS):
        t_out[pl.ds(s, 1), :] = t_fin[s]
        idx_out[pl.ds(s, 1), :] = i_fin[s]


@functools.partial(jax.jit, static_argnames=("k2", "interpret"))
def stream2_rows(tri_lines, box_lines, gs, ox, oy, oz, dx, dy, dz, t, idx,
                 *, k2, interpret=False):
    """Run the complete binned traversal for every 8-row block.

    Ray/t/idx planes are (rows, 128) in coherence-sorted order; gs is
    the (K2+1,) i32 group-offset table; k2 the cluster count (static).
    Returns updated (t, idx)."""
    rows = ox.shape[0]
    grid = (rows // TILE_ROWS,)
    n_oct = (k2 + 7) // 8
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    table_bytes = (tri_lines.size + box_lines.size) * 4
    params = {}
    if table_bytes > 8 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(table_bytes + 32 * 1024 * 1024))
    t2, idx2 = pl.pallas_call(
        functools.partial(_stream2_kernel, k2, n_oct),
        grid=grid,
        in_specs=[table_spec(tri_lines), table_spec(box_lines), smem_spec]
        + [row_spec] * 8,
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANE), jnp.int32)],
        interpret=interpret,
        **params,
    )(tri_lines, box_lines, gs, ox, oy, oz, dx, dy, dz, t, idx)
    return t2, idx2
