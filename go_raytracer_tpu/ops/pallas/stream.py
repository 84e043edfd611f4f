"""Pallas TPU row-stream kernel for the binned mesh intersector.

Each 8-row block (1024 rays) streams ONE contiguous range of packed
8-triangle groups — the union of its rows' sorted-in clusters — as dense
(8, 128) Möller–Trumbore ops. A group entry is LOADED ONCE per block and
evaluated against all 8 ray rows, amortizing the scalar-indexed load
(the BVH8 walk's measured ~100ns/visit latency floor) 8x; lanes testing
a neighbour cluster's triangles are waste, not error (closest-hit
updates are idempotent), and after the cluster sort the block's rows
share clusters anyway.

Block group ranges arrive as SMEM scalar arrays (glo/ghi per block)
computed by the XLA glue (ops/trace.binned_closest) from the sorted
cluster keys; a settled/dead block gets glo == ghi.

Semantics: Möller–Trumbore per objects.go:408-461 — identical arithmetic
to the BVH8 walk kernel (ops/pallas/traverse8.py), hit-for-hit parity —
with the t interval (T_MIN, t_best), t_best seeded from the per-ray cap
(bvh.go:69-82's shrinking rayT.Max).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.ops.pallas.traverse8 import T_MIN, _entry

LANE = 128
TILE_ROWS = 8


def _mt_entry(e, ox, oy, oz, dx, dy, dz, t_best, idx):
    """Möller–Trumbore of one pre-loaded packed group entry (8 tris in
    sublanes) against one 128-ray row; objects.go:408-461 semantics,
    identical to traverse8.make_mt_group with the load hoisted."""
    v0x, v0y, v0z = e[:, 0:1], e[:, 1:2], e[:, 2:3]
    e0x, e0y, e0z = e[:, 3:4], e[:, 4:5], e[:, 5:6]
    e1x, e1y, e1z = e[:, 6:7], e[:, 7:8], e[:, 8:9]
    tid = e[:, 9:10]
    pvx = dy * e1z - dz * e1y
    pvy = dz * e1x - dx * e1z
    pvz = dx * e1y - dy * e1x
    det = e0x * pvx + e0y * pvy + e0z * pvz
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e0z - tvz * e0y
    qvy = tvz * e0x - tvx * e0z
    qvz = tvx * e0y - tvy * e0x
    vv = (dx * qvx + dy * qvy + dz * qvz) * inv
    tt = (e1x * qvx + e1y * qvy + e1z * qvz) * inv
    ok = ((jnp.abs(det) >= 1e-12)
          & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
          & (uu + vv <= 1.0) & (tt > T_MIN) & (tt < t_best))
    tcand = jnp.where(ok, tt, jnp.inf)
    tmin = jnp.min(tcand, axis=0, keepdims=True)       # (1, 128)
    icand = jnp.max(
        jnp.where(ok & (tcand <= tmin), tid, -1.0),
        axis=0, keepdims=True).astype(jnp.int32)
    upd = tmin < t_best
    t_best = jnp.where(upd, tmin, t_best)
    idx = jnp.where(upd, icand, idx)
    return t_best, idx


def _stream_kernel(tri_ref, glo_ref, ghi_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   t_ref, idx_ref,
                   t_out, idx_out):
    i = pl.program_id(0)
    rows = [
        tuple(ref[pl.ds(s, 1), :] for ref in
              (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref))
        for s in range(TILE_ROWS)
    ]

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
        init.append(t_ref[pl.ds(s, 1), :])
        init.append(idx_ref[pl.ds(s, 1), :])
    res = jax.lax.fori_loop(glo_ref[i], ghi_ref[i], g_body, tuple(init))
    for s in range(TILE_ROWS):
        t_out[pl.ds(s, 1), :] = res[2 * s]
        idx_out[pl.ds(s, 1), :] = res[2 * s + 1]


# chunk of the HBM-resident table staged per DMA: 64 line-blocks =
# 512 groups = (512, 128) f32 = 256 KB; two slots double-buffer inside
# ~1 MB of VMEM regardless of mesh size
_CHUNK_LB = 64

# tables at or under this stay fully VMEM-resident (the fast path: one
# mapped block, zero DMA); beyond it (~196k triangles) the grid streams
# group chunks from HBM. ~12 MB leaves headroom under the ~16 MB/core
# physical VMEM for the ray planes + compiler temporaries.
VMEM_TABLE_BYTES = int(
    os.environ.get("GRT_STREAM_VMEM", 12 * 1024 * 1024))


def _stream_kernel_hbm(tri_hbm, glo_ref, ghi_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       t_ref, idx_ref,
                       t_out, idx_out, scratch, sems):
    """stream_rows body for tables too large for VMEM: the packed group
    table stays in HBM and each block double-buffers _CHUNK_LB line-block
    chunks of its [glo, ghi) range through a 2-slot VMEM scratch. The
    chunk row window is clamped to the table end (re-reading a few
    already-seen groups is idempotent — closest-hit updates only)."""
    i = pl.program_id(0)
    glo = glo_ref[i]
    ghi = ghi_ref[i]
    total_rows = tri_hbm.shape[0]
    chunk_rows = _CHUNK_LB * 8
    lb_lo = glo >> 3
    lb_hi = (ghi + 7) >> 3
    n_chunks = pl.cdiv(jnp.maximum(lb_hi - lb_lo, 0), _CHUNK_LB)

    def chunk_start_row(ci):
        return jnp.minimum((lb_lo + ci * _CHUNK_LB) * 8,
                           total_rows - chunk_rows)

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(chunk_start_row(ci), chunk_rows), :],
            scratch.at[slot],
            sems.at[slot])

    rows = [
        tuple(ref[pl.ds(s, 1), :] for ref in
              (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref))
        for s in range(TILE_ROWS)
    ]

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, carry):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma(1 - slot, ci + 1).start()

        get_dma(slot, ci).wait()
        start_lb = chunk_start_row(ci) >> 3
        # groups of this chunk clipped to the block range; local entry
        # index g - start_lb*8 preserves (>>3, &7) structure because
        # start_lb*8 has zero low bits
        g0 = jnp.maximum(glo, start_lb * 8)
        g1 = jnp.minimum(ghi, (start_lb + _CHUNK_LB) * 8)

        def g_body(g, carry):
            e = _entry(scratch.at[slot], g - start_lb * 8)
            out = []
            for s in range(TILE_ROWS):
                ox, oy, oz, dx, dy, dz = rows[s]
                out.append(_mt_entry(e, ox, oy, oz, dx, dy, dz,
                                     carry[2 * s], carry[2 * s + 1]))
            return tuple(x for pair in out for x in pair)

        return jax.lax.fori_loop(g0, g1, g_body, carry)

    init = []
    for s in range(TILE_ROWS):
        init.append(t_ref[pl.ds(s, 1), :])
        init.append(idx_ref[pl.ds(s, 1), :])
    res = jax.lax.fori_loop(0, n_chunks, chunk_body, tuple(init))
    for s in range(TILE_ROWS):
        t_out[pl.ds(s, 1), :] = res[2 * s]
        idx_out[pl.ds(s, 1), :] = res[2 * s + 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_rows(tri_lines, glo, ghi, ox, oy, oz, dx, dy, dz, t, idx, *,
                interpret=False):
    """Stream each 8-row block's group range against its 1024 rays.

    Ray/t/idx planes are (rows, 128); glo/ghi are (rows//8,) i32 group
    ranges per block (empty => untouched). Returns updated (t, idx).

    Tables <= VMEM_TABLE_BYTES are mapped whole into VMEM; larger tables
    (Sponza-scale meshes) stay HBM-resident and are double-buffer DMA'd
    per block chunk — identical winners either way."""
    rows = ox.shape[0]
    grid = (rows // TILE_ROWS,)
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    table_bytes = tri_lines.size * 4
    if table_bytes > VMEM_TABLE_BYTES:
        chunk_rows = _CHUNK_LB * 8
        if tri_lines.shape[0] < chunk_rows:  # tiny table can't clamp
            pad = chunk_rows - tri_lines.shape[0]
            tri_lines = jnp.concatenate(
                [tri_lines, jnp.zeros((pad, LANE), tri_lines.dtype)])
        t2, idx2 = pl.pallas_call(
            _stream_kernel_hbm,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      smem_spec, smem_spec] + [row_spec] * 8,
            out_specs=[row_spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                       jax.ShapeDtypeStruct((rows, LANE), jnp.int32)],
            scratch_shapes=[
                pltpu.VMEM((2, chunk_rows, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(tri_lines, glo, ghi, ox, oy, oz, dx, dy, dz, t, idx)
        return t2, idx2
    table_spec = pl.BlockSpec(tri_lines.shape, lambda i: (0, 0))
    params = {}
    if table_bytes > 8 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(table_bytes + 32 * 1024 * 1024))
    t2, idx2 = pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[table_spec, smem_spec, smem_spec] + [row_spec] * 8,
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANE), jnp.int32)],
        interpret=interpret,
        **params,
    )(tri_lines, glo, ghi, ox, oy, oz, dx, dy, dz, t, idx)
    return t2, idx2


def _round_kernel(k_cl, n_mask, n_oct,
                  tri_ref, box_ref, glo_ref, ghi_ref, ca_ref, cb_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  t_ref, idx_ref, *refs):
    """One FUSED traversal round for an 8-row block: stream the block's
    group range (exactly _stream_kernel), mark the streamed cluster
    interval [ca, cb] in the per-lane processed-bit planes, then scan
    the cluster boxes for each lane's next candidate — v1's XLA
    candidate/mask fusions (~2-4 ms per bounce level on the S8 profile)
    collapse into the kernel. The octet loop is python-unrolled so mask
    words index statically (n_oct <= 32 for K <= 256)."""
    m_in = refs[:n_mask]
    t_out, idx_out = refs[n_mask], refs[n_mask + 1]
    key_out = refs[n_mask + 2]
    m_out = refs[n_mask + 3:]
    i = pl.program_id(0)
    rows = [
        tuple(ref[pl.ds(s, 1), :] for ref in
              (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref))
        for s in range(TILE_ROWS)
    ]

    # ---- stream ---------------------------------------------------------
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
        init.append(t_ref[pl.ds(s, 1), :])
        init.append(idx_ref[pl.ds(s, 1), :])
    res = jax.lax.fori_loop(glo_ref[i], ghi_ref[i], g_body, tuple(init))
    t_b = [res[2 * s] for s in range(TILE_ROWS)]
    i_b = [res[2 * s + 1] for s in range(TILE_ROWS)]

    # ---- mark [ca, cb] in the per-lane masks ---------------------------
    a = ca_ref[i]
    b = cb_ref[i]
    full = jnp.int32(-1)
    masks = []
    for j in range(n_mask):
        lo_b = jnp.clip(a - 32 * j, 0, 32)
        hi_b = jnp.clip(b + 1 - 32 * j, 0, 32)
        hi_bits = jnp.where(hi_b >= 32, full, (jnp.int32(1) << hi_b) - 1)
        lo_bits = jnp.where(lo_b >= 32, full, (jnp.int32(1) << lo_b) - 1)
        seg = jnp.bitwise_and(hi_bits, ~lo_bits)
        masks.append([m_in[j][pl.ds(s, 1), :] | seg
                      for s in range(TILE_ROWS)])

    # ---- next-candidate scan -------------------------------------------
    tiny = 1e-30
    iota8i = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    iota8 = iota8i.astype(jnp.float32)
    big_k = jnp.float32(k_cl)
    for s in range(TILE_ROWS):
        ox, oy, oz, dx, dy, dz = rows[s]
        sd = lambda v: jnp.where(jnp.abs(v) < tiny,
                                 jnp.where(v < 0, -tiny, tiny), v)
        ivx, ivy, ivz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)
        bn = jnp.full((1, LANE), jnp.inf, jnp.float32)
        bk = jnp.full((1, LANE), big_k, jnp.float32)
        for m in range(n_oct):
            e = _entry(box_ref, m)
            kid = jnp.float32(8 * m) + iota8
            free = jnp.bitwise_and(
                jnp.right_shift(masks[m >> 2][s], (m & 3) << 3), 0xFF)
            free = jnp.bitwise_and(jnp.right_shift(
                jnp.broadcast_to(free, (8, LANE)), iota8i), 1) == 0
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
            ok = jnp.logical_and(near < jnp.minimum(far, t_b[s]), free)
            nearm = jnp.where(ok, near, jnp.inf)
            rmin = jnp.min(nearm, axis=0, keepdims=True)
            kmin = jnp.min(jnp.where(
                jnp.logical_and(ok, nearm <= rmin), kid, big_k),
                axis=0, keepdims=True)
            better = jnp.logical_or(
                rmin < bn, jnp.logical_and(rmin == bn, kmin < bk))
            bn = jnp.where(better, rmin, bn)
            bk = jnp.where(better, kmin, bk)
        t_out[pl.ds(s, 1), :] = t_b[s]
        idx_out[pl.ds(s, 1), :] = i_b[s]
        key_out[pl.ds(s, 1), :] = bk.astype(jnp.int32)
        for j in range(n_mask):
            m_out[j][pl.ds(s, 1), :] = masks[j][s]


@functools.partial(jax.jit, static_argnames=("k_cl", "interpret"))
def stream_round_rows(tri_lines, box_lines, glo, ghi, ca, cb,
                      ox, oy, oz, dx, dy, dz, t, idx, masks, *,
                      k_cl, interpret=False):
    """One fused traversal round (stream + interval mark + next-candidate
    scan) per 8-row block; see _round_kernel. masks: tuple of per-lane
    (rows, 128) i32 processed-bit planes. Returns (t, idx, key, masks')
    where key is each lane's next candidate cluster (k_cl = none)."""
    rows = ox.shape[0]
    grid = (rows // TILE_ROWS,)
    n_mask = len(masks)
    n_oct = (k_cl + 7) // 8
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    table_bytes = (tri_lines.size + box_lines.size) * 4
    params = {}
    if table_bytes > 8 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(table_bytes + 32 * 1024 * 1024))
    outs = pl.pallas_call(
        functools.partial(_round_kernel, k_cl, n_mask, n_oct),
        grid=grid,
        in_specs=[table_spec(tri_lines), table_spec(box_lines)]
        + [smem_spec] * 4 + [row_spec] * (8 + n_mask),
        out_specs=[row_spec] * (3 + n_mask),
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((rows, LANE), jnp.int32)]
        + [jax.ShapeDtypeStruct((rows, LANE), jnp.int32)] * n_mask,
        interpret=interpret,
        **params,
    )(tri_lines, box_lines, glo, ghi, ca, cb,
      ox, oy, oz, dx, dy, dz, t, idx, *masks)
    return outs[0], outs[1], outs[2], tuple(outs[3:])
