"""Pallas TPU BVH8 traversal: sublane-batched closest-hit over triangle
meshes.

The binary tile walk (traverse.py) tests one box per visit against a
1024-lane tile — rays fill the sublane dimension, so an incoherent tile
walks nearly the whole tree. Here the EIGHT CHILDREN of a wide node fill
the sublane dimension instead (scene/bvh8.py): each walk serves one
128-lane ray row and slab-tests 8 boxes per vector op series at full
(8, 128) register utilisation; leaf visits evaluate Möller–Trumbore for 8
triangles per op series the same way. Walks are stack-based (SMEM scalar
stack, tile-uniform scalar entries — no per-ray dynamic indices, the
constraint that killed the round-1 gather traversal). The visited node
set shrinks to that of a 128-ray bundle — after the Morton/octant sort
(ops/trace.pallas_bvh_closest) an 8x more coherent set than the 1024-lane
tile's — at no vector-efficiency cost.

Semantics match the reference exactly as traverse.py does: slab test per
aabb.go:90-113 with the shrinking per-ray t interval, Möller–Trumbore per
objects.go:408-461; the per-ray `t_cap` carries the closest solid hit from
the cheaper primitive classes (bvh.go:69-82's shrinking rayT.Max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_ROWS = 8          # 8 independent 128-ray walks per grid step
T_MIN = 1.0e-3
STACK = 192            # 8-ary depth ~6-8 => worst live stack ~60; headroom 3x
UNROLL = 4             # stack pops per while iteration (amortizes loop cost)


def _entry(ref, m):
    """Load line-packed entry m (8 entries per line, scene/bvh8._pack_lines):
    rows [(m>>3)*8, +8), lane-roll its 16-field block to lanes [0, 16).
    Returns the rolled (8, 128) value — sublane = child/triangle index,
    lanes 0..15 = fields."""
    line = ref[pl.ds((m >> 3) * 8, 8), :]
    return pltpu.roll(line, 128 - ((m & 7) << 4), 1)


def _entry_padded(ref, m):
    """Load one-per-line entry m (scene/bvh8._pad_lines): rows [m*8, +8),
    fields already at lanes [0, 16) — no roll on the critical path."""
    return ref[pl.ds(m * 8, 8), :]


def make_mt_group(tri_ref, ox, oy, oz, dx, dy, dz):
    """Möller–Trumbore over one packed triangle-group entry: 8 triangles
    (sublanes) x 128 rays (lanes); objects.go:408-461 semantics."""

    def mt_group(g, t_best, idx):
        e = _entry(tri_ref, g)
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

    return mt_group


def _traverse8_kernel(dense_nodes,
                      node_ref, tri_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tcap_ref,
                      t_ref, idx_ref,
                      stack_ref):
    node_entry = _entry if dense_nodes else _entry_padded

    def make_pop(s, base):
        """Build the stack-pop step for the walk serving ray row `s`, with
        its private stack at stack_ref[base:base+STACK]. Returning a
        closure lets two walks' pops interleave inside one loop body: their
        serial load->roll->extract->push chains are independent, so the
        scalar/vector pipelines overlap them (the walk is latency-bound,
        not throughput-bound — measured: batching boxes 8-per-op alone
        reproduced the binary kernel's rate almost exactly)."""
        row = lambda ref: ref[pl.ds(s, 1), :]          # (1, 128)
        ox, oy, oz = row(ox_ref), row(oy_ref), row(oz_ref)
        dx, dy, dz = row(dx_ref), row(dy_ref), row(dz_ref)
        tiny = 1e-30
        sd = lambda d: jnp.where(jnp.abs(d) < tiny,
                                 jnp.where(d < 0, -tiny, tiny), d)
        ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)

        def visit_node(m, sp, t_best, idx):
            e = node_entry(node_ref, m)
            # slab test: 8 child boxes (sublanes) x 128 rays (lanes)
            tx0 = (e[:, 0:1] - ox) * ix
            tx1 = (e[:, 3:4] - ox) * ix
            ty0 = (e[:, 1:2] - oy) * iy
            ty1 = (e[:, 4:5] - oy) * iy
            tz0 = (e[:, 2:3] - oz) * iz
            tz1 = (e[:, 5:6] - oz) * iz
            near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            # empty slots carry NaN boxes: every comparison is false, so
            # they can never set a hit bit
            hit = jnp.maximum(near, T_MIN) < jnp.minimum(far, t_best)
            # pack per-child any-hit into ONE scalar (sum of 2^c over hit
            # children) — per-sublane scalar extraction is a Mosaic
            # legalization risk, a full weighted reduce is not
            anyv = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            # (Mosaic: iota must be integer; int32->f32 casts are fine)
            wt = jnp.exp2(jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0).astype(jnp.float32))
            bits = jnp.sum(anyv * wt).astype(jnp.int32)
            # push hit children; push values for all 8 slots live in
            # sublane 0, lanes 8..15 (scene/bvh8.py). The write at
            # stack[sp] is unconditional (overwritten by the next push
            # when the flag is 0) so there is no per-slot branch.
            for c in range(8):
                push = (bits >> c) & 1
                stack_ref[base + sp] = e[0, 8 + c].astype(jnp.int32)
                sp = sp + push
            return sp, t_best, idx

        mt_group = make_mt_group(tri_ref, ox, oy, oz, dx, dy, dz)

        def visit_leaf(enc, sp, t_best, idx):
            g = enc >> 1
            t_best, idx = mt_group(g, t_best, idx)
            t_best, idx = jax.lax.cond(
                (enc & 1) > 0,
                lambda c: mt_group(g + 1, *c),
                lambda c: c, (t_best, idx))
            return sp, t_best, idx

        def pop_one(state):
            sp, t_best, idx = state
            sp = sp - 1
            m = stack_ref[base + sp]
            return jax.lax.cond(
                m >= 0,
                lambda a: visit_node(m, *a),
                lambda a: visit_leaf(-m - 1, *a),
                (sp, t_best, idx))

        return pop_one

    def walk(s, _):
        """One 128-ray walk. (Negative result, measured on the v5e:
        interleaving TWO walks' pops inside one loop body — independent
        serial chains — ran ~4% SLOWER than this form; Mosaic lowers
        lax.cond to real scalar branches, so the chains cannot overlap
        and the extra carry state just costs registers.)"""
        pop_one = make_pop(s, 0)
        t0 = tcap_ref[pl.ds(s, 1), :]
        i0 = jnp.full(t0.shape, -1, jnp.int32)

        def body(state):
            # unrolled pops amortize the while-loop's per-iteration cost;
            # a finished walk parks at sp == 0 (guarded no-ops)
            for _ in range(UNROLL):
                state = jax.lax.cond(state[0] > 0, pop_one,
                                     lambda st: st, state)
            return state

        stack_ref[0] = 0
        _, t_best, idx = jax.lax.while_loop(
            lambda st: st[0] > 0, body, (jnp.int32(1), t0, i0))
        t_ref[pl.ds(s, 1), :] = t_best
        idx_ref[pl.ds(s, 1), :] = idx
        return 0

    jax.lax.fori_loop(0, TILE_ROWS, walk, 0)


@functools.partial(jax.jit, static_argnames=("dense_nodes", "interpret"))
def bvh8_closest(nodes, tris, o, d, t_cap=None, *, dense_nodes=False,
                 interpret=False):
    """Closest triangle hit for a ray bundle over the packed BVH8 tables
    (scene/bvh8.collapse): returns (t (N,), idx (N,)) with idx the
    leaf-order triangle id (== the scene triangle table index); idx is -1
    (and t == t_cap) where no triangle beats the per-ray cap.
    `dense_nodes` must match the table's bvh8.BVH8.dense_nodes."""
    n_orig = o.shape[0]
    tile = TILE_ROWS * LANE
    n = ((n_orig + tile - 1) // tile) * tile
    pad = n - n_orig
    if t_cap is None:
        t_cap = jnp.full((n_orig,), jnp.inf, jnp.float32)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_cap = jnp.concatenate([t_cap, jnp.zeros((pad,), t_cap.dtype)])
    rows = n // LANE
    shape = (rows, LANE)
    plane = lambda x: x.reshape(rows, LANE).astype(jnp.float32)
    planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
              plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
              plane(t_cap)]

    grid = (rows // TILE_ROWS,)
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    table_bytes = (nodes.size + tris.size) * 4
    params = {}
    if table_bytes > 8 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(table_bytes + 32 * 1024 * 1024))
    outs = pl.pallas_call(
        functools.partial(_traverse8_kernel, dense_nodes),
        grid=grid,
        in_specs=[table_spec(nodes), table_spec(tris)] + [row_spec] * 7,
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
        **params,
    )(nodes, tris, *planes)
    t_best, idx = outs
    return t_best.reshape(n)[:n_orig], idx.reshape(n)[:n_orig]
