"""Pallas TPU BVH8 traversal, mask-machine variant: the per-visit scalar
chain compressed from eight extract+store pushes to two vector reduces
and one conditional remainder push.

The base kernel (traverse8.py) is latency-bound at ~100ns/visit on the
serial scalar chain of a node visit: 8 per-slot scalar extracts of push
values + 8 unconditional SMEM stores + 8 stack-pointer adds (measured:
batching, unrolling, and interleaving all failed to speed it up — the
scalar unit issues in order, so the only lever is a SHORTER chain).

This kernel exploits two invariants of the BVH8 construction
(scene/bvh8.collapse, layout="mask"):
- a node's inner children have CONSECUTIVE node8 ids (BFS assignment),
- a node's leaf-slot triangle groups have CONSECUTIVE group ids,
so a visit's entire outcome is four scalars: (ibase, imask) for inner
children and (lbase, lmask) for leaf triangle groups, where the masks
come from VECTOR weighted reduces of the slab-test hit vector against
per-slot weight fields baked into the node entry (2^rank / group-span
masks). The walk is a little state machine over those masks:

    lmask != 0 -> Möller–Trumbore group lbase + ctz(lmask)
    imask != 0 -> visit node ibase + ctz(imask); if the remainder
                  (imask', lmask) is nonempty it is pushed as ONE
                  3-word stack entry first
    else       -> pop a 3-word entry

Chain-shaped subtrees (one hit child — the common case once the walk is
below the top levels) descend with ZERO stack traffic. ctz is branch-free
scalar arithmetic: the lowest set bit isolated with m & -m converts to
f32 exactly (a power of two), and its exponent field is the bit index.

Semantics are identical to traverse8.py: slab test per aabb.go:90-113
with the shrinking per-ray interval, Möller–Trumbore per
objects.go:408-461, per-ray t_cap from cheaper primitive classes
(bvh.go:69-82's shrinking rayT.Max). Triangle tables are shared with the
base kernel; only the node-entry encoding differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.ops.pallas.traverse8 import (
    LANE, TILE_ROWS, T_MIN, _entry, _entry_padded)

STACK = 160            # entries are whole visit remainders: <= tree depth
UNROLL = 4


def _ctz(m):
    """Index of the lowest set bit of a nonzero i32 scalar, branch-free:
    isolate with m & -m (a power of two), then a 5-step mask ladder of
    pure integer scalar ops. (The f32-exponent bitcast trick does NOT
    legalize: Mosaic rejects scalar tpu.bitcast — 'operand #0 must be
    vector'; this ladder is the verified-legal form.)"""
    x = m & (-m)
    idx = jnp.where((x & jnp.int32(-65536)) != 0, 16, 0)          # 0xFFFF0000
    idx += jnp.where((x & jnp.int32(-16711936)) != 0, 8, 0)       # 0xFF00FF00
    idx += jnp.where((x & jnp.int32(-252645136)) != 0, 4, 0)      # 0xF0F0F0F0
    idx += jnp.where((x & jnp.int32(-858993460)) != 0, 2, 0)      # 0xCCCCCCCC
    idx += jnp.where((x & jnp.int32(-1431655766)) != 0, 1, 0)     # 0xAAAAAAAA
    return idx


def _traverse8m_kernel(dense_nodes,
                       node_ref, tri_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tcap_ref,
                       t_ref, idx_ref,
                       sa_ref, sb_ref, sc_ref):
    node_entry = _entry if dense_nodes else _entry_padded

    def walk(s, _):
        row = lambda ref: ref[pl.ds(s, 1), :]          # (1, 128)
        ox, oy, oz = row(ox_ref), row(oy_ref), row(oz_ref)
        dx, dy, dz = row(dx_ref), row(dy_ref), row(dz_ref)
        tiny = 1e-30
        sd = lambda d: jnp.where(jnp.abs(d) < tiny,
                                 jnp.where(d < 0, -tiny, tiny), d)
        ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)
        # per-slot weight lanes for the mask reduces (static shapes)
        wt_i = lambda e: e[:, 6:7]
        wt_l = lambda e: e[:, 7:8]

        def visit_node(m, t_best):
            """Slab-test node m's 8 child boxes; return the visit outcome
            as (ibase, imask, lbase, lmask) scalars."""
            e = node_entry(node_ref, m)
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
            # NaN boxes in empty slots: every comparison false
            hit = jnp.maximum(near, T_MIN) < jnp.minimum(far, t_best)
            anyv = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            im = jnp.sum(anyv * wt_i(e)).astype(jnp.int32)
            lm = jnp.sum(anyv * wt_l(e)).astype(jnp.int32)
            ib = e[0, 8].astype(jnp.int32)
            lb = e[0, 9].astype(jnp.int32)
            return ib, im, lb, lm

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

        def do_mt(st):
            sp, ib, im, lb, lm, t_best, idx = st
            r = _ctz(lm)
            t_best, idx = mt_group(lb + r, t_best, idx)
            return sp, ib, im, lb, lm & (lm - 1), t_best, idx

        def do_node(st):
            sp, ib, im, lb, lm, t_best, idx = st
            r = _ctz(im)
            m = ib + r
            im2 = im & (im - 1)

            def push(sp):
                sa_ref[sp] = (ib << 8) | im2
                sb_ref[sp] = lb
                sc_ref[sp] = lm
                return sp + 1

            sp = jax.lax.cond((im2 | lm) > 0, push, lambda sp: sp, sp)
            ib, im, lb, lm = visit_node(m, t_best)
            return sp, ib, im, lb, lm, t_best, idx

        def do_pop(st):
            sp, _, _, _, _, t_best, idx = st
            sp = sp - 1
            wa = sa_ref[sp]
            return (sp, wa >> 8, wa & 255, sb_ref[sp], sc_ref[sp],
                    t_best, idx)

        def step(st):
            # leaf groups first (earliest t shrink), then descend, then pop
            return jax.lax.cond(
                st[4] > 0, do_mt,
                lambda s: jax.lax.cond(s[2] > 0, do_node, do_pop, s), st)

        def body(st):
            for _ in range(UNROLL):
                live = (st[0] > 0) | (st[2] > 0) | (st[4] > 0)
                st = jax.lax.cond(live, step, lambda s: s, st)
            return st

        t0 = tcap_ref[pl.ds(s, 1), :]
        i0 = jnp.full(t0.shape, -1, jnp.int32)
        # start as if the root were the single inner child of a virtual
        # parent: imask = 1, ibase = 0
        st0 = (jnp.int32(0), jnp.int32(0), jnp.int32(1), jnp.int32(0),
               jnp.int32(0), t0, i0)
        st = jax.lax.while_loop(
            lambda st: (st[0] > 0) | (st[2] > 0) | (st[4] > 0), body, st0)
        t_ref[pl.ds(s, 1), :] = st[5]
        idx_ref[pl.ds(s, 1), :] = st[6]
        return 0

    jax.lax.fori_loop(0, TILE_ROWS, walk, 0)


@functools.partial(jax.jit, static_argnames=("dense_nodes", "interpret"))
def bvh8m_closest(nodes, tris, o, d, t_cap=None, *, dense_nodes=False,
                  interpret=False):
    """Closest triangle hit over mask-layout BVH8 tables
    (scene/bvh8.collapse(layout="mask")); same contract as
    traverse8.bvh8_closest."""
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
        functools.partial(_traverse8m_kernel, dense_nodes),
        grid=grid,
        in_specs=[table_spec(nodes), table_spec(tris)] + [row_spec] * 7,
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
        **params,
    )(nodes, tris, *planes)
    t_best, idx = outs
    return t_best.reshape(n)[:n_orig], idx.reshape(n)[:n_orig]
