"""Interleaved branchless BVH8 traversal (experimental A/B vs traverse8).

traverse8.py's walk is LATENCY-bound: each pop is one long dependent
chain (SMEM pop -> dynamic VMEM node load -> slab test -> lane reduce ->
8 serialized pushes) and `lax.cond` lowers to real scalar branches, so
chains of different pops can never overlap — measured ~100ns/visit with
the VPU mostly idle, and a 2-walk cond-based interleave measured 4%
SLOWER (round 2).

This variant removes every branch from the pop body so K independent
walks (one per 128-ray row) can be software-pipelined through one
`while` loop:

- A pop evaluates BOTH interpretations of the popped entry — the 8-child
  slab test AND one Möller–Trumbore leaf group — unconditionally, on
  index-0-clamped garbage where inapplicable, and selects effects with
  scalar masks (hit-bit word zeroed for leaf/dead pops; MT accept mask
  ANDed with `is_leaf`).
- Two-group leaves re-push their second group instead of cond-calling a
  second MT: the unified push loop's slot-0 value selects between the
  second-group encoding (leaf pop) and child 0 (node pop), so every pop
  makes exactly 8 unconditional stack stores like the base kernel.
- Dead walks keep popping masked garbage (sp pinned at 0) until the
  shared `while` predicate — any(sp_k > 0) — clears.

Semantics are identical to traverse8 (same tables, same slab/MT forms,
same t_cap pruning); only visit ORDER differs immaterially (a 2-group
leaf's second group is evaluated one pop later instead of in the same
pop). Hit results are bit-identical: t_best is a running min and group
contents don't overlap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.ops.pallas.traverse8 import (
    LANE, TILE_ROWS, T_MIN, STACK, _entry, _entry_padded)


def _traverse8i_kernel(dense_nodes, ilv, unroll,
                       node_ref, tri_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tcap_ref,
                       t_ref, idx_ref,
                       stack_ref):
    node_entry = _entry if dense_nodes else _entry_padded

    def make_step(s, base):
        """Branchless single-pop step for the walk serving ray row `s`
        with a private stack at stack_ref[base : base+STACK]."""
        row = lambda ref: ref[pl.ds(s, 1), :]          # (1, 128)
        ox, oy, oz = row(ox_ref), row(oy_ref), row(oz_ref)
        dx, dy, dz = row(dx_ref), row(dy_ref), row(dz_ref)
        tiny = 1e-30
        sd = lambda d: jnp.where(jnp.abs(d) < tiny,
                                 jnp.where(d < 0, -tiny, tiny), d)
        ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)

        def step(state):
            sp, t_best, idx = state
            alive = sp > 0
            sp2 = jnp.maximum(sp - 1, 0)
            enc = stack_ref[base + sp2]                # garbage when dead
            is_node = jnp.logical_and(alive, enc >= 0)
            is_leaf = jnp.logical_and(alive, enc < 0)
            m = jnp.where(is_node, enc, 0)
            lenc = jnp.where(is_leaf, -enc - 1, 0)
            g = lenc >> 1
            two = lenc & 1                             # 1: second group g+1

            # --- node interpretation: slab-test 8 children ---
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
            hit = jnp.maximum(near, T_MIN) < jnp.minimum(far, t_best)
            anyv = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            wt = jnp.exp2(jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0).astype(jnp.float32))
            bits = jnp.sum(anyv * wt).astype(jnp.int32)
            bits = jnp.where(is_node, bits, 0)

            # --- leaf interpretation: one Moller-Trumbore group ---
            te = _entry(tri_ref, g)
            v0x, v0y, v0z = te[:, 0:1], te[:, 1:2], te[:, 2:3]
            e0x, e0y, e0z = te[:, 3:4], te[:, 4:5], te[:, 5:6]
            e1x, e1y, e1z = te[:, 6:7], te[:, 7:8], te[:, 8:9]
            tid = te[:, 9:10]
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
                  & (uu + vv <= 1.0) & (tt > T_MIN) & (tt < t_best)
                  & is_leaf)
            tcand = jnp.where(ok, tt, jnp.inf)
            tmin = jnp.min(tcand, axis=0, keepdims=True)       # (1, 128)
            icand = jnp.max(
                jnp.where(ok & (tcand <= tmin), tid, -1.0),
                axis=0, keepdims=True).astype(jnp.int32)
            upd = tmin < t_best
            t_best = jnp.where(upd, tmin, t_best)
            idx = jnp.where(upd, icand, idx)

            # --- unified push loop: 8 unconditional stores ---
            # slot 0's value doubles as the 2-group leaf's re-push; its
            # advance doubles as that re-push's sp bump (bits==0 on leaf
            # pops, two==0 on node pops, both 0 when dead).
            spw = sp2
            for c in range(8):
                val = e[0, 8 + c].astype(jnp.int32)
                inc = (bits >> c) & 1
                if c == 0:
                    val = jnp.where(is_leaf, -(2 * (g + 1)) - 1, val)
                    inc = inc + two
                stack_ref[base + spw] = val
                spw = spw + inc
            return spw, t_best, idx

        return step

    steps = [make_step(s, s * STACK) for s in range(TILE_ROWS)]
    t0s = [tcap_ref[pl.ds(s, 1), :] for s in range(TILE_ROWS)]
    i0 = jnp.full((1, LANE), -1, jnp.int32)

    # K-interleaved groups: TILE_ROWS/ilv sequential groups of ilv walks
    # advanced in lockstep through one branch-free while body.
    for g0 in range(0, TILE_ROWS, ilv):
        walks = list(range(g0, g0 + ilv))

        def cond(st):
            a = st[0][0] > 0
            for k in range(1, ilv):
                a = jnp.logical_or(a, st[k][0] > 0)
            return a

        def body(st):
            st = list(st)
            for _ in range(unroll):
                for k in range(ilv):
                    st[k] = steps[walks[k]](st[k])
            return tuple(st)

        for k in walks:
            stack_ref[k * STACK] = 0
        init = tuple((jnp.int32(1), t0s[k], i0) for k in walks)
        out = jax.lax.while_loop(cond, body, init)
        for j, k in enumerate(walks):
            t_ref[pl.ds(k, 1), :] = out[j][1]
            idx_ref[pl.ds(k, 1), :] = out[j][2]


@functools.partial(jax.jit, static_argnames=("dense_nodes", "ilv", "unroll",
                                             "interpret"))
def bvh8_closest_ilv(nodes, tris, o, d, t_cap=None, *, dense_nodes=False,
                     ilv=4, unroll=1, interpret=False):
    """Drop-in alternative to traverse8.bvh8_closest (same contract)."""
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
        functools.partial(_traverse8i_kernel, dense_nodes, ilv, unroll),
        grid=grid,
        in_specs=[table_spec(nodes), table_spec(tris)] + [row_spec] * 7,
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)],
        scratch_shapes=[pltpu.SMEM((TILE_ROWS * STACK,), jnp.int32)],
        interpret=interpret,
        **params,
    )(nodes, tris, *planes)
    t_best, idx = outs
    return t_best.reshape(n)[:n_orig], idx.reshape(n)[:n_orig]
