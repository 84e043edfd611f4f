"""Pallas TPU cluster-sweep mesh intersector: closest hit with NO tree
walk at all.

Why: every traversal variant shares one SERIAL scalar walk per 128-ray
row, so a row pays the union of its rays' node-visit sets — measured 41x
one ray's visits on incoherent modelExample wavefronts at ~100-150ns per
visit through the single scalar unit, and batching/unrolling/interleaving
/branchless/mask-machine variants all measured flat or negative
(docs/PERFORMANCE.md). The sweep replaces the walk with a LINEAR pass
over K flat clusters (subtrees of the reference-policy BVH with <= S
triangles, tight AABBs, contiguous triangle ranges): each step slab-tests
8 cluster boxes (pure (8,128) vector work) and streams a cluster's
triangle groups only when some lane hits its box AND beats its own
t_best. Scalar events per row drop from the walk's ~1266 node visits to
~K/8 sweep steps + ~union-of-candidates streams (simulated 340-570 at
S=32-64 on the 65k-tri statue — scripts/sim_stream.py).

Closest-hit parity with the walk is structural: the sweep Möller–Trumbore
tests a SUPERSET of the triangles the walk reaches (every cluster whose
box the ray enters), and the per-ray min over a superset that still
contains the winner is identical (objects.go:408-461 semantics, shared
`make_mt_group`).

Scaling: cost has a fixed K/8-steps-per-row term, so the sweep targets
reference-scale meshes (modelExample's 65k tris -> K=1024 at S=64);
Sponza-scale meshes keep the BVH8 walk (ops/trace.py picks by table
size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.ops.pallas.traverse8 import (
    LANE, TILE_ROWS, T_MIN, _entry, _entry_padded, make_mt_cand,
    make_mt_group)

ENC_SHIFT = 6          # group-base/count packing: enc = base*64 + count
MAX_GROUPS_PER_CLUSTER = (1 << ENC_SHIFT) - 1


def build_clusters(node_min, node_max, first, count, skip, v0, e0, e1,
                   max_tris: int = 64, fixed_groups: bool = True):
    """Cut the binary skip-link BVH (reference split policy,
    hittable/bvh.go:35-61) into flat clusters and pack the sweep tables.

    Returns (cluster_lines, tri_lines, n_blocks): cluster block b packs 8
    clusters in the sublane dimension — lanes 0-2 box min, 3-5 box max
    (NaN for empty slots: every slab comparison is false), and sublane 0
    lanes 8..15 hold each cluster's encoded triangle-group range
    (base * 64 + n_groups; base+count together stay < 2^24 so the f32
    carry is exact). Triangles are packed 8 per group entry in cluster
    order (same line layout as scene/bvh8, loaded with the shared
    `_entry`)."""
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    first = np.asarray(first)
    count = np.asarray(count)
    skip = np.asarray(skip)
    csum = np.concatenate([[0], np.cumsum(count)])
    tri_of = lambda i: (csum[i], csum[skip[i]])
    roots = []
    stack = [0]
    while stack:
        i = stack.pop()
        lo, hi = tri_of(i)
        if count[i] > 0 or hi - lo <= max_tris:
            roots.append(int(i))
        else:
            stack.append(i + 1)
            stack.append(int(skip[i + 1]))
    roots = sorted(roots)          # node order ~ spatial (DFS) order
    K = len(roots)

    v0 = np.asarray(v0, np.float32)
    e0 = np.asarray(e0, np.float32)
    e1 = np.asarray(e1, np.float32)
    # fixed_groups pads every cluster to exactly max_tris//8 group
    # entries (all-zero pads: det 0 => no hit) so the kernel streams a
    # cluster as STRAIGHT-LINE unrolled Möller–Trumbore groups — the v1
    # dynamic fori-per-group paid a scalar branch per group and measured
    # 1.9x SLOWER than the walk; unrolled independent loads pipeline.
    ng_fixed = max(1, max_tris // 8)
    groups = []                    # (8, 16) f32 triangle entries
    ranges = []                    # (gbase, gcount) per cluster
    zero_ent = np.zeros((8, 16), np.float32)
    zero_ent[:, 9] = -1.0
    for r in roots:
        lo, hi = tri_of(r)
        ids = np.arange(lo, hi)
        gbase = len(groups)
        for g0 in range(0, len(ids), 8):
            chunk = ids[g0:g0 + 8]
            ent = np.zeros((8, 16), np.float32)
            m = len(chunk)
            ent[:m, 0:3] = v0[chunk]
            ent[:m, 3:6] = e0[chunk]
            ent[:m, 6:9] = e1[chunk]
            ent[:, 9] = -1.0
            ent[:m, 9] = chunk.astype(np.float32)
            groups.append(ent)
        if fixed_groups:
            while len(groups) - gbase < ng_fixed:
                groups.append(zero_ent)
        ranges.append((gbase, len(groups) - gbase))
    n_groups = len(groups)
    assert n_groups * (1 << ENC_SHIFT) < (1 << 24), "f32-exact encoding"
    assert max(c for _, c in ranges) <= MAX_GROUPS_PER_CLUSTER

    KB = (K + 7) // 8
    blocks = np.full((KB, 8, 16), np.nan, np.float32)
    blocks[:, :, 6:] = 0.0
    for c, r in enumerate(roots):
        b, sl = divmod(c, 8)
        blocks[b, sl, 0:3] = node_min[r]
        blocks[b, sl, 3:6] = node_max[r]
        gbase, gcount = ranges[c]
        blocks[b, 0, 8 + sl] = float(gbase * (1 << ENC_SHIFT) + gcount)

    from go_raytracer_tpu.scene.bvh8 import _pack_lines, _pad_lines
    tri = np.stack(groups) if groups else np.zeros((1, 8, 16), np.float32)
    return (jnp.asarray(_pad_lines(blocks)), jnp.asarray(_pack_lines(tri)),
            KB, ng_fixed if fixed_groups else 0)


def _sweep_kernel(n_blocks, ng_fixed,
                  clu_ref, tri_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tcap_ref,
                  t_ref, idx_ref):
    def walk(s, _):
        row = lambda ref: ref[pl.ds(s, 1), :]          # (1, 128)
        ox, oy, oz = row(ox_ref), row(oy_ref), row(oz_ref)
        dx, dy, dz = row(dx_ref), row(dy_ref), row(dz_ref)
        tiny = 1e-30
        sd = lambda d: jnp.where(jnp.abs(d) < tiny,
                                 jnp.where(d < 0, -tiny, tiny), d)
        ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)
        mt_group = make_mt_group(tri_ref, ox, oy, oz, dx, dy, dz)
        mt_cand = make_mt_cand(tri_ref, ox, oy, oz, dx, dy, dz)

        def block(b, carry):
            t_best, idx = carry
            e = _entry_padded(clu_ref, b)
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
            # per-lane t_best cap: clusters behind every lane's current
            # hit never stream (free front-to-back-ish pruning)
            hit = jnp.maximum(near, T_MIN) < jnp.minimum(far, t_best)
            anyv = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            wt = jnp.exp2(jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0).astype(jnp.float32))
            bits = jnp.sum(anyv * wt).astype(jnp.int32)

            def stream(carry):
                for c in range(8):
                    enc = e[0, 8 + c].astype(jnp.int32)
                    g0 = enc >> ENC_SHIFT

                    if ng_fixed:
                        # straight-line unrolled groups against the
                        # STREAM-ENTRY cap: no per-group branch and no
                        # serial select chain between groups — the
                        # loads+MTs are independent and pipeline; one
                        # pairwise reduce at the end (ties keep the
                        # earlier group, matching sequential order)
                        def do(cc, g0=g0):
                            t_b, ix = cc
                            tm, im = mt_cand(g0, t_b)
                            for g in range(1, ng_fixed):
                                t2, i2 = mt_cand(g0 + g, t_b)
                                pick = t2 < tm
                                tm = jnp.where(pick, t2, tm)
                                im = jnp.where(pick, i2, im)
                            upd = tm < t_b
                            return (jnp.where(upd, tm, t_b),
                                    jnp.where(upd, im, ix))
                    else:
                        ng = enc & MAX_GROUPS_PER_CLUSTER

                        def do(cc, g0=g0, ng=ng):
                            return jax.lax.fori_loop(
                                0, ng,
                                lambda g, c2: mt_group(g0 + g, *c2), cc)

                    carry = jax.lax.cond(((bits >> c) & 1) > 0, do,
                                         lambda cc: cc, carry)
                return carry

            return jax.lax.cond(bits != 0, stream, lambda cc: cc,
                                (t_best, idx))

        t0 = tcap_ref[pl.ds(s, 1), :]
        i0 = jnp.full(t0.shape, -1, jnp.int32)
        t_best, idx = jax.lax.fori_loop(0, n_blocks, block, (t0, i0))
        t_ref[pl.ds(s, 1), :] = t_best
        idx_ref[pl.ds(s, 1), :] = idx
        return 0

    jax.lax.fori_loop(0, TILE_ROWS, walk, 0)


@functools.partial(jax.jit, static_argnames=("n_blocks", "ng_fixed",
                                              "interpret"))
def cluster_sweep_closest(clusters, tris, o, d, t_cap=None, *,
                          n_blocks, ng_fixed=0, interpret=False):
    """Closest triangle hit via the linear cluster sweep; same contract as
    traverse8.bvh8_closest: (t (N,), idx (N,)), idx -1 / t == t_cap where
    no triangle beats the per-ray cap."""
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
    params = {}
    table_bytes = (clusters.size + tris.size) * 4
    if table_bytes > 8 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(table_bytes + 32 * 1024 * 1024))
    t_best, idx = pl.pallas_call(
        functools.partial(_sweep_kernel, n_blocks, ng_fixed),
        grid=grid,
        in_specs=[table_spec(clusters), table_spec(tris)] + [row_spec] * 7,
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)],
        interpret=interpret,
        **params,
    )(clusters, tris, *planes)
    return t_best.reshape(n)[:n_orig], idx.reshape(n)[:n_orig]
