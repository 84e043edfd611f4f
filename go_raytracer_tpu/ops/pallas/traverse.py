"""Pallas TPU BVH traversal: tile-coherent closest-hit over triangle meshes.

The reference walks its BVH recursively per ray (hittable/bvh.go:69-82).
Round 1's XLA translation stepped every ray through its OWN node pointer in
lockstep, gathering node/triangle rows by per-ray indices — the worst
memory pattern for a TPU (per-ray dynamic gathers), and the graph that
crashed the v5e worker (docs/PERFORMANCE.md).

TPU-first redesign: rays are processed in tiles of TILE_ROWS*128 lanes and
each TILE shares ONE traversal walk. The node pointer is a *scalar*; the
skip-link DFS walk advances when any ray in the tile hits the node's box
(vector slab test, scalar reduction), and leaf triangles are tested
against the whole tile with scalar-indexed row loads — the only dynamic
indices are tile-uniform scalars, which Mosaic serves natively from VMEM.
Coherent tiles (camera rays, which arrive in pixel order) visit close to
the per-ray-optimal node set; incoherent tiles degrade toward a full
sweep but never gather.

Node and (leaf-ordered, see scene/builder.py's permutation) triangle
tables live fully in VMEM — sized for meshes up to ~300k triangles on a
16MB-VMEM core. Slab-test semantics match aabb.go:90-113 via the
shrinking per-ray t_best; Moller-Trumbore matches objects.go:408-461.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.scene import types as T

LANE = 128
TILE_ROWS = 8          # 1024 rays per tile: smaller tiles = more coherence
NODE_COLS = 9          # minx,miny,minz,maxx,maxy,maxz,first,count,skip
TRI_COLS = 9           # v0(3), e0(3), e1(3)
T_MIN = 1.0e-3


ROW_PAD = 16           # logical row padded to 16 cols; 8 rows per 128-lane line


def _pack_lines(rows: jnp.ndarray) -> jnp.ndarray:
    """Pack (M, <=16) logical rows into (ceil(M/8), 128) lines — a narrow
    (M, 9) VMEM array would pad its 9-lane minor dim to 128 (14x waste;
    the 65k-tri statue's table alone would blow the 16MB VMEM budget).
    The kernel addresses row i at line i>>3, lane offset (i&7)*16 via a
    dynamic rotate."""
    m, c = rows.shape
    rows = jnp.pad(rows, ((0, (-m) % 8), (0, ROW_PAD - c)))
    return rows.reshape(-1, 8 * ROW_PAD)


def pack_bvh(scene: T.Scene):
    """Device tables for the kernel: node rows [min(3), max(3), first,
    count, skip] and leaf-ordered triangle rows [v0, e0, e1], both f32
    (ints exact in f32 for <2^24 rows), packed 8-per-128-lane-line."""
    bvh = scene.tri_bvh
    tr = scene.triangles
    nodes = jnp.concatenate([
        bvh.node_min, bvh.node_max,
        bvh.first[:, None].astype(jnp.float32),
        bvh.count[:, None].astype(jnp.float32),
        bvh.skip[:, None].astype(jnp.float32),
    ], axis=1).astype(jnp.float32)
    tris = jnp.concatenate([tr.v0, tr.e0, tr.e1], axis=1).astype(jnp.float32)
    # fixed-width leaf reads may run past the last leaf's count; degenerate
    # pad rows (e0 = e1 = 0 -> det 0 -> never hit) keep them in range
    tris = jnp.concatenate(
        [tris, jnp.zeros((bvh.leaf_size, TRI_COLS), jnp.float32)])
    return _pack_lines(nodes), _pack_lines(tris)


def _row(ref, idx):
    """Scalar accessor for packed logical row `idx`: dynamic-rotate the
    row's 16-col field to lane 0, then static extracts."""
    line = ref[pl.ds(idx >> 3, 1), :]
    rot = pltpu.roll(line, 128 - ((idx & 7) << 4), 1)
    return lambda c: rot[0, c]


def _traverse_kernel(n_nodes, leaf_size, unroll,
                     node_ref, tri_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tcap_ref,
                     t_ref, idx_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tiny = 1e-30
    sdx = jnp.where(jnp.abs(dx) < tiny, jnp.where(dx < 0, -tiny, tiny), dx)
    sdy = jnp.where(jnp.abs(dy) < tiny, jnp.where(dy < 0, -tiny, tiny), dy)
    sdz = jnp.where(jnp.abs(dz) < tiny, jnp.where(dz < 0, -tiny, tiny), dz)
    ix, iy, iz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz

    # per-ray cap from cheaper primitive classes resolved first (the
    # shrinking rayT.Max of bvh.go:69-82 across hittables): everything
    # beyond the current closest hit is pruned up front
    t0 = tcap_ref[:]
    i0 = jnp.full(ox.shape, -1, jnp.int32)

    def cond(state):
        node, _, _ = state
        return node < n_nodes

    def one_node(state):
        node, t_best, idx = state
        row = _row(node_ref, node)
        # slab test (aabb.go:90-113): hit iff max(near, tmin) < min(far, t_best)
        tx0 = (row(0) - ox) * ix
        tx1 = (row(3) - ox) * ix
        ty0 = (row(1) - oy) * iy
        ty1 = (row(4) - oy) * iy
        tz0 = (row(2) - oz) * iz
        tz1 = (row(5) - oz) * iz
        near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.maximum(tz0, tz1))
        hit_box = jnp.maximum(near, T_MIN) < jnp.minimum(far, t_best)
        any_hit = jnp.any(hit_box)
        count = row(7).astype(jnp.int32)
        is_leaf = count > 0

        def do_leaf(carry):
            t_best, idx = carry
            first = row(6).astype(jnp.int32)
            for k in range(leaf_size):
                trow = _row(tri_ref, first + k)
                # Moller-Trumbore (objects.go:408-461) with scalar tri data
                v0x, v0y, v0z = trow(0), trow(1), trow(2)
                e0x, e0y, e0z = trow(3), trow(4), trow(5)
                e1x, e1y, e1z = trow(6), trow(7), trow(8)
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
                ok = ((k < count) & (jnp.abs(det) >= 1e-12)
                      & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0)
                      & (tt > T_MIN) & (tt < t_best))
                t_best = jnp.where(ok, tt, t_best)
                idx = jnp.where(ok, first + k, idx)
            return t_best, idx

        t_best, idx = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                   lambda c: c, (t_best, idx))
        node = jnp.where(any_hit & jnp.logical_not(is_leaf),
                         node + 1, row(8).astype(jnp.int32))
        return node, t_best, idx

    def body(state):
        # unrolled multi-node steps amortize the while-loop's scalar
        # bookkeeping; a finished walk parks at node == n_nodes (clamped
        # row loads, no-op updates)
        for _ in range(unroll):
            node, t_best, idx = state
            state = jax.lax.cond(node < n_nodes, one_node,
                                 lambda s: s, state)
        return state

    _, t_best, idx = jax.lax.while_loop(cond, body, (jnp.int32(0), t0, i0))
    t_ref[:] = t_best
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("n_nodes", "leaf_size",
                                             "unroll", "interpret"))
def bvh_closest(nodes, tris, o, d, t_cap=None, *, n_nodes, leaf_size,
                unroll=4, interpret=False):
    """Closest triangle hit for a ray bundle: returns (t (N,), idx (N,))
    with idx in leaf order (== builder's permuted triangle table); idx is
    -1 (and t == t_cap) where no triangle beats the optional per-ray cap."""
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

    kernel = functools.partial(_traverse_kernel, n_nodes, leaf_size, unroll)
    grid = (rows // TILE_ROWS,)
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    # large meshes exceed Mosaic's default 16MB scoped-VMEM budget purely on
    # resident tables; raise the cap toward the chip's physical VMEM
    table_bytes = (nodes.size + tris.size) * 4
    params = {}
    if table_bytes > 8 * 1024 * 1024:
        from jax.experimental.pallas import tpu as pltpu_mod

        params["compiler_params"] = pltpu_mod.CompilerParams(
            vmem_limit_bytes=int(table_bytes + 32 * 1024 * 1024))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec(nodes), table_spec(tris)] + [row_spec] * 7,
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)],
        interpret=interpret,
        **params,
    )(nodes, tris, *planes)
    t_best, idx = outs
    return t_best.reshape(n)[:n_orig], idx.reshape(n)[:n_orig]
