"""Closest-hit resolution over all primitive tables + participating media.

Replaces the reference's recursive BVH/HittableList closest-hit walk
(hittable/bvh.go:69-82, hittable/hittable.go:122-138): each primitive class
is intersected densely in GEMM form (ops/intersect.py), distances are
min-reduced, and hit attributes (point, face normal, uv, material) are then
gathered and recomputed for the single winning primitive per ray — O(N)
work after the O(N*P) MXU pass.

Participating media (hittable/medium.go:27-58) sample a scattering distance
inside the boundary span. Equivalence note: the reference samples media
*during* traversal against a shrinking rayT; sampling each medium's
candidate independently over its span clamped by the closest solid hit and
min-reducing is distributionally identical (truncating an exponential beyond
the current-best t equals rejecting candidates beyond it).
"""

from __future__ import annotations

import os

import flax.struct as struct
import jax
import jax.numpy as jnp

from go_raytracer_tpu.core import vecmath as vm
from go_raytracer_tpu.ops import intersect as ix
from go_raytracer_tpu.scene import types as T

T_MIN = 1.0e-3  # rayColor's interval.New(0.001, inf) (camera.go:300)
INF = jnp.inf

# hit class codes
CLS_NONE = -1
CLS_SPHERE = 0
CLS_QUAD = 1
CLS_TRI = 2
CLS_MEDIUM = 3
CLS_BOX = 4


@struct.dataclass
class Hit:
    hit: jnp.ndarray         # (N,) bool — anything (surface or medium) hit
    is_medium: jnp.ndarray   # (N,) bool
    t: jnp.ndarray           # (N,)
    p: jnp.ndarray           # (N, 3)
    normal: jnp.ndarray      # (N, 3) face-forward normal (hittable.go:27-34)
    front_face: jnp.ndarray  # (N,) bool
    u: jnp.ndarray           # (N,)
    v: jnp.ndarray           # (N,)
    mat_id: jnp.ndarray      # (N,) int32
    # log-likelihood of the observed media-transit outcome (score-function
    # channel for d/d(density); 0 when the scene has no media)
    med_logp: jnp.ndarray = None


def _sphere_attrs(sp: T.Spheres, o, d, time, t, idx):
    c0 = sp.center0[idx]
    cd = sp.center_delta[idx]
    r = sp.radius[idx]
    cur_c = c0 + time[:, None] * cd
    p = o + t[:, None] * d
    outward = (p - cur_c) / r[:, None]
    front = vm.dot(d, outward) < 0
    normal = jnp.where(front[:, None], outward, -outward)
    # spherical uv (objects.go:44-50)
    # arccos with a FINITE backward at the poles: d(arccos)/dx at |x|=1
    # is -inf, and a pole hit (|outward_y| rounding to exactly 1 — seen
    # on the TPU backend, whose rsqrt lands there more often than CPU)
    # would NaN the whole gradient pytree via inf * 0-cotangent. The
    # double-where keeps the forward value bit-identical.
    cy = jnp.clip(-outward[:, 1], -1.0, 1.0)
    interior = jnp.abs(cy) < 1.0
    theta = jnp.where(
        interior,
        jnp.arccos(jnp.where(interior, cy, 0.0)),
        jnp.where(cy > 0, 0.0, jnp.pi))
    # arctan2's backward at (0, 0) — the exact pole — is 0/0; feed the
    # exact-pole lanes (x=1, z=0), whose forward atan2 is the same 0.
    # Gated on outward_x == 0 & outward_z == 0 (not on `interior`): a
    # lane where -outward_y clipped to +/-1 but x/z are nonzero is an
    # FP-degenerate normal whose reference phi is atan2(-z, x) + pi, not
    # pi — rewriting those lanes would change the forward uv.
    pole = (outward[:, 0] == 0.0) & (outward[:, 2] == 0.0)
    px = jnp.where(pole, 1.0, outward[:, 0])
    pz = jnp.where(pole, 0.0, -outward[:, 2])
    phi = jnp.arctan2(pz, px) + jnp.pi
    return p, normal, front, phi / (2.0 * jnp.pi), theta / jnp.pi, sp.mat_id[idx]


def _quad_attrs(qd: T.Quads, o, d, t, idx):
    n = qd.normal[idx]
    q = qd.q[idx]
    p = o + t[:, None] * d
    planar = p - q
    alpha = vm.dot(planar, qd.cvw[idx])
    beta = vm.dot(planar, qd.cwu[idx])
    front = vm.dot(d, n) < 0
    normal = jnp.where(front[:, None], n, -n)
    return p, normal, front, alpha, beta, qd.mat_id[idx]


def _box_attrs(bx: T.Boxes, o, d, t, idx):
    """Hit attributes for a fused box (types.Boxes): the outward normal
    is the axis unit vector of the slab that bounds the winning t — the
    entry slab when t is the entry distance, else the exit slab —
    exactly the face normal the six-quad decomposition
    (objects.go:227-237) would report. Rotated rows compute the slab in
    object space and rotate the normal back to world
    (transformation.go:94-107); t is rotation-invariant. uv is not
    reproduced (fusion is gated on uv-independent textures); zeros are
    returned."""
    lo, hi = bx.lo[idx], bx.hi[idx]
    cos, sin = bx.cos_t[idx], bx.sin_t[idx]
    osh = o - bx.offset[idx]
    # world -> object (the Media boundary convention)
    oo = jnp.stack([cos * osh[:, 0] - sin * osh[:, 2],
                    osh[:, 1],
                    sin * osh[:, 0] + cos * osh[:, 2]], axis=-1)
    do = jnp.stack([cos * d[:, 0] - sin * d[:, 2],
                    d[:, 1],
                    sin * d[:, 0] + cos * d[:, 2]], axis=-1)
    d_safe = jnp.where(jnp.abs(do) < 1e-30,
                       jnp.where(do < 0, -1e-30, 1e-30), do)
    inv = 1.0 / d_safe
    t0 = (lo - oo) * inv
    t1 = (hi - oo) * inv
    per_lo = jnp.minimum(t0, t1)
    per_hi = jnp.maximum(t0, t1)
    near = jnp.max(per_lo, axis=-1)
    far = jnp.min(per_hi, axis=-1)
    # t equals either the entry or the exit distance (ix.box_ts); pick
    # whichever bound it actually is (nearer to t), then the axis
    # attaining that bound
    entry = jnp.abs(t - near) <= jnp.abs(far - t)
    per = jnp.where(entry[:, None], per_lo, per_hi)
    axis = jnp.argmax(jnp.where(entry[:, None], per, -per), axis=-1)
    sgn = jnp.sign(jnp.take_along_axis(d_safe, axis[:, None], axis=-1))[:, 0]
    sgn = jnp.where(entry, -sgn, sgn)
    out_obj = sgn[:, None] * jnp.eye(3, dtype=o.dtype)[axis]
    # object -> world rotation (transformation.go:87-93)
    outward = jnp.stack(
        [cos * out_obj[:, 0] + sin * out_obj[:, 2],
         out_obj[:, 1],
         -sin * out_obj[:, 0] + cos * out_obj[:, 2]], axis=-1)
    front = vm.dot(d, outward) < 0
    normal = jnp.where(front[:, None], outward, -outward)
    p = o + t[:, None] * d
    zero = jnp.zeros_like(t)
    return p, normal, front, zero, zero, bx.mat_id[idx]


def tri_hit_gathered(tr: T.Triangles, idx, o, d, t_min, t_max):
    """Local-form Moller-Trumbore for per-ray gathered triangles idx (N,)
    (objects.go:408-461): returns (t, u, v, ok). Well-conditioned (works on
    ray-local differences) — used for BVH leaves and attribute recompute."""
    v0, e0, e1 = tr.v0[idx], tr.e0[idx], tr.e1[idx]
    pvec = vm.cross(d, e1)
    det = vm.dot(e0, pvec)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    tvec = o - v0
    u = vm.dot(tvec, pvec) * inv
    qvec = vm.cross(tvec, e0)
    v = vm.dot(d, qvec) * inv
    t = vm.dot(e1, qvec) * inv
    ok = ((jnp.abs(det) >= ix.PARALLEL_EPS)
          & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t_min <= t) & (t <= t_max) & tr.active[idx])
    return t, u, v, ok


def bvh_tri_closest(scene: T.Scene, o, d, t_min, t_max):
    """Closest triangle hit via stackless skip-link BVH traversal
    (replacing the recursive walk of hittable/bvh.go:69-82). All rays step
    the tree in lockstep; finished rays park at node == n_nodes. The
    shrinking t_best reproduces the reference's rayT.Max shrinkage."""
    bvh = scene.tri_bvh
    tr = scene.triangles
    n = o.shape[0]
    n_nodes = bvh.n_nodes
    leaf = bvh.leaf_size

    d_safe = jnp.where(jnp.abs(d) < 1e-30, jnp.where(d < 0, -1e-30, 1e-30), d)
    inv_d = 1.0 / d_safe

    def cond(state):
        node, _, _ = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, t_best, idx_best = state
        nc = jnp.minimum(node, n_nodes - 1)
        nmin = bvh.node_min[nc]
        nmax = bvh.node_max[nc]
        t0 = (nmin - o) * inv_d
        t1 = (nmax - o) * inv_d
        near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # aabb.Hit (aabb.go:90-113): shrink [Min, Max] per axis, fail when
        # Max <= Min — i.e. hit iff max(near, t_min) < min(far, t_best)
        live = node < n_nodes
        hit_box = live & (jnp.maximum(near, t_min)
                          < jnp.minimum(far, jnp.minimum(t_best, t_max)))
        count = bvh.count[nc]
        is_leaf = count > 0
        do_leaf = hit_box & is_leaf
        first = bvh.first[nc]
        for k in range(leaf):
            tid = bvh.order[jnp.clip(first + k, 0, bvh.order.shape[0] - 1)]
            tid_c = jnp.clip(tid, 0, tr.count - 1)
            t_k, _, _, ok_k = tri_hit_gathered(tr, tid_c, o, d, t_min, t_max)
            upd = do_leaf & (k < count) & (tid >= 0) & ok_k & (t_k < t_best)
            t_best = jnp.where(upd, t_k, t_best)
            idx_best = jnp.where(upd, tid_c, idx_best)
        node = jnp.where(live,
                         jnp.where(hit_box & ~is_leaf, nc + 1, bvh.skip[nc]),
                         node)
        return node, t_best, idx_best

    node0 = jnp.zeros((n,), dtype=jnp.int32)
    t_best0 = jnp.full((n,), INF, dtype=o.dtype)
    idx0 = jnp.zeros((n,), dtype=jnp.int32)
    _, t_best, idx_best = jax.lax.while_loop(cond, body, (node0, t_best0, idx0))
    return t_best, idx_best


def _part1by2(x):
    """Spread 10 bits of x two apart (standard Morton magic numbers)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def pallas_bvh_closest(scene: T.Scene, o, d, t_cap=None, alive=None):
    """Closest triangle hit via the tile-coherent Pallas traversal
    (ops/pallas/traverse.py), with a coherence sort first: the kernel
    shares one walk per 1024-lane tile, so bounce rays — arbitrary order
    after a few scatters — are grouped by (direction octant, 5-bit Morton
    cell of the origin inside the root box) to shrink each tile's visited
    node set. Sort + unsort are lane-wide lax.sorts (~0.5 ms at 128k),
    repaying themselves many times over on incoherent wavefronts."""
    from go_raytracer_tpu.ops.pallas import traverse as ptrav

    bvh = scene.tri_bvh
    mesh_env = os.environ.get("GRT_MESH", "auto")
    if bvh.cl2_lines is not None and mesh_env == "binned2":
        # v2 persistent-block intersector (ops/pallas/stream2.py):
        # MEASURED NEGATIVE in-render on the v5e (0.50M vs v1's 2.24M at
        # the S8 spp16 config) — without per-round global re-sorting the
        # fixed blocks diverge and the sequential grid serializes their
        # independent round loops; kept selectable for experiments
        return binned2_closest(scene, o, d, t_cap, alive)
    if (bvh.cl_lines is not None and mesh_env in ("auto", "binned",
                                                  "binned2")):
        # v1 binned intersector (round 4): sorts the pool by candidate
        # cluster every round. The stream kernel keeps the packed group
        # table VMEM-resident when it fits (~12 MB of the ~16 MB/core
        # budget, ~196k tris) and switches to double-buffered HBM group
        # DMA beyond that (ops/pallas/stream.py, round 5) — same winners
        # either way.
        return binned_closest(scene, o, d, t_cap, alive)
    n = o.shape[0]
    lo = bvh.node_min[0]
    ext = jnp.maximum(bvh.node_max[0] - lo, 1e-6)
    q = jnp.clip(((o - lo) / ext * 32.0), 0.0, 31.0).astype(jnp.int32)
    morton = (_part1by2(q[:, 0]) << 2) | (_part1by2(q[:, 1]) << 1) | \
        _part1by2(q[:, 2])
    octant = ((d[:, 0] > 0).astype(jnp.int32) << 2) \
        | ((d[:, 1] > 0).astype(jnp.int32) << 1) \
        | (d[:, 2] > 0).astype(jnp.int32)
    key = (octant << 15) | morton

    iota = jnp.arange(n, dtype=jnp.int32)
    if t_cap is None:
        t_cap = jnp.full((n,), INF, dtype=o.dtype)
    if alive is not None:
        # dead lanes: zero cap kills the walk at the root (slab test needs
        # max(near, T_MIN) < 0 — never true), and sorting them to the tail
        # makes whole 128-ray walks trivially terminate. In a regeneration
        # window at ~0.3-0.5 occupancy the traversal would otherwise spend
        # most of its serial walk time on lanes whose hits are masked out
        # anyway — measured 2x+ on mesh-scene renders.
        t_cap = jnp.where(alive, t_cap, 0.0)
        key = jnp.where(alive, key, jnp.int32(0x7FFFFFFF))
    (_, perm, ox, oy, oz, dx, dy, dz, cap_s) = jax.lax.sort(
        (key, iota, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_cap),
        dimension=0, num_keys=1, is_stable=False)
    o_s = jnp.stack([ox, oy, oz], axis=-1)
    d_s = jnp.stack([dx, dy, dz], axis=-1)

    interpret = jax.default_backend() != "tpu"
    if bvh.nodes8 is not None and os.environ.get("GRT_TRAVERSE8", "1") != "0":
        # sublane-batched BVH8 walk: 8 child boxes per vector op, one walk
        # per 128-lane row — the default (ops/pallas/traverse8.py).
        from go_raytracer_tpu.ops.pallas import traverse8 as ptrav8

        t_s, i_s = ptrav8.bvh8_closest(
            bvh.nodes8, bvh.tris8, o_s, d_s, cap_s,
            dense_nodes=bvh.bvh8_dense, interpret=interpret)
    else:
        nodes, tris = ptrav.pack_bvh(scene)
        t_s, i_s = ptrav.bvh_closest(nodes, tris, o_s, d_s, cap_s,
                                     n_nodes=bvh.n_nodes,
                                     leaf_size=bvh.leaf_size,
                                     interpret=interpret)
    # unsort: ordering by the permutation restores original lane order
    _, t_t, i_t = jax.lax.sort((perm, t_s, i_s), dimension=0, num_keys=1,
                               is_stable=False)
    return t_t, i_t


_BIN_ROWS = 8          # kernel tile rows (ops/pallas/stream.TILE_ROWS)
_BIN_LANE = 128


def binned_closest(scene: T.Scene, o, d, t_cap=None, alive=None,
                   max_iters: int = 512):
    """Closest triangle hit via the BINNED intersector: every traversal
    round each ray picks its nearest cluster whose processed-bit is
    clear (front-to-back, pruned by the evolving per-ray t_best), the
    whole pool is lax.sorted by that cluster id (~1-3 ms at 128k lanes
    on the v5e — measured round 4, scripts/bench_binning.py), and the
    stream kernel (ops/pallas/stream.py) runs each 8-row block's
    contiguous group range as dense (8, 128) Möller–Trumbore ops with
    one load per group per block. No scalar stack walk, no row-union
    blowup — the two measured limiters of the BVH8 walk on incoherent
    wavefronts (docs/PERFORMANCE.md).

    Every cluster in a block's streamed range is marked processed for
    every lane of the block (K <= 256 processed-bits ride the sort as
    K/32 int32 lane planes), so a round typically settles several
    clusters per ray and the loop converges in a handful of rounds;
    progress is strict (a lane's candidate is always inside its block
    range), bounding rounds by K.

    Semantics match pallas_bvh_closest: shrinking (T_MIN, t_best) ray
    interval seeded from t_cap (bvh.go:69-82), Möller–Trumbore per
    objects.go:408-461. Front-to-back cluster order + strict `near <
    t_best` candidacy reproduce the BVH early-out; rows that straddle a
    cluster boundary stream both clusters (idempotent)."""
    from go_raytracer_tpu.ops.pallas import stream as pstream

    bvh = scene.tri_bvh
    n_orig = o.shape[0]
    tile = _BIN_ROWS * _BIN_LANE
    n = ((n_orig + tile - 1) // tile) * tile
    pad = n - n_orig
    if t_cap is None:
        t_cap = jnp.full((n_orig,), INF, dtype=o.dtype)
    if alive is not None:
        t_cap = jnp.where(alive, t_cap, 0.0)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_cap = jnp.concatenate([t_cap, jnp.zeros((pad,), t_cap.dtype)])
    rows = n // _BIN_LANE
    blocks = rows // _BIN_ROWS

    k_cl = bvh.cl_lo.shape[0]
    n_mask = (k_cl + 31) // 32
    chunk = 128
    k_pad = ((k_cl + chunk - 1) // chunk) * chunk
    lo_p = jnp.concatenate([bvh.cl_lo,
                            jnp.full((k_pad - k_cl, 3), jnp.nan)], 0)
    hi_p = jnp.concatenate([bvh.cl_hi,
                            jnp.full((k_pad - k_cl, 3), jnp.nan)], 0)
    gs = bvh.cl_gs

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    t0 = t_cap
    idx0 = jnp.full((n,), -1, jnp.int32)
    masks0 = tuple(jnp.zeros((n,), jnp.int32) for _ in range(n_mask))
    iota = jnp.arange(n, dtype=jnp.int32)
    interpret = jax.default_backend() != "tpu"

    tiny = 1e-30

    def candidates(ox, oy, oz, dx, dy, dz, t_best, masks):
        """Per-ray lex-min (near, k) over hit clusters whose processed
        bit is clear."""
        sd = lambda v: jnp.where(jnp.abs(v) < tiny,
                                 jnp.where(v < 0, -tiny, tiny), v)
        ix_, iy_, iz_ = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)
        n_p = t_best.shape[0]
        best_near = jnp.full_like(t_best, jnp.inf)
        best_k = jnp.full((n_p,), k_cl, jnp.int32)
        shifts = jnp.arange(32, dtype=jnp.int32)[None, :]

        for c in range(k_pad // chunk):
            lo = jax.lax.slice_in_dim(lo_p, c * chunk, (c + 1) * chunk)
            hi = jax.lax.slice_in_dim(hi_p, c * chunk, (c + 1) * chunk)
            # (N, chunk) slab tests; NaN padding boxes never hit
            tx0 = (lo[:, 0][None, :] - ox[:, None]) * ix_[:, None]
            tx1 = (hi[:, 0][None, :] - ox[:, None]) * ix_[:, None]
            ty0 = (lo[:, 1][None, :] - oy[:, None]) * iy_[:, None]
            ty1 = (hi[:, 1][None, :] - oy[:, None]) * iy_[:, None]
            tz0 = (lo[:, 2][None, :] - oz[:, None]) * iz_[:, None]
            tz1 = (hi[:, 2][None, :] - oz[:, None]) * iz_[:, None]
            near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            near = jnp.maximum(near, T_MIN)
            kid = c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
            hit = near < jnp.minimum(far, t_best[:, None])
            # processed bits for this chunk: 4 mask planes x 32 bits
            proc = jnp.concatenate(
                [jnp.bitwise_and(
                    jnp.right_shift(masks[c * 4 + m][:, None], shifts), 1)
                 for m in range(4) if c * 4 + m < n_mask]
                + [jnp.zeros((n_p, 32), jnp.int32)] * max(0, 4 - (n_mask - c * 4)),
                axis=1)[:, :chunk]
            ok = hit & (proc == 0)
            nearm = jnp.where(ok, near, jnp.inf)
            cmin = jnp.min(nearm, axis=1)
            ckid = jnp.min(jnp.where(nearm <= cmin[:, None], kid,
                                     jnp.int32(0x7FFFFFFF)), axis=1)
            better = (cmin < best_near) | (
                (cmin == best_near) & (ckid < best_k))
            best_near = jnp.where(better, cmin, best_near)
            best_k = jnp.where(better, ckid, best_k)
        has = jnp.isfinite(best_near)
        best_k = jnp.where(has, best_k, k_cl)
        return best_k, has

    # fused round (round 5): the stream kernel also marks the streamed
    # interval in the per-lane bit planes and scans each lane's next
    # candidate in-kernel, so the XLA shell per round is just the sort +
    # the tiny per-block range math. MEASURED A WASH on the v5e (S8
    # spp16: 2.34M both ways — the XLA candidate/mask fusions overlap or
    # cost what the in-kernel scan adds), so the default stays the XLA
    # form; GRT_B1_FUSED=1 selects it. Requires the packed cluster-box
    # lines and a python-unrolled octet loop (K <= 256).
    fused = (bvh.cl_boxes is not None and k_cl <= 256
             and os.environ.get("GRT_B1_FUSED", "0") == "1")

    def make_body(n_p):
        rows_p = n_p // _BIN_LANE
        blocks_p = rows_p // _BIN_ROWS

        def body(state):
            (i, ox, oy, oz, dx, dy, dz, t_best, idx, masks, io, key,
             _) = state
            sorted_ = jax.lax.sort(
                (key, ox, oy, oz, dx, dy, dz, t_best, idx, io) + masks,
                dimension=0, num_keys=1, is_stable=False)
            (key_s, ox, oy, oz, dx, dy, dz, t_best, idx, io) = sorted_[:10]
            masks = sorted_[10:]
            kb = key_s.reshape(blocks_p, _BIN_ROWS * _BIN_LANE)
            blk_first = kb[:, 0]
            # last REAL (non-sentinel) key in the block; keys ascend, so
            # the sentinel lanes are a suffix
            blk_last = jnp.max(jnp.where(kb < k_cl, kb, -1), axis=1)
            empty = blk_last < 0
            glo = jnp.where(empty, 0, gs[jnp.clip(blk_first, 0, k_cl - 1)])
            ghi = jnp.where(empty, 0,
                            gs[jnp.clip(blk_last, 0, k_cl - 1) + 1])
            plane = lambda x: x.reshape(rows_p, _BIN_LANE)
            if fused:
                ca = jnp.where(empty, 0, blk_first)
                cb = blk_last          # -1 when empty: marks nothing
                t2, idx2, key2, masks2 = pstream.stream_round_rows(
                    bvh.cl_lines, bvh.cl_boxes, glo, ghi, ca, cb,
                    plane(ox), plane(oy), plane(oz),
                    plane(dx), plane(dy), plane(dz),
                    plane(t_best), plane(idx),
                    tuple(plane(m) for m in masks),
                    k_cl=k_cl, interpret=interpret)
                t_best = t2.reshape(n_p)
                idx = idx2.reshape(n_p)
                key = key2.reshape(n_p)
                masks = tuple(m.reshape(n_p) for m in masks2)
                n_active = jnp.sum((key < k_cl).astype(jnp.int32))
                return (i + 1, ox, oy, oz, dx, dy, dz, t_best, idx,
                        masks, io, key, n_active)
            # mark every cluster in the block range processed, per lane
            ca = jnp.repeat(blk_first, _BIN_ROWS * _BIN_LANE)
            cb = jnp.repeat(blk_last, _BIN_ROWS * _BIN_LANE)
            new_masks = []
            for m in range(n_mask):
                lo_b = jnp.clip(ca - 32 * m, 0, 32)
                hi_b = jnp.clip(cb + 1 - 32 * m, 0, 32)
                # bits [lo_b, hi_b): ((1<<hi)-1) ^ ((1<<lo)-1), with <<32
                # avoided via the -1 form
                full = jnp.int32(-1)
                hi_bits = jnp.where(hi_b >= 32, full,
                                    (jnp.int32(1) << hi_b) - 1)
                lo_bits = jnp.where(lo_b >= 32, full,
                                    (jnp.int32(1) << lo_b) - 1)
                new_masks.append(masks[m] | (hi_bits & ~lo_bits))
            masks = tuple(new_masks)
            t2, idx2 = pstream.stream_rows(
                bvh.cl_lines, glo, ghi, plane(ox), plane(oy), plane(oz),
                plane(dx), plane(dy), plane(dz), plane(t_best), plane(idx),
                interpret=interpret)
            t_best = t2.reshape(n_p)
            idx = idx2.reshape(n_p)
            # candidates for the NEXT round computed at the tail so the
            # loop exits right after the last productive stream (no
            # trailing sort+stream over an all-sentinel pool)
            bk, has = candidates(ox, oy, oz, dx, dy, dz, t_best, masks)
            key = jnp.where(has, bk, jnp.int32(k_cl))
            n_active = jnp.sum(has.astype(jnp.int32))
            return (i + 1, ox, oy, oz, dx, dy, dz, t_best, idx, masks,
                    io, key, n_active)

        return body

    bk0, has0 = candidates(ox, oy, oz, dx, dy, dz, t0, masks0)
    key0 = jnp.where(has0, bk0, jnp.int32(k_cl))
    state = (jnp.int32(0), ox, oy, oz, dx, dy, dz, t0, idx0, masks0,
             iota, key0, jnp.sum(has0.astype(jnp.int32)))
    # TAIL-ROUND POOL SHRINK: round cost is dominated by fixed sort/
    # candidate work over the whole pool, but actives decay fast (round
    # counts ~4-6, the last rounds at <12% active — measured round 4).
    # Phase 1 runs full-pool rounds while actives > n/8; one compaction
    # sort then confines the survivors to the pool's first n/8 lanes and
    # phase 2 finishes them on that prefix slice at 1/8 the fixed cost.
    # rounded UP to a whole kernel tile: make_body reshapes the prefix
    # into (blocks, 8*128) blocks, so a non-tile-multiple prefix (e.g.
    # n = 9216 -> n//8 = 1152) would fail the reshape at trace time
    thresh = max(tile, ((n // 8 + tile - 1) // tile) * tile)
    if thresh < n:
        state = jax.lax.while_loop(
            lambda s: (s[0] < max_iters) & (s[-1] > thresh),
            make_body(n), state)
        (i1, ox1, oy1, oz1, dx1, dy1, dz1, t1, idx1, masks1, io1, key1,
         na1) = state
        packed = jax.lax.sort(
            (key1, ox1, oy1, oz1, dx1, dy1, dz1, t1, idx1, io1) + masks1,
            dimension=0, num_keys=1, is_stable=False)
        head = tuple(x[:thresh] for x in packed)
        tail = tuple(x[thresh:] for x in packed)
        sub = (i1,) + head[1:9] + (head[10:], head[9], head[0], na1)
        sub = jax.lax.while_loop(
            lambda s: (s[0] < max_iters) & (s[-1] > 0),
            make_body(thresh), sub)
        t_best = jnp.concatenate([sub[7], tail[7]])
        idx = jnp.concatenate([sub[8], tail[8]])
        io = jnp.concatenate([sub[10], tail[9]])
    else:
        state = jax.lax.while_loop(
            lambda s: (s[0] < max_iters) & (s[-1] > 0),
            make_body(n), state)
        t_best, idx, io = state[7], state[8], state[10]
    # undo the pool permutation (sorting by the carried iota restores
    # original lane order exactly)
    _, t_o, i_o = jax.lax.sort((io, t_best, idx), dimension=0, num_keys=1,
                               is_stable=False)
    return t_o[:n_orig], i_o[:n_orig]


def binned2_closest(scene: T.Scene, o, d, t_cap=None, alive=None):
    """Closest triangle hit via the v2 persistent-block binned
    intersector (ops/pallas/stream2.py): ONE coherence sort (direction
    octant + origin Morton, the pallas_bvh_closest key) groups lanes,
    then a single kernel launch runs every traversal round in-kernel —
    candidate scan over the packed cluster boxes, per-block range
    reduce, dense group stream, per-lane (near, k) frontier advance —
    with each 8-row block draining independently. Winners bit-match the
    BVH8 walk (tests/test_binned.py)."""
    from go_raytracer_tpu.ops.pallas import stream2 as pstream2

    bvh = scene.tri_bvh
    n_orig = o.shape[0]
    tile = _BIN_ROWS * _BIN_LANE
    n = ((n_orig + tile - 1) // tile) * tile
    pad = n - n_orig
    if t_cap is None:
        t_cap = jnp.full((n_orig,), INF, dtype=o.dtype)
    if alive is not None:
        t_cap = jnp.where(alive, t_cap, 0.0)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_cap = jnp.concatenate([t_cap, jnp.zeros((pad,), t_cap.dtype)])

    # coherence sort (see pallas_bvh_closest): dead/capped lanes to the
    # tail so whole blocks drain on the first scan
    lo = bvh.node_min[0]
    ext = jnp.maximum(bvh.node_max[0] - lo, 1e-6)
    q = jnp.clip(((o - lo) / ext * 32.0), 0.0, 31.0).astype(jnp.int32)
    morton = (_part1by2(q[:, 0]) << 2) | (_part1by2(q[:, 1]) << 1) | \
        _part1by2(q[:, 2])
    octant = ((d[:, 0] > 0).astype(jnp.int32) << 2) \
        | ((d[:, 1] > 0).astype(jnp.int32) << 1) \
        | (d[:, 2] > 0).astype(jnp.int32)
    key = (octant << 15) | morton
    key = jnp.where(t_cap > 0.0, key, jnp.int32(0x7FFFFFFF))
    iota = jnp.arange(n, dtype=jnp.int32)
    (_, io, ox, oy, oz, dx, dy, dz, cap_s) = jax.lax.sort(
        (key, iota, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_cap),
        dimension=0, num_keys=1, is_stable=False)

    rows = n // _BIN_LANE
    plane = lambda x: x.reshape(rows, _BIN_LANE)
    idx0 = jnp.full((n,), -1, jnp.int32)
    k2 = int(bvh.cl2_gs.shape[0]) - 1
    interpret = jax.default_backend() != "tpu"
    t2, i2 = pstream2.stream2_rows(
        bvh.cl2_lines, bvh.cl2_boxes, bvh.cl2_gs,
        plane(ox), plane(oy), plane(oz), plane(dx), plane(dy), plane(dz),
        plane(cap_s), plane(idx0), k2=k2, interpret=interpret)
    t_s = t2.reshape(n)
    i_s = i2.reshape(n)
    # no-hit lanes keep their untouched cap with idx = -1 (the walk's
    # convention — callers gate on idx >= 0)
    _, t_o, i_o = jax.lax.sort((io, t_s, i_s), dimension=0, num_keys=1,
                               is_stable=False)
    return t_o[:n_orig], i_o[:n_orig]


def _tri_attrs(tr: T.Triangles, o, d, t, idx):
    # Recompute barycentrics per winning triangle with the well-conditioned
    # local form (objects.go:408-446); the min-reduce pass only resolved t.
    _, u, v, _ = tri_hit_gathered(tr, idx, o, d, -INF, INF)

    p = o + t[:, None] * d
    w = 1.0 - u - v
    vn = tr.vn[idx]  # (N, 3, 3)
    n_interp = vm.normalize(
        w[:, None] * vn[:, 0] + u[:, None] * vn[:, 1] + v[:, None] * vn[:, 2]
    )
    n_raw = jnp.where(tr.has_vn[idx][:, None], n_interp, tr.n_face[idx])
    front = vm.dot(d, n_raw) < 0
    normal = jnp.where(front[:, None], n_raw, -n_raw)
    uvt = tr.uv[idx]  # (N, 3, 2)
    uv_interp = w[:, None] * uvt[:, 0] + u[:, None] * uvt[:, 1] + v[:, None] * uvt[:, 2]
    tex_u = jnp.where(tr.has_uv[idx], uv_interp[:, 0], u)   # objects.go:437-446
    tex_v = jnp.where(tr.has_uv[idx], uv_interp[:, 1], v)
    return p, normal, front, tex_u, tex_v, tr.mat_id[idx]


def media_candidates(scene: T.Scene, o, d, t_solid, u_med, t_min=T_MIN):
    """Per-medium scattering-candidate distances (N, M); +inf = no event.
    Also returns (t0, t1, span_ok, ray_len) for the transit-likelihood
    gradient channel.

    Mirrors medium.go:27-58: boundary span (analytic), clamp by
    [rayT.Min, closest-solid], exponential free flight
    hitDistance = -1/rho * ln(U). The sampled distance is stop_grad'd:
    density sensitivity flows exclusively through the score-function
    factor (ops/trace.trace med_logp -> wavefront._bounce), so the
    pathwise and likelihood channels never double-count.
    """
    med = scene.media
    o_b = o[:, None, :]
    d_b = d[:, None, :]

    near_s, far_s, ok_s = ix.sphere_roots(
        med.center[None, :, :], med.radius[None, :], o_b, d_b)

    # world -> object for the rotated/translated box boundary
    # (transformation.go:25-34 offset, 79-85 rotation into object space)
    cos = med.cos_t[None, :]
    sin = med.sin_t[None, :]
    osh = o_b - med.offset[None, :, :]
    o_obj = jnp.stack([cos * osh[..., 0] - sin * osh[..., 2],
                       osh[..., 1],
                       sin * osh[..., 0] + cos * osh[..., 2]], axis=-1)
    dy_b = jnp.broadcast_to(d_b[..., 1], (o.shape[0], med.count))
    d_obj = jnp.stack([cos * d_b[..., 0] - sin * d_b[..., 2],
                       dy_b,
                       sin * d_b[..., 0] + cos * d_b[..., 2]], axis=-1)
    near_b, far_b, ok_b = ix.box_slab_span(
        med.box_min[None, :, :], med.box_max[None, :, :], o_obj, d_obj)

    is_sphere = (med.kind == T.MEDIUM_SPHERE)[None, :]
    near = jnp.where(is_sphere, near_s, near_b)
    far = jnp.where(is_sphere, far_s, far_b)
    ok = jnp.where(is_sphere, ok_s, ok_b)

    ok = ok & (far > near + 1e-4)           # second boundary hit (medium.go:34)
    t0 = jnp.maximum(near, t_min)           # medium.go:37
    t1 = jnp.minimum(far, t_solid[:, None])  # medium.go:38
    ok = ok & (t0 < t1)                     # medium.go:39
    t0 = jnp.maximum(t0, 0.0)               # medium.go:43

    ray_len = vm.length(d)[:, None]
    dist_inside = (t1 - t0) * ray_len
    hit_dist = jax.lax.stop_gradient(
        med.neg_inv_density[None, :] * jnp.log(u_med))
    span_ok = ok & med.active[None, :]
    ok = span_ok & (hit_dist <= dist_inside)
    t_cand = t0 + hit_dist / ray_len
    return jnp.where(ok, t_cand, INF), (t0, t1, span_ok, ray_len)


def trace(scene: T.Scene, o: jnp.ndarray, d: jnp.ndarray, time: jnp.ndarray,
          u_med: jnp.ndarray, t_min: float = T_MIN, t_max: float = INF,
          alive=None) -> Hit:
    """Closest hit for a ray bundle. u_med: (N, M) uniforms for media.
    `alive` (optional (N,) bool): lanes marked dead skip the serial BVH
    walk (their returned hit is garbage — callers already mask every
    consumer of dead-lane hits); dense GEMM classes ignore it (batched
    throughput ops cannot skip rows and cost nothing to keep exact)."""
    n = o.shape[0]
    # cheap dense classes resolve first; their closest hit then CAPS the
    # BVH traversal (the shrinking rayT.Max of bvh.go:69-82 applied across
    # hittable classes — e.g. modelExample's ground sphere prunes every
    # statue node beyond it)
    per_class = []  # (code, t (N,), idx (N,))
    if scene.has_spheres:
        ts = ix.sphere_ts(scene.spheres, o, d, time, t_min, t_max)
        per_class.append((CLS_SPHERE, ts.min(axis=1), jnp.argmin(ts, axis=1)))
    if scene.has_quads:
        ts = ix.quad_ts(scene.quads, o, d, t_min, t_max)
        per_class.append((CLS_QUAD, ts.min(axis=1), jnp.argmin(ts, axis=1)))
    if scene.has_boxes:
        ts = ix.box_ts(scene.boxes, o, d, t_min, t_max)
        per_class.append((CLS_BOX, ts.min(axis=1), jnp.argmin(ts, axis=1)))

    t_solid = jnp.full((n,), INF, dtype=o.dtype)
    cls = jnp.full((n,), CLS_NONE, dtype=jnp.int32)
    loc = jnp.zeros((n,), dtype=jnp.int32)
    for code, t_c, i_c in per_class:
        closer = t_c < t_solid
        t_solid = jnp.where(closer, t_c, t_solid)
        cls = jnp.where(closer, code, cls)
        loc = jnp.where(closer, i_c, loc)

    if scene.has_triangles:
        if scene.has_tri_bvh:
            if jax.default_backend() == "tpu":
                t_t, i_t = pallas_bvh_closest(scene, o, d, t_cap=t_solid,
                                              alive=alive)
            else:
                t_t, i_t = bvh_tri_closest(scene, o, d, t_min, t_max)
                i_t = jnp.where(jnp.isfinite(t_t), i_t, -1)
        else:
            ts = ix.tri_ts(scene.triangles, o, d, t_min, t_max)
            t_t = ts.min(axis=1)
            i_t = jnp.where(jnp.isfinite(t_t), jnp.argmin(ts, axis=1), -1)
        tri_win = (i_t >= 0) & (t_t < t_solid)
        t_solid = jnp.where(tri_win, t_t, t_solid)
        cls = jnp.where(tri_win, CLS_TRI, cls)
        loc = jnp.where(tri_win, jnp.clip(i_t, 0, scene.triangles.count - 1),
                        loc)

    if scene.has_media:
        med_ts, (m_t0, m_t1, m_ok, ray_len) = media_candidates(
            scene, o, d, t_solid, u_med, t_min)
        med_idx = jnp.argmin(med_ts, axis=1)
        t_med = jnp.take_along_axis(med_ts, med_idx[:, None], axis=1)[:, 0]
        is_medium = t_med < t_solid
        t = jnp.where(is_medium, t_med, t_solid)
        cls = jnp.where(is_medium, CLS_MEDIUM, cls)
        # transit log-likelihood of the observed outcome at event t:
        # transmittance exp(-rho * overlap) per crossed medium, plus the
        # winner's free-flight density factor rho (score-function channel
        # for d/d(density); SURVEY §7 "Differentiating ... free-flight")
        rho = -1.0 / scene.media.neg_inv_density  # (M,)
        t_evt = jax.lax.stop_gradient(t)
        overlap = jnp.clip(jnp.minimum(m_t1, t_evt[:, None]) - m_t0,
                           0.0, None) * ray_len
        overlap = jax.lax.stop_gradient(jnp.where(m_ok, overlap, 0.0))
        med_logp = -jnp.sum(rho[None, :] * overlap, axis=1)
        med_logp = med_logp + jnp.where(
            is_medium, jnp.log(rho[med_idx]), 0.0)
    else:
        med_idx = jnp.zeros((n,), dtype=jnp.int32)
        is_medium = jnp.zeros((n,), dtype=bool)
        t = t_solid
        med_logp = jnp.zeros((n,), dtype=o.dtype)

    hit = jnp.isfinite(t) & (cls != CLS_NONE)
    t_safe = jnp.where(hit, t, 1.0)

    # attribute gather — compute per-class candidates on the (N,) winners
    # and select; each branch is O(N) gathers + elementwise.
    p = o + t_safe[:, None] * d
    normal = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=o.dtype), p.shape)
    front = jnp.ones((n,), dtype=bool)
    uu = jnp.zeros((n,), dtype=o.dtype)
    vv = jnp.zeros((n,), dtype=o.dtype)
    mat = jnp.zeros((n,), dtype=jnp.int32)

    def merge(mask, attrs, cur):
        pp, nn, ff, u2, v2, mm = attrs
        p_, n_, f_, u_, v_, m_ = cur
        mask_c = mask[:, None]
        return (jnp.where(mask_c, pp, p_), jnp.where(mask_c, nn, n_),
                jnp.where(mask, ff, f_), jnp.where(mask, u2, u_),
                jnp.where(mask, v2, v_), jnp.where(mask, mm, m_))

    cur = (p, normal, front, uu, vv, mat)
    if scene.has_spheres:
        cur = merge(cls == CLS_SPHERE,
                    _sphere_attrs(scene.spheres, o, d, time, t_safe, loc), cur)
    if scene.has_quads:
        cur = merge(cls == CLS_QUAD, _quad_attrs(scene.quads, o, d, t_safe, loc), cur)
    if scene.has_boxes:
        cur = merge(cls == CLS_BOX, _box_attrs(scene.boxes, o, d, t_safe, loc), cur)
    if scene.has_triangles:
        cur = merge(cls == CLS_TRI, _tri_attrs(scene.triangles, o, d, t_safe, loc), cur)
    if scene.has_media:
        # medium record: normal (1,0,0), frontFace=true (medium.go:54-55)
        med_mat = scene.media.mat_id[med_idx]
        cur = merge(cls == CLS_MEDIUM,
                    (p, normal, jnp.ones((n,), bool), uu, vv, med_mat), cur)
    p, normal, front, uu, vv, mat = cur

    return Hit(hit=hit, is_medium=is_medium & hit, t=t, p=p, normal=normal,
               front_face=front, u=uu, v=vv, mat_id=mat, med_logp=med_logp)
