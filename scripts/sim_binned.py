"""CPU simulator for a BINNED multi-pass mesh traversal, to size its win
before building any kernel.

Context (docs/PERFORMANCE.md "why traversal resists tuning"): the Pallas
walk shares ONE serial node walk per 128-ray row, so a row's cost is the
UNION of its rays' visit sets — measured 41x a single ray's visits on
incoherent modelExample wavefronts, and the Morton sort is already
saturated. The binned scheme attacks the union directly:

  1. Cut the BVH into K treelets (subtrees with <= S triangles).
  2. Dense-test the K treelet AABBs per ray (pure vector work, no walk).
  3. PASS LOOP: each ray picks its nearest unvisited treelet with
     entry_t < t_best; rays are sorted by that treelet id (so a row's
     rays walk the SAME subtree); the walk kernel starts at the row's
     treelet root(s); hits shrink t_best, pruning later passes.

This script simulates exact row-visit counts for the current shared-row
walk vs the binned pass loop on the real modelExample BVH with
incoherent rays, and checks the binned scheme returns bit-identical
closest hits. Run on CPU only (no TPU needed).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

T_MIN = 1.0e-3


def build(tris_target=65536):
    from bench_mesh import build_mesh_scene

    scene, cam = build_mesh_scene(tris_target)
    bvh = scene.tri_bvh
    tr = scene.triangles
    order = np.asarray(bvh.order)
    valid = order >= 0
    safe = np.where(valid, order, 0)
    v0 = np.where(valid[:, None], np.asarray(tr.v0)[safe], 0.0)
    e0 = np.where(valid[:, None], np.asarray(tr.e0)[safe], 0.0)
    e1 = np.where(valid[:, None], np.asarray(tr.e1)[safe], 0.0)
    return bvh, v0.astype(np.float64), e0.astype(np.float64), \
        e1.astype(np.float64)


def gen_rays(R, seed=0):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-5, 5, (R, 3))
    d = rs.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def morton_key(o, d, lo, ext):
    def part(x):
        x = x & 0x1F
        x = (x | (x << 8)) & 0x0300F
        x = (x | (x << 4)) & 0x030C3
        x = (x | (x << 2)) & 0x09249
        return x

    q = np.clip((o - lo) / ext * 32.0, 0, 31).astype(np.int64)
    m = (part(q[:, 0]) << 2) | (part(q[:, 1]) << 1) | part(q[:, 2])
    oct_ = ((d[:, 0] > 0).astype(np.int64) << 2) | \
        ((d[:, 1] > 0).astype(np.int64) << 1) | (d[:, 2] > 0).astype(np.int64)
    return (oct_ << 15) | m


def walk(bvh, v0, e0, e1, o, d, start, end, t0,
         visited_rows=None, count_visits=True):
    """Vectorized per-ray skip-link walk over [start, end) with initial
    caps t0. Returns (t_best, idx, visits_per_ray) and fills
    visited_rows[r] |= {nodes r visited} when given (R, M) bool."""
    R = o.shape[0]
    node = start.copy()
    endp = end
    t_best = t0.copy()
    idx = np.full(R, -1, np.int64)
    visits = np.zeros(R, np.int64)
    nmin, nmax = bvh.node_min.astype(np.float64), \
        bvh.node_max.astype(np.float64)
    first, count, skip = bvh.first, bvh.count, bvh.skip
    tiny = 1e-300
    sd = np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / sd
    L = bvh.leaf_size
    while True:
        act = node < endp
        if not act.any():
            break
        nc = np.where(act, node, 0)
        t0b = (nmin[nc] - o) * inv
        t1b = (nmax[nc] - o) * inv
        near = np.minimum(t0b, t1b).max(axis=1)
        far = np.maximum(t0b, t1b).min(axis=1)
        hit_box = act & (np.maximum(near, T_MIN) < np.minimum(far, t_best))
        if count_visits:
            visits += act
        if visited_rows is not None:
            visited_rows[np.arange(R)[act], nc[act]] = True
        is_leaf = count[nc] > 0
        do_leaf = hit_box & is_leaf
        if do_leaf.any():
            for k in range(L):
                m = do_leaf & (k < count[nc])
                ti = np.where(m, first[nc] + k, 0)
                a0, a1, a2 = v0[ti], e0[ti], e1[ti]
                pv = np.cross(d, a2)
                det = (a1 * pv).sum(1)
                invd = 1.0 / np.where(np.abs(det) < 1e-300, 1e-300, det)
                tv = o - a0
                uu = (tv * pv).sum(1) * invd
                qv = np.cross(tv, a1)
                vv = (d * qv).sum(1) * invd
                tt = (a2 * qv).sum(1) * invd
                ok = m & (np.abs(det) >= 1e-12) & (uu >= 0) & (uu <= 1) & \
                    (vv >= 0) & (uu + vv <= 1) & (tt > T_MIN) & (tt < t_best)
                t_best = np.where(ok, tt, t_best)
                idx = np.where(ok, ti, idx)
        node = np.where(act,
                        np.where(hit_box & ~is_leaf, node + 1, skip[nc]),
                        node)
    return t_best, idx, visits


def row_union_cost(visited, order_idx, rowlen=128):
    """Sum over rows (consecutive `rowlen` rays in order_idx) of the
    union-of-visits size — the serial walk cost a shared row walk pays."""
    V = visited[order_idx]
    R = V.shape[0]
    pad = (-R) % rowlen
    if pad:
        V = np.concatenate([V, np.zeros((pad, V.shape[1]), bool)])
    rows = V.reshape(-1, rowlen, V.shape[1])
    return int(rows.any(axis=1).sum()), rows.shape[0]


def treelet_cut(bvh, S):
    """Treelet roots: shallowest subtrees with <= S triangles."""
    csum = np.concatenate([[0], np.cumsum(bvh.count)])
    tricount = lambda i: csum[bvh.skip[i]] - csum[i]
    roots = []
    stack = [0]
    while stack:
        i = stack.pop()
        if bvh.count[i] > 0 or tricount(i) <= S:
            roots.append(i)
        else:
            stack.append(i + 1)
            stack.append(int(bvh.skip[i + 1]))
    return np.asarray(sorted(roots), np.int64)


def simulate(tris_target=65536, R=4096, S_list=(512, 1024, 2048, 4096),
             rowlen=128):
    t0 = time.time()
    bvh, v0, e0, e1 = build(tris_target)
    M = bvh.n_nodes
    o, d = gen_rays(R)
    lo = bvh.node_min[0]
    ext = np.maximum(bvh.node_max[0] - lo, 1e-6)
    key = morton_key(o, d, lo, ext)
    sort_idx = np.argsort(key, kind="stable")
    print(f"built: {tris_target} tris, {M} binary nodes, R={R} "
          f"({time.time()-t0:.1f}s)", flush=True)

    # ---- base: full walk from root, unions over Morton-sorted rows
    Vb = np.zeros((R, M), bool)
    start = np.zeros(R, np.int64)
    end = np.full(R, M, np.int64)
    tinf = np.full(R, np.inf)
    tb, ib, visits = walk(bvh, v0, e0, e1, o, d, start, end, tinf,
                          visited_rows=Vb)
    base_union, n_rows = row_union_cost(Vb, sort_idx, rowlen)
    print(f"base: per-ray visits mean {visits.mean():.1f}, "
          f"row-union total {base_union} ({base_union/n_rows:.1f}/row, "
          f"{base_union/n_rows/visits.mean():.1f}x blowup)", flush=True)

    for S in S_list:
        roots = treelet_cut(bvh, S)
        K = len(roots)
        # phase A: dense treelet-AABB entry t per (ray, treelet)
        tiny = 1e-300
        sd = np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
        invd = 1.0 / sd
        t0b = (bvh.node_min[roots][None] - o[:, None]) * invd[:, None]
        t1b = (bvh.node_max[roots][None] - o[:, None]) * invd[:, None]
        near = np.minimum(t0b, t1b).max(axis=2)
        far = np.maximum(t0b, t1b).min(axis=2)
        entry = np.where(np.maximum(near, T_MIN) < far,
                         np.maximum(near, T_MIN), np.inf)

        t_best = np.full(R, np.inf)
        idx = np.full(R, -1, np.int64)
        unvisited = np.isfinite(entry)
        total_union = 0
        total_rows = 0
        passes = 0
        treelets_walked = 0
        while True:
            cand = unvisited & (entry < t_best[:, None])
            has = cand.any(axis=1)
            if not has.any():
                break
            passes += 1
            e_m = np.where(cand, entry, np.inf)
            c = e_m.argmin(axis=1)
            act_idx = np.nonzero(has)[0]
            # sort active rays by (treelet, morton) as the real scheme would
            ord_a = act_idx[np.lexsort((key[act_idx], c[act_idx]))]
            treelets_walked += len(np.unique(c[act_idx]))
            Vp = np.zeros((R, M), bool)
            st = np.where(has, roots[c], 0)
            en = np.where(has, bvh.skip[roots[c]], 0)
            tb2, ib2, _ = walk(bvh, v0, e0, e1, o, d, st, en, t_best,
                               visited_rows=Vp)
            upd = ib2 >= 0
            t_best = np.where(upd, tb2, t_best)
            idx = np.where(upd, ib2, idx)
            u, r = row_union_cost(Vp[ord_a], np.arange(len(ord_a)), rowlen)
            total_union += u
            total_rows += r
            unvisited[np.arange(R), c] = np.where(has, False,
                                                  unvisited[np.arange(R), c])
        match = np.array_equal(idx, ib) and np.allclose(
            np.where(np.isfinite(tb), tb, 0),
            np.where(np.isfinite(t_best), t_best, 0))
        # cost model: visit ~100ns serial walk latency; per pass overhead =
        # one lane sort (~4ns/lane) + dense K-test (~K/8 blocks * ~30ns/row)
        visit_ns = 100.0
        sort_ns = 4.0 * R
        dense_ns = (K / 8) * 30.0 * (R / rowlen)
        t_base = base_union * visit_ns
        t_bin = total_union * visit_ns + passes * sort_ns + dense_ns
        print(f"S={S:5d} K={K:5d}: passes={passes}, row-union total "
              f"{total_union} ({total_union/base_union:.3f}x base), "
              f"rows {total_rows}, hits-match={match}, "
              f"est time {t_bin/1e6:.2f}ms vs base {t_base/1e6:.2f}ms "
              f"=> {t_base/max(t_bin,1):.2f}x", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=65536)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--S", default="512,1024,2048,4096")
    args = ap.parse_args()
    simulate(args.tris, args.rays, tuple(int(x) for x in args.S.split(",")))
