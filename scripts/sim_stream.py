"""CPU simulator for STREAM-TRACED mesh intersection, to size its win
before building the kernel.

Context (docs/PERFORMANCE.md "why traversal resists tuning"): every
traversal variant so far shares one SERIAL scalar node walk per 128-ray
row, so a row pays the union of its rays' visit sets (~41x one ray's
visits, ~100ns per visit through the single scalar unit). The stream
scheme has NO per-ray tree walk at all:

  1. Scene compile: cut the BVH into K flat clusters (subtrees with
     <= S triangles, contiguous in BVH triangle order, tight AABBs).
  2. Per bounce: slab-test all rays x all K cluster AABBs — pure
     (8,128)-tile vector work, no walk.
  3. Compact the hit (ray, cluster) pairs and sort by cluster id: rows
     of 128 consecutive pairs then touch only 1+ DISTINCT clusters, so
     the kernel streams each row's few clusters' triangles over the
     whole row (tile-uniform scalar indices only).
  4. Closest hit = segmented min over each ray's pairs. Testing a
     SUPERSET of the walk's triangles returns the identical closest
     hit, so parity is structural.

This script measures, on the real modelExample-style mesh with
incoherent rays: candidate clusters per ray (the pair count that sets
phase-3 cost), distinct clusters per sorted row (the residual scalar
work), the oracle-pruned pair count (what an entry-t pass loop could
save), and checks exact closest-hit parity vs the reference walk.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sim_binned import T_MIN, build, gen_rays, morton_key, treelet_cut, walk


def cluster_tables(bvh, roots):
    """Tight AABB + contiguous triangle range per cluster (BVH triangle
    order makes every subtree's triangles one [first, last) run)."""
    csum = np.concatenate([[0], np.cumsum(bvh.count)])
    first = csum[roots]
    last = csum[bvh.skip[roots]]
    return (bvh.node_min[roots].astype(np.float64),
            bvh.node_max[roots].astype(np.float64),
            first.astype(np.int64), last.astype(np.int64))


def slab(nmin, nmax, o, d, t_cap=None):
    """(R, K) entry t of each ray into each cluster AABB; inf = miss."""
    tiny = 1e-300
    sd = np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / sd
    t0b = (nmin[None] - o[:, None]) * inv[:, None]
    t1b = (nmax[None] - o[:, None]) * inv[:, None]
    near = np.minimum(t0b, t1b).max(axis=2)
    far = np.maximum(t0b, t1b).min(axis=2)
    cap = np.inf if t_cap is None else t_cap[:, None]
    hit = np.maximum(near, T_MIN) < np.minimum(far, cap)
    return np.where(hit, np.maximum(near, T_MIN), np.inf)


def mt_closest(v0, e0, e1, o, d, tri_first, tri_last, t0):
    """Reference closest hit per (ray, triangle-range) pair set."""
    R = o.shape[0]
    t_best = t0.copy()
    idx = np.full(R, -1, np.int64)
    n_tri = 0
    lo, hi = int(tri_first.min()), int(tri_last.max())
    for r in range(R):
        f, l = tri_first[r], tri_last[r]
        if f >= l:
            continue
        a0, a1, a2 = v0[f:l], e0[f:l], e1[f:l]
        n_tri += l - f
        pv = np.cross(d[r], a2)
        det = (a1 * pv).sum(1)
        invd = 1.0 / np.where(np.abs(det) < 1e-300, 1e-300, det)
        tv = o[r] - a0
        uu = (tv * pv).sum(1) * invd
        qv = np.cross(tv, a1)
        vv = (d[r] * qv).sum(1) * invd
        tt = (a2 * qv).sum(1) * invd
        ok = (np.abs(det) >= 1e-12) & (uu >= 0) & (uu <= 1) & (vv >= 0) & \
            (uu + vv <= 1) & (tt > T_MIN) & (tt < t_best[r])
        if ok.any():
            j = np.where(ok, tt, np.inf).argmin()
            t_best[r] = tt[j]
            idx[r] = f + j
    return t_best, idx, n_tri


def simulate(tris_target=65536, R=16384, S_list=(32, 64, 128, 256),
             rowlen=128):
    t0 = time.time()
    bvh, v0, e0, e1 = build(tris_target)
    M = bvh.n_nodes
    o, d = gen_rays(R)
    print(f"built: {tris_target} tris, {M} nodes, R={R} "
          f"({time.time()-t0:.1f}s)", flush=True)

    # reference walk: exact closest hits + the serial cost it pays
    Vb = np.zeros((R, M), bool)
    tb, ib, visits = walk(bvh, v0, e0, e1, o, d,
                          np.zeros(R, np.int64), np.full(R, M, np.int64),
                          np.full(R, np.inf), visited_rows=Vb)
    lo = bvh.node_min[0]
    ext = np.maximum(bvh.node_max[0] - lo, 1e-6)
    key = morton_key(o, d, lo, ext)
    sort_idx = np.argsort(key, kind="stable")
    from sim_binned import row_union_cost
    base_union, n_rows = row_union_cost(Vb, sort_idx, rowlen)
    print(f"walk baseline: {visits.mean():.1f} visits/ray, row-union "
          f"{base_union/n_rows:.0f}/row x {n_rows} rows = {base_union} "
          f"serial visits", flush=True)

    for S in S_list:
        roots = treelet_cut(bvh, S)
        K = len(roots)
        nmin, nmax, tf, tl = cluster_tables(bvh, roots)
        entry = slab(nmin, nmax, o, d)                      # (R, K)
        cand = np.isfinite(entry)
        P = int(cand.sum())
        # oracle pruning: pairs a perfect entry-t pass loop would keep
        P_oracle = int((entry <= tb[:, None] + 1e-12).sum())
        # phase-3 row structure: pairs sorted by cluster id
        rr, cc = np.nonzero(cand)
        order = np.lexsort((key[rr], cc))
        cc_s = cc[order]
        pad = (-P) % rowlen
        cc_pad = np.concatenate([cc_s, np.full(pad, cc_s[-1] if P else 0)])
        rows = cc_pad.reshape(-1, rowlen)
        distinct = (np.diff(rows, axis=1) != 0).sum(axis=1) + 1
        # parity: min over candidate clusters == walk's closest hit
        # (cluster tri ranges are supersets of what the walk tested)
        tsup = np.full(R, np.inf)
        isup = np.full(R, -1, np.int64)
        tris_tested = 0
        for k in range(K):
            rays_k = rr[cc == k]
            if len(rays_k) == 0:
                continue
            tk, ik, nt = mt_closest(v0, e0, e1, o[rays_k], d[rays_k],
                                    np.full(len(rays_k), tf[k]),
                                    np.full(len(rays_k), tl[k]),
                                    tsup[rays_k])
            upd = ik >= 0
            tsup[rays_k[upd]] = tk[upd]
            isup[rays_k[upd]] = ik[upd]
            tris_tested += nt
        hit_match = ((ib < 0) & (isup < 0)) | \
            (np.abs(np.where(np.isfinite(tb), tb, 0)
                    - np.where(np.isfinite(tsup), tsup, 0)) < 1e-9)
        print(f"S={S:4d}: K={K:5d} clusters | cand/ray {P/R:6.1f} "
              f"(oracle {P_oracle/R:5.1f}) | pairs {P} -> "
              f"{rows.shape[0]} rows, distinct/row "
              f"{distinct.mean():4.2f} | MT tri-tests {tris_tested} "
              f"({tris_tested/R:.0f}/ray vs walk "
              f"{'?'}) | t parity {hit_match.mean()*100:.2f}%",
              flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=65536)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--S", default="32,64,128,256")
    args = ap.parse_args()
    simulate(args.tris, args.rays, tuple(int(x) for x in args.S.split(",")))


def simulate_sweep(tris_target=65536, R=16384, S_list=(32, 64, 128),
                   rowlen=128):
    """Row-sweep variant (the kernel actually buildable without per-lane
    scatter): Morton-sort rays into rows of `rowlen`; each row linearly
    sweeps all K cluster AABBs in blocks of 8 (vector slab), streaming a
    cluster's triangles only when ANY lane in the row hits it. Costs:
    fixed K/8 vector steps per row + one stream per row-union member."""
    bvh, v0, e0, e1 = build(tris_target)
    o, d = gen_rays(R)
    lo = bvh.node_min[0]
    ext = np.maximum(bvh.node_max[0] - lo, 1e-6)
    key = morton_key(o, d, lo, ext)
    sort_idx = np.argsort(key, kind="stable")
    tb, ib, visits = walk(bvh, v0, e0, e1, o, d,
                          np.zeros(R, np.int64), np.full(R, bvh.n_nodes,
                                                         np.int64),
                          np.full(R, np.inf))
    n_rows = (R + rowlen - 1) // rowlen
    print(f"[sweep] {tris_target} tris R={R}: walk visits/ray "
          f"{visits.mean():.1f}", flush=True)
    for S in S_list:
        roots = treelet_cut(bvh, S)
        K = len(roots)
        nmin, nmax, tf, tl = cluster_tables(bvh, roots)
        entry = slab(nmin, nmax, o, d)
        cand = np.isfinite(entry)[sort_idx]
        pad = (-R) % rowlen
        if pad:
            cand = np.concatenate([cand, np.zeros((pad, K), bool)])
        rows = cand.reshape(-1, rowlen, K)
        union = rows.any(axis=1).sum(axis=1)          # clusters streamed/row
        tris_streamed = 0
        for i in range(rows.shape[0]):
            hit_k = rows[i].any(axis=0)
            tris_streamed += int((tl[hit_k] - tf[hit_k]).sum())
        sweep_steps = n_rows * (-(-K // 8))
        print(f"[sweep] S={S:4d}: K={K:5d} | union/row "
              f"{union.mean():6.1f} ({union.mean()/K*100:4.1f}% of K) | "
              f"streams {int(union.sum())} | slab-steps {sweep_steps} | "
              f"tri-tests/ray {tris_streamed/R:7.0f}", flush=True)
