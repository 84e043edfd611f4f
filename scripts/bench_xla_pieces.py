"""Microbenchmarks of the XLA pieces a sorted-pairs stream intersector
would need (docs/PERFORMANCE.md mesh roadmap), on the real device.

Pieces, at modelExample scale (R=64k rays, K=2048 clusters of 32 tris,
P~=512k pairs):
  a) dense (R, K) slab test + materialized bool mask
  b) pair extraction: nonzero(mask) with a static size bound
  c) cluster-major pair sort: lax.sort (key, ray_id)
  d) per-pair ray-plane gather: (P,) indices into (R,) planes x 7
  e) per-ray min-reduce of pair results: sort-based vs scatter-min
"""
import argparse
import time
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--R", type=int, default=1 << 16)
    ap.add_argument("--K", type=int, default=2048)
    ap.add_argument("--P", type=int, default=1 << 19)
    args = ap.parse_args()
    R, K, P = args.R, args.K, args.P
    rs = np.random.default_rng(0)

    o = jnp.asarray(rs.uniform(-5, 5, (3, R)), jnp.float32)
    d = jnp.asarray(rs.normal(size=(3, R)), jnp.float32)
    nmin = jnp.asarray(rs.uniform(-5, 0, (3, K)), jnp.float32)
    nmax = nmin + jnp.asarray(rs.uniform(0.1, 0.6, (3, K)), jnp.float32)

    @jax.jit
    def dense_slab(o, d, nmin, nmax):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                              jnp.where(d < 0, -1e-30, 1e-30), d)
        t0 = (nmin[:, None, :] - o[:, :, None]) * inv[:, :, None]
        t1 = (nmax[:, None, :] - o[:, :, None]) * inv[:, :, None]
        near = jnp.max(jnp.minimum(t0, t1), axis=0)
        far = jnp.min(jnp.maximum(t0, t1), axis=0)
        return jnp.maximum(near, 1e-3) < far          # (R, K) bool

    t, mask = bench(dense_slab, o, d, nmin, nmax)
    frac = float(jnp.mean(mask))
    print(f"a) dense slab ({R}x{K}): {t*1e3:.2f} ms  (hit frac {frac:.3f})")

    @jax.jit
    def pairs_nonzero(mask):
        rr, cc = jnp.nonzero(mask.reshape(-1), size=P, fill_value=0)[0] // K, \
            jnp.nonzero(mask.reshape(-1), size=P, fill_value=0)[0] % K
        return rr.astype(jnp.int32), cc.astype(jnp.int32)

    t, (rr, cc) = bench(pairs_nonzero, mask)
    print(f"b) nonzero -> {P} pairs: {t*1e3:.2f} ms")

    keys = jnp.asarray(rs.integers(0, K, P), jnp.int32)
    ray_ids = jnp.asarray(rs.integers(0, R, P), jnp.int32)

    @jax.jit
    def sort2(keys, ray_ids):
        return jax.lax.sort((keys, ray_ids), num_keys=1)

    t, _ = bench(sort2, keys, ray_ids)
    print(f"c) sort {P} (key+1 payload): {t*1e3:.2f} ms")

    planes = [jnp.asarray(rs.normal(size=R), jnp.float32) for _ in range(7)]

    @jax.jit
    def gather7(ray_ids, *planes):
        return [p[ray_ids] for p in planes]

    t, _ = bench(gather7, ray_ids, *planes)
    print(f"d) gather {P}x7 ray planes: {t*1e3:.2f} ms")

    tvals = jnp.asarray(rs.uniform(0, 100, P), jnp.float32)

    @jax.jit
    def reduce_scatter_min(ray_ids, tvals):
        return jnp.full((R,), jnp.inf, jnp.float32).at[ray_ids].min(tvals)

    t, _ = bench(reduce_scatter_min, ray_ids, tvals)
    print(f"e1) scatter-min {P} -> {R}: {t*1e3:.2f} ms")

    @jax.jit
    def reduce_sort_min(ray_ids, tvals):
        rk, tv = jax.lax.sort((ray_ids, tvals), num_keys=2)
        first = jnp.concatenate([jnp.array([True]), rk[1:] != rk[:-1]])
        # dense result via one scatter with unique (first-occurrence) idx
        return jnp.full((R,), jnp.inf, jnp.float32).at[
            jnp.where(first, rk, R)].min(jnp.where(first, tv, jnp.inf),
                                         mode="drop")

    t, _ = bench(reduce_sort_min, ray_ids, tvals)
    print(f"e2) sort+first+unique-scatter: {t*1e3:.2f} ms")

    # f) the all-in-one via big sort: one sort with 8 f32 payloads
    pays = [jnp.asarray(rs.normal(size=P), jnp.float32) for _ in range(8)]

    @jax.jit
    def sort9(keys, *pays):
        return jax.lax.sort((keys,) + pays, num_keys=1)

    t, _ = bench(sort9, keys, *pays)
    print(f"f) sort {P} (key+8 payloads): {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
