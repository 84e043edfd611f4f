"""Microbench the primitives a binned (per-cluster ray queue) mesh
intersector would need on the v5e:

1. lax.sort of an N-lane pool by a small-int key with P payload planes
   (the global binning step — the known-risky piece: round-3 measured a
   512k 1-D sort at 27-47ms via scripts/bench_xla_pieces.py).
2. The existing coherence_sort (octant+Morton, 10 payloads) for reference.
3. jnp.cumsum rank at pool size (the compaction rank).
4. A segmented "first candidate cluster" pick via the BVH8 node table
   top-level slab test (vector work only).

Run ON the TPU: python scripts/bench_binning.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    rs = np.random.default_rng(0)
    for n in (1 << 17, 1 << 18, 1 << 19):
        key = jnp.asarray(rs.integers(0, 1024, n, dtype=np.int32))
        for p in (1, 4, 9):
            planes = tuple(jnp.asarray(rs.random(n, dtype=np.float32))
                           for _ in range(p))

            @jax.jit
            def do_sort(key, planes):
                return jax.lax.sort((key,) + planes, dimension=0,
                                    num_keys=1, is_stable=False)

            dt = timeit(do_sort, key, planes)
            print(f"sort  n={n:>7} payloads={p}: {dt*1e3:8.3f} ms")

        # two-key sort (key, iota) as the coherence_sort does
        iota = jnp.arange(n, dtype=jnp.int32)
        planes9 = tuple(jnp.asarray(rs.random(n, dtype=np.float32))
                        for _ in range(9))

        @jax.jit
        def do_sort2(key, iota, planes):
            return jax.lax.sort((key, iota) + planes, dimension=0,
                                num_keys=2, is_stable=False)

        dt = timeit(do_sort2, key, iota, planes9)
        print(f"sort2 n={n:>7} payloads=9+iota: {dt*1e3:8.3f} ms")

        @jax.jit
        def do_rank(key):
            return jnp.cumsum((key > 512).astype(jnp.int32))

        dt = timeit(do_rank, key)
        print(f"cumsum rank n={n:>7}: {dt*1e3:8.3f} ms")

        # argsort-free grouping alternative: histogram via one-hot matmul
        # (128k x 1024 one-hot @ identity -> bin counts), the radix-free
        # "counting" half of a counting sort
        @jax.jit
        def do_hist(key):
            oh = (key[:, None] == jnp.arange(1024)[None, :])
            return jnp.sum(oh.astype(jnp.float32), axis=0)

        dt = timeit(do_hist, key)
        print(f"one-hot hist n={n:>7} bins=1024: {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
