"""Sponza-scale mesh measurement (VERDICT round-4 item 3): the binned
intersector vs the BVH8 walk at 65k/262k/1M triangles, with DEVICE-CHAINED
timing (fresh ray bundles derived on device from a folded key each
iteration, one final readback) — the round-4 measurement lesson: timing
identical executions through the tunnel hits a memoization layer and
reports ~0.1 ms regardless of true cost.

At 1M tris the packed group table is ~64 MB (512 B/8-tri group), far past
the ~16 MB/core VMEM: the stream kernel switches to the double-buffered
HBM table DMA (ops/pallas/stream._stream_kernel_hbm, round 5).

Run ON the TPU:
  python scripts/bench_mesh_binned.py [--sizes 65536,262144,1048576]
      [--render] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="65536,262144,1048576")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--mesh", default="both", choices=["both", "binned", "walk"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.ops import trace as trace_mod
    from go_raytracer_tpu.ops.pallas import traverse8 as ptrav8
    from go_raytracer_tpu.integrator import regen
    from bench_mesh import build_mesh_scene

    N = args.n

    def chained(fn, key, iters):
        """fn(key) -> (checksum, next_key); returns s/iter wall."""
        cs, k = fn(key)
        jax.block_until_ready((cs, k))
        t0 = time.perf_counter()
        for _ in range(iters):
            cs, k = fn(k)
        jax.block_until_ready((cs, k))
        return (time.perf_counter() - t0) / iters

    for target in [int(x) for x in args.sizes.split(",")]:
        scene, cam = build_mesh_scene(target)
        bvh = scene.tri_bvh
        n_tris = int(np.asarray(scene.triangles.active).sum())
        k_cl = int(bvh.cl_lo.shape[0])
        gs = np.asarray(bvh.cl_gs)
        row = {"tris": n_tris, "clusters": k_cl,
               "tris_per_cluster": int(np.diff(gs).max()) * 8,
               "table_mb": round(bvh.cl_lines.size * 4 / 2**20, 1),
               "n_rays": N}

        lo = np.asarray(bvh.node_min[0])
        ext = np.maximum(np.asarray(bvh.node_max[0]) - lo, 1e-6)

        def rays_from(key):
            ko, kd, k2 = jax.random.split(key, 3)
            o = jax.random.uniform(ko, (N, 3), jnp.float32,
                                   jnp.asarray(lo - 0.1 * ext),
                                   jnp.asarray(lo + 1.1 * ext))
            d = jax.random.normal(kd, (N, 3), jnp.float32)
            return o, d, k2

        @jax.jit
        def step_binned(key):
            o, d, k2 = rays_from(key)
            t, i = trace_mod.binned_closest(scene, o, d)
            return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) + \
                jnp.sum(i), k2

        @jax.jit
        def step_walk(key):
            o, d, k2 = rays_from(key)
            t, i = ptrav8.bvh8_closest(
                bvh.nodes8, bvh.tris8, o, d,
                jnp.full((N,), jnp.inf, jnp.float32),
                dense_nodes=bvh.bvh8_dense)
            return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) + \
                jnp.sum(i), k2

        key = jax.random.key(7)
        try:
            if args.mesh in ("both", "binned"):
                dt = chained(step_binned, key, args.iters)
                row["binned_incoherent_rays_s"] = round(N / dt)
            if args.mesh in ("both", "walk"):
                dt = chained(step_walk, key, args.iters)
                row["walk_incoherent_rays_s"] = round(N / dt)
            if args.render:
                mesh_env = {"both": "binned", "binned": "binned",
                            "walk": "walk"}[args.mesh]
                os.environ["GRT_MESH"] = mesh_env
                t0 = time.time()
                _, st = regen.render_regen(scene, cam, jax.random.key(0),
                                           n_lanes=1 << 16)
                row["render_rays_per_s"] = round(st["rays_per_s"])
                row["render_elapsed_s"] = round(st["elapsed_s"], 2)
                row["render_mesh"] = mesh_env
        except Exception as e:
            row["error"] = repr(e)[:400]
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
