"""A/B the BVH8 traversal kernels on the real TPU: base (traverse8) vs
interleaved-branchless (traverse8i) at several ilv/unroll settings.

Times the raw kernels on identical ray bundles (no coherence sort — the
pure kernel cost), coherent and incoherent, printing one JSON line per
config. Usage: python scripts/ab_traverse.py [--tris 65536]
[--configs base,ilv4u1,ilv8u1,ilv2u2]."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=65536)
    ap.add_argument("--rays", type=int, default=1 << 16)
    ap.add_argument("--configs", default="base,ilv4u1,ilv8u1,ilv2u2")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.ops.pallas import traverse8 as p8
    from go_raytracer_tpu.ops.pallas import traverse8i as p8i
    from bench_mesh import build_mesh_scene

    scene, _ = build_mesh_scene(args.tris)
    bvh = scene.tri_bvh
    nodes, tris = bvh.nodes8, bvh.tris8
    dense = bool(bvh.bvh8_dense)
    n_tris = int(np.asarray(scene.triangles.active).sum())
    print(json.dumps({"tris": n_tris, "dense_nodes": dense}), flush=True)

    N = args.rays
    rs = np.random.default_rng(0)
    o_c = jnp.asarray(np.tile([[10.0, 5.0, 10.0]], (N, 1)), jnp.float32)
    d_c = jnp.asarray(np.array([[-10.0, -4.0, -10.0]])
                      + rs.normal(size=(N, 3)) * 0.5, jnp.float32)
    o_i = jnp.asarray(rs.uniform(-5, 5, (N, 3)), jnp.float32)
    d_i = jnp.asarray(rs.normal(size=(N, 3)), jnp.float32)

    def timed(f, o, d):
        r = jax.block_until_ready(f(o, d))
        t0 = time.time()
        for _ in range(args.reps):
            r = f(o, d)
        jax.block_until_ready(r)
        return N * args.reps / (time.time() - t0), r

    for cfg in args.configs.split(","):
        if cfg == "base":
            f = jax.jit(lambda o, d: p8.bvh8_closest(
                nodes, tris, o, d, dense_nodes=dense))
        elif cfg == "mask":
            from go_raytracer_tpu.ops.pallas import traverse8m as p8m
            from go_raytracer_tpu.scene import bvh8 as bvh8_mod
            tr = scene.triangles
            order = np.asarray(bvh.order)
            valid = order >= 0
            safe = np.where(valid, order, 0)
            v0 = np.where(valid[:, None], np.asarray(tr.v0)[safe], 0.0)
            e0 = np.where(valid[:, None], np.asarray(tr.e0)[safe], 0.0)
            e1 = np.where(valid[:, None], np.asarray(tr.e1)[safe], 0.0)
            bm = bvh8_mod.collapse(
                np.asarray(bvh.node_min), np.asarray(bvh.node_max),
                np.asarray(bvh.first), np.asarray(bvh.count),
                np.asarray(bvh.skip), v0, e0, e1,
                max_leaf=bvh.leaf_size, layout="mask")
            nodes_m = jnp.asarray(bm.node_lines)
            tris_m = jnp.asarray(bm.tri_lines)
            f = jax.jit(lambda o, d: p8m.bvh8m_closest(
                nodes_m, tris_m, o, d, dense_nodes=bm.dense_nodes))
        elif cfg.startswith("sweep"):
            from go_raytracer_tpu.ops.pallas import sweep as psweep
            S = int(cfg[5:].rstrip("v") or 64)
            tr = scene.triangles
            order = np.asarray(bvh.order)
            valid = order >= 0
            safe = np.where(valid, order, 0)
            v0 = np.where(valid[:, None], np.asarray(tr.v0)[safe], 0.0)
            e0 = np.where(valid[:, None], np.asarray(tr.e0)[safe], 0.0)
            e1 = np.where(valid[:, None], np.asarray(tr.e1)[safe], 0.0)
            fixed = not cfg.endswith("v")      # "sweep64v" = variable
            clu, trit, kb, ng = psweep.build_clusters(
                bvh.node_min, bvh.node_max, bvh.first, bvh.count,
                bvh.skip, v0, e0, e1, max_tris=S, fixed_groups=fixed)
            f = jax.jit(lambda o, d: psweep.cluster_sweep_closest(
                clu, trit, o, d, n_blocks=kb, ng_fixed=ng))
        else:
            ilv = int(cfg[3])
            unroll = int(cfg[5])
            f = jax.jit(lambda o, d, i=ilv, u=unroll: p8i.bvh8_closest_ilv(
                nodes, tris, o, d, dense_nodes=dense, ilv=i, unroll=u))
        row = {"config": cfg}
        try:
            t0 = time.time()
            rc, res_c = timed(f, o_c, d_c)
            row["compile_plus_first_s"] = round(time.time() - t0, 1)
            ri, res_i = timed(f, o_i, d_i)
            row["coherent_rays_s"] = int(rc)
            row["incoherent_rays_s"] = int(ri)
            row["hits_i"] = int((np.asarray(res_i[1]) >= 0).sum())
        except Exception as e:
            row["error"] = repr(e)[:300]
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
