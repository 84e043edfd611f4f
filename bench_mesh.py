"""Mesh-scale benchmark: closest-hit traversal + full renders over large
triangle meshes (VERDICT round-1 item 3: dragon-scale and a >=500k-tri
stress variant on real TPU hardware).

Prints one JSON line per configuration with tri count, traversal rays/s
(coherent and incoherent bundles), and an end-to-end render rate."""

import argparse
import json
import sys
import time


def build_mesh_scene(tris_target: int):
    import numpy as np
    from go_raytracer_tpu.scene import obj_loader
    from go_raytracer_tpu.scene.builder import SceneBuilder, Transform
    from go_raytracer_tpu.render.camera import Camera

    nmaj = int(np.sqrt(tris_target / 2 * 2))
    nmin = max(8, int(tris_target / 2 / nmaj))
    b = SceneBuilder(background=(0, 0, 0))
    b.sphere((0, -1000, 0), 1000, b.lambertian((0.4, 0.4, 0.4)))
    mat = b.metal((1.0, 0.84, 0.0), 0.5)
    opts = obj_loader.LoadOptions(scale_factor=5.0, center=True,
                                  position=(0, 1.8, 0), default_material=mat)
    obj_loader.procedural_statue(b, mat, opts,
                                 transform=Transform(rotate_y_deg=180),
                                 major_segments=nmaj, minor_segments=nmin)
    sun = b.sphere((7, 13, 7), 5, b.diffuse_light((4, 4, 4)))
    b.add_light(sun)
    cam = Camera(aspect_ratio=16 / 9, width=400, samples_per_pixel=25,
                 max_depth=20, vertical_fov=40, background=(0, 0, 0),
                 max_contribution=2.0)
    cam.position((10, 5, 10), (0, 0, 0), (0, 1, 0))
    return b.build(), cam


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="65536,262144,524288")
    ap.add_argument("--render", action="store_true",
                    help="also run an end-to-end render per size")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.ops import trace as trace_mod
    from go_raytracer_tpu.integrator import regen

    for target in [int(x) for x in args.sizes.split(",")]:
        scene, cam = build_mesh_scene(target)
        n_tris = int(np.asarray(scene.triangles.active).sum())
        row = {"tris": n_tris, "bvh_nodes": scene.tri_bvh.n_nodes}
        try:
            N = 1 << 16
            rs = np.random.default_rng(0)
            f = jax.jit(lambda o, d: trace_mod.pallas_bvh_closest(scene, o, d))
            # coherent: a camera-like bundle
            o_c = jnp.asarray(np.tile([[10.0, 5.0, 10.0]], (N, 1)), jnp.float32)
            d_c = jnp.asarray(np.array([[-10.0, -4.0, -10.0]])
                              + rs.normal(size=(N, 3)) * 0.5, jnp.float32)
            jax.block_until_ready(f(o_c, d_c))
            t0 = time.time()
            for _ in range(3):
                r = f(o_c, d_c)
            jax.block_until_ready(r)
            row["traversal_coherent_rays_s"] = N * 3 / (time.time() - t0)
            # incoherent: random positions/directions around the statue
            o_i = jnp.asarray(rs.uniform(-5, 5, (N, 3)), jnp.float32)
            d_i = jnp.asarray(rs.normal(size=(N, 3)), jnp.float32)
            t0 = time.time()
            for _ in range(3):
                r = f(o_i, d_i)
            jax.block_until_ready(r)
            row["traversal_incoherent_rays_s"] = N * 3 / (time.time() - t0)
            if args.render:
                t0 = time.time()
                _, st = regen.render_regen(scene, cam, jax.random.key(0),
                                           n_lanes=1 << 16)
                row["render_rays_per_s"] = st["rays_per_s"]
                row["render_elapsed_s"] = st["elapsed_s"]
                row["render_segments"] = st["segments"]
        except Exception as e:
            row["error"] = repr(e)[:300]
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
