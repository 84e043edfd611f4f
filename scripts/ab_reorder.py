"""A/B the lane coherence-sort + block-AABB cull (regen `reorder`) on the
dense-primitive scenes (book1 ~490 spheres, book2 ~3400 prims): renders
each scene twice per arm (compile + steady state) and prints one JSON line
per (scene, reorder) cell.

Usage: python scripts/ab_reorder.py [--scenes 1,2] [--spp 25] [--lanes N]
"""

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="1,2")
    ap.add_argument("--spp", type=int, default=25)
    ap.add_argument("--lanes", type=int, default=1 << 17)
    ap.add_argument("--cadence", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()

    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.scenes import registry

    for s in [int(x) for x in args.scenes.split(",")]:
        name, fn = registry.get_scene(s)
        for reorder in (False, True):
            scene, cam = fn()
            cam.samples_per_pixel = args.spp
            t0 = time.time()
            try:
                kw = dict(n_lanes=args.lanes, cadence=args.cadence,
                          reorder=reorder)
                regen.render_regen(scene, cam, jax.random.key(0), **kw)
                _, st = regen.render_regen(scene, cam, jax.random.key(0),
                                           **kw)
                row = {"scene": name, "reorder": reorder,
                       "rays_per_s": st["rays_per_s"],
                       "occupancy": st["occupancy"],
                       "windows": st["windows"],
                       "elapsed_s": time.time() - t0}
            except Exception as e:
                row = {"scene": name, "reorder": reorder,
                       "error": repr(e)[:300],
                       "elapsed_s": time.time() - t0}
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
