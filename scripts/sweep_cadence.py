"""Per-scene regen cadence sweep (TPU): rays/s at each cadence, warm run.

Usage: python scripts/sweep_cadence.py --scenes 1,3,5,7 --cadences 1,2,4
       [--spp-scale 0.25] [--reps 2]

Rates are throughput, so a uniform --spp-scale keeps orderings while
cutting sweep time; scenes whose steady state needs multiple windows
should keep enough spp for >=3 windows. One JSON line per (scene,
cadence); pick the argmax and update scenes/registry.py's regen_cadence
hints."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="1,3,5,7")
    ap.add_argument("--cadences", default="1,2,4")
    ap.add_argument("--spp-scale", type=float, default=1.0)
    ap.add_argument("--lanes", type=int, default=1 << 17)
    ap.add_argument("--reps", type=int, default=2,
                    help="timed warm reps after the compile run")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.scenes import registry

    for s in [int(x) for x in args.scenes.split(",")]:
        for cad in [int(x) for x in args.cadences.split(",")]:
            name, fn = registry.get_scene(s)
            scene, cam = fn()
            if args.spp_scale != 1.0:
                cam.samples_per_pixel = max(
                    1, int(cam.samples_per_pixel * args.spp_scale))
            t0 = time.time()
            try:
                rates, occ = [], None
                for rep in range(args.reps + 1):
                    _, st = regen.render_regen(
                        scene, cam, jax.random.key(0), n_lanes=args.lanes,
                        cadence=cad)
                    if rep:
                        rates.append(st["rays_per_s"])
                        occ = st["occupancy"]
                row = {"scene": name, "S": s, "cadence": cad,
                       "spp": cam.spp_effective,
                       "rays_per_s": float(np.median(rates)),
                       "rays_all": [round(r / 1e6, 1) for r in rates],
                       "occupancy": occ,
                       "windows": st["windows"],
                       "total_s": time.time() - t0}
            except Exception as e:  # keep sweeping on a bad config
                row = {"scene": name, "S": s, "cadence": cad,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
