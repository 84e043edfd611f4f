"""INTERLEAVED cadence A/B (round-5 measurement methodology).

scripts/sweep_cadence.py times each (scene, cadence) in its own run,
which the tunneled v5e's fast/slow phases can swing by more than any
cadence delta (round 5 measured cornellSmoke c8 at +14% in one
separate-run sweep and -2% in the interleaved A/B of the same build).
This harness alternates the candidate cadences WITHIN one process,
rep by rep, and integrates segments/elapsed per arm — phase noise hits
both arms equally.

Usage: python scripts/ab_cadence.py --scene 7 --cadences 4,8 [--reps 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, required=True)
    ap.add_argument("--cadences", default="4,8")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--lanes", type=int, default=1 << 17)
    args = ap.parse_args(argv)

    import jax
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.scenes import registry

    cads = [int(c) for c in args.cadences.split(",")]
    name, fn = registry.get_scene(args.scene)
    scene, cam = fn()
    key = jax.random.key(0)
    for c in cads:                      # compile/warm both arms first
        regen.render_regen(scene, cam, key, n_lanes=args.lanes, cadence=c)
    acc = {c: [0, 0.0] for c in cads}
    for _ in range(args.reps):
        for c in cads:
            _, st = regen.render_regen(scene, cam, key,
                                       n_lanes=args.lanes, cadence=c)
            acc[c][0] += st["segments"]
            acc[c][1] += st["elapsed_s"]
    res = {c: round(acc[c][0] / acc[c][1] / 1e6, 2) for c in cads}
    print(json.dumps({"scene": name, "interleaved_Mrays": res}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
