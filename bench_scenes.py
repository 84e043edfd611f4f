"""Per-scene benchmark matrix: every reference scene (-S 1..8) rendered at
its reference configuration through the production regen path, reporting
rays/s + backend per scene (one JSON line each, plus a summary line).

Reference configs are main.go:21-398; spp can be scaled down uniformly with
--spp-scale for quicker sweeps (rays/s is throughput, not total work, so
modest spp still measures the steady state; scenes whose windows are
compile-dominated report the post-warmup window rate)."""

import argparse
import os
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="1,2,3,4,5,6,7,8")
    ap.add_argument("--spp-scale", type=float, default=1.0)
    ap.add_argument("--lanes", type=int, default=1 << 17)
    ap.add_argument("--cadence", type=int, default=0,
                    help="0 = each scene's tuned regen_cadence hint")
    ap.add_argument("--schedule", default="auto",
                    help="regen schedule: auto | queue | positional")
    ap.add_argument("--out", default="BENCH_SCENES.json")
    args = ap.parse_args(argv)

    import jax
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()

    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.ops.pallas import bounce as pb
    from go_raytracer_tpu.scenes import registry

    results = []
    for s in [int(x) for x in args.scenes.split(",")]:
        name, fn = registry.get_scene(s)
        scene, cam = fn()
        if args.spp_scale != 1.0:
            cam.samples_per_pixel = max(1, int(cam.samples_per_pixel
                                               * args.spp_scale))
        if pb.supported(scene):
            backend = "regen+fused"
        elif (pb.supported_ext(scene)
              and os.environ.get("GRT_MESH_EXT", "1") == "1"):
            # mesh scenes: binned closest hit XLA-side, shading in the
            # fused kernel via the external-hit fold (round 5)
            backend = "regen+ext"
        else:
            backend = "regen+xla"
        t0 = time.time()
        try:
            import numpy as np

            # first run pays the remote compile; then warm runs until we
            # have 3 (or the scene is slow enough that one is honest) —
            # the first post-compile run consistently underreports on the
            # tunneled v5e (allocator/dispatch warmup), so report the
            # median of the warm runs
            regen.render_regen(scene, cam, jax.random.key(0),
                               n_lanes=args.lanes, cadence=args.cadence,
                               schedule=args.schedule)
            rates, st = [], None
            for _ in range(3):
                _, st = regen.render_regen(scene, cam, jax.random.key(0),
                                           n_lanes=args.lanes,
                                           cadence=args.cadence,
                                           schedule=args.schedule)
                rates.append(st["rays_per_s"])
                if st["elapsed_s"] > 120:
                    break
            # scenes whose whole render loop is under ~1 s (cornellSmoke:
            # one 0.35 s device window) are smaller than the tunnel's
            # per-dispatch jitter and reps swing +-40%; integrate the
            # SAME internal-loop metric over enough back-to-back renders
            # to average the jitter out, and report that as the rate
            if st is not None and st["elapsed_s"] < 1.0:
                k = max(5, int(6.0 / max(st["elapsed_s"], 0.05)))
                segs, secs = 0, 0.0
                for _ in range(k):
                    _, stb = regen.render_regen(scene, cam,
                                                jax.random.key(0),
                                                n_lanes=args.lanes,
                                                cadence=args.cadence,
                                                schedule=args.schedule)
                    segs += stb["segments"]
                    secs += stb["elapsed_s"]
                rates = [segs / secs]
            rate = float(np.median(rates))
            row = {
                "scene": name, "S": s, "width": cam.width,
                "spp": cam.spp_effective, "max_depth": cam.max_depth,
                "backend": backend,
                "rays_per_s": rate,
                "rays_all": [round(r / 1e6, 2) for r in rates],
                "occupancy": st["occupancy"],
                "windows": st["windows"],
                "schedule": st.get("schedule"),
                # measured mean path length — feeds the registry's
                # regen_len hint (sizes queue_ik's auto window)
                "mean_path_len": round(st["segments"] / st["paths"], 3),
                "elapsed_s": time.time() - t0,
            }
        except Exception as e:  # record the failure, keep sweeping
            row = {"scene": name, "S": s, "error": repr(e)[:300],
                   "elapsed_s": time.time() - t0}
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    ok = [r for r in results if "rays_per_s" in r]
    print(json.dumps({"scenes_ok": len(ok), "scenes_total": len(results),
                      "min_rays_per_s": min((r["rays_per_s"] for r in ok),
                                            default=0)}))
    return 0 if len(ok) == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
