"""Profile one steady-state regen window on the attached accelerator and
print the top device ops by total time (parsed from the jax.profiler
trace), so the window-time breakdown in docs/PERFORMANCE.md stays honest.

Run: python scripts/profile_regen.py [--cadence 4]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cadence", type=int, default=4)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/regen_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)

    import jax
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.cornell_box()
    cam.samples_per_pixel = args.spp
    key = jax.random.key(0)
    # warm/compile outside the trace
    regen.render_regen(scene, cam, key, n_lanes=1 << 17, cadence=args.cadence)

    jax.profiler.start_trace(args.logdir)
    _, st = regen.render_regen(scene, cam, key, n_lanes=1 << 17,
                               cadence=args.cadence)
    jax.profiler.stop_trace()
    print(json.dumps({"rays_per_s": st["rays_per_s"],
                      "window_s": st["window_s"]}), flush=True)

    paths = sorted(glob.glob(os.path.join(
        args.logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no trace file found", file=sys.stderr)
        return 1
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events, aggregated by op name
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        # keep XLA op-level events; skip host python/runtime lanes
        if not name or dur <= 0:
            continue
        args_d = ev.get("args") or {}
        if "run_id" in args_d or name.startswith(("jit_", "Thread", "pjit")):
            continue
        totals[name] += dur
        counts[name] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]
    width = max((len(n) for n, _ in rows), default=10)
    print(f"{'op':<{width}}  total_ms   calls")
    for name, us in rows:
        print(f"{name:<{width}}  {us/1e3:8.2f}   {counts[name]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
