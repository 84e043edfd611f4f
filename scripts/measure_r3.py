"""One-process TPU measurement queue for the outage-session work:

1. cornell A/B: queue c4 (baseline) vs in-kernel positional c4/c8
2. book2 (box fusion + slim carry) at its tuned cadence, both schedules
3. book1 (slim carry) both schedules
4. remaining scenes, best-known schedule

Writes MEASURE_R3.json incrementally (one line per result) so a killed
run keeps its partial results. Run under `timeout` in background; each
new kernel shape costs 2-10 min of remote compile.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from go_raytracer_tpu.utils import cache

cache.enable_compilation_cache()

from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.scenes import registry

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "MEASURE_R3.json")


def run(S, schedule, cadence, lanes=1 << 17, spp_scale=1.0):
    name, fn = registry.get_scene(S)
    scene, cam = fn()
    if spp_scale != 1.0:
        cam.samples_per_pixel = max(1, int(cam.samples_per_pixel * spp_scale))
    kw = dict(n_lanes=lanes, cadence=cadence, schedule=schedule)
    t0 = time.time()
    row = {"scene": name, "S": S, "schedule": schedule, "cadence": cadence}
    try:
        regen.render_regen(scene, cam, jax.random.key(0), **kw)
        t1 = time.time()
        _, st = regen.render_regen(scene, cam, jax.random.key(0), **kw)
        row.update(rays_per_s=st["rays_per_s"], occupancy=st["occupancy"],
                   windows=st["windows"], compile_s=t1 - t0,
                   run_s=time.time() - t1)
    except Exception as e:
        row["error"] = repr(e)[:300]
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


if __name__ == "__main__":
    plan = sys.argv[1] if len(sys.argv) > 1 else "full"
    if plan == "ab":
        run(6, "queue", 4)
        run(6, "positional", 4)
        run(6, "positional", 8)
    elif plan == "books":
        run(2, "queue", 2)
        run(2, "positional", 4)
        run(1, "queue", 2)
        run(1, "positional", 4)
    else:
        run(6, "queue", 4)
        run(6, "positional", 4)
        run(6, "positional", 8)
        run(2, "queue", 2)
        run(2, "positional", 4)
        run(1, "queue", 2)
        run(1, "positional", 4)
        run(4, "positional", 4)
        run(5, "positional", 4)
        run(3, "positional", 4)
        run(7, "positional", 4)
