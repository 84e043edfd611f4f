"""A/B the in-kernel positional scheduler against the queue schedule on
the real TPU (cornell 600x600@100spp d50, the bench.py config).

Usage: python scripts/ab_inkernel.py [cadences...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from go_raytracer_tpu.utils import cache

cache.enable_compilation_cache()

from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.scenes import registry


def run(schedule, cadence, spp=100):
    scene, cam = registry.cornell_box()
    cam.samples_per_pixel = spp
    key = jax.random.key(0)
    kw = dict(n_lanes=1 << 17, cadence=cadence, schedule=schedule)
    regen.render_regen(scene, cam, key, **kw)  # warm/compile
    t0 = time.time()
    img, st = regen.render_regen(scene, cam, key, **kw)
    dt = time.time() - t0
    print(f"{schedule:11s} cad={cadence:2d} {st['rays_per_s']/1e6:8.1f}M "
          f"occ={st.get('occupancy', 0):.3f} windows={st.get('windows')} "
          f"wall={dt:.3f}s mean={float(img.mean()):.6f}", flush=True)
    return st


if __name__ == "__main__":
    cads = [int(a) for a in sys.argv[1:]] or [4, 8]
    run("queue", 4)
    for c in cads:
        run("positional", c)
