"""Benchmark driver: renders the Cornell box (the reference's headline
workload, main.go:278-320: 600x600 @ depth 50) on the attached accelerator
and prints ONE JSON line with throughput.

Metric: rays/s = traced ray segments per second (alive wavefront lanes
summed over bounces). Baseline (BASELINE.md north_star): 1e9 rays/s on
v5p-8; vs_baseline is measured against that number regardless of the chip
actually attached.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()

    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.render import renderer
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.cornell_box()
    # full reference config (main.go:309-312): 600x600 @ 100 spp, depth 50.
    # Multi-window, so the pipelined host loop hides the per-window
    # dispatch tax (GRT_SPP=16 reproduces the old single-window bench).
    cam.samples_per_pixel = int(os.environ.get("GRT_SPP", "100"))
    key = jax.random.key(0)
    # cadence 0 = the scene's tuned registry hint (cornell: 4 — with the
    # in-kernel queue, cadence is pure shell amortization; occupancy is
    # set by the workload-sized window, not the cadence)
    cadence = int(os.environ.get("GRT_CADENCE", "0"))
    refill = int(os.environ.get("GRT_REFILL", "0"))
    schedule = os.environ.get("GRT_SCHEDULE", "auto")

    # fastest path: ray-regeneration + pallas bounce; fall back to the plain
    # wavefront renderer (pallas, then xla) on any issue.
    mode_used = "regen+pallas"
    try:
        import numpy as np

        kw = dict(n_lanes=1 << 17, cadence=cadence, refill_len=refill,
                  schedule=schedule)
        regen.render_regen(scene, cam, key, **kw)  # warm/compile
        # median of 5 warm runs: the first post-compile run consistently
        # underreports on the tunneled v5e (allocator/dispatch warmup),
        # and the tunnel swings +-15% between slow/fast phases (round 5
        # measured 557-720M medians-of-3 on an identical build)
        t0 = time.time()
        runs = [regen.render_regen(scene, cam, key, **kw)[1]
                for _ in range(5)]
        stats = sorted(runs, key=lambda s: s["rays_per_s"])[2]
    except Exception:
        def run(backend):
            return renderer.render(scene, cam, key=key, mode="while",
                                   ray_batch=1 << 19, verbose=False,
                                   backend=backend)

        try:
            mode_used = "wavefront+pallas"
            run("auto")
            t0 = time.time()
            _, stats = run("auto")
        except Exception:
            mode_used = "wavefront+xla"
            run("xla")
            t0 = time.time()
            _, stats = run("xla")
    rays_per_s = stats["rays_per_s"]
    print(json.dumps({
        "metric": "rays_per_s",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / 1e9,
        "detail": {
            "scene": "cornellBox",
            "width": cam.width,
            "spp": cam.spp_effective,
            "max_depth": cam.max_depth,
            "elapsed_s": stats["elapsed_s"],
            "paths_per_s": stats["paths_per_s"],
            "occupancy": stats.get("occupancy"),
            "window_s": stats.get("window_s"),
            "backend": mode_used,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
