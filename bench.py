"""Benchmark driver: renders the Cornell box (the reference's headline
workload, main.go:278-320: 600x600 @ depth 50) on the attached accelerator
and prints ONE JSON line with throughput.

Metric: rays/s = traced ray segments per second (alive wavefront lanes
summed over bounces). Baseline (BASELINE.md north_star): 1e9 rays/s on
v5p-8; vs_baseline is measured against that number regardless of the chip
actually attached.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()

    from go_raytracer_tpu.render import renderer
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.cornell_box()
    cam.samples_per_pixel = 16  # 600x600 @ 16 spp, depth 50
    key = jax.random.key(0)
    backend = "auto"

    def run(c, **kw):
        return renderer.render(scene, c, key=key, mode="while",
                               ray_batch=1 << 19, verbose=False,
                               backend=backend, **kw)

    # staged warmup: a tiny render compiles the (grid-tiled, shape-reusable)
    # pallas kernel quickly; the full-shape warm then compiles only the
    # cheap outer graph. Falls back to the XLA backend on any pallas issue.
    small = registry.cornell_box()[1]
    small.width = 128
    small.samples_per_pixel = 4
    small.max_depth = cam.max_depth
    try:
        run(small)
        run(cam)
    except Exception:
        backend = "xla"
        run(small)
        run(cam)

    t0 = time.time()
    _, stats = run(cam)
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
            "backend": backend,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
