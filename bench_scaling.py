"""Scaling harness: rays/s of the sharded regeneration renderer vs device
count (BASELINE.md target: >=85% efficiency 1 -> N).

Prints one JSON line per device count:
  {"devices": D, "rays_per_s": R, "efficiency": R / (D * R_1)}

On the attached accelerator it uses however many devices exist (the
tunneled dev box exposes ONE v5e chip, so real-hardware scaling needs a
pod slice); `--cpu-virtual K` forces a K-way virtual CPU mesh — timing
there shares one host's cores, so wall-clock efficiency is NOT meaningful,
but per-shard work balance and correctness are (the driver's
dryrun_multichip covers compile+execute of the same sharded program).
Multi-host: launch one process per host with the coordinator env set
(parallel/distributed.py) and the mesh spans the full job.
"""

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-virtual", type=int, default=0,
                    help="force K virtual CPU devices (correctness/balance)")
    ap.add_argument("--width", type=int, default=300)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=20)
    ap.add_argument("--lanes", type=int, default=1 << 15,
                    help="lanes per device")
    ap.add_argument("--backend", default="auto",
                    help="bounce backend (use xla for --cpu-virtual runs: "
                         "interpret-mode pallas is not a timing proxy)")
    ap.add_argument("--schedule", default="auto",
                    help="regen schedule (queue_ik = production default)")
    args = ap.parse_args(argv)

    import os
    if args.cpu_virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.cpu_virtual}"
        ).strip()

    import jax
    if args.cpu_virtual:
        jax.config.update("jax_platforms", "cpu")
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()

    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.parallel import distributed, mesh as pmesh
    from go_raytracer_tpu.scenes import registry

    distributed.initialize()
    n_all = len(jax.devices())
    scene, cam = registry.cornell_box()
    cam.width = args.width
    cam.samples_per_pixel = args.spp
    cam.max_depth = args.max_depth

    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_all]
    base = None
    for d in counts:
        m = pmesh.make_mesh(d, axes=("data",))
        key = jax.random.key(0)
        # warm/compile, then measure
        regen.render_regen_sharded(scene, cam, m, key, n_lanes=args.lanes,
                                   backend=args.backend,
                                   schedule=args.schedule)
        t0 = time.time()
        _, st = regen.render_regen_sharded(scene, cam, m, key,
                                           n_lanes=args.lanes,
                                           backend=args.backend,
                                           schedule=args.schedule)
        rays = st["segments"] / st["elapsed_s"]
        if base is None:
            base = rays
        print(json.dumps({
            "devices": d,
            "rays_per_s": rays,
            "efficiency": rays / (d * base),
            "occupancy": st["occupancy"],
            "work_balance": st["work_balance"],
            "windows": st["windows"],
            "virtual_cpu": bool(args.cpu_virtual),
            "schedule": args.schedule,
            "backend": args.backend,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
