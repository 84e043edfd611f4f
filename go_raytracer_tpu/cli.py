"""Command-line renderer, flag-compatible with the reference binary
(main.go:416-480): -S scene number, -o output file, -N thread count.

-N has no direct analog (XLA owns device parallelism); it is accepted and
logged for compatibility. Additional flags expose TPU-era controls:
--mode scan|while, --batch ray-batch size, --seed, --profile (jax.profiler
trace directory, standing in for the reference's -cpuprofile pprof hook,
main.go:425-432).

Deliberate divergence: an unknown/omitted -S errors with exit 2 and the
valid scene list. The reference routes it to `defaultScene` — an EMPTY
stub that never calls Render (main.go:411-413, 473-474) — so it silently
writes a zero-byte image file; reproducing that would hide typos.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native path tracer")
    ap.add_argument("-S", "--scene", default="6",
                    help="scene number 1-8 or name (default cornellBox)")
    ap.add_argument("-o", "--out", default="image.ppm",
                    help="output image (.ppm or .png)")
    ap.add_argument("-N", "--threads", type=int, default=1,
                    help="accepted for reference CLI parity; XLA manages parallelism")
    ap.add_argument("--spp", type=int, default=None, help="override samples per pixel")
    ap.add_argument("--width", type=int, default=None, help="override image width")
    ap.add_argument("--max-depth", type=int, default=None, help="override max depth")
    ap.add_argument("--mode", choices=["while", "scan"], default="while")
    ap.add_argument("--backend", choices=["auto", "xla", "pallas"], default="auto",
                    help="bounce backend: pallas megakernel when supported")
    ap.add_argument("--integrator", choices=["regen", "wavefront"],
                    default="regen",
                    help="regen (default): persistent-lane ray regeneration "
                         "— the production path; wavefront: plain per-batch "
                         "wavefront loop")
    ap.add_argument("--regen", action="store_true",
                    help="(compat alias for --integrator regen)")
    ap.add_argument("--batch", type=int, default=1 << 17, help="rays per launch")
    ap.add_argument("--lanes", type=int, default=1 << 17,
                    help="regen lane-pool size (multiple of 4096)")
    ap.add_argument("--cadence", type=int, default=0,
                    help="regen start cadence: bounce steps per lane "
                         "restart (= fused-kernel steps per call); "
                         "0 = per-scene tuned default")
    ap.add_argument("--schedule",
                    choices=["auto", "queue_ik", "queue", "positional"],
                    default="auto",
                    help="regen work assignment: queue_ik = dynamic item "
                         "queue refilled inside the fused kernel every "
                         "bounce (auto's pick on fused-kernel scenes), "
                         "queue = XLA-side refill at the cadence boundary, "
                         "positional = static per-lane blocks")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--obj", default="dragon.obj", help="OBJ path for scene 8")
    ap.add_argument("--profile", default="", help="write a jax.profiler trace here")
    ap.add_argument("--checkpoint", default="",
                    help="accumulator checkpoint path (.npz); resumes if present")
    ap.add_argument("--stats", action="store_true", help="print JSON stats")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debugging / no accelerator)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()

    from go_raytracer_tpu.render import renderer
    from go_raytracer_tpu.scenes import registry

    try:
        name, fn = registry.get_scene(args.scene)
    except KeyError:
        valid = ", ".join(f"{k}={v[0]}" for k, v in registry.SCENES.items())
        print(f"error: unknown scene {args.scene!r}; valid: {valid}",
              file=sys.stderr)
        return 2
    if not args.quiet:
        print(f"Beginning render of {name!r} . . .", file=sys.stderr)
    t0 = time.perf_counter()
    if fn is registry.model_example:
        scene, cam = fn(obj_path=args.obj)
    else:
        scene, cam = fn()
    if args.spp is not None:
        cam.samples_per_pixel = args.spp
    if args.width is not None:
        cam.width = args.width
    if args.max_depth is not None:
        cam.max_depth = args.max_depth
    build_s = time.perf_counter() - t0

    if args.profile:
        jax.profiler.start_trace(args.profile)
    if args.integrator == "regen" or args.regen:
        from go_raytracer_tpu.integrator import regen as regen_mod
        from go_raytracer_tpu.render import film
        import jax.numpy as jnp
        import numpy as np

        linear, stats = regen_mod.render_regen(
            scene, cam, jax.random.key(args.seed), n_lanes=args.lanes,
            cadence=args.cadence, backend=args.backend,
            schedule=args.schedule,
            checkpoint_path=args.checkpoint or None,
            scene_name=name, verbose=not args.quiet)
        film.write_image(args.out, np.asarray(film.tonemap(jnp.asarray(linear))))
    else:
        stats = renderer.render_to_file(
            scene, cam, args.out, key=jax.random.key(args.seed),
            mode=args.mode, ray_batch=args.batch, verbose=not args.quiet,
            checkpoint_path=args.checkpoint or None, scene_name=name,
            backend=args.backend)
    if args.profile:
        jax.profiler.stop_trace()

    stats["scene"] = name
    stats["scene_build_s"] = build_s
    stats["out"] = args.out
    if args.stats:
        print(json.dumps(stats))
    elif not args.quiet:
        print(f"wrote {args.out}: {stats['paths']} paths, "
              f"{stats['rays_per_s']:.3g} rays/s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
