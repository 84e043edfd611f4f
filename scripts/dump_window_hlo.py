"""Dump the compiled HLO of one cornellBox regen window to a file so the
forward-scan shell ("while.14" in profiles) can be read op by op.

Run on the TPU: python scripts/dump_window_hlo.py [--out /tmp/window_hlo.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/window_hlo.txt")
    ap.add_argument("--cadence", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.integrator import regen, wavefront
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.cornell_box()
    cam.samples_per_pixel = 16
    arrays = cam.derived()
    n = 1 << 17
    d1 = cam.max_depth + 1
    refill = 4 * d1
    window = -(-(refill + d1) // args.cadence) * args.cadence
    npix = cam.width * cam.image_height
    total = npix * cam.spp_effective
    state = regen._init_state(n, jnp.float32)
    acc = jnp.zeros((total + n, 3))
    lowered = regen._run_window.lower(
        scene, arrays, acc, state, jnp.int32(0), jax.random.key(0),
            width=cam.width, npix=npix, sqrt_spp=cam.spp_sqrt,
            total_items=total, window=window, refill=refill,
            cadence=args.cadence, n_u=wavefront.N_FIXED_U,
            max_depth=cam.max_depth,
            max_contribution=cam.max_contribution, use_pallas=True,
            interpret=False, reorder=False)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
