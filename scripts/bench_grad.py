"""Gradient artifact at real scale (VERDICT round-3 item 2; BASELINE.md
"gradient parity ... Cornell box").

Runs jax.grad through the differentiable scan wavefront ON the attached
accelerator at 128x128 @ 16spp, depth 10, over the three Cornell-family
reference scenes that jointly cover the differentiable parameter vector:

* cornellBox  — albedo (wall texture), emission (light), camera origin
* book3       — dielectric ref_idx (glass sphere), box albedo
* cornellSmoke — medium density (neg_inv_density), albedo

For each selected scalar parameter the analytic gradient is checked
against a central finite difference with common random numbers (same
path keys both sides — the estimator is pathwise-smooth in these
parameters except ref_idx, whose Schlick branch uses a score-function
term that agrees with FD only in expectation; see tests/test_grad.py).

Writes GRAD.md + prints one JSON line per scene with gradient
throughput (forward segments per value_and_grad wall second) and peak
device memory.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=10)
    ap.add_argument("--out", default="GRAD.md")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from go_raytracer_tpu.utils import cache
    cache.enable_compilation_cache()
    from go_raytracer_tpu.integrator import wavefront
    from go_raytracer_tpu.parallel import mesh as pmesh
    from go_raytracer_tpu.render import camera as camera_mod
    from go_raytracer_tpu.scenes import registry

    dev = jax.devices()[0]
    rows = []

    scenes = [
        ("cornellBox", registry.cornell_box,
         [("tex_color", (0, 0), 1e-2, "white-wall albedo R"),
          ("tex_color", None, 1e-1, "light emission R"),
          ("camera", (0,), 1.0, "camera origin x"),
          ("background", (1,), 1e-2, "background G")]),
        ("book3", registry.book3,
         [("ref_idx", "diel", 2e-3, "glass ref_idx (score-fn)"),
          ("tex_color", (0, 0), 1e-2, "albedo R")]),
        ("cornellSmoke", registry.cornell_smoke,
         [("med_neg_inv_density", (0,), 2.0, "smoke neg_inv_density"),
          ("tex_color", (0, 0), 1e-2, "albedo R")]),
    ]

    for name, build, checks in scenes:
        scene, cam = build()
        cam.width = args.width
        cam.aspect_ratio = 1.0
        cam.samples_per_pixel = args.spp
        cam.max_depth = args.max_depth
        arrays = cam.derived()
        w = cam.width
        npix = w * cam.image_height
        sqrt_spp = cam.spp_sqrt
        n_strata = sqrt_spp * sqrt_spp
        n = npix * n_strata
        params = pmesh.extract_params(scene)
        params["camera"] = jnp.zeros(3)  # additive camera-origin offset

        ids = jnp.tile(jnp.arange(npix, dtype=jnp.int32), n_strata)
        st = jnp.repeat(jnp.arange(n_strata, dtype=jnp.int32), npix)
        s_i = (st // sqrt_spp).astype(jnp.float32)
        s_j = (st % sqrt_spp).astype(jnp.float32)
        key = jax.random.key(5)

        def f(p):
            sc = pmesh.apply_params(
                scene, {k: v for k, v in p.items() if k != "camera"})
            arr = arrays.replace(center=arrays.center + p["camera"],
                                 pixel00=arrays.pixel00 + p["camera"])
            k_rays, k_path = jax.random.split(key)
            o, d, t = camera_mod.generate_rays(arr, w, ids, s_i, s_j, k_rays)
            L, stt = wavefront.radiance(sc, o, d, t, k_path, cam.max_depth,
                                        cam.max_contribution, mode="scan")
            return jnp.nan_to_num(L).mean(), stt["segments"]

        vg = jax.jit(jax.value_and_grad(f, has_aux=True))
        fwd = jax.jit(f)

        # light emission index: find the diffuse_light texture row
        emit_rows = np.where(
            np.asarray(scene.materials.kind) == 3)[0]  # MAT_DIFFUSE_LIGHT
        for ci, c in enumerate(checks):
            if c[1] is None:  # emission: patch to the light's texture row
                tex_row = int(np.asarray(scene.materials.tex_id)[emit_rows[0]])
                checks[ci] = (c[0], (tex_row, 0), c[2], c[3])
            elif c[1] == "diel":  # the dielectric material's own row
                row = int(np.where(
                    np.asarray(scene.materials.kind) == 2)[0][0])
                checks[ci] = (c[0], (row,), c[2], c[3])

        (val, segs), grads = vg(params)
        jax.block_until_ready(grads)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            (val, segs), grads = vg(params)
        jax.block_until_ready(grads)
        dt = (time.perf_counter() - t0) / reps
        stats = dev.memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0)

        fd_rows = []
        for path, idx, eps, label in checks:
            an = float(grads[path][idx])
            p_p = dict(params)
            p_m = dict(params)
            p_p[path] = params[path].at[idx].add(eps)
            p_m[path] = params[path].at[idx].add(-eps)
            (vp, _) = fwd(p_p)[0], None
            (vm, _) = fwd(p_m)[0], None
            fd = (float(vp) - float(vm)) / (2 * eps)
            rel = abs(an - fd) / max(abs(an), abs(fd), 1e-12)
            fd_rows.append({"param": label, "path": path, "idx": list(idx),
                            "analytic": an, "fd": fd, "rel_err": rel})

        row = {
            "scene": name, "width": w, "spp": n_strata,
            "max_depth": cam.max_depth, "rays": int(n),
            "fwd_segments": int(segs),
            "grad_step_s": dt,
            "grad_rays_per_s": float(segs) / dt,
            "peak_device_bytes": int(peak),
            "device": str(dev),
            "fd_checks": fd_rows,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as fh:
        fh.write(
            "# GRAD — gradient artifact at real scale (round 4)\n\n"
            "`jax.grad` through the differentiable scan wavefront "
            "(integrator/wavefront.radiance, mode=\"scan\") on "
            f"{rows[0]['device']}, {args.width}x{args.width} @ "
            f"{rows[0]['spp']}spp, depth {args.max_depth} — the full "
            "parameter vector of BASELINE.md's gradient-parity target "
            "(albedo, emission, camera origin, background, ref_idx, "
            "medium density) across the Cornell-family scenes. FD = "
            "central finite difference with common random numbers.\n\n"
            "| scene | rays | fwd segments | grad step | grad rays/s | "
            "peak mem |\n|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['scene']} | {r['rays']:,} | "
                     f"{r['fwd_segments']:,} | {r['grad_step_s']*1e3:.0f} ms"
                     f" | {r['grad_rays_per_s']/1e6:.1f}M | "
                     + (f"{r['peak_device_bytes']/2**30:.2f} GiB"
                        if r['peak_device_bytes'] else "n/a (tunnel)")
                     + " |\n")
        fh.write("\nFD checks (analytic vs central difference):\n\n"
                 "| scene | parameter | analytic | FD | rel err |\n"
                 "|---|---|---|---|---|\n")
        for r in rows:
            for c in r["fd_checks"]:
                fh.write(f"| {r['scene']} | {c['param']} | "
                         f"{c['analytic']:.3e} | {c['fd']:.3e} | "
                         f"{c['rel_err']:.3f} |\n")
        fh.write(
            "\nNotes.\n"
            "* albedo / emission / background / density are pathwise "
            "gradients with common random numbers — their FD agreement "
            "is tight (density is the noisiest estimator; its FD "
            "converges with spp).\n"
            "* ref_idx flows through the Schlick branch's score-function "
            "estimator (agreement in expectation, validated in a "
            "controlled pane scene by tests/test_grad.py::"
            "test_grad_ref_idx_matches_fd); on book3's curved glass "
            "sphere the single-config FD additionally contains moving-"
            "discontinuity boundary terms (TIR onset, refraction "
            "silhouettes) that pathwise+score estimators do not model — "
            "edge sampling is explicitly out of scope (SURVEY §7).\n"
            "* camera-origin rows are pathwise-interior gradients; the "
            "FD includes silhouette boundary terms for the same reason.\n"
            "* Running this artifact at scale found and fixed two real "
            "backward-poisoning bugs (round 4): sqrt's infinite "
            "derivative at clamped arguments in the cone/light-pdf "
            "samplers (core/rng._sqrt0, integrator/sampling."
            "_sphere_light_pdf) NaN'd entire gradient pytrees whenever "
            "a path light-sampled a sphere from inside it.\n"
            "* The inverse-rendering example "
            "(examples/inverse_rendering.py) optimizes these same "
            "parameters end-to-end.\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
