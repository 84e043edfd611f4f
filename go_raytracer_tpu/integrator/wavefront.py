"""Wavefront path integrator: the reference's recursive `rayColor`
(camera/camera.go:293-331) re-expressed as a fixed-shape two-pass loop.

Per bounce, each live ray produces an (emit, weight, clamp?) triple:

  miss             -> E = Background, terminate           (camera.go:300-302)
  diffuse light    -> E = emitted (front face only),      (materials.go:146-155)
                      terminate                           (camera.go:312-314)
  metal/dielectric -> W = attenuation, no clamp           (camera.go:315-317)
  lambertian/iso   -> W = atten * scatterPdf / mixPdf,    (camera.go:319-328)
                      clamp applies at this level         (camera.go:330)

The recursion L(depth) = clamp(E + W * L(depth-1)) is then evaluated by a
reverse scan over the recorded bounces — reproducing the per-level firefly
clamp (camera.go:334-341) exactly, which a forward throughput accumulator
cannot. Forward pass is `lax.scan` (differentiable) or `lax.while_loop`
with early exit when every ray has terminated (fast inference).

Depth semantics: recursion stops at depth < 0 (camera.go:294), so MaxDepth+1
surface interactions occur; the deepest child contributes black.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from go_raytracer_tpu.core import onb, rng, vecmath as vm
from go_raytracer_tpu.integrator import sampling
from go_raytracer_tpu.ops import trace as trace_mod
from go_raytracer_tpu.scene import types as T

INV_4PI = 1.0 / (4.0 * jnp.pi)
# uniform slots per ray per bounce
U_METAL_A, U_METAL_B, U_DIEL, U_MIX, U_PICK, U_LA, U_LB, U_MA, U_MB = range(9)
N_FIXED_U = 9


def clamp_contribution(color: jnp.ndarray, max_value) -> jnp.ndarray:
    """Firefly clamp (camera.go:334-341): rescale so the component sum does
    not exceed max_value. NaN intensities compare false and pass through
    unscaled, matching Go."""
    intensity = jnp.sum(color, axis=-1, keepdims=True)
    # safe-where: divide only in the taken branch so grads stay finite
    intensity_safe = jnp.where(intensity > max_value, intensity, 1.0)
    scale = jnp.where(intensity > max_value, max_value / intensity_safe, 1.0)
    return color * scale


def _bounce(scene: T.Scene, o, d, time, alive, u):
    """One wavefront bounce. Returns (E, W, clamp_flag, new_o, new_d, alive')."""
    n = o.shape[0]
    n_med = scene.media.count
    hit = trace_mod.trace(scene, o, d, time,
                          u[:, N_FIXED_U:N_FIXED_U + n_med], alive=alive)

    mats = scene.materials
    kind = mats.kind[hit.mat_id]
    tex_val = sampling.texture_value(scene, mats.tex_id[hit.mat_id], hit.u, hit.v, hit.p)
    fuzz = mats.fuzz[hit.mat_id]
    ref_idx = mats.ref_idx[hit.mat_id]

    miss = alive & ~hit.hit
    lit = alive & hit.hit
    false1 = jnp.zeros_like(lit)
    is_light = lit & (kind == T.MAT_DIFFUSE_LIGHT)
    is_metal = (lit & (kind == T.MAT_METAL)) if scene.has_metal else false1
    is_diel = (lit & (kind == T.MAT_DIELECTRIC)) if scene.has_dielectric else false1
    is_iso = (lit & (kind == T.MAT_ISOTROPIC)) if scene.has_isotropic else false1
    is_lamb = lit & (kind == T.MAT_LAMBERTIAN)
    diffuse = is_lamb | is_iso

    # emission: background on miss; texture on front-face light hits
    # (materials.go:150-155 — back faces emit black)
    zero3 = jnp.zeros_like(tex_val)
    E = jnp.where(miss[:, None], scene.background[None, :].astype(o.dtype), zero3)
    E = jnp.where((is_light & hit.front_face)[:, None], tex_val, E)

    # diffuse: 50/50 mixture of light pdf and material pdf (camera.go:319-328,
    # pdf.go:58-74)
    basis = onb.build(hit.normal)
    cos_dir = onb.transform(basis, rng.cosine_direction(u[:, U_MA], u[:, U_MB]))
    if scene.has_isotropic:
        iso_dir = rng.unit_vector(u[:, U_MA], u[:, U_MB])
        mat_dir = jnp.where(is_iso[:, None], iso_dir, cos_dir)
    else:
        mat_dir = cos_dir
    if scene.lights.n > 0:
        light_dir = sampling.lights_sample(scene, hit.p, u[:, U_PICK],
                                           u[:, U_LA], u[:, U_LB])
        gen_dir = jnp.where((u[:, U_MIX] < 0.5)[:, None], light_dir, mat_dir)
        l_pdf = sampling.lights_pdf_value(scene, hit.p, gen_dir)
    else:
        # No lights list: the reference would panic (rand.Intn(0) in
        # hittable.go:101); for user scenes we degrade to pure material
        # sampling — gen_dir = mat_dir and pdf collapses to mat_pdf — so
        # no 0/0 NaN weight poisons half the diffuse samples.
        gen_dir = mat_dir
        l_pdf = None
    unit_gen = vm.normalize(gen_dir)
    cos_theta = vm.dot(unit_gen, hit.normal)
    cosine_pdf = jnp.maximum(0.0, cos_theta) / jnp.pi  # pdf.go:33-36
    mat_pdf = jnp.where(is_iso, INV_4PI, cosine_pdf) if scene.has_isotropic else cosine_pdf
    if l_pdf is not None:
        pdf_value = 0.5 * l_pdf + 0.5 * mat_pdf        # pdf.go:65-67
    else:
        pdf_value = mat_pdf
    scatter_pdf = mat_pdf                              # materials.go:51-57,161-163
    # pdf_value == 0 (or NaN, the inside-a-sphere-light quirk): the
    # reference divides by it (camera.go:328) and the resulting inf/NaN
    # is ALWAYS zeroed downstream — clampContribution turns an inf sum
    # into NaN components (mc/inf * inf) and PrintColor's NaN guard
    # (color.go:28-36) zeroes the vertex's whole emit+scatter triple, so
    # the path's subtree contributes exactly 0 either way. We realize
    # that limit EXPLICITLY (E and W of the bad vertex set to 0 below)
    # instead of propagating inf/NaN: the film value is identical, and
    # an actual x/0 would poison whole gradient pytrees through inf *
    # 0-cotangent product terms (round-4 GRAD.md finding — TPU numerics
    # hit such lanes where CPU does not).
    ok_div = diffuse & (pdf_value > 0)
    bad_pdf = diffuse & ~ok_div
    ratio = jnp.where(ok_div, scatter_pdf, 0.0) / jnp.where(
        ok_div, pdf_value, 1.0)
    w_diffuse = tex_val * ratio[:, None]

    W = jnp.where(diffuse[:, None], w_diffuse, zero3)
    new_d = gen_dir

    if scene.has_metal:
        # metal (materials.go:70-79): reflect raw dir, normalize, add fuzz
        fuzz_vec = rng.unit_vector(u[:, U_METAL_A], u[:, U_METAL_B])
        d_metal = vm.normalize(vm.reflect(d, hit.normal)) + fuzz[:, None] * fuzz_vec
        W = jnp.where(is_metal[:, None], tex_val, W)   # metal albedo
        new_d = jnp.where(is_metal[:, None], d_metal, new_d)

    if scene.has_dielectric:
        # dielectric (materials.go:94-130)
        ud = vm.normalize(d)
        ri = jnp.where(hit.front_face, 1.0 / ref_idx, ref_idx)
        cos_t = jnp.minimum(vm.dot(-ud, hit.normal), 1.0)
        # Schlick uses the *material* index regardless of travel direction
        # (materials.go:126-130) — a reference quirk we preserve.
        r0 = ((1.0 - ref_idx) / (1.0 + ref_idx)) ** 2
        schlick = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
        # TIR test on squares: ri*sin > 1 <=> ri^2*(1-cos^2) > 1 — avoids
        # sqrt(0) at normal incidence, whose inf derivative NaNs ref_idx
        # gradients even under a zero cotangent
        must_reflect = ri * ri * (1.0 - cos_t * cos_t) > 1.0
        do_reflect = must_reflect | (schlick > u[:, U_DIEL])
        d_diel = jnp.where(do_reflect[:, None],
                           vm.reflect(ud, hit.normal),
                           vm.refract(ud, hit.normal, ri[:, None]))
        # Score-function factor for the reflect/refract choice: value 1,
        # gradient d(log p_branch)/d(ref_idx) * L — the unbiased estimator
        # for the Bernoulli branch (SURVEY §7 "Differentiating discrete
        # sampling"); the pathwise term through refract() covers the
        # within-branch sensitivity.
        p_sel = jnp.where(must_reflect, 1.0,
                          jnp.where(do_reflect, schlick, 1.0 - schlick))
        sur_d = p_sel / jax.lax.stop_gradient(jnp.maximum(p_sel, 1e-12))
        W = jnp.where(is_diel[:, None],
                      sur_d[:, None] * jnp.ones_like(tex_val), W)
        new_d = jnp.where(is_diel[:, None], d_diel, new_d)

    if scene.has_media:
        # score-function factor for media transit (value 1; gradient
        # d(med_logp)/d(density) * contribution) — applies to both this
        # vertex's emission and everything downstream
        sur_m = jnp.exp(hit.med_logp
                        - jax.lax.stop_gradient(hit.med_logp))[:, None]
        E = E * sur_m
        W = W * sur_m

    # zero the bad-mixture-pdf vertex's whole contribution (the explicit
    # limit of the reference's inf/NaN -> clamp -> NaN-guard pipeline;
    # see the pdf_value note above). Killing the lane also skips its
    # pointless subtree.
    E = jnp.where(bad_pdf[:, None], 0.0, E)
    W = jnp.where(bad_pdf[:, None], 0.0, W)
    new_o = jnp.where(lit[:, None], hit.p, o)
    alive_next = (is_metal | is_diel | diffuse) & ~bad_pdf
    return E, W, diffuse, new_o, new_d, alive_next


def radiance(scene: T.Scene, o, d, time, key, max_depth: int,
             max_contribution: float, mode: str = "scan",
             backend: str = "xla"):
    """Per-ray radiance (N, 3) for camera rays (o, d, time).

    mode="scan": differentiable fixed-trip scan.
    mode="while": early-exits once all rays terminate (inference).
    backend="xla" | "pallas" | "auto": "pallas" fuses the whole bounce into
    one TPU megakernel (ops/pallas/bounce.py) — forward-only; "auto" picks
    pallas when the scene's capability flags allow it and N is lane-aligned.
    Returns (L, stats) where stats["segments"] counts traced ray segments.
    """
    from go_raytracer_tpu.ops.pallas import bounce as pallas_bounce

    n = o.shape[0]
    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_bounce.supported(scene) and n % 128 == 0)
    interpret = jax.default_backend() != "tpu"
    n_u = N_FIXED_U + scene.media.count
    steps = max_depth + 1
    dtype = o.dtype

    if use_pallas:
        tables = pallas_bounce.pack_scene(scene)
        statics = pallas_bounce.scene_statics(scene)

    def fwd_step(carry, step_key):
        o_c, d_c, t_c, alive_c = carry
        u = jax.random.uniform(step_key, (n, n_u), dtype=dtype)
        if use_pallas:
            E, W, cf, no, nd, na, img = pallas_bounce.bounce(
                tables, statics, o_c, d_c, t_c, alive_c, u,
                scene.background, interpret=interpret)
            W = pallas_bounce.patch_image_weight(scene, W, img)
        else:
            E, W, cf, no, nd, na = _bounce(scene, o_c, d_c, t_c, alive_c, u)
        dead = ~alive_c
        E = jnp.where(dead[:, None], 0.0, E)
        W = jnp.where(dead[:, None], 0.0, W)
        seg = jnp.sum(alive_c)
        return (no, nd, t_c, na), (E, W, cf & alive_c, seg)

    step_keys = jax.random.split(key, steps)
    init = (o, d, time, jnp.ones((n,), dtype=bool))

    if mode == "scan":
        _, (Es, Ws, CFs, segs) = jax.lax.scan(fwd_step, init, step_keys)
    elif mode == "while":
        Es = jnp.zeros((steps, n, 3), dtype=dtype)
        Ws = jnp.zeros((steps, n, 3), dtype=dtype)
        CFs = jnp.zeros((steps, n), dtype=bool)
        segs = jnp.zeros((steps,), dtype=jnp.int32)

        def cond(state):
            i, carry, *_ = state
            return (i < steps) & jnp.any(carry[3])

        def body(state):
            i, carry, Es, Ws, CFs, segs = state
            carry, (E, W, cf, seg) = fwd_step(carry, step_keys[i])
            return (i + 1, carry, Es.at[i].set(E), Ws.at[i].set(W),
                    CFs.at[i].set(cf), segs.at[i].set(seg))

        _, _, Es, Ws, CFs, segs = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init, Es, Ws, CFs, segs))
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # reverse combine: L = clamp?(E + W * L_child), child of deepest = black
    def rev_step(L, xs):
        E, W, cf = xs
        raw = E + W * L
        L = jnp.where(cf[:, None], clamp_contribution(raw, max_contribution), raw)
        return L, None

    L0 = jnp.zeros((n, 3), dtype=dtype)
    L, _ = jax.lax.scan(rev_step, L0, (Es, Ws, CFs), reverse=True)
    return L, {"segments": jnp.sum(segs)}
