"""Texture evaluation and light-importance sampling (vectorized).

Covers the reference's Texture.Value implementations (hittable/texture.go),
the Pdf family (hittable/pdf.go), and per-primitive PdfValue/Random
(hittable/objects.go:52-80, 152-165, 356-385; hittable/hittable.go:89-103).
Everything is a pure function over ray batches; dispatch on texture/light
kind is by masked select, and the per-light pdf matrix is (N, L) with L the
(small) light count.
"""

from __future__ import annotations

import jax.numpy as jnp

from go_raytracer_tpu.core import onb, rng, vecmath as vm
from go_raytracer_tpu.ops import intersect as ix
from go_raytracer_tpu.scene import perlin as perlin_mod
from go_raytracer_tpu.scene import types as T

INV_4PI = 1.0 / (4.0 * jnp.pi)


# --------------------------------------------------------------------------
# Textures
# --------------------------------------------------------------------------

def texture_value(scene: T.Scene, tex_id: jnp.ndarray, u: jnp.ndarray,
                  v: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Texture color (N, 3) at (u, v, p) for per-ray texture ids."""
    tx = scene.textures
    kind = tx.kind[tex_id]
    out = tx.color[tex_id]  # TEX_SOLID (texture.go:25-27)

    # checkerboard by floor(p/scale) parity (texture.go:50-60). Go's int
    # truncation of an already-floored float is floor; (x+y+z)%2==0 in Go
    # classifies by sum parity, which jnp.mod(...,2)==0 reproduces.
    ints = jnp.floor(tx.inv_scale[tex_id][:, None] * p).astype(jnp.int32)
    is_even = jnp.mod(ints.sum(-1), 2) == 0
    checker = jnp.where(is_even[:, None], tx.even[tex_id], tx.odd[tex_id])
    out = jnp.where((kind == T.TEX_CHECKER)[:, None], checker, out)

    if scene.has_image:
        val = image_value(scene, tx.image_id[tex_id], u, v)
        out = jnp.where((kind == T.TEX_IMAGE)[:, None], val, out)

    if scene.has_noise:
        scale = tx.scale[tex_id]
        noise_id = tx.noise_id[tex_id]
        needs_noise = (kind == T.TEX_PERLIN) | (kind == T.TEX_MARBLE) | (kind == T.TEX_TURBULENT)
        needs_turb = (kind == T.TEX_MARBLE) | (kind == T.TEX_TURBULENT)
        nz = jnp.zeros(u.shape, dtype=p.dtype)
        tb = jnp.zeros(u.shape, dtype=p.dtype)
        for k in range(scene.perlin.count):
            sel = noise_id == k
            sd = scene.perlin.seed[k]
            nz_k = perlin_mod.noise(sd, p * scale[:, None])
            nz = jnp.where(sel & needs_noise, nz_k, nz)
            tb_k = perlin_mod.turbulence(sd, p)  # unscaled p (texture.go:117-119)
            tb = jnp.where(sel & needs_turb, tb_k, tb)
        gray = jnp.where(
            kind == T.TEX_PERLIN, 0.5 * (1.0 + nz),                # texture.go:115
            jnp.where(kind == T.TEX_MARBLE,
                      0.5 * (1.0 + jnp.sin(scale * p[:, 2] + 10.0 * tb)),  # :117
                      tb))                                          # :119
        out = jnp.where(needs_noise[:, None], gray[:, None] * jnp.ones((1, 3), p.dtype), out)

    return out


def image_value(scene: T.Scene, img_id: jnp.ndarray, u: jnp.ndarray,
                v: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor image texel (N, 3) (texture.go:70-86): truncated
    mod-repeat (Go math.Mod -> jnp.fmod), v flipped, PixelData clamp
    (imageLoader.go:49-62). Also the XLA-side patch for the Pallas
    megakernel's image-textured lanes (the one per-ray gather the kernel
    can't do)."""
    uu = jnp.abs(jnp.fmod(u, 1.0))
    vv = 1.0 - jnp.abs(jnp.fmod(v, 1.0))
    wh = scene.images.wh[img_id]
    w_img = wh[:, 0].astype(u.dtype)
    h_img = wh[:, 1].astype(u.dtype)
    i = (uu * (w_img - 1.0)).astype(jnp.int32)
    j = (vv * (h_img - 1.0)).astype(jnp.int32)
    i = jnp.clip(i, 0, wh[:, 0] - 1)
    j = jnp.clip(j, 0, wh[:, 1] - 1)
    return scene.images.data[img_id, j, i]


# --------------------------------------------------------------------------
# Light pdf evaluation: (1/K) sum of per-light pdfs (hittable.go:89-97)
# --------------------------------------------------------------------------

def _quad_light_pdf(scene, lt_pid, o, d):
    """(N, L) solid-angle pdf of quad lights (objects.go:152-160)."""
    qd = scene.quads
    pid = jnp.clip(lt_pid, 0, qd.count - 1)
    n = qd.normal[pid]      # (L, 3)
    dpl = qd.d_plane[pid]
    cvw, cwu = qd.cvw[pid], qd.cwu[pid]
    q = qd.q[pid]
    area = qd.area[pid]

    dn = d @ n.T
    on = o @ n.T
    # safe-where: masked parallel lanes must not emit inf/NaN cotangents
    dn_safe = jnp.where(jnp.abs(dn) >= ix.PARALLEL_EPS, dn, 1.0)
    t = (dpl[None, :] - on) / dn_safe
    alpha = (o @ cvw.T) + t * (d @ cvw.T) - vm.dot(q, cvw)[None, :]
    beta = (o @ cwu.T) + t * (d @ cwu.T) - vm.dot(q, cwu)[None, :]
    hit = ((jnp.abs(dn) >= ix.PARALLEL_EPS) & (t >= 1e-3)
           & (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1))
    dlen_sq = vm.length_squared(d, keepdims=True)
    dlen = jnp.sqrt(dlen_sq)
    # dist^2/(cos*area) with dist^2 = t^2|d|^2, cos = |d.n|/|d|
    pdf = t * t * dlen_sq * dlen / (jnp.abs(dn_safe) * area[None, :])
    return jnp.where(hit, pdf, 0.0)


def _sphere_light_pdf(scene, lt_pid, o, d):
    """(N, L) solid-angle pdf of sphere lights (objects.go:52-62).

    Note the reference computes sqrt(1 - r^2/dist^2) without guarding the
    origin-inside-sphere case; the NaN it produces flows to the film's
    NaN->0 guard. We preserve that behavior (no clamp)."""
    sp = scene.spheres
    pid = jnp.clip(lt_pid, 0, sp.count - 1)
    c0 = sp.center0[pid]   # PdfValue uses center at time 0 (objects.go:57)
    r = sp.radius[pid]
    r1, r2, ok = ix.sphere_roots(c0[None, :, :], r[None, :], o[:, None, :], d[:, None, :])
    sur = lambda t: (t > 1e-4) & jnp.isfinite(t)  # interval (.0001, inf), open
    root = jnp.where(sur(r1), r1, r2)
    hit = ok & sur(root)
    dist_sq = vm.length_squared(c0[None, :, :] - o[:, None, :])
    arg = 1.0 - (r * r)[None, :] / dist_sq
    # Double-where: the origin-inside-sphere NaN is injected as a
    # CONSTANT (forward bit-identical to the reference's unguarded
    # sqrt), while sqrt only ever sees positive arguments — otherwise
    # sqrt's backward at arg <= 0 poisons every gradient that flows
    # through a path that ever light-samples this sphere (found by the
    # round-4 GRAD.md run: book3's whole tex_color gradient went NaN).
    safe = jnp.sqrt(jnp.where(arg > 0, arg, 1.0))
    cos_theta_max = jnp.where(
        arg > 0, safe,
        jnp.where(arg == 0, 0.0, jnp.float32(jnp.nan)))  # NaN if inside
    solid_angle = 2.0 * jnp.pi * (1.0 - cos_theta_max)
    return jnp.where(hit, 1.0 / solid_angle, 0.0)


def _tri_light_pdf(scene, lt_pid, o, d):
    """(N, L) area pdf of triangle lights (objects.go:356-367)."""
    tr = scene.triangles
    pid = jnp.clip(lt_pid, 0, tr.count - 1)
    v0, e0, e1 = tr.v0[pid], tr.e0[pid], tr.e1[pid]
    n_face = tr.n_face[pid]
    area = tr.area[pid]
    ob = o[:, None, :]
    db = d[:, None, :]
    pvec = vm.cross(db, e1[None])
    det = vm.dot(e0[None], pvec)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    tvec = ob - v0[None]
    uu = vm.dot(tvec, pvec) * inv
    qvec = vm.cross(tvec, e0[None])
    vv = vm.dot(db, qvec) * inv
    t = vm.dot(e1[None], qvec) * inv
    hit = ((jnp.abs(det) >= ix.PARALLEL_EPS) & (uu >= 0) & (uu <= 1)
           & (vv >= 0) & (uu + vv <= 1) & (t >= 1e-3))
    dlen_sq = vm.length_squared(d, keepdims=True)
    dlen = jnp.sqrt(dlen_sq)
    dn = vm.dot(db, n_face[None])
    pdf = t * t * dlen_sq * dlen / (jnp.abs(dn) * area[None, :])
    return jnp.where(hit, pdf, 0.0)


def lights_pdf_value(scene: T.Scene, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Mean per-light pdf over the lights list (hittable.go:89-97), (N,)."""
    lt = scene.lights
    if lt.n == 0:
        return jnp.zeros(o.shape[0], dtype=o.dtype)
    kind = lt.kind[None, :]
    per_light = jnp.zeros((o.shape[0], lt.count), dtype=o.dtype)
    if scene.has_quad_lights:
        pdf_q = _quad_light_pdf(scene, lt.prim_id, o, d)
        per_light = jnp.where(kind == T.LIGHT_QUAD, pdf_q, per_light)
    if scene.has_sphere_lights:
        pdf_s = _sphere_light_pdf(scene, lt.prim_id, o, d)
        per_light = jnp.where(kind == T.LIGHT_SPHERE, pdf_s, per_light)
    if scene.has_tri_lights and scene.has_triangles:
        pdf_t = _tri_light_pdf(scene, lt.prim_id, o, d)
        per_light = jnp.where(kind == T.LIGHT_TRIANGLE, pdf_t, per_light)
    live = (jnp.arange(lt.count) < lt.n)[None, :]
    return jnp.sum(jnp.where(live, per_light, 0.0), axis=1) / lt.n


def lights_sample(scene: T.Scene, origin: jnp.ndarray, u_pick: jnp.ndarray,
                  u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Direction toward a uniformly chosen light (hittable.go:98-103), (N, 3)."""
    lt = scene.lights
    n = max(lt.n, 1)
    li = jnp.minimum((u_pick * n).astype(jnp.int32), n - 1)
    kind = lt.kind[li]
    pid = lt.prim_id[li]

    out = jnp.zeros_like(origin)
    if scene.has_quad_lights:
        # quad surface point (objects.go:161-165)
        qd = scene.quads
        qpid = jnp.clip(pid, 0, qd.count - 1)
        p_q = qd.q[qpid] + u1[:, None] * qd.u[qpid] + u2[:, None] * qd.v[qpid]
        out = jnp.where((kind == T.LIGHT_QUAD)[:, None], p_q - origin, out)

    if scene.has_sphere_lights:
        # sphere cone sample (objects.go:63-80)
        sp = scene.spheres
        spid = jnp.clip(pid, 0, sp.count - 1)
        to_c = sp.center0[spid] - origin
        dist_sq = vm.length_squared(to_c)
        basis = onb.build(to_c)
        local = rng.to_sphere(sp.radius[spid], dist_sq, u1, u2)
        dir_s = onb.transform(basis, local)
        out = jnp.where((kind == T.LIGHT_SPHERE)[:, None], dir_s, out)

    if scene.has_tri_lights and scene.has_triangles:
        # triangle barycentric sample (objects.go:369-385)
        tr = scene.triangles
        tpid = jnp.clip(pid, 0, tr.count - 1)
        r2 = u2 * (1.0 - u1)
        a = 1.0 - u1 - r2
        v0 = tr.v0[tpid]
        v1 = v0 + tr.e0[tpid]
        v2 = v0 + tr.e1[tpid]
        p_t = a[:, None] * v0 + u1[:, None] * v1 + r2[:, None] * v2
        out = jnp.where((kind == T.LIGHT_TRIANGLE)[:, None], p_t - origin, out)
    return out
