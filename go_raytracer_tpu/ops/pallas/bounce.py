"""Pallas TPU bounce megakernel.

The XLA wavefront bounce (integrator/wavefront.py:_bounce + ops/trace.py)
lowers to tens of small kernels per step; at wavefront batch sizes each is
microseconds of compute, so the loop is launch-bound. This kernel fuses the
entire bounce — closest-hit over the primitive tables, material shading,
mixture light sampling, and pdf evaluation — into ONE kernel per step.

Design notes (TPU-specific):

* Zero gathers: material/texture parameters are joined into primitive rows
  at pack time (`pack_scene`), and the intersection loop carries the
  winner's attributes under a mask instead of gathering by index after an
  argmin. Light rows are looped the same way. All loads use static row
  indices (loops are unrolled over the small primitive/light tables).
* Ray state is SoA planes of shape (N/128, 128) — native (sublane, lane)
  layout, no 3-wide minor dimension.
* Uniform variates are inputs (same threefry stream as the XLA path), so
  the kernel is bit-comparable with `_bounce` given the same key and is
  exercised in interpreter mode on CPU.

Supported scene surface (static flags checked by `supported()`): spheres
(incl. motion blur) + quads; lambertian / metal / dielectric /
diffuse-light materials; solid + checkerboard textures; quad + sphere
lights. Scenes with triangles, media, or noise/image textures fall back to
the XLA path.

Semantics follow the reference exactly as in the XLA path (camera.go:293-331,
materials.go, pdf.go, objects.go hit routines).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.scene import types as T

LANE = 128
INV_PI = 1.0 / math.pi
INV_4PI = 1.0 / (4.0 * math.pi)

# unified primitive row layout (spheres and quads share one table)
# common: 0 kind(0 sphere,1 quad), then geometry, then joined material
P_KIND = 0
# sphere: 1-3 c0, 4-6 cd, 7 r, 8 r^2
# quad:   1-3 normal, 4 D, 5-7 cvw, 8-10 cwu, 11 qcvw, 12 qcwu
# material (joined): 13 mat_kind, 14-16 albedo, 17 inv_scale,
#                    18-20 even, 21-23 odd, 24 tex_kind, 25 fuzz, 26 ref_idx
P_COLS = 27

# light row layout
# 0 kind(0 quad,1 sphere)
# quad: 1-3 q, 4-6 u, 7-9 v, 10-12 normal, 13 D, 14-16 cvw, 17-19 cwu,
#       20 qcvw, 21 qcwu, 22 area
# sphere: 1-3 c0, 4 r
L_COLS = 23

N_U = 9  # uniforms per ray per bounce (wavefront.py slot order)


def supported(scene: T.Scene, max_prims: int = 64, max_lights: int = 8) -> bool:
    if scene.has_triangles or scene.has_media or scene.has_noise or scene.has_image:
        return False
    if scene.has_tri_lights:
        return False
    n_prims = (scene.spheres.count if scene.has_spheres else 0) + \
        (scene.quads.count if scene.has_quads else 0)
    return 0 < n_prims <= max_prims and 0 < scene.lights.n <= max_lights


def pack_scene(scene: T.Scene):
    """Join primitives with their material/texture parameters into a dense
    (P, P_COLS) row table, and lights into (L, L_COLS). Pure jnp — traced
    once inside jit."""
    mats = scene.materials
    tex = scene.textures

    def mat_cols(mat_id):
        tex_id = mats.tex_id[mat_id]
        return [
            mats.kind[mat_id].astype(jnp.float32),
            tex.color[tex_id][:, 0], tex.color[tex_id][:, 1], tex.color[tex_id][:, 2],
            tex.inv_scale[tex_id],
            tex.even[tex_id][:, 0], tex.even[tex_id][:, 1], tex.even[tex_id][:, 2],
            tex.odd[tex_id][:, 0], tex.odd[tex_id][:, 1], tex.odd[tex_id][:, 2],
            tex.kind[tex_id].astype(jnp.float32),
            mats.fuzz[mat_id],
            mats.ref_idx[mat_id],
        ]

    rows = []
    if scene.has_spheres:
        sp = scene.spheres
        cols = ([jnp.zeros_like(sp.radius)]
                + [sp.center0[:, i] for i in range(3)]
                + [sp.center_delta[:, i] for i in range(3)]
                + [sp.radius, sp.radius * sp.radius]
                + [jnp.zeros_like(sp.radius)] * 4  # pad to col 13
                + mat_cols(sp.mat_id))
        rows.append(jnp.where(sp.active[:, None],
                              jnp.stack(cols, axis=1),
                              jnp.full((sp.count, P_COLS), -1.0)))
    if scene.has_quads:
        qd = scene.quads
        qcvw = jnp.sum(qd.q * qd.cvw, axis=-1)
        qcwu = jnp.sum(qd.q * qd.cwu, axis=-1)
        cols = ([jnp.ones_like(qd.area)]
                + [qd.normal[:, i] for i in range(3)]
                + [qd.d_plane]
                + [qd.cvw[:, i] for i in range(3)]
                + [qd.cwu[:, i] for i in range(3)]
                + [qcvw, qcwu]
                + mat_cols(qd.mat_id))
        rows.append(jnp.where(qd.active[:, None],
                              jnp.stack(cols, axis=1),
                              jnp.full((qd.count, P_COLS), -1.0)))
    prims = jnp.concatenate(rows, axis=0).astype(jnp.float32)

    lt = scene.lights
    lrows = []
    for li in range(lt.count):
        kind = lt.kind[li]
        pid = lt.prim_id[li]
        if scene.has_quads:
            qpid = jnp.clip(pid, 0, scene.quads.count - 1)
            qd = scene.quads
            qrow = jnp.concatenate([
                jnp.zeros((1,)),
                qd.q[qpid], qd.u[qpid], qd.v[qpid], qd.normal[qpid],
                qd.d_plane[qpid][None], qd.cvw[qpid], qd.cwu[qpid],
                jnp.sum(qd.q[qpid] * qd.cvw[qpid])[None],
                jnp.sum(qd.q[qpid] * qd.cwu[qpid])[None],
                qd.area[qpid][None],
            ])
        else:
            qrow = jnp.zeros((L_COLS,))
        if scene.has_spheres:
            spid = jnp.clip(pid, 0, scene.spheres.count - 1)
            sp = scene.spheres
            srow = jnp.concatenate([
                jnp.ones((1,)), sp.center0[spid], sp.radius[spid][None],
                jnp.zeros((L_COLS - 5,)),
            ])
        else:
            srow = jnp.zeros((L_COLS,))
        lrows.append(jnp.where(kind == T.LIGHT_QUAD, qrow, srow))
    lights = jnp.stack(lrows).astype(jnp.float32)
    return prims, lights


# ---------------------------------------------------------------------------
# kernel helpers (operate on (R, 128) tiles)
# ---------------------------------------------------------------------------

def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z + 1e-38)
    return x * inv, y * inv, z * inv


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _onb_transform(nx, ny, nz, lx, ly, lz):
    """Build the reference ONB about n (onb.go:13-25) and transform the
    local vector (lx,ly,lz) into it."""
    wx, wy, wz = _normalize3(nx, ny, nz)
    use_y = jnp.abs(nx) > 0.9
    ax = jnp.where(use_y, 0.0, 1.0)
    ay = jnp.where(use_y, 1.0, 0.0)
    # v = unit(n x a); u = unit(n x v)
    vx = ny * 0.0 - nz * ay
    vy = nz * ax - nx * 0.0
    vz = nx * ay - ny * ax
    vx, vy, vz = _normalize3(vx, vy, vz)
    ux = ny * vz - nz * vy
    uy = nz * vx - nx * vz
    uz = nx * vy - ny * vx
    ux, uy, uz = _normalize3(ux, uy, uz)
    return (lx * ux + ly * vx + lz * wx,
            lx * uy + ly * vy + lz * wy,
            lx * uz + ly * vz + lz * wz)


def _bounce_core(n_prims, n_lights, n_lights_live, has_metal, has_dielectric,
                 prim_ref, light_ref, bg,
                 ox, oy, oz, dx, dy, dz, tm, alive, u):
    """Shared bounce body over (R, 128) value planes: closest hit, shading,
    mixture sampling — the whole of camera.go:293-331's per-level work.
    `u` is a list of N_U uniform planes (threefry-fed in `bounce`,
    in-kernel PRNG in `bounce_fused`). Returns value planes."""
    f32 = jnp.float32
    INF = jnp.asarray(jnp.inf, f32)

    a_quad = _dot3(dx, dy, dz, dx, dy, dz)  # |d|^2

    # ---- closest hit: unrolled loop over joined primitive rows ----------
    t_best = jnp.full(ox.shape, INF, f32)
    n_hx = jnp.zeros_like(ox)
    n_hy = jnp.zeros_like(ox)
    n_hz = jnp.zeros_like(ox)
    # Mosaic cannot select between i1 vectors (i8->i1 trunc); carry the
    # front-face flag as f32 and compare at the end.
    front_f = jnp.zeros_like(ox)
    # carried winner material params
    m_kind = jnp.zeros_like(ox)
    alb_r = jnp.zeros_like(ox)
    alb_g = jnp.zeros_like(ox)
    alb_b = jnp.zeros_like(ox)
    m_invs = jnp.zeros_like(ox)
    m_ev_r = jnp.zeros_like(ox); m_ev_g = jnp.zeros_like(ox); m_ev_b = jnp.zeros_like(ox)
    m_od_r = jnp.zeros_like(ox); m_od_g = jnp.zeros_like(ox); m_od_b = jnp.zeros_like(ox)
    m_texk = jnp.zeros_like(ox)
    m_fuzz = jnp.zeros_like(ox)
    m_ridx = jnp.zeros_like(ox)

    t_min = 1e-3

    for p in range(n_prims):
        kind = prim_ref[p, P_KIND]
        is_sphere = kind < 0.5
        valid_row = kind >= 0.0

        # sphere candidate (objects.go:83-115)
        cx = prim_ref[p, 1] + tm * prim_ref[p, 4] - ox
        cy = prim_ref[p, 2] + tm * prim_ref[p, 5] - oy
        cz = prim_ref[p, 3] + tm * prim_ref[p, 6] - oz
        h = _dot3(dx, dy, dz, cx, cy, cz)
        c = _dot3(cx, cy, cz, cx, cy, cz) - prim_ref[p, 8]
        disc = h * h - a_quad * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = (h - sq) / a_quad
        r2 = (h + sq) / a_quad
        sur1 = (t_min < r1) & (r1 < t_best)
        root = jnp.where(sur1, r1, r2)
        ok_s = (disc >= 0.0) & (t_min < root) & (root < t_best)
        t_s = root

        # quad candidate (objects.go:167-206)
        dn = _dot3(dx, dy, dz, prim_ref[p, 1], prim_ref[p, 2], prim_ref[p, 3])
        on = _dot3(ox, oy, oz, prim_ref[p, 1], prim_ref[p, 2], prim_ref[p, 3])
        t_q = (prim_ref[p, 4] - on) / dn
        px = ox + t_q * dx
        py = oy + t_q * dy
        pz = oz + t_q * dz
        alpha = _dot3(px, py, pz, prim_ref[p, 5], prim_ref[p, 6], prim_ref[p, 7]) - prim_ref[p, 11]
        beta = _dot3(px, py, pz, prim_ref[p, 8], prim_ref[p, 9], prim_ref[p, 10]) - prim_ref[p, 12]
        ok_q = ((jnp.abs(dn) >= 1e-8) & (t_min <= t_q) & (t_q <= t_best)
                & (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0))

        t_c = jnp.where(is_sphere, t_s, t_q)
        # no bool-valued selects (Mosaic can't select i1): use logic ops
        ok_sel = (is_sphere & ok_s) | (jnp.logical_not(is_sphere) & ok_q)
        ok = valid_row & ok_sel & (t_c < t_best)

        # candidate normal + front face (hittable.go:27-34)
        s_nx = (ox + t_c * dx - (prim_ref[p, 1] + tm * prim_ref[p, 4])) / prim_ref[p, 7]
        s_ny = (oy + t_c * dy - (prim_ref[p, 2] + tm * prim_ref[p, 5])) / prim_ref[p, 7]
        s_nz = (oz + t_c * dz - (prim_ref[p, 3] + tm * prim_ref[p, 6])) / prim_ref[p, 7]
        c_nx = jnp.where(is_sphere, s_nx, prim_ref[p, 1])
        c_ny = jnp.where(is_sphere, s_ny, prim_ref[p, 2])
        c_nz = jnp.where(is_sphere, s_nz, prim_ref[p, 3])
        c_front = _dot3(dx, dy, dz, c_nx, c_ny, c_nz) < 0.0
        c_nx = jnp.where(c_front, c_nx, -c_nx)
        c_ny = jnp.where(c_front, c_ny, -c_ny)
        c_nz = jnp.where(c_front, c_nz, -c_nz)

        t_best = jnp.where(ok, t_c, t_best)
        n_hx = jnp.where(ok, c_nx, n_hx)
        n_hy = jnp.where(ok, c_ny, n_hy)
        n_hz = jnp.where(ok, c_nz, n_hz)
        front_f = jnp.where(ok, jnp.where(c_front, 1.0, 0.0), front_f)
        m_kind = jnp.where(ok, prim_ref[p, 13], m_kind)
        alb_r = jnp.where(ok, prim_ref[p, 14], alb_r)
        alb_g = jnp.where(ok, prim_ref[p, 15], alb_g)
        alb_b = jnp.where(ok, prim_ref[p, 16], alb_b)
        m_invs = jnp.where(ok, prim_ref[p, 17], m_invs)
        m_ev_r = jnp.where(ok, prim_ref[p, 18], m_ev_r)
        m_ev_g = jnp.where(ok, prim_ref[p, 19], m_ev_g)
        m_ev_b = jnp.where(ok, prim_ref[p, 20], m_ev_b)
        m_od_r = jnp.where(ok, prim_ref[p, 21], m_od_r)
        m_od_g = jnp.where(ok, prim_ref[p, 22], m_od_g)
        m_od_b = jnp.where(ok, prim_ref[p, 23], m_od_b)
        m_texk = jnp.where(ok, prim_ref[p, 24], m_texk)
        m_fuzz = jnp.where(ok, prim_ref[p, 25], m_fuzz)
        m_ridx = jnp.where(ok, prim_ref[p, 26], m_ridx)

    front = front_f > 0.5
    hit = jnp.isfinite(t_best)
    t_safe = jnp.where(hit, t_best, 1.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz

    # ---- texture value (solid / checker, texture.go:25-60) --------------
    is_checker = m_texk == float(T.TEX_CHECKER)
    fx = jnp.floor(m_invs * hx).astype(jnp.int32)
    fy = jnp.floor(m_invs * hy).astype(jnp.int32)
    fz = jnp.floor(m_invs * hz).astype(jnp.int32)
    even = jnp.remainder(fx + fy + fz, 2) == 0
    tex_r = jnp.where(is_checker, jnp.where(even, m_ev_r, m_od_r), alb_r)
    tex_g = jnp.where(is_checker, jnp.where(even, m_ev_g, m_od_g), alb_g)
    tex_b = jnp.where(is_checker, jnp.where(even, m_ev_b, m_od_b), alb_b)

    miss = alive & ~hit
    lit = alive & hit
    is_light = lit & (m_kind == float(T.MAT_DIFFUSE_LIGHT))
    is_metal = lit & (m_kind == float(T.MAT_METAL))
    is_diel = lit & (m_kind == float(T.MAT_DIELECTRIC))
    diffuse = lit & (m_kind == float(T.MAT_LAMBERTIAN))

    # emission (materials.go:150-155) + background on miss
    e_on = is_light & front
    er = jnp.where(miss, bg[0], jnp.where(e_on, tex_r, 0.0))
    eg = jnp.where(miss, bg[1], jnp.where(e_on, tex_g, 0.0))
    eb = jnp.where(miss, bg[2], jnp.where(e_on, tex_b, 0.0))

    # ---- diffuse mixture sampling (pdf.go:58-74) ------------------------
    # light pick + per-kind sample (hittable.go:98-103, objects.go:63-80,161-165)
    li = jnp.minimum((u[4] * n_lights_live).astype(jnp.int32), n_lights_live - 1)
    ldx = jnp.zeros_like(ox)
    ldy = jnp.zeros_like(ox)
    ldz = jnp.zeros_like(ox)
    for l in range(n_lights):
        sel = li == l
        lk = light_ref[l, 0]
        is_q = lk < 0.5
        # quad sample
        qx = light_ref[l, 1] + u[5] * light_ref[l, 4] + u[6] * light_ref[l, 7] - hx
        qy = light_ref[l, 2] + u[5] * light_ref[l, 5] + u[6] * light_ref[l, 8] - hy
        qz = light_ref[l, 3] + u[5] * light_ref[l, 6] + u[6] * light_ref[l, 9] - hz
        # sphere cone sample
        tcx = light_ref[l, 1] - hx
        tcy = light_ref[l, 2] - hy
        tcz = light_ref[l, 3] - hz
        dist_sq = _dot3(tcx, tcy, tcz, tcx, tcy, tcz)
        # clamped like core/rng.py to_sphere (the pdf below stays unclamped
        # for the reference's NaN-from-inside parity)
        ctm = jnp.sqrt(jnp.maximum(0.0, 1.0 - light_ref[l, 4] * light_ref[l, 4] / dist_sq))
        zz = 1.0 + u[6] * (ctm - 1.0)
        phi = 2.0 * math.pi * u[5]
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
        sx, sy, sz = _onb_transform(tcx, tcy, tcz,
                                    jnp.cos(phi) * st, jnp.sin(phi) * st, zz)
        cand_x = jnp.where(is_q, qx, sx)
        cand_y = jnp.where(is_q, qy, sy)
        cand_z = jnp.where(is_q, qz, sz)
        ldx = jnp.where(sel, cand_x, ldx)
        ldy = jnp.where(sel, cand_y, ldy)
        ldz = jnp.where(sel, cand_z, ldz)

    # cosine sample about the shading normal (pdf.go:38-40)
    phi_m = 2.0 * math.pi * u[7]
    sq_m = jnp.sqrt(u[8])
    cz_m = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[8]))
    mdx, mdy, mdz = _onb_transform(n_hx, n_hy, n_hz,
                                   jnp.cos(phi_m) * sq_m, jnp.sin(phi_m) * sq_m,
                                   cz_m)

    use_light = u[3] < 0.5
    gdx = jnp.where(use_light, ldx, mdx)
    gdy = jnp.where(use_light, ldy, mdy)
    gdz = jnp.where(use_light, ldz, mdz)

    # mixture pdf value: mean of per-light pdfs (hittable.go:89-97)
    g_len_sq = _dot3(gdx, gdy, gdz, gdx, gdy, gdz)
    g_len = jnp.sqrt(g_len_sq)
    l_pdf = jnp.zeros_like(ox)
    for l in range(n_lights):
        lk = light_ref[l, 0]
        is_q = lk < 0.5
        # quad pdf (objects.go:152-160)
        dnl = _dot3(gdx, gdy, gdz, light_ref[l, 10], light_ref[l, 11], light_ref[l, 12])
        onl = _dot3(hx, hy, hz, light_ref[l, 10], light_ref[l, 11], light_ref[l, 12])
        t_l = (light_ref[l, 13] - onl) / dnl
        lpx = hx + t_l * gdx
        lpy = hy + t_l * gdy
        lpz = hz + t_l * gdz
        al = _dot3(lpx, lpy, lpz, light_ref[l, 14], light_ref[l, 15], light_ref[l, 16]) - light_ref[l, 20]
        be = _dot3(lpx, lpy, lpz, light_ref[l, 17], light_ref[l, 18], light_ref[l, 19]) - light_ref[l, 21]
        hit_q = ((jnp.abs(dnl) >= 1e-8) & (t_l >= 1e-3)
                 & (al >= 0.0) & (al <= 1.0) & (be >= 0.0) & (be <= 1.0))
        pdf_q = t_l * t_l * g_len_sq * g_len / (jnp.abs(dnl) * light_ref[l, 22])
        pdf_q = jnp.where(hit_q, pdf_q, 0.0)
        # sphere pdf (objects.go:52-62); NaN-from-inside preserved
        ocx = light_ref[l, 1] - hx
        ocy = light_ref[l, 2] - hy
        ocz = light_ref[l, 3] - hz
        hh = _dot3(gdx, gdy, gdz, ocx, ocy, ocz)
        cc = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - light_ref[l, 4] * light_ref[l, 4]
        disc_l = hh * hh - g_len_sq * cc
        sql = jnp.sqrt(jnp.maximum(disc_l, 0.0))
        r1l = (hh - sql) / g_len_sq
        r2l = (hh + sql) / g_len_sq
        rootl = jnp.where(r1l > 1e-4, r1l, r2l)
        hit_s = (disc_l >= 0.0) & (rootl > 1e-4)
        dsq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz)
        ctm2 = jnp.sqrt(1.0 - light_ref[l, 4] * light_ref[l, 4] / dsq)
        pdf_s = 1.0 / (2.0 * math.pi * (1.0 - ctm2))
        pdf_s = jnp.where(hit_s, pdf_s, 0.0)
        live = 1.0 if l < n_lights_live else 0.0
        l_pdf = l_pdf + live * jnp.where(is_q, pdf_q, pdf_s)
    l_pdf = l_pdf / float(n_lights_live)

    ugx, ugy, ugz = _normalize3(gdx, gdy, gdz)
    cos_t = _dot3(ugx, ugy, ugz, n_hx, n_hy, n_hz)
    cosine_pdf = jnp.maximum(0.0, cos_t) * INV_PI
    pdf_value = 0.5 * l_pdf + 0.5 * cosine_pdf
    ratio = jnp.where(diffuse, cosine_pdf, 0.0) / jnp.where(diffuse, pdf_value, 1.0)
    wr = jnp.where(diffuse, tex_r * ratio, 0.0)
    wg = jnp.where(diffuse, tex_g * ratio, 0.0)
    wb = jnp.where(diffuse, tex_b * ratio, 0.0)
    ndx = gdx
    ndy = gdy
    ndz = gdz

    if has_metal:
        # metal (materials.go:70-79)
        dn_m = _dot3(dx, dy, dz, n_hx, n_hy, n_hz)
        rx = dx - 2.0 * dn_m * n_hx
        ry = dy - 2.0 * dn_m * n_hy
        rz = dz - 2.0 * dn_m * n_hz
        rx, ry, rz = _normalize3(rx, ry, rz)
        # fuzz sphere (uniform on S^2, core/rng.py unit_vector)
        zf = 1.0 - 2.0 * u[0]
        rf = jnp.sqrt(jnp.maximum(0.0, 1.0 - zf * zf))
        phif = 2.0 * math.pi * u[1]
        rx = rx + m_fuzz * rf * jnp.cos(phif)
        ry = ry + m_fuzz * rf * jnp.sin(phif)
        rz = rz + m_fuzz * zf
        wr = jnp.where(is_metal, tex_r, wr)
        wg = jnp.where(is_metal, tex_g, wg)
        wb = jnp.where(is_metal, tex_b, wb)
        ndx = jnp.where(is_metal, rx, ndx)
        ndy = jnp.where(is_metal, ry, ndy)
        ndz = jnp.where(is_metal, rz, ndz)

    if has_dielectric:
        # dielectric (materials.go:94-130)
        udx, udy, udz = _normalize3(dx, dy, dz)
        ri = jnp.where(front, 1.0 / m_ridx, m_ridx)
        cos_d = jnp.minimum(-_dot3(udx, udy, udz, n_hx, n_hy, n_hz), 1.0)
        sin_d = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_d * cos_d))
        r0 = ((1.0 - m_ridx) / (1.0 + m_ridx)) ** 2
        schlick = r0 + (1.0 - r0) * (1.0 - cos_d) ** 5
        do_reflect = (ri * sin_d > 1.0) | (schlick > u[2])
        # reflect
        dn_d = _dot3(udx, udy, udz, n_hx, n_hy, n_hz)
        rfx = udx - 2.0 * dn_d * n_hx
        rfy = udy - 2.0 * dn_d * n_hy
        rfz = udz - 2.0 * dn_d * n_hz
        # refract (vec.go:141-146)
        ppx = ri * (udx + cos_d * n_hx)
        ppy = ri * (udy + cos_d * n_hy)
        ppz = ri * (udz + cos_d * n_hz)
        par = -jnp.sqrt(jnp.abs(1.0 - _dot3(ppx, ppy, ppz, ppx, ppy, ppz)))
        tx = ppx + par * n_hx
        ty = ppy + par * n_hy
        tz = ppz + par * n_hz
        ddx = jnp.where(do_reflect, rfx, tx)
        ddy = jnp.where(do_reflect, rfy, ty)
        ddz = jnp.where(do_reflect, rfz, tz)
        wr = jnp.where(is_diel, 1.0, wr)
        wg = jnp.where(is_diel, 1.0, wg)
        wb = jnp.where(is_diel, 1.0, wb)
        ndx = jnp.where(is_diel, ddx, ndx)
        ndy = jnp.where(is_diel, ddy, ndy)
        ndz = jnp.where(is_diel, ddz, ndz)

    dead = ~alive
    zero = jnp.zeros_like(ox)
    er = jnp.where(dead, zero, er)
    eg = jnp.where(dead, zero, eg)
    eb = jnp.where(dead, zero, eb)
    wr = jnp.where(dead, zero, wr)
    wg = jnp.where(dead, zero, wg)
    wb = jnp.where(dead, zero, wb)
    cf = diffuse & alive
    nox = jnp.where(lit, hx, ox)
    noy = jnp.where(lit, hy, oy)
    noz = jnp.where(lit, hz, oz)
    alive_out = is_metal | is_diel | diffuse
    return (er, eg, eb, wr, wg, wb, cf, nox, noy, noz, ndx, ndy, ndz,
            alive_out)


def _bounce_kernel(n_prims, n_lights, n_lights_live, has_metal,
                   has_dielectric,
                   prim_ref, light_ref, bg_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   time_ref, alive_ref,
                   u0_ref, u1_ref, u2_ref, u3_ref, u4_ref, u5_ref,
                   u6_ref, u7_ref, u8_ref,
                   # outputs
                   er_ref, eg_ref, eb_ref, wr_ref, wg_ref, wb_ref,
                   cf_ref, nox_ref, noy_ref, noz_ref,
                   ndx_ref, ndy_ref, ndz_ref, alive_out_ref):
    bg = (bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2])
    u = [r[:] for r in (u0_ref, u1_ref, u2_ref, u3_ref, u4_ref, u5_ref,
                        u6_ref, u7_ref, u8_ref)]
    (er, eg, eb, wr, wg, wb, cf, nox, noy, noz, ndx, ndy, ndz, alive_out) = \
        _bounce_core(n_prims, n_lights, n_lights_live, has_metal,
                     has_dielectric, prim_ref, light_ref, bg,
                     ox_ref[:], oy_ref[:], oz_ref[:],
                     dx_ref[:], dy_ref[:], dz_ref[:],
                     time_ref[:], alive_ref[:] > 0, u)
    er_ref[:] = er
    eg_ref[:] = eg
    eb_ref[:] = eb
    wr_ref[:] = wr
    wg_ref[:] = wg
    wb_ref[:] = wb
    cf_ref[:] = cf.astype(jnp.int32)
    nox_ref[:] = nox
    noy_ref[:] = noy
    noz_ref[:] = noz
    ndx_ref[:] = ndx
    ndy_ref[:] = ndy
    ndz_ref[:] = ndz
    alive_out_ref[:] = alive_out.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_prims", "n_lights",
                                             "n_lights_live", "has_metal",
                                             "has_dielectric", "interpret"))
def bounce(prims, lights, o, d, time, alive, u, bg, n_prims, n_lights,
           n_lights_live, has_metal, has_dielectric, interpret=False):
    """One fused bounce for the whole ray bundle.

    o, d: (N, 3); time, alive: (N,); u: (N, N_U) uniforms; prims (P, P_COLS),
    lights (L, L_COLS); bg (3,). Returns E (N,3), W (N,3), cf (N,), new_o,
    new_d (N,3), alive' (N,).
    """
    n_orig = o.shape[0]
    # Tile the ray axis: Mosaic compile time scales with the block's
    # instruction count, so fixed (TILE_ROWS, 128) blocks + a grid keep the
    # program small for any N. Pad N to a whole number of tiles.
    TILE_ROWS = 32
    tile = TILE_ROWS * LANE
    n = ((n_orig + tile - 1) // tile) * tile
    pad = n - n_orig
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        time = jnp.concatenate([time, jnp.zeros((pad,), time.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros((pad,), alive.dtype)])
        u = jnp.concatenate([u, jnp.full((pad, u.shape[1]), 0.5, u.dtype)])
    rows = n // LANE
    shape = (rows, LANE)
    plane = lambda x: x.reshape(rows, LANE)
    planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
              plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
              plane(time), plane(alive.astype(jnp.int32))]
    u_planes = [plane(u[:, i]) for i in range(N_U)]

    kernel = functools.partial(_bounce_kernel, n_prims, n_lights,
                               n_lights_live, has_metal, has_dielectric)

    grid = (rows // TILE_ROWS,)
    row_spec_f = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    in_specs = ([table_spec(prims), table_spec(lights),
                 pl.BlockSpec((1, 3), lambda i: (0, 0))]
                + [row_spec_f] * (8 + N_U))
    out_specs = [row_spec_f] * 14
    out_shapes = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 6 + \
        [jax.ShapeDtypeStruct(shape, jnp.int32)] + \
        [jax.ShapeDtypeStruct(shape, jnp.float32)] * 6 + \
        [jax.ShapeDtypeStruct(shape, jnp.int32)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(prims, lights, bg.reshape(1, 3).astype(jnp.float32),
      *planes, *u_planes)

    (er, eg, eb, wr, wg, wb, cf, nox, noy, noz, ndx, ndy, ndz, alive2) = outs
    unp = lambda x: x.reshape(n)[:n_orig]
    E = jnp.stack([unp(er), unp(eg), unp(eb)], axis=-1)
    W = jnp.stack([unp(wr), unp(wg), unp(wb)], axis=-1)
    new_o = jnp.stack([unp(nox), unp(noy), unp(noz)], axis=-1)
    new_d = jnp.stack([unp(ndx), unp(ndy), unp(ndz)], axis=-1)
    return E, W, unp(cf) > 0, new_o, new_d, unp(alive2) > 0


# ---------------------------------------------------------------------------
# Fused regeneration step: in-kernel PRNG + camera ray-gen + bounce + depth
# cap in ONE kernel — the per-step XLA glue (threefry streams, ray-gen
# fusions, select chains) around the round-1 kernel was ~60% of forward
# time (docs/PERFORMANCE.md "final-trace breakdown").
# ---------------------------------------------------------------------------

# raygen consumes 5 uniforms (jitter x/y, defocus a/b, time; camera.go:256-268)
N_U_RAYGEN = 5


def _mix32(x):
    """lowbias32 finalizer (public-domain integer hash, Wellons): full
    avalanche on 32 bits with fixed shifts only — identical semantics in
    Mosaic and interpret mode (pltpu.prng_* has no CPU lowering)."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> np.uint32(15))
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> np.uint32(16))
    return x


def _u01(lane_u32, seed_u32, slot: int):
    """Counter-based U[0,1): hash(lane, step seed, slot) -> 23-bit mantissa
    via the exponent trick (bits -> [1,2) -> subtract 1). A pure function,
    so renders are reproducible across backends and restarts."""
    x = lane_u32 ^ (seed_u32 * np.uint32(0x9E3779B9)) \
        ^ np.uint32((slot * 0x632BE5AB) & 0xFFFFFFFF)
    bits = _mix32(x)
    f = jax.lax.bitcast_convert_type(
        (bits >> np.uint32(9)) | np.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _fused_kernel(n_prims, n_lights, n_lights_live, has_metal,
                  has_dielectric, has_defocus, max_depth,
                  prim_ref, light_ref, cam_ref, bg_ref, seed_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  time_ref, alive_ref, depth_ref,
                  take_ref, pi_ref, pj_ref, si_ref, sj_ref,
                  # outputs
                  er_ref, eg_ref, eb_ref, wr_ref, wg_ref, wb_ref, cf_ref,
                  nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
                  ntm_ref, alive_out_ref, depth_out_ref):
    # distinct stream per (step seed, global lane)
    shape = ox_ref.shape
    lane = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * np.uint32(LANE)
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            + pl.program_id(0).astype(jnp.uint32)
            * np.uint32(shape[0] * LANE))
    seed = seed_ref[0].astype(jnp.uint32)
    u01 = lambda slot: _u01(lane, seed, slot)
    take = take_ref[:] > 0

    # ---- camera ray generation for refilled lanes (camera.go:256-270) ----
    cam = cam_ref  # (1, 20): pixel00 du dv center dfu dfv recip_sqrt
    u_jx = u01(0)
    u_jy = u01(1)
    recip = cam[0, 18]
    off_x = (si_ref[:] + u_jx) * recip - 0.5
    off_y = (sj_ref[:] + u_jy) * recip - 0.5
    px = pi_ref[:] + off_x
    py = pj_ref[:] + off_y
    sx = cam[0, 0] + px * cam[0, 3] + py * cam[0, 6]
    sy = cam[0, 1] + px * cam[0, 4] + py * cam[0, 7]
    sz = cam[0, 2] + px * cam[0, 5] + py * cam[0, 8]
    if has_defocus:
        u_da = u01(2)
        u_db = u01(3)
        r_d = jnp.sqrt(u_da)
        phi_d = (2.0 * math.pi) * u_db
        da = r_d * jnp.cos(phi_d)
        db = r_d * jnp.sin(phi_d)
        cx = cam[0, 9] + da * cam[0, 12] + db * cam[0, 15]
        cy = cam[0, 10] + da * cam[0, 13] + db * cam[0, 16]
        cz = cam[0, 11] + da * cam[0, 14] + db * cam[0, 17]
    else:
        cx = cam[0, 9] + jnp.zeros_like(sx)
        cy = cam[0, 10] + jnp.zeros_like(sx)
        cz = cam[0, 11] + jnp.zeros_like(sx)
    u_t = u01(4)

    ox = jnp.where(take, cx, ox_ref[:])
    oy = jnp.where(take, cy, oy_ref[:])
    oz = jnp.where(take, cz, oz_ref[:])
    dx = jnp.where(take, sx - cx, dx_ref[:])
    dy = jnp.where(take, sy - cy, dy_ref[:])
    dz = jnp.where(take, sz - cz, dz_ref[:])
    tm = jnp.where(take, u_t, time_ref[:])
    alive = (alive_ref[:] > 0) | take
    depth = jnp.where(take, 0, depth_ref[:])

    u = [u01(N_U_RAYGEN + k) for k in range(N_U)]
    bg = (bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2])
    (er, eg, eb, wr, wg, wb, cf, nox, noy, noz, ndx, ndy, ndz, alive_out) = \
        _bounce_core(n_prims, n_lights, n_lights_live, has_metal,
                     has_dielectric, prim_ref, light_ref, bg,
                     ox, oy, oz, dx, dy, dz, tm, alive, u)

    # depth cap (camera.go:293-296): level depth+1 was just recorded; a path
    # gets exactly max_depth+1 levels
    alive_out = alive_out & (depth < max_depth)
    depth = jnp.where(alive, depth + 1, depth)

    er_ref[:] = er
    eg_ref[:] = eg
    eb_ref[:] = eb
    wr_ref[:] = wr
    wg_ref[:] = wg
    wb_ref[:] = wb
    cf_ref[:] = cf.astype(jnp.int32)
    nox_ref[:] = nox
    noy_ref[:] = noy
    noz_ref[:] = noz
    ndx_ref[:] = ndx
    ndy_ref[:] = ndy
    ndz_ref[:] = ndz
    ntm_ref[:] = tm
    alive_out_ref[:] = alive_out.astype(jnp.int32)
    depth_out_ref[:] = depth


def pack_camera(arrays) -> jnp.ndarray:
    """Flatten CameraArrays to the fused kernel's (1, 20) row."""
    return jnp.concatenate([
        arrays.pixel00, arrays.du, arrays.dv, arrays.center,
        arrays.defocus_u, arrays.defocus_v,
        jnp.asarray([arrays.recip_spp_sqrt, 0.0], jnp.float32),
    ]).astype(jnp.float32).reshape(1, 20)


@functools.partial(jax.jit, static_argnames=(
    "n_prims", "n_lights", "n_lights_live", "has_metal", "has_dielectric",
    "has_defocus", "max_depth", "interpret"))
def bounce_fused(prims, lights, cam_row, bg, seed,
                 o, d, time, alive_i32, depth, take_i32, pi, pj, si, sj,
                 *, n_prims, n_lights, n_lights_live, has_metal,
                 has_dielectric, has_defocus, max_depth, interpret=False):
    """One fused regeneration step. All lane arrays are (N,) / (N,3) with
    N a multiple of TILE_ROWS*128 (the regen pool is sized accordingly).

    Returns (E, W, cf, new_o, new_d, new_time, alive', depth')."""
    n = o.shape[0]
    TILE_ROWS = 32
    assert n % (TILE_ROWS * LANE) == 0, n
    rows = n // LANE
    shape = (rows, LANE)
    plane = lambda x: x.reshape(rows, LANE)
    state_planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
                    plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
                    plane(time), plane(alive_i32), plane(depth)]
    refill_planes = [plane(take_i32), plane(pi), plane(pj),
                     plane(si), plane(sj)]

    kernel = functools.partial(_fused_kernel, n_prims, n_lights,
                               n_lights_live, has_metal, has_dielectric,
                               has_defocus, max_depth)

    grid = (rows // TILE_ROWS,)
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    in_specs = ([table_spec(prims), table_spec(lights),
                 pl.BlockSpec((1, 20), lambda i: (0, 0)),
                 pl.BlockSpec((1, 3), lambda i: (0, 0)),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [row_spec] * (9 + 5))
    f32 = jnp.float32
    out_dtypes = [f32] * 6 + [jnp.int32] + [f32] * 7 + [jnp.int32] * 2
    out_specs = [row_spec] * 16
    out_shapes = [jax.ShapeDtypeStruct(shape, dt) for dt in out_dtypes]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(prims, lights, cam_row, bg.reshape(1, 3).astype(f32),
      seed.reshape(1).astype(jnp.int32), *state_planes, *refill_planes)

    (er, eg, eb, wr, wg, wb, cf, nox, noy, noz, ndx, ndy, ndz, ntm,
     alive2, depth2) = outs
    unp = lambda x: x.reshape(n)
    E = jnp.stack([unp(er), unp(eg), unp(eb)], axis=-1)
    W = jnp.stack([unp(wr), unp(wg), unp(wb)], axis=-1)
    new_o = jnp.stack([unp(nox), unp(noy), unp(noz)], axis=-1)
    new_d = jnp.stack([unp(ndx), unp(ndy), unp(ndz)], axis=-1)
    return (E, W, unp(cf) > 0, new_o, new_d, unp(ntm), unp(alive2),
            unp(depth2))
