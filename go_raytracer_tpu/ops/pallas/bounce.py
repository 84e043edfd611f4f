"""Pallas TPU bounce megakernel.

The XLA wavefront bounce (integrator/wavefront.py:_bounce + ops/trace.py)
lowers to tens of small kernels per step; at wavefront batch sizes each is
microseconds of compute, so the loop is launch-bound. This kernel fuses the
entire bounce — closest-hit over the primitive tables, participating-media
free flight, material shading, mixture light sampling, and pdf evaluation —
into ONE kernel per step; `bounce_fused` additionally folds in the
ray-regeneration step (in-kernel PRNG, camera ray generation, depth cap).

Design notes (TPU-specific):

* Zero gathers: material/texture parameters are joined into primitive rows
  at pack time (`pack_scene`), and the intersection loop carries the
  winner's attributes under a mask instead of gathering by index after an
  argmin. Light and media rows are looped the same way. The table is
  sorted into kind-homogeneous sections (spheres, then quads), so each
  section's candidate code is specialized — no per-row kind selects.
* Scales past small scenes: sections with more rows than UNROLL_ROWS are
  walked by a `fori_loop` over P_BLOCK-row blocks (dynamic sublane slices,
  statically unrolled within the block), so Mosaic's instruction count —
  and compile time — stays bounded for scenes like book1 (~500 spheres)
  and book2 (~3400 prims).
* Ray state is SoA planes of shape (N/128, 128) — native (sublane, lane)
  layout, no 3-wide minor dimension.
* Noise textures evaluate the gather-free hash-gradient Perlin
  (scene/perlin.py) inline — pure VPU arithmetic.
* `bounce` takes uniform variates as inputs (same threefry stream as the
  XLA path), so it is bit-comparable with `_bounce` given the same key and
  is exercised in interpreter mode on CPU. `bounce_fused` derives its
  uniforms from an in-kernel counter-based hash PRNG (identical in Mosaic
  and interpret mode).

Supported scene surface (static flags checked by `supported()`): spheres
(incl. motion blur) + quads; constant media with sphere/box boundaries;
lambertian / metal / dielectric / diffuse-light / isotropic materials;
solid / checkerboard / perlin / marble / turbulence textures; quad +
sphere lights. Scenes with triangles or image textures fall back to the
XLA path.

Semantics follow the reference exactly as in the XLA path (camera.go:293-331,
materials.go, pdf.go, objects.go hit routines, medium.go:27-58).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_raytracer_tpu.scene import perlin as perlin_mod
from go_raytracer_tpu.scene import types as T

LANE = 128
TILE_ROWS = 32
INV_PI = 1.0 / math.pi
INV_4PI = 1.0 / (4.0 * math.pi)

# primitive row layout — kind-homogeneous sections share the material block
P_KIND = 0
# sphere: 1-3 c0, 4-6 cd, 7 r, 8 r^2
# quad:   1-3 normal, 4 D, 5-7 cvw, 8-10 cwu, 11 qcvw, 12 qcwu
# material block joined at col MAT_BASE+, scene-specialized
# (_mat_layout): solid/image albedo folds into the checker even/odd pair
# (even == odd == color renders either parity to the color, texture.go:50-59
# degenerates to texture.go:25-27), and mutually exclusive parameters share
# one column — every dropped column removes one select per primitive row
# per bounce from the closest-hit loop AND one carried register plane.
MAT_BASE = 13


def _mat_layout(st: dict):
    """Ordered logical material columns for this scene's prim table/carry."""
    cols = ["kind", "ev_r", "ev_g", "ev_b", "od_r", "od_g", "od_b"]
    if st["has_noise"] or st["has_image"]:
        cols.append("texk")      # TEX_* discriminator
    if st["has_metal"] or st["has_dielectric"]:
        cols.append("fr")        # metal fuzz | dielectric ref_idx (disjoint)
    if st["has_checker"] or st["has_noise"]:
        cols.append("scale")     # checker inv_scale | noise scale (disjoint)
    if st["has_noise"] or st["has_image"]:
        cols.append("seed_img")  # noise seed bits | image id (disjoint)
    return cols
P_BLOCK = 8        # rows per dynamic block in large sections
UNROLL_ROWS = 32   # sections up to this many rows are fully unrolled

# light row layout
# 0 kind(0 quad,1 sphere)
# quad: 1-3 q, 4-6 u, 7-9 v, 10-12 normal, 13 D, 14-16 cvw, 17-19 cwu,
#       20 qcvw, 21 qcwu, 22 area
# sphere: 1-3 c0, 4 r
L_COLS = 23

# media row layout (medium.go:13-25 + transformation.go for box boundaries)
# 0 kind(0 sphere,1 box), 1-3 center, 4 radius, 5 cos_t, 6 sin_t,
# 7-9 offset, 10-12 box_min, 13-15 box_max, 16 neg_inv_density,
# 17-19 isotropic albedo
M_COLS = 20

N_U = 9  # fixed uniforms per ray per bounce (wavefront.py slot order);
         # media add one slot each at indices N_U + m


def supported(scene: T.Scene, max_prims: int = 4096, max_lights: int = 8,
              max_media: int = 8) -> bool:
    if scene.has_triangles or scene.has_tri_lights:
        return False
    if scene.has_media and scene.media.count > max_media:
        return False
    n_prims = (scene.spheres.count if scene.has_spheres else 0) + \
        (scene.quads.count if scene.has_quads else 0) + \
        (scene.boxes.count if scene.has_boxes else 0)
    return 0 < n_prims <= max_prims and 0 < scene.lights.n <= max_lights


def supported_ext(scene: T.Scene, max_prims: int = 4096, max_lights: int = 8,
                  max_media: int = 8) -> bool:
    """supported() for the EXTERNAL-mesh-hit mode (bounce with `ext`
    planes): triangles are allowed — their closest hit arrives as
    precomputed per-lane planes (regen's mesh path runs the binned
    intersector first) — but triangle LIGHTS still aren't (the in-kernel
    light sampler covers quad/sphere rows only)."""
    if scene.has_tri_lights:
        return False
    if scene.has_media and scene.media.count > max_media:
        return False
    n_prims = (scene.spheres.count if scene.has_spheres else 0) + \
        (scene.quads.count if scene.has_quads else 0) + \
        (scene.boxes.count if scene.has_boxes else 0)
    return 0 < n_prims <= max_prims and 0 < scene.lights.n <= max_lights


def scene_statics(scene: T.Scene, ext: bool = False) -> dict:
    """Static (hashable) kernel parameters derived from the scene's static
    capability flags and table shapes. `ext`: the kernel folds an
    EXTERNALLY-computed mesh closest hit (per-lane t/normal/uv/material
    planes from the binned intersector) into its carry before media and
    shading — the mesh-scene mode (bounce_ext)."""
    n_sph = scene.spheres.count if scene.has_spheres else 0
    n_quad = scene.quads.count if scene.has_quads else 0
    n_box = scene.boxes.count if scene.has_boxes else 0
    pad8 = lambda x: (x + P_BLOCK - 1) // P_BLOCK * P_BLOCK
    return dict(
        n_sph=n_sph, n_quad=n_quad, n_box=n_box,
        sph_base=0, quad_base=pad8(n_sph),
        box_base=pad8(n_sph) + pad8(n_quad),
        n_rows=pad8(n_sph) + pad8(n_quad) + pad8(n_box),
        n_lights=scene.lights.count, n_lights_live=scene.lights.n,
        n_media=scene.media.count if scene.has_media else 0,
        has_metal=scene.has_metal, has_dielectric=scene.has_dielectric,
        has_isotropic=scene.has_isotropic or scene.has_media,
        has_noise=scene.has_noise,
        has_image=scene.has_image,
        has_checker=scene.has_checker,
        box_rot=scene.has_rot_boxes,
        ext_hit=ext,
        # block-AABB culling in the big-section fori loop: only worth it
        # when the caller also sorts lanes into coherent tiles (regen's
        # reorder path) — on incoherent tiles the test is pure overhead
        # (measured -16% book1 / -8% book2, docs/PERFORMANCE.md)
        cull=False,
    )


def join_mat_cols(scene: T.Scene, lay, mat_id):
    """The scene-specialized material/texture column join (_mat_layout)
    for a vector of material ids — used both by pack_scene (per primitive
    row) and by the external-mesh-hit path (per lane, indexed by the
    winning triangle's material)."""
    mats = scene.materials
    tex = scene.textures
    tex_id = mats.tex_id[mat_id]
    kind_t = tex.kind[tex_id]
    is_check = kind_t == T.TEX_CHECKER
    ev = jnp.where(is_check[:, None], tex.even[tex_id], tex.color[tex_id])
    od = jnp.where(is_check[:, None], tex.odd[tex_id], tex.color[tex_id])
    vals = {
        "kind": mats.kind[mat_id].astype(jnp.float32),
        "ev_r": ev[:, 0], "ev_g": ev[:, 1], "ev_b": ev[:, 2],
        "od_r": od[:, 0], "od_g": od[:, 1], "od_b": od[:, 2],
    }
    if "texk" in lay:
        vals["texk"] = kind_t.astype(jnp.float32)
    if "fr" in lay:
        vals["fr"] = jnp.where(mats.kind[mat_id] == T.MAT_METAL,
                               mats.fuzz[mat_id], mats.ref_idx[mat_id])
    if "scale" in lay:
        vals["scale"] = jnp.where(is_check, tex.inv_scale[tex_id],
                                  tex.scale[tex_id])
    if "seed_img" in lay:
        seed_f = jax.lax.bitcast_convert_type(
            scene.perlin.seed[tex.noise_id[tex_id]], jnp.float32)
        vals["seed_img"] = jnp.where(
            kind_t == T.TEX_IMAGE,
            tex.image_id[tex_id].astype(jnp.float32), seed_f)
    return [vals[c] for c in lay]


def _morton30(p, lo, ext):
    """30-bit Morton code of points (N, 3) inside the box [lo, lo+ext)."""
    from go_raytracer_tpu.ops.trace import _part1by2

    q = jnp.clip((p - lo) / ext * 1024.0, 0.0, 1023.0).astype(jnp.int32)
    return (_part1by2(q[:, 0]) << 2) | (_part1by2(q[:, 1]) << 1) | \
        _part1by2(q[:, 2])


def pack_scene(scene: T.Scene, cull: bool = False):
    """Join primitives with their material/texture parameters into a dense
    (P, MAT_BASE+len(_mat_layout)) row table (kind-sorted sections, padded to a P_BLOCK
    multiple with kind=-1 rows), lights into (L, L_COLS), media into
    (M, M_COLS), plus a block-AABB table for the kernel's cull.

    With `cull` (the reorder experiment path only): each section is
    Morton-sorted by primitive center so 8-row blocks are spatially tight,
    and per-P_BLOCK-row AABBs are emitted. Without it (the default) the
    table keeps scene declaration order — preserving the reference's
    equal-t tie-break (first hittable in list order wins a strict `<`
    comparison) — and the AABB table is a 1-row dummy that costs nothing
    to ship. Pure jnp — traced once inside jit."""
    mats = scene.materials
    tex = scene.textures
    st = scene_statics(scene)
    lay = _mat_layout(st)
    p_cols = MAT_BASE + len(lay)
    mat_cols = lambda mat_id: join_mat_cols(scene, lay, mat_id)

    def sort_section(rows, lo, hi, active):
        """Morton-order the section's rows by AABB center (inactive rows
        last) via a multi-operand lax.sort — keeps blocks spatially tight
        without any gather."""
        center = 0.5 * (lo + hi)
        blo = jnp.min(jnp.where(active[:, None], lo, jnp.inf), axis=0)
        bhi = jnp.max(jnp.where(active[:, None], hi, -jnp.inf), axis=0)
        ext = jnp.maximum(bhi - blo, 1e-6)
        key = jnp.where(active, _morton30(center, blo, ext),
                        jnp.int32(2**30))
        sorted_ops = jax.lax.sort(
            (key, *(rows[:, c] for c in range(p_cols)),
             *(lo[:, i] for i in range(3)), *(hi[:, i] for i in range(3))),
            dimension=0, num_keys=1, is_stable=True)
        rows = jnp.stack(sorted_ops[1:1 + p_cols], axis=1)
        lo = jnp.stack(sorted_ops[1 + p_cols:4 + p_cols], axis=1)
        hi = jnp.stack(sorted_ops[4 + p_cols:7 + p_cols], axis=1)
        return rows, lo, hi

    def pad_section(rows):
        n = rows.shape[0]
        pad = (-n) % P_BLOCK
        if pad:
            rows = jnp.concatenate(
                [rows, jnp.full((pad, p_cols), -1.0, rows.dtype)])
        return rows

    def block_bounds(lo, hi, active):
        """Per-P_BLOCK-row AABBs [min(3), max(3)] for the fori-loop cull:
        inactive rows contribute an empty box."""
        big = 3e38
        lo = jnp.where(active[:, None], lo, big)
        hi = jnp.where(active[:, None], hi, -big)
        pad = (-lo.shape[0]) % P_BLOCK
        if pad:
            lo = jnp.concatenate([lo, jnp.full((pad, 3), big)])
            hi = jnp.concatenate([hi, jnp.full((pad, 3), -big)])
        lo = lo.reshape(-1, P_BLOCK, 3).min(axis=1)
        hi = hi.reshape(-1, P_BLOCK, 3).max(axis=1)
        return jnp.concatenate([lo, hi], axis=1)  # (NB, 6)

    sections = []
    blocks = []
    if scene.has_spheres:
        sp = scene.spheres
        cols = ([jnp.zeros_like(sp.radius)]
                + [sp.center0[:, i] for i in range(3)]
                + [sp.center_delta[:, i] for i in range(3)]
                + [sp.radius, sp.radius * sp.radius]
                + [jnp.zeros_like(sp.radius)] * 4  # pad to col 13
                + mat_cols(sp.mat_id))
        rows = jnp.where(sp.active[:, None], jnp.stack(cols, axis=1),
                         jnp.full((sp.count, p_cols), -1.0))
        if cull:
            c1 = sp.center0 + sp.center_delta  # motion endpoint (objects.go:30-37)
            # abs: hollow-bubble spheres carry negative radii (their shell
            # still spans |r|) — a signed half-extent would invert the box
            r = jnp.abs(sp.radius)[:, None]
            lo = jnp.minimum(sp.center0, c1) - r
            hi = jnp.maximum(sp.center0, c1) + r
            # sorting moves inactive (kind -1) rows to the tail where they
            # act like the pad rows the candidate tests already reject
            rows, lo, hi = sort_section(rows, lo, hi, sp.active)
            blocks.append(block_bounds(lo, hi, rows[:, 0] >= 0.0))
        sections.append(pad_section(rows))
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
        rows = jnp.where(qd.active[:, None], jnp.stack(cols, axis=1),
                         jnp.full((qd.count, p_cols), -1.0))
        if cull:
            corners = jnp.stack([qd.q, qd.q + qd.u, qd.q + qd.v,
                                 qd.q + qd.u + qd.v])
            eps = 1e-4  # padToMinimum-style epsilon for axis-flat quads
            lo = corners.min(axis=0) - eps
            hi = corners.max(axis=0) + eps
            rows, lo, hi = sort_section(rows, lo, hi, qd.active)
            blocks.append(block_bounds(lo, hi, rows[:, 0] >= 0.0))
        sections.append(pad_section(rows))
    if scene.has_boxes:
        bx = scene.boxes
        cols = ([jnp.full_like(bx.lo[:, 0], 3.0)]
                + [bx.lo[:, i] for i in range(3)]
                + [bx.hi[:, i] for i in range(3)]
                # 7 cos, 8 sin, 9-11 offset (identity for axis rows),
                # 12 pad
                + [bx.cos_t, bx.sin_t]
                + [bx.offset[:, i] for i in range(3)]
                + [jnp.zeros_like(bx.lo[:, 0])]
                + mat_cols(bx.mat_id))
        rows = jnp.where(bx.active[:, None], jnp.stack(cols, axis=1),
                         jnp.full((bx.count, p_cols), -1.0))
        if cull:
            # world AABB = hull of the 8 rotated corners (identity rows
            # reduce to lo/hi exactly)
            corners = jnp.stack(
                [jnp.stack([jnp.where(m & 1, bx.hi[:, 0], bx.lo[:, 0]),
                            jnp.where(m & 2, bx.hi[:, 1], bx.lo[:, 1]),
                            jnp.where(m & 4, bx.hi[:, 2], bx.lo[:, 2])],
                           axis=-1) for m in range(8)])
            cw = jnp.stack(
                [bx.cos_t * corners[..., 0] + bx.sin_t * corners[..., 2],
                 corners[..., 1],
                 -bx.sin_t * corners[..., 0] + bx.cos_t * corners[..., 2]],
                axis=-1) + bx.offset[None]
            rows, lo, hi = sort_section(rows, cw.min(axis=0), cw.max(axis=0),
                                        bx.active)
            blocks.append(block_bounds(lo, hi, rows[:, 0] >= 0.0))
        sections.append(pad_section(rows))
    prims = jnp.concatenate(sections, axis=0).astype(jnp.float32)
    if blocks:
        blk = jnp.concatenate(blocks, axis=0).astype(jnp.float32)
        blk = jnp.pad(blk, ((0, 0), (0, 10)))  # (NB, 16): packed-line field
    else:
        blk = jnp.zeros((1, 16), jnp.float32)  # cull off: nothing to ship

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

    # media rows, with the isotropic phase function's albedo joined in
    md = scene.media
    alb = tex.color[mats.tex_id[md.mat_id]]
    med = jnp.stack(
        [md.kind.astype(jnp.float32)]
        + [md.center[:, i] for i in range(3)]
        + [md.radius, md.cos_t, md.sin_t]
        + [md.offset[:, i] for i in range(3)]
        + [md.box_min[:, i] for i in range(3)]
        + [md.box_max[:, i] for i in range(3)]
        + [md.neg_inv_density]
        + [alb[:, i] for i in range(3)],
        axis=1).astype(jnp.float32)
    return prims, lights, med, blk


# ---------------------------------------------------------------------------
# kernel helpers (operate on (R, 128) tiles)
# ---------------------------------------------------------------------------

def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z + 1e-38)
    return x * inv, y * inv, z * inv


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _atan2(y, x):
    """atan2 via the A&S 4.4.49 degree-9 minimax polynomial (~1e-5 rad) —
    Mosaic has no atan2/acos lowering."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.maximum(hi, 1e-30)
    t2 = t * t
    r = t * (0.9998660 + t2 * (-0.3302995 + t2 * (0.1801410
             + t2 * (-0.0851330 + 0.0208351 * t2))))
    r = jnp.where(ay > ax, 0.5 * math.pi - r, r)
    r = jnp.where(x < 0.0, math.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(x):
    return _atan2(jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x)), x)


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


T_MIN = 1e-3  # rayColor's interval.New(0.001, inf) (camera.go:300)

# winner-carry layout: t_best, outward-normal xyz (spheres defer it: the
# oc vector rides the slots until one post-loop resolve), front flag, then
# scene-gated slots (_carry_slots) and the joined material cols
# (_mat_layout). The face-forward flip (hittable.go:27-34) happens ONCE
# after the sections instead of per candidate row.
KIND_SPHERE, KIND_QUAD, KIND_MEDIUM, KIND_BOX, KIND_EXT = \
    0.0, 1.0, 2.0, 3.0, 4.0


def _carry_slots(st: dict):
    """Scene-gated carry planes after (t_best, n xyz): the winner kind +
    aux values exist only when something downstream consumes them
    (sphere normal resolve / image-texture uv / the media front-face
    override). The front flag is NOT carried (round 5): it is ONE
    post-loop dot-sign off the winner's outward normal
    (hittable.go:27-34), dropping a carry plane and a select per
    primitive row — and matching the XLA path's formulation exactly."""
    slots = []
    if st["n_sph"] or st["has_image"] or st["n_media"]:
        slots.append("wkind")
    if st["n_sph"] or st["has_image"]:
        slots.append("auxA")   # sphere radius | quad alpha
    if st["has_image"]:
        slots.append("auxB")   # quad beta
    return slots


def _init_carry(like, st):
    INF = jnp.asarray(jnp.inf, jnp.float32)
    n = 4 + len(_carry_slots(st)) + len(_mat_layout(st))
    zeros = [jnp.zeros_like(like) for _ in range(n - 1)]
    return (jnp.full(like.shape, INF, jnp.float32), *zeros)


def _sphere_candidate(st, g, rays, t_best):
    """Candidate hit vs one sphere row (objects.go:83-115). The outward
    normal (p - c)/r is DEFERRED: the oc vector (already in registers)
    rides the normal slots and the post-section resolve computes
    (t*d - oc)/r once for the winning lane — ~10 fewer vector ops per
    sphere row; the face flag is one post-loop dot off it."""
    ox, oy, oz, dx, dy, dz, tm, a_quad, inv_a = rays
    cx = g(1) + tm * g(4) - ox
    cy = g(2) + tm * g(5) - oy
    cz = g(3) + tm * g(6) - oz
    h = _dot3(dx, dy, dz, cx, cy, cz)
    c = _dot3(cx, cy, cz, cx, cy, cz) - g(8)
    disc = h * h - a_quad * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    r1 = (h - sq) * inv_a     # hoisted 1/|d|^2: two divides -> muls
    r2 = (h + sq) * inv_a
    sur1 = (T_MIN < r1) & (r1 < t_best)
    root = jnp.where(sur1, r1, r2)
    ok = (g(0) >= 0.0) & (disc >= 0.0) & (T_MIN < root) & (root < t_best)
    return ok, root, cx, cy, cz, g(7), None


def _quad_candidate(st, g, rays, t_best):
    """Candidate hit vs one quad row (objects.go:167-206)."""
    ox, oy, oz, dx, dy, dz, tm, a_quad, inv_a = rays
    dn = _dot3(dx, dy, dz, g(1), g(2), g(3))
    on = _dot3(ox, oy, oz, g(1), g(2), g(3))
    t_q = (g(4) - on) / dn
    px = ox + t_q * dx
    py = oy + t_q * dy
    pz = oz + t_q * dz
    alpha = _dot3(px, py, pz, g(5), g(6), g(7)) - g(11)
    beta = _dot3(px, py, pz, g(8), g(9), g(10)) - g(12)
    ok = ((g(0) >= 0.0) & (jnp.abs(dn) >= 1e-8)
          & (T_MIN <= t_q) & (t_q <= t_best)
          & (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0))
    # (alpha, beta) double as the quad's texture uv (objects.go:196-199);
    # carried only when an image texture can read them
    if st["has_image"]:
        return ok, t_q, g(1), g(2), g(3), alpha, beta
    return ok, t_q, g(1), g(2), g(3), None, None


def _box_candidate(inv_d, st, g, rays, t_best):
    """Candidate hit vs one fused box row (row layout: 1-3 lo, 4-6 hi,
    7 cos, 8 sin, 9-11 offset). One slab test replaces the six quad
    tests of objects.go:208-240: t = slab entry when it clears T_MIN,
    else the exit (ray inside); the outward normal is the axis of the
    bounding slab, sign −d for entry / +d for exit. Rotated rows
    (st["box_rot"] — e.g. the two Cornell boxes, main.go:297-305) rotate
    the ray into object space per row (transformation.go:25-34, 79-85)
    and the normal back out; ONE such row replaces six baked quad rows
    (~6x fewer vector ops for that geometry). uv is zeros — fusion is
    gated on uv-independent textures (scene/builder._box_fusable)."""
    ox, oy, oz, dx, dy, dz, tm, a_quad, inv_a = rays
    if st["box_rot"]:
        # world -> object: offset subtract + rotate-Y (the Media
        # convention); per-row safe reciprocals (the hoisted ones are in
        # the world frame)
        cos, sin = g(7), g(8)
        osx = ox - g(9)
        oy_ = oy - g(10)
        osz = oz - g(11)
        oxo = cos * osx - sin * osz
        ozo = sin * osx + cos * osz
        dxo = cos * dx - sin * dz
        dzo = sin * dx + cos * dz
        tiny = 1e-30
        sdx = jnp.where(jnp.abs(dxo) < tiny,
                        jnp.where(dxo < 0, -tiny, tiny), dxo)
        sdy = jnp.where(jnp.abs(dy) < tiny,
                        jnp.where(dy < 0, -tiny, tiny), dy)
        sdz = jnp.where(jnp.abs(dzo) < tiny,
                        jnp.where(dzo < 0, -tiny, tiny), dzo)
        ix_, iy_, iz_ = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz
        bx_o, by_o, bz_o = oxo, oy_, ozo
        bdx, bdz = dxo, dzo
    else:
        ix_, iy_, iz_ = inv_d   # hoisted safe reciprocal (once per bounce)
        bx_o, by_o, bz_o = ox, oy, oz
        bdx, bdz = dx, dz
    tx0 = (g(1) - bx_o) * ix_
    tx1 = (g(4) - bx_o) * ix_
    ty0 = (g(2) - by_o) * iy_
    ty1 = (g(5) - by_o) * iy_
    tz0 = (g(3) - bz_o) * iz_
    tz1 = (g(6) - bz_o) * iz_
    lx, hx = jnp.minimum(tx0, tx1), jnp.maximum(tx0, tx1)
    ly, hy = jnp.minimum(ty0, ty1), jnp.maximum(ty0, ty1)
    lz, hz = jnp.minimum(tz0, tz1), jnp.maximum(tz0, tz1)
    near = jnp.maximum(jnp.maximum(lx, ly), lz)
    far = jnp.minimum(jnp.minimum(hx, hy), hz)
    entry = near >= T_MIN
    t_c = jnp.where(entry, near, far)
    ok = (g(0) >= 0.0) & (far > near) & (T_MIN <= t_c) & (t_c <= t_best)
    # axis attaining the winning bound; outward sign flips entry/exit.
    # entry hits face the ray (front), exit hits are interior back faces.
    bx_ = jnp.where(entry, lx, hx)
    by_ = jnp.where(entry, ly, hy)
    is_x = bx_ == t_c
    is_y = jnp.logical_and(jnp.logical_not(is_x), by_ == t_c)
    is_z = jnp.logical_and(jnp.logical_not(is_x), jnp.logical_not(is_y))
    flip = jnp.where(entry, -1.0, 1.0)
    sgn_x = jnp.where(bdx >= 0, flip, -flip)
    sgn_y = jnp.where(dy >= 0, flip, -flip)
    sgn_z = jnp.where(bdz >= 0, flip, -flip)
    zero = jnp.zeros_like(t_c)
    nx = jnp.where(is_x, sgn_x, zero)
    ny = jnp.where(is_y, sgn_y, zero)
    nz = jnp.where(is_z, sgn_z, zero)
    if st["box_rot"]:
        # object -> world rotation for the normal (transformation.go:87-93)
        nxw = cos * nx + sin * nz
        nzw = -sin * nx + cos * nz
        return ok, t_c, nxw, ny, nzw, None, None
    return ok, t_c, nx, ny, nz, None, None


def _update_carry(st, carry, cand, g, kind_code):
    """Fold a candidate into the winner carry (closest-hit min-reduce,
    hittable.go:122-138). Normals stay OUTWARD (spheres: deferred oc);
    both the front flag and the face-forward flip of hittable.go:27-34
    happen once post-loop."""
    n_slots = len(_carry_slots(st))
    (t_best, n_hx, n_hy, n_hz, *rest) = carry
    slots = rest[:n_slots]
    mat = rest[n_slots:]
    ok, t_c, cnx, cny, cnz, auxA, auxB = cand
    ok = ok & (t_c < t_best)
    t_best = jnp.where(ok, t_c, t_best)
    n_hx = jnp.where(ok, cnx, n_hx)
    n_hy = jnp.where(ok, cny, n_hy)
    n_hz = jnp.where(ok, cnz, n_hz)
    new_slots = []
    for name, v in zip(_carry_slots(st), slots):
        cand_v = {"wkind": kind_code, "auxA": auxA, "auxB": auxB}[name]
        new_slots.append(v if cand_v is None else jnp.where(ok, cand_v, v))
    mat = [jnp.where(ok, g(MAT_BASE + i), m) for i, m in enumerate(mat)]
    return (t_best, n_hx, n_hy, n_hz, *new_slots, *mat)


def _scan_section(st, prim_ref, blk_ref, base, n_real, candidate_fn,
                  kind_code, rays, cull, carry):
    """Walk one kind-homogeneous section: fully unrolled when small, a
    fori_loop over P_BLOCK-row dynamic slices when large (keeps Mosaic's
    program size independent of the primitive count). With `cull`, each
    block's AABB (pack_scene.block_bounds, Morton-tight) is slab-tested
    against the whole tile first and the rows are processed only when some
    ray's interval beats its current t_best — a one-level BVH that pays
    off when the caller delivers spatially coherent tiles."""
    if n_real == 0:
        return carry
    if n_real <= UNROLL_ROWS:
        for p in range(n_real):
            g = lambda c, p=p: prim_ref[base + p, c]
            carry = _update_carry(st, carry,
                                  candidate_fn(st, g, rays, carry[0]),
                                  g, kind_code)
        return carry

    n_blocks = (n_real + P_BLOCK - 1) // P_BLOCK
    blk_base = base // P_BLOCK
    ox, oy, oz, dx, dy, dz = rays[0], rays[1], rays[2], rays[3], rays[4], rays[5]
    if cull:
        tiny = 1e-30
        sdx = jnp.where(jnp.abs(dx) < tiny, jnp.where(dx < 0, -tiny, tiny), dx)
        sdy = jnp.where(jnp.abs(dy) < tiny, jnp.where(dy < 0, -tiny, tiny), dy)
        sdz = jnp.where(jnp.abs(dz) < tiny, jnp.where(dz < 0, -tiny, tiny), dz)
        ix, iy, iz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz

    def process_block(b, carry):
        rows = prim_ref[pl.ds(base + b * P_BLOCK, P_BLOCK), :]
        for r in range(P_BLOCK):
            g = lambda c, r=r: rows[r, c]
            carry = _update_carry(st, carry,
                                  candidate_fn(st, g, rays, carry[0]),
                                  g, kind_code)
        return carry

    if not cull:
        return jax.lax.fori_loop(0, n_blocks, process_block, carry)

    def body(b, carry):
        brow_ = blk_ref[pl.ds(blk_base + b, 1), :]
        brow = lambda c: brow_[0, c]
        tx0 = (brow(0) - ox) * ix
        tx1 = (brow(3) - ox) * ix
        ty0 = (brow(1) - oy) * iy
        ty1 = (brow(4) - oy) * iy
        tz0 = (brow(2) - oz) * iz
        tz1 = (brow(5) - oz) * iz
        near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.maximum(tz0, tz1))
        hit_box = jnp.maximum(near, T_MIN) < jnp.minimum(far, carry[0])
        return jax.lax.cond(jnp.any(hit_box),
                            lambda c: process_block(b, c),
                            lambda c: c, carry)

    return jax.lax.fori_loop(0, n_blocks, body, carry)


def _media_update(st, med_ref, n_media, rays, u, carry):
    """Participating-media free flight (medium.go:27-58): analytic
    boundary spans (sphere roots / rotated-box slabs, trace.py semantics)
    clamped by the closest hit so far, exponential scattering distance.
    A medium winner presents the reference's fixed record: normal (1,0,0),
    frontFace=true, isotropic material (medium.go:54-56)."""
    ox, oy, oz, dx, dy, dz, tm, a_quad, inv_a = rays
    ray_len = jnp.sqrt(a_quad)
    inv_len = 1.0 / ray_len
    for m in range(n_media):
        g = lambda c: med_ref[m, c]
        is_box = g(0) > 0.5
        # sphere span
        cx = g(1) - ox
        cy = g(2) - oy
        cz = g(3) - oz
        h = _dot3(dx, dy, dz, cx, cy, cz)
        c = _dot3(cx, cy, cz, cx, cy, cz) - g(4) * g(4)
        disc = h * h - a_quad * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        near_s = (h - sq) * inv_a
        far_s = (h + sq) * inv_a
        ok_s = disc >= 0.0
        # box span in object space (transformation.go:25-34, 79-85)
        cth, sth = g(5), g(6)
        osx = ox - g(7)
        osz = oz - g(9)
        xo = cth * osx - sth * osz
        yo = oy - g(8)
        zo = sth * osx + cth * osz
        dxo = cth * dx - sth * dz
        dzo = sth * dx + cth * dz
        near_b = jnp.full_like(ox, -jnp.inf)
        far_b = jnp.full_like(ox, jnp.inf)
        for (oc, dc, lo_c, hi_c) in ((xo, dxo, 10, 13), (yo, dy, 11, 14),
                                     (zo, dzo, 12, 15)):
            d_safe = jnp.where(jnp.abs(dc) < 1e-30,
                               jnp.where(dc < 0, -1e-30, 1e-30), dc)
            t0a = (g(lo_c) - oc) / d_safe
            t1a = (g(hi_c) - oc) / d_safe
            near_b = jnp.maximum(near_b, jnp.minimum(t0a, t1a))
            far_b = jnp.minimum(far_b, jnp.maximum(t0a, t1a))
        ok_b = far_b > near_b

        near = jnp.where(is_box, near_b, near_s)
        far = jnp.where(is_box, far_b, far_s)
        # no bool-valued selects (Mosaic can't legalize i1 vector selects)
        ok = (is_box & ok_b) | (jnp.logical_not(is_box) & ok_s)

        t_best = carry[0]
        ok = ok & (far > near + 1e-4)        # second boundary hit (medium.go:34)
        t0 = jnp.maximum(near, T_MIN)        # medium.go:37
        t1 = jnp.minimum(far, t_best)        # medium.go:38 (shrunk rayT.Max)
        ok = ok & (t0 < t1)                  # medium.go:39
        t0 = jnp.maximum(t0, 0.0)            # medium.go:43
        dist_inside = (t1 - t0) * ray_len
        hit_dist = g(16) * jnp.log(u[N_U + m])
        ok = ok & (hit_dist <= dist_inside)
        t_c = t0 + hit_dist * inv_len

        n_slots = len(_carry_slots(st))
        (t_best, n_hx, n_hy, n_hz, *rest) = carry
        slots = list(rest[:n_slots])
        mat = rest[n_slots:]
        win = ok & (t_c < t_best)
        one = jnp.ones_like(ox)
        zero = jnp.zeros_like(ox)
        t_best = jnp.where(win, t_c, t_best)
        n_hx = jnp.where(win, one, n_hx)     # medium.go:54
        n_hy = jnp.where(win, zero, n_hy)
        n_hz = jnp.where(win, zero, n_hz)
        # frontFace = true (medium.go:55) via the post-loop wkind check
        for si, name in enumerate(_carry_slots(st)):
            if name == "wkind":
                slots[si] = jnp.where(win, KIND_MEDIUM, slots[si])
        med_vals = {"kind": float(T.MAT_ISOTROPIC),
                    "ev_r": g(17), "ev_g": g(18), "ev_b": g(19),
                    "od_r": g(17), "od_g": g(18), "od_b": g(19),
                    "texk": float(T.TEX_SOLID), "fr": 0.0, "scale": 0.0,
                    "seed_img": 0.0}
        mat = [jnp.where(win, med_vals[name], mv)
               for name, mv in zip(_mat_layout(st), mat)]
        carry = (t_best, n_hx, n_hy, n_hz, *slots, *mat)
    return carry


def _bounce_core(st: dict, prim_ref, light_ref, med_ref, blk_ref, bg,
                 ox, oy, oz, dx, dy, dz, tm, alive, u, ext=None):
    """Shared bounce body over (R, 128) value planes: closest hit, media,
    shading, mixture sampling — the whole of camera.go:293-331's per-level
    work. `u` is a list of N_U + n_media uniform planes. With
    st["ext_hit"], `ext` carries an externally-computed mesh closest hit
    as (t, outward nx, ny, nz, [u, v,] *mat_layout planes) — folded into
    the carry after the in-kernel sections, BEFORE media (the medium span
    clamps by the closest solid, medium.go:38). Returns value planes
    (E, W, cf, new origin, new direction, alive')."""
    a_quad = _dot3(dx, dy, dz, dx, dy, dz)  # |d|^2
    rays = (ox, oy, oz, dx, dy, dz, tm, a_quad, 1.0 / a_quad)
    cull = st["cull"]

    # ---- closest hit over kind-homogeneous sections ---------------------
    carry = _init_carry(ox, st)
    carry = _scan_section(st, prim_ref, blk_ref, st["sph_base"],
                          st["n_sph"], _sphere_candidate, KIND_SPHERE,
                          rays, cull, carry)
    carry = _scan_section(st, prim_ref, blk_ref, st["quad_base"],
                          st["n_quad"], _quad_candidate, KIND_QUAD,
                          rays, cull, carry)
    if st["n_box"]:
        tiny = 1e-30
        sdx = jnp.where(jnp.abs(dx) < tiny,
                        jnp.where(dx < 0, -tiny, tiny), dx)
        sdy = jnp.where(jnp.abs(dy) < tiny,
                        jnp.where(dy < 0, -tiny, tiny), dy)
        sdz = jnp.where(jnp.abs(dz) < tiny,
                        jnp.where(dz < 0, -tiny, tiny), dz)
        box_cand = functools.partial(_box_candidate,
                                     (1.0 / sdx, 1.0 / sdy, 1.0 / sdz))
        carry = _scan_section(st, prim_ref, blk_ref, st["box_base"],
                              st["n_box"], box_cand, KIND_BOX,
                              rays, cull, carry)
    if st["ext_hit"]:
        # fold the externally-computed mesh hit (binned intersector) into
        # the winner carry: t/outward-normal/uv/material arrive as value
        # planes (front is the shared post-loop dot). KIND_EXT keeps the
        # sphere normal-resolve off these lanes.
        et, enx, eny, enz = ext[0], ext[1], ext[2], ext[3]
        k = 4
        if st["has_image"]:
            eu, ev = ext[4], ext[5]
            k = 6
        emat = ext[k:]
        n_slots = len(_carry_slots(st))
        (t_best, n_hx, n_hy, n_hz, *rest) = carry
        slots = list(rest[:n_slots])
        mat = rest[n_slots:]
        okx = et < t_best
        t_best = jnp.where(okx, et, t_best)
        n_hx = jnp.where(okx, enx, n_hx)
        n_hy = jnp.where(okx, eny, n_hy)
        n_hz = jnp.where(okx, enz, n_hz)
        for si, name in enumerate(_carry_slots(st)):
            if name == "wkind":
                slots[si] = jnp.where(okx, KIND_EXT, slots[si])
            elif name == "auxA" and st["has_image"]:
                slots[si] = jnp.where(okx, eu, slots[si])
            elif name == "auxB":
                slots[si] = jnp.where(okx, ev, slots[si])
        mat = [jnp.where(okx, ev_, mv) for ev_, mv in zip(emat, mat)]
        carry = (t_best, n_hx, n_hy, n_hz, *slots, *mat)
    if st["n_media"]:
        carry = _media_update(st, med_ref, st["n_media"], rays, u, carry)

    n_slots = len(_carry_slots(st))
    (t_best, n_hx, n_hy, n_hz, *rest) = carry
    aux = dict(zip(_carry_slots(st), rest[:n_slots]))
    mat = dict(zip(_mat_layout(st), rest[n_slots:]))
    m_kind = mat["kind"]
    m_texk = mat.get("texk")

    hit = jnp.isfinite(t_best)
    t_safe = jnp.where(hit, t_best, 1.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz

    # resolve the deferred sphere normal: outward = (t*d - oc)/r once for
    # the winning lane (objects.go:96-99)
    if st["n_sph"]:
        is_sph = aux["wkind"] == KIND_SPHERE
        sph_ok = is_sph & hit
        inv_r = 1.0 / jnp.where(sph_ok, aux["auxA"], 1.0)
        n_hx = jnp.where(sph_ok, (t_safe * dx - n_hx) * inv_r, n_hx)
        n_hy = jnp.where(sph_ok, (t_safe * dy - n_hy) * inv_r, n_hy)
        n_hz = jnp.where(sph_ok, (t_safe * dz - n_hz) * inv_r, n_hz)
    if st["has_image"]:
        outx, outy, outz = n_hx, n_hy, n_hz   # pre-flip outward copies
    # front face from ONE dot against the winner's outward normal
    # (hittable.go:27-34) — the per-candidate sign tests and the carried
    # flag plane are gone (round 5); media force frontFace = true
    # (medium.go:55)
    front = _dot3(dx, dy, dz, n_hx, n_hy, n_hz) < 0.0
    if st["n_media"]:
        front = front | (aux["wkind"] == KIND_MEDIUM)
    # face-forward flip, once (hittable.go:27-34)
    n_hx = jnp.where(front, n_hx, -n_hx)
    n_hy = jnp.where(front, n_hy, -n_hy)
    n_hz = jnp.where(front, n_hz, -n_hz)

    # ---- texture value (texture.go:25-60, 88-125): solid/image albedo is
    # packed as even == odd (pack_scene), so the checker select is
    # unconditional and scenes without checker/noise skip the parity math
    if "scale" in mat:
        fx = jnp.floor(mat["scale"] * hx).astype(jnp.int32)
        fy = jnp.floor(mat["scale"] * hy).astype(jnp.int32)
        fz = jnp.floor(mat["scale"] * hz).astype(jnp.int32)
        even = jnp.remainder(fx + fy + fz, 2) == 0
        tex_r = jnp.where(even, mat["ev_r"], mat["od_r"])
        tex_g = jnp.where(even, mat["ev_g"], mat["od_g"])
        tex_b = jnp.where(even, mat["ev_b"], mat["od_b"])
    else:
        tex_r, tex_g, tex_b = mat["ev_r"], mat["ev_g"], mat["ev_b"]

    if st["has_noise"]:
        seedp = jax.lax.bitcast_convert_type(mat["seed_img"], jnp.uint32)
        nz = perlin_mod.noise_planes(seedp, mat["scale"] * hx,
                                     mat["scale"] * hy, mat["scale"] * hz)
        tb = perlin_mod.turbulence_planes(seedp, hx, hy, hz)
        gray = jnp.where(
            m_texk == float(T.TEX_PERLIN), 0.5 * (1.0 + nz),    # texture.go:115
            jnp.where(m_texk == float(T.TEX_MARBLE),
                      0.5 * (1.0 + jnp.sin(mat["scale"] * hz + 10.0 * tb)),  # :117
                      tb))                                       # :119
        needs_noise = ((m_texk == float(T.TEX_PERLIN))
                       | (m_texk == float(T.TEX_MARBLE))
                       | (m_texk == float(T.TEX_TURBULENT)))
        tex_r = jnp.where(needs_noise, gray, tex_r)
        tex_g = jnp.where(needs_noise, gray, tex_g)
        tex_b = jnp.where(needs_noise, gray, tex_b)

    miss = alive & ~hit
    lit = alive & hit
    is_light = lit & (m_kind == float(T.MAT_DIFFUSE_LIGHT))
    is_metal = lit & (m_kind == float(T.MAT_METAL))
    is_diel = lit & (m_kind == float(T.MAT_DIELECTRIC))
    is_lamb = lit & (m_kind == float(T.MAT_LAMBERTIAN))
    if st["has_isotropic"]:
        is_iso = lit & (m_kind == float(T.MAT_ISOTROPIC))
        diffuse = is_lamb | is_iso
    else:
        is_iso = None
        diffuse = is_lamb

    # emission (materials.go:150-155) + background on miss
    e_on = is_light & front
    er = jnp.where(miss, bg[0], jnp.where(e_on, tex_r, 0.0))
    eg = jnp.where(miss, bg[1], jnp.where(e_on, tex_g, 0.0))
    eb = jnp.where(miss, bg[2], jnp.where(e_on, tex_b, 0.0))

    # ---- diffuse mixture sampling (pdf.go:58-74) ------------------------
    n_lights = st["n_lights"]
    n_lights_live = st["n_lights_live"]
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
        st_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
        sx, sy, sz = _onb_transform(tcx, tcy, tcz,
                                    jnp.cos(phi) * st_, jnp.sin(phi) * st_, zz)
        cand_x = jnp.where(is_q, qx, sx)
        cand_y = jnp.where(is_q, qy, sy)
        cand_z = jnp.where(is_q, qz, sz)
        ldx = jnp.where(sel, cand_x, ldx)
        ldy = jnp.where(sel, cand_y, ldy)
        ldz = jnp.where(sel, cand_z, ldz)

    # material direction: cosine about the shading normal (pdf.go:38-40),
    # uniform sphere for isotropic (pdf.go:15-23); same uniform slots as
    # the XLA wavefront
    phi_m = 2.0 * math.pi * u[7]
    sq_m = jnp.sqrt(u[8])
    cz_m = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[8]))
    mdx, mdy, mdz = _onb_transform(n_hx, n_hy, n_hz,
                                   jnp.cos(phi_m) * sq_m, jnp.sin(phi_m) * sq_m,
                                   cz_m)
    if st["has_isotropic"]:
        z_i = 1.0 - 2.0 * u[7]
        r_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - z_i * z_i))
        phi_i = 2.0 * math.pi * u[8]
        mdx = jnp.where(is_iso, r_i * jnp.cos(phi_i), mdx)
        mdy = jnp.where(is_iso, r_i * jnp.sin(phi_i), mdy)
        mdz = jnp.where(is_iso, z_i, mdz)

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
    if st["has_isotropic"]:
        mat_pdf = jnp.where(is_iso, INV_4PI, cosine_pdf)
    else:
        mat_pdf = cosine_pdf
    pdf_value = 0.5 * l_pdf + 0.5 * mat_pdf
    ratio = jnp.where(diffuse, mat_pdf, 0.0) / jnp.where(diffuse, pdf_value, 1.0)
    # merged V plane: the vertex's emission OR scatter weight (disjoint
    # by material semantics — lights/background terminate, scatterers
    # don't emit). Building V in place keeps only three color values
    # live through the metal/dielectric sections (the six-value form
    # measured 10-48% slower on register-tight scenes: media, book1).
    emit = miss | e_on
    vr = jnp.where(emit, er, jnp.where(diffuse, tex_r * ratio, 0.0))
    vg = jnp.where(emit, eg, jnp.where(diffuse, tex_g * ratio, 0.0))
    vb = jnp.where(emit, eb, jnp.where(diffuse, tex_b * ratio, 0.0))
    ndx = gdx
    ndy = gdy
    ndz = gdz

    if st["has_metal"]:
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
        rx = rx + mat["fr"] * rf * jnp.cos(phif)
        ry = ry + mat["fr"] * rf * jnp.sin(phif)
        rz = rz + mat["fr"] * zf
        vr = jnp.where(is_metal, tex_r, vr)
        vg = jnp.where(is_metal, tex_g, vg)
        vb = jnp.where(is_metal, tex_b, vb)
        ndx = jnp.where(is_metal, rx, ndx)
        ndy = jnp.where(is_metal, ry, ndy)
        ndz = jnp.where(is_metal, rz, ndz)

    if st["has_dielectric"]:
        # dielectric (materials.go:94-130)
        udx, udy, udz = _normalize3(dx, dy, dz)
        m_ridx = mat["fr"]
        ri = jnp.where(front, 1.0 / m_ridx, m_ridx)
        cos_d = jnp.minimum(-_dot3(udx, udy, udz, n_hx, n_hy, n_hz), 1.0)
        r0 = ((1.0 - m_ridx) / (1.0 + m_ridx)) ** 2
        schlick = r0 + (1.0 - r0) * (1.0 - cos_d) ** 5
        # TIR on squares (matches wavefront.py exactly)
        do_reflect = (ri * ri * (1.0 - cos_d * cos_d) > 1.0) | (schlick > u[2])
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
        vr = jnp.where(is_diel, 1.0, vr)
        vg = jnp.where(is_diel, 1.0, vg)
        vb = jnp.where(is_diel, 1.0, vb)
        ndx = jnp.where(is_diel, ddx, ndx)
        ndy = jnp.where(is_diel, ddy, ndy)
        ndz = jnp.where(is_diel, ddz, ndz)

    dead = ~alive
    zero = jnp.zeros_like(ox)
    vr = jnp.where(dead, zero, vr)
    vg = jnp.where(dead, zero, vg)
    vb = jnp.where(dead, zero, vb)
    cf = diffuse & alive
    nox = jnp.where(lit, hx, ox)
    noy = jnp.where(lit, hy, oy)
    noz = jnp.where(lit, hz, oz)
    alive_out = is_metal | is_diel | diffuse

    if st["has_image"]:
        # Image textures are the one thing the kernel cannot do (per-ray
        # texel gathers); emit (uv, image id, diffuse pdf-ratio) so the XLA
        # caller can patch W = texel * ratio on the flagged lanes.
        # sphere uv from the (pre-flip) outward normal (objects.go:44-50);
        # quad uv is the carried (alpha, beta)
        theta = _acos(jnp.clip(-outy, -1.0, 1.0))
        phi = _atan2(-outz, outx) + math.pi
        sph_u = phi * (0.5 * INV_PI)
        sph_v = theta * INV_PI
        is_sph_uv = aux["wkind"] == KIND_SPHERE
        uu = jnp.where(is_sph_uv, sph_u, aux["auxA"])
        vv = jnp.where(is_sph_uv, sph_v, aux["auxB"])
        is_img = diffuse & (m_texk == float(T.TEX_IMAGE))
        img_id = jnp.where(is_img, mat["seed_img"], -1.0)
        img_out = (ratio, uu, vv, img_id)
    else:
        img_out = (zero, zero, zero, zero)
    return (vr, vg, vb, emit, cf, nox, noy, noz, ndx, ndy, ndz,
            alive_out, img_out)


def _bounce_kernel(st, n_u_tot, n_ext,
                   prim_ref, light_ref, med_ref, blk_ref, bg_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   time_ref, alive_ref, u_ref,
                   *refs):
    if n_ext:
        ext_ref = refs[0]
        ext = [ext_ref[k] for k in range(n_ext)]
        refs = refs[1:]
    else:
        ext = None
    (er_ref, eg_ref, eb_ref, wr_ref, wg_ref, wb_ref,
     cf_ref, nox_ref, noy_ref, noz_ref,
     ndx_ref, ndy_ref, ndz_ref, alive_out_ref, *img_refs) = refs
    bg = (bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2])
    u = [u_ref[k] for k in range(n_u_tot)]
    (vr, vg, vb, emit, cf, nox, noy, noz, ndx, ndy, ndz, alive_out,
     img_out) = \
        _bounce_core(st, prim_ref, light_ref, med_ref, blk_ref, bg,
                     ox_ref[:], oy_ref[:], oz_ref[:],
                     dx_ref[:], dy_ref[:], dz_ref[:],
                     time_ref[:], alive_ref[:] > 0, u, ext=ext)
    for ref, val in zip(img_refs, img_out):
        ref[:] = val
    zero = jnp.zeros_like(vr)
    er_ref[:] = jnp.where(emit, vr, zero)
    eg_ref[:] = jnp.where(emit, vg, zero)
    eb_ref[:] = jnp.where(emit, vb, zero)
    wr_ref[:] = jnp.where(emit, zero, vr)
    wg_ref[:] = jnp.where(emit, zero, vg)
    wb_ref[:] = jnp.where(emit, zero, vb)
    cf_ref[:] = cf.astype(jnp.int32)
    nox_ref[:] = nox
    noy_ref[:] = noy
    noz_ref[:] = noz
    ndx_ref[:] = ndx
    ndy_ref[:] = ndy
    ndz_ref[:] = ndz
    alive_out_ref[:] = alive_out.astype(jnp.int32)


def _statics_key(st: dict):
    return tuple(sorted(st.items()))


@functools.partial(jax.jit, static_argnames=("st_key", "interpret"))
def _bounce_jit(prims, lights, med, blk, o, d, time, alive, u, bg, st_key,
                interpret, ext=None):
    st = dict(st_key)
    n_u_tot = N_U + st["n_media"]
    n_orig = o.shape[0]
    # Tile the ray axis: Mosaic compile time scales with the block's
    # instruction count, so fixed (TILE_ROWS, 128) blocks + a grid keep the
    # program small for any N. Pad N to a whole number of tiles.
    tile = TILE_ROWS * LANE
    n = ((n_orig + tile - 1) // tile) * tile
    pad = n - n_orig
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        time = jnp.concatenate([time, jnp.zeros((pad,), time.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros((pad,), alive.dtype)])
        u = jnp.concatenate([u, jnp.full((pad, u.shape[1]), 0.5, u.dtype)])
        if ext is not None:
            # pad lanes: t = +inf (no mesh hit), everything else zero
            ext = (jnp.concatenate([ext[0],
                                    jnp.full((pad,), jnp.inf, o.dtype)]),
                   ) + tuple(jnp.concatenate([e, jnp.zeros((pad,), o.dtype)])
                             for e in ext[1:])
    rows = n // LANE
    shape = (rows, LANE)
    plane = lambda x: x.reshape(rows, LANE)
    planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
              plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
              plane(time), plane(alive.astype(jnp.int32))]
    # uniforms as one (n_u, rows, 128) stack (block indexed per tile)
    u_stack = jnp.stack([plane(u[:, i]) for i in range(n_u_tot)])
    n_ext = len(ext) if ext is not None else 0
    ext_stacks = ([jnp.stack([plane(e.astype(jnp.float32)) for e in ext])]
                  if n_ext else [])

    kernel = functools.partial(_bounce_kernel, st, n_u_tot, n_ext)

    grid = (rows // TILE_ROWS,)
    row_spec_f = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    in_specs = ([table_spec(prims), table_spec(lights), table_spec(med),
                 table_spec(blk),
                 pl.BlockSpec((1, 3), lambda i: (0, 0))]
                + [row_spec_f] * 8
                + [pl.BlockSpec((n_u_tot, TILE_ROWS, LANE),
                                lambda i: (0, i, 0))]
                + ([pl.BlockSpec((n_ext, TILE_ROWS, LANE),
                                 lambda i: (0, i, 0))] if n_ext else []))
    n_img = 4 if st["has_image"] else 0
    out_specs = [row_spec_f] * (14 + n_img)
    out_shapes = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 6 + \
        [jax.ShapeDtypeStruct(shape, jnp.int32)] + \
        [jax.ShapeDtypeStruct(shape, jnp.float32)] * 6 + \
        [jax.ShapeDtypeStruct(shape, jnp.int32)] + \
        [jax.ShapeDtypeStruct(shape, jnp.float32)] * n_img

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(prims, lights, med, blk, bg.reshape(1, 3).astype(jnp.float32),
      *planes, u_stack, *ext_stacks)

    (er, eg, eb, wr, wg, wb, cf, nox, noy, noz, ndx, ndy, ndz, alive2,
     *img_outs) = outs
    unp = lambda x: x.reshape(n)[:n_orig]
    E = jnp.stack([unp(er), unp(eg), unp(eb)], axis=-1)
    W = jnp.stack([unp(wr), unp(wg), unp(wb)], axis=-1)
    new_o = jnp.stack([unp(nox), unp(noy), unp(noz)], axis=-1)
    new_d = jnp.stack([unp(ndx), unp(ndy), unp(ndz)], axis=-1)
    img = tuple(unp(x) for x in img_outs) if img_outs else None
    return E, W, unp(cf) > 0, new_o, new_d, unp(alive2) > 0, img


def patch_image_weight_planes(scene: T.Scene, Wr, Wg, Wb, img):
    """Channel-plane form of the XLA-side image-texture patch:
    W = texel(u, v) * ratio on lanes the kernel flagged (texture.go:70-86
    via sampling.image_value). W*/img planes share any common shape —
    regen passes whole (cadence, N) record blocks."""
    if img is None:
        return Wr, Wg, Wb
    from go_raytracer_tpu.integrator import sampling

    ratio, uu, vv, img_id = img
    is_img = img_id >= 0.0
    idx = jnp.where(is_img, img_id, 0.0).astype(jnp.int32)
    texel = sampling.image_value(scene, idx.reshape(-1), uu.reshape(-1),
                                 vv.reshape(-1))
    sh = Wr.shape
    return tuple(jnp.where(is_img, texel[:, c].reshape(sh) * ratio, W)
                 for c, W in enumerate((Wr, Wg, Wb)))


def patch_image_weight(scene: T.Scene, W, img):
    """(N, 3) wrapper over patch_image_weight_planes."""
    if img is None:
        return W
    return jnp.stack(
        patch_image_weight_planes(scene, W[:, 0], W[:, 1], W[:, 2], img),
        axis=-1)


def bounce(scene_tables, statics, o, d, time, alive, u, bg, interpret=False,
           ext=None):
    """One fused bounce for the whole ray bundle (uniform-variate-fed,
    bit-comparable with the XLA `_bounce` given the same threefry key).

    scene_tables = pack_scene(scene); statics = scene_statics(scene);
    o, d: (N, 3); time, alive: (N,); u: (N, N_U + n_media) uniforms.
    With statics["ext_hit"], `ext` = the precomputed mesh closest hit as
    (N,) planes (t, outward nx, ny, nz, [u, v,] *mat_layout cols).
    Returns E (N,3), W (N,3), cf (N,), new_o, new_d (N,3), alive' (N,),
    img (None, or the (ratio, u, v, img_id) planes for
    `patch_image_weight`)."""
    prims, lights, med, blk = scene_tables
    return _bounce_jit(prims, lights, med, blk, o, d, time, alive, u, bg,
                       st_key=_statics_key(statics), interpret=interpret,
                       ext=ext)


def mesh_ext_planes(scene: T.Scene, statics, o, d, t_cap, alive,
                    interpret=False):
    """Compute the external-mesh-hit planes for `bounce(..., ext=...)`:
    run the mesh closest hit (the binned intersector / BVH8 walk via
    pallas_bvh_closest, CPU skip-link walk under interpret), gather the
    winning triangle's attributes (normals/uv/material — the XLA side of
    the split: per-lane gathers have no Mosaic lowering), and join the
    material columns per lane. t_cap from the caller's cheap dense-class
    pass prunes the traversal (bvh.go:69-82's shrinking rayT.Max)."""
    from go_raytracer_tpu.ops import trace as trace_mod

    # both routes walk the BVH; a sub-threshold mesh (has_tri_bvh False,
    # dummy 1-node tree) would silently return all-miss planes — the
    # footgun a round-5 test hit. regen gates use_ext on has_tri_bvh.
    assert scene.has_tri_bvh, "mesh_ext_planes requires a built tri BVH"

    if jax.default_backend() == "tpu" and not interpret:
        t_t, i_t = trace_mod.pallas_bvh_closest(scene, o, d, t_cap=t_cap,
                                                alive=alive)
    else:
        t_t, i_t = trace_mod.bvh_tri_closest(scene, o, d, trace_mod.T_MIN,
                                             trace_mod.INF)
        i_t = jnp.where(jnp.isfinite(t_t), i_t, -1)
        t_t = jnp.where(t_t < t_cap, t_t, jnp.inf)
    # the binned/walk kernels return the UNTOUCHED cap (finite) with
    # idx = -1 when no triangle beats it — gate on the idx
    hit = jnp.isfinite(t_t) & (i_t >= 0) & (t_t < t_cap)
    idx = jnp.where(hit, i_t, 0)
    tr = scene.triangles
    t_safe = jnp.where(hit, t_t, 1.0)
    # outward = the interpolated vertex normal when present, else the
    # face normal (objects.go:389-405, 450-456) — UN-flipped; the kernel
    # recomputes front = d . outward < 0 (hittable.go:27-34)
    _, bu, bv, _ = trace_mod.tri_hit_gathered(tr, idx, o, d,
                                              -jnp.inf, jnp.inf)
    w = 1.0 - bu - bv
    vn = tr.vn[idx]
    n_interp = (w[:, None] * vn[:, 0] + bu[:, None] * vn[:, 1]
                + bv[:, None] * vn[:, 2])
    ln = jnp.sqrt(jnp.sum(n_interp * n_interp, axis=-1))
    n_interp = n_interp / jnp.maximum(ln, 1e-30)[:, None]
    n_raw = jnp.where(tr.has_vn[idx][:, None], n_interp, tr.n_face[idx])
    ext = [jnp.where(hit, t_safe, jnp.inf),
           n_raw[:, 0], n_raw[:, 1], n_raw[:, 2]]
    if statics["has_image"]:
        uvt = tr.uv[idx]
        uv_i = (w[:, None] * uvt[:, 0] + bu[:, None] * uvt[:, 1]
                + bv[:, None] * uvt[:, 2])
        ext.append(jnp.where(tr.has_uv[idx], uv_i[:, 0], bu))
        ext.append(jnp.where(tr.has_uv[idx], uv_i[:, 1], bv))
    lay = _mat_layout(statics)
    ext.extend(join_mat_cols(scene, lay, tr.mat_id[idx]))
    return tuple(ext)


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


def _fused_kernel(st, has_defocus, max_depth, n_inner,
                  prim_ref, light_ref, med_ref, blk_ref, cam_ref, bg_ref,
                  seed_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  time_ref, alive_ref, depth_ref,
                  take_ref, pi_ref, pj_ref, si_ref, sj_ref,
                  *out_refs):
    """`n_inner` bounce steps per invocation: the queue refill happens only
    at inner step 0 (aligned with the regen start cadence), so the XLA
    bookkeeping around the kernel is paid once per n_inner bounces.

    out_refs layout: record stacks Vr,Vg,Vb,FL
    [+ ratio,u,v,img_id when has_image], each (n_inner, R, 128). V is the
    MERGED emission/weight plane: a vertex never has both E != 0 and
    W != 0 (lights/background terminate, scatterers don't emit —
    materials.go), so one f32 triple + a flag bit carries both; FL packs
    bit0 = firefly-clamp flag, bit1 = emit. 7 record planes become 4 —
    the record traffic is the window's main HBM cost. This is the
    native component-plane layout the regen reverse scan consumes, so no
    XLA-side (N,3) interleave/stack copies happen per step; then a
    per-tile (1, n_inner) SMEM segment-count row (popcount of the alive
    mask per inner step — replaces a full (N,) mask plane); then the
    final state planes (o xyz, d xyz, time, alive, depth)."""
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

    bg = (bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2])
    n_u_step = N_U + st["n_media"]
    n_rec = 4 + (4 if st["has_image"] else 0)
    refs = iter(out_refs)
    rec_refs = [next(refs) for _ in range(n_rec)]  # (n_inner, R, 128) each
    seg_ref = next(refs)                           # (1, n_inner) SMEM counts
    (sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
     stm_ref, salive_ref, sdepth_ref) = [next(refs) for _ in range(9)]

    for j in range(n_inner):
        u = [u01(N_U_RAYGEN + j * n_u_step + k) for k in range(n_u_step)]
        (vr, vg, vb, emit, cf, nox, noy, noz, ndx, ndy, ndz,
         alive_out, img_out) = \
            _bounce_core(st, prim_ref, light_ref, med_ref, blk_ref, bg,
                         ox, oy, oz, dx, dy, dz, tm, alive, u)
        rec_refs[0][j, :, :] = vr
        rec_refs[1][j, :, :] = vg
        rec_refs[2][j, :, :] = vb
        rec_refs[3][j, :, :] = (cf.astype(jnp.int32)
                                | (emit.astype(jnp.int32) << 1))
        # whole (n_tiles, n_inner) SMEM buffer mapped to every grid step
        # (a (1, n_inner) block would fail Mosaic's divisibility check);
        # each tile owns its program_id row
        seg_ref[pl.program_id(0), j] = jnp.sum(alive.astype(jnp.int32))
        if st["has_image"]:
            for ref, val in zip(rec_refs[4:], img_out):
                ref[j, :, :] = val
        # depth cap (camera.go:293-296): level depth+1 was just recorded; a
        # path gets exactly max_depth+1 levels
        alive_out = alive_out & (depth < max_depth)
        depth = jnp.where(alive, depth + 1, depth)
        ox, oy, oz = nox, noy, noz
        dx, dy, dz = ndx, ndy, ndz
        alive = alive_out

    sox_ref[:] = ox
    soy_ref[:] = oy
    soz_ref[:] = oz
    sdx_ref[:] = dx
    sdy_ref[:] = dy
    sdz_ref[:] = dz
    stm_ref[:] = tm
    salive_ref[:] = alive.astype(jnp.int32)
    sdepth_ref[:] = depth


def pack_camera(arrays) -> jnp.ndarray:
    """Flatten CameraArrays to the fused kernel's (1, 20) row."""
    return jnp.concatenate([
        arrays.pixel00, arrays.du, arrays.dv, arrays.center,
        arrays.defocus_u, arrays.defocus_v,
        jnp.asarray([arrays.recip_spp_sqrt, 0.0], jnp.float32),
    ]).astype(jnp.float32).reshape(1, 20)


@functools.partial(jax.jit, static_argnames=("st_key", "has_defocus",
                                             "max_depth", "n_inner",
                                             "interpret"))
def _bounce_fused_jit(prims, lights, med, blk, cam_row, bg, seed,
                      ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                      take_i32, pi, pj, si, sj,
                      st_key, has_defocus, max_depth, n_inner, interpret):
    st = dict(st_key)
    n = ox.shape[0]
    assert n % (TILE_ROWS * LANE) == 0, n
    rows = n // LANE
    shape = (rows, LANE)
    # state arrives as component planes, so every conversion here is a
    # FREE reshape — carrying (N, 3) state across the scan boundary cost
    # ~14 strided slice/stack ops per iteration in the compiled while body
    # (the (4,128)-tiled layout makes [:, c] slices read-amplified 3x)
    plane = lambda x: x.reshape(rows, LANE)
    state_planes = [plane(x) for x in
                    (ox, oy, oz, dx, dy, dz, time, alive_i32, depth)]
    refill_planes = [plane(take_i32), plane(pi), plane(pj),
                     plane(si), plane(sj)]

    kernel = functools.partial(_fused_kernel, st, has_defocus, max_depth,
                               n_inner)

    grid = (rows // TILE_ROWS,)
    n_tiles = rows // TILE_ROWS
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    rec_spec = pl.BlockSpec((n_inner, TILE_ROWS, LANE), lambda i: (0, i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    in_specs = ([table_spec(prims), table_spec(lights), table_spec(med),
                 table_spec(blk),
                 pl.BlockSpec((1, 20), lambda i: (0, 0)),
                 pl.BlockSpec((1, 3), lambda i: (0, 0)),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [row_spec] * (9 + 5))
    f32 = jnp.float32
    n_img = 4 if st["has_image"] else 0
    rec_dtypes = [f32] * 3 + [jnp.int32] + [f32] * n_img
    rec_shape = (n_inner, rows, LANE)
    out_specs = ([rec_spec] * len(rec_dtypes)
                 + [pl.BlockSpec((n_tiles, n_inner), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)]
                 + [row_spec] * 9)
    out_shapes = ([jax.ShapeDtypeStruct(rec_shape, dt) for dt in rec_dtypes]
                  + [jax.ShapeDtypeStruct((n_tiles, n_inner), jnp.int32)]
                  + [jax.ShapeDtypeStruct(shape, f32)] * 7
                  + [jax.ShapeDtypeStruct(shape, jnp.int32)] * 2)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(prims, lights, med, blk, cam_row, bg.reshape(1, 3).astype(f32),
      seed.reshape(1).astype(jnp.int32), *state_planes, *refill_planes)

    unp = lambda x: x.reshape(n)
    n_rec = len(rec_dtypes)
    # record planes stay in native layout: (n_inner, rows, 128) -> a free
    # reshape to (n_inner, N); the regen reverse scan consumes them as-is
    rec_planes = tuple(x.reshape(n_inner, n) for x in outs[:4])
    img_planes = tuple(x.reshape(n_inner, n) for x in outs[4:n_rec]) \
        if n_img else None
    seg_counts = jnp.sum(outs[n_rec], axis=0)  # (n_inner,)
    state_out = tuple(unp(x) for x in outs[n_rec + 1:])
    return (rec_planes, img_planes, seg_counts) + state_out


def bounce_fused(scene_tables, statics, cam_row, bg, seed,
                 ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                 take_i32, pi, pj, si, sj,
                 *, has_defocus, max_depth, n_inner=1, interpret=False):
    """`n_inner` fused regeneration steps in one kernel call (refill only
    at the first). All lane arrays are flat (N,) component planes with N a
    multiple of TILE_ROWS*128 (the regen pool is sized accordingly) —
    (N, 3) vectors never cross this boundary, so the kernel's
    (rows, 128)-plane conversions are free reshapes.

    Returns (rec_planes, img_planes, seg_counts, ox', oy', oz', dx', dy',
    dz', time', alive', depth'): rec_planes = (Vr, Vg, Vb, fl_i32) —
    merged E/W value planes + flag bits (bit0 clamp, bit1 emit), each
    (n_inner, N) in native lane order; img_planes = None or
    (ratio, u, v, img_id) with the same shape; seg_counts = (n_inner,)
    traced-segment counts."""
    prims, lights, med, blk = scene_tables
    return _bounce_fused_jit(prims, lights, med, blk, cam_row, bg, seed,
                             ox, oy, oz, dx, dy, dz, time, alive_i32,
                             depth, take_i32, pi, pj, si, sj,
                             st_key=_statics_key(statics),
                             has_defocus=has_defocus, max_depth=max_depth,
                             n_inner=n_inner, interpret=interpret)


# --------------------------------------------------------------------------
# Positional-schedule fused kernel: the refill decision moves INSIDE the
# kernel and runs at EVERY inner bounce step.
#
# The queue schedule can only refill at the cadence boundary because its
# lane->item rank is a global cumsum (XLA-side); the positional schedule's
# take is the purely per-lane test `dead & rem > 0`, so the kernel can
# restart a lane the very step its path dies — no dead-lane idle between
# paths — and the start-opportunity supply per window becomes `refill`
# STEPS instead of refill/cadence rows (the measured failure mode of the
# XLA-side positional harvest, integrator/regen.py).
#
# Each lane carries its next-item pointer as four small-integer f32 planes
# (pi, pj = pixel column/row; si, sj = stratum indices) plus a remaining
# count; advancing to the next (pixel-major) item is a chain of exact
# carry selects — no integer division anywhere. The reverse scan retreats
# the same counters to recover each harvest's pixel slot.
# --------------------------------------------------------------------------


def _fused_pos_kernel(st, has_defocus, max_depth, n_inner, width, sqrt_spp,
                      prim_ref, light_ref, med_ref, blk_ref, cam_ref,
                      bg_ref, seed_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      time_ref, alive_ref, depth_ref,
                      pi_ref, pj_ref, si_ref, sj_ref, rem_ref,
                      *out_refs):
    """Like `_fused_kernel` but with the positional scheduler fused in:
    per inner step, dead lanes with remaining quota immediately start
    their next item (camera ray-gen in-kernel as before), the item
    pointer advances by exact f32 carry selects, and a per-step `started`
    record plane is emitted for the reverse scan's harvest.

    seed_ref is SMEM (2,): [step seed, refill steps remaining] — refills
    happen at inner step j only while j < seed_ref[1], so the window's
    refill cutoff lands mid-call on the last refill iteration."""
    shape = ox_ref.shape
    lane = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * np.uint32(LANE)
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            + pl.program_id(0).astype(jnp.uint32)
            * np.uint32(shape[0] * LANE))
    seed = seed_ref[0].astype(jnp.uint32)
    u01 = lambda slot: _u01(lane, seed, slot)

    cam = cam_ref  # (1, 20): pixel00 du dv center dfu dfv recip_sqrt
    recip = cam[0, 18]
    bg = (bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2])
    n_u_step = N_U + st["n_media"]
    slots_per_step = N_U_RAYGEN + n_u_step
    n_rec = 8 + (4 if st["has_image"] else 0)
    refs = iter(out_refs)
    rec_refs = [next(refs) for _ in range(n_rec)]  # (n_inner, R, 128)
    seg_ref = next(refs)                           # (n_tiles, n_inner) SMEM
    (sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref, stm_ref,
     salive_ref, sdepth_ref, spi_ref, spj_ref, ssi_ref, ssj_ref,
     srem_ref) = [next(refs) for _ in range(14)]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = time_ref[:]
    alive = alive_ref[:] > 0
    depth = depth_ref[:]
    pi, pj = pi_ref[:], pj_ref[:]
    si, sj = si_ref[:], sj_ref[:]
    rem = rem_ref[:]

    for j in range(n_inner):
        base = j * slots_per_step
        # ---- per-step refill: dead & remaining & inside the refill span
        may_refill = seed_ref[1] > j
        take = jnp.logical_and(
            jnp.logical_and(jnp.logical_not(alive), rem > 0.5),
            may_refill)
        rec_refs[7][j, :, :] = take.astype(jnp.int32)

        # ---- camera ray generation (camera.go:256-270) for taken lanes
        u_jx = u01(base + 0)
        u_jy = u01(base + 1)
        off_x = (si + u_jx) * recip - 0.5
        off_y = (sj + u_jy) * recip - 0.5
        px = pi + off_x
        py = pj + off_y
        sx = cam[0, 0] + px * cam[0, 3] + py * cam[0, 6]
        sy = cam[0, 1] + px * cam[0, 4] + py * cam[0, 7]
        sz = cam[0, 2] + px * cam[0, 5] + py * cam[0, 8]
        if has_defocus:
            u_da = u01(base + 2)
            u_db = u01(base + 3)
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
        u_t = u01(base + 4)
        ox = jnp.where(take, cx, ox)
        oy = jnp.where(take, cy, oy)
        oz = jnp.where(take, cz, oz)
        dx = jnp.where(take, sx - cx, dx)
        dy = jnp.where(take, sy - cy, dy)
        dz = jnp.where(take, sz - cz, dz)
        tm = jnp.where(take, u_t, tm)
        alive = jnp.logical_or(alive, take)
        depth = jnp.where(take, 0, depth)

        # ---- advance the item pointer (pixel-major: sj fast, then si,
        # then pixel column pi, then pixel row pj) — exact f32 carries
        tk = take.astype(jnp.float32)
        sj_n = sj + 1.0
        wrap_s = sj_n > (sqrt_spp - 0.5)
        sj_n = jnp.where(wrap_s, 0.0, sj_n)
        si_n = si + jnp.where(wrap_s, 1.0, 0.0)
        wrap_i = si_n > (sqrt_spp - 0.5)
        si_n = jnp.where(wrap_i, 0.0, si_n)
        adv_p = jnp.logical_and(wrap_s, wrap_i)
        pi_n = pi + jnp.where(adv_p, 1.0, 0.0)
        wrap_p = pi_n > (width - 0.5)
        pi_n = jnp.where(wrap_p, 0.0, pi_n)
        pj_n = pj + jnp.where(wrap_p, 1.0, 0.0)
        pi = jnp.where(take, pi_n, pi)
        pj = jnp.where(take, pj_n, pj)
        si = jnp.where(take, si_n, si)
        sj = jnp.where(take, sj_n, sj)
        rem = rem - tk

        # ---- the bounce itself
        u = [u01(base + N_U_RAYGEN + k) for k in range(n_u_step)]
        (vr, vg, vb, emit, cf, nox, noy, noz, ndx, ndy, ndz,
         alive_out, img_out) = \
            _bounce_core(st, prim_ref, light_ref, med_ref, blk_ref, bg,
                         ox, oy, oz, dx, dy, dz, tm, alive, u)
        zero_p = jnp.zeros_like(vr)
        rec_refs[0][j, :, :] = jnp.where(emit, vr, zero_p)
        rec_refs[1][j, :, :] = jnp.where(emit, vg, zero_p)
        rec_refs[2][j, :, :] = jnp.where(emit, vb, zero_p)
        rec_refs[3][j, :, :] = jnp.where(emit, zero_p, vr)
        rec_refs[4][j, :, :] = jnp.where(emit, zero_p, vg)
        rec_refs[5][j, :, :] = jnp.where(emit, zero_p, vb)
        rec_refs[6][j, :, :] = cf.astype(jnp.int32)
        seg_ref[pl.program_id(0), j] = jnp.sum(alive.astype(jnp.int32))
        if st["has_image"]:
            for ref, val in zip(rec_refs[8:], img_out):
                ref[j, :, :] = val
        # depth cap (camera.go:293-296)
        alive_out = jnp.logical_and(alive_out, depth < max_depth)
        depth = jnp.where(alive, depth + 1, depth)
        ox, oy, oz = nox, noy, noz
        dx, dy, dz = ndx, ndy, ndz
        alive = alive_out

    sox_ref[:] = ox
    soy_ref[:] = oy
    soz_ref[:] = oz
    sdx_ref[:] = dx
    sdy_ref[:] = dy
    sdz_ref[:] = dz
    stm_ref[:] = tm
    salive_ref[:] = alive.astype(jnp.int32)
    sdepth_ref[:] = depth
    spi_ref[:] = pi
    spj_ref[:] = pj
    ssi_ref[:] = si
    ssj_ref[:] = sj
    srem_ref[:] = rem


@functools.partial(jax.jit, static_argnames=("st_key", "has_defocus",
                                             "max_depth", "n_inner",
                                             "width", "sqrt_spp",
                                             "interpret"))
def _bounce_fused_pos_jit(prims, lights, med, blk, cam_row, bg, seed2,
                          ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                          pi, pj, si, sj, rem,
                          st_key, has_defocus, max_depth, n_inner, width,
                          sqrt_spp, interpret):
    st = dict(st_key)
    n = ox.shape[0]
    assert n % (TILE_ROWS * LANE) == 0, n
    rows = n // LANE
    shape = (rows, LANE)
    plane = lambda x: x.reshape(rows, LANE)
    state_planes = [plane(x) for x in
                    (ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                     pi, pj, si, sj, rem)]

    kernel = functools.partial(_fused_pos_kernel, st, has_defocus,
                               max_depth, n_inner, width, sqrt_spp)

    grid = (rows // TILE_ROWS,)
    n_tiles = rows // TILE_ROWS
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0))
    rec_spec = pl.BlockSpec((n_inner, TILE_ROWS, LANE), lambda i: (0, i, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    in_specs = ([table_spec(prims), table_spec(lights), table_spec(med),
                 table_spec(blk),
                 pl.BlockSpec((1, 20), lambda i: (0, 0)),
                 pl.BlockSpec((1, 3), lambda i: (0, 0)),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [row_spec] * 14)
    f32 = jnp.float32
    n_img = 4 if st["has_image"] else 0
    rec_dtypes = [f32] * 6 + [jnp.int32, jnp.int32] + [f32] * n_img
    rec_shape = (n_inner, rows, LANE)
    out_specs = ([rec_spec] * len(rec_dtypes)
                 + [pl.BlockSpec((n_tiles, n_inner), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)]
                 + [row_spec] * 14)
    out_shapes = ([jax.ShapeDtypeStruct(rec_shape, dt) for dt in rec_dtypes]
                  + [jax.ShapeDtypeStruct((n_tiles, n_inner), jnp.int32)]
                  + [jax.ShapeDtypeStruct(shape, f32)] * 7
                  + [jax.ShapeDtypeStruct(shape, jnp.int32)] * 2
                  + [jax.ShapeDtypeStruct(shape, f32)] * 5)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(prims, lights, med, blk, cam_row, bg.reshape(1, 3).astype(f32),
      seed2.reshape(2).astype(jnp.int32), *state_planes)

    unp = lambda x: x.reshape(n)
    n_rec = len(rec_dtypes)
    rec_planes = tuple(x.reshape(n_inner, n) for x in outs[:8])
    img_planes = tuple(x.reshape(n_inner, n) for x in outs[8:n_rec]) \
        if n_img else None
    seg_counts = jnp.sum(outs[n_rec], axis=0)  # (n_inner,)
    state_out = tuple(unp(x) for x in outs[n_rec + 1:])
    return (rec_planes, img_planes, seg_counts) + state_out


def bounce_fused_pos(scene_tables, statics, cam_row, bg, seed2,
                     ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                     pi, pj, si, sj, rem,
                     *, has_defocus, max_depth, n_inner=1, width=0,
                     sqrt_spp=0, interpret=False):
    """`n_inner` fused positional-regeneration steps in one kernel call
    with PER-STEP refill (see `_fused_pos_kernel`). Returns
    (rec_planes, img_planes, seg_counts, state...): rec_planes =
    (Er, Eg, Eb, Wr, Wg, Wb, cf_i32, started_i32), each (n_inner, N);
    state = (o xyz, d xyz, time, alive_i32, depth, pi, pj, si, sj, rem)."""
    prims, lights, med, blk = scene_tables
    return _bounce_fused_pos_jit(prims, lights, med, blk, cam_row, bg,
                                 seed2, ox, oy, oz, dx, dy, dz, time,
                                 alive_i32, depth, pi, pj, si, sj, rem,
                                 st_key=_statics_key(statics),
                                 has_defocus=has_defocus,
                                 max_depth=max_depth, n_inner=n_inner,
                                 width=width, sqrt_spp=sqrt_spp,
                                 interpret=interpret)


# --------------------------------------------------------------------------
# In-kernel QUEUE scheduler: the dynamic item queue's refill moves inside
# the kernel and runs at EVERY inner bounce step.
#
# The XLA-side queue (bounce_fused) can only refill at the cadence boundary
# because the lane->item rank is a global cumsum computed by XLA between
# kernel calls, so a lane that dies mid-call idles until the next call —
# the occupancy/cadence tradeoff that priced the flagship at 0.45 occupancy
# (cadence 4). The positional schedule (bounce_fused_pos) fixed the idle
# with per-lane static quotas but lost the queue's load balancing (measured
# 2x worse end-to-end, docs/PERFORMANCE.md). This kernel keeps the DYNAMIC
# queue and still refills per step:
#
# * grid = (n_inner, n_tiles) with the bounce level OUTERMOST: TPU grids
#   execute sequentially on the core, so one SMEM cursor scalar carried
#   across grid steps is a race-free global queue — tile t at level j reads
#   the cursor after tiles 0..t-1 of level j advanced it, which also makes
#   each level's item assignment CONTIGUOUS in flat lane order (the
#   invariant the harvest compaction needs: a level's started lanes in lane
#   order are consecutive items).
# * lane state lives in VMEM scratch planes across grid steps (the
#   level-major order revisits each tile once per level, so state cannot
#   ride the block pipeline); inputs seed the scratch at level 0 and the
#   final level writes the state outputs.
# * a lane's in-tile rank among dead lanes is one (TILE_ROWS, LANE)
#   triangular-ones MXU matmul + a log-roll sublane ladder (exact in f32:
#   counts <= 4096).
# * the absolute item id (cursor + rank, int32) decomposes to
#   (pixel, stratum) -> (pi, pj, si, sj) with exact f32-divide-plus-int32-
#   fixup arithmetic (`_item_to_coords`) — items exceed 2^24 on the
#   reference configs (book2: 64M), so plain f32 division would be off.
# * per-level `started` record planes + the level-major execution let the
#   XLA epilogue reconstruct each level's item base as
#   next_item + exclusive-cumsum(per-level take counts) — no SMEM base
#   output needed.
#
# The kernel body is ONE bounce step (the level loop is the grid), so
# Mosaic instruction count no longer scales with the cadence: cadence
# becomes pure shell amortization with no occupancy penalty and no
# compile-time multiplier.
# --------------------------------------------------------------------------


def _tile_rank_exclusive(m_i32):
    """Exclusive prefix count of set flags over a (TILE_ROWS, LANE) tile in
    row-major flat order (harvest.py's construction at tile shape)."""
    m_f = m_i32.astype(jnp.float32)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
           ).astype(jnp.float32)
    inc = jax.lax.dot_general(m_f, tri, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    row_tot = jax.lax.broadcast_in_dim(inc[:, LANE - 1],
                                       (TILE_ROWS, LANE), (0,))
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0)
    t = jnp.where(sub >= 1, pltpu.roll(row_tot, 1, 0), 0.0)
    sh = 1
    while sh < TILE_ROWS:
        t = t + jnp.where(sub >= sh + 1, pltpu.roll(t, sh, 0), 0.0)
        sh *= 2
    return (t + inc - m_f).astype(jnp.int32)


def _div_fixup(num_i32, den: int, q0_i32):
    """Correct a +-1-accurate quotient guess to exact floor division:
    returns (num // den, num % den) given |q0 - num//den| <= 1."""
    r = num_i32 - q0_i32 * den
    under = (r < 0).astype(jnp.int32)
    over = (r >= den).astype(jnp.int32)
    return q0_i32 - under + over, r + under * den - over * den


def _item_to_coords(item_i32, npix: int, width: int, sqrt_spp: int):
    """Exact (pi, pj, si, sj) for stratum-major item ids
    (item = stratum * npix + pixel, pixel = pj * width + pi,
    stratum = si * sqrt_spp + sj — integrator/regen.py refill_assign).

    Works for any 0 <= item < 2^31: the f32 quotient guess
    floor(f32(item) / npix) is within +-1 of truth (relative f32 error
    ~2^-23 times item/npix < 2^31/9e4 stays far below 1), and the int32
    fixup makes it exact; the remainders are < 2^24, exact in f32. Two
    fixup rounds on the first division out of caution at large items.
    Pure jnp — used inside the Mosaic kernel and unit-tested directly
    (tests/test_ikq.py)."""
    f32 = jnp.float32
    q0 = jnp.floor(item_i32.astype(f32) * np.float32(1.0 / npix)) \
        .astype(jnp.int32)
    stratum, pixel = _div_fixup(item_i32, npix, q0)
    stratum, pixel = _div_fixup(item_i32, npix, stratum)  # safety round
    pj0 = jnp.floor(pixel.astype(f32) * np.float32(1.0 / width)) \
        .astype(jnp.int32)
    pj, pi = _div_fixup(pixel, width, pj0)
    si0 = jnp.floor(stratum.astype(f32) * np.float32(1.0 / sqrt_spp)) \
        .astype(jnp.int32)
    si, sj = _div_fixup(stratum, sqrt_spp, si0)
    return pi, pj, si, sj


def _u01_dyn(lane_u32, seed_u32, slot_u32):
    """`_u01` with a TRACED slot (the in-kernel-queue grid makes the inner
    step index a program id, not a Python constant)."""
    x = lane_u32 ^ (seed_u32 * np.uint32(0x9E3779B9)) \
        ^ (slot_u32 * np.uint32(0x632BE5AB))
    bits = _mix32(x)
    f = jax.lax.bitcast_convert_type(
        (bits >> np.uint32(9)) | np.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _fused_q_kernel(st, has_defocus, max_depth, n_inner, width, sqrt_spp,
                    npix,
                    prim_ref, light_ref, med_ref, blk_ref, cam_ref,
                    bg_ref, seed_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    time_ref, alive_ref, depth_ref,
                    *refs):
    """One bounce level for one lane tile per grid step; see the section
    comment. seed_ref is SMEM (4,): [step seed, refill steps remaining,
    queue cursor (next item id), item_end]."""
    j = pl.program_id(0)
    t = pl.program_id(1)
    n_img = 4 if st["has_image"] else 0
    n_rec = 4 + n_img
    rec_refs = refs[:n_rec]                       # (1, TILE_ROWS, 128) each
    seg_ref = refs[n_rec]                         # (n_tiles, n_inner) SMEM
    takes_ref = refs[n_rec + 1]                   # (n_tiles, n_inner) SMEM
    state_out = refs[n_rec + 2:n_rec + 11]        # (TILE_ROWS, 128) each
    scr = refs[n_rec + 11:n_rec + 20]             # (rows, 128) VMEM scratch
    cur_ref = refs[n_rec + 20]                    # (1,) SMEM cursor

    sl = pl.ds(t * TILE_ROWS, TILE_ROWS)

    @pl.when(j == 0)
    def _seed_scratch():
        scr[0][sl] = ox_ref[:]
        scr[1][sl] = oy_ref[:]
        scr[2][sl] = oz_ref[:]
        scr[3][sl] = dx_ref[:]
        scr[4][sl] = dy_ref[:]
        scr[5][sl] = dz_ref[:]
        scr[6][sl] = time_ref[:]
        scr[7][sl] = alive_ref[:]
        scr[8][sl] = depth_ref[:]

    @pl.when(jnp.logical_and(j == 0, t == 0))
    def _seed_cursor():
        cur_ref[0] = seed_ref[2]

    ox, oy, oz = scr[0][sl], scr[1][sl], scr[2][sl]
    dx, dy, dz = scr[3][sl], scr[4][sl], scr[5][sl]
    tm = scr[6][sl]
    alive = scr[7][sl] > 0
    depth = scr[8][sl]

    shape = (TILE_ROWS, LANE)
    lane = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * np.uint32(LANE)
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            + t.astype(jnp.uint32) * np.uint32(TILE_ROWS * LANE))
    seed = seed_ref[0].astype(jnp.uint32)
    n_u_step = N_U + st["n_media"]
    slots_per_step = N_U_RAYGEN + n_u_step
    slot0 = j.astype(jnp.uint32) * np.uint32(slots_per_step)
    u01 = lambda k: _u01_dyn(lane, seed, slot0 + np.uint32(k))

    # ---- per-level queue refill: dead lanes take the next items --------
    dead = jnp.logical_not(alive)
    rank = _tile_rank_exclusive(dead.astype(jnp.int32))
    cur = cur_ref[0]
    item = cur + rank
    take = jnp.logical_and(dead, item < seed_ref[3])
    take = jnp.logical_and(take, seed_ref[1] > j)
    n_take = jnp.sum(take.astype(jnp.int32))
    cur_ref[0] = cur + n_take
    takes_ref[t, j] = n_take
    pi_i, pj_i, si_i, sj_i = _item_to_coords(item, npix, width, sqrt_spp)
    pi = pi_i.astype(jnp.float32)
    pj = pj_i.astype(jnp.float32)
    si = si_i.astype(jnp.float32)
    sj = sj_i.astype(jnp.float32)

    # ---- camera ray generation (camera.go:256-270) for taken lanes -----
    cam = cam_ref
    recip = cam[0, 18]
    u_jx = u01(0)
    u_jy = u01(1)
    off_x = (si + u_jx) * recip - 0.5
    off_y = (sj + u_jy) * recip - 0.5
    px = pi + off_x
    py = pj + off_y
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
    ox = jnp.where(take, cx, ox)
    oy = jnp.where(take, cy, oy)
    oz = jnp.where(take, cz, oz)
    dx = jnp.where(take, sx - cx, dx)
    dy = jnp.where(take, sy - cy, dy)
    dz = jnp.where(take, sz - cz, dz)
    tm = jnp.where(take, u_t, tm)
    alive = jnp.logical_or(alive, take)
    depth = jnp.where(take, 0, depth)

    # ---- the bounce itself ---------------------------------------------
    bg = (bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2])
    u = [u01(N_U_RAYGEN + k) for k in range(n_u_step)]
    (vr, vg, vb, emit, cf, nox, noy, noz, ndx, ndy, ndz,
     alive_out, img_out) = \
        _bounce_core(st, prim_ref, light_ref, med_ref, blk_ref, bg,
                     ox, oy, oz, dx, dy, dz, tm, alive, u)
    rec_refs[0][0] = vr
    rec_refs[1][0] = vg
    rec_refs[2][0] = vb
    # flag bits: 0 = firefly-clamp, 1 = emit, 2 = started (queue take)
    rec_refs[3][0] = (cf.astype(jnp.int32)
                      | (emit.astype(jnp.int32) << 1)
                      | (take.astype(jnp.int32) << 2))
    seg_ref[t, j] = jnp.sum(alive.astype(jnp.int32))
    if st["has_image"]:
        for ref, val in zip(rec_refs[4:], img_out):
            ref[0] = val
    # depth cap (camera.go:293-296)
    alive_out = jnp.logical_and(alive_out, depth < max_depth)
    depth = jnp.where(alive, depth + 1, depth)

    scr[0][sl] = nox
    scr[1][sl] = noy
    scr[2][sl] = noz
    scr[3][sl] = ndx
    scr[4][sl] = ndy
    scr[5][sl] = ndz
    scr[6][sl] = tm
    scr[7][sl] = alive_out.astype(jnp.int32)
    scr[8][sl] = depth
    state_out[0][:] = nox
    state_out[1][:] = noy
    state_out[2][:] = noz
    state_out[3][:] = ndx
    state_out[4][:] = ndy
    state_out[5][:] = ndz
    state_out[6][:] = tm
    state_out[7][:] = alive_out.astype(jnp.int32)
    state_out[8][:] = depth


@functools.partial(jax.jit, static_argnames=("st_key", "has_defocus",
                                             "max_depth", "n_inner",
                                             "width", "sqrt_spp", "npix",
                                             "interpret"))
def _bounce_fused_q_jit(prims, lights, med, blk, cam_row, bg, seed4,
                        ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                        st_key, has_defocus, max_depth, n_inner, width,
                        sqrt_spp, npix, interpret):
    st = dict(st_key)
    n = ox.shape[0]
    assert n % (TILE_ROWS * LANE) == 0, n
    rows = n // LANE
    shape = (rows, LANE)
    plane = lambda x: x.reshape(rows, LANE)
    state_planes = [plane(x) for x in
                    (ox, oy, oz, dx, dy, dz, time, alive_i32, depth)]

    kernel = functools.partial(_fused_q_kernel, st, has_defocus, max_depth,
                               n_inner, width, sqrt_spp, npix)

    n_tiles = rows // TILE_ROWS
    grid = (n_inner, n_tiles)
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda j, t: (t, 0))
    rec_spec = pl.BlockSpec((1, TILE_ROWS, LANE), lambda j, t: (j, t, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda j, t: (0, 0))
    in_specs = ([table_spec(prims), table_spec(lights), table_spec(med),
                 table_spec(blk),
                 pl.BlockSpec((1, 20), lambda j, t: (0, 0)),
                 pl.BlockSpec((1, 3), lambda j, t: (0, 0)),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [row_spec] * 9)
    f32 = jnp.float32
    i32 = jnp.int32
    n_img = 4 if st["has_image"] else 0
    rec_dtypes = [f32] * 3 + [i32] + [f32] * n_img
    rec_shape = (n_inner, rows, LANE)
    smem_counts = pl.BlockSpec((n_tiles, n_inner), lambda j, t: (0, 0),
                               memory_space=pltpu.SMEM)
    out_specs = ([rec_spec] * len(rec_dtypes)
                 + [smem_counts, smem_counts]
                 + [row_spec] * 9)
    out_shapes = ([jax.ShapeDtypeStruct(rec_shape, dt) for dt in rec_dtypes]
                  + [jax.ShapeDtypeStruct((n_tiles, n_inner), i32)] * 2
                  + [jax.ShapeDtypeStruct(shape, f32)] * 7
                  + [jax.ShapeDtypeStruct(shape, i32)] * 2)
    scratch = ([pltpu.VMEM(shape, f32)] * 7 + [pltpu.VMEM(shape, i32)] * 2
               + [pltpu.SMEM((1,), i32)])
    # state scratch (9 x rows*512B) + resident tables can push past the
    # 16MB default scoped budget at 128k lanes
    table_bytes = sum(a.size * 4 for a in (prims, lights, med, blk))
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(9 * rows * LANE * 4 + table_bytes
                             + 24 * 1024 * 1024))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(prims, lights, med, blk, cam_row, bg.reshape(1, 3).astype(f32),
      seed4.reshape(4).astype(i32), *state_planes)

    unp = lambda x: x.reshape(n)
    n_rec = len(rec_dtypes)
    rec_planes = tuple(x.reshape(n_inner, n) for x in outs[:4])
    img_planes = tuple(x.reshape(n_inner, n) for x in outs[4:n_rec]) \
        if n_img else None
    seg_counts = jnp.sum(outs[n_rec], axis=0)       # (n_inner,)
    take_counts = jnp.sum(outs[n_rec + 1], axis=0)  # (n_inner,)
    state_out = tuple(unp(x) for x in outs[n_rec + 2:])
    return (rec_planes, img_planes, seg_counts, take_counts) + state_out


def bounce_fused_q(scene_tables, statics, cam_row, bg, seed4,
                   ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                   *, has_defocus, max_depth, n_inner=1, width=0,
                   sqrt_spp=0, npix=0, interpret=False):
    """`n_inner` fused queue-regeneration steps in one kernel call with
    PER-STEP dynamic-queue refill (see `_fused_q_kernel`). seed4 =
    [step seed, refill steps remaining, next item id, item_end] (int32).
    Returns (rec_planes, img_planes, seg_counts, take_counts, state...):
    rec_planes = (Vr, Vg, Vb, fl_i32) — merged E/W value planes + flag
    bits (bit0 clamp, bit1 emit, bit2 started), each (n_inner, N);
    take_counts = per-level started counts (n_inner,), summed from the
    kernel's SMEM tile counters; state = (o xyz, d xyz, time, alive_i32,
    depth). The caller recovers per-level item bases as next_item +
    exclusive-cumsum of take_counts (items are assigned contiguously per
    level in flat lane order)."""
    prims, lights, med, blk = scene_tables
    return _bounce_fused_q_jit(prims, lights, med, blk, cam_row, bg, seed4,
                               ox, oy, oz, dx, dy, dz, time, alive_i32,
                               depth, st_key=_statics_key(statics),
                               has_defocus=has_defocus, max_depth=max_depth,
                               n_inner=n_inner, width=width,
                               sqrt_spp=sqrt_spp, npix=npix,
                               interpret=interpret)


# --------------------------------------------------------------------------
# Direct-record variant of the in-kernel queue: the kernel writes each
# level's record blocks STRAIGHT INTO the full-window record buffers at a
# scalar-prefetched level offset (PrefetchScalarGridSpec index maps +
# input_output_aliases), so the XLA forward loop carries no per-step
# dynamic-update-slices — the round-5 profile put those at ~11 ms of a
# 129 ms cornell window. Only used when the scene has no image textures
# (the image-uv patch must see each step's planes XLA-side).
# --------------------------------------------------------------------------


def _fused_q_kernel_direct(st, has_defocus, max_depth, n_inner, width,
                           sqrt_spp, npix, base_ref,
                           prim_ref, light_ref, med_ref, blk_ref, cam_ref,
                           bg_ref, seed_ref,
                           ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                           time_ref, alive_ref, depth_ref,
                           *refs):
    """_fused_q_kernel with a leading scalar-prefetch ref (the window
    level base — consumed by the out index maps, not the body) and the
    aliased whole-window record buffers as pass-through ANY inputs."""
    n_img = 4 if st["has_image"] else 0
    n_rec = 4 + n_img
    _fused_q_kernel(st, has_defocus, max_depth, n_inner, width, sqrt_spp,
                    npix, prim_ref, light_ref, med_ref, blk_ref, cam_ref,
                    bg_ref, seed_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    time_ref, alive_ref, depth_ref, *refs[n_rec:])


@functools.partial(jax.jit, static_argnames=("st_key", "has_defocus",
                                             "max_depth", "n_inner",
                                             "width", "sqrt_spp", "npix",
                                             "interpret"),
                   donate_argnums=(8, 9, 10, 11))
def _bounce_fused_q_direct_jit(prims, lights, med, blk, cam_row, bg, seed4,
                               base1, Vr_buf, Vg_buf, Vb_buf, FL_buf,
                               ox, oy, oz, dx, dy, dz, time, alive_i32,
                               depth,
                               st_key, has_defocus, max_depth, n_inner,
                               width, sqrt_spp, npix, interpret):
    st = dict(st_key)
    assert not st["has_image"], "direct-record path excludes image scenes"
    n = ox.shape[0]
    assert n % (TILE_ROWS * LANE) == 0, n
    rows = n // LANE
    shape = (rows, LANE)
    plane = lambda x: x.reshape(rows, LANE)
    state_planes = [plane(x) for x in
                    (ox, oy, oz, dx, dy, dz, time, alive_i32, depth)]

    kernel = functools.partial(_fused_q_kernel_direct, st, has_defocus,
                               max_depth, n_inner, width, sqrt_spp, npix)

    n_tiles = rows // TILE_ROWS
    grid = (n_inner, n_tiles)
    row_spec = pl.BlockSpec((TILE_ROWS, LANE), lambda j, t, b: (t, 0))
    rec_spec = pl.BlockSpec((1, TILE_ROWS, LANE),
                            lambda j, t, b: (b[0] + j, t, 0))
    table_spec = lambda a: pl.BlockSpec(a.shape, lambda j, t, b: (0, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([table_spec(prims), table_spec(lights), table_spec(med),
                 table_spec(blk),
                 pl.BlockSpec((1, 20), lambda j, t, b: (0, 0)),
                 pl.BlockSpec((1, 3), lambda j, t, b: (0, 0)),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [row_spec] * 9
                + [any_spec] * 4)
    f32 = jnp.float32
    i32 = jnp.int32
    rec_dtypes = [f32, f32, f32, i32]
    win = Vr_buf.shape[0]
    smem_counts = pl.BlockSpec((n_tiles, n_inner), lambda j, t, b: (0, 0),
                               memory_space=pltpu.SMEM)
    out_specs = ([rec_spec] * 4
                 + [smem_counts, smem_counts]
                 + [row_spec] * 9)
    out_shapes = ([jax.ShapeDtypeStruct((win, rows, LANE), dt)
                   for dt in rec_dtypes]
                  + [jax.ShapeDtypeStruct((n_tiles, n_inner), i32)] * 2
                  + [jax.ShapeDtypeStruct(shape, f32)] * 7
                  + [jax.ShapeDtypeStruct(shape, i32)] * 2)
    scratch = ([pltpu.VMEM(shape, f32)] * 7 + [pltpu.VMEM(shape, i32)] * 2
               + [pltpu.SMEM((1,), i32)])
    table_bytes = sum(a.size * 4 for a in (prims, lights, med, blk))
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(9 * rows * LANE * 4 + table_bytes
                             + 24 * 1024 * 1024))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    # alias the whole-window record buffers through (indices count the
    # scalar-prefetch operand and the 16 leading inputs before them)
    aliases = {17 + k: k for k in range(4)}
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=params,
        interpret=interpret,
    )(base1, prims, lights, med, blk, cam_row,
      bg.reshape(1, 3).astype(f32), seed4.reshape(4).astype(i32),
      *state_planes, Vr_buf, Vg_buf, Vb_buf, FL_buf)

    unp = lambda x: x.reshape(n)
    bufs = outs[:4]
    seg_counts = jnp.sum(outs[4], axis=0)       # (n_inner,)
    take_counts = jnp.sum(outs[5], axis=0)      # (n_inner,)
    state_out = tuple(unp(x) for x in outs[6:])
    return bufs + (seg_counts, take_counts) + state_out


def bounce_fused_q_direct(scene_tables, statics, cam_row, bg, seed4, base,
                          rec_bufs,
                          ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
                          *, has_defocus, max_depth, n_inner=1, width=0,
                          sqrt_spp=0, npix=0, interpret=False):
    """bounce_fused_q writing records in place: `rec_bufs` =
    (Vr, Vg, Vb, FL) whole-window buffers shaped (window_levels, N//128,
    128); this call's n_inner levels land at rows [base, base+n_inner)
    and every other level keeps its previous contents (aliased buffers).
    Returns (Vr', Vg', Vb', FL', seg_counts, take_counts, state...)."""
    prims, lights, med, blk = scene_tables
    Vr_buf, Vg_buf, Vb_buf, FL_buf = rec_bufs
    return _bounce_fused_q_direct_jit(
        prims, lights, med, blk, cam_row, bg, seed4,
        base.reshape(1).astype(jnp.int32),
        Vr_buf, Vg_buf, Vb_buf, FL_buf,
        ox, oy, oz, dx, dy, dz, time, alive_i32, depth,
        st_key=_statics_key(statics), has_defocus=has_defocus,
        max_depth=max_depth, n_inner=n_inner, width=width,
        sqrt_spp=sqrt_spp, npix=npix, interpret=interpret)
