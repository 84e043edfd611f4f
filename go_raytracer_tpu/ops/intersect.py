"""GEMM-form ray/primitive intersection over dense tables.

TPU-first design: instead of per-ray recursive traversal with virtual
dispatch (reference hittable/bvh.go:69-82 + per-type Hit methods), a bundle
of N rays is intersected against a whole primitive table at once. Every
triple product in the hit equations factors into a matmul of the ray bundle
(N,3) against a precomputed per-primitive matrix (3,P) — so the intersection
inner loop runs on the MXU, with the remaining per-pair work as fused
elementwise VPU ops. Hit semantics (root selection, interval open/closed
rules, epsilon guards) exactly follow the reference:

* sphere: two-root selection with open `Surrounds` interval
  (hittable/objects.go:83-115)
* quad: plane hit + interior alpha/beta test, closed `Contains` intervals
  (hittable/objects.go:167-206)
* triangle: Moller-Trumbore with 1e-8 parallel guard and closed t-interval
  (hittable/objects.go:408-461)

All functions return per-pair hit distances (N, P) with +inf where there is
no hit; the caller min-reduces across tables (ops/trace.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from go_raytracer_tpu.core import vecmath as vm
from go_raytracer_tpu.scene import types as T

INF = jnp.inf
PARALLEL_EPS = 1e-8


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,3) @ (P,3)^T with f32 accumulation on the MXU."""
    return jnp.matmul(a, b.T, preferred_element_type=jnp.float32).astype(a.dtype)


def sphere_ts(sp: T.Spheres, o: jnp.ndarray, d: jnp.ndarray,
              time: jnp.ndarray, t_min: float, t_max: float) -> jnp.ndarray:
    """Hit distances (N, S) for the sphere table.

    Quadratic in GEMM form: with C(t) = C0 + t*Cd (objects.go:84),
      h = d.C(t) - d.O,   c = |C(t)|^2 - 2 O.C(t) + |O|^2 - r^2
    where d.C0, d.Cd, O.C0, O.Cd are (N,3)@(3,S) matmuls.
    """
    c0, cd, r = sp.center0, sp.center_delta, sp.radius
    tcol = time[:, None]

    d_c = _mm(d, c0) + tcol * _mm(d, cd)
    d_o = vm.dot(d, o, keepdims=True)
    h = d_c - d_o

    a = vm.length_squared(d, keepdims=True)
    c0_sq = vm.length_squared(c0)[None, :]
    c0_cd = vm.dot(c0, cd)[None, :]
    cd_sq = vm.length_squared(cd)[None, :]
    o_c = _mm(o, c0) + tcol * _mm(o, cd)
    o_sq = vm.length_squared(o, keepdims=True)
    c = (c0_sq + 2.0 * tcol * c0_cd + tcol * tcol * cd_sq) - 2.0 * o_c + o_sq - (r * r)[None, :]

    disc = h * h - a * c
    # safe-where: sqrt of the masked-out branch must stay differentiable
    # (sqrt'(0)=inf would NaN the backward pass of jnp.where)
    sqrtd = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    root1 = (h - sqrtd) / a
    root2 = (h + sqrtd) / a
    surrounds = lambda t: (t_min < t) & (t < t_max)  # interval.go:31-35 (open)
    root = jnp.where(surrounds(root1), root1, root2)
    valid = (disc >= 0.0) & surrounds(root) & sp.active[None, :]
    return jnp.where(valid, root, INF)


def quad_ts(qd: T.Quads, o: jnp.ndarray, d: jnp.ndarray,
            t_min: float, t_max: float) -> jnp.ndarray:
    """Hit distances (N, Q) for the quad table.

    alpha = p_planar.(v x w), beta = p_planar.(w x u) turn the interior test
    (objects.go:184-189) into matmuls of O and d against precomputed cvw/cwu.
    """
    dn = _mm(d, qd.normal)
    on = _mm(o, qd.normal)
    # safe-where: parallel rays (masked below) must not produce inf t —
    # 0 * inf cotangents would NaN gradients of geometric params
    dn_safe = jnp.where(jnp.abs(dn) >= PARALLEL_EPS, dn, 1.0)
    t = (qd.d_plane[None, :] - on) / dn_safe

    o_cvw = _mm(o, qd.cvw)
    d_cvw = _mm(d, qd.cvw)
    q_cvw = vm.dot(qd.q, qd.cvw)[None, :]
    alpha = o_cvw + t * d_cvw - q_cvw

    o_cwu = _mm(o, qd.cwu)
    d_cwu = _mm(d, qd.cwu)
    q_cwu = vm.dot(qd.q, qd.cwu)[None, :]
    beta = o_cwu + t * d_cwu - q_cwu

    valid = (
        (jnp.abs(dn) >= PARALLEL_EPS)               # objects.go:171
        & (t_min <= t) & (t <= t_max)               # Contains, closed (objects.go:177)
        & (alpha >= 0.0) & (alpha <= 1.0)           # isInterior (objects.go:198-206)
        & (beta >= 0.0) & (beta <= 1.0)
        & qd.active[None, :]
    )
    return jnp.where(valid, t, INF)


def box_object_rays(bx: "T.Boxes", o: jnp.ndarray, d: jnp.ndarray):
    """Rotate rays into each box's object space (N, B, 3): offset
    subtract then rotate-Y world->object, the Media boundary convention
    (transformation.go:25-34, 79-85). Identity rows pass through."""
    cos = bx.cos_t[None, :]
    sin = bx.sin_t[None, :]
    osh = o[:, None, :] - bx.offset[None, :, :]
    o_obj = jnp.stack([cos * osh[..., 0] - sin * osh[..., 2],
                       osh[..., 1],
                       sin * osh[..., 0] + cos * osh[..., 2]], axis=-1)
    dy_b = jnp.broadcast_to(d[:, None, 1], (o.shape[0], bx.count))
    d_obj = jnp.stack([cos * d[:, None, 0] - sin * d[:, None, 2],
                       dy_b,
                       sin * d[:, None, 0] + cos * d[:, None, 2]], axis=-1)
    return o_obj, d_obj


def box_ts(bx: "T.Boxes", o: jnp.ndarray, d: jnp.ndarray,
           t_min: float, t_max: float) -> jnp.ndarray:
    """Hit distances (N, B) for the fused-box table.

    One slab test replaces the six quad plane+interior tests of the
    reference's box (objects.go:208-240): the closest of the six quad
    hits is the slab entry t when it clears t_min, else the exit t
    (ray starts inside the box — the interior back face the quads would
    return). Rotated rows (rotateY+translate wrappers,
    transformation.go) test in object space — t is rotation-invariant.
    Closed-interval semantics match quad_ts."""
    o_obj, d_obj = box_object_rays(bx, o, d)
    near, far, span_ok = box_slab_span(bx.lo[None, :, :], bx.hi[None, :, :],
                                       o_obj, d_obj)
    t = jnp.where(near >= t_min, near, far)
    valid = (span_ok & (far >= near)
             & (t_min <= t) & (t <= t_max)
             & bx.active[None, :])
    return jnp.where(valid, t, INF)


def tri_ts(tr: T.Triangles, o: jnp.ndarray, d: jnp.ndarray,
           t_min: float, t_max: float) -> jnp.ndarray:
    """Hit distances (N, T) for the triangle table.

    Moller-Trumbore (objects.go:408-461) in GEMM form with per-ray m = O x d:
      det = -(d.cn); u*det = m.e1 - d.c_e1v0; v*det = -m.e0 - d.c_v0e0;
      t*det = O.cn - k.
    """
    m = vm.cross(o, d)
    det = -_mm(d, tr.cn)
    u_det = _mm(m, tr.e1) - _mm(d, tr.c_e1v0)
    v_det = -_mm(m, tr.e0) - _mm(d, tr.c_v0e0)
    t_det = _mm(o, tr.cn) - tr.k[None, :]

    # safe-where (see quad_ts): masked parallel lanes must stay finite
    inv = 1.0 / jnp.where(jnp.abs(det) >= PARALLEL_EPS, det, 1.0)
    u = u_det * inv
    v = v_det * inv
    t = t_det * inv
    valid = (
        (jnp.abs(det) >= PARALLEL_EPS)              # objects.go:415
        & (u >= 0.0) & (u <= 1.0)                   # objects.go:422
        & (v >= 0.0) & (u + v <= 1.0)               # objects.go:428
        & (t_min <= t) & (t <= t_max)               # objects.go:433 (closed)
        & tr.active[None, :]
    )
    return jnp.where(valid, t, INF)


def sphere_roots(center: jnp.ndarray, radius: jnp.ndarray, o: jnp.ndarray,
                 d: jnp.ndarray):
    """Both quadratic roots (near, far) and a validity flag, for medium
    boundary spans and light pdf checks. center (..., 3) broadcastable to o."""
    oc = center - o
    a = vm.length_squared(d)
    h = vm.dot(d, oc)
    c = vm.length_squared(oc) - radius * radius
    disc = h * h - a * c
    # grad-safe sqrt (core/rng._sqrt0 pattern): sqrt(max(disc, 0)) has an
    # inf backward at clamped arguments, and inf * 0-cotangent NaN-poisons
    # whole gradient pytrees — found round 5 on camera gradients through a
    # sphere MEDIUM boundary (missing rays hit the clamp; the round-4 fix
    # covered the sampler sqrts but not this one). Forward bit-identical.
    pos = disc > 0
    sqrtd = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    return (h - sqrtd) / a, (h + sqrtd) / a, disc >= 0.0


def box_slab_span(box_min: jnp.ndarray, box_max: jnp.ndarray, o: jnp.ndarray,
                  d: jnp.ndarray):
    """Slab-test entry/exit (t_near, t_far, hit) for an axis box; equivalent
    to the first/second quad hits of the reference's box-of-quads boundary
    (aabb.go:90-113 semantics) for the medium path."""
    d_safe = jnp.where(jnp.abs(d) < 1e-30, jnp.where(d < 0, -1e-30, 1e-30), d)
    inv = 1.0 / d_safe
    t0 = (box_min - o) * inv
    t1 = (box_max - o) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return near, far, far > near
