"""Vectorized 3-vector math over SoA arrays of shape (..., 3).

Capability parity with the reference Vec3 (internal/vec/vec.go:12-195), but
as pure functions over batched arrays: every op maps over a leading ray/
primitive axis so XLA can fuse it into the surrounding wavefront kernels.
Rejection samplers are replaced by analytic forms (see core/rng.py).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_NEAR_ZERO = 1e-8


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Batched dot product over the trailing axis (vec.go:111-113)."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length_squared(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def length(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sqrt(length_squared(v, keepdims=keepdims))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product (vec.go:116-122)."""
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-1
    )


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit vector (vec.go:125-127). `eps` guards against zero-length input
    for branchless code paths where the result is masked out anyway."""
    return v / jnp.maximum(length(v, keepdims=True), eps if eps else jnp.finfo(v.dtype).tiny)


def near_zero(v: jnp.ndarray) -> jnp.ndarray:
    """True where all components are < 1e-8 in magnitude (vec.go:130-133)."""
    return jnp.all(jnp.abs(v) < EPS_NEAR_ZERO, axis=-1)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection about normal n (vec.go:136-138)."""
    return v - 2.0 * dot(v, n, keepdims=True) * n


def refract(v: jnp.ndarray, n: jnp.ndarray, eta_ratio: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of unit vector v about n (vec.go:141-146).

    `eta_ratio` = eta_incident / eta_transmitted, broadcastable to v[..., :1].
    """
    eta = jnp.asarray(eta_ratio)[..., None] if jnp.ndim(eta_ratio) == v.ndim - 1 else eta_ratio
    cos_theta = jnp.minimum(dot(-v, n, keepdims=True), 1.0)
    r_perp = eta * (v + cos_theta * n)
    # max() guards sqrt's inf derivative at the exact TIR boundary (the
    # value change is < 4e-4 in the vanishing parallel component)
    r_par = -jnp.sqrt(jnp.maximum(
        jnp.abs(1.0 - length_squared(r_perp, keepdims=True)), 1e-7)) * n
    return r_perp + r_par


def degrees_to_radians(deg) -> jnp.ndarray:
    """util/utilities.go:8-10."""
    return jnp.asarray(deg) * (jnp.pi / 180.0)
