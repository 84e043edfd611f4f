"""Counter-based RNG and analytic direction samplers.

The reference draws from an unseeded global `math/rand` (e.g. reference
camera/camera.go:268, hittable/materials.go:112, hittable/pdf.go:70) and uses
rejection sampling for disk/sphere directions (vec/vec.go:149-167). Neither
survives contact with XLA: here every random decision is a deterministic
function of (threefry key, counters) and all samplers are analytic, so the
whole renderer is a pure function — reproducible, differentiable, and
shardable (per-host streams via `jax.random.fold_in`).

All samplers are written as functions of uniform variates rather than keys,
so the same code paths can be driven by `jax.random` (pure-JAX kernels) or by
`pltpu.prng_random_bits` (Pallas kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def ray_keys(key: jax.Array, n: int) -> jax.Array:
    """Independent per-ray key streams."""
    return jax.random.split(key, n)


def fold(key: jax.Array, *ids: int) -> jax.Array:
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def uniform_block(key: jax.Array, shape, n_uniforms: int, dtype=jnp.float32) -> jnp.ndarray:
    """Draw a block of U[0,1) variates: shape + (n_uniforms,)."""
    return jax.random.uniform(key, tuple(shape) + (n_uniforms,), dtype=dtype)


# ----------------------------------------------------------------------------
# Analytic samplers (deterministic functions of uniforms).
# Each matches the *distribution* of its reference counterpart; rejection
# loops are replaced by closed forms with identical densities.
# ----------------------------------------------------------------------------

def _sqrt0(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt clamped to 0 for x <= 0 with a FINITE backward everywhere.

    sqrt(max(0, x)) is forward-safe but its derivative at x <= 0 is inf,
    and inf * 0-cotangent = NaN poisons whole gradient pytrees (found by
    the round-4 GRAD.md run: cone-sampling a sphere light from inside it
    NaN'd every parameter gradient). The double-where keeps the value
    bit-identical and zeroes the backward on the clamped branch."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def unit_disk(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform point on the unit disk, (..., 2).

    Distributionally equal to the rejection sampler vec/vec.go:149-156:
    radius = sqrt(U) gives the uniform-area density.
    """
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def unit_vector(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on S², (..., 3).

    Distributionally equal to the rejection sampler vec/vec.go:159-167,
    via z ~ U[-1,1], phi ~ U[0,2pi) (Archimedes).
    """
    z = 1.0 - 2.0 * u1
    r = _sqrt0(1.0 - z * z)
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def cosine_direction(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction about +z, (..., 3).

    Same analytic form as the reference (vec/vec.go:177-186).
    """
    phi = TWO_PI * u1
    sq = jnp.sqrt(u2)
    x = jnp.cos(phi) * sq
    y = jnp.sin(phi) * sq
    z = _sqrt0(1.0 - u2)
    return jnp.stack([x, y, z], axis=-1)


def to_sphere(radius: jnp.ndarray, dist_squared: jnp.ndarray,
              u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cone sample toward a sphere of `radius` at squared distance
    `dist_squared`, in the frame whose +z points at the sphere center
    (hittable/objects.go:70-80)."""
    cos_theta_max = _sqrt0(1.0 - radius * radius / dist_squared)
    z = 1.0 + u2 * (cos_theta_max - 1.0)
    phi = TWO_PI * u1
    t = _sqrt0(1.0 - z * z)
    return jnp.stack([jnp.cos(phi) * t, jnp.sin(phi) * t, z], axis=-1)
