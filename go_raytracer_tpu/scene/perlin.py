"""Perlin noise: gather-free lattice-gradient noise.

Reference: hittable/perlin.go — 256 random unit gradients addressed through
three XORed permutation tables (perlin.go:20-31, 34-54), trilinear
Hermitian-smoothed interpolation (perlin.go:93-111), 7-octave turbulence
(perlin.go:57-69).

TPU-first redesign: the reference's table gathers are the worst possible
memory pattern for a TPU (per-ray dynamic gathers serialize, and the XLA
gather graphs they lower to crashed the v5e worker in round 1 — see
docs/PERFORMANCE.md). Since the reference seeds its tables from the
*unseeded* global math/rand (perlin.go:27, 85-90) — so its exact noise
field differs run-to-run and parity is distributional — we replace the
table+permutation hash with a counter-based integer hash evaluated inline:
each lattice corner's gradient is derived arithmetically from (i, j, k,
texture_seed).  Zero memory traffic, pure VPU arithmetic, identical noise
statistics (random unit-ish gradients per lattice point; the reference's
gradients are normalized uniform-cube draws, perlin.go:27, which is exactly
the distribution the hash reproduces) — and it runs unchanged inside a
Pallas kernel.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

# lowbias32-style multiplicative mixing constants (public-domain integer
# hash construction, Wellons 2018) + Weyl-sequence per-axis multipliers
_MX = np.uint32(0x9E3779B1)
_MY = np.uint32(0x85EBCA77)
_MZ = np.uint32(0xC2B2AE3D)
_F1 = np.uint32(0x7FEB352D)
_F2 = np.uint32(0x846CA68B)


def make_seed(rng: np.random.Generator) -> np.uint32:
    """Per-texture seed, replacing NewPerlin's fresh tables
    (texture.go:104-109 -> perlin.go:20-31): distinct seeds give
    statistically independent noise fields."""
    return np.uint32(rng.integers(0, 2**32, dtype=np.uint32))


def _hash_corner(i, j, k, seed):
    """uint32 hash of a lattice corner; plays the role of
    perm_x[i&255] ^ perm_y[j&255] ^ perm_z[k&255] (perlin.go:45-49)."""
    u32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
    h = (u32(i) * _MX) ^ (u32(j) * _MY) ^ (u32(k) * _MZ) ^ seed
    h = h ^ (h >> np.uint32(16))
    h = h * _F1
    h = h ^ (h >> np.uint32(15))
    h = h * _F2
    h = h ^ (h >> np.uint32(16))
    return h


def _gradient(i, j, k, seed, dtype):
    """Unit gradient at a lattice corner: three 10-bit hash fields mapped
    to [-1, 1)^3 then normalized — the reference's vec.Random(-1,1) +
    UnitVector construction (perlin.go:27), hash-indexed instead of
    table-indexed."""
    h = _hash_corner(i, j, k, seed)
    ten = np.uint32(0x3FF)
    # Mosaic has no uint32->f32 cast; the 10-bit fields are sign-safe, so
    # bitcast to int32 first (identical value for <= 0x3FF)
    as_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32).astype(dtype)
    gx = as_f(h & ten) * (2.0 / 1024.0) - 1.0
    gy = as_f((h >> np.uint32(10)) & ten) * (2.0 / 1024.0) - 1.0
    gz = as_f((h >> np.uint32(20)) & ten) * (2.0 / 1024.0) - 1.0
    inv = jax.lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-12)
    return gx * inv, gy * inv, gz * inv


def noise_planes(seed, x, y, z):
    """Plane-form gradient noise, in [-1, 1] (perlin.go:34-54): Hermitian-
    smoothed trilinear interpolation of corner-gradient dots. `seed` may be
    a scalar or a per-point array (per-lane texture ids in the Pallas
    megakernel). Uses only jnp arithmetic + rsqrt, so it runs unchanged
    inside Mosaic kernels."""
    dtype = x.dtype
    flx, fly, flz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    ux, uy, uz = x - flx, y - fly, z - flz
    i0, j0, k0 = (f.astype(jnp.int32) for f in (flx, fly, flz))

    # Hermitian smoothing (perlin.go:96-98)
    smx = ux * ux * (3.0 - 2.0 * ux)
    smy = uy * uy * (3.0 - 2.0 * uy)
    smz = uz * uz * (3.0 - 2.0 * uz)

    acc = jnp.zeros_like(x)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                gx, gy, gz = _gradient(i0 + di, j0 + dj, k0 + dk, seed, dtype)
                w = ((di * smx + (1 - di) * (1.0 - smx))
                     * (dj * smy + (1 - dj) * (1.0 - smy))
                     * (dk * smz + (1 - dk) * (1.0 - smz)))
                acc = acc + w * (gx * (ux - di) + gy * (uy - dj)
                                 + gz * (uz - dk))
    return acc


def turbulence_planes(seed, x, y, z, depth: int = 7):
    """7-octave turbulence, plane form (perlin.go:57-69)."""
    acc = jnp.zeros_like(x)
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * noise_planes(seed, x, y, z)
        weight *= 0.5
        x, y, z = x * 2.0, y * 2.0, z * 2.0
    return jnp.abs(acc)


def noise(seed, p: jnp.ndarray) -> jnp.ndarray:
    """Gradient noise at points p (..., 3) (perlin.go:34-54)."""
    return noise_planes(seed, p[..., 0], p[..., 1], p[..., 2])


def turbulence(seed, p: jnp.ndarray, depth: int = 7) -> jnp.ndarray:
    """7-octave turbulence (perlin.go:57-69)."""
    return turbulence_planes(seed, p[..., 0], p[..., 1], p[..., 2], depth)
