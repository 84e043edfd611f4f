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
    h = (i.astype(jnp.uint32) * _MX) ^ (j.astype(jnp.uint32) * _MY) \
        ^ (k.astype(jnp.uint32) * _MZ) ^ seed
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
    gx = (h & ten).astype(dtype) * (2.0 / 1024.0) - 1.0
    gy = ((h >> np.uint32(10)) & ten).astype(dtype) * (2.0 / 1024.0) - 1.0
    gz = ((h >> np.uint32(20)) & ten).astype(dtype) * (2.0 / 1024.0) - 1.0
    inv = jax.lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-12)
    return gx * inv, gy * inv, gz * inv


def noise(seed, p: jnp.ndarray) -> jnp.ndarray:
    """Gradient noise at points p (..., 3), in [-1, 1] (perlin.go:34-54):
    Hermitian-smoothed trilinear interpolation of corner-gradient dots."""
    dtype = p.dtype
    fl = jnp.floor(p)
    uvw = p - fl
    ijk = fl.astype(jnp.int32)

    # Hermitian smoothing (perlin.go:96-98)
    sm = uvw * uvw * (3.0 - 2.0 * uvw)

    acc = jnp.zeros(p.shape[:-1], dtype=dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                gx, gy, gz = _gradient(ijk[..., 0] + di, ijk[..., 1] + dj,
                                       ijk[..., 2] + dk, seed, dtype)
                wx = uvw[..., 0] - di
                wy = uvw[..., 1] - dj
                wz = uvw[..., 2] - dk
                w = (
                    (di * sm[..., 0] + (1 - di) * (1.0 - sm[..., 0]))
                    * (dj * sm[..., 1] + (1 - dj) * (1.0 - sm[..., 1]))
                    * (dk * sm[..., 2] + (1 - dk) * (1.0 - sm[..., 2]))
                )
                acc = acc + w * (gx * wx + gy * wy + gz * wz)
    return acc


def turbulence(seed, p: jnp.ndarray, depth: int = 7) -> jnp.ndarray:
    """7-octave turbulence (perlin.go:57-69)."""
    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    weight = 1.0
    tp = p
    for _ in range(depth):
        acc = acc + weight * noise(seed, tp)
        weight *= 0.5
        tp = tp * 2.0
    return jnp.abs(acc)
