"""Perlin noise: host-side table generation + device-side evaluation.

Reference: hittable/perlin.go. Each noise texture owns 256 random unit
gradient vectors and three independent permutation tables (perlin.go:20-31);
noise is trilinear Hermitian-smoothed gradient noise (perlin.go:34-54,
93-111) and turbulence is a 7-octave |sum| (perlin.go:57-69).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

POINT_COUNT = 256


def make_tables(rng: np.random.Generator):
    """Host-side table generation mirroring NewPerlin (perlin.go:20-31).

    Gradients are uniform unit vectors: the reference draws uniform in
    [-1,1)^3 and normalizes (perlin.go:27) — a slightly anisotropic
    distribution; we keep uniform-on-sphere since only the noise statistics
    matter. Permutations are Fisher-Yates shuffles (perlin.go:85-90).
    """
    v = rng.normal(size=(POINT_COUNT, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    perm = np.stack([rng.permutation(POINT_COUNT) for _ in range(3)]).astype(np.int32)
    return v.astype(np.float32), perm


def noise(randvec: jnp.ndarray, perm: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Gradient noise at points p (..., 3) in [-1, 1] (perlin.go:34-54).

    randvec: (256, 3), perm: (3, 256).
    """
    fl = jnp.floor(p)
    uvw = p - fl
    ijk = fl.astype(jnp.int32)

    # Hermitian smoothing (perlin.go:96-98)
    sm = uvw * uvw * (3.0 - 2.0 * uvw)

    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    px, py, pz = perm[0], perm[1], perm[2]
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                idx = (
                    px[(ijk[..., 0] + di) & 255]
                    ^ py[(ijk[..., 1] + dj) & 255]
                    ^ pz[(ijk[..., 2] + dk) & 255]
                )
                c = randvec[idx]  # (..., 3)
                weight_v = uvw - jnp.asarray([di, dj, dk], dtype=p.dtype)
                w = (
                    (di * sm[..., 0] + (1 - di) * (1.0 - sm[..., 0]))
                    * (dj * sm[..., 1] + (1 - dj) * (1.0 - sm[..., 1]))
                    * (dk * sm[..., 2] + (1 - dk) * (1.0 - sm[..., 2]))
                )
                acc = acc + w * jnp.sum(c * weight_v, axis=-1)
    return acc


def turbulence(randvec: jnp.ndarray, perm: jnp.ndarray, p: jnp.ndarray,
               depth: int = 7) -> jnp.ndarray:
    """7-octave turbulence (perlin.go:57-69)."""
    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    weight = 1.0
    tp = p
    for _ in range(depth):
        acc = acc + weight * noise(randvec, perm, tp)
        weight *= 0.5
        tp = tp * 2.0
    return jnp.abs(acc)
