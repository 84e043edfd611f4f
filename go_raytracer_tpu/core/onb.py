"""Branchless orthonormal basis construction (reference hittable/onb.go:9-43).

The reference picks helper axis a = (0,1,0) when |n.x| > 0.9 else (1,0,0),
then v = unit(n x a), u = unit(n x v), w = unit(n). We keep the identical
construction but express the branch as a select so it vectorizes.
"""

from __future__ import annotations

import jax.numpy as jnp

from go_raytracer_tpu.core import vecmath as vm


def build(n: jnp.ndarray):
    """Returns (u, v, w) each (..., 3) for normals n (..., 3)."""
    w = vm.normalize(n)
    use_y = (jnp.abs(n[..., 0]) > 0.9)[..., None]
    a = jnp.where(
        use_y,
        jnp.array([0.0, 1.0, 0.0], dtype=n.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
    )
    v = vm.normalize(vm.cross(n, a))
    u = vm.normalize(vm.cross(n, v))
    return u, v, w


def transform(basis, local: jnp.ndarray) -> jnp.ndarray:
    """Local (x,y,z) -> world: x*u + y*v + z*w (onb.go:38-43)."""
    u, v, w = basis
    return (
        local[..., 0:1] * u + local[..., 1:2] * v + local[..., 2:3] * w
    )
