"""go_raytracer_tpu — a TPU-native differentiable Monte Carlo path tracer.

A ground-up JAX/XLA/Pallas re-design of the capability set of the reference
CPU path tracer (nsp5488/go_raytracer): the full "Ray Tracing in One Weekend"
trilogy feature set — spheres/quads/triangles, BVH-accelerated meshes from
OBJ/MTL, five materials, four texture families with Perlin noise, constant
density participating media, motion blur, thin-lens depth of field,
stratified sampling, and mixture-PDF light importance sampling — rebuilt as
a wavefront renderer over SoA ray batches:

* Intersection runs as batched GEMMs on the MXU (ray bundles against
  primitive tables; triple products become (N,3)@(3,P) matmuls).
* The recursive integrator (reference camera/camera.go:293-331) becomes a
  forward `lax.scan`/`while_loop` over bounce depth plus a reverse scan that
  reproduces the per-level firefly clamp exactly.
* Parallelism is `jax.sharding` over a device mesh (pixel/sample sharding
  with psum accumulation) instead of a goroutine row pool
  (reference camera/camera.go:112-132).
* The whole renderer is one differentiable program: `jax.grad` flows to
  material, emission, texture, and camera parameters.
"""

__version__ = "0.1.0"

from go_raytracer_tpu.render.camera import Camera  # noqa: F401
from go_raytracer_tpu.scene.builder import SceneBuilder  # noqa: F401
