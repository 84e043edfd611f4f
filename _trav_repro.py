"""Minimal TPU repro: pallas BVH traversal kernel on the procedural statue."""
import time, sys
import jax, jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.scenes import registry
from go_raytracer_tpu.ops.pallas import traverse as ptrav

scene, cam = registry.model_example()
print("tris:", scene.triangles.count, "nodes:", scene.tri_bvh.n_nodes,
      "leaf:", scene.tri_bvh.leaf_size, flush=True)

nodes, tris = ptrav.pack_bvh(scene)
nodes, tris = jax.device_put(nodes), jax.device_put(tris)

N = 1 << 14  # small first
rs = np.random.default_rng(0)

# coherent primary-ish rays toward the statue
o = jnp.asarray(np.tile([[10.0, 5.0, 10.0]], (N, 1)), jnp.float32)
d = jnp.asarray((np.array([[-10.0, -4.0, -10.0]]) +
                 rs.normal(size=(N, 3)) * 0.5), jnp.float32)

t0 = time.time()
t, idx = ptrav.bvh_closest(nodes, tris, o, d,
                           n_nodes=scene.tri_bvh.n_nodes,
                           leaf_size=scene.tri_bvh.leaf_size)
t = np.asarray(t)
print(f"coherent N={N}: compile+run {time.time()-t0:.1f}s, "
      f"hit frac {np.isfinite(t).mean():.3f}", flush=True)

for trial in range(3):
    t0 = time.time()
    t, idx = ptrav.bvh_closest(nodes, tris, o, d,
                               n_nodes=scene.tri_bvh.n_nodes,
                               leaf_size=scene.tri_bvh.leaf_size)
    np.asarray(t)
    print(f"  coherent rerun: {time.time()-t0:.3f}s", flush=True)

# incoherent rays (worst case: every tile visits most of the tree)
o2 = jnp.asarray(rs.uniform(-5, 5, (N, 3)), jnp.float32)
d2 = jnp.asarray(rs.normal(size=(N, 3)), jnp.float32)
t0 = time.time()
t, idx = ptrav.bvh_closest(nodes, tris, o2, d2,
                           n_nodes=scene.tri_bvh.n_nodes,
                           leaf_size=scene.tri_bvh.leaf_size)
t = np.asarray(t)
print(f"incoherent N={N}: {time.time()-t0:.1f}s, hit frac "
      f"{np.isfinite(t).mean():.3f}", flush=True)

# bigger batch
N2 = 1 << 17
o3 = jnp.asarray(np.tile([[10.0, 5.0, 10.0]], (N2, 1)), jnp.float32)
d3 = jnp.asarray((np.array([[-10.0, -4.0, -10.0]]) +
                  rs.normal(size=(N2, 3)) * 0.5), jnp.float32)
t0 = time.time()
t, idx = ptrav.bvh_closest(nodes, tris, o3, d3,
                           n_nodes=scene.tri_bvh.n_nodes,
                           leaf_size=scene.tri_bvh.leaf_size)
np.asarray(t)
print(f"coherent N={N2}: {time.time()-t0:.1f}s (incl possible recompile)",
      flush=True)
print("OK", flush=True)
