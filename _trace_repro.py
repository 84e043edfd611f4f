"""Isolate the modelExample TPU crash: run trace.trace pieces on the statue."""
import time
import jax, jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.scenes import registry
from go_raytracer_tpu.ops import trace as trace_mod

scene, cam = registry.model_example()
print("tris:", scene.triangles.count, flush=True)

N = 1 << 16
rs = np.random.default_rng(0)
o = jnp.asarray(rs.uniform(-8, 8, (N, 3)), jnp.float32)
d = jnp.asarray(rs.normal(size=(N, 3)), jnp.float32)
tm = jnp.zeros(N)
u_med = jnp.ones((N, 1))

# stage 1: full trace (traversal + attribute gathers)
f = jax.jit(lambda o, d, tm, u: trace_mod.trace(scene, o, d, tm, u))
t0 = time.time()
h = f(o, d, tm, u_med)
jax.block_until_ready(h)
print(f"trace ok: {time.time()-t0:.1f}s, hits {np.asarray(h.hit).mean():.3f}",
      flush=True)
for _ in range(3):
    t0 = time.time()
    h = f(o, d, tm, u_med)
    jax.block_until_ready(h)
    print(f"  rerun {time.time()-t0:.3f}s", flush=True)

# stage 2: one full bounce (adds texture/sampling/light pdf code)
from go_raytracer_tpu.integrator import wavefront
n_u = wavefront.N_FIXED_U + scene.media.count
u = jax.random.uniform(jax.random.key(1), (N, n_u))
alive = jnp.ones(N, bool)
g = jax.jit(lambda o, d, tm, alive, u: wavefront._bounce(scene, o, d, tm, alive, u))
t0 = time.time()
out = g(o, d, tm, alive, u)
jax.block_until_ready(out)
print(f"bounce ok: {time.time()-t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.time()
    out = g(o, d, tm, alive, u)
    jax.block_until_ready(out)
    print(f"  rerun {time.time()-t0:.3f}s", flush=True)
print("ALL OK", flush=True)
