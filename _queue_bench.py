import time, jax
from go_raytracer_tpu.utils import cache
cache.enable_compilation_cache()
from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.scenes import registry
import numpy as np
scene, cam = registry.cornell_box()
cam.samples_per_pixel = 16
key = jax.random.key(0)
t0=time.time()
img1, st = regen.render_regen(scene, cam, key, n_lanes=1 << 17, cadence=4)
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
img1, st = regen.render_regen(scene, cam, key, n_lanes=1 << 17, cadence=4)
print(f"queue-kernel rays/s {st['rays_per_s']:.4e} window_s {st['window_s']}", flush=True)
print("mean pixel", float(np.asarray(img1).mean()), flush=True)
