from go_raytracer_tpu.integrator import sampling, wavefront  # noqa: F401
