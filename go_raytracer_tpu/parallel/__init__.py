from go_raytracer_tpu.parallel import mesh  # noqa: F401
