from go_raytracer_tpu.ops import intersect, trace  # noqa: F401
