from go_raytracer_tpu.core import vecmath, rng, onb  # noqa: F401
