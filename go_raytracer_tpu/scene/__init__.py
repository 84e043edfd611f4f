from go_raytracer_tpu.scene import types, builder, perlin  # noqa: F401
