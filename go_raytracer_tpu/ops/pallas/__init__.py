from go_raytracer_tpu.ops.pallas import bounce  # noqa: F401
