from go_raytracer_tpu.render import camera, film, renderer  # noqa: F401
