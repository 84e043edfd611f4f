from go_raytracer_tpu.scenes.registry import SCENES, get_scene  # noqa: F401
