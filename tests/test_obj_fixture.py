"""End-to-end multi-material OBJ+MTL fixture (assets/lanternhouse.obj):
MTL conversion to all four material branches, per-face UV/vertex-normal
flags, emissive light extraction (objLoader.go:492-510), find_windows,
and a full tiny render through the mesh path."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.render.camera import Camera
from go_raytracer_tpu.scene import assets, obj_loader
from go_raytracer_tpu.scene import types as T
from go_raytracer_tpu.scene.builder import SceneBuilder

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "lanternhouse.obj")


def _load(find_windows=False):
    b = SceneBuilder(background=(0, 0, 0))
    b.quad((-30, -1.05, -30), (60, 0, 0), (0, 0, 60),
           b.lambertian((0.5, 0.5, 0.5)))
    opts = obj_loader.LoadOptions(scale_factor=1.0, center=True,
                                  position=(0, 0.2, 0),
                                  find_windows=find_windows)
    lights = obj_loader.load_obj(b, FIXTURE, opts)
    for h in lights:
        b.add_light(h)
    return b, lights


def test_fixture_materials_and_lights():
    b, lights = _load()
    scene = b.build()
    tr = scene.triangles
    n_tris = int(np.asarray(tr.active).sum())
    assert n_tris == 1748
    kinds = np.asarray(scene.materials.kind)
    mat_per_tri = np.asarray(tr.mat_id)[np.asarray(tr.active)]
    used = set(kinds[m] for m in np.unique(mat_per_tri))
    # all four MTL conversion branches present among mesh materials
    assert {T.MAT_LAMBERTIAN, T.MAT_METAL, T.MAT_DIFFUSE_LIGHT,
            T.MAT_DIELECTRIC} <= used
    # light extraction: exactly the 12 emissive core triangles
    assert len(lights) == 12
    # the body material routes through an image texture (map_Kd)
    lamb_mats = [m for m in np.unique(mat_per_tri)
                 if kinds[m] == T.MAT_LAMBERTIAN]
    tex_kinds = np.asarray(scene.textures.kind)
    assert any(tex_kinds[int(np.asarray(scene.materials.tex_id)[m])]
               == T.TEX_IMAGE for m in lamb_mats)
    # vertex normals + uvs survived for the body, absent for the roof
    has_vn = np.asarray(tr.has_vn)[np.asarray(tr.active)]
    has_uv = np.asarray(tr.has_uv)[np.asarray(tr.active)]
    assert has_vn.sum() == 1680 and (~has_vn).sum() == 68
    assert has_uv.sum() == 1680


def test_fixture_find_windows_extracts_dielectric():
    _, lights = _load(find_windows=True)
    assert len(lights) == 12 + 8  # emissive core + 4 dielectric panes x 2


def test_fixture_renders_end_to_end():
    b, _ = _load()
    scene = b.build()
    cam = Camera(width=48, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=6, vertical_fov=40, background=(0, 0, 0),
                 max_contribution=4.0)
    cam.position((4.0, 2.5, 4.0), (0, 0.3, 0), (0, 1, 0))
    img, st = regen.render_regen(scene, cam, jax.random.key(0),
                                 n_lanes=4096)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # the emissive core lights the scene through the windows/body gaps
    assert img.max() > 0.05
    assert st["segments"] > 0
