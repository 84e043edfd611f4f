"""OBJ/MTL loader tests (objLoader.go:18-538, mtlLoader.go:53-326)."""

import os
import textwrap

import numpy as np
import pytest

from go_raytracer_tpu.scene import obj_loader, types as T
from go_raytracer_tpu.scene.builder import SceneBuilder


def write(tmp_path, name, content):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as fh:
        fh.write(textwrap.dedent(content))
    return p


def test_basic_obj_parse(tmp_path):
    p = write(tmp_path, "tri.obj", """\
        # comment
        v 0 0 0
        v 1 0 0
        v 0 1 0
        f 1 2 3
        """)
    b = SceneBuilder()
    lights = obj_loader.load_obj(b, p, obj_loader.LoadOptions(center=False))
    s = b.build()
    assert s.triangles.count == 1
    assert lights == []
    # default material is 0.8 gray lambertian (objLoader.go:88-90)
    assert int(s.materials.kind[int(s.triangles.mat_id[0])]) == T.MAT_LAMBERTIAN


def test_quad_face_fan_triangulation(tmp_path):
    p = write(tmp_path, "quad.obj", """\
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        f 1 2 3 4
        """)
    b = SceneBuilder()
    obj_loader.load_obj(b, p, obj_loader.LoadOptions(center=False))
    s = b.build()
    assert s.triangles.count == 2  # fan: (1,2,3), (1,3,4)


def test_negative_and_one_based_indices(tmp_path):
    p = write(tmp_path, "neg.obj", """\
        v 0 0 0
        v 1 0 0
        v 0 1 0
        f -3 -2 -1
        """)
    b = SceneBuilder()
    obj_loader.load_obj(b, p, obj_loader.LoadOptions(center=False))
    s = b.build()
    assert s.triangles.count == 1
    np.testing.assert_allclose(np.asarray(s.triangles.v0[0]), [0, 0, 0], atol=1e-6)


def test_scale_center_position(tmp_path):
    p = write(tmp_path, "c.obj", """\
        v 0 0 0
        v 2 0 0
        v 0 2 0
        f 1 2 3
        """)
    b = SceneBuilder()
    opts = obj_loader.LoadOptions(scale_factor=2.0, center=True, position=(5, 5, 5))
    obj_loader.load_obj(b, p, opts)
    s = b.build()
    v0 = np.asarray(s.triangles.v0[0])
    e0 = np.asarray(s.triangles.e0[0])
    # scaled 2x: verts (0,0,0),(4,0,0),(0,4,0); center (2,2,0) -> moved to (5,5,5)
    np.testing.assert_allclose(v0, [3, 3, 5], atol=1e-5)
    np.testing.assert_allclose(e0, [4, 0, 0], atol=1e-5)


def test_vertex_normals_and_uvs(tmp_path):
    p = write(tmp_path, "n.obj", """\
        v 0 0 0
        v 1 0 0
        v 0 1 0
        vt 0 0
        vt 1 0
        vt 0 1
        vn 0 0 1
        vn 0 0 1
        vn 0 0 1
        f 1/1/1 2/2/2 3/3/3
        """)
    b = SceneBuilder()
    obj_loader.load_obj(b, p, obj_loader.LoadOptions(center=False))
    s = b.build()
    assert bool(s.triangles.has_vn[0])
    assert bool(s.triangles.has_uv[0])
    np.testing.assert_allclose(np.asarray(s.triangles.vn[0, 0]), [0, 0, 1], atol=1e-6)


def test_mtl_conversion_heuristics(tmp_path):
    write(tmp_path, "m.mtl", """\
        newmtl glassy
        d 0.5
        Ni 1.5
        newmtl smoky
        d 0.5
        Kd 0.2 0.4 0.9
        newmtl lamp
        Ke 5 5 5
        newmtl shiny
        Ks 0.9 0.9 0.9
        Kd 0.1 0.1 0.1
        Ns 1000
        newmtl matte
        Kd 0.6 0.2 0.1
        """)
    p = write(tmp_path, "m.obj", """\
        mtllib m.mtl
        v 0 0 0
        v 1 0 0
        v 0 1 0
        usemtl glassy
        f 1 2 3
        usemtl smoky
        f 1 2 3
        usemtl lamp
        f 1 2 3
        usemtl shiny
        f 1 2 3
        usemtl matte
        f 1 2 3
        """)
    b = SceneBuilder()
    lights = obj_loader.load_obj(b, p, obj_loader.LoadOptions(center=False))
    s = b.build()
    kinds = [int(s.materials.kind[int(s.triangles.mat_id[i])]) for i in range(5)]
    assert kinds == [T.MAT_DIELECTRIC, T.MAT_ISOTROPIC, T.MAT_DIFFUSE_LIGHT,
                     T.MAT_METAL, T.MAT_LAMBERTIAN]
    # emissive triangle extracted as a light (objLoader.go:492-510)
    assert lights == [("triangle", 2)]
    # Ns=1000 -> fuzz 0 (mtlLoader.go:274-282)
    shiny_mat = int(s.triangles.mat_id[3])
    assert float(s.materials.fuzz[shiny_mat]) == pytest.approx(0.0)


def test_find_windows_extracts_dielectrics(tmp_path):
    write(tmp_path, "w.mtl", """\
        newmtl glassy
        d 0.5
        Ni 1.5
        """)
    p = write(tmp_path, "w.obj", """\
        mtllib w.mtl
        v 0 0 0
        v 1 0 0
        v 0 1 0
        usemtl glassy
        f 1 2 3
        """)
    b = SceneBuilder()
    lights = obj_loader.load_obj(
        b, p, obj_loader.LoadOptions(center=False, find_windows=True))
    assert lights == [("triangle", 0)]


def test_flip_yz_and_flip_faces(tmp_path):
    p = write(tmp_path, "f.obj", """\
        v 0 0 1
        v 1 0 1
        v 0 2 1
        f 1 2 3
        """)
    b = SceneBuilder()
    obj_loader.load_obj(b, p, obj_loader.LoadOptions(center=False, flip_yz=True))
    s = b.build()
    # y and z swapped: v0 = (0,1,0)
    np.testing.assert_allclose(np.asarray(s.triangles.v0[0]), [0, 1, 0], atol=1e-6)

    b2 = SceneBuilder()
    obj_loader.load_obj(b2, p, obj_loader.LoadOptions(center=False, flip_faces=True))
    s2 = b2.build()
    # winding flipped -> face normal negated relative to unflipped
    b3 = SceneBuilder()
    obj_loader.load_obj(b3, p, obj_loader.LoadOptions(center=False))
    s3 = b3.build()
    np.testing.assert_allclose(np.asarray(s2.triangles.n_face[0]),
                               -np.asarray(s3.triangles.n_face[0]), atol=1e-6)


def test_procedural_statue_mesh():
    b = SceneBuilder()
    mat = b.metal((1, 0.8, 0), 0.5)
    opts = obj_loader.LoadOptions(scale_factor=5, center=True, position=(0, 1.8, 0))
    obj_loader.procedural_statue(b, mat, opts, major_segments=64, minor_segments=32)
    s = b.build()
    assert s.triangles.count == 64 * 32 * 2
    v0 = np.asarray(s.triangles.v0)
    center = (v0.min(0) + v0.max(0)) / 2
    assert abs(center[1] - 1.8) < 1.0  # positioned near requested y
