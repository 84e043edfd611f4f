"""Intersection tests: GEMM-form intersectors vs closed-form expectations
and a naive per-ray NumPy oracle implementing the reference hit routines
(hittable/objects.go:83-115, 167-206, 408-461)."""

import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.ops import intersect as ix, trace as trace_mod
from go_raytracer_tpu.scene.builder import SceneBuilder, Transform


def build_simple():
    b = SceneBuilder(background=(0, 0, 0))
    m = b.lambertian((0.5, 0.5, 0.5))
    b.sphere((0, 0, -5), 1.0, m)
    b.quad((-1, -1, -3), (2, 0, 0), (0, 2, 0), m)  # z=-3 plane patch
    b.triangle([(-1, -1, -8), (1, -1, -8), (0, 1, -8)], m)
    return b.build()


def rays(origins, dirs):
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    t = jnp.zeros(o.shape[0], dtype=jnp.float32)
    return o, d, t


def test_sphere_hit_distance():
    s = build_simple()
    o, d, t = rays([[0, 0, 0]], [[0, 0, -1]])
    ts = ix.sphere_ts(s.spheres, o, d, t, 1e-3, np.inf)
    assert float(ts[0, 0]) == pytest.approx(4.0, abs=1e-5)


def test_sphere_inside_hits_far_root():
    s = build_simple()
    o, d, t = rays([[0, 0, -5]], [[0, 0, -1]])
    ts = ix.sphere_ts(s.spheres, o, d, t, 1e-3, np.inf)
    assert float(ts[0, 0]) == pytest.approx(1.0, abs=1e-5)


def test_sphere_miss():
    s = build_simple()
    o, d, t = rays([[0, 5, 0]], [[0, 0, -1]])
    ts = ix.sphere_ts(s.spheres, o, d, t, 1e-3, np.inf)
    assert not np.isfinite(float(ts[0, 0]))


def test_sphere_unnormalized_direction():
    s = build_simple()
    o, d, t = rays([[0, 0, 0]], [[0, 0, -2]])
    ts = ix.sphere_ts(s.spheres, o, d, t, 1e-3, np.inf)
    assert float(ts[0, 0]) == pytest.approx(2.0, abs=1e-5)


def test_motion_sphere_center_moves():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.sphere((0, 0, -5), 1.0, m, center2=(0, 2, -5))
    s = b.build()
    o = jnp.asarray([[0, 2, 0]], dtype=jnp.float32)
    d = jnp.asarray([[0, 0, -1]], dtype=jnp.float32)
    # at time 0 centered at y=0 -> miss; at time 1 centered at y=2 -> hit
    t0 = ix.sphere_ts(s.spheres, o, d, jnp.asarray([0.0]), 1e-3, np.inf)
    t1 = ix.sphere_ts(s.spheres, o, d, jnp.asarray([1.0]), 1e-3, np.inf)
    assert not np.isfinite(float(t0[0, 0]))
    assert float(t1[0, 0]) == pytest.approx(4.0, abs=1e-5)


def test_quad_hit_and_interior():
    s = build_simple()
    o, d, t = rays([[0, 0, 0], [0.95, 0.95, 0.0], [1.5, 0, 0]],
                   [[0, 0, -1]] * 3)
    ts = ix.quad_ts(s.quads, o, d, 1e-3, np.inf)
    assert float(ts[0, 0]) == pytest.approx(3.0, abs=1e-5)
    assert float(ts[1, 0]) == pytest.approx(3.0, abs=1e-5)
    assert not np.isfinite(float(ts[2, 0]))  # outside the quad


def test_quad_parallel_ray_misses():
    s = build_simple()
    o, d, t = rays([[0, 0, -3]], [[1, 0, 0]])
    ts = ix.quad_ts(s.quads, o, d, 1e-3, np.inf)
    assert not np.isfinite(float(ts[0, 0]))


def test_triangle_hit_barycentric_region():
    s = build_simple()
    o, d, t = rays([[0, 0, 0], [0, 0.9, 0], [0.9, 0.9, 0]], [[0, 0, -1]] * 3)
    ts = ix.tri_ts(s.triangles, o, d, 1e-3, np.inf)
    assert float(ts[0, 0]) == pytest.approx(8.0, abs=1e-4)
    assert float(ts[1, 0]) == pytest.approx(8.0, abs=1e-4)  # near apex
    assert not np.isfinite(float(ts[2, 0]))  # outside


def test_trace_closest_of_three_classes():
    s = build_simple()
    o = jnp.asarray([[0, 0, 0]], dtype=jnp.float32)
    d = jnp.asarray([[0, 0, -1]], dtype=jnp.float32)
    t = jnp.zeros(1, dtype=jnp.float32)
    u_med = jnp.ones((1, s.media.count), dtype=jnp.float32)
    hit = trace_mod.trace(s, o, d, t, u_med)
    # quad at z=-3 is closest (sphere at 4, tri at 8)
    assert bool(hit.hit[0])
    assert float(hit.t[0]) == pytest.approx(3.0, abs=1e-5)
    np.testing.assert_allclose(hit.normal[0], [0, 0, 1], atol=1e-5)
    assert bool(hit.front_face[0])


def test_trace_normal_flips_on_backface():
    s = build_simple()
    o = jnp.asarray([[0, 0, -7]], dtype=jnp.float32)
    d = jnp.asarray([[0, 0, 1]], dtype=jnp.float32)  # hits sphere from behind-side
    t = jnp.zeros(1, dtype=jnp.float32)
    u_med = jnp.ones((1, s.media.count), dtype=jnp.float32)
    hit = trace_mod.trace(s, o, d, t, u_med)
    assert bool(hit.hit[0])
    assert float(hit.t[0]) == pytest.approx(1.0, abs=1e-5)
    # outward normal at hit is (0,0,-1); ray dir +z gives front face
    np.testing.assert_allclose(hit.normal[0], [0, 0, -1], atol=1e-5)
    assert bool(hit.front_face[0])


def test_sphere_uv_poles_and_equator():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.sphere((0, 0, 0), 1.0, m)
    s = b.build()
    o = jnp.asarray([[5, 0, 0], [0, 5, 0.001]], dtype=jnp.float32)
    d = jnp.asarray([[-1, 0, 0], [0, -1, 0]], dtype=jnp.float32)
    t = jnp.zeros(2, dtype=jnp.float32)
    u_med = jnp.ones((2, s.media.count), dtype=jnp.float32)
    hit = trace_mod.trace(s, o, d, t, u_med)
    # +x point: theta=pi/2 -> v=0.5 ; phi=atan2(0,1)+pi=pi -> u=0.5
    assert float(hit.u[0]) == pytest.approx(0.5, abs=1e-3)
    assert float(hit.v[0]) == pytest.approx(0.5, abs=1e-3)
    # top pole: -y=-1 -> theta=pi -> v=1
    assert float(hit.v[1]) == pytest.approx(1.0, abs=1e-2)


def test_quad_uv_are_alpha_beta():
    s = build_simple()
    o = jnp.asarray([[0.5, -0.5, 0]], dtype=jnp.float32)
    d = jnp.asarray([[0, 0, -1]], dtype=jnp.float32)
    t = jnp.zeros(1, dtype=jnp.float32)
    u_med = jnp.ones((1, s.media.count), dtype=jnp.float32)
    hit = trace_mod.trace(s, o, d, t, u_med)
    # quad Q=(-1,-1), u=(2,0,0), v=(0,2,0): point (0.5,-0.5) -> alpha=0.75, beta=0.25
    assert float(hit.u[0]) == pytest.approx(0.75, abs=1e-5)
    assert float(hit.v[0]) == pytest.approx(0.25, abs=1e-5)


def test_transform_bakes_rotation():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    tr = Transform(rotate_y_deg=90.0, translate=(0, 0, 0))
    b.sphere((1, 0, 0), 0.5, m, transform=tr)
    s = b.build()
    # rotate-Y by 90: (1,0,0) -> (0,0,-1)
    np.testing.assert_allclose(np.asarray(s.spheres.center0[0]), [0, 0, -1], atol=1e-6)


def test_box_expands_to_six_quads():
    # fuse=False forces the reference's six-quad expansion (the default
    # fuses an axis-aligned uv-free box into one types.Boxes row)
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.box((0, 0, 0), (1, 2, 3), m, fuse=False)
    s = b.build()
    assert s.quads.count == 6
    areas = np.asarray(s.quads.area)
    # 2*(1*2) + 2*(2*3) + 2*(1*3) faces
    assert sorted(areas.tolist()) == pytest.approx(sorted([2, 2, 6, 6, 3, 3]))


def test_gemm_vs_oracle_random_soup():
    """Random spheres/quads/tris vs a per-ray NumPy oracle of the reference
    hit routines. Runs in float64 so the comparison isolates algorithmic
    agreement from f32 conditioning on grazing hits."""
    import jax

    rs = np.random.default_rng(7)
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    n_s, n_q, n_t = 20, 20, 20
    for _ in range(n_s):
        b.sphere(rs.uniform(-5, 5, 3), rs.uniform(0.2, 1.0), m)
    for _ in range(n_q):
        b.quad(rs.uniform(-5, 5, 3), rs.uniform(-2, 2, 3), rs.uniform(-2, 2, 3), m)
    for _ in range(n_t):
        b.triangle([rs.uniform(-5, 5, 3) for _ in range(3)], m)

    n_rays = 64
    o_np = rs.uniform(-8, 8, (n_rays, 3))
    d_np = rs.normal(size=(n_rays, 3))

    with jax.enable_x64(True):
        s = b.build(dtype=jnp.float64)
        o = jnp.asarray(o_np, dtype=jnp.float64)
        d = jnp.asarray(d_np, dtype=jnp.float64)
        tt = jnp.zeros(n_rays, dtype=jnp.float64)

        ts_s = np.asarray(ix.sphere_ts(s.spheres, o, d, tt, 1e-3, np.inf))
        ts_q = np.asarray(ix.quad_ts(s.quads, o, d, 1e-3, np.inf))
        ts_t = np.asarray(ix.tri_ts(s.triangles, o, d, 1e-3, np.inf))

    c0 = np.asarray(s.spheres.center0)
    rad = np.asarray(s.spheres.radius)
    for ri in range(0, n_rays, 7):
        for si in range(n_s):
            t_oracle = _sphere_oracle(c0[si], rad[si], o_np[ri], d_np[ri])
            _cmp(ts_s[ri, si], t_oracle)
    qq = np.asarray(s.quads.q); qu = np.asarray(s.quads.u); qv = np.asarray(s.quads.v)
    for ri in range(0, n_rays, 7):
        for qi in range(n_q):
            t_oracle = _quad_oracle(qq[qi], qu[qi], qv[qi], o_np[ri], d_np[ri])
            _cmp(ts_q[ri, qi], t_oracle)
    v0 = np.asarray(s.triangles.v0); e0 = np.asarray(s.triangles.e0); e1 = np.asarray(s.triangles.e1)
    for ri in range(0, n_rays, 7):
        for ti in range(n_t):
            t_oracle = _tri_oracle(v0[ti], e0[ti], e1[ti], o_np[ri], d_np[ri])
            _cmp(ts_t[ri, ti], t_oracle)


def _cmp(t_gemm, t_oracle, tol=1e-6):
    if t_oracle is None:
        assert not np.isfinite(t_gemm), f"unexpected hit at {t_gemm}"
    else:
        assert np.isfinite(t_gemm), f"expected hit at {t_oracle}"
        assert abs(t_gemm - t_oracle) < tol * max(1.0, abs(t_oracle))


def _sphere_oracle(c, r, o, d, tmin=1e-3, tmax=np.inf):
    oc = c - o
    a = d @ d
    h = d @ oc
    cc = oc @ oc - r * r
    disc = h * h - a * cc
    if disc < 0:
        return None
    sq = np.sqrt(disc)
    root = (h - sq) / a
    if not (tmin < root < tmax):
        root = (h + sq) / a
        if not (tmin < root < tmax):
            return None
    return root


def _quad_oracle(q, u, v, o, d, tmin=1e-3, tmax=np.inf):
    n = np.cross(u, v)
    area = np.linalg.norm(n)
    normal = n / area
    w = n / (n @ n)
    D = normal @ q
    denom = normal @ d
    if abs(denom) < 1e-8:
        return None
    t = (D - normal @ o) / denom
    if not (tmin <= t <= tmax):
        return None
    p = o + t * d - q
    alpha = w @ np.cross(p, v)
    beta = w @ np.cross(u, p)
    if not (0 <= alpha <= 1 and 0 <= beta <= 1):
        return None
    return t


def _tri_oracle(v0, e0, e1, o, d, tmin=1e-3, tmax=np.inf):
    pvec = np.cross(d, e1)
    det = e0 @ pvec
    if abs(det) < 1e-8:
        return None
    inv = 1.0 / det
    tvec = o - v0
    u = tvec @ pvec * inv
    if u < 0 or u > 1:
        return None
    qvec = np.cross(tvec, e0)
    v = d @ qvec * inv
    if v < 0 or u + v > 1:
        return None
    t = e1 @ qvec * inv
    if t < tmin or t > tmax:
        return None
    return t
