"""Binned mesh intersector (scene/clusters.py + ops/pallas/stream.py +
ops/trace.binned_closest): exact agreement with the BVH8 walk kernel and
the dense intersector, including capped rays, dead lanes, and pool
padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.ops import intersect as ix
from go_raytracer_tpu.ops import trace as trace_mod
from go_raytracer_tpu.ops.pallas import traverse8 as ptrav8
from go_raytracer_tpu.scene import bvh as bvh_mod
from go_raytracer_tpu.scene import clusters as cl_mod
from tests.test_traverse8 import _scenes_with_and_without_bvh, random_mesh


def test_partition_covers_all_triangles():
    v = random_mesh(1000, seed=7)
    fb = bvh_mod.build(v, leaf_size=16)
    perm = fb.order[:1000]
    vp = v[perm]
    v0 = vp[:, 0]
    cl = cl_mod.partition(fb, v0, vp[:, 1] - v0, vp[:, 2] - v0,
                          max_tris=64)
    assert cl.n_clusters > 4
    # every leaf-order triangle id appears exactly once in the group table
    tl = cl.tri_lines
    ids = []
    for g in range(cl.n_groups):
        line = tl[(g >> 3) * 8:(g >> 3) * 8 + 8, (g & 7) * 16:(g & 7) * 16 + 16]
        ids.extend(int(t) for t in line[:, 9] if t >= 0)
    assert sorted(ids) == list(range(1000))
    # group ranges ascend and tile the table
    gsn = np.asarray(cl.group_start)
    assert gsn[0] == 0 and gsn[-1] == cl.n_groups
    assert (np.diff(gsn) >= 1).all()
    # cluster boxes contain their triangles
    lo = np.asarray(cl.aabb_lo)
    hi = np.asarray(cl.aabb_hi)
    for k in range(cl.n_clusters):
        for g in range(gsn[k], gsn[k + 1]):
            line = tl[(g >> 3) * 8:(g >> 3) * 8 + 8,
                      (g & 7) * 16:(g & 7) * 16 + 16]
            valid = line[:, 9] >= 0
            p0 = line[valid, 0:3]
            p1 = p0 + line[valid, 3:6]
            p2 = p0 + line[valid, 6:9]
            pts = np.concatenate([p0, p1, p2])
            assert (pts >= lo[k] - 1e-3).all() and (pts <= hi[k] + 1e-3).all()


@pytest.mark.parametrize("seed,n_tris,n_rays", [(33, 3000, 2176),
                                                (51, 500, 777)])
def test_binned_matches_walk_exactly(seed, n_tris, n_rays):
    """Winners (idx) bit-match the BVH8 walk and t matches within FP
    fusion noise, across capped rays, dead lanes, and padded pools."""
    import os
    os.environ["GRT_CLUSTER_TRIS"] = "64"
    try:
        s_bvh, s_dense = _scenes_with_and_without_bvh(n_tris, seed=seed)
    finally:
        del os.environ["GRT_CLUSTER_TRIS"]
    bvh = s_bvh.tri_bvh
    rs = np.random.default_rng(seed + 1)
    o = jnp.asarray(rs.uniform(-15, 15, (n_rays, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n_rays, 3)), dtype=jnp.float32)
    cap = jnp.asarray(np.where(rs.uniform(size=n_rays) < 0.3, 5.0, np.inf),
                      jnp.float32)
    alive = jnp.asarray(rs.uniform(size=n_rays) < 0.9)
    t_b, i_b = trace_mod.binned_closest(s_bvh, o, d, cap, alive)
    t_w, i_w = ptrav8.bvh8_closest(
        bvh.nodes8, bvh.tris8, o, d, jnp.where(alive, cap, 0.0),
        dense_nodes=bvh.bvh8_dense, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_w))
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_w), rtol=1e-5)


def test_binned_non_tile_multiple_prefix():
    """Regression: a pool whose n//8 is not a kernel-tile multiple
    (n = 9216 -> n//8 = 1152) must not break the two-phase shrink's
    reshape — the phase-2 prefix is rounded up to a whole 1024-lane
    tile (advisor round 4, ops/trace.py)."""
    import os
    os.environ["GRT_CLUSTER_TRIS"] = "64"
    try:
        s_bvh, _ = _scenes_with_and_without_bvh(500, seed=77)
    finally:
        del os.environ["GRT_CLUSTER_TRIS"]
    bvh = s_bvh.tri_bvh
    rs = np.random.default_rng(78)
    n = 9216
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    t_b, i_b = trace_mod.binned_closest(s_bvh, o, d)
    t_w, i_w = ptrav8.bvh8_closest(
        bvh.nodes8, bvh.tris8, o, d, jnp.full((n,), jnp.inf, jnp.float32),
        dense_nodes=bvh.bvh8_dense, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_w))
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_w), rtol=1e-5)


def test_stream_hbm_matches_vmem(monkeypatch):
    """The HBM double-buffered table variant (stream._stream_kernel_hbm,
    used for Sponza-scale tables past VMEM_TABLE_BYTES) returns the same
    winners as the VMEM-resident path."""
    from go_raytracer_tpu.ops.pallas import stream as pstream

    import os
    os.environ["GRT_CLUSTER_TRIS"] = "64"
    try:
        s_bvh, _ = _scenes_with_and_without_bvh(600, seed=91)
    finally:
        del os.environ["GRT_CLUSTER_TRIS"]
    bvh = s_bvh.tri_bvh
    rs = np.random.default_rng(92)
    n = 1280
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    t_v, i_v = trace_mod.binned_closest(s_bvh, o, d)
    monkeypatch.setattr(pstream, "VMEM_TABLE_BYTES", 1)
    # same shapes would hit the jit cache; clear to force a re-trace
    pstream.stream_rows.clear_cache()
    try:
        t_h, i_h = trace_mod.binned_closest(s_bvh, o, d)
    finally:
        monkeypatch.undo()
        pstream.stream_rows.clear_cache()
    np.testing.assert_array_equal(np.asarray(i_h), np.asarray(i_v))
    np.testing.assert_allclose(np.asarray(t_h), np.asarray(t_v), rtol=1e-6)


def test_binned_matches_dense_via_trace_route(monkeypatch):
    """pallas_bvh_closest routes through the binned intersector by
    default and agrees with the dense reference."""
    monkeypatch.setenv("GRT_MESH", "binned")
    s_bvh, s_dense = _scenes_with_and_without_bvh(400, seed=21)
    assert s_bvh.tri_bvh.cl_lines is not None
    rs = np.random.default_rng(22)
    n = 777
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    t_p, _ = trace_mod.pallas_bvh_closest(s_bvh, o, d)
    ts = ix.tri_ts(s_dense.triangles, o, d, 1e-3, np.inf)
    t_d = np.asarray(ts.min(axis=1))
    hits = np.isfinite(t_d)
    t_p = np.asarray(t_p)
    assert (np.isfinite(t_p) == hits).all()
    np.testing.assert_allclose(t_p[hits], t_d[hits], rtol=2e-4)


def test_binned2_matches_walk(monkeypatch):
    """The v2 persistent-block intersector (ops/pallas/stream2.py,
    GRT_MESH=binned2 — a measured performance negative, kept selectable)
    bit-matches the walk."""
    import os
    os.environ["GRT_CLUSTER_TRIS"] = "64"
    os.environ["GRT_CLUSTER2_TRIS"] = "32"
    try:
        s_bvh, _ = _scenes_with_and_without_bvh(3000, seed=33)
    finally:
        del os.environ["GRT_CLUSTER_TRIS"]
        del os.environ["GRT_CLUSTER2_TRIS"]
    bvh = s_bvh.tri_bvh
    assert bvh.cl2_lines is not None
    rs = np.random.default_rng(34)
    n = 2176
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    cap = jnp.asarray(np.where(rs.uniform(size=n) < 0.3, 5.0, np.inf),
                      jnp.float32)
    alive = jnp.asarray(rs.uniform(size=n) < 0.9)
    t_b, i_b = trace_mod.binned2_closest(s_bvh, o, d, cap, alive)
    t_w, i_w = ptrav8.bvh8_closest(
        bvh.nodes8, bvh.tris8, o, d, jnp.where(alive, cap, 0.0),
        dense_nodes=bvh.bvh8_dense, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_w))
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_w), rtol=1e-5)


def test_binned_fused_round_matches_walk(monkeypatch):
    """The fused-round stream kernel (stream_round_rows: stream +
    interval mark + in-kernel candidate scan; GRT_B1_FUSED=1 — measured
    a wash, kept selectable) bit-matches the walk."""
    monkeypatch.setenv("GRT_B1_FUSED", "1")
    import os
    os.environ["GRT_CLUSTER_TRIS"] = "64"
    try:
        s_bvh, _ = _scenes_with_and_without_bvh(2500, seed=55)
    finally:
        del os.environ["GRT_CLUSTER_TRIS"]
    bvh = s_bvh.tri_bvh
    assert bvh.cl_boxes is not None
    rs = np.random.default_rng(56)
    n = 2176
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    cap = jnp.asarray(np.where(rs.uniform(size=n) < 0.3, 5.0, np.inf),
                      jnp.float32)
    alive = jnp.asarray(rs.uniform(size=n) < 0.9)
    t_b, i_b = trace_mod.binned_closest(s_bvh, o, d, cap, alive)
    t_w, i_w = ptrav8.bvh8_closest(
        bvh.nodes8, bvh.tris8, o, d, jnp.where(alive, cap, 0.0),
        dense_nodes=bvh.bvh8_dense, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_w))
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_w), rtol=1e-5)
