"""BVH8 collapse + sublane-batched traversal tests: structural invariants
of the 8-wide collapse and exact agreement with the dense GEMM intersector
(interpret mode — the same kernel code Mosaic compiles on TPU)."""

import numpy as np
import jax.numpy as jnp

from go_raytracer_tpu.ops import intersect as ix
from go_raytracer_tpu.ops import trace as trace_mod
from go_raytracer_tpu.ops.pallas import traverse8 as ptrav8
from go_raytracer_tpu.scene import bvh as bvh_mod
from go_raytracer_tpu.scene import bvh8 as bvh8_mod
from go_raytracer_tpu.scene.builder import SceneBuilder

from tests.test_bvh import random_mesh, _scenes_with_and_without_bvh


def _collapse_for(v, leaf_size=16):
    fb = bvh_mod.build(v, leaf_size=leaf_size)
    perm = fb.order[: v.shape[0]]
    vp = v[perm]
    v0 = vp[:, 0]
    return fb, bvh8_mod.collapse(
        fb.node_min, fb.node_max, fb.first, fb.count, fb.skip,
        v0, vp[:, 1] - v0, vp[:, 2] - v0, max_leaf=leaf_size), vp


def _unpack_entry(lines, m):
    """Host-side mirror of traverse8._entry (line-packed triangle groups)."""
    rows = lines[(m >> 3) * 8:(m >> 3) * 8 + 8]
    return np.roll(rows, -((m & 7) * 16), axis=1)[:, :16]


def _unpack_node(lines, m):
    """Host-side mirror of traverse8._entry_padded (one node per line)."""
    return lines[m * 8:m * 8 + 8, :16]


def test_collapse_covers_all_triangles_once():
    v = random_mesh(700, seed=11)
    fb, b8, vp = _collapse_for(v, leaf_size=16)
    # walk the packed node table host-side, collect leaf groups
    seen = []
    stack = [0]
    visited_nodes = 0
    while stack:
        m = stack.pop()
        visited_nodes += 1
        e = _unpack_node(b8.node_lines, m)
        for c in range(8):
            p = e[0, 8 + c]
            lo, hi = e[c, 0:3], e[c, 3:6]
            if np.any(np.isnan(lo)):      # empty slot
                continue
            assert np.all(lo <= hi)
            if p >= 0:
                stack.append(int(p))
            else:
                enc = -int(p) - 1
                g, two = enc >> 1, enc & 1
                for gg in range(g, g + two + 1):
                    te = _unpack_entry(b8.tri_lines, gg)
                    seen.extend(int(t) for t in te[:, 9] if t >= 0)
    assert visited_nodes == b8.n_nodes
    assert sorted(seen) == list(range(700))
    # triangle rows match the permuted table
    te = _unpack_entry(b8.tri_lines, 0)
    t0 = int(te[0, 9])
    np.testing.assert_allclose(te[0, 0:3], vp[t0, 0], rtol=1e-6)


def test_bvh8_matches_dense_closest_hit():
    s_bvh, s_dense = _scenes_with_and_without_bvh(300, seed=6)
    assert s_bvh.tri_bvh.nodes8 is not None
    rs = np.random.default_rng(7)
    n = 1024
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)

    t_p, i_p = ptrav8.bvh8_closest(s_bvh.tri_bvh.nodes8,
                                   s_bvh.tri_bvh.tris8,
                                   o, d, interpret=True)
    ts = ix.tri_ts(s_dense.triangles, o, d, 1e-3, np.inf)
    t_d = np.asarray(ts.min(axis=1))
    hits = np.isfinite(t_d)
    t_p = np.asarray(t_p)
    assert (np.isfinite(t_p) == hits).all()
    np.testing.assert_allclose(t_p[hits], t_d[hits], rtol=2e-4)
    # winning ids index the permuted scene table: hit point on that plane
    idx = np.asarray(i_p)[hits]
    assert (idx >= 0).all()
    p_hit = np.asarray(o)[hits] + t_p[hits, None] * np.asarray(d)[hits]
    v0 = np.asarray(s_bvh.triangles.v0)[idx]
    cn = np.asarray(s_bvh.triangles.cn)[idx]
    off = np.abs(((p_hit - v0) * cn).sum(-1)) / (
        np.linalg.norm(cn, axis=-1) + 1e-30)
    assert off.max() < 1e-3


def test_bvh8_t_cap_prunes_but_keeps_closer_hits():
    s_bvh, s_dense = _scenes_with_and_without_bvh(200, seed=9)
    rs = np.random.default_rng(10)
    n = 512
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    ts = ix.tri_ts(s_dense.triangles, o, d, 1e-3, np.inf)
    t_d = np.asarray(ts.min(axis=1))
    # cap half the rays below their closest hit, half above
    cap = np.where(np.arange(n) % 2 == 0,
                   np.where(np.isfinite(t_d), t_d * 0.5, 1.0),
                   np.where(np.isfinite(t_d), t_d * 2.0, 1e30))
    t_p, i_p = ptrav8.bvh8_closest(
        s_bvh.tri_bvh.nodes8, s_bvh.tri_bvh.tris8, o, d,
        jnp.asarray(cap, jnp.float32), interpret=True)
    t_p, i_p = np.asarray(t_p), np.asarray(i_p)
    capped = (np.arange(n) % 2 == 0)
    # capped rays: no hit beats the cap -> idx -1, t == cap
    assert (i_p[capped] == -1).all()
    np.testing.assert_allclose(t_p[capped], cap[capped], rtol=1e-6)
    good = ~capped & np.isfinite(t_d)
    np.testing.assert_allclose(t_p[good], t_d[good], rtol=2e-4)
    assert (i_p[good] >= 0).all()


def test_bvh8_single_leaf_tree():
    # fewer triangles than one leaf: root is a leaf, BVH8 wraps it in a
    # one-slot node
    v = random_mesh(5, seed=13)
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.add_mesh(v, np.full(5, m, dtype=np.int32))
    s = b.build(bvh_threshold=1, bvh_leaf_size=16)
    rs = np.random.default_rng(14)
    n = 256
    o = jnp.asarray(rs.uniform(-12, 12, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    t_p, _ = ptrav8.bvh8_closest(s.tri_bvh.nodes8, s.tri_bvh.tris8, o, d,
                                 interpret=True)
    ts = ix.tri_ts(s.triangles, o, d, 1e-3, np.inf)
    t_d = np.asarray(ts.min(axis=1))
    hits = np.isfinite(t_d)
    t_p = np.asarray(t_p)
    assert (np.isfinite(t_p) == hits).all()
    np.testing.assert_allclose(t_p[hits], t_d[hits], rtol=2e-4)


def test_bvh8_dense_nodes_matches_padded():
    """The Sponza-scale dense (line-packed, rolled) node layout must give
    bit-identical traversal results to the default one-per-line layout."""
    v = random_mesh(400, seed=31)
    fb = bvh_mod.build(v, leaf_size=16)
    perm = fb.order[:400]
    vp = v[perm]
    v0 = vp[:, 0]
    args = (fb.node_min, fb.node_max, fb.first, fb.count, fb.skip,
            v0, vp[:, 1] - v0, vp[:, 2] - v0)
    b8p = bvh8_mod.collapse(*args, max_leaf=16, dense_nodes=False)
    b8d = bvh8_mod.collapse(*args, max_leaf=16, dense_nodes=True)
    assert not b8p.dense_nodes and b8d.dense_nodes
    assert b8d.node_lines.shape[0] < b8p.node_lines.shape[0]
    rs = np.random.default_rng(32)
    n = 512
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    t_p, i_p = ptrav8.bvh8_closest(
        jnp.asarray(b8p.node_lines), jnp.asarray(b8p.tri_lines), o, d,
        interpret=True)
    t_d, i_d = ptrav8.bvh8_closest(
        jnp.asarray(b8d.node_lines), jnp.asarray(b8d.tri_lines), o, d,
        dense_nodes=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_d))
    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_d))


def test_alive_mask_skips_dead_lanes_exactly():
    """pallas_bvh_closest with an alive mask: dead lanes come back with a
    zero cap and idx -1 (their walk dies at the root), alive lanes are
    bit-identical to the unmasked call."""
    s_bvh, s_dense = _scenes_with_and_without_bvh(300, seed=41)
    rs = np.random.default_rng(42)
    n = 640
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    alive = jnp.asarray(rs.uniform(size=n) < 0.4)
    t_all, i_all = trace_mod.pallas_bvh_closest(s_bvh, o, d)
    t_m, i_m = trace_mod.pallas_bvh_closest(s_bvh, o, d, alive=alive)
    al = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(i_m)[al], np.asarray(i_all)[al])
    np.testing.assert_array_equal(np.asarray(t_m)[al], np.asarray(t_all)[al])
    assert (np.asarray(i_m)[~al] == -1).all()
    assert (np.asarray(t_m)[~al] == 0.0).all()


def test_trace_routes_through_bvh8():
    """The full closest-hit path (pallas_bvh_closest) must agree with the
    dense scene when routed through the BVH8 kernel (the default)."""
    s_bvh, s_dense = _scenes_with_and_without_bvh(400, seed=21)
    rs = np.random.default_rng(22)
    n = 777   # non-multiple of the tile: exercises padding
    o = jnp.asarray(rs.uniform(-15, 15, (n, 3)), dtype=jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), dtype=jnp.float32)
    t_p, i_p = trace_mod.pallas_bvh_closest(s_bvh, o, d)
    ts = ix.tri_ts(s_dense.triangles, o, d, 1e-3, np.inf)
    t_d = np.asarray(ts.min(axis=1))
    hits = np.isfinite(t_d)
    t_p = np.asarray(t_p)
    assert (np.isfinite(t_p) == hits).all()
    np.testing.assert_allclose(t_p[hits], t_d[hits], rtol=2e-4)
