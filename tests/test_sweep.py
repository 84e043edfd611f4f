"""Cluster-sweep intersector (ops/pallas/sweep.py): exact closest-hit
parity with the BVH8 walk — structural, since the sweep MTs a superset of
the walk's triangles — plus encoding edge cases."""

import jax
import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.ops.pallas import sweep as psweep
from go_raytracer_tpu.ops.pallas import traverse8 as p8


def _mesh(tris_target):
    from bench_mesh import build_mesh_scene

    scene, _ = build_mesh_scene(tris_target)
    bvh = scene.tri_bvh
    tr = scene.triangles
    order = np.asarray(bvh.order)
    valid = order >= 0
    safe = np.where(valid, order, 0)
    v0 = np.where(valid[:, None], np.asarray(tr.v0)[safe], 0.0)
    e0 = np.where(valid[:, None], np.asarray(tr.e0)[safe], 0.0)
    e1 = np.where(valid[:, None], np.asarray(tr.e1)[safe], 0.0)
    return scene, bvh, v0, e0, e1


def _rays(n, seed=0):
    rs = np.random.default_rng(seed)
    o = jnp.asarray(rs.uniform(-5, 5, (n, 3)), jnp.float32)
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def test_sweep_matches_bvh8_walk():
    scene, bvh, v0, e0, e1 = _mesh(4096)
    clu, tri, kb, ng = psweep.build_clusters(
        bvh.node_min, bvh.node_max, bvh.first, bvh.count, bvh.skip,
        v0, e0, e1, max_tris=64)
    o, d = _rays(1024)
    t_s, i_s = psweep.cluster_sweep_closest(clu, tri, o, d, n_blocks=kb,
                                            ng_fixed=ng, interpret=True)
    t_w, i_w = p8.bvh8_closest(bvh.nodes8, bvh.tris8, o, d,
                               dense_nodes=bool(bvh.bvh8_dense),
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_w))
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_w),
                               rtol=1e-6, atol=1e-6)
    assert int((np.asarray(i_s) >= 0).sum()) > 50  # the test actually hits


def test_sweep_respects_t_cap():
    scene, bvh, v0, e0, e1 = _mesh(4096)
    clu, tri, kb, ng = psweep.build_clusters(
        bvh.node_min, bvh.node_max, bvh.first, bvh.count, bvh.skip,
        v0, e0, e1, max_tris=32)
    o, d = _rays(512, seed=3)
    t_open, i_open = psweep.cluster_sweep_closest(
        clu, tri, o, d, n_blocks=kb, ng_fixed=ng, interpret=True)
    # cap halfway below each found hit: those hits must disappear
    cap = jnp.where(i_open >= 0, t_open * 0.5, jnp.inf)
    t_c, i_c = psweep.cluster_sweep_closest(clu, tri, o, d, cap,
                                            n_blocks=kb, ng_fixed=ng,
                                            interpret=True)
    hit = np.asarray(i_open) >= 0
    survived = np.asarray(i_c)[hit]
    closer = np.asarray(t_c)[hit] < np.asarray(t_open)[hit] * 0.5
    assert np.all((survived < 0) | closer)


def test_sweep_encoding_bounds():
    """Group base/count packing stays f32-exact at reference scale."""
    scene, bvh, v0, e0, e1 = _mesh(4096)
    clu, tri, kb, ng = psweep.build_clusters(
        bvh.node_min, bvh.node_max, bvh.first, bvh.count, bvh.skip,
        v0, e0, e1, max_tris=64)
    assert ng == 8
    blocks = np.asarray(clu)
    # decode every encoded range back and check group coverage is exact
    enc = []
    for b in range(kb):
        row0 = blocks[b * 8]
        enc.extend(int(v) for v in row0[8:16] if v > 0)
    bases = [e >> psweep.ENC_SHIFT for e in enc]
    counts = [e & psweep.MAX_GROUPS_PER_CLUSTER for e in enc]
    assert bases[0] == 0
    spans = sorted(zip(bases, counts))
    end = 0
    for b, c in spans:
        assert b == end and c >= 1
        end = b + c
    # tri_lines has ceil(G/8)*8 rows (one row per packed entry, padded)
    assert end <= tri.shape[0] and tri.shape[0] - end < 8
