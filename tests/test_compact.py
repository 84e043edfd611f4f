"""Order-preserving Pallas row compaction (ops/pallas/compact.py) vs a
numpy reference, exact, including edge masks."""

import numpy as np
import jax.numpy as jnp

from go_raytracer_tpu.ops.pallas import compact as pc


def _ref(started, vals):
    out = np.zeros_like(vals)
    for r in range(vals.shape[0]):
        kept = vals[r][started[r] != 0]
        out[r, :kept.shape[0]] = kept
    return out, (started != 0).sum(axis=1)


def _run(started, hr, hg, hb):
    return pc.compact_rows(jnp.asarray(started), jnp.asarray(hr),
                           jnp.asarray(hg), jnp.asarray(hb), interpret=True)


def test_compact_matches_reference_random():
    rs = np.random.default_rng(0)
    r, n = 5, 1024
    started = (rs.uniform(size=(r, n)) < 0.3).astype(np.int32)
    vals = [rs.normal(size=(r, n)).astype(np.float32) for _ in range(3)]
    outs = _run(started, *vals)
    for o, v in zip(outs, vals):
        ref, cnt = _ref(started, v)
        o = np.asarray(o)
        for row in range(r):
            np.testing.assert_array_equal(o[row, :cnt[row]],
                                          ref[row, :cnt[row]])


def test_compact_edge_masks():
    n = 512
    cases = [
        np.ones((1, n), np.int32),                       # all kept
        np.zeros((1, n), np.int32),                      # none kept
        (np.arange(n) % 2).reshape(1, n).astype(np.int32),   # alternating
        (np.arange(n) >= n - 130).reshape(1, n).astype(np.int32),  # tail run
        (np.arange(n) < 130).reshape(1, n).astype(np.int32),       # head run
        (np.arange(n) % 128 == 127).reshape(1, n).astype(np.int32),
    ]
    rs = np.random.default_rng(1)
    started = np.concatenate(cases)
    vals = [rs.normal(size=started.shape).astype(np.float32)
            for _ in range(3)]
    outs = _run(started, *vals)
    for o, v in zip(outs, vals):
        ref, cnt = _ref(started, v)
        o = np.asarray(o)
        for row in range(started.shape[0]):
            np.testing.assert_array_equal(o[row, :cnt[row]],
                                          ref[row, :cnt[row]])


def test_compact_dense_rows_cross_chunk_boundaries():
    # counts that straddle 128-lane emission boundaries repeatedly
    rs = np.random.default_rng(2)
    r, n = 3, 2048
    started = (rs.uniform(size=(r, n)) < 0.9).astype(np.int32)
    vals = [rs.normal(size=(r, n)).astype(np.float32) for _ in range(3)]
    outs = _run(started, *vals)
    for o, v in zip(outs, vals):
        ref, cnt = _ref(started, v)
        o = np.asarray(o)
        for row in range(r):
            np.testing.assert_array_equal(o[row, :cnt[row]],
                                          ref[row, :cnt[row]])
