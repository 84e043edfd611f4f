"""Fused Pallas reverse-harvest kernel (ops/pallas/harvest.py) vs the XLA
reverse scan + stable-sort compaction it replaces (integrator/regen.py
rev_outer) — exact per-row started-prefix equality (row tails are
overwritten by the caller's base-to-base accumulator writes, so only the
prefix is contractual)."""

import numpy as np
import jax.numpy as jnp

from go_raytracer_tpu.ops.pallas import harvest as ph

MAXC = 1.5


def _ref(E, W, CF, STs, refill_outer, max_contribution):
    """Numpy mirror of regen.rev_outer + the started-first stable sort.
    E/W: (outer, cadence, N, 3); CF: (outer, cadence, N) bool;
    STs: (outer, N) bool. Returns (refill_outer, N, 3) compacted rows and
    per-row started counts."""
    outer, cadence, n, _ = E.shape
    L = np.zeros((n, 3), np.float64)
    H = np.zeros((outer, n, 3), np.float64)
    for r in reversed(range(outer)):
        for j in reversed(range(cadence)):
            raw = E[r, j] + W[r, j] * L
            s = raw.sum(axis=-1)
            with np.errstate(invalid="ignore"):
                over = CF[r, j] & (s > max_contribution)
            scale = np.where(over, max_contribution / np.where(over, s, 1.0),
                             1.0)
            L = raw * scale[:, None]
        started = STs[r]
        H[r] = np.where(started[:, None], L, 0.0)
        L = np.where(started[:, None], 0.0, L)
    out = np.zeros((refill_outer, n, 3), np.float64)
    counts = STs[:refill_outer].sum(axis=1)
    for r in range(refill_outer):
        kept = H[r][STs[r]]
        out[r, : kept.shape[0]] = kept
    return out, counts


def _run_kernel(E, W, CF, STs, cadence, refill_outer, max_contribution):
    # merged V/FL record format (round 4): V = E where the vertex emits
    # (disjoint from W by material semantics), FL bits = clamp | emit<<1
    emit = np.isnan(E).any(axis=-1) | (E != 0.0).any(axis=-1)
    V = np.where(emit[..., None], E, W)
    FL = CF.astype(np.int32) | (emit.astype(np.int32) << 1)
    comp = lambda x, c: jnp.asarray(x[..., c], jnp.float32)
    hr, hg, hb = ph.reverse_harvest(
        comp(V, 0), comp(V, 1), comp(V, 2),
        jnp.asarray(FL, jnp.int32), jnp.asarray(STs, jnp.int32),
        cadence=cadence, refill_outer=refill_outer,
        max_contribution=max_contribution, interpret=True)
    return np.stack([np.asarray(hr), np.asarray(hg), np.asarray(hb)],
                    axis=-1)


def _make_window(rs, outer, cadence, n, refill_outer, p_start=0.3,
                 p_term=0.35, p_clamp=0.3):
    """Random record planes with the real structural invariants: W = 0 at
    terminal steps (resets the recursion across path boundaries), starts
    only in refill rows, clamp flags arbitrary."""
    E = rs.uniform(0.0, 2.0, size=(outer, cadence, n, 3)).astype(np.float32)
    W = rs.uniform(0.0, 1.0, size=(outer, cadence, n, 3)).astype(np.float32)
    term = rs.uniform(size=(outer, cadence, n)) < p_term
    W[term] = 0.0
    # emission only at terminal vertices (lights/background terminate,
    # scatterers don't emit) — the invariant the merged V/FL record
    # format encodes
    E[~term] = 0.0
    CF = rs.uniform(size=(outer, cadence, n)) < p_clamp
    STs = np.zeros((outer, n), bool)
    STs[:refill_outer] = rs.uniform(size=(refill_outer, n)) < p_start
    return E, W, CF, STs


def _check(E, W, CF, STs, cadence, refill_outer):
    got = _run_kernel(E, W, CF, STs, cadence, refill_outer, MAXC)
    ref, counts = _ref(E, W, CF, STs, refill_outer, MAXC)
    for r in range(refill_outer):
        c = int(counts[r])
        np.testing.assert_allclose(got[r, :c], ref[r, :c].astype(np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_harvest_matches_reference_random():
    rs = np.random.default_rng(0)
    outer, cadence, n, refill_outer = 6, 4, 512, 3
    _check(*_make_window(rs, outer, cadence, n, refill_outer),
           cadence=cadence, refill_outer=refill_outer)


def test_harvest_cadence_one_and_wide():
    rs = np.random.default_rng(1)
    # cadence 1 (mesh path) and a wider lane pool crossing shift stages
    _check(*_make_window(rs, 5, 1, 1024, 4),
           cadence=1, refill_outer=4)


def test_harvest_edge_start_masks():
    rs = np.random.default_rng(2)
    outer, cadence, n, refill_outer = 4, 2, 512, 2
    E, W, CF, STs = _make_window(rs, outer, cadence, n, refill_outer)
    cases = [
        np.ones(n, bool),                    # every lane starts
        np.zeros(n, bool),                   # none
        np.arange(n) % 2 == 1,               # alternating
        np.arange(n) >= n - 130,             # tail run crossing a lane row
    ]
    for case in cases:
        STs[:] = False
        STs[0] = case
        STs[1] = rs.uniform(size=n) < 0.5
        _check(E, W, CF, STs, cadence=cadence, refill_outer=refill_outer)


def test_render_regen_fused_harvest_matches_default():
    """End-to-end: harvest="fused" must render bit-identically to the
    XLA scan+sort epilogue through render_regen's pallas path. (The
    harvest mode is a real static jit arg — an env flip alone would NOT
    recompile the window, which is why render_regen resolves the env
    before dispatch.)"""
    import jax
    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.render.camera import Camera
    from go_raytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder(background=(0, 0, 0))
    white = b.lambertian((0.73, 0.73, 0.73))
    light = b.diffuse_light((8, 8, 8))
    b.quad((-4, 0, -4), (8, 0, 0), (0, 0, 8), white)
    lq = b.quad((-1, 3.9, -1), (2, 0, 0), (0, 0, 2), light)
    b.sphere((1, 1, 0), 1.0, b.metal((0.9, 0.9, 0.9), 0.1))
    b.add_light(lq)
    scene = b.build()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=5)
    cam.position((0, 2, 8), (0, 1, 0))

    def render(hv):
        img, _ = regen.render_regen(scene, cam, jax.random.key(7),
                                    n_lanes=4096, backend="pallas",
                                    cadence=2, harvest=hv)
        return img

    np.testing.assert_array_equal(render("fused"), render("xla"))


def test_render_regen_ik_fused_harvest_matches_xla():
    """Same bit-identity for the in-kernel queue's PER-LEVEL harvest
    (reverse_harvest_levels vs the per-level scan+sort)."""
    import jax
    from go_raytracer_tpu.integrator import regen
    from go_raytracer_tpu.render.camera import Camera
    from go_raytracer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder(background=(0.1, 0.1, 0.2))
    white = b.lambertian((0.73, 0.73, 0.73))
    b.quad((-4, 0, -4), (8, 0, 0), (0, 0, 8), white)
    lq = b.quad((-1, 3.9, -1), (2, 0, 0), (0, 0, 2),
                b.diffuse_light((6, 6, 6)))
    b.sphere((-1, 1, 1), 1.0, b.dielectric(1.5))
    b.add_light(lq)
    scene = b.build()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=9,
                 max_depth=6)
    cam.position((0, 2, 8), (0, 1, 0))

    def render(hv):
        img, st = regen.render_regen(scene, cam, jax.random.key(9),
                                     n_lanes=4096, backend="pallas",
                                     schedule="queue_ik", cadence=3,
                                     harvest=hv)
        assert st["schedule"] == "queue_ik"
        return img

    np.testing.assert_array_equal(render("fused"), render("xla"))


def test_harvest_clamp_and_nan_parity():
    # NaN component sums must compare FALSE against max_contribution
    # (camera.go:334-341 Go parity) — the clamp never rescales a NaN lane.
    rs = np.random.default_rng(3)
    outer, cadence, n, refill_outer = 3, 2, 256, 2
    E, W, CF, STs = _make_window(rs, outer, cadence, n, refill_outer)
    E[0, 0, 7, 1] = np.nan
    E[1, 1, 9, 0] = 50.0      # guaranteed clamp hit
    CF[1, 1, 9] = True
    got = _run_kernel(E, W, CF, STs, cadence, refill_outer, MAXC)
    ref, counts = _ref(E, W, CF, STs, refill_outer, MAXC)
    for r in range(refill_outer):
        c = int(counts[r])
        np.testing.assert_allclose(
            np.nan_to_num(got[r, :c], nan=-777.0),
            np.nan_to_num(ref[r, :c].astype(np.float32), nan=-777.0),
            rtol=1e-6, atol=1e-6)
