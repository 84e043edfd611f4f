"""In-kernel queue scheduler (ops/pallas/bounce.bounce_fused_q via
render_regen schedule="queue_ik"): exact item accounting, coordinate
decomposition, and statistical agreement with the XLA-side queue."""

import jax
import jax.numpy as jnp
import numpy as np

from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.ops.pallas import bounce as pb
from go_raytracer_tpu.render.camera import Camera
from go_raytracer_tpu.scene.builder import SceneBuilder


def test_item_to_coords_exact():
    """The f32-divide-plus-fixup decomposition must be exact for items far
    beyond 2^24 (book2's reference config reaches 64M items)."""
    rs = np.random.default_rng(0)
    for npix, width, sqrt_spp in [(360000, 600, 10), (640000, 800, 10),
                                  (90000, 400, 7), (202200, 600, 15),
                                  (127, 127, 3)]:
        total = npix * sqrt_spp * sqrt_spp
        items = np.unique(np.concatenate([
            rs.integers(0, total, 4000),
            np.arange(64),                       # small edge
            total - 1 - np.arange(min(64, total)),   # top edge
            # exact multiples of npix/width (the fixup's hard cases)
            (np.arange(1, 40) * npix).clip(0, total - 1),
            (np.arange(1, 40) * npix - 1).clip(0, total - 1),
        ])).astype(np.int64)
        items = items[(items >= 0) & (items < total)]
        it = jnp.asarray(items.astype(np.int32)).reshape(-1)
        pi, pj, si, sj = pb._item_to_coords(it, npix, width, sqrt_spp)
        stratum = items // npix
        pixel = items % npix
        np.testing.assert_array_equal(np.asarray(pi), pixel % width)
        np.testing.assert_array_equal(np.asarray(pj), pixel // width)
        np.testing.assert_array_equal(np.asarray(si), stratum // sqrt_spp)
        np.testing.assert_array_equal(np.asarray(sj), stratum % sqrt_spp)


def empty_scene(bg=(1.0, 1.0, 1.0)):
    b = SceneBuilder(background=bg)
    m = b.lambertian((0.5, 0.5, 0.5))
    b.sphere((0, 0, 1e8), 1.0, m)
    b.add_light(b.quad((0, 0, 1e8), (1, 0, 0), (0, 1, 0),
                       b.diffuse_light((1, 1, 1))))
    return b.build()


def box_scene():
    b = SceneBuilder(background=(0, 0, 0))
    white = b.lambertian((0.73, 0.73, 0.73))
    light = b.diffuse_light((10, 10, 10))
    b.quad((-4, 0, -4), (8, 0, 0), (0, 0, 8), white)
    b.quad((-4, 0, -4), (0, 4, 0), (0, 0, 8),
           b.lambertian((0.65, 0.05, 0.05)))
    lq = b.quad((-1, 3.9, -1), (2, 0, 0), (0, 0, 2), light)
    b.sphere((1, 1, 0), 1.0, b.metal((0.9, 0.9, 0.9), 0.1))
    b.add_light(lq)
    return b.build()


def test_ikq_every_item_contributes_exactly_once():
    """Empty scene, background 1: the image must be exactly 1.0 — a strict
    check of the in-kernel cursor/rank/harvest bookkeeping (no item
    dropped, none double-counted) across multiple kernel calls."""
    scene = empty_scene()
    cam = Camera(width=32, aspect_ratio=1.0, samples_per_pixel=9,
                 max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(0),
                                    n_lanes=4096, backend="pallas",
                                    schedule="queue_ik", cadence=3)
    np.testing.assert_allclose(img, 1.0, atol=1e-6)
    assert stats["paths"] == 32 * 32 * 9
    assert stats["segments"] == 32 * 32 * 9
    assert stats["schedule"] == "queue_ik"


def test_ikq_multi_window_exact():
    """More items than one window can start -> the cursor must chain
    across windows without gaps or repeats."""
    scene = empty_scene(bg=(0.25, 0.5, 0.75))
    cam = Camera(width=64, aspect_ratio=1.0, samples_per_pixel=16,
                 max_depth=3)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(1),
                                    n_lanes=4096, backend="pallas",
                                    schedule="queue_ik", cadence=2,
                                    refill_len=8)
    assert stats["windows"] > 1
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)


def test_ikq_matches_queue_statistically():
    """Same scene through queue (XLA refill) and queue_ik (in-kernel
    refill): independent RNG associations, so images agree only
    statistically — but tightly at this sample count."""
    scene = box_scene()
    cam = Camera(width=24, aspect_ratio=1.0, samples_per_pixel=36,
                 max_depth=8)
    cam.position((0, 2, 8), (0, 1, 0))
    img_q, st_q = regen.render_regen(scene, cam, jax.random.key(3),
                                     n_lanes=4096, backend="pallas",
                                     schedule="queue", cadence=2)
    img_k, st_k = regen.render_regen(scene, cam, jax.random.key(4),
                                     n_lanes=4096, backend="pallas",
                                     schedule="queue_ik", cadence=2)
    assert st_q["paths"] == st_k["paths"]
    # in-kernel refill can only trace MORE segments per window step
    # budget; mean radiance agreement is the correctness check
    d = np.abs(np.asarray(img_q) - np.asarray(img_k)).mean()
    scale = np.abs(np.asarray(img_q)).mean() + 1e-3
    assert d / scale < 0.15, (d, scale)


def test_ikq_occupancy_wins_on_deep_queue():
    """The whole point: with a queue much deeper than the lane pool and
    short-lived paths, per-step refill must clearly beat the
    cadence-boundary refill's occupancy (measured 0.375 vs 0.188 on this
    config) — dead lanes restart the step they die instead of idling up
    to cadence-1 steps."""
    scene = box_scene()
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=256,
                 max_depth=8)
    cam.position((0, 2, 8), (0, 1, 0))
    # refill pinned to the old queue's 4*(depth+1) for BOTH so the ratio
    # isolates the schedule (auto-sizing would lengthen queue_ik's window)
    _, st_q = regen.render_regen(scene, cam, jax.random.key(5),
                                 n_lanes=4096, backend="pallas",
                                 schedule="queue", cadence=4, refill_len=36)
    _, st_k = regen.render_regen(scene, cam, jax.random.key(5),
                                 n_lanes=4096, backend="pallas",
                                 schedule="queue_ik", cadence=4,
                                 refill_len=36)
    assert st_k["occupancy"] > 1.5 * st_q["occupancy"], \
        (st_k["occupancy"], st_q["occupancy"])
    # same item set, independent RNG associations: totals agree closely
    assert abs(st_k["segments"] - st_q["segments"]) \
        < 0.02 * st_q["segments"]


def test_auto_refill_sizing():
    """Workload-sized windows: refill covers paths-per-lane x regen_len
    (padded 3%), is floored at depth+1, capped by the HBM record-plane
    budget, and rounded up to a cadence multiple."""
    cam = Camera(width=100, samples_per_pixel=100, max_depth=50)
    d1 = 51
    # tiny workload -> the d1 floor (below it the drain dominates)
    assert regen._auto_refill(1000, 1 << 17, d1, 4, cam) == 52
    # cornell-sized workload at the measured regen_len
    cam.regen_len = 2.93
    r = regen._auto_refill(600 * 600 * 100, 1 << 17, d1, 4, cam)
    assert abs(r - 600 * 600 * 100 / (1 << 17) * 2.93 * 1.03) < 8
    assert r % 4 == 0
    # huge workload -> HBM cap, not proportional growth
    big = regen._auto_refill(600 * 600 * 10000, 1 << 17, d1, 4, cam)
    assert big <= int((8 << 30) / (56 * (1 << 17))) + 4


def test_auto_schedule_resolves_to_ikq():
    """Default path: schedule="auto" on a fused-kernel scene runs the
    in-kernel queue."""
    scene = box_scene()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=6)
    cam.position((0, 2, 8), (0, 1, 0))
    _, st = regen.render_regen(scene, cam, jax.random.key(0),
                               n_lanes=4096, backend="pallas")
    assert st["schedule"] == "queue_ik"
