"""Ray-regeneration integrator tests: exact accounting invariants and
statistical agreement with the plain wavefront renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_raytracer_tpu.integrator import regen
from go_raytracer_tpu.render import renderer
from go_raytracer_tpu.render.camera import Camera
from go_raytracer_tpu.scene.builder import SceneBuilder


def empty_scene(bg=(1.0, 1.0, 1.0)):
    b = SceneBuilder(background=bg)
    m = b.lambertian((0.5, 0.5, 0.5))
    b.sphere((0, 0, 1e8), 1.0, m)  # far away, never hit
    b.add_light(b.quad((0, 0, 1e8), (1, 0, 0), (0, 1, 0), b.diffuse_light((1, 1, 1))))
    return b.build()


def box_scene():
    b = SceneBuilder(background=(0, 0, 0))
    white = b.lambertian((0.73, 0.73, 0.73))
    red = b.lambertian((0.65, 0.05, 0.05))
    light = b.diffuse_light((10, 10, 10))
    b.quad((-4, 0, -4), (8, 0, 0), (0, 0, 8), white)
    b.quad((-4, 0, -4), (0, 4, 0), (0, 0, 8), red)
    lq = b.quad((-1, 3.9, -1), (2, 0, 0), (0, 0, 2), light)
    b.sphere((1, 1, 0), 1.0, b.metal((0.9, 0.9, 0.9), 0.1))
    b.add_light(lq)
    return b.build()


def test_every_item_contributes_exactly_once():
    """Empty scene with background 1: every (pixel, stratum) path returns
    exactly the background, so the image must be exactly 1.0 — a strict
    check of the queue/refill/harvest bookkeeping."""
    scene = empty_scene()
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(0),
                                    n_lanes=128, backend="xla")
    np.testing.assert_allclose(img, 1.0, atol=1e-6)
    assert stats["paths"] == 16 * 16 * 9
    # every path is exactly one segment here
    assert stats["segments"] == 16 * 16 * 9


def test_queue_smaller_than_lanes():
    scene = empty_scene(bg=(0.25, 0.5, 0.75))
    cam = Camera(width=4, aspect_ratio=1.0, samples_per_pixel=1, max_depth=2)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(1),
                                    n_lanes=512, backend="xla")
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)


def test_regen_is_deterministic():
    scene = box_scene()
    cam = Camera(width=8, aspect_ratio=1.0, samples_per_pixel=4, max_depth=5)
    cam.position((0, 2, 6), (0, 1, 0))
    img1, _ = regen.render_regen(scene, cam, jax.random.key(3), n_lanes=256,
                                 backend="xla")
    img2, _ = regen.render_regen(scene, cam, jax.random.key(3), n_lanes=256,
                                 backend="xla")
    np.testing.assert_array_equal(img1, img2)


def test_regen_matches_plain_renderer_statistically():
    scene = box_scene()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=49, max_depth=8)
    cam.position((0, 2, 6), (0, 1, 0))
    img_r, st_r = regen.render_regen(scene, cam, jax.random.key(5),
                                     n_lanes=1024, backend="xla")
    img_p, st_p = renderer.render(scene, cam, key=jax.random.key(9),
                                  mode="scan", backend="xla")
    # same expected image, independent sample sets: means agree within MC noise
    m_r = img_r.mean(axis=(0, 1))
    m_p = img_p.mean(axis=(0, 1))
    np.testing.assert_allclose(m_r, m_p, rtol=0.1, atol=5e-3)
    # identical path counts
    assert st_r["paths"] == 12 * 12 * 49


def test_harvest_slot_routing_with_distinct_values():
    """Write-ordering discriminator: a wall of 16 distinct emissive patches
    aligned so every pixel's jittered samples land inside one patch makes
    the image an exact, RNG-independent 4x4 color pattern. Any bug that
    routes a harvested path to the wrong item slot scrambles it. Run with
    tiny lane pools so paths span many windows."""
    colors = [(0.1 * (i + 1), 0.05 * (i + 1), 1.0 - 0.05 * i)
              for i in range(16)]
    b = SceneBuilder(background=(0, 0, 0))
    # camera: vfov 90, focus 1 -> viewport [-1,1]^2 at z=-1 from origin.
    # wall quads tile the viewport in a 4x4 grid; 16px image -> each quad
    # covers exactly 4x4 pixels with boundaries on pixel edges.
    for gy in range(4):
        for gx in range(4):
            x0 = -1.0 + gx * 0.5
            y0 = 1.0 - (gy + 1) * 0.5  # image row 0 = top
            q = b.quad((x0, y0, -1.0), (0.5, 0, 0), (0, 0.5, 0),
                       b.diffuse_light(colors[gy * 4 + gx]))
            if gx == 0 and gy == 0:
                b.add_light(q)
    scene = b.build()
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=3, vertical_fov=90, focus_distance=1.0)
    cam.position((0, 0, 0), (0, 0, -1))

    expected = np.zeros((16, 16, 3), np.float32)
    for gy in range(4):
        for gx in range(4):
            expected[gy * 4:(gy + 1) * 4, gx * 4:(gx + 1) * 4] = colors[gy * 4 + gx]

    for lanes, cadence in ((32, 1), (256, 3), (4096, 1)):
        img, st = regen.render_regen(scene, cam, jax.random.key(2),
                                     n_lanes=lanes, cadence=cadence,
                                     backend="xla")
        np.testing.assert_allclose(img, expected, atol=1e-5,
                                   err_msg=f"lanes={lanes}, windows={st['windows']}")
        assert st["paths"] == 16 * 16 * 4


def mirror_corridor():
    """Deterministic 3-level path: camera -> 45-degree mirror A (up) ->
    45-degree mirror B (toward +x) -> emissive wall. Perfect mirrors
    (fuzz 0) make the radiance RNG-independent: exactly (2,3,4) when
    max_depth >= 2, exactly 0 when max_depth < 2 (camera.go:293-296 gives
    max_depth+1 surface interactions)."""
    b = SceneBuilder(background=(0, 0, 0))
    mirror = b.metal((1.0, 1.0, 1.0), 0.0)
    b.quad((-2, -1.41421356, -0.58578644), (4, 0, 0),
           (0, 2.82842712, -2.82842712), mirror)           # A at (0,0,-2)
    b.quad((-1.41421356, 0.58578644, 0), (0, 0, -4),
           (2.82842712, 2.82842712, 0), mirror)            # B at (0,2,-2)
    lq = b.quad((5, 0, -4), (0, 0, 4), (0, 4, 0), b.diffuse_light((2, 3, 4)))
    b.add_light(lq)
    return b.build()


@pytest.mark.parametrize("lanes", [64, 1024])
def test_regen_enforces_max_depth(lanes):
    """The regen queue must give each path exactly max_depth+1 levels like
    the wavefront: at max_depth=1 the corridor's light is unreachable (a
    lane that kept bouncing past its budget would see it)."""
    scene = mirror_corridor()
    cam = Camera(width=4, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=1, vertical_fov=2.0, focus_distance=1.0)
    cam.position((0, 0, 0), (0, 0, -1))
    img, st = regen.render_regen(scene, cam, jax.random.key(0),
                                 n_lanes=lanes, backend="xla")
    np.testing.assert_allclose(img, 0.0, atol=1e-6)
    # each path = exactly 2 levels (mirror A, then forced-black child)
    assert st["segments"] == 4 * 4 * 4 * 2

    cam.max_depth = 2
    img2, st2 = regen.render_regen(scene, cam, jax.random.key(0),
                                   n_lanes=lanes, backend="xla")
    np.testing.assert_allclose(
        img2, np.broadcast_to([2.0, 3.0, 4.0], img2.shape), atol=1e-5)
    assert st2["segments"] == 4 * 4 * 4 * 3


def test_regen_matches_wavefront_mean_at_small_depth():
    """Statistical regen-vs-wavefront agreement at max_depth 1 and 2 in a
    bright closed scene — the configuration where the round-1 missing
    depth cap inflated regen ~12% (ADVICE.md item 1)."""
    scene = box_scene()
    for depth in (1, 2):
        cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=100,
                     max_depth=depth)
        cam.position((0, 2, 6), (0, 1, 0))
        img_r, _ = regen.render_regen(scene, cam, jax.random.key(21),
                                      n_lanes=2048, backend="xla")
        img_p, _ = renderer.render(scene, cam, key=jax.random.key(22),
                                   mode="scan", backend="xla")
        m_r = img_r.mean(axis=(0, 1))
        m_p = img_p.mean(axis=(0, 1))
        np.testing.assert_allclose(m_r, m_p, rtol=0.04, atol=2e-3,
                                   err_msg=f"depth={depth}")


def test_fused_kernel_exact_accounting():
    """backend='pallas' routes through the fused megakernel (in-kernel
    PRNG + camera ray-gen + bounce). With an all-miss scene the image is
    exactly the background whatever the RNG does — a strict check of the
    fused queue bookkeeping."""
    scene = empty_scene(bg=(0.25, 0.5, 0.75))
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(0),
                                    n_lanes=4096, backend="pallas")
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)
    assert stats["paths"] == 16 * 16 * 9
    assert stats["segments"] == 16 * 16 * 9


def test_fused_kernel_enforces_max_depth():
    """In-kernel depth cap: the mirror corridor is exactly reproducible
    (see test_regen_enforces_max_depth) through the fused path too."""
    scene = mirror_corridor()
    cam = Camera(width=4, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=1, vertical_fov=2.0, focus_distance=1.0)
    cam.position((0, 0, 0), (0, 0, -1))
    img, st = regen.render_regen(scene, cam, jax.random.key(0),
                                 n_lanes=4096, backend="pallas")
    np.testing.assert_allclose(img, 0.0, atol=1e-6)
    assert st["segments"] == 4 * 4 * 4 * 2
    cam.max_depth = 2
    img2, st2 = regen.render_regen(scene, cam, jax.random.key(0),
                                   n_lanes=4096, backend="pallas")
    np.testing.assert_allclose(
        img2, np.broadcast_to([2.0, 3.0, 4.0], img2.shape), atol=1e-5)
    assert st2["segments"] == 4 * 4 * 4 * 3


def test_fused_multistep_kernel_exact_accounting():
    """cadence > 1 on the fused path folds several bounce steps into one
    kernel call (refill only at the first inner step) — the all-miss
    bookkeeping invariants must hold exactly."""
    scene = empty_scene(bg=(0.3, 0.6, 0.9))
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    for cad in (2, 3):
        img, stats = regen.render_regen(scene, cam, jax.random.key(0),
                                        n_lanes=4096, cadence=cad,
                                        backend="pallas")
        np.testing.assert_allclose(img[..., 0], 0.3, atol=1e-6)
        np.testing.assert_allclose(img[..., 2], 0.9, atol=1e-6)
        assert stats["segments"] == 16 * 16 * 9


def test_fused_multistep_enforces_depth():
    scene = mirror_corridor()
    cam = Camera(width=4, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=2, vertical_fov=2.0, focus_distance=1.0)
    cam.position((0, 0, 0), (0, 0, -1))
    img, st = regen.render_regen(scene, cam, jax.random.key(0),
                                 n_lanes=4096, cadence=2, backend="pallas")
    np.testing.assert_allclose(
        img, np.broadcast_to([2.0, 3.0, 4.0], img.shape), atol=1e-5)
    assert st["segments"] == 4 * 4 * 4 * 3


def test_fused_kernel_matches_xla_statistically():
    """Fused-megakernel renders agree with the XLA regen path within MC
    noise (different RNG streams, same expected image)."""
    scene = box_scene()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=64, max_depth=6)
    cam.position((0, 2, 6), (0, 1, 0))
    img_f, _ = regen.render_regen(scene, cam, jax.random.key(31),
                                  n_lanes=4096, backend="pallas")
    img_x, _ = regen.render_regen(scene, cam, jax.random.key(32),
                                  n_lanes=4096, backend="xla")
    m_f = img_f.mean(axis=(0, 1))
    m_x = img_x.mean(axis=(0, 1))
    np.testing.assert_allclose(m_f, m_x, rtol=0.06, atol=3e-3)


def test_regen_checkpoint_resume_exact(tmp_path, monkeypatch):
    """Interrupting after any window and resuming reproduces the
    uninterrupted render bit-for-bit (same window RNG stream), and a
    completed checkpoint resumes with zero new segments."""
    import shutil
    from go_raytracer_tpu.render import checkpoint as ck

    scene = box_scene()
    cam = Camera(width=8, aspect_ratio=1.0, samples_per_pixel=9, max_depth=3)
    cam.position((0, 2, 6), (0, 1, 0))
    key = jax.random.key(17)
    # small lane pool so the queue spans several windows
    img_ref, st_ref = regen.render_regen(scene, cam, key, n_lanes=64,
                                         refill_len=4, backend="xla")
    assert st_ref["windows"] >= 3

    ckpt = str(tmp_path / "r.npz")
    saved = []
    real_save = ck.save

    def capture_save(path, acc, next_item, meta):
        real_save(path, acc, next_item, meta)
        snap = str(tmp_path / f"snap{len(saved)}.npz")
        shutil.copy(path, snap)
        saved.append(snap)

    monkeypatch.setattr(ck, "save", capture_save)
    img_full, _ = regen.render_regen(scene, cam, key, n_lanes=64,
                                     refill_len=4, backend="xla",
                                     checkpoint_path=ckpt,
                                     checkpoint_every=1, scene_name="box")
    np.testing.assert_array_equal(img_full, img_ref)
    assert len(saved) >= 3
    monkeypatch.setattr(ck, "save", real_save)

    # resume from the first (partial) snapshot: identical final image
    shutil.copy(saved[0], ckpt)
    img_res, st_res = regen.render_regen(scene, cam, key, n_lanes=64,
                                         refill_len=4, backend="xla",
                                         checkpoint_path=ckpt,
                                         scene_name="box")
    np.testing.assert_array_equal(img_res, img_ref)
    # fewer windows actually executed in the resumed call
    assert len(st_res["window_s"]) < st_ref["windows"]

    # resume from the completed checkpoint: no new work
    img_done, st_done = regen.render_regen(scene, cam, key, n_lanes=64,
                                           refill_len=4, backend="xla",
                                           checkpoint_path=ckpt,
                                           scene_name="box")
    np.testing.assert_array_equal(img_done, img_ref)
    assert st_done["segments"] == 0


def test_sharded_regen_exact_bookkeeping():
    """8-device shard_map regen: per-device queues over disjoint item
    ranges; an all-miss scene must produce exactly the background and
    exactly one segment per path across all shards."""
    from go_raytracer_tpu.parallel import mesh as pmesh

    scene = empty_scene(bg=(0.25, 0.5, 0.75))
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    m = pmesh.make_mesh(8, axes=("data",))
    img, st = regen.render_regen_sharded(scene, cam, m, jax.random.key(0),
                                         n_lanes=64, backend="xla")
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)
    assert st["segments"] == 16 * 16 * 9
    assert st["devices"] == 8


def test_sharded_regen_queue_ik_pallas_exact_bookkeeping():
    """The PRODUCTION schedule — in-kernel queue + fused Pallas kernel
    (interpret mode off-TPU) + fused reverse harvest — under shard_map on
    the 8-device mesh: per-device item ranges, exactly one contribution
    per (pixel, stratum) item across all shards."""
    from go_raytracer_tpu.parallel import mesh as pmesh

    scene = empty_scene(bg=(0.25, 0.5, 0.75))
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    m = pmesh.make_mesh(8, axes=("data",))
    img, st = regen.render_regen_sharded(scene, cam, m, jax.random.key(0),
                                         n_lanes=4096, backend="pallas",
                                         schedule="queue_ik")
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)
    assert st["segments"] == 16 * 16 * 9
    assert st["devices"] == 8
    assert len(st["segments_per_shard"]) == 8


def test_sharded_regen_queue_ik_pallas_matches_single_device():
    """Sharded queue_ik+pallas statistically matches the single-device
    fused render on a lit scene (same estimator, different RNG streams)."""
    from go_raytracer_tpu.parallel import mesh as pmesh

    scene = box_scene()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=25, max_depth=5)
    cam.position((0, 2, 6), (0, 1, 0))
    m = pmesh.make_mesh(8, axes=("data",))
    img_s, st_s = regen.render_regen_sharded(
        scene, cam, m, jax.random.key(41), n_lanes=4096,
        backend="pallas", schedule="queue_ik")
    img_1, _ = regen.render_regen(scene, cam, jax.random.key(42),
                                  n_lanes=4096, backend="pallas",
                                  schedule="queue_ik")
    assert st_s["devices"] == 8
    np.testing.assert_allclose(img_s.mean(axis=(0, 1)),
                               img_1.mean(axis=(0, 1)), rtol=0.1, atol=5e-3)


def test_sharded_regen_matches_single_device_statistically():
    from go_raytracer_tpu.parallel import mesh as pmesh

    scene = box_scene()
    cam = Camera(width=12, aspect_ratio=1.0, samples_per_pixel=49, max_depth=6)
    cam.position((0, 2, 6), (0, 1, 0))
    m = pmesh.make_mesh(8, axes=("data",))
    img_s, _ = regen.render_regen_sharded(scene, cam, m, jax.random.key(41),
                                          n_lanes=256, backend="xla")
    img_1, _ = regen.render_regen(scene, cam, jax.random.key(42),
                                  n_lanes=2048, backend="xla")
    np.testing.assert_allclose(img_s.mean(axis=(0, 1)),
                               img_1.mean(axis=(0, 1)), rtol=0.1, atol=5e-3)


def test_occupancy_beats_plain_wavefront():
    scene = box_scene()
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=16, max_depth=16)
    cam.position((0, 2, 6), (0, 1, 0))
    _, st = regen.render_regen(scene, cam, jax.random.key(7), n_lanes=256,
                               backend="xla")
    # plain wavefront occupancy here would be avg_len/(depth+1) ~= 0.15;
    # on this tiny workload the queue drains within one window, so the
    # drain tail caps occupancy well below the large-render figure (~0.5)
    assert st["occupancy"] > 0.25

def test_reorder_exact_accounting_and_depth():
    """Coherence reordering (lane sorts between kernel calls + in-reverse
    unpermute) must not change the exact per-item radiance accounting:
    the all-miss background and the deterministic mirror-corridor images
    must be bit-identical invariants, independent of lane order."""
    scene = empty_scene(bg=(0.2, 0.4, 0.8))
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    img, stats = regen.render_regen(scene, cam, jax.random.key(0),
                                    n_lanes=4096, cadence=2,
                                    backend="pallas", reorder=True)
    np.testing.assert_allclose(img[..., 0], 0.2, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.8, atol=1e-6)
    assert stats["segments"] == 16 * 16 * 9

    scene2 = mirror_corridor()
    cam2 = Camera(width=4, aspect_ratio=1.0, samples_per_pixel=4,
                  max_depth=2, vertical_fov=2.0, focus_distance=1.0)
    cam2.position((0, 0, 0), (0, 0, -1))
    img2, st2 = regen.render_regen(scene2, cam2, jax.random.key(0),
                                   n_lanes=4096, cadence=2,
                                   backend="pallas", reorder=True)
    np.testing.assert_allclose(
        img2, np.broadcast_to([2.0, 3.0, 4.0], img2.shape), atol=1e-5)
    assert st2["segments"] == 4 * 4 * 4 * 3


def test_reorder_statistical_agreement_dense_scene():
    """book1 (dense sphere section) with reordering + the block-AABB cull
    explicitly enabled must statistically agree with the XLA integrator —
    catches any cull false-negative (a skipped block that some lane needed
    would bias the image, not just noise it)."""
    from go_raytracer_tpu.scenes import registry
    scene, cam = registry.book1()
    cam.width = 48
    cam.samples_per_pixel = 4
    cam.max_depth = 4
    img_p, _ = regen.render_regen(scene, cam, jax.random.key(0),
                                  n_lanes=4096, cadence=4, backend="pallas",
                                  reorder=True)
    img_x, _ = regen.render_regen(scene, cam, jax.random.key(1),
                                  n_lanes=4096, cadence=4, backend="xla")
    assert abs(float(img_p.mean()) - float(img_x.mean())) < 0.02
    assert float(np.abs(img_p - img_x).mean()) < 0.15


# ---------------------------------------------------------------- positional


def test_positional_every_item_contributes_exactly_once():
    """Empty scene, background 1: the positional schedule's per-lane
    block accounting (quota/lane_base/slot-g harvest + final bincount)
    must deliver every (pixel, stratum) item exactly once — the image is
    exactly 1.0. Covers npix < n_lanes AND npix > n_lanes regimes."""
    scene = empty_scene()
    for lanes, width in ((128, 16), (64, 16), (512, 16)):
        cam = Camera(width=width, aspect_ratio=1.0, samples_per_pixel=9,
                     max_depth=4)
        cam.position((0, 0, 5), (0, 0, 0))
        img, stats = regen.render_regen(scene, cam, jax.random.key(0),
                                        n_lanes=lanes, backend="xla",
                                        schedule="positional")
        np.testing.assert_allclose(img, 1.0, atol=1e-6)
        assert stats["schedule"] == "positional"


def test_positional_pixel_mapping_matches_queue():
    """An emissive quad on a black background renders deterministically
    per ray (first hit -> emission, no RNG beyond the stratum jitter), so
    away from the quad's silhouette edges the positional and queue
    schedules must produce IDENTICAL pixels — this pins the slot-g ->
    pixel bincount mapping (a permutation bug would preserve means but
    scramble pixels)."""
    b = SceneBuilder(background=(0, 0, 0))
    light = b.diffuse_light((2.0, 1.0, 0.5))
    lq = b.quad((-2.0, -1.5, 0.0), (4, 0, 0), (0, 3, 0), light)
    b.add_light(lq)
    scene = b.build()
    cam = Camera(width=24, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=2)
    cam.position((0, 0, 4), (0, 0, 0))
    iq, _ = regen.render_regen(scene, cam, jax.random.key(0), n_lanes=96,
                               backend="xla", schedule="queue")
    ip, _ = regen.render_regen(scene, cam, jax.random.key(0), n_lanes=96,
                               backend="xla", schedule="positional")
    # edge pixels may differ (different jitter draws straddle the
    # silhouette); interior/exterior pixels must match exactly
    mismatch = np.abs(iq - ip).max(axis=-1) > 1e-6
    assert mismatch.mean() < 0.25, f"{mismatch.mean():.2f} pixels differ"
    # erode by one pixel: a fully-hit pixel whose whole 3x3 neighborhood
    # is also fully-hit is >=1px from the silhouette, so EITHER
    # schedule's jitter (confined to the pixel footprint) must hit
    hit = (iq == np.array([2.0, 1.0, 0.5])).all(axis=-1)
    interior = hit.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            interior &= np.roll(np.roll(hit, dy, 0), dx, 1)
    interior[0, :] = interior[-1, :] = False
    interior[:, 0] = interior[:, -1] = False
    assert interior.sum() > 10  # the quad really covers pixels
    np.testing.assert_allclose(ip[interior], iq[interior], atol=1e-6)


def test_positional_checkpoint_resume_exact(tmp_path, monkeypatch):
    """Positional-schedule checkpointing: interrupting after any window
    and resuming reproduces the uninterrupted render bit-for-bit; a
    completed checkpoint resumes with zero new segments."""
    import shutil
    from go_raytracer_tpu.render import checkpoint as ck

    scene = box_scene()
    cam = Camera(width=8, aspect_ratio=1.0, samples_per_pixel=9, max_depth=3)
    cam.position((0, 2, 6), (0, 1, 0))
    key = jax.random.key(17)
    kw = dict(n_lanes=64, refill_len=4, backend="xla",
              schedule="positional")
    img_ref, st_ref = regen.render_regen(scene, cam, key, **kw)
    assert st_ref["windows"] >= 3

    ckpt = str(tmp_path / "r.npz")
    saved = []
    real_save = ck.save

    def capture_save(path, acc, next_item, meta, extra=None):
        real_save(path, acc, next_item, meta, extra)
        snap = str(tmp_path / f"snap{len(saved)}.npz")
        shutil.copy(path, snap)
        saved.append(snap)

    monkeypatch.setattr(ck, "save", capture_save)
    img_full, _ = regen.render_regen(scene, cam, key, checkpoint_path=ckpt,
                                     checkpoint_every=1, scene_name="box",
                                     **kw)
    np.testing.assert_array_equal(img_full, img_ref)
    assert len(saved) >= 2
    monkeypatch.setattr(ck, "save", real_save)

    shutil.copy(saved[0], ckpt)
    img_res, st_res = regen.render_regen(scene, cam, key,
                                         checkpoint_path=ckpt,
                                         scene_name="box", **kw)
    np.testing.assert_array_equal(img_res, img_ref)
    assert len(st_res["window_s"]) < st_ref["windows"]

    img_done, st_done = regen.render_regen(scene, cam, key,
                                           checkpoint_path=ckpt,
                                           scene_name="box", **kw)
    np.testing.assert_array_equal(img_done, img_ref)
    assert st_done["segments"] == 0


def test_positional_statistically_matches_queue():
    """Cornell-style closed scene: the two schedules are different
    unbiased estimators of the same image; their image means must agree
    within the measured key-to-key MC spread."""
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.cornell_box()
    cam.width = 16
    cam.aspect_ratio = 1.0
    cam.samples_per_pixel = 16
    cam.max_depth = 4
    mq = [float(regen.render_regen(scene, cam, jax.random.key(k),
                                   n_lanes=256, backend="xla",
                                   schedule="queue")[0].mean())
          for k in range(2)]
    mp = [float(regen.render_regen(scene, cam, jax.random.key(k),
                                   n_lanes=256, backend="xla",
                                   schedule="positional")[0].mean())
          for k in range(2)]
    spread = max(mq) - min(mq) + max(mp) - min(mp) + 0.01
    assert abs(np.mean(mq) - np.mean(mp)) < 3 * spread


def test_sharded_positional_exact_bookkeeping():
    """8-device shard_map regen with the positional schedule: lane-sharded
    static blocks; an all-miss scene must produce exactly the background
    and exactly one segment per path across all shards."""
    from go_raytracer_tpu.parallel import mesh as pmesh

    scene = empty_scene(bg=(0.25, 0.5, 0.75))
    cam = Camera(width=16, aspect_ratio=1.0, samples_per_pixel=9, max_depth=4)
    cam.position((0, 0, 5), (0, 0, 0))
    m = pmesh.make_mesh(8, axes=("data",))
    img, st = regen.render_regen_sharded(scene, cam, m, jax.random.key(0),
                                         n_lanes=64, backend="xla",
                                         schedule="positional")
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)
    assert st["segments"] == 16 * 16 * 9
    assert st["devices"] == 8 and st["schedule"] == "positional"


def test_positional_inkernel_scheduler_exact_coverage():
    """The pallas fused kernel's IN-KERNEL per-step scheduler
    (bounce_fused_pos, interpret mode): exact all-miss coverage at a
    lane/item ratio that spans both quota-0 lanes and multi-pixel
    blocks, and two cadences."""
    scene = empty_scene(bg=(0.3, 0.5, 0.7))
    for width, cadence in ((32, 4), (16, 3)):
        cam = Camera(width=width, aspect_ratio=1.0, samples_per_pixel=9,
                     max_depth=4)
        cam.position((0, 0, 5), (0, 0, 0))
        img, st = regen.render_regen(scene, cam, jax.random.key(0),
                                     n_lanes=4096, backend="pallas",
                                     schedule="positional", cadence=cadence)
        np.testing.assert_allclose(
            img, np.broadcast_to([0.3, 0.5, 0.7], img.shape), atol=1e-6)
        assert st["segments"] == width * width * 9


def test_positional_inkernel_checkpoint_roundtrip(tmp_path):
    """Checkpoint format is k-based regardless of backend: a pallas
    positional render's checkpoint resumes into a fresh pallas render
    bit-for-bit (the scheduler planes are rebuilt from k)."""
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.cornell_box()
    cam.width = 16
    cam.aspect_ratio = 1.0
    cam.samples_per_pixel = 9
    cam.max_depth = 3
    key = jax.random.key(5)
    kw = dict(n_lanes=4096, backend="pallas", schedule="positional",
              cadence=2, refill_len=6, scene_name="cb")
    img_ref, st_ref = regen.render_regen(scene, cam, key, **kw)
    ck = str(tmp_path / "p.npz")
    img_a, _ = regen.render_regen(scene, cam, key, checkpoint_path=ck,
                                  checkpoint_every=1, **kw)
    np.testing.assert_array_equal(img_a, img_ref)
    img_b, st_b = regen.render_regen(scene, cam, key, checkpoint_path=ck,
                                     **kw)
    np.testing.assert_array_equal(img_b, img_ref)
    assert st_b["segments"] == 0


def test_sharded_regen_mesh_ext_matches_single_device():
    """Mesh scenes under shard_map with the external-hit kernel path
    (use_ext): the sharded render must match the single-device render of
    the same scene statistically (same engine on every shard, disjoint
    item ranges)."""
    from go_raytracer_tpu.parallel import mesh as pmesh
    from go_raytracer_tpu.scenes import registry

    scene, cam = registry.model_example()
    cam.width = 32
    cam.samples_per_pixel = 9
    cam.max_depth = 4
    key = jax.random.key(3)
    img1, st1 = regen.render_regen(scene, cam, key, n_lanes=4096)
    m = pmesh.make_mesh(8, axes=("data",))
    imgN, stN = regen.render_regen_sharded(scene, cam, m, key,
                                           n_lanes=512)
    a, b = np.asarray(img1), np.asarray(imgN)
    assert np.isfinite(b).all()
    # same estimator, different RNG streams: agree in the mean
    assert abs(a.mean() - b.mean()) < 0.1 * max(a.mean(), 1e-3)
    assert stN["devices"] == 8
    assert stN["segments"] > 0
