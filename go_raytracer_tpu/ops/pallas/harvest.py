"""Pallas TPU fused reverse-harvest kernel for the regen queue schedule.

After the forward pass, a generation window's records sit in HBM as
(outer*cadence, N) component planes (E, W, clamp-flag) plus per-refill-row
started flags. The window epilogue must (1) run the per-level firefly
clamp recursion L = clamp?(E + W*L) BACKWARD over the steps
(camera.go:330-341 parity — the clamp rescales by the *child* radiance,
so it cannot be accumulated forward), (2) pull each path's finished L at
its start step, and (3) compact every refill row's started lanes to the
row front in lane order so the accumulator writes are contiguous
dynamic-update-slices (TPU has no vector scatter).

Round-1/2 did (1) as an XLA reverse scan (6.5 ms/window on the v5e at
128k lanes) and (3) as a batched rowwise stable `lax.sort` on the 1-bit
started key (14.3 ms — the single largest non-kernel window cost; a
streaming Pallas compactor with per-128-lane chunks measured WORSE, 48 ms,
because its 13k-iteration sequential chunk loop pays ~3.7 us each, see
ops/pallas/compact.py, removed in round 4 — git history). This kernel does (1)+(2)+(3) in ONE grid pass:

* grid = one step per recorded bounce level, iterated in REVERSE via the
  index maps; the radiance recursion lives in a VMEM scratch carried
  across grid steps (sequential TPU grid).
* the compaction is a whole-row parallel stable partition: an element's
  left-shift distance is its deficit d = lane_index - rank (rank = #
  started lanes before it, computed with one MXU triangular-ones matmul
  for the lane-dim prefix and a log-roll sublane scan), and the move is
  bit-decomposed — ceil(log2(N)) stages, each shifting the planes left by
  2^b under a mask, entirely in VMEM (registers), no sequential chunk
  walk. Identical output permutation to the stable sort, at register
  bandwidth instead of sort passes over HBM.
* collision-freedom of the bit-decomposed move: for started i < j the
  deficit gap d_j - d_i is at most (j - i) - 1, so two kept elements can
  never land on one slot at stage b (that would need d_j - d_i = j - i =
  2^b); a vacated slot's deficit is cleared so stale copies never ride
  later stages (same invariant as the removed compact.py's 7-pass shuffle,
  lifted from 128-lane chunks to the full flat row).
* wrap-around of the flat roll is harmless: a source element at flat
  position p can only have deficit bit b set if p >= 2^b (its destination
  p - d is nonnegative), which is exactly the condition for its
  destination to not wrap.

Row tails beyond each row's started count hold zeros-or-garbage; the
caller's accumulator writes make tail contents irrelevant (rows are
written base-to-base in item order — see integrator/regen.py).

Measured on the v5e (cornellBox flagship window, docs/PERFORMANCE.md):
replaces 6.5 + 14.3 ms of window device time with ~2 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _flat_shift_left(x, k: int, rows: int):
    """y[f] = x[(f + k) mod (rows*LANE)] over the row-major flat order of a
    (rows, LANE) plane: lane roll + two sublane rolls + one select (pure
    static shifts — k is a Python int)."""
    q, s = divmod(k, LANE)
    if s == 0:
        return pltpu.roll(x, (rows - q) % rows, 0)
    l = pltpu.roll(x, LANE - s, 1)          # l[r,c] = x[r, (c+s)%128]
    a = pltpu.roll(l, (rows - q) % rows, 0)
    b = pltpu.roll(l, (rows - q - 1) % rows, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANE - s, a, b)


def _rank_exclusive(started_i32, rows: int):
    """Exclusive prefix count of started lanes in row-major flat order.

    Lane-dim inclusive prefix via one (rows,128)@(128,128) upper-triangular
    ones matmul on the MXU (exact in f32: counts <= N < 2^24), sublane-dim
    exclusive scan of the row totals via a log-roll ladder."""
    s_f = started_i32.astype(jnp.float32)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
           ).astype(jnp.float32)
    inc = jax.lax.dot_general(s_f, tri, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    row_tot = jax.lax.broadcast_in_dim(inc[:, LANE - 1], (rows, LANE), (0,))
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    # exclusive over sublanes: shift down one, then inclusive log-ladder
    t = jnp.where(sub >= 1, pltpu.roll(row_tot, 1, 0), 0.0)
    sh = 1
    while sh < rows:
        t = t + jnp.where(sub >= sh + 1, pltpu.roll(t, sh, 0), 0.0)
        sh *= 2
    return (t + inc - s_f).astype(jnp.int32)


def _compact_planes(started_i32, planes, rows: int, n_stages: int):
    """Stable-partition `planes` (list of (rows,128) f32) by started flag
    in row-major flat lane order: started elements packed to the flat
    front, order preserved. Returns the moved planes."""
    flat = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1))
    rank = _rank_exclusive(started_i32, rows)
    keep = started_i32 != 0
    h = jnp.where(keep, flat - rank, 0)
    for b in range(n_stages):
        k = 1 << b
        mh = _flat_shift_left(h, k, rows)
        take = ((mh >> b) & 1) != 0          # incoming element moves here
        moved_out = ((h >> b) & 1) != 0      # resident departs: clear slot
        planes = [jnp.where(take, _flat_shift_left(p, k, rows), p)
                  for p in planes]
        h = jnp.where(take, mh, jnp.where(moved_out, 0, h))
    return planes


def _harvest_kernel(cadence, refill_outer, s_total, rows, n_stages,
                    max_contribution, per_level,
                    vr_ref, vg_ref, vb_ref, fl_ref, *rest):
    if per_level:
        st_ref = None
        hr_ref, hg_ref, hb_ref, lr_ref, lg_ref, lb_ref = rest
    else:
        st_ref, hr_ref, hg_ref, hb_ref, lr_ref, lg_ref, lb_ref = rest
    i = pl.program_id(0)
    s_flat = s_total - 1 - i             # bounce level, descending
    if per_level:
        # in-kernel-queue records: starts at EVERY level < refill_outer
        # (which is the refill LEVEL count in this mode)
        is_refill = s_flat < refill_outer
    else:
        r = s_flat // cadence
        is_refill = ((s_flat % cadence) == 0) & (r < refill_outer)

    @pl.when(i == 0)
    def _init():
        z = jnp.zeros((rows, LANE), jnp.float32)
        lr_ref[...] = z
        lg_ref[...] = z
        lb_ref[...] = z

    # merged V/FL records: raw = emit ? V : V * L (a vertex never has
    # both an emission and a scatter weight — materials.go)
    fl = fl_ref[0]
    emit = (fl & 2) != 0
    raw_r = jnp.where(emit, vr_ref[0], vr_ref[0] * lr_ref[...])
    raw_g = jnp.where(emit, vg_ref[0], vg_ref[0] * lg_ref[...])
    raw_b = jnp.where(emit, vb_ref[0], vb_ref[0] * lb_ref[...])
    # firefly clamp (camera.go:334-341): rescale so the component sum is
    # <= max_contribution; NaN sums compare false (Go parity)
    s = raw_r + raw_g + raw_b
    over = ((fl & 1) != 0) & (s > max_contribution)
    scale = jnp.where(over, max_contribution / jnp.where(over, s, 1.0), 1.0)
    lr = raw_r * scale
    lg = raw_g * scale
    lb = raw_b * scale

    @pl.when(is_refill)
    def _harvest():
        started = ((fl >> 2) & 1) if per_level else st_ref[0]
        keep = started != 0
        hr = jnp.where(keep, lr, 0.0)
        hg = jnp.where(keep, lg, 0.0)
        hb = jnp.where(keep, lb, 0.0)
        hr, hg, hb = _compact_planes(started, [hr, hg, hb], rows, n_stages)
        hr_ref[0] = hr
        hg_ref[0] = hg
        hb_ref[0] = hb
        # a started lane's prior path ends here: reset its recursion
        lr_ref[...] = jnp.where(keep, 0.0, lr)
        lg_ref[...] = jnp.where(keep, 0.0, lg)
        lb_ref[...] = jnp.where(keep, 0.0, lb)

    @pl.when(jnp.logical_not(is_refill))
    def _carry():
        lr_ref[...] = lr
        lg_ref[...] = lg
        lb_ref[...] = lb


@functools.partial(
    jax.jit, static_argnames=("cadence", "refill_outer", "max_contribution",
                              "interpret"))
def reverse_harvest(Vr, Vg, Vb, FL, STs, *, cadence,
                    refill_outer, max_contribution, interpret=False):
    """Fused reverse clamp recursion + started-lane row compaction.

    Inputs: V* (outer, cadence, N) f32 MERGED record planes (emission or
    weight — disjoint by material semantics), FL (outer, cadence, N)
    int32 flag bits (bit0 clamp, bit1 emit), STs (outer, N) int32
    started flags (only the first `refill_outer` rows can hold starts).
    Returns
    (hr, hg, hb), each (refill_outer, N) f32: row r's started lanes'
    finished path radiances packed to the row front in lane order —
    exactly the stable-sort compaction of the XLA reverse-scan harvest
    (integrator/regen.py), bit-identical permutation."""
    outer, cad, n = Vr.shape
    assert cad == cadence and n % LANE == 0
    rows = n // LANE
    s_total = outer * cadence
    n_stages = max(1, (n - 1).bit_length())
    shp = (s_total, rows, LANE)
    plane = lambda x: x.reshape(shp)
    st3 = STs.reshape(outer, rows, LANE)

    rec_spec = pl.BlockSpec((1, rows, LANE),
                            lambda i: (s_total - 1 - i, 0, 0))
    st_spec = pl.BlockSpec(
        (1, rows, LANE),
        lambda i: (jnp.clip((s_total - 1 - i) // cadence, 0,
                            refill_outer - 1), 0, 0))
    out_spec = st_spec
    f32 = jnp.float32
    kernel = functools.partial(
        _harvest_kernel, cadence, refill_outer, s_total, rows, n_stages,
        max_contribution, False)
    # VMEM budget: 8 double-buffered input blocks + 3 double-buffered
    # output blocks + 3 scratch planes = 22 x rows*512B, plus the
    # compaction's ~10 live (rows, 128) temporaries — at 128k lanes
    # (rows=1024) that is ~16.5MB, over the 16MB default scoped limit.
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(min(44 * rows * LANE * 4 * 2, 100 << 20)))
    outs = pl.pallas_call(
        kernel,
        grid=(s_total,),
        in_specs=[rec_spec] * 4 + [st_spec],
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((refill_outer, rows, LANE), f32)] * 3,
        scratch_shapes=[pltpu.VMEM((rows, LANE), f32)] * 3,
        compiler_params=params,
        interpret=interpret,
    )(plane(Vr), plane(Vg), plane(Vb),
      plane(FL.astype(jnp.int32)), st3.astype(jnp.int32))
    return tuple(x.reshape(refill_outer, n) for x in outs)


@functools.partial(
    jax.jit, static_argnames=("cadence", "refill_levels", "max_contribution",
                              "interpret"))
def reverse_harvest_levels(Vr, Vg, Vb, FL, *, cadence,
                           refill_levels, max_contribution, interpret=False):
    """`reverse_harvest` for the in-kernel-queue records (bounce_fused_q):
    paths can start at EVERY bounce level within the refill span, so the
    started flag rides FL's bit 2 per level, and the
    compaction runs at each of the first `refill_levels` levels. Returns
    (hr, hg, hb), each (refill_levels, N) f32 — the per-level analog of
    the XLA sort epilogue in integrator/regen.py's queue_ik branch, same
    permutation. Unlike the sort (cost linear in refill rows — 4x the
    cadence-4 queue's at the default refill), this kernel's pass count is
    fixed at one grid step per recorded level regardless of how many can
    start."""
    outer, cad, n = Vr.shape
    assert cad == cadence and n % LANE == 0
    rows = n // LANE
    s_total = outer * cadence
    n_stages = max(1, (n - 1).bit_length())
    shp = (s_total, rows, LANE)
    plane = lambda x: x.reshape(shp)

    rec_spec = pl.BlockSpec((1, rows, LANE),
                            lambda i: (s_total - 1 - i, 0, 0))
    out_spec = pl.BlockSpec(
        (1, rows, LANE),
        lambda i: (jnp.clip(s_total - 1 - i, 0, refill_levels - 1), 0, 0))
    f32 = jnp.float32
    kernel = functools.partial(
        _harvest_kernel, cadence, refill_levels, s_total, rows, n_stages,
        max_contribution, True)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(min(44 * rows * LANE * 4 * 2, 100 << 20)))
    outs = pl.pallas_call(
        kernel,
        grid=(s_total,),
        in_specs=[rec_spec] * 4,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((refill_levels, rows, LANE), f32)] * 3,
        scratch_shapes=[pltpu.VMEM((rows, LANE), f32)] * 3,
        compiler_params=params,
        interpret=interpret,
    )(plane(Vr), plane(Vg), plane(Vb), plane(FL.astype(jnp.int32)))
    return tuple(x.reshape(refill_levels, n) for x in outs)
