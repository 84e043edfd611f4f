"""Pallas TPU order-preserving row compaction for the regen harvest.

The regeneration reverse scan leaves each refill row's per-path radiance
scattered across the lane pool (started lanes interleaved with alive
ones); the accumulator write needs them packed to the row front in lane
order. TPU has no vector scatter, so round 1/2 used a batched rowwise
`lax.sort` on the 1-bit started flag — stable, but ~14ms per window at
128k lanes (the single largest non-kernel cost; an XLA-level log-shift
compaction measured only 25% cheaper).

This kernel streams each row once: per 128-lane chunk it (1) prefix-sums
the hole counts with 7 masked roll-adds, (2) moves every kept element
left by its hole count via the 7-pass bit-decomposition shuffle (element
and hole-count move together, LSB first), and (3) appends the compacted
prefix to a two-register pending buffer, emitting a full 128-lane store
whenever it fills — every store is lane-aligned, which is the whole
trick: arbitrary-offset vector stores don't exist, full-register stores
at a dynamic sublane index do.

Tail contents beyond each row's real count are GARBAGE (stale lane
values), which is safe for the caller: acc rows are written base-to-base
in item order, so any slot a tail garbles is either re-written by the
row that actually starts that item (same window or the next — bases
advance monotonically) or lies in the accumulator's absorber tail.
Rows are independent: one grid step per row, no cross-step state.

STATUS: measured NEGATIVE on the v5e (2026-08-17) — 48ms/window vs the
sort's 14.3ms (headline 115.7M vs 163-174M). The 13k sequential 128-lane
chunk iterations pay ~3.7us each in dynamic-shift rolls + the emit
branch; (1, 128) vector ops also waste 7/8 sublanes. Env-gated behind
GRT_COMPACT=1 in integrator/regen.py; a viable revival needs (8, 128)
chunks (cross-sublane ring shifts) and a branchless emit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _compact_kernel(n_chunks,
                    started_ref, vr_ref, vg_ref, vb_ref,
                    or_ref, og_ref, ob_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def body(c, carry):
        pcnt, cursor, pr, pg, pb = carry
        row = lambda ref: ref[0, pl.ds(c, 1), :]
        keep = row(started_ref) > 0
        vr, vg, vb = row(vr_ref), row(vg_ref), row(vb_ref)

        # holes[i] = # dropped lanes before lane i (exclusive prefix sum
        # of ~keep): 7 shift-masked roll-adds
        h = jnp.where(keep, 0, 1).astype(jnp.int32)
        # make it exclusive: shift right by one first
        h = jnp.where(iota >= 1, pltpu.roll(h, 1, 1), 0)
        for s in (1, 2, 4, 8, 16, 32, 64):
            h = h + jnp.where(iota >= s, pltpu.roll(h, s, 1), 0)
        ccnt = jnp.sum(keep.astype(jnp.int32))

        # move kept elements left by their hole count, bit by bit (LSB
        # first); hole counts and the keep flag travel with their elements
        # so later bits test updated positions and dropped elements can
        # never displace kept ones (kept destinations are collision-free
        # at every step: position = orig - (holes mod 2^{b+1}))
        kf = keep.astype(jnp.int32)
        for b in range(7):
            s = 1 << b
            mr = pltpu.roll(vr, LANE - s, 1)
            mg = pltpu.roll(vg, LANE - s, 1)
            mb = pltpu.roll(vb, LANE - s, 1)
            mh = pltpu.roll(h, LANE - s, 1)
            mk = pltpu.roll(kf, LANE - s, 1)
            take = (mk > 0) & (((mh >> b) & 1) > 0)
            # a lane whose element departs is invalidated unless it
            # receives one itself — otherwise its stale copy would ride
            # the remaining bits and clobber another element
            moved_out = (kf > 0) & (((h >> b) & 1) > 0)
            vr = jnp.where(take, mr, vr)
            vg = jnp.where(take, mg, vg)
            vb = jnp.where(take, mb, vb)
            h = jnp.where(take, mh, h)
            kf = jnp.where(take, mk, jnp.where(moved_out, 0, kf))

        # append the ccnt-lane prefix to the pending buffer: rotate the
        # chunk right by pcnt; lanes [pcnt, pcnt+ccnt) extend the pending
        # register, wrapped lanes [0, pcnt+ccnt-128) spill into `nxt`
        in_pend = iota < pcnt
        rr = pltpu.roll(vr, pcnt, 1)
        rg = pltpu.roll(vg, pcnt, 1)
        rb = pltpu.roll(vb, pcnt, 1)
        pr = jnp.where(in_pend, pr, rr)
        pg = jnp.where(in_pend, pg, rg)
        pb = jnp.where(in_pend, pb, rb)
        total = pcnt + ccnt
        spill = iota < (total - LANE)
        nr = jnp.where(spill, rr, 0.0)
        ng = jnp.where(spill, rg, 0.0)
        nb = jnp.where(spill, rb, 0.0)

        def emit(args):
            cursor, pr, pg, pb = args
            or_ref[0, pl.ds(cursor, 1), :] = pr
            og_ref[0, pl.ds(cursor, 1), :] = pg
            ob_ref[0, pl.ds(cursor, 1), :] = pb
            return cursor + 1, nr, ng, nb

        cursor, pr, pg, pb = jax.lax.cond(
            total >= LANE, emit, lambda a: a, (cursor, pr, pg, pb))
        pcnt = jnp.where(total >= LANE, total - LANE, total)
        return pcnt, cursor, pr, pg, pb

    zero = jnp.zeros((1, LANE), jnp.float32)
    pcnt, cursor, pr, pg, pb = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.int32(0), jnp.int32(0), zero, zero, zero))
    # flush the partial pending register (tail lanes are garbage — safe,
    # see module docstring). Only when it holds data: with pcnt == 0 every
    # chunk was emitted exactly (cursor == n_chunks) and a flush would
    # overwrite the final real chunk with the empty buffer.
    def flush(_):
        or_ref[0, pl.ds(cursor, 1), :] = pr
        og_ref[0, pl.ds(cursor, 1), :] = pg
        ob_ref[0, pl.ds(cursor, 1), :] = pb
        return 0

    jax.lax.cond(pcnt > 0, flush, lambda _: 0, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_rows(started, hr, hg, hb, *, interpret=False):
    """Per-row order-preserving compaction: for each row r, the lanes with
    started[r] != 0 are packed to the front of the output row in lane
    order; lanes beyond that count hold unspecified values. Shapes all
    (R, N) with N a multiple of 128; started int32/bool."""
    r, n_orig = hr.shape
    pad = (-n_orig) % LANE
    if pad:  # trailing dropped lanes leave the compacted prefix unchanged
        started = jnp.pad(started.astype(jnp.int32), ((0, 0), (0, pad)))
        hr, hg, hb = (jnp.pad(x, ((0, 0), (0, pad))) for x in (hr, hg, hb))
    n = n_orig + pad
    n_chunks = n // LANE
    shp3 = (r, n_chunks, LANE)
    f32 = jnp.float32
    started = started.astype(jnp.int32).reshape(shp3)
    args = [started] + [x.astype(f32).reshape(shp3) for x in (hr, hg, hb)]
    spec = pl.BlockSpec((1, n_chunks, LANE), lambda i: (i, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_compact_kernel, n_chunks),
        grid=(r,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(shp3, f32)] * 3,
        interpret=interpret,
    )(*args)
    return tuple(x.reshape(r, n)[:, :n_orig] for x in outs)
