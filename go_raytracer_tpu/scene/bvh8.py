"""Host-side collapse of the binary skip-link BVH into an 8-wide BVH
("BVH8") laid out for the sublane-batched Pallas traversal kernel
(ops/pallas/traverse8.py).

Why 8-wide: the TPU's vector registers are (8 sublanes, 128 lanes) of f32.
The binary tile walk (ops/pallas/traverse.py) tests ONE box per node visit
against a 1024-lane ray tile — the sublane dimension carries rays, so an
incoherent tile's walk visits nearly the whole tree. Putting the *eight
children of one node* in the sublane dimension instead lets a 128-ray walk
slab-test 8 boxes per vector op at full register utilisation: the visited
node set shrinks to that of a 128-ray bundle (far more coherent after the
Morton sort) with zero vector-efficiency loss, and leaf visits test 8
triangles per Möller–Trumbore evaluation the same way.

The collapse is the standard wide-BVH construction: start from a binary
node's two children and repeatedly replace the largest-surface-area inner
slot with its own two children until 8 slots are filled or all slots are
leaves. Binary-tree structure is recovered from the skip links (first
child of inner i is i+1; its sibling is skip[i+1]). Split policy therefore
still matches the reference (hittable/bvh.go:35-61) — the 8-ary tree is a
reshaping of the same spatial hierarchy, not a new build.

Memory layout (both tables): logical rows of 16 f32 fields, 8 rows per
(8, 128) register line, EIGHT ENTRIES PER LINE-GROUP so the minor dim is
exactly 128 lanes (a narrow (M, 16) VMEM array would pad its minor dim to
128 — 8x waste). Entry m lives at rows [ (m>>3)*8, (m>>3)*8+8 ), lane
block (m&7)*16; one dynamic lane-roll brings its 16-field block to lanes
[0, 16) with child/triangle index in the SUBLANE dimension.

Node entry (per child slot s = sublane): lanes 0-2 box min, 3-5 box max
(NaN for empty slots — every slab comparison against NaN is false, so an
empty slot can never be hit), lane 7 valid flag (informational). The
per-child PUSH VALUES (inner child: its node8 id; leaf child:
-(2*first_group + (n_groups-1)) - 1) all live in SUBLANE 0, lanes 8..15 —
the kernel extracts scalars only from sublane 0 (the one scalar-extract
pattern Mosaic is known to legalize, cf. traverse._row). Triangle group
entry (per triangle s = sublane): lanes 0-2 v0, 3-5 e0, 6-8 e1, 9
original triangle id (leaf-order index into the scene's triangle table;
-1 padding rows are all-zero => det 0 => no hit).
"""

from __future__ import annotations

import dataclasses

import numpy as np

ROW_PAD = 16
ENTRIES_PER_LINE = 8
WIDE = 8


@dataclasses.dataclass
class BVH8:
    node_lines: np.ndarray   # (M*8, 128) padded / (ceil(M/8)*8, 128) dense
    tri_lines: np.ndarray    # (ceil(G/8)*8, 128) f32
    n_nodes: int             # M (node8 count)
    n_groups: int            # G (8-triangle groups)
    dense_nodes: bool = False  # True: nodes line-packed (roll on load)


def _pack_lines(entries: np.ndarray) -> np.ndarray:
    """(M, 8, 16) entries -> (ceil(M/8)*8, 128) register lines with entry
    index in the lane-block dimension and sublane index preserved."""
    m = entries.shape[0]
    pad = (-m) % ENTRIES_PER_LINE
    if pad:
        entries = np.concatenate(
            [entries, np.zeros((pad, WIDE, ROW_PAD), entries.dtype)])
    # (L, k=entry-in-line, s=sublane, f) -> (L, s, k, f) -> (L*8, 128)
    e = entries.reshape(-1, ENTRIES_PER_LINE, WIDE, ROW_PAD)
    return np.ascontiguousarray(e.transpose(0, 2, 1, 3)).reshape(
        -1, ENTRIES_PER_LINE * ROW_PAD)


def _pad_lines(entries: np.ndarray) -> np.ndarray:
    """(M, 8, 16) entries -> (M*8, 128) register lines, ONE entry per line
    (fields at lanes [0, 16), rest zero). 8x the VMEM of _pack_lines but
    the kernel's load needs no dynamic lane roll — node visits sit on the
    serial critical path of the walk, and node tables are small (~4 KB x
    #inner-nodes: ~19 MB even for a 500k-triangle mesh), so latency wins
    over density. Triangle tables stay line-packed: they are 8-16x larger
    and their roll overlaps the Moller-Trumbore vector work."""
    m, w, f = entries.shape
    out = np.zeros((m * w, ENTRIES_PER_LINE * ROW_PAD), entries.dtype)
    out[:, :f] = entries.reshape(m * w, f)
    return out


DENSE_NODE_BYTES = 24 * 1024 * 1024  # padded-node budget before packing


def collapse(node_min, node_max, first, count, skip, v0, e0, e1,
             max_leaf: int = 16, dense_nodes=None) -> BVH8:
    """Collapse a flat binary skip-link BVH (arrays as in scene/bvh.FlatBVH,
    numpy) into packed BVH8 tables. v0/e0/e1 are the (T, 3) triangle rows
    in the SAME leaf order the binary tree's first/count index into.

    Node-entry encoding: per-child push values at sublane 0, lanes 8..15
    (the traverse8 kernel — 8 scalar extract+store ops per node visit).
    A compressed "mask-machine" encoding was built and measured ~15%
    SLOWER on the v5e (round 3, docs/PERFORMANCE.md) and was removed in
    round 4 — git history has it."""
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    first = np.asarray(first)
    count = np.asarray(count)
    skip = np.asarray(skip)
    if max_leaf > 2 * WIDE or np.any(count > 2 * WIDE):
        raise ValueError("BVH8 leaf encoding holds at most 16 triangles "
                         "(2 groups) per leaf")
    if np.any(count > max_leaf):
        raise ValueError(f"leaf count exceeds {max_leaf}")

    ext = np.maximum(node_max - node_min, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] \
        + ext[:, 2] * ext[:, 0]

    def children(i):
        return i + 1, int(skip[i + 1])

    # BFS over binary subtree roots; each gets one node8
    slot_lists = [None]
    node8_of = {0: 0}
    pending = [0]
    qi = 0
    while qi < len(pending):
        root = pending[qi]
        my = node8_of[root]
        qi += 1
        if count[root] > 0:
            slots = [root]           # degenerate single-leaf tree
        else:
            slots = list(children(root))
            while len(slots) < WIDE:
                inner = [s for s in slots if count[s] == 0]
                if not inner:
                    break
                s = max(inner, key=lambda x: area[x])
                slots.remove(s)
                slots.extend(children(s))
        for s in slots:
            if count[s] == 0 and s not in node8_of:
                node8_of[s] = len(slot_lists)
                slot_lists.append(None)
                pending.append(s)
        slot_lists[my] = slots

    # emit node entries + leaf triangle groups
    m8 = len(slot_lists)
    nodes = np.full((m8, WIDE, ROW_PAD), np.nan, np.float32)
    nodes[:, :, 6:] = 0.0
    groups = []                       # each: (8,) int32 tri ids, -1 pad
    for my, slots in enumerate(slot_lists):
        for si, s in enumerate(slots):
            nodes[my, si, 0:3] = node_min[s]
            nodes[my, si, 3:6] = node_max[s]
            nodes[my, si, 7] = 1.0
            if count[s] == 0:
                push = node8_of[s]
            else:
                f, c = int(first[s]), int(count[s])
                g0 = len(groups)
                ng = (c + WIDE - 1) // WIDE
                for gi in range(ng):
                    ids = np.full(WIDE, -1, np.int32)
                    take = min(WIDE, c - gi * WIDE)
                    ids[:take] = np.arange(f + gi * WIDE,
                                           f + gi * WIDE + take)
                    groups.append(ids)
                push = -(2 * g0 + (ng - 1)) - 1
            nodes[my, 0, 8 + si] = float(push)

    g = len(groups)
    gids = np.stack(groups) if g else np.full((1, WIDE), -1, np.int32)
    g = gids.shape[0]
    valid = gids >= 0
    safe = np.where(valid, gids, 0)
    tri = np.zeros((g, WIDE, ROW_PAD), np.float32)
    tri[:, :, 0:3] = np.where(valid[..., None], np.asarray(v0)[safe], 0.0)
    tri[:, :, 3:6] = np.where(valid[..., None], np.asarray(e0)[safe], 0.0)
    tri[:, :, 6:9] = np.where(valid[..., None], np.asarray(e1)[safe], 0.0)
    tri[:, :, 9] = np.where(valid, gids, -1).astype(np.float32)

    # one-per-line nodes trade 8x VMEM for a roll-free load on the walk's
    # critical path; past the budget (Sponza-scale meshes) fall back to
    # the dense packing so node + triangle tables still fit VMEM together
    if dense_nodes is None:
        dense_nodes = m8 * WIDE * 128 * 4 > DENSE_NODE_BYTES
    pack_nodes = _pack_lines if dense_nodes else _pad_lines
    return BVH8(node_lines=pack_nodes(nodes), tri_lines=_pack_lines(tri),
                n_nodes=m8, n_groups=g, dense_nodes=dense_nodes)
