"""Packet BVH traversal — the TPU-resident Pallas ray-casting kernel.

Replaces Embree's rtcIntersect1/rtcOccluded1 (reference:
src/intersection.cpp:32,83) for scenes whose collapsed table fits VMEM.

Design (measured on TPU v5e, see tools/bvh_probes notes in README):

- XLA-side per-lane traversal is HBM-gather bound: ~11 ms per Mlane per
  dependent step, and lockstep makes every lane pay the slowest lane's
  step count. Ceiling ~1 Mrays/s on sponza-class scenes.
- This kernel instead walks ONE packet of PACKET_ROWS*128 rays through
  the tree together, with the unified node/leaf table RESIDENT IN VMEM
  (~16 MB/core). The scalar core drives a shared traversal stack in
  SMEM; the VPU tests all lanes against each visited row. Measured
  per-visit costs: dependent (1,128) row load ~0.3 us, 16 slab tests
  ~0.4 us, any-lane child bitmask via a roll-OR tree + SMEM readback
  ~0.3 us, scalar pushes ~0.1 us — ~1-2 us per node visit per packet,
  independent of how many of the 1024 lanes care.
- Packets inherit coherence from pixel order (primary rays) and from
  the bounce structure; the packet visits the UNION of its rays' nodes,
  so efficiency degrades gracefully with divergence instead of paying
  per-lane gather cost.

Table layout (int32, width 128; f32 payloads ride as bitcast bits —
int-typed on purpose, see super16.Super16 for the NaN-canonicalization
trap this avoids):

- Supernode row: 16 children; cols k*6..k*6+5 = child AABB
  (min.xyz, max.xyz as f32 bits), cols 96..111 = child refs, 112+ pad.
  Empty slots carry an inverted AABB (never hit) and ref _EMPTY.
- Leaf rows: chains of 1..n rows, 12 primitives per row:
  cols 0..107 = 12x(v0,e1,e2) f32 bits, cols 108..119 = prim ids
  (-1 pads), 120+ pad. Spheres ride in a slot as (center, radius,
  0...) with prim id >= n_tris discriminating (as in super16).
- Child ref encoding: >= 0 -> supernode row index; < 0 -> leaf chain,
  ~ref = start_row | (n_rows << 22); _EMPTY -> no child.
"""

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import INT, REAL
from gdpt_tpu.core.soa import V3

_EMPTY = np.int32(2**31 - 1)
_DEBUG_CEILING = 0  # test hook: hard iteration cap (0 = scene-derived)
LEAF_TRIS = 12           # per leaf row: 12*9 geometry + 12 prim ids = 120
_CHAIN_SHIFT = 22        # leaf ref: start | (n_rows << 22)
# VMEM residency cap for the table (leave room for ray blocks, outputs
# and scratch — all tiny next to it). v5e has 128 MiB VMEM/core; tables
# past the cap fall back to the super16 HBM-gather walk, which measured
# ~25x slower on disney_bsdf_array (734k tris). Env-overridable for
# sweeps.
def _max_table_bytes():
    # Read at BUILD time (not import) so the knob matches path_soa's
    # scene-memo key, which also reads it per call — an env change
    # after import both rebuilds the table and applies the new cap.
    return int(__import__("os").environ.get("GDPT_MAX_TABLE_MB", "96")) << 20
PACKET_ROWS = int(__import__("os").environ.get("GDPT_PACKET_ROWS", "8"))  # rays per packet = PACKET_ROWS * 128
# A/B knob: masked-stack traversal (measured 20-35% slower on v5e than
# the legacy ordered push — see _make_kernel). Read ONCE at import so
# kernel selection can't silently diverge from a mid-process env flip
# (jit cache keys exclude the env); tests select it explicitly via the
# masked_push parameter instead of the env.
MASKED_STACK = __import__("os").environ.get(
    "GDPT_PACKET_MASKSTACK", "0") == "1"
# Dual-packet kernel (two packets per grid step, visit bodies emitted
# interleaved to hide the scalar-load -> vector-broadcast latency each
# solo body stalls on; see _make_kernel_dual). Read ONCE at import for
# the same jit-cache-key reason as MASKED_STACK; tests/A-Bs select it
# explicitly via _trace_packets(dual=...).
DUAL_PACKET = __import__("os").environ.get(
    "GDPT_PACKET_DUAL", "0") == "1"


def _wide_on():
    # 32-wide supernodes (GDPT_PACKET_WIDE, default ON): each supernode
    # holds 32 children across TWO table rows + 24-prim leaf bins,
    # cutting union visits/packet ~25% — the per-visit fixed cost
    # (or_scalar readback, step dispatch, stack pop) amortizes over
    # twice the fan-out. Hardware A/B (tools/ab_wide_kernel.py, v5e
    # 2026-08-19): disney pool rays 2.56 -> 3.17 Mrays/s (+24%),
    # sponza +8-11%, disney_array wash (-1..+3%); hit-equality checked
    # on all three (2/262k tie flips on sponza: bit-identical t,
    # coplanar duplicate prims). Read at BUILD time
    # (build_packet_table), like GDPT_MAX_TABLE_MB; the kernel learns
    # the width from the table's wide marker field, so jit cache keys
    # follow the table structure and a mid-process env flip cannot
    # select a mismatched kernel. GDPT_PACKET_WIDE=0 opts out.
    return os.environ.get("GDPT_PACKET_WIDE", "1") == "1"
# or_scalar's roll-OR tree only covers every row when P is a power of
# two; a stray value like 6 would silently drop child-mask lanes.
# The floor of 8 is hardware-imposed: ray blocks are BlockSpec((P, 128))
# and the Mosaic lowering requires the sublane dim divisible by 8 (the
# f32 VMEM tile is (8, 128)), so 4-row packets cannot lower on TPU —
# measured round 4: rows=4 fails with the block-shape divisibility error.
assert PACKET_ROWS >= 8 and (PACKET_ROWS & (PACKET_ROWS - 1)) == 0, \
    f"GDPT_PACKET_ROWS must be a power of two >= 8 (TPU (8,128) tiling), got {PACKET_ROWS}"


class PacketTable(NamedTuple):
    table: jnp.ndarray        # (R, 128) int32 unified rows
    stack_dummy: jnp.ndarray  # (stack_n,) shape-only
    bbox: jnp.ndarray         # (6,) scene AABB (morton ray-sort domain)
    # (n_prims, 9) f32 primitive geometry (tri v0/e1/e2 or sphere
    # center/radius/pad), HBM-resident: the kernel reports only
    # (t, prim); u/v/geometric normal are recomputed outside by one
    # XLA gather of the hit primitive, which keeps the kernel's leaf
    # loop down to two VMEM read-modify-writes per visit.
    geo9: jnp.ndarray = None
    # Two-phase entry frontier: ~GDPT_ENTRY_K disjoint subtrees covering
    # the scene. entry_ref (K+1,) int32 packet-kernel refs (last = whole-
    # table root, the correctness sentinel); entry_bbox (K+1, 6) f32.
    entry_ref: jnp.ndarray = None
    entry_bbox: jnp.ndarray = None
    # 32-wide marker: None = 16-wide rows; a shape-(1,) dummy = each
    # supernode spans TWO rows (children 0-15 in row A, 16-31 in row
    # B; refs likewise at cols 96-111 of each row; 32-bit validity in
    # row A col 120). Shape-only — the kernel width rides in the jit
    # cache key via the pytree structure.
    wide_dummy: jnp.ndarray = None


def build_packet_table(bvh_bbox_min, bvh_bbox_max, first, count, miss,
                       prim_order, tri_v0, tri_e1, tri_e2,
                       sph_center=None, sph_radius=None,
                       leaf_skip_from=None,
                       prim_of_ref=None, ref_bbox_min=None,
                       ref_bbox_max=None, wide=None):
    """Host-side collapse of the binary miss-link BVH into the packet
    table. Returns None when the scene exceeds the VMEM residency cap.

    Mirrors super16.build_super16's collapse (maximal 16-subtree
    frontier expansion over the DFS/miss-link layout) but with fixed
    12-prim leaf rows chained per fat leaf, so leaf fatness never
    widens the row.

    prim_of_ref / ref_bbox_min / ref_bbox_max support pre-split
    references (early split clipping): prim_order then indexes split
    REFERENCES, prim_of_ref maps each reference to its original
    primitive id (emitted in leaf rows, so hit attributes and sphere
    detection see original ids), and the ref bboxes (clipped to the
    split region) drive the stored leaf-group bounds — the whole point
    of splitting. Duplicate refs of one primitive inside a single leaf
    group are deduped (one geometry row, union of the refs' boxes).
    """
    n_nodes = count.shape[0]
    n_tris = tri_v0.shape[0]
    if n_nodes == 0:
        return None
    # Supernode width: 16 children in one row (default) or 32 across
    # two rows (wide; see _wide_on). S = rows per supernode.
    W = 32 if (wide if wide is not None else _wide_on()) else 16
    S = W // 16
    order = np.asarray(prim_order)
    # pid[ref] -> original primitive id (identity without pre-splits).
    pid = (np.asarray(prim_of_ref, np.int64) if prim_of_ref is not None
           else None)
    rbmin = (np.asarray(ref_bbox_min, np.float32)
             if ref_bbox_min is not None else None)
    rbmax = (np.asarray(ref_bbox_max, np.float32)
             if ref_bbox_max is not None else None)

    def to_pid(p):
        return pid[p] if pid is not None else p
    count = np.asarray(count)
    first = np.asarray(first)
    miss = np.asarray(miss).astype(np.int64)
    bmin = np.asarray(bvh_bbox_min, np.float32)
    bmax = np.asarray(bvh_bbox_max, np.float32)
    v0a = np.asarray(tri_v0, np.float32)
    e1a = np.asarray(tri_e1, np.float32)
    e2a = np.asarray(tri_e2, np.float32)
    if sph_center is not None and np.asarray(sph_center).size:
        sc = np.asarray(sph_center, np.float32).reshape(-1, 3)
        sr = np.asarray(sph_radius, np.float32).reshape(-1)
        sph9 = np.concatenate(
            [sc, sr[:, None], np.zeros((sc.shape[0], 5), np.float32)], axis=1)
        geo9 = np.concatenate(
            [np.concatenate([v0a, e1a, e2a], axis=1), sph9], axis=0)
    else:
        if order.size and to_pid(order).max(initial=0) >= n_tris:
            return None
        geo9 = np.concatenate([v0a, e1a, e2a], axis=1)

    is_leaf_b = count > 0
    n_prims = order.size
    leaf_first = np.where(is_leaf_b, first.astype(np.int64),
                          np.iinfo(np.int64).max)
    pstart = np.minimum.accumulate(leaf_first[::-1])[::-1]
    pstart = np.append(pstart, n_prims)
    pend = pstart[np.minimum(miss, n_nodes)]
    cnt_sub = pend - pstart[:-1]

    # Fat-leaf roots: maximal subtrees with <= LEAF_CAP prims — a fixed
    # S_LEAF rows per leaf group, so the kernel needs no dynamic chain
    # loop (a wedge hazard on hardware) and every stack entry is a
    # fixed-size visit. Wide tables double the leaf bin to 24 prims
    # across two rows: the flatter 32-wide tree touches ~10% MORE leaf
    # groups (coarser hierarchical culling, measured in
    # tools/wide_visit_count.py), so the leaf side must amortize its
    # per-visit fixed cost the same way the super side does.
    LEAF_CAP = LEAF_TRIS * S
    S_LEAF = S
    FAT_CAP = LEAF_CAP
    fat_of = {}
    fat_ranges = []
    i = 0
    while i < n_nodes:
        if cnt_sub[i] <= FAT_CAP:
            fat_of[i] = len(fat_ranges)
            fat_ranges.append((int(pstart[i]), int(cnt_sub[i])))
            i = int(miss[i])
        else:
            i += 1

    def children2(b):
        left = b + 1
        return left, int(miss[left])

    def eff_count(c):
        """A fat node's prim count minus outside-tested spheres."""
        lo, cnt = fat_ranges[fat_of[c]]
        if leaf_skip_from is None:
            return cnt
        p = order[lo: lo + cnt]
        return int((to_pid(p) < leaf_skip_from).sum())

    def binpack(leaf_kids):
        """First-fit-descending pack of leaf nodes into <= LEAF_CAP
        prim bins; returns a list of member-node lists."""
        bins = []
        for c in sorted(leaf_kids, key=lambda c: -eff_count(c)):
            k = eff_count(c)
            for b_ in bins:
                if b_[1] + k <= LEAF_CAP:
                    b_[0].append(c)
                    b_[1] += k
                    break
            else:
                bins.append([[c], k])
        return [m for m, _ in bins]

    # GDPT_EXPAND_PREMERGE=1 reverts to pre-merge slot counting (the
    # c1656d6 state) for hardware A/B of the 16-slot expansion: wider
    # rows mean more slab tests per visit, so the visit-count win must
    # be confirmed as a wall-clock win on the chip.
    premerge = os.environ.get("GDPT_EXPAND_PREMERGE", "0") == "1"

    def expand16(b):
        """Split largest-first until W POST-MERGE child slots: leaf
        siblings that bin-pack into shared rows occupy one slot, so the
        freed slots take more subtree splits — a flatter tree with
        fewer supernode visits on the walk."""
        frontier = [b]
        while True:
            sups = [x for x in frontier if x not in fat_of]
            leaves = [x for x in frontier if x in fat_of]
            bins = binpack(leaves)
            full = (len(frontier) >= W if premerge
                    else len(sups) + len(bins) >= W)
            if full or not sups:
                return sups, bins
            big = max(sups, key=lambda x: cnt_sub[x])
            i = frontier.index(big)
            left, right = children2(big)
            frontier[i:i + 1] = [left, right]

    if 0 in fat_of:
        kid_plan = [([], binpack([0]))]
        kids_of = [[0]]
        super_of = {}
        max_depth = 1
        order_q = [None]
    else:
        super_of = {}
        order_q = []
        kid_plan = []  # per super: (super children, leaf bins)
        kids_of = []   # flat node lists (two-phase frontier splitter)
        queue = [(0, 1)]
        max_depth = 1
        while queue:
            b, depth = queue.pop()
            if b in super_of:
                continue
            super_of[b] = len(order_q)
            order_q.append(b)
            max_depth = max(max_depth, depth)
            sups, bins = expand16(b)
            kid_plan.append((sups, bins))
            kids_of.append(sups + [c for m in bins for c in m])
            for c in sups:
                queue.append((c, depth + 1))

    n_super = len(order_q)

    def eff_prims(c):
        """A fat node's ref ids, minus any outside-tested spheres."""
        lo, cnt = fat_ranges[fat_of[c]]
        p = order[lo: lo + cnt].astype(np.int32)
        if leaf_skip_from is not None:
            p = p[to_pid(p) < leaf_skip_from]
        return p

    # Sibling-leaf bin packing (bins precomputed in expand16): SAH
    # leaves average ~8 of the row's 12 slots, so sibling leaf children
    # of a supernode share rows — fewer leaf rows means fewer leaf
    # visits, the bulk of incoherent packet cost — and the freed child
    # slots took extra subtree splits (flatter tree, fewer super
    # visits). Each group gets a tight bbox recomputed from its
    # triangles (also sheds the slack a skipped sphere left in the
    # node bbox).
    leaf_groups = []   # np.int32 prim-id arrays, each <= LEAF_TRIS
    group_bbox = []    # (bmin3, bmax3) per group
    node_group = {}    # fat node -> group index
    kid_entries = []   # per super: [("s", node) | ("l", group_index)]
    for si in range(n_super):
        sups, bins = kid_plan[si]
        entries = [("s", c) for c in sups]
        for members in bins:
            refs = (np.concatenate([eff_prims(c) for c in members])
                    if members else np.zeros(0, np.int32))
            if refs.shape[0] == 0:
                continue  # only skipped spheres lived here: drop child
            gi = len(leaf_groups)
            if rbmin is not None:
                # Pre-split refs: group bbox = union of the refs'
                # CLIPPED boxes (the splitting win); geometry rows are
                # deduped per original primitive — the kept full-
                # triangle test covers every ref's region.
                group_bbox.append((rbmin[refs].min(axis=0),
                                   rbmax[refs].max(axis=0)))
                _, keep = np.unique(to_pid(refs), return_index=True)
                prims = refs[np.sort(keep)]
            else:
                prims = refs
                # Tight bbox from primitive geometry. Triangle rows are
                # (v0, e1, e2); sphere rows (prim id >= n_tris, present
                # in leaves only when leaf_skip_from is None) are
                # (center, (r,0,0,..)) and must contribute center +- r
                # on ALL axes, not the degenerate tri-style corners.
                pidp = to_pid(prims)
                tri_p = pidp[pidp < n_tris]
                sph_p = pidp[pidp >= n_tris]
                parts = []
                if tri_p.size:
                    parts += [geo9[tri_p, 0:3],
                              geo9[tri_p, 0:3] + geo9[tri_p, 3:6],
                              geo9[tri_p, 0:3] + geo9[tri_p, 6:9]]
                if sph_p.size:
                    cen = geo9[sph_p, 0:3]
                    rad = geo9[sph_p, 3:4]
                    parts += [cen - rad, cen + rad]
                vs = np.concatenate(parts)
                group_bbox.append((vs.min(axis=0), vs.max(axis=0)))
            leaf_groups.append(prims)
            for c in members:
                node_group[c] = gi
            entries.append(("l", gi))
        kid_entries.append(entries)
    # Shared all-dead leaf row: target for fat nodes whose prims were
    # all skipped (two-phase entry refs can still name them).
    empty_gi = None
    if leaf_skip_from is not None:
        empty_gi = len(leaf_groups)
        leaf_groups.append(np.zeros(0, np.int32))
        group_bbox.append((np.full(3, 3e38, np.float32),
                           np.full(3, -3e38, np.float32)))
    n_rows = n_super * S + len(leaf_groups) * S_LEAF
    if n_rows * 128 * 4 > _max_table_bytes():
        return None

    table = np.zeros((n_rows, 128), np.float32)
    ti = table.view(np.int32)
    # Empty child slots: inverted boxes that no slab test can enter.
    for si in range(n_super):
        for r in range(S):
            for k in range(16):
                table[si * S + r, k * 6 + 0: k * 6 + 3] = np.float32(3e38)
                table[si * S + r, k * 6 + 3: k * 6 + 6] = np.float32(-3e38)
            ti[si * S + r, 96:112] = _EMPTY

    def group_ref(gi):
        return np.int32(~np.int32((n_super * S + gi * S_LEAF)
                                  | (S_LEAF << _CHAIN_SHIFT)))

    for si in range(n_super):
        ents = kid_entries[si]
        boxes = [(bmin[x], bmax[x]) if kind == "s" else group_bbox[x]
                 for kind, x in ents]
        # Children are stored sorted by centroid (ascending) along the
        # axis of greatest centroid spread; the kernel pushes slots
        # forward or backward depending on the packet's direction sign
        # along that axis, so pops come nearest-first and best-t
        # shrinks as early as possible (ordered traversal).
        axis = 0
        if ents:
            cen = np.array([(lo + hi) * 0.5 for lo, hi in boxes])
            axis = int(np.argmax(cen.max(axis=0) - cen.min(axis=0)))
            sort = np.argsort(cen[:, axis], kind="stable")
            ents = [ents[j] for j in sort]
            boxes = [boxes[j] for j in sort]
        valid = 0
        for k, ((kind, x), (blo, bhi)) in enumerate(zip(ents, boxes)):
            r = si * S + (k >> 4)
            kk = k & 15
            table[r, kk * 6 + 0: kk * 6 + 3] = blo
            table[r, kk * 6 + 3: kk * 6 + 6] = bhi
            valid |= 1 << k
            ti[r, 96 + kk] = (np.int32(super_of[x] * S) if kind == "s"
                              else group_ref(x))
        # Col 120 (row A): child-validity bits — the slab test cannot
        # reject an unused slot by geometry alone (inverted boxes still
        # pass once min/max mix the +-inf slabs), so the scalar mask
        # ANDs this in. 32-wide masks use all 32 bits of the int32.
        ti[si * S, 120] = np.int32(np.uint32(valid & 0xFFFFFFFF))
        ti[si * S, 121] = axis  # sort axis for the ordered push

    for gi, prims in enumerate(leaf_groups):
        pids_all = to_pid(prims)
        for r in range(S_LEAF):
            row = n_super * S + gi * S_LEAF + r
            pids = pids_all[r * LEAF_TRIS: (r + 1) * LEAF_TRIS]
            cnt = pids.shape[0]
            if cnt:
                table[row, : cnt * 9] = geo9[pids].reshape(-1)
            ids = np.full(LEAF_TRIS, -1, np.int32)
            ids[:cnt] = pids
            ti[row, 108:120] = ids

    stack_n = max(64, W * (max_depth + 1))
    root_lo = bmin[0] if n_nodes else np.zeros(3, np.float32)
    root_hi = bmax[0] if n_nodes else np.ones(3, np.float32)

    # Entry frontier for two-phase traversal: greedily split the
    # largest-population supernode root until ~K disjoint subtrees.
    def ref_of(c):
        if c in super_of:
            return int(super_of[c] * S)
        gi = node_group.get(c, empty_gi)
        return int(group_ref(gi))

    k_target = int(os.environ.get("GDPT_ENTRY_K", "64"))
    frontier = [0]
    while len(frontier) < k_target:
        pick, pick_cnt = None, -1
        for i, c in enumerate(frontier):
            if c in super_of and cnt_sub[c] > pick_cnt:
                pick, pick_cnt = i, cnt_sub[c]
        if pick is None:
            break
        c = frontier.pop(pick)
        ch = [x for x in kids_of[super_of[c]] if x is not None]
        frontier[pick:pick] = ch
    entry_ref = np.asarray([ref_of(c) for c in frontier] + [0], np.int32)
    entry_bbox = np.concatenate(
        [np.concatenate([bmin[frontier], bmax[frontier]], axis=1),
         np.concatenate([root_lo, root_hi])[None, :]], axis=0)

    return PacketTable(
        jnp.asarray(ti),
        jnp.zeros(stack_n, jnp.int32),
        jnp.asarray(np.concatenate([root_lo, root_hi]).astype(np.float32)),
        jnp.asarray(geo9),
        jnp.asarray(entry_ref),
        jnp.asarray(entry_bbox.astype(np.float32)),
        jnp.zeros(1, jnp.int32) if W == 32 else None,
    )


# Stack visits unrolled per while-loop iteration: amortizes the loop's
# fixed cost (cond eval, carry staging) over more visit bodies at the
# price of up to N-1 wasted predicated visits at stack drain (noise next
# to the 300-900 visits a live packet performs). Read at import time
# like GDPT_PACKET_ROWS; subprocess A/B via tools/kernel_sweep.py.
_VISITS_PER_ITER = int(os.environ.get("GDPT_VISITS_PER_ITER", "2"))
assert _VISITS_PER_ITER >= 1


def _make_kernel(stack_n, n_tris, any_hit, ceiling, n_rows,
                 masked_push=True, wide=False):
    """One packet per grid step. The kernel reports only (t, prim): the
    hit's u/v/geometric normal are recomputed outside from one XLA
    gather of the winning primitive, so the leaf loop carries two VMEM
    read-modify-writes instead of seven. Two stack visits run per while
    iteration to halve the loop's fixed cost (cond eval, carry).

    wide: the table stores 32-child supernodes across two rows (see
    build_packet_table W=32). A super visit loads rows srow/srow+1,
    tests 32 boxes into one 32-bit mask (one or_scalar, same cost as
    16), and pushes over 32 slots — half the super visits of a
    16-wide tree at ~1.5x the per-visit cost (the slab tests are the
    only part that doubles; the reduce/readback/step dispatch do not).
    Legacy ordered-push only (the masked peel is 16-bit).

    masked_push (opt-in, GDPT_PACKET_MASKSTACK=1): a super visit
    stores ONE (row, child-mask) stack entry — two scalar stores —
    and each later step peels one child bit (ctz) and visits it in
    the same step, replacing the legacy 16-deep dependent scalar
    store+add push chain. Node visit counts and order are identical
    in both schemes. MEASURED SLOWER on TPU v5e (sponza standalone:
    4.41/1.53 coh/inc Mrays vs legacy 5.66/2.34, 2026-08-18): the
    per-peel child extract (dynamic row read + 7 rolls + VMEM
    scratch roundtrip to scalarize) sits on every step's critical
    path, costing more than the store chain it removed. Kept as a
    documented negative result / A-B knob."""

    def kernel(tab_ref, ox, oy, oz, dx, dy, dz, tn, tf, rref,
               t_o, prim_o, wscr, stk, stkm, spr):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        P = PACKET_ROWS
        R = n_rows
        t_o[...] = tf[...]
        prim_o[...] = jnp.full((P, 128), -1, jnp.int32)
        if any_hit:
            # Dead padding lanes (tf < tn) must not keep packets alive.
            prim_o[...] = jnp.where(tn[...] > tf[...], 0, prim_o[...])
        # Traversal root for this packet (two-phase entry traversal
        # starts packets at a subtree entry; 0 = whole-table root).
        # Every lane of the packet carries the same ref; [0,0] stands in.
        stk[0] = rref[0, 0]
        stkm[0] = jnp.int32(0)

        def or_scalar(w):
            from jax.experimental.pallas import tpu as pltpu

            for sh in (64, 32, 16, 8, 4, 2, 1):
                w = w | pltpu.roll(w, sh, axis=1)
            sh = P // 2
            while sh:
                w = w | pltpu.roll(w, sh, axis=0)
                sh //= 2
            wscr[...] = w
            return wscr[0, 0]

        org = V3(ox[...], oy[...], oz[...])
        d = V3(dx[...], dy[...], dz[...])
        # Degenerate-direction guard covers subnormals, not just exact
        # zero: a subnormal component would make inv overflow to inf and
        # the FMA form below produce NaN (inf - inf / 0 * inf) slab
        # times, silently missing the box. Substituting +/-1e-20 caps
        # |inv| at 1e20, so org*inv stays finite for any sane scene.
        def _inv(c):
            tiny = jnp.abs(c) < 1e-18
            return 1.0 / jnp.where(tiny, jnp.where(c < 0, -1e-20, 1e-20), c)

        inv = V3(_inv(d.x), _inv(d.y), _inv(d.z))
        # Slab tests in FMA form: t = bound*inv - org*inv, with org*inv
        # hoisted per packet — one fused op per plane instead of
        # sub-then-mul (~96 fewer vector ops per super visit).
        oinv = V3(org.x * inv.x, org.y * inv.y, org.z * inv.z)
        tnear = tn[...]
        # Packet-representative direction signs for the ordered push:
        # lane (0,0) stands in for the packet (morton sort groups rays
        # by octant, so its signs match almost every lane). Scalar VMEM
        # reads at static indices are free.
        sx, sy, sz = dx[0, 0], dy[0, 0], dz[0, 0]

        N_KIDS = 32 if wide else 16

        def super_mask(srow):
            row_i = tab_ref[srow, :]
            rowf = jax.lax.bitcast_convert_type(row_i, jnp.float32)
            if wide:
                row_i2 = tab_ref[srow + 1, :]
                rowf2 = jax.lax.bitcast_convert_type(row_i2, jnp.float32)
            best = t_o[...]
            bits = jnp.zeros((P, 128), jnp.int32)
            for k in range(N_KIDS):
                rf = rowf if k < 16 else rowf2
                b = (k & 15) * 6
                t0x = rf[b + 0] * inv.x - oinv.x
                t1x = rf[b + 3] * inv.x - oinv.x
                t0y = rf[b + 1] * inv.y - oinv.y
                t1y = rf[b + 4] * inv.y - oinv.y
                t0z = rf[b + 2] * inv.z - oinv.z
                t1z = rf[b + 5] * inv.z - oinv.z
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tnear))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best))
                bits = bits | jnp.where(
                    t_in <= t_out,
                    jnp.int32(int(np.int32(np.uint32(1 << k)))), 0)
            return or_scalar(bits) & tab_ref[srow, 120]

        def child_sign(srow):
            # Children sit in the row sorted ascending by centroid
            # along tab[srow,121]; positive packet direction along that
            # axis means slot 0 is nearest.
            axis = tab_ref[srow, 121]
            return jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

        def visit_super(srow, keep_at):
            """Masked scheme: compute the hit-children mask and store it
            as ONE (row|rev<<30, mask) entry at keep_at. The mask is
            bit-reversed when the packet travels against the sort axis,
            so peeling ctz-first always visits near-to-far."""
            mask = super_mask(srow)
            sgn = child_sign(srow)
            rev = (sgn <= 0).astype(jnp.int32)
            rm = mask
            rm = ((rm & 0x5555) << 1) | ((rm >> 1) & 0x5555)
            rm = ((rm & 0x3333) << 2) | ((rm >> 2) & 0x3333)
            rm = ((rm & 0x0F0F) << 4) | ((rm >> 4) & 0x0F0F)
            rm = ((rm & 0x00FF) << 8) | ((rm >> 8) & 0x00FF)
            tmask = jnp.where(rev == 1, rm, mask)
            at = jnp.minimum(keep_at, stack_n - 1)
            stk[at] = srow | (rev << 30)
            stkm[at] = tmask
            spr[0] = jnp.minimum(
                keep_at + jnp.where(tmask != 0, 1, 0), stack_n - 1)

        def visit_super_legacy(srow, sp):
            mask = super_mask(srow)
            sgn = child_sign(srow)

            def push(ks):
                sp2 = sp
                for k in ks:
                    ref_k = tab_ref[srow + (k >> 4), 96 + (k & 15)]
                    stk[jnp.minimum(sp2, stack_n - 1)] = ref_k
                    sp2 = sp2 + ((mask >> k) & 1)
                # A full stack drops pushes rather than writing out of
                # bounds (a correct build never gets here; see stack_n).
                spr[0] = jnp.minimum(sp2, stack_n - 1)

            @pl.when(sgn > 0)
            def _():
                push(range(N_KIDS - 1, -1, -1))

            @pl.when(sgn <= 0)
            def _():
                push(range(N_KIDS))

        def visit_leaf(lrow):
            lrow_i = tab_ref[lrow, :]
            lrowf = jax.lax.bitcast_convert_type(lrow_i, jnp.float32)
            if wide:
                # Wide leaf groups are 24 prims across two rows (see
                # build_packet_table LEAF_CAP) — one visit, one commit.
                lrow_i2 = tab_ref[lrow + 1, :]
                lrowf2 = jax.lax.bitcast_convert_type(lrow_i2, jnp.float32)
            best_t = t_o[...]
            prim_b = prim_o[...]
            for j in range(LEAF_TRIS * (2 if wide else 1)):
                ri = lrow_i if j < LEAF_TRIS else lrow_i2
                rf = lrowf if j < LEAF_TRIS else lrowf2
                b = (j % LEAF_TRIS) * 9
                v0 = V3(rf[b + 0], rf[b + 1], rf[b + 2])
                e1 = V3(rf[b + 3], rf[b + 4], rf[b + 5])
                e2 = V3(rf[b + 6], rf[b + 7], rf[b + 8])
                pid = ri[108 + (j % LEAF_TRIS)]
                pvec = soa.cross(d, e2)
                det = soa.dot(e1, pvec)
                inv_det = jnp.where(
                    det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
                tvec = org - v0
                uu = soa.dot(tvec, pvec) * inv_det
                qvec = soa.cross(tvec, e1)
                vv = soa.dot(d, qvec) * inv_det
                tt = soa.dot(e2, qvec) * inv_det
                hit = ((det != 0) & (uu >= 0) & (vv >= 0)
                       & (uu + vv <= 1) & (tt >= tnear)
                       & (tt < best_t) & (pid >= 0))
                if n_tris is not None:
                    is_sph = pid >= n_tris
                    sv = org - v0
                    r = e1.x
                    a2 = soa.dot(d, d)
                    inv_a = 1.0 / jnp.where(a2 != 0, a2, 1.0)
                    tm = -soa.dot(d, sv) * inv_a
                    m = sv + d * tm
                    disc = r * r - soa.dot(m, m)
                    dtq = jnp.sqrt(jnp.maximum(disc, 0.0) * inv_a)
                    s0 = tm - dtq
                    s1 = tm + dtq
                    use_lo = (s0 >= tnear) & (s0 < best_t)
                    use_hi = (s1 >= tnear) & (s1 < best_t)
                    ts = jnp.where(use_lo, s0, s1)
                    hs = ((disc >= 0) & (a2 != 0) & (use_lo | use_hi)
                          & (pid >= 0))
                    tt = jnp.where(is_sph, ts, tt)
                    # No select on i1 vectors (Mosaic limitation)
                    hit = (is_sph & hs) | (~is_sph & hit)
                prim_b = jnp.where(hit, pid, prim_b)
                best_t = jnp.where(hit, tt, best_t)
            if any_hit:
                # A hit lane is done: collapse its interval so every
                # later box/tri test fails (t_in >= tnear > t_out) and
                # the lane stops inflating the packet's visit union.
                # Without this, one unoccluded lane keeps tfar at the
                # light distance for the whole walk and any-hit runs
                # SLOWER than closest-hit (no best-t shrinkage).
                best_t = jnp.where(prim_b >= 0, jnp.float32(-3e38), best_t)
            t_o[...] = best_t
            prim_o[...] = prim_b
            if any_hit:
                # Packet done once every live lane has a hit.
                pending = jnp.where(prim_b < 0, jnp.int32(1), 0)
                spr[0] = jnp.where(or_scalar(pending) == 0, 0, spr[0])

        def step(sp_c):
            """One visit; next stack pointer lands in spr[0]."""
            if not masked_push:
                sp = sp_c - 1
                node = stk[sp]
                is_super = node >= 0
                # Clamped for BOTH interpretations: an out-of-range
                # VMEM access can wedge the device. Wide supers also
                # read srow + 1, so their clamp leaves room for row B.
                srow = jnp.clip(jnp.where(is_super, node, 0), 0,
                                R - 2 if wide else R - 1)
                lrow = jnp.clip(
                    jnp.where(is_super, 0, ~node)
                    & ((1 << _CHAIN_SHIFT) - 1), 0,
                    R - 2 if wide else R - 1)
                spr[0] = sp

                @pl.when(is_super)
                def _():
                    visit_super_legacy(srow, sp)

                @pl.when(jnp.logical_not(is_super))
                def _():
                    visit_leaf(lrow)
                return

            # Masked scheme. Top-of-stack entry e, pending mask m:
            #   A: e <  0          -> leaf entry: visit it, pop.
            #   B: e >= 0, m == 0  -> unvisited super (root/entry ref):
            #      compute its mask in place at sp.
            #   C: e >= 0, m != 0  -> peel one child near-first; a leaf
            #      child is visited in this same step, a super child
            #      gets its first visit at the (possibly reused) top.
            # Every step visits exactly one node, so visit counts and
            # the iteration ceiling match the legacy scheme.
            sp = sp_c - 1
            e = stk[sp]
            m = stkm[sp]
            case_a = e < 0
            case_c = (e >= 0) & (m != 0)
            # Peel lowest set bit of m (slot order already near-first).
            iso = m & (0 - m)
            m2 = m & (m - 1)
            k = (jnp.where((iso & 0xAAAA) != 0, 1, 0)
                 | jnp.where((iso & 0xCCCC) != 0, 2, 0)
                 | jnp.where((iso & 0xF0F0) != 0, 4, 0)
                 | jnp.where((iso & 0xFF00) != 0, 8, 0))
            rev = (e >> 30) & 1
            slot = jnp.where(rev == 1, 15 - k, k)
            erow = jnp.clip(e & ((1 << _CHAIN_SHIFT) - 1), 0, R - 1)
            # Child ref lives at lane 96+slot of the parent's table row.
            # Mosaic cannot index the lane dim dynamically, so extract
            # it with a masked or-reduce over the row (~9 vector ops on
            # (1,128) — noise next to the 16 slab tests it feeds). An
            # SMEM mirror of table[:, 96:112] was tried first: SMEM
            # windows lane-pad 16 -> 128, blowing the 1 MiB budget 8x
            # on sponza-sized tables.
            erowv = tab_ref[erow, :].reshape(1, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            sel = jnp.where(lane == 96 + slot, erowv, 0)
            for sh in (64, 32, 16, 8, 4, 2, 1):
                sel = sel | pltpu.roll(sel, sh, axis=1)
            wscr[0:1, :] = sel
            child = wscr[0, 0]
            # After a peel the parent keeps its slot only while bits
            # remain; the freed slot is reused for a super child.
            base = sp + jnp.where(m2 != 0, 1, 0)
            node = jnp.where(case_c, child, e)
            is_leaf = node < 0
            lrow = jnp.clip(jnp.where(is_leaf, ~node, 0)
                            & ((1 << _CHAIN_SHIFT) - 1), 0, R - 1)
            srow = jnp.clip(jnp.where(is_leaf, 0, node)
                            & ((1 << _CHAIN_SHIFT) - 1), 0, R - 1)
            keep_at = jnp.where(case_c, base, sp)

            @pl.when(case_c)
            def _():
                stkm[sp] = m2

            @pl.when(is_leaf)
            def _():
                # case A pops; case C's leaf child leaves base entries.
                spr[0] = jnp.where(case_a, sp, base)
                visit_leaf(lrow)

            @pl.when(jnp.logical_not(is_leaf))
            def _():
                visit_super(srow, keep_at)

        def body(carry):
            it, sp = carry
            spr[0] = sp

            @pl.when(sp > 0)
            def _():
                step(sp)

            for _ in range(_VISITS_PER_ITER - 1):
                sp1 = spr[0]

                @pl.when(sp1 > 0)
                def _(sp1=sp1):
                    step(sp1)

            return (it + _VISITS_PER_ITER, spr[0])

        def cond(carry):
            return (carry[1] > 0) & (carry[0] < ceiling)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

    return kernel


def _make_kernel_dual(stack_n, n_tris, any_hit, ceiling, n_rows):
    """TWO independent packets per grid step, one visit each per while
    iteration, with the two visit bodies emitted INTERLEAVED in one
    straight-line block so the scalar row loads of one packet overlap
    the vector slab/intersect math of the other.

    Motivation (tools/visit_microbench.py on the real table): the solo
    super body costs +0.74 us/visit over the bare loop, but two
    interleaved super bodies cost +0.37 each (super2 mode); leaf pairs
    0.25 -> 0.18; mixed pairs ~-10%. The solo kernel is latency-bound
    on the serialized scalar-load -> vector-broadcast chain per child;
    a second independent packet fills the stalls.

    MEASURED SLOWER on TPU v5e (tools/ab_dual_kernel.py, disney
    steady-state pool rays, 2026-08-19): dual 2.20 vs solo 2.56
    Mrays/s (-14%); harvested bounce 3.48 vs 3.90; shadow any-hit tie
    (20.0 vs 20.1). The microbench win did not survive the full
    kernel: the two packets' pops desynchronize (one drains or goes
    leaf-heavy while the other walks supers), so most iterations pay
    the fused four-way dispatch for one packet's progress. Kept as a
    documented negative result / opt-in A/B knob (GDPT_PACKET_DUAL=1),
    correctness-locked by tests/test_packet.py::test_dual_kernel.

    Implementation notes:
    - Ray block is (2*PACKET_ROWS, 128): packet A = rows [0, P), packet
      B = rows [P, 2P). Each packet keeps its own SMEM stack and stack
      pointer (spr[0]/spr[1]); the while loop runs until BOTH drain.
    - Each iteration pops one node per live packet and dispatches ONE
      of four fused bodies (super+super / super+leaf / leaf+super /
      leaf+leaf). An idle or drained packet is typed as a zero-commit
      "super" visiting row 0: the body runs (cost is hidden under the
      live packet's work) but its mask is discarded and its stack
      untouched.
    - Legacy ordered-push scheme only (the masked-stack variant is a
      documented negative result; pairing it is not worth the code).
    """

    def kernel(tab_ref, ox, oy, oz, dx, dy, dz, tn, tf, rref,
               t_o, prim_o, wscrA, wscrB, stkA, stkB, spr):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        P = PACKET_ROWS
        R = n_rows
        t_o[...] = tf[...]
        prim_o[...] = jnp.full((2 * P, 128), -1, jnp.int32)
        if any_hit:
            prim_o[...] = jnp.where(tn[...] > tf[...], 0, prim_o[...])
        stkA[0] = rref[0, 0]
        stkB[0] = rref[P, 0]

        def or_scalar(w, wscr):
            for sh in (64, 32, 16, 8, 4, 2, 1):
                w = w | pltpu.roll(w, sh, axis=1)
            sh = P // 2
            while sh:
                w = w | pltpu.roll(w, sh, axis=0)
                sh //= 2
            wscr[...] = w
            return wscr[0, 0]

        def _inv(c):
            tiny = jnp.abs(c) < 1e-18
            return 1.0 / jnp.where(tiny, jnp.where(c < 0, -1e-20, 1e-20), c)

        class Ctx:
            pass

        def mk_ctx(r0, wscr, stk, spr_i):
            c = Ctx()
            c.sl = slice(r0, r0 + P)
            c.org = V3(ox[c.sl, :], oy[c.sl, :], oz[c.sl, :])
            c.d = V3(dx[c.sl, :], dy[c.sl, :], dz[c.sl, :])
            c.inv = V3(_inv(c.d.x), _inv(c.d.y), _inv(c.d.z))
            c.oinv = V3(c.org.x * c.inv.x, c.org.y * c.inv.y,
                        c.org.z * c.inv.z)
            c.tnear = tn[c.sl, :]
            c.sx, c.sy, c.sz = dx[r0, 0], dy[r0, 0], dz[r0, 0]
            c.wscr = wscr
            c.stk = stk
            c.spr_i = spr_i
            return c

        A = mk_ctx(0, wscrA, stkA, 0)
        B = mk_ctx(P, wscrB, stkB, 1)

        def super_steps(c, rowf):
            """Generator of per-child op bundles for one super body;
            yields after each child so two bodies can be zipped."""
            best = t_o[c.sl, :]
            bits = jnp.zeros((P, 128), jnp.int32)
            for k in range(16):
                b = k * 6
                t0x = rowf[b + 0] * c.inv.x - c.oinv.x
                t1x = rowf[b + 3] * c.inv.x - c.oinv.x
                t0y = rowf[b + 1] * c.inv.y - c.oinv.y
                t1y = rowf[b + 4] * c.inv.y - c.oinv.y
                t0z = rowf[b + 2] * c.inv.z - c.oinv.z
                t1z = rowf[b + 5] * c.inv.z - c.oinv.z
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), c.tnear))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best))
                bits = bits | jnp.where(t_in <= t_out,
                                        jnp.int32(1 << k), 0)
                yield None
            c.bits = bits
            yield None

        def leaf_steps(c, lrow_i, lrowf, com):
            """Generator of per-tri op bundles for one leaf body. com:
            scalar 0/1 commit (idle packets keep their buffers)."""
            best_t = t_o[c.sl, :]
            prim_b = prim_o[c.sl, :]
            commit = com != 0
            for j in range(LEAF_TRIS):
                b = j * 9
                v0 = V3(lrowf[b + 0], lrowf[b + 1], lrowf[b + 2])
                e1 = V3(lrowf[b + 3], lrowf[b + 4], lrowf[b + 5])
                e2 = V3(lrowf[b + 6], lrowf[b + 7], lrowf[b + 8])
                pid = lrow_i[108 + j]
                pvec = soa.cross(c.d, e2)
                det = soa.dot(e1, pvec)
                inv_det = jnp.where(
                    det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
                tvec = c.org - v0
                uu = soa.dot(tvec, pvec) * inv_det
                qvec = soa.cross(tvec, e1)
                vv = soa.dot(c.d, qvec) * inv_det
                tt = soa.dot(e2, qvec) * inv_det
                hit = ((det != 0) & (uu >= 0) & (vv >= 0)
                       & (uu + vv <= 1) & (tt >= c.tnear)
                       & (tt < best_t) & (pid >= 0))
                if n_tris is not None:
                    is_sph = pid >= n_tris
                    sv = c.org - v0
                    r = e1.x
                    a2 = soa.dot(c.d, c.d)
                    inv_a = 1.0 / jnp.where(a2 != 0, a2, 1.0)
                    tm = -soa.dot(c.d, sv) * inv_a
                    mm = sv + c.d * tm
                    disc = r * r - soa.dot(mm, mm)
                    dtq = jnp.sqrt(jnp.maximum(disc, 0.0) * inv_a)
                    s0 = tm - dtq
                    s1 = tm + dtq
                    use_lo = (s0 >= c.tnear) & (s0 < best_t)
                    use_hi = (s1 >= c.tnear) & (s1 < best_t)
                    ts = jnp.where(use_lo, s0, s1)
                    hs = ((disc >= 0) & (a2 != 0) & (use_lo | use_hi)
                          & (pid >= 0))
                    tt = jnp.where(is_sph, ts, tt)
                    hit = (is_sph & hs) | (~is_sph & hit)
                hit = hit & commit
                prim_b = jnp.where(hit, pid, prim_b)
                best_t = jnp.where(hit, tt, best_t)
                yield None
            if any_hit:
                # Collapse hit lanes' intervals (idempotent; see the
                # solo kernel's visit_leaf note).
                best_t = jnp.where(prim_b >= 0, jnp.float32(-3e38), best_t)
            t_o[c.sl, :] = best_t
            prim_o[c.sl, :] = prim_b
            if any_hit:
                pending = jnp.where(prim_b < 0, jnp.int32(1), 0)
                done = or_scalar(pending, c.wscr) == 0

                @pl.when(commit & done)
                def _():
                    spr[c.spr_i] = 0
            yield None

        def drain(*gens):
            # Round-robin the generators so the emitted instruction
            # streams interleave (the whole point of the dual kernel).
            gens = list(gens)
            while gens:
                gens = [g for g in gens if next(g, StopIteration)
                        is not StopIteration]

        def push_super(c, srow, sp, com):
            """Ordered child push, gated on commit. sp = stack top after
            the pop; idle packets leave spr[c.spr_i] untouched (it was
            pre-set to their unchanged sp)."""
            mask = or_scalar(c.bits, c.wscr) & tab_ref[srow, 120]
            axis = tab_ref[srow, 121]
            sgn = jnp.where(axis == 0, c.sx,
                            jnp.where(axis == 1, c.sy, c.sz))

            def push(ks):
                sp2 = sp
                for k in ks:
                    ref_k = tab_ref[srow, 96 + k]
                    c.stk[jnp.minimum(sp2, stack_n - 1)] = ref_k
                    sp2 = sp2 + ((mask >> k) & 1)
                spr[c.spr_i] = jnp.minimum(sp2, stack_n - 1)

            @pl.when((com != 0) & (sgn > 0))
            def _():
                push(range(15, -1, -1))

            @pl.when((com != 0) & (sgn <= 0))
            def _():
                push(range(16))

        def side_state(c, sp):
            act = sp > 0
            pop = jnp.maximum(sp - 1, 0)
            node = c.stk[pop]
            is_super = node >= 0
            as_super = jnp.logical_or(is_super, jnp.logical_not(act))
            com_s = jnp.where(act & is_super, jnp.int32(1), 0)
            srow = jnp.clip(jnp.where(as_super & (node >= 0), node, 0),
                            0, R - 1)
            lrow = jnp.clip(jnp.where(is_super, 0, ~node)
                            & ((1 << _CHAIN_SHIFT) - 1), 0, R - 1)
            base = jnp.where(act, sp - 1, sp)
            return act, as_super, com_s, srow, lrow, base

        def body(carry):
            it, spA, spB = carry
            actA, supA, comA, srowA, lrowA, baseA = side_state(A, spA)
            actB, supB, comB, srowB, lrowB, baseB = side_state(B, spB)
            # Default next-sp = post-pop; pushes/any-hit-done overwrite.
            spr[0] = baseA
            spr[1] = baseB

            @pl.when(supA & supB)
            def _():
                rA = jax.lax.bitcast_convert_type(
                    tab_ref[srowA, :], jnp.float32)
                rB = jax.lax.bitcast_convert_type(
                    tab_ref[srowB, :], jnp.float32)
                drain(super_steps(A, rA), super_steps(B, rB))
                push_super(A, srowA, baseA, comA)
                push_super(B, srowB, baseB, comB)

            @pl.when(supA & jnp.logical_not(supB))
            def _():
                rA = jax.lax.bitcast_convert_type(
                    tab_ref[srowA, :], jnp.float32)
                liB = tab_ref[lrowB, :]
                lfB = jax.lax.bitcast_convert_type(liB, jnp.float32)
                drain(super_steps(A, rA),
                      leaf_steps(B, liB, lfB, jnp.int32(1)))
                push_super(A, srowA, baseA, comA)

            @pl.when(jnp.logical_not(supA) & supB)
            def _():
                liA = tab_ref[lrowA, :]
                lfA = jax.lax.bitcast_convert_type(liA, jnp.float32)
                rB = jax.lax.bitcast_convert_type(
                    tab_ref[srowB, :], jnp.float32)
                drain(leaf_steps(A, liA, lfA, jnp.int32(1)),
                      super_steps(B, rB))
                push_super(B, srowB, baseB, comB)

            @pl.when(jnp.logical_not(supA) & jnp.logical_not(supB))
            def _():
                liA = tab_ref[lrowA, :]
                lfA = jax.lax.bitcast_convert_type(liA, jnp.float32)
                liB = tab_ref[lrowB, :]
                lfB = jax.lax.bitcast_convert_type(liB, jnp.float32)
                drain(leaf_steps(A, liA, lfA, jnp.int32(1)),
                      leaf_steps(B, liB, lfB, jnp.int32(1)))

            return (it + 1, spr[0], spr[1])

        def cond(carry):
            return ((carry[1] > 0) | (carry[2] > 0)) & (carry[0] < ceiling)

        jax.lax.while_loop(cond, body,
                           (jnp.int32(0), jnp.int32(1), jnp.int32(1)))

    return kernel


@functools.partial(jax.jit, static_argnames=("n_tris", "any_hit",
                                             "interpret", "masked_push",
                                             "dual"))
def _trace_packets(tab: PacketTable, ox, oy, oz, dx, dy, dz, tn, tf,
                   rref=None, n_tris=None, any_hit=False, interpret=False,
                   masked_push=None, dual=None):
    """Inputs shaped (M, 128); M a multiple of PACKET_ROWS. rref: per-lane
    traversal-root refs, uniform within each packet (None = table root).
    Returns (t, prim) only — see _make_kernel."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = ox.shape[0]
    P = PACKET_ROWS
    R = int(tab.table.shape[0])
    stack_n = int(tab.stack_dummy.shape[0])
    ceiling = _DEBUG_CEILING if _DEBUG_CEILING else 4 * R + 64
    if masked_push is None:
        masked_push = MASKED_STACK
    if dual is None:
        dual = DUAL_PACKET
    wide = tab.wide_dummy is not None
    if wide:
        # The masked peel is 16-bit and the dual kernel 16-wide only;
        # a wide table always takes the legacy ordered-push solo kernel.
        masked_push = False
        dual = False
    if rref is None:
        rref = jnp.zeros((M, 128), jnp.int32)
    # Mosaic's default scoped-VMEM budget is 16 MiB; big-scene tables
    # (e.g. disney_bsdf_array: 108k rows = 53 MiB) are still far under
    # the v5e 128 MiB VMEM, so raise the per-kernel limit to the table
    # plus headroom for ray blocks/outputs/scratch.
    vmem_limit = min(int(tab.table.nbytes) + (8 << 20), 120 << 20)
    if dual and not masked_push:
        # Dual-packet grid: blocks of 2 packets; odd packet counts get
        # one packet of dead padding (tf = -1 < tn exits at the root).
        if (M // P) % 2 == 1:
            padr = [(0, P), (0, 0)]
            ox, oy, oz = (jnp.pad(a, padr) for a in (ox, oy, oz))
            dx = jnp.pad(dx, padr, constant_values=1.0)
            dy, dz, tn = (jnp.pad(a, padr) for a in (dy, dz, tn))
            tf = jnp.pad(tf, padr, constant_values=-1.0)
            rref = jnp.pad(rref, padr)
        M2 = ox.shape[0]
        grid = (M2 // (2 * P),)
        ray_spec = pl.BlockSpec((2 * P, 128), lambda g: (g, 0))
        kern = _make_kernel_dual(stack_n, n_tris, any_hit, ceiling, R)
        out_shape = [jax.ShapeDtypeStruct((M2, 128), jnp.float32),
                     jax.ShapeDtypeStruct((M2, 128), jnp.int32)]
        f = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [ray_spec] * 9,
            out_specs=[ray_spec] * 2,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(vmem_limit, 32 << 20)),
            scratch_shapes=[
                pltpu.VMEM((P, 128), jnp.int32),
                pltpu.VMEM((P, 128), jnp.int32),
                pltpu.SMEM((stack_n,), jnp.int32),
                pltpu.SMEM((stack_n,), jnp.int32),
                pltpu.SMEM((2,), jnp.int32),
            ],
            interpret=interpret,
        )
        t, prim = f(tab.table, ox, oy, oz, dx, dy, dz, tn, tf, rref)
        return t[:M], prim[:M]
    grid = (M // P,)
    ray_spec = pl.BlockSpec((P, 128), lambda g: (g, 0))
    kern = _make_kernel(stack_n, n_tris, any_hit, ceiling, R,
                        masked_push=masked_push, wide=wide)
    out_shape = [jax.ShapeDtypeStruct((M, 128), jnp.float32),
                 jax.ShapeDtypeStruct((M, 128), jnp.int32)]
    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 9,
        out_specs=[ray_spec] * 2,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem_limit, 32 << 20)),
        scratch_shapes=[
            pltpu.VMEM((P, 128), jnp.int32),
            pltpu.SMEM((stack_n,), jnp.int32),
            pltpu.SMEM((stack_n,), jnp.int32),  # pending child masks
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )
    return f(tab.table, ox, oy, oz, dx, dy, dz, tn, tf, rref)


def _pack(v, M):
    n = v.shape[0]
    pad = M * 128 - n
    return jnp.pad(v, (0, pad)).reshape(M, 128)


def _morton_keys(tab, org: V3, d: V3, hint=None):
    """Packet-coherence sort key: direction octant (3 high bits) then a
    6-bit-per-axis interleaved morton code of the origin in scene-bbox
    space. Bounce batches arrive shuffled; grouping rays that start
    near each other and head the same way shrinks each packet's
    node-visit union (measured 8x on incoherent sponza rays).

    hint: optional per-lane int32 in [0, 63] placed ABOVE the octant
    bits. Wavefront pools mix bounce depths; grouping same-depth rays
    first cuts visits/packet another ~12% on disney pool rays
    (round5_evidence/visits_analyze.txt: 494 -> 436 visits/packet)."""
    lo = tab.bbox[:3]
    ext = jnp.maximum(tab.bbox[3:] - lo, 1e-6)

    def q6(x, i):
        v = jnp.clip((x - lo[i]) / ext[i], 0.0, 0.999) * 64.0
        return v.astype(jnp.int32)

    def spread(v):
        v = (v | (v << 8)) & 0x0300F
        v = (v | (v << 4)) & 0x030C3
        v = (v | (v << 2)) & 0x09249
        return v

    mort = (spread(q6(org.x, 0)) | (spread(q6(org.y, 1)) << 1)
            | (spread(q6(org.z, 2)) << 2))
    octant = ((d.x < 0).astype(jnp.int32)
              | ((d.y < 0).astype(jnp.int32) << 1)
              | ((d.z < 0).astype(jnp.int32) << 2))
    key = (octant << 18) | mort
    if hint is not None:
        key = key | (jnp.clip(hint.astype(jnp.int32), 0, 63) << 21)
    return key


def trace_packet_soa(tab: PacketTable, org: V3, d: V3, tnear, tfar,
                     n_tris=None, any_hit=False, interpret=None,
                     sort_rays=True, masked_push=None, sort_hint=None):
    """Flat-ray entry: (t, prim, u, v, gn V3) over n rays.

    Pads the ray list to whole packets; padding lanes get tfar < tnear
    so they can neither hit nor (in any_hit mode) keep packets alive.
    When sort_rays is set, rays are morton/octant-sorted into coherent
    packets and results unsorted on the way out.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.x.shape[0]
    P = PACKET_ROWS
    M = -(-n // (P * 128)) * P
    # Scrub non-finite inputs: integrators legitimately pass masked-off
    # lanes with garbage origins/directions, and non-finite values must
    # never steer the in-kernel scalar control flow. A lane with any
    # non-finite ray datum becomes a dead lane (tfar < tnear).
    tnear = jnp.broadcast_to(jnp.asarray(tnear, REAL), (n,))
    tfar = jnp.broadcast_to(jnp.asarray(tfar, REAL), (n,))
    fin = (jnp.isfinite(org.x) & jnp.isfinite(org.y) & jnp.isfinite(org.z)
           & jnp.isfinite(d.x) & jnp.isfinite(d.y) & jnp.isfinite(d.z)
           & jnp.isfinite(tnear))

    def _fin(v, alt):
        return jnp.where(jnp.isfinite(v), v, jnp.asarray(alt, v.dtype))

    org = V3(_fin(org.x, 0.0), _fin(org.y, 0.0), _fin(org.z, 0.0))
    d = V3(_fin(d.x, 1.0), _fin(d.y, 0.0), _fin(d.z, 0.0))
    tnear = _fin(tnear, 0.0)
    tfar = jnp.where(fin, jnp.clip(_fin(tfar, 3e37), -1.0, 3e37), -1.0)
    alive = tfar >= tnear
    org0, d0 = org, d  # original order, for the hit-attribute recompute
    inv_perm = None
    # A/B knob: GDPT_PACKET_SORT=0 disables the per-dispatch morton/
    # octant argsort — on hardware the sort is ~60-70 ms per 1M rays
    # per bounce, a candidate overhead when the caller's lane order is
    # already near-coherent (wavefront pools). PROCESS-LEVEL ONLY: the
    # env is read at jit trace time and is not part of the jit cache
    # key, so toggling it mid-process silently reuses the first trace —
    # A/B runs must use separate processes.
    if os.environ.get("GDPT_PACKET_SORT", "1") == "0":
        sort_rays = False
    if sort_rays and n > 128:
        keys = _morton_keys(tab, org, d, hint=sort_hint)
        # Dead lanes sort to the back so they pack into all-dead
        # packets (which exit after one root visit).
        keys = jnp.where(alive, keys, jnp.int32(2**30))
        perm = jnp.argsort(keys)
        # Invert by scatter (O(n)) — a second argsort doubles the sort
        # cost, which is ~25% of a traversal call at 1M rays.
        inv_perm = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        take = lambda v: jnp.take(v, perm, axis=0)
        org = V3(take(org.x), take(org.y), take(org.z))
        d = V3(take(d.x), take(d.y), take(d.z))
        tnear = take(tnear)
        tfar = take(tfar)
    args = [_pack(v, M) for v in
            (org.x, org.y, org.z, d.x, d.y, d.z, tnear)]
    # Padding tfar = -1 < tnear(=0 pad) marks dead lanes.
    tf = jnp.full((M * 128,), -1.0, REAL).at[:n].set(tfar).reshape(M, 128)
    t, prim = _trace_packets(
        tab, *args, tf, n_tris=n_tris, any_hit=any_hit, interpret=interpret,
        masked_push=masked_push)

    def unflat(a):
        x = a.reshape(-1)[:n]
        return jnp.take(x, inv_perm, axis=0) if inv_perm is not None else x

    # Dead lanes are marked "hit" in-kernel (any_hit early-exit); they
    # are misses to the caller.
    t_out = unflat(t)
    prim_out = jnp.where(alive, unflat(prim), -1)
    if any_hit:
        zero = jnp.zeros(n, REAL)
        return t_out, prim_out, zero, zero, V3(zero, zero, 1.0 + zero)
    return (t_out, prim_out) + _hit_attribs(
        tab, org0, d0, t_out, prim_out, n_tris)


def _entry_dispatch(tab: PacketTable, org: V3, d: V3, tnear, tfar,
                    entry_id, mort, n_tris, any_hit, interpret):
    """One grouped packet dispatch of the two-phase traversal.

    entry_id (n,) int32 in [0, K1]: index into tab.entry_ref, or K1
    (== entry count) meaning "no work this round". Rays are counting-
    scattered into packet-aligned per-entry groups (morton-ordered
    within a group) so every packet traverses exactly one subtree; pad
    and no-work lanes are dead (tfar < tnear). Returns (t, prim) in the
    input order, prim = -1 where no dispatch happened.
    """
    n = org.x.shape[0]
    K1 = int(tab.entry_ref.shape[0])
    G = K1 + 1                                # + trailing dead group
    Q = PACKET_ROWS * 128
    key = entry_id * jnp.int32(1 << 22) | (mort & jnp.int32((1 << 22) - 1))
    order = jnp.argsort(key)
    sorted_e = jnp.take(entry_id, order)
    counts = jnp.zeros(G, INT).at[entry_id].add(1)
    padded = -(-counts // Q) * Q
    pstart = jnp.concatenate([jnp.zeros(1, INT), jnp.cumsum(padded)])
    gstart = jnp.concatenate([jnp.zeros(1, INT), jnp.cumsum(counts)])
    pos = (jnp.take(pstart[:G], sorted_e)
           + (jnp.arange(n, dtype=INT) - jnp.take(gstart[:G], sorted_e)))
    m_lanes = (-(-n // Q)) * Q + G * Q        # static worst-case padding
    m_rows = m_lanes // 128

    live = entry_id < K1

    def scat(v, fill):
        out = jnp.full(m_lanes, fill, v.dtype)
        return out.at[pos].set(jnp.take(v, order)).reshape(m_rows, 128)

    ox, oy, oz = scat(org.x, 0.0), scat(org.y, 0.0), scat(org.z, 0.0)
    dx, dy, dz = scat(d.x, 1.0), scat(d.y, 0.0), scat(d.z, 0.0)
    tn2 = scat(tnear, 0.0)
    tf2 = scat(jnp.where(live, tfar, -1.0), -1.0)
    # Per-lane subtree ref: the padded group layout makes this uniform
    # within each packet (group starts are packet-aligned).
    lane_entry = (jnp.searchsorted(pstart, jnp.arange(m_lanes, dtype=INT),
                                   side="right") - 1)
    rref = jnp.take(tab.entry_ref, jnp.clip(lane_entry, 0, K1 - 1),
                    mode="clip").reshape(m_rows, 128)
    t2, p2 = _trace_packets(tab, ox, oy, oz, dx, dy, dz, tn2, tf2, rref,
                            n_tris=n_tris, any_hit=any_hit,
                            interpret=interpret)
    t_flat, p_flat = t2.reshape(-1), p2.reshape(-1)
    t_out = jnp.zeros(n, REAL).at[order].set(jnp.take(t_flat, pos))
    p_out = jnp.zeros(n, INT).at[order].set(jnp.take(p_flat, pos))
    return t_out, jnp.where(live, p_out, -1)


def trace_two_phase(tab: PacketTable, org: V3, d: V3, tnear, tfar,
                    n_tris=None, any_hit=False, interpret=None,
                    entry_iters=3):
    """Two-phase entry-point traversal: flat-ray entry, same contract as
    trace_packet_soa.

    Incoherent packets through the whole tree visit ~13x more nodes
    than any single ray needs (the packet's visit union). Phase 1 slab-
    tests every ray against the ~K entry-subtree boxes densely in XLA
    (no gathers) and ranks the hits near-to-far. Phase 2 runs
    entry_iters grouped dispatches — every packet walks ONE subtree,
    near entries first, tfar tightened to the running best — so the
    union waste is confined to a ~(rows/K)-row subtree. A final root
    dispatch with the tightened tfar covers rays that crossed more than
    entry_iters entry boxes (correctness sentinel, rare).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.x.shape[0]
    K1 = int(tab.entry_ref.shape[0])
    K = K1 - 1                                # real entries (last = root)
    tnear = jnp.broadcast_to(jnp.asarray(tnear, REAL), (n,))
    tfar = jnp.broadcast_to(jnp.asarray(tfar, REAL), (n,))
    fin = (jnp.isfinite(org.x) & jnp.isfinite(org.y) & jnp.isfinite(org.z)
           & jnp.isfinite(d.x) & jnp.isfinite(d.y) & jnp.isfinite(d.z)
           & jnp.isfinite(tnear))

    def _fin(v, alt):
        return jnp.where(jnp.isfinite(v), v, jnp.asarray(alt, v.dtype))

    org = V3(_fin(org.x, 0.0), _fin(org.y, 0.0), _fin(org.z, 0.0))
    d = V3(_fin(d.x, 1.0), _fin(d.y, 0.0), _fin(d.z, 0.0))
    tnear = _fin(tnear, 0.0)
    tfar = jnp.where(fin, jnp.clip(_fin(tfar, 3e37), -1.0, 3e37), -1.0)
    alive = tfar >= tnear
    org0, d0 = org, d

    # ---- phase 1: dense (n, K) entry culling ----
    eb = tab.entry_bbox
    inv = V3(1.0 / jnp.where(d.x == 0, 1e-20, d.x),
             1.0 / jnp.where(d.y == 0, 1e-20, d.y),
             1.0 / jnp.where(d.z == 0, 1e-20, d.z))

    def slab(lo_c, hi_c, o_c, i_c):
        a = (lo_c[None, :] - o_c[:, None]) * i_c[:, None]
        b = (hi_c[None, :] - o_c[:, None]) * i_c[:, None]
        return jnp.minimum(a, b), jnp.maximum(a, b)

    ax, bx = slab(eb[:K, 0], eb[:K, 3], org.x, inv.x)
    ay, by = slab(eb[:K, 1], eb[:K, 4], org.y, inv.y)
    az, bz = slab(eb[:K, 2], eb[:K, 5], org.z, inv.z)
    t_in = jnp.maximum(jnp.maximum(ax, ay),
                       jnp.maximum(az, tnear[:, None]))
    t_out = jnp.minimum(jnp.minimum(bx, by),
                        jnp.minimum(bz, tfar[:, None]))
    hitk = t_in <= t_out
    BIGF = jnp.float32(3e38)
    keyk = jnp.where(hitk, t_in, BIGF)
    tk = min(entry_iters, K)
    neg, idx = jax.lax.top_k(-keyk, tk)
    tins = -neg                                # (n, tk) nearest-first
    overflow = jnp.sum(hitk, axis=1) > tk
    mort = _morton_keys(tab, org, d)

    DEAD = jnp.int32(K1)
    best_t = tfar
    best_p = jnp.full(n, -1, INT)
    done = ~alive
    for e in range(tk):
        ok = (~done) & (tins[:, e] < best_t) & (tins[:, e] < BIGF)
        eid = jnp.where(ok, idx[:, e].astype(INT), DEAD)
        t_e, p_e = _entry_dispatch(tab, org, d, tnear, best_t, eid, mort,
                                   n_tris, any_hit, interpret)
        imp = (p_e >= 0) & ok
        if not any_hit:
            imp = imp & (t_e < best_t)
            best_t = jnp.where(imp, t_e, best_t)
        best_p = jnp.where(imp, p_e, best_p)
        if any_hit:
            done = done | imp

    # ---- cleanup: rays that crossed > tk entries walk the full tree
    # with the tightened tfar ----
    pend = (~done) & overflow
    eid = jnp.where(pend, jnp.int32(K), DEAD)
    t_e, p_e = _entry_dispatch(tab, org, d, tnear, best_t, eid, mort,
                               n_tris, any_hit, interpret)
    imp = (p_e >= 0) & pend
    if not any_hit:
        imp = imp & (t_e < best_t)
        best_t = jnp.where(imp, t_e, best_t)
    best_p = jnp.where(imp, p_e, best_p)

    prim_out = jnp.where(alive, best_p, -1)
    if any_hit:
        zero = jnp.zeros(n, REAL)
        return best_t, prim_out, zero, zero, V3(zero, zero, 1.0 + zero)
    return (best_t, prim_out) + _hit_attribs(
        tab, org0, d0, best_t, prim_out, n_tris)


def _hit_attribs(tab: PacketTable, org: V3, d: V3, t, prim, n_tris):
    """Recompute (u, v, unnormalized geometric normal) for the winning
    primitive with one XLA gather of its geometry row. Cheaper than
    carrying five more VMEM read-modify-writes through the kernel's
    leaf loop: one gather per *ray* instead of five writes per *leaf
    visit*."""
    pr = jnp.maximum(prim, 0)
    row = jnp.take(tab.geo9, pr, axis=0, mode="clip")
    v0 = V3(row[:, 0], row[:, 1], row[:, 2])
    e1 = V3(row[:, 3], row[:, 4], row[:, 5])
    e2 = V3(row[:, 6], row[:, 7], row[:, 8])
    pvec = soa.cross(d, e2)
    det = soa.dot(e1, pvec)
    inv_det = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
    tvec = org - v0
    u = soa.dot(tvec, pvec) * inv_det
    qvec = soa.cross(tvec, e1)
    v = soa.dot(d, qvec) * inv_det
    gn = soa.cross(e1, e2)
    zero = jnp.zeros_like(u)
    if n_tris is not None:
        is_sph = pr >= n_tris
        gns = (org + d * t) - v0  # v0 = sphere center
        u = jnp.where(is_sph, 0.0, u)
        v = jnp.where(is_sph, 0.0, v)
        gn = soa.where(is_sph, gns, gn)
    miss = prim < 0
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    gn = soa.where(miss, V3(zero, zero, 1.0 + zero), gn)
    return u, v, gn


def _two_phase_on(n):
    """Two-phase entry traversal is opt-in (GDPT_TWO_PHASE=1).

    Measured on sponza (v5e, 1M rays): correct (hitmask/prim/t match
    single-phase exactly) but 3-8x slower — incoherent interior rays
    cross more than entry_iters of the ~K entry boxes, so most lanes
    fall through to the root cleanup walk and the 4 extra dispatches +
    per-dispatch sort/scatter are pure overhead. Kept for coherent
    primary-ray workloads and table-over-VMEM scenes where subtree
    residency matters more than dispatch count."""
    flag = os.environ.get("GDPT_TWO_PHASE", "0")
    if flag == "1":
        return n >= 4 * PACKET_ROWS * 128
    return False


def intersect_packet(tab: PacketTable, org: V3, d: V3, tnear, tfar,
                     n_tris=None, interpret=None, sort_rays=True,
                     masked_push=None, sort_hint=None):
    if tab.entry_ref is not None and _two_phase_on(org.x.shape[0]):
        return trace_two_phase(tab, org, d, tnear, tfar, n_tris=n_tris,
                               any_hit=False, interpret=interpret)
    return trace_packet_soa(tab, org, d, tnear, tfar, n_tris=n_tris,
                            any_hit=False, interpret=interpret,
                            sort_rays=sort_rays, masked_push=masked_push,
                            sort_hint=sort_hint)


def occluded_packet(tab: PacketTable, org: V3, d: V3, tnear, tfar,
                    n_tris=None, interpret=None, masked_push=None):
    if tab.entry_ref is not None and _two_phase_on(org.x.shape[0]):
        t, prim, _, _, _ = trace_two_phase(
            tab, org, d, tnear, tfar, n_tris=n_tris, any_hit=True,
            interpret=interpret)
        return prim >= 0
    t, prim, _, _, _ = trace_packet_soa(
        tab, org, d, tnear, tfar, n_tris=n_tris, any_hit=True,
        interpret=interpret, masked_push=masked_push)
    return prim >= 0
