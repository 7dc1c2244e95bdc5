"""16-wide supernode BVH — the TPU big-scene traversal backend.

Replaces Embree's rtcIntersect1/rtcOccluded1 for large meshes
(reference: src/intersection.cpp:32,83). Design is driven by measured
TPU v5e gather behavior (see README "Big scenes"):

- XLA's row gather is ROW-COUNT bound: ~255 Mrows/s for tables with
  <= 16384 rows and ~83 Mrows/s above, *independent of row width* up to
  at least 448 bytes. So traversal cost == dependent steps x row
  gathers, and the right tree is as WIDE as a row allows with as FEW
  rows as possible.
- ONE unified row table: supernode rows (16 child AABBs + 16 child
  refs = 112 f32) and fat-leaf rows (up to L inline primitives + L prim
  ids = 10L f32) share a single (R, W) table, so every traversal step is
  exactly one row gather whatever state a lane is in.
- The supernode region is capped at 16384 rows (the fast-gather cliff);
  leaf fatness adapts upward until the cap holds.

Traversal is a per-lane (node, pending-mask) state machine in lockstep
over the whole ray batch: one row gather per step, 16 box tests (VPU,
effectively free at mega-batch sizes), nearest-child-first descent,
(node, mask) pushed on a short per-lane stack; pops re-gather the node
row and re-cull the pending mask against the updated best-t. Throughput
comes from batch size: drivers flatten samples x pixels into ~1M-lane
dispatches (small batches sit at the gather's ~400 us/step latency
floor).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import INT, REAL
from gdpt_tpu.core.soa import V3

MAX_SUPER_ROWS = 16384  # fast-gather cliff on TPU v5e
_EMPTY = np.int32(2**31 - 1)
_DONE = jnp.int32(2**31 - 2)
_UNROLL = 2  # steps per while_loop convergence check


class Super16(NamedTuple):
    # (R, W) int32 unified supernode + leaf rows. The table is integer
    # typed on purpose: ref/prim columns are int payloads, and geometry
    # f32 rides as bitcast int32. The reverse layout (ints bitcast into
    # an f32 table) corrupts: XLA canonicalizes NaN-pattern floats
    # (e.g. ~row leaf refs = negative quiet NaNs -> 0x7FC00000) somewhere
    # in the fused gather pipeline, on CPU and TPU alike. Normal floats
    # stored as int bits are never touched by int ops.
    table: jnp.ndarray
    depth_dummy: jnp.ndarray  # (max_depth + 1,) shape-only stack bound
    leaf_dummy: jnp.ndarray   # (L,) shape-only: prims per leaf row


def build_super16(bvh_bbox_min, bvh_bbox_max, first, count, miss, prim_order,
                  tri_v0, tri_e1, tri_e2, sph_center=None, sph_radius=None,
                  leaf_tris=12, leaf_skip_from=None):
    """Host-side collapse of the binary miss-link BVH into Super16 tables.

    Spheres (prim ids past the triangle range, e.g. point lights —
    reference: src/parsers/parse_scene.cpp:1508) occupy a leaf slot as
    [center.xyz, radius, 0...]; the prim id discriminates at test time.
    Returns None only when the supernode cap cannot be met.
    """
    n_nodes = count.shape[0]
    n_tris = tri_v0.shape[0]
    if n_nodes == 0:
        return None
    order = np.asarray(prim_order)
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
        if order.size and order.max(initial=0) >= n_tris:
            return None
        geo9 = np.concatenate([v0a, e1a, e2a], axis=1)
    is_leaf_b = count > 0
    n_prims = order.size

    # Subtree prim ranges: DFS layout makes each subtree's prims
    # contiguous. pstart[i] = first[first leaf at-or-after i].
    leaf_first = np.where(is_leaf_b, first.astype(np.int64),
                          np.iinfo(np.int64).max)
    pstart = np.minimum.accumulate(leaf_first[::-1])[::-1]
    pstart = np.append(pstart, n_prims)  # sentinel for miss == n_nodes
    pend = pstart[np.minimum(miss, n_nodes)]
    cnt_sub = pend - pstart[:-1]

    for L in ([leaf_tris] + [16, 24, 32, 48, 64]):
        packed = _try_build(bmin, bmax, miss, is_leaf_b, cnt_sub,
                            pstart[:-1], order, geo9, n_nodes, L,
                            leaf_skip_from)
        if packed is not None:
            return packed
    return None


def _try_build(bmin, bmax, miss, is_leaf_b, cnt_sub, pstart, order,
               geo9, n_nodes, L, leaf_skip_from=None):
    # Fat-leaf roots: maximal subtrees with <= L prims, in DFS order.
    fat_of = {}
    fat_ranges = []
    i = 0
    while i < n_nodes:
        if cnt_sub[i] <= L:
            fat_of[i] = len(fat_ranges)
            fat_ranges.append((int(pstart[i]), int(cnt_sub[i])))
            i = int(miss[i])
        else:
            i += 1
    n_fat = len(fat_ranges)

    def children2(b):
        left = b + 1
        return left, int(miss[left])

    def expand16(b):
        """Split the largest internal subtree first until 16 subtrees."""
        frontier = [b]
        while len(frontier) < 16:
            pick, pick_cnt = None, -1
            for idx, x in enumerate(frontier):
                if x not in fat_of and cnt_sub[x] > pick_cnt:
                    pick, pick_cnt = idx, cnt_sub[x]
            if pick is None:
                break
            x = frontier.pop(pick)
            left, right = children2(x)
            frontier[pick:pick] = [left, right]
        return frontier

    if 0 in fat_of:
        # Whole scene fits one fat leaf: single supernode with one child.
        kids_of = [[0]]
        order_q = [None]
        super_of = {}
        max_depth = 1
    else:
        super_of = {}
        order_q = []
        kids_of = []
        queue = [(0, 1)]
        max_depth = 1
        while queue:
            b, depth = queue.pop()
            if b in super_of:
                continue
            super_of[b] = len(order_q)
            order_q.append(b)
            max_depth = max(max_depth, depth)
            ch = expand16(b)
            kids_of.append(ch)
            for c in ch:
                if c not in fat_of:
                    queue.append((c, depth + 1))
        if len(order_q) > MAX_SUPER_ROWS:
            return None

    n_super = len(order_q)
    # Pad rows to full 128-lane registers: gathered rows land lane-aligned
    # in VMEM and the width is free (gather cost is row-count bound).
    width = max(112, 10 * L)
    width = (width + 127) // 128 * 128
    table = np.zeros((n_super + n_fat, width), np.float32)
    refs = np.full((n_super, 16), _EMPTY, np.int32)
    for si in range(n_super):
        for k, c in enumerate(kids_of[si]):
            table[si, k * 6 + 0: k * 6 + 3] = bmin[c]
            table[si, k * 6 + 3: k * 6 + 6] = bmax[c]
            if c in fat_of:
                # Leaf ref: ~row index into the unified table.
                refs[si, k] = np.int32(~np.int32(n_super + fat_of[c]))
            else:
                refs[si, k] = np.int32(super_of[c])
    table.view(np.int32)[:n_super, 96:112] = refs

    # Fat leaf rows: L inline primitives + prim ids (degenerate padding).
    prim_pad = np.full((n_fat, L), -1, np.int32)
    for fi, (lo, cnt) in enumerate(fat_ranges):
        prims = order[lo: lo + cnt].astype(np.int32)
        if leaf_skip_from is not None:
            # Spheres tested outside the walk (traverse_soa brute
            # merge); drop them from leaves, keep geo9 rows.
            prims = prims[prims < leaf_skip_from]
            cnt = prims.shape[0]
        table[n_super + fi, : cnt * 9] = geo9[prims].reshape(-1)
        prim_pad[fi, :cnt] = prims
    table.view(np.int32)[n_super:, 9 * L: 10 * L] = prim_pad

    return Super16(
        jnp.asarray(table.view(np.int32)),
        jnp.zeros(max_depth + 1, jnp.int32),
        jnp.zeros(L, jnp.int32),
    )


def _f(col):
    """Geometry column: f32 bits riding in the int32 table."""
    return jax.lax.bitcast_convert_type(col, jnp.float32)


def _box_hits(wrow, org, d, inv, tnear, best_t):
    """16 slab tests; returns (hit_bits i32, t_ins list of 16)."""
    n = org.x.shape[0]
    bits = jnp.zeros(n, INT)
    t_ins = []
    for k in range(16):
        b = k * 6
        t0x = (_f(wrow[:, b + 0]) - org.x) * inv.x
        t1x = (_f(wrow[:, b + 3]) - org.x) * inv.x
        t0y = (_f(wrow[:, b + 1]) - org.y) * inv.y
        t1y = (_f(wrow[:, b + 4]) - org.y) * inv.y
        t0z = (_f(wrow[:, b + 2]) - org.z) * inv.z
        t1z = (_f(wrow[:, b + 5]) - org.z) * inv.z
        t_in = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tnear),
        )
        t_out = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), best_t),
        )
        ref_k = wrow[:, 96 + k]
        ok = (t_in <= t_out) & (ref_k != _EMPTY)
        bits = bits | jnp.where(ok, jnp.int32(1 << k), 0)
        t_ins.append(jnp.where(ok, t_in, jnp.asarray(jnp.inf, REAL)))
    return bits, t_ins


def _leaf_tests(lrow, L, org, d, tnear, state, is_leaf, n_tris):
    """Test up to L inline primitives; update best-hit state in place.

    A slot holds a triangle (v0, e1, e2) unless its prim id is past the
    triangle range, in which case it holds a sphere (center, radius) —
    stable closest-approach roots as in traverse_soa._sphere_test_rows.
    """
    best_t, best_prim = state["t"], state["prim"]
    best_u, best_v = state["u"], state["v"]
    gnx, gny, gnz = state["gnx"], state["gny"], state["gnz"]
    for j in range(L):
        b = j * 9
        v0 = V3(_f(lrow[:, b + 0]), _f(lrow[:, b + 1]), _f(lrow[:, b + 2]))
        e1 = V3(_f(lrow[:, b + 3]), _f(lrow[:, b + 4]), _f(lrow[:, b + 5]))
        e2 = V3(_f(lrow[:, b + 6]), _f(lrow[:, b + 7]), _f(lrow[:, b + 8]))
        prim = lrow[:, 9 * L + j]
        pvec = soa.cross(d, e2)
        det = soa.dot(e1, pvec)
        inv_det = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
        tvec = org - v0
        u = soa.dot(tvec, pvec) * inv_det
        qvec = soa.cross(tvec, e1)
        v = soa.dot(d, qvec) * inv_det
        t = soa.dot(e2, qvec) * inv_det
        hit = (
            (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
            & (t >= tnear) & (t < best_t) & (prim >= 0) & is_leaf
        )
        gn = soa.cross(e1, e2)
        if n_tris is not None:
            is_sph = prim >= n_tris
            sv = org - v0  # slot 0..2 = center for sphere slots
            r = e1.x       # slot 3 = radius
            a = soa.dot(d, d)
            inv_a = 1.0 / jnp.where(a != 0, a, 1.0)
            tm = -soa.dot(d, sv) * inv_a
            m = sv + d * tm
            disc = r * r - soa.dot(m, m)
            dtq = jnp.sqrt(jnp.maximum(disc, 0.0) * inv_a)
            s0 = tm - dtq
            s1 = tm + dtq
            use_lo = (s0 >= tnear) & (s0 < best_t)
            use_hi = (s1 >= tnear) & (s1 < best_t)
            ts = jnp.where(use_lo, s0, s1)
            hit_s = ((disc >= 0) & (a != 0) & (use_lo | use_hi)
                     & (prim >= 0) & is_leaf)
            gns = (org + d * ts) - v0
            t = jnp.where(is_sph, ts, t)
            hit = jnp.where(is_sph, hit_s, hit)
            u = jnp.where(is_sph, 0.0, u)
            v = jnp.where(is_sph, 0.0, v)
            gn = V3(jnp.where(is_sph, gns.x, gn.x),
                    jnp.where(is_sph, gns.y, gn.y),
                    jnp.where(is_sph, gns.z, gn.z))
        best_prim = jnp.where(hit, prim, best_prim)
        best_u = jnp.where(hit, u, best_u)
        best_v = jnp.where(hit, v, best_v)
        gnx = jnp.where(hit, gn.x, gnx)
        gny = jnp.where(hit, gn.y, gny)
        gnz = jnp.where(hit, gn.z, gnz)
        best_t = jnp.where(hit, t, best_t)
    state.update(t=best_t, prim=best_prim, u=best_u, v=best_v,
                 gnx=gnx, gny=gny, gnz=gnz)


def _make_step(sup: Super16, org: V3, d: V3, inv: V3, tnear, any_hit,
               n_tris, count_steps, stack_n, L):
    n = org.x.shape[0]

    def step(s):
        cur = s["cur"]
        done = cur == _DONE
        is_super = (cur >= 0) & ~done
        is_leaf = cur < 0

        row_idx = jnp.where(is_super, cur, jnp.where(is_leaf, ~cur, 0))
        row = jnp.take(sup.table, row_idx, axis=0, mode="clip")

        fresh_bits, t_ins = _box_hits(row, org, d, inv, tnear, s["t"])
        # pend == 0 means a fresh visit (all children allowed); a pop
        # carries the stored pending mask, re-culled by the fresh test
        # (best_t has tightened since the push).
        pend = s["pend"]
        allowed = jnp.where(pend != 0, pend, jnp.int32(0xFFFF))
        eff = jnp.where(is_super, fresh_bits & allowed, 0)

        _leaf_tests(row, L, org, d, tnear, s, is_leaf, n_tris)

        # Nearest-first: lowest t_in among effective children.
        tmin = jnp.full((n,), jnp.inf, REAL)
        for k in range(16):
            on = (eff & (1 << k)) != 0
            tmin = jnp.minimum(tmin, jnp.where(on, t_ins[k], jnp.inf))
        chosen = jnp.zeros(n, INT)
        for k in range(16):
            on = ((eff & (1 << k)) != 0) & (t_ins[k] == tmin)
            chosen = chosen | jnp.where(on, jnp.int32(1 << k), 0)
        chosen = chosen & (-chosen)  # break ties to lowest bit
        child_ref = jnp.full(n, jnp.int32(_EMPTY), INT)
        for k in range(16):
            child_ref = jnp.where(chosen == (1 << k), row[:, 96 + k],
                                  child_ref)
        rest = eff ^ chosen

        descend = is_super & (eff != 0)
        do_push = descend & (rest != 0)
        do_pop = (~done) & (~descend)
        if any_hit:
            # Shadow query: the first accepted hit finishes the lane.
            finish = (s["prim"] >= 0) & ~done
            descend = descend & ~finish
            do_push = do_push & ~finish
            do_pop = do_pop & ~finish
        sp = s["sp"]
        stack = list(s["stack"])
        pushed = (cur.astype(jnp.uint32) << 16) | rest.astype(jnp.uint32)
        for i in range(stack_n):
            stack[i] = jnp.where(do_push & (sp == i), pushed, stack[i])
        sp = sp + jnp.where(do_push, 1, 0)
        popped = jnp.zeros(n, jnp.uint32)
        for i in range(stack_n):
            popped = jnp.where(do_pop & (sp - 1 == i), stack[i], popped)
        can_pop = do_pop & (sp > 0)
        sp = sp - jnp.where(can_pop, 1, 0)
        pop_node = (popped >> 16).astype(INT)
        pop_mask = (popped & 0xFFFF).astype(INT)

        new_cur = jnp.where(
            descend, child_ref,
            jnp.where(can_pop, pop_node, jnp.where(done, cur, _DONE)),
        )
        new_pend = jnp.where(descend, 0, jnp.where(can_pop, pop_mask, 0))
        if any_hit:
            new_cur = jnp.where(finish, _DONE, new_cur)
            new_pend = jnp.where(finish, 0, new_pend)
        s.update(cur=new_cur, pend=new_pend, sp=sp, stack=tuple(stack))
        if count_steps:
            s["steps"] = s["steps"] + jnp.where(done, 0, 1)
        return s

    return step


def _init_state(n, tfar0, zero, stack_n, count_steps):
    state = dict(
        iter=jnp.asarray(0, INT),
        cur=jnp.zeros(n, INT),
        pend=jnp.zeros(n, INT),
        sp=jnp.zeros(n, INT),
        stack=tuple(jnp.zeros(n, jnp.uint32) for _ in range(stack_n)),
        t=tfar0,
        prim=jnp.full(n, -1, INT),
        u=zero, v=zero, gnx=zero, gny=zero, gnz=jnp.ones(n, REAL),
    )
    if count_steps:
        state["steps"] = jnp.zeros(n, INT)
    return state


def _traverse(sup: Super16, org: V3, d: V3, tnear, tfar, any_hit,
              n_tris=None, count_steps=False):
    n = org.x.shape[0]
    L = int(sup.leaf_dummy.shape[0])
    stack_n = int(sup.depth_dummy.shape[0])
    inv = V3(
        1.0 / jnp.where(d.x == 0, 1e-20, d.x),
        1.0 / jnp.where(d.y == 0, 1e-20, d.y),
        1.0 / jnp.where(d.z == 0, 1e-20, d.z),
    )
    tnear = jnp.broadcast_to(jnp.asarray(tnear, REAL), (n,))
    tfar0 = jnp.broadcast_to(jnp.asarray(tfar, REAL), (n,))
    zero = jnp.zeros(n, REAL)
    step = _make_step(sup, org, d, inv, tnear, any_hit, n_tris,
                      count_steps, stack_n, L)

    # Hard iteration ceiling: a correct traversal never exceeds
    # rows-visited ~ O(table rows), and a bounded loop can't wedge the
    # device if a degenerate scene (NaN bounds etc.) slips through.
    ceiling = 4 * int(sup.table.shape[0]) + 256

    def cond(s):
        return jnp.any(s["cur"] != _DONE) & (s["iter"] < ceiling)

    def body(s):
        s = dict(s)
        for _ in range(_UNROLL):
            s = step(s)
        s["iter"] = s["iter"] + _UNROLL
        return s

    state = _init_state(n, tfar0, zero, stack_n, count_steps)
    out = jax.lax.while_loop(cond, body, state)
    return out


def intersect_super16(sup: Super16, org: V3, d: V3, tnear, tfar,
                      n_tris=None):
    """Closest hit. Returns (t, prim, u, v, gn V3). n_tris (static int)
    enables sphere slots when the scene mixes spheres into the BVH."""
    out = _traverse(sup, org, d, tnear, tfar, any_hit=False, n_tris=n_tris)
    return (out["t"], out["prim"], out["u"], out["v"],
            V3(out["gnx"], out["gny"], out["gnz"]))


def occluded_super16(sup: Super16, org: V3, d: V3, tnear, tfar, n_tris=None):
    out = _traverse(sup, org, d, tnear, tfar, any_hit=True, n_tris=n_tris)
    return out["prim"] >= 0


def traversal_steps(sup: Super16, org: V3, d: V3, tnear, tfar, n_tris=None,
                    any_hit=False):
    """Instrumentation: per-lane step counts (mean/max drive batch and
    compaction tuning)."""
    out = _traverse(sup, org, d, tnear, tfar, any_hit=any_hit,
                    n_tris=n_tris, count_steps=True)
    return out["steps"]
