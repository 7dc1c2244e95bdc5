"""Batched (SoA) ray casting dispatch — replaces Embree's
rtcIntersect1/rtcOccluded1 (reference: src/intersection.cpp:32,83).

All ray state lives in (N,) component arrays (see core/soa.py).
Backends, chosen per scene at build time:

- brute force: triangles broadcast against rays as (T, N) lanes-minor
  intermediates (plus a Pallas SMEM kernel on TPU). Optimal for small
  scenes (everything fuses on the VPU).
- packet kernel (accel/packet_trace.py, TPU): VMEM-resident 16-wide
  table, scalar-driven shared stack per 1024-ray packet.
- super16 (accel/super16.py): per-lane lockstep XLA walk over the same
  collapse; the over-VMEM-cap / CPU fallback.
- packed binary walk: one (N, 48) row gather per step; small-BVH path.

Few-sphere scenes (<= SPH_BRUTE_MAX) keep spheres out of the walk
tables entirely and brute-merge them after the walk.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.core.soa import V3


class GeomSoA(NamedTuple):
    """Component-transposed geometry view (built once per render)."""

    tri_v0: V3
    tri_e1: V3
    tri_e2: V3
    sph_center: V3
    sph_radius: jnp.ndarray
    bvh_bmin: V3
    bvh_bmax: V3
    bvh_first: jnp.ndarray
    bvh_count: jnp.ndarray
    bvh_miss: jnp.ndarray
    bvh_prim_order: jnp.ndarray
    # Packed traversal table (pure-triangle BVHs; None otherwise):
    # bvh_nodes48 (n_nodes, 48): bmin.xyz, bmax.xyz, miss (bitcast),
    #   is_leaf (bitcast), then 4 x (v0, e1, e2) inline leaf triangles and
    #   4 prim ids (bitcast) — one row gather per traversal step.
    bvh_nodes48: jnp.ndarray = None
    # Packet-traversal table (Pallas kernel, VMEM-resident; None when
    # the scene exceeds the residency cap or the backend is not TPU).
    packet: object = None
    # super16 XLA fallback tables (TPU, big scenes): used when the
    # packet kernel is unavailable or disabled for a call path (the
    # GDPT megakernel's many traversal instances crash the worker with
    # embedded Pallas calls; super16 is plain XLA).
    sup16: object = None


_LEAF_W = 4  # prims per packed leaf row (== bvh build leaf size)


def _pack_bvh(geom):
    """Host-side packing of the miss-link BVH into one row-gatherable
    table: per traversal step, a single (N, 48) gather fetches the node
    bbox, links, and the leaf's 4 triangles inline (vs ~45 scalar-table
    gathers; the lockstep loop is gather-latency bound on TPU)."""
    import numpy as np

    n_nodes = geom.bvh_count.shape[0]
    n_tris = geom.tri_v0.shape[0]
    if n_nodes == 0:
        return None
    order = np.asarray(geom.bvh_prim_order)
    if order.size and order.max(initial=0) >= n_tris:
        return None  # spheres in the BVH: packed path not built
    count = np.asarray(geom.bvh_count)
    first = np.asarray(geom.bvh_first)
    miss = np.asarray(geom.bvh_miss).astype(np.int32)
    bmin = np.asarray(geom.bvh_bbox_min, np.float32)
    bmax = np.asarray(geom.bvh_bbox_max, np.float32)

    leaf_mask = count > 0
    is_leaf = leaf_mask.astype(np.int32)

    lf = first[:, None]
    lc = count[:, None]
    j = np.arange(_LEAF_W)[None, :]
    valid = (j < lc) & leaf_mask[:, None]
    slots = np.clip(lf + j, 0, max(order.size - 1, 0))
    prim = np.where(valid, order[slots] if order.size else 0, -1).astype(np.int32)
    pv = np.clip(prim, 0, max(n_tris - 1, 0))
    v0 = np.asarray(geom.tri_v0, np.float32)[pv]
    e1 = np.asarray(geom.tri_e1, np.float32)[pv]
    e2 = np.asarray(geom.tri_e2, np.float32)[pv]
    # Degenerate tri for padded/inner slots -> det == 0 -> never hits.
    z = (~valid)[..., None]
    v0 = np.where(z, 0.0, v0)
    e1 = np.where(z, 0.0, e1)
    e2 = np.where(z, 0.0, e2)
    tri36 = np.concatenate([v0, e1, e2], axis=2).reshape(n_nodes, _LEAF_W * 9)
    nodes48 = np.concatenate(
        [bmin, bmax,
         miss.view(np.float32)[:, None],
         is_leaf.view(np.float32)[:, None],
         tri36,
         prim.view(np.float32)],
        axis=1,
    ).astype(np.float32)
    return jnp.asarray(nodes48)




# Scenes with at most this many spheres keep them OUT of the BVH walk
# tables and brute-test them per lane instead (see geom_soa_from_aos /
# _sph_outside): an in-table sphere forces the kernel's sphere branch
# into every leaf visit scene-wide, ~doubling leaf VPU work.
SPH_BRUTE_MAX = 8


def _use_packet():
    import os

    flag = os.environ.get("GDPT_PACKET", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


def geom_soa_from_aos(geom) -> GeomSoA:
    nodes48 = _pack_bvh(geom)
    packet = None
    sup16 = None
    n_tris = geom.tri_v0.shape[0]
    n_sph = geom.sph_center.shape[0]
    n_prims = n_tris + n_sph
    # Few-sphere scenes (typically a lone sphere light in a mesh
    # scene, e.g. sponza) test spheres OUTSIDE the traversal with the
    # brute row tester; an in-table sphere would force the kernel's
    # sphere branch into EVERY leaf visit scene-wide.
    skip = n_tris if 0 < n_sph <= SPH_BRUTE_MAX else None
    if n_prims > 128 and _use_packet():
        from gdpt_tpu.accel import packet_trace, super16 as s16

        packet = packet_trace.build_packet_table(
            geom.bvh_bbox_min, geom.bvh_bbox_max, geom.bvh_first,
            geom.bvh_count, geom.bvh_miss, geom.bvh_prim_order,
            geom.tri_v0, geom.tri_e1, geom.tri_e2,
            geom.sph_center, geom.sph_radius, leaf_skip_from=skip)
        if packet is None:
            sup16 = s16.build_super16(
                geom.bvh_bbox_min, geom.bvh_bbox_max, geom.bvh_first,
                geom.bvh_count, geom.bvh_miss, geom.bvh_prim_order,
                geom.tri_v0, geom.tri_e1, geom.tri_e2,
                geom.sph_center, geom.sph_radius, leaf_skip_from=skip)
    return GeomSoA(
        soa.from_rows(geom.tri_v0),
        soa.from_rows(geom.tri_e1),
        soa.from_rows(geom.tri_e2),
        soa.from_rows(geom.sph_center) if geom.sph_center.shape[0] else soa.V3(
            jnp.zeros(1, REAL), jnp.zeros(1, REAL), jnp.zeros(1, REAL)
        ),
        geom.sph_radius if geom.sph_radius.shape[0] else jnp.ones(1, REAL),
        soa.from_rows(geom.bvh_bbox_min) if geom.bvh_bbox_min.shape[0] else soa.V3(
            jnp.zeros(1, REAL), jnp.zeros(1, REAL), jnp.zeros(1, REAL)
        ),
        soa.from_rows(geom.bvh_bbox_max) if geom.bvh_bbox_max.shape[0] else soa.V3(
            jnp.zeros(1, REAL), jnp.zeros(1, REAL), jnp.zeros(1, REAL)
        ),
        geom.bvh_first,
        geom.bvh_count,
        geom.bvh_miss,
        geom.bvh_prim_order,
        nodes48,
        packet,
        sup16,
    )


class HitSoA(NamedTuple):
    t: jnp.ndarray
    prim_id: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray

    @property
    def valid(self):
        return self.prim_id >= 0


def _tri_test_rows(g: GeomSoA, org: V3, d: V3, tnear, tfar):
    """All triangles x all rays: (T, N) intermediates, rays minor."""
    v0 = soa.V3(g.tri_v0.x[:, None], g.tri_v0.y[:, None], g.tri_v0.z[:, None])
    e1 = soa.V3(g.tri_e1.x[:, None], g.tri_e1.y[:, None], g.tri_e1.z[:, None])
    e2 = soa.V3(g.tri_e2.x[:, None], g.tri_e2.y[:, None], g.tri_e2.z[:, None])
    o = soa.V3(org.x[None, :], org.y[None, :], org.z[None, :])
    dd = soa.V3(d.x[None, :], d.y[None, :], d.z[None, :])
    pvec = soa.cross(dd, e2)
    det = soa.dot(e1, pvec)
    inv_det = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
    tvec = o - v0
    u = soa.dot(tvec, pvec) * inv_det
    qvec = soa.cross(tvec, e1)
    v = soa.dot(dd, qvec) * inv_det
    t = soa.dot(e2, qvec) * inv_det
    hit = (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= tnear) & (t < tfar)
    return t, u, v, hit


def _sphere_test_rows(g: GeomSoA, org: V3, d: V3, tnear, tfar):
    c = soa.V3(g.sph_center.x[:, None], g.sph_center.y[:, None], g.sph_center.z[:, None])
    r = g.sph_radius[:, None]
    o = soa.V3(org.x[None, :], org.y[None, :], org.z[None, :])
    dd = soa.V3(d.x[None, :], d.y[None, :], d.z[None, :])
    v = o - c
    a = soa.dot(dd, dd)
    inv_a = 1.0 / jnp.where(a != 0, a, 1.0)
    tm = -soa.dot(dd, v) * inv_a
    m = v + dd * tm
    disc = r * r - soa.dot(m, m)
    dt = jnp.sqrt(jnp.maximum(disc, 0.0) * inv_a)
    t0 = tm - dt
    t1 = tm + dt
    use_lo = (t0 >= tnear) & (t0 < tfar)
    use_hi = (t1 >= tnear) & (t1 < tfar)
    t = jnp.where(use_lo, t0, t1)
    hit = (disc >= 0) & (a != 0) & (use_lo | use_hi)
    return t, hit


def intersect_brute_soa(static, g: GeomSoA, org: V3, d: V3, tnear, tfar):
    n = org.x.shape[0]
    best_t = jnp.broadcast_to(jnp.asarray(tfar, REAL), (n,)) if jnp.ndim(tfar) == 0 else tfar
    best_prim = jnp.full(n, -1, INT)
    best_u = jnp.zeros(n, REAL)
    best_v = jnp.zeros(n, REAL)
    if static.n_tris:
        t, u, v, hit = _tri_test_rows(g, org, d, tnear, best_t)
        t = jnp.where(hit, t, BIG)
        i = jnp.argmin(t, axis=0)
        lane = jnp.arange(n)
        ti = t[i, lane]
        closer = ti < best_t
        best_t = jnp.where(closer, ti, best_t)
        best_prim = jnp.where(closer, i.astype(INT), best_prim)
        best_u = jnp.where(closer, u[i, lane], best_u)
        best_v = jnp.where(closer, v[i, lane], best_v)
    if static.n_spheres:
        t, hit = _sphere_test_rows(g, org, d, tnear, best_t)
        t = jnp.where(hit, t, BIG)
        i = jnp.argmin(t, axis=0)
        lane = jnp.arange(n)
        ti = t[i, lane]
        closer = ti < best_t
        best_t = jnp.where(closer, ti, best_t)
        best_prim = jnp.where(closer, (static.n_tris + i).astype(INT), best_prim)
    return HitSoA(best_t, best_prim, best_u, best_v)


def occluded_brute_soa(static, g: GeomSoA, org: V3, d: V3, tnear, tfar):
    n = org.x.shape[0]
    blocked = jnp.zeros(n, bool)
    if static.n_tris:
        _, _, _, hit = _tri_test_rows(g, org, d, tnear, tfar)
        blocked |= jnp.any(hit, axis=0)
    if static.n_spheres:
        _, hit = _sphere_test_rows(g, org, d, tnear, tfar)
        blocked |= jnp.any(hit, axis=0)
    return blocked


# ---------------------------------------------------------------------------
# Batched BVH traversal
# ---------------------------------------------------------------------------

_LEAF_SIZE = 4


def _test_prim_soa(static, g: GeomSoA, prim, org: V3, d: V3, tnear, tfar):
    n_tri = static.n_tris
    n_sph = static.n_spheres
    zero = jnp.zeros_like(tfar)

    def tri_branch(pid):
        tid = jnp.clip(pid, 0, max(n_tri - 1, 0))
        v0 = soa.gather(g.tri_v0, tid)
        e1 = soa.gather(g.tri_e1, tid)
        e2 = soa.gather(g.tri_e2, tid)
        pvec = soa.cross(d, e2)
        det = soa.dot(e1, pvec)
        inv = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
        tvec = org - v0
        u = soa.dot(tvec, pvec) * inv
        qvec = soa.cross(tvec, e1)
        v = soa.dot(d, qvec) * inv
        t = soa.dot(e2, qvec) * inv
        hit = (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= tnear) & (t < tfar)
        return t, u, v, hit

    def sph_branch(pid):
        sid = jnp.clip(pid - n_tri, 0, max(n_sph - 1, 0))
        c = soa.gather(g.sph_center, sid)
        r = soa.take(g.sph_radius, sid)
        vv = org - c
        a = soa.dot(d, d)
        inv_a = 1.0 / jnp.where(a != 0, a, 1.0)
        tm = -soa.dot(d, vv) * inv_a
        mm = vv + d * tm
        disc = r * r - soa.dot(mm, mm)
        dtq = jnp.sqrt(jnp.maximum(disc, 0.0) * inv_a)
        t0 = tm - dtq
        t1 = tm + dtq
        use_lo = (t0 >= tnear) & (t0 < tfar)
        use_hi = (t1 >= tnear) & (t1 < tfar)
        t = jnp.where(use_lo, t0, t1)
        hit = (disc >= 0) & (a != 0) & (use_lo | use_hi)
        return t, hit

    if n_tri and n_sph:
        tt, u, v, th = tri_branch(prim)
        ts, sh = sph_branch(prim)
        is_tri = prim < n_tri
        return (
            jnp.where(is_tri, tt, ts),
            jnp.where(is_tri, u, zero),
            jnp.where(is_tri, v, zero),
            jnp.where(is_tri, th, sh),
        )
    if n_tri:
        return tri_branch(prim)
    t, hit = sph_branch(prim)
    return t, zero, zero, hit


def intersect_bvh_soa(static, g: GeomSoA, org: V3, d: V3, tnear, tfar):
    n = org.x.shape[0]
    n_nodes = g.bvh_count.shape[0]
    inv = V3(
        1.0 / jnp.where(d.x == 0, 1e-20, d.x),
        1.0 / jnp.where(d.y == 0, 1e-20, d.y),
        1.0 / jnp.where(d.z == 0, 1e-20, d.z),
    )
    tnear = jnp.broadcast_to(jnp.asarray(tnear, REAL), (n,))
    tfar0 = jnp.broadcast_to(jnp.asarray(tfar, REAL), (n,))

    def cond(s):
        return jnp.any(s["node"] < n_nodes)

    def body(s):
        node = jnp.minimum(s["node"], n_nodes - 1)
        active = s["node"] < n_nodes
        bmin = soa.gather(g.bvh_bmin, node)
        bmax = soa.gather(g.bvh_bmax, node)
        t0x = (bmin.x - org.x) * inv.x
        t1x = (bmax.x - org.x) * inv.x
        t0y = (bmin.y - org.y) * inv.y
        t1y = (bmax.y - org.y) * inv.y
        t0z = (bmin.z - org.z) * inv.z
        t1z = (bmax.z - org.z) * inv.z
        t_in = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tnear),
        )
        t_out = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), s["t"]),
        )
        hit_box = t_in <= t_out
        count = soa.take(g.bvh_count, node)
        is_leaf = count > 0
        test_leaf = active & hit_box & is_leaf
        best_t, best_prim, best_u, best_v = s["t"], s["prim"], s["u"], s["v"]
        first = soa.take(g.bvh_first, node)
        for j in range(_LEAF_SIZE):
            slot = jnp.clip(first + j, 0, g.bvh_prim_order.shape[0] - 1)
            prim = soa.take(g.bvh_prim_order, slot)
            t, u, v, hit = _test_prim_soa(static, g, prim, org, d, tnear, best_t)
            take = test_leaf & (j < count) & hit & (t < best_t)
            best_t = jnp.where(take, t, best_t)
            best_prim = jnp.where(take, prim, best_prim)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)
        nxt = jnp.where(hit_box & ~is_leaf, node + 1, soa.take(g.bvh_miss, node))
        nxt = jnp.where(active, nxt, s["node"])
        return dict(node=nxt, t=best_t, prim=best_prim, u=best_u, v=best_v)

    state = dict(
        node=jnp.zeros(n, INT),
        t=tfar0,
        prim=jnp.full(n, -1, INT),
        u=jnp.zeros(n, REAL),
        v=jnp.zeros(n, REAL),
    )
    out = jax.lax.while_loop(cond, body, state)
    return HitSoA(out["t"], out["prim"], out["u"], out["v"])


def intersect_bvh_packed(static, g: GeomSoA, org: V3, d: V3, tnear, tfar):
    """Packed stackless traversal: ONE (N, 48) row gather per step (node
    bbox + links + inline leaf triangles), 4 steps unrolled per
    convergence check (the cond's any() reduction is ~half the loop cost
    otherwise). Returns (HitSoA, unnormalized geometric normal V3)."""
    n = org.x.shape[0]
    n_nodes = g.bvh_nodes48.shape[0]
    inv = V3(
        1.0 / jnp.where(d.x == 0, 1e-20, d.x),
        1.0 / jnp.where(d.y == 0, 1e-20, d.y),
        1.0 / jnp.where(d.z == 0, 1e-20, d.z),
    )
    tnear = jnp.broadcast_to(jnp.asarray(tnear, REAL), (n,))
    tfar0 = jnp.broadcast_to(jnp.asarray(tfar, REAL), (n,))
    zero = jnp.zeros(n, REAL)
    _UNROLL = 4

    def step(s):
        node = jnp.minimum(s["node"], n_nodes - 1)
        active = s["node"] < n_nodes
        row = jnp.take(g.bvh_nodes48, node, axis=0, mode="clip")
        t0x = (row[:, 0] - org.x) * inv.x
        t1x = (row[:, 3] - org.x) * inv.x
        t0y = (row[:, 1] - org.y) * inv.y
        t1y = (row[:, 4] - org.y) * inv.y
        t0z = (row[:, 2] - org.z) * inv.z
        t1z = (row[:, 5] - org.z) * inv.z
        t_in = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tnear),
        )
        t_out = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), s["t"]),
        )
        hit_box = t_in <= t_out
        miss_link = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        is_leaf = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32) != 0
        test_leaf = active & hit_box & is_leaf

        best_t = s["t"]
        best_prim = s["prim"]
        best_u, best_v = s["u"], s["v"]
        gnx, gny, gnz = s["gnx"], s["gny"], s["gnz"]
        for j in range(_LEAF_W):
            b = 8 + j * 9
            v0 = V3(row[:, b + 0], row[:, b + 1], row[:, b + 2])
            e1 = V3(row[:, b + 3], row[:, b + 4], row[:, b + 5])
            e2 = V3(row[:, b + 6], row[:, b + 7], row[:, b + 8])
            prim = jax.lax.bitcast_convert_type(
                row[:, 8 + _LEAF_W * 9 + j], jnp.int32
            )
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
                & (t >= tnear) & (t < best_t) & (prim >= 0) & test_leaf
            )
            gn = soa.cross(e1, e2)
            best_prim = jnp.where(hit, prim, best_prim)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
            gnx = jnp.where(hit, gn.x, gnx)
            gny = jnp.where(hit, gn.y, gny)
            gnz = jnp.where(hit, gn.z, gnz)
            best_t = jnp.where(hit, t, best_t)

        nxt = jnp.where(hit_box & ~is_leaf, node + 1, miss_link)
        nxt = jnp.where(active, nxt, s["node"])
        return dict(
            node=nxt, t=best_t, prim=best_prim, u=best_u, v=best_v,
            gnx=gnx, gny=gny, gnz=gnz,
        )

    def cond(s):
        return jnp.any(s["node"] < n_nodes)

    def body(s):
        for _ in range(_UNROLL):
            s = step(s)
        return s

    state = dict(
        node=jnp.zeros(n, INT),
        t=tfar0,
        prim=jnp.full(n, -1, INT),
        u=zero, v=zero, gnx=zero, gny=zero, gnz=jnp.ones(n, REAL),
    )
    out = jax.lax.while_loop(cond, body, state)
    return (
        HitSoA(out["t"], out["prim"], out["u"], out["v"]),
        V3(out["gnx"], out["gny"], out["gnz"]),
    )


def occluded_bvh_soa(static, g: GeomSoA, org: V3, d: V3, tnear, tfar):
    if g.bvh_nodes48 is not None:
        hit, _ = intersect_bvh_packed(static, g, org, d, tnear, tfar)
    else:
        hit = intersect_bvh_soa(static, g, org, d, tnear, tfar)
    return hit.prim_id >= 0


def _use_pallas():
    import os

    flag = os.environ.get("GDPT_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


def _sph_outside(static):
    """Few-sphere scenes: spheres ride outside the traversal tables
    (geom_soa_from_aos built them with leaf_skip_from) and are tested
    brute-force here."""
    return 0 < static.n_spheres <= SPH_BRUTE_MAX


def _merge_spheres_closest(static, g, org, d, tnear, hit: HitSoA, gn):
    """Min-combine the brute sphere tests into a table-walk result.
    hit.t carries tfar on miss, so bounding the sphere window by it
    keeps only strictly closer sphere hits."""
    n = org.x.shape[0]
    ts, sh = _sphere_test_rows(g, org, d, tnear, hit.t)
    ts = jnp.where(sh, ts, BIG)
    i = jnp.argmin(ts, axis=0)
    lane = jnp.arange(n)
    ti = ts[i, lane]
    closer = ti < hit.t
    c = soa.gather(g.sph_center, i.astype(INT))
    pos = org + d * ti
    gn_s = pos - c
    t2 = jnp.where(closer, ti, hit.t)
    prim2 = jnp.where(closer, static.n_tris + i.astype(INT), hit.prim_id)
    u2 = jnp.where(closer, 0.0, hit.u)
    v2 = jnp.where(closer, 0.0, hit.v)
    if gn is None:
        gn = soa.V3(jnp.zeros(n, REAL), jnp.zeros(n, REAL),
                    jnp.ones(n, REAL))
    return HitSoA(t2, prim2, u2, v2), soa.where(closer, gn_s, gn)


def intersect_soa_gn(static, g: GeomSoA, org: V3, d: V3, tnear, tfar,
                     sort_rays=True, sort_hint=None):
    """Closest hit plus, when the pallas backend runs, the unnormalized
    geometric normal of the hit primitive (None otherwise).

    sort_rays=False skips the packet backend's per-dispatch morton/
    octant argsort (callers that keep their lane pool pre-sorted, e.g.
    the pool-sorted wavefront, avoid paying ~60-70 ms per 1M rays per
    bounce); other backends ignore it."""
    if static.use_brute_force:
        if _use_pallas():
            from gdpt_tpu.accel import pallas_intersect as pli

            return pli.intersect_brute_pallas(static, g, org, d, tnear, tfar)
        return intersect_brute_soa(static, g, org, d, tnear, tfar), None
    in_table_sph = static.n_spheres and not _sph_outside(static)
    n_tris_arg = static.n_tris if in_table_sph else None
    if g.packet is not None:
        from gdpt_tpu.accel import packet_trace

        t, prim, u, v, gn = packet_trace.intersect_packet(
            g.packet, org, d, tnear, tfar, n_tris=n_tris_arg,
            sort_rays=sort_rays, sort_hint=sort_hint)
        hit = HitSoA(t, prim, u, v)
        if _sph_outside(static):
            hit, gn = _merge_spheres_closest(static, g, org, d, tnear,
                                             hit, gn)
        return hit, gn
    if g.sup16 is not None:
        from gdpt_tpu.accel import super16 as s16

        t, prim, u, v, gn = s16.intersect_super16(
            g.sup16, org, d, tnear, tfar, n_tris=n_tris_arg)
        hit = HitSoA(t, prim, u, v)
        if _sph_outside(static):
            hit, gn = _merge_spheres_closest(static, g, org, d, tnear,
                                             hit, gn)
        return hit, gn
    if g.bvh_nodes48 is not None:
        return intersect_bvh_packed(static, g, org, d, tnear, tfar)
    return intersect_bvh_soa(static, g, org, d, tnear, tfar), None


def intersect_soa(static, g: GeomSoA, org: V3, d: V3, tnear, tfar):
    return intersect_soa_gn(static, g, org, d, tnear, tfar)[0]


def occluded_soa(static, g: GeomSoA, org: V3, d: V3, tnear, tfar):
    if static.use_brute_force:
        if _use_pallas():
            from gdpt_tpu.accel import pallas_intersect as pli

            return pli.occluded_brute_pallas(static, g, org, d, tnear, tfar)
        return occluded_brute_soa(static, g, org, d, tnear, tfar)
    in_table_sph = static.n_spheres and not _sph_outside(static)
    n_tris_arg = static.n_tris if in_table_sph else None
    occ = None
    if g.packet is not None:
        from gdpt_tpu.accel import packet_trace

        occ = packet_trace.occluded_packet(
            g.packet, org, d, tnear, tfar, n_tris=n_tris_arg)
    elif g.sup16 is not None:
        from gdpt_tpu.accel import super16 as s16

        occ = s16.occluded_super16(
            g.sup16, org, d, tnear, tfar, n_tris=n_tris_arg)
    if occ is not None:
        if _sph_outside(static):
            _, sh = _sphere_test_rows(g, org, d, tnear, tfar)
            occ = occ | sh.any(axis=0)
        return occ
    return occluded_bvh_soa(static, g, org, d, tnear, tfar)


