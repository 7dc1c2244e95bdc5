"""Packet traversal kernel (accel/packet_trace) vs brute force.

Runs the Pallas kernel in interpret mode on the CPU test mesh; the
hardware path shares the exact same kernel body.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gdpt_tpu.accel import bvh as gbvh
from gdpt_tpu.accel import packet_trace as pt
from gdpt_tpu.core.soa import V3

from test_super16 import _soup, _brute, _rays, _v3

import pytest


def _table(v0, v1, v2, **kw):
    e1, e2 = v1 - v0, v2 - v0
    arr = gbvh.build_bvh(v0, v1, v2, **kw)
    return pt.build_packet_table(
        arr.bbox_min, arr.bbox_max, arr.first, arr.count, arr.miss,
        arr.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32)), e1, e2


def test_packet_matches_brute_force():
    v0, v1, v2 = _soup(1500)
    tab, e1, e2 = _table(v0, v1, v2)
    assert tab is not None
    org, d = _rays(1024)
    t, prim, u, v, gn = pt.intersect_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True)
    bt, bp = _brute(v0, e1, e2, org, d)
    prim = np.asarray(prim)
    assert (prim == bp).mean() == 1.0
    good = bp >= 0
    assert good.mean() > 0.15
    np.testing.assert_allclose(np.asarray(t)[good], bt[good],
                               rtol=1e-3, atol=1e-4)
    occ = np.asarray(pt.occluded_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True))
    assert (occ == (bp >= 0)).all()


def test_packet_sphere_slots():
    v0, v1, v2 = _soup(200, seed=3)
    e1, e2 = v1 - v0, v2 - v0
    arr = gbvh.build_bvh(v0, v1, v2)
    # one sphere appended past the triangle range, as scene builds do
    sc = np.array([[0.0, 0.0, 20.0]], np.float32)
    sr = np.array([2.0], np.float32)
    arr2 = gbvh.build_bvh(v0, v1, v2, sph_center=sc, sph_radius=sr)
    tab = pt.build_packet_table(
        arr2.bbox_min, arr2.bbox_max, arr2.first, arr2.count, arr2.miss,
        arr2.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32), sph_center=sc, sph_radius=sr)
    assert tab is not None
    # rays straight at the sphere from above the soup
    nr = 256
    org = np.tile(np.array([[0.0, 0.0, 40.0]], np.float32), (nr, 1))
    org[:, 0] = np.linspace(-1.5, 1.5, nr)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (nr, 1))
    t, prim, u, v, gn = pt.intersect_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, n_tris=200, interpret=True)
    prim = np.asarray(prim)
    t = np.asarray(t)
    inside = np.abs(org[:, 0]) < 1.99
    assert (prim[inside] == 200).all()
    np.testing.assert_allclose(
        t[inside], 20.0 - np.sqrt(4.0 - org[inside, 0] ** 2), rtol=1e-4)


def test_packet_padding_lanes_dead():
    # n not a multiple of 1024 exercises the padded tail
    v0, v1, v2 = _soup(300, seed=5)
    tab, e1, e2 = _table(v0, v1, v2)
    org, d = _rays(777, seed=6)
    t, prim, u, v, gn = pt.intersect_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True)
    bt, bp = _brute(v0, e1, e2, org, d)
    assert (np.asarray(prim) == bp).mean() == 1.0
    occ = np.asarray(pt.occluded_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True))
    assert (occ == (bp >= 0)).all()


def test_packet_scrubs_nonfinite_lanes():
    """Masked-off integrator lanes carry NaN/Inf ray data; they must
    come back as misses without disturbing live lanes."""
    v0, v1, v2 = _soup(300, seed=8)
    tab, e1, e2 = _table(v0, v1, v2)
    org, d = _rays(512, seed=9)
    orgb = org.copy(); db = d.copy()
    bad = np.arange(512) % 3 == 0
    orgb[bad] = np.nan
    db[np.arange(512) % 5 == 0] = np.inf
    poison = bad | (np.arange(512) % 5 == 0)
    t, prim, u, v, gn = pt.intersect_packet(
        tab, _v3(orgb), _v3(db), 1e-4, 1e9, interpret=True)
    prim = np.asarray(prim)
    assert (prim[poison] == -1).all()
    bt, bp = _brute(v0, e1, e2, org, d)
    assert (prim[~poison] == bp[~poison]).all()
    occ = np.asarray(pt.occluded_packet(
        tab, _v3(orgb), _v3(db), 1e-4, 1e9, interpret=True))
    assert (occ[~poison] == (bp[~poison] >= 0)).all()
    assert not occ[poison].any()


def test_two_phase_matches_brute_force():
    """Entry-point (two-phase) traversal vs brute force, closest + any."""
    v0, v1, v2 = _soup(1500, seed=11)
    tab, e1, e2 = _table(v0, v1, v2)
    assert tab.entry_ref is not None and tab.entry_ref.shape[0] > 2
    org, d = _rays(1024, seed=12)
    t, prim, u, v, gn = pt.trace_two_phase(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True)
    bt, bp = _brute(v0, e1, e2, org, d)
    prim = np.asarray(prim)
    assert (prim == bp).mean() == 1.0
    good = bp >= 0
    np.testing.assert_allclose(np.asarray(t)[good], bt[good],
                               rtol=1e-3, atol=1e-4)
    t2, p2, _, _, _ = pt.trace_two_phase(
        tab, _v3(org), _v3(d), 1e-4, 1e9, any_hit=True, interpret=True)
    assert ((np.asarray(p2) >= 0) == (bp >= 0)).all()


def test_two_phase_nonfinite_and_dead_lanes():
    v0, v1, v2 = _soup(400, seed=13)
    tab, e1, e2 = _table(v0, v1, v2)
    org, d = _rays(640, seed=14)
    orgb = org.copy()
    bad = np.arange(640) % 4 == 0
    orgb[bad] = np.inf
    tfar = np.full(640, 1e9, np.float32)
    dead = np.arange(640) % 7 == 0
    tfar[dead] = -1.0
    t, prim, _, _, _ = pt.trace_two_phase(
        tab, _v3(orgb), _v3(d), 1e-4, jnp.asarray(tfar), interpret=True)
    prim = np.asarray(prim)
    out = bad | dead
    assert (prim[out] == -1).all()
    bt, bp = _brute(v0, e1, e2, org, d)
    assert (prim[~out] == bp[~out]).all()


def test_few_spheres_outside_table(monkeypatch):
    """Scenes with <= SPH_BRUTE_MAX spheres keep them out of the walk
    tables (leaf_skip_from) and brute-merge them in traverse_soa; the
    dispatch must agree with the all-in-table brute oracle on a mixed
    tri+sphere scene (intersect AND occluded)."""
    monkeypatch.setenv("GDPT_PACKET", "1")
    from gdpt_tpu.accel import traverse_soa as trs
    from gdpt_tpu.scene import model as M, build
    from gdpt_tpu.core import transform as xf

    rng = np.random.RandomState(11)
    ntris = 220
    v0, v1, v2 = _soup(ntris, seed=11)
    mesh = M.TriangleMesh(
        positions=np.concatenate([v0, v1, v2]).astype(np.float32),
        indices=np.stack([np.arange(ntris), np.arange(ntris) + ntris,
                          np.arange(ntris) + 2 * ntris], -1).astype(np.int32),
        material_id=0)
    spheres = [M.Sphere(center=np.array([0.0, 0.0, 6.0 + 3 * i]),
                        radius=1.0 + 0.3 * i, material_id=0)
               for i in range(3)]
    cam = M.Camera(xf.look_at([0, 0, 40], [0, 0, 0], [0, 1, 0]),
                   45.0, 16, 16)
    lights = [M.DiffuseAreaLight(shape_id=1, intensity=np.ones(3))]
    opts = M.RenderOptions(integrator="path", samples_per_pixel=1,
                           max_depth=2)
    sc = build.build_scene(cam, [M.Lambertian(0.5)], [mesh] + spheres,
                           lights, options=opts)
    static = sc.static
    assert not static.use_brute_force and static.n_spheres == 3
    from gdpt_tpu.integrators import path_soa as ps
    g = ps.scene_soa_from_aos(sc).geom
    assert g.packet is not None or g.sup16 is not None
    # Spheres must be absent from the built tables' leaves.
    nr = 512
    org = rng.randn(nr, 3).astype(np.float32) * 2
    org[:, 2] = 45.0
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (nr, 1))
    d += rng.randn(nr, 3).astype(np.float32) * 0.05
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hit, gn = trs.intersect_soa_gn(static, g, _v3(org), _v3(d), 1e-4, 1e9)
    bhit = trs.intersect_brute_soa(static, g, _v3(org), _v3(d), 1e-4,
                                   jnp.full(nr, 1e9))
    assert (np.asarray(hit.prim_id) == np.asarray(bhit.prim_id)).all()
    good = np.asarray(bhit.prim_id) >= 0
    assert good.mean() > 0.15
    sph_hits = np.asarray(bhit.prim_id) >= static.n_tris
    assert sph_hits.any(), "test geometry must produce sphere hits"
    np.testing.assert_allclose(np.asarray(hit.t)[good],
                               np.asarray(bhit.t)[good],
                               rtol=1e-3, atol=1e-4)
    if gn is not None:
        gnn = np.stack([np.asarray(gn.x), np.asarray(gn.y),
                        np.asarray(gn.z)], -1)
        gnn = gnn / np.maximum(
            np.linalg.norm(gnn, axis=1, keepdims=True), 1e-20)
        pos = org + d * np.asarray(hit.t)[:, None]
        for i, s in enumerate(spheres):
            m = np.asarray(hit.prim_id) == static.n_tris + i
            if m.any():
                ref = (pos[m] - s.center) / s.radius
                np.testing.assert_allclose(gnn[m], ref, atol=1e-3)
    occ = trs.occluded_soa(static, g, _v3(org), _v3(d), 1e-4,
                           jnp.full(nr, 1e9))
    np.testing.assert_array_equal(np.asarray(occ) > 0, good)


@pytest.mark.parametrize("wide", [False, True])
def test_packet_table_structural_invariants(wide):
    """Host-only checks of the collapsed table at BOTH supernode widths:
    every primitive appears exactly once among root-reachable leaf
    groups, groups respect the leaf cap, and child bboxes contain their
    leaf groups' triangles. Wide (32-child) supernodes span two rows —
    children 16-31 live in row A+1, validity uses all 32 bits of row A
    col 120, and leaf groups chain S_LEAF=2 rows (24 prims)."""
    v0, v1, v2 = _soup(900, seed=5)
    e1, e2 = v1 - v0, v2 - v0
    arr = gbvh.build_bvh(v0, v1, v2)
    tab = pt.build_packet_table(
        arr.bbox_min, arr.bbox_max, arr.first, arr.count, arr.miss,
        arr.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32), wide=wide)
    assert tab is not None
    assert (tab.wide_dummy is not None) == wide
    t = np.asarray(tab.table)
    EMPTY = np.int32(2**31 - 1)
    n_kids = 32 if wide else 16
    s_leaf = 2 if wide else 1
    seen = set()
    stack = [0]
    leaf_of_parent = []  # (bbox_row, slot_in_row, leaf_start_row)
    while stack:
        r = stack.pop()
        if r in seen:
            continue
        seen.add(r)
        mask = int(np.uint32(np.int32(t[r, 120])))
        for k in range(n_kids):
            if not ((mask >> k) & 1):
                continue
            br = r + (k >> 4)          # row A or B of the supernode
            ref = int(t[br, 96 + (k & 15)])
            if ref == EMPTY:
                continue
            if ref >= 0:
                stack.append(ref)
            else:
                inv = int(np.uint32(np.int32(~np.int32(ref))))
                start = inv & ((1 << pt._CHAIN_SHIFT) - 1)
                nrows = inv >> pt._CHAIN_SHIFT
                assert nrows == s_leaf
                leaf_of_parent.append((br, k & 15, start))
    prims = []
    for pr, kk, lr in leaf_of_parent:
        ids = np.concatenate([t[lr + rr, 108:120] for rr in range(s_leaf)])
        ids = ids[ids >= 0]
        assert ids.shape[0] <= pt.LEAF_TRIS * s_leaf
        prims.extend(int(i) for i in ids)
        # Child bbox must contain the group's triangles.
        blo = t[pr, kk * 6: kk * 6 + 3].view(np.float32)
        bhi = t[pr, kk * 6 + 3: kk * 6 + 6].view(np.float32)
        for pid in ids:
            verts = np.stack([v0[pid], v1[pid], v2[pid]])
            assert (verts.min(0) >= blo - 1e-4).all()
            assert (verts.max(0) <= bhi + 1e-4).all()
    assert sorted(prims) == list(range(900))


def test_many_spheres_in_table(monkeypatch):
    """Scenes with > SPH_BRUTE_MAX spheres carry them INSIDE the walk
    tables (leaf_skip_from=None). Bin-packed leaf-group bboxes must
    bound sphere rows as center +- r on all axes — the tri-style
    (v0, v0+e1, v0+e2) corners collapse a sphere row to a point plus r
    along +x, silently culling hits (round-3 advisor finding)."""
    monkeypatch.setenv("GDPT_PACKET", "1")
    from gdpt_tpu.accel import traverse_soa as trs
    from gdpt_tpu.scene import model as M, build
    from gdpt_tpu.core import transform as xf

    rng = np.random.RandomState(7)
    ntris = 220
    v0, v1, v2 = _soup(ntris, seed=7)
    mesh = M.TriangleMesh(
        positions=np.concatenate([v0, v1, v2]).astype(np.float32),
        indices=np.stack([np.arange(ntris), np.arange(ntris) + ntris,
                          np.arange(ntris) + 2 * ntris], -1).astype(np.int32),
        material_id=0)
    # 12 spheres (> SPH_BRUTE_MAX) scattered around AND off the +x axis
    # of their centers, so a degenerate group bbox would cull them.
    centers = rng.randn(12, 3).astype(np.float32) * 4
    centers[:, 2] = np.linspace(4.0, 26.0, 12)
    spheres = [M.Sphere(center=centers[i], radius=0.8, material_id=0)
               for i in range(12)]
    cam = M.Camera(xf.look_at([0, 0, 40], [0, 0, 0], [0, 1, 0]),
                   45.0, 16, 16)
    lights = [M.DiffuseAreaLight(shape_id=1, intensity=np.ones(3))]
    opts = M.RenderOptions(integrator="path", samples_per_pixel=1,
                           max_depth=2)
    sc = build.build_scene(cam, [M.Lambertian(0.5)], [mesh] + spheres,
                           lights, options=opts)
    static = sc.static
    assert not static.use_brute_force and static.n_spheres == 12
    from gdpt_tpu.integrators import path_soa as ps
    g = ps.scene_soa_from_aos(sc).geom
    assert g.packet is not None
    nr = 1024
    org = rng.randn(nr, 3).astype(np.float32) * 3
    org[:, 2] = 45.0
    d = -org + centers[rng.randint(0, 12, nr)] \
        + rng.randn(nr, 3).astype(np.float32) * 1.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hit, _ = trs.intersect_soa_gn(static, g, _v3(org), _v3(d), 1e-4, 1e9)
    bhit = trs.intersect_brute_soa(static, g, _v3(org), _v3(d), 1e-4,
                                   jnp.full(nr, 1e9))
    assert (np.asarray(hit.prim_id) == np.asarray(bhit.prim_id)).all()
    good = np.asarray(bhit.prim_id) >= 0
    sph_hits = np.asarray(bhit.prim_id) >= static.n_tris
    assert sph_hits.mean() > 0.2, "test geometry must often hit spheres"
    np.testing.assert_allclose(np.asarray(hit.t)[good],
                               np.asarray(bhit.t)[good],
                               rtol=1e-3, atol=1e-4)
    occ = trs.occluded_soa(static, g, _v3(org), _v3(d), 1e-4,
                           jnp.full(nr, 1e9))
    np.testing.assert_array_equal(np.asarray(occ) > 0, good)
    # Structural check (deterministic, unlike the ray sample): every
    # leaf group's stored parent bbox must contain center +- r of each
    # sphere prim packed in that group.
    t = np.asarray(g.packet.table)
    EMPTY = np.int32(2**31 - 1)
    seen, stack, leaf_of_parent = set(), [0], []
    while stack:
        r = stack.pop()
        if r in seen:
            continue
        seen.add(r)
        mask = int(t[r, 120])
        for k in range(16):
            if not ((mask >> k) & 1):
                continue
            ref = int(t[r, 96 + k])
            if ref == EMPTY:
                continue
            if ref >= 0:
                stack.append(ref)
            else:
                leaf_of_parent.append((r, k, int((~ref) & ((1 << 22) - 1))))
    sph_seen = 0
    for pr, k, lr in leaf_of_parent:
        ids = t[lr, 108:120]
        ids = ids[ids >= static.n_tris]
        blo = t[pr, k * 6: k * 6 + 3].view(np.float32)
        bhi = t[pr, k * 6 + 3: k * 6 + 6].view(np.float32)
        for pid in ids:
            c, r_ = centers[pid - static.n_tris], 0.8
            assert (c - r_ >= blo - 1e-4).all(), "sphere bbox too tight"
            assert (c + r_ <= bhi + 1e-4).all(), "sphere bbox too tight"
            sph_seen += 1
    assert sph_seen == 12


def test_presplit_refs_match_brute_force():
    """Pre-split reference tables (early split clipping) are exact:
    duplicated full-triangle rows + clipped group bboxes must reproduce
    brute-force closest hits. (Measured a visit-count LOSS on sponza —
    README dead-ends — so presplit is not wired into production; this
    guards the infrastructure's correctness.)"""
    v0, v1, v2 = _soup(900, seed=13)
    e1, e2 = v1 - v0, v2 - v0
    rp, rbmin, rbmax = gbvh.presplit_refs(v0, v1, v2, budget_factor=1.0)
    assert rp.shape[0] > 900  # splits actually happened
    arr = gbvh.build_bvh_over_refs(rbmin, rbmax)
    tab = pt.build_packet_table(
        arr.bbox_min, arr.bbox_max, arr.first, arr.count, arr.miss,
        arr.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32),
        prim_of_ref=rp, ref_bbox_min=rbmin, ref_bbox_max=rbmax)
    assert tab is not None
    org, d = _rays(1024, seed=14)
    t, prim, u, v, gn = pt.intersect_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True)
    bt, bp = _brute(v0, e1, e2, org, d)
    prim = np.asarray(prim)
    assert (prim == bp).mean() == 1.0
    good = bp >= 0
    assert good.mean() > 0.1
    np.testing.assert_allclose(np.asarray(t)[good], bt[good],
                               rtol=1e-3, atol=1e-4)
    occ = np.asarray(pt.occluded_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True))
    assert (occ == (bp >= 0)).all()


def test_masked_stack_matches_brute_force():
    """masked_push=True opts into the masked-stack traversal
    (one (row, child-mask) entry per super + ctz peel) — measured
    slower on TPU v5e but kept as an A/B knob; it must stay
    estimator-identical to the legacy ordered push. Selected via the
    explicit parameter (NOT the env, which is read once at import) so
    this test deterministically exercises the masked kernel."""
    v0, v1, v2 = _soup(1200, seed=21)
    tab, e1, e2 = _table(v0, v1, v2)
    assert tab is not None
    org, d = _rays(1024, seed=22)
    t, prim, u, v, gn = pt.intersect_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True, masked_push=True)
    bt, bp = _brute(v0, e1, e2, org, d)
    prim = np.asarray(prim)
    assert (prim == bp).mean() == 1.0
    good = bp >= 0
    np.testing.assert_allclose(np.asarray(t)[good], bt[good],
                               rtol=1e-3, atol=1e-4)
    occ = np.asarray(pt.occluded_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, interpret=True, masked_push=True))
    assert (occ == (bp >= 0)).all()


def test_dual_kernel_matches_solo():
    """dual=True opts into the dual-packet kernel (two packets per grid
    step, interleaved visit bodies) — measured slower on TPU v5e
    (tools/ab_dual_kernel.py: pool 2.20 vs 2.56 Mrays/s) but kept as
    an A/B knob; it must stay trace-identical to the solo kernel.
    Selected via the explicit _trace_packets parameter (the env is
    read once at import). Odd packet counts exercise the dead-padding
    packet the dual grid adds."""
    v0, v1, v2 = _soup(1200, seed=21)
    tab, e1, e2 = _table(v0, v1, v2)
    assert tab is not None
    P = pt.PACKET_ROWS

    def flat(org, d, n):
        cols = [jnp.asarray(org[:, i].reshape(-1, 128)) for i in range(3)]
        cols += [jnp.asarray(d[:, i].reshape(-1, 128)) for i in range(3)]
        tn = jnp.full_like(cols[0], 1e-4)
        tf = jnp.full_like(cols[0], 1e9)
        return cols + [tn, tf]

    for n_pack, any_hit in ((2, False), (3, False), (3, True)):
        n = P * n_pack * 128
        org, d = _rays(n, seed=22)
        args = flat(org, d, n)
        t_s, p_s = pt._trace_packets(tab, *args, any_hit=any_hit,
                                     interpret=True, dual=False)
        t_d, p_d = pt._trace_packets(tab, *args, any_hit=any_hit,
                                     interpret=True, dual=True)
        p_s, p_d = np.asarray(p_s), np.asarray(p_d)
        if any_hit:
            assert ((p_s >= 0) == (p_d >= 0)).all()
        else:
            assert (p_s == p_d).all()
            good = p_s >= 0
            np.testing.assert_allclose(np.asarray(t_s)[good],
                                       np.asarray(t_d)[good],
                                       rtol=1e-6, atol=1e-7)


def test_wide_table_matches_brute_force():
    """wide=True builds 32-child supernodes across two rows (the
    GDPT_PACKET_WIDE=1 kernel class): closest-hit, any-hit and the
    two-phase entry walk must all reproduce brute force, and the wide
    tree must actually be wider (fewer supernode units than 16-wide
    has rows)."""
    v0, v1, v2 = _soup(1500, seed=31)
    e1, e2 = v1 - v0, v2 - v0
    arr = gbvh.build_bvh(v0, v1, v2)
    mk = lambda wide: pt.build_packet_table(
        arr.bbox_min, arr.bbox_max, arr.first, arr.count, arr.miss,
        arr.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32), wide=wide)
    tab16, tab32 = mk(False), mk(True)
    assert tab16.wide_dummy is None and tab32.wide_dummy is not None
    org, d = _rays(1024, seed=32)
    bt, bp = _brute(v0, e1, e2, org, d)
    t, prim, u, v, gn = pt.intersect_packet(
        tab32, _v3(org), _v3(d), 1e-4, 1e9, interpret=True)
    prim = np.asarray(prim)
    assert (prim == bp).mean() == 1.0
    good = bp >= 0
    assert good.mean() > 0.15
    np.testing.assert_allclose(np.asarray(t)[good], bt[good],
                               rtol=1e-3, atol=1e-4)
    occ = np.asarray(pt.occluded_packet(
        tab32, _v3(org), _v3(d), 1e-4, 1e9, interpret=True))
    assert (occ == (bp >= 0)).all()
    t2, p2, _, _, _ = pt.trace_two_phase(
        tab32, _v3(org), _v3(d), 1e-4, 1e9, interpret=True)
    assert (np.asarray(p2) == bp).mean() == 1.0


def test_wide_table_sphere_slots_and_padding():
    """Wide tables with in-table spheres and a non-multiple-of-1024
    ray count (padded tail + sphere leaf branch under the 32-wide
    kernel)."""
    v0, v1, v2 = _soup(200, seed=33)
    e1, e2 = v1 - v0, v2 - v0
    sc = np.array([[0.0, 0.0, 20.0]], np.float32)
    sr = np.array([2.0], np.float32)
    arr2 = gbvh.build_bvh(v0, v1, v2, sph_center=sc, sph_radius=sr)
    tab = pt.build_packet_table(
        arr2.bbox_min, arr2.bbox_max, arr2.first, arr2.count, arr2.miss,
        arr2.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32), sph_center=sc, sph_radius=sr, wide=True)
    assert tab is not None and tab.wide_dummy is not None
    nr = 777  # pads to whole packets; tail lanes must stay dead
    org = np.tile(np.array([[0.0, 0.0, 40.0]], np.float32), (nr, 1))
    org[:, 0] = np.linspace(-1.5, 1.5, nr)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (nr, 1))
    t, prim, u, v, gn = pt.intersect_packet(
        tab, _v3(org), _v3(d), 1e-4, 1e9, n_tris=200, interpret=True)
    prim = np.asarray(prim)
    t = np.asarray(t)
    inside = np.abs(org[:, 0]) < 1.99
    assert (prim[inside] == 200).all()
    np.testing.assert_allclose(
        t[inside], 20.0 - np.sqrt(4.0 - org[inside, 0] ** 2), rtol=1e-4)
