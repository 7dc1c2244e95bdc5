"""16-wide supernode BVH (accel/super16) vs brute force ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from gdpt_tpu.accel import bvh as gbvh
from gdpt_tpu.accel import super16
from gdpt_tpu.core.soa import V3


def _soup(nt, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, size=(nt, 3))
    v0 = centers + rng.normal(0, 0.3, (nt, 3))
    v1 = centers + rng.normal(0, 0.3, (nt, 3))
    v2 = centers + rng.normal(0, 0.3, (nt, 3))
    return v0, v1, v2


def _brute(v0, e1, e2, org, d, tnear=1e-4):
    o = org[:, None, :]
    dd = d[:, None, :]
    V0, E1, E2 = (a[None].astype(np.float32) for a in (v0, e1, e2))
    pvec = np.cross(dd, E2)
    det = np.sum(E1 * pvec, -1)
    inv = np.where(det != 0, 1.0 / np.where(det != 0, det, 1), 0.0)
    tvec = o - V0
    uu = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, E1)
    vv = np.sum(dd * qvec, -1) * inv
    tt = np.sum(E2 * qvec, -1) * inv
    hit = (det != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt >= tnear)
    tt = np.where(hit, tt, np.inf)
    i = np.argmin(tt, 1)
    lane = np.arange(org.shape[0])
    ok = np.isfinite(tt[lane, i])
    return np.where(ok, tt[lane, i], 1e9), np.where(ok, i, -1)


def _rays(nr, seed=1):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-15, 15, (nr, 3)).astype(np.float32)
    tgt = rng.uniform(-10, 10, (nr, 3)).astype(np.float32)
    d = tgt - org
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return org, d


def _v3(a):
    return V3(*(jnp.asarray(a[:, i]) for i in range(3)))


import pytest


@pytest.fixture(autouse=True)
def _fast_unroll(monkeypatch):
    # Halve the while-body size: compile time dominates these tests and
    # the loop logic is identical at any unroll factor.
    monkeypatch.setattr(super16, "_UNROLL", 1)


def test_super16_matches_brute_force():
    v0, v1, v2 = _soup(3000)
    e1, e2 = v1 - v0, v2 - v0
    arr = gbvh.build_bvh(v0, v1, v2)
    sup = super16.build_super16(
        arr.bbox_min, arr.bbox_max, arr.first, arr.count, arr.miss,
        arr.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32))
    assert sup is not None
    org, d = _rays(2048)
    t, prim, u, v, gn = jax.jit(super16.intersect_super16)(
        sup, _v3(org), _v3(d), 1e-4, 1e9)
    blocked = jax.jit(super16.occluded_super16)(
        sup, _v3(org), _v3(d), 1e-4, 1e9)
    bt, bp = _brute(v0, e1, e2, org, d)
    t, prim, blocked = np.asarray(t), np.asarray(prim), np.asarray(blocked)
    np.testing.assert_array_equal(prim >= 0, bp >= 0)
    both = (prim >= 0)
    np.testing.assert_allclose(t[both], bt[both], rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(blocked, bp >= 0)
    # Geometric normal of the hit primitive (unnormalized e1 x e2).
    hit_ids = prim[both]
    gn_ref = np.cross(e1[hit_ids], e2[hit_ids]).astype(np.float32)
    gn_got = np.stack([np.asarray(gn.x)[both], np.asarray(gn.y)[both],
                       np.asarray(gn.z)[both]], 1)
    cos = np.sum(gn_ref * gn_got, 1) / (
        np.linalg.norm(gn_ref, axis=1) * np.linalg.norm(gn_got, axis=1))
    assert np.all(cos > 0.999)


def test_super16_with_spheres():
    v0, v1, v2 = _soup(500)
    e1, e2 = v1 - v0, v2 - v0
    rng = np.random.default_rng(3)
    sc = rng.uniform(-10, 10, (40, 3))
    sr = rng.uniform(0.3, 1.2, (40,))
    arr = gbvh.build_bvh(v0, v1, v2, sc, sr)
    sup = super16.build_super16(
        arr.bbox_min, arr.bbox_max, arr.first, arr.count, arr.miss,
        arr.prim_order, v0.astype(np.float32), e1.astype(np.float32),
        e2.astype(np.float32), sc, sr)
    assert sup is not None
    org, d = _rays(768, seed=5)
    isect = jax.jit(super16.intersect_super16, static_argnames=("n_tris",))
    t, prim, u, v, gn = isect(sup, _v3(org), _v3(d), 1e-4, 1e9, 500)

    # Reference: brute triangles + brute spheres.
    bt, bp = _brute(v0, e1, e2, org, d)
    o = org[:, None, :]
    dd = d[:, None, :]
    vv = o - sc[None].astype(np.float32)
    a = np.sum(dd * dd, -1)
    tm = -np.sum(dd * vv, -1) / a
    m = vv + dd * tm[..., None]
    disc = sr[None] ** 2 - np.sum(m * m, -1)
    dt = np.sqrt(np.maximum(disc, 0) / a)
    t0, t1 = tm - dt, tm + dt
    use_lo = t0 >= 1e-4
    ts = np.where(use_lo, t0, t1)
    hs = (disc >= 0) & (ts >= 1e-4)
    ts = np.where(hs, ts, np.inf)
    js = np.argmin(ts, 1)
    lane = np.arange(org.shape[0])
    t_s = ts[lane, js]
    better = t_s < bt
    bp = np.where(better, 500 + js, bp)
    bt = np.where(better, t_s, bt)

    t, prim = np.asarray(t), np.asarray(prim)
    agree = np.mean((prim >= 0) == (bp >= 0))
    assert agree > 0.999  # f32 grazing-sphere edge lanes allowed
    both = (prim >= 0) & (bp >= 0)
    close = np.abs(t[both] - bt[both]) <= 1e-3 * np.abs(bt[both]) + 1e-3
    assert close.mean() > 0.999


def test_super16_adapts_leaf_size():
    # Tiny cap forces the adaptive leaf fattening path (the sizes keep
    # the adapted L at 16: the compile cost scales with L).
    v0, v1, v2 = _soup(2500, seed=7)
    e1, e2 = v1 - v0, v2 - v0
    arr = gbvh.build_bvh(v0, v1, v2)
    import gdpt_tpu.accel.super16 as s16
    old = s16.MAX_SUPER_ROWS
    s16.MAX_SUPER_ROWS = 20
    try:
        sup = s16.build_super16(
            arr.bbox_min, arr.bbox_max, arr.first, arr.count, arr.miss,
            arr.prim_order, v0.astype(np.float32), e1.astype(np.float32),
            e2.astype(np.float32))
    finally:
        s16.MAX_SUPER_ROWS = old
    assert sup is not None
    assert int(sup.leaf_dummy.shape[0]) > 12  # adaptation engaged
    org, d = _rays(256, seed=9)
    t, prim, *_ = jax.jit(s16.intersect_super16)(
        sup, _v3(org), _v3(d), 1e-4, 1e9)
    bt, bp = _brute(v0, e1, e2, org, d)
    np.testing.assert_array_equal(np.asarray(prim) >= 0, bp >= 0)
