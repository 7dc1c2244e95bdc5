import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.accel import bvh as gbvh
from gdpt_tpu.accel import traverse as tr
from gdpt_tpu.core.dtypes import BIG


def _random_tri_soup(n, seed=0, spread=10.0):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, 3) * spread
    v0 = base
    v1 = base + rng.randn(n, 3)
    v2 = base + rng.randn(n, 3)
    return v0, v1, v2


def _make_geom(v0, v1, v2, centers=None, radii=None, with_bvh=True):
    centers = np.zeros((0, 3)) if centers is None else np.asarray(centers)
    radii = np.zeros((0,)) if radii is None else np.asarray(radii)
    if with_bvh:
        b = gbvh.build_bvh(
            v0, v1, v2,
            centers if len(centers) else None,
            radii if len(radii) else None,
        )
    else:
        z3 = np.zeros((0, 3), np.float32)
        zi = np.zeros((0,), np.int32)
        b = gbvh.BVHArrays(z3, z3, zi, zi, zi, zi)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    i32 = lambda a: jnp.asarray(a, jnp.int32)
    return tr.Geometry(
        f32(v0), f32(v1 - v0), f32(v2 - v0),
        i32(np.zeros(len(v0))),
        f32(centers), f32(radii), i32(np.zeros(len(centers))),
        f32(b.bbox_min), f32(b.bbox_max), i32(b.first), i32(b.count),
        i32(b.miss), i32(b.prim_order),
    )


def test_bvh_structure_valid():
    v0, v1, v2 = _random_tri_soup(500)
    b = gbvh.build_bvh(v0, v1, v2)
    n_nodes = len(b.count)
    assert sorted(b.prim_order.tolist()) == list(range(500))
    # Each leaf's range is disjoint and covers all prims.
    leaves = b.count > 0
    assert b.count[leaves].sum() == 500
    assert (b.count <= gbvh.LEAF_SIZE).all()
    # Miss links point strictly forward.
    assert (b.miss > np.arange(n_nodes)).all()
    assert (b.miss <= n_nodes).all()


def test_bvh_matches_brute_force():
    v0, v1, v2 = _random_tri_soup(700, seed=1)
    centers = np.random.RandomState(2).randn(9, 3) * 8
    radii = np.abs(np.random.RandomState(3).randn(9)) + 0.5
    geom = _make_geom(v0, v1, v2, centers, radii)

    n_rays = 2000
    rng = np.random.RandomState(4)
    org = jnp.asarray(rng.randn(n_rays, 3) * 15, jnp.float32)
    d = rng.randn(n_rays, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    hit_bvh = jax.vmap(lambda o, dd: tr.intersect_bvh(geom, o, dd, 1e-3, BIG))(org, d)
    hit_bf = jax.vmap(lambda o, dd: tr.intersect_brute(geom, o, dd, 1e-3, BIG))(org, d)

    valid_bvh = np.asarray(hit_bvh.prim_id >= 0)
    valid_bf = np.asarray(hit_bf.prim_id >= 0)
    np.testing.assert_array_equal(valid_bvh, valid_bf)
    # Distances must agree (prim ids can differ on exact ties).
    tb = np.asarray(hit_bvh.t)[valid_bvh]
    tf = np.asarray(hit_bf.t)[valid_bf]
    np.testing.assert_allclose(tb, tf, rtol=1e-4, atol=1e-4)
    agree = (np.asarray(hit_bvh.prim_id) == np.asarray(hit_bf.prim_id))[valid_bvh]
    assert agree.mean() > 0.99


def test_occluded_matches_intersect():
    v0, v1, v2 = _random_tri_soup(300, seed=5)
    geom = _make_geom(v0, v1, v2)
    rng = np.random.RandomState(6)
    org = jnp.asarray(rng.randn(500, 3) * 15, jnp.float32)
    d = rng.randn(500, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    tfar = 25.0
    occ = jax.vmap(lambda o, dd: tr.occluded_bvh(geom, o, dd, 1e-3, tfar))(org, d)
    hit = jax.vmap(lambda o, dd: tr.intersect_bvh(geom, o, dd, 1e-3, tfar))(org, d)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hit.prim_id >= 0))


def test_single_triangle_hit_position():
    # In-code one-triangle scene (reference test: src/tests/intersection.cpp).
    v0 = np.array([[0.0, 0.0, 1.0]])
    v1 = np.array([[1.0, 0.0, 1.0]])
    v2 = np.array([[0.0, 1.0, 1.0]])
    geom = _make_geom(v0, v1, v2)
    hit = tr.intersect_bvh(
        geom, jnp.array([0.2, 0.3, 0.0]), jnp.array([0.0, 0.0, 1.0]), 0.0, BIG
    )
    assert int(hit.prim_id) == 0
    np.testing.assert_allclose(float(hit.t), 1.0, atol=1e-6)
    np.testing.assert_allclose([float(hit.u), float(hit.v)], [0.2, 0.3], atol=1e-6)


def test_sphere_roots():
    geom = _make_geom(
        np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 3)),
        centers=[[0.0, 0.0, 5.0]], radii=[1.0],
    )
    hit = tr.intersect_brute(
        geom, jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]), 0.0, BIG
    )
    np.testing.assert_allclose(float(hit.t), 4.0, atol=1e-5)
    # From inside the sphere: pick the far root.
    hit2 = tr.intersect_brute(
        geom, jnp.array([0.0, 0.0, 5.0]), jnp.array([0.0, 0.0, 1.0]), 1e-4, BIG
    )
    np.testing.assert_allclose(float(hit2.t), 1.0, atol=1e-5)


