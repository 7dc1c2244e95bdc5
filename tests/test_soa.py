"""Cross-validation of the SoA fast path against the per-ray reference
implementation, plus multi-chip sharding and aux-subsystem tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.accel import traverse as tr
from gdpt_tpu.accel import traverse_soa as trs
from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import BIG
from gdpt_tpu.integrators import path as path_aos
from gdpt_tpu.integrators import path_soa
from gdpt_tpu.integrators import render as R
from gdpt_tpu.scene import presets


def test_threefry_uniform_statistics():
    stream = jnp.arange(100000, dtype=jnp.uint32)
    u0, u1 = soa.uniform2(7, stream, 3)
    u0, u1 = np.asarray(u0), np.asarray(u1)
    assert (u0 >= 0).all() and (u0 < 1).all()
    assert abs(u0.mean() - 0.5) < 5e-3
    assert abs(u1.mean() - 0.5) < 5e-3
    assert abs(np.corrcoef(u0, u1)[0, 1]) < 0.02
    # Different counters decorrelate.
    v0, _ = soa.uniform2(7, stream, 4)
    assert abs(np.corrcoef(u0, np.asarray(v0))[0, 1]) < 0.02


def test_soa_v3_math():
    a = soa.V3(jnp.array([1.0, 0.0]), jnp.array([0.0, 2.0]), jnp.array([0.0, 1.0]))
    b = soa.V3(jnp.array([0.0, 1.0]), jnp.array([1.0, 0.0]), jnp.array([0.0, 0.0]))
    c = soa.cross(a, b)
    np.testing.assert_allclose(np.asarray(c.z), [1.0, -2.0])
    n = soa.normalize(a)
    np.testing.assert_allclose(
        np.asarray(soa.length(n)), [1.0, 1.0], atol=1e-6
    )
    f = soa.coordinate_system(soa.normalize(soa.V3(*map(jnp.atleast_1d, (0.3, -0.5, 0.81)))))
    v = soa.V3(*map(jnp.atleast_1d, (0.2, 0.7, -0.1)))
    back = soa.to_local(f, soa.to_world(f, v))
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(v.x), atol=1e-6)


def test_soa_intersect_matches_aos():
    sc = presets.cornell_box(width=8, height=8, spp=1)
    g_soa = trs.geom_soa_from_aos(sc.device.geom)
    rng = np.random.RandomState(0)
    n = 500
    org = rng.rand(n, 3) * 500
    d = rng.randn(n, 3)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    org_j = jnp.asarray(org, jnp.float32)
    d_j = jnp.asarray(d, jnp.float32)
    hit_aos = jax.vmap(
        lambda o, dd: tr.intersect_brute(sc.device.geom, o, dd, 1e-3, BIG)
    )(org_j, d_j)
    hit_soa = trs.intersect_brute_soa(
        sc.static, g_soa,
        soa.from_rows(org_j), soa.from_rows(d_j), 1e-3, BIG,
    )
    np.testing.assert_array_equal(
        np.asarray(hit_aos.prim_id), np.asarray(hit_soa.prim_id)
    )
    valid = np.asarray(hit_aos.prim_id) >= 0
    np.testing.assert_allclose(
        np.asarray(hit_aos.t)[valid], np.asarray(hit_soa.t)[valid], rtol=1e-5
    )


def test_soa_bvh_matches_brute():
    sc = presets.cornell_box(width=8, height=8, spp=1)
    # Rebuild with BVH forced.
    from gdpt_tpu.scene import build as gbuild
    rng = np.random.RandomState(1)
    n = 400
    org = rng.rand(n, 3) * 500
    d = rng.randn(n, 3)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    sc2 = presets.cornell_box(width=8, height=8, spp=1)
    # force_bvh path: construct geometry with BVH by rebuilding
    from gdpt_tpu.scene.presets import cornell_box
    import gdpt_tpu.scene.build as B

    scene_bvh = None
    # Use build_scene with force_bvh via parser helper on presets: rebuild manually
    from gdpt_tpu.scene import model as M
    from gdpt_tpu.core import transform as xf

    # simpler: flip the static flag and build BVH arrays directly
    from gdpt_tpu.accel import bvh as gbvh
    g = sc2.device.geom
    b = gbvh.build_bvh(
        np.asarray(g.tri_v0), np.asarray(g.tri_v0 + g.tri_e1), np.asarray(g.tri_v0 + g.tri_e2)
    )
    g2 = g._replace(
        bvh_bbox_min=jnp.asarray(b.bbox_min), bvh_bbox_max=jnp.asarray(b.bbox_max),
        bvh_first=jnp.asarray(b.first), bvh_count=jnp.asarray(b.count),
        bvh_miss=jnp.asarray(b.miss), bvh_prim_order=jnp.asarray(b.prim_order),
    )
    g_soa = trs.geom_soa_from_aos(g2)
    org_j = soa.from_rows(jnp.asarray(org, jnp.float32))
    d_j = soa.from_rows(jnp.asarray(d, jnp.float32))
    h_bvh = trs.intersect_bvh_soa(sc2.static, g_soa, org_j, d_j, 1e-3, BIG)
    h_bf = trs.intersect_brute_soa(sc2.static, g_soa, org_j, d_j, 1e-3, BIG)
    valid = np.asarray(h_bf.prim_id) >= 0
    np.testing.assert_array_equal(
        np.asarray(h_bvh.prim_id) >= 0, valid
    )
    np.testing.assert_allclose(
        np.asarray(h_bvh.t)[valid], np.asarray(h_bf.t)[valid], rtol=1e-4
    )


def test_soa_path_matches_aos_furnace():
    sc = presets.furnace_sphere(albedo=0.5, emission=1.0, width=16, height=16,
                                spp=128, max_depth=-1)
    assert path_soa.supports_soa(sc)
    img = path_soa.render_soa(sc, seed=2)
    c = img.shape[0] // 2
    assert abs(img[c - 2 : c + 2, c - 2 : c + 2].mean() - 0.5) < 0.02
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-4)


def test_soa_path_matches_aos_cbox():
    # NOTE: this scene's image mean has ~1.5% seed-to-seed spread even at
    # 512 spp (specular fireflies), so the mean gate is 6% at 128 spp.
    sc = presets.cornell_box(width=32, height=32, spp=48, max_depth=4)
    a = path_soa.render_soa(sc, spp=128, seed=5)
    b = R.render_samples(sc, path_aos.trace_path, spp=128, seed=6)
    assert abs(a.mean() - b.mean()) / b.mean() < 0.06, (a.mean(), b.mean())
    # Pixel-level agreement within MC noise on a blurred comparison.
    ka = a.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3))
    kb = b.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3))
    rel = np.abs(ka - kb) / (kb + 1e-2)
    assert np.quantile(rel, 0.9) < 0.25


def test_render_dispatch_uses_soa_for_cbox():
    sc = presets.cornell_box(width=16, height=16, spp=8, max_depth=3)
    img = R.render(sc, seed=1)
    assert np.isfinite(img).all() and img.max() > 0


def test_sharded_render_matches_single_device():
    from gdpt_tpu.parallel import sharding

    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual cpu devices"
    mesh = sharding.make_mesh(jax.devices()[:8])
    sc = presets.cornell_box(width=16, height=16, spp=8, max_depth=3)
    img_sharded = sharding.render_samples_sharded(
        sc, path_aos.trace_path, mesh, spp=8, seed=11
    )
    img_single = R.render_samples(sc, path_aos.trace_path, spp=8, seed=11)
    np.testing.assert_allclose(img_sharded, img_single, rtol=1e-4, atol=1e-5)


def test_checkpoint_resume(tmp_path):
    from gdpt_tpu.utils import checkpoint

    sc = presets.cornell_box(width=8, height=8, spp=8, max_depth=3)
    path = str(tmp_path / "ck.npz")
    full = checkpoint.render_with_checkpoints(sc, spp=8, every=4, path=path)
    # Restart from the checkpoint: result identical when resuming at 8/8.
    resumed = checkpoint.render_with_checkpoints(sc, spp=8, every=4, path=path)
    np.testing.assert_allclose(full, resumed, atol=1e-6)


def test_mipmap_constant_invariance():
    # Constant-image mip lookup is level-invariant (reference test:
    # src/tests/mipmap.cpp).
    from gdpt_tpu.scene import textures as gtex

    img = np.full((16, 16, 3), 0.7, np.float32)
    pool = gtex.build_texture_pool([img], 3)
    for level in [0.0, 0.5, 1.7, 3.2]:
        val = gtex.lookup_trilinear(
            pool, jnp.asarray(0), jnp.asarray(0.3), jnp.asarray(0.8),
            jnp.asarray(level),
        )
        np.testing.assert_allclose(np.asarray(val), 0.7, atol=1e-5)


def test_soa_full_material_stack_matches_aos():
    """veach_mi-style scene: rough plastic plates + sphere lights through
    the SoA material dispatch vs the per-ray oracle."""
    import os

    path = "/root/reference/scenes/veach_mi/mi.xml"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference scenes not mounted")
    from gdpt_tpu.scene import parser

    sc, _ = parser.parse_scene(path, width=48, height=32, spp=4)
    assert path_soa.supports_soa(sc)
    a = path_soa.render_soa(sc, spp=48, seed=1)
    b = R.render_samples(sc, path_aos.trace_path, spp=48, seed=2)
    assert np.isfinite(a).all()
    # High-variance scene: compare low-frequency content.
    ka = a.reshape(8, 4, 12, 4, 3).mean(axis=(1, 3))
    kb = b.reshape(8, 4, 12, 4, 3).mean(axis=(1, 3))
    rel = np.abs(ka - kb) / (kb + 5e-2)
    assert np.quantile(rel, 0.8) < 0.25, np.quantile(rel, 0.8)


def test_soa_disney_sphere_scene():
    from gdpt_tpu.core import transform as xf
    from gdpt_tpu.scene import build
    from gdpt_tpu.scene import model as M

    materials = [
        M.DisneyBSDF(base_color=np.array([0.8, 0.4, 0.2]), metallic=0.3,
                     roughness=0.4, clearcoat=0.5, sheen=0.3,
                     specular_transmission=0.2),
        M.Lambertian(np.zeros(3)),
    ]
    shapes = [
        M.Sphere(center=np.zeros(3), radius=1.0, material_id=0),
        M.Sphere(center=np.array([0.0, 4.0, 0.0]), radius=1.0,
                 material_id=1, area_light_id=0),
    ]
    lights = [M.DiffuseAreaLight(1, np.full(3, 20.0))]
    cam = M.Camera(xf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 45.0, 24, 24)
    opts = M.RenderOptions(integrator="path", samples_per_pixel=16, max_depth=5)
    sc = build.build_scene(cam, materials, shapes, lights, options=opts)
    assert path_soa.supports_soa(sc)
    a = path_soa.render_soa(sc, seed=3)
    b = R.render_samples(sc, path_aos.trace_path, spp=16, seed=4)
    assert np.isfinite(a).all() and (a >= 0).all()
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-3) < 0.15, (
        a.mean(), b.mean())


def _img_env_scene(env, mat=None, spp=64, res=24, max_depth=3):
    from gdpt_tpu.core import transform as xf
    from gdpt_tpu.scene import build
    from gdpt_tpu.scene import model as M

    shapes = [
        M.Sphere(center=np.zeros(3), radius=1.0, material_id=0),
        M.TriangleMesh(
            positions=np.array(
                [[-6, -1, -6], [6, -1, -6], [6, -1, 6], [-6, -1, 6]], np.float32
            ),
            indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32), material_id=0,
        ),
    ]
    lights = [M.Envmap(texture=M.ImageTexture(env), scale=1.0, to_world=np.eye(4))]
    cam = M.Camera(xf.look_at([0, 1.5, -5], [0, 0, 0], [0, 1, 0]), 45.0, res, res)
    opts = M.RenderOptions(integrator="path", samples_per_pixel=spp, max_depth=max_depth)
    from gdpt_tpu.scene import model as MM
    m = mat if mat is not None else MM.Lambertian(0.5)
    return build.build_scene(cam, [m], shapes, lights, options=opts)


def test_soa_envmap_sampler_matches_per_ray():
    """envmap_sample_dir draws texels from the same luminance-weighted
    distribution as the per-ray CDF sampler (alias table vs binary
    search — identical law, different u->texel mapping), and its pdf /
    emission agree bit-for-bit with the per-ray oracle at the sampled
    directions."""
    from gdpt_tpu.ops import lights as L
    from gdpt_tpu.ops import textures_soa as tsoa

    env = np.full((32, 64, 3), 0.05, np.float32)
    env[8:12, 30:36] = np.array([12.0, 10.0, 6.0])
    sc = _img_env_scene(env)
    scsoa = path_soa.scene_soa_from_aos(sc)
    envv = path_soa._env_view(sc.static, scsoa)
    dev = sc.device
    rng = np.random.RandomState(1)
    n = 200_000
    u0 = jnp.asarray(rng.rand(n), jnp.float32)
    u1 = jnp.asarray(rng.rand(n), jnp.float32)
    wdir_s, pdf_s = tsoa.envmap_sample_dir(envv, u0, u1)
    ws = np.stack([np.asarray(wdir_s.x), np.asarray(wdir_s.y), np.asarray(wdir_s.z)], -1)
    # Empirical texel frequencies vs the CDF tables' probabilities.
    h, w = env.shape[:2]
    uu, vv, _ = tsoa.envmap_uv_from_dir(envv, wdir_s)
    x = np.clip((np.asarray(uu) * w).astype(np.int64), 0, w - 1)
    y = np.clip((np.asarray(vv) * h).astype(np.int64), 0, h - 1)
    counts = np.bincount(y * w + x, minlength=h * w).astype(np.float64)
    pm = np.asarray(dev.envmap.dist.pdf_marginals, np.float64)
    pr = np.asarray(dev.envmap.dist.pdf_rows, np.float64)
    expect = (pm[:, None] * pr).ravel()
    expect = expect / expect.sum() * n
    hot = expect > 50
    assert hot.any()
    # ~5-sigma Poisson bound per texel.
    err = np.abs(counts[hot] - expect[hot])
    assert (err < 5.0 * np.sqrt(expect[hot]) + 5.0).all(), (
        err / np.sqrt(expect[hot])).max()
    pdf_ref = jax.vmap(lambda d: L.pdf_point_on_light(
        dev, sc.static, jnp.asarray(0), jnp.zeros(3), -d, jnp.zeros(3)
    ))(jnp.asarray(ws))
    # Match per-lane except where the f32 dir->uv roundtrip lands the
    # jittered sample in the neighboring texel (pdf_s uses the sampled
    # texel's probability; the oracle re-derives the texel from wdir).
    ok = np.isclose(np.asarray(pdf_s), np.asarray(pdf_ref), rtol=2e-4)
    assert ok.mean() > 0.999, ok.mean()
    emit_ref = jax.vmap(lambda d: L.envmap_emission(dev, d, jnp.asarray(0.0)))(
        jnp.asarray(ws)
    )
    emit_s = tsoa.envmap_emission_soa(envv, scsoa.mat_tables.pool3, wdir_s)
    es = np.stack([np.asarray(emit_s.x), np.asarray(emit_s.y), np.asarray(emit_s.z)], -1)
    np.testing.assert_allclose(es, np.asarray(emit_ref), atol=1e-5)


def test_soa_image_envmap_matches_aos():
    """Full SoA render with an image envmap vs the per-ray oracle. Both
    paths now propagate ray-differential spreads into the same du/dw
    footprint + trilinear mip filtering, so the renders are compared
    as-is (the round-2 version had to disable the per-ray filtering)."""
    env = np.zeros((32, 64, 3), np.float32)
    env[:] = 0.05
    env[2:4, :] = 5.0
    sc = _img_env_scene(env, spp=128, max_depth=3)
    assert sc.static.envmap_is_image
    assert path_soa.supports_soa(sc)
    a = path_soa.render_soa(sc, seed=3)
    b = R.render_samples(sc, path_aos.trace_path, spp=128, seed=4)
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.05, (a.mean(), b.mean())


def test_soa_image_texture_matches_aos():
    """Image-textured Lambertian through the SoA fast path vs per-ray."""
    from gdpt_tpu.scene import model as M

    rng = np.random.RandomState(0)
    texd = (0.2 + 0.6 * rng.rand(16, 16, 3)).astype(np.float32)
    env = np.full((8, 16, 3), 0.6, np.float32)
    sc = _img_env_scene(env, mat=M.Lambertian(M.ImageTexture(texd)), spp=64)
    assert sc.static.spec_image_slots[0]
    assert path_soa.supports_soa(sc)
    a = path_soa.render_soa(sc, seed=3)
    b = R.render_samples(sc, path_aos.trace_path, spp=64, seed=4)
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.05, (a.mean(), b.mean())


def test_sharded_gdpt_and_volpath_run():
    from gdpt_tpu.parallel import sharding

    mesh = sharding.make_mesh(jax.devices()[:8])
    scg = presets.cornell_box(width=16, height=16, spp=2, max_depth=3,
                              integrator="gradpath")
    img = sharding.render_gradpath_soa_sharded(scg, mesh, spp=2)
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    scv = presets.volpath_scene(version=6, width=16, height=16, spp=2,
                                max_depth=4, hetero=True)
    img = sharding.render_volpath_soa_sharded(scv, mesh, spp=2)
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()


def test_sharded_bvh_scene_matches_single_device(monkeypatch):
    """Sharded drivers run the SAME banded production loop as the
    single-chip drivers on a BVH (packet-traversal) scene — rays sharded
    over the mesh, scene replicated. Transport RNG is keyed by ray index,
    so sharded and single-device runs are the same estimator (reference
    analog: one tile scheduler serves every integrator,
    src/render.cpp:82-90)."""
    from gdpt_tpu.parallel import sharding

    # Force the banded loop (not wavefront) on the single-device run so
    # both sides take the identical code path.
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    mesh = sharding.make_mesh(jax.devices()[:8])
    # The gradpath (5-path) driver is the heaviest sharded program and
    # the flagship config; the plain-path sharded equivalence is already
    # covered on a brute-force scene (test_sharded_render_matches_...),
    # and on the CPU test host both BVH scenes walk the same
    # packed-binary backend — so one BVH integrator suffices here.
    scg = presets.cornell_box(width=16, height=16, spp=2, max_depth=3,
                              integrator="gradpath", force_bvh=True)
    assert not scg.static.use_brute_force
    from gdpt_tpu.integrators import gdpt_soa

    ag = sharding.render_gradpath_soa_sharded(scg, mesh, spp=2, seed=9)
    bg = gdpt_soa.render_gradpath_soa(scg, spp=2, seed=9)
    np.testing.assert_allclose(ag, bg, rtol=2e-4, atol=1e-5)


def test_soa_float_texture_matches_aos():
    """Image-textured roughness (float slot) through the SoA fast path
    vs per-ray (reference capability: src/texture.h Texture<Real>)."""
    from gdpt_tpu.scene import model as M

    rng = np.random.RandomState(7)
    rtex = (0.1 + 0.7 * rng.rand(8, 8, 1).astype(np.float32))
    env = np.full((8, 16, 3), 0.6, np.float32)
    mat = M.DisneyMetal(base_color=np.array([0.8, 0.6, 0.4]),
                        roughness=M.ImageTexture(rtex))
    sc = _img_env_scene(env, mat=mat, spp=64)
    assert sc.static.float_tex_slots[0] & 2
    assert path_soa.supports_soa(sc)
    a = path_soa.render_soa(sc, seed=3)
    b = R.render_samples(sc, path_aos.trace_path, spp=64, seed=4)
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.05, (a.mean(), b.mean())


def test_soa_checker_float_texture_matches_aos():
    from gdpt_tpu.scene import model as M

    env = np.full((8, 16, 3), 0.6, np.float32)
    mat = M.DisneyMetal(
        base_color=np.array([0.8, 0.6, 0.4]),
        roughness=M.CheckerboardTexture(0.1, 0.8, uscale=3.0, vscale=3.0),
    )
    sc = _img_env_scene(env, mat=mat, spp=64)
    assert sc.static.float_tex_slots[0] & 1
    a = path_soa.render_soa(sc, seed=3)
    b = R.render_samples(sc, path_aos.trace_path, spp=64, seed=4)
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.05, (a.mean(), b.mean())


def test_path_wavefront_matches_banded(monkeypatch):
    """render_soa's wavefront pool (the default on BVH scenes) is the
    same estimator as the banded loop: identical (pixel, sample)-keyed
    RNG streams, so images agree to accumulation-order float noise."""
    sc = presets.cornell_box(width=16, height=16, spp=3, max_depth=4,
                             force_bvh=True)
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    a = path_soa.render_soa(sc, spp=3, seed=5)
    monkeypatch.setenv("GDPT_WAVEFRONT", "1")
    b = path_soa.render_soa(sc, spp=3, seed=5)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)


def test_volpath_wavefront_matches_banded(monkeypatch):
    """render_volpath_soa's wavefront pool (the default on BVH scenes)
    is the same estimator as the banded loop: the shared per-lane
    bounce body keys RNG on (pixel, sample, bounce, slot) only, so
    pooled lanes at mixed depths reproduce the banded streams exactly
    (ray counts match to the ray)."""
    from gdpt_tpu.integrators import volpath_soa

    sc = presets.volpath_scene(version=6, width=20, height=20, spp=3,
                               max_depth=6, hetero=True,
                               with_diffuse_sphere=True, force_bvh=True)
    assert not sc.static.use_brute_force
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    a, ra = volpath_soa.render_volpath_soa(sc, spp=3, seed=5,
                                           return_stats=True)
    monkeypatch.setenv("GDPT_WAVEFRONT", "1")
    b, rb = volpath_soa.render_volpath_soa(sc, spp=3, seed=5,
                                           return_stats=True)
    assert ra == rb
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)


def test_path_wavefront_tail_compaction_matches_banded(monkeypatch):
    """Tail compaction (live-prefix pool shrink once the work queue
    drains) is pure scheduling: lane identity (pixel, sample) rides
    with the compacted state, so the image matches the banded loop to
    accumulation-order float noise. GDPT_POOL=4096 with a 6400-item
    queue forces the drain tail through at least one shrink bucket."""
    sc = presets.cornell_box(width=16, height=16, spp=25, max_depth=6,
                             force_bvh=True)
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    a = path_soa.render_soa(sc, spp=25, seed=5)
    monkeypatch.setenv("GDPT_WAVEFRONT", "1")
    monkeypatch.setenv("GDPT_POOL", "4096")
    b = path_soa.render_soa(sc, spp=25, seed=5)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)


def test_path_wavefront_pool_sorted_matches_banded(monkeypatch):
    """GDPT_POOL_SORT=1 (morton-permute the lane pool per chunk, trace
    extension rays unsorted) is the same estimator as the banded loop —
    lane identity rides with the state, so only packet composition
    changes."""
    monkeypatch.setenv("GDPT_PACKET", "1")
    sc = presets.cornell_box(width=16, height=16, spp=3, max_depth=4,
                             force_bvh=True)
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    a = path_soa.render_soa(sc, spp=3, seed=5)
    monkeypatch.setenv("GDPT_WAVEFRONT", "1")
    monkeypatch.setenv("GDPT_POOL_SORT", "1")
    b = path_soa.render_soa(sc, spp=3, seed=5)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)
