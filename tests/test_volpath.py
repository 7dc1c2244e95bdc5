"""Volumetric integrator ladder tests, mirroring the version rungs of
scenes/volpath_test/volpath_test{1..6}.xml in the reference."""

import numpy as np
import pytest

from gdpt_tpu.integrators import render as R
from gdpt_tpu.scene import presets


def test_v1_absorption_analytic():
    sc = presets.volpath_scene(version=1, width=24, height=24, spp=4)
    img = R.render(sc, seed=0)
    # Center ray: camera at z=-3 hits the unit emissive sphere at distance 2;
    # absorption-only transmittance is exp(-sigma_a * 2).
    expected = np.exp(-0.1 * 2.0) * np.array([0.4, 2.32, 3.2])
    np.testing.assert_allclose(img[12, 12], expected, rtol=5e-3)


def test_v2_single_scatter_positive_outside_lights():
    sc = presets.volpath_scene(version=2, width=24, height=24, spp=32, max_depth=3)
    img = R.render(sc, seed=1)
    assert np.isfinite(img).all()
    # In-scattering makes the whole frame glow, not just the light disks.
    corner = img[0, -1]
    assert (corner > 0).all()


@pytest.fixture(scope="module")
def multi_bounce_renders():
    imgs = {}
    for ver, kw in [(3, {}), (4, {}), (5, dict(with_diffuse_sphere=True))]:
        sc = presets.volpath_scene(
            version=ver, width=24, height=24, spp=48, max_depth=6, **kw
        )
        imgs[ver] = R.render(sc, seed=ver)
    return imgs


def test_v3_v4_same_transport(multi_bounce_renders):
    # v4 = v3 + MIS/NEE: same expected value, different variance.
    m3 = multi_bounce_renders[3].mean()
    m4 = multi_bounce_renders[4].mean()
    assert abs(m3 - m4) / m4 < 0.1


def test_v4_nonnegative_finite(multi_bounce_renders):
    img = multi_bounce_renders[4]
    assert np.isfinite(img).all()
    assert (img >= 0).all()


def test_v6_null_scattering_matches_v5_on_constant_grid():
    sc5 = presets.volpath_scene(
        version=5, width=20, height=20, spp=20, max_depth=6,
        with_diffuse_sphere=True,
    )
    img5 = R.render(sc5, seed=10)
    sc6 = presets.volpath_scene(
        version=6, width=20, height=20, spp=20, max_depth=6,
        hetero=True, with_diffuse_sphere=True,
    )
    img6 = R.render(sc6, seed=11)
    # A constant-density grid medium through the delta-tracking integrator
    # must agree with the homogeneous closed-form integrator.
    assert abs(img5.mean() - img6.mean()) / img5.mean() < 0.09, (
        img5.mean(), img6.mean())


def test_v6_homogeneous_consistent_with_v5():
    sc5 = presets.volpath_scene(version=5, width=20, height=20, spp=20, max_depth=6)
    sc6 = presets.volpath_scene(version=6, width=20, height=20, spp=20, max_depth=6)
    img5 = R.render(sc5, seed=12)
    img6 = R.render(sc6, seed=13)
    assert abs(img5.mean() - img6.mean()) / img5.mean() < 0.09, (
        img5.mean(), img6.mean())


def test_hg_phase_asymmetry_changes_image():
    iso = presets.volpath_scene(version=4, width=16, height=16, spp=32, max_depth=4)
    fwd = presets.volpath_scene(version=4, width=16, height=16, spp=32, max_depth=4, g=0.8)
    a = R.render(iso, seed=14)
    b = R.render(fwd, seed=14)
    assert np.isfinite(b).all()
    # Strong forward scattering redistributes energy.
    assert abs(a.mean() - b.mean()) / a.mean() > 0.02


# ---------------------------------------------------------------------------
# SoA final-version twin (integrators/volpath_soa.py) vs the per-ray oracle
# ---------------------------------------------------------------------------


def test_volpath_soa_matches_per_ray_hetero():
    from gdpt_tpu.integrators import volpath as vol
    from gdpt_tpu.integrators import volpath_soa

    sc = presets.volpath_scene(
        version=6, width=20, height=20, spp=32, max_depth=6,
        hetero=True, with_diffuse_sphere=True,
    )
    assert volpath_soa.supports_soa_volpath(sc)
    a = volpath_soa.render_volpath_soa(sc, seed=3)
    b = R.render_samples(sc, vol.trace_fn(sc.static), spp=32, seed=4)
    assert np.isfinite(a).all() and (a >= 0).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.06, (a.mean(), b.mean())
    ka = a.reshape(5, 4, 5, 4, 3).mean(axis=(1, 3))
    kb = b.reshape(5, 4, 5, 4, 3).mean(axis=(1, 3))
    rel = np.abs(ka - kb) / (kb + 2e-2)
    assert np.quantile(rel, 0.9) < 0.2, np.quantile(rel, 0.9)


def test_volpath_soa_homogeneous_matches_closed_form():
    from gdpt_tpu.integrators import volpath as vol
    from gdpt_tpu.integrators import volpath_soa

    sc6 = presets.volpath_scene(version=6, width=20, height=20, spp=64, max_depth=6)
    a = volpath_soa.render_volpath_soa(sc6, seed=3)
    sc5 = presets.volpath_scene(version=5, width=20, height=20, spp=64, max_depth=6)
    c = R.render_samples(sc5, vol.trace_fn(sc5.static), spp=64, seed=5)
    assert abs(a.mean() - c.mean()) / c.mean() < 0.08


def test_volpath_dispatch_uses_soa_for_v6():
    from gdpt_tpu.integrators import volpath_soa

    sc = presets.volpath_scene(version=6, width=12, height=12, spp=8, max_depth=4)
    assert volpath_soa.supports_soa_volpath(sc)
    img = R.render(sc, seed=1)
    assert np.isfinite(img).all() and img.max() > 0
