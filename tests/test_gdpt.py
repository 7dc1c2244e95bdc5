import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdpt_tpu.integrators import gdpt
from gdpt_tpu.integrators import render as R
from gdpt_tpu.ops import poisson
from gdpt_tpu.scene import presets


def test_dct1_matches_definition():
    # Direct evaluation of the REDFT00 formula vs the FFT implementation.
    rng = np.random.RandomState(0)
    x = rng.rand(11).astype(np.float32)
    n = len(x)
    k = np.arange(n)
    expect = np.array(
        [
            x[0] + ((-1.0) ** kk) * x[-1]
            + 2.0 * sum(x[j] * np.cos(np.pi * j * kk / (n - 1)) for j in range(1, n - 1))
            for kk in k
        ]
    )
    got = np.asarray(poisson.dct1(jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_poisson_reconstructs_exact_gradients():
    rng = np.random.RandomState(1)
    u = jnp.asarray(rng.rand(19, 23, 3).astype(np.float32))
    gx = u - jnp.concatenate([u[:, :1], u[:, :-1]], axis=1)
    gx = gx.at[:, 0].set(u[:, 0] - u[:, 1])
    gy = u - jnp.concatenate([u[:1], u[:-1]], axis=0)
    gy = gy.at[0].set(u[0] - u[1])
    out = poisson.screened_poisson_solve(u, gx, gy, 0.04)
    np.testing.assert_allclose(np.asarray(out), np.asarray(u), atol=1e-4)


def test_poisson_large_alpha_returns_data():
    rng = np.random.RandomState(2)
    u = jnp.asarray(rng.rand(9, 8, 3).astype(np.float32))
    out = poisson.screened_poisson_solve(
        u, jnp.zeros_like(u), jnp.zeros_like(u), 1e7
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(u), atol=1e-3)


@pytest.fixture(scope="module")
def gdpt_run():
    # 48x48 is the smallest resolution where the recon's boundary
    # influence keeps the mean within the 10% gate; spp halved from the
    # original 24/256 to keep the per-ray oracle renders (the fixture's
    # cost) reasonable on the 1-CPU test host.
    sc = presets.cornell_box(
        width=48, height=48, spp=16, integrator="gradpath", max_depth=5
    )
    recon, aux = gdpt.render_gradpath(sc, seed=4, return_aux=True)
    sc_ref = presets.cornell_box(width=48, height=48, spp=128, max_depth=5)
    ref = R.render(sc_ref, seed=11)
    return recon, aux, ref


def test_gdpt_reconstruction_matches_path_mean(gdpt_run):
    recon, aux, ref = gdpt_run
    assert np.isfinite(recon).all()
    # Means agree within a few percent (same transport, different estimator).
    assert abs(recon.mean() - ref.mean()) / ref.mean() < 0.1


def test_gdpt_reconstruction_beats_matched_primal(gdpt_run):
    # The gradient-domain value proposition: reconstructing from the
    # noise-matched BF primal (the reference's estimator pair) clearly
    # beats that primal.
    recon, aux, ref = gdpt_run

    def rmse(a, b):
        return float(np.sqrt(((a - b) ** 2).mean()))

    from gdpt_tpu.ops import poisson
    import jax.numpy as jnp

    recon_bf = np.asarray(
        poisson.screened_poisson_solve(
            jnp.asarray(aux["primal_bf"]), jnp.asarray(aux["gx"]),
            jnp.asarray(aux["gy"]), 0.04,
        )
    )
    assert rmse(recon_bf, ref) < 0.8 * rmse(aux["primal_bf"], ref)


def test_gdpt_nee_primal_not_degraded(gdpt_run):
    # The shipped reconstruction uses the NEE primal as data term; it must
    # stay within a small factor of that primal's error.
    recon, aux, ref = gdpt_run

    def rmse(a, b):
        return float(np.sqrt(((a - b) ** 2).mean()))

    assert rmse(recon, ref) < 1.15 * rmse(aux["primal"], ref)


def test_gdpt_gradients_sane(gdpt_run):
    recon, aux, ref = gdpt_run
    # Gradients approximate the reference image's finite differences.
    gx_ref = np.zeros_like(ref)
    gx_ref[:, 1:] = ref[:, 1:] - ref[:, :-1]
    # Correlation between estimated and true gradients should be positive
    # and substantial.
    a = aux["gx"][:, 1:].ravel()
    b = gx_ref[:, 1:].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.5, corr


def test_gdpt_shared_randoms_produce_correlated_offsets():
    # Zero-variance check in a flat region: for a fully symmetric
    # constant-emission environment, gradients must vanish sample-by-sample.
    from gdpt_tpu.core import rng as grng

    sc = presets.furnace_sphere(albedo=0.5, emission=1.0, width=8, height=8, spp=1)
    key = grng.ray_key(jax.random.PRNGKey(0), 3)
    out = gdpt.trace_gdpt(sc.device, sc.static, jnp.asarray(4.0), jnp.asarray(4.0), key)
    # Pixel away from the sphere silhouette: all 5 paths miss or all hit
    # nothing -> primal 0 (no emitter hit; envmap misses terminate paths).
    assert np.isfinite(np.asarray(out.primal)).all()


# ---------------------------------------------------------------------------
# SoA GDPT twin (integrators/gdpt_soa.py) vs the per-ray oracle
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gdpt_soa_run(gdpt_run):
    from gdpt_tpu.integrators import gdpt_soa

    sc = presets.cornell_box(
        width=48, height=48, spp=24, integrator="gradpath", max_depth=5
    )
    assert gdpt_soa.supports_soa_gdpt(sc)
    recon, aux = gdpt_soa.render_gradpath_soa(sc, seed=4, return_aux=True)
    return recon, aux, gdpt_run


def test_gdpt_soa_matches_per_ray_buffers(gdpt_soa_run):
    recon_s, aux_s, (recon_a, aux_a, ref) = gdpt_soa_run
    assert np.isfinite(recon_s).all()
    # Primal is a full path-tracing estimate: tight agreement.
    assert abs(aux_s["primal"].mean() - aux_a["primal"].mean()) / aux_a[
        "primal"
    ].mean() < 0.05
    # BF primal and gradients are high-variance; compare means.
    assert abs(aux_s["primal_bf"].mean() - aux_a["primal_bf"].mean()) / aux_a[
        "primal_bf"
    ].mean() < 0.1
    for k in ("gx", "gy"):
        assert abs(aux_s[k].mean() - aux_a[k].mean()) < 0.01, k


def test_gdpt_soa_reconstruction_quality(gdpt_soa_run):
    # The SoA twin's reconstruction passes the same value-proposition gate
    # as the per-ray one: Poisson recon from the noise-matched BF pair
    # beats that primal against a converged reference.
    import jax.numpy as jnp2

    from gdpt_tpu.ops import poisson as poisson_ops

    recon_s, aux_s, (recon_a, aux_a, ref) = gdpt_soa_run

    def rmse(a, b):
        return float(np.sqrt(((a - b) ** 2).mean()))

    recon_bf = np.asarray(
        poisson_ops.screened_poisson_solve(
            jnp2.asarray(aux_s["primal_bf"]), jnp2.asarray(aux_s["gx"]),
            jnp2.asarray(aux_s["gy"]), 0.04,
        )
    )
    assert rmse(recon_bf, ref) < 0.8 * rmse(aux_s["primal_bf"], ref)
    assert rmse(recon_s, ref) < 1.15 * rmse(aux_s["primal"], ref)


def test_gdpt_soa_gradients_correlate(gdpt_soa_run):
    recon_s, aux_s, (recon_a, aux_a, ref) = gdpt_soa_run
    gx_ref = np.zeros_like(ref)
    gx_ref[:, 1:] = ref[:, 1:] - ref[:, :-1]
    corr = np.corrcoef(aux_s["gx"][:, 1:].ravel(), gx_ref[:, 1:].ravel())[0, 1]
    assert corr > 0.5, corr
    # And with the per-ray estimate of the same quantity.
    corr2 = np.corrcoef(aux_s["gx"].ravel(), aux_a["gx"].ravel())[0, 1]
    assert corr2 > 0.3, corr2


def test_gdpt_wavefront_matches_banded(monkeypatch):
    """The GDPT wavefront pool (sample regeneration, per-lane depths)
    is the same estimator as the banded sample loop: identical RNG
    streams per (pixel, sample), so images agree to accumulation-order
    float noise."""
    from gdpt_tpu.integrators import gdpt_soa

    # Same scene signature as test_soa.test_sharded_bvh_scene_matches_
    # single_device: the banded 5-path trace is reused in-process
    # (tracing dominates suite wall time on this 1-core host).
    sc = presets.cornell_box(width=16, height=16, spp=2, max_depth=3,
                             integrator="gradpath", force_bvh=True)
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    a = gdpt_soa.render_gradpath_soa(sc, spp=3, seed=5)
    monkeypatch.setenv("GDPT_WAVEFRONT", "1")
    b = gdpt_soa.render_gradpath_soa(sc, spp=3, seed=5)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)


def test_gdpt_wavefront_tail_compaction_matches_banded(monkeypatch):
    """Tail compaction of the 5-path pool (live-prefix shrink after the
    work queue drains, keeping dead-but-unharvested lanes) is pure
    scheduling — image matches the banded loop. GDPT_GDPT_POOL=2048
    with a 2560-item queue forces the drain tail through a shrink."""
    from gdpt_tpu.integrators import gdpt_soa

    sc = presets.cornell_box(width=16, height=16, spp=2, max_depth=3,
                             integrator="gradpath", force_bvh=True)
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    a = gdpt_soa.render_gradpath_soa(sc, spp=10, seed=5)
    monkeypatch.setenv("GDPT_WAVEFRONT", "1")
    monkeypatch.setenv("GDPT_GDPT_POOL", "2048")
    b = gdpt_soa.render_gradpath_soa(sc, spp=10, seed=5)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)


def test_gdpt_wavefront_pool_sorted_matches_banded(monkeypatch):
    """GDPT_POOL_SORT=1 permutes the 5-path lane pool per chunk and
    traces base/probe rays unsorted; estimator-identical to banded."""
    from gdpt_tpu.integrators import gdpt_soa

    monkeypatch.setenv("GDPT_PACKET", "1")
    sc = presets.cornell_box(width=16, height=16, spp=2, max_depth=3,
                             integrator="gradpath", force_bvh=True)
    monkeypatch.setenv("GDPT_WAVEFRONT", "0")
    a = gdpt_soa.render_gradpath_soa(sc, spp=3, seed=5)
    monkeypatch.setenv("GDPT_WAVEFRONT", "1")
    monkeypatch.setenv("GDPT_POOL_SORT", "1")
    b = gdpt_soa.render_gradpath_soa(sc, spp=3, seed=5)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6)
