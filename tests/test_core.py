import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdpt_tpu.core import distributions as dist
from gdpt_tpu.core import image as gimage
from gdpt_tpu.core import math as gmath
from gdpt_tpu.core import spectrum as gspec
from gdpt_tpu.core import transform as gxf


def test_frame_roundtrip():
    # to_local(to_world(v)) == v (reference test: src/tests/frame.cpp)
    key = jax.random.PRNGKey(0)
    n = gmath.normalize(jax.random.normal(key, (64, 3)))
    frame = gmath.make_frame(n)
    v = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    back = gmath.to_local(frame, gmath.to_world(frame, v))
    # 2e-5: f32 roundtrip; conftest disables XLA's reassociation-level
    # optimizations, which perturbs the dot products by ~1 ulp more.
    np.testing.assert_allclose(back, v, atol=2e-5)
    # orthonormality
    x, y = frame[:, 0], frame[:, 1]
    np.testing.assert_allclose(gmath.dot(x, y), 0.0, atol=1e-5)
    np.testing.assert_allclose(gmath.dot(x, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(gmath.length(x), 1.0, atol=1e-5)


def test_frame_degenerate_down_normal():
    n = jnp.array([0.0, 0.0, -1.0])
    frame = gmath.make_frame(n)
    assert np.isfinite(np.asarray(frame)).all()
    v = jnp.array([0.3, -0.2, 0.5])
    np.testing.assert_allclose(
        gmath.to_local(frame, gmath.to_world(frame, v)), v, atol=1e-6
    )


def test_matrix_inverse():
    m = gxf.look_at([1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    np.testing.assert_allclose(gxf.inverse(m) @ m, np.eye(4), atol=1e-12)


def test_xform_point_vs_vector():
    m = gxf.translate([1.0, 2.0, 3.0]) @ gxf.scale([2.0, 2.0, 2.0])
    p = np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(gxf.xform_point(m, p), [3.0, 2.0, 3.0])
    np.testing.assert_allclose(gxf.xform_vector(m, p), [2.0, 0.0, 0.0])


def test_cos_hemisphere_is_cosine_distributed():
    key = jax.random.PRNGKey(2)
    uv = jax.random.uniform(key, (200000, 2))
    d = gmath.sample_cos_hemisphere(uv)
    assert (np.asarray(d[:, 2]) >= 0).all()
    # E[cos theta] under cosine-weighted sampling = 2/3
    assert abs(float(jnp.mean(d[:, 2])) - 2.0 / 3.0) < 5e-3


def test_table_dist_1d_matches_pmf():
    f = [1.0, 3.0, 0.0, 6.0]
    t = dist.make_table_dist_1d(f)
    u = jax.random.uniform(jax.random.PRNGKey(3), (100000,))
    idx = jax.vmap(lambda x: dist.sample_1d(t, x))(u)
    counts = np.bincount(np.asarray(idx), minlength=4) / 100000
    np.testing.assert_allclose(counts, np.array(f) / 10.0, atol=0.01)
    np.testing.assert_allclose(dist.pmf_1d(t, jnp.array(1)), 0.3, atol=1e-6)


def test_table_dist_1d_degenerate_uniform():
    t = dist.make_table_dist_1d([0.0, 0.0, 0.0])
    idx = dist.sample_1d(t, jnp.array(0.5))
    assert 0 <= int(idx) < 3
    np.testing.assert_allclose(dist.pmf_1d(t, jnp.array(0)), 1 / 3, atol=1e-6)


def test_table_dist_2d_pdf_integrates_to_one():
    rng = np.random.RandomState(0)
    f = rng.rand(8, 16) + 0.01
    t = dist.make_table_dist_2d(f.ravel(), 16, 8)
    # Sampled points must have density proportional to f.
    uv = jax.random.uniform(jax.random.PRNGKey(4), (50000, 2))
    s = jax.vmap(lambda x: dist.sample_2d(t, x))(uv)
    p = jax.vmap(lambda x: dist.pdf_2d(t, x))(s)
    assert np.asarray(p).min() > 0
    # MC integral of pdf over [0,1]^2 with uniform points ~ 1.
    grid = jax.random.uniform(jax.random.PRNGKey(5), (100000, 2))
    pg = jax.vmap(lambda x: dist.pdf_2d(t, x))(grid)
    assert abs(float(jnp.mean(pg)) - 1.0) < 0.02


def test_table_dist_2d_sample_distribution():
    # Concentrate mass in one cell and verify samples land there.
    f = np.full((4, 4), 1e-9)
    f[2, 1] = 1.0
    t = dist.make_table_dist_2d(f.ravel(), 4, 4)
    uv = jax.random.uniform(jax.random.PRNGKey(6), (1000, 2))
    s = np.asarray(jax.vmap(lambda x: dist.sample_2d(t, x))(uv))
    assert ((s[:, 0] >= 0.25) & (s[:, 0] <= 0.5)).mean() > 0.99
    assert ((s[:, 1] >= 0.5) & (s[:, 1] <= 0.75)).mean() > 0.99


def test_exr_roundtrip(tmp_path):
    img = np.random.rand(33, 47, 3).astype(np.float32)
    path = str(tmp_path / "t.exr")
    gimage.write_exr(path, img)
    np.testing.assert_array_equal(gimage.read_exr(path), img)


def test_pfm_roundtrip(tmp_path):
    img = np.random.rand(8, 9, 3).astype(np.float32)
    path = str(tmp_path / "t.pfm")
    gimage.write_pfm(path, img)
    np.testing.assert_array_equal(gimage.read_pfm(path), img)


def test_reads_reference_exr_artifacts():
    import os

    path = "/root/reference/cbox_path/cb_256.exr"
    if not os.path.exists(path):
        pytest.skip("reference artifacts not mounted")
    img = gimage.read_exr(path)
    assert img.shape == (512, 512, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0


def test_spectrum_to_rgb_flat_spectrum_is_whiteish():
    # A flat reflectance spectrum should map near gray (r ~ g ~ b).
    # (equal-energy white maps to E-illuminant, slightly warm in sRGB —
    # matches the reference's integrate_XYZ behavior)
    rgb = gspec.spectrum_to_rgb([400.0, 700.0], [0.5, 0.5])
    assert abs(rgb[0] - rgb[1]) < 0.35 * abs(rgb[1])
    assert abs(rgb[2] - rgb[1]) < 0.35 * abs(rgb[1])
    assert (rgb > 0.3).all() and (rgb < 0.7).all()


def test_luminance():
    s = jnp.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(float(gspec.luminance(s)), 1.0, atol=1e-5)


def test_alias_table_matches_pmf():
    """Vose alias sampling reproduces an arbitrary pmf (5-sigma/texel)
    and the leftover coin is uniform (it re-stretches the compare)."""
    rng = np.random.RandomState(3)
    w = rng.rand(37) ** 3  # skewed
    cut, alias = dist.build_alias_table(w)
    n = 200_000
    u = jnp.asarray(rng.rand(n), jnp.float32)
    idx, left = dist.sample_alias(cut, alias, u)
    counts = np.bincount(np.asarray(idx), minlength=37).astype(np.float64)
    expect = w / w.sum() * n
    err = np.abs(counts - expect)
    assert (err < 5.0 * np.sqrt(expect) + 5.0).all()
    lf = np.asarray(left)
    assert abs(lf.mean() - 0.5) < 0.01 and abs(lf.std() - 0.28868) < 0.01


def test_alias_table_degenerate_weights():
    """Zero/non-finite totals fall back to uniform; empty stays empty."""
    cut, alias = dist.build_alias_table(np.zeros(5))
    idx, _ = dist.sample_alias(cut, alias, jnp.linspace(0, 0.999, 500))
    counts = np.bincount(np.asarray(idx), minlength=5)
    assert (counts > 50).all()  # uniform-ish over all 5
    cut0, alias0 = dist.build_alias_table(np.zeros(0))
    assert cut0.shape == (0,) and alias0.shape == (0,)
    cut1, alias1 = dist.build_alias_table(np.array([7.0]))
    idx1, _ = dist.sample_alias(cut1, alias1, jnp.asarray([0.1, 0.9]))
    assert (np.asarray(idx1) == 0).all()
