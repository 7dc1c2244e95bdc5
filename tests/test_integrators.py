import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdpt_tpu.core import math as gm
from gdpt_tpu.core.dtypes import REAL
from gdpt_tpu.integrators import render as R
from gdpt_tpu.ops import lights as lgt
from gdpt_tpu.scene import filters
from gdpt_tpu.scene import presets


# --------------------------------------------------------------------------
# Filters: warped samples must be distributed per the filter's density
# (reference test: src/tests/filter.cpp checks the sampling Jacobian).
# --------------------------------------------------------------------------


def _filter_density(kind, param, x):
    if kind == filters.FILTER_BOX:
        return np.where(np.abs(x) <= param / 2, 1.0 / param, 0.0)
    if kind == filters.FILTER_TENT:
        h = param / 2
        return np.maximum(1.0 - np.abs(x) / h, 0.0) / h
    if kind == filters.FILTER_GAUSSIAN:
        return np.exp(-0.5 * (x / param) ** 2) / (param * np.sqrt(2 * np.pi))
    raise ValueError(kind)


@pytest.mark.parametrize(
    "kind,param",
    [(filters.FILTER_BOX, 1.0), (filters.FILTER_TENT, 2.0),
     (filters.FILTER_GAUSSIAN, 0.5)],
)
def test_filter_sampling_matches_density(kind, param):
    u = jax.random.uniform(jax.random.PRNGKey(0), (400_000, 2))
    pts = np.asarray(filters.sample_filter(kind, param, u))
    for axis in range(2):
        x = pts[:, axis]
        lo, hi = -3 * param, 3 * param
        hist, edges = np.histogram(x, bins=50, range=(lo, hi), density=True)
        centers = 0.5 * (edges[:-1] + edges[1:])
        expect = _filter_density(kind, param, centers)
        mask = expect > 0.05 * expect.max()
        rel = np.abs(hist[mask] - expect[mask]) / expect[mask]
        assert np.quantile(rel, 0.9) < 0.1


# --------------------------------------------------------------------------
# Light sampling pdfs
# --------------------------------------------------------------------------


def test_sphere_light_solid_angle_pdf_integrates():
    sc = presets.furnace_sphere(width=8, height=8)
    # Build a scene with a sphere area light to test cone-sampled pdf.
    from gdpt_tpu.core import transform as xf
    from gdpt_tpu.scene import build
    from gdpt_tpu.scene import model as M

    sphere = M.Sphere(center=np.array([0.0, 0.0, 5.0]), radius=1.0,
                      material_id=0, area_light_id=0)
    lights = [M.DiffuseAreaLight(0, np.ones(3))]
    cam = M.Camera(xf.look_at([0, 0, -1], [0, 0, 0], [0, 1, 0]), 45.0, 8, 8)
    sc = build.build_scene(cam, [M.Lambertian(0.5)], [sphere], lights)

    ref = jnp.array([0.0, 0.0, 0.0], REAL)
    uv = jax.random.uniform(jax.random.PRNGKey(1), (100_000, 2))
    w = jax.random.uniform(jax.random.PRNGKey(2), (100_000,))

    def one(uv, w):
        p, n = lgt.sample_point_on_light(sc.device, sc.static, jnp.asarray(0), ref, uv, w)
        pdf = lgt.pdf_point_on_light(sc.device, sc.static, jnp.asarray(0), p, n, ref)
        return p, n, pdf

    p, n, pdf = jax.vmap(one)(uv, w)
    p, n, pdf = map(np.asarray, (p, n, pdf))
    # Sampled points lie on the sphere.
    np.testing.assert_allclose(
        np.linalg.norm(p - np.array([0, 0, 5.0]), axis=1), 1.0, atol=1e-3
    )
    # MC estimate of area via E[1/pdf] restricted to the visible cap:
    # integral over sampled support of (1/pdf) * pdf == support area.
    # Instead validate the inverse-pdf identity: E[G/pdf] equals the
    # subtended solid angle (cone sampling is uniform in solid angle).
    dvec = p - np.asarray(ref)
    dist2 = (dvec**2).sum(1)
    dl = dvec / np.sqrt(dist2)[:, None]
    g = np.abs((n * dl).sum(1)) / dist2
    omega = np.mean(g / pdf)
    sin2 = (1.0 / 5.0) ** 2
    expected = 2 * np.pi * (1 - np.sqrt(1 - sin2))
    assert abs(omega - expected) / expected < 0.01


def test_mesh_light_area_pdf():
    sc = presets.cornell_box(width=8, height=8, spp=1)
    ref = jnp.array([278.0, 100.0, 200.0], REAL)
    uv = jax.random.uniform(jax.random.PRNGKey(3), (50_000, 2))
    w = jax.random.uniform(jax.random.PRNGKey(4), (50_000,))

    def one(uv, w):
        p, n = lgt.sample_point_on_light(sc.device, sc.static, jnp.asarray(0), ref, uv, w)
        pdf = lgt.pdf_point_on_light(sc.device, sc.static, jnp.asarray(0), p, n, ref)
        return p, n, pdf

    p, n, pdf = map(np.asarray, jax.vmap(one)(uv, w))
    # pdf = 1/area uniformly; E[1/pdf] = area.
    area = (343 - 213) * (332 - 227)
    np.testing.assert_allclose(pdf, 1.0 / area, rtol=1e-4)
    # Points on the light quad.
    assert (np.abs(p[:, 1] - 548.7) < 1e-3).all()
    assert (p[:, 0] >= 213 - 1e-3).all() and (p[:, 0] <= 343 + 1e-3).all()
    # Uniform coverage of the quad.
    assert abs(p[:, 0].mean() - 278) < 1.0
    assert abs(p[:, 2].mean() - 279.5) < 1.0


# --------------------------------------------------------------------------
# End-to-end integrators
# --------------------------------------------------------------------------


def test_furnace_closed_form():
    sc = presets.furnace_sphere(albedo=0.6, emission=1.0, width=24, height=24,
                                spp=96, max_depth=-1)
    img = R.render(sc, seed=1)
    c = img.shape[0] // 2
    center = img[c - 3 : c + 3, c - 3 : c + 3].mean()
    assert abs(center - 0.6) < 0.02
    # Background pixels see the envmap exactly.
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-4)


def test_furnace_white_is_white():
    # albedo 1 + RR: radiance equals envmap everywhere (energy conservation).
    sc = presets.furnace_sphere(albedo=1.0, emission=0.5, width=16, height=16,
                                spp=128, max_depth=-1)
    img = R.render(sc, seed=2)
    assert abs(img.mean() - 0.5) < 0.02


def test_cbox_depth_aov():
    sc = presets.cornell_box(width=32, height=32, integrator="depth")
    img = R.render(sc)
    assert img.shape == (32, 32, 3)
    # Center pixel depth roughly distance camera -> back wall region.
    assert 800 < img[16, 16, 0] < 1600
    assert (img >= 0).all()


def test_cbox_normal_aov():
    sc = presets.cornell_box(width=32, height=32, integrator="shading_normal")
    img = R.render(sc)
    # Visible surfaces face the camera: plenty of -z normals.
    assert (img[..., 2] < -0.5).sum() > 100


def test_cbox_path_statistics():
    sc = presets.cornell_box(width=48, height=48, spp=24, max_depth=5)
    img = R.render(sc, seed=3)
    assert np.isfinite(img).all()
    assert img.max() > 1.0  # light source visible
    assert 0.02 < img.mean() < 1.0
    # Left third redder than right third; right third greener.
    left = img[:, :12].mean(axis=(0, 1))
    right = img[:, -12:].mean(axis=(0, 1))
    assert left[0] > 1.5 * left[1]
    assert right[1] > right[0]


def test_path_deterministic_given_seed():
    sc = presets.cornell_box(width=16, height=16, spp=4, max_depth=3)
    a = R.render(sc, seed=5)
    b = R.render(sc, seed=5)
    np.testing.assert_array_equal(a, b)


def test_max_depth_monotone_energy():
    # Deeper paths can only add energy (unbiased accumulation).
    sc2 = presets.cornell_box(width=24, height=24, spp=16, max_depth=2)
    sc6 = presets.cornell_box(width=24, height=24, spp=16, max_depth=6)
    i2 = R.render(sc2, seed=7).mean()
    i6 = R.render(sc6, seed=7).mean()
    assert i6 > i2
