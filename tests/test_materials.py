"""Sample/pdf consistency for the whole BSDF stack.

The reference checks, per material, that the finite-difference Jacobian
of sample_bsdf matches 1/pdf (reference test: src/tests/materials.cpp).
Here the equivalent property is tested statistically and vectorized: the
histogram of 200k sampled directions over a spherical grid must match the
integral of pdf_sample_bsdf over each bin, and pdf must integrate to ~1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdpt_tpu.core import math as gm
from gdpt_tpu.core.dtypes import REAL
from gdpt_tpu.ops import materials as mats
from gdpt_tpu.scene import model as M


def _params(kind, **over):
    base = dict(
        kind=jnp.asarray(kind, jnp.int32),
        eta=jnp.asarray(1.5, REAL),
        refl=jnp.array([0.6, 0.4, 0.3], REAL),
        spec_refl=jnp.array([0.9, 0.9, 0.9], REAL),
        spec_trans=jnp.array([0.8, 0.8, 0.8], REAL),
        roughness=jnp.asarray(0.3, REAL),
        anisotropic=jnp.asarray(0.2, REAL),
        subsurface=jnp.asarray(0.3, REAL),
        metallic=jnp.asarray(0.4, REAL),
        specular=jnp.asarray(0.5, REAL),
        specular_tint=jnp.asarray(0.3, REAL),
        sheen=jnp.asarray(0.5, REAL),
        sheen_tint=jnp.asarray(0.5, REAL),
        clearcoat=jnp.asarray(0.6, REAL),
        clearcoat_gloss=jnp.asarray(0.7, REAL),
        specular_transmission=jnp.asarray(0.4, REAL),
    )
    base.update({k: jnp.asarray(v, REAL) for k, v in over.items()})
    return mats.MatParams(**base)


class _FakeVertex:
    """Minimal vertex for material ops: flat surface, +z normal."""

    def __init__(self):
        self.geom_normal = jnp.array([0.0, 0.0, 1.0], REAL)
        self.frame = jnp.eye(3, dtype=REAL)


VERTEX = _FakeVertex()
DIR_IN = gm.normalize(jnp.array([0.4, -0.25, 0.88], REAL))

ALL_KINDS = [
    M.MAT_LAMBERTIAN, M.MAT_ROUGH_PLASTIC, M.MAT_ROUGH_DIELECTRIC,
    M.MAT_DISNEY_DIFFUSE, M.MAT_DISNEY_METAL, M.MAT_DISNEY_GLASS,
    M.MAT_DISNEY_CLEARCOAT, M.MAT_DISNEY_SHEEN, M.MAT_DISNEY_BSDF,
]

N_SAMPLES = 200_000
N_PDF = 200_000


def _bin_id(d, n_theta=8, n_phi=16):
    ct = jnp.clip((d[..., 2] + 1.0) * 0.5, 0.0, 1.0 - 1e-7)
    theta_bin = (ct * n_theta).astype(jnp.int32)
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    phi_bin = jnp.clip(
        ((phi / (2 * jnp.pi) + 0.5) * n_phi).astype(jnp.int32), 0, n_phi - 1
    )
    return theta_bin * n_phi + phi_bin


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_sample_pdf_consistency(kind):
    p = _params(kind)
    used = (kind,)
    key = jax.random.PRNGKey(kind)
    k1, k2, k3 = jax.random.split(key, 3)
    uv = jax.random.uniform(k1, (N_SAMPLES, 2))
    w = jax.random.uniform(k2, (N_SAMPLES,))

    sample_v = jax.jit(
        jax.vmap(lambda uv, w: mats.sample_bsdf(p, DIR_IN, VERTEX, uv, w, used))
    )
    s = sample_v(uv, w)
    d = np.asarray(s.dir_out)
    valid = np.asarray(s.valid)
    assert valid.mean() > 0.99
    n_total = int(valid.sum())
    d = d[valid]
    np.testing.assert_allclose(
        np.linalg.norm(d, axis=1), 1.0, atol=1e-3,
    )
    # Some samplers produce directions the pdf assigns zero mass to (e.g.
    # clearcoat half-vector reflections below the horizon — same as the
    # reference, whose path tracer then kills the path via p2 <= 0).
    # Exclude those from both sides of the comparison.
    pdf_at_sample = np.asarray(
        jax.jit(jax.vmap(lambda dd: mats.pdf_bsdf(p, DIR_IN, dd, VERTEX, used)))(
            jnp.asarray(d)
        )
    )
    kept = pdf_at_sample > 0
    kept_fraction = kept.mean()
    d = d[kept]

    n_bins = 8 * 16
    counts = np.bincount(
        np.asarray(_bin_id(jnp.asarray(d))), minlength=n_bins
    ).astype(np.float64)
    sampled_frac = counts / n_total

    # Deterministic midpoint-rule integral of pdf per bin (the lobes are
    # too spiky for uniform MC integration).
    nt, nphi = 512, 512
    ct = (jnp.arange(nt) + 0.5) / nt * 2.0 - 1.0
    phi = (jnp.arange(nphi) + 0.5) / nphi * 2.0 * jnp.pi
    ctg, phg = jnp.meshgrid(ct, phi, indexing="ij")
    st = jnp.sqrt(1.0 - ctg**2)
    dirs = jnp.stack(
        [st * jnp.cos(phg), st * jnp.sin(phg), ctg], -1
    ).reshape(-1, 3)
    weight = (2.0 / nt) * (2.0 * np.pi / nphi)
    pdf_v = jax.jit(
        jax.vmap(lambda dd: mats.pdf_bsdf(p, DIR_IN, dd, VERTEX, used))
    )
    pdfs = np.asarray(pdf_v(dirs)).astype(np.float64)
    assert np.isfinite(pdfs).all()
    bins = np.asarray(_bin_id(dirs))
    bin_integral = np.zeros(n_bins)
    np.add.at(bin_integral, bins, pdfs * weight)

    total = bin_integral.sum()
    # pdf mass == fraction of samples it covers (both are 1 for most
    # materials; less for clearcoat's below-horizon loss).
    assert abs(total - kept_fraction) < 0.05, (
        f"pdf integral {total} vs kept fraction {kept_fraction}"
    )
    assert total > 0.8

    # Per-bin agreement where there is meaningful mass.
    mask = bin_integral > 2e-3
    assert mask.any()
    rel = np.abs(sampled_frac[mask] - bin_integral[mask]) / bin_integral[mask]
    assert np.quantile(rel, 0.9) < 0.15, (
        f"kind {kind}: bad bins {rel.max()}, q90 {np.quantile(rel, 0.9)}"
    )


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_eval_nonnegative_and_finite(kind):
    p = _params(kind)
    used = (kind,)
    key = jax.random.PRNGKey(kind + 100)
    dirs = gm.sample_uniform_sphere(jax.random.uniform(key, (5000, 2)))
    f = jax.vmap(lambda dd: mats.eval_bsdf(p, DIR_IN, dd, VERTEX, used))(dirs)
    f = np.asarray(f)
    assert np.isfinite(f).all()
    assert (f >= 0).all()


@pytest.mark.parametrize(
    "kind",
    [M.MAT_LAMBERTIAN, M.MAT_ROUGH_PLASTIC, M.MAT_DISNEY_DIFFUSE,
     M.MAT_DISNEY_METAL, M.MAT_DISNEY_CLEARCOAT, M.MAT_DISNEY_SHEEN],
)
def test_opaque_materials_zero_below_surface(kind):
    p = _params(kind)
    used = (kind,)
    below = gm.normalize(jnp.array([0.2, 0.1, -0.9], REAL))
    f = mats.eval_bsdf(p, DIR_IN, below, VERTEX, used)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-7)


def test_rough_dielectric_transmits():
    p = _params(M.MAT_ROUGH_DIELECTRIC)
    used = (M.MAT_ROUGH_DIELECTRIC,)
    key = jax.random.PRNGKey(7)
    uv = jax.random.uniform(key, (2000, 2))
    w = jax.random.uniform(jax.random.PRNGKey(8), (2000,))
    s = jax.vmap(lambda uv, w: mats.sample_bsdf(p, DIR_IN, VERTEX, uv, w, used))(uv, w)
    trans = np.asarray(s.eta) != 0
    # At eta 1.5 and this angle a sizeable fraction refracts.
    assert 0.3 < trans.mean() < 1.0
    # Transmitted directions are below the surface.
    below = np.asarray(s.dir_out)[trans][:, 2] < 0
    assert below.mean() > 0.99


def test_energy_conservation_white_lambertian():
    # integral of eval over hemisphere == albedo.
    p = _params(M.MAT_LAMBERTIAN, refl=jnp.array([1.0, 1.0, 1.0]))
    used = (M.MAT_LAMBERTIAN,)
    key = jax.random.PRNGKey(9)
    dirs = gm.sample_uniform_sphere(jax.random.uniform(key, (200_000, 2)))
    f = jax.vmap(lambda dd: mats.eval_bsdf(p, DIR_IN, dd, VERTEX, used))(dirs)
    integral = float(np.asarray(f[:, 0]).mean() * 4.0 * np.pi)
    assert abs(integral - 1.0) < 0.02
