"""Microfacet toolbox (reference: src/microfacet.h).

Schlick/dielectric Fresnel, GTR1/GTR2 NDFs, Smith masking, Heitz-2018
visible-normal sampling (isotropic + anisotropic), and the clearcoat
inverse-CDF sampler. All per-ray scalar jnp, branch-free.
"""

import jax.numpy as jnp

from gdpt_tpu.core import math as gm


def schlick_fresnel(f0, cos_theta):
    return f0 + (1.0 - f0) * jnp.maximum(1.0 - cos_theta, 0.0) ** 5


def fresnel_dielectric(n_dot_i, eta):
    """Exact dielectric Fresnel from the incident-side cosine alone;
    returns 1 on total internal reflection (reference: src/microfacet.h:48-57).
    eta = eta_transmit / eta_incident."""
    n_dot_t_sq = 1.0 - (1.0 - n_dot_i * n_dot_i) / (eta * eta)
    n_dot_t = gm.safe_sqrt(n_dot_t_sq)
    ni = jnp.abs(n_dot_i)
    rs = (ni - eta * n_dot_t) / jnp.maximum(ni + eta * n_dot_t, 1e-20)
    rp = (eta * ni - n_dot_t) / jnp.maximum(eta * ni + n_dot_t, 1e-20)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(n_dot_t_sq < 0.0, 1.0, f)


def gtr2(n_dot_h, roughness):
    alpha = roughness * roughness
    a2 = alpha * alpha
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    return a2 / jnp.maximum(jnp.pi * t * t, 1e-20)


def gtr2_aniso(h_local, alpha_x, alpha_y):
    """Anisotropic GTR2 / GGX NDF."""
    hx, hy, hz = h_local[..., 0], h_local[..., 1], h_local[..., 2]
    d = (hx / alpha_x) ** 2 + (hy / alpha_y) ** 2 + hz * hz
    return 1.0 / jnp.maximum(jnp.pi * alpha_x * alpha_y * d * d, 1e-20)


def smith_masking_gtr2(v_local, roughness):
    """Smith G1 for isotropic GTR2 (reference: src/microfacet.h:79-85)."""
    alpha = roughness * roughness
    a2 = alpha * alpha
    vx, vy, vz = v_local[..., 0], v_local[..., 1], v_local[..., 2]
    lam = (-1.0 + jnp.sqrt(1.0 + (vx * vx * a2 + vy * vy * a2) / jnp.maximum(vz * vz, 1e-20))) / 2.0
    return 1.0 / (1.0 + lam)


def smith_masking_aniso(v_local, alpha_x, alpha_y):
    vx, vy, vz = v_local[..., 0], v_local[..., 1], v_local[..., 2]
    inner = ((vx * alpha_x) ** 2 + (vy * alpha_y) ** 2) / jnp.maximum(vz * vz, 1e-20)
    lam = (jnp.sqrt(1.0 + inner) - 1.0) / 2.0
    return 1.0 / (1.0 + lam)


def _vndf_impl(local_dir_in, ax, ay, uv):
    hemi = gm.normalize(
        jnp.stack(
            [ax * local_dir_in[..., 0], ay * local_dir_in[..., 1], local_dir_in[..., 2]],
            axis=-1,
        ),
        eps=1e-20,
    )
    r = jnp.sqrt(uv[..., 0])
    phi = 2.0 * jnp.pi * uv[..., 1]
    t1 = r * jnp.cos(phi)
    t2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + hemi[..., 2])
    t2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - t1 * t1, 0.0)) + s * t2
    disk_n = jnp.stack(
        [t1, t2, jnp.sqrt(jnp.maximum(1.0 - t1 * t1 - t2 * t2, 0.0))], axis=-1
    )
    hemi_frame = gm.make_frame(hemi)
    hemi_n = gm.to_world(hemi_frame, disk_n)
    out = jnp.stack(
        [ax * hemi_n[..., 0], ay * hemi_n[..., 1], jnp.maximum(hemi_n[..., 2], 0.0)],
        axis=-1,
    )
    return gm.normalize(out, eps=1e-20)


def sample_visible_normals(local_dir_in, alpha, uv, alpha_x=None, alpha_y=None):
    """Heitz 2018 VNDF sampling (reference: src/microfacet.h:98-161), with
    the below-horizon mirroring of the reference."""
    ax = alpha if alpha_x is None else alpha_x
    ay = alpha if alpha_y is None else alpha_y
    below = local_dir_in[..., 2] < 0.0
    din = jnp.where(below, -local_dir_in, local_dir_in)
    h = _vndf_impl(din, ax, ay, uv)
    return jnp.where(below, -h, h)


def sample_clearcoat_normal(alpha, uv):
    """GTR1 half-vector inverse-CDF sampler (reference: src/microfacet.h:164-177)."""
    a2 = alpha * alpha
    u0, u1 = uv[..., 0], uv[..., 1]
    azim = 2.0 * jnp.pi * u1
    cos2 = (1.0 - jnp.power(a2, 1.0 - u0)) / (1.0 - a2)
    cos_e = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_e = jnp.sqrt(jnp.clip(1.0 - cos2, 0.0, 1.0))
    return gm.normalize(
        jnp.stack([sin_e * jnp.cos(azim), sin_e * jnp.sin(azim), cos_e], axis=-1),
        eps=1e-20,
    )


def gtr1_clearcoat(hz, alpha):
    """GTR1-style clearcoat NDF (reference: src/materials/disney_clearcoat.inl:30)."""
    a2 = alpha * alpha
    denom = jnp.pi * jnp.log(a2) * (1.0 + (a2 - 1.0) * hz * hz)
    denom = jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
    return (a2 - 1.0) / denom


def reflect_over(dir_in, half):
    """Mirror dir_in (pointing away from surface) over half-vector."""
    return gm.normalize(
        -dir_in + 2.0 * gm.dot(dir_in, half)[..., None] * half, eps=1e-20
    )
