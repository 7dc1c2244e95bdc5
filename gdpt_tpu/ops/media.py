"""Participating media: volumes, medium coefficients, phase functions.

Replaces reference: src/medium.h/.cpp + src/media/*.inl (homogeneous and
heterogeneous media), src/volume.h (constant/grid volumes with trilinear
lookup and ray-AABB majorant test) and src/phase_function.h +
src/phase_functions/*.inl (isotropic + Henyey-Greenstein).

Medium dispatch: the per-ray current medium id is data; media are a
static tuple, so ops loop over media in Python and mask by id — each
medium's arrays (including different grid resolutions) stay their
natural shape.
"""

import jax.numpy as jnp

from gdpt_tpu.core import math as gm
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.scene import model as M
from gdpt_tpu.scene.build import DeviceScene, MediumArrays, SceneStatic, VolumeArrays

# --------------------------------------------------------------------------
# Volumes
# --------------------------------------------------------------------------


def volume_lookup(vol: VolumeArrays, is_grid: bool, p):
    """Trilinear grid lookup, zero outside the bbox
    (reference: src/volume.h:44-81)."""
    if not is_grid:
        return vol.value
    res_z, res_y, res_x = vol.grid.shape[0], vol.grid.shape[1], vol.grid.shape[2]
    pn = (p - vol.p_min) / jnp.maximum(vol.p_max - vol.p_min, 1e-20)
    inside = jnp.all((pn >= 0.0) & (pn <= 1.0))
    scale = jnp.array([res_x - 1, res_y - 1, res_z - 1], REAL)
    q = pn * jnp.maximum(scale, 0.0)
    q0 = jnp.clip(jnp.floor(q).astype(INT), 0, jnp.array([res_x - 1, res_y - 1, res_z - 1], INT))
    q1 = jnp.minimum(q0 + 1, jnp.array([res_x - 1, res_y - 1, res_z - 1], INT))
    f = q - q0.astype(REAL)
    x0, y0, z0 = q0[0], q0[1], q0[2]
    x1, y1, z1 = q1[0], q1[1], q1[2]
    fx, fy, fz = f[0], f[1], f[2]
    g = vol.grid
    v000 = g[z0, y0, x0]
    v001 = g[z0, y0, x1]
    v010 = g[z0, y1, x0]
    v011 = g[z0, y1, x1]
    v100 = g[z1, y0, x0]
    v101 = g[z1, y0, x1]
    v110 = g[z1, y1, x0]
    v111 = g[z1, y1, x1]
    out = vol.scale * (
        v000 * ((1 - fx) * (1 - fy) * (1 - fz))
        + v001 * (fx * (1 - fy) * (1 - fz))
        + v010 * ((1 - fx) * fy * (1 - fz))
        + v011 * (fx * fy * (1 - fz))
        + v100 * ((1 - fx) * (1 - fy) * fz)
        + v101 * (fx * (1 - fy) * fz)
        + v110 * ((1 - fx) * fy * fz)
        + v111 * (fx * fy * fz)
    )
    return jnp.where(inside, out, jnp.zeros(3, REAL))


def volume_ray_hits_bbox(vol: VolumeArrays, org, d, tfar):
    """Slab test against the grid bbox (reference: src/volume.h:120-144)."""
    inv = 1.0 / jnp.where(d == 0, 1e-20, d)
    t0s = (vol.p_min - org) * inv
    t1s = (vol.p_max - org) * inv
    tlo = jnp.minimum(t0s, t1s)
    thi = jnp.maximum(t0s, t1s)
    t0 = jnp.maximum(jnp.max(tlo), 0.0)
    t1 = jnp.minimum(jnp.min(thi), tfar)
    return t0 <= t1


# --------------------------------------------------------------------------
# Medium coefficients
# --------------------------------------------------------------------------


def _per_medium(scene: DeviceScene, static: SceneStatic, medium_id, fn):
    """Evaluate fn(i, medium) for each medium and select by id; returns
    zeros for medium_id < 0 (vacuum)."""
    out = jnp.zeros(3, REAL)
    for i, m in enumerate(scene.media):
        out = jnp.where(medium_id == i, fn(i, m), out)
    return out


def get_majorant(scene, static, medium_id, org, d, tfar=BIG):
    """Upper bound of sigma_t along the ray (reference: src/medium.cpp:27,
    media/homogeneous.inl, media/heterogeneous.inl:3-9)."""

    def one(i, m: MediumArrays):
        if static.media_is_hetero[i]:
            hit = volume_ray_hits_bbox(m.density, org, d, tfar)
            return jnp.where(hit, m.density.max_data, jnp.zeros(3, REAL))
        return m.sigma_a + m.sigma_s

    return _per_medium(scene, static, medium_id, one)


def get_sigma_s(scene, static, medium_id, p):
    def one(i, m: MediumArrays):
        if static.media_is_hetero[i]:
            density = volume_lookup(m.density, True, p)
            albedo = volume_lookup(m.albedo, static.media_albedo_is_grid[i], p)
            return density * albedo
        return m.sigma_s

    return _per_medium(scene, static, medium_id, one)


def get_sigma_a(scene, static, medium_id, p):
    def one(i, m: MediumArrays):
        if static.media_is_hetero[i]:
            density = volume_lookup(m.density, True, p)
            albedo = volume_lookup(m.albedo, static.media_albedo_is_grid[i], p)
            return density * (1.0 - albedo)
        return m.sigma_a

    return _per_medium(scene, static, medium_id, one)


# --------------------------------------------------------------------------
# Phase functions (reference: src/phase_functions/*.inl)
# --------------------------------------------------------------------------


def _hg_value(g, cos_theta):
    return (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) / jnp.power(
        jnp.maximum(1.0 + g * g + 2.0 * g * cos_theta, 1e-8), 1.5
    )


def _phase_scalar(scene, static, medium_id, value_fn):
    out = jnp.asarray(0.0, REAL)
    for i, m in enumerate(scene.media):
        out = jnp.where(medium_id == i, value_fn(static.media_phase_kinds[i], m.phase_g), out)
    return out


def phase_eval(scene, static, medium_id, din, dout):
    """Phase value (a scalar: phase functions here are achromatic). Uses
    the reference's argument convention — HG depends only on
    dot(din, dout) (reference: src/phase_functions/henyeygreenstein.inl:3-7)."""
    cos_t = gm.dot(din, dout)

    def value(kind, g):
        if kind == M.PHASE_HG:
            return _hg_value(g, cos_t)
        return jnp.asarray(1.0 / (4.0 * jnp.pi), REAL)

    return _phase_scalar(scene, static, medium_id, value)


def phase_pdf(scene, static, medium_id, din, dout):
    return phase_eval(scene, static, medium_id, din, dout)


def phase_sample(scene, static, medium_id, din, uv):
    """Sample a scattered direction (reference:
    src/phase_functions/henyeygreenstein.inl:9-43 incl. the |g|<1e-3
    uniform-sphere fallback)."""
    uniform = gm.sample_uniform_sphere(uv)
    out = uniform
    for i, m in enumerate(scene.media):
        if static.media_phase_kinds[i] == M.PHASE_HG:
            g = m.phase_g
            safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
            tmp = (safe_g * safe_g - 1.0) / (
                2.0 * uv[0] * safe_g - (safe_g + 1.0)
            )
            cos_e = (tmp * tmp - (1.0 + safe_g * safe_g)) / (2.0 * safe_g)
            cos_e = jnp.clip(cos_e, -1.0, 1.0)
            sin_e = gm.safe_sqrt(1.0 - cos_e * cos_e)
            azim = 2.0 * jnp.pi * uv[1]
            frame = gm.make_frame(din)
            hg = gm.to_world(
                frame,
                jnp.array([sin_e * jnp.cos(azim), sin_e * jnp.sin(azim), cos_e]),
            )
            val = jnp.where(jnp.abs(g) < 1e-3, uniform, hg)
            out = jnp.where(medium_id == i, val, out)
    return out


def update_medium(vertex, d, medium_id):
    """Index-matched medium transition at a surface crossing
    (reference: src/vol_path_tracing.h:157-171)."""
    transition = vertex.interior_medium_id != vertex.exterior_medium_id
    going_out = gm.dot(d, vertex.geom_normal) > 0
    new_id = jnp.where(going_out, vertex.exterior_medium_id, vertex.interior_medium_id)
    return jnp.where(transition, new_id, medium_id)
