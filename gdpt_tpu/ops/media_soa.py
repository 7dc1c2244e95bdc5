"""Batched (SoA) participating-media ops — performance twin of ops/media.py.

Same dispatch strategy as the per-ray layer: media are a static tuple, so
every coefficient lookup is a Python loop over media with per-lane masks
(reference: src/medium.cpp, src/volume.h, src/phase_functions/*.inl).
Grid volumes are reshaped once into flat component arrays so trilinear
taps are 8 clip-mode gathers per channel.
"""

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.core.soa import V3
from gdpt_tpu.scene import model as M


class VolumeSoA(NamedTuple):
    value: jnp.ndarray     # (3,) constant value
    flat: V3               # grid.reshape(-1, 3) components
    p_min: jnp.ndarray     # (3,)
    p_max: jnp.ndarray
    max_data: jnp.ndarray  # (3,)
    scale: jnp.ndarray     # ()


class MediumSoA(NamedTuple):
    sigma_a: jnp.ndarray   # (3,)
    sigma_s: jnp.ndarray
    albedo: VolumeSoA
    density: VolumeSoA
    phase_g: jnp.ndarray   # ()


def volume_soa(vol) -> VolumeSoA:
    return VolumeSoA(
        vol.value, soa.from_rows(vol.grid.reshape(-1, 3)),
        vol.p_min, vol.p_max, vol.max_data, vol.scale,
    )


def media_soa(media) -> tuple:
    return tuple(
        MediumSoA(m.sigma_a, m.sigma_s, volume_soa(m.albedo),
                  volume_soa(m.density), m.phase_g)
        for m in media
    )


def _b3(v, n):
    """Broadcast a (3,) constant to V3 of (N,)."""
    return V3(jnp.broadcast_to(v[0], (n,)), jnp.broadcast_to(v[1], (n,)),
              jnp.broadcast_to(v[2], (n,)))


def volume_lookup_soa(vol: VolumeSoA, is_grid: bool, p: V3, res=None) -> V3:
    """Trilinear grid lookup, zero outside the bbox
    (reference: src/volume.h:44-81). res: static (x, y, z) resolution
    (from SceneStatic.media_grid_res)."""
    n = p.x.shape[0]
    if not is_grid:
        return _b3(vol.value, n)
    rx, ry, rz = res
    ex = jnp.maximum(vol.p_max - vol.p_min, 1e-20)
    pnx = (p.x - vol.p_min[0]) / ex[0]
    pny = (p.y - vol.p_min[1]) / ex[1]
    pnz = (p.z - vol.p_min[2]) / ex[2]
    inside = (
        (pnx >= 0) & (pnx <= 1) & (pny >= 0) & (pny <= 1)
        & (pnz >= 0) & (pnz <= 1)
    )
    qx = pnx * max(rx - 1, 0)
    qy = pny * max(ry - 1, 0)
    qz = pnz * max(rz - 1, 0)
    x0 = jnp.clip(jnp.floor(qx).astype(INT), 0, rx - 1)
    y0 = jnp.clip(jnp.floor(qy).astype(INT), 0, ry - 1)
    z0 = jnp.clip(jnp.floor(qz).astype(INT), 0, rz - 1)
    x1 = jnp.minimum(x0 + 1, rx - 1)
    y1 = jnp.minimum(y0 + 1, ry - 1)
    z1 = jnp.minimum(z0 + 1, rz - 1)
    fx = qx - x0.astype(REAL)
    fy = qy - y0.astype(REAL)
    fz = qz - z0.astype(REAL)

    def tap(z, y, x):
        return soa.gather(vol.flat, (z * ry + y) * rx + x)

    out = (
        tap(z0, y0, x0) * ((1 - fx) * (1 - fy) * (1 - fz))
        + tap(z0, y0, x1) * (fx * (1 - fy) * (1 - fz))
        + tap(z0, y1, x0) * ((1 - fx) * fy * (1 - fz))
        + tap(z0, y1, x1) * (fx * fy * (1 - fz))
        + tap(z1, y0, x0) * ((1 - fx) * (1 - fy) * fz)
        + tap(z1, y0, x1) * (fx * (1 - fy) * fz)
        + tap(z1, y1, x0) * ((1 - fx) * fy * fz)
        + tap(z1, y1, x1) * (fx * fy * fz)
    ) * vol.scale
    zero = jnp.zeros(n, REAL)
    return soa.where(inside, out, V3(zero, zero, zero))


def volume_ray_hits_bbox_soa(vol: VolumeSoA, org: V3, d: V3, tfar):
    """Slab test against the grid bbox (reference: src/volume.h:120-144)."""

    def axis(o, dd, lo, hi):
        inv = 1.0 / jnp.where(dd == 0, 1e-20, dd)
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    lx, hx = axis(org.x, d.x, vol.p_min[0], vol.p_max[0])
    ly, hy = axis(org.y, d.y, vol.p_min[1], vol.p_max[1])
    lz, hz = axis(org.z, d.z, vol.p_min[2], vol.p_max[2])
    t0 = jnp.maximum(jnp.maximum(lx, jnp.maximum(ly, lz)), 0.0)
    t1 = jnp.minimum(jnp.minimum(hx, jnp.minimum(hy, hz)), tfar)
    return t0 <= t1


def _per_medium_soa(media, static, medium_id, fn) -> V3:
    n = medium_id.shape[0]
    zero = jnp.zeros(n, REAL)
    out = V3(zero, zero, zero)
    for i, m in enumerate(media):
        out = soa.where(medium_id == i, fn(i, m), out)
    return out


def get_majorant_soa(media, static, medium_id, org: V3, d: V3, tfar=BIG):
    """Upper bound of sigma_t along the ray (reference: src/medium.cpp:27)."""
    n = medium_id.shape[0]

    def one(i, m: MediumSoA):
        if static.media_is_hetero[i]:
            hit = volume_ray_hits_bbox_soa(m.density, org, d, tfar)
            zero = jnp.zeros(n, REAL)
            return soa.where(hit, _b3(m.density.max_data, n), V3(zero, zero, zero))
        return _b3(m.sigma_a + m.sigma_s, n)

    return _per_medium_soa(media, static, medium_id, one)


def get_sigma_s_soa(media, static, medium_id, p: V3):
    n = medium_id.shape[0]

    def one(i, m: MediumSoA):
        if static.media_is_hetero[i]:
            dres, ares = static.media_grid_res[i]
            density = volume_lookup_soa(m.density, True, p, dres)
            albedo = volume_lookup_soa(
                m.albedo, static.media_albedo_is_grid[i], p, ares
            )
            return density * albedo
        return _b3(m.sigma_s, n)

    return _per_medium_soa(media, static, medium_id, one)


def get_sigma_a_soa(media, static, medium_id, p: V3):
    n = medium_id.shape[0]

    def one(i, m: MediumSoA):
        if static.media_is_hetero[i]:
            dres, ares = static.media_grid_res[i]
            density = volume_lookup_soa(m.density, True, p, dres)
            albedo = volume_lookup_soa(
                m.albedo, static.media_albedo_is_grid[i], p, ares
            )
            one3 = V3(*(jnp.ones(n, REAL),) * 3)
            return density * (one3 - albedo)
        return _b3(m.sigma_a, n)

    return _per_medium_soa(media, static, medium_id, one)


# --------------------------------------------------------------------------
# Phase functions (reference: src/phase_functions/*.inl)
# --------------------------------------------------------------------------


def _hg_value(g, cos_theta):
    return (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) / jnp.power(
        jnp.maximum(1.0 + g * g + 2.0 * g * cos_theta, 1e-8), 1.5
    )


def phase_eval_soa(media, static, medium_id, din: V3, dout: V3):
    """Scalar phase value; HG depends only on dot(din, dout)
    (reference: src/phase_functions/henyeygreenstein.inl:3-7)."""
    cos_t = soa.dot(din, dout)
    n = medium_id.shape[0]
    out = jnp.zeros(n, REAL)
    for i, m in enumerate(media):
        if static.media_phase_kinds[i] == M.PHASE_HG:
            val = _hg_value(m.phase_g, cos_t)
        else:
            val = jnp.full(n, 1.0 / (4.0 * jnp.pi), REAL)
        out = jnp.where(medium_id == i, val, out)
    return out


def phase_pdf_soa(media, static, medium_id, din, dout):
    return phase_eval_soa(media, static, medium_id, din, dout)


def _uniform_sphere(u0, u1) -> V3:
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u1
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def phase_sample_soa(media, static, medium_id, din: V3, u0, u1) -> V3:
    """Sample a scattered direction (reference:
    src/phase_functions/henyeygreenstein.inl:9-43 incl. the |g|<1e-3
    uniform-sphere fallback)."""
    out = _uniform_sphere(u0, u1)
    for i, m in enumerate(media):
        if static.media_phase_kinds[i] == M.PHASE_HG:
            g = m.phase_g
            safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
            tmp = (safe_g * safe_g - 1.0) / (2.0 * u0 * safe_g - (safe_g + 1.0))
            cos_e = jnp.clip(
                (tmp * tmp - (1.0 + safe_g * safe_g)) / (2.0 * safe_g), -1.0, 1.0
            )
            sin_e = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_e * cos_e))
            azim = 2.0 * jnp.pi * u1
            frame = soa.coordinate_system(din)
            hg = soa.to_world(
                frame, V3(sin_e * jnp.cos(azim), sin_e * jnp.sin(azim), cos_e)
            )
            val = soa.where(jnp.abs(g) < 1e-3, out, hg)
            out = soa.where(medium_id == i, val, out)
    return out


def update_medium_soa(int_med, ext_med, d: V3, gn: V3, medium_id):
    """Index-matched medium transition at a surface crossing
    (reference: src/vol_path_tracing.h:157-171)."""
    transition = int_med != ext_med
    going_out = soa.dot(d, gn) > 0
    new_id = jnp.where(going_out, ext_med, int_med)
    return jnp.where(transition, new_id, medium_id)
