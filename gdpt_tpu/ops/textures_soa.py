"""Batched (SoA) texture and environment-map lookups.

Image textures read the flat mip pool (scene/textures.py) through (N,)
gathers on component arrays, either at level 0 (bilinear) or — when the
caller supplies a per-lane footprint/spread — through the same
fractional-level trilinear mip filtering as the per-ray path
(reference: src/mipmap.h:76-88, src/texture.h:129-139).

Environment-map importance sampling uses the same 2D CDF tables as the
per-ray path (core/distributions.py, mirroring reference:
src/table_dist.cpp:119-143) but searches the per-row conditional CDF
with an explicit bisection loop of clip-mode flat gathers —
materializing the gathered rows would be O(N * width).
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import INT, REAL
from gdpt_tpu.core.soa import V3


class Pool3SoA(NamedTuple):
    data: V3                  # components of the (n_pixels, 3) pool
    level_offset: jnp.ndarray
    level_w: jnp.ndarray
    level_h: jnp.ndarray
    n_levels: jnp.ndarray


def pool3_soa(pool) -> Pool3SoA:
    return Pool3SoA(
        soa.from_rows(pool.data),
        pool.level_offset, pool.level_w, pool.level_h, pool.n_levels,
    )


class Pool1SoA(NamedTuple):
    data: jnp.ndarray         # (n_pixels,) flat 1-channel pool
    level_offset: jnp.ndarray
    level_w: jnp.ndarray
    level_h: jnp.ndarray
    n_levels: jnp.ndarray


def pool1_soa(pool) -> Pool1SoA:
    return Pool1SoA(
        jnp.asarray(pool.data[:, 0]),
        pool.level_offset, pool.level_w, pool.level_h, pool.n_levels,
    )


def _level_view(pool, img_id, lvl):
    """(w, h, offset) of mip level lvl for each lane's image. The level
    tables are (n_images, max_levels); a flat take handles the per-lane
    dynamic level index."""
    L = pool.level_w.shape[1]
    flat = img_id * L + lvl
    w = soa.take(pool.level_w.ravel(), flat)
    h = soa.take(pool.level_h.ravel(), flat)
    off = soa.take(pool.level_offset.ravel(), flat)
    return w, h, off


def _tap(gather, data, w, h, off, u, v):
    """One bilinear tap (pixel-center convention, wrap addressing;
    reference: src/mipmap.h:50-72) through `gather` on `data`."""
    x = u * w.astype(REAL) - 0.5
    y = v * h.astype(REAL) - 0.5
    x0 = jnp.floor(x).astype(INT)
    y0 = jnp.floor(y).astype(INT)
    fx = x - x0.astype(REAL)
    fy = y - y0.astype(REAL)
    x0m = jnp.mod(x0, w)
    y0m = jnp.mod(y0, h)
    x1m = jnp.mod(x0 + 1, w)
    y1m = jnp.mod(y0 + 1, h)
    p00 = gather(data, off + y0m * w + x0m)
    p01 = gather(data, off + y1m * w + x0m)
    p10 = gather(data, off + y0m * w + x1m)
    p11 = gather(data, off + y1m * w + x1m)
    return (p00 * ((1 - fx) * (1 - fy)) + p10 * (fx * (1 - fy))
            + p01 * ((1 - fx) * fy) + p11 * (fx * fy))


def _trilinear(pool, gather, img_id, u, v, level):
    """Fractional-level mip lookup: two bilinear taps lerped
    (reference: src/mipmap.h:76-88, src/texture.h:132-139)."""
    max_level = soa.take(pool.n_levels, img_id) - 1
    l0 = jnp.clip(jnp.floor(level).astype(INT), 0, max_level)
    l1 = jnp.clip(l0 + 1, 0, max_level)
    frac = jnp.clip(level - l0.astype(REAL), 0.0, 1.0)
    frac = jnp.where(level <= 0, 0.0, frac)
    w0, h0, o0 = _level_view(pool, img_id, l0)
    w1, h1, o1 = _level_view(pool, img_id, l1)
    a = _tap(gather, pool.data, w0, h0, o0, u, v)
    b = _tap(gather, pool.data, w1, h1, o1, u, v)
    return a * (1.0 - frac) + b * frac


def trilinear(pool: Pool3SoA, img_id, u, v, level) -> V3:
    """Per-lane trilinear mip lookup, 3-channel pools."""
    return _trilinear(pool, soa.gather, img_id, u, v, level)


def trilinear_f(pool: Pool1SoA, img_id, u, v, level):
    """Per-lane trilinear mip lookup, 1-channel (float slot) pools."""
    return _trilinear(pool, soa.take, img_id, u, v, level)


def footprint_level(pool, img_id, uscale, vscale, fp):
    """log2 mip level from a uv-space screen footprint, matching the
    per-ray eval_texture (scene/textures.py; reference:
    src/texture.h:129-139)."""
    w0 = soa.take(pool.level_w[:, 0], img_id).astype(REAL)
    h0 = soa.take(pool.level_h[:, 0], img_id).astype(REAL)
    scaled = jnp.maximum(w0, h0) * jnp.maximum(uscale, vscale) * fp
    return jnp.log2(jnp.maximum(scaled, 1e-8))


def bilinear_level0_f(pool: Pool1SoA, img_id, u, v):
    """1-channel twin of bilinear_level0 (float texture slots:
    roughness/metallic/... maps, reference src/texture.h Texture<Real>)."""
    w = soa.take(pool.level_w[:, 0], img_id)
    h = soa.take(pool.level_h[:, 0], img_id)
    off = soa.take(pool.level_offset[:, 0], img_id)
    x = u * w.astype(REAL) - 0.5
    y = v * h.astype(REAL) - 0.5
    x0 = jnp.floor(x).astype(INT)
    y0 = jnp.floor(y).astype(INT)
    fx = x - x0.astype(REAL)
    fy = y - y0.astype(REAL)
    x0m = jnp.mod(x0, w)
    y0m = jnp.mod(y0, h)
    x1m = jnp.mod(x0 + 1, w)
    y1m = jnp.mod(y0 + 1, h)
    p00 = soa.take(pool.data, off + y0m * w + x0m)
    p01 = soa.take(pool.data, off + y1m * w + x0m)
    p10 = soa.take(pool.data, off + y0m * w + x1m)
    p11 = soa.take(pool.data, off + y1m * w + x1m)
    return (p00 * ((1 - fx) * (1 - fy)) + p10 * (fx * (1 - fy))
            + p01 * ((1 - fx) * fy) + p11 * (fx * fy))


def bilinear_level0(pool: Pool3SoA, img_id, u, v) -> V3:
    """Bilinear tap at mip level 0 (reference: src/mipmap.h:50-72
    pixel-center convention)."""
    w = soa.take(pool.level_w[:, 0], img_id)
    h = soa.take(pool.level_h[:, 0], img_id)
    off = soa.take(pool.level_offset[:, 0], img_id)
    x = u * w.astype(REAL) - 0.5
    y = v * h.astype(REAL) - 0.5
    x0 = jnp.floor(x).astype(INT)
    y0 = jnp.floor(y).astype(INT)
    fx = x - x0.astype(REAL)
    fy = y - y0.astype(REAL)
    x0m = jnp.mod(x0, w)
    y0m = jnp.mod(y0, h)
    x1m = jnp.mod(x0 + 1, w)
    y1m = jnp.mod(y0 + 1, h)
    p00 = soa.gather(pool.data, off + y0m * w + x0m)
    p01 = soa.gather(pool.data, off + y1m * w + x0m)
    p10 = soa.gather(pool.data, off + y0m * w + x1m)
    p11 = soa.gather(pool.data, off + y1m * w + x1m)
    return (
        p00 * ((1 - fx) * (1 - fy))
        + p10 * (fx * (1 - fy))
        + p01 * ((1 - fx) * fy)
        + p11 * (fx * fy)
    )


def searchsorted_rows(rows_flat, row_stride, y_idx, u, n_cols):
    """Per-lane ``searchsorted(rows[y], u, 'right') - 1``: bisection over
    cdf positions [0, n_cols] with clip-mode flat gathers.
    rows_flat = rows.ravel() where rows is (h, n_cols + 1)."""
    lo = jnp.zeros_like(y_idx)
    hi = jnp.full_like(y_idx, n_cols)
    base = y_idx * row_stride
    steps = max(int(math.ceil(math.log2(n_cols + 1))), 1) + 1

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        val = soa.take(rows_flat, base + mid)
        go_right = val <= u
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return jnp.clip(lo - 1, 0, n_cols - 1)


class EnvmapSoA(NamedTuple):
    """Per-trace view of the envmap tables. Constructed INSIDE the traced
    function from SceneSoA arrays + SceneStatic ints, so tex_kind / width /
    height stay Python ints (compile-time branch selectors)."""

    to_world: jnp.ndarray   # (4, 4)
    to_local: jnp.ndarray
    scale: jnp.ndarray
    tex_kind: int           # static: TEX_CONST or TEX_IMAGE
    const_value: V3         # () components (unscaled)
    img_id: jnp.ndarray
    cdf_rows: jnp.ndarray
    pdf_rows: jnp.ndarray
    cdf_marginals: jnp.ndarray
    pdf_marginals: jnp.ndarray
    # Flat alias table over the w*h texels (core/distributions.py
    # build_alias_table): O(1) sampling instead of log2(h)+log2(w)
    # dependent gathers per lane.
    alias_cut: jnp.ndarray
    alias_idx: jnp.ndarray
    width: int
    height: int
    # Dense (h*w, 3) copy of the env image's mip level 0, or None.
    # Radiance lookups through the texture pool cost 12 single-element
    # gathers (4 taps x 3 separate component arrays) + 3 metadata
    # gathers per lane; this row layout does 4 (1,3)-slice gathers with
    # static width/height — measured 34.7 ms vs 64.3 ms per 262k lanes
    # on TPU (tools/env_lookup_bench.py), and env emission runs twice
    # per wavefront iteration (carried-MIS hit + NEE tap).
    img3: object = None


def _xform_vec(m, v: V3) -> V3:
    return V3(
        m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
        m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
        m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z,
    )


def envmap_uv_from_dir(env: EnvmapSoA, wdir: V3):
    """World direction (scene -> env) to (u, v, sin_elevation)
    (reference: src/lights/envmap.inl:44-56; y-up convention)."""
    local = _xform_vec(env.to_local, wdir)
    u = jnp.arctan2(local.x, -local.z) / (2.0 * jnp.pi)
    u = jnp.where(u < 0, u + 1.0, u)
    v = jnp.arccos(jnp.clip(local.y, -1.0, 1.0)) / jnp.pi
    sin_e = jnp.sqrt(jnp.maximum(0.0, 1.0 - local.y * local.y))
    return u, v, sin_e


def _envmap_radiance_uv(env: EnvmapSoA, pool: Pool3SoA, u, v) -> V3:
    """Unscaled level-0 bilinear env radiance at (u, v). Uses the dense
    (h*w, 3) row-layout copy when available (4 slice gathers, static
    w/h) and falls back to the generic pool path otherwise."""
    if env.tex_kind != 1:  # TEX_CONST (static branch)
        ones = jnp.ones_like(u)
        return V3(ones * env.const_value.x, ones * env.const_value.y,
                  ones * env.const_value.z)
    if env.img3 is None:
        n = u.shape[0]
        img_id = jnp.full(n, env.img_id, INT)
        return bilinear_level0(pool, img_id, u, v)
    w, h = env.width, env.height
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(INT)
    y0 = jnp.floor(y).astype(INT)
    fx = x - x0.astype(REAL)
    fy = y - y0.astype(REAL)
    x0m = jnp.mod(x0, w)
    y0m = jnp.mod(y0, h)
    x1m = jnp.mod(x0 + 1, w)
    y1m = jnp.mod(y0 + 1, h)
    img = env.img3
    p00 = jnp.take(img, y0m * w + x0m, axis=0, mode="clip")
    p01 = jnp.take(img, y1m * w + x0m, axis=0, mode="clip")
    p10 = jnp.take(img, y0m * w + x1m, axis=0, mode="clip")
    p11 = jnp.take(img, y1m * w + x1m, axis=0, mode="clip")
    o = (p00 * ((1 - fx) * (1 - fy))[:, None]
         + p10 * (fx * (1 - fy))[:, None]
         + p01 * ((1 - fx) * fy)[:, None]
         + p11 * (fx * fy)[:, None])
    return V3(o[:, 0], o[:, 1], o[:, 2])


def envmap_emission_soa(env: EnvmapSoA, pool: Pool3SoA, dir_to_env: V3,
                        spread=None) -> V3:
    """Radiance arriving along dir_to_env. Image envmaps are always a
    level-0 bilinear lookup, replicating the reference exactly: its
    footprint (src/lights/envmap.inl:60-72) keeps the negative dvdwy
    through min() and never applies the ray spread, so texture.h
    clamps the level far below 0 — every reference envmap lookup is
    level-0 bilinear. See ops/lights.py:envmap_emission."""
    del spread
    u, v, _ = envmap_uv_from_dir(env, dir_to_env)
    return _envmap_radiance_uv(env, pool, u, v) * env.scale


def envmap_emission_pdf_soa(env: EnvmapSoA, pool: Pool3SoA, dir_to_env: V3):
    """(scaled radiance, NEE-sampler solid-angle pdf) for one direction,
    sharing a single uv transform: the carried-pdf MIS env term needs
    both, and the atan2/acos transform alone is ~24 ms per 262k lanes."""
    u, v, sin_e = envmap_uv_from_dir(env, dir_to_env)
    rad = _envmap_radiance_uv(env, pool, u, v) * env.scale
    return rad, _envmap_pdf_uv(env, u, v, sin_e)


def envmap_sample_dir(env: EnvmapSoA, u0, u1):
    """Importance-sample a direction toward the envmap; returns
    (world_dir, pdf_solid_angle). Same distribution as the per-ray
    sample_2d + dir_from_uv pipeline (reference: src/lights/envmap.inl:8-42
    + src/table_dist.cpp:119-143) — texel picked with probability
    proportional to luminance, uniform jitter within the texel — but via
    a flat alias table (2 gathers) instead of the reference's marginal +
    conditional binary searches (log2(h)+log2(w) dependent gathers per
    lane, which dominated NEE cost on envmap scenes). For constant
    envmaps the tables are the dummy uniform 2x2 grid, so this reduces
    to uniform-uv sampling with pdf_uv = 1."""
    from gdpt_tpu.core import distributions as dist

    h, w = env.height, env.width
    k, dx = dist.sample_alias(env.alias_cut, env.alias_idx, u0)
    x = k % w
    y = k // w
    dy = u1
    uu = (x.astype(REAL) + dx) / w
    vv = (y.astype(REAL) + dy) / h
    azimuth = uu * 2.0 * jnp.pi
    elevation = vv * jnp.pi
    local = V3(
        jnp.sin(azimuth) * jnp.sin(elevation),
        jnp.cos(elevation),
        -jnp.cos(azimuth) * jnp.sin(elevation),
    )
    wdir = _xform_vec(env.to_world, local)
    pdf_uv = (
        soa.take(env.pdf_marginals, y)
        * soa.take(env.pdf_rows.ravel(), y * w + x)
        * w * h
    )
    sin_e = jnp.sin(elevation)
    pdf = jnp.where(
        sin_e > 0, pdf_uv / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_e, 1e-20), 0.0
    )
    return wdir, pdf


def _envmap_pdf_uv(env: EnvmapSoA, u, v, sin_e):
    """Solid-angle density of envmap_sample_dir at precomputed (u, v)
    (reference: src/lights/envmap.inl:58-73)."""
    h, w = env.height, env.width
    x = jnp.clip((u * w).astype(INT), 0, w - 1)
    y = jnp.clip((v * h).astype(INT), 0, h - 1)
    pdf_uv = (
        soa.take(env.pdf_marginals, y)
        * soa.take(env.pdf_rows.ravel(), y * w + x)
        * w * h
    )
    return jnp.where(
        sin_e > 0, pdf_uv / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_e, 1e-20), 0.0
    )


def envmap_pdf_dir(env: EnvmapSoA, wdir: V3):
    """Solid-angle density of envmap_sample_dir at wdir."""
    u, v, sin_e = envmap_uv_from_dir(env, wdir)
    return _envmap_pdf_uv(env, u, v, sin_e)
