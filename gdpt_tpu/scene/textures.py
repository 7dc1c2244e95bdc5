"""Textures and mipmaps as flat device arrays.

The reference keeps a TexturePool of per-image mip pyramids addressed by
integer ids (reference: src/texture.h:13-78, src/mipmap.h). Here every
mip level of every image is flattened into one device-resident pixel
array; (image, level) -> (offset, width, height) tables drive gathers.
Lookup is bilinear within a level and linear across levels
(reference: src/mipmap.h:50-88) with the log2-footprint level selection of
reference: src/texture.h:132-139.

Texture kinds (reference: src/texture.h:80-115):
  0 constant, 1 image, 2 checkerboard.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core.dtypes import INT, REAL

TEX_CONST = 0
TEX_IMAGE = 1
TEX_CHECKER = 2

MAX_MIP_LEVELS = 8


def build_mipmap(img):
    """2x2 box-filter pyramid, at most 8 levels (reference: src/mipmap.h:25-48)."""
    img = np.asarray(img, np.float32)
    levels = [img]
    size = max(img.shape[0], img.shape[1])
    n_levels = min(int(np.ceil(np.log2(max(size, 1)) + 1)), MAX_MIP_LEVELS)
    for _ in range(1, n_levels):
        prev = levels[-1]
        h, w = prev.shape[:2]
        nh, nw = max(h // 2, 1), max(w // 2, 1)
        ys0 = np.minimum(2 * np.arange(nh), h - 1)
        ys1 = np.minimum(2 * np.arange(nh) + 1, h - 1)
        xs0 = np.minimum(2 * np.arange(nw), w - 1)
        xs1 = np.minimum(2 * np.arange(nw) + 1, w - 1)
        nxt = (
            prev[np.ix_(ys0, xs0)] + prev[np.ix_(ys0, xs1)]
            + prev[np.ix_(ys1, xs0)] + prev[np.ix_(ys1, xs1)]
        ) / 4.0
        levels.append(nxt.astype(np.float32))
    return levels


class TexturePoolArrays(NamedTuple):
    """One pool instance holds either 3-channel or 1-channel images."""

    data: jnp.ndarray          # (n_pixels, C)
    level_offset: jnp.ndarray  # (n_images, MAX_MIP_LEVELS)
    level_w: jnp.ndarray       # (n_images, MAX_MIP_LEVELS)
    level_h: jnp.ndarray       # (n_images, MAX_MIP_LEVELS)
    n_levels: jnp.ndarray      # (n_images,)


def build_texture_pool(images, channels):
    """images: list of (h, w[, c]) float arrays."""
    if not images:
        z = np.zeros((1, channels), np.float32)
        zi = np.zeros((1, MAX_MIP_LEVELS), np.int32)
        return TexturePoolArrays(
            jnp.asarray(z), jnp.asarray(zi), jnp.asarray(zi + 1),
            jnp.asarray(zi + 1), jnp.asarray(np.ones(1, np.int32)),
        )
    chunks, off, lvl_off, lvl_w, lvl_h, n_lvls = [], 0, [], [], [], []
    for img in images:
        img = np.asarray(img, np.float32).reshape(img.shape[0], img.shape[1], -1)
        levels = build_mipmap(img)
        offs = np.zeros(MAX_MIP_LEVELS, np.int64)
        ws = np.ones(MAX_MIP_LEVELS, np.int64)
        hs = np.ones(MAX_MIP_LEVELS, np.int64)
        for i, lv in enumerate(levels):
            offs[i] = off
            hs[i], ws[i] = lv.shape[0], lv.shape[1]
            chunks.append(lv.reshape(-1, img.shape[2]))
            off += lv.shape[0] * lv.shape[1]
        # Saturate unused level slots at the coarsest level.
        for i in range(len(levels), MAX_MIP_LEVELS):
            offs[i], ws[i], hs[i] = offs[len(levels) - 1], ws[len(levels) - 1], hs[len(levels) - 1]
        lvl_off.append(offs)
        lvl_w.append(ws)
        lvl_h.append(hs)
        n_lvls.append(len(levels))
    return TexturePoolArrays(
        jnp.asarray(np.concatenate(chunks, axis=0)),
        jnp.asarray(np.stack(lvl_off).astype(np.int32)),
        jnp.asarray(np.stack(lvl_w).astype(np.int32)),
        jnp.asarray(np.stack(lvl_h).astype(np.int32)),
        jnp.asarray(np.asarray(n_lvls, np.int32)),
    )


def _bilinear(pool: TexturePoolArrays, img_id, level, u, v):
    """One bilinear tap at integer mip level (reference: src/mipmap.h:50-72).
    The -0.5 shift matches Mitsuba's pixel-center convention."""
    w = pool.level_w[img_id, level]
    h = pool.level_h[img_id, level]
    off = pool.level_offset[img_id, level]
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
    p00 = pool.data[off + y0m * w + x0m]
    p01 = pool.data[off + y1m * w + x0m]
    p10 = pool.data[off + y0m * w + x1m]
    p11 = pool.data[off + y1m * w + x1m]
    return (
        p00 * ((1 - fx) * (1 - fy))
        + p10 * (fx * (1 - fy))
        + p01 * ((1 - fx) * fy)
        + p11 * (fx * fy)
    )


def lookup_trilinear(pool: TexturePoolArrays, img_id, u, v, level):
    """Trilinear mip lookup with fractional level (reference: src/mipmap.h:76-88).
    Returns a (C,) pixel (pools always carry a channel dim)."""
    max_level = pool.n_levels[img_id] - 1
    l0 = jnp.clip(jnp.floor(level).astype(INT), 0, max_level)
    l1 = jnp.clip(l0 + 1, 0, max_level)
    frac = jnp.clip(level - l0.astype(REAL), 0.0, 1.0)
    frac = jnp.where(level <= 0, 0.0, frac)
    a = _bilinear(pool, img_id, l0, u, v)
    b = _bilinear(pool, img_id, l1, u, v)
    return a * (1.0 - frac) + b * frac


class TexDesc(NamedTuple):
    """Per-slot texture descriptor, batched over materials.

    value doubles as the constant color (kind 0) and checker color0
    (kind 2); value2 is checker color1. Channel dim is always present
    (C = 3 for spectrum slots, C = 1 for float slots).
    """

    kind: jnp.ndarray     # (M,)
    value: jnp.ndarray    # (M, C)
    value2: jnp.ndarray   # (M, C)
    img_id: jnp.ndarray   # (M,)
    uscale: jnp.ndarray   # (M,)
    vscale: jnp.ndarray
    uoffset: jnp.ndarray
    voffset: jnp.ndarray


def eval_texture(pool: TexturePoolArrays, desc_row: TexDesc, uv, footprint):
    """Evaluate one gathered TexDesc row at uv with a screen footprint.

    desc_row fields are scalars/vectors of one material's slot; returns (C,).
    Image texture eval mirrors reference: src/texture.h:129-139 (uv wrap,
    log2 footprint level, trilinear mip lookup).
    """
    kind, value, value2, img_id, us, vs, uo, vo = desc_row
    lu = jnp.mod(uv[0] * us + uo, 1.0)
    lv = jnp.mod(uv[1] * vs + vo, 1.0)
    w0 = pool.level_w[img_id, 0].astype(REAL)
    h0 = pool.level_h[img_id, 0].astype(REAL)
    scaled_fp = jnp.maximum(w0, h0) * jnp.maximum(us, vs) * footprint
    level = jnp.log2(jnp.maximum(scaled_fp, 1e-8))
    img_val = lookup_trilinear(pool, img_id, lu, lv, level)
    # Checkerboard (reference: src/texture.h:141-152).
    cx = 2 * jnp.mod((lu * 2).astype(INT), 2) - 1
    cy = 2 * jnp.mod((lv * 2).astype(INT), 2) - 1
    checker = jnp.where(cx * cy == 1, value, value2)
    return jnp.where(
        kind == TEX_IMAGE, img_val,
        jnp.where(kind == TEX_CHECKER, checker, value),
    )


def eval_tex3(pool, desc: TexDesc, mat_id, uv, footprint):
    """Spectrum slot: returns (3,)."""
    return eval_texture(pool, gather_desc(desc, mat_id), uv, footprint)


def eval_tex1(pool, desc: TexDesc, mat_id, uv, footprint):
    """Float slot: returns a scalar."""
    return eval_texture(pool, gather_desc(desc, mat_id), uv, footprint)[0]


def gather_desc(desc: TexDesc, idx):
    """Gather one material's slot descriptor."""
    return TexDesc(*(f[idx] for f in desc))


def make_tex_desc(host_descs, channels):
    """host_descs: list of dicts with keys kind, value, value2, img_id,
    uscale, vscale, uoffset, voffset. Returns a batched TexDesc."""
    n = len(host_descs)
    cshape = (n, channels)
    kind = np.zeros(n, np.int32)
    value = np.zeros(cshape, np.float32)
    value2 = np.zeros(cshape, np.float32)
    img_id = np.zeros(n, np.int32)
    us = np.ones(n, np.float32)
    vs = np.ones(n, np.float32)
    uo = np.zeros(n, np.float32)
    vo = np.zeros(n, np.float32)
    for i, d in enumerate(host_descs):
        kind[i] = d.get("kind", TEX_CONST)
        value[i] = d.get("value", 0.0)
        value2[i] = d.get("value2", 0.0)
        img_id[i] = d.get("img_id", 0)
        us[i] = d.get("uscale", 1.0)
        vs[i] = d.get("vscale", 1.0)
        uo[i] = d.get("uoffset", 0.0)
        vo[i] = d.get("voffset", 0.0)
    return TexDesc(
        jnp.asarray(kind), jnp.asarray(value), jnp.asarray(value2),
        jnp.asarray(img_id), jnp.asarray(us), jnp.asarray(vs),
        jnp.asarray(uo), jnp.asarray(vo),
    )
