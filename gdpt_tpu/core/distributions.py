"""Tabulated sampling distributions.

Host build in numpy (cumsum), device sampling with
``jnp.searchsorted`` — the TPU replacement for the reference's
``std::upper_bound``-based TableDist1D/2D (reference: src/table_dist.h/.cpp).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core.dtypes import INT, REAL


class TableDist1D(NamedTuple):
    pmf: jnp.ndarray  # (n,)
    cdf: jnp.ndarray  # (n + 1,)


def make_table_dist_1d(f) -> TableDist1D:
    f = np.asarray(f, dtype=np.float64)
    n = f.shape[0]
    cdf = np.concatenate([[0.0], np.cumsum(f)])
    total = cdf[-1]
    if total > 0:
        pmf = f / total
        cdf = cdf / total
    else:
        # Degenerate input: fall back to uniform
        # (reference: src/table_dist.cpp:17-24).
        pmf = np.full(n, 1.0 / n)
        cdf = np.arange(n + 1) / n
    cdf[-1] = 1.0
    return TableDist1D(jnp.asarray(pmf, REAL), jnp.asarray(cdf, REAL))


def sample_1d(table: TableDist1D, u):
    """Index i with probability pmf[i]."""
    n = table.pmf.shape[0]
    idx = jnp.searchsorted(table.cdf, u, side="right") - 1
    return jnp.clip(idx, 0, n - 1).astype(INT)


def pmf_1d(table: TableDist1D, idx):
    return table.pmf[idx]


class TableDist2D(NamedTuple):
    """Piecewise-constant 2D distribution over [0,1]^2 for envmap sampling.

    Layout mirrors reference: src/table_dist.h:27-36 — per-row conditional
    CDFs plus a marginal over rows.
    """

    cdf_rows: jnp.ndarray       # (h, w + 1)
    pdf_rows: jnp.ndarray       # (h, w)
    cdf_marginals: jnp.ndarray  # (h + 1,)
    pdf_marginals: jnp.ndarray  # (h,)
    total_values: float
    width: int
    height: int


def make_table_dist_2d(f, width, height) -> TableDist2D:
    f = np.asarray(f, dtype=np.float64).reshape(height, width)
    cdf_rows = np.zeros((height, width + 1))
    cdf_rows[:, 1:] = np.cumsum(f, axis=1)
    row_integrals = cdf_rows[:, -1].copy()
    pdf_rows = np.empty_like(f)
    for y in range(height):
        if row_integrals[y] > 0:
            cdf_rows[y, :-1] /= row_integrals[y]
            pdf_rows[y] = f[y] / row_integrals[y]
        else:
            pdf_rows[y] = 1.0 / width
            cdf_rows[y, :-1] = np.arange(width) / width
        cdf_rows[y, -1] = 1.0

    cdf_marginals = np.concatenate([[0.0], np.cumsum(row_integrals)])
    total = cdf_marginals[-1]
    pdf_marginals = np.empty(height)
    if total > 0:
        cdf_marginals /= total
        pdf_marginals[:] = row_integrals / total
    else:
        pdf_marginals[:] = 1.0 / height
        cdf_marginals[:-1] = np.arange(height + 1)[:-1] / height
    cdf_marginals[-1] = 1.0

    return TableDist2D(
        jnp.asarray(cdf_rows, REAL),
        jnp.asarray(pdf_rows, REAL),
        jnp.asarray(cdf_marginals, REAL),
        jnp.asarray(pdf_marginals, REAL),
        float(total),
        width,
        height,
    )


def sample_2d(table: TableDist2D, uv):
    """Sample (u, v) in [0,1]^2 with density proportional to the table.

    Mirrors reference: src/table_dist.cpp:119-143 (row from the marginal,
    column from the row's conditional, then uniform remap within the cell).
    """
    w, h = table.width, table.height
    u, v = uv[..., 0], uv[..., 1]
    y = jnp.clip(
        jnp.searchsorted(table.cdf_marginals, v, side="right") - 1, 0, h - 1
    )
    cm0 = table.cdf_marginals[y]
    cm1 = table.cdf_marginals[y + 1]
    dy = jnp.where(cm1 - cm0 > 0, (v - cm0) / jnp.where(cm1 - cm0 > 0, cm1 - cm0, 1.0), v - cm0)

    row_cdf = table.cdf_rows[y]
    x = jnp.clip(jnp.searchsorted(row_cdf, u, side="right") - 1, 0, w - 1)
    c0 = row_cdf[x]
    c1 = row_cdf[x + 1]
    dx = jnp.where(c1 - c0 > 0, (u - c0) / jnp.where(c1 - c0 > 0, c1 - c0, 1.0), u - c0)
    return jnp.stack([(x + dx) / w, (y + dy) / h], axis=-1)


def pdf_2d(table: TableDist2D, uv):
    w, h = table.width, table.height
    x = jnp.clip((uv[..., 0] * w).astype(INT), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(INT), 0, h - 1)
    return table.pdf_marginals[y] * table.pdf_rows[y, x] * w * h


def build_alias_table(weights):
    """Vose alias table for O(1) categorical sampling on device.

    The CDF samplers above mirror the reference's binary searches
    (src/table_dist.cpp:119-143); a searchsorted over an N-entry table
    costs log2(N) dependent gathers per lane on TPU, which dominates NEE
    on envmap scenes. The alias form replaces that with two gathers:
    k = floor(u*N) plus one probability compare against cut[k].

    Returns (cut f32[N], alias i32[N]): keep k where frac < cut[k],
    else take alias[k]. Built on host in numpy (scene-build time).
    """
    w = np.asarray(weights, np.float64).ravel()
    n = w.shape[0]
    if n == 0:
        return (jnp.zeros(0, REAL), jnp.zeros(0, INT))
    total = w.sum()
    if not np.isfinite(total) or total <= 0:
        w = np.ones(n)
        total = float(n)
    p = w * (n / total)  # mean 1
    cut = np.ones(n)
    alias = np.arange(n, dtype=np.int64)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        cut[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    for i in small + large:
        cut[i] = 1.0
        alias[i] = i
    return jnp.asarray(cut, REAL), jnp.asarray(alias, INT)


def sample_alias(cut, alias, u):
    """Categorical index + a re-uniformized leftover in [0,1).

    The leftover re-stretches the coin (frac vs cut[k]) back to a
    uniform, so callers can reuse it as an in-cell jitter without
    drawing another random number.
    """
    n = cut.shape[0]
    un = u * n
    k = jnp.clip(un.astype(INT), 0, n - 1)
    f = un - k.astype(un.dtype)
    c = jnp.take(cut, k, axis=0, mode="clip")
    a = jnp.take(alias, k, axis=0, mode="clip")
    keep = f < c
    idx = jnp.where(keep, k, a)
    left = jnp.where(keep, f / jnp.maximum(c, 1e-12),
                     (f - c) / jnp.maximum(1.0 - c, 1e-12))
    return idx, jnp.clip(left, 0.0, 0.999999)
