"""Screened-Poisson image reconstruction on device.

Replaces the FFTW-based solver of the reference
(reference: src/render.cpp:172-254, identical to small_gdpt.cpp:355-437,
after Bhat et al.'s screened Poisson framework): solve
(alpha - Laplacian) f = alpha*u - div g with reflective (Neumann)
boundaries, diagonalized by DCT-I. FFTW's REDFT00 is realized with
``jnp.fft.rfft`` over the even extension of length 2(n-1), so the whole
reconstruction runs on the TPU with no host FFT dependency.

Conventions: gx[x] estimates u[x] - u[x-1] (backward difference), gy
likewise along y; the divergence stencil uses their forward differences
with the -2 boundary reflection factors of the reference.
"""

import jax
import jax.numpy as jnp

from gdpt_tpu.core.dtypes import REAL


def dct1(x, axis=-1):
    """Unnormalized DCT-I (FFTW REDFT00): y_k = x_0 + (-1)^k x_{n-1}
    + 2 sum_{j=1}^{n-2} x_j cos(pi j k / (n-1)). Self-inverse up to
    2(n-1)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    ext = jnp.concatenate([x, x[..., -2:0:-1]], axis=-1)  # length 2(n-1)
    y = jnp.fft.rfft(ext, axis=-1).real
    return jnp.moveaxis(y.astype(x.dtype), -1, axis)


def dct1_2d(x):
    return dct1(dct1(x, axis=0), axis=1)


def screened_poisson_solve(img, gx, gy, alpha):
    """Per-channel screened Poisson solve. img/gx/gy: (h, w, 3).

    Mirrors fourierSolve (reference: src/render.cpp:172-254): build
    h_hat = alpha*u - div g with boundary reflection factors, DCT,
    divide by (alpha - Laplacian eigenvalues), restore the DC term of u,
    inverse DCT, normalize by 4(w-1)(h-1).
    """
    h, w = img.shape[:2]
    img = img.astype(jnp.float32)
    gx = gx.astype(jnp.float32)
    gy = gy.astype(jnp.float32)

    # Divergence of g with reflective boundary factors
    # (reference: src/render.cpp:213-224).
    gx_next = jnp.concatenate([gx[:, 1:], jnp.zeros_like(gx[:, :1])], axis=1)
    div_x = gx_next - gx
    bx = jnp.zeros((h, w, 1), bool).at[:, 0].set(True).at[:, -1].set(True)
    div_x = jnp.where(bx, -2.0 * gx, div_x)
    gy_next = jnp.concatenate([gy[1:], jnp.zeros_like(gy[:1])], axis=0)
    div_y = gy_next - gy
    by = jnp.zeros((h, w, 1), bool).at[0].set(True).at[-1].set(True)
    div_y = jnp.where(by, -2.0 * gy, div_y)

    b = alpha * img - div_x - div_y

    # DC term of u's DCT-I: interior samples count twice per axis
    # (reference: src/render.cpp:205-211).
    wx = jnp.ones(w).at[1:-1].set(2.0)
    wy = jnp.ones(h).at[1:-1].set(2.0)
    dc = jnp.einsum("y,x,yxc->c", wy, wx, img)

    bb = dct1_2d(b)
    lap_x = 2.0 * jnp.cos(jnp.pi * jnp.arange(w) / (w - 1))
    lap_y = -4.0 + 2.0 * jnp.cos(jnp.pi * jnp.arange(h) / (h - 1))
    denom = alpha - (lap_y[:, None] + lap_x[None, :])
    f_hat = bb / denom[..., None]
    f_hat = f_hat.at[0, 0].set(dc)
    out = dct1_2d(f_hat) / (4.0 * (w - 1) * (h - 1))
    return out.astype(REAL)


def assemble_gradients(gx_here, gx_next, gy_here, gy_next):
    """Combine the four one-sided gradient buffers into the backward
    differences the solver expects (reference: src/render.cpp:340-350,
    small_gdpt.cpp:530-538): the estimate at pixel p and the complementary
    estimate recorded at its predecessor are MIS halves and are summed.
    """
    gx = gx_here.at[:, 1:].add(gx_next[:, :-1])
    gy = gy_here.at[1:].add(gy_next[:-1])
    return gx, gy
