"""Pixel reconstruction filters, importance-sampled per pixel.

Like the reference, filtering is done by warping the subpixel uniforms
through the filter's inverse CDF instead of splatting — no cross-pixel
writes, which is exactly what a pure-functional TPU renderer wants
(rationale mirrored from reference: src/filter.h:7-28).

Kinds: 0 = Box, 1 = Tent, 2 = Gaussian.
"""

import jax.numpy as jnp

FILTER_BOX = 0
FILTER_TENT = 1
FILTER_GAUSSIAN = 2


def sample_box(u, width):
    """Warp [0,1]^2 to [-w/2, w/2]^2 (reference: src/filters/box.inl)."""
    return (2.0 * u - 1.0) * (width / 2.0)


def sample_tent(u, width):
    """Inverse-CDF of the tent filter (reference: src/filters/tent.inl)."""
    h = width / 2.0

    def one(x):
        lo = h * (jnp.sqrt(jnp.maximum(2.0 * x, 0.0)) - 1.0)
        hi = h * (1.0 - jnp.sqrt(jnp.maximum(1.0 - 2.0 * (x - 0.5), 0.0)))
        return jnp.where(x < 0.5, lo, hi)

    return jnp.stack([one(u[..., 0]), one(u[..., 1])], axis=-1)


def sample_gaussian(u, stddev):
    """Box-Muller (reference: src/filters/gaussian.inl)."""
    r = stddev * jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[..., 0], 1e-8)))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def sample_filter(kind: int, param: float, u):
    """Static-kind dispatch: `kind`/`param` are Python values frozen into
    the compiled program."""
    if kind == FILTER_BOX:
        return sample_box(u, param)
    if kind == FILTER_TENT:
        return sample_tent(u, param)
    if kind == FILTER_GAUSSIAN:
        return sample_gaussian(u, param)
    raise ValueError(f"unknown filter kind {kind}")
