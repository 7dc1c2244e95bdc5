"""Counter-based RNG for deterministic per-sample streams.

The reference uses a serial PCG32 stream per image tile
(reference: src/pcg.h, src/render.cpp:92). That design is inherently
sequential; on TPU we use counter-based threefry (jax.random) instead,
keyed per (pixel, sample) and folded per (bounce, use-site).

The load-bearing property for gradient-domain path tracing is that the
base path and its four shift-mapped offset paths consume *the same*
random numbers (reference: src/path_tracing.h:360-403, small_gdpt.cpp:274).
Here that is trivial: all five paths live in one per-ray program and read
from the same key.
"""

import jax

# Use-site slots, folded together with the bounce index so each decision in
# a bounce reads an independent stream. These mirror the consumption
# structure of reference: src/path_tracing.h (pixel jitter, NEE light
# selection, BSDF sampling, Russian roulette) and src/vol_path_tracing.h
# (distance sampling, channel selection, phase sampling, null-collision
# loop).
SLOT_PIXEL = 0
SLOT_LIGHT_UV = 1
SLOT_LIGHT_W = 2
SLOT_SHAPE_W = 3
SLOT_BSDF_UV = 4
SLOT_BSDF_W = 5
SLOT_RR = 6
SLOT_DISTANCE = 7
SLOT_CHANNEL = 8
SLOT_PHASE_UV = 9
SLOT_NULL_LOOP = 10  # + iteration index for the free-flight loop
SLOT_NEE_LOOP = 48   # shadow-ray ratio-tracking loop slots

_SLOT_STRIDE = 256


def ray_key(base_key, ray_idx):
    """Key for one (pixel, sample) lane. ray_idx = pixel_idx * spp + sample."""
    return jax.random.fold_in(base_key, ray_idx)


def site_key(key, bounce, slot):
    return jax.random.fold_in(key, bounce * _SLOT_STRIDE + slot)


def uniform(key, bounce, slot, shape=()):
    """Uniforms in [0, 1) for one use site of one bounce."""
    return jax.random.uniform(site_key(key, bounce, slot), shape)


def loop_uniform(key, bounce, slot, iteration, shape=()):
    """Uniforms for iteration `iteration` of an unbounded inner loop at a
    use site (e.g. the null-collision free-flight loop, reference:
    src/vol_path_tracing.h:1343-1403)."""
    k = jax.random.fold_in(site_key(key, bounce, slot), iteration)
    return jax.random.uniform(k, shape)
