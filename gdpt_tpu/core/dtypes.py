"""Global dtype policy.

The reference uses Real = double everywhere (reference: src/lajolla.h:23)
because it is an educational CPU renderer. On TPU the VPU is fp32-native,
so the device compute path defaults to float32. Property tests that need
extra precision run under ``jax.experimental.enable_x64``.
"""

import jax.numpy as jnp

REAL = jnp.float32
INT = jnp.int32

# Large-but-finite stand-in for +inf ray extents. Using finite values keeps
# t arithmetic well-defined in f32 (inf - inf = nan hazards).
BIG = 1e30
