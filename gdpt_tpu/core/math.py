"""Vector math over (..., 3) jnp arrays.

Replaces the reference's Vector3/Frame free-function layer
(reference: src/vector.h, src/frame.h) with broadcasting jnp ops so the
same code runs per-ray (under vmap) and batched.
"""

import jax.numpy as jnp

from gdpt_tpu.core.dtypes import REAL


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def normalize(v, eps=0.0):
    l = length(v)
    if eps:
        l = jnp.maximum(l, eps)
    return v / l[..., None]


def distance(a, b):
    return length(a - b)


def distance_squared(a, b):
    return length_squared(a - b)


def lerp(a, b, t):
    return a + (b - a) * t


def reflect_dir(d, n):
    """Mirror direction d (pointing into the surface) about normal n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def coordinate_system(n):
    """Build two tangents orthogonal to unit vector n.

    Frisvad's branchless construction with the n.z ~ -1 guard
    (reference: src/frame.h:12-22).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    degenerate = nz < (-1.0 + 1e-6)
    a = 1.0 / jnp.where(degenerate, 1.0, 1.0 + nz)
    b = -nx * ny * a
    t0 = jnp.stack([1.0 - nx * nx * a, b, -nx], axis=-1)
    t1 = jnp.stack([b, 1.0 - ny * ny * a, -ny], axis=-1)
    t0_deg = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0], REAL), t0.shape)
    t1_deg = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0], REAL), t1.shape)
    deg = degenerate[..., None]
    return jnp.where(deg, t0_deg, t0), jnp.where(deg, t1_deg, t1)


def make_frame(n):
    """Orthonormal frame (x, y, n) from unit normal n; shape (..., 3, 3).

    frame[..., 0, :] = tangent, frame[..., 1, :] = bitangent,
    frame[..., 2, :] = normal.
    """
    x, y = coordinate_system(n)
    return jnp.stack([x, y, n], axis=-2)


def frame_from_tangent(t, b, n):
    return jnp.stack([t, b, n], axis=-2)


def frame_n(frame):
    return frame[..., 2, :]


def flip_frame(frame):
    return -frame


def to_local(frame, v):
    """Project world vector into frame coordinates (reference: src/frame.h:50)."""
    return jnp.einsum("...ij,...j->...i", frame, v)


def to_world(frame, v):
    """Frame-local vector back to world (reference: src/frame.h:55)."""
    return jnp.einsum("...ji,...j->...i", frame, v)


def sample_cos_hemisphere(uv):
    """Cosine-weighted hemisphere sample in local coordinates (z up)."""
    phi = 2.0 * jnp.pi * uv[..., 0]
    t = jnp.sqrt(jnp.clip(1.0 - uv[..., 1], 0.0, 1.0))
    r = jnp.sqrt(uv[..., 1])
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), t], axis=-1)


def sample_uniform_sphere(uv):
    z = 1.0 - 2.0 * uv[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * uv[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def radians(deg):
    return deg * (jnp.pi / 180.0)
