"""SoA (structure-of-arrays) compute primitives for the TPU hot path.

TPU VPU lanes are the minor axis of a (8, 128) tile. Arrays shaped
(N, 3) waste 125/128 lanes on the vec3 minor dim; the fix is to carry
each vec3 as three (N,) component arrays so every elementwise op runs
across the full ray batch. This module provides:

- V3: a lightweight vec3-of-arrays (tuple of x, y, z) with the math ops
  the integrators need;
- a batched threefry2x32 implementation for counter-based random
  streams with perfect (N,)-shaped layout (the public Salmon et al. 2011
  algorithm, the same family jax.random uses).

The per-ray (AoS, vmapped) implementations elsewhere in the tree remain
the readable reference; integrators/path_soa.py is the performance twin
and is cross-validated against them in tests.
"""

from typing import NamedTuple

import jax.numpy as jnp

from gdpt_tpu.core.dtypes import REAL


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def v3(x, y, z):
    return V3(x, y, z)


def splat(v, shape=()):
    """Broadcast a static (3,)-like value to a V3 of arrays."""
    return V3(
        jnp.broadcast_to(jnp.asarray(v[0], REAL), shape),
        jnp.broadcast_to(jnp.asarray(v[1], REAL), shape),
        jnp.broadcast_to(jnp.asarray(v[2], REAL), shape),
    )


def from_rows(arr):
    """(M, 3) array -> V3 of (M,) columns (host-side scene freeze)."""
    return V3(arr[:, 0], arr[:, 1], arr[:, 2])


def take(arr, idx):
    """Gather with clipped out-of-bounds handling. jnp's default indexing
    mode ('fill') emits compare+select bounds predicates per gather, which
    measured ~10 ms/sample in the bounce loop on TPU; clip mode emits a
    bare gather. Callers guarantee indices are in range (or clamped
    semantics are intended)."""
    return jnp.take(arr, idx, axis=0, mode="clip")


def gather(v: V3, idx):
    return V3(take(v.x, idx), take(v.y, idx), take(v.z, idx))


def where(c, a: V3, b: V3):
    return V3(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z))


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3):
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length_squared(v: V3):
    return dot(v, v)


def length(v: V3):
    return jnp.sqrt(length_squared(v))


def normalize(v: V3, eps=1e-20):
    inv = 1.0 / jnp.maximum(length(v), eps)
    return v * inv


def vmax(v: V3):
    return jnp.maximum(jnp.maximum(v.x, v.y), v.z)


def luminance(v: V3):
    return v.x * 0.212671 + v.y * 0.715160 + v.z * 0.072169


class Frame(NamedTuple):
    t: V3
    b: V3
    n: V3


def coordinate_system(n: V3) -> Frame:
    """Frisvad's basis (reference: src/frame.h:12-22), branch-free."""
    degen = n.z < (-1.0 + 1e-6)
    safe_z = jnp.where(degen, 0.0, n.z)
    a = 1.0 / (1.0 + safe_z)
    b = -n.x * n.y * a
    t = V3(1.0 - n.x * n.x * a, b, -n.x)
    bt = V3(b, 1.0 - n.y * n.y * a, -n.y)
    zeros = jnp.zeros_like(n.x)
    t_d = V3(zeros, zeros - 1.0, zeros)
    bt_d = V3(zeros - 1.0, zeros, zeros)
    return Frame(where(degen, t_d, t), where(degen, bt_d, bt), n)


def to_local(f: Frame, v: V3) -> V3:
    return V3(dot(v, f.t), dot(v, f.b), dot(v, f.n))


def to_world(f: Frame, v: V3) -> V3:
    return V3(
        f.t.x * v.x + f.b.x * v.y + f.n.x * v.z,
        f.t.y * v.x + f.b.y * v.y + f.n.y * v.z,
        f.t.z * v.x + f.b.z * v.y + f.n.z * v.z,
    )


def flip(f: Frame, cond) -> Frame:
    s = jnp.where(cond, -1.0, 1.0)
    return Frame(f.t * s, f.b * s, f.n * s)


# ---------------------------------------------------------------------------
# Batched counter-based RNG: threefry2x32 (Salmon et al., SC'11)
# ---------------------------------------------------------------------------

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def threefry2x32(k0, k1, c0, c1):
    """5-round-pair threefry2x32 on uint32 arrays (20 rounds as in the
    reference implementation). Returns two uint32 arrays."""
    k0 = k0.astype(jnp.uint32)
    k1 = k1.astype(jnp.uint32)
    x0 = c0.astype(jnp.uint32)
    x1 = c1.astype(jnp.uint32)
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    keys = (k0, k1, ks2)
    x0 = x0 + k0
    x1 = x1 + k1
    for block in range(5):
        for i in range(4):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROT[(block % 2) * 4 + i])
            x1 = x1 ^ x0
        add0 = keys[(block + 1) % 3]
        add1 = keys[(block + 2) % 3]
        x0 = x0 + add0
        x1 = x1 + add1 + jnp.uint32(block + 1)
    return x0, x1


def pcg3d(v0, v1, v2):
    """PCG3D hash (Jarzynski & Olano, "Hash Functions for GPU Rendering",
    JCGT 2020) on uint32 arrays; ~5x cheaper than threefry with rendering-
    grade stream quality. Returns two mixed uint32 outputs."""
    m = jnp.uint32(1664525)
    a = jnp.uint32(1013904223)
    x = v0.astype(jnp.uint32) * m + a
    y = v1.astype(jnp.uint32) * m + a
    z = v2.astype(jnp.uint32) * m + a
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    return x, y


_RNG_IMPL = "pcg3d"  # set GDPT_RNG=threefry for the heavyweight streams


def uniform2(seed, stream, counter, sample=0):
    """Two independent uniforms in [0, 1) per lane.

    seed: scalar uint32; stream: (N,) lane stream ids (e.g. ray index);
    counter: scalar or (N,) use-site counter; sample: scalar sample index.

    The sample index is a separate input word (threefry's 4th word /
    mixed into the pcg3d seed lane), so use-site counters own the full
    32-bit space per sample — no stride to overflow, no cross-sample
    stream reuse however deep the loop counters run.
    """
    import os

    c = jnp.broadcast_to(jnp.asarray(counter, jnp.uint32), stream.shape)
    s = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), stream.shape)
    smp = jnp.broadcast_to(jnp.asarray(sample, jnp.uint32), stream.shape)
    if os.environ.get("GDPT_RNG", _RNG_IMPL) == "threefry":
        r0, r1 = threefry2x32(s, stream.astype(jnp.uint32), c, smp)
    else:
        # Premix the stream id (murmur3 finalizer): raw pcg3d leaves
        # adjacent streams at the same counter measurably correlated, which
        # inflates gradient-domain variance (neighbor pixels share the
        # one-sided difference estimates).
        t = stream.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        t = t ^ (t >> 16)
        t = t * jnp.uint32(0x85EBCA6B)
        t = t ^ (t >> 13)
        r0, r1 = pcg3d(t, c, s + smp * jnp.uint32(0x9E3779B9))
    scale = jnp.asarray(1.0 / 4294967808.0, REAL)  # keeps values < 1 in f32
    return r0.astype(REAL) * scale, r1.astype(REAL) * scale


def uniform1(seed, stream, counter, sample=0):
    return uniform2(seed, stream, counter, sample)[0]
