"""Pallas TPU kernels for brute-force ray casting.

The XLA (T, N)-broadcast intersector materializes every (T, N)
intermediate in HBM; at 17 triangles x 262k rays that is several hundred
MB of traffic per query. These kernels keep the primitive soup in
scalar memory and stream rays through VMEM tiles, so the whole
Moeller-Trumbore / sphere test chain stays on-chip: HBM traffic drops to
the ray inputs + hit outputs.

Grid: rays reshaped (n_rows, 128); each program handles a (BLOCK_ROWS,
128) tile. The primitive loop is a fori_loop over SMEM-resident
primitive components (LEAF count is the scene's total primitive count —
these kernels are for the brute-force regime, <= 128 primitives).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.core.soa import V3

BLOCK_ROWS = 64  # rays per program = BLOCK_ROWS * 128
LANES = 128


def _tri_kernel_body(n_tris, n_sph, tnear,
                     tri_ref, sph_ref,
                     ox, oy, oz, dx, dy, dz,
                     t_out, prim_out, u_out, v_out,
                     gnx_out, gny_out, gnz_out):
    """tri_ref: (9, T) SMEM (v0x v0y v0z e1x e1y e1z e2x e2y e2z).
    sph_ref: (4, S) SMEM (cx cy cz r). Also emits the (unnormalized)
    geometric normal of the hit primitive — cross(e1,e2) for triangles,
    hitpoint-center for spheres — saving the XLA-side regather."""
    shape = ox.shape
    best_t = jnp.full(shape, BIG, REAL)
    best_prim = jnp.full(shape, -1, INT)
    best_u = jnp.zeros(shape, REAL)
    best_v = jnp.zeros(shape, REAL)
    best_gx = jnp.zeros(shape, REAL)
    best_gy = jnp.zeros(shape, REAL)
    best_gz = jnp.ones(shape, REAL)
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]

    def tri_body(i, carry):
        bt, bp, bu, bv, bgx, bgy, bgz = carry
        v0x = tri_ref[0, i]
        v0y = tri_ref[1, i]
        v0z = tri_ref[2, i]
        e1x = tri_ref[3, i]
        e1y = tri_ref[4, i]
        e1z = tri_ref[5, i]
        e2x = tri_ref[6, i]
        e2y = tri_ref[7, i]
        e2z = tri_ref[8, i]
        # pvec = d x e2
        px = d_y * e2z - d_z * e2y
        py = d_z * e2x - d_x * e2z
        pz = d_x * e2y - d_y * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
        tx = o_x - v0x
        ty = o_y - v0y
        tz = o_z - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        # qvec = tvec x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (d_x * qx + d_y * qy + d_z * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= tnear) & (t < bt)
        gx = e1y * e2z - e1z * e2y
        gy = e1z * e2x - e1x * e2z
        gz = e1x * e2y - e1y * e2x
        bt = jnp.where(hit, t, bt)
        bp = jnp.where(hit, i, bp)
        bu = jnp.where(hit, u, bu)
        bv = jnp.where(hit, v, bv)
        bgx = jnp.where(hit, gx, bgx)
        bgy = jnp.where(hit, gy, bgy)
        bgz = jnp.where(hit, gz, bgz)
        return bt, bp, bu, bv, bgx, bgy, bgz

    if n_tris:
        (best_t, best_prim, best_u, best_v,
         best_gx, best_gy, best_gz) = jax.lax.fori_loop(
            0, n_tris, tri_body,
            (best_t, best_prim, best_u, best_v, best_gx, best_gy, best_gz),
        )

    def sph_body(i, carry):
        bt, bp, bgx, bgy, bgz = carry
        cx = sph_ref[0, i]
        cy = sph_ref[1, i]
        cz = sph_ref[2, i]
        r = sph_ref[3, i]
        vx = o_x - cx
        vy = o_y - cy
        vz = o_z - cz
        a = d_x * d_x + d_y * d_y + d_z * d_z
        inv_a = 1.0 / jnp.where(a != 0, a, 1.0)
        tm = -(d_x * vx + d_y * vy + d_z * vz) * inv_a
        mx = vx + d_x * tm
        my = vy + d_y * tm
        mz = vz + d_z * tm
        disc = r * r - (mx * mx + my * my + mz * mz)
        dt = jnp.sqrt(jnp.maximum(disc, 0.0) * inv_a)
        t0 = tm - dt
        t1 = tm + dt
        use_lo = (t0 >= tnear) & (t0 < bt)
        use_hi = (t1 >= tnear) & (t1 < bt)
        t = jnp.where(use_lo, t0, t1)
        hit = (disc >= 0) & (a != 0) & (use_lo | use_hi)
        bt = jnp.where(hit, t, bt)
        bp = jnp.where(hit, n_tris + i, bp)
        bgx = jnp.where(hit, o_x + t * d_x - cx, bgx)
        bgy = jnp.where(hit, o_y + t * d_y - cy, bgy)
        bgz = jnp.where(hit, o_z + t * d_z - cz, bgz)
        return bt, bp, bgx, bgy, bgz

    if n_sph:
        best_t, best_prim, best_gx, best_gy, best_gz = jax.lax.fori_loop(
            0, n_sph, sph_body, (best_t, best_prim, best_gx, best_gy, best_gz)
        )

    t_out[:] = best_t
    prim_out[:] = best_prim
    u_out[:] = best_u
    v_out[:] = best_v
    gnx_out[:] = best_gx
    gny_out[:] = best_gy
    gnz_out[:] = best_gz


@functools.partial(
    jax.jit, static_argnames=("n_tris", "n_sph", "tnear_static")
)
def pallas_intersect_brute(tri_soup, sph_soup, ox, oy, oz, dx, dy, dz,
                           n_tris, n_sph, tnear_static):
    """Closest-hit over all primitives.

    tri_soup: (9, Tpad) f32; sph_soup: (4, Spad) f32; rays are flat (N,)
    component arrays with N % (BLOCK_ROWS*128) == 0.
    Returns (t, prim, u, v) flat arrays; prim -1 on miss (t = BIG).
    """
    n = ox.shape[0]
    rows = n // LANES
    grid = (rows // BLOCK_ROWS,)
    shape2d = (rows, LANES)

    def reshape(a):
        return a.reshape(shape2d)

    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem_tri = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = [
        jax.ShapeDtypeStruct(shape2d, REAL),
        jax.ShapeDtypeStruct(shape2d, INT),
    ] + [jax.ShapeDtypeStruct(shape2d, REAL)] * 5
    kernel = functools.partial(_tri_kernel_body, n_tris, n_sph, tnear_static)
    t, prim, u, v, gx, gy, gz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_tri, smem_tri] + [ray_spec] * 6,
        out_specs=[ray_spec] * 7,
        out_shape=out_shapes,
        interpret=jax.default_backend() == "cpu",
    )(tri_soup, sph_soup, reshape(ox), reshape(oy), reshape(oz),
      reshape(dx), reshape(dy), reshape(dz))
    return (t.ravel(), prim.ravel(), u.ravel(), v.ravel(),
            gx.ravel(), gy.ravel(), gz.ravel())


def pack_soups(geom_soa, n_tris, n_sph):
    """Build the (9, T) / (4, S) primitive soups (host/jit-time constant)."""
    g = geom_soa
    if n_tris:
        tri = jnp.stack(
            [g.tri_v0.x, g.tri_v0.y, g.tri_v0.z,
             g.tri_e1.x, g.tri_e1.y, g.tri_e1.z,
             g.tri_e2.x, g.tri_e2.y, g.tri_e2.z]
        )
    else:
        tri = jnp.zeros((9, 1), REAL)
    if n_sph:
        sph = jnp.stack([g.sph_center.x, g.sph_center.y, g.sph_center.z, g.sph_radius])
    else:
        sph = jnp.zeros((4, 1), REAL)
    return tri, sph


def intersect_brute_pallas(static, geom_soa, org, d, tnear, tfar):
    """Drop-in for traverse_soa.intersect_brute_soa (tnear static scalar,
    tfar must be BIG — closest hit over the full ray)."""
    from gdpt_tpu.accel.traverse_soa import HitSoA

    n = org.x.shape[0]
    block = BLOCK_ROWS * LANES
    pad = (-n) % block
    def p(a):
        return jnp.concatenate([a, jnp.zeros(pad, a.dtype)]) if pad else a

    tri, sph = pack_soups(geom_soa, static.n_tris, static.n_spheres)
    t, prim, u, v, gx, gy, gz = pallas_intersect_brute(
        tri, sph, p(org.x), p(org.y), p(org.z), p(d.x), p(d.y), p(d.z),
        static.n_tris, static.n_spheres, float(tnear),
    )
    if pad:
        t, prim, u, v = t[:n], prim[:n], u[:n], v[:n]
        gx, gy, gz = gx[:n], gy[:n], gz[:n]
    return HitSoA(t, prim, u, v), V3(gx, gy, gz)


def _anyhit_kernel_body(n_tris, n_sph, tnear,
                        tri_ref, sph_ref,
                        ox, oy, oz, dx, dy, dz, tfar,
                        blocked_out):
    shape = ox.shape
    blocked = jnp.zeros(shape, REAL)
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_max = tfar[:]

    def tri_body(i, b):
        v0x = tri_ref[0, i]
        v0y = tri_ref[1, i]
        v0z = tri_ref[2, i]
        e1x = tri_ref[3, i]
        e1y = tri_ref[4, i]
        e1z = tri_ref[5, i]
        e2x = tri_ref[6, i]
        e2y = tri_ref[7, i]
        e2z = tri_ref[8, i]
        px = d_y * e2z - d_z * e2y
        py = d_z * e2x - d_x * e2z
        pz = d_x * e2y - d_y * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = jnp.where(det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
        tx = o_x - v0x
        ty = o_y - v0y
        tz = o_z - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (d_x * qx + d_y * qy + d_z * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= tnear) & (t < t_max)
        return jnp.maximum(b, hit.astype(REAL))

    if n_tris:
        blocked = jax.lax.fori_loop(0, n_tris, tri_body, blocked)

    def sph_body(i, b):
        cx = sph_ref[0, i]
        cy = sph_ref[1, i]
        cz = sph_ref[2, i]
        r = sph_ref[3, i]
        vx = o_x - cx
        vy = o_y - cy
        vz = o_z - cz
        a = d_x * d_x + d_y * d_y + d_z * d_z
        inv_a = 1.0 / jnp.where(a != 0, a, 1.0)
        tm = -(d_x * vx + d_y * vy + d_z * vz) * inv_a
        mx = vx + d_x * tm
        my = vy + d_y * tm
        mz = vz + d_z * tm
        disc = r * r - (mx * mx + my * my + mz * mz)
        dt = jnp.sqrt(jnp.maximum(disc, 0.0) * inv_a)
        t0 = tm - dt
        t1 = tm + dt
        hit = (disc >= 0) & (a != 0) & (
            ((t0 >= tnear) & (t0 < t_max)) | ((t1 >= tnear) & (t1 < t_max))
        )
        return jnp.maximum(b, hit.astype(REAL))

    if n_sph:
        blocked = jax.lax.fori_loop(0, n_sph, sph_body, blocked)
    blocked_out[:] = blocked


@functools.partial(jax.jit, static_argnames=("n_tris", "n_sph", "tnear_static"))
def pallas_occluded_brute(tri_soup, sph_soup, ox, oy, oz, dx, dy, dz, tfar,
                          n_tris, n_sph, tnear_static):
    n = ox.shape[0]
    rows = n // LANES
    grid = (rows // BLOCK_ROWS,)
    shape2d = (rows, LANES)

    def reshape(a):
        return a.reshape(shape2d)

    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(_anyhit_kernel_body, n_tris, n_sph, tnear_static)
    blocked = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct(shape2d, REAL),
        interpret=jax.default_backend() == "cpu",
    )(tri_soup, sph_soup, reshape(ox), reshape(oy), reshape(oz),
      reshape(dx), reshape(dy), reshape(dz), reshape(tfar))
    return blocked.ravel()


def occluded_brute_pallas(static, geom_soa, org, d, tnear, tfar):
    """Any-hit within [tnear, tfar] (tfar per-ray). Returns an f32 mask."""
    n = org.x.shape[0]
    block = BLOCK_ROWS * LANES
    pad = (-n) % block

    def p(a, fill=0.0):
        if not pad:
            return a
        return jnp.concatenate([a, jnp.full(pad, fill, a.dtype)])

    tfar_arr = jnp.broadcast_to(jnp.asarray(tfar, REAL), (n,))
    tri, sph = pack_soups(geom_soa, static.n_tris, static.n_spheres)
    blocked = pallas_occluded_brute(
        tri, sph, p(org.x), p(org.y), p(org.z), p(d.x), p(d.y), p(d.z),
        p(tfar_arr, -1.0),
        static.n_tris, static.n_spheres, float(tnear),
    )
    return blocked[:n] if pad else blocked
