"""Intersection layer: ray hit -> PathVertex with shading info.

The TPU analogue of reference: src/intersection.cpp:7-64 plus the
per-shape ``compute_shading_info`` ops (reference:
src/shapes/triangle_mesh.inl:77-169, src/shapes/sphere.inl:265-268).
Per-ray scalar code meant to be vmapped; both shape kinds are evaluated
branch-free and selected by primitive type, gated statically on whether
the scene contains that kind at all.
"""

from typing import NamedTuple

import jax.numpy as jnp

from gdpt_tpu.accel import traverse as tr
from gdpt_tpu.core import math as gm
from gdpt_tpu.core.dtypes import INT, REAL
from gdpt_tpu.scene.build import DeviceScene, SceneStatic


class PathVertex(NamedTuple):
    position: jnp.ndarray       # (3,)
    geom_normal: jnp.ndarray    # (3,), flipped toward shading normal
    frame: jnp.ndarray          # (3, 3) shading frame rows: x, y, n
    st: jnp.ndarray             # (2,) surface parametrization (barys / spherical)
    uv: jnp.ndarray             # (2,) texture uv
    uv_screen_size: jnp.ndarray  # () texture footprint du/dx
    mean_curvature: jnp.ndarray  # ()
    ray_radius: jnp.ndarray     # () ray differential radius at the hit
    shape_id: jnp.ndarray       # () int
    prim_id: jnp.ndarray        # () int, global primitive id
    material_id: jnp.ndarray    # () int
    interior_medium_id: jnp.ndarray  # () int
    exterior_medium_id: jnp.ndarray  # () int
    valid: jnp.ndarray          # () bool

    @property
    def shading_normal(self):
        return self.frame[2]


def _mesh_shading(scene: DeviceScene, tri_id, bary, geom_normal):
    """Triangle shading info (reference: src/shapes/triangle_mesh.inl:77-169)."""
    idx = scene.tri_index[tri_id]
    p0, p1, p2 = scene.vtx_pos[idx[0]], scene.vtx_pos[idx[1]], scene.vtx_pos[idx[2]]
    has_uv = scene.tri_has_uvs[tri_id]
    uv0 = jnp.where(has_uv, scene.vtx_uv[idx[0]], jnp.array([0.0, 0.0], REAL))
    uv1 = jnp.where(has_uv, scene.vtx_uv[idx[1]], jnp.array([1.0, 0.0], REAL))
    uv2 = jnp.where(has_uv, scene.vtx_uv[idx[2]], jnp.array([1.0, 1.0], REAL))
    b1, b2 = bary[0], bary[1]
    uv = (1.0 - b1 - b2) * uv0 + b1 * uv1 + b2 * uv2

    # dp/duv via the duv/dst Jacobian inverse.
    duvds = uv2 - uv0
    duvdt = uv2 - uv1
    det = duvds[0] * duvdt[1] - duvdt[0] * duvds[1]
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-8, det, 1.0)
    dsdu = duvdt[1] * inv_det
    dtdu = -duvds[1] * inv_det
    dsdv = -duvdt[0] * inv_det
    dtdv = duvds[0] * inv_det
    dpds = p2 - p0
    dpdt = p2 - p1
    dpdu = dpds * dsdu + dpdt * dtdu
    dpdv = dpds * dsdv + dpdt * dtdv
    # Degenerate uv parametrization: any orthogonal basis.
    t_fallback, b_fallback = gm.coordinate_system(geom_normal)
    degen = jnp.abs(det) <= 1e-8
    dpdu = jnp.where(degen, t_fallback, dpdu)
    dpdv = jnp.where(degen, b_fallback, dpdv)

    has_n = scene.tri_has_normals[tri_id]
    n0, n1, n2 = scene.vtx_normal[idx[0]], scene.vtx_normal[idx[1]], scene.vtx_normal[idx[2]]
    sn_interp = gm.normalize(
        (1.0 - b1 - b2) * n0 + b1 * n1 + b2 * n2, eps=1e-20
    )
    shading_normal = jnp.where(has_n, sn_interp, geom_normal)

    tangent = gm.normalize(
        dpdu - shading_normal * gm.dot(shading_normal, dpdu), eps=1e-20
    )
    bitangent = gm.normalize(gm.cross(shading_normal, tangent), eps=1e-20)

    # Mean curvature from dn/du, dn/dv (zero without vertex normals).
    dnds = n2 - n0
    dndt = n2 - n1
    dndu = dnds * dsdu + dndt * dtdu
    dndv = dnds * dsdv + dndt * dtdv
    mean_curvature = jnp.where(
        has_n, 0.5 * (gm.dot(dndu, tangent) + gm.dot(dndv, bitangent)), 0.0
    )

    frame = gm.frame_from_tangent(tangent, bitangent, shading_normal)
    inv_uv_size = jnp.maximum(gm.length(dpdu), gm.length(dpdv))
    return uv, frame, mean_curvature, inv_uv_size


def _sphere_shading(scene: DeviceScene, sph_id, position):
    """Sphere shading info (reference: src/shapes/sphere.inl:265-268):
    spherical-coordinate tangents, mean curvature 1/r."""
    center = scene.geom.sph_center[sph_id]
    radius = scene.geom.sph_radius[sph_id]
    geom_normal = gm.normalize(position - center, eps=1e-20)
    u, v = tr.sphere_uv(center, radius, position)
    theta_u = u * 2.0 * jnp.pi  # azimuth
    theta_v = v * jnp.pi        # elevation
    # p = center + r (cos u sin v, ... y-up convention of sphere_uv)
    sin_u, cos_u = jnp.sin(theta_u), jnp.cos(theta_u)
    sin_v, cos_v = jnp.sin(theta_v), jnp.cos(theta_v)
    dpdu = radius * jnp.array([-sin_u, 0.0, cos_u]) * sin_v
    dpdv = radius * jnp.array([cos_u * cos_v, -sin_v, sin_u * cos_v])
    tangent = gm.normalize(
        dpdu - geom_normal * gm.dot(geom_normal, dpdu), eps=1e-20
    )
    bitangent = gm.normalize(gm.cross(geom_normal, tangent), eps=1e-20)
    frame = gm.frame_from_tangent(tangent, bitangent, geom_normal)
    inv_uv_size = 0.5 * (gm.length(dpdu) + gm.length(dpdv))
    st = jnp.stack([u, v])
    return st, frame, geom_normal, 1.0 / radius, inv_uv_size


def vertex_from_hit(
    scene: DeviceScene,
    static: SceneStatic,
    org, d, hit: tr.Hit,
    ray_radius=0.0, ray_spread=0.0,
) -> PathVertex:
    n_tris = static.n_tris
    position = org + hit.t[..., None] * d if hit.t.ndim else org + hit.t * d
    prim = jnp.maximum(hit.prim_id, 0)
    is_tri = prim < n_tris if n_tris else jnp.asarray(False)

    uv = jnp.zeros(2, REAL)
    st = jnp.stack([hit.u, hit.v])
    frame = jnp.eye(3, dtype=REAL)
    geom_normal = jnp.array([0.0, 0.0, 1.0], REAL)
    mean_curv = jnp.asarray(0.0, REAL)
    inv_uv_size = jnp.asarray(1.0, REAL)
    shape_id = jnp.asarray(0, INT)

    if n_tris:
        tri_id = jnp.clip(prim, 0, n_tris - 1)
        e1, e2 = scene.geom.tri_e1[tri_id], scene.geom.tri_e2[tri_id]
        gn_tri = gm.normalize(gm.cross(e1, e2), eps=1e-20)
        uv_t, frame_t, mc_t, ius_t = _mesh_shading(scene, tri_id, st, gn_tri)
        uv, frame, geom_normal, mean_curv, inv_uv_size = uv_t, frame_t, gn_tri, mc_t, ius_t
        shape_id = scene.geom.tri_shape_id[tri_id]
    if static.n_spheres:
        sph_id = jnp.clip(prim - n_tris, 0, static.n_spheres - 1)
        st_s, frame_s, gn_s, mc_s, ius_s = _sphere_shading(scene, sph_id, position)
        if n_tris:
            sel = is_tri
            uv = jnp.where(sel, uv, st_s)
            st = jnp.where(sel, st, st_s)
            frame = jnp.where(sel, frame, frame_s)
            geom_normal = jnp.where(sel, geom_normal, gn_s)
            mean_curv = jnp.where(sel, mean_curv, mc_s)
            inv_uv_size = jnp.where(sel, inv_uv_size, ius_s)
            shape_id = jnp.where(sel, shape_id, scene.geom.sph_shape_id[sph_id])
        else:
            uv, st, frame = st_s, st_s, frame_s
            geom_normal, mean_curv, inv_uv_size = gn_s, mc_s, ius_s
            shape_id = scene.geom.sph_shape_id[sph_id]

    # Flip the geometric normal toward the shading normal
    # (reference: src/intersection.cpp:58-60).
    flip = gm.dot(geom_normal, frame[2]) < 0
    geom_normal = jnp.where(flip, -geom_normal, geom_normal)

    new_radius = ray_radius + ray_spread * hit.t
    uv_screen = new_radius / jnp.maximum(inv_uv_size, 1e-20)

    return PathVertex(
        position=position,
        geom_normal=geom_normal,
        frame=frame,
        st=st,
        uv=uv,
        uv_screen_size=uv_screen,
        mean_curvature=mean_curv,
        ray_radius=new_radius,
        shape_id=shape_id,
        prim_id=hit.prim_id,
        material_id=scene.shape_material_id[shape_id],
        interior_medium_id=scene.shape_interior_medium[shape_id],
        exterior_medium_id=scene.shape_exterior_medium[shape_id],
        valid=hit.prim_id >= 0,
    )


def intersect(scene: DeviceScene, static: SceneStatic, org, d, tnear, tfar,
              ray_radius=0.0, ray_spread=0.0) -> PathVertex:
    """Closest hit + shading info, the rtcIntersect1 replacement."""
    fn = tr.intersect_brute if static.use_brute_force else tr.intersect_bvh
    hit = fn(scene.geom, org, d, tnear, tfar)
    return vertex_from_hit(scene, static, org, d, hit, ray_radius, ray_spread)


def occluded(scene: DeviceScene, static: SceneStatic, org, d, tnear, tfar):
    """Any-hit query, the rtcOccluded1 replacement."""
    fn = tr.occluded_brute if static.use_brute_force else tr.occluded_bvh
    return fn(scene.geom, org, d, tnear, tfar)
