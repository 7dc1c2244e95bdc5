"""Light sampling / pdf / emission ops.

Replaces reference: src/light.cpp + src/lights/*.inl and the shape
sampling ops they call (reference: src/shapes/sphere.inl:164-259,
src/shapes/triangle_mesh.inl:24-75). Per-ray scalar jnp, vmapped by the
integrators; light and shape kinds are resolved with masks, statically
gated by which kinds exist in the scene.

A sampled light point is (position, normal, is_envmap). For environment
maps the "normal" stores the direction pointing outward from the light
(i.e. -direction_to_light), matching the reference convention
(reference: src/lights/envmap.inl:16-19).
"""

import jax.numpy as jnp

from gdpt_tpu.core import math as gm
from gdpt_tpu.core.distributions import pdf_2d, sample_2d
from gdpt_tpu.core.dtypes import INT, REAL
from gdpt_tpu.scene import textures as tex
from gdpt_tpu.scene.build import LIGHT_AREA, LIGHT_ENVMAP, SHAPE_MESH, SHAPE_SPHERE, DeviceScene, SceneStatic


def sample_light_id(scene: DeviceScene, w):
    """Power-weighted light selection (reference: src/scene.cpp:61,
    src/scene.h:86-89)."""
    n = scene.lights.pmf.shape[0]
    idx = jnp.searchsorted(scene.lights.cdf, w, side="right") - 1
    return jnp.clip(idx, 0, n - 1).astype(INT)


def light_pmf(scene: DeviceScene, light_id):
    return scene.lights.pmf[light_id]


def _xform_vec(m, v):
    return m[:3, :3] @ v


def _sample_mesh_point(scene: DeviceScene, light_id, uv, w):
    """Area-weighted triangle pick + uniform point
    (reference: src/shapes/triangle_mesh.inl:24-50)."""
    cdf = scene.lights.tri_cdf[light_id]
    n = cdf.shape[0] - 1
    local_tri = jnp.clip(jnp.searchsorted(cdf, w, side="right") - 1, 0, n - 1)
    tri = scene.lights.tri_first[light_id] + local_tri.astype(INT)
    tri = jnp.clip(tri, 0, scene.tri_index.shape[0] - 1)
    idx = scene.tri_index[tri]
    v0, v1, v2 = scene.vtx_pos[idx[0]], scene.vtx_pos[idx[1]], scene.vtx_pos[idx[2]]
    e1, e2 = v1 - v0, v2 - v0
    a = jnp.sqrt(jnp.clip(uv[0], 0.0, 1.0))
    b1 = 1.0 - a
    b2 = a * uv[1]
    gn = gm.normalize(gm.cross(e1, e2), eps=1e-20)
    # Flip the geometric normal toward the interpolated shading normal.
    has_n = scene.tri_has_normals[tri]
    n0, n1, n2 = scene.vtx_normal[idx[0]], scene.vtx_normal[idx[1]], scene.vtx_normal[idx[2]]
    sn = gm.normalize((1 - b1 - b2) * n0 + b1 * n1 + b2 * n2, eps=1e-20)
    flip = has_n & (gm.dot(gn, sn) < 0)
    gn = jnp.where(flip, -gn, gn)
    pos = v0 + e1 * b1 + e2 * b2
    return pos, gn


def _sample_sphere_point(scene: DeviceScene, shape_id, ref_point, uv):
    """PBRT cone sampling toward the sphere, uniform fallback inside
    (reference: src/shapes/sphere.inl:164-238)."""
    sph = scene.shape_prim_offset[shape_id]
    center = scene.geom.sph_center[sph]
    r = scene.geom.sph_radius[sph]
    d2 = gm.distance_squared(ref_point, center)
    inside = d2 < r * r

    # Inside: uniform sphere.
    z = 1.0 - 2.0 * uv[0]
    rr = gm.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * uv[1]
    n_in = jnp.array([rr * jnp.cos(phi), rr * jnp.sin(phi), z]).astype(REAL)
    p_in = center + r * n_in

    # Outside: cone sampling.
    dir_to_center = gm.normalize(center - ref_point, eps=1e-20)
    frame = gm.make_frame(dir_to_center)
    sin2_max = r * r / jnp.maximum(d2, 1e-20)
    cos_max = gm.safe_sqrt(1.0 - sin2_max)
    cos_e = (1.0 - uv[0]) + uv[0] * cos_max
    sin_e = gm.safe_sqrt(1.0 - cos_e * cos_e)
    azim = uv[1] * 2.0 * jnp.pi
    dc = jnp.sqrt(jnp.maximum(d2, 1e-20))
    ds = dc * cos_e - gm.safe_sqrt(r * r - dc * dc * sin_e * sin_e)
    cos_alpha = (dc * dc + r * r - ds * ds) / jnp.maximum(2.0 * dc * r, 1e-20)
    sin_alpha = gm.safe_sqrt(1.0 - cos_alpha * cos_alpha)
    n_out = -gm.to_world(
        frame,
        jnp.array([sin_alpha * jnp.cos(azim), sin_alpha * jnp.sin(azim), cos_alpha]),
    )
    p_out = center + r * n_out
    pos = jnp.where(inside, p_in, p_out)
    nrm = jnp.where(inside, n_in, n_out)
    return pos, nrm


def _envmap_dir_from_uv(scene: DeviceScene, uv):
    """uv in [0,1]^2 -> world direction pointing from scene toward the
    envmap (reference: src/lights/envmap.inl:8-19; y-up convention)."""
    azimuth = uv[0] * 2.0 * jnp.pi
    elevation = uv[1] * jnp.pi
    local = jnp.array(
        [
            jnp.sin(azimuth) * jnp.sin(elevation),
            jnp.cos(elevation),
            -jnp.cos(azimuth) * jnp.sin(elevation),
        ]
    )
    return _xform_vec(scene.envmap.to_world, local)


def envmap_uv_from_dir(scene: DeviceScene, world_dir):
    """world direction (scene -> envmap) to uv, plus sin(elevation)."""
    local = _xform_vec(scene.envmap.to_local, world_dir)
    u = jnp.arctan2(local[0], -local[2]) / (2.0 * jnp.pi)
    u = jnp.where(u < 0, u + 1.0, u)
    v = jnp.arccos(jnp.clip(local[1], -1.0, 1.0)) / jnp.pi
    sin_elev = gm.safe_sqrt(1.0 - local[1] * local[1])
    return jnp.stack([u, v]), sin_elev


def sample_point_on_light(scene: DeviceScene, static: SceneStatic, light_id,
                          ref_point, uv, w):
    """Returns (position, normal). For envmaps, normal = -dir_to_light and
    position = 0 (reference convention)."""
    pos = jnp.zeros(3, REAL)
    nrm = jnp.array([0.0, 0.0, 1.0], REAL)
    shape_id = jnp.maximum(scene.lights.shape_id[light_id], 0)
    is_area = scene.lights.kind[light_id] == LIGHT_AREA
    if static.any_mesh_light:
        p_m, n_m = _sample_mesh_point(scene, light_id, uv, w)
        is_mesh = is_area & (scene.shape_kind[shape_id] == SHAPE_MESH)
        pos = jnp.where(is_mesh, p_m, pos)
        nrm = jnp.where(is_mesh, n_m, nrm)
    if static.any_sphere_light:
        p_s, n_s = _sample_sphere_point(scene, shape_id, ref_point, uv)
        is_sph = is_area & (scene.shape_kind[shape_id] == SHAPE_SPHERE)
        pos = jnp.where(is_sph, p_s, pos)
        nrm = jnp.where(is_sph, n_s, nrm)
    if static.has_envmap:
        env_uv = sample_2d(scene.envmap.dist, uv)
        wdir = _envmap_dir_from_uv(scene, env_uv)
        is_env = scene.lights.kind[light_id] == LIGHT_ENVMAP
        pos = jnp.where(is_env, jnp.zeros(3, REAL), pos)
        nrm = jnp.where(is_env, -wdir, nrm)
    return pos, nrm


def pdf_point_on_light(scene: DeviceScene, static: SceneStatic, light_id,
                       point_pos, point_normal, ref_point):
    """Density of sample_point_on_light — area measure for surfaces,
    solid angle for envmaps (reference: src/light.cpp + shape pdf ops)."""
    pdf = jnp.asarray(0.0, REAL)
    shape_id = jnp.maximum(scene.lights.shape_id[light_id], 0)
    is_area = scene.lights.kind[light_id] == LIGHT_AREA
    if static.any_mesh_light:
        p_mesh = 1.0 / jnp.maximum(scene.shape_area[shape_id], 1e-20)
        is_mesh = is_area & (scene.shape_kind[shape_id] == SHAPE_MESH)
        pdf = jnp.where(is_mesh, p_mesh, pdf)
    if static.any_sphere_light:
        sph = scene.shape_prim_offset[shape_id]
        center = scene.geom.sph_center[sph]
        r = scene.geom.sph_radius[sph]
        d2 = gm.distance_squared(ref_point, center)
        inside = d2 < r * r
        p_uniform = 1.0 / jnp.maximum(scene.shape_area[shape_id], 1e-20)
        sin2_max = r * r / jnp.maximum(d2, 1e-20)
        cos_max = gm.safe_sqrt(1.0 - sin2_max)
        p_cone = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-20)
        dvec = gm.normalize(point_pos - ref_point, eps=1e-20)
        p_area = p_cone * jnp.abs(gm.dot(point_normal, dvec)) / jnp.maximum(
            gm.distance_squared(ref_point, point_pos), 1e-20
        )
        p_sph = jnp.where(inside, p_uniform, p_area)
        is_sph = is_area & (scene.shape_kind[shape_id] == SHAPE_SPHERE)
        pdf = jnp.where(is_sph, p_sph, pdf)
    if static.has_envmap:
        wdir = -point_normal
        env_uv, sin_elev = envmap_uv_from_dir(scene, wdir)
        p_env = jnp.where(
            sin_elev > 0,
            pdf_2d(scene.envmap.dist, env_uv)
            / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_elev, 1e-20),
            0.0,
        )
        is_env = scene.lights.kind[light_id] == LIGHT_ENVMAP
        pdf = jnp.where(is_env, p_env, pdf)
    return pdf


def emission_light(scene: DeviceScene, static: SceneStatic, light_id,
                   view_dir, view_footprint, point_pos, point_normal):
    """Emitted radiance toward view_dir (pointing away from the light)
    (reference: src/lights/diffuse_area_light.inl:16-21, envmap.inl:44-73)."""
    out = jnp.zeros(3, REAL)
    is_area = scene.lights.kind[light_id] == LIGHT_AREA
    area_val = jnp.where(
        gm.dot(point_normal, view_dir) > 0,
        scene.lights.intensity[light_id],
        jnp.zeros(3, REAL),
    )
    out = jnp.where(is_area, area_val, out)
    if static.has_envmap:
        env_val = envmap_emission(scene, -view_dir, view_footprint)
        is_env = scene.lights.kind[light_id] == LIGHT_ENVMAP
        out = jnp.where(is_env, env_val, out)
    return out


def envmap_emission(scene: DeviceScene, dir_to_env, spread):
    """Radiance arriving from the envmap along dir_to_env (scene->env).

    Always a level-0 bilinear lookup, replicating the reference exactly:
    src/lights/envmap.inl:60-72 computes footprint =
    min(sqrt(dudwx^2+dudwz^2), dvdwy) where dvdwy = -1/sqrt(...) is
    always NEGATIVE, so the min is always negative and never multiplied
    by the ray spread; texture.h:137-138 then clamps
    log2(max(neg, 1e-8)) far below level 0. Net effect: the reference's
    envmap lookups are unconditionally level-0 bilinear, and matching
    its artifacts (images/disney_*.exr) requires doing the same — a
    'corrected' trilinear footprint shifts disney_bsdf's mean by +29%
    vs the reference render."""
    del spread
    uv, _ = envmap_uv_from_dir(scene, dir_to_env)
    val = tex.eval_texture(
        scene.pool3, tex.gather_desc(scene.envmap.tex, jnp.asarray(0, INT)),
        uv, jnp.asarray(0.0, REAL),
    )
    return val * scene.envmap.scale


def emission_at_vertex(scene: DeviceScene, static: SceneStatic, vertex, view_dir):
    """Emission of the area light attached to a hit shape
    (reference: src/intersection.cpp:87-98). Returns zeros for
    non-emissive shapes."""
    light_id = scene.shape_light_id[vertex.shape_id]
    is_light = light_id >= 0
    lid = jnp.maximum(light_id, 0)
    val = emission_light(
        scene, static, lid, view_dir, vertex.uv_screen_size,
        vertex.position, vertex.geom_normal,
    )
    return jnp.where(is_light, val, jnp.zeros(3, REAL))
