"""Batched (SoA) surface path tracer — the performance twin of path.py.

Same transport as integrators/path.py (NEE + power-2 MIS + Russian
roulette, reference: src/path_tracing.h:13-348) but written directly in
batch form over (N,) component arrays so every elementwise op fills the
TPU's VPU lanes (see core/soa.py). Cross-validated against the per-ray
implementation in tests/test_soa.py.

Coverage: the full 9-material stack (ops/materials_soa.py) with
constant/checkerboard/image spectrum and float slots, mesh + sphere
area lights, constant and image environment maps. Image lookups carry
per-lane ray differentials (radius/spread in the loop state, per-tri
footprint constants tri_inv_uv/tri_mean_curv) into trilinear mip
filtering, matching the per-ray path's eval_texture
(reference: src/texture.h:129-139, src/mipmap.h:76-88).
"""

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.accel import traverse_soa as trs
from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.core.soa import V3
from gdpt_tpu.ops import materials_soa as msoa
from gdpt_tpu.ops import textures_soa as tsoa
from gdpt_tpu.scene import model as M
from gdpt_tpu.scene.build import LIGHT_ENVMAP, SHAPE_MESH, SHAPE_SPHERE, Scene
from gdpt_tpu.scene import textures as tex

HARD_BOUNCE_CAP = 64

# RNG use-site counters (stride 16 per bounce; each call yields 2 values).
_CTR_PIXEL = 0
_CTR_LIGHT_UV = 1
_CTR_LIGHT_W = 2
_CTR_BSDF_UV = 3
_CTR_BSDF_W = 4

_CTR_STRIDE = 16


class SceneSoA(NamedTuple):
    geom: trs.GeomSoA
    # Per-triangle flattened vertex attributes: one gather level instead of
    # tri_index -> vtx chains (XLA demotes chained small-table gathers in
    # while loops to ~100ms host-read fusions on TPU). Kept as SEPARATE
    # per-column arrays on purpose: a fused (T, 22) row gather measured
    # 2x SLOWER end-to-end (cbox 306->129 Mrays/s) because every column
    # slice of the gathered (N, 22) buffer re-reads it — same trap as
    # the (N, 128) probe result in the README's gather notes.
    tri_n0: V3
    tri_n1: V3
    tri_n2: V3
    tri_uv0_u: jnp.ndarray
    tri_uv0_v: jnp.ndarray
    tri_uv1_u: jnp.ndarray
    tri_uv1_v: jnp.ndarray
    tri_uv2_u: jnp.ndarray
    tri_uv2_v: jnp.ndarray
    tri_shape_id: jnp.ndarray
    tri_has_normals: jnp.ndarray
    tri_has_uvs: jnp.ndarray
    # Per-triangle material/light ids (shape tables pre-flattened to
    # prims: single take instead of tri->shape->mat chained gathers)
    # and ray-differential footprint constants.
    tri_material_id: jnp.ndarray
    tri_light_id: jnp.ndarray
    tri_inv_uv: jnp.ndarray
    tri_mean_curv: jnp.ndarray
    sph_shape_id: jnp.ndarray
    shape_kind: jnp.ndarray
    shape_material_id: jnp.ndarray
    shape_light_id: jnp.ndarray
    shape_area: jnp.ndarray
    shape_prim_offset: jnp.ndarray
    shape_interior_medium: jnp.ndarray
    shape_exterior_medium: jnp.ndarray
    # materials: constant reflectance per material (checker via 2 colors)
    mat_tables: msoa.MaterialTablesSoA
    # lights
    light_kind: jnp.ndarray
    light_shape_id: jnp.ndarray
    light_intensity: V3
    light_tri_cdf: jnp.ndarray
    light_tri_first: jnp.ndarray
    light_pmf: jnp.ndarray
    light_cdf: jnp.ndarray
    # envmap (dummy tables when the scene has none)
    env_value: V3  # constant envmap radiance (unscaled)
    env_to_world: jnp.ndarray
    env_to_local: jnp.ndarray
    env_scale: jnp.ndarray
    env_img_id: jnp.ndarray
    env_cdf_rows: jnp.ndarray
    env_pdf_rows: jnp.ndarray
    env_cdf_marginals: jnp.ndarray
    env_pdf_marginals: jnp.ndarray
    env_alias_cut: jnp.ndarray
    env_alias_idx: jnp.ndarray
    # Dense (h*w, 3) level-0 copy of the env image ((1, 3) dummy when
    # the envmap is constant/absent): slice-gather radiance path, see
    # textures_soa.EnvmapSoA.img3.
    env_img3: jnp.ndarray


def supports_soa(scene: Scene) -> bool:
    """The SoA fast path covers the full material stack
    (constant/checkerboard/image spectrum slots, constant float slots)
    and all light types including image envmaps."""
    static = scene.static
    if static.options.integrator != "path":
        return False
    return msoa.supports_soa_materials(scene)


# scene_soa_from_aos memo: the host-side prep (packet-table collapse,
# alias tables, per-tri footprint constants) is pure in the scene and
# costs seconds-to-a-minute on big scenes (108k-row disney_array), so
# repeated renders of one scene (bench warm+timed, validation sweeps,
# spp chunking drivers) must not rebuild it. Keyed by the device
# pytree's identity; the strong reference in the cache keeps the id
# valid for the entry's lifetime. Tiny FIFO — a process touches a
# handful of scenes.
_SOA_MEMO = {}
_SOA_MEMO_CAP = 4


def scene_soa_from_aos(scene: Scene) -> SceneSoA:
    env = __import__("os").environ
    # Backend-selection knobs are read at build time; a test that
    # monkeypatches them must not hit a stale entry. The key covers
    # EVERY build-time knob packet-table construction reads (ADVICE
    # r04: premerge/entry_k were missing, so in-process A/Bs flipping
    # them got a stale cached table).
    key = (id(scene.device), env.get("GDPT_PACKET", "auto"),
           env.get("GDPT_MAX_TABLE_MB", ""),
           env.get("GDPT_EXPAND_PREMERGE", ""),
           env.get("GDPT_ENTRY_K", ""),
           env.get("GDPT_PACKET_WIDE", ""))
    hit = _SOA_MEMO.get(key)
    if hit is not None and hit[0] is scene.device:
        return hit[1]
    out = _scene_soa_from_aos_uncached(scene)
    if len(_SOA_MEMO) >= _SOA_MEMO_CAP:
        _SOA_MEMO.pop(next(iter(_SOA_MEMO)))
    _SOA_MEMO[key] = (scene.device, out)
    return out


def _scene_soa_from_aos_uncached(scene: Scene) -> SceneSoA:
    dev = scene.device
    mt = dev.materials
    env_rgb = dev.envmap.tex.value[0]
    # Flat alias table over envmap texels (build once on host): texel
    # probability = marginal[y] * conditional[y, x].
    from gdpt_tpu.core import distributions as gdist

    env_w = np.asarray(dev.envmap.dist.pdf_marginals, np.float64)[:, None] \
        * np.asarray(dev.envmap.dist.pdf_rows, np.float64)
    env_alias_cut, env_alias_idx = gdist.build_alias_table(env_w)
    # Dense (h*w, 3) level-0 copy of the env image for the slice-gather
    # radiance path (textures_soa.EnvmapSoA.img3).
    if scene.static.envmap_is_image:
        eid = int(np.asarray(dev.envmap.tex.img_id[0]))
        p3 = dev.pool3
        eoff = int(np.asarray(p3.level_offset[eid, 0]))
        ew = int(np.asarray(p3.level_w[eid, 0]))
        eh = int(np.asarray(p3.level_h[eid, 0]))
        env_img3 = jnp.asarray(
            np.asarray(p3.data[eoff:eoff + eh * ew], np.float32))
    else:
        env_img3 = jnp.zeros((1, 3), np.float32)
    idx = np.asarray(dev.tri_index)
    vn = np.asarray(dev.vtx_normal)
    vuv = np.asarray(dev.vtx_uv)
    if idx.shape[0]:
        n0, n1, n2 = vn[idx[:, 0]], vn[idx[:, 1]], vn[idx[:, 2]]
        uv0, uv1, uv2 = vuv[idx[:, 0]], vuv[idx[:, 1]], vuv[idx[:, 2]]
    else:
        n0 = n1 = n2 = np.zeros((0, 3), np.float32)
        uv0 = uv1 = uv2 = np.zeros((0, 2), np.float32)
    t_shape = np.asarray(dev.geom.tri_shape_id)
    shape_mat = np.asarray(dev.shape_material_id)
    shape_lgt = np.asarray(dev.shape_light_id)
    if idx.shape[0]:
        # Per-triangle footprint constants (cols 20-21): inv_uv_size =
        # max(|dpdu|, |dpdv|) and mean curvature from dn/du, dn/dv
        # evaluated with the centroid shading normal — constants of the
        # triangle, so they ride in the fused attribute row instead of
        # being recomputed per hit (reference: src/intersection.cpp:33-56).
        p0 = np.asarray(dev.geom.tri_v0, np.float32)
        e1c = np.asarray(dev.geom.tri_e1, np.float32)
        e2c = np.asarray(dev.geom.tri_e2, np.float32)
        dpds, dpdt = e2c, e2c - e1c          # p2-p0, p2-p1
        # Fallback bary uvs ((0,0),(1,0),(1,1)) when the mesh has no
        # uvs, exactly as ops/intersect.py:_mesh_shading.
        huv = (np.asarray(dev.tri_has_uvs) > 0)[:, None]
        uv0d = np.where(huv, uv0, np.float32([0.0, 0.0]))
        uv1d = np.where(huv, uv1, np.float32([1.0, 0.0]))
        uv2d = np.where(huv, uv2, np.float32([1.0, 1.0]))
        duvds = uv2d - uv0d
        duvdt = uv2d - uv1d
        det = duvds[:, 0] * duvdt[:, 1] - duvdt[:, 0] * duvds[:, 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_det = np.where(det != 0, 1.0 / np.where(det != 0, det, 1), 0)
        dsdu = duvdt[:, 1] * inv_det
        dtdu = -duvds[:, 1] * inv_det
        dsdv = -duvdt[:, 0] * inv_det
        dtdv = duvds[:, 0] * inv_det
        dpdu = dpds * dsdu[:, None] + dpdt * dtdu[:, None]
        dpdv = dpds * dsdv[:, None] + dpdt * dtdv[:, None]
        degen = np.abs(det) <= 1e-8
        inv_uv = np.where(
            degen, 1.0,
            np.maximum(np.linalg.norm(dpdu, axis=1),
                       np.linalg.norm(dpdv, axis=1))).astype(np.float32)
        gn_h = np.cross(e1c, e2c)
        sn_h = n0 + n1 + n2
        nrm = np.linalg.norm(sn_h, axis=1, keepdims=True)
        sn_h = np.where(nrm > 1e-20, sn_h / np.maximum(nrm, 1e-20),
                        gn_h / np.maximum(
                            np.linalg.norm(gn_h, axis=1, keepdims=True),
                            1e-20))
        tan = dpdu - sn_h * (sn_h * dpdu).sum(1, keepdims=True)
        tn = np.linalg.norm(tan, axis=1, keepdims=True)
        tan = tan / np.maximum(tn, 1e-20)
        bit = np.cross(sn_h, tan)
        bit /= np.maximum(np.linalg.norm(bit, axis=1, keepdims=True), 1e-20)
        dnds, dndt = n2 - n0, n2 - n1
        dndu = dnds * dsdu[:, None] + dndt * dtdu[:, None]
        dndv = dnds * dsdv[:, None] + dndt * dtdv[:, None]
        has_n_h = np.asarray(dev.tri_has_normals) > 0
        # DELIBERATE APPROXIMATION: mean curvature is precomputed per
        # triangle from the centroid shading normal (sn_h) and its
        # tangent frame, while the per-ray oracle (ops/intersect.py)
        # and the reference (triangle_mesh.inl:133-162) evaluate the
        # projection frame at the hit's interpolated normal. On large
        # triangles with strongly varying vertex normals the SoA
        # ray-differential spread — and hence the selected mip level —
        # can diverge from the per-ray path. mc only steers texture
        # footprints, never radiance math, so the SoA/per-ray
        # cross-validation tolerances (tests/test_soa.py radiance
        # gates) absorb it; avoiding two extra per-hit V3 gathers in
        # shade_hit is a measured throughput win (see
        # accel/packet_trace.py notes on per-lane gather cost).
        mc = np.where(
            has_n_h,
            0.5 * ((dndu * tan).sum(1) + (dndv * bit).sum(1)),
            0.0).astype(np.float32)
    else:
        inv_uv = np.zeros(0, np.float32)
        mc = np.zeros(0, np.float32)
    tri_mat = (shape_mat[t_shape] if t_shape.size
               else np.zeros(0)).astype(np.int32)
    tri_lgt = (shape_lgt[t_shape] if t_shape.size
               else np.zeros(0)).astype(np.int32)
    return SceneSoA(
        geom=trs.geom_soa_from_aos(dev.geom),
        tri_n0=soa.from_rows(jnp.asarray(n0)),
        tri_n1=soa.from_rows(jnp.asarray(n1)),
        tri_n2=soa.from_rows(jnp.asarray(n2)),
        tri_uv0_u=jnp.asarray(uv0[:, 0]), tri_uv0_v=jnp.asarray(uv0[:, 1]),
        tri_uv1_u=jnp.asarray(uv1[:, 0]), tri_uv1_v=jnp.asarray(uv1[:, 1]),
        tri_uv2_u=jnp.asarray(uv2[:, 0]), tri_uv2_v=jnp.asarray(uv2[:, 1]),
        tri_shape_id=dev.geom.tri_shape_id,
        tri_has_normals=dev.tri_has_normals,
        tri_has_uvs=dev.tri_has_uvs,
        tri_material_id=jnp.asarray(tri_mat),
        tri_light_id=jnp.asarray(tri_lgt),
        tri_inv_uv=jnp.asarray(inv_uv),
        tri_mean_curv=jnp.asarray(mc),
        sph_shape_id=dev.geom.sph_shape_id,
        shape_kind=dev.shape_kind,
        shape_material_id=dev.shape_material_id,
        shape_light_id=dev.shape_light_id,
        shape_area=dev.shape_area,
        shape_prim_offset=dev.shape_prim_offset,
        shape_interior_medium=dev.shape_interior_medium,
        shape_exterior_medium=dev.shape_exterior_medium,
        mat_tables=msoa.build_material_tables(dev),
        light_kind=dev.lights.kind,
        light_shape_id=dev.lights.shape_id,
        light_intensity=soa.from_rows(dev.lights.intensity),
        light_tri_cdf=dev.lights.tri_cdf,
        light_tri_first=dev.lights.tri_first,
        light_pmf=dev.lights.pmf,
        light_cdf=dev.lights.cdf,
        env_value=soa.V3(env_rgb[0], env_rgb[1], env_rgb[2]),
        env_to_world=dev.envmap.to_world,
        env_to_local=dev.envmap.to_local,
        env_scale=dev.envmap.scale,
        env_img_id=dev.envmap.tex.img_id[0],
        env_cdf_rows=dev.envmap.dist.cdf_rows,
        env_pdf_rows=dev.envmap.dist.pdf_rows,
        env_cdf_marginals=dev.envmap.dist.cdf_marginals,
        env_pdf_marginals=dev.envmap.dist.pdf_marginals,
        env_alias_cut=env_alias_cut,
        env_alias_idx=env_alias_idx,
        env_img3=env_img3,
    )


def _env_view(static, sc: SceneSoA) -> tsoa.EnvmapSoA:
    """EnvmapSoA with static tex_kind / width / height (safe to build
    inside a traced function: shapes and SceneStatic fields are static)."""
    h = sc.env_pdf_marginals.shape[0]
    w = sc.env_pdf_rows.shape[1]
    return tsoa.EnvmapSoA(
        sc.env_to_world, sc.env_to_local, sc.env_scale,
        tex.TEX_IMAGE if static.envmap_is_image else tex.TEX_CONST,
        sc.env_value, sc.env_img_id,
        sc.env_cdf_rows, sc.env_pdf_rows,
        sc.env_cdf_marginals, sc.env_pdf_marginals,
        sc.env_alias_cut, sc.env_alias_idx, w, h,
        img3=sc.env_img3 if static.envmap_is_image else None,
    )


class VertexSoA(NamedTuple):
    position: V3
    gn: V3           # geometric normal, flipped toward shading normal
    frame: soa.Frame
    uv_u: jnp.ndarray
    uv_v: jnp.ndarray
    shape_id: jnp.ndarray
    material_id: jnp.ndarray
    light_id: jnp.ndarray
    valid: jnp.ndarray  # f32 mask (0/1): pred buffers have a slow packed
    #                     layout on TPU, so masks cross op boundaries as f32
    # Ray-differential footprint at the vertex (zeros when the caller
    # doesn't track differentials): transferred ray radius, uv-space
    # screen footprint (uv_screen_size), and surface mean curvature.
    radius: jnp.ndarray = None
    fp: jnp.ndarray = None
    mean_curv: jnp.ndarray = None


def shade_hit(static, sc: SceneSoA, org: V3, d: V3, hit: trs.HitSoA,
              gn_raw: V3 = None, ray_radius=None, ray_spread=None) -> VertexSoA:
    """Batched hit -> vertex (reference: src/intersection.cpp:7-64).
    gn_raw: optional unnormalized geometric normal from the intersect
    kernel (skips the triangle regather). ray_radius/ray_spread: per-lane
    ray differentials; when given, the vertex carries the transferred
    radius and uv-space footprint for mip-filtered texture lookups."""
    position = org + d * hit.t
    prim = jnp.maximum(hit.prim_id, 0)
    n = prim.shape[0]
    gn = soa.V3(jnp.zeros(n, REAL), jnp.zeros(n, REAL), jnp.ones(n, REAL))
    sn = gn
    shape_id = jnp.zeros(n, INT)
    inv_uv = jnp.ones(n, REAL)
    mean_curv = jnp.zeros(n, REAL)
    # Barycentric fallback uv mapping ((0,0),(1,0),(1,1)) as in
    # reference: src/shapes/triangle_mesh.inl:84-90.
    uv_u = hit.u + hit.v
    uv_v = hit.v
    tri_mat_id = None
    tri_light_id = None
    if static.n_tris:
        tid = jnp.clip(prim, 0, static.n_tris - 1)
        if gn_raw is not None:
            gn_tri = soa.normalize(gn_raw)
        else:
            e1 = soa.gather(sc.geom.tri_e1, tid)
            e2 = soa.gather(sc.geom.tri_e2, tid)
            gn_tri = soa.normalize(soa.cross(e1, e2))
        if static.any_mesh_normals:
            has_n = soa.take(sc.tri_has_normals, tid)
            b1 = hit.u
            b2 = hit.v
            b0 = 1.0 - b1 - b2
            n_interp = soa.normalize(
                soa.gather(sc.tri_n0, tid) * b0
                + soa.gather(sc.tri_n1, tid) * b1
                + soa.gather(sc.tri_n2, tid) * b2
            )
            sn_tri = soa.where(has_n, n_interp, gn_tri)
        else:
            sn_tri = gn_tri
        gn = gn_tri
        sn = sn_tri
        shape_id = soa.take(sc.tri_shape_id, tid)
        tri_mat_id = soa.take(sc.tri_material_id, tid)
        tri_light_id = soa.take(sc.tri_light_id, tid)
        inv_uv = soa.take(sc.tri_inv_uv, tid)
        mean_curv = soa.take(sc.tri_mean_curv, tid)
        if static.any_mesh_uvs:
            has_uv = soa.take(sc.tri_has_uvs, tid)
            b0u = 1.0 - hit.u - hit.v
            iu = (
                soa.take(sc.tri_uv0_u, tid) * b0u
                + soa.take(sc.tri_uv1_u, tid) * hit.u
                + soa.take(sc.tri_uv2_u, tid) * hit.v
            )
            iv = (
                soa.take(sc.tri_uv0_v, tid) * b0u
                + soa.take(sc.tri_uv1_v, tid) * hit.u
                + soa.take(sc.tri_uv2_v, tid) * hit.v
            )
            uv_u = jnp.where(has_uv, iu, uv_u)
            uv_v = jnp.where(has_uv, iv, uv_v)
    if static.n_spheres:
        sid = jnp.clip(prim - static.n_tris, 0, static.n_spheres - 1)
        if gn_raw is not None:
            gn_s = soa.normalize(gn_raw)
        else:
            center = soa.gather(sc.geom.sph_center, sid)
            gn_s = soa.normalize(position - center)
        is_sph = prim >= static.n_tris if static.n_tris else jnp.ones(n, bool)
        gn = soa.where(is_sph, gn_s, gn)
        sn = soa.where(is_sph, gn_s, sn)
        shape_id = jnp.where(is_sph, soa.take(sc.sph_shape_id, sid), shape_id)
        # Spherical-coordinate uv (reference: src/shapes/sphere.inl:94-101).
        elev = jnp.arccos(jnp.clip(gn_s.y, -1.0, 1.0))
        azim = jnp.arctan2(gn_s.z, gn_s.x)
        su = azim / (2.0 * jnp.pi)
        su = jnp.where(su < 0, su + 1.0, su)
        uv_u = jnp.where(is_sph, su, uv_u)
        uv_v = jnp.where(is_sph, elev / jnp.pi, uv_v)
        # Footprint constants (reference: src/shapes/sphere.inl:265-268):
        # |dpdu| = r sin(elev), |dpdv| = r, mean curvature 1/r.
        r_s = soa.take(sc.geom.sph_radius, sid)
        ius_s = 0.5 * (r_s * jnp.sin(elev) + r_s)
        inv_uv = jnp.where(is_sph, ius_s, inv_uv)
        mean_curv = jnp.where(is_sph, 1.0 / jnp.maximum(r_s, 1e-20),
                              mean_curv)
    frame = soa.coordinate_system(sn)
    flip = soa.dot(gn, sn) < 0
    gn = soa.where(flip, -gn, gn)
    if tri_mat_id is not None and not static.n_spheres:
        material_id, light_id = tri_mat_id, tri_light_id
    else:
        material_id = soa.take(sc.shape_material_id, shape_id)
        light_id = soa.take(sc.shape_light_id, shape_id)
    if ray_radius is None:
        radius_t = jnp.zeros(n, REAL)
        fp = jnp.zeros(n, REAL)
    else:
        radius_t = ray_radius + ray_spread * hit.t
        fp = radius_t / jnp.maximum(inv_uv, 1e-20)
    return VertexSoA(
        position=position,
        gn=gn,
        frame=frame,
        uv_u=uv_u,
        uv_v=uv_v,
        shape_id=shape_id,
        material_id=material_id,
        light_id=light_id,
        valid=(hit.prim_id >= 0).astype(REAL),
        radius=radius_t,
        fp=fp,
        mean_curv=mean_curv,
    )




def emission(sc: SceneSoA, v: VertexSoA, view_dir: V3) -> V3:
    """Area-light emission toward view_dir (zero for non-lights)."""
    lid = jnp.maximum(v.light_id, 0)
    intensity = soa.gather(sc.light_intensity, lid)
    facing = soa.dot(v.gn, view_dir) > 0
    ok = (v.light_id >= 0) & facing
    zero = jnp.zeros_like(intensity.x)
    return soa.where(ok, intensity, V3(zero, zero, zero))


def _searchsorted_cdf(cdf_row, u):
    """Per-lane searchsorted over gathered cdf rows (N, K)."""
    return jnp.sum(cdf_row <= u[:, None], axis=1) - 1


def sample_light_point(static, sc: SceneSoA, ref: V3, u0, u1, uw, us):
    """Power-weighted light pick + point sample; returns
    (light_id, pos, normal, pdf_area, is_env)."""
    n = u0.shape[0]
    light_id = jnp.clip(
        jnp.searchsorted(sc.light_cdf, uw, side="right") - 1, 0, sc.light_pmf.shape[0] - 1
    ).astype(INT)
    shape_id = jnp.maximum(soa.take(sc.light_shape_id, light_id), 0)
    pos = soa.V3(jnp.zeros(n, REAL), jnp.zeros(n, REAL), jnp.zeros(n, REAL))
    nrm = soa.V3(jnp.zeros(n, REAL), jnp.zeros(n, REAL), jnp.ones(n, REAL))
    pdf = jnp.zeros(n, REAL)
    if static.any_mesh_light:
        cdf_rows = soa.take(sc.light_tri_cdf, light_id)
        local_tri = jnp.clip(
            _searchsorted_cdf(cdf_rows, us), 0, sc.light_tri_cdf.shape[1] - 2
        )
        tri = jnp.clip(
            soa.take(sc.light_tri_first, light_id) + local_tri.astype(INT),
            0, max(static.n_tris - 1, 0),
        )
        v0 = soa.gather(sc.geom.tri_v0, tri)
        e1 = soa.gather(sc.geom.tri_e1, tri)
        e2 = soa.gather(sc.geom.tri_e2, tri)
        a = jnp.sqrt(jnp.clip(u0, 0.0, 1.0))
        b1 = 1.0 - a
        b2 = a * u1
        gn = soa.normalize(soa.cross(e1, e2))
        has_n = soa.take(sc.tri_has_normals, tri)
        sn = soa.normalize(
            soa.gather(sc.tri_n0, tri) * (1 - b1 - b2)
            + soa.gather(sc.tri_n1, tri) * b1
            + soa.gather(sc.tri_n2, tri) * b2
        )
        gn = soa.where(has_n & (soa.dot(gn, sn) < 0), -gn, gn)
        p_mesh = v0 + e1 * b1 + e2 * b2
        is_mesh = soa.take(sc.shape_kind, shape_id) == SHAPE_MESH
        pos = soa.where(is_mesh, p_mesh, pos)
        nrm = soa.where(is_mesh, gn, nrm)
        pdf = jnp.where(is_mesh, 1.0 / jnp.maximum(soa.take(sc.shape_area, shape_id), 1e-20), pdf)
    if static.any_sphere_light:
        sph = soa.take(sc.shape_prim_offset, shape_id)
        center = soa.gather(sc.geom.sph_center, sph)
        r = soa.take(sc.geom.sph_radius, sph)
        to_c = center - ref
        d2 = soa.length_squared(to_c)
        inside = d2 < r * r
        # Inside: uniform sphere.
        z = 1.0 - 2.0 * u0
        rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = 2.0 * jnp.pi * u1
        n_in = V3(rr * jnp.cos(phi), rr * jnp.sin(phi), z)
        # Outside: cone sampling (reference: src/shapes/sphere.inl:164-238).
        dirc = soa.normalize(to_c)
        fr = soa.coordinate_system(dirc)
        sin2max = r * r / jnp.maximum(d2, 1e-20)
        cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2max))
        cos_e = (1.0 - u0) + u0 * cos_max
        sin_e = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_e * cos_e))
        azim = u1 * 2.0 * jnp.pi
        dc = jnp.sqrt(jnp.maximum(d2, 1e-20))
        ds = dc * cos_e - jnp.sqrt(jnp.maximum(0.0, r * r - dc * dc * sin_e * sin_e))
        cos_a = (dc * dc + r * r - ds * ds) / jnp.maximum(2.0 * dc * r, 1e-20)
        sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
        n_out = -1.0 * soa.to_world(
            fr, V3(sin_a * jnp.cos(azim), sin_a * jnp.sin(azim), cos_a)
        )
        n_s = soa.where(inside, n_in, n_out)
        p_s = center + n_s * r
        pdf_uniform = 1.0 / jnp.maximum(soa.take(sc.shape_area, shape_id), 1e-20)
        pdf_cone_sa = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-20)
        dl = soa.normalize(p_s - ref)
        pdf_cone = pdf_cone_sa * jnp.abs(soa.dot(n_s, dl)) / jnp.maximum(
            soa.length_squared(p_s - ref), 1e-20
        )
        pdf_s = jnp.where(inside, pdf_uniform, pdf_cone)
        is_sph = soa.take(sc.shape_kind, shape_id) == SHAPE_SPHERE
        pos = soa.where(is_sph, p_s, pos)
        nrm = soa.where(is_sph, n_s, nrm)
        pdf = jnp.where(is_sph, pdf_s, pdf)
    is_env = jnp.zeros(n, bool)
    if static.has_envmap:
        # CDF-table importance sampling (uniform for constant envmaps,
        # luminance-weighted for image envmaps; reference: envmap.inl:22-42).
        wdir, pdf_env = tsoa.envmap_sample_dir(_env_view(static, sc), u0, u1)
        env = soa.take(sc.light_kind, light_id) == LIGHT_ENVMAP
        pos = soa.where(env, V3(*(jnp.zeros(n, REAL),) * 3), pos)
        nrm = soa.where(env, -1.0 * wdir, nrm)
        pdf = jnp.where(env, pdf_env, pdf)
        is_env = env
    return light_id, pos, nrm, pdf, is_env


def envmap_pdf_for_dir(static, sc: SceneSoA, d: V3):
    """pdf of the envmap NEE sampler for direction d."""
    return tsoa.envmap_pdf_dir(_env_view(static, sc), d)


def primary_rays_soa(static, camera, xs, ys, u0, u1):
    """Batched camera rays with filter importance sampling
    (reference: src/camera.cpp:23-47)."""
    from gdpt_tpu.scene import filters as gfilters

    w, h = static.width, static.height
    n = xs.shape[0]
    pix = jnp.stack([xs + u0, ys + u1], axis=-1) / jnp.asarray([w, h], REAL)
    pixel = pix * jnp.asarray([w, h], REAL)
    frac = pixel - jnp.floor(pixel)
    offset = gfilters.sample_filter(static.filter_kind, static.filter_param, frac)
    remapped = (jnp.floor(pixel) + 0.5 + offset) / jnp.asarray([w, h], REAL)
    m = camera.sample_to_cam
    px, py = remapped[:, 0], remapped[:, 1]
    ptx = m[0, 0] * px + m[0, 1] * py + m[0, 3]
    pty = m[1, 0] * px + m[1, 1] * py + m[1, 3]
    ptz = m[2, 0] * px + m[2, 1] * py + m[2, 3]
    ptw = m[3, 0] * px + m[3, 1] * py + m[3, 3]
    pt = V3(ptx / ptw, pty / ptw, ptz / ptw)
    c2w = camera.cam_to_world
    d_cam = soa.normalize(pt)
    d = soa.normalize(
        V3(
            c2w[0, 0] * d_cam.x + c2w[0, 1] * d_cam.y + c2w[0, 2] * d_cam.z,
            c2w[1, 0] * d_cam.x + c2w[1, 1] * d_cam.y + c2w[1, 2] * d_cam.z,
            c2w[2, 0] * d_cam.x + c2w[2, 1] * d_cam.y + c2w[2, 2] * d_cam.z,
        )
    )
    org = V3(
        jnp.broadcast_to(c2w[0, 3], (n,)),
        jnp.broadcast_to(c2w[1, 3], (n,)),
        jnp.broadcast_to(c2w[2, 3], (n,)),
    )
    return org, d


def nee_soa(static, sc: SceneSoA, v: VertexSoA, params, dir_view: V3,
            used, lu0, lu1, lw, lsw, active):
    """Batched NEE with power-2 MIS at vertex v; returns the already
    masked contribution w1 * C1 / p1 (reference: src/path_tracing.h:115-227)."""
    n = lu0.shape[0]
    zero = jnp.zeros(n, REAL)
    zero3 = V3(zero, zero, zero)
    eps_shadow = static.shadow_epsilon
    light_id, p_l, n_l, pdf_pt, is_env = sample_light_point(
        static, sc, v.position, lu0, lu1, lw, lsw
    )
    to_l = p_l - v.position
    dist = soa.length(to_l)
    dir_area = to_l * (1.0 / jnp.maximum(dist, 1e-20))
    dl = soa.where(is_env, -1.0 * n_l, dir_area)
    g_area = jnp.maximum(-soa.dot(dl, n_l), 0.0) / jnp.maximum(dist * dist, 1e-20)
    g_geo = jnp.where(is_env, 1.0, g_area)
    p1 = soa.take(sc.light_pmf, light_id) * pdf_pt
    f_nee = msoa.eval_bsdf_soa(params, dir_view, dl, v.gn, v.frame, used)
    p2_raw = msoa.pdf_bsdf_soa(params, dir_view, dl, v.gn, v.frame, used)
    # Footprint 0 for NEE env taps, matching the per-ray path
    # (path.py:67 passes view_footprint = 0.0 -> level-0 lookup).
    env_nee = (
        tsoa.envmap_emission_soa(_env_view(static, sc),
                                 sc.mat_tables.pool3, dl)
        if static.has_envmap else zero3
    )
    l_emit = soa.where(
        is_env,
        env_nee,
        soa.where(
            soa.dot(n_l, -1.0 * dl) > 0,
            soa.gather(sc.light_intensity, light_id),
            zero3,
        ),
    )
    # Shadow rays only where the contribution can be nonzero: a zero
    # BSDF factor (e.g. an envmap sample below the hemisphere — ~half
    # of env NEE taps on a closed surface), zero emission, backfacing
    # light geometry, or zero light pdf already make the NEE term zero
    # regardless of occlusion, so those lanes become dead rays (they
    # morton-sort into all-dead packets that exit after one visit).
    # Estimator-identical: every skipped lane's contribution is
    # selected to exactly zero below.
    need = (active & (g_geo > 0) & (p1 > 0)
            & (soa.vmax(f_nee) > 0) & (soa.vmax(l_emit) > 0))
    tfar = jnp.where(is_env, BIG, (1.0 - eps_shadow) * dist)
    # Inactive/zero lanes become dead rays (tfar < tnear): the traversal
    # backends exit them immediately instead of tracing stale rays.
    tfar = jnp.where(need, tfar, -1.0)
    unoccluded = 1.0 - trs.occluded_soa(
        static, sc.geom, v.position, dl, eps_shadow, tfar
    ).astype(REAL)
    g = g_geo * unoccluded
    p2 = p2_raw * g
    ok = (g > 0) & (p1 > 0) & need
    w1 = jnp.where(ok, p1 * p1 / jnp.maximum(p1 * p1 + p2 * p2, 1e-30), 0.0)
    scale = g * w1 / jnp.maximum(p1, 1e-30)
    # Select, don't multiply-by-zero: f_nee can be NaN on masked
    # lanes (degenerate dirs) and NaN * 0 poisons the sum.
    contrib = f_nee * l_emit * scale
    # Second output: per-lane traced-shadow-ray mask (f32), so callers
    # keep ray counts exact under the zero-contribution skip.
    return soa.where(ok, contrib, zero3), need.astype(REAL)


def hit_light_pdf_soa(static, sc: SceneSoA, ref_pos: V3, nxt: VertexSoA,
                      d_out: V3, dist2):
    """p1 = pmf * pdf_point_on_light for a BSDF-sampled hit of an area
    light (area measure; reference: src/path_tracing.h:291-325)."""
    lid = jnp.maximum(nxt.light_id, 0)
    lshape = jnp.maximum(soa.take(sc.light_shape_id, lid), 0)
    pdf_mesh = 1.0 / jnp.maximum(soa.take(sc.shape_area, lshape), 1e-20)
    if static.any_sphere_light:
        sph = soa.take(sc.shape_prim_offset, lshape)
        center = soa.gather(sc.geom.sph_center, sph)
        r = soa.take(sc.geom.sph_radius, sph)
        d2c = soa.length_squared(ref_pos - center)
        inside = d2c < r * r
        sin2max = r * r / jnp.maximum(d2c, 1e-20)
        cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2max))
        pdf_cone_sa = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-20)
        pdf_sph = jnp.where(
            inside,
            pdf_mesh,
            pdf_cone_sa * jnp.abs(soa.dot(nxt.gn, d_out)) / jnp.maximum(dist2, 1e-20),
        )
        pdf_pt2 = jnp.where(
            soa.take(sc.shape_kind, lshape) == SHAPE_SPHERE, pdf_sph, pdf_mesh
        )
    else:
        pdf_pt2 = pdf_mesh
    return soa.take(sc.light_pmf, lid) * pdf_pt2


def trace_paths_soa(static, camera, sc: SceneSoA, xs, ys, ray_idx, seed, sample0):
    """One sample for every ray in the batch; returns (radiance V3, rays).
    `static` is the hashable SceneStatic; `camera` the CameraArrays."""
    used = static.used_material_kinds
    w, h = static.width, static.height
    n = xs.shape[0]
    n_iters = HARD_BOUNCE_CAP if static.options.max_depth < 0 else max(
        static.options.max_depth - 1, 0
    )

    def uni2(bounce, ctr):
        counter = jnp.asarray(bounce * _CTR_STRIDE + ctr, jnp.uint32)
        return soa.uniform2(seed, ray_idx, counter, sample0)

    # Primary ray with filter importance sampling
    # (reference: src/camera.cpp:23-47).
    u0, u1 = uni2(0, _CTR_PIXEL)
    org, d = primary_rays_soa(static, camera, xs, ys, u0, u1)

    # Ray differentials (reference: src/ray.h:36-38).
    spread0 = jnp.full(n, 0.25 / max(w, h), REAL)
    hit, gn_raw = trs.intersect_soa_gn(static, sc.geom, org, d, 0.0, BIG)
    vertex = shade_hit(static, sc, org, d, hit, gn_raw,
                       ray_radius=jnp.zeros(n, REAL), ray_spread=spread0)
    rays = jnp.ones(n, REAL)

    zero = jnp.zeros(n, REAL)
    v_ok = vertex.valid > 0
    radiance = soa.where(v_ok, emission(sc, vertex, -d), V3(zero, zero, zero))
    if static.has_envmap:
        env_primary = tsoa.envmap_emission_soa(
            _env_view(static, sc), sc.mat_tables.pool3, d, spread=spread0
        )
        radiance = soa.where(v_ok, radiance, env_primary)

    if n_iters == 0:
        return radiance, rays

    state = dict(
        radiance=radiance,
        throughput=V3(jnp.ones(n, REAL), jnp.ones(n, REAL), jnp.ones(n, REAL)),
        eta_scale=jnp.ones(n, REAL),
        d=d,
        vertex=vertex,
        spread=spread0,
        active=vertex.valid,  # f32 mask
        bounce=jnp.asarray(0, INT),
        rays=rays,
    )

    eps_shadow = static.shadow_epsilon
    eps_isect = static.intersection_epsilon

    def cond(s):
        return (jnp.max(s["active"]) > 0) & (s["bounce"] < n_iters)

    def body(s):
        v = s["vertex"]
        d = s["d"]
        b = s["bounce"] + 1
        active = s["active"] > 0
        dir_view = -d
        params = msoa.gather_params_soa(
            sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
            static.spec_image_slots,
            float_tex_slots=static.float_tex_slots,
            fp=v.fp,
        )
        rays = s["rays"]

        # ---- NEE (reference: src/path_tracing.h:115-227) ----
        radiance = s["radiance"]
        if static.n_lights > 0:
            lu0, lu1 = uni2(b, _CTR_LIGHT_UV)
            lw, lsw = uni2(b, _CTR_LIGHT_W)
            nee, shadow_mask = nee_soa(static, sc, v, params, dir_view,
                                       used, lu0, lu1, lw, lsw, active)
            radiance = radiance + s["throughput"] * nee
            rays = rays + shadow_mask

        # ---- BSDF sampling (reference: src/path_tracing.h:232-345) ----
        bu0, bu1 = uni2(b, _CTR_BSDF_UV)
        w_lobe, u_rr = uni2(b, _CTR_BSDF_W)
        samp = msoa.sample_bsdf_soa(params, dir_view, v.gn, v.frame, bu0, bu1,
                                    w_lobe, used)
        d_out = samp.dir_out
        f_b = msoa.eval_bsdf_soa(params, dir_view, d_out, v.gn, v.frame, used)
        pdf_b = msoa.pdf_bsdf_soa(params, dir_view, d_out, v.gn, v.frame, used)
        active = active & (samp.valid > 0) & (pdf_b > 0)
        rays = rays + jnp.where(active, 1.0, 0.0)
        eta_scale = jnp.where(
            samp.eta != 0,
            s["eta_scale"] / jnp.where(samp.eta != 0, samp.eta, 1.0) ** 2,
            s["eta_scale"],
        )
        # Ray-differential spread update (scene/camera.py
        # ray_diff_reflect/refract; reference: src/ray.h:41-57).
        is_tr = samp.eta != 0
        spec_spread = s["spread"] + 2.0 * v.mean_curv * v.radius
        spec_spread = jnp.where(
            is_tr, spec_spread / jnp.where(is_tr, samp.eta, 1.0), spec_spread)
        spread = jnp.maximum(
            spec_spread * (1.0 - samp.roughness) + 0.2 * samp.roughness, 0.0)

        nxt_hit, nxt_gn = trs.intersect_soa_gn(
            static, sc.geom, v.position, d_out, eps_isect,
            jnp.where(active, BIG, -1.0)
        )
        nxt = shade_hit(static, sc, v.position, d_out, nxt_hit, nxt_gn,
                        ray_radius=v.radius, ray_spread=spread)
        nxt_ok = nxt.valid > 0
        dist2 = soa.length_squared(nxt.position - v.position)
        g2 = jnp.where(
            nxt_ok,
            jnp.abs(soa.dot(d_out, nxt.gn)) / jnp.maximum(dist2, 1e-20),
            1.0,
        )
        p2a = pdf_b * g2

        # Emissive hit with MIS (reference: src/path_tracing.h:291-325).
        if static.n_lights > 0:
            hit_light = nxt_ok & (nxt.light_id >= 0) & active
            l_emit = emission(sc, nxt, -1.0 * d_out)
            p1h = hit_light_pdf_soa(static, sc, v.position, nxt, d_out, dist2)
            w2 = p2a * p2a / jnp.maximum(p1h * p1h + p2a * p2a, 1e-30)
            scale = g2 * w2 / jnp.maximum(p2a, 1e-30)
            contrib = s["throughput"] * f_b * l_emit * scale
            radiance = radiance + soa.where(hit_light, contrib, V3(zero, zero, zero))
        if static.has_envmap:
            miss = active & ~nxt_ok
            env_id = static.envmap_light_id
            env_hit, env_pdf = tsoa.envmap_emission_pdf_soa(
                _env_view(static, sc), sc.mat_tables.pool3, d_out)
            p1e = sc.light_pmf[env_id] * env_pdf
            w2e = p2a * p2a / jnp.maximum(p1e * p1e + p2a * p2a, 1e-30)
            scale = g2 * w2e / jnp.maximum(p2a, 1e-30)
            contrib = s["throughput"] * f_b * env_hit * scale
            radiance = radiance + soa.where(miss, contrib, V3(zero, zero, zero))

        active = active & nxt_ok

        # Russian roulette (reference: src/path_tracing.h:334-341).
        throughput = s["throughput"] * f_b * (g2 / jnp.maximum(p2a, 1e-30))
        num_vertices = s["bounce"] + 3
        do_rr = (num_vertices - 1) >= static.options.rr_depth
        rr_prob = jnp.where(
            do_rr,
            jnp.minimum(soa.vmax(throughput) / jnp.maximum(eta_scale, 1e-20), 0.95),
            1.0,
        )
        active = active & ((~do_rr) | (u_rr <= rr_prob))
        throughput = throughput * (1.0 / jnp.maximum(rr_prob, 1e-20))
        throughput = soa.where(active, throughput, s["throughput"])

        new_vertex = jax.tree_util.tree_map(
            lambda a, o: jnp.where(active, a, o), nxt, v
        )
        return dict(
            radiance=radiance,
            throughput=throughput,
            eta_scale=jnp.where(active, eta_scale, s["eta_scale"]),
            d=soa.where(active, d_out, d),
            vertex=new_vertex,
            spread=jnp.where(active, spread, s["spread"]),
            active=active.astype(REAL),
            bounce=s["bounce"] + 1,
            rays=rays,
        )

    if static.options.max_depth > 0:
        # Fixed trip count: XLA schedules fori bodies without the
        # early-exit cond's cross-iteration staging.
        out = jax.lax.fori_loop(0, n_iters, lambda i, s: body(s), state)
    else:
        out = jax.lax.while_loop(cond, body, state)
    return out["radiance"], out["rays"]


def _wavefront_body(static, camera, sc, st):
    """One wavefront iteration: regenerate dead lanes with the next
    (pixel, sample) work items, trace pending rays, collect emitter/env
    radiance with carried-pdf MIS, NEE, sample the next bounce, RR.

    Estimator-identical to trace_paths_soa (same RNG streams/counters per
    (pixel, sample), same MIS/RR math) but runs a fixed-size lane pool at
    ~full occupancy instead of letting the whole image drain to its
    slowest path: the per-bounce costs that are O(batch) regardless of
    live lanes (ray sorting, attribute gathers, the material stack) do
    useful work every iteration. This is the wavefront analog of the
    reference's per-thread serial loop (src/render.cpp:82-117) — sample
    regeneration replaces tile scheduling.
    """
    used = static.used_material_kinds
    n_pix = static.width * static.height
    md = static.options.max_depth
    n_iters = HARD_BOUNCE_CAP if md < 0 else max(md - 1, 0)
    P = st["alive"].shape[0]
    zero = jnp.zeros(P, REAL)
    zero3 = V3(zero, zero, zero)
    one3 = V3(jnp.ones(P, REAL), jnp.ones(P, REAL), jnp.ones(P, REAL))
    eps_isect = static.intersection_epsilon
    seed = st["seed"]

    # --- regenerate dead lanes from the work queue ---
    dead = st["alive"] <= 0
    rank = jnp.cumsum(dead.astype(jnp.uint32)) - 1
    item = st["next_item"] + jnp.where(dead, rank, 0)
    # item >= next_item also rejects uint32 wraparound of next_item +
    # rank for totals just below 2^32 (a wrapped item would alias an
    # early (pixel, sample) and drop the true tail).
    issue = dead & (item < st["total"]) & (item >= st["next_item"])
    pixel = jnp.where(issue, item % jnp.uint32(n_pix), st["pixel"])
    sample = jnp.where(issue, item // jnp.uint32(n_pix), st["sample"])
    xs = (pixel % jnp.uint32(static.width)).astype(REAL)
    ys = (pixel // jnp.uint32(static.width)).astype(REAL)
    u0, u1 = soa.uniform2(seed, pixel, jnp.uint32(_CTR_PIXEL), sample)
    porg, pd = primary_rays_soa(static, camera, xs, ys, u0, u1)
    org = soa.where(issue, porg, st["org"])
    d = soa.where(issue, pd, st["d"])
    tp = soa.where(issue, one3, st["tp"])
    pdf_prev = jnp.where(issue, 0.0, st["pdf_prev"])
    eta_scale = jnp.where(issue, 1.0, st["eta_scale"])
    bounce = jnp.where(issue, 0, st["bounce"])
    alive = jnp.where(issue, True, st["alive"] > 0)
    # rr_prev: survival prob divided out of tp at sample time; the
    # emission collected at this ray's hit must NOT carry that division
    # (the banded loop adds the emitter-hit contribution before RR).
    # cont: RR verdict — a killed lane still traces this ray for its
    # emission, then dies (matching the banded loop's trace-then-kill).
    rr_prev = jnp.where(issue, 1.0, st["rr_prev"])
    cont = jnp.where(issue, True, st["cont"] > 0)
    next_item = st["next_item"] + jnp.sum(issue.astype(jnp.uint32))
    # Ray differentials: fresh lanes restart at radius 0 / camera spread
    # (reference: src/ray.h:36-38).
    radius = jnp.where(issue, 0.0, st["radius"])
    spread = jnp.where(issue, 0.25 / max(static.width, static.height),
                       st["spread"])

    # --- trace pending rays (primary tnear = 0, bounce tnear = eps) ---
    tnear = jnp.where(bounce == 0, 0.0, eps_isect)
    tfar = jnp.where(alive, BIG, -1.0)
    # Pool-sorted mode (GDPT_POOL_SORT=1, read at trace time): the
    # driver morton-permutes the whole lane pool once per chunk, so the
    # extension trace skips its per-dispatch argsort (~60-70 ms per 1M
    # rays per bounce); NEE shadow dispatches keep their own sort
    # (different directions). Default off pending hardware A/B.
    pool_sorted = os.environ.get("GDPT_POOL_SORT", "0") == "1"
    # NOTE: a bounce-depth sort hint (sort_hint=bounce) was measured
    # SLOWER on hardware (2.03 -> 1.88 Mrays/s on captured pool rays)
    # despite the CPU visit model predicting -12% visits/packet — the
    # 24-packet sampled model under-represents the divergent tail that
    # depth grouping creates. Kept out; see packet_trace._morton_keys.
    hit, gn_raw = trs.intersect_soa_gn(static, sc.geom, org, d, tnear, tfar,
                                       sort_rays=not pool_sorted)
    v = shade_hit(static, sc, org, d, hit, gn_raw,
                  ray_radius=radius, ray_spread=spread)
    rays = st["rays"] + jnp.sum(jnp.where(alive, 1.0, 0.0))
    v_ok = (v.valid > 0) & alive
    miss = alive & (v.valid <= 0)
    is_primary = pdf_prev <= 0

    # --- radiance carried into this hit (reference:
    # src/path_tracing.h:291-325; carried-pdf form of path_soa's MIS) ---
    contrib = zero3
    tp_emit = tp * rr_prev
    if static.n_lights > 0:
        hit_is_light = v_ok & (v.light_id >= 0)
        l_emit = emission(sc, v, -1.0 * d)
        dist2 = soa.length_squared(v.position - org)
        g2 = jnp.abs(soa.dot(d, v.gn)) / jnp.maximum(dist2, 1e-20)
        p2a = pdf_prev * g2
        p1h = hit_light_pdf_soa(static, sc, org, v, d, dist2)
        w2 = p2a * p2a / jnp.maximum(p1h * p1h + p2a * p2a, 1e-30)
        wgt = jnp.where(is_primary, 1.0, w2)
        contrib = contrib + soa.where(hit_is_light, tp_emit * l_emit * wgt,
                                      zero3)
    if static.has_envmap:
        env, env_pdf = tsoa.envmap_emission_pdf_soa(
            _env_view(static, sc), sc.mat_tables.pool3, d)
        p1e = sc.light_pmf[static.envmap_light_id] * env_pdf
        w2e = pdf_prev * pdf_prev / jnp.maximum(
            p1e * p1e + pdf_prev * pdf_prev, 1e-30)
        wgt = jnp.where(is_primary, 1.0, w2e)
        contrib = contrib + soa.where(miss, tp_emit * env * wgt, zero3)

    # --- NEE + next bounce at the hit vertex ---
    b = bounce + 1
    ctr = lambda c: (b.astype(jnp.uint32) * jnp.uint32(_CTR_STRIDE)
                     + jnp.uint32(c))
    ext = v_ok & cont & (bounce < n_iters)
    params = msoa.gather_params_soa(
        sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
        static.spec_image_slots, float_tex_slots=static.float_tex_slots,
        fp=v.fp)
    dir_view = -d
    if static.n_lights > 0:
        lu0, lu1 = soa.uniform2(seed, pixel, ctr(_CTR_LIGHT_UV), sample)
        lw, lsw = soa.uniform2(seed, pixel, ctr(_CTR_LIGHT_W), sample)
        nee, shadow_mask = nee_soa(static, sc, v, params, dir_view, used,
                                   lu0, lu1, lw, lsw, ext)
        contrib = contrib + tp * nee
        rays = rays + jnp.sum(shadow_mask)

    bu0, bu1 = soa.uniform2(seed, pixel, ctr(_CTR_BSDF_UV), sample)
    w_lobe, u_rr = soa.uniform2(seed, pixel, ctr(_CTR_BSDF_W), sample)
    samp = msoa.sample_bsdf_soa(params, dir_view, v.gn, v.frame,
                                bu0, bu1, w_lobe, used)
    f_b = msoa.eval_bsdf_soa(params, dir_view, samp.dir_out, v.gn,
                             v.frame, used)
    pdf_b = msoa.pdf_bsdf_soa(params, dir_view, samp.dir_out, v.gn,
                              v.frame, used)
    valid = ext & (samp.valid > 0) & (pdf_b > 0)
    eta2 = jnp.where(
        samp.eta != 0,
        eta_scale / jnp.where(samp.eta != 0, samp.eta, 1.0) ** 2,
        eta_scale,
    )
    # Spread update for the sampled bounce (scene/camera.py
    # ray_diff_reflect/refract; reference: src/ray.h:41-57).
    is_tr = samp.eta != 0
    spec_spread = spread + 2.0 * v.mean_curv * v.radius
    spec_spread = jnp.where(
        is_tr, spec_spread / jnp.where(is_tr, samp.eta, 1.0), spec_spread)
    spread_next = jnp.maximum(
        spec_spread * (1.0 - samp.roughness) + 0.2 * samp.roughness, 0.0)
    tp_new = tp * f_b * (1.0 / jnp.maximum(pdf_b, 1e-30))

    # Russian roulette (reference: src/path_tracing.h:334-341). The
    # sampled ray is traced either way (next iteration) so its emitter
    # hit is collected; a killed lane stops after that (cont=False),
    # matching the banded loop's add-emission-then-kill ordering.
    do_rr = (bounce + 2) >= static.options.rr_depth
    rr_prob = jnp.where(
        do_rr,
        jnp.minimum(soa.vmax(tp_new) / jnp.maximum(eta2, 1e-20), 0.95),
        1.0,
    )
    survive = (~do_rr) | (u_rr <= rr_prob)
    tp_new = tp_new * (1.0 / jnp.maximum(rr_prob, 1e-20))
    alive_next = valid

    # --- accumulate into the image ---
    acc_x = st["acc_x"].at[pixel].add(contrib.x)
    acc_y = st["acc_y"].at[pixel].add(contrib.y)
    acc_z = st["acc_z"].at[pixel].add(contrib.z)

    return dict(
        org=soa.where(alive_next, v.position, org),
        d=soa.where(alive_next, samp.dir_out, d),
        tp=soa.where(alive_next, tp_new, tp),
        pdf_prev=jnp.where(alive_next, pdf_b, pdf_prev),
        eta_scale=jnp.where(alive_next, eta2, eta_scale),
        rr_prev=jnp.where(alive_next, rr_prob, rr_prev),
        cont=jnp.where(alive_next, survive, cont).astype(REAL),
        radius=jnp.where(alive_next, v.radius, radius),
        spread=jnp.where(alive_next, spread_next, spread),
        pixel=pixel,
        sample=sample,
        bounce=jnp.where(alive_next, b, bounce),
        alive=alive_next.astype(REAL),
        next_item=next_item,
        total=st["total"],
        seed=seed,
        rays=rays,
        # Occupancy telemetry: mean live fraction per iteration.
        occ_sum=st["occ_sum"] + jnp.mean(jnp.where(alive, 1.0, 0.0)),
        iters=st["iters"] + 1.0,
        acc_x=acc_x, acc_y=acc_y, acc_z=acc_z,
    )


# Lane-pool state entries to permute in pool-sorted mode (everything
# pool-shaped; accumulators/scalars stay put).
_POOL_KEYS = ("org", "d", "tp", "pdf_prev", "eta_scale", "rr_prev",
              "cont", "radius", "spread", "pixel", "sample", "bounce",
              "alive")


@partial(jax.jit, static_argnames=("new_pool",))
def _compact_take_order(keep, new_pool):
    """Stable keep-first permutation, sliced to the new pool width.

    Device-side: the first host version of tail compaction pulled the
    whole lane state through np.asarray — tens of MB over the axon
    tunnel per shrink — which showed up as a sponza_gradpath regression
    (1.75 -> 1.38 Mrays/s, round-5 first bench). One argsort over the
    old pool replaces all of that traffic."""
    return jnp.argsort(jnp.where(keep, 0, 1), stable=True)[:new_pool]


def _shrink_pool_state(st, new_pool, pool_keys=_POOL_KEYS, keep=None):
    """Compact live lanes into a fresh pool of width new_pool.

    Tail compaction (round-5 perf item): once the work queue drains,
    lanes die at different depths and every dispatch still pays
    full-width morton sort + (M,128) pack + material-stack cost — the
    round-4 profile showed intersect/occluded never dropping below
    ~330/150 ms even at 2.5k live lanes. Runs fully on device (the
    slots past the live prefix hold dead lanes, which regenerate
    nothing once the queue is empty); accumulators are n_pix-shaped
    and stay put.
    """
    if keep is None:
        keep = st["alive"] > 0
    order = _compact_take_order(keep, new_pool)

    def shrink(a):
        return jnp.take(a, order, axis=0)

    out = dict(st)
    for k in pool_keys:
        out[k] = jax.tree_util.tree_map(shrink, st[k])
    return out


def _tail_bucket(n_alive, cur_pool, lane_q):
    """Target pool width for the drain tail: next power-of-two >=
    n_alive, quantized to whole packet dispatches, floored at one
    dispatch. Returns None unless it at least halves the pool (each
    bucket width is a separate XLA compilation; pow-2 buckets bound the
    count at log2(pool/lane_q) per scene, all disk-cached)."""
    target = lane_q
    while target < n_alive:
        target *= 2
    target = -(-target // lane_q) * lane_q
    if target <= cur_pool // 2:
        return target
    return None


@partial(jax.jit, donate_argnums=(0,))
def _pool_sort(st, tab):
    """Morton/octant-permute the wavefront lane pool in place (dead
    lanes to the back, where they pack into all-dead packets). Lane
    identity (pixel, sample) rides with the state, so the estimator is
    unchanged — only packet composition improves."""
    from gdpt_tpu.accel import packet_trace as pt

    keys = pt._morton_keys(tab, st["org"], st["d"])
    keys = jnp.where(st["alive"] > 0, keys, jnp.int32(2 ** 30))
    perm = jnp.argsort(keys)
    out = dict(st)
    for k in _POOL_KEYS:
        out[k] = jax.tree_util.tree_map(
            lambda a: jnp.take(a, perm, axis=0), st[k])
    return out


@partial(jax.jit, static_argnames=("static", "k_iters"), donate_argnums=(2,))
def _wavefront_chunk(static, camera, st, sc, k_iters):
    # sc must NOT ride inside the donated pytree: donation deletes the
    # caller's scene buffers, which alias scene.device (any later use of
    # the scene — a second render, the GDPT driver — would crash).
    def body(i, s):
        return _wavefront_body(static, camera, sc, s)

    return jax.lax.fori_loop(0, k_iters, body, st)


def render_soa_wavefront(scene: Scene, spp, seed=0, return_stats=False,
                         pool=None, k_iters=None):
    """Wavefront path render: fixed lane pool + sample regeneration.

    Produces the same estimate as render_soa's banded loop (identical
    RNG streams per (pixel, sample)); accumulation happens on device in
    f32 instead of host f64.
    """
    static = scene.static
    w, h = static.width, static.height
    n_pix = w * h
    total = n_pix * spp
    if total >= 2 ** 32:
        # The work queue indexes (pixel, sample) items with a uint32
        # counter; beyond 2^32 it would silently wrap and drop samples.
        # render_soa routes such renders to the banded loop instead.
        raise ValueError(
            f"wavefront work queue: n_pix*spp = {total} >= 2^32; "
            "use render_soa (banded loop) for renders this large")
    sc = scene_soa_from_aos(scene)
    from gdpt_tpu.accel import packet_trace as pt

    if k_iters is None:
        # Packet-table scenes: 8 wavefront iterations per dispatch
        # amortize the dispatch/sync cost. Scenes whose table exceeds
        # the VMEM cap ride the super16 HBM-gather walk, ~10-20x slower
        # per iteration — 8 of those in one dispatch blows the axon
        # per-dispatch watchdog (~10 s) and the worker is KILLED
        # ("TPU worker process crashed", seen on disney_bsdf_array's
        # 734k tris at 512x512). One iteration per dispatch keeps each
        # dispatch bounded; the extra host syncs are noise at that
        # per-iteration cost.
        k_iters = 8 if sc.geom.packet is not None else 1

    lane_q = pt.PACKET_ROWS * 128
    if pool is None:
        pool = int(__import__("os").environ.get("GDPT_POOL", 1 << 18))
    pool = min(pool, -(-total // lane_q) * lane_q)
    pool = -(-pool // lane_q) * lane_q
    def z():
        return jnp.zeros(pool, REAL)

    st = dict(
        org=V3(z(), z(), z()),
        d=V3(jnp.ones(pool, REAL), z(), z()),
        tp=V3(z(), z(), z()),
        pdf_prev=jnp.zeros(pool, REAL),
        eta_scale=jnp.ones(pool, REAL),
        rr_prev=jnp.ones(pool, REAL),
        cont=jnp.ones(pool, REAL),
        radius=jnp.zeros(pool, REAL),
        spread=jnp.zeros(pool, REAL),
        pixel=jnp.zeros(pool, jnp.uint32),
        sample=jnp.zeros(pool, jnp.uint32),
        bounce=jnp.zeros(pool, INT),
        alive=jnp.zeros(pool, REAL),
        next_item=jnp.asarray(0, jnp.uint32),
        total=jnp.asarray(total, jnp.uint32),
        seed=jnp.asarray(seed, jnp.uint32),
        rays=jnp.asarray(0.0, REAL),
        occ_sum=jnp.asarray(0.0, REAL),
        iters=jnp.asarray(0.0, REAL),
        acc_x=jnp.zeros(n_pix, REAL),
        acc_y=jnp.zeros(n_pix, REAL),
        acc_z=jnp.zeros(n_pix, REAL),
    )
    # Device accumulation is f32 (scatter-add); to keep high-spp sums
    # from losing mantissa bits against a large accumulator, drain into
    # a host f64 buffer every ~64 issued spp-equivalents. Safe mid-
    # flight: lanes scatter later contributions onto the zeroed f32
    # buffer and the final drain picks them up.
    host_acc = np.zeros((3, n_pix), np.float64)
    drain_step = n_pix * 64
    last_drain = 0

    def drain(st):
        host_acc[0] += np.asarray(st["acc_x"], np.float64)
        host_acc[1] += np.asarray(st["acc_y"], np.float64)
        host_acc[2] += np.asarray(st["acc_z"], np.float64)
        st["acc_x"] = jnp.zeros(n_pix, REAL)
        st["acc_y"] = jnp.zeros(n_pix, REAL)
        st["acc_z"] = jnp.zeros(n_pix, REAL)

    pool_sort = (__import__("os").environ.get("GDPT_POOL_SORT", "0") == "1"
                 and sc.geom.packet is not None)
    compact = __import__("os").environ.get("GDPT_TAIL_COMPACT", "1") == "1"
    cur_pool = pool
    while True:
        if pool_sort:
            st = _pool_sort(st, sc.geom.packet)
        st = _wavefront_chunk(static, scene.device.camera, st, sc, k_iters)
        ni = int(st["next_item"])
        if ni >= total:
            n_alive = int(jnp.sum(st["alive"] > 0))
            if n_alive == 0:
                break
            # Drain tail: queue exhausted, surviving lanes at mixed
            # depths — compact them into the smallest pool bucket so
            # sort/pack/shade cost tracks the live count.
            if compact:
                tgt = _tail_bucket(n_alive, cur_pool, lane_q)
                if tgt is not None:
                    st = _shrink_pool_state(st, tgt)
                    cur_pool = tgt
        if ni - last_drain >= drain_step:
            drain(st)
            last_drain = ni
    drain(st)
    acc = host_acc
    img = (acc / spp).T.reshape(h, w, 3).astype(np.float32)
    img = np.where(np.isfinite(img), img, 0.0)
    render_soa_wavefront.last_occupancy = float(
        st["occ_sum"]) / max(float(st["iters"]), 1.0)
    if return_stats:
        return img, float(st["rays"])
    return img


@partial(jax.jit, static_argnames=("static", "n_samples"))
def _soa_pass(static, camera, sc, xs, ys, ray_idx, seed, sample0, n_samples):
    """n_samples accumulated samples for the whole ray batch (jitted once
    per (scene static, batch size))."""
    n = xs.shape[0]


    def one(i, carry):
        acc, rays = carry
        r, nr = trace_paths_soa(
            static, camera, sc, xs, ys, ray_idx, seed,
            sample0 + jnp.asarray(i, jnp.uint32),
        )
        return (
            V3(acc.x + r.x, acc.y + r.y, acc.z + r.z),
            rays + jnp.sum(nr),
        )

    zero = V3(jnp.zeros(n, REAL), jnp.zeros(n, REAL), jnp.zeros(n, REAL))
    return jax.lax.fori_loop(0, n_samples, one, (zero, jnp.asarray(0.0, REAL)))


def render_soa(scene: Scene, spp=None, seed=0, return_stats=False,
               start_sample=0, init_acc=None, on_chunk=None, mesh=None):
    """SoA render driver for the path integrator.

    start_sample/init_acc resume an interrupted accumulation (init_acc is
    the raw (3, n) float64 sample-sum array); on_chunk(acc, done) fires
    after every device pass for checkpointing. mesh: optional
    jax.sharding.Mesh with a 'rays' axis — the SAME banded loop runs
    with rays sharded and the scene replicated (reference analog: one
    tile scheduler for every integrator, src/render.cpp:82-90).
    """
    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n = w * h
    import os as _os

    if (mesh is None and not static.use_brute_force and on_chunk is None
            and init_acc is None and not start_sample
            and n * spp < 2 ** 32
            and _os.environ.get("GDPT_WAVEFRONT", "1") != "0"):
        # BVH scenes: the wavefront pool keeps every dispatch at ~full
        # occupancy (sample regeneration); the banded loop below pays
        # full-batch sort/gather/material cost per bounce even when most
        # lanes are dead. Checkpointing resume stays on the banded loop
        # (whole-sample accumulation boundaries).
        return render_soa_wavefront(scene, spp, seed=seed,
                                    return_stats=return_stats)
    sc = scene_soa_from_aos(scene)
    camera = scene.device.camera
    ys, xs = np.mgrid[0:h, 0:w]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as SP

        pad = (-n) % (mesh.devices.size * 128)
        shard = NamedSharding(mesh, SP("rays"))
        repl = NamedSharding(mesh, SP())
        xs_d = jax.device_put(jnp.asarray(np.concatenate(
            [xs.ravel(), np.zeros(pad)]).astype(np.float32)), shard)
        ys_d = jax.device_put(jnp.asarray(np.concatenate(
            [ys.ravel(), np.zeros(pad)]).astype(np.float32)), shard)
        ray_idx = jax.device_put(jnp.asarray(np.concatenate(
            [np.arange(n), np.zeros(pad)]).astype(np.uint32)), shard)
        sc = jax.device_put(sc, repl)
        camera = jax.device_put(camera, repl)
    else:
        xs_d = jnp.asarray(xs.ravel(), REAL)
        ys_d = jnp.asarray(ys.ravel(), REAL)
        ray_idx = jnp.arange(n, dtype=jnp.uint32)

    # Amortize per-pass dispatch/transfer with big sample batches, but
    # bound per-dispatch work: the device runtime kills executions that
    # run for minutes, and BVH scenes pay ~0.1-1s per bounce of
    # latency-bound traversal regardless of batch width.
    md = static.options.max_depth
    iters = HARD_BOUNCE_CAP if md < 0 else min(max(md, 1), HARD_BOUNCE_CAP)
    if static.use_brute_force:
        # Brute scenes are throughput-bound and fast per bounce: big
        # batches amortize dispatch (the 512^2 cbox does 256 spp in ~2s).
        batch = max(1, (1 << 26) // n)
    else:
        # BVH traversal is latency-bound: per-sample time is nearly
        # independent of image size, so ALWAYS one sample per dispatch
        # (the device watchdog kills multi-minute executions).
        batch = 1
    acc = (np.zeros((3, n), np.float64) if init_acc is None
           else np.asarray(init_acc, np.float64).copy())
    total_rays = 0.0
    done = int(start_sample)
    while done < spp:
        k = min(batch, spp - done)
        out, nrays = _soa_pass(
            static, camera, sc, xs_d, ys_d, ray_idx,
            jnp.asarray(seed, jnp.uint32), jnp.asarray(done, jnp.uint32), k,
        )
        acc[0] += np.asarray(out.x, np.float64)[:n]
        acc[1] += np.asarray(out.y, np.float64)[:n]
        acc[2] += np.asarray(out.z, np.float64)[:n]
        total_rays += float(nrays)
        done += k
        if on_chunk is not None:
            on_chunk(acc, done)
    img = (acc / spp).T.reshape(h, w, 3).astype(np.float32)
    img = np.where(np.isfinite(img), img, 0.0)
    if return_stats:
        return img, total_rays
    return img
