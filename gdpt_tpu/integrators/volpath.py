"""Volumetric path tracing, versions 1-6.

Re-design of reference: src/vol_path_tracing.h for TPU. The six versions
are kept as separate rungs exactly like the reference so the
scenes/volpath_test{1..6} ladder carries over:

1. absorption-only homogeneous (reference: :9-36)
2. single-scatter homogeneous with one-sample NEE (reference: :40-155)
3. multi-bounce homogeneous, multi-medium, index-matched crossings
   (reference: :157-333)
4. + NEE<->phase MIS with dir_pdf / multi_trans_pdf caches and shadow
   rays that pass through null surfaces (reference: :336-670)
5. + surface BSDF lighting inside media (reference: :672-1078)
6. chromatic heterogeneous null-scattering (delta tracking) with
   ratio-tracked transmittance estimates (reference: :1085-1618)

Every version is a per-ray program (vmapped) whose loops are
``lax.while_loop``s; inner free-flight and shadow-marching loops are
nested while_loops with the reference's max_null_collisions cap as the
trip bound. Volumetric NEE supports area lights (the reference's
volumetric scenes never combine media with envmaps).
"""

import jax
import jax.numpy as jnp

from gdpt_tpu.core import math as gm
from gdpt_tpu.core import rng
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.ops import intersect as isect
from gdpt_tpu.ops import lights as lgt
from gdpt_tpu.ops import materials as mat
from gdpt_tpu.ops import media as med
from gdpt_tpu.scene import camera as gcam
from gdpt_tpu.scene.build import DeviceScene, SceneStatic

HARD_CAP = 64
MAX_SHADOW_SEGMENTS = 16

_Z3 = lambda: jnp.zeros(3, REAL)


def _primary(scene, static, x, y, key):
    w, h = static.width, static.height
    u = rng.uniform(key, 0, rng.SLOT_PIXEL, (2,))
    screen = jnp.stack([(x + u[0]) / w, (y + u[1]) / h])
    return gcam.sample_primary(
        scene.camera, w, h, static.filter_kind, static.filter_param, screen
    )


def _loop_cap(static):
    md = static.options.max_depth
    return HARD_CAP if md < 0 else min(md, HARD_CAP)


# --------------------------------------------------------------------------
# Version 1: absorption only (reference: src/vol_path_tracing.h:9-36)
# --------------------------------------------------------------------------


def trace_volpath_1(scene: DeviceScene, static: SceneStatic, x, y, key):
    org, d = _primary(scene, static, x, y, key)
    v = isect.intersect(scene, static, org, d, 0.0, BIG)
    sigma_a = med.get_sigma_a(scene, static, v.exterior_medium_id, v.position)
    t_hit = gm.distance(v.position, org)
    trans = jnp.exp(-sigma_a * t_hit)
    le = lgt.emission_at_vertex(scene, static, v, -d)
    return jnp.where(v.valid, trans * le, _Z3())


# --------------------------------------------------------------------------
# Version 2: single scattering (reference: src/vol_path_tracing.h:40-155)
# --------------------------------------------------------------------------


def _l_s1(scene, static, key, p_sample, d, medium_id):
    """Single in-scattering estimate (reference helper L_s1, :40-88)."""
    sigma_t = med.get_majorant(scene, static, medium_id, p_sample, d)
    light_uv = rng.uniform(key, 1, rng.SLOT_LIGHT_UV, (2,))
    light_w = rng.uniform(key, 1, rng.SLOT_LIGHT_W)
    shape_w = rng.uniform(key, 1, rng.SLOT_SHAPE_W)
    light_id = lgt.sample_light_id(scene, light_w)
    p_l, n_l = lgt.sample_point_on_light(
        scene, static, light_id, p_sample, light_uv, shape_w
    )
    pdf = lgt.light_pmf(scene, light_id) * lgt.pdf_point_on_light(
        scene, static, light_id, p_l, n_l, p_sample
    )
    diff = p_l - p_sample
    dist = jnp.maximum(gm.length(diff), 1e-20)
    omega = diff / dist
    rho = med.phase_eval(scene, static, medium_id, d, omega)
    le = lgt.emission_light(scene, static, light_id, -omega, 0.0, p_l, n_l)
    eps = static.shadow_epsilon
    blocked = isect.occluded(scene, static, p_sample, omega, eps, (1.0 - eps) * dist)
    jac = jnp.abs(gm.dot(omega, n_l)) / (dist * dist)
    est = rho * le * jnp.exp(-sigma_t * dist) * jac * jnp.where(blocked, 0.0, 1.0)
    return jnp.where(pdf > 0, est / jnp.maximum(pdf, 1e-30), _Z3())


def trace_volpath_2(scene: DeviceScene, static: SceneStatic, x, y, key):
    org, d = _primary(scene, static, x, y, key)
    v = isect.intersect(scene, static, org, d, 0.0, BIG)
    # Medium 0 fills the world in this rung (reference: :112-113).
    m0 = jnp.asarray(0, INT)
    u = rng.uniform(key, 1, rng.SLOT_DISTANCE)
    sigma_s = med.get_sigma_s(scene, static, m0, org)
    sigma_t = med.get_sigma_a(scene, static, m0, org) + sigma_s
    t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / jnp.maximum(sigma_t[0], 1e-20)
    t_hit = gm.distance(v.position, org)
    t_max = jnp.where(v.valid, t_hit, BIG)

    # Scatter branch.
    p_scatter = org + t * d
    ls1 = _l_s1(scene, static, key, p_scatter, d, m0)
    scatter_val = sigma_s * ls1 / jnp.maximum(sigma_t, 1e-20)

    # Surface branch: transmittance and pdf cancel.
    le = lgt.emission_at_vertex(scene, static, v, -d)
    return jnp.where(t < t_max, scatter_val, jnp.where(v.valid, le, _Z3()))


# --------------------------------------------------------------------------
# Version 3: multi-bounce homogeneous (reference: src/vol_path_tracing.h:176-333)
# --------------------------------------------------------------------------


def trace_volpath_3(scene: DeviceScene, static: SceneStatic, x, y, key):
    org0, d0 = _primary(scene, static, x, y, key)
    max_depth = static.options.max_depth
    cap = _loop_cap(static)

    state = dict(
        org=org0, d=d0,
        medium=jnp.asarray(static.camera_medium_id, INT),
        throughput=jnp.ones(3, REAL),
        radiance=_Z3(),
        bounces=jnp.asarray(0, INT),
        iters=jnp.asarray(0, INT),
        active=jnp.asarray(True),
    )

    def cond(s):
        return s["active"] & (s["iters"] < cap + 1)

    def body(s):
        b = s["iters"] + 1
        v = isect.intersect(scene, static, s["org"], s["d"], 0.0, BIG)
        in_medium = s["medium"] >= 0

        u = rng.uniform(key, b, rng.SLOT_DISTANCE)
        sigma_t = med.get_majorant(scene, static, s["medium"], s["org"], s["d"])
        t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / jnp.maximum(sigma_t[0], 1e-20)
        t_hit = gm.distance(v.position, s["org"])
        t_max = jnp.where(v.valid, t_hit, BIG)
        scatter = in_medium & (t < t_max)

        trans = jnp.where(
            in_medium,
            jnp.exp(-sigma_t * jnp.where(scatter, t, t_hit)),
            jnp.ones(3, REAL),
        )
        trans_pdf = jnp.where(
            in_medium,
            jnp.where(scatter, trans * sigma_t, trans),
            jnp.ones(3, REAL),
        )
        alive = in_medium | v.valid
        new_org = jnp.where(
            scatter,
            s["org"] + t * s["d"],
            v.position + s["d"] * static.intersection_epsilon,
        )
        throughput = s["throughput"] * trans / jnp.maximum(trans_pdf, 1e-30)

        # Surface emission when not scattering (reference: :263-270).
        le = lgt.emission_at_vertex(scene, static, v, -s["d"])
        radiance = s["radiance"] + jnp.where(
            alive & ~scatter & v.valid, throughput * le, _Z3()
        )

        depth_stop = (s["bounces"] == max_depth - 1) & (max_depth != -1)
        passthrough = (~scatter) & v.valid & (v.material_id == -1) & ~depth_stop
        new_medium = jnp.where(passthrough, med.update_medium(v, s["d"], s["medium"]), s["medium"])

        # Scatter: phase sampling (reference: :293-307).
        uv_p = rng.uniform(key, b, rng.SLOT_PHASE_UV, (2,))
        new_dir = med.phase_sample(scene, static, s["medium"], -s["d"], uv_p)
        rho = med.phase_eval(scene, static, s["medium"], -s["d"], new_dir)
        pdf_p = med.phase_pdf(scene, static, s["medium"], -s["d"], new_dir)
        sigma_s = med.get_sigma_s(scene, static, s["medium"], new_org)
        throughput_sc = throughput * (rho / jnp.maximum(pdf_p, 1e-30)) * sigma_s

        do_scatter = alive & scatter & ~depth_stop
        throughput = jnp.where(do_scatter, throughput_sc, throughput)
        new_d = jnp.where(do_scatter, new_dir, s["d"])

        active = alive & ~depth_stop & (do_scatter | passthrough)

        # Russian roulette (reference: :315-329; channel-0 heuristic).
        do_rr = active & (s["bounces"] >= static.options.rr_depth) & do_scatter
        rr_prob = jnp.where(do_rr, jnp.minimum(throughput[0], 0.95), 1.0)
        u_rr = rng.uniform(key, b, rng.SLOT_RR)
        killed = do_rr & (u_rr >= rr_prob)
        throughput = jnp.where(do_rr & ~killed, throughput / rr_prob, throughput)
        active &= ~killed

        return dict(
            org=jnp.where(active | ~alive, new_org, s["org"]),
            d=new_d,
            medium=new_medium,
            throughput=throughput,
            radiance=radiance,
            bounces=s["bounces"] + jnp.where(do_scatter | passthrough, 1, 0),
            iters=s["iters"] + 1,
            active=s["active"] & active,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["radiance"]


# --------------------------------------------------------------------------
# Shared volumetric NEE (versions 4/5; reference: :336-451, :672-788)
# --------------------------------------------------------------------------


def _nee_vol(scene, static, key, b, p0, og_dir, medium, bounces,
             surface=None):
    """NEE from a scattering point (surface=None -> phase MIS) or from a
    surface vertex (surface=(params, vertex, used) -> BSDF MIS), with the
    shadow ray marching through index-matched surfaces."""
    light_uv = rng.uniform(key, b, rng.SLOT_LIGHT_UV, (2,))
    light_w = rng.uniform(key, b, rng.SLOT_LIGHT_W)
    shape_w = rng.uniform(key, b, rng.SLOT_SHAPE_W)
    light_id = lgt.sample_light_id(scene, light_w)
    p_l, n_l = lgt.sample_point_on_light(scene, static, light_id, p0, light_uv, shape_w)
    pdf_nee = lgt.light_pmf(scene, light_id) * lgt.pdf_point_on_light(
        scene, static, light_id, p_l, n_l, p0
    )
    dir_light = gm.normalize(p_l - p0, eps=1e-20)
    max_depth = static.options.max_depth
    eps = static.shadow_epsilon

    state = dict(
        p=p0,
        t_light=jnp.ones(3, REAL),
        p_trans=jnp.asarray(1.0, REAL),
        shadow_medium=medium,
        shadow_bounces=jnp.asarray(0, INT),
        alive=jnp.asarray(True),
        blocked=jnp.asarray(False),
        seg=jnp.asarray(0, INT),
    )

    def cond(s):
        return s["alive"] & (s["seg"] < MAX_SHADOW_SEGMENTS)

    def body(s):
        dist_left = gm.distance(p_l, s["p"])
        sv = isect.intersect(
            scene, static, s["p"], dir_light, eps, (1.0 - eps) * dist_left
        )
        next_t = jnp.where(sv.valid, gm.distance(s["p"], sv.position), dist_left)
        in_med = s["shadow_medium"] >= 0
        sigma_t = med.get_majorant(scene, static, s["shadow_medium"], s["p"], dir_light)
        t_light = jnp.where(in_med, s["t_light"] * jnp.exp(-sigma_t * next_t), s["t_light"])
        p_trans = jnp.where(in_med, s["p_trans"] * jnp.exp(-sigma_t[0] * next_t), s["p_trans"])

        clear = ~sv.valid
        hit_solid = sv.valid & (sv.material_id >= 0)
        sb = s["shadow_bounces"] + 1
        depth_kill = (max_depth != -1) & ((bounces + sb + 1) >= max_depth)
        blocked = s["blocked"] | hit_solid | (sv.valid & ~hit_solid & depth_kill)
        alive = s["alive"] & ~clear & ~blocked
        new_medium = jnp.where(alive, med.update_medium(sv, dir_light, s["shadow_medium"]), s["shadow_medium"])
        new_p = jnp.where(alive, s["p"] + next_t * dir_light, s["p"])
        return dict(
            p=new_p, t_light=t_light, p_trans=p_trans,
            shadow_medium=new_medium, shadow_bounces=sb,
            alive=alive, blocked=blocked, seg=s["seg"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    visible = ~out["blocked"] & (jnp.max(out["t_light"]) > 0)

    diff = p_l - p0
    dist = jnp.maximum(gm.length(diff), 1e-20)
    omega = diff / dist
    g = jnp.maximum(-gm.dot(omega, n_l), 0.0) / (dist * dist)
    le = lgt.emission_light(scene, static, light_id, -omega, 0.0, p_l, n_l)
    if surface is None:
        rho = med.phase_eval(scene, static, medium, og_dir, omega) * jnp.ones(3, REAL)
        pdf_dir = med.phase_pdf(scene, static, medium, og_dir, omega) * g * out["p_trans"]
    else:
        params, vertex, used = surface
        rho = mat.eval_bsdf(params, og_dir, omega, vertex, used)
        pdf_dir = mat.pdf_bsdf(params, og_dir, omega, vertex, used) * g * out["p_trans"]
    contrib = out["t_light"] * g * rho * le / jnp.maximum(pdf_nee, 1e-30)
    w = pdf_nee * pdf_nee / jnp.maximum(pdf_nee * pdf_nee + pdf_dir * pdf_dir, 1e-30)
    ok = visible & (pdf_nee > 0)
    return jnp.where(ok, contrib * w, _Z3())


# --------------------------------------------------------------------------
# Versions 4 & 5 (reference: :458-670 and :794-1078)
# --------------------------------------------------------------------------


def _trace_volpath_45(scene, static, x, y, key, surface_lighting: bool):
    org0, d0 = _primary(scene, static, x, y, key)
    max_depth = static.options.max_depth
    cap = _loop_cap(static)
    used = static.used_material_kinds

    state = dict(
        org=org0, d=d0,
        medium=jnp.asarray(static.camera_medium_id, INT),
        throughput=jnp.ones(3, REAL),
        radiance=_Z3(),
        bounces=jnp.asarray(0, INT),
        iters=jnp.asarray(0, INT),
        dir_pdf=jnp.asarray(0.0, REAL),
        nee_cache=_Z3(),
        multi_trans_pdf=jnp.asarray(1.0, REAL),
        never_scatter=jnp.asarray(True),
        never_surface=jnp.asarray(True),
        active=jnp.asarray(True),
    )

    def cond(s):
        return s["active"] & (s["iters"] < cap + 1)

    def body(s):
        b = s["iters"] + 1
        v = isect.intersect(scene, static, s["org"], s["d"], 0.0, BIG)
        in_medium = s["medium"] >= 0

        u = rng.uniform(key, b, rng.SLOT_DISTANCE)
        sigma_t = med.get_majorant(scene, static, s["medium"], s["org"], s["d"])
        t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / jnp.maximum(sigma_t[0], 1e-20)
        t_hit = gm.distance(v.position, s["org"])
        t_max = jnp.where(v.valid, t_hit, BIG)
        scatter = in_medium & (t < t_max)

        trans = jnp.where(
            in_medium,
            jnp.exp(-sigma_t * jnp.where(scatter, t, t_hit)),
            jnp.ones(3, REAL),
        )
        trans_pdf = jnp.where(
            in_medium,
            jnp.where(scatter, trans * sigma_t, trans),
            jnp.ones(3, REAL),
        )
        alive = in_medium | v.valid
        scatter_pos = s["org"] + t * s["d"]
        new_org = jnp.where(scatter, scatter_pos, v.position)
        throughput = s["throughput"] * trans / jnp.maximum(trans_pdf, 1e-30)
        multi_trans_pdf = s["multi_trans_pdf"] * trans_pdf[0]

        # Emission on surface hit, MIS-weighted when a phase/BSDF sample
        # led here (reference: :550-595, :893-940).
        hit_light = alive & ~scatter & v.valid & (
            scene.shape_light_id[v.shape_id] >= 0
        )
        le = lgt.emission_at_vertex(scene, static, v, -s["d"])
        fresh = s["never_scatter"] & (s["never_surface"] | jnp.asarray(not surface_lighting))
        lid = jnp.maximum(scene.shape_light_id[v.shape_id], 0)
        pdf_nee = lgt.light_pmf(scene, lid) * lgt.pdf_point_on_light(
            scene, static, lid, v.position, v.geom_normal, s["nee_cache"]
        )
        diff = v.position - s["nee_cache"]
        ndist = jnp.maximum(gm.length(diff), 1e-20)
        omega = diff / ndist
        g = jnp.maximum(-gm.dot(omega, v.geom_normal), 0.0) / (ndist * ndist)
        dir_pdf_total = s["dir_pdf"] * multi_trans_pdf * g
        w_mis = dir_pdf_total * dir_pdf_total / jnp.maximum(
            dir_pdf_total * dir_pdf_total + pdf_nee * pdf_nee, 1e-30
        )
        radiance = s["radiance"] + jnp.where(
            hit_light,
            throughput * le * jnp.where(fresh, 1.0, w_mis),
            _Z3(),
        )

        depth_stop = (s["bounces"] == max_depth - 1) & (max_depth != -1)
        passthrough = alive & (~scatter) & v.valid & (v.material_id == -1) & ~depth_stop
        new_medium = jnp.where(
            passthrough, med.update_medium(v, s["d"], s["medium"]), s["medium"]
        )

        # --- scattering vertex: NEE + phase sampling (reference: :616-645) ---
        do_scatter = alive & scatter & ~depth_stop
        sigma_s = med.get_sigma_s(scene, static, s["medium"], new_org)
        nee = _nee_vol(scene, static, key, b, new_org, -s["d"], s["medium"], s["bounces"])
        radiance = radiance + jnp.where(do_scatter, throughput * sigma_s * nee, _Z3())
        uv_p = rng.uniform(key, b, rng.SLOT_PHASE_UV, (2,))
        new_dir = med.phase_sample(scene, static, s["medium"], -s["d"], uv_p)
        rho = med.phase_eval(scene, static, s["medium"], -s["d"], new_dir)
        pdf_p = med.phase_pdf(scene, static, s["medium"], -s["d"], new_dir)
        thr_scatter = throughput * (rho / jnp.maximum(pdf_p, 1e-30)) * sigma_s

        # --- surface vertex (version 5 only; reference: :992-1057) ---
        if surface_lighting:
            do_surface = alive & ~scatter & v.valid & (v.material_id >= 0) & ~depth_stop
            params = mat.gather_params(scene, static, v)
            nee_s = _nee_vol(
                scene, static, key, b, v.position, -s["d"], s["medium"],
                s["bounces"], surface=(params, v, used),
            )
            radiance = radiance + jnp.where(do_surface, throughput * nee_s, _Z3())
            uv_b = rng.uniform(key, b, rng.SLOT_BSDF_UV, (2,))
            w_b = rng.uniform(key, b, rng.SLOT_BSDF_W)
            samp = mat.sample_bsdf(params, -s["d"], v, uv_b, w_b, used)
            f = mat.eval_bsdf(params, -s["d"], samp.dir_out, v, used)
            p2 = mat.pdf_bsdf(params, -s["d"], samp.dir_out, v, used)
            surf_ok = samp.valid & (p2 > 0)
            thr_surface = throughput * f / jnp.maximum(p2, 1e-30)
            refract_medium = med.update_medium(v, s["d"], s["medium"])
            new_medium = jnp.where(
                do_surface & surf_ok & (samp.eta != 0), refract_medium, new_medium
            )
        else:
            do_surface = jnp.asarray(False)
            surf_ok = jnp.asarray(False)
            samp = None
            p2 = jnp.asarray(0.0, REAL)
            thr_surface = throughput

        throughput = jnp.where(
            do_scatter, thr_scatter,
            jnp.where(do_surface & surf_ok, thr_surface, throughput),
        )
        new_d = jnp.where(do_scatter, new_dir, s["d"])
        if surface_lighting:
            new_d = jnp.where(do_surface & surf_ok, samp.dir_out, new_d)
        new_org = jnp.where(
            do_scatter | (do_surface & surf_ok),
            new_org + new_d * static.intersection_epsilon,
            jnp.where(passthrough, new_org + s["d"] * static.intersection_epsilon, new_org),
        )
        dir_pdf = jnp.where(
            do_scatter, pdf_p, jnp.where(do_surface & surf_ok, p2, s["dir_pdf"])
        )
        nee_cache = jnp.where(
            do_scatter[..., None] if do_scatter.ndim else do_scatter,
            scatter_pos,
            jnp.where(do_surface, v.position, s["nee_cache"]),
        )
        never_scatter = s["never_scatter"] & ~do_scatter
        never_surface = s["never_surface"] & ~(do_surface & surf_ok)
        mtp = jnp.where(do_scatter | (do_surface & surf_ok), 1.0, multi_trans_pdf)

        active = alive & ~depth_stop & (
            do_scatter | passthrough | (do_surface & surf_ok)
        )

        do_rr = active & (s["bounces"] >= static.options.rr_depth) & ~passthrough
        rr_prob = jnp.where(do_rr, jnp.minimum(jnp.max(throughput), 0.95), 1.0)
        u_rr = rng.uniform(key, b, rng.SLOT_RR)
        killed = do_rr & (u_rr > rr_prob)
        throughput = jnp.where(do_rr & ~killed, throughput / rr_prob, throughput)
        active &= ~killed

        return dict(
            org=new_org,
            d=new_d,
            medium=new_medium,
            throughput=throughput,
            radiance=radiance,
            bounces=s["bounces"] + jnp.where(active, 1, 0),
            iters=s["iters"] + 1,
            dir_pdf=dir_pdf,
            nee_cache=nee_cache,
            multi_trans_pdf=mtp,
            never_scatter=never_scatter,
            never_surface=never_surface,
            active=s["active"] & active,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["radiance"]


def trace_volpath_4(scene, static, x, y, key):
    return _trace_volpath_45(scene, static, x, y, key, surface_lighting=False)


def trace_volpath_5(scene, static, x, y, key):
    return _trace_volpath_45(scene, static, x, y, key, surface_lighting=True)


# --------------------------------------------------------------------------
# Final version: chromatic heterogeneous null scattering
# (reference: src/vol_path_tracing.h:1085-1618)
# --------------------------------------------------------------------------


def _free_flight(scene, static, key, b, org, d, medium, t_hit):
    """Delta-tracking free flight with the max_null_collisions cap
    (reference: :1334-1403). Returns (scatter, new_org_offset_t,
    transmittance, trans_dir_pdf, trans_nee_pdf)."""
    sigma_m = med.get_majorant(scene, static, medium, org, d)
    u_ch = rng.uniform(key, b, rng.SLOT_CHANNEL)
    channel = jnp.clip((u_ch * 3.0).astype(INT), 0, 2)
    max_iters = static.options.max_null_collisions

    state = dict(
        accum_t=jnp.asarray(0.0, REAL),
        it=jnp.asarray(0, INT),
        scatter=jnp.asarray(False),
        trans=jnp.ones(3, REAL),
        p_dir=jnp.ones(3, REAL),
        p_nee=jnp.ones(3, REAL),
        alive=sigma_m[jnp.clip((u_ch * 3.0).astype(INT), 0, 2)] > 0,
    )

    def cond(s):
        return s["alive"] & (s["it"] < max_iters)

    def body(s):
        u = rng.loop_uniform(key, b, rng.SLOT_NULL_LOOP, s["it"])
        u2 = rng.loop_uniform(key, b, rng.SLOT_NULL_LOOP + 1, s["it"])
        sig_ch = jnp.maximum(sigma_m[channel], 1e-20)
        t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sig_ch
        dt = t_hit - s["accum_t"]
        accum_t = jnp.minimum(s["accum_t"] + t, t_hit)
        reach_surface = t >= dt
        max_m = jnp.maximum(jnp.max(sigma_m), 1e-20)

        # Reached the surface: close out transmittance (reference: :1390-1397).
        trans_srf = s["trans"] * jnp.exp(-sigma_m * dt)
        pdir_srf = s["p_dir"] * jnp.exp(-sigma_m * dt)
        pnee_srf = s["p_nee"] * jnp.exp(-sigma_m * dt)

        # Collision inside the medium: real or null particle.
        point = org + accum_t * d
        sigma_t = med.get_sigma_a(scene, static, medium, point) + med.get_sigma_s(
            scene, static, medium, point
        )
        real_prob = sigma_t / jnp.maximum(sigma_m, 1e-20)
        is_real = u2 < real_prob[channel]
        trans_real = s["trans"] * jnp.exp(-sigma_m * t) / max_m
        pdir_real = s["p_dir"] * jnp.exp(-sigma_m * t) * sigma_m * real_prob / max_m
        trans_null = s["trans"] * jnp.exp(-sigma_m * t) * (sigma_m - sigma_t) / max_m
        pdir_null = s["p_dir"] * jnp.exp(-sigma_m * t) * sigma_m * (1.0 - real_prob) / max_m
        pnee_null = s["p_nee"] * jnp.exp(-sigma_m * t) * sigma_m / max_m

        trans = jnp.where(reach_surface, trans_srf, jnp.where(is_real, trans_real, trans_null))
        p_dir = jnp.where(reach_surface, pdir_srf, jnp.where(is_real, pdir_real, pdir_null))
        p_nee = jnp.where(reach_surface, pnee_srf, jnp.where(is_real, s["p_nee"], pnee_null))
        scatter = ~reach_surface & is_real
        alive = s["alive"] & ~reach_surface & ~scatter
        return dict(
            accum_t=accum_t, it=s["it"] + 1, scatter=s["scatter"] | scatter,
            trans=trans, p_dir=p_dir, p_nee=p_nee, alive=alive,
        )

    out = jax.lax.while_loop(cond, body, state)
    no_medium = jnp.max(sigma_m) <= 0
    return (
        out["scatter"] & ~no_medium,
        jnp.where(out["scatter"], out["accum_t"], t_hit),
        jnp.where(no_medium, jnp.ones(3, REAL), out["trans"]),
        jnp.where(no_medium, jnp.ones(3, REAL), out["p_dir"]),
        jnp.where(no_medium, jnp.ones(3, REAL), out["p_nee"]),
    )


def _nee_vol_final(scene, static, key, b, p0, og_dir, medium, bounces, surface=None):
    """NEE with ratio-tracked transmittance (reference: :1085-1279)."""
    light_uv = rng.uniform(key, b, rng.SLOT_LIGHT_UV, (2,))
    light_w = rng.uniform(key, b, rng.SLOT_LIGHT_W)
    shape_w = rng.uniform(key, b, rng.SLOT_SHAPE_W)
    light_id = lgt.sample_light_id(scene, light_w)
    p_l, n_l = lgt.sample_point_on_light(scene, static, light_id, p0, light_uv, shape_w)
    pdf_nee_pt = lgt.light_pmf(scene, light_id) * lgt.pdf_point_on_light(
        scene, static, light_id, p_l, n_l, p0
    )
    dir_light = gm.normalize(p_l - p0, eps=1e-20)
    max_depth = static.options.max_depth
    eps = static.shadow_epsilon
    max_iters = static.options.max_null_collisions

    state = dict(
        p=p0,
        t_light=jnp.ones(3, REAL),
        p_trans_nee=jnp.ones(3, REAL),
        p_trans_dir=jnp.ones(3, REAL),
        shadow_medium=medium,
        shadow_bounces=jnp.asarray(0, INT),
        alive=jnp.asarray(True),
        blocked=jnp.asarray(False),
        seg=jnp.asarray(0, INT),
    )

    def cond(s):
        return s["alive"] & (s["seg"] < MAX_SHADOW_SEGMENTS)

    def body(s):
        dist_left = gm.distance(p_l, s["p"])
        sv = isect.intersect(
            scene, static, s["p"], dir_light, eps, (1.0 - eps) * dist_left
        )
        next_t = jnp.where(sv.valid, gm.distance(s["p"], sv.position), dist_left)
        in_med = s["shadow_medium"] >= 0

        sigma_m = med.get_majorant(scene, static, s["shadow_medium"], s["p"], dir_light)
        u_ch = rng.loop_uniform(key, b, rng.SLOT_NEE_LOOP, s["seg"])
        channel = jnp.clip((u_ch * 3.0).astype(INT), 0, 2)

        inner = dict(
            accum_t=jnp.asarray(0.0, REAL),
            it=jnp.asarray(0, INT),
            p=s["p"],
            t_light=s["t_light"],
            p_nee=s["p_trans_nee"],
            p_dir=s["p_trans_dir"],
            alive=in_med & (sigma_m[channel] > 0),
        )

        def icond(i):
            return i["alive"] & (i["it"] < max_iters)

        def ibody(i):
            u = rng.loop_uniform(key, b, rng.SLOT_NEE_LOOP + 1, s["seg"] * 4096 + i["it"])
            sig_ch = jnp.maximum(sigma_m[channel], 1e-20)
            t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sig_ch
            dt = next_t - i["accum_t"]
            accum_t = jnp.minimum(i["accum_t"] + t, next_t)
            reach = t >= dt
            max_m = jnp.maximum(jnp.max(sigma_m), 1e-20)
            new_p_in = i["p"] + t * dir_light
            sigma_t = med.get_sigma_a(scene, static, s["shadow_medium"], new_p_in) + \
                med.get_sigma_s(scene, static, s["shadow_medium"], new_p_in)
            real_prob = sigma_t / jnp.maximum(sigma_m, 1e-20)
            tl_in = i["t_light"] * jnp.exp(-sigma_m * t) * (sigma_m - sigma_t) / max_m
            pn_in = i["p_nee"] * jnp.exp(-sigma_m * t) * sigma_m / max_m
            pd_in = i["p_dir"] * jnp.exp(-sigma_m * t) * sigma_m * (1.0 - real_prob) / max_m
            tl_srf = i["t_light"] * jnp.exp(-sigma_m * dt)
            pn_srf = i["p_nee"] * jnp.exp(-sigma_m * dt)
            pd_srf = i["p_dir"] * jnp.exp(-sigma_m * dt)
            t_light = jnp.where(reach, tl_srf, tl_in)
            p_nee = jnp.where(reach, pn_srf, pn_in)
            p_dir = jnp.where(reach, pd_srf, pd_in)
            p_new = jnp.where(reach, i["p"] + dt * dir_light, new_p_in)
            dead = jnp.max(t_light) <= 0
            return dict(
                accum_t=accum_t, it=i["it"] + 1, p=p_new,
                t_light=t_light, p_nee=p_nee, p_dir=p_dir,
                alive=i["alive"] & ~reach & ~dead,
            )

        iout = jax.lax.while_loop(icond, ibody, inner)
        t_light = jnp.where(in_med, iout["t_light"], s["t_light"])
        p_nee = jnp.where(in_med, iout["p_nee"], s["p_trans_nee"])
        p_dir = jnp.where(in_med, iout["p_dir"], s["p_trans_dir"])

        clear = ~sv.valid
        hit_solid = sv.valid & (sv.material_id >= 0)
        sb = s["shadow_bounces"] + 1
        depth_kill = (max_depth != -1) & ((bounces + sb + 1) >= max_depth)
        blocked = s["blocked"] | hit_solid | (sv.valid & ~hit_solid & depth_kill)
        alive = s["alive"] & ~clear & ~blocked
        new_medium = jnp.where(
            alive, med.update_medium(sv, dir_light, s["shadow_medium"]), s["shadow_medium"]
        )
        new_p = jnp.where(alive, sv.position, s["p"])
        return dict(
            p=new_p, t_light=t_light, p_trans_nee=p_nee, p_trans_dir=p_dir,
            shadow_medium=new_medium, shadow_bounces=sb, alive=alive,
            blocked=blocked, seg=s["seg"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    visible = ~out["blocked"] & (jnp.max(out["t_light"]) > 0)

    from gdpt_tpu.core.spectrum import avg

    pdf_nee = pdf_nee_pt * avg(out["p_trans_nee"])
    diff = p_l - p0
    dist = jnp.maximum(gm.length(diff), 1e-20)
    omega = diff / dist
    g = jnp.maximum(-gm.dot(omega, n_l), 0.0) / (dist * dist)
    le = lgt.emission_light(scene, static, light_id, -omega, 0.0, p_l, n_l)
    if surface is None:
        rho = med.phase_eval(scene, static, medium, og_dir, omega) * jnp.ones(3, REAL)
        pdf_dir = med.phase_pdf(scene, static, medium, og_dir, omega) * g * avg(out["p_trans_dir"])
    else:
        params, vertex, used = surface
        rho = mat.eval_bsdf(params, og_dir, omega, vertex, used)
        pdf_dir = mat.pdf_bsdf(params, og_dir, omega, vertex, used) * g * avg(out["p_trans_dir"])
    contrib = out["t_light"] * g * rho * le / jnp.maximum(pdf_nee, 1e-30)
    w = pdf_nee * pdf_nee / jnp.maximum(pdf_nee * pdf_nee + pdf_dir * pdf_dir, 1e-30)
    ok = visible & (pdf_nee > 0)
    return jnp.where(ok, contrib * w, _Z3())


def trace_volpath_final(scene: DeviceScene, static: SceneStatic, x, y, key):
    from gdpt_tpu.core.spectrum import avg

    org0, d0 = _primary(scene, static, x, y, key)
    max_depth = static.options.max_depth
    cap = _loop_cap(static)
    used = static.used_material_kinds

    state = dict(
        org=org0, d=d0,
        medium=jnp.asarray(static.camera_medium_id, INT),
        throughput=jnp.ones(3, REAL),
        radiance=_Z3(),
        bounces=jnp.asarray(0, INT),
        iters=jnp.asarray(0, INT),
        dir_pdf=jnp.asarray(0.0, REAL),
        nee_cache=_Z3(),
        multi_trans_pdf=jnp.ones(3, REAL),
        multi_trans_nee=jnp.ones(3, REAL),
        never_scatter=jnp.asarray(True),
        never_surface=jnp.asarray(True),
        active=jnp.asarray(True),
    )

    def cond(s):
        return s["active"] & (s["iters"] < cap + 1)

    def body(s):
        b = s["iters"] + 1
        v = isect.intersect(scene, static, s["org"], s["d"], 0.0, BIG)
        in_medium = s["medium"] >= 0
        t_hit = jnp.where(v.valid, gm.distance(v.position, s["org"]), BIG)

        scatter, travel_t, trans, p_dir, p_nee = _free_flight(
            scene, static, key, b, s["org"], s["d"], s["medium"], t_hit
        )
        scatter &= in_medium
        trans = jnp.where(in_medium, trans, jnp.ones(3, REAL))
        p_dir = jnp.where(in_medium, p_dir, jnp.ones(3, REAL))
        p_nee = jnp.where(in_medium, p_nee, jnp.ones(3, REAL))

        alive = in_medium | v.valid
        new_org = jnp.where(
            scatter,
            s["org"] + travel_t * s["d"],
            jnp.where(v.valid, v.position, s["org"]),
        )
        throughput = s["throughput"] * trans / jnp.maximum(avg(p_dir), 1e-30)
        multi_trans_pdf = s["multi_trans_pdf"] * p_dir
        multi_trans_nee = s["multi_trans_nee"] * p_nee

        hit_light = alive & ~scatter & v.valid & (
            scene.shape_light_id[v.shape_id] >= 0
        )
        le = lgt.emission_at_vertex(scene, static, v, -s["d"])
        fresh = s["never_scatter"] & s["never_surface"]
        lid = jnp.maximum(scene.shape_light_id[v.shape_id], 0)
        pdf_nee = lgt.light_pmf(scene, lid) * lgt.pdf_point_on_light(
            scene, static, lid, v.position, v.geom_normal, s["nee_cache"]
        ) * avg(multi_trans_nee)
        diff = v.position - s["nee_cache"]
        ndist = jnp.maximum(gm.length(diff), 1e-20)
        omega = diff / ndist
        g = jnp.maximum(-gm.dot(omega, v.geom_normal), 0.0) / (ndist * ndist)
        dir_pdf_total = s["dir_pdf"] * avg(multi_trans_pdf) * g
        w_mis = dir_pdf_total * dir_pdf_total / jnp.maximum(
            dir_pdf_total * dir_pdf_total + pdf_nee * pdf_nee, 1e-30
        )
        radiance = s["radiance"] + jnp.where(
            hit_light, throughput * le * jnp.where(fresh, 1.0, w_mis), _Z3()
        )

        depth_stop = (s["bounces"] == max_depth - 1) & (max_depth != -1)
        passthrough = alive & (~scatter) & v.valid & (v.material_id == -1) & ~depth_stop
        new_medium = jnp.where(
            passthrough, med.update_medium(v, s["d"], s["medium"]), s["medium"]
        )
        # Offset along the normal on pass-through (reference: :1486-1487).
        pass_dir = jnp.where(
            gm.dot(s["d"], v.geom_normal) > 0, v.geom_normal, -v.geom_normal
        )

        do_scatter = alive & scatter & ~depth_stop
        sigma_s = med.get_sigma_s(scene, static, s["medium"], new_org)
        nee = _nee_vol_final(
            scene, static, key, b, new_org, -s["d"], s["medium"], s["bounces"]
        )
        radiance = radiance + jnp.where(do_scatter, throughput * sigma_s * nee, _Z3())
        uv_p = rng.uniform(key, b, rng.SLOT_PHASE_UV, (2,))
        new_dir = med.phase_sample(scene, static, s["medium"], -s["d"], uv_p)
        rho = med.phase_eval(scene, static, s["medium"], -s["d"], new_dir)
        pdf_p = med.phase_pdf(scene, static, s["medium"], -s["d"], new_dir)
        thr_scatter = throughput * (rho / jnp.maximum(pdf_p, 1e-30)) * sigma_s

        do_surface = alive & ~scatter & v.valid & (v.material_id >= 0) & ~depth_stop
        params = mat.gather_params(scene, static, v)
        nee_s = _nee_vol_final(
            scene, static, key, b, v.position, -s["d"], s["medium"],
            s["bounces"], surface=(params, v, used),
        )
        radiance = radiance + jnp.where(do_surface, throughput * nee_s, _Z3())
        uv_b = rng.uniform(key, b, rng.SLOT_BSDF_UV, (2,))
        w_b = rng.uniform(key, b, rng.SLOT_BSDF_W)
        samp = mat.sample_bsdf(params, -s["d"], v, uv_b, w_b, used)
        f = mat.eval_bsdf(params, -s["d"], samp.dir_out, v, used)
        p2 = mat.pdf_bsdf(params, -s["d"], samp.dir_out, v, used)
        surf_ok = samp.valid & (p2 > 0)
        thr_surface = throughput * f / jnp.maximum(p2, 1e-30)
        refract_medium = med.update_medium(v, s["d"], s["medium"])
        new_medium = jnp.where(
            do_surface & surf_ok & (samp.eta != 0), refract_medium, new_medium
        )

        throughput = jnp.where(
            do_scatter, thr_scatter,
            jnp.where(do_surface & surf_ok, thr_surface, throughput),
        )
        new_d = jnp.where(
            do_scatter, new_dir,
            jnp.where(do_surface & surf_ok, samp.dir_out, s["d"]),
        )
        new_org = jnp.where(
            do_scatter | (do_surface & surf_ok),
            new_org + new_d * static.intersection_epsilon,
            jnp.where(passthrough, new_org + pass_dir * static.intersection_epsilon, new_org),
        )
        dir_pdf = jnp.where(
            do_scatter, pdf_p, jnp.where(do_surface & surf_ok, p2, s["dir_pdf"])
        )
        nee_cache = jnp.where(
            do_scatter | do_surface, new_org, s["nee_cache"]
        )
        reset = do_scatter | (do_surface & surf_ok)
        mtp = jnp.where(reset, jnp.ones(3, REAL), multi_trans_pdf)
        mtn = jnp.where(reset, jnp.ones(3, REAL), multi_trans_nee)
        never_scatter = s["never_scatter"] & ~do_scatter
        never_surface = s["never_surface"] & ~(do_surface & surf_ok)

        active = alive & ~depth_stop & (
            do_scatter | passthrough | (do_surface & surf_ok)
        )
        do_rr = active & (s["bounces"] >= static.options.rr_depth) & ~passthrough
        rr_prob = jnp.where(do_rr, jnp.minimum(jnp.max(throughput), 0.95), 1.0)
        u_rr = rng.uniform(key, b, rng.SLOT_RR)
        killed = do_rr & (u_rr > rr_prob)
        throughput = jnp.where(do_rr & ~killed, throughput / rr_prob, throughput)
        active &= ~killed

        return dict(
            org=new_org, d=new_d, medium=new_medium, throughput=throughput,
            radiance=radiance,
            bounces=s["bounces"] + jnp.where(active, 1, 0),
            iters=s["iters"] + 1,
            dir_pdf=dir_pdf, nee_cache=nee_cache,
            multi_trans_pdf=mtp, multi_trans_nee=mtn,
            never_scatter=never_scatter, never_surface=never_surface,
            active=s["active"] & active,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["radiance"]


_VERSIONS = {
    1: trace_volpath_1,
    2: trace_volpath_2,
    3: trace_volpath_3,
    4: trace_volpath_4,
    5: trace_volpath_5,
    6: trace_volpath_final,
    0: trace_volpath_final,
}


def trace_fn(static: SceneStatic):
    """Select the integrator rung (reference: src/render.cpp:127-140)."""
    return _VERSIONS[static.options.vol_path_version]
