"""Batched (SoA) volumetric path tracing — performance twin of the final
rung of integrators/volpath.py (chromatic heterogeneous null scattering,
reference: src/vol_path_tracing.h:1085-1618).

Only the production version (vol_path_version 6 / 0) gets the SoA
treatment; the educational rungs 1-5 stay per-ray (they exist to mirror
the reference's test ladder, not to be fast). Cross-validated against the
per-ray implementation in tests/test_volpath.py.

Loop nesting mirrors the per-ray program: an outer bounce loop, a
delta-tracking free-flight loop, and a two-level shadow march (segments
across null surfaces x null collisions inside a segment) — all
``lax.while_loop``s over (N,) component arrays with f32 masks.
"""

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.accel import traverse_soa as trs
from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.core.soa import V3
from gdpt_tpu.ops import materials_soa as msoa
from gdpt_tpu.ops import media_soa as meds
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.scene.build import Scene

HARD_CAP = 64
MAX_SHADOW_SEGMENTS = 16

# Per-bounce RNG slots (shared stride with path_soa's counters).
_C_LIGHT_UV = 1
_C_LIGHT_W = 2
_C_BSDF_UV = 3
_C_BSDF_W = 4
_C_CHANNEL = 5
_C_PHASE_UV = 6
_C_RR = 7
# Loop-uniform counter blocks (disjoint from the per-bounce block).
_BLK_FLIGHT = 0x40000000
_BLK_NEE_CH = 0x50000000
_BLK_NEE_IT = 0x60000000


def supports_soa_volpath(scene: Scene) -> bool:
    return (
        scene.static.options.vol_path_version in (0, 6)
        and msoa.supports_soa_materials(scene)
    )


def _avg(v: V3):
    return (v.x + v.y + v.z) * (1.0 / 3.0)


def _chan(v: V3, channel):
    return jnp.where(channel == 0, v.x, jnp.where(channel == 1, v.y, v.z))


def _loop_cap(static):
    md = static.options.max_depth
    return HARD_CAP if md < 0 else min(md, HARD_CAP)


def _vol_bounce(static, sc: ps.SceneSoA, media, seed, s):
    """One volumetric bounce over a lane dict with PER-LANE bounce
    indices (s["it"]) and per-lane (pixel, sample) RNG identity — shared
    verbatim by the banded loop (lanes in lockstep) and the wavefront
    pool (lanes at mixed depths). RNG streams depend only on
    (pixel, sample, bounce, slot), so both drivers are estimator-
    identical (reference hot loop: src/vol_path_tracing.h:1309-1614)."""
    used = static.used_material_kinds
    max_depth = static.options.max_depth
    max_null = static.options.max_null_collisions
    cap = _loop_cap(static)
    n = s["active"].shape[0]
    zero = jnp.zeros(n, REAL)
    zero3 = V3(zero, zero, zero)
    one = jnp.ones(n, REAL)
    one3 = V3(one, one, one)
    eps = static.shadow_epsilon
    eps_isect = static.intersection_epsilon
    pixel = s["pixel"]
    sample = s["sample"]

    def uni2(counter):
        # Loop-block counters (_BLK_*) can run past any fixed per-sample
        # stride in deep volumetric paths; the sample index rides its own
        # RNG input word instead, so the counter space never aliases
        # across samples.
        return soa.uniform2(seed, pixel, jnp.asarray(counter, jnp.uint32),
                            sample)

    def bounce_uni2(b, slot):
        return uni2(b * ps._CTR_STRIDE + slot)

    def free_flight(b, org, d, medium, t_hit):
        """Delta tracking (reference: src/vol_path_tracing.h:1334-1403).
        Returns (scatter, travel_t, trans, p_dir, p_nee)."""
        sigma_m = meds.get_majorant_soa(media, static, medium, org, d)
        u_ch, _ = bounce_uni2(b, _C_CHANNEL)
        channel = jnp.clip((u_ch * 3.0).astype(INT), 0, 2)

        state = dict(
            accum_t=zero,
            it=jnp.asarray(0, INT),
            scatter=zero,
            trans=one3,
            p_dir=one3,
            p_nee=one3,
            alive=(_chan(sigma_m, channel) > 0).astype(REAL),
        )

        def cond(s):
            return (jnp.max(s["alive"]) > 0) & (s["it"] < max_null)

        def body(s):
            alive = s["alive"] > 0
            u, u2 = uni2(_BLK_FLIGHT + b * 2048 + s["it"])
            sig_ch = jnp.maximum(_chan(sigma_m, channel), 1e-20)
            t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sig_ch
            dt = t_hit - s["accum_t"]
            accum_t = jnp.minimum(s["accum_t"] + t, t_hit)
            reach = t >= dt
            max_m = jnp.maximum(soa.vmax(sigma_m), 1e-20)

            def dk(base, tt):
                return V3(base.x * jnp.exp(-sigma_m.x * tt),
                          base.y * jnp.exp(-sigma_m.y * tt),
                          base.z * jnp.exp(-sigma_m.z * tt))

            trans_srf = dk(s["trans"], dt)
            pdir_srf = dk(s["p_dir"], dt)
            pnee_srf = dk(s["p_nee"], dt)

            point = org + d * accum_t
            sigma_t = meds.get_sigma_a_soa(media, static, medium, point) + \
                meds.get_sigma_s_soa(media, static, medium, point)
            real_prob = V3(
                sigma_t.x / jnp.maximum(sigma_m.x, 1e-20),
                sigma_t.y / jnp.maximum(sigma_m.y, 1e-20),
                sigma_t.z / jnp.maximum(sigma_m.z, 1e-20),
            )
            is_real = u2 < _chan(real_prob, channel)
            inv_max = 1.0 / max_m
            trans_real = dk(s["trans"], t) * inv_max
            pdir_real = dk(s["p_dir"], t) * sigma_m * real_prob * inv_max
            trans_null = dk(s["trans"], t) * (sigma_m - sigma_t) * inv_max
            pdir_null = dk(s["p_dir"], t) * sigma_m * (
                V3(1.0 - real_prob.x, 1.0 - real_prob.y, 1.0 - real_prob.z)
            ) * inv_max
            pnee_null = dk(s["p_nee"], t) * sigma_m * inv_max

            trans = soa.where(reach, trans_srf, soa.where(is_real, trans_real, trans_null))
            p_dir = soa.where(reach, pdir_srf, soa.where(is_real, pdir_real, pdir_null))
            p_nee = soa.where(reach, pnee_srf, soa.where(is_real, s["p_nee"], pnee_null))
            scatter_now = (~reach) & is_real
            return dict(
                accum_t=jnp.where(alive, accum_t, s["accum_t"]),
                it=s["it"] + 1,
                scatter=jnp.maximum(s["scatter"], (alive & scatter_now).astype(REAL)),
                trans=soa.where(alive, trans, s["trans"]),
                p_dir=soa.where(alive, p_dir, s["p_dir"]),
                p_nee=soa.where(alive, p_nee, s["p_nee"]),
                alive=(alive & ~reach & ~scatter_now).astype(REAL),
            )

        out = jax.lax.while_loop(cond, body, state)
        no_medium = soa.vmax(sigma_m) <= 0
        scattered = (out["scatter"] > 0) & ~no_medium
        return (
            scattered,
            jnp.where(out["scatter"] > 0, out["accum_t"], t_hit),
            soa.where(no_medium, one3, out["trans"]),
            soa.where(no_medium, one3, out["p_dir"]),
            soa.where(no_medium, one3, out["p_nee"]),
        )

    def nee_vol(b, p0, og_dir, medium, bounces, do_mask, surface=None):
        """NEE with ratio-tracked transmittance
        (reference: src/vol_path_tracing.h:1085-1279)."""
        lu0, lu1 = bounce_uni2(b, _C_LIGHT_UV)
        lw, lsw = bounce_uni2(b, _C_LIGHT_W)
        light_id, p_l, n_l, pdf_pt, is_env = ps.sample_light_point(
            static, sc, p0, lu0, lu1, lw, lsw
        )
        pdf_nee_pt = soa.take(sc.light_pmf, light_id) * pdf_pt
        to_l = p_l - p0
        dist_full = jnp.maximum(soa.length(to_l), 1e-20)
        dir_light = to_l * (1.0 / dist_full)

        # Zero-contribution skip (estimator-identical): a zero phase/
        # BSDF factor, backfacing/zero emission, or zero light pdf make
        # the NEE term zero regardless of transmittance, so those lanes
        # skip the two-level shadow march entirely (the contribution is
        # selected to exactly zero below either way).
        g_pre = jnp.maximum(-soa.dot(dir_light, n_l), 0.0)
        le_pre = soa.where(
            soa.dot(n_l, -1.0 * dir_light) > 0,
            soa.gather(sc.light_intensity, light_id),
            zero3,
        )
        if surface is None:
            rho_pre = meds.phase_eval_soa(media, static, medium, og_dir,
                                          dir_light)
            rho_max = rho_pre
        else:
            params_pre, v_pre = surface
            rho_max = soa.vmax(msoa.eval_bsdf_soa(
                params_pre, og_dir, dir_light, v_pre.gn, v_pre.frame, used))
        do_mask = (do_mask & (pdf_nee_pt > 0) & (g_pre > 0)
                   & (soa.vmax(le_pre) > 0) & (rho_max > 0))

        state = dict(
            p=p0,
            t_light=one3,
            p_nee=one3,
            p_dir=one3,
            shadow_medium=medium,
            shadow_bounces=jnp.zeros(n, INT),
            alive=do_mask.astype(REAL),
            blocked=zero,
            seg=jnp.asarray(0, INT),
        )

        def cond(s):
            return (jnp.max(s["alive"]) > 0) & (s["seg"] < MAX_SHADOW_SEGMENTS)

        def body(s):
            alive0 = s["alive"] > 0
            dist_left = soa.length(p_l - s["p"])
            sv_hit, sv_gn = trs.intersect_soa_gn(
                static, sc.geom, s["p"], dir_light, eps,
                jnp.where(alive0, BIG, -1.0)
            )
            sv = ps.shade_hit(static, sc, s["p"], dir_light, sv_hit, sv_gn)
            in_range = sv_hit.t < (1.0 - eps) * dist_left
            sv_valid = (sv.valid > 0) & in_range
            next_t = jnp.where(
                sv_valid, soa.length(sv.position - s["p"]), dist_left
            )
            in_med = s["shadow_medium"] >= 0

            sigma_m = meds.get_majorant_soa(
                media, static, s["shadow_medium"], s["p"], dir_light
            )
            u_ch, _ = uni2(_BLK_NEE_CH + b * 64 + s["seg"])
            channel = jnp.clip((u_ch * 3.0).astype(INT), 0, 2)

            inner = dict(
                accum_t=zero,
                it=jnp.asarray(0, INT),
                p=s["p"],
                t_light=s["t_light"],
                p_nee=s["p_nee"],
                p_dir=s["p_dir"],
                alive=(alive0 & in_med & (_chan(sigma_m, channel) > 0)).astype(REAL),
            )

            def icond(i):
                return (jnp.max(i["alive"]) > 0) & (i["it"] < max_null)

            def ibody(i):
                ialive = i["alive"] > 0
                u, _ = uni2(_BLK_NEE_IT + (b * 16 + s["seg"]) * 2048 + i["it"])
                sig_ch = jnp.maximum(_chan(sigma_m, channel), 1e-20)
                t = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sig_ch
                dt = next_t - i["accum_t"]
                accum_t = jnp.minimum(i["accum_t"] + t, next_t)
                reach = t >= dt
                max_m = jnp.maximum(soa.vmax(sigma_m), 1e-20)
                new_p_in = i["p"] + dir_light * t
                sigma_t = meds.get_sigma_a_soa(
                    media, static, s["shadow_medium"], new_p_in
                ) + meds.get_sigma_s_soa(media, static, s["shadow_medium"], new_p_in)

                def dk(base, tt):
                    return V3(base.x * jnp.exp(-sigma_m.x * tt),
                              base.y * jnp.exp(-sigma_m.y * tt),
                              base.z * jnp.exp(-sigma_m.z * tt))

                real_prob = V3(
                    sigma_t.x / jnp.maximum(sigma_m.x, 1e-20),
                    sigma_t.y / jnp.maximum(sigma_m.y, 1e-20),
                    sigma_t.z / jnp.maximum(sigma_m.z, 1e-20),
                )
                inv_max = 1.0 / max_m
                tl_in = dk(i["t_light"], t) * (sigma_m - sigma_t) * inv_max
                pn_in = dk(i["p_nee"], t) * sigma_m * inv_max
                pd_in = dk(i["p_dir"], t) * sigma_m * (
                    V3(1.0 - real_prob.x, 1.0 - real_prob.y, 1.0 - real_prob.z)
                ) * inv_max
                tl_srf = dk(i["t_light"], dt)
                pn_srf = dk(i["p_nee"], dt)
                pd_srf = dk(i["p_dir"], dt)
                t_light = soa.where(reach, tl_srf, tl_in)
                p_nee = soa.where(reach, pn_srf, pn_in)
                p_dir = soa.where(reach, pd_srf, pd_in)
                p_new = soa.where(reach, i["p"] + dir_light * dt, new_p_in)
                dead = soa.vmax(t_light) <= 0
                return dict(
                    accum_t=jnp.where(ialive, accum_t, i["accum_t"]),
                    it=i["it"] + 1,
                    p=soa.where(ialive, p_new, i["p"]),
                    t_light=soa.where(ialive, t_light, i["t_light"]),
                    p_nee=soa.where(ialive, p_nee, i["p_nee"]),
                    p_dir=soa.where(ialive, p_dir, i["p_dir"]),
                    alive=(ialive & ~reach & ~dead).astype(REAL),
                )

            iout = jax.lax.while_loop(icond, ibody, inner)
            upd = alive0 & in_med
            t_light = soa.where(upd, iout["t_light"], s["t_light"])
            p_nee = soa.where(upd, iout["p_nee"], s["p_nee"])
            p_dir = soa.where(upd, iout["p_dir"], s["p_dir"])

            clear = ~sv_valid
            hit_solid = sv_valid & (sv.material_id >= 0)
            sb = s["shadow_bounces"] + jnp.where(alive0, 1, 0)
            depth_kill = (max_depth != -1) & ((bounces + sb + 1) >= max_depth)
            blocked_now = hit_solid | (sv_valid & ~hit_solid & depth_kill)
            blocked = jnp.maximum(
                s["blocked"], (alive0 & blocked_now).astype(REAL)
            )
            alive = alive0 & ~clear & ~blocked_now
            int_med = soa.take(sc.shape_interior_medium, sv.shape_id)
            ext_med = soa.take(sc.shape_exterior_medium, sv.shape_id)
            new_medium = jnp.where(
                alive,
                meds.update_medium_soa(int_med, ext_med, dir_light, sv.gn,
                                       s["shadow_medium"]),
                s["shadow_medium"],
            )
            return dict(
                p=soa.where(alive, sv.position, s["p"]),
                t_light=t_light,
                p_nee=p_nee,
                p_dir=p_dir,
                shadow_medium=new_medium,
                shadow_bounces=sb,
                alive=alive.astype(REAL),
                blocked=blocked,
                seg=s["seg"] + 1,
            )

        out = jax.lax.while_loop(cond, body, state)
        visible = (out["blocked"] <= 0) & (soa.vmax(out["t_light"]) > 0)

        pdf_nee = pdf_nee_pt * _avg(out["p_nee"])
        g = jnp.maximum(-soa.dot(dir_light, n_l), 0.0) / (dist_full * dist_full)
        le = soa.where(
            soa.dot(n_l, -1.0 * dir_light) > 0,
            soa.gather(sc.light_intensity, light_id),
            zero3,
        )
        if surface is None:
            rho_s = meds.phase_eval_soa(media, static, medium, og_dir, dir_light)
            rho = V3(rho_s, rho_s, rho_s)
            pdf_dir = meds.phase_pdf_soa(
                media, static, medium, og_dir, dir_light
            ) * g * _avg(out["p_dir"])
        else:
            params, v = surface
            rho = msoa.eval_bsdf_soa(params, og_dir, dir_light, v.gn, v.frame, used)
            pdf_dir = msoa.pdf_bsdf_soa(
                params, og_dir, dir_light, v.gn, v.frame, used
            ) * g * _avg(out["p_dir"])
        contrib = out["t_light"] * le * (g / jnp.maximum(pdf_nee, 1e-30)) * rho
        w = pdf_nee * pdf_nee / jnp.maximum(
            pdf_nee * pdf_nee + pdf_dir * pdf_dir, 1e-30
        )
        ok = visible & (pdf_nee > 0) & do_mask
        # Second output: per-lane traced-shadow-ray mask, keeping ray
        # counts exact under the zero-contribution skip.
        return soa.where(ok, contrib * w, zero3), do_mask.astype(REAL)

    def body(s):
        b = s["it"] + 1
        active = s["active"] > 0
        # Inactive lanes become dead rays (tfar < tnear): traversal
        # backends exit them immediately instead of tracing stale rays.
        pool_sorted = _os.environ.get("GDPT_POOL_SORT", "0") == "1"
        hit, gn_raw = trs.intersect_soa_gn(
            static, sc.geom, s["org"], s["d"], 0.0,
            jnp.where(active, BIG, -1.0), sort_rays=not pool_sorted)
        v = ps.shade_hit(static, sc, s["org"], s["d"], hit, gn_raw)
        v_ok = v.valid > 0
        in_medium = s["medium"] >= 0
        t_hit = jnp.where(v_ok, soa.length(v.position - s["org"]), BIG)
        rays = s["rays"] + jnp.sum(jnp.where(active, 1.0, 0.0))

        scatter, travel_t, trans, p_dir, p_nee = free_flight(
            b, s["org"], s["d"], s["medium"], t_hit
        )
        scatter = scatter & in_medium
        trans = soa.where(in_medium, trans, one3)
        p_dir = soa.where(in_medium, p_dir, one3)
        p_nee = soa.where(in_medium, p_nee, one3)

        alive = (in_medium | v_ok) & active
        new_org = soa.where(
            scatter,
            s["org"] + s["d"] * travel_t,
            soa.where(v_ok, v.position, s["org"]),
        )
        throughput = s["throughput"] * trans * (1.0 / jnp.maximum(_avg(p_dir), 1e-30))
        multi_trans_pdf = s["multi_trans_pdf"] * p_dir
        multi_trans_nee = s["multi_trans_nee"] * p_nee

        hit_light = alive & ~scatter & v_ok & (v.light_id >= 0)
        le = ps.emission(sc, v, -1.0 * s["d"])
        fresh = (s["never_scatter"] > 0) & (s["never_surface"] > 0)
        dist2c = soa.length_squared(v.position - s["nee_cache"])
        p1c = ps.hit_light_pdf_soa(static, sc, s["nee_cache"], v, s["d"], dist2c)
        pdf_nee = p1c * _avg(multi_trans_nee)
        diff = v.position - s["nee_cache"]
        ndist = jnp.maximum(soa.length(diff), 1e-20)
        omega = diff * (1.0 / ndist)
        g = jnp.maximum(-soa.dot(omega, v.gn), 0.0) / (ndist * ndist)
        dir_pdf_total = s["dir_pdf"] * _avg(multi_trans_pdf) * g
        w_mis = dir_pdf_total * dir_pdf_total / jnp.maximum(
            dir_pdf_total * dir_pdf_total + pdf_nee * pdf_nee, 1e-30
        )
        radiance = s["radiance"] + soa.where(
            hit_light, throughput * le * jnp.where(fresh, 1.0, w_mis), zero3
        )

        depth_stop = (s["bounces"] == max_depth - 1) & (max_depth != -1)
        passthrough = alive & (~scatter) & v_ok & (v.material_id == -1) & ~depth_stop
        int_med = soa.take(sc.shape_interior_medium, v.shape_id)
        ext_med = soa.take(sc.shape_exterior_medium, v.shape_id)
        new_medium = jnp.where(
            passthrough,
            meds.update_medium_soa(int_med, ext_med, s["d"], v.gn, s["medium"]),
            s["medium"],
        )
        pass_dir = soa.where(soa.dot(s["d"], v.gn) > 0, v.gn, -1.0 * v.gn)

        do_scatter = alive & scatter & ~depth_stop
        sigma_s = meds.get_sigma_s_soa(media, static, s["medium"], new_org)
        if static.n_lights > 0:
            nee, shadow_m1 = nee_vol(b, new_org, -1.0 * s["d"], s["medium"],
                                     s["bounces"], do_scatter)
            radiance = radiance + soa.where(
                do_scatter, throughput * sigma_s * nee, zero3
            )
        pu0, pu1 = bounce_uni2(b, _C_PHASE_UV)
        new_dir = meds.phase_sample_soa(media, static, s["medium"], -1.0 * s["d"],
                                        pu0, pu1)
        rho = meds.phase_eval_soa(media, static, s["medium"], -1.0 * s["d"], new_dir)
        pdf_p = meds.phase_pdf_soa(media, static, s["medium"], -1.0 * s["d"], new_dir)
        thr_scatter = throughput * (rho / jnp.maximum(pdf_p, 1e-30)) * sigma_s

        do_surface = alive & ~scatter & v_ok & (v.material_id >= 0) & ~depth_stop
        params = msoa.gather_params_soa(
            sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
            static.spec_image_slots,
            float_tex_slots=static.float_tex_slots,
        )
        if static.n_lights > 0:
            nee_s, shadow_m2 = nee_vol(b, v.position, -1.0 * s["d"],
                                       s["medium"], s["bounces"], do_surface,
                                       surface=(params, v))
            radiance = radiance + soa.where(do_surface, throughput * nee_s,
                                            zero3)
            rays = rays + jnp.sum(shadow_m1) + jnp.sum(shadow_m2)
        bu0, bu1 = bounce_uni2(b, _C_BSDF_UV)
        w_lobe, _ = bounce_uni2(b, _C_BSDF_W)
        samp = msoa.sample_bsdf_soa(params, -1.0 * s["d"], v.gn, v.frame,
                                    bu0, bu1, w_lobe, used)
        f = msoa.eval_bsdf_soa(params, -1.0 * s["d"], samp.dir_out, v.gn,
                               v.frame, used)
        p2 = msoa.pdf_bsdf_soa(params, -1.0 * s["d"], samp.dir_out, v.gn,
                               v.frame, used)
        surf_ok = (samp.valid > 0) & (p2 > 0)
        thr_surface = throughput * f * (1.0 / jnp.maximum(p2, 1e-30))
        refract_medium = meds.update_medium_soa(int_med, ext_med, s["d"], v.gn,
                                                s["medium"])
        new_medium = jnp.where(
            do_surface & surf_ok & (samp.eta != 0), refract_medium, new_medium
        )

        throughput = soa.where(
            do_scatter, thr_scatter,
            soa.where(do_surface & surf_ok, thr_surface, throughput),
        )
        new_d = soa.where(
            do_scatter, new_dir,
            soa.where(do_surface & surf_ok, samp.dir_out, s["d"]),
        )
        moved = do_scatter | (do_surface & surf_ok)
        new_org = soa.where(
            moved,
            new_org + new_d * eps_isect,
            soa.where(passthrough, new_org + pass_dir * eps_isect, new_org),
        )
        dir_pdf = jnp.where(
            do_scatter, pdf_p, jnp.where(do_surface & surf_ok, p2, s["dir_pdf"])
        )
        nee_cache = soa.where(do_scatter | do_surface, new_org, s["nee_cache"])
        mtp = soa.where(moved, one3, multi_trans_pdf)
        mtn = soa.where(moved, one3, multi_trans_nee)
        never_scatter = jnp.where(do_scatter, 0.0, s["never_scatter"])
        never_surface = jnp.where(do_surface & surf_ok, 0.0, s["never_surface"])

        # Per-lane iteration cap: a lane may execute at most cap+1
        # bounce bodies (the banded loop's former scalar-iters stop,
        # now per-lane so pooled lanes at mixed depths each get the
        # same budget).
        active_next = alive & ~depth_stop & (moved | passthrough)
        active_next = active_next & (s["it"] + 1 < cap + 1)
        do_rr = active_next & (s["bounces"] >= static.options.rr_depth) & ~passthrough
        rr_prob = jnp.where(do_rr, jnp.minimum(soa.vmax(throughput), 0.95), 1.0)
        _, u_rr = bounce_uni2(b, _C_RR)
        killed = do_rr & (u_rr > rr_prob)
        throughput = soa.where(
            do_rr & ~killed, throughput * (1.0 / rr_prob), throughput
        )
        active_next = active_next & ~killed

        upd = active  # only lanes that entered this iteration advance
        return dict(
            pixel=pixel,
            sample=sample,
            org=soa.where(upd, new_org, s["org"]),
            d=soa.where(upd, new_d, s["d"]),
            medium=jnp.where(upd, new_medium, s["medium"]),
            throughput=soa.where(upd, throughput, s["throughput"]),
            radiance=radiance,
            bounces=s["bounces"] + jnp.where(upd & active_next, 1, 0),
            it=s["it"] + jnp.where(upd, 1, 0),
            dir_pdf=jnp.where(upd, dir_pdf, s["dir_pdf"]),
            nee_cache=soa.where(upd, nee_cache, s["nee_cache"]),
            multi_trans_pdf=soa.where(upd, mtp, s["multi_trans_pdf"]),
            multi_trans_nee=soa.where(upd, mtn, s["multi_trans_nee"]),
            never_scatter=jnp.where(upd, never_scatter, s["never_scatter"]),
            never_surface=jnp.where(upd, never_surface, s["never_surface"]),
            active=(active & active_next).astype(REAL),
            rays=rays,
        )

    return body(s)


def _init_vol_lanes(static, camera, pixel, sample, seed):
    """Fresh per-lane volumetric path state for (pixel, sample) items;
    RNG identical to the banded driver's primary setup (bounce-0
    _CTR_PIXEL counter)."""
    n = pixel.shape[0]
    zero = jnp.zeros(n, REAL)
    zero3 = V3(zero, zero, zero)
    one = jnp.ones(n, REAL)
    one3 = V3(one, one, one)
    xs = (pixel % jnp.uint32(static.width)).astype(REAL)
    ys = (pixel // jnp.uint32(static.width)).astype(REAL)
    u0, u1 = soa.uniform2(seed, pixel, jnp.uint32(ps._CTR_PIXEL), sample)
    org0, d0 = ps.primary_rays_soa(static, camera, xs, ys, u0, u1)
    return dict(
        pixel=pixel,
        sample=sample,
        org=org0, d=d0,
        medium=jnp.full(n, static.camera_medium_id, INT),
        throughput=one3,
        radiance=zero3,
        bounces=jnp.zeros(n, INT),
        it=jnp.zeros(n, INT),
        dir_pdf=zero,
        nee_cache=zero3,
        multi_trans_pdf=one3,
        multi_trans_nee=one3,
        never_scatter=one,
        never_surface=one,
        active=one,
    )


def trace_volpath_soa(static, camera, sc: ps.SceneSoA, media,
                      ray_idx, seed, sample0):
    """One volumetric path sample per lane; returns (radiance V3, rays).

    Banded driver: all lanes start at bounce 0 in lockstep and the pool
    runs until every lane dies (per-lane iteration caps bound the
    loop). Pixel coordinates derive from ray_idx (the linear pixel
    index) inside _init_vol_lanes."""
    n = ray_idx.shape[0]
    cap = _loop_cap(static)
    sample = jnp.broadcast_to(jnp.asarray(sample0, jnp.uint32), (n,))
    state = _init_vol_lanes(static, camera, ray_idx, sample, seed)
    state["rays"] = jnp.full((), 1.0 * n, REAL)
    state["giter"] = jnp.asarray(0, INT)

    def cond(s):
        return (jnp.max(s["active"]) > 0) & (s["giter"] < cap + 1)

    def body(s):
        s = dict(s)
        g = s.pop("giter")
        out = _vol_bounce(static, sc, media, seed, s)
        out["giter"] = g + 1
        return out

    out = jax.lax.while_loop(cond, body, state)
    return out["radiance"], out["rays"]


def _vol_wavefront_body(static, camera, sc, media, st):
    """One wavefront iteration: harvest finished lanes into the
    per-pixel accumulator, refill them with the next (pixel, sample)
    work items, then run the shared volumetric bounce.

    The banded loop pays full-width free-flight/shadow-march/material
    cost per drain iteration while live lanes decay under RR and depth
    kills — exactly where dead lanes accumulate in heterogeneous scenes
    (reference inner loop: src/vol_path_tracing.h:1343-1403). The pool
    keeps ~every lane on useful work (same harvest/refill pattern as
    gdpt_soa._gdpt_wavefront_accum)."""
    s = st["lane"]
    n_pix = static.width * static.height
    dead = s["active"] <= 0
    pending = st["pending"] > 0
    harvest = dead & pending

    r = s["radiance"]
    upd = jnp.stack([jnp.where(harvest, c, 0.0)
                     for c in (r.x, r.y, r.z)], axis=1)
    acc = st["acc"].at[s["pixel"].astype(INT)].add(upd)

    pah = pending & ~harvest
    P = s["active"].shape[0]
    n_dead = jnp.sum(dead.astype(jnp.uint32))
    # Quarter-pool refill gate: the refill's primary-ray regeneration is
    # a full-width cost whether 1 lane or 100k lanes issue, so it
    # amortizes over >= P/4 fresh paths per trigger.
    do_refill = (n_dead * 4 >= P) & (st["next_item"] < st["total"])

    def refill(op):
        s, pah = op
        rank = jnp.cumsum(dead.astype(jnp.uint32)) - 1
        item = st["next_item"] + jnp.where(dead, rank, 0)
        # item >= next_item also rejects uint32 wraparound of
        # next_item + rank for totals just below 2^32 (a wrapped item
        # would alias an early (pixel, sample) and drop the true tail).
        issue = dead & (item < st["total"]) & (item >= st["next_item"])
        new_pixel = jnp.where(issue, item % jnp.uint32(n_pix), s["pixel"])
        new_sample = jnp.where(issue, item // jnp.uint32(n_pix), s["sample"])
        fresh = _init_vol_lanes(static, camera, new_pixel, new_sample,
                                st["seed"])
        # Banded ray-count convention: primaries counted at lane init.
        rays = s["rays"] + jnp.sum(jnp.where(issue, 1.0, 0.0))
        keep = {k: s[k] for k in fresh}
        lane = jax.tree_util.tree_map(
            lambda f, o: soa.where(issue, f, o) if isinstance(f, V3)
            else jnp.where(issue, f, o), fresh, keep,
            is_leaf=lambda x: isinstance(x, V3))
        lane["rays"] = rays
        return (lane, (issue | pah).astype(REAL),
                st["next_item"] + jnp.sum(issue.astype(jnp.uint32)))

    def skip(op):
        s, pah = op
        return dict(s), pah.astype(REAL), st["next_item"]

    lane, pending2, next_item = jax.lax.cond(do_refill, refill, skip,
                                             (s, pah))
    lane = _vol_bounce(static, sc, media, st["seed"], lane)
    return dict(
        lane=lane,
        acc=acc,
        pending=pending2,
        next_item=next_item,
        total=st["total"],
        seed=st["seed"],
        occ_sum=st["occ_sum"] + jnp.mean(jnp.where(
            lane["active"] > 0, 1.0, 0.0)),
        iters=st["iters"] + 1.0,
    )


@partial(jax.jit, donate_argnums=(0,))
def _vol_pool_sort(st, tab):
    """Morton-permute the volumetric lane pool (see
    path_soa._pool_sort); pending permutes with the lanes."""
    from gdpt_tpu.accel import packet_trace as pt

    s = st["lane"]
    keys = pt._morton_keys(tab, s["org"], s["d"])
    keys = jnp.where(s["active"] > 0, keys, jnp.int32(2 ** 30))
    perm = jnp.argsort(keys)

    def take(a):
        return jnp.take(a, perm, axis=0)

    lane = {k: (v if k == "rays"
                else jax.tree_util.tree_map(take, v))
            for k, v in s.items()}
    out = dict(st)
    out["lane"] = lane
    out["pending"] = take(st["pending"])
    return out


@partial(jax.jit, static_argnames=("static", "k_iters"), donate_argnums=(2,))
def _vol_wavefront_chunk(static, camera, st, sc, media, k_iters):
    # sc/media ride OUTSIDE the donated state (donation would delete the
    # caller's scene buffers; see path_soa._wavefront_chunk).
    def body(i, s):
        return _vol_wavefront_body(static, camera, sc, media, s)

    return jax.lax.fori_loop(0, k_iters, body, st)


def _vol_wavefront_accum(static, camera, sc, media, spp, seed, n_pix,
                         k_iters=6):
    """Run the volumetric wavefront to completion; returns
    (acc (3, n_pix) f64 sample sums, total_rays)."""
    import os as _os

    total = n_pix * spp
    if total >= 2 ** 32:
        raise ValueError(
            f"volpath wavefront work queue: n_pix*spp = {total} >= 2^32; "
            "use the banded loop for renders this large")
    from gdpt_tpu.accel import packet_trace as pt

    # Pool quantum = one packet-kernel dispatch (PACKET_ROWS*128 lanes):
    # tiny renders (tests, thumbnails) get a right-sized pool instead of
    # paying 8x idle lanes per iteration; production pools (GDPT_*POOL,
    # default 128k lanes) are unaffected.
    lane_q = pt.PACKET_ROWS * 128
    P = int(_os.environ.get("GDPT_VOL_POOL", 1 << 17))
    P = min(P, -(-total // lane_q) * lane_q)
    P = -(-P // lane_q) * lane_q
    zeros_u = jnp.zeros(P, jnp.uint32)
    lane0 = _init_vol_lanes(static, camera, zeros_u, zeros_u,
                            jnp.asarray(seed, jnp.uint32))
    lane0["active"] = jnp.zeros(P, REAL)  # refilled from the queue
    lane0["rays"] = jnp.asarray(0.0, REAL)
    st = dict(
        lane=lane0,
        acc=jnp.zeros((n_pix, 3), REAL),
        pending=jnp.zeros(P, REAL),
        next_item=jnp.asarray(0, jnp.uint32),
        total=jnp.asarray(total, jnp.uint32),
        seed=jnp.asarray(seed, jnp.uint32),
        occ_sum=jnp.asarray(0.0, REAL),
        iters=jnp.asarray(0.0, REAL),
    )
    st = jax.tree_util.tree_map(jnp.copy, st)
    # f32 device accumulator drains into host f64 every ~64 issued
    # spp-equivalents (see path_soa.render_soa_wavefront).
    host_acc = np.zeros((n_pix, 3), np.float64)
    drain_step = n_pix * 64
    last_drain = 0
    pool_sort = (_os.environ.get("GDPT_POOL_SORT", "0") == "1"
                 and sc.geom.packet is not None)
    compact = _os.environ.get("GDPT_TAIL_COMPACT", "1") == "1"
    cur_pool = P
    while True:
        if pool_sort:
            st = _vol_pool_sort(st, sc.geom.packet)
        st = _vol_wavefront_chunk(static, camera, st, sc, media, k_iters)
        ni = int(st["next_item"])
        if ni >= total:
            # Queue drained — see gdpt_soa._gdpt_shrink_pool: keep live
            # lanes and dead-but-unharvested ones (their radiance is
            # harvested at the start of the next iteration).
            keep = (st["lane"]["active"] > 0) | (st["pending"] > 0)
            n_keep = int(jnp.sum(keep))
            if n_keep == 0:
                break
            if compact:
                from gdpt_tpu.integrators import gdpt_soa as _gs

                tgt = ps._tail_bucket(n_keep, cur_pool, lane_q)
                if tgt is not None:
                    st = _gs._gdpt_shrink_pool(st, tgt, keep)
                    cur_pool = tgt
        if ni - last_drain >= drain_step:
            host_acc += np.asarray(st["acc"], np.float64)
            st["acc"] = jnp.zeros((n_pix, 3), REAL)
            last_drain = ni
    host_acc += np.asarray(st["acc"], np.float64)
    _vol_wavefront_accum.last_occupancy = float(
        st["occ_sum"]) / max(float(st["iters"]), 1.0)
    _vol_wavefront_accum.last_iters = float(st["iters"])
    return host_acc.T, float(st["lane"]["rays"])


@partial(jax.jit, static_argnames=("static", "n_samples"))
def _vol_pass(static, camera, sc, media, ray_idx, seed, sample0,
              n_samples):
    n = ray_idx.shape[0]
    zero3 = V3(*(jnp.zeros(n, REAL),) * 3)

    def one(i, carry):
        acc, rays = carry
        r, nr = trace_volpath_soa(
            static, camera, sc, media, ray_idx, seed,
            sample0 + jnp.asarray(i, jnp.uint32),
        )
        return V3(acc.x + r.x, acc.y + r.y, acc.z + r.z), rays + nr

    return jax.lax.fori_loop(0, n_samples, one, (zero3, jnp.asarray(0.0, REAL)))


def render_volpath_soa(scene: Scene, spp=None, seed=0, return_stats=False,
                       start_sample=0, init_acc=None, on_chunk=None,
                       mesh=None):
    """mesh: optional jax.sharding.Mesh with a 'rays' axis — the same
    batched loop runs with rays sharded and the scene replicated."""
    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n = w * h
    sc = ps.scene_soa_from_aos(scene)
    media = meds.media_soa(scene.device.media)
    camera = scene.device.camera
    import os as _os

    if (mesh is None and not static.use_brute_force and on_chunk is None
            and init_acc is None and not start_sample
            and n * spp < 2 ** 32
            and _os.environ.get("GDPT_WAVEFRONT", "1") != "0"):
        # BVH scenes: the wavefront pool keeps the null-collision inner
        # loop and shadow march at ~full occupancy via sample
        # regeneration instead of paying full-width drain iterations.
        # Checkpoint resume stays on the banded loop (whole-sample
        # accumulation boundaries).
        acc, total_rays = _vol_wavefront_accum(
            static, camera, sc, media, spp, seed, n)
        img = (acc / spp).T.reshape(h, w, 3).astype(np.float32)
        img = np.where(np.isfinite(img), img, 0.0)
        if return_stats:
            return img, total_rays
        return img
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as SP

        pad = (-n) % (mesh.devices.size * 128)
        shard = NamedSharding(mesh, SP("rays"))
        repl = NamedSharding(mesh, SP())
        ray_idx = jax.device_put(jnp.asarray(np.concatenate(
            [np.arange(n), np.zeros(pad)]).astype(np.uint32)), shard)
        sc = jax.device_put(sc, repl)
        media = jax.device_put(media, repl)
        camera = jax.device_put(camera, repl)
    else:
        ray_idx = jnp.arange(n, dtype=jnp.uint32)

    if static.use_brute_force:
        batch = max(1, (1 << 24) // n)
    else:
        batch = 1  # latency-bound traversal; see path_soa.render_soa
    acc = (np.zeros((3, n), np.float64) if init_acc is None
           else np.asarray(init_acc, np.float64).copy())
    total_rays = 0.0
    done = int(start_sample)
    while done < spp:
        k = min(batch, spp - done)
        out, nrays = _vol_pass(
            static, camera, sc, media, ray_idx,
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
