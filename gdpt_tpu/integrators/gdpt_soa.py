"""Batched (SoA) gradient-domain path tracing — performance twin of
integrators/gdpt.py.

Same shift-mapping spec as the per-ray implementation (which stays the
correctness oracle; tests cross-validate): base path + 4 offset paths
traced in lockstep sharing one counter-based random stream per lane,
diffuse-diffuse reconnection with the geometry-ratio Jacobian, random
-number-reuse replay with the pdf-ratio Jacobian, one-sided-difference
MIS weights, NEE+MIS primal alongside
(reference: small_gdpt.cpp:153-352, src/path_tracing.h:354-1050,
src/render.cpp:257-370).

The 4 offsets are a statically unrolled Python loop, so every op stays
an (N,) component-array op on full VPU lanes. Cost per bounce is
~5x a plain path bounce (1 base scatter + NEE shadow + 4x offset
probe/replay rays), exactly like the reference's 5-path estimator.
"""

import os as _os
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
from gdpt_tpu.ops import poisson
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.scene import model as M
from gdpt_tpu.scene.build import Scene

GDPT_MAX_DEPTH = 32  # reference: small_gdpt.cpp:15

# Offset order: x-1, x+1, y-1, y+1 (image space, y down).
_OFFSETS = ((-1.0, 0.0), (1.0, 0.0), (0.0, -1.0), (0.0, 1.0))


class GdptSampleSoA(NamedTuple):
    primal: V3      # NEE+MIS estimate (the Poisson data term)
    primal_bf: V3   # BF emitter-hit estimate (noise-matched to gradients)
    gx_here: V3     # estimate of u[x] - u[x-1] stored at x
    gx_next: V3     # estimate of u[x+1] - u[x] stored at x
    gy_here: V3
    gy_next: V3


def supports_soa_gdpt(scene: Scene) -> bool:
    """Same material/texture envelope as the path fast path."""
    return msoa.supports_soa_materials(scene)


def _is_lambertian(sc, static, material_id):
    if M.MAT_LAMBERTIAN not in static.used_material_kinds:
        return jnp.zeros_like(material_id, bool)
    mid = jnp.maximum(material_id, 0)
    return (material_id >= 0) & (soa.take(sc.mat_tables.kind, mid)
                                 == M.MAT_LAMBERTIAN)


def _geom_term(p0: V3, n0: V3, p1: V3, n1: V3):
    """|cos0 cos1| / dist^2 (reference: small_gdpt.cpp:255-267)."""
    d = p1 - p0
    d2 = jnp.maximum(soa.length_squared(d), 1e-20)
    dn = d * (1.0 / jnp.sqrt(d2))
    return jnp.abs(soa.dot(dn, n1)) * jnp.abs(soa.dot(dn, n0)) / d2


# sign -1: gradient stored as (base - offset); +1: (offset - base).
_SIGNS = (-1.0, 1.0, -1.0, 1.0)


def _init_gdpt_lanes(static, camera, sc: ps.SceneSoA, pixel, sample, seed,
                     live):
    """Fresh per-lane GDPT state for (pixel, sample) work items.

    live: bool mask — non-issued lanes get dead primary rays
    (tfar < tnear) so they cost nothing in traversal and come back
    inactive. The 5 primaries (base + 4 offsets) ride ONE batched
    5n-lane traversal + shade (the unrolled 5x n-lane calls made the
    program large and paid 5 dispatch latencies)."""
    n = pixel.shape[0]
    zero = jnp.zeros(n, REAL)
    zero3 = V3(zero, zero, zero)
    one = jnp.ones(n, REAL)
    one3 = V3(one, one, one)
    xs = (pixel % jnp.uint32(static.width)).astype(REAL)
    ys = (pixel // jnp.uint32(static.width)).astype(REAL)
    u0, u1 = soa.uniform2(seed, pixel, jnp.uint32(ps._CTR_PIXEL), sample)
    orgs, ds = [], []
    for dx, dy in ((0.0, 0.0),) + _OFFSETS:
        o, d = ps.primary_rays_soa(static, camera, xs + dx, ys + dy, u0, u1)
        orgs.append(o)
        ds.append(d)

    def cat(vs):
        return jnp.concatenate(vs, axis=0)

    def cat3(vs):
        return V3(cat([v.x for v in vs]), cat([v.y for v in vs]),
                  cat([v.z for v in vs]))

    borg, bdir = cat3(orgs), cat3(ds)
    tfar = jnp.tile(jnp.where(live, BIG, -1.0), 5)
    bhit, bgn = trs.intersect_soa_gn(static, sc.geom, borg, bdir, 0.0, tfar)
    bv = ps.shade_hit(static, sc, borg, bdir, bhit, bgn)

    def part(i):
        sl = slice(i * n, (i + 1) * n)
        v = jax.tree_util.tree_map(lambda a: a[sl], bv)
        return v, V3(bdir.x[sl], bdir.y[sl], bdir.z[sl]), bhit.prim_id[sl]

    base_v, base_d, base_prim = part(0)
    offs = []
    for i in range(4):
        ov, od, oprim = part(1 + i)
        # Offset validity: hit + same material as base primary hit
        # (reference: src/path_tracing.h:424-443).
        ovalid = (ov.valid > 0) & (ov.material_id == base_v.material_id)
        offs.append(dict(
            valid=ovalid.astype(REAL), merged=zero, v=ov, d=od, prim=oprim,
            contrib=one3, prob=one, jacob=one,
        ))
    base_ok = base_v.valid > 0
    radiance0 = soa.where(base_ok, ps.emission(sc, base_v, -1.0 * base_d),
                          zero3)
    return dict(
        radiance=radiance0,
        primal_bf=zero3,
        diffs=(zero3, zero3, zero3, zero3),
        base_v=base_v,
        base_d=base_d,
        base_prim=base_prim,
        contrib=one3,
        prob=one,
        eta_scale=one,
        offs=tuple(offs),
        active=base_v.valid,
        bounce=jnp.zeros(n, INT),
        pixel=pixel,
        sample=sample,
    )


def _gdpt_bounce(static, sc: ps.SceneSoA, used, seed, s):
    """One shared GDPT bounce over per-lane state (lanes may sit at
    different depths: bounce/pixel/sample are per-lane, so both the
    banded sample loop and the wavefront pool run this same body).
    s carries the scalar ray counter in s["rays"]."""
    md = static.options.max_depth
    n_iters = GDPT_MAX_DEPTH if md < 0 else min(md, GDPT_MAX_DEPTH)
    n = s["prob"].shape[0]
    zero = jnp.zeros(n, REAL)
    zero3 = V3(zero, zero, zero)
    eps_isect = static.intersection_epsilon

    def uni2(bounce, ctr):
        counter = (bounce * ps._CTR_STRIDE + ctr).astype(jnp.uint32)
        return soa.uniform2(seed, s["pixel"], counter, s["sample"])

    base_v = s["base_v"]
    b = s["bounce"] + 1
    active = s["active"] > 0

    # --- light hit: accumulate this path-prefix's BF radiance and
    # one-sided differences, then KEEP TRACING (the reference's base
    # path bounces off emitters too, src/path_tracing.h:968-1010;
    # lajolla lights have materials). Each prefix uses its own
    # prob/jacobian/MIS weight — see gdpt.py docstring. ---
    base_is_light = base_v.light_id >= 0
    hit_light = active & base_is_light & (s["prob"] > 0)
    emitted = ps.emission(sc, base_v, -1.0 * s["base_d"])
    prob_c = jnp.maximum(s["prob"], 1e-30)
    base_term = s["contrib"] * emitted
    primal_bf = s["primal_bf"] + soa.where(
        hit_light, base_term * (1.0 / prob_c), zero3
    )
    new_diffs = []
    for i, off in enumerate(s["offs"]):
        ov = off["v"]
        merged = off["merged"] > 0
        o_emit = ps.emission(sc, ov, -1.0 * off["d"])
        o_is_light = ov.light_id >= 0
        term_valid = (off["valid"] > 0) & (merged | o_is_light)
        term_c = soa.where(
            term_valid,
            soa.where(merged, off["contrib"] * emitted,
                      off["contrib"] * o_emit) * off["jacob"],
            zero3,
        )
        p_shift = off["prob"] * off["jacob"]
        w = jnp.where(
            term_valid,
            s["prob"] / jnp.maximum(s["prob"] + p_shift, 1e-30),
            1.0,
        )
        d_i = (term_c - base_term) * (_SIGNS[i] * w / prob_c)
        new_diffs.append(
            s["diffs"][i] + soa.where(hit_light, d_i, zero3)
        )

    contrib = s["contrib"]
    new_offs = []

    # --- extension (continues through emitters) ---
    extend = active
    dir_view = -1.0 * s["base_d"]
    params = msoa.gather_params_soa(
        sc.mat_tables, used, base_v.material_id, base_v.uv_u, base_v.uv_v,
        static.spec_image_slots,
        float_tex_slots=static.float_tex_slots,
    )
    throughput = s["contrib"] * (1.0 / jnp.maximum(s["prob"], 1e-30))

    # Primal NEE alongside (reference: src/path_tracing.h:115-227).
    radiance = s["radiance"]
    rays = s["rays"]
    if static.n_lights > 0:
        lu0, lu1 = uni2(b, ps._CTR_LIGHT_UV)
        lw, lsw = uni2(b, ps._CTR_LIGHT_W)
        nee, shadow_mask = ps.nee_soa(static, sc, base_v, params, dir_view,
                                      used, lu0, lu1, lw, lsw, extend)
        radiance = radiance + throughput * nee
        rays = rays + jnp.sum(shadow_mask)

    bu0, bu1 = uni2(b, ps._CTR_BSDF_UV)
    w_lobe, u_rr = uni2(b, ps._CTR_BSDF_W)
    samp = msoa.sample_bsdf_soa(params, dir_view, base_v.gn, base_v.frame,
                                bu0, bu1, w_lobe, used)
    f_base = msoa.eval_bsdf_soa(params, dir_view, samp.dir_out,
                                base_v.gn, base_v.frame, used)
    pdf_base = msoa.pdf_bsdf_soa(params, dir_view, samp.dir_out,
                                 base_v.gn, base_v.frame, used)
    is_transmit = (samp.valid > 0) & (samp.eta != 0)
    eta_scale = jnp.where(
        is_transmit,
        s["eta_scale"] / jnp.where(is_transmit, samp.eta, 1.0) ** 2,
        s["eta_scale"],
    )

    # Russian roulette on the base path (reference:
    # src/path_tracing.h:992-999); survival prob folded into the
    # base prob AND every offset prob so contrib/prob stays an
    # unbiased pair (factor cancels in the shift MIS weights).
    num_vertices = s["bounce"] + 3
    do_rr = (num_vertices - 1) >= static.options.rr_depth
    rr_prob = jnp.where(
        do_rr,
        jnp.minimum(
            soa.vmax(s["contrib"])
            / (prob_c * jnp.maximum(eta_scale, 1e-20)),
            0.95,
        ),
        1.0,
    )
    survive = (~do_rr) | (u_rr <= rr_prob)
    # Inactive lanes become dead rays (tfar < tnear): traversal
    # backends exit them immediately instead of tracing stale rays.
    pool_sorted = _os.environ.get("GDPT_POOL_SORT", "0") == "1"
    nxt_hit, nxt_gn = trs.intersect_soa_gn(
        static, sc.geom, base_v.position, samp.dir_out, eps_isect,
        jnp.where(extend, BIG, -1.0), sort_rays=not pool_sorted
    )
    nxt = ps.shade_hit(static, sc, base_v.position, samp.dir_out,
                       nxt_hit, nxt_gn)
    nxt_ok = nxt.valid > 0
    ok_base = (samp.valid > 0) & (pdf_base > 0) & nxt_ok
    base_diffuse = _is_lambertian(sc, static, base_v.material_id)
    rays = rays + jnp.sum(jnp.where(extend, 1.0, 0.0))

    # Primal MIS-weighted emitter hit
    # (reference: src/path_tracing.h:291-325).
    if static.n_lights > 0:
        dist2 = soa.length_squared(nxt.position - base_v.position)
        g2 = jnp.abs(soa.dot(samp.dir_out, nxt.gn)) / jnp.maximum(dist2, 1e-20)
        p2a = pdf_base * g2
        nxt_is_light = nxt_ok & (nxt.light_id >= 0)
        l_emit = ps.emission(sc, nxt, -1.0 * samp.dir_out)
        p1h = ps.hit_light_pdf_soa(static, sc, base_v.position, nxt,
                                   samp.dir_out, dist2)
        w2 = p2a * p2a / jnp.maximum(p1h * p1h + p2a * p2a, 1e-30)
        c2 = f_base * l_emit * (g2 * w2 / jnp.maximum(p2a, 1e-30))
        radiance = radiance + soa.where(
            extend & ok_base & nxt_is_light, throughput * c2, zero3
        )

    # Offsets, phase A: everything up to the traversals, plus the
    # probe (reconnection) and replay rays for ALL four offsets.
    # The traversals then go through ONE batched 8n-lane call — the
    # unrolled 4x2 per-offset calls made the program large enough
    # to crash the TPU worker, and batching amortizes the
    # latency-bound traversal across offsets.
    g_base = _geom_term(base_v.position, base_v.gn, nxt.position, nxt.gn)
    offA = []
    for off in s["offs"]:
        ov = off["v"]
        ovalid = off["valid"] > 0
        merged = off["merged"] > 0
        oc, op, oj = off["contrib"], off["prob"], off["jacob"]

        o_params = msoa.gather_params_soa(
            sc.mat_tables, used, ov.material_id, ov.uv_u, ov.uv_v,
            static.spec_image_slots,
            float_tex_slots=static.float_tex_slots,
        )
        o_view = -1.0 * off["d"]
        o_diffuse = _is_lambertian(sc, static, ov.material_id)
        can_reconnect = base_diffuse & o_diffuse & nxt_ok

        # Reconnection direction (reference: small_gdpt.cpp:248-269).
        to_next = nxt.position - ov.position
        dist = jnp.maximum(soa.length(to_next), 1e-20)
        dir_rec = to_next * (1.0 / dist)

        # Replay with the base's randoms (small_gdpt.cpp:272-279).
        o_samp = msoa.sample_bsdf_soa(o_params, o_view, ov.gn, ov.frame,
                                      bu0, bu1, w_lobe, used)
        offA.append(dict(
            ov=ov, off=off, ovalid=ovalid, merged=merged,
            oc=oc, op=op, oj=oj,
            o_params=o_params, o_view=o_view, o_samp=o_samp,
            can_reconnect=can_reconnect, dir_rec=dir_rec,
            # MERGED offsets follow the base path exactly (their
            # contribution is oc * f_base and their next vertex is
            # the base's nxt) — neither the reconnection probe nor
            # the replay ray is consulted for them, so both ride as
            # dead rays. On all-diffuse scenes (sponza) offsets
            # merge at the first bounce, which empties ~all 8n
            # offset traversal lanes for the rest of the path. The
            # replay result is also unused when the reconnection
            # fires this bounce (do_rec), so it's gated on
            # ~can_reconnect too.
            probe_tfar=jnp.where(
                extend & ovalid & can_reconnect & ~merged, BIG, -1.0),
            rep_tfar=jnp.where(
                extend & ovalid & ~merged & ~can_reconnect, BIG, -1.0),
        ))

    def cat(vs):
        return jnp.concatenate(vs, axis=0)

    def cat3(vs):
        return V3(cat([v.x for v in vs]), cat([v.y for v in vs]),
                  cat([v.z for v in vs]))

    borg = cat3([a["ov"].position for a in offA] * 2)
    bdir = cat3([a["dir_rec"] for a in offA]
                + [a["o_samp"].dir_out for a in offA])
    btfar = cat([a["probe_tfar"] for a in offA]
                + [a["rep_tfar"] for a in offA])
    # Pool-sorted mode: the 8 concatenated n-lane probe/replay groups
    # are each pool-coherent and packet-aligned (n is a pool multiple
    # of the packet quantum), so the in-trace argsort is redundant.
    bhit, bgn = trs.intersect_soa_gn(
        static, sc.geom, borg, bdir, eps_isect, btfar,
        sort_rays=not pool_sorted)

    def part(i):
        sl = slice(i * n, (i + 1) * n)
        hit_i = jax.tree_util.tree_map(lambda a: a[sl], bhit)
        gn_i = None if bgn is None else jax.tree_util.tree_map(
            lambda a: a[sl], bgn)
        return hit_i, gn_i

    # Phase B: per-offset consumption of the sliced results.
    for i, a in enumerate(offA):
        off, ov = a["off"], a["ov"]
        ovalid, merged = a["ovalid"], a["merged"]
        oc, op, oj = a["oc"], a["op"], a["oj"]
        o_params, o_view = a["o_params"], a["o_view"]
        o_samp = a["o_samp"]
        can_reconnect, dir_rec = a["can_reconnect"], a["dir_rec"]

        # Merged: follow base factors (reference: src/path_tracing.h:774-778).
        mc = oc * f_base
        mp = op * pdf_base

        probe_hit, _ = part(i)
        probe_ok = (probe_hit.prim_id >= 0) & (
            probe_hit.prim_id == jnp.maximum(nxt_hit.prim_id, 0)
        ) & nxt_ok
        f_rec = msoa.eval_bsdf_soa(o_params, o_view, dir_rec, ov.gn,
                                   ov.frame, used)
        pdf_rec = msoa.pdf_bsdf_soa(o_params, o_view, dir_rec, ov.gn,
                                    ov.frame, used)
        g_shift = _geom_term(ov.position, ov.gn, nxt.position, nxt.gn)
        rec_valid = probe_ok & (pdf_rec > 0)
        rec_c = oc * f_rec
        rec_p = op * pdf_rec
        rec_j = oj * g_shift / jnp.maximum(g_base, 1e-20)

        f_rep = msoa.eval_bsdf_soa(o_params, o_view, o_samp.dir_out,
                                   ov.gn, ov.frame, used)
        pdf_rep = msoa.pdf_bsdf_soa(o_params, o_view, o_samp.dir_out,
                                    ov.gn, ov.frame, used)
        o_nxt_hit, o_nxt_gn = part(4 + i)
        o_nxt = ps.shade_hit(static, sc, ov.position, o_samp.dir_out,
                             o_nxt_hit, o_nxt_gn)
        rep_valid = (
            (o_samp.valid > 0) & (pdf_rep > 0) & (o_nxt.valid > 0)
            & (o_nxt.material_id == nxt.material_id)
        )
        rep_c = oc * f_rep
        rep_p = op * pdf_rep
        rep_j = oj * pdf_base / jnp.maximum(pdf_rep, 1e-20)

        do_rec = can_reconnect & ~merged
        new_merged = merged | do_rec
        new_valid = ovalid & jnp.where(
            merged, True, jnp.where(do_rec, rec_valid, rep_valid)
        )
        pick = lambda m, a_, b_: jnp.where(m, a_, b_)
        pick3 = lambda m, a_, b_: soa.where(m, a_, b_)
        new_c = pick3(merged, mc, pick3(do_rec, rec_c, rep_c))
        # Offsets share the base's RR decision and survival prob.
        new_p = pick(merged, mp, pick(do_rec, rec_p, rep_p)) * rr_prob
        new_j = pick(merged, oj, pick(do_rec, rec_j, rep_j))
        new_v = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(new_merged, a_, b_), nxt, o_nxt
        )
        new_prim = jnp.where(new_merged, nxt_hit.prim_id, o_nxt_hit.prim_id)
        new_d = soa.where(new_merged, samp.dir_out, o_samp.dir_out)

        upd = extend & ovalid
        sel = lambda nw, old: jnp.where(upd, nw, old)
        sel3 = lambda nw, old: soa.where(upd, nw, old)
        new_offs.append(dict(
            valid=jnp.where(upd, new_valid, ovalid).astype(REAL),
            merged=jnp.where(upd, new_merged, merged).astype(REAL),
            v=jax.tree_util.tree_map(
                lambda nw, old: jnp.where(upd, nw, old), new_v, ov
            ),
            d=sel3(new_d, off["d"]),
            prim=sel(new_prim, off["prim"]),
            contrib=sel3(new_c, oc),
            prob=sel(new_p, op),
            jacob=sel(new_j, oj),
        ))
        rays = rays + 2.0 * jnp.sum(jnp.where(upd, 1.0, 0.0))

    ext_ok = extend & ok_base & survive
    new_contrib = soa.where(ext_ok, contrib * f_base, contrib)
    new_prob = jnp.where(ext_ok, s["prob"] * pdf_base * rr_prob, s["prob"])
    new_base_v = jax.tree_util.tree_map(
        lambda nw, old: jnp.where(ext_ok, nw, old), nxt, base_v
    )

    # Per-lane depth cap (lanes in a wavefront pool sit at different
    # depths; matches the banded loop's former scalar bounce <= n_iters).
    ext_ok = ext_ok & (s["bounce"] + 1 <= n_iters)
    return dict(
        radiance=radiance,
        primal_bf=primal_bf,
        diffs=tuple(new_diffs),
        base_v=new_base_v,
        base_d=soa.where(ext_ok, samp.dir_out, s["base_d"]),
        base_prim=jnp.where(ext_ok, nxt_hit.prim_id, s["base_prim"]),
        contrib=new_contrib,
        prob=new_prob,
        eta_scale=jnp.where(ext_ok, eta_scale, s["eta_scale"]),
        offs=tuple(new_offs),
        active=ext_ok.astype(REAL),
        bounce=s["bounce"] + 1,
        pixel=s["pixel"],
        sample=s["sample"],
        rays=rays,
    )


def trace_gdpt_soa(static, camera, sc: ps.SceneSoA, xs, ys, ray_idx, seed,
                   sample0) -> GdptSampleSoA:
    """One GDPT sample for every lane (banded driver entry): init the
    5-path lockstep state, run the shared bounce to extinction."""
    used = static.used_material_kinds
    n = xs.shape[0]
    del xs, ys  # pixel coords derive from ray_idx (the pixel index)
    pixel = ray_idx.astype(jnp.uint32)
    sample = jnp.full(n, sample0, jnp.uint32) if jnp.ndim(sample0) == 0 \
        else sample0.astype(jnp.uint32)
    state = _init_gdpt_lanes(static, camera, sc, pixel, sample, seed,
                             jnp.ones(n, bool))
    state["rays"] = jnp.full((), 5.0 * n, REAL)

    def cond(s):
        return jnp.max(s["active"]) > 0

    def body(s):
        return _gdpt_bounce(static, sc, used, seed, s)

    out = jax.lax.while_loop(cond, body, state)

    # Accumulated per-prefix terms (reference pairing:
    # src/path_tracing.h:1016-1049, small_gdpt.cpp:488-507 — but one
    # term per light hit instead of one product at loop end).
    return (
        GdptSampleSoA(out["radiance"], out["primal_bf"], *out["diffs"]),
        out["rays"],
    )


def _gdpt_wavefront_body(static, camera, sc, used, st):
    """One wavefront iteration: harvest finished lanes into the per-pixel
    accumulator, refill them with the next (pixel, sample) work items
    (batched 5n-lane primary), then run the shared bounce.

    The banded loop pays full-width material/NEE/update cost for every
    drain iteration while live lanes decay under RR; the pool keeps
    ~every lane on useful work, which on sponza gradpath cuts the number
    of full-width iterations ~5x (wavefront analog of path_soa's
    render_soa_wavefront; reference scheduling analog:
    src/render.cpp:82-117)."""
    s = st["lane"]
    n_pix = static.width * static.height
    dead = s["active"] <= 0
    pending = st["pending"] > 0
    harvest = dead & pending

    vals = [s["radiance"], s["primal_bf"], *s["diffs"]]
    upd = jnp.stack(
        [jnp.where(harvest, c, 0.0)
         for v3 in vals for c in (v3.x, v3.y, v3.z)], axis=1)
    acc = st["acc"].at[s["pixel"].astype(INT)].add(upd)

    pah = pending & ~harvest
    P = s["prob"].shape[0]
    n_dead = jnp.sum(dead.astype(jnp.uint32))
    # Refill only when a quarter of the pool is idle (or the queue has
    # drained): the refill's batched 5n-lane primary shade is a
    # full-width cost whether 1 lane or 100k lanes regenerate, so it
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
        new_sample = jnp.where(issue, item // jnp.uint32(n_pix),
                               s["sample"])
        fresh = _init_gdpt_lanes(static, camera, sc, new_pixel, new_sample,
                                 st["seed"], issue)
        rays = s["rays"] + 5.0 * jnp.sum(jnp.where(issue, 1.0, 0.0))
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
    # Occupancy telemetry: live fraction ENTERING the bounce (post-
    # refill), i.e. how much of the full-width bounce cost is useful
    # work. Sampling after the bounce (round-4 occupancy report) made
    # scenes whose offsets merge/die at bounce 1 read as ~0.10 occupancy
    # even though every bounce ran on a freshly refilled pool — it
    # measured path shortness, not wasted width.
    occ = jnp.mean(jnp.where(lane["active"] > 0, 1.0, 0.0))
    lane = _gdpt_bounce(static, sc, used, st["seed"], lane)
    return dict(
        lane=lane,
        acc=acc,
        pending=pending2,
        next_item=next_item,
        total=st["total"],
        seed=st["seed"],
        occ_sum=st["occ_sum"] + occ,
        iters=st["iters"] + 1.0,
    )


@partial(jax.jit, donate_argnums=(0,))
def _gdpt_pool_sort(st, tab):
    """Morton-permute the 5-path lane pool (see path_soa._pool_sort):
    key = current base vertex position + incoming direction octant.
    pending permutes WITH the lanes (it is per-lane bookkeeping)."""
    from gdpt_tpu.accel import packet_trace as pt

    s = st["lane"]
    keys = pt._morton_keys(tab, s["base_v"].position, s["base_d"])
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


def _gdpt_shrink_pool(st, new_pool, keep):
    """Tail compaction for the 5-path pool (see path_soa._shrink_pool_state):
    once the work queue drains, compact surviving lanes into the
    smallest pow-2 packet-aligned pool so every remaining dispatch pays
    sort/pack/material cost proportional to real work. keep: device bool
    mask of lanes to retain (live or dead-with-pending-harvest). Runs
    fully on device — the 5-path lane state is far too large to bounce
    through the host tunnel per shrink."""
    order = ps._compact_take_order(keep, new_pool)

    def shrink(a):
        return jnp.take(a, order, axis=0)

    lane = {k: (v if k == "rays"
                else jax.tree_util.tree_map(shrink, v))
            for k, v in st["lane"].items()}
    out = dict(st)
    out["lane"] = lane
    out["pending"] = shrink(st["pending"])
    return out


@partial(jax.jit, static_argnames=("static", "k_iters"), donate_argnums=(2,))
def _gdpt_wavefront_chunk(static, camera, st, sc, k_iters):
    # sc rides OUTSIDE the donated state (donation would delete the
    # caller's scene buffers; see path_soa._wavefront_chunk).
    used = static.used_material_kinds

    def body(i, s):
        return _gdpt_wavefront_body(static, camera, sc, used, s)

    return jax.lax.fori_loop(0, k_iters, body, st)


def _gdpt_wavefront_accum(static, camera, sc, spp, seed, n_pix,
                          k_iters=6):
    """Run the GDPT wavefront to completion; returns (acc (6,3,n) f64
    sample sums, total_rays)."""
    import os as _os

    total = n_pix * spp
    if total >= 2 ** 32:
        # uint32 work-queue counter would wrap (render_gradpath_soa
        # routes such renders to the banded loop instead).
        raise ValueError(
            f"GDPT wavefront work queue: n_pix*spp = {total} >= 2^32; "
            "use the banded loop for renders this large")
    from gdpt_tpu.accel import packet_trace as pt

    # Pool quantum = one packet-kernel dispatch (PACKET_ROWS*128 lanes):
    # tiny renders (tests, thumbnails) get a right-sized pool instead of
    # paying 8x idle lanes per iteration; production pools (GDPT_*POOL,
    # default 128k lanes) are unaffected.
    lane_q = pt.PACKET_ROWS * 128
    P = int(_os.environ.get("GDPT_GDPT_POOL", 1 << 17))
    P = min(P, -(-total // lane_q) * lane_q)
    P = -(-P // lane_q) * lane_q
    zeros_u = jnp.zeros(P, jnp.uint32)
    lane0 = _init_gdpt_lanes(static, camera, sc, zeros_u, zeros_u,
                             jnp.asarray(seed, jnp.uint32),
                             jnp.zeros(P, bool))
    lane0["rays"] = jnp.asarray(0.0, REAL)
    st = dict(
        lane=lane0,
        acc=jnp.zeros((n_pix, 18), REAL),
        pending=jnp.zeros(P, REAL),
        next_item=jnp.asarray(0, jnp.uint32),
        total=jnp.asarray(total, jnp.uint32),
        seed=jnp.asarray(seed, jnp.uint32),
        occ_sum=jnp.asarray(0.0, REAL),
        iters=jnp.asarray(0.0, REAL),
    )
    # The eager init aliases buffers across fields (zero3 rides in
    # primal_bf and every diff); donation rejects duplicated buffers,
    # so give every leaf its own storage first.
    st = jax.tree_util.tree_map(jnp.copy, st)
    # Drain the f32 device accumulator into host f64 every ~64 issued
    # spp-equivalents (see path_soa.render_soa_wavefront).
    host_acc = np.zeros((n_pix, 18), np.float64)
    drain_step = n_pix * 64
    last_drain = 0
    pool_sort = (_os.environ.get("GDPT_POOL_SORT", "0") == "1"
                 and sc.geom.packet is not None)
    compact = _os.environ.get("GDPT_TAIL_COMPACT", "1") == "1"
    cur_pool = P
    while True:
        if pool_sort:
            st = _gdpt_pool_sort(st, sc.geom.packet)
        st = _gdpt_wavefront_chunk(static, camera, st, sc, k_iters)
        ni = int(st["next_item"])
        if ni >= total:
            # Queue drained: count lanes still carrying work (live, or
            # dead-but-unharvested — pending radiance is harvested at
            # the START of the next iteration, so it must survive
            # compaction).
            keep = (st["lane"]["active"] > 0) | (st["pending"] > 0)
            n_keep = int(jnp.sum(keep))
            if n_keep == 0:
                break
            if compact:
                tgt = ps._tail_bucket(n_keep, cur_pool, lane_q)
                if tgt is not None:
                    st = _gdpt_shrink_pool(st, tgt, keep)
                    cur_pool = tgt
        if ni - last_drain >= drain_step:
            host_acc += np.asarray(st["acc"], np.float64)
            st["acc"] = jnp.zeros((n_pix, 18), REAL)
            last_drain = ni
    host_acc += np.asarray(st["acc"], np.float64)
    acc = host_acc.T.reshape(6, 3, n_pix)
    _gdpt_wavefront_accum.last_occupancy = float(
        st["occ_sum"]) / max(float(st["iters"]), 1.0)
    _gdpt_wavefront_accum.last_iters = float(st["iters"])
    return acc, float(st["lane"]["rays"])


@partial(jax.jit, static_argnames=("static", "n_samples"))
def _gdpt_pass(static, camera, sc, xs, ys, ray_idx, seed, sample0, n_samples):
    n = xs.shape[0]
    zero3 = V3(*(jnp.zeros(n, REAL),) * 3)

    def one(i, carry):
        acc, rays = carry
        out, nr = trace_gdpt_soa(
            static, camera, sc, xs, ys, ray_idx, seed,
            sample0 + jnp.asarray(i, jnp.uint32),
        )
        return (
            jax.tree_util.tree_map(lambda a, o: a + o, acc, out),
            rays + nr,
        )

    zero = GdptSampleSoA(*(zero3 for _ in range(6)))
    return jax.lax.fori_loop(0, n_samples, one, (zero, jnp.asarray(0.0, REAL)))


def render_gradpath_soa(scene: Scene, spp=None, seed=0, return_aux=False,
                        return_stats=False, start_sample=0, init_acc=None,
                        on_chunk=None, mesh=None):
    """SoA GDPT driver: accumulate primal + 4 gradient buffers, then
    screened-Poisson reconstruct (reference: src/render.cpp:257-370).
    mesh: optional jax.sharding.Mesh with a 'rays' axis — the same
    banded/batched loop runs with rays sharded and the scene replicated."""
    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n = w * h
    sc = ps.scene_soa_from_aos(scene)
    camera = scene.device.camera
    import os as _os

    if (mesh is None and not static.use_brute_force and on_chunk is None
            and init_acc is None and not start_sample
            and n * spp < 2 ** 32
            and _os.environ.get("GDPT_WAVEFRONT", "1") != "0"):
        # BVH scenes: the wavefront pool keeps the 5-path lockstep at
        # ~full occupancy via sample regeneration instead of paying
        # full-width drain iterations per band-sample. Checkpoint
        # resume stays on the banded loop (whole-sample accumulation
        # boundaries).
        acc, total_rays = _gdpt_wavefront_accum(
            static, camera, sc, spp, seed, n)
        return _gdpt_finish(static, acc, spp, w, h, n, total_rays,
                            return_aux, return_stats)
    ys, xs = np.mgrid[0:h, 0:w]
    xs_d = jnp.asarray(xs.ravel(), REAL)
    ys_d = jnp.asarray(ys.ravel(), REAL)
    ray_idx = jnp.arange(n, dtype=jnp.uint32)
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as SP

        shard = NamedSharding(mesh, SP("rays"))
        repl = NamedSharding(mesh, SP())
        sc = jax.device_put(sc, repl)
        camera = jax.device_put(camera, repl)

    # ~5x the rays of a plain path sample per GDPT sample; BVH scenes are
    # latency-bound, keep each dispatch to one sample (device watchdog).
    if static.use_brute_force:
        batch = max(1, (1 << 23) // n)
    else:
        batch = 1  # latency-bound traversal; see path_soa.render_soa
    # The unrolled 5-path program carries a lot of per-lane state; on
    # big scenes the whole image in one dispatch crashes the TPU
    # worker, so pixels go through in equal bands.
    PIX_CAP = 1 << 17
    if static.use_brute_force or n <= PIX_CAP:
        bands = [(0, n)]
    else:
        nb = -(-n // PIX_CAP)
        band = -(-n // nb)
        bands = [(lo, min(n, lo + band)) for lo in range(0, n, band)]

    def band_args(lo, hi):
        band_n = bands[0][1] - bands[0][0]
        lane_pad = 0 if shard is None else \
            (-band_n) % (mesh.devices.size * 128)
        if hi - lo == len(xs_d) and not lane_pad:
            out = xs_d, ys_d, ray_idx
        else:
            pad = band_n - (hi - lo) + lane_pad
            sl = slice(lo, hi)
            out = (jnp.pad(xs_d[sl], (0, pad)), jnp.pad(ys_d[sl], (0, pad)),
                   jnp.pad(ray_idx[sl], (0, pad)))
        if shard is not None:
            out = tuple(jax.device_put(a, shard) for a in out)
        return out

    acc = (np.zeros((6, 3, n), np.float64) if init_acc is None
           else np.asarray(init_acc, np.float64).copy())
    total_rays = 0.0
    done = int(start_sample)
    while done < spp:
        k = min(batch, spp - done)
        for lo, hi in bands:
            bx, by, bidx = band_args(lo, hi)
            out, nrays = _gdpt_pass(
                static, camera, sc, bx, by, bidx,
                jnp.asarray(seed, jnp.uint32), jnp.asarray(done, jnp.uint32),
                k,
            )
            m = hi - lo
            for i, buf in enumerate(out):
                acc[i, 0, lo:hi] += np.asarray(buf.x, np.float64)[:m]
                acc[i, 1, lo:hi] += np.asarray(buf.y, np.float64)[:m]
                acc[i, 2, lo:hi] += np.asarray(buf.z, np.float64)[:m]
            total_rays += float(nrays) * m / max(len(jnp.asarray(bx)), 1)
        done += k
        if on_chunk is not None:
            on_chunk(acc, done)

    return _gdpt_finish(static, acc, spp, w, h, n, total_rays,
                        return_aux, return_stats)


def _gdpt_finish(static, acc, spp, w, h, n, total_rays, return_aux,
                 return_stats):
    """Shared tail: (6,3,n) sample sums -> Poisson reconstruction."""
    def img(i):
        return (acc[i] / spp).T.reshape(h, w, 3).astype(np.float32)

    primal, primal_bf, gxh, gxn, gyh, gyn = (img(i) for i in range(6))
    gx, gy = poisson.assemble_gradients(
        jnp.asarray(gxh), jnp.asarray(gxn), jnp.asarray(gyh), jnp.asarray(gyn)
    )
    recon = poisson.screened_poisson_solve(
        jnp.asarray(primal), gx, gy, static.options.gdpt_alpha
    )
    recon = np.where(np.isfinite(recon), np.asarray(recon), 0.0).astype(np.float32)
    aux = dict(primal=primal, primal_bf=primal_bf,
               gx=np.asarray(gx), gy=np.asarray(gy))
    if return_aux and return_stats:
        return recon, aux, total_rays
    if return_aux:
        return recon, aux
    if return_stats:
        return recon, total_rays
    return recon
