"""Gradient-domain path tracing (GDPT).

The flagship integrator: for every sample, a base path at pixel (x, y)
plus four shift-mapped offset paths at (x-1, y), (x+1, y), (x, y-1),
(x, y+1) are traced *in lockstep in one program*, consuming the same
random numbers (counter-based keys make this trivial; see core/rng.py).
Algorithmic spec follows the record-then-replay decomposition of the
reference's standalone prototype (reference: small_gdpt.cpp:153-352) and
its lajolla integration (reference: src/path_tracing.h:354-1050,
src/render.cpp:257-370):

- offset paths are invalidated on primary miss or material mismatch
  (reference: src/path_tracing.h:424-443);
- at diffuse-diffuse vertices, the offset reconnects to the base path's
  next vertex with a geometry-term-ratio Jacobian
  (reference: small_gdpt.cpp:248-269, src/path_tracing.h:576-604);
- otherwise the offset replays the base path's BSDF random numbers from
  its own vertex with a pdf-ratio Jacobian ("random number reuse" shift,
  reference: small_gdpt.cpp:272-279, src/path_tracing.h:780-959);
- gradient paths carry no NEE (reference: src/path_tracing.h:520,
  small_gdpt.cpp:183) and do NOT terminate at emissive hits: like the
  reference's base path (src/path_tracing.h:968-1010), a path that hits
  a light keeps bouncing (lajolla lights have materials), and every
  light hit contributes one path-prefix term. Unlike the reference we
  accumulate each prefix's BF radiance and one-sided differences at the
  hit (with the prefix's own prob/jacobian/weight) instead of polluting
  the running `contrib` product with the emission (the reference's
  `contrib *= L` at src/path_tracing.h:973 multiplies emission into all
  *subsequent* bounces' factors, inflating multi-hit paths);
- the *primal* image is estimated with full NEE + MIS alongside (the
  reference's BF-only primal is unusably noisy for small lights; the
  Poisson data term anchors to the NEE primal instead);
- per-sample MIS weights w = p / (p + p_shift * J) combine the two
  one-sided difference estimates of each gradient
  (reference: small_gdpt.cpp:488-512, src/render.cpp:311-318);
- the primal + 4 gradient buffers feed the screened-Poisson solve with
  data weight alpha (reference: src/render.cpp:353, alpha = 0.04).

Russian roulette follows the reference's placement (after rr_depth,
survival min(throughput/eta_scale, 0.95), src/path_tracing.h:992-999)
but, unlike the fork — which drops paths without reweighting the
gradient pair — the survival probability is folded into BOTH the base
`prob` and every offset's prob, so contrib/prob stays an unbiased pair
and the shift MIS weights are unchanged (the factor cancels in
p/(p + p_shift*J)).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core import math as gm
from gdpt_tpu.core import rng
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.ops import intersect as isect
from gdpt_tpu.ops import lights as lgt
from gdpt_tpu.ops import materials as mat
from gdpt_tpu.ops import poisson
from gdpt_tpu.integrators.path import nee_contribution
from gdpt_tpu.scene import camera as gcam
from gdpt_tpu.scene import model as M
from gdpt_tpu.scene.build import DeviceScene, Scene, SceneStatic

GDPT_MAX_DEPTH = 32  # reference: small_gdpt.cpp:15, intersection.h MAX_DEPTH

# Offset order: x-1, x+1, y-1, y+1 (image space, y down).
_OFFSETS = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]], np.float32)


class GdptSample(NamedTuple):
    """Per-sample output: primal estimate and the 4 weighted one-sided
    differences (the reference's GraidentPTRadiance after driver math,
    reference: src/intersection.h:65-77, src/render.cpp:311-318)."""

    primal: jnp.ndarray     # (3,) NEE+MIS estimate (the data term)
    primal_bf: jnp.ndarray  # (3,) BF emitter-hit estimate (noise-matched
    #                         to the gradients, as in the reference)
    gx_here: jnp.ndarray    # (3,) estimate of u[x] - u[x-1] stored at x
    gx_next: jnp.ndarray    # (3,) estimate of u[x+1] - u[x] stored at x
    gy_here: jnp.ndarray    # (3,)
    gy_next: jnp.ndarray    # (3,)


def _is_kind(scene: DeviceScene, static: SceneStatic, material_id, kind):
    if kind not in static.used_material_kinds:
        return jnp.asarray(False)
    mid = jnp.maximum(material_id, 0)
    return (material_id >= 0) & (scene.materials.kind[mid] == kind)


def _geom_term(p0, n0, p1, n1):
    """|cos0 cos1| / dist^2 between two surface points
    (reference: small_gdpt.cpp:255-267)."""
    d = p1 - p0
    d2 = jnp.maximum(gm.length_squared(d), 1e-20)
    dn = d / jnp.sqrt(d2)
    return jnp.abs(gm.dot(dn, n1)) * jnp.abs(gm.dot(dn, n0)) / d2


def trace_gdpt(scene: DeviceScene, static: SceneStatic, x, y, key) -> GdptSample:
    w, h = static.width, static.height
    used = static.used_material_kinds
    md = static.options.max_depth
    n_iters = GDPT_MAX_DEPTH if md < 0 else min(md, GDPT_MAX_DEPTH)

    u_px = rng.uniform(key, 0, rng.SLOT_PIXEL, (2,))

    def primary(px, py):
        screen = jnp.stack([(px + u_px[0]) / w, (py + u_px[1]) / h])
        org, d = gcam.sample_primary(
            scene.camera, w, h, static.filter_kind, static.filter_param, screen
        )
        v = isect.intersect(scene, static, org, d, 0.0, BIG)
        return v, d

    base_v, base_d = primary(x, y)
    offs = jnp.asarray(_OFFSETS)
    off_v, off_d = jax.vmap(lambda o: primary(x + o[0], y + o[1]))(offs)

    # Offset validity: hit + same material as base primary hit
    # (reference: src/path_tracing.h:424-443).
    off_valid = off_v.valid & (off_v.material_id == base_v.material_id)

    # NEE+MIS primal radiance runs alongside the gradient estimator.
    radiance0 = jnp.where(
        base_v.valid,
        lgt.emission_at_vertex(scene, static, base_v, -base_d),
        jnp.zeros(3, REAL),
    )

    state = dict(
        radiance=radiance0,
        primal_bf=jnp.zeros(3, REAL),
        diffs=jnp.zeros((4, 3), REAL),
        base_v=base_v,
        base_d=base_d,
        contrib=jnp.ones(3, REAL),
        prob=jnp.asarray(1.0, REAL),
        eta_scale=jnp.asarray(1.0, REAL),
        off_v=off_v,
        off_d=off_d,
        off_valid=off_valid,
        merged=jnp.zeros(4, bool),
        off_contrib=jnp.ones((4, 3), REAL),
        off_prob=jnp.ones(4, REAL),
        jacob=jnp.ones(4, REAL),
        active=base_v.valid,
        bounce=jnp.asarray(0, INT),
    )

    # sign -1: gradient stored as (base - offset); +1: (offset - base).
    _SIGNS = jnp.asarray([-1.0, 1.0, -1.0, 1.0], REAL)

    def cond(s):
        return s["active"] & (s["bounce"] <= n_iters)

    def body(s):
        base_v = s["base_v"]
        b = s["bounce"] + 1

        # --- light hit: accumulate this path-prefix's BF radiance and
        # one-sided differences, then KEEP TRACING (the reference's base
        # path bounces off emitters too, src/path_tracing.h:968-1010;
        # lajolla lights have materials). Each prefix uses its own
        # prob/jacobian/MIS weight — see module docstring. ---
        base_is_light = scene.shape_light_id[base_v.shape_id] >= 0
        hit_light = s["active"] & base_is_light & (s["prob"] > 0)
        emitted = lgt.emission_at_vertex(scene, static, base_v, -s["base_d"])
        prob_c = jnp.maximum(s["prob"], 1e-30)
        base_term = s["contrib"] * emitted
        primal_bf = s["primal_bf"] + jnp.where(
            hit_light, base_term / prob_c, jnp.zeros(3, REAL)
        )

        def offset_term(ov_valid, merged, ov, od, oc, op, oj):
            # Merged offsets share the base's vertex; replaying offsets
            # must sit on an emitter themselves for this prefix to have a
            # shifted counterpart (reference: small_gdpt.cpp:282-284,
            # shiftPath's terminal-emitter check).
            o_emit = lgt.emission_at_vertex(scene, static, ov, -od)
            o_is_light = scene.shape_light_id[ov.shape_id] >= 0
            term_valid = ov_valid & (merged | o_is_light)
            term_c = jnp.where(
                term_valid,
                jnp.where(merged, oc * emitted, oc * o_emit) * oj,
                jnp.zeros(3, REAL),
            )
            p_shift = op * oj
            w = jnp.where(
                term_valid,
                s["prob"] / jnp.maximum(s["prob"] + p_shift, 1e-30),
                1.0,
            )
            return term_c, w

        term_c, w_off = jax.vmap(offset_term)(
            s["off_valid"], s["merged"], s["off_v"], s["off_d"],
            s["off_contrib"], s["off_prob"], s["jacob"],
        )
        d_all = (term_c - base_term[None, :]) * _SIGNS[:, None] \
            * (w_off / prob_c)[:, None]
        diffs = s["diffs"] + jnp.where(
            hit_light, d_all, jnp.zeros((4, 3), REAL)
        )

        contrib = s["contrib"]
        off_contrib = s["off_contrib"]
        off_valid = s["off_valid"]

        # --- extension (continues through emitters) ---
        extend = s["active"]
        dir_view = -s["base_d"]
        params = mat.gather_params(scene, static, base_v)
        throughput = s["contrib"] / jnp.maximum(s["prob"], 1e-30)

        # Primal NEE (reference path-tracing NEE: src/path_tracing.h:115-227).
        radiance = s["radiance"]
        if static.n_lights > 0:
            nee = nee_contribution(
                scene, static, key, b, base_v, params, dir_view, used
            )
            radiance = radiance + jnp.where(extend, throughput * nee, jnp.zeros(3, REAL))

        uv_b = rng.uniform(key, b, rng.SLOT_BSDF_UV, (2,))
        w_b = rng.uniform(key, b, rng.SLOT_BSDF_W)
        samp = mat.sample_bsdf(params, dir_view, base_v, uv_b, w_b, used)
        f_base = mat.eval_bsdf(params, dir_view, samp.dir_out, base_v, used)
        pdf_base = mat.pdf_bsdf(params, dir_view, samp.dir_out, base_v, used)
        is_transmit = samp.valid & (samp.eta != 0)
        eta_scale = jnp.where(
            is_transmit,
            s["eta_scale"] / jnp.where(is_transmit, samp.eta, 1.0) ** 2,
            s["eta_scale"],
        )

        # Russian roulette on the base path (reference:
        # src/path_tracing.h:992-999 — same placement/cap, but the
        # survival probability is folded into prob and every offset prob
        # so the gradient pair stays unbiased; the factor cancels in the
        # shift MIS weights).
        num_vertices = s["bounce"] + 3
        do_rr = (num_vertices - 1) >= static.options.rr_depth
        rr_prob = jnp.where(
            do_rr,
            jnp.minimum(
                jnp.max(s["contrib"]) / (prob_c * jnp.maximum(eta_scale, 1e-20)),
                0.95,
            ),
            1.0,
        )
        u_rr = rng.uniform(key, b, rng.SLOT_RR)
        survive = (~do_rr) | (u_rr <= rr_prob)
        nxt = isect.intersect(
            scene, static, base_v.position, samp.dir_out,
            static.intersection_epsilon, BIG,
        )
        ok_base = samp.valid & (pdf_base > 0) & nxt.valid
        base_diffuse = _is_kind(scene, static, base_v.material_id, M.MAT_LAMBERTIAN)

        # Primal MIS-weighted emitter hit (reference: src/path_tracing.h:291-325).
        if static.n_lights > 0:
            dist2 = gm.distance_squared(nxt.position, base_v.position)
            g2 = jnp.abs(gm.dot(samp.dir_out, nxt.geom_normal)) / jnp.maximum(dist2, 1e-20)
            p2a = pdf_base * g2
            hit_light_id = scene.shape_light_id[nxt.shape_id]
            nxt_is_light = nxt.valid & (hit_light_id >= 0)
            lid = jnp.maximum(hit_light_id, 0)
            l_emit = lgt.emission_at_vertex(scene, static, nxt, -samp.dir_out)
            p1h = lgt.light_pmf(scene, lid) * lgt.pdf_point_on_light(
                scene, static, lid, nxt.position, nxt.geom_normal, base_v.position
            )
            w2 = p2a * p2a / jnp.maximum(p1h * p1h + p2a * p2a, 1e-30)
            c2 = g2 * f_base * l_emit / jnp.maximum(p2a, 1e-30)
            radiance = radiance + jnp.where(
                extend & ok_base & nxt_is_light, throughput * c2 * w2, jnp.zeros(3, REAL)
            )

        def offset_step(ov_valid, merged, ov, od, oc, op, oj):
            # Merged: follow the base factors
            # (reference: src/path_tracing.h:774-778).
            mc = oc * f_base
            mp = op * pdf_base

            o_params = mat.gather_params(scene, static, ov)
            o_view = -od
            o_diffuse = _is_kind(scene, static, ov.material_id, M.MAT_LAMBERTIAN)
            can_reconnect = base_diffuse & o_diffuse & nxt.valid

            # Reconnection to the base's next vertex
            # (reference: small_gdpt.cpp:248-269).
            to_next = nxt.position - ov.position
            dist = jnp.maximum(gm.length(to_next), 1e-20)
            dir_rec = to_next / dist
            probe = isect.intersect(
                scene, static, ov.position, dir_rec,
                static.intersection_epsilon, BIG,
            )
            probe_ok = probe.valid & (probe.prim_id == nxt.prim_id)
            f_rec = mat.eval_bsdf(o_params, o_view, dir_rec, ov, used)
            pdf_rec = mat.pdf_bsdf(o_params, o_view, dir_rec, ov, used)
            g_base = _geom_term(
                base_v.position, base_v.geom_normal, nxt.position, nxt.geom_normal
            )
            g_shift = _geom_term(
                ov.position, ov.geom_normal, nxt.position, nxt.geom_normal
            )
            rec_valid = probe_ok & (pdf_rec > 0)
            rec_c = oc * f_rec
            rec_p = op * pdf_rec
            rec_j = oj * g_shift / jnp.maximum(g_base, 1e-20)

            # Replay with the base's random numbers
            # (reference: small_gdpt.cpp:272-279).
            o_samp = mat.sample_bsdf(o_params, o_view, ov, uv_b, w_b, used)
            f_rep = mat.eval_bsdf(o_params, o_view, o_samp.dir_out, ov, used)
            pdf_rep = mat.pdf_bsdf(o_params, o_view, o_samp.dir_out, ov, used)
            o_nxt = isect.intersect(
                scene, static, ov.position, o_samp.dir_out,
                static.intersection_epsilon, BIG,
            )
            rep_valid = (
                o_samp.valid & (pdf_rep > 0) & o_nxt.valid
                & (o_nxt.material_id == nxt.material_id)
            )
            rep_c = oc * f_rep
            rep_p = op * pdf_rep
            rep_j = oj * pdf_base / jnp.maximum(pdf_rep, 1e-20)

            do_rec = can_reconnect & ~merged
            new_merged = merged | do_rec
            new_valid = ov_valid & jnp.where(
                merged, True, jnp.where(do_rec, rec_valid, rep_valid)
            )
            pick3 = lambda m, a, b_: jnp.where(m, a, b_)
            new_c = pick3(merged, mc, pick3(do_rec, rec_c, rep_c))
            # Offsets share the base's RR decision and survival prob.
            new_p = pick3(merged, mp, pick3(do_rec, rec_p, rep_p)) * rr_prob
            new_j = pick3(merged, oj, pick3(do_rec, rec_j, rep_j))
            # Offset's current vertex: merged offsets ride the base vertex;
            # replaying offsets move to their own next hit.
            new_v = jax.tree_util.tree_map(
                lambda a, b_: jnp.where(new_merged, a, b_), nxt, o_nxt
            )
            new_d = jnp.where(new_merged, samp.dir_out, o_samp.dir_out)
            # Select against no-op when this lane isn't extending or the
            # offset is already invalid.
            upd = extend & ov_valid
            sel = lambda n, o: jnp.where(upd, n, o)
            return (
                jnp.where(upd, new_valid, ov_valid),
                jnp.where(upd, new_merged, merged),
                jax.tree_util.tree_map(lambda n, o: jnp.where(upd, n, o), new_v, ov),
                sel(new_d, od),
                sel(new_c, oc),
                sel(new_p, op),
                sel(new_j, oj),
            )

        (off_valid2, merged2, off_v2, off_d2, off_c2, off_p2, off_j2) = jax.vmap(
            offset_step
        )(off_valid, s["merged"], s["off_v"], s["off_d"], off_contrib,
          s["off_prob"], s["jacob"])

        upd_base = extend & ok_base & survive
        new_contrib = jnp.where(upd_base, contrib * f_base, contrib)
        new_prob = jnp.where(upd_base, s["prob"] * pdf_base * rr_prob, s["prob"])
        new_base_v = jax.tree_util.tree_map(
            lambda n, o: jnp.where(upd_base, n, o), nxt, base_v
        )
        new_base_d = jnp.where(upd_base, samp.dir_out, s["base_d"])

        active = s["active"] & ok_base & survive

        return dict(
            radiance=radiance,
            primal_bf=primal_bf,
            diffs=diffs,
            base_v=new_base_v,
            base_d=new_base_d,
            contrib=new_contrib,
            prob=new_prob,
            eta_scale=jnp.where(upd_base, eta_scale, s["eta_scale"]),
            off_v=off_v2,
            off_d=off_d2,
            off_valid=off_valid2,
            merged=merged2,
            off_contrib=off_c2,
            off_prob=off_p2,
            jacob=off_j2,
            active=active,
            bounce=s["bounce"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)

    # Accumulated per-prefix terms (reference pairing:
    # src/path_tracing.h:1016-1049, small_gdpt.cpp:488-507 — but one term
    # per light hit instead of one product at loop end).
    # gx_here at x estimates u[x] - u[x-1]: base - offset(x-1).
    return GdptSample(
        primal=out["radiance"],
        primal_bf=out["primal_bf"],
        gx_here=out["diffs"][0],
        gx_next=out["diffs"][1],
        gy_here=out["diffs"][2],
        gy_next=out["diffs"][3],
    )


def render_gradpath(scene: Scene, spp=None, seed=0, return_aux=False,
                    start_sample=0, init_acc=None, on_chunk=None):
    """GDPT render driver: accumulate primal + 4 gradient buffers, then
    screened-Poisson reconstruct (reference: src/render.cpp:257-370)."""
    from functools import partial

    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n_pix = w * h
    ys, xs = np.mgrid[0:h, 0:w]
    xs_d = jnp.asarray(xs.ravel(), REAL)
    ys_d = jnp.asarray(ys.ravel(), REAL)
    pix = jnp.arange(n_pix, dtype=jnp.int32)

    @partial(jax.jit, static_argnames=("n_samples",))
    def gdpt_pass(device, sample0, n_samples):
        base_key = jax.random.PRNGKey(seed)

        def one_sample(s, acc):
            def per_ray(x, y, p):
                key = rng.ray_key(base_key, p * spp + sample0 + s)
                return trace_gdpt(device, static, x, y, key)

            out = jax.vmap(per_ray)(xs_d, ys_d, pix)
            return jax.tree_util.tree_map(lambda a, o: a + o, acc, out)

        zero = GdptSample(*(jnp.zeros((n_pix, 3), REAL) for _ in range(6)))
        return jax.lax.fori_loop(0, n_samples, one_sample, zero)

    # ~5x the rays of a plain path sample per GDPT sample.
    batch = max(1, (1 << 18) // n_pix)
    if init_acc is None:
        acc = np.zeros((6, n_pix, 3), np.float64)
    else:
        acc = np.asarray(init_acc, np.float64).copy()
    done = int(start_sample)
    while done < spp:
        n = min(batch, spp - done)
        out = gdpt_pass(scene.device, done, n)
        for i, a in enumerate(out):
            acc[i] += np.asarray(a, np.float64)
        done += n
        if on_chunk is not None:
            on_chunk(acc, done)

    primal, primal_bf, gxh, gxn, gyh, gyn = (
        (a / spp).reshape(h, w, 3).astype(np.float32) for a in acc
    )
    gx, gy = poisson.assemble_gradients(
        jnp.asarray(gxh), jnp.asarray(gxn), jnp.asarray(gyh), jnp.asarray(gyn)
    )
    recon = poisson.screened_poisson_solve(
        jnp.asarray(primal), gx, gy, static.options.gdpt_alpha
    )
    recon = np.where(np.isfinite(recon), np.asarray(recon), 0.0).astype(np.float32)
    if return_aux:
        return recon, dict(
            primal=primal, primal_bf=primal_bf,
            gx=np.asarray(gx), gy=np.asarray(gy),
        )
    return recon
