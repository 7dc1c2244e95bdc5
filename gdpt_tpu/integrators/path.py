"""Unidirectional surface path tracer with NEE + power-heuristic MIS.

Bounce-major re-design of reference: src/path_tracing.h:13-348 for TPU:
one per-ray program (vmapped over a flat (pixel, sample) batch) whose
bounce loop is a ``lax.while_loop``; every data-dependent 'break' of the
reference becomes an ``active`` mask. Rays in a batch retire as they die;
XLA runs the loop until the whole batch is done.

Divergences from the reference, on purpose:
- the MIS weight w2 is applied to BSDF-sampled *area light* hits as well
  (the reference computes w2 but forgets to multiply at
  src/path_tracing.h:303-306; the envmap branch at :321-324 does apply it);
- when max_depth == -1 the loop is additionally capped at 64 bounces
  (Russian roulette at 0.95 makes deeper contributions negligible).
"""

import jax
import jax.numpy as jnp

from gdpt_tpu.core import math as gm
from gdpt_tpu.core import rng
from gdpt_tpu.core.dtypes import BIG, REAL
from gdpt_tpu.ops import intersect as isect
from gdpt_tpu.ops import lights as lgt
from gdpt_tpu.ops import materials as mat
from gdpt_tpu.scene import camera as gcam
from gdpt_tpu.scene.build import DeviceScene, SceneStatic

HARD_BOUNCE_CAP = 64


def max_bounce_iters(static: SceneStatic) -> int:
    """Number of bounce-loop iterations (reference loop runs
    num_vertices = 3 .. max_depth + 1, src/path_tracing.h:85)."""
    md = static.options.max_depth
    return HARD_BOUNCE_CAP if md < 0 else max(md - 1, 0)


def nee_contribution(scene, static, key, bounce, vertex, params, dir_view,
                     used_kinds):
    """Next-event estimation at a surface vertex with power-2 MIS
    (reference: src/path_tracing.h:115-227). Returns w1 * C1 / p1."""
    light_uv = rng.uniform(key, bounce, rng.SLOT_LIGHT_UV, (2,))
    light_w = rng.uniform(key, bounce, rng.SLOT_LIGHT_W)
    shape_w = rng.uniform(key, bounce, rng.SLOT_SHAPE_W)
    light_id = lgt.sample_light_id(scene, light_w)
    p_l, n_l = lgt.sample_point_on_light(
        scene, static, light_id, vertex.position, light_uv, shape_w
    )
    is_env = static.has_envmap & (light_id == static.envmap_light_id)
    to_light = p_l - vertex.position
    dist = gm.length(to_light)
    dir_area = to_light / jnp.maximum(dist, 1e-20)
    dir_light = jnp.where(is_env, -n_l, dir_area)

    eps = static.shadow_epsilon
    tfar = jnp.where(is_env, BIG, (1.0 - eps) * dist)
    blocked = isect.occluded(scene, static, vertex.position, dir_light, eps, tfar)
    g_area = jnp.maximum(-gm.dot(dir_light, n_l), 0.0) / jnp.maximum(dist * dist, 1e-20)
    g = jnp.where(is_env, 1.0, g_area)
    g = jnp.where(blocked, 0.0, g)

    p1 = lgt.light_pmf(scene, light_id) * lgt.pdf_point_on_light(
        scene, static, light_id, p_l, n_l, vertex.position
    )
    f = mat.eval_bsdf(params, dir_view, dir_light, vertex, used_kinds)
    radiance = lgt.emission_light(scene, static, light_id, -dir_light, 0.0, p_l, n_l)
    p2 = mat.pdf_bsdf(params, dir_view, dir_light, vertex, used_kinds) * g
    ok = (g > 0) & (p1 > 0)
    w1 = jnp.where(ok, p1 * p1 / jnp.maximum(p1 * p1 + p2 * p2, 1e-30), 0.0)
    c1 = g * f * radiance / jnp.maximum(p1, 1e-30)
    return jnp.where(ok, c1 * w1, jnp.zeros(3, REAL))


def trace_path(scene: DeviceScene, static: SceneStatic, x, y, key):
    """Radiance estimate for one sample of pixel (x, y)."""
    return trace_path_stats(scene, static, x, y, key)[0]


def trace_path_stats(scene: DeviceScene, static: SceneStatic, x, y, key):
    """Like trace_path but also returns the number of rays cast (primary +
    shadow + scatter), for Mrays/s benchmarking."""
    w, h = static.width, static.height
    used = static.used_material_kinds
    u_px = rng.uniform(key, 0, rng.SLOT_PIXEL, (2,))
    screen = jnp.stack([(x + u_px[0]) / w, (y + u_px[1]) / h])
    org, d = gcam.sample_primary(
        scene.camera, w, h, static.filter_kind, static.filter_param, screen
    )
    radius0, spread0 = gcam.init_ray_differential(w, h)
    vertex = isect.intersect(scene, static, org, d, 0.0, BIG, radius0, spread0)

    # Primary miss: environment map or black
    # (reference: src/path_tracing.h:31-42).
    if static.has_envmap:
        miss_radiance = lgt.envmap_emission(scene, d, spread0)
    else:
        miss_radiance = jnp.zeros(3, REAL)

    radiance = jnp.where(vertex.valid, lgt.emission_at_vertex(scene, static, vertex, -d), miss_radiance)

    n_iters = max_bounce_iters(static)
    if n_iters == 0:
        return radiance, jnp.asarray(1.0, REAL)

    state = dict(
        radiance=radiance,
        throughput=jnp.ones(3, REAL),
        eta_scale=jnp.asarray(1.0, REAL),
        d=d,
        spread=spread0,
        vertex=vertex,
        active=vertex.valid,
        bounce=jnp.asarray(0, jnp.int32),
        rays=jnp.asarray(1.0, REAL),
    )

    def cond(s):
        return s["active"] & (s["bounce"] < n_iters)

    def body(s):
        vertex = s["vertex"]
        d = s["d"]
        bounce = s["bounce"]
        b = bounce + 1  # rng stream index; 0 is the camera sample
        dir_view = -d
        params = mat.gather_params(scene, static, vertex)

        # --- next event estimation ---
        rays = s["rays"]
        if static.n_lights > 0:
            nee = nee_contribution(scene, static, key, b, vertex, params, dir_view, used)
            radiance = s["radiance"] + s["throughput"] * nee
            rays = rays + 1.0  # shadow ray
        else:
            radiance = s["radiance"]
        rays = rays + 1.0  # scatter ray

        # --- BSDF sampling (reference: src/path_tracing.h:232-345) ---
        uv_b = rng.uniform(key, b, rng.SLOT_BSDF_UV, (2,))
        w_b = rng.uniform(key, b, rng.SLOT_BSDF_W)
        samp = mat.sample_bsdf(params, dir_view, vertex, uv_b, w_b, used)
        active = s["active"] & samp.valid
        d_out = samp.dir_out

        is_transmit = samp.eta != 0
        spread = jnp.where(
            is_transmit,
            gcam.ray_diff_refract(vertex.ray_radius, s["spread"], vertex.mean_curvature,
                                  jnp.where(is_transmit, samp.eta, 1.0), samp.roughness),
            gcam.ray_diff_reflect(vertex.ray_radius, s["spread"], vertex.mean_curvature,
                                  samp.roughness),
        )
        eta_scale = jnp.where(
            is_transmit, s["eta_scale"] / jnp.where(is_transmit, samp.eta, 1.0) ** 2,
            s["eta_scale"],
        )

        nxt = isect.intersect(
            scene, static, vertex.position, d_out,
            static.intersection_epsilon, BIG, vertex.ray_radius, spread,
        )
        dist2 = gm.distance_squared(nxt.position, vertex.position)
        g = jnp.where(
            nxt.valid,
            jnp.abs(gm.dot(d_out, nxt.geom_normal)) / jnp.maximum(dist2, 1e-20),
            1.0,
        )
        f = mat.eval_bsdf(params, dir_view, d_out, vertex, used)
        p2 = mat.pdf_bsdf(params, dir_view, d_out, vertex, used)
        active &= p2 > 0
        p2_area = p2 * g

        # Hit an emissive surface: MIS-weighted contribution.
        if static.n_lights > 0:
            hit_light_id = scene.shape_light_id[nxt.shape_id]
            hit_light = nxt.valid & (hit_light_id >= 0)
            lid = jnp.maximum(hit_light_id, 0)
            light_radiance = lgt.emission_at_vertex(scene, static, nxt, -d_out)
            p1 = lgt.light_pmf(scene, lid) * lgt.pdf_point_on_light(
                scene, static, lid, nxt.position, nxt.geom_normal, vertex.position
            )
            w2 = p2_area * p2_area / jnp.maximum(p1 * p1 + p2_area * p2_area, 1e-30)
            c2 = g * f * light_radiance / jnp.maximum(p2_area, 1e-30)
            radiance += jnp.where(
                active & hit_light, s["throughput"] * c2 * w2, jnp.zeros(3, REAL)
            )
        if static.has_envmap:
            env_l = lgt.envmap_emission(scene, d_out, spread)
            env_uv, sin_e = lgt.envmap_uv_from_dir(scene, d_out)
            from gdpt_tpu.core.distributions import pdf_2d

            p1e = lgt.light_pmf(scene, jnp.asarray(static.envmap_light_id)) * jnp.where(
                sin_e > 0,
                pdf_2d(scene.envmap.dist, env_uv)
                / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_e, 1e-20),
                0.0,
            )
            w2e = p2_area * p2_area / jnp.maximum(p1e * p1e + p2_area * p2_area, 1e-30)
            c2e = g * f * env_l / jnp.maximum(p2_area, 1e-30)
            radiance += jnp.where(
                active & ~nxt.valid, s["throughput"] * c2e * w2e, jnp.zeros(3, REAL)
            )

        active &= nxt.valid

        # Russian roulette (reference: src/path_tracing.h:334-341).
        num_vertices = bounce + 3
        do_rr = (num_vertices - 1) >= static.options.rr_depth
        rr_prob = jnp.where(
            do_rr,
            jnp.minimum(jnp.max(s["throughput"] / eta_scale), 0.95),
            1.0,
        )
        u_rr = rng.uniform(key, b, rng.SLOT_RR)
        active &= (~do_rr) | (u_rr <= rr_prob)

        throughput = s["throughput"] * g * f / jnp.maximum(p2_area * rr_prob, 1e-30)
        throughput = jnp.where(active, throughput, s["throughput"])

        return dict(
            radiance=radiance,
            throughput=throughput,
            eta_scale=eta_scale,
            d=d_out,
            spread=spread,
            vertex=jax.tree_util.tree_map(
                lambda new, old: jnp.where(active, new, old), nxt, vertex
            ),
            active=active,
            bounce=bounce + 1,
            rays=rays,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["radiance"], out["rays"]
