"""Per-stage breakdown of one wavefront iteration (path_soa._wavefront_body).

Where profile_render.py replays the banded loop per bounce, this replays
the WAVEFRONT body stage by stage on a steady-state lane pool, so the
in-render/kernel gap on packet scenes (round-5 perf item; VERDICT r04 #1)
splits into: regen, extension trace (with/without per-dispatch sort),
shade_hit, emitter/env radiance, material param gather, NEE (incl. shadow
trace), BSDF sample/eval/pdf, and the pixel scatter-add.

Usage: python tools/profile_wavefront.py [scene.xml] [--pool N] [--warm K]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdpt_tpu.accel import traverse_soa as trs
from gdpt_tpu.core import soa
from gdpt_tpu.core.dtypes import BIG, REAL
from gdpt_tpu.core.soa import V3
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.ops import materials_soa as msoa
from gdpt_tpu.ops import textures_soa as tsoa
from gdpt_tpu.scene import parser


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "scene", nargs="?",
        default="/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml")
    ap.add_argument("--pool", type=int, default=1 << 18)
    ap.add_argument("--warm", type=int, default=3,
                    help="wavefront chunks (x8 iters) before profiling")
    ap.add_argument("--spp", type=int, default=64)
    args = ap.parse_args()

    scene, _ = parser.parse_scene(args.scene)
    static = scene.static
    camera = scene.device.camera
    w, h = static.width, static.height
    n_pix = w * h
    sc = ps.scene_soa_from_aos(scene)
    used = static.used_material_kinds
    pool = args.pool
    lane_q = 8 * 128
    pool = -(-pool // lane_q) * lane_q
    print(f"scene {args.scene}: {w}x{h}, {static.n_tris} tris, "
          f"packet={'yes' if sc.geom.packet is not None else 'no'}, pool={pool}",
          flush=True)

    total = n_pix * args.spp
    z = lambda: jnp.zeros(pool, REAL)
    st = dict(
        org=V3(z(), z(), z()), d=V3(jnp.ones(pool, REAL), z(), z()),
        tp=V3(z(), z(), z()), pdf_prev=jnp.zeros(pool, REAL),
        eta_scale=jnp.ones(pool, REAL), rr_prev=jnp.ones(pool, REAL),
        cont=jnp.ones(pool, REAL), radius=jnp.zeros(pool, REAL),
        spread=jnp.zeros(pool, REAL), pixel=jnp.zeros(pool, jnp.uint32),
        sample=jnp.zeros(pool, jnp.uint32), bounce=jnp.zeros(pool, jnp.int32),
        alive=jnp.zeros(pool, REAL), next_item=jnp.asarray(0, jnp.uint32),
        total=jnp.asarray(total, jnp.uint32), seed=jnp.asarray(0, jnp.uint32),
        rays=jnp.asarray(0.0, REAL), occ_sum=jnp.asarray(0.0, REAL),
        iters=jnp.asarray(0.0, REAL),
        acc_x=jnp.zeros(n_pix, REAL), acc_y=jnp.zeros(n_pix, REAL),
        acc_z=jnp.zeros(n_pix, REAL),
    )

    body = jax.jit(lambda s: ps._wavefront_body(static, camera, sc, s))
    for _ in range(args.warm * 8):
        st = body(st)
    jax.block_until_ready(st)
    n_alive = int(jnp.sum(st["alive"] > 0))
    print(f"steady state after {args.warm * 8} iters: alive={n_alive}/{pool} "
          f"({n_alive / pool:.2f}), next_item={int(st['next_item'])}/{total}",
          flush=True)

    # --- full body ---
    _, t_body = timed(body, st)
    print(f"full _wavefront_body:        {t_body * 1e3:8.1f} ms "
          f"({t_body / pool * 1e9:6.0f} ns/lane)", flush=True)

    # Reconstruct the body's intermediates once (post-regen rays).
    @jax.jit
    def regen(s):
        dead = s["alive"] <= 0
        rank = jnp.cumsum(dead.astype(jnp.uint32)) - 1
        item = s["next_item"] + jnp.where(dead, rank, 0)
        issue = dead & (item < s["total"]) & (item >= s["next_item"])
        pixel = jnp.where(issue, item % jnp.uint32(n_pix), s["pixel"])
        sample = jnp.where(issue, item // jnp.uint32(n_pix), s["sample"])
        xs = (pixel % jnp.uint32(w)).astype(REAL)
        ys = (pixel // jnp.uint32(w)).astype(REAL)
        u0, u1 = soa.uniform2(s["seed"], pixel, jnp.uint32(ps._CTR_PIXEL),
                              sample)
        porg, pd = ps.primary_rays_soa(static, camera, xs, ys, u0, u1)
        org = soa.where(issue, porg, s["org"])
        d = soa.where(issue, pd, s["d"])
        bounce = jnp.where(issue, 0, s["bounce"])
        alive = jnp.where(issue, True, s["alive"] > 0)
        return org, d, bounce, alive, pixel, sample

    (org, d, bounce, alive, pixel, sample), t_regen = timed(regen, st)
    print(f"  regen:                     {t_regen * 1e3:8.1f} ms", flush=True)

    tnear = jnp.where(bounce == 0, 0.0, static.intersection_epsilon)
    tfar = jnp.where(alive, BIG, -1.0)

    @jax.jit
    def trace_sorted(org, d, tnear, tfar):
        return trs.intersect_soa_gn(static, sc.geom, org, d, tnear, tfar,
                                    sort_rays=True)

    @jax.jit
    def trace_unsorted(org, d, tnear, tfar):
        return trs.intersect_soa_gn(static, sc.geom, org, d, tnear, tfar,
                                    sort_rays=False)

    (hit, gn_raw), t_tr = timed(trace_sorted, org, d, tnear, tfar)
    _, t_tru = timed(trace_unsorted, org, d, tnear, tfar)
    n_rays = int(jnp.sum(tfar > 0))
    print(f"  extension trace (sorted):  {t_tr * 1e3:8.1f} ms "
          f"({n_rays / t_tr / 1e6:5.2f} Mrays/s over live)", flush=True)
    print(f"  extension trace (no sort): {t_tru * 1e3:8.1f} ms "
          f"({n_rays / t_tru / 1e6:5.2f} Mrays/s over live)", flush=True)

    @jax.jit
    def shade(org, d, hit, gn_raw, radius, spread):
        return ps.shade_hit(static, sc, org, d, hit, gn_raw,
                            ray_radius=radius, ray_spread=spread)

    v, t_sh = timed(shade, org, d, hit, gn_raw, st["radius"], st["spread"])
    print(f"  shade_hit:                 {t_sh * 1e3:8.1f} ms", flush=True)

    @jax.jit
    def gather_p(v):
        return msoa.gather_params_soa(
            sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
            static.spec_image_slots, float_tex_slots=static.float_tex_slots,
            fp=v.fp)

    params, t_gp = timed(gather_p, v)
    print(f"  gather_params:             {t_gp * 1e3:8.1f} ms", flush=True)

    seed = st["seed"]
    b = bounce + 1
    ctr = lambda c: (b.astype(jnp.uint32) * jnp.uint32(ps._CTR_STRIDE)
                     + jnp.uint32(c))
    v_ok = (v.valid > 0) & alive
    ext = v_ok & (st["cont"] > 0)
    dir_view = -1.0 * d

    if static.n_lights > 0:
        @jax.jit
        def nee(v, params, ext, pixel, sample):
            lu0, lu1 = soa.uniform2(seed, pixel, ctr(ps._CTR_LIGHT_UV), sample)
            lw, lsw = soa.uniform2(seed, pixel, ctr(ps._CTR_LIGHT_W), sample)
            return ps.nee_soa(static, sc, v, params, dir_view, used,
                              lu0, lu1, lw, lsw, ext)

        (nee_c, sm), t_nee = timed(nee, v, params, ext, pixel, sample)
        n_sh = int(jnp.sum(sm))
        print(f"  NEE (incl shadow trace):   {t_nee * 1e3:8.1f} ms "
              f"({n_sh} shadow rays)", flush=True)

    @jax.jit
    def bsdf_smp(v, params, pixel, sample):
        bu0, bu1 = soa.uniform2(seed, pixel, ctr(ps._CTR_BSDF_UV), sample)
        w_lobe, u_rr = soa.uniform2(seed, pixel, ctr(ps._CTR_BSDF_W), sample)
        samp = msoa.sample_bsdf_soa(params, dir_view, v.gn, v.frame,
                                    bu0, bu1, w_lobe, used)
        f_b = msoa.eval_bsdf_soa(params, dir_view, samp.dir_out, v.gn,
                                 v.frame, used)
        pdf_b = msoa.pdf_bsdf_soa(params, dir_view, samp.dir_out, v.gn,
                                  v.frame, used)
        return samp, f_b, pdf_b

    _, t_bs = timed(bsdf_smp, v, params, pixel, sample)
    print(f"  bsdf sample+eval+pdf:      {t_bs * 1e3:8.1f} ms", flush=True)

    if static.has_envmap:
        @jax.jit
        def envm(d, spread):
            return tsoa.envmap_emission_soa(
                ps._env_view(static, sc), sc.mat_tables.pool3, d,
                spread=spread)

        _, t_env = timed(envm, d, st["spread"])
        print(f"  envmap_emission:           {t_env * 1e3:8.1f} ms",
              flush=True)

    @jax.jit
    def scatter(acc, pixel, c):
        return acc.at[pixel].add(c)

    _, t_sc = timed(scatter, st["acc_x"], pixel, st["rr_prev"])
    print(f"  pixel scatter-add (x1 ch): {t_sc * 1e3:8.1f} ms", flush=True)

    stages = t_regen + t_tr + t_sh + t_gp + t_bs + 3 * t_sc
    if static.n_lights > 0:
        stages += t_nee
    if static.has_envmap:
        stages += t_env
    print(f"  [sum of stages]            {stages * 1e3:8.1f} ms "
          f"(body = {t_body * 1e3:.1f} ms; gap = fusion/overlap)", flush=True)


if __name__ == "__main__":
    main()
