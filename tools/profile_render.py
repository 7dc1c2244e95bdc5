"""Per-bounce breakdown of a SoA path-trace sample on a BVH scene.

Replays integrators/path_soa.trace_paths_soa stage by stage (same RNG
counters, same ray streams) with each stage in its own jit, so wall time
splits into: NEE shadow traversal, extension-ray traversal, and
everything else (materials/NEE math/state update). Also reports live
lanes per bounce and standalone traversal probes (primary-coherent vs
scene-random rays, and the morton argsort cost).

Usage: python tools/profile_render.py [scene.xml] [--spp-bounces N]
Env: GDPT_PACKET_ROWS sweeps the kernel shape.
"""

import argparse
import functools
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
from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.core.soa import V3
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.ops import materials_soa as msoa
from gdpt_tpu.scene import parser


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default="/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml")
    ap.add_argument("--bounces", type=int, default=16)
    ap.add_argument("--skip-probes", action="store_true")
    args = ap.parse_args()

    scene, _ = parser.parse_scene(args.scene)
    static = scene.static
    w, h = static.width, static.height
    n = w * h
    sc = ps.scene_soa_from_aos(scene)
    used = static.used_material_kinds
    print(f"scene {args.scene}: {w}x{h} = {n} lanes, "
          f"{static.n_tris} tris, packet={'yes' if sc.geom.packet is not None else 'no'}",
          flush=True)

    ys, xs = np.mgrid[0:h, 0:w]
    xs_d = jnp.asarray(xs.ravel(), REAL)
    ys_d = jnp.asarray(ys.ravel(), REAL)
    ray_idx = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.asarray(0, jnp.uint32)
    sample0 = jnp.asarray(0, jnp.uint32)

    def uni2(bounce, ctr):
        counter = jnp.asarray(bounce * ps._CTR_STRIDE + ctr, jnp.uint32)
        return soa.uniform2(seed, ray_idx, counter, sample0)

    # ---- jitted stages (static closes over `static`; sc passed as pytree)

    @jax.jit
    def gen_primary(sc):
        u0, u1 = uni2(0, ps._CTR_PIXEL)
        return ps.primary_rays_soa(static, scene.device.camera, xs_d, ys_d, u0, u1)

    @jax.jit
    def do_intersect(sc, org, d, tfar):
        return trs.intersect_soa_gn(static, sc.geom, org, d,
                                    static.intersection_epsilon, tfar)

    @jax.jit
    def do_intersect0(sc, org, d):
        return trs.intersect_soa_gn(static, sc.geom, org, d, 0.0, BIG)

    @jax.jit
    def do_shade(sc, org, d, hit, gn):
        return ps.shade_hit(static, sc, org, d, hit, gn)

    @functools.partial(jax.jit, static_argnames=("b",))
    def nee_rays(sc, v, b, active):
        """First half of ps.nee_soa: light sample -> shadow ray."""
        lu0, lu1 = uni2(b, ps._CTR_LIGHT_UV)
        lw, lsw = uni2(b, ps._CTR_LIGHT_W)
        light_id, p_l, n_l, pdf_pt, is_env = ps.sample_light_point(
            static, sc, v.position, lu0, lu1, lw, lsw)
        to_l = p_l - v.position
        dist = soa.length(to_l)
        dl = soa.where(is_env, -1.0 * n_l,
                       to_l * (1.0 / jnp.maximum(dist, 1e-20)))
        tfar = jnp.where(is_env, BIG, (1.0 - static.shadow_epsilon) * dist)
        tfar = jnp.where(active, tfar, -1.0)
        return dl, tfar

    @jax.jit
    def do_occluded(sc, org, dl, tfar):
        return trs.occluded_soa(static, sc.geom, org, dl,
                                static.shadow_epsilon, tfar)

    @functools.partial(jax.jit, static_argnames=("b",))
    def bsdf_stage(sc, v, b, d, active):
        """Materials math: params gather + full eval/sample/pdf."""
        dir_view = -d
        params = msoa.gather_params_soa(
            sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
            static.spec_image_slots, float_tex_slots=static.float_tex_slots)
        bu0, bu1 = uni2(b, ps._CTR_BSDF_UV)
        w_lobe, u_rr = uni2(b, ps._CTR_BSDF_W)
        samp = msoa.sample_bsdf_soa(params, dir_view, v.gn, v.frame,
                                    bu0, bu1, w_lobe, used)
        f_b = msoa.eval_bsdf_soa(params, dir_view, samp.dir_out, v.gn,
                                 v.frame, used)
        pdf_b = msoa.pdf_bsdf_soa(params, dir_view, samp.dir_out, v.gn,
                                  v.frame, used)
        act = active & (samp.valid > 0) & (pdf_b > 0)
        return samp.dir_out, act, u_rr

    @jax.jit
    def update_stage(sc, v, nxt, active, u_rr, bounce):
        """RR + live-lane bookkeeping (approximate: uniform 0.95 cap)."""
        nxt_ok = nxt.valid > 0
        act = active & nxt_ok
        do_rr = (bounce + 2) >= static.options.rr_depth
        act = act & ((~do_rr) | (u_rr <= 0.8))
        return act

    # ---- warm up all stages, then measure one full sample stepwise
    rows = []
    org, d = gen_primary(sc)
    for it in range(2):  # it 0 = compile pass, it 1 = measured
        rows = []
        (org, d), t_pri = timed(gen_primary, sc)
        (hit, gn), t_int = timed(do_intersect0, sc, org, d)
        v, t_shade = timed(do_shade, sc, org, d, hit, gn)
        active = hit.prim_id >= 0
        rows.append(("primary", int(n), t_int, 0.0, t_pri + t_shade))
        for b in range(1, args.bounces + 1):
            live = int(jnp.sum(active))
            if live == 0:
                break
            (dl, tfar), t_nee = timed(nee_rays, sc, v, b, active)
            occ, t_occ = timed(do_occluded, sc, v.position, dl, tfar)
            (d_out, act2, u_rr), t_mat = timed(bsdf_stage, sc, v, b, d, active)
            ext_tfar = jnp.where(act2, BIG, -1.0)
            (nhit, ngn), t_ext = timed(do_intersect, sc, v.position, d_out, ext_tfar)
            nv, t_sh2 = timed(do_shade, sc, v.position, d_out, nhit, ngn)
            act3, t_upd = timed(update_stage, sc, v, nv, act2, u_rr,
                                jnp.asarray(b, INT))
            rows.append((f"bounce{b}", live, t_ext, t_occ,
                         t_nee + t_mat + t_sh2 + t_upd))
            if b <= 3:
                print(f"  bounce{b} other split: nee_rays {t_nee*1e3:.1f} "
                      f"mat {t_mat*1e3:.1f} shade {t_sh2*1e3:.1f} "
                      f"upd {t_upd*1e3:.1f}", flush=True)
            v, d, active = nv, d_out, act3

    print(f"\n{'stage':>10} {'live':>8} {'intersect':>10} {'occluded':>10} {'other':>10}")
    tot_i = tot_o = tot_x = 0.0
    for name, live, ti, to, tx in rows:
        print(f"{name:>10} {live:>8} {ti*1e3:>9.1f}ms {to*1e3:>9.1f}ms {tx*1e3:>9.1f}ms")
        tot_i, tot_o, tot_x = tot_i + ti, tot_o + to, tot_x + tx
    tot = tot_i + tot_o + tot_x
    print(f"{'TOTAL':>10} {'':>8} {tot_i*1e3:>9.1f}ms {tot_o*1e3:>9.1f}ms "
          f"{tot_x*1e3:>9.1f}ms   (sum {tot*1e3:.1f}ms/sample)")

    if args.skip_probes or sc.geom.packet is None:
        return

    # ---- standalone traversal probes
    from gdpt_tpu.accel import packet_trace as pt

    bbox = np.asarray(sc.geom.packet.bbox)
    lo, hi = bbox[:3], bbox[3:]
    rng = np.random.RandomState(0)

    def rand_rays(m):
        o = lo + rng.rand(m, 3).astype(np.float32) * (hi - lo)
        dd = rng.randn(m, 3).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        return (V3(*(jnp.asarray(o[:, i]) for i in range(3))),
                V3(*(jnp.asarray(dd[:, i]) for i in range(3))))

    m = 1 << 20

    @jax.jit
    def probe(sc, o3, d3):
        t, prim, u, vv, gn = pt.intersect_packet(
            sc.geom.packet, o3, d3, 0.0, BIG,
            n_tris=static.n_tris if static.n_spheres else None)
        return prim

    @jax.jit
    def argsort_probe(keys):
        p = jnp.argsort(keys)
        return p, jnp.argsort(p)

    o3, d3 = rand_rays(m)
    probe(sc, o3, d3)  # compile
    _, t_inc = timed(probe, sc, o3, d3)
    print(f"\nincoherent {m} rays: {t_inc*1e3:.1f}ms = {m/t_inc/1e6:.2f} Mrays/s")

    # coherent: tile the primary rays up to m lanes
    reps = max(1, m // n)
    oc = V3(*(jnp.tile(getattr(org, c), reps) for c in "xyz"))
    dc = V3(*(jnp.tile(getattr(d, c), reps) for c in "xyz"))
    probe(sc, oc, dc)
    _, t_coh = timed(probe, sc, oc, dc)
    mc = reps * n
    print(f"coherent(primary) {mc} rays: {t_coh*1e3:.1f}ms = {mc/t_coh/1e6:.2f} Mrays/s")

    keys = jnp.asarray(rng.randint(0, 1 << 21, size=m), jnp.int32)
    argsort_probe(keys)
    _, t_sort = timed(argsort_probe, keys)
    print(f"argsort+unsort {m} keys: {t_sort*1e3:.1f}ms")


if __name__ == "__main__":
    main()
