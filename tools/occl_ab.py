"""A/B the in-render shadow (occluded) trace cost: same shadow-ray
population as nee_soa, dispatched (a) full pool width as in-render,
(b) compacted to the live prefix, (c) chained xK at full width (SOL
methodology) — splits fixed-per-dispatch cost from per-ray cost.

Usage: python tools/occl_ab.py [scene.xml] [--pool N] [--chain K]
"""
import argparse
import os
import sys

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
from gdpt_tpu.scene import parser
from tools.profile_wavefront import timed
from tools.wavefront_visits import capture_pool_rays
from gdpt_tpu.ops import materials_soa as msoa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default=(
        "/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml"))
    ap.add_argument("--pool", type=int, default=1 << 18)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    scene, _ = parser.parse_scene(args.scene)
    static = scene.static
    sc = ps.scene_soa_from_aos(scene)
    used = static.used_material_kinds
    rays = capture_pool_rays(scene, warm_chunks=3, pool=args.pool)
    org = V3(*(jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")))
    d = V3(*(jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")))
    n = org.x.shape[0]

    hit, gn_raw = trs.intersect_soa_gn(static, sc.geom, org, d, 0.0, BIG)
    v = ps.shade_hit(static, sc, org, d, hit, gn_raw)
    idx = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.asarray(0, jnp.uint32)
    lu0, lu1 = soa.uniform2(seed, idx, jnp.uint32(3), 0)
    lw, lsw = soa.uniform2(seed, idx, jnp.uint32(4), 0)
    ext = v.valid > 0

    light_id, p_l, n_l, pdf_pt, is_env = ps.sample_light_point(
        static, sc, v.position, lu0, lu1, lw, lsw)
    to_l = p_l - v.position
    dist = soa.length(to_l)
    dl = soa.where(is_env, -1.0 * n_l, to_l * (1.0 / jnp.maximum(dist, 1e-20)))
    eps_shadow = static.shadow_epsilon
    # Same "need" thinning as nee_soa (zero-contribution lanes dead).
    params = msoa.gather_params_soa(
        sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
        static.spec_image_slots, float_tex_slots=static.float_tex_slots,
        fp=v.fp)
    f_nee = msoa.eval_bsdf_soa(params, -1.0 * d, dl, v.gn, v.frame, used)
    g_area = jnp.maximum(-soa.dot(dl, n_l), 0.0) / jnp.maximum(dist * dist, 1e-20)
    g_geo = jnp.where(is_env, 1.0, g_area)
    need = ext & (g_geo > 0) & (soa.vmax(f_nee) > 0)
    tfar = jnp.where(is_env, BIG, (1.0 - eps_shadow) * dist)
    tfar = jnp.where(need, tfar, -1.0)
    pos = v.position
    live = int(jnp.sum(tfar > 0))
    print(f"pool={n} live_shadow={live}", flush=True)

    @jax.jit
    def occ_full(pos, dl, tfar):
        return trs.occluded_soa(static, sc.geom, pos, dl, eps_shadow, tfar)

    _, t = timed(lambda: occ_full(pos, dl, tfar))
    print(f"  (a) full-width {n}:           {t*1e3:8.1f} ms "
          f"({live/t/1e6:.2f} Mrays/s live)", flush=True)

    # (b) compacted live prefix, pow2-bucketed
    order = np.argsort(~np.asarray(tfar > 0), kind="stable")
    width = 8 * 128
    while width < live:
        width *= 2
    sel = order[:width]
    posb = V3(*(jnp.asarray(np.asarray(x)[sel]) for x in (pos.x, pos.y, pos.z)))
    dlb = V3(*(jnp.asarray(np.asarray(x)[sel]) for x in (dl.x, dl.y, dl.z)))
    tfb = jnp.asarray(np.asarray(tfar)[sel])

    @jax.jit
    def occ_cmp(p, dd, tf):
        return trs.occluded_soa(static, sc.geom, p, dd, eps_shadow, tf)

    _, t = timed(lambda: occ_cmp(posb, dlb, tfb))
    print(f"  (b) compacted {width}:        {t*1e3:8.1f} ms "
          f"({live/t/1e6:.2f} Mrays/s live)", flush=True)

    # (c) chained xK at full width: origin nudged per step (anti-hoist)
    K = args.chain

    @jax.jit
    def occ_chain(pos, dl, tfar):
        acc = jnp.zeros(n, jnp.float32)
        p = pos
        for k in range(K):
            o = trs.occluded_soa(static, sc.geom, p, dl, eps_shadow, tfar)
            acc = acc + o.astype(jnp.float32)
            p = p + dl * (1e-7 * (k + 1))
        return acc

    _, t = timed(lambda: occ_chain(pos, dl, tfar))
    print(f"  (c) chained x{K} full-width:   {t*1e3:8.1f} ms total, "
          f"{t/K*1e3:8.1f} ms/step ({live*K/t/1e6:.2f} Mrays/s live)",
          flush=True)

    # (d) chained xK compacted
    nb = int(tfb.shape[0])

    @jax.jit
    def occ_chain_b(p0, dd, tf):
        acc = jnp.zeros(nb, jnp.float32)
        p = p0
        for k in range(K):
            o = trs.occluded_soa(static, sc.geom, p, dd, eps_shadow, tf)
            acc = acc + o.astype(jnp.float32)
            p = p + dd * (1e-7 * (k + 1))
        return acc

    _, t = timed(lambda: occ_chain_b(posb, dlb, tfb))
    print(f"  (d) chained x{K} compacted:    {t*1e3:8.1f} ms total, "
          f"{t/K*1e3:8.1f} ms/step ({live*K/t/1e6:.2f} Mrays/s live)",
          flush=True)


if __name__ == "__main__":
    main()
