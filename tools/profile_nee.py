"""Sub-decompose the NEE stage of the path wavefront body: light-point
sampling, BSDF eval+pdf toward the light, the env-NEE radiance tap, and
the occluded (shadow) trace, each timed as its own jit on the same
steady-state pool as tools/profile_wavefront.py.

Usage: python tools/profile_nee.py [scene.xml] [--pool N]
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
from tools.profile_wavefront import timed
from tools.wavefront_visits import capture_pool_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default=(
        "/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml"))
    ap.add_argument("--pool", type=int, default=1 << 18)
    args = ap.parse_args()

    scene, _ = parser.parse_scene(args.scene)
    static = scene.static
    sc = ps.scene_soa_from_aos(scene)
    used = static.used_material_kinds
    rays = capture_pool_rays(scene, warm_chunks=3, pool=args.pool)
    org = V3(*(jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")))
    d = V3(*(jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")))
    n = org.x.shape[0]
    print(f"pool={n}", flush=True)

    hit, gn_raw = trs.intersect_soa_gn(static, sc.geom, org, d, 0.0, BIG)
    v = ps.shade_hit(static, sc, org, d, hit, gn_raw)
    params = msoa.gather_params_soa(
        sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
        static.spec_image_slots, float_tex_slots=static.float_tex_slots,
        fp=v.fp)
    jax.block_until_ready(params.base_color.x if hasattr(params, "base_color")
                          else v.uv_u)
    idx = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.asarray(0, jnp.uint32)
    lu0, lu1 = soa.uniform2(seed, idx, jnp.uint32(3), 0)
    lw, lsw = soa.uniform2(seed, idx, jnp.uint32(4), 0)
    ext = v.valid > 0
    dir_view = -1.0 * d

    @jax.jit
    def slp():
        return ps.sample_light_point(static, sc, v.position,
                                     lu0, lu1, lw, lsw)

    (light_id, p_l, n_l, pdf_pt, is_env), t = timed(slp)
    print(f"  sample_light_point:        {t*1e3:8.1f} ms", flush=True)

    to_l = p_l - v.position
    dist = soa.length(to_l)
    dl = soa.where(is_env, -1.0 * n_l, to_l * (1.0 / jnp.maximum(dist, 1e-20)))
    dl = V3(*(jax.block_until_ready(x) for x in (dl.x, dl.y, dl.z)))

    @jax.jit
    def ev():
        return msoa.eval_bsdf_soa(params, dir_view, dl, v.gn, v.frame, used)

    f_nee, t = timed(ev)
    print(f"  eval_bsdf(dl):             {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def pdfb():
        return msoa.pdf_bsdf_soa(params, dir_view, dl, v.gn, v.frame, used)

    _, t = timed(pdfb)
    print(f"  pdf_bsdf(dl):              {t*1e3:8.1f} ms", flush=True)

    if static.has_envmap:
        @jax.jit
        def envt():
            return tsoa.envmap_emission_soa(
                ps._env_view(static, sc), sc.mat_tables.pool3, dl)

        _, t = timed(envt)
        print(f"  env NEE radiance tap:      {t*1e3:8.1f} ms", flush=True)

    eps_shadow = static.shadow_epsilon
    tfar = jnp.where(is_env, BIG, (1.0 - eps_shadow) * dist)
    tfar = jnp.where(ext, tfar, -1.0)
    tfar = jax.block_until_ready(tfar)

    @jax.jit
    def occ():
        return trs.occluded_soa(static, sc.geom, v.position, dl,
                                eps_shadow, tfar)

    _, t = timed(occ)
    print(f"  occluded_soa:              {t*1e3:8.1f} ms "
          f"({int(jnp.sum(tfar > 0))} live shadow rays)", flush=True)

    @jax.jit
    def full():
        return ps.nee_soa(static, sc, v, params, dir_view, used,
                          lu0, lu1, lw, lsw, ext)

    _, t = timed(full)
    print(f"  full nee_soa:              {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
