"""Microbench: envmap bilinear-lookup strategies on TPU.

The round-5 wavefront profile shows envmap_emission_soa costs ~71 ms
per iteration at 262k lanes on disney_bsdf (and it is called twice per
iteration: carried-MIS env hit + NEE env tap), making env lookups the
single largest non-trace cost. The current path is the generic
bilinear_level0: 3 metadata gathers (w/h/off by img_id) + 12 data
gathers (4 taps x 3 channels as separate V3 component arrays), plus
atan2/acos for the uv transform. The env image is a single static
image, so the metadata gathers are removable and the taps can be
restructured. Variants:

  uv_only    : transform only (atan2/acos/sqrt) — floor cost
  current    : envmap_emission_soa as shipped
  static12   : static w/h/off, 12 single-element gathers
  slice4x3   : (h*w, 3)-layout image, 4 gathers with slice (1,3)
  slice223   : (h+1, w+1, 3) wrap-padded image, 1 gather slice (2,2,3)

Usage: python tools/env_lookup_bench.py [n_lanes]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core import soa
from gdpt_tpu.core.soa import V3
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.ops import textures_soa as tsoa
from gdpt_tpu.scene import parser

REAL = jnp.float32
INT = jnp.int32


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    scene, _ = parser.parse_scene(
        "/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml")
    sc = ps.scene_soa_from_aos(scene)
    static = scene.static
    env = ps._env_view(static, sc)
    pool = sc.mat_tables.pool3
    w, h = env.width, env.height
    img_id = int(np.asarray(env.img_id))
    off = int(np.asarray(pool.level_offset[img_id, 0]))
    print(f"env {w}x{h} img_id {img_id} off {off}  n={n}")

    # Dense (h*w, 3) copy of level 0 + wrap-padded (h+1, w+1, 3).
    imgc = np.stack([np.asarray(pool.data.x[off:off + h * w]),
                     np.asarray(pool.data.y[off:off + h * w]),
                     np.asarray(pool.data.z[off:off + h * w])],
                    axis=1).reshape(h, w, 3)
    img_flat = jnp.asarray(imgc.reshape(h * w, 3))
    pad = np.concatenate([imgc, imgc[:1]], axis=0)
    pad = np.concatenate([pad, pad[:, :1]], axis=1)
    img_pad = jnp.asarray(pad)  # (h+1, w+1, 3)

    rng = np.random.RandomState(0)
    dd = rng.randn(n, 3).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d = V3(jnp.asarray(dd[:, 0]), jnp.asarray(dd[:, 1]),
           jnp.asarray(dd[:, 2]))

    def uv_coords(d):
        u, v, _ = tsoa.envmap_uv_from_dir(env, d)
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x).astype(INT)
        y0 = jnp.floor(y).astype(INT)
        fx = x - x0.astype(REAL)
        fy = y - y0.astype(REAL)
        x0m = jnp.mod(x0, w)
        y0m = jnp.mod(y0, h)
        return x0m, y0m, fx, fy

    def f_uv_only(d):
        x0m, y0m, fx, fy = uv_coords(d)
        return x0m.astype(REAL) * fx + y0m.astype(REAL) * fy

    def f_current(d):
        v = tsoa.envmap_emission_soa(env, pool, d)
        return v.x + v.y + v.z

    def f_static12(d):
        x0m, y0m, fx, fy = uv_coords(d)
        x1m = jnp.mod(x0m + 1, w)
        y1m = jnp.mod(y0m + 1, h)
        p00 = soa.gather(pool.data, off + y0m * w + x0m)
        p01 = soa.gather(pool.data, off + y1m * w + x0m)
        p10 = soa.gather(pool.data, off + y0m * w + x1m)
        p11 = soa.gather(pool.data, off + y1m * w + x1m)
        o = (p00 * ((1 - fx) * (1 - fy)) + p10 * (fx * (1 - fy))
             + p01 * ((1 - fx) * fy) + p11 * (fx * fy))
        return o.x + o.y + o.z

    def f_slice4x3(d):
        x0m, y0m, fx, fy = uv_coords(d)
        x1m = jnp.mod(x0m + 1, w)
        y1m = jnp.mod(y0m + 1, h)
        p00 = jnp.take(img_flat, y0m * w + x0m, axis=0, mode="clip")
        p01 = jnp.take(img_flat, y1m * w + x0m, axis=0, mode="clip")
        p10 = jnp.take(img_flat, y0m * w + x1m, axis=0, mode="clip")
        p11 = jnp.take(img_flat, y1m * w + x1m, axis=0, mode="clip")
        o = (p00 * ((1 - fx) * (1 - fy))[:, None]
             + p10 * (fx * (1 - fy))[:, None]
             + p01 * ((1 - fx) * fy)[:, None]
             + p11 * (fx * fy)[:, None])
        return o[:, 0] + o[:, 1] + o[:, 2]

    def f_slice223(d):
        x0m, y0m, fx, fy = uv_coords(d)
        starts = jnp.stack([y0m, x0m], axis=1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        taps = jax.lax.gather(img_pad, starts, dnums,
                              slice_sizes=(2, 2, 3),
                              mode=jax.lax.GatherScatterMode.CLIP)
        w00 = ((1 - fx) * (1 - fy))[:, None]
        w10 = (fx * (1 - fy))[:, None]
        w01 = ((1 - fx) * fy)[:, None]
        w11 = (fx * fy)[:, None]
        o = (taps[:, 0, 0] * w00 + taps[:, 0, 1] * w10
             + taps[:, 1, 0] * w01 + taps[:, 1, 1] * w11)
        return o[:, 0] + o[:, 1] + o[:, 2]

    ref = None
    for name, f in [("uv_only", f_uv_only), ("current", f_current),
                    ("static12", f_static12), ("slice4x3", f_slice4x3),
                    ("slice223", f_slice223)]:
        g = jax.jit(f)
        out = jax.block_until_ready(g(d))
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(g(d))
            best = min(best, time.perf_counter() - t0)
        s = float(jnp.sum(out))
        note = ""
        if name == "current":
            ref = s
        elif ref is not None and name != "uv_only":
            note = "  MATCH" if abs(s - ref) < 1e-2 * max(abs(ref), 1) \
                else f"  MISMATCH ref={ref:.4f}"
        print(f"{name:9s}: {best * 1e3:7.2f} ms  ({best / n * 1e9:6.1f}"
              f" ns/lane)  sum={s:.4f}{note}", flush=True)


if __name__ == "__main__":
    main()
