"""Standalone packet-kernel throughput probe for one (ROWS, IL) config.

Reads GDPT_PACKET_ROWS / GDPT_PACKET_IL from the env (set by the sweep
driver), builds the packet table for a scene, and times closest-hit and
any-hit traversal on coherent (primary) and incoherent (bbox-random,
morton-sorted) 1M-ray batches. Prints one JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdpt_tpu.core.dtypes import BIG
from gdpt_tpu.core.soa import V3
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.scene import parser


def timed(fn, *args):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/scenes/sponza/sponza.xml"
    m = 1 << 20
    scene, _ = parser.parse_scene(scene_path)
    static = scene.static
    sc = ps.scene_soa_from_aos(scene)
    from gdpt_tpu.accel import packet_trace as pt

    tab = sc.geom.packet
    assert tab is not None
    n_tris_arg = static.n_tris if static.n_spheres else None

    rng = np.random.RandomState(0)
    bbox = np.asarray(tab.bbox)
    lo, hi = bbox[:3], bbox[3:]
    o = lo + rng.rand(m, 3).astype(np.float32) * (hi - lo)
    dd = rng.randn(m, 3).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o_inc = V3(*(jnp.asarray(o[:, i]) for i in range(3)))
    d_inc = V3(*(jnp.asarray(dd[:, i]) for i in range(3)))

    # Coherent: the scene's own primary rays, tiled to m lanes.
    n = static.width * static.height
    ys, xs = np.mgrid[0:static.height, 0:static.width]
    from gdpt_tpu.core import soa
    u0, u1 = soa.uniform2(jnp.asarray(0, jnp.uint32),
                          jnp.arange(n, dtype=jnp.uint32),
                          jnp.asarray(0, jnp.uint32), 0)
    org, d = ps.primary_rays_soa(
        static, scene.device.camera,
        jnp.asarray(xs.ravel(), jnp.float32),
        jnp.asarray(ys.ravel(), jnp.float32), u0, u1)
    reps = max(1, m // n)
    o_coh = V3(*(jnp.tile(getattr(org, c), reps) for c in "xyz"))
    d_coh = V3(*(jnp.tile(getattr(d, c), reps) for c in "xyz"))
    mc = reps * n

    @jax.jit
    def closest(o3, d3):
        return pt.intersect_packet(tab, o3, d3, 0.0, BIG, n_tris=n_tris_arg)[1]

    @jax.jit
    def anyhit(o3, d3):
        return pt.occluded_packet(tab, o3, d3, 1e-4, BIG, n_tris=n_tris_arg)

    t0 = time.perf_counter()
    res = {
        "scene": os.path.basename(scene_path),
        "rows": pt.PACKET_ROWS,
        "il": 1,
        "table_rows": int(tab.table.shape[0]),
        "coh_Mrays": round(mc / timed(closest, o_coh, d_coh) / 1e6, 2),
        "inc_Mrays": round(m / timed(closest, o_inc, d_inc) / 1e6, 2),
        "coh_any_Mrays": round(mc / timed(anyhit, o_coh, d_coh) / 1e6, 2),
        "inc_any_Mrays": round(m / timed(anyhit, o_inc, d_inc) / 1e6, 2),
        "total_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
