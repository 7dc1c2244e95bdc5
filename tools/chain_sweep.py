"""Fit per-dispatch overhead vs per-trace kernel cost: time chained
_trace_packets at K=1,2,4,8,16 on captured pool rays. If the old
single-dispatch decomposition was RPC-bound, time(K) ~= C + K*kernel
with C >> kernel. Also sanity-checks the hit fraction so a trivially
exiting kernel can't masquerade as fast."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.speed_of_light import CONFIGS, _load
from tools.wavefront_visits import capture_pool_rays
from tools.ab_dual_kernel import _sorted_packets


def main():
    from gdpt_tpu.accel import packet_trace as pt
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps

    name = sys.argv[1] if len(sys.argv) > 1 else "disney_bsdf"
    dual = len(sys.argv) > 2 and sys.argv[2] == "dual"
    cfg = {k: v for k, v in CONFIGS}
    scene = _load(name, cfg[name])
    sc = ps.scene_soa_from_aos(scene)
    tab = sc.geom.packet
    eps = float(scene.static.intersection_epsilon)
    rays = capture_pool_rays(scene, warm_chunks=3, pool=1 << 18)
    porg = V3(*(jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")))
    pd = V3(*(jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")))
    packed, n = _sorted_packets(tab, porg, pd, eps)
    ox, oy, oz, dx, dy, dz, tn, tf = packed

    # Sanity: the kernel must actually be tracing. Single eager call.
    t, prim = pt._trace_packets(tab, *packed, interpret=False, dual=dual)
    hit_frac = float((np.asarray(prim) >= 0).mean())
    print(json.dumps({"hit_frac": round(hit_frac, 4), "rays": n,
                      "dual": dual}), flush=True)

    for K in (1, 2, 4, 8, 16):
        @jax.jit
        def run():
            def body(_, acc):
                e = 1e-20 * jnp.minimum(acc, 1.0)
                t, _ = pt._trace_packets(
                    tab, ox + e, oy, oz, dx, dy, dz, tn, tf,
                    interpret=False, dual=dual)
                return acc + t[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        jax.block_until_ready(run())
        best = 1e30
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"K": K, "total_ms": round(best * 1e3, 2),
                          "mrays": round(n * K / best / 1e6, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
