"""A/B: dual-packet kernel vs solo kernel on real pool/harvested rays.

Times `_trace_packets(dual=False)` vs `dual=True` on the same
morton-sorted ray population, chained SOL-style (carry-dependent origin
perturbation defeats loop-invariant hoisting). Run on the TPU:

    python tools/ab_dual_kernel.py disney_bsdf [sponza_gradpath ...]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.speed_of_light import CONFIGS, _load, _harvest_rays
from tools.wavefront_visits import capture_pool_rays

CHAIN_K = 8


def _sorted_packets(tab, org, d, tnear):
    """Morton-sort and pack rays exactly as trace_packet_soa does."""
    from gdpt_tpu.accel import packet_trace as pt
    from gdpt_tpu.core.soa import V3

    n = org.x.shape[0]
    P = pt.PACKET_ROWS
    M = -(-n // (P * 128)) * P
    keys = pt._morton_keys(tab, org, d)
    perm = jnp.argsort(keys)
    take = lambda v: jnp.take(v, perm, axis=0)
    org = V3(take(org.x), take(org.y), take(org.z))
    d = V3(take(d.x), take(d.y), take(d.z))
    tnear = take(jnp.broadcast_to(jnp.asarray(tnear, jnp.float32), (n,)))
    args = [pt._pack(v, M) for v in
            (org.x, org.y, org.z, d.x, d.y, d.z, tnear)]
    tf = jnp.full((M * 128,), -1.0, jnp.float32).at[:n].set(3e37)
    return args + [tf.reshape(M, 128)], n


def _timed(tab, packed, n, dual, any_hit=False):
    from gdpt_tpu.accel import packet_trace as pt

    ox, oy, oz, dx, dy, dz, tn, tf = packed

    @jax.jit
    def run():
        def body(_, acc):
            # Bounded anti-hoist: a missing probe lane returns t=3e37,
            # which un-clamped would teleport every origin off-scene and
            # make iterations 2..K trace nothing (root-visit exit). The
            # min(acc, 1) keeps the perturbation ~1e-20 regardless.
            # clip BOTH sides: any_hit collapses hit lanes' t to -3e38,
            # which would poison the carry negative.
            eps = 1e-20 * jnp.clip(acc, -1.0, 1.0)
            t, prim = pt._trace_packets(
                tab, ox + eps, oy, oz, dx, dy, dz, tn, tf,
                any_hit=any_hit, interpret=False, dual=dual)
            return acc + t[0, 0]
        return jax.lax.fori_loop(0, CHAIN_K, body, jnp.float32(0.0))

    jax.block_until_ready(run())
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return n * CHAIN_K / best / 1e6


def main():
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps

    want = sys.argv[1:] or ["disney_bsdf"]
    cfg = {k: v for k, v in CONFIGS}
    for name in want:
        scene = _load(name, cfg[name])
        sc = ps.scene_soa_from_aos(scene)
        tab = sc.geom.packet
        assert tab is not None, f"{name} is not a packet config"
        eps = float(scene.static.intersection_epsilon)
        rows = {}
        # Steady-state pool rays: THE extension-trace population.
        rays = capture_pool_rays(scene, warm_chunks=3, pool=1 << 18)
        porg = V3(*(jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")))
        pd = V3(*(jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")))
        packed, n = _sorted_packets(tab, porg, pd, eps)
        rows["pool_solo"] = round(_timed(tab, packed, n, False), 3)
        rows["pool_dual"] = round(_timed(tab, packed, n, True), 3)
        # Harvested bounce + shadow rays.
        bounce, shadow = _harvest_rays(scene, sc, m=1 << 19)
        packed, n = _sorted_packets(tab, *bounce, eps)
        rows["bounce_solo"] = round(_timed(tab, packed, n, False), 3)
        rows["bounce_dual"] = round(_timed(tab, packed, n, True), 3)
        packed, n = _sorted_packets(tab, *shadow, eps)
        rows["shadow_solo"] = round(
            _timed(tab, packed, n, False, any_hit=True), 3)
        rows["shadow_dual"] = round(
            _timed(tab, packed, n, True, any_hit=True), 3)
        print(json.dumps({"config": name, "unit": "Mrays/s", **rows}),
              flush=True)


if __name__ == "__main__":
    main()
