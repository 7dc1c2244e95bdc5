"""A/B: 32-wide supernode table (GDPT_PACKET_WIDE) vs the 16-wide
default, on real pool/harvested rays.

Times `_trace_packets` over both tables on the same morton-sorted ray
population, chained SOL-style (carry-dependent origin perturbation
defeats loop-invariant hoisting), and cross-checks that both kernels
return identical hits first. Run on the TPU:

    python tools/ab_wide_kernel.py disney_bsdf [sponza_gradpath ...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tools.speed_of_light import CONFIGS, _load, _harvest_rays
from tools.wavefront_visits import capture_pool_rays
from tools.ab_dual_kernel import _sorted_packets

CHAIN_K = 8


def _wide_table(scene):
    from gdpt_tpu.accel import packet_trace as pt
    from gdpt_tpu.accel.traverse_soa import SPH_BRUTE_MAX

    g = scene.device.geom
    n_tris = g.tri_v0.shape[0]
    n_sph = g.sph_center.shape[0]
    skip = n_tris if 0 < n_sph <= SPH_BRUTE_MAX else None
    return pt.build_packet_table(
        g.bvh_bbox_min, g.bvh_bbox_max, g.bvh_first, g.bvh_count,
        g.bvh_miss, g.bvh_prim_order, g.tri_v0, g.tri_e1, g.tri_e2,
        g.sph_center, g.sph_radius, leaf_skip_from=skip, wide=True)


def _timed(tab, packed, n, any_hit=False):
    from gdpt_tpu.accel import packet_trace as pt

    ox, oy, oz, dx, dy, dz, tn, tf = packed

    @jax.jit
    def run():
        def body(_, acc):
            eps = 1e-20 * jnp.clip(acc, -1.0, 1.0)
            t, prim = pt._trace_packets(
                tab, ox + eps, oy, oz, dx, dy, dz, tn, tf,
                any_hit=any_hit, interpret=False)
            return acc + t[0, 0]
        return jax.lax.fori_loop(0, CHAIN_K, body, jnp.float32(0.0))

    jax.block_until_ready(run())
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return n * CHAIN_K / best / 1e6


def _check_equal(tab16, tab32, packed, n, any_hit=False):
    from gdpt_tpu.accel import packet_trace as pt

    a = pt._trace_packets(tab16, *packed, any_hit=any_hit)
    b = pt._trace_packets(tab32, *packed, any_hit=any_hit)
    pa = np.asarray(a[1]).reshape(-1)[:n]
    pb = np.asarray(b[1]).reshape(-1)[:n]
    if any_hit:
        assert ((pa >= 0) == (pb >= 0)).all(), "wide any-hit mismatch"
    else:
        ta = np.asarray(a[0]).reshape(-1)[:n]
        tb = np.asarray(b[0]).reshape(-1)[:n]
        good = pa >= 0
        np.testing.assert_allclose(ta[good], tb[good], rtol=1e-6, atol=1e-6)
        # Coplanar duplicate geometry (real meshes, e.g. sponza) ties
        # at bit-identical t; the winner is traversal-order-dependent.
        # A differing prim is only a bug if its t differs too.
        diff = pa != pb
        assert ((pa >= 0) == (pb >= 0)).all(), "wide hit-mask mismatch"
        if diff.any():
            assert np.allclose(ta[diff], tb[diff], rtol=1e-6), \
                f"wide prim mismatch beyond ties: {diff.sum()}"


def main():
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps

    want = sys.argv[1:] or ["disney_bsdf"]
    cfg = {k: v for k, v in CONFIGS}
    for name in want:
        scene = _load(name, cfg[name])
        sc = ps.scene_soa_from_aos(scene)
        tab16 = sc.geom.packet
        assert tab16 is not None, f"{name} is not a packet config"
        tab32 = _wide_table(scene)
        assert tab32 is not None and tab32.wide_dummy is not None
        eps = float(scene.static.intersection_epsilon)
        rows = {"rows16": int(tab16.table.shape[0]),
                "rows32": int(tab32.table.shape[0])}
        rays = capture_pool_rays(scene, warm_chunks=3, pool=1 << 18)
        porg = V3(*(jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")))
        pd = V3(*(jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")))
        packed, n = _sorted_packets(tab16, porg, pd, eps)
        _check_equal(tab16, tab32, packed, n)
        rows["pool_16"] = round(_timed(tab16, packed, n), 3)
        rows["pool_32"] = round(_timed(tab32, packed, n), 3)
        bounce, shadow = _harvest_rays(scene, sc, m=1 << 19)
        packed, n = _sorted_packets(tab16, *bounce, eps)
        rows["bounce_16"] = round(_timed(tab16, packed, n), 3)
        rows["bounce_32"] = round(_timed(tab32, packed, n), 3)
        packed, n = _sorted_packets(tab16, *shadow, eps)
        _check_equal(tab16, tab32, packed, n, any_hit=True)
        rows["shadow_16"] = round(_timed(tab16, packed, n, any_hit=True), 3)
        rows["shadow_32"] = round(_timed(tab32, packed, n, any_hit=True), 3)
        print(json.dumps({"config": name, "unit": "Mrays/s", **rows}),
              flush=True)


if __name__ == "__main__":
    main()
