"""Decompose trace_packet_soa wall time on captured in-situ rays.

Splits the packet-trace entry into: morton keys + argsort + permute
(sort overhead), the pallas kernel on pre-sorted rays (pack + walk),
and the inverse-permute of outputs — so the round-5 traversal gap
(in-situ 1.5 Mrays/s vs 0.36us/visit * 494 visits/packet => 5.8) is
attributed to real code, not a model.

Usage (TPU): python tools/trace_decompose.py [scene.xml] [rays.npz]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import gdpt_tpu  # noqa: F401  (enables the compile cache)
import jax
import jax.numpy as jnp

from gdpt_tpu.accel import packet_trace as pt
from gdpt_tpu.core.dtypes import BIG, REAL
from gdpt_tpu.core.soa import V3
from gdpt_tpu.integrators import path_soa as ps
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
    scene_path = (sys.argv[1] if len(sys.argv) > 1 else
                  "/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml")
    npz = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wavefront_rays.npz"
    scene, _ = parser.parse_scene(scene_path)
    sc = ps.scene_soa_from_aos(scene)
    tab = sc.geom.packet
    assert tab is not None
    z = np.load(npz)
    n = z["ox"].shape[0]
    org = V3(jnp.asarray(z["ox"]), jnp.asarray(z["oy"]), jnp.asarray(z["oz"]))
    d = V3(jnp.asarray(z["dx"]), jnp.asarray(z["dy"]), jnp.asarray(z["dz"]))
    bounce = jnp.asarray(z["bounce"])
    tnear = jnp.where(bounce == 0, 0.0, scene.static.intersection_epsilon)
    tfar = jnp.full(n, BIG, REAL)
    print(f"{n} rays, table rows {tab.table.shape[0]}", flush=True)

    @jax.jit
    def sort_only(org, d):
        keys = pt._morton_keys(tab, org, d)
        perm = jnp.argsort(keys)
        take = lambda v: jnp.take(v, perm, axis=0)
        return (V3(take(org.x), take(org.y), take(org.z)),
                V3(take(d.x), take(d.y), take(d.z)), perm)

    (sorg, sd, perm), t_sort = timed(sort_only, org, d)
    stn = jnp.take(tnear, perm)
    stf = jnp.take(tfar, perm)
    print(f"morton keys + argsort + take x8: {t_sort * 1e3:7.1f} ms",
          flush=True)

    @jax.jit
    def full(org, d, tnear, tfar):
        return pt.trace_packet_soa(tab, org, d, tnear, tfar,
                                   sort_rays=True)

    @jax.jit
    def presorted(org, d, tnear, tfar):
        return pt.trace_packet_soa(tab, org, d, tnear, tfar,
                                   sort_rays=False)

    _, t_full = timed(full, org, d, tnear, tfar)
    _, t_pre = timed(presorted, sorg, sd, stn, stf)
    print(f"trace sort_rays=True:            {t_full * 1e3:7.1f} ms "
          f"({n / t_full / 1e6:5.2f} Mrays/s)", flush=True)
    print(f"trace presorted (kernel+pack):   {t_pre * 1e3:7.1f} ms "
          f"({n / t_pre / 1e6:5.2f} Mrays/s)", flush=True)

    # Kernel alone: pre-packed (M,128) inputs, no unflatten.
    P = pt.PACKET_ROWS
    M = n // 128

    def pack(v):
        return jnp.asarray(np.asarray(v).reshape(M, 128))

    args = [pack(v) for v in (sorg.x, sorg.y, sorg.z, sd.x, sd.y, sd.z,
                              stn, stf)]

    @jax.jit
    def kern(*a):
        return pt._trace_packets(tab, *a, n_tris=None, any_hit=False)

    _, t_k = timed(kern, *args)
    print(f"_trace_packets alone:            {t_k * 1e3:7.1f} ms "
          f"({n / t_k / 1e6:5.2f} Mrays/s)", flush=True)

    # Any-hit variant (shadow-ray cost on the same geometry mix).
    @jax.jit
    def kern_ah(*a):
        return pt._trace_packets(tab, *a, n_tris=None, any_hit=True)

    _, t_ah = timed(kern_ah, *args)
    print(f"_trace_packets any_hit:          {t_ah * 1e3:7.1f} ms "
          f"({n / t_ah / 1e6:5.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
