"""Per-visit-type cost microbench for the packet traversal kernel.

The in-situ kernel runs ~0.97 us/visit (trace_decompose on captured
pool rays: 123 ms / (256 packets * 494 visits)) against a 0.36 us
model. This bench times the two visit bodies (16-child super slab
test, 12-tri leaf intersect) in isolation, with the same dynamic-row
VMEM reads, scalar extraction pattern, scratch round-trips and SMEM
stack traffic as the real kernel (packet_trace._make_kernel), so the
gap attributes to a visit type or to the while-loop/step dispatch
itself rather than to a model.

Usage: python tools/visit_microbench.py [scene.xml] [n_visits]
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
from gdpt_tpu.scene import parser


def build(tab, n_visits, mode, n_tris=None):
    """mode: 'super' = slab test only; 'leaf' = tri intersect only;
    'empty' = loop + dynamic row read only."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gdpt_tpu.accel.packet_trace import LEAF_TRIS, PACKET_ROWS

    R = int(tab.table.shape[0])
    P = PACKET_ROWS

    def kernel(tab_ref, tabf_ref, ox, oy, oz, dx, dy, dz, tn, tf,
               t_o, prim_o, wscr, spr):
        t_o[...] = tf[...]
        prim_o[...] = jnp.full((P, 128), -1, jnp.int32)

        org = V3(ox[...], oy[...], oz[...])
        d = V3(dx[...], dy[...], dz[...])

        def _inv(c):
            tiny = jnp.abs(c) < 1e-18
            return 1.0 / jnp.where(tiny, jnp.where(c < 0, -1e-20, 1e-20), c)

        inv = V3(_inv(d.x), _inv(d.y), _inv(d.z))
        oinv = V3(org.x * inv.x, org.y * inv.y, org.z * inv.z)
        tnear = tn[...]

        def or_scalar(w):
            for sh in (64, 32, 16, 8, 4, 2, 1):
                w = w | pltpu.roll(w, sh, axis=1)
            sh = P // 2
            while sh:
                w = w | pltpu.roll(w, sh, axis=0)
                sh //= 2
            wscr[...] = w
            return wscr[0, 0]

        def super_visit(srow):
            row_i = tab_ref[srow, :]
            rowf = jax.lax.bitcast_convert_type(row_i, jnp.float32)
            best = t_o[...]
            bits = jnp.zeros((P, 128), jnp.int32)
            for k in range(16):
                b = k * 6
                t0x = rowf[b + 0] * inv.x - oinv.x
                t1x = rowf[b + 3] * inv.x - oinv.x
                t0y = rowf[b + 1] * inv.y - oinv.y
                t1y = rowf[b + 4] * inv.y - oinv.y
                t0z = rowf[b + 2] * inv.z - oinv.z
                t1z = rowf[b + 5] * inv.z - oinv.z
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tnear))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best))
                bits = bits | jnp.where(t_in <= t_out,
                                        jnp.int32(1 << k), 0)
            # Same reduce + scratch round-trip as the real kernel; fold
            # the result into spr so nothing is dead-code eliminated.
            m = or_scalar(bits) & tab_ref[srow, 120]
            spr[1] = spr[1] | m

        def super_visit_sld(srow):
            # Variant: per-element scalar loads straight off the VMEM
            # ref (no (768,) row materialization / lane extraction).
            best = t_o[...]
            bits = jnp.zeros((P, 128), jnp.int32)

            def s(i):
                return tabf_ref[srow, i]

            for k in range(16):
                b = k * 6
                t0x = s(b + 0) * inv.x - oinv.x
                t1x = s(b + 3) * inv.x - oinv.x
                t0y = s(b + 1) * inv.y - oinv.y
                t1y = s(b + 4) * inv.y - oinv.y
                t0z = s(b + 2) * inv.z - oinv.z
                t1z = s(b + 5) * inv.z - oinv.z
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tnear))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best))
                bits = bits | jnp.where(t_in <= t_out,
                                        jnp.int32(1 << k), 0)
            m = or_scalar(bits) & tab_ref[srow, 120]
            spr[1] = spr[1] | m

        def leaf_visit_sld(lrow):
            best_t = t_o[...]
            prim_b = prim_o[...]

            def s(i):
                return tabf_ref[lrow, i]

            for j in range(LEAF_TRIS):
                b = j * 9
                v0 = V3(s(b + 0), s(b + 1), s(b + 2))
                e1 = V3(s(b + 3), s(b + 4), s(b + 5))
                e2 = V3(s(b + 6), s(b + 7), s(b + 8))
                pid = tab_ref[lrow, 108 + j]
                pvec = soa.cross(d, e2)
                det = soa.dot(e1, pvec)
                inv_det = jnp.where(
                    det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
                tvec = org - v0
                uu = soa.dot(tvec, pvec) * inv_det
                qvec = soa.cross(tvec, e1)
                vv = soa.dot(d, qvec) * inv_det
                tt = soa.dot(e2, qvec) * inv_det
                hit = ((det != 0) & (uu >= 0) & (vv >= 0)
                       & (uu + vv <= 1) & (tt >= tnear)
                       & (tt < best_t) & (pid >= 0))
                prim_b = jnp.where(hit, pid, prim_b)
                best_t = jnp.where(hit, tt, best_t)
            t_o[...] = best_t
            prim_o[...] = prim_b

        def leaf_visit(lrow):
            lrow_i = tab_ref[lrow, :]
            lrowf = jax.lax.bitcast_convert_type(lrow_i, jnp.float32)
            best_t = t_o[...]
            prim_b = prim_o[...]
            for j in range(LEAF_TRIS):
                b = j * 9
                v0 = V3(lrowf[b + 0], lrowf[b + 1], lrowf[b + 2])
                e1 = V3(lrowf[b + 3], lrowf[b + 4], lrowf[b + 5])
                e2 = V3(lrowf[b + 6], lrowf[b + 7], lrowf[b + 8])
                pid = lrow_i[108 + j]
                pvec = soa.cross(d, e2)
                det = soa.dot(e1, pvec)
                inv_det = jnp.where(
                    det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
                tvec = org - v0
                uu = soa.dot(tvec, pvec) * inv_det
                qvec = soa.cross(tvec, e1)
                vv = soa.dot(d, qvec) * inv_det
                tt = soa.dot(e2, qvec) * inv_det
                hit = ((det != 0) & (uu >= 0) & (vv >= 0)
                       & (uu + vv <= 1) & (tt >= tnear)
                       & (tt < best_t) & (pid >= 0))
                prim_b = jnp.where(hit, pid, prim_b)
                best_t = jnp.where(hit, tt, best_t)
            t_o[...] = best_t
            prim_o[...] = prim_b

        def super_visit2(srow, srow2):
            # Dual-visit: two independent slab-test bodies on the SAME
            # ray packet but different rows, interleaved per child so
            # the scalar row loads of one overlap the vector math of
            # the other (latency-hiding hypothesis for a dual-packet
            # kernel). Counts as 2 visits.
            row_i = tab_ref[srow, :]
            rowf = jax.lax.bitcast_convert_type(row_i, jnp.float32)
            row_i2 = tab_ref[srow2, :]
            rowf2 = jax.lax.bitcast_convert_type(row_i2, jnp.float32)
            best = t_o[...]
            bits = jnp.zeros((P, 128), jnp.int32)
            bits2 = jnp.zeros((P, 128), jnp.int32)
            for k in range(16):
                b = k * 6
                for rf, bb in ((rowf, 0), (rowf2, 1)):
                    t0x = rf[b + 0] * inv.x - oinv.x
                    t1x = rf[b + 3] * inv.x - oinv.x
                    t0y = rf[b + 1] * inv.y - oinv.y
                    t1y = rf[b + 4] * inv.y - oinv.y
                    t0z = rf[b + 2] * inv.z - oinv.z
                    t1z = rf[b + 5] * inv.z - oinv.z
                    t_in = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), tnear))
                    t_out = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), best))
                    hitb = jnp.where(t_in <= t_out, jnp.int32(1 << k), 0)
                    if bb == 0:
                        bits = bits | hitb
                    else:
                        bits2 = bits2 | hitb
            m = or_scalar(bits) & tab_ref[srow, 120]
            m2 = or_scalar(bits2) & tab_ref[srow2, 120]
            spr[1] = spr[1] | m | m2

        def super_visit32(srow, srow2):
            # Model of a 32-WIDE supernode visit (2 table rows, one
            # 32-bit child mask, ONE or_scalar reduce): the candidate
            # next kernel class named in STATUS.md. Unlike super2 (two
            # independent visits, two reduces), this is one visit that
            # replaces TWO 16-wide visits in a reshaped tree, so its
            # per-call cost should be compared against 2x the solo
            # super cost. Counts as 1 visit.
            row_i = tab_ref[srow, :]
            rowf = jax.lax.bitcast_convert_type(row_i, jnp.float32)
            row_i2 = tab_ref[srow2, :]
            rowf2 = jax.lax.bitcast_convert_type(row_i2, jnp.float32)
            best = t_o[...]
            bits = jnp.zeros((P, 128), jnp.int32)
            for k in range(32):
                rf = rowf if k < 16 else rowf2
                b = (k & 15) * 6
                t0x = rf[b + 0] * inv.x - oinv.x
                t1x = rf[b + 3] * inv.x - oinv.x
                t0y = rf[b + 1] * inv.y - oinv.y
                t1y = rf[b + 4] * inv.y - oinv.y
                t0z = rf[b + 2] * inv.z - oinv.z
                t1z = rf[b + 5] * inv.z - oinv.z
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tnear))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best))
                bits = bits | jnp.where(
                    t_in <= t_out,
                    jnp.int32(np.int32(np.uint32(1 << k))), 0)
            m = or_scalar(bits) & tab_ref[srow, 120]
            spr[1] = spr[1] | m

        def super_leaf(srow, lrow):
            # Interleaved super-slab + leaf-intersect bodies (the mixed
            # case of a dual-packet kernel iteration). Counts as 2
            # visits. Interleave at the k/j granularity: 16 super
            # children zip with 12 leaf tris.
            row_i = tab_ref[srow, :]
            rowf = jax.lax.bitcast_convert_type(row_i, jnp.float32)
            lrow_i = tab_ref[lrow, :]
            lrowf = jax.lax.bitcast_convert_type(lrow_i, jnp.float32)
            best = t_o[...]
            bits = jnp.zeros((P, 128), jnp.int32)
            best_t = t_o[...]
            prim_b = prim_o[...]
            for k in range(16):
                b = k * 6
                t0x = rowf[b + 0] * inv.x - oinv.x
                t1x = rowf[b + 3] * inv.x - oinv.x
                t0y = rowf[b + 1] * inv.y - oinv.y
                t1y = rowf[b + 4] * inv.y - oinv.y
                t0z = rowf[b + 2] * inv.z - oinv.z
                t1z = rowf[b + 5] * inv.z - oinv.z
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tnear))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best))
                bits = bits | jnp.where(t_in <= t_out,
                                        jnp.int32(1 << k), 0)
                if k < LEAF_TRIS:
                    j = k
                    b2 = j * 9
                    v0 = V3(lrowf[b2 + 0], lrowf[b2 + 1], lrowf[b2 + 2])
                    e1 = V3(lrowf[b2 + 3], lrowf[b2 + 4], lrowf[b2 + 5])
                    e2 = V3(lrowf[b2 + 6], lrowf[b2 + 7], lrowf[b2 + 8])
                    pid = lrow_i[108 + j]
                    pvec = soa.cross(d, e2)
                    det = soa.dot(e1, pvec)
                    inv_det = jnp.where(
                        det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
                    tvec = org - v0
                    uu = soa.dot(tvec, pvec) * inv_det
                    qvec = soa.cross(tvec, e1)
                    vv = soa.dot(d, qvec) * inv_det
                    tt = soa.dot(e2, qvec) * inv_det
                    hit = ((det != 0) & (uu >= 0) & (vv >= 0)
                           & (uu + vv <= 1) & (tt >= tnear)
                           & (tt < best_t) & (pid >= 0))
                    prim_b = jnp.where(hit, pid, prim_b)
                    best_t = jnp.where(hit, tt, best_t)
            t_o[...] = best_t
            prim_o[...] = prim_b
            m = or_scalar(bits) & tab_ref[srow, 120]
            spr[1] = spr[1] | m

        def leaf_visit24(lrow, lrow2):
            # Model of the WIDE leaf visit: 24 prims across two rows,
            # one best-t/prim commit (build_packet_table LEAF_CAP=24).
            # Counts as 1 visit; compare against 2x the solo leaf cost.
            lrow_i = tab_ref[lrow, :]
            lrowf = jax.lax.bitcast_convert_type(lrow_i, jnp.float32)
            lrow_i2 = tab_ref[lrow2, :]
            lrowf2 = jax.lax.bitcast_convert_type(lrow_i2, jnp.float32)
            best_t = t_o[...]
            prim_b = prim_o[...]
            for j in range(2 * LEAF_TRIS):
                ri = lrow_i if j < LEAF_TRIS else lrow_i2
                rf = lrowf if j < LEAF_TRIS else lrowf2
                b = (j % LEAF_TRIS) * 9
                v0 = V3(rf[b + 0], rf[b + 1], rf[b + 2])
                e1 = V3(rf[b + 3], rf[b + 4], rf[b + 5])
                e2 = V3(rf[b + 6], rf[b + 7], rf[b + 8])
                pid = ri[108 + (j % LEAF_TRIS)]
                pvec = soa.cross(d, e2)
                det = soa.dot(e1, pvec)
                inv_det = jnp.where(
                    det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
                tvec = org - v0
                uu = soa.dot(tvec, pvec) * inv_det
                qvec = soa.cross(tvec, e1)
                vv = soa.dot(d, qvec) * inv_det
                tt = soa.dot(e2, qvec) * inv_det
                hit = ((det != 0) & (uu >= 0) & (vv >= 0)
                       & (uu + vv <= 1) & (tt >= tnear)
                       & (tt < best_t) & (pid >= 0))
                prim_b = jnp.where(hit, pid, prim_b)
                best_t = jnp.where(hit, tt, best_t)
            t_o[...] = best_t
            prim_o[...] = prim_b

        def leaf_visit2(lrow, lrow2):
            # Two interleaved leaf bodies (counts as 2 visits).
            lrow_i = tab_ref[lrow, :]
            lrowf = jax.lax.bitcast_convert_type(lrow_i, jnp.float32)
            lrow_i2 = tab_ref[lrow2, :]
            lrowf2 = jax.lax.bitcast_convert_type(lrow_i2, jnp.float32)
            best_t = t_o[...]
            prim_b = prim_o[...]
            for j in range(LEAF_TRIS):
                b = j * 9
                for rf, ri in ((lrowf, lrow_i), (lrowf2, lrow_i2)):
                    v0 = V3(rf[b + 0], rf[b + 1], rf[b + 2])
                    e1 = V3(rf[b + 3], rf[b + 4], rf[b + 5])
                    e2 = V3(rf[b + 6], rf[b + 7], rf[b + 8])
                    pid = ri[108 + j]
                    pvec = soa.cross(d, e2)
                    det = soa.dot(e1, pvec)
                    inv_det = jnp.where(
                        det != 0, 1.0 / jnp.where(det != 0, det, 1.0), 0.0)
                    tvec = org - v0
                    uu = soa.dot(tvec, pvec) * inv_det
                    qvec = soa.cross(tvec, e1)
                    vv = soa.dot(d, qvec) * inv_det
                    tt = soa.dot(e2, qvec) * inv_det
                    hit = ((det != 0) & (uu >= 0) & (vv >= 0)
                           & (uu + vv <= 1) & (tt >= tnear)
                           & (tt < best_t) & (pid >= 0))
                    prim_b = jnp.where(hit, pid, prim_b)
                    best_t = jnp.where(hit, tt, best_t)
            t_o[...] = best_t
            prim_o[...] = prim_b

        def body(carry):
            it = carry
            # Dynamic, data-dependent row index (same class of VMEM
            # access as the real kernel's stack pop).
            srow = (it * 747796405 & 0x7FFFFFFF) % R
            if mode == "super":
                super_visit(srow)
            elif mode == "super2":
                srow2 = (it * 1103515245 & 0x7FFFFFFF) % R
                super_visit2(srow, srow2)
            elif mode == "super32":
                srow2 = (it * 1103515245 & 0x7FFFFFFF) % R
                super_visit32(srow, srow2)
            elif mode == "super_leaf":
                srow2 = (it * 1103515245 & 0x7FFFFFFF) % R
                super_leaf(srow, srow2)
            elif mode == "leaf2":
                srow2 = (it * 1103515245 & 0x7FFFFFFF) % R
                leaf_visit2(srow, srow2)
            elif mode == "leaf24":
                srow2 = (it * 1103515245 & 0x7FFFFFFF) % R
                leaf_visit24(srow, srow2)
            elif mode == "super_sld":
                super_visit_sld(srow)
            elif mode == "leaf":
                leaf_visit(srow)
            elif mode == "leaf_sld":
                leaf_visit_sld(srow)
            else:
                spr[1] = spr[1] | tab_ref[srow, 120]
            return it + 1

        n_iters = (n_visits // 2
                   if mode in ("super2", "super_leaf", "leaf2")
                   else n_visits)
        jax.lax.while_loop(lambda it: it < n_iters, body, jnp.int32(0))

    M = P
    out_shape = [jax.ShapeDtypeStruct((M, 128), jnp.float32),
                 jax.ShapeDtypeStruct((M, 128), jnp.int32)]
    ray_spec = pl.BlockSpec((P, 128), lambda g: (g, 0))
    vmem_limit = min(2 * int(tab.table.nbytes) + (8 << 20), 120 << 20)
    return pl.pallas_call(
        kernel,
        grid=(M // P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [ray_spec] * 8,
        out_specs=[ray_spec] * 2,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem_limit, 32 << 20)),
        scratch_shapes=[
            pltpu.VMEM((P, 128), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )


def main():
    scene_path = (sys.argv[1] if len(sys.argv) > 1 else
                  "/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml")
    n_visits = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    scene, _ = parser.parse_scene(scene_path)
    sc = ps.scene_soa_from_aos(scene)
    tab = sc.geom.packet
    assert tab is not None
    from gdpt_tpu.accel.packet_trace import PACKET_ROWS

    P = PACKET_ROWS
    rng = np.random.RandomState(0)
    bbox = np.asarray(tab.bbox)
    lo, hi = bbox[:3], bbox[3:]
    o = lo + rng.rand(P * 128, 3).astype(np.float32) * (hi - lo)
    dd = rng.randn(P * 128, 3).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)

    def pk(v):
        return jnp.asarray(v.reshape(P, 128))

    args = [pk(o[:, 0]), pk(o[:, 1]), pk(o[:, 2]),
            pk(dd[:, 0]), pk(dd[:, 1]), pk(dd[:, 2]),
            pk(np.full(P * 128, 1e-4, np.float32)),
            pk(np.full(P * 128, 3e37, np.float32))]

    print(f"table rows {tab.table.shape[0]}, n_visits {n_visits}",
          flush=True)
    base = None
    modes = (sys.argv[3].split(",") if len(sys.argv) > 3 else
             ["empty", "super", "super_sld", "leaf", "leaf_sld"])
    for mode in modes:
        f = build(tab, n_visits, mode)
        tabf = jax.lax.bitcast_convert_type(tab.table, jnp.float32)
        out = f(tab.table, tabf, *args)
        jax.block_until_ready(out)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(tab.table, tabf, *args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        per = best / n_visits * 1e6
        extra = "" if base is None else f"  (+{(per - base):.3f} over empty)"
        if mode == "empty":
            base = per
        print(f"{mode:6s}: {best * 1e3:8.1f} ms  {per:.3f} us/visit{extra}",
              flush=True)


if __name__ == "__main__":
    main()
