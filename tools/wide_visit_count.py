"""Predicts the 32-wide supernode win: host-side walk of the SAME rays
through the 16-wide and 32-wide tables, counting super/leaf visits per
packet (axis-ordered, exactly the kernel's push policy). Combined with
visit_microbench per-visit costs this projects the wall-clock ratio
before spending chip time.

Usage: python tools/wide_visit_count.py [scene.xml] [coh|inc] [n_packets]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gdpt_tpu.core.soa import V3
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.scene import parser
from gdpt_tpu.accel import packet_trace as pt


def walk(tab_i, wide, org, d, tnear, tfar):
    """Axis-ordered shared-stack walk; returns (super, leaf) visits and
    per-ray closest prim (for the equality cross-check)."""
    inv = 1.0 / np.where(d == 0, 1e-20, d)
    best = tfar.copy()
    prim = np.full(org.shape[0], -1, np.int64)
    tabf = tab_i.view(np.float32)
    W = 32 if wide else 16
    stack = [0]
    vs = vl = 0
    while stack:
        node = stack.pop()
        if node >= 0:
            vs += 1
            rowi = tab_i[node]
            valid = np.uint32(rowi[120].view(np.uint32) if hasattr(
                rowi[120], "view") else np.uint32(rowi[120]))
            ks = range(W)
            if d[0, rowi[121]] > 0:
                ks = range(W - 1, -1, -1)
            for k in ks:
                if not (int(valid) >> k) & 1:
                    continue
                r = node + (k >> 4)
                b = (k & 15) * 6
                row = tabf[r]
                t0 = (row[b:b + 3][None, :] - org) * inv
                t1 = (row[b + 3:b + 6][None, :] - org) * inv
                t_in = np.maximum(np.minimum(t0, t1).max(axis=1), tnear)
                t_out = np.minimum(np.maximum(t0, t1).min(axis=1), best)
                if (t_in <= t_out).any():
                    stack.append(int(tab_i[r][96 + (k & 15)]))
        else:
            vl += 1  # one KERNEL visit covers the whole fixed-size group
            enc = ~node
            start = enc & ((1 << pt._CHAIN_SHIFT) - 1)
            nrows = max(enc >> pt._CHAIN_SHIFT, 1)
            for rr in range(start, start + nrows):
              row = tabf[rr]
              rowi = tab_i[rr]
              for j in range(pt.LEAF_TRIS):
                pid = rowi[108 + j]
                if pid < 0:
                    continue
                b = j * 9
                v0, e1, e2 = row[b:b + 3], row[b + 3:b + 6], row[b + 6:b + 9]
                pvec = np.cross(d, e2[None, :])
                det = (e1[None, :] * pvec).sum(1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    invd = np.where(det != 0, 1.0 / np.where(det != 0, det, 1), 0)
                tv = org - v0[None, :]
                u = (tv * pvec).sum(1) * invd
                qv = np.cross(tv, e1[None, :])
                vv = (d * qv).sum(1) * invd
                tt = (e2[None, :] * qv).sum(1) * invd
                hit = (det != 0) & (u >= 0) & (vv >= 0) & (u + vv <= 1) \
                    & (tt >= tnear) & (tt < best)
                best = np.where(hit, tt, best)
                prim = np.where(hit, pid, prim)
    return vs, vl, prim


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml"
    mode = sys.argv[2] if len(sys.argv) > 2 else "inc"
    n_packets = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    scene, _ = parser.parse_scene(scene_path)
    os.environ["GDPT_PACKET"] = "1"
    sc = ps.scene_soa_from_aos(scene)
    tab16 = sc.geom.packet
    g = scene.device.geom
    from gdpt_tpu.accel.traverse_soa import SPH_BRUTE_MAX
    n_tris = g.tri_v0.shape[0]
    n_sph = g.sph_center.shape[0]
    skip = n_tris if 0 < n_sph <= SPH_BRUTE_MAX else None
    tab32 = pt.build_packet_table(
        g.bvh_bbox_min, g.bvh_bbox_max, g.bvh_first, g.bvh_count,
        g.bvh_miss, g.bvh_prim_order, g.tri_v0, g.tri_e1, g.tri_e2,
        g.sph_center, g.sph_radius, leaf_skip_from=skip, wide=True)
    t16 = np.asarray(tab16.table)
    t32 = np.asarray(tab32.table)
    print(f"rows: 16-wide {t16.shape[0]}  32-wide {t32.shape[0]}")

    rng = np.random.RandomState(0)
    bbox = np.asarray(tab16.bbox)
    lo, hi = bbox[:3], bbox[3:]
    if mode == "coh":
        # camera-ish coherent: common origin above the bbox, fan down
        m = 1 << 15
        o = np.tile((lo + 0.5 * (hi - lo) + [0, 0, 2 * (hi - lo)[2]]
                     ).astype(np.float32), (m, 1))
        tgt = lo + rng.rand(m, 3).astype(np.float32) * (hi - lo)
        dd = tgt - o
    else:
        m = 1 << 15
        o = (lo + rng.rand(m, 3) * (hi - lo)).astype(np.float32)
        dd = rng.randn(m, 3).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)

    keys = np.asarray(pt._morton_keys(
        tab16, V3(*(jnp.asarray(o[:, i]) for i in range(3))),
        V3(*(jnp.asarray(dd[:, i]) for i in range(3)))))
    order = np.argsort(keys, kind="stable")
    o, dd = o[order].astype(np.float32), dd[order].astype(np.float32)

    P128 = pt.PACKET_ROWS * 128
    acc16 = np.zeros(2)
    acc32 = np.zeros(2)
    sel = np.linspace(0, m // P128 - 1, n_packets).astype(int)
    for pi in sel:
        sl = slice(pi * P128, (pi + 1) * P128)
        zeros = np.zeros(P128, np.float32)
        fars = np.full(P128, 3e38, np.float32)
        s16, l16, p16 = walk(t16, False, o[sl], dd[sl], zeros, fars)
        s32, l32, p32 = walk(t32, True, o[sl], dd[sl], zeros, fars)
        assert (p16 == p32).all(), "wide table changed hits"
        acc16 += (s16, l16)
        acc32 += (s32, l32)
        print(f"packet {pi}: 16w super {s16} leaf {l16}"
              f"  |  32w super {s32} leaf {l32}")
    acc16 /= len(sel)
    acc32 /= len(sel)
    print(f"mean visits/packet: 16w super {acc16[0]:.0f} leaf {acc16[1]:.0f}"
          f" total {acc16.sum():.0f}  |  32w super {acc32[0]:.0f} leaf"
          f" {acc32[1]:.0f} total {acc32.sum():.0f}"
          f"  |  super ratio {acc32[0] / max(acc16[0], 1):.3f}"
          f" leaf ratio {acc32[1] / max(acc16[1], 1):.3f}")


if __name__ == "__main__":
    main()
