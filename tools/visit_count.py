"""Host-side replica of the packet kernel's shared-stack walk that counts
node/leaf visits per packet, so measured wall time splits into
(visits/packet) x (us/visit). Also reports the front-to-back upper bound:
visits if the stack were popped nearest-first with perfect best-t culling.

Usage: python tools/visit_count.py [scene.xml] [coh|inc]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gdpt_tpu.core.dtypes import BIG
from gdpt_tpu.core.soa import V3
from gdpt_tpu.integrators import path_soa as ps
from gdpt_tpu.scene import parser
from gdpt_tpu.accel import packet_trace as pt


def walk_packet(tab_i, n_super_guess, org, d, tnear, tfar, ordered=False,
                axis_order=False):
    """One packet (P*128 rays) through the table; returns visit counts.

    ordered=True is the idealized nearest-first bound; axis_order=True
    replicates the kernel's actual policy (children stored ascending by
    centroid along tab[row,121]; push direction from lane 0's sign)."""
    P128 = org.shape[0]
    inv = 1.0 / np.where(d == 0, 1e-20, d)
    best = tfar.copy()
    prim = np.full(P128, -1, np.int64)
    tabf = tab_i.view(np.float32)
    stack = [(0, 0.0)]
    visits_super = visits_leaf = 0
    while stack:
        if ordered:
            # nearest-first pop with best-t culling
            stack.sort(key=lambda e: -e[1])
        node, tmin = stack.pop()
        if ordered and tmin > best.max():
            continue
        if node >= 0:
            visits_super += 1
            row = tabf[node]
            rowi = tab_i[node]
            valid = rowi[120]
            ks = range(16)
            if axis_order and d[0, rowi[121]] > 0:
                ks = range(15, -1, -1)
            for k in ks:
                if not (valid >> k) & 1:
                    continue
                b = k * 6
                t0 = (row[b:b + 3][None, :] - org) * inv
                t1 = (row[b + 3:b + 6][None, :] - org) * inv
                t_in = np.maximum(np.minimum(t0, t1).max(axis=1), tnear)
                t_out = np.minimum(np.maximum(t0, t1).min(axis=1), best)
                m = t_in <= t_out
                if m.any():
                    stack.append((int(rowi[96 + k]), float(t_in[m].min())))
        else:
            visits_leaf += 1
            enc = ~node
            start = enc & ((1 << pt._CHAIN_SHIFT) - 1)
            nrows = enc >> pt._CHAIN_SHIFT
            for r in range(start, start + nrows):
                if r != start:
                    visits_leaf += 1
                row = tabf[r]
                rowi = tab_i[r]
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
    return visits_super, visits_leaf, prim


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/scenes/sponza/sponza.xml"
    mode = sys.argv[2] if len(sys.argv) > 2 else "coh"
    n_packets = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    scene, _ = parser.parse_scene(scene_path)
    static = scene.static
    os.environ["GDPT_PACKET"] = "1"
    sc = ps.scene_soa_from_aos(scene)
    tab = sc.geom.packet
    tab_i = np.asarray(tab.table)
    print(f"table rows {tab_i.shape[0]}")

    n = static.width * static.height
    if mode == "coh":
        from gdpt_tpu.core import soa
        u0, u1 = soa.uniform2(jnp.asarray(0, jnp.uint32),
                              jnp.arange(n, dtype=jnp.uint32),
                              jnp.asarray(0, jnp.uint32), 0)
        ys, xs = np.mgrid[0:static.height, 0:static.width]
        org, d = ps.primary_rays_soa(
            static, scene.device.camera,
            jnp.asarray(xs.ravel(), jnp.float32),
            jnp.asarray(ys.ravel(), jnp.float32), u0, u1)
        o = np.stack([np.asarray(org.x), np.asarray(org.y), np.asarray(org.z)], 1)
        dd = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
    else:
        rng = np.random.RandomState(0)
        bbox = np.asarray(tab.bbox)
        lo, hi = bbox[:3], bbox[3:]
        m = 1 << 17
        o = (lo + rng.rand(m, 3) * (hi - lo)).astype(np.float32)
        dd = rng.randn(m, 3).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        n = m

    # morton sort exactly as trace_packet_soa does
    keys = np.asarray(pt._morton_keys(
        tab, V3(*(jnp.asarray(o[:, i]) for i in range(3))),
        V3(*(jnp.asarray(dd[:, i]) for i in range(3)))))
    order = np.argsort(keys, kind="stable")
    o, dd = o[order], dd[order]

    P128 = pt.PACKET_ROWS * 128
    tots = np.zeros(2)
    tots_a = np.zeros(2)
    tots_o = np.zeros(2)
    sel = np.linspace(0, n // P128 - 1, n_packets).astype(int)
    for pi in sel:
        sl = slice(pi * P128, (pi + 1) * P128)
        zeros = np.zeros(P128, np.float32)
        fars = np.full(P128, 3e38, np.float32)
        vs, vl, p0 = walk_packet(tab_i, 0, o[sl], dd[sl], zeros, fars)
        vsa, vla, pa = walk_packet(tab_i, 0, o[sl], dd[sl], zeros, fars,
                                   axis_order=True)
        vso, vlo, _ = walk_packet(tab_i, 0, o[sl], dd[sl], zeros, fars,
                                  ordered=True)
        assert (p0 == pa).all(), "axis-order changed hits"
        tots += (vs, vl)
        tots_a += (vsa, vla)
        tots_o += (vso, vlo)
        print(f"packet {pi}: super {vs} leaf {vl}   axis: {vsa}/{vla}"
              f"   ordered: {vso}/{vlo}")
    tots /= len(sel)
    tots_a /= len(sel)
    tots_o /= len(sel)
    print(f"mean visits/packet: super {tots[0]:.0f} leaf {tots[1]:.0f} "
          f"total {tots.sum():.0f}; axis-order {tots_a.sum():.0f}; "
          f"ordered-bound {tots_o.sum():.0f}")


if __name__ == "__main__":
    main()
