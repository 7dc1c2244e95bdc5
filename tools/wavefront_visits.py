"""In-situ packet-divergence analysis for the wavefront traversal.

The round-5 stage profile (tools/profile_wavefront.py) showed the
extension trace running at ~1.5 Mrays/s full-width on disney_bsdf —
far below both the harvested-ray SOL (6.49, artificially coherent:
tiling a few hundred k survivors to 1M duplicates rays into identical-
ray packets) and the synthetic-incoherent SOL (3.36). Hypothesis: the
wavefront pool mixes bounce depths, and the morton sort alone leaves
packets with huge node-visit unions.

This tool captures REAL steady-state pool rays on the TPU (capture
mode), then replays the kernel's shared-stack walk on CPU under
candidate sort keys (analyze mode) to measure mean visits/packet:

  python tools/wavefront_visits.py capture [scene.xml]  # on TPU
  python tools/wavefront_visits.py analyze [scene.xml]  # on CPU
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

NPZ = "/tmp/wavefront_rays.npz"


def capture_pool_rays(scene, warm_chunks=3, pool=1 << 18):
    """Run the path wavefront to steady state on the current backend
    and return the post-regen ray stream of the next iteration — the
    exact population the extension trace dispatches on. Returns a dict
    of numpy arrays (ox..dz, bounce)."""
    import jax
    import jax.numpy as jnp

    from gdpt_tpu.core import soa
    from gdpt_tpu.core.dtypes import REAL
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps

    static = scene.static
    camera = scene.device.camera
    n_pix = static.width * static.height
    sc = ps.scene_soa_from_aos(scene)
    lane_q = 8 * 128
    pool = -(-pool // lane_q) * lane_q
    total = n_pix * 64
    z = lambda: jnp.zeros(pool, REAL)
    st = dict(
        org=V3(z(), z(), z()), d=V3(jnp.ones(pool, REAL), z(), z()),
        tp=V3(z(), z(), z()), pdf_prev=jnp.zeros(pool, REAL),
        eta_scale=jnp.ones(pool, REAL), rr_prev=jnp.ones(pool, REAL),
        cont=jnp.ones(pool, REAL), radius=jnp.zeros(pool, REAL),
        spread=jnp.zeros(pool, REAL), pixel=jnp.zeros(pool, jnp.uint32),
        sample=jnp.zeros(pool, jnp.uint32), bounce=jnp.zeros(pool, jnp.int32),
        alive=jnp.zeros(pool, REAL), next_item=jnp.asarray(0, jnp.uint32),
        total=jnp.asarray(total, jnp.uint32), seed=jnp.asarray(0, jnp.uint32),
        rays=jnp.asarray(0.0, REAL), occ_sum=jnp.asarray(0.0, REAL),
        iters=jnp.asarray(0.0, REAL),
        acc_x=jnp.zeros(n_pix, REAL), acc_y=jnp.zeros(n_pix, REAL),
        acc_z=jnp.zeros(n_pix, REAL),
    )
    body = jax.jit(lambda s: ps._wavefront_body(static, camera, sc, s))
    for _ in range(warm_chunks * 8):
        st = body(st)
    jax.block_until_ready(st)

    # Post-regen ray stream of the NEXT iteration (what the extension
    # trace actually sees): replicate the body's regen block.
    dead = st["alive"] <= 0
    rank = jnp.cumsum(dead.astype(jnp.uint32)) - 1
    item = st["next_item"] + jnp.where(dead, rank, 0)
    issue = dead & (item < st["total"]) & (item >= st["next_item"])
    pixel = jnp.where(issue, item % jnp.uint32(n_pix), st["pixel"])
    sample = jnp.where(issue, item // jnp.uint32(n_pix), st["sample"])
    xs = (pixel % jnp.uint32(static.width)).astype(REAL)
    ys = (pixel // jnp.uint32(static.width)).astype(REAL)
    u0, u1 = soa.uniform2(st["seed"], pixel, jnp.uint32(ps._CTR_PIXEL),
                          sample)
    porg, pd = ps.primary_rays_soa(static, camera, xs, ys, u0, u1)
    org = soa.where(issue, porg, st["org"])
    d = soa.where(issue, pd, st["d"])
    bounce = jnp.where(issue, 0, st["bounce"])
    alive = issue | (st["alive"] > 0)
    return dict(
        ox=np.asarray(org.x), oy=np.asarray(org.y), oz=np.asarray(org.z),
        dx=np.asarray(d.x), dy=np.asarray(d.y), dz=np.asarray(d.z),
        bounce=np.asarray(bounce),
        alive=np.asarray(alive))


def capture(scene_path, warm_chunks=3, pool=1 << 18):
    from gdpt_tpu.scene import parser

    scene, _ = parser.parse_scene(scene_path)
    rays = capture_pool_rays(scene, warm_chunks=warm_chunks, pool=pool)
    np.savez(NPZ, **rays)
    hist = np.bincount(rays["bounce"], minlength=8)
    print(f"captured {rays['ox'].shape[0]} post-regen rays -> {NPZ}; "
          f"bounce histogram: {hist[:8].tolist()}", flush=True)


def analyze(scene_path, n_packets=24):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gdpt_tpu.accel import packet_trace as pt
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps
    from gdpt_tpu.scene import parser
    from tools.visit_count import walk_packet

    scene, _ = parser.parse_scene(scene_path)
    sc = ps.scene_soa_from_aos(scene)
    tab = sc.geom.packet
    assert tab is not None, "scene has no packet table"
    tab_i = np.asarray(tab.table)
    P128 = pt.PACKET_ROWS * 128

    z = np.load(NPZ)
    o = np.stack([z["ox"], z["oy"], z["oz"]], 1)
    dd = np.stack([z["dx"], z["dy"], z["dz"]], 1)
    bounce = z["bounce"]
    n = o.shape[0]
    base_keys = np.asarray(pt._morton_keys(
        tab, V3(*(jnp.asarray(o[:, i]) for i in range(3))),
        V3(*(jnp.asarray(dd[:, i]) for i in range(3)))))

    def mean_visits(order, label):
        os_, ds_ = o[order], dd[order]
        visits = []
        t0 = time.time()
        stride = max(1, (n // P128) // n_packets)
        for p in range(0, n // P128, stride):
            s = p * P128
            vs_, vl_, _ = walk_packet(
                tab_i, 0, os_[s:s + P128], ds_[s:s + P128],
                1e-4, np.full(P128, 1e30, np.float32), axis_order=True)
            visits.append(vs_ + vl_)
            if len(visits) >= n_packets:
                break
        v = float(np.mean(visits))
        floor = P128 / (v * 0.36e-6) / 1e6
        print(f"{label:34s} visits/packet {v:7.1f}  "
              f"floor@0.36us {floor:6.2f} Mrays/s", flush=True)
        return v

    hist = np.bincount(bounce, minlength=12)
    print(f"{n} rays, bounce histogram {hist[:8].tolist()}", flush=True)
    mean_visits(np.argsort(base_keys, kind="stable"), "morton (current)")
    mean_visits(np.argsort(bounce.astype(np.int64) * (1 << 22)
                           + base_keys, kind="stable"), "bounce << morton")
    # Finer origin quantization: 8 bits/axis.
    lo = np.asarray(tab.bbox[:3])
    ext = np.maximum(np.asarray(tab.bbox[3:]) - lo, 1e-6)

    def spread3(v):
        v = v.astype(np.int64)
        v = (v | (v << 16)) & 0x0000FF0000FF
        v = (v | (v << 8)) & 0x00F00F00F00F
        v = (v | (v << 4)) & 0x0C30C30C30C3
        v = (v | (v << 2)) & 0x249249249249
        return v

    q = np.clip((o - lo) / ext, 0.0, 0.999)
    m8 = (spread3((q[:, 0] * 256).astype(np.int64))
          | (spread3((q[:, 1] * 256).astype(np.int64)) << 1)
          | (spread3((q[:, 2] * 256).astype(np.int64)) << 2))
    octant = ((dd[:, 0] < 0).astype(np.int64)
              | ((dd[:, 1] < 0).astype(np.int64) << 1)
              | ((dd[:, 2] < 0).astype(np.int64) << 2))
    mean_visits(np.argsort((octant << 24) | m8, kind="stable"),
                "octant | morton8")
    mean_visits(np.argsort((bounce.astype(np.int64) << 27)
                           | (octant << 24) | m8, kind="stable"),
                "bounce | octant | morton8")
    # Direction-major: quantized direction (4 bits/axis via octant+2)
    dq = np.clip((dd + 1.0) * 0.5 * 8, 0, 7).astype(np.int64)
    dkey = (dq[:, 0] << 6) | (dq[:, 1] << 3) | dq[:, 2]
    mean_visits(np.argsort((dkey << 24) | m8, kind="stable"),
                "dir9 | morton8")
    mean_visits(np.argsort((m8 << 9) | dkey, kind="stable"),
                "morton8 | dir9")


if __name__ == "__main__":
    mode = sys.argv[1]
    scene_path = (sys.argv[2] if len(sys.argv) > 2 else
                  "/root/reference/scenes/disney_bsdf_test/disney_bsdf.xml")
    if mode == "capture":
        capture(scene_path)
    else:
        analyze(scene_path)
