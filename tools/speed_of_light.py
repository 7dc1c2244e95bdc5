"""Per-config traversal speed-of-light measurements -> SOL.json.

Defines the hardware-utilization model bench.py reports as `mfu_est`:

  sol_kernel_pool_mrays: packet configs — the kernel on CAPTURED
      steady-state wavefront pool rays (mixed bounce depths, per-lane
      tnear, ): the population the render's extension
      trace actually dispatches. This is the mfu_est denominator for
      packet configs; every other batch below is easier than this.
  sol_kernel_inc_mrays : standalone intersect-only throughput of the
      scene's own traversal backend (packet table or brute force) on an
      incoherent, morton-sorted 1M-ray batch on the real chip.
  sol_kernel_coh_mrays : same on coherent camera-primary rays.
  visit_floor_inc_mrays: model floor for packet scenes only —
      1024 lanes / (mean union visits/packet x 0.36us/visit), where
      0.36us/visit is the measured VPU compute floor of the visit loop
      (see README perf notes). kernel_floor_frac = sol_kernel_inc /
      visit_floor_inc says how close the kernel itself runs to the VPU
      floor; mfu_est says how close the full render runs to the kernel.

Usage:
  python tools/speed_of_light.py kernel   # on TPU: measure kernels
  python tools/speed_of_light.py visits   # on CPU: visit-model floors
Both merge into SOL.json (repo root).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# The environment's TPU plugin force-prepends its platform at jax
# import, so JAX_PLATFORMS=cpu alone HANGS when the tunnel is down;
# honor the env var programmatically (the only override that works).
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

SCENES = os.environ.get("GDPT_SCENES", "/root/reference/scenes")
SOL_PATH = os.path.join(REPO, "SOL.json")
US_PER_VISIT = 0.36  # measured VPU floor of the packet visit loop

# Intersection-math flop counts per (prim, ray) pair, counted from
# traverse_soa._tri_test_rows (Moller-Trumbore: 2 crosses = 18, 4 dots
# = 20, 3 mul-by-inv_det + 1 div + tvec sub + compares) and
# _sphere_test_rows. These price ONLY the geometric test — argmin
# reduction, hit combines, shading, NEE and RNG all count against the
# render — so peak_flops / flops_per_ray is a true brute-force
# traversal speed of light for mfu purposes.
TRI_TEST_FLOPS = 53
SPH_TEST_FLOPS = 45

CONFIGS = [
    ("cbox_512_path", None),  # preset
    ("veach_mi", f"{SCENES}/veach_mi/mi.xml"),
    ("disney_bsdf", f"{SCENES}/disney_bsdf_test/disney_bsdf.xml"),
    ("volpath_test6", f"{SCENES}/volpath_test/volpath_test6.xml"),
    ("sponza_gradpath", f"{SCENES}/sponza/sponza.xml"),
    # Big-scene bench row (734k tris); rendered at 512x512 in bench.py.
    ("disney_array_512",
     f"{SCENES}/disney_bsdf_test/disney_bsdf_array.xml"),
]


def _load(name, path):
    from gdpt_tpu.scene import parser, presets

    if path is None:
        return presets.cornell_box(width=512, height=512, spp=256,
                                   max_depth=6)
    scene, _ = parser.parse_scene(path)
    return scene


def _ray_batches(scene, sc, m=1 << 20):
    """(coherent camera-primary, incoherent bbox-random) ray batches."""
    import jax.numpy as jnp

    from gdpt_tpu.core.soa import V3

    coh, _ = _ray_batches_primary(scene, m)

    geom = scene.device.geom
    g = np.asarray(geom.tri_v0)
    if g.size:
        e1 = np.asarray(geom.tri_e1)
        e2 = np.asarray(geom.tri_e2)
        vs = np.concatenate([g, g + e1, g + e2])
        lo, hi = vs.min(axis=0), vs.max(axis=0)
    else:
        c = np.asarray(geom.sph_center).reshape(-1, 3)
        r = np.asarray(geom.sph_radius).reshape(-1, 1)
        lo, hi = (c - r).min(axis=0), (c + r).max(axis=0)
    rng = np.random.RandomState(0)
    o = (lo + rng.rand(m, 3) * (hi - lo)).astype(np.float32)
    dd = rng.randn(m, 3).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    inc = (V3(*(jnp.asarray(o[:, i]) for i in range(3))),
           V3(*(jnp.asarray(dd[:, i]) for i in range(3))))
    return coh, inc


def _harvest_rays(scene, sc, m=1 << 20, seed=9):
    """Genuine in-render ray distributions: bounce-1 scatter rays and
    NEE shadow rays, produced by the production intersect/shade/sample
    machinery run eagerly from camera primaries. These are the honest
    workload for the traversal ceiling — synthetic bbox-random rays can
    be wildly unrepresentative (most miss a compact object, shrinking
    packet unions)."""
    import jax.numpy as jnp

    from gdpt_tpu.accel import traverse_soa as trs
    from gdpt_tpu.core import soa
    from gdpt_tpu.core.dtypes import BIG
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps
    from gdpt_tpu.ops import materials_soa as msoa

    static = scene.static
    coh, _ = _ray_batches_primary(scene, m=m)
    org, d = coh
    hit, gn_raw = trs.intersect_soa_gn(static, sc.geom, org, d, 0.0, BIG)
    v = ps.shade_hit(static, sc, org, d, hit, gn_raw)
    ok = np.asarray(v.valid) > 0
    used = static.used_material_kinds
    params = msoa.gather_params_soa(
        sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
        static.spec_image_slots, float_tex_slots=static.float_tex_slots)
    n = org.x.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    bu0, bu1 = soa.uniform2(jnp.asarray(seed, jnp.uint32), idx,
                            jnp.asarray(11, jnp.uint32), 0)
    wl, _ = soa.uniform2(jnp.asarray(seed, jnp.uint32), idx,
                         jnp.asarray(12, jnp.uint32), 0)
    samp = msoa.sample_bsdf_soa(params, -1.0 * d, v.gn, v.frame,
                                bu0, bu1, wl, used)
    good = ok & (np.asarray(samp.valid) > 0)
    # Shadow rays toward sampled light points.
    lu0, lu1 = soa.uniform2(jnp.asarray(seed, jnp.uint32), idx,
                            jnp.asarray(13, jnp.uint32), 0)
    lw, lsw = soa.uniform2(jnp.asarray(seed, jnp.uint32), idx,
                           jnp.asarray(14, jnp.uint32), 0)
    _, p_l, _, _, _ = ps.sample_light_point(static, sc, v.position,
                                            lu0, lu1, lw, lsw)
    to_l = p_l - v.position
    sdir = soa.normalize(to_l)

    def pick(o3, d3, mask, what):
        o = np.stack([np.asarray(o3.x), np.asarray(o3.y),
                      np.asarray(o3.z)], 1)[mask]
        dd = np.stack([np.asarray(d3.x), np.asarray(d3.y),
                       np.asarray(d3.z)], 1)[mask]
        # NO TILING. The round-4 harvest tiled survivors up to m rays;
        # duplicates sort adjacent and fill packets with identical rays,
        # overstating the ceiling ~3x (6.49 "SOL" vs 2.12 measured on
        # real pool rays, round5_evidence/trace_decomp.txt). Truncate to
        # whole packets of UNIQUE rays instead.
        if o.shape[0] < 1024:
            raise ValueError(
                f"_harvest_rays: only {o.shape[0]} {what} survivors "
                f"(< 1024); harvested SOL would be meaningless")
        quantum = 1024
        keep = min(m, (o.shape[0] // quantum) * quantum)
        print(f"harvest {what}: {o.shape[0]} survivors, using {keep}",
              flush=True)
        o, dd = o[:keep], dd[:keep]
        return (V3(*(jnp.asarray(o[:, i]) for i in range(3))),
                V3(*(jnp.asarray(dd[:, i]) for i in range(3))))

    bounce = pick(v.position, samp.dir_out, good, "bounce")
    shadow = pick(v.position, sdir, ok, "shadow")
    return bounce, shadow


def _pool_shadow_rays(scene, sc, org, d, alive, tnear):
    """The render's OTHER traced population: NEE shadow rays built from
    the captured steady-state pool by the production machinery — trace
    pool rays, shade, sample a light point, apply nee_soa's exact
    zero-contribution thinning. Returns (origins, dirs, tfar, n_live).
    round5_evidence/occl_ab_disney.txt: these run ~0.9 Mrays/s on disney
    vs 5.74 for the bounce-1 harvested set — the harvested shadow
    ceiling is NOT the render's shadow ceiling."""
    import jax.numpy as jnp

    from gdpt_tpu.accel import traverse_soa as trs
    from gdpt_tpu.core import soa
    from gdpt_tpu.core.dtypes import BIG
    from gdpt_tpu.integrators import path_soa as ps
    from gdpt_tpu.ops import materials_soa as msoa
    from gdpt_tpu.ops import textures_soa as tsoa

    static = scene.static
    n = org.x.shape[0]
    tfar_ext = jnp.where(alive, BIG, -1.0)
    hit, gn_raw = trs.intersect_soa_gn(static, sc.geom, org, d, tnear,
                                       tfar_ext)
    v = ps.shade_hit(static, sc, org, d, hit, gn_raw)
    used = static.used_material_kinds
    params = msoa.gather_params_soa(
        sc.mat_tables, used, v.material_id, v.uv_u, v.uv_v,
        static.spec_image_slots, float_tex_slots=static.float_tex_slots,
        fp=v.fp)
    idx = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.asarray(7, jnp.uint32)
    lu0, lu1 = soa.uniform2(seed, idx, jnp.uint32(3), 0)
    lw, lsw = soa.uniform2(seed, idx, jnp.uint32(4), 0)
    light_id, p_l, n_l, pdf_pt, is_env = ps.sample_light_point(
        static, sc, v.position, lu0, lu1, lw, lsw)
    to_l = p_l - v.position
    dist = soa.length(to_l)
    dl = soa.where(is_env, -1.0 * n_l,
                   to_l * (1.0 / jnp.maximum(dist, 1e-20)))
    g_area = (jnp.maximum(-soa.dot(dl, n_l), 0.0)
              / jnp.maximum(dist * dist, 1e-20))
    g_geo = jnp.where(is_env, 1.0, g_area)
    p1 = soa.take(sc.light_pmf, light_id) * pdf_pt
    f_nee = msoa.eval_bsdf_soa(params, -1.0 * d, dl, v.gn, v.frame, used)
    zero3 = soa.V3(*(jnp.zeros(n) for _ in range(3)))
    env_nee = (
        tsoa.envmap_emission_soa(ps._env_view(static, sc),
                                 sc.mat_tables.pool3, dl)
        if static.has_envmap else zero3)
    l_emit = soa.where(
        is_env, env_nee,
        soa.where(soa.dot(n_l, -1.0 * dl) > 0,
                  soa.gather(sc.light_intensity, light_id), zero3))
    need = (alive & (v.valid > 0) & (g_geo > 0) & (p1 > 0)
            & (soa.vmax(f_nee) > 0) & (soa.vmax(l_emit) > 0))
    eps_shadow = static.shadow_epsilon
    tfar = jnp.where(is_env, BIG, (1.0 - eps_shadow) * dist)
    tfar = jnp.where(need, tfar, -1.0)
    return v.position, dl, tfar, int(jnp.sum(need))


def _ray_batches_primary(scene, m):
    """Coherent camera-primary ray batch (m rays)."""
    import jax.numpy as jnp

    from gdpt_tpu.core import soa
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps

    static = scene.static
    n = static.width * static.height
    u0, u1 = soa.uniform2(jnp.asarray(0, jnp.uint32),
                          jnp.arange(n, dtype=jnp.uint32),
                          jnp.asarray(0, jnp.uint32), 0)
    ys, xs = np.mgrid[0:static.height, 0:static.width]
    org, d = ps.primary_rays_soa(
        static, scene.device.camera,
        jnp.asarray(xs.ravel(), jnp.float32),
        jnp.asarray(ys.ravel(), jnp.float32), u0, u1)
    reps = -(-m // n)
    coh = (V3(*(jnp.tile(c, reps)[:m] for c in (org.x, org.y, org.z))),
           V3(*(jnp.tile(c, reps)[:m] for c in (d.x, d.y, d.z))))
    return coh, n


# Chain K traversals inside ONE dispatch: the axon tunnel adds tens of
# ms of per-dispatch RPC latency, so a single 1M-ray call measures
# latency, not the kernel (symptom: brute-scene "SOL" below the fused
# in-render throughput, mfu_est > 1). The tmin perturbation depends on
# the carry so XLA's while-loop invariant code motion cannot hoist the
# traversal out of the loop; it never changes any hit (t >= 1e-4 > eps).
SOL_CHAIN_K = 8


def _timed_mrays(static, g, org, d, m=None, tnear=1e-4, tfar=None,
                 sort_hint=None, live=None):
    import jax
    import jax.numpy as jnp

    from gdpt_tpu.accel import traverse_soa as trs
    from gdpt_tpu.core.dtypes import BIG
    from gdpt_tpu.core.soa import V3

    import functools

    n = org.x.shape[0]
    counted = n if live is None else live

    @functools.partial(jax.jit, static_argnums=())
    def run():
        def body(_, acc):
            # Carry-dependent, numerically ~0 perturbation so XLA
            # cannot hoist the traversal out of the loop. It rides the
            # ray ORIGINS (traced arrays), not tnear: the brute pallas
            # kernel's contract takes tnear as a static python scalar
            # (pallas_intersect.py intersect_brute_pallas).
            # BOUNDED: if probe ray 0 misses, t[0]=BIG would otherwise
            # teleport every origin off-scene and make iterations 2..K
            # trace nothing (measured: a poisoned chain reports ~K x
            # the honest number; tools/chain_sweep.py).
            eps = 1e-20 * jnp.minimum(acc, 1.0)
            org2 = V3(org.x + eps, org.y, org.z)
            hit, _ = trs.intersect_soa_gn(
                static, g, org2, d, tnear,
                BIG if tfar is None else tfar, sort_hint=sort_hint)
            return acc + hit.t[0]
        return jax.lax.fori_loop(0, SOL_CHAIN_K, body,
                                 jnp.float32(0.0))

    jax.block_until_ready(run())
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return counted * SOL_CHAIN_K / best / 1e6


def _timed_occluded_mrays(static, g, org, d, m=None, tfar=None, live=None):
    import jax
    import jax.numpy as jnp

    from gdpt_tpu.accel import traverse_soa as trs
    from gdpt_tpu.core.dtypes import BIG
    from gdpt_tpu.core.soa import V3

    n = org.x.shape[0]
    counted = n if live is None else live
    tf = jnp.full(n, BIG) if tfar is None else tfar

    @jax.jit
    def run():
        def body(_, acc):
            # anti-hoist via origins; tnear static. occ[0] is 0/1 so
            # the carry stays bounded, but clamp anyway for symmetry.
            eps = 1e-20 * jnp.minimum(acc, 1.0)
            org2 = V3(org.x + eps, org.y, org.z)
            occ = trs.occluded_soa(static, g, org2, d, 1e-4, tf)
            return acc + occ[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, SOL_CHAIN_K, body,
                                 jnp.float32(0.0))

    jax.block_until_ready(run())
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return counted * SOL_CHAIN_K / best / 1e6


def measure_vpu_peak():
    """Measured f32 VPU peak (GFLOP/s): elementwise FMA loops on a
    VMEM-resident block, 4 INDEPENDENT accumulator chains interleaved.
    The round-4 version used a single dependent chain (y = y*a+b), which
    measures FMA *latency*, not throughput — the 254.8 GFLOP/s it
    reported made cbox's in-render arithmetic imply >1 utilization
    (STATUS.md round-4 finding). Independent chains let the VPU pipeline
    fill; each fori iteration does 4 chains x U FMAs = 2 flops each."""
    import jax
    import jax.numpy as jnp

    x = (jnp.arange(1 << 20, dtype=jnp.float32) * 1e-9).reshape(1024, 1024)
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    K, U = 64, 64

    @jax.jit
    def run(x):
        def body(_, ys):
            y0, y1, y2, y3 = ys
            for _ in range(U):
                # Four independent y*a+b chains: dependency depth U,
                # total work 4U FMAs — enough ILP to fill the pipeline.
                y0 = y0 * a + b
                y1 = y1 * a + b
                y2 = y2 * a + b
                y3 = y3 * a + b
            return (y0, y1, y2, y3)
        return jax.lax.fori_loop(
            0, K, body, (x, x * a, x + b, x * a + b))

    jax.block_until_ready(run(x))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, time.perf_counter() - t0)
    return 2.0 * 4 * x.size * K * U / best / 1e9


def measure_kernels(only=None):
    import jax

    from gdpt_tpu.integrators import path_soa as ps

    platform = jax.devices()[0].platform
    out = {}
    m = 1 << 20
    peak_gflops = measure_vpu_peak()
    print(json.dumps({"vpu_peak_gflops": round(peak_gflops, 1)}), flush=True)
    for name, path in CONFIGS:
        if only and name not in only:
            continue
        scene = _load(name, path)
        sc = ps.scene_soa_from_aos(scene)
        coh, inc = _ray_batches(scene, sc, m)
        bounce, shadow = _harvest_rays(scene, sc, m)
        row = {
            "backend": ("brute" if scene.static.use_brute_force else
                        "packet" if sc.geom.packet is not None else "super16"),
            "platform": platform,
            "methodology": "r5: chained dispatch, untiled harvests, "
                           "pool rays for packet configs",
            "sol_kernel_coh_mrays": round(_timed_mrays(
                scene.static, sc.geom, *coh), 2),
            "sol_kernel_inc_mrays": round(_timed_mrays(
                scene.static, sc.geom, *inc), 2),
            # Harvested in-render distributions: bounce-1 scatter rays
            # (closest-hit) and NEE shadow rays (any-hit) — the honest
            # per-workload ceilings.
            "sol_kernel_bounce_mrays": round(_timed_mrays(
                scene.static, sc.geom, *bounce), 2),
            "sol_kernel_shadow_mrays": round(_timed_occluded_mrays(
                scene.static, sc.geom, *shadow), 2),
        }
        if row["backend"] == "packet":
            # THE render ceiling for wavefront configs: the kernel on
            # captured steady-state pool rays (mixed bounce depths,
            # exactly the extension trace's population), traced with
            # the same per-lane tnear the render uses; everything
            # else above is easier than this.
            import jax.numpy as jnp

            from gdpt_tpu.core.soa import V3
            from tools.wavefront_visits import capture_pool_rays

            rays = capture_pool_rays(scene, warm_chunks=3, pool=1 << 18)
            porg = V3(*(jnp.asarray(rays[k]) for k in ("ox", "oy", "oz")))
            pd = V3(*(jnp.asarray(rays[k]) for k in ("dx", "dy", "dz")))
            pb = jnp.asarray(rays["bounce"])
            palive = jnp.asarray(rays["alive"])
            ptn = jnp.where(pb == 0, 0.0,
                            scene.static.intersection_epsilon)
            # Dead lanes ride as dead rays (tfar < tnear) exactly like
            # the render's extension dispatch, and only live rays count
            # toward the ceiling (the render's Mrays/s counts live).
            ptf = jnp.where(palive, 3e37, -1.0)
            live_ext = int(np.asarray(palive).sum())
            row["sol_kernel_pool_mrays"] = round(_timed_mrays(
                scene.static, sc.geom, porg, pd, tnear=ptn, tfar=ptf,
                live=live_ext), 2)
            # Pool-ray shadow class + ray-mix composite ceiling: the
            # render's traced rays are ~live_ext extension + live_sh
            # NEE shadow rays per iteration; the honest denominator for
            # mfu_est is the harmonic ray-mix of the two per-class
            # ceilings (fixes sponza_gradpath mfu_est = 1.109 > 1 in
            # round-5 probe2, which divided by the extension-only pool
            # ceiling).
            sorg, sdl, stf, live_sh = _pool_shadow_rays(
                scene, sc, porg, pd, palive, ptn)
            row["pool_live_ext"] = live_ext
            row["pool_live_shadow"] = live_sh
            if live_sh > 0:
                row["sol_kernel_shadow_pool_mrays"] = round(
                    _timed_occluded_mrays(scene.static, sc.geom, sorg,
                                          sdl, tfar=stf, live=live_sh), 2)
                mix = (live_ext + live_sh) / (
                    live_ext / row["sol_kernel_pool_mrays"]
                    + live_sh / row["sol_kernel_shadow_pool_mrays"])
                row["sol_mix_ceiling_mrays"] = round(mix, 2)
        if row["backend"] == "brute":
            # The standalone brute dispatch streams (T, N) broadcasts
            # through HBM, which the fused in-render code never
            # materializes — so the measured standalone number is NOT
            # the render's ceiling (it can sit BELOW the render). The
            # honest ceiling is the compute roofline: measured VPU
            # peak / intersection flops per ray.
            fpr = (scene.static.n_tris * TRI_TEST_FLOPS
                   + scene.static.n_spheres * SPH_TEST_FLOPS)
            row["flops_per_ray"] = fpr
            row["vpu_peak_gflops"] = round(peak_gflops, 1)
            row["sol_flop_floor_mrays"] = round(
                peak_gflops * 1e3 / fpr, 2)
        out[name] = row
        print(json.dumps({"config": name, **row}), flush=True)
    return out


def measure_visit_floors(n_packets=12):
    """CPU visit-model floor for packet scenes (interpret-mode walk)."""
    from gdpt_tpu.accel import packet_trace as pt
    from gdpt_tpu.core.soa import V3
    from gdpt_tpu.integrators import path_soa as ps
    from tools.visit_count import walk_packet

    import jax.numpy as jnp

    out = {}
    for name, path in CONFIGS:
        scene = _load(name, path)
        if scene.static.use_brute_force:
            continue
        sc = ps.scene_soa_from_aos(scene)
        tab = sc.geom.packet
        if tab is None:
            continue
        tab_i = np.asarray(tab.table)
        P128 = pt.PACKET_ROWS * 128

        def count(o3, d3):
            o = np.stack([np.asarray(o3.x), np.asarray(o3.y),
                          np.asarray(o3.z)], 1)
            dd = np.stack([np.asarray(d3.x), np.asarray(d3.y),
                           np.asarray(d3.z)], 1)
            keys = np.asarray(pt._morton_keys(
                tab, V3(*(jnp.asarray(o[:, i]) for i in range(3))),
                V3(*(jnp.asarray(dd[:, i]) for i in range(3)))))
            order = np.argsort(keys)
            o, dd = o[order], dd[order]
            visits = []
            stride = max(1, (o.shape[0] // P128) // n_packets)
            for p in range(0, o.shape[0] // P128, stride):
                s = p * P128
                vs_, vl_, _ = walk_packet(
                    tab_i, 0, o[s:s + P128], dd[s:s + P128],
                    1e-4, np.full(P128, 1e30, np.float32), axis_order=True)
                visits.append(vs_ + vl_)
                if len(visits) >= n_packets:
                    break
            return float(np.mean(visits))

        _, inc = _ray_batches(scene, sc, m=1 << 17)
        bounce, _ = _harvest_rays(scene, sc, m=1 << 17)
        v_inc = count(*inc)
        v_bounce = count(*bounce)
        out[name] = {
            "visits_per_packet_inc": round(v_inc, 1),
            "visit_floor_inc_mrays": round(
                P128 / (v_inc * US_PER_VISIT * 1e-6) / 1e6, 2),
            "visits_per_packet_bounce": round(v_bounce, 1),
            "visit_floor_bounce_mrays": round(
                P128 / (v_bounce * US_PER_VISIT * 1e-6) / 1e6, 2),
        }
        print(json.dumps({"config": name, **out[name]}), flush=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    only = None
    for a in sys.argv[2:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    sol = {}
    if os.path.exists(SOL_PATH):
        with open(SOL_PATH) as f:
            sol = json.load(f)
    rows = (measure_kernels(only=only) if mode == "kernel"
            else measure_visit_floors())
    for name, row in rows.items():
        sol.setdefault(name, {}).update(row)
        for suffix in ("bounce", "inc"):
            k, f = (f"sol_kernel_{suffix}_mrays",
                    f"visit_floor_{suffix}_mrays")
            if k in sol[name] and f in sol[name]:
                sol[name]["kernel_floor_frac"] = round(
                    sol[name][k] / sol[name][f], 3)
                break
    with open(SOL_PATH, "w") as f:
        json.dump(sol, f, indent=1, sort_keys=True)
    print(f"wrote {SOL_PATH}")


if __name__ == "__main__":
    main()
