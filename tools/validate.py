"""External ground-truth validation vs the reference's committed EXRs.

The reference ships comparison renders (the fork's own experiment
artifacts) that our framework must reproduce at equal spp:

- /root/reference/cbox_gdpt/cb_{1,4,16}.exr       cbox_old.xml, path
- /root/reference/gdpt_renders/new_c_500.exr      cbox_old.xml, path,
                                                  500 spp (converged)
- /root/reference/gdpt_renders/tmp_gdpt_{a}.exr   cbox_old.xml, gradpath
                                                  recon, alpha sweep
                                                  (src/render.cpp:353)
- /root/reference/gdpt_renders/sponza_regular_path_trace/sp_{n}.exr
- /root/reference/gdpt_renders/sponza_grad_path_trace/s_gp_{n}.exr

(The cbox_path/cb_*.exr set renders scenes/cbox/cbox.xml, whose mesh
'Doom combat scene.obj' is absent from the reference tree — verified
unreproducible; cbox_gdpt/'s set is the cbox_old.xml pair. The shipped
build/lajolla binary is foreign-arch and Embree headers/libs are absent,
so a local rebuild is impossible — committed artifacts are the ground
truth, as anticipated in VERDICT.md.)

Noise model: two independent n-spp renders A, B of the same scene
satisfy E[MSE(A,B)] = var_A/n + var_B/n, so we report, per config:
  rmse_equal  — RMSE(ours_n, ref_n), expected ~sqrt(2)*noise(n)
  rmse_conv   — RMSE(ours_high, ref_n), expected ~noise(n): if our
                estimator were biased, this would NOT drop below the
                reference's own noise floor.

Writes VALIDATION.json and VALIDATION.md at the repo root.
"""

import json
import os

_REF_ROOT = os.environ.get('GDPT_REFERENCE', '/root/reference')
_SCENE_ROOT = os.environ.get('GDPT_SCENES', _REF_ROOT + '/scenes')
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

import numpy as np

# The environment's TPU plugin force-prepends its platform at jax
# import, so JAX_PLATFORMS=cpu alone HANGS when the tunnel is down;
# honor the env var programmatically (the only override that works).
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

REF = _REF_ROOT
OUT_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "VALIDATION.json")
OUT_MD = OUT_JSON.replace(".json", ".md")


def rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def rel_mse(a, b):
    denom = np.mean(b, axis=-1, keepdims=True) ** 2 + 1e-2
    return float(np.mean((a - b) ** 2 / denom))


def metrics(ours, ref):
    return {
        "rmse": round(rmse(ours, ref), 5),
        "rel_mse": round(rel_mse(ours, ref), 5),
        "mean_ours": round(float(ours.mean()), 5),
        "mean_ref": round(float(ref.mean()), 5),
        "mean_ratio": round(float(ours.mean() / max(ref.mean(), 1e-9)), 4),
    }


def _with_options(scene, **kw):
    import dataclasses

    opts = dataclasses.replace(scene.static.options, **kw)
    return scene._replace(static=dataclasses.replace(scene.static, options=opts))


def main():
    from gdpt_tpu.core.image import imread
    from gdpt_tpu.integrators import render as R
    from gdpt_tpu.scene import parser

    cache_dir = os.environ.get("GDPT_VALIDATE_CACHE", "")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)

    def render_scene(scene, spp_override=None, seed=0, alpha_override=None,
                     integrator_override=None, cache_key=None):
        # Optional render cache (GDPT_VALIDATE_CACHE=dir): these CPU
        # renders cost up to an hour each; a crash or interrupt should
        # not re-pay completed rows. Keyed by caller-provided tag only —
        # clear the dir after estimator-affecting changes.
        path = (os.path.join(cache_dir, f"{cache_key}.npy")
                if cache_dir and cache_key else None)
        if path and os.path.exists(path):
            print(f"cache hit: {cache_key}", flush=True)
            return np.load(path)
        kw = {}
        if alpha_override is not None:
            kw["gdpt_alpha"] = alpha_override
        if integrator_override is not None:
            kw["integrator"] = integrator_override
        if kw:
            scene = _with_options(scene, **kw)
        img = np.asarray(R.render(scene, spp=spp_override, seed=seed))
        if path:
            np.save(path, img)
        return img

    results = {}
    t_all = time.time()

    # ---- cbox_old path at equal spp --------------------------------
    scene, _ = parser.parse_scene(f"{REF}/scenes/cbox/cbox_old.xml")
    ref_500 = imread(f"{REF}/gdpt_renders/new_c_500.exr")
    ours = {}
    for spp in (1, 4, 16, 512):
        t0 = time.time()
        img = render_scene(scene, spp_override=spp, seed=7,
                           cache_key=f"cbox_path_{spp}_s7")
        ours[spp] = img
        print(f"cbox path {spp} spp: {time.time()-t0:.1f}s "
              f"mean {img.mean():.5f}", flush=True)
    for spp in (1, 4, 16):
        ref = imread(f"{REF}/cbox_gdpt/cb_{spp}.exr")
        m = metrics(ours[spp], ref)
        m["rmse_conv"] = round(rmse(ours[512], ref), 5)
        results[f"cbox_path_{spp}spp"] = m
    results["cbox_path_converged"] = metrics(ours[512], ref_500)

    # ---- cbox GDPT recon, alpha sweep ------------------------------
    # alpha only enters the screened-Poisson reconstruction, so render
    # the 6 accumulation buffers ONCE and re-solve per alpha.
    import jax.numpy as jnp

    from gdpt_tpu.integrators import gdpt_soa
    from gdpt_tpu.ops import poisson

    sc_gdpt, _ = parser.parse_scene(f"{REF}/scenes/cbox/cbox_gdpt.xml")
    t0 = time.time()
    aux_path = (os.path.join(cache_dir, "cbox_gdpt_aux_64_s11.npz")
                if cache_dir else None)
    if aux_path and os.path.exists(aux_path):
        aux = dict(np.load(aux_path))
        print("cache hit: cbox_gdpt_aux_64_s11", flush=True)
    else:
        _, aux = gdpt_soa.render_gradpath_soa(sc_gdpt, spp=64, seed=11,
                                              return_aux=True)
        if aux_path:
            np.savez(aux_path, primal=aux["primal"], gx=aux["gx"],
                     gy=aux["gy"])
        print(f"cbox gdpt buffers (64 spp): {time.time()-t0:.1f}s",
              flush=True)
    for alpha in (0.04, 0.4, 4.0, 40.0):
        ref = imread(f"{REF}/gdpt_renders/tmp_gdpt_{alpha:g}.exr")
        img = np.asarray(poisson.screened_poisson_solve(
            jnp.asarray(aux["primal"]), jnp.asarray(aux["gx"]),
            jnp.asarray(aux["gy"]), alpha))
        img = np.where(np.isfinite(img), img, 0.0).astype(np.float32)
        print(f"cbox gdpt a={alpha:g}: mean {img.mean():.5f}", flush=True)
        results[f"cbox_gdpt_alpha{alpha:g}"] = metrics(img, ref)

    # ---- sponza path at equal spp ----------------------------------
    if os.environ.get("GDPT_VALIDATE_ONLY", "") == "cbox":
        # CPU-insurance mode: sponza rows cost hours off-chip; emit the
        # cbox evidence now. VALIDATION.json/md are rewritten wholesale,
        # deliberately DROPPING any stale pre-fix sponza rows — the
        # _partial marker records that they are pending, not current.
        _write_outputs(results, t_all, partial=True)
        return
    sp, _ = parser.parse_scene(f"{REF}/scenes/sponza/sponza.xml")
    # Off-chip runs can bound the sponza cost: GDPT_VALIDATE_SPONZA_SPP
    # ("1,4") limits the equal-spp rows (a 16-spp CPU render is ~3 h).
    spp_list = tuple(int(x) for x in os.environ.get(
        "GDPT_VALIDATE_SPONZA_SPP", "1,4,16").split(","))
    ours_sp = {}
    for spp in spp_list:
        t0 = time.time()
        img = render_scene(sp, spp_override=spp, seed=3,
                           integrator_override="path",
                           cache_key=f"sponza_path_{spp}_s3")
        ours_sp[spp] = img
        print(f"sponza path {spp} spp: {time.time()-t0:.1f}s "
              f"mean {img.mean():.5f}", flush=True)
    hi = max(spp_list)
    for spp in spp_list:
        ref = imread(
            f"{REF}/gdpt_renders/sponza_regular_path_trace/sp_{spp}.exr")
        if ref.shape != ours_sp[spp].shape:
            results[f"sponza_path_{spp}spp"] = {
                "skip": f"shape {ref.shape} vs {ours_sp[spp].shape}"}
            continue
        m = metrics(ours_sp[spp], ref)
        if hi != spp:
            m["rmse_conv"] = round(rmse(ours_sp[hi], ref), 5)
        results[f"sponza_path_{spp}spp"] = m

    # ---- sponza gradpath: equal-spp + converged cross-check --------
    # The reference's own 256-spp GDPT reconstruction
    # (sponza_grad_path_trace/s_gp_256.exr, mean 0.0514) is the
    # converged gradient-domain artifact; low-spp GDPT recon artifacts
    # are dominated by reconstruction noise (see the 1/4-spp history in
    # git), so the meaningful rows are 16-spp equal and 16-vs-256.
    if os.environ.get("GDPT_VALIDATE_SKIP_GRADPATH", "") == "1":
        results["sponza_gradpath_16spp"] = {
            "skip": "pending TPU (a 16-spp 5-path CPU render is ~10 h)"}
        results["sponza_gradpath_conv256"] = {
            "skip": "pending TPU (a 16-spp 5-path CPU render is ~10 h)"}
        _write_outputs(results, t_all)
        return
    t0 = time.time()
    img_gp = render_scene(sp, spp_override=16, seed=5,
                          integrator_override="gradpath",
                          cache_key="sponza_gradpath_16_s5")
    print(f"sponza gradpath 16 spp: {time.time()-t0:.1f}s "
          f"mean {img_gp.mean():.5f}", flush=True)
    for tag, refp in (
        ("16spp", f"{REF}/gdpt_renders/sponza_grad_path_trace/s_gp_16.exr"),
        ("conv256", f"{REF}/gdpt_renders/sponza_grad_path_trace/s_gp_256.exr"),
    ):
        ref = imread(refp)
        if ref.shape == img_gp.shape:
            results[f"sponza_gradpath_{tag}"] = metrics(img_gp, ref)

    _write_outputs(results, t_all)


def _write_outputs(results, t_all, partial=False):
    import jax

    results = dict(results)
    results["_wall_s"] = round(time.time() - t_all, 1)
    results["_platform"] = jax.devices()[0].platform
    if partial:
        results["_partial"] = ("cbox rows only; sponza rows pending "
                               "(stale pre-fix rows dropped)")
    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=1)

    lines = ["# VALIDATION — RMSE vs reference committed artifacts\n",
             f"Rendered on platform: {results['_platform']} "
             "(estimator is platform-independent; wall times are not).\n",
             "See tools/validate.py for the noise model; rmse_conv is our",
             "high-spp render vs the reference's n-spp artifact and should",
             "approach the reference's own noise floor (unbiasedness).\n"]
    if partial:
        lines.append(f"**PARTIAL RUN**: {results['_partial']}\n")
    lines += ["| config | rmse | rel_mse | rmse_conv | mean ours | mean ref | ratio |",
              "|---|---|---|---|---|---|---|"]
    for k, m in results.items():
        if k.startswith("_"):
            continue
        if "skip" in m:
            lines.append(f"| {k} | skipped: {m['skip']} |||||")
            continue
        lines.append(
            f"| {k} | {m['rmse']} | {m['rel_mse']} | {m.get('rmse_conv','—')}"
            f" | {m['mean_ours']} | {m['mean_ref']} | {m['mean_ratio']} |")
    with open(OUT_MD, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
