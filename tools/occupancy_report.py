"""Measured wavefront occupancy + throughput: banded loop vs
sample-regeneration pool, on the path and GDPT integrators.

Prints one JSON line per (scene, integrator, mode). The wavefront
drivers record their mean live-lane fraction per iteration
(occ_sum/iters telemetry); the banded loop's effective occupancy is
derived from ray counts: rays / (iterations * width) is not directly
observable there, so we report wall time + rays and let the wavefront
rows carry the occupancy numbers.

Usage: python tools/occupancy_report.py [sponza|disney|volpath6|both]
                [--spp-path N] [--spp-gdpt N] [--integ path|gradpath|volpath]
                [--mode banded|wavefront]

Representative occupancy needs enough spp that the steady-state
refill regime dominates the drain tail: at spp=1 on disney the queue
(350k items) drains after ~2 refills of a 256k pool and the mean is
mostly tail (measured 0.26); the default spp below keep the cost of a
full sweep bounded, pass higher --spp-gdpt for the steady-state number.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_tpu_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REF = os.environ.get("GDPT_REFERENCE", "/root/reference")
SCENES = {
    "sponza": f"{_REF}/scenes/sponza/sponza.xml",
    "disney": f"{_REF}/scenes/disney_bsdf_test/disney_bsdf.xml",
    "volpath6": f"{_REF}/scenes/volpath_test/volpath_test6.xml",
}


def run(scene_path, name, spp_path=2, spp_gdpt=1, integ_only=None,
        mode_only=None):
    import numpy as np

    from gdpt_tpu.integrators import gdpt_soa, path_soa, volpath_soa
    from gdpt_tpu.scene import parser

    sc, _ = parser.parse_scene(scene_path)

    if sc.static.options.integrator == "volpath":
        combos = (("volpath", spp_path, volpath_soa.render_volpath_soa,
                   None),)
    else:
        combos = (
            ("path", spp_path, path_soa.render_soa,
             path_soa.render_soa_wavefront),
            ("gradpath", spp_gdpt, gdpt_soa.render_gradpath_soa, None),
        )
    for integ, spp, fn, wf in combos:
        if integ_only and integ != integ_only:
            continue
        for mode in ("banded", "wavefront"):
            if mode_only and mode != mode_only:
                continue
            os.environ["GDPT_WAVEFRONT"] = "0" if mode == "banded" else "1"
            t0 = time.perf_counter()
            out = fn(sc, spp=spp, seed=0, return_stats=True)
            img, rays = out[0], out[-1]
            dt = time.perf_counter() - t0
            row = {
                "scene": name, "integrator": integ, "mode": mode,
                "spp": spp, "wall_s": round(dt, 2),
                "Mrays": round(rays / dt / 1e6, 3),
                "spp_per_s": round(spp / dt, 4),
                "mean": round(float(np.asarray(img).mean()), 5),
            }
            if mode == "wavefront":
                occ = getattr(path_soa.render_soa_wavefront,
                              "last_occupancy", None)
                if integ == "gradpath":
                    occ = getattr(gdpt_soa._gdpt_wavefront_accum,
                                  "last_occupancy", None)
                    row["iterations"] = getattr(
                        gdpt_soa._gdpt_wavefront_accum, "last_iters", None)
                if integ == "volpath":
                    occ = getattr(volpath_soa._vol_wavefront_accum,
                                  "last_occupancy", None)
                    row["iterations"] = getattr(
                        volpath_soa._vol_wavefront_accum, "last_iters",
                        None)
                if occ is not None:
                    row["occupancy"] = round(occ, 4)
            print(json.dumps(row), flush=True)


def main():
    args = sys.argv[1:]
    which = args[0] if args and not args[0].startswith("--") else "both"
    opts = {"--spp-path": 2, "--spp-gdpt": 1, "--integ": None,
            "--mode": None}
    for i, a in enumerate(args):
        if a in ("--spp-path", "--spp-gdpt"):
            opts[a] = int(args[i + 1])
        elif a in ("--integ", "--mode"):
            opts[a] = args[i + 1]
    names = list(SCENES) if which == "both" else [which]
    for n in names:
        run(SCENES[n], n, spp_path=opts["--spp-path"],
            spp_gdpt=opts["--spp-gdpt"], integ_only=opts["--integ"],
            mode_only=opts["--mode"])


if __name__ == "__main__":
    main()
