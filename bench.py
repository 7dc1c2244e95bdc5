"""Benchmark: Cornell box 512x512 path tracing throughput on one chip.

Prints one JSON line: Mrays/sec/chip against the 200 Mrays/s baseline
target (BASELINE.md). Ray counts are exact — the integrator counts every
ray it casts (primary + shadow + scatter).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")


def main():
    import jax

    from gdpt_tpu.integrators import path_soa
    from gdpt_tpu.scene import presets

    width = height = 512
    spp = 256
    max_depth = 6
    scene = presets.cornell_box(
        width=width, height=height, spp=spp, max_depth=max_depth
    )

    # Warmup/compile pass with the exact sample-batch shape measured below.
    img, _ = path_soa.render_soa(scene, spp=spp, seed=0, return_stats=True)

    t0 = time.perf_counter()
    img, nrays = path_soa.render_soa(scene, spp=spp, seed=0, return_stats=True)
    dt = time.perf_counter() - t0
    mrays = nrays / dt / 1e6
    spp_per_sec = spp / dt

    print(
        json.dumps(
            {
                "metric": "cbox_512_path_Mrays_per_sec_per_chip",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 200.0, 3),
                "detail": {
                    "spp_per_sec_512x512": round(spp_per_sec, 2),
                    "wall_s": round(dt, 3),
                    "spp": spp,
                    "max_depth": max_depth,
                    "mean_radiance": round(float(img.mean()), 5),
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
