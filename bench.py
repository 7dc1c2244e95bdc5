"""Benchmark: Cornell box 512x512 path tracing throughput on one chip.

Prints one JSON line: Mrays/sec/chip against the 200 Mrays/s baseline
target (BASELINE.md). Ray counts are exact — the integrator reports the
number of rays (primary + shadow + scatter) each sample actually cast.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gdpt_tpu.core import rng as grng
    from gdpt_tpu.core.dtypes import REAL
    from gdpt_tpu.integrators import path as path_integrator
    from gdpt_tpu.scene import presets

    width = height = 512
    spp = 16
    max_depth = 6
    scene = presets.cornell_box(
        width=width, height=height, spp=spp, max_depth=max_depth
    )
    static = scene.static
    ys, xs = np.mgrid[0:height, 0:width]
    xs = jnp.asarray(xs.ravel(), REAL)
    ys = jnp.asarray(ys.ravel(), REAL)
    pix = jnp.arange(width * height, dtype=jnp.int32)

    @jax.jit
    def render_pass(device_scene, sample0, n_samples):
        base_key = jax.random.PRNGKey(0)

        def one_sample(s, carry):
            acc, rays = carry

            def per_ray(x, y, p):
                key = grng.ray_key(base_key, p * spp + sample0 + s)
                return path_integrator.trace_path_stats(
                    device_scene, static, x, y, key
                )

            c, r = jax.vmap(per_ray)(xs, ys, pix)
            return acc + c, rays + jnp.sum(r, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

        acc = jnp.zeros((xs.shape[0], 3), REAL)
        return jax.lax.fori_loop(0, n_samples, one_sample, (acc, jnp.asarray(0.0, REAL)))

    # Warmup + compile.
    img, nrays = render_pass(scene.device, 0, 1)
    img.block_until_ready()

    t0 = time.perf_counter()
    img, nrays = render_pass(scene.device, 1, spp - 1)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    total_rays = float(nrays)
    mrays = total_rays / dt / 1e6
    spp_per_sec = (spp - 1) / dt

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
                    "spp": spp - 1,
                    "max_depth": max_depth,
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
