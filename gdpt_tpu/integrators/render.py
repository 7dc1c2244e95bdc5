"""Render drivers: sample batching, accumulation, integrator dispatch.

The TPU replacement of the reference's tile-based drivers
(reference: src/render.cpp:74-168,374-394): instead of 16x16 thread-pool
tiles, the whole (pixel, sample) grid is evaluated as flat vmapped
batches under jit, with samples-per-pass chosen to bound device memory.
Unlike the reference, the scene's samples_per_pixel is honored (the
reference hardcodes 256 for path and 1000 for gdpt at
src/render.cpp:104,293).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core import rng as grng
from gdpt_tpu.core.dtypes import REAL
from gdpt_tpu.integrators import aux as aux_integrator
from gdpt_tpu.integrators import path as path_integrator
from gdpt_tpu.scene.build import Scene

# Target rays in flight per pass (single chip).
MAX_RAYS_PER_PASS = 1 << 20

_AUX_KINDS = {
    "depth", "shading_normal", "mean_curvature", "ray_differential",
    "mipmap_level",
}


@partial(jax.jit, static_argnames=("static", "trace_fn", "n_samples", "spp", "seed"))
def _render_pass(device, static, trace_fn, xs, ys, pix_idx, sample0,
                 n_samples, spp, seed):
    base_key = jax.random.PRNGKey(seed)

    def one_sample(s, acc):
        def per_ray(x, y, pidx):
            key = grng.ray_key(base_key, pidx * spp + sample0 + s)
            return trace_fn(device, static, x, y, key)

        return acc + jax.vmap(per_ray)(xs, ys, pix_idx)

    acc = jnp.zeros((xs.shape[0], 3), REAL)
    acc = jax.lax.fori_loop(0, n_samples, one_sample, acc)
    return acc


def render_samples(scene: Scene, trace_fn, spp=None, seed=0,
                   start_sample=0, init_acc=None, on_chunk=None):
    """Monte Carlo accumulation driver; returns (h, w, 3) numpy image.

    start_sample/init_acc resume an interrupted accumulation (init_acc is
    the raw (n_pix, 3) float64 sample-sum array); on_chunk(acc, done)
    fires after every device pass for checkpointing.
    """
    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n_pix = w * h
    ys, xs = np.mgrid[0:h, 0:w]
    xs = jnp.asarray(xs.ravel(), REAL)
    ys = jnp.asarray(ys.ravel(), REAL)
    pix_idx = jnp.arange(n_pix, dtype=jnp.int32)

    batch = max(1, min(spp, MAX_RAYS_PER_PASS // n_pix))
    acc = (np.zeros((n_pix, 3), np.float64) if init_acc is None
           else np.asarray(init_acc, np.float64).copy())
    done = int(start_sample)
    while done < spp:
        n = min(batch, spp - done)
        out = _render_pass(
            scene.device, static, trace_fn, xs, ys, pix_idx, done, n, spp, seed
        )
        acc += np.asarray(out, np.float64)
        done += n
        if on_chunk is not None:
            on_chunk(acc, done)
    img = (acc / spp).reshape(h, w, 3)
    # NaN filtering as in the reference volumetric driver
    # (reference: src/render.cpp:156-159).
    return np.where(np.isfinite(img), img, 0.0).astype(np.float32)


def render(scene: Scene, spp=None, seed=0):
    """Integrator dispatch (reference: src/render.cpp:374-394)."""
    integrator = scene.static.options.integrator
    if integrator in _AUX_KINDS:
        return np.asarray(
            aux_integrator.render_aux(scene.device, scene.static, integrator)
        )
    if integrator == "path":
        from gdpt_tpu.integrators import path_soa

        if path_soa.supports_soa(scene):
            return path_soa.render_soa(scene, spp=spp, seed=seed)
        return render_samples(scene, path_integrator.trace_path, spp=spp, seed=seed)
    if integrator == "volpath":
        from gdpt_tpu.integrators import volpath as vol_integrator
        from gdpt_tpu.integrators import volpath_soa

        if volpath_soa.supports_soa_volpath(scene):
            return volpath_soa.render_volpath_soa(scene, spp=spp, seed=seed)
        return render_samples(
            scene, vol_integrator.trace_fn(scene.static), spp=spp, seed=seed
        )
    if integrator == "gradpath":
        from gdpt_tpu.integrators import gdpt as gdpt_integrator
        from gdpt_tpu.integrators import gdpt_soa

        if gdpt_soa.supports_soa_gdpt(scene):
            return gdpt_soa.render_gradpath_soa(scene, spp=spp, seed=seed)
        return gdpt_integrator.render_gradpath(scene, spp=spp, seed=seed)
    raise ValueError(f"unknown integrator: {integrator}")
