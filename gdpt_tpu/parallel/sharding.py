"""Multi-chip rendering over a jax.sharding.Mesh.

The reference's only parallelism is a work-stealing thread pool over
16x16 image tiles in shared memory (reference: src/parallel.cpp,
src/render.cpp:82-90). The TPU-native mapping is pure data parallelism
over the (pixel, sample) grid:

- the frozen scene pytree is *replicated* to every chip;
- the flat ray batch is *sharded* over the 'rays' mesh axis;
- there is no cross-device communication inside the bounce loop — the
  only collective is the implicit gather when the sharded framebuffer is
  fetched (and a psum when samples-per-pixel are additionally sharded).

Collectives ride ICI; multi-host assembly of the final image is a host
gather at the end of the render, mirroring SURVEY.md section 2.3.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdpt_tpu.core import rng as grng
from gdpt_tpu.core.dtypes import REAL


def make_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("rays",))


def render_samples_sharded(scene, trace_fn, mesh: Mesh, spp=None, seed=0,
                           sample_shards=1):
    """Distributed Monte Carlo render.

    The pixel axis is sharded over mesh axis 'rays'; optionally each
    device also iterates over a disjoint slice of samples
    (sample_shards > 1 splits spp across passes). Returns (h, w, 3).
    """
    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n_dev = mesh.devices.size
    n_pix = w * h
    pad = (-n_pix) % n_dev
    ys, xs = np.mgrid[0:h, 0:w]
    xs = np.concatenate([xs.ravel(), np.zeros(pad)]).astype(np.float32)
    ys = np.concatenate([ys.ravel(), np.zeros(pad)]).astype(np.float32)
    pix_idx = np.concatenate([np.arange(n_pix), np.zeros(pad)]).astype(np.int32)

    ray_sharding = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    xs_d = jax.device_put(jnp.asarray(xs), ray_sharding)
    ys_d = jax.device_put(jnp.asarray(ys), ray_sharding)
    pix_d = jax.device_put(jnp.asarray(pix_idx), ray_sharding)
    device_scene = jax.device_put(scene.device, repl)

    @jax.jit
    def one_pass(dev_scene, sample0, n_samples):
        base_key = jax.random.PRNGKey(seed)

        def one_sample(s, acc):
            def per_ray(x, y, pidx):
                key = grng.ray_key(base_key, pidx * spp + sample0 + s)
                return trace_fn(dev_scene, static, x, y, key)

            return acc + jax.vmap(per_ray)(xs_d, ys_d, pix_d)

        acc = jnp.zeros((xs_d.shape[0], 3), REAL)
        return jax.lax.fori_loop(0, n_samples, one_sample, acc)

    acc = np.zeros((xs.shape[0], 3), np.float64)
    chunk = max(1, spp // max(sample_shards, 1))
    done = 0
    while done < spp:
        n = min(chunk, spp - done)
        acc += np.asarray(one_pass(device_scene, done, n), np.float64)
        done += n
    img = (acc[:n_pix] / spp).reshape(h, w, 3)
    return np.where(np.isfinite(img), img, 0.0).astype(np.float32)


def render_soa_sharded(scene, mesh: Mesh, spp=None, seed=0, **kw):
    """Distributed SoA fast-path render: every (N,) ray component array is
    sharded over the 'rays' axis; the SoA scene tables are replicated.

    Thin front for path_soa.render_soa(mesh=...) — the SAME banded/
    batched/checkpointable production loop serves single-chip and
    multi-chip runs (reference analog: one tile scheduler for every
    integrator, src/render.cpp:82-90)."""
    from gdpt_tpu.integrators import path_soa

    return path_soa.render_soa(scene, spp=spp, seed=seed, mesh=mesh, **kw)


def render_gradpath_soa_sharded(scene, mesh: Mesh, spp=None, seed=0, **kw):
    """Distributed SoA gradient-domain render: rays sharded, scene
    replicated; the screened-Poisson solve runs on the gathered host
    buffers (it is O(HW log HW), negligible next to tracing).

    Thin front for gdpt_soa.render_gradpath_soa(mesh=...) — multi-chip
    runs take the same pixel-band dispatch loop as single-chip."""
    from gdpt_tpu.integrators import gdpt_soa

    return gdpt_soa.render_gradpath_soa(scene, spp=spp, seed=seed,
                                        mesh=mesh, **kw)


def render_volpath_soa_sharded(scene, mesh: Mesh, spp=None, seed=0, **kw):
    """Distributed SoA volumetric render (final null-scattering rung),
    via volpath_soa.render_volpath_soa(mesh=...) — one production loop."""
    from gdpt_tpu.integrators import volpath_soa

    return volpath_soa.render_volpath_soa(scene, spp=spp, seed=seed,
                                          mesh=mesh, **kw)
