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


def render_soa_sharded(scene, mesh: Mesh, spp=None, seed=0):
    """Distributed SoA fast-path render: every (N,) ray component array is
    sharded over the 'rays' axis; the SoA scene tables are replicated.
    Same transport as path_soa.render_soa."""
    from gdpt_tpu.integrators import path_soa

    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n_dev = mesh.devices.size
    n_pix = w * h
    pad = (-n_pix) % (n_dev * 128)
    ys, xs = np.mgrid[0:h, 0:w]
    xs = np.concatenate([xs.ravel(), np.zeros(pad)]).astype(np.float32)
    ys = np.concatenate([ys.ravel(), np.zeros(pad)]).astype(np.float32)
    ray_idx = np.concatenate(
        [np.arange(n_pix), np.zeros(pad)]
    ).astype(np.uint32)

    ray_sharding = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    sc = jax.device_put(path_soa.scene_soa_from_aos(scene), repl)
    camera = jax.device_put(scene.device.camera, repl)
    xs_d = jax.device_put(jnp.asarray(xs), ray_sharding)
    ys_d = jax.device_put(jnp.asarray(ys), ray_sharding)
    idx_d = jax.device_put(jnp.asarray(ray_idx), ray_sharding)

    out, _ = path_soa._soa_pass(
        static, camera, sc, xs_d, ys_d, idx_d,
        jnp.asarray(seed, jnp.uint32), jnp.asarray(0, jnp.uint32), spp,
    )
    img = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1)
    img = (img[:n_pix] / spp).reshape(h, w, 3).astype(np.float32)
    return np.where(np.isfinite(img), img, 0.0)


def render_gradpath_soa_sharded(scene, mesh: Mesh, spp=None, seed=0):
    """Distributed SoA gradient-domain render: rays sharded, scene
    replicated; the screened-Poisson solve runs on the gathered host
    buffers (it is O(HW log HW), negligible next to tracing)."""
    from gdpt_tpu.integrators import gdpt_soa, path_soa
    from gdpt_tpu.ops import poisson

    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n_dev = mesh.devices.size
    n_pix = w * h
    pad = (-n_pix) % (n_dev * 128)
    ys, xs = np.mgrid[0:h, 0:w]
    xs = np.concatenate([xs.ravel(), np.zeros(pad)]).astype(np.float32)
    ys = np.concatenate([ys.ravel(), np.zeros(pad)]).astype(np.float32)
    ray_idx = np.concatenate([np.arange(n_pix), np.zeros(pad)]).astype(np.uint32)

    ray_sharding = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    sc = jax.device_put(path_soa.scene_soa_from_aos(scene), repl)
    camera = jax.device_put(scene.device.camera, repl)
    xs_d = jax.device_put(jnp.asarray(xs), ray_sharding)
    ys_d = jax.device_put(jnp.asarray(ys), ray_sharding)
    idx_d = jax.device_put(jnp.asarray(ray_idx), ray_sharding)

    out, _ = gdpt_soa._gdpt_pass(
        static, camera, sc, xs_d, ys_d, idx_d,
        jnp.asarray(seed, jnp.uint32), jnp.asarray(0, jnp.uint32), spp,
    )

    def img(buf):
        a = np.stack([np.asarray(buf.x), np.asarray(buf.y), np.asarray(buf.z)], -1)
        return (a[:n_pix] / spp).reshape(h, w, 3).astype(np.float32)

    primal, primal_bf, gxh, gxn, gyh, gyn = (img(b) for b in out)
    gx, gy = poisson.assemble_gradients(
        jnp.asarray(gxh), jnp.asarray(gxn), jnp.asarray(gyh), jnp.asarray(gyn)
    )
    recon = poisson.screened_poisson_solve(
        jnp.asarray(primal), gx, gy, static.options.gdpt_alpha
    )
    return np.where(np.isfinite(recon), np.asarray(recon), 0.0).astype(np.float32)


def render_volpath_soa_sharded(scene, mesh: Mesh, spp=None, seed=0):
    """Distributed SoA volumetric render (final null-scattering rung)."""
    from gdpt_tpu.integrators import path_soa, volpath_soa
    from gdpt_tpu.ops import media_soa

    static = scene.static
    w, h = static.width, static.height
    spp = spp if spp is not None else static.options.samples_per_pixel
    n_dev = mesh.devices.size
    n_pix = w * h
    pad = (-n_pix) % (n_dev * 128)
    ys, xs = np.mgrid[0:h, 0:w]
    xs = np.concatenate([xs.ravel(), np.zeros(pad)]).astype(np.float32)
    ys = np.concatenate([ys.ravel(), np.zeros(pad)]).astype(np.float32)
    ray_idx = np.concatenate([np.arange(n_pix), np.zeros(pad)]).astype(np.uint32)

    ray_sharding = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    sc = jax.device_put(path_soa.scene_soa_from_aos(scene), repl)
    media = jax.device_put(media_soa.media_soa(scene.device.media), repl)
    camera = jax.device_put(scene.device.camera, repl)
    xs_d = jax.device_put(jnp.asarray(xs), ray_sharding)
    ys_d = jax.device_put(jnp.asarray(ys), ray_sharding)
    idx_d = jax.device_put(jnp.asarray(ray_idx), ray_sharding)

    out, _ = volpath_soa._vol_pass(
        static, camera, sc, media, xs_d, ys_d, idx_d,
        jnp.asarray(seed, jnp.uint32), jnp.asarray(0, jnp.uint32), spp,
    )
    img = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1)
    img = (img[:n_pix] / spp).reshape(h, w, 3).astype(np.float32)
    return np.where(np.isfinite(img), img, 0.0)
