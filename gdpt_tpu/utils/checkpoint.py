"""Render checkpoint / resume.

The reference has none (SURVEY.md section 5: renders are one-shot).
Monte Carlo accumulation makes checkpointing natural: persist the
running per-pixel sums and the sample count; resuming continues the
deterministic counter-based sample streams exactly where they stopped.

Covers all long-running integrators — path, volpath (all versions),
and gradpath (whose 6-buffer accumulator state — primal, brute-force
primal, 4 one-sided gradients — is saved before Poisson reconstruction).
Checkpoints carry a scene/seed/spp fingerprint; a stale file from a
different render is discarded rather than corrupting the accumulator.
"""

import hashlib
import os
import warnings

import numpy as np


def _fingerprint(scene, spp, seed):
    """Deterministic digest of everything the accumulator depends on.

    SceneStatic is a frozen dataclass of plain ints/floats/tuples, so its
    repr is stable across processes (unlike Python hash()). Static facts
    alone are not enough: two renders of the same scene file with an
    edited light or material value share every count/flag, so the digest
    also folds in the scene *content* — every device-array leaf's
    shape/dtype plus a CRC32 of its full bytes. CRC runs at C speed
    (~1 GB/s), cheap once per render even on multi-MB meshes, and unlike
    the old strided byte sampling it perturbs on ANY element edit
    (a few changed floats in a large buffer used to hash identically
    with high probability — round-3 advisor finding).
    """
    import jax
    import zlib

    h = hashlib.sha1(f"{scene.static!r}|spp={spp}|seed={seed}|v4".encode())
    leaves = jax.tree_util.tree_leaves(scene.device)
    for leaf in leaves:
        a = np.ascontiguousarray(np.asarray(leaf))
        crc = zlib.crc32(a.view(np.uint8).reshape(-1))
        h.update(f"|{a.shape}{a.dtype}{crc}".encode())
    return h.hexdigest()


def save_checkpoint(path, acc, samples_done, fingerprint=""):
    """Atomic save (write-temp + rename) of the raw accumulator sums."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, acc=acc, samples_done=samples_done,
                 fingerprint=fingerprint)
    os.replace(tmp, path)


def load_checkpoint(path, fingerprint="", expected_shape=None):
    """Returns (acc, samples_done); (None, 0) if absent or mismatched."""
    if not os.path.exists(path):
        return None, 0
    try:
        data = np.load(path, allow_pickle=False)
        acc = data["acc"]
        done = int(data["samples_done"])
        ckpt_fp = str(data["fingerprint"]) if "fingerprint" in data else ""
    except Exception as e:  # truncated/corrupt file: start over
        warnings.warn(f"discarding unreadable checkpoint {path}: {e}")
        return None, 0
    if fingerprint and ckpt_fp != fingerprint:
        warnings.warn(
            f"discarding checkpoint {path}: scene/spp/seed fingerprint "
            f"mismatch (stale checkpoint from a different render?)"
        )
        return None, 0
    if expected_shape is not None and tuple(acc.shape) != tuple(expected_shape):
        warnings.warn(
            f"discarding checkpoint {path}: accumulator shape "
            f"{acc.shape} != expected {expected_shape}"
        )
        return None, 0
    return acc, done


def render_with_checkpoints(scene, spp=None, seed=0, every=16,
                            path="render.ckpt.npz"):
    """Checkpointed render for any long-running integrator.

    Dispatches on the scene's integrator exactly like
    integrators.render.render (reference: src/render.cpp:374-394) and
    checkpoints the raw accumulator roughly every `every` samples.
    Resuming is bit-deterministic: sample streams are counter-based on
    the absolute sample index.
    """
    static = scene.static
    integrator = static.options.integrator
    spp = spp if spp is not None else static.options.samples_per_pixel
    n_pix = static.width * static.height
    fp = _fingerprint(scene, spp, seed)

    last_saved = [0]

    def make_on_chunk():
        def on_chunk(acc, done):
            if done - last_saved[0] >= every or done >= spp:
                save_checkpoint(path, acc, done, fp)
                last_saved[0] = done
        return on_chunk

    if integrator == "path":
        from gdpt_tpu.integrators import path as path_integrator
        from gdpt_tpu.integrators import path_soa
        from gdpt_tpu.integrators import render as R

        if path_soa.supports_soa(scene):
            acc, done = load_checkpoint(path, fp, (3, n_pix))
            last_saved[0] = done
            return path_soa.render_soa(
                scene, spp=spp, seed=seed, start_sample=done, init_acc=acc,
                on_chunk=make_on_chunk(),
            )
        acc, done = load_checkpoint(path, fp, (n_pix, 3))
        last_saved[0] = done
        return R.render_samples(
            scene, path_integrator.trace_path, spp=spp, seed=seed,
            start_sample=done, init_acc=acc, on_chunk=make_on_chunk(),
        )

    if integrator == "volpath":
        from gdpt_tpu.integrators import render as R
        from gdpt_tpu.integrators import volpath as vol_integrator
        from gdpt_tpu.integrators import volpath_soa

        if volpath_soa.supports_soa_volpath(scene):
            acc, done = load_checkpoint(path, fp, (3, n_pix))
            last_saved[0] = done
            return volpath_soa.render_volpath_soa(
                scene, spp=spp, seed=seed, start_sample=done, init_acc=acc,
                on_chunk=make_on_chunk(),
            )
        acc, done = load_checkpoint(path, fp, (n_pix, 3))
        last_saved[0] = done
        return R.render_samples(
            scene, vol_integrator.trace_fn(static), spp=spp, seed=seed,
            start_sample=done, init_acc=acc, on_chunk=make_on_chunk(),
        )

    if integrator == "gradpath":
        from gdpt_tpu.integrators import gdpt as gdpt_integrator
        from gdpt_tpu.integrators import gdpt_soa

        if gdpt_soa.supports_soa_gdpt(scene):
            acc, done = load_checkpoint(path, fp, (6, 3, n_pix))
            last_saved[0] = done
            return gdpt_soa.render_gradpath_soa(
                scene, spp=spp, seed=seed, start_sample=done, init_acc=acc,
                on_chunk=make_on_chunk(),
            )
        acc, done = load_checkpoint(path, fp, (6, n_pix, 3))
        last_saved[0] = done
        return gdpt_integrator.render_gradpath(
            scene, spp=spp, seed=seed, start_sample=done, init_acc=acc,
            on_chunk=make_on_chunk(),
        )

    raise ValueError(
        f"integrator {integrator!r} is single-pass; checkpointing is for "
        "sample-accumulating integrators (path/volpath/gradpath)"
    )
