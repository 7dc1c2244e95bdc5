"""Render checkpoint / resume.

The reference has none (SURVEY.md section 5: renders are one-shot).
Monte Carlo accumulation makes checkpointing natural: persist the
running per-pixel sums and the sample count; resuming continues the
deterministic counter-based sample streams exactly where they stopped.
"""

import os

import numpy as np

from gdpt_tpu.integrators import render as R


def save_checkpoint(path, acc, samples_done, meta=None):
    np.savez(path, acc=acc, samples_done=samples_done, meta=meta or {})


def load_checkpoint(path):
    if not os.path.exists(path):
        return None, 0
    data = np.load(path, allow_pickle=True)
    return data["acc"], int(data["samples_done"])


def render_with_checkpoints(scene, spp=None, seed=0, every=16, path="render.ckpt.npz"):
    """Path-integrator render that checkpoints the accumulator every
    `every` samples and resumes from `path` if present."""
    from gdpt_tpu.integrators import path as path_integrator

    static = scene.static
    spp = spp if spp is not None else static.options.samples_per_pixel
    w, h = static.width, static.height

    acc, done = load_checkpoint(path)
    if acc is None:
        acc = np.zeros((h, w, 3), np.float64)
    while done < spp:
        n = min(every, spp - done)
        img = R.render_samples(
            scene, path_integrator.trace_path, spp=n, seed=seed + done * 7919
        )
        acc += np.asarray(img, np.float64) * n
        done += n
        save_checkpoint(path, acc, done)
    out = (acc / max(done, 1)).astype(np.float32)
    return out
