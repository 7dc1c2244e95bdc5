"""Sheen rmse-outlier triage (VALIDATION.md disney_sheen rows).

Round-4 finding: disney_sheen_tint_0.0 rmse 1.39 vs 0.06-0.08 for every
other matpreview row at identical spp, with matching means. The
reference artifacts have no fireflies (max pixel 0.68 across the sheen
sweep), and the sheen lobe itself cannot spike (cosine-sampled, f/pdf
<= pi * (1-h)^5 <= pi), so the outliers must be a small set of hot
pixels in OUR render. This tool renders the sheen_0.0 config twice
(different seeds), localizes the top-k |ours-ref| pixels, and checks
whether they persist across seeds (bias/lobe disagreement) or move
(variance fireflies from some other scene feature, e.g. envmap NEE).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

import numpy as np

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from tools.validate_disney import CONFIGS, D, X, metrics, patch_scene


def main():
    from gdpt_tpu.core.image import imread
    from gdpt_tpu.integrators import render as R
    from gdpt_tpu.scene import parser

    key = "disney_sheen_tint_0.0"
    cfg = next(c for c in CONFIGS if c[0] == key)
    _, artifact, scene_file, bsdf_spec = cfg
    ref = imread(f"{X}/{artifact}")
    tmp = f"/tmp/sheen_outlier_{key}.xml"
    patch_scene(f"{D}/{scene_file}", bsdf_spec, tmp)
    scene, _ = parser.parse_scene(tmp)
    spp = 64 if scene.static.width > 512 else None
    print(f"ref max {ref.max():.3f} mean {ref.mean():.5f}")
    renders = {}
    for seed in (5, 17):
        img = np.asarray(R.render(scene, spp=spp, seed=seed))
        renders[seed] = img
        m = metrics(img, ref)
        d = np.abs(img - ref).max(axis=-1)
        top = np.argsort(d.ravel())[::-1][:8]
        ys, xs = np.unravel_index(top, d.shape)
        print(f"seed {seed}: rmse {m['rmse']} ratio {m['mean_ratio']} "
              f"ours max {img.max():.2f}")
        for y, x in zip(ys, xs):
            print(f"  px ({y},{x}) ours {img[y, x]} ref {ref[y, x]}")
    a, b = renders[5], renders[17]
    cross = float(np.sqrt(np.mean((a - b) ** 2)))
    print(f"seed5-vs-seed17 rmse {cross:.5f} (persistent region => bias; "
          f"moving hot pixels => variance fireflies)")


if __name__ == "__main__":
    main()
