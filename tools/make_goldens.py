"""Generate golden regression images (CPU, fixed seeds).

The reference's integration testing is manual image comparison against
committed EXRs (SURVEY.md section 4); this harness makes it scripted:
small fixed-seed renders of the preset scenes are committed under
tests/goldens/ and tests/test_goldens.py gates RMSE against them.

Rerun this script (on CPU) only when an intentional change to the
estimators shifts the images; commit the new goldens with the change.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from gdpt_tpu.core import image as gimage  # noqa: E402
from gdpt_tpu.integrators import gdpt, render as R  # noqa: E402
from gdpt_tpu.scene import presets  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def configs():
    yield "cbox_path", lambda: R.render(
        presets.cornell_box(width=64, height=64, spp=32, max_depth=5), seed=42
    )
    yield "cbox_depth", lambda: R.render(
        presets.cornell_box(width=64, height=64, integrator="depth")
    )
    yield "furnace", lambda: R.render(
        presets.furnace_sphere(albedo=0.6, width=32, height=32, spp=64), seed=42
    )
    yield "volpath_v5", lambda: R.render(
        presets.volpath_scene(version=5, width=32, height=32, spp=32,
                              max_depth=5, with_diffuse_sphere=True),
        seed=42,
    )
    yield "cbox_gdpt", lambda: gdpt.render_gradpath(
        presets.cornell_box(width=48, height=48, spp=16,
                            integrator="gradpath", max_depth=5),
        seed=42,
    )


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in configs():
        img = fn()
        path = os.path.join(GOLDEN_DIR, f"{name}.exr")
        gimage.write_exr(path, img)
        print(f"{name}: mean {img.mean():.5f} -> {path}")


if __name__ == "__main__":
    main()
