"""Golden-image regression gates (fixed seeds, CPU-deterministic).

Regenerate with tools/make_goldens.py after intentional estimator changes.
"""

import os

import numpy as np
import pytest

from gdpt_tpu.core import image as gimage

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).mean()))


def _render(name):
    from gdpt_tpu.integrators import gdpt, render as R
    from gdpt_tpu.scene import presets

    if name == "cbox_path":
        return R.render(
            presets.cornell_box(width=64, height=64, spp=32, max_depth=5), seed=42
        )
    if name == "cbox_depth":
        return R.render(presets.cornell_box(width=64, height=64, integrator="depth"))
    if name == "furnace":
        return R.render(
            presets.furnace_sphere(albedo=0.6, width=32, height=32, spp=64), seed=42
        )
    if name == "volpath_v5":
        return R.render(
            presets.volpath_scene(version=5, width=32, height=32, spp=32,
                                  max_depth=5, with_diffuse_sphere=True),
            seed=42,
        )
    if name == "cbox_gdpt":
        return gdpt.render_gradpath(
            presets.cornell_box(width=48, height=48, spp=16,
                                integrator="gradpath", max_depth=5),
            seed=42,
        )
    raise KeyError(name)


NAMES = ["cbox_path", "cbox_depth", "furnace", "volpath_v5", "cbox_gdpt"]


@pytest.mark.parametrize("name", NAMES)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.exr")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    golden = gimage.read_exr(path)
    img = _render(name)
    # Same seeds and deterministic math: near-exact on CPU; a small
    # tolerance absorbs cross-platform fp differences.
    scale = max(float(np.abs(golden).mean()), 1e-3)
    assert _rmse(img, golden) / scale < 0.05, (
        f"{name}: rmse {_rmse(img, golden)} vs scale {scale}"
    )
