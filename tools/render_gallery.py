"""Render the judge-facing gallery on the real TPU chip.

Usage: python tools/render_gallery.py [scene ...]
Scenes default to the full set. Writes EXR + PNG pairs into gallery/.
"""

import os

_REF_ROOT = os.environ.get('GDPT_REFERENCE', '/root/reference')
_SCENE_ROOT = os.environ.get('GDPT_SCENES', _REF_ROOT + '/scenes')
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

# (path, resolution, spp, max_depth or None to honor the scene file).
# resolution None = the scene file's own (native) resolution.
SCENES = {
    "cbox": (_SCENE_ROOT + "/cbox/cbox_old.xml", 512, 256, None),
    "veach_mi": (_SCENE_ROOT + "/veach_mi/mi.xml", None, 256, None),
    # BVH scenes ride the packet kernel now; native resolution.
    # 16 spp: native res is 1366x1024 and the 734k-tri table traces at
    # ~2-3 Mrays/s (VMEM-resident since the 96 MiB cap) — 64 spp would
    # run ~an hour for a gallery image.
    "disney_array": (
        _SCENE_ROOT + "/disney_bsdf_test/disney_bsdf_array.xml", None, 16, 5
    ),
    "matpreview": (_SCENE_ROOT + "/matpreview/matpreview.xml", None, 64, 5),
    # sponza's scene file asks for gradpath; render the path version here
    # (the GDPT flagship is produced by tools/render_sponza_gdpt.py).
    "sponza_path": (_SCENE_ROOT + "/sponza/sponza.xml", None, 64, 5, "path"),
}


def main():
    import numpy as np

    from gdpt_tpu.core import image
    from gdpt_tpu.integrators import path_soa, render as R
    from gdpt_tpu.scene import parser

    names = sys.argv[1:] or list(SCENES)
    os.makedirs("gallery", exist_ok=True)
    import dataclasses

    for name in names:
        entry = SCENES[name]
        path, res, spp, md = entry[:4]
        integ = entry[4] if len(entry) > 4 else None
        if not os.path.exists(path):
            print(f"[gallery] {name}: scene missing, skipped")
            continue
        sc, _ = parser.parse_scene(path, width=res, height=res, spp=spp)
        if md is not None or integ is not None:
            opts = sc.static.options
            opts = dataclasses.replace(
                opts,
                max_depth=md if md is not None else opts.max_depth,
                integrator=integ if integ is not None else opts.integrator,
            )
            sc = sc._replace(static=dataclasses.replace(sc.static, options=opts))
        t0 = time.perf_counter()
        if path_soa.supports_soa(sc):
            img = path_soa.render_soa(sc, spp=spp, seed=0)
            mode = "soa"
        else:
            img = R.render(sc, seed=0)
            mode = "per-ray"
        dt = time.perf_counter() - t0
        image.imwrite(f"gallery/{name}.exr", img)
        image.imwrite(f"gallery/{name}.png", img)
        print(
            f"[gallery] {name}: {mode} {res}x{res}@{spp}spp in {dt:.1f}s "
            f"mean={float(np.mean(img)):.4f}"
        )


if __name__ == "__main__":
    main()
