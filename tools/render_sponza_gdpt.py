"""Render the reference's flagship GDPT scene (sponza) through the SoA
gradient-domain pipeline on TPU, writing primal/recon/gradient images."""

import os

_REF_ROOT = os.environ.get('GDPT_REFERENCE', '/root/reference')
_SCENE_ROOT = os.environ.get('GDPT_SCENES', _REF_ROOT + '/scenes')
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

import dataclasses

import numpy as np


def main():
    from gdpt_tpu.core import image
    from gdpt_tpu.integrators import gdpt_soa
    from gdpt_tpu.scene import parser

    # Default: the scene file's own (native) resolution, like the
    # reference's gdpt_renders/sponza artifacts. An int arg renders a
    # res x res preview instead.
    res = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] != "native"
           else None)
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sc, _ = parser.parse_scene(
        _SCENE_ROOT + "/sponza/sponza.xml", width=res, height=res, spp=spp
    )
    st = dataclasses.replace(
        sc.static, options=dataclasses.replace(sc.static.options, max_depth=5)
    )
    sc = sc._replace(static=st)
    assert gdpt_soa.supports_soa_gdpt(sc)
    t0 = time.perf_counter()
    recon, aux = gdpt_soa.render_gradpath_soa(sc, spp=spp, seed=0, return_aux=True)
    dt = time.perf_counter() - t0
    os.makedirs("gallery", exist_ok=True)
    image.imwrite("gallery/sponza_gdpt.exr", recon)
    image.imwrite("gallery/sponza_gdpt.png", recon)
    image.imwrite("gallery/sponza_gdpt_primal.png", aux["primal"])
    image.imwrite("gallery/sponza_gdpt_gx.exr", np.abs(aux["gx"]))
    print(f"[sponza-gdpt] {sc.static.width}x{sc.static.height}@{spp}spp "
          f"in {dt:.1f}s recon mean={recon.mean():.4f} "
          f"primal mean={aux['primal'].mean():.4f}")


if __name__ == "__main__":
    main()
