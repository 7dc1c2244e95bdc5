"""small_gdpt_tpu: the reference's standalone GDPT prototype, TPU style.

The reference ships small_gdpt.cpp — a smallpt-derived sphere box with
gradient-domain path tracing and a screened-Poisson reconstruction
(reference: small_gdpt.cpp). This example reproduces that scene through
the framework: the same sphere-wall Cornell box (mirror + glass balls,
ceiling sphere light), rendered with the gradpath integrator and
reconstructed on device.

Usage: python examples/small_gdpt_tpu.py [spp] [--out image.pfm]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gdpt_tpu.core import image as gimage
from gdpt_tpu.core import transform as xf
from gdpt_tpu.integrators import gdpt
from gdpt_tpu.scene import build
from gdpt_tpu.scene import model as M


def smallpt_scene(width=256, height=192, spp=16):
    """The classic smallpt sphere configuration
    (geometry data from small_gdpt.cpp:60-69, public smallpt scene)."""
    def diffuse(color):
        return M.Lambertian(np.asarray(color))

    materials = [
        diffuse([0.75, 0.25, 0.25]),   # left wall
        diffuse([0.25, 0.25, 0.75]),   # right wall
        diffuse([0.75, 0.75, 0.75]),   # back/floor/ceiling
        M.DisneyMetal(base_color=np.array([0.999, 0.999, 0.999]), roughness=0.02),
        M.RoughDielectric(roughness=0.02, eta=1.5),
        diffuse([0.0, 0.0, 0.0]),      # light body
    ]
    spheres = [
        (1e5, [1e5 + 1, 40.8, 81.6], 0, -1),     # left
        (1e5, [-1e5 + 99, 40.8, 81.6], 1, -1),   # right
        (1e5, [50, 40.8, 1e5], 2, -1),           # back
        (1e5, [50, 1e5, 81.6], 2, -1),           # bottom
        (1e5, [50, -1e5 + 81.6, 81.6], 2, -1),   # top
        (16.5, [27, 16.5, 47], 3, -1),           # mirror
        (16.5, [73, 16.5, 78], 4, -1),           # glass
        (600.0, [50, 681.6 - 0.27, 81.6], 5, 0),  # light
    ]
    shapes = [
        M.Sphere(center=np.asarray(c, np.float64), radius=r,
                 material_id=m, area_light_id=l)
        for r, c, m, l in spheres
    ]
    lights = [M.DiffuseAreaLight(shape_id=7, intensity=np.full(3, 12.0))]
    cam_pos = np.array([50.0, 50.0, 295.6])
    cam_dir = np.array([0.0, -0.042612, -1.0])
    cam_dir /= np.linalg.norm(cam_dir)
    cam = M.Camera(
        cam_to_world=xf.look_at(cam_pos, cam_pos + cam_dir, [0, 1, 0]),
        fov=2 * np.degrees(np.arctan(0.5135 / 2 * (width / height))),
        width=width,
        height=height,
    )
    opts = M.RenderOptions(integrator="gradpath", samples_per_pixel=spp,
                           max_depth=8)
    return build.build_scene(cam, materials, shapes, lights, options=opts)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16
    out = "image_poisson.pfm"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    scene = smallpt_scene(spp=spp)
    recon, aux = gdpt.render_gradpath(scene, return_aux=True)
    # Same artifact set as the reference prototype (small_gdpt.cpp:551-562).
    gimage.write_pfm("image.pfm", aux["primal"])
    gimage.write_pfm("image_dx.pfm", np.abs(aux["gx"]))
    gimage.write_pfm("image_dy.pfm", np.abs(aux["gy"]))
    gimage.write_pfm(out, recon)
    print(f"wrote image.pfm, image_dx.pfm, image_dy.pfm, {out}")


if __name__ == "__main__":
    main()
