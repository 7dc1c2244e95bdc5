"""Pinhole perspective camera (reference: src/camera.h/.cpp).

Host side builds the sample<->camera<->world matrices in f64; the device
side generates primary rays per (x, y, jitter) with filter importance
sampling at pixel centers (reference: src/camera.cpp:23-47).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gdpt_tpu.core import transform as xf
from gdpt_tpu.core.dtypes import REAL
from gdpt_tpu.scene import filters


class CameraArrays(NamedTuple):
    sample_to_cam: jnp.ndarray  # (4, 4)
    cam_to_world: jnp.ndarray   # (4, 4)
    world_to_cam: jnp.ndarray   # (4, 4)


def make_camera_arrays(cam_to_world, fov_deg, width, height):
    aspect = width / height
    cam_to_sample = (
        xf.scale([-0.5, -0.5 * aspect, 1.0])
        @ xf.translate([-1.0, -1.0 / aspect, 0.0])
        @ xf.perspective(fov_deg)
    )
    sample_to_cam = xf.inverse(cam_to_sample)
    return CameraArrays(
        jnp.asarray(sample_to_cam, REAL),
        jnp.asarray(cam_to_world, REAL),
        jnp.asarray(xf.inverse(cam_to_world), REAL),
    )


def _xform_point(m, p):
    q = m[:3, :3] @ p + m[:3, 3]
    w = m[3, :3] @ p + m[3, 3]
    return q / w


def _xform_vector(m, v):
    return m[:3, :3] @ v


def sample_primary(cam: CameraArrays, width, height, filter_kind, filter_param, screen_pos):
    """Generate a primary ray for screen_pos in [0,1]^2. Returns (org, dir).

    The fractional pixel position is re-warped through the reconstruction
    filter placed at the pixel center (reference: src/camera.cpp:29-41).
    """
    pixel = screen_pos * jnp.asarray([width, height], REAL)
    frac = pixel - jnp.floor(pixel)
    offset = filters.sample_filter(filter_kind, filter_param, frac)
    remapped = (jnp.floor(pixel) + 0.5 + offset) / jnp.asarray(
        [width, height], REAL
    )
    pt = _xform_point(cam.sample_to_cam, jnp.array([remapped[0], remapped[1], 0.0], REAL))
    d_cam = pt / jnp.sqrt(jnp.sum(pt * pt))
    org = cam.cam_to_world[:3, 3]
    d = _xform_vector(cam.cam_to_world, d_cam)
    d = d / jnp.sqrt(jnp.sum(d * d))
    return org, d


def init_ray_differential(width, height):
    """radius = 0, spread = 0.25 / max(w, h) (reference: src/ray.h:36-38)."""
    return jnp.asarray(0.0, REAL), jnp.asarray(0.25 / max(width, height), REAL)


def ray_diff_transfer(radius, spread, dist):
    return radius + spread * dist


def ray_diff_reflect(radius, spread, mean_curvature, roughness):
    spec = spread + 2.0 * mean_curvature * radius
    return jnp.maximum(spec * (1.0 - roughness) + 0.2 * roughness, 0.0)


def ray_diff_refract(radius, spread, mean_curvature, eta, roughness):
    spec = (spread + 2.0 * mean_curvature * radius) / eta
    return jnp.maximum(spec * (1.0 - roughness) + 0.2 * roughness, 0.0)
