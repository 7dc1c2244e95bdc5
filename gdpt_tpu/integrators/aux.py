"""AOV / debug integrators (reference: src/render.cpp:15-72).

One primary ray per pixel center; the AOV kind selects what is written:
depth, shading normal, mean curvature, ray-differential (radius, spread),
mipmap level.
"""

import jax
import jax.numpy as jnp

from gdpt_tpu.core.dtypes import BIG, INT, REAL
from gdpt_tpu.ops import intersect as isect
from gdpt_tpu.scene import camera as gcam
from gdpt_tpu.scene import textures as tex
from gdpt_tpu.scene.build import DeviceScene, SceneStatic


def _aux_pixel(scene: DeviceScene, static: SceneStatic, x, y, kind: str):
    w, h = static.width, static.height
    screen = jnp.stack([(x + 0.5) / w, (y + 0.5) / h])
    org, d = gcam.sample_primary(
        scene.camera, w, h, static.filter_kind, static.filter_param, screen
    )
    radius, spread = gcam.init_ray_differential(w, h)
    v = isect.intersect(scene, static, org, d, 0.0, BIG, radius, spread)
    if kind == "depth":
        dist = jnp.sqrt(jnp.sum((v.position - org) ** 2))
        color = jnp.full(3, dist, REAL)
    elif kind == "shading_normal":
        color = v.frame[2]
    elif kind == "mean_curvature":
        color = jnp.full(3, v.mean_curvature, REAL)
    elif kind == "ray_differential":
        color = jnp.array([v.ray_radius, spread, 0.0], REAL)
    elif kind == "mipmap_level":
        # Visualize the mip level the reflectance slot would fetch
        # (reference: src/render.cpp:45-62).
        mid = jnp.maximum(v.material_id, 0)
        desc = tex.gather_desc(scene.materials.refl, mid)
        w0 = scene.pool3.level_w[desc.img_id, 0].astype(REAL)
        h0 = scene.pool3.level_h[desc.img_id, 0].astype(REAL)
        scaled = jnp.maximum(w0, h0) * jnp.maximum(desc.uscale, desc.vscale) * v.uv_screen_size
        level = jnp.log2(jnp.maximum(scaled, 1e-8))
        level = jnp.where(desc.kind == tex.TEX_IMAGE, level, 0.0)
        color = jnp.full(3, level, REAL)
    else:
        raise ValueError(f"unknown aux integrator {kind}")
    return jnp.where(v.valid, color, jnp.zeros(3, REAL))


def render_aux(scene: DeviceScene, static: SceneStatic, kind: str):
    w, h = static.width, static.height
    xs = jnp.arange(w, dtype=REAL)
    ys = jnp.arange(h, dtype=REAL)

    def row(y):
        return jax.vmap(lambda x: _aux_pixel(scene, static, x, y, kind))(xs)

    img = jax.jit(jax.vmap(row))(ys)  # (h, w, 3)
    return img
