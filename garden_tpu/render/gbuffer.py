"""Deferred G-buffer reconstruction from the visibility buffer.

Rebuild of the reference's G-buffer contents (DeferredRenderSystem layout,
include/garden/system/render/deferred.hpp:20-26,79-92: base color+material,
metallic/roughness/AO/shadow, encoded normal+reflectance, depth) — here the
raster stage only wrote (tri id, barycentrics, depth), and this pass gathers
vertex/material attributes per pixel (visibility-buffer deferred shading).
Perspective-correct interpolation uses the per-vertex 1/w from setup.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from garden_tpu.core import math3d as m3

Array = jnp.ndarray


def shade_gbuffer(
    vis: Dict[str, Array],
    setup: Dict[str, Array],
    scene: Dict[str, Array],
    world_positions: Array,   # (V, 3) transformed vertex positions
    world_normals: Array,     # (V, 3)
) -> Dict[str, Array]:
    """Gather per-pixel attributes -> G-buffer planes (H, W, C)."""
    tri = jnp.maximum(vis["tri_id"], 0)          # (H, W)
    visible = vis["tri_id"] >= 0
    idx = scene["indices"][tri]                  # (H, W, 3)

    b0 = vis["b0"]
    b1 = vis["b1"]
    b2 = 1.0 - b0 - b1

    # perspective-correct barycentrics: w_i = screen bary * (1/w_i), renorm
    inv_w = setup["inv_w"][tri]                  # (H, W, 3)
    pw = jnp.stack([b0, b1, b2], axis=-1) * inv_w
    pw = pw / jnp.maximum(jnp.sum(pw, axis=-1, keepdims=True), 1e-12)

    def interp(attr: Array) -> Array:
        """attr: (V, C) -> (H, W, C)"""
        vals = attr[idx]                          # (H, W, 3, C)
        return jnp.sum(vals * pw[..., None], axis=-2)

    position = interp(world_positions)
    normal = m3.normalize(interp(world_normals))
    uv = interp(scene["uvs"])

    inst = scene["tri_instance"][tri]             # (H, W)
    mat_id = scene["inst_material"][jnp.maximum(inst, 0)]
    mat = scene["materials"][mat_id]              # (H, W, 10)

    return {
        "visible": visible,
        "depth": vis["depth"],
        "position": position,
        "normal": normal,
        "uv": uv,
        "base_color": mat[..., 0:3],
        "metallic": mat[..., 3],
        "roughness": mat[..., 4],
        "emissive": mat[..., 5:8],
        "reflectance": mat[..., 8],
        "instance": jnp.where(visible, inst, -1),
    }
