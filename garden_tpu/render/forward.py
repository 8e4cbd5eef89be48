"""Forward renderer: the simple alternative pipeline.

Rebuild of ForwardRenderSystem (include/garden/system/render/forward.hpp:41,
source/system/render/forward.cpp): a color+depth pipeline without the
G-buffer/post machinery, mutually exclusive with deferred
(deferred.cpp:433-439). Useful for UI-only scenes, tools, and tests; shares
the raster/visibility kernel with the deferred path and shades directly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import RenderConfig
from garden_tpu.render import gbuffer, lighting, mesh, raster, tonemap

Array = jnp.ndarray


class ForwardRenderer:
    def __init__(self, config: RenderConfig, scene: mesh.SceneBuffers,
                 use_hdr: bool = False):
        self.config = config
        self.scene_host = scene
        self.use_hdr = use_hdr

    def device_scene(self) -> Dict[str, Array]:
        return self.scene_host.device_arrays()

    def render(
        self,
        scene: Dict[str, Array],
        inst_matrices: Array,
        constants: Dict[str, Array],
        exposure: float = 1.0,
    ) -> Dict[str, Array]:
        cfg = self.config
        w, h = cfg.width, cfg.height
        world_pos, world_nrm = mesh.transform_vertices(scene, inst_matrices)
        clip = m3.apply_mat4_h(constants["view_proj"], world_pos)
        vis, setup = raster.render_pass(
            clip, scene["indices"], scene["tri_valid"], w, h,
            cfg.tile_size, cfg.max_tris_per_tile,
        )
        g = gbuffer.shade_gbuffer(vis, setup, scene, world_pos, world_nrm,
                          constants=constants)
        hdr = lighting.resolve(g, constants)
        ldr = tonemap.tone_map(hdr, jnp.float32(exposure))
        out = {
            "image": tonemap.to_uint8(ldr),
            "depth": vis["depth"],
            "tri_id": vis["tri_id"],
        }
        if self.use_hdr:
            out["hdr"] = hdr
        return out
