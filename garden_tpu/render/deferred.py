"""Deferred renderer: the static pass schedule.

Rebuild of DeferredRenderSystem's event chain (source/system/render/
deferred.cpp:441-777): PreDeferredRender -> G-buffer -> HdrRender (lighting)
-> LdrRender (bloom/exposure/tone map) -> AA. The event chain is already a
static schedule in disguise; here it is literally a function composing pass
functions, all inside one jit. Framebuffers are entries of the returned
frame dict.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import RenderConfig
from garden_tpu.render import gbuffer, lighting, mesh, raster, tonemap

Array = jnp.ndarray


class DeferredRenderer:
    """Owns static scene buffers + config; `render` is a pure function of
    (instance matrices, constants, frame state)."""

    def __init__(self, config: RenderConfig, scene: mesh.SceneBuffers):
        self.config = config
        self.scene_host = scene

    def device_scene(self) -> Dict[str, Array]:
        return self.scene_host.device_arrays()

    def initial_frame_state(self) -> Dict[str, Array]:
        return {
            "avg_luminance": jnp.float32(0.18),
        }

    def render(
        self,
        scene: Dict[str, Array],
        inst_matrices: Array,          # (I, 4, 4)
        constants: Dict[str, Array],
        frame_state: Dict[str, Array],
        shadow: Optional[Array] = None,
        ao: Optional[Array] = None,
    ) -> Dict[str, Array]:
        cfg = self.config
        w, h = cfg.width, cfg.height

        # vertex transform + raster (the DeferredRender G-buffer pass)
        world_pos, world_nrm = mesh.transform_vertices(scene, inst_matrices)
        clip = m3.apply_mat4_h(constants["view_proj"], world_pos)
        vis, setup = raster.render_pass(
            clip, scene["indices"], scene["tri_valid"], w, h,
            cfg.tile_size, cfg.max_tris_per_tile,
        )

        # G-buffer shading + lighting resolve (HdrRender)
        g = gbuffer.shade_gbuffer(vis, setup, scene, world_pos, world_nrm)
        hdr = lighting.resolve(g, constants, shadow=shadow, ao=ao)

        # auto exposure (LdrRender chain)
        if cfg.use_auto_exposure:
            hist = tonemap.luminance_histogram(hdr, cfg.exposure_histogram_bins)
            target = tonemap.average_luminance_from_histogram(hist)
            avg_lum = tonemap.adapt_exposure(
                frame_state["avg_luminance"], target, constants["delta_time"]
            )
        else:
            avg_lum = frame_state["avg_luminance"]
        exposure = tonemap.exposure_from_luminance(
            avg_lum, compensation=cfg.exposure_compensation
        )

        ldr = tonemap.tone_map(hdr, exposure, mode=cfg.tone_mapper)

        return {
            "image": ldr,                 # (H, W, 3) uint8
            "hdr": hdr,
            "depth": vis["depth"],
            "tri_id": vis["tri_id"],
            "gbuffer": g,
            "frame_state": {"avg_luminance": avg_lum},
        }
