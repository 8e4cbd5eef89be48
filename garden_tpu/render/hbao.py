"""Horizon-based ambient occlusion from depth + normals.

Rebuild of HbaoRenderSystem (include/garden/system/render/hbao.hpp:39,
source/system/render/hbao.cpp + shaders/hbao.frag): screen-space AO written
into the PBR lighting AO buffer, here returned as an (H, W) factor. The
sampling pattern is a fixed spiral of taps whose screen radius shrinks with
view depth; occlusion falls off with distance (classic HBAO horizon test,
simplified to VPU-friendly gathers on fixed offsets per tap ring).
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3

Array = jnp.ndarray

N_DIRS = 8
N_STEPS = 2


def compute_hbao(
    position: Array,     # (H, W, 3) world positions
    normal: Array,       # (H, W, 3)
    visible: Array,      # (H, W)
    camera_pos: Array,
    radius: float = 1.0,
    intensity: float = 1.0,
    base_pixel_step: float = 8.0,
) -> Array:
    """AO factor (H, W), 1 = unoccluded."""
    h, w = visible.shape
    dist = m3.length(position - camera_pos)

    yy = jnp.arange(h, dtype=jnp.int32)
    xx = jnp.arange(w, dtype=jnp.int32)
    py, px = jnp.meshgrid(yy, xx, indexing="ij")

    # screen-space step shrinks with distance (projective foreshortening)
    step_px = jnp.clip(base_pixel_step * 10.0 / jnp.maximum(dist, 1e-3), 1.0, 32.0)

    occlusion = jnp.zeros_like(dist)
    total = 0
    for d in range(N_DIRS):
        ang = 2.0 * math.pi * d / N_DIRS
        dx, dy = math.cos(ang), math.sin(ang)
        for s in range(1, N_STEPS + 1):
            r = step_px * s / N_STEPS
            sx = jnp.clip(px + (dx * r).astype(jnp.int32), 0, w - 1)
            sy = jnp.clip(py + (dy * r).astype(jnp.int32), 0, h - 1)
            sample_pos = position[sy, sx]
            sample_vis = visible[sy, sx]
            delta = sample_pos - position
            dlen = m3.length(delta)
            # horizon: sample above the tangent plane occludes
            sin_h = m3.dot(delta, normal) / jnp.maximum(dlen, 1e-6)
            falloff = jnp.clip(1.0 - dlen / radius, 0.0, 1.0)
            occ = jnp.clip(sin_h - 0.1, 0.0, 1.0) * falloff
            occlusion = occlusion + jnp.where(sample_vis, occ, 0.0)
            total += 1

    ao = 1.0 - jnp.clip(occlusion / total * 2.0 * intensity, 0.0, 1.0)
    return jnp.where(visible, ao, 1.0)
