"""Horizon-based ambient occlusion from depth + normals.

Rebuild of HbaoRenderSystem (include/garden/system/render/hbao.hpp:39,
source/system/render/hbao.cpp + shaders/hbao.frag): screen-space AO written
into the PBR lighting AO buffer, here returned as an (H, W) factor.

TPU formulation: the classic per-pixel jittered taps are dynamic gathers,
which lower to the slow generic-gather path (measured ~580ms at 1080p).
Instead the taps use FIXED pixel offsets per ring — each tap is one
edge-padded shift of the position buffer, a pure dense op — and the world-
space falloff term keeps far-apart samples from occluding, which is what the
depth-scaled radius bought. 2 rings x 8 directions = 16 shifted adds ~= a
couple of ms, zero gathers.
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

from garden_tpu.core import math3d as m3

Array = jnp.ndarray

N_DIRS = 8
RING_RADII = (4, 11)  # fixed pixel radii (screen-space rings)


def _shift2(x: Array, dy: int, dx: int) -> Array:
    h, w = x.shape[0], x.shape[1]
    pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))) + \
        tuple(((0, 0),) * (x.ndim - 2))
    xp = jnp.pad(x, pad, mode="edge")
    return xp[max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]


def compute_hbao(
    position: Array,     # (H, W, 3) world positions
    normal: Array,       # (H, W, 3)
    visible: Array,      # (H, W)
    camera_pos: Array,
    radius: float = 1.0,
    intensity: float = 1.0,
    base_pixel_step: float = 8.0,  # kept for API compat; rings are fixed
) -> Array:
    """AO factor (H, W), 1 = unoccluded."""
    occlusion = jnp.zeros(visible.shape, jnp.float32)
    total = 0
    for d in range(N_DIRS):
        ang = 2.0 * math.pi * (d + 0.5) / N_DIRS
        ux, uy = math.cos(ang), math.sin(ang)
        for r_px in RING_RADII:
            dy = int(round(uy * r_px))
            dx = int(round(ux * r_px))
            sample_pos = _shift2(position, dy, dx)
            sample_vis = _shift2(visible, dy, dx)
            delta = sample_pos - position
            dlen = m3.length(delta)
            # horizon test: sample above the tangent plane occludes
            sin_h = m3.dot(delta, normal) / jnp.maximum(dlen, 1e-6)
            falloff = jnp.clip(1.0 - dlen / radius, 0.0, 1.0)
            occ = jnp.clip(sin_h - 0.1, 0.0, 1.0) * falloff
            occlusion = occlusion + jnp.where(sample_vis, occ, 0.0)
            total += 1

    ao = 1.0 - jnp.clip(occlusion / total * 2.0 * intensity, 0.0, 1.0)
    return jnp.where(visible, ao, 1.0)
