"""Hierarchical-Z pyramid + occlusion culling.

Rebuild of HizRenderSystem (include/garden/system/render/hiz.hpp:38,
source/system/render/hiz.cpp:104-173: an RG16F mip pyramid built by repeated
fullscreen downsample passes, consumed for occlusion culling/SSR). Here the
pyramid is a list of (H/2^k, W/2^k) reverse-Z depth mips holding the
*farthest* (minimum, reverse-Z) depth per texel, built by strided min-pools;
`occlusion_cull` tests instance AABBs against it — replacing the CPU-side
per-thread frustum cull loop of mesh.cpp:444-509 with a vectorized test.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from garden_tpu.core import math3d as m3

Array = jnp.ndarray


def full_levels(height: int, width: int) -> int:
    """Levels needed so the coarsest mip covers the full frame (a screen
    rect of any size then maps to a non-clamped level)."""
    import math
    # pure-Python math: jnp here would produce a tracer under jit (shapes
    # are static trace-time ints)
    return max(int(math.ceil(math.log2(max(height, width)))), 0) + 1


def build_pyramid(depth: Array, levels: int | None = None) -> List[Array]:
    """Reverse-Z min-pyramid (level 0 = full res). By default builds enough
    levels to cover the whole frame so occlusion_cull never has to test a
    rect wider than the sampled 2x2 texel footprint."""
    if levels is None:
        levels = full_levels(*depth.shape)
    mips = [depth]
    d = depth
    for _ in range(levels - 1):
        h, w = d.shape
        ph, pw = h % 2, w % 2
        if ph or pw:
            d = jnp.pad(d, ((0, ph), (0, pw)), mode="edge")
            h, w = h + ph, w + pw
        d = d.reshape(h // 2, 2, w // 2, 2).min(axis=(1, 3))
        mips.append(d)
    return mips


def occlusion_cull(
    aabb_min: Array,     # (I, 3) world AABBs
    aabb_max: Array,
    view_proj: Array,
    pyramid: List[Array],
    width: int,
    height: int,
) -> Array:
    """True where the AABB is definitely hidden behind the Hi-Z pyramid.

    Projects the 8 corners, takes the screen rect + nearest (max, reverse-Z)
    depth, then samples the mip level where the rect covers <= 2x2 texels:
    if even the *nearest* point of the box is farther than the farthest
    stored depth in that region, the box is occluded.
    """
    corners = jnp.stack([
        jnp.stack([
            jnp.where(jnp.array([bool(k & 1), bool(k & 2), bool(k & 4)]),
                      aabb_max, aabb_min)[..., i] for i in range(3)
        ], axis=-1)
        for k in range(8)
    ], axis=-2)  # (I, 8, 3)

    h = m3.apply_mat4_h(view_proj, corners)   # (I, 8, 4)
    behind = jnp.any(h[..., 3] < 1e-6, axis=-1)
    w_safe = jnp.maximum(h[..., 3:4], 1e-6)
    ndc = h[..., :3] / w_safe
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    z_near = jnp.max(ndc[..., 2], axis=-1)    # nearest point (reverse-Z max)

    x0 = jnp.clip(jnp.min(sx, axis=-1), 0, width - 1)
    x1 = jnp.clip(jnp.max(sx, axis=-1), 0, width - 1)
    y0 = jnp.clip(jnp.min(sy, axis=-1), 0, height - 1)
    y1 = jnp.clip(jnp.max(sy, axis=-1), 0, height - 1)

    # pick the level where the rect spans <= 2 texels
    span = jnp.maximum(x1 - x0, y1 - y0)
    n_levels = len(pyramid)
    want = jnp.ceil(jnp.log2(jnp.maximum(span, 1.0))).astype(jnp.int32)
    level = jnp.clip(want, 0, n_levels - 1)
    # conservative fallback for shallow pyramids: if the wanted level was
    # clamped, the rect spans more texels than the 2x2 corner samples cover
    # and interior texels could hide a farther depth — never cull then
    samplable = want <= n_levels - 1

    occluded = jnp.zeros(aabb_min.shape[0], bool)
    for lv, mip in enumerate(pyramid):
        scale = 2 ** lv
        mh, mw = mip.shape
        tx0 = jnp.clip((x0 / scale).astype(jnp.int32), 0, mw - 1)
        tx1 = jnp.clip((x1 / scale).astype(jnp.int32), 0, mw - 1)
        ty0 = jnp.clip((y0 / scale).astype(jnp.int32), 0, mh - 1)
        ty1 = jnp.clip((y1 / scale).astype(jnp.int32), 0, mh - 1)
        # farthest depth over the (<=2x2) texel rect
        far = jnp.minimum(
            jnp.minimum(mip[ty0, tx0], mip[ty0, tx1]),
            jnp.minimum(mip[ty1, tx0], mip[ty1, tx1]),
        )
        # epsilon margin so an occluder never culls itself (its own nearest
        # depth equals the stored depth up to interpolation jitter)
        occ_lv = z_near * 1.02 + 1e-4 < far
        occluded = jnp.where(level == lv, occ_lv, occluded)

    return occluded & samplable & ~behind
