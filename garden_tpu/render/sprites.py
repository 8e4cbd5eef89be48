"""2D sprite / UI quad rendering with texture atlas.

Rebuild of the sprite stack (include/garden/system/render/sprite.hpp:93 with
Opaque/Cutout/Translucent/UI variants, 9-slice.hpp:65 nine-slice panels) and
the UI mesh pass with its orthographic projection (mesh.cpp:850-858).

Sprites are screen-space quads with an atlas region, color tint and alpha.
Rendering is one vectorized composite pass: for every pixel, every sprite's
rect is tested (sprite counts are small — UI budgets, not scene geometry)
and blended back-to-front by the sprite order. Atlas sampling is
nearest-neighbor gather from one packed RGBA atlas.

The nine-slice variant splits a quad into a 3x3 grid with fixed-size borders
(9-slice.hpp semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class TextureAtlas:
    """Host-side packed RGBA atlas (shelf packing)."""

    def __init__(self, size: int = 512):
        self.size = size
        self.data = np.zeros((size, size, 4), np.float32)
        self._shelf_y = 0
        self._shelf_x = 0
        self._shelf_h = 0
        # solid-white 2x2 region for untextured sprites
        self.white = self.add(np.ones((2, 2, 4), np.float32))

    def add(self, image: np.ndarray) -> Tuple[int, int, int, int]:
        """Pack an (h, w, 3/4) float image; returns (x, y, w, h) region."""
        if image.ndim == 2:
            image = np.stack([image] * 3 + [np.ones_like(image)], -1)
        if image.shape[-1] == 3:
            image = np.concatenate(
                [image, np.ones(image.shape[:2] + (1,), image.dtype)], -1)
        h, w = image.shape[:2]
        if self._shelf_x + w > self.size:
            self._shelf_y += self._shelf_h
            self._shelf_x = 0
            self._shelf_h = 0
        if self._shelf_y + h > self.size:
            raise RuntimeError("atlas full")
        x, y = self._shelf_x, self._shelf_y
        self.data[y:y + h, x:x + w] = image
        self._shelf_x += w
        self._shelf_h = max(self._shelf_h, h)
        return (x, y, w, h)

    def device(self) -> Array:
        return jnp.asarray(self.data)


@dataclasses.dataclass
class Sprite:
    """One screen-space quad (pixels, y-down)."""

    x: float
    y: float
    w: float
    h: float
    region: Tuple[int, int, int, int]       # atlas rect
    color: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)


class SpriteBatch:
    """Fixed-capacity sprite list baked to device arrays per frame."""

    def __init__(self, atlas: TextureAtlas, capacity: int = 256):
        self.atlas = atlas
        self.capacity = capacity
        self.clear()

    def clear(self) -> None:
        self._rects = np.zeros((self.capacity, 4), np.float32)
        self._regions = np.zeros((self.capacity, 4), np.float32)
        self._colors = np.zeros((self.capacity, 4), np.float32)
        self._count = 0

    def push(self, sprite: Sprite) -> None:
        if self._count >= self.capacity:
            return  # over budget: drop (fixed-capacity contract)
        i = self._count
        self._count += 1
        self._rects[i] = (sprite.x, sprite.y, sprite.w, sprite.h)
        self._regions[i] = sprite.region
        self._colors[i] = sprite.color

    def push_nine_slice(self, x, y, w, h, region, border: float,
                        color=(1, 1, 1, 1)) -> None:
        """3x3 panel with fixed borders (NineSliceRenderSystem analog)."""
        rx, ry, rw, rh = region
        b = border
        rb = min(rw, rh) // 3
        xs = [(x, b), (x + b, w - 2 * b), (x + w - b, b)]
        ys = [(y, b), (y + b, h - 2 * b), (y + h - b, b)]
        us = [(rx, rb), (rx + rb, rw - 2 * rb), (rx + rw - rb, rb)]
        vs = [(ry, rb), (ry + rb, rh - 2 * rb), (ry + rh - rb, rb)]
        for iy in range(3):
            for ix in range(3):
                self.push(Sprite(xs[ix][0], ys[iy][0], xs[ix][1], ys[iy][1],
                                 (us[ix][0], vs[iy][0], us[ix][1], vs[iy][1]),
                                 color))

    def device_arrays(self) -> Dict[str, Array]:
        return {
            "rects": jnp.asarray(self._rects),
            "regions": jnp.asarray(self._regions),
            "colors": jnp.asarray(self._colors),
            "count": jnp.int32(self._count),
        }


def composite_sprites(
    image: Array,              # (H, W, 3) float LDR
    atlas: Array,              # (A, A, 4)
    sprites: Dict[str, Array],
    max_sprites: Optional[int] = None,
) -> Array:
    """Alpha-blend sprites over the LDR image, in push order (the UI pass
    after LdrRender, deferred.cpp:723-775)."""
    h, w = image.shape[:2]
    a = atlas.shape[0]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    out = image
    n = sprites["rects"].shape[0] if max_sprites is None else max_sprites

    for i in range(n):
        rx, ry, rw, rh = (sprites["rects"][i, 0], sprites["rects"][i, 1],
                          sprites["rects"][i, 2], sprites["rects"][i, 3])
        inside = ((xs >= rx) & (xs < rx + rw) & (ys >= ry) & (ys < ry + rh)
                  & (i < sprites["count"]))
        u = (xs - rx) / jnp.maximum(rw, 1e-6)
        v = (ys - ry) / jnp.maximum(rh, 1e-6)
        gx, gy, gw, gh = (sprites["regions"][i, 0], sprites["regions"][i, 1],
                          sprites["regions"][i, 2], sprites["regions"][i, 3])
        tx = jnp.clip((gx + u * gw).astype(jnp.int32), 0, a - 1)
        ty = jnp.clip((gy + v * gh).astype(jnp.int32), 0, a - 1)
        texel = atlas[ty, tx]                     # (H, W, 4)
        color = sprites["colors"][i]
        rgb = texel[..., :3] * color[:3]
        alpha = texel[..., 3] * color[3] * inside
        out = out * (1.0 - alpha[..., None]) + rgb * alpha[..., None]
    return out
