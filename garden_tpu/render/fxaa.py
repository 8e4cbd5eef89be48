"""FXAA post-process anti-aliasing.

Rebuild of FxaaRenderSystem (include/garden/system/render/fxaa.hpp:37,
shaders/fxaa.frag — FXAA 3.11 console variant): luminance-based edge
detection and a directional blend on the LDR buffer. Operates on linear-ish
LDR floats before the uint8 quantize.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

EDGE_THRESHOLD = 1.0 / 8.0
EDGE_THRESHOLD_MIN = 1.0 / 24.0


def _luma(rgb: Array) -> Array:
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def apply_fxaa(ldr: Array) -> Array:
    """ldr: (H, W, 3) float in [0,1] -> antialiased (H, W, 3)."""
    p = jnp.pad(ldr, ((1, 1), (1, 1), (0, 0)), mode="edge")
    c = p[1:-1, 1:-1]
    n = p[0:-2, 1:-1]
    s = p[2:, 1:-1]
    w = p[1:-1, 0:-2]
    e = p[1:-1, 2:]
    nw = p[0:-2, 0:-2]
    ne = p[0:-2, 2:]
    sw = p[2:, 0:-2]
    se = p[2:, 2:]

    l_c, l_n, l_s, l_w, l_e = _luma(c), _luma(n), _luma(s), _luma(w), _luma(e)
    l_min = jnp.minimum(l_c, jnp.minimum(jnp.minimum(l_n, l_s), jnp.minimum(l_w, l_e)))
    l_max = jnp.maximum(l_c, jnp.maximum(jnp.maximum(l_n, l_s), jnp.maximum(l_w, l_e)))
    rng = l_max - l_min
    edge = rng > jnp.maximum(EDGE_THRESHOLD_MIN, l_max * EDGE_THRESHOLD)

    # direction of the edge from luma gradients
    horiz = jnp.abs(l_n + l_s - 2.0 * l_c) >= jnp.abs(l_w + l_e - 2.0 * l_c)

    # 3x3 lowpass along the edge
    blur_h = (w + c + e) / 3.0
    blur_v = (n + c + s) / 3.0
    blur_d = (nw + ne + sw + se + 2.0 * (n + s + w + e) + 4.0 * c) / 16.0

    along = jnp.where(horiz[..., None], blur_h, blur_v)
    blended = 0.5 * along + 0.5 * blur_d
    return jnp.where(edge[..., None], blended, c)
