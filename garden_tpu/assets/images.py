"""Host-side image loading for the resource pipeline.

Rebuild of ResourceSystem's image loaders (reference:
source/system/resource.cpp image loading paths; supported formats at
include/garden/system/resource.hpp:136-151 — png/webp/exr/hdr + Basis).
TPU mapping: images decode on the host (PIL for png/webp/jpeg/bmp, a tiny
native reader for Radiance .hdr) into float32 numpy arrays that upload into
the scene's texture array / sprite atlas. Basis/KTX GPU-codec formats are
n/a (XLA owns device memory layout).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image
    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = c.astype(np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def load_image(path: str, linearize: bool = True) -> np.ndarray:
    """Load an image file -> float32 (H, W, 4) RGBA in [0, 1] (linear by
    default; pass linearize=False for data textures like normal maps)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        return load_hdr(path)
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable: cannot decode " + path)
    img = Image.open(path).convert("RGBA")
    arr = np.asarray(img, np.float32) / 255.0
    if linearize:
        rgb = srgb_to_linear(arr[..., :3])
        arr = np.concatenate([rgb, arr[..., 3:4]], axis=-1)
    return arr


def load_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) reader -> float32 (H, W, 4), linear.
    Supports the common 32-bit_rle_rgbe format (flat or RLE scanlines)."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b""):
                break
        dims = f.readline().split()
        if len(dims) != 4 or dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError("unsupported HDR orientation")
        h, w = int(dims[1]), int(dims[3])
        data = f.read()

    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2:
            # adaptive RLE scanline
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:            # literal
                        rgbe[y, x:x + count, c] = np.frombuffer(
                            data, np.uint8, count, pos)
                        pos += count
                        x += count
        else:  # flat scanline
            row = np.frombuffer(data, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4

    exp = rgbe[..., 3].astype(np.int32) - 136  # 128 + 8 mantissa bits
    scale = np.ldexp(np.ones_like(exp, np.float32), exp)
    rgb = rgbe[..., :3].astype(np.float32) * scale[..., None]
    rgb[rgbe[..., 3] == 0] = 0.0
    return np.concatenate([rgb, np.ones((h, w, 1), np.float32)], axis=-1)


def save_png(path: str, image: np.ndarray) -> None:
    """Store a float [0,1] or uint8 image as PNG (debug dumps / examples)."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable")
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def resize_image(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Host-side resize (for texture-array slot normalization)."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable")
    h, w = size
    u8 = np.clip(image * 255.0 + 0.5, 0, 255).astype(np.uint8)
    out = Image.fromarray(u8).resize((w, h), Image.BILINEAR)
    return np.asarray(out, np.float32) / 255.0
