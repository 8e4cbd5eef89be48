"""Debug visualizers: G-buffer channels, shadow cascades, physics shapes.

Rebuild of the editor's inspection surfaces (reference layer 9: the
gbuffer-data visualizer, shadow-cascade view and physics shape renderer,
include/garden/editor/**) as host-side image dumps — the observability
returns without an in-engine UI (SURVEY.md section 7 'What we deliberately
do NOT rebuild').
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _save(img: np.ndarray, path: str) -> None:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    try:
        from PIL import Image
        Image.fromarray(img).save(path)
    except ImportError:  # minimal PNG fallback
        import struct
        import zlib
        h, w, _ = img.shape
        raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

        def chunk(tag, data):
            c = tag + data
            return struct.pack(">I", len(data)) + c + struct.pack(
                ">I", zlib.crc32(c))
        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        open(path, "wb").write(png)


def dump_gbuffer(out: Dict, directory: str, prefix: str = "frame") -> list:
    """Save G-buffer channels of a DeferredRenderer output as PNGs
    (the gbuffer-data editor visualizer)."""
    os.makedirs(directory, exist_ok=True)
    g = out["gbuffer"]
    written = []

    def w(name, img):
        p = os.path.join(directory, f"{prefix}_{name}.png")
        _save(img, p)
        written.append(p)

    w("image", np.asarray(out["image"]))
    depth = np.asarray(out["depth"])
    w("depth", depth / max(depth.max(), 1e-6))
    w("normal", np.asarray(g["normal"]) * 0.5 + 0.5)
    w("base_color", np.asarray(g["base_color"]))
    w("roughness", np.asarray(g["roughness"]))
    w("metallic", np.asarray(g["metallic"]))
    w("visible", np.asarray(g["visible"]).astype(np.float32))
    if out.get("shadow") is not None:
        w("shadow", np.asarray(out["shadow"]))
    if out.get("ao") is not None:
        w("ao", np.asarray(out["ao"]))
    return written


def dump_physics_top_view(state: Dict, path: str, size: int = 512,
                          world_extent: float = 24.0) -> None:
    """Top-down scatter of body positions colored by speed (the physics
    shape renderer's role, editor physics debug)."""
    b = state["bodies"]
    pos = np.asarray(b["pos"])
    has = np.asarray(b["has"])
    vel = np.linalg.norm(np.asarray(b["linvel"]), axis=-1)
    img = np.zeros((size, size, 3), np.float32)
    scale = size / (2 * world_extent)
    for i in np.nonzero(has)[0]:
        x = int((pos[i, 0] + world_extent) * scale)
        z = int((pos[i, 2] + world_extent) * scale)
        if 0 <= x < size and 0 <= z < size:
            speed = min(vel[i] / 10.0, 1.0)
            img[z, x] = (speed, 1.0 - speed, 0.2)
    _save(img, path)
