"""Text rendering: glyph atlas + text sprites.

Rebuild of TextSystem/FontAtlas (include/garden/system/text.hpp:52,281,
source/system/text.cpp — FreeType glyph rasterization into an atlas, text
mesh building, UI text draw). Host-side glyph rasterization uses PIL (the
FreeType stand-in); glyphs pack into the shared TextureAtlas and text
becomes a run of sprites through the same UI composite pass.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from garden_tpu.render.sprites import Sprite, SpriteBatch, TextureAtlas

try:
    from PIL import Image, ImageDraw, ImageFont
    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


class FontAtlas:
    """Rasterized glyph set packed into a TextureAtlas (text.hpp:52)."""

    CHARS = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
             "0123456789 .,:;!?+-*/=()[]{}<>_#%&@'\"~^|\\$")

    def __init__(self, atlas: TextureAtlas, font_path: Optional[str] = None,
                 size: int = 16):
        if not _HAS_PIL:
            raise RuntimeError("PIL required for font rasterization")
        self.atlas = atlas
        self.size = size
        if font_path:
            font = ImageFont.truetype(font_path, size)
        else:
            font = ImageFont.load_default()
        self.glyphs: Dict[str, Tuple[Tuple[int, int, int, int], int]] = {}
        for ch in self.CHARS:
            bbox = font.getbbox(ch)
            w = max(bbox[2], 1)
            h = max(bbox[3], 1)
            img = Image.new("L", (w, h), 0)
            ImageDraw.Draw(img).text((0, 0), ch, fill=255, font=font)
            arr = np.asarray(img, np.float32) / 255.0
            rgba = np.stack([np.ones_like(arr)] * 3 + [arr], axis=-1)
            region = atlas.add(rgba)
            self.glyphs[ch] = (region, w)

    def measure(self, text: str) -> int:
        return sum(self.glyphs.get(ch, (None, self.size // 2))[1] + 1
                   for ch in text)

    def draw(self, batch: SpriteBatch, text: str, x: float, y: float,
             color=(1.0, 1.0, 1.0, 1.0), scale: float = 1.0) -> None:
        """Append text sprites to a batch (text mesh building analog)."""
        cx = x
        for ch in text:
            entry = self.glyphs.get(ch)
            if entry is None:
                cx += (self.size // 2) * scale
                continue
            region, adv = entry
            _, _, gw, gh = region
            batch.push(Sprite(cx, y, gw * scale, gh * scale, region, color))
            cx += (adv + 1) * scale
