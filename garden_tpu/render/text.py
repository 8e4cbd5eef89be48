"""Text rendering: glyph atlas + text sprites.

Rebuild of TextSystem/FontAtlas (include/garden/system/text.hpp:52,281,
source/system/text.cpp — FreeType glyph rasterization into an atlas, text
mesh building, UI text draw). Host-side glyph rasterization uses PIL's
FreeType binding; glyphs pack into the shared TextureAtlas and text becomes
a run of sprites through the same UI composite pass.

Per-glyph fidelity (text.cpp's FT metrics usage): each glyph stores its
REAL advance width (`font.getlength`, the FT advance — not the ink width),
its bearing (ink offset from the pen origin, FT bitmap_left/top analog),
and the face's ascent/descent for baseline placement. Kerning pairs are
extracted measurement-side: kern(a, b) = len(a+b) - len(a) - len(b) under
the font's own layout engine, which captures the GPOS/kern-table deltas
without parsing font tables; only nonzero pairs are stored.
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
        self.font = font
        try:
            self.ascent, self.descent = font.getmetrics()
        except AttributeError:  # default bitmap font
            self.ascent, self.descent = size, max(size // 4, 1)
        # glyphs[ch] = (atlas region, advance, bearing_x, bearing_y)
        self.glyphs: Dict[str, Tuple[Tuple[int, int, int, int],
                                     float, int, int]] = {}
        for ch in self.CHARS:
            bbox = font.getbbox(ch)       # ink box from the pen origin
            x0, y0, x1, y1 = bbox
            w = max(x1 - x0, 1)
            h = max(y1 - y0, 1)
            img = Image.new("L", (w, h), 0)
            # draw shifted so only the ink lands in the cropped cell
            ImageDraw.Draw(img).text((-x0, -y0), ch, fill=255, font=font)
            arr = np.asarray(img, np.float32) / 255.0
            rgba = np.stack([np.ones_like(arr)] * 3 + [arr], axis=-1)
            region = atlas.add(rgba)
            try:
                advance = float(font.getlength(ch))
            except AttributeError:
                advance = float(x1)
            self.glyphs[ch] = (region, advance, x0, y0)
        # kerning pairs via the layout engine's own pair positioning
        self.kerning: Dict[Tuple[str, str], float] = {}
        if hasattr(font, "getlength"):
            singles = {ch: float(font.getlength(ch)) for ch in self.CHARS}
            for a in self.CHARS:
                for b in self.CHARS:
                    k = float(font.getlength(a + b)) \
                        - singles[a] - singles[b]
                    if abs(k) > 1e-3:
                        self.kerning[(a, b)] = k

    def measure(self, text: str) -> float:
        """Advance-accurate line width incl. kerning (text mesh metrics)."""
        w = 0.0
        prev = None
        for ch in text:
            entry = self.glyphs.get(ch)
            if entry is None:
                w += self.size / 2
                prev = None
                continue
            if prev is not None:
                w += self.kerning.get((prev, ch), 0.0)
            w += entry[1]
            prev = ch
        return w

    def line_height(self) -> int:
        return self.ascent + self.descent

    def draw(self, batch: SpriteBatch, text: str, x: float, y: float,
             color=(1.0, 1.0, 1.0, 1.0), scale: float = 1.0) -> None:
        """Append text sprites to a batch (text mesh building analog).

        (x, y) is the top-left of the line's em box; glyph quads place at
        pen + bearing so baselines align across glyphs (g vs o vs ')."""
        pen = x
        prev = None
        for ch in text:
            entry = self.glyphs.get(ch)
            if entry is None:
                pen += (self.size / 2) * scale
                prev = None
                continue
            region, adv, bx, by = entry
            if prev is not None:
                pen += self.kerning.get((prev, ch), 0.0) * scale
            _, _, gw, gh = region
            batch.push(Sprite(pen + bx * scale, y + by * scale,
                              gw * scale, gh * scale, region, color))
            pen += adv * scale
            prev = ch
