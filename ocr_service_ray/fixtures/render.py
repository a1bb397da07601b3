"""Deterministic page renderer for the synthetic raster corpus.

Renders ground-truth text into SYNR rasters (FIXTURES.md §3) with the
5x7 glyph font at scale 2, optional small rotation (exercises deskew)
and salt-and-pepper noise (exercises the despeckle/attempt ladder).
The renderer is generator-side code: the OCR engine never imports it —
it shares only the glyph bank (the format's codec table).
"""

from __future__ import annotations

import numpy as np

from ..stages.ocr import glyphs as G
from ..stages.ocr import raster
from ..stages.ocr.preprocess import rotate_bool

SCALE = G.RENDER_SCALE
CHAR_ADV = G.ADVANCE * SCALE  # 14 px
LINE_H = (G.GLYPH_H + 3) * SCALE  # 20 px
PAGE_W = 760
MARGIN_X = 30
MARGIN_Y = 50


def text_width(text: str) -> int:
    return len(text) * CHAR_ADV


def render_page(
    lines: list[list[tuple[int, str]]],
    rng: np.random.Generator,
    rotate_deg: float = 0.0,
    noise_rate: float = 0.0,
    page_w: int = PAGE_W,
    sqr_payload: str | None = None,
) -> bytes:
    """Render lines of (x_px, text) segments into a SYNR payload.

    ``x_px`` is the glyph-start column inside the text area; the page
    adds margins so rotation never clips ink. ``sqr_payload`` stamps an
    SQR machine-readable code block below the last text line (the
    receipt's QR-code analog).
    """
    from ..stages.ocr.sqr import encode_sqr

    bank = G.glyph_bank(SCALE)
    n_lines = max(1, len(lines))
    h = n_lines * LINE_H + 2 * MARGIN_Y
    needed = max(
        (x + text_width(t) for segs in lines for x, t in segs), default=0
    )
    sqr_block = encode_sqr(sqr_payload) if sqr_payload is not None else None
    if sqr_block is not None:
        h += sqr_block.shape[0] + LINE_H
        needed = max(needed, sqr_block.shape[1])
    w = max(page_w, needed + CHAR_ADV) + 2 * MARGIN_X
    ink = np.zeros((h, w), dtype=bool)
    if sqr_block is not None:
        r0 = MARGIN_Y + n_lines * LINE_H + LINE_H // 2
        ink[r0 : r0 + sqr_block.shape[0], MARGIN_X : MARGIN_X + sqr_block.shape[1]] = sqr_block
    for li, segments in enumerate(lines):
        y0 = MARGIN_Y + li * LINE_H
        for x_px, text in segments:
            x = MARGIN_X + x_px
            for ch in text:
                if ch != " " and ch in bank:
                    g = bank[ch]
                    ink[y0 : y0 + g.shape[0], x : x + g.shape[1]] |= g
                x += CHAR_ADV
    if abs(rotate_deg) > 1e-9:
        ink = rotate_bool(ink, rotate_deg)
    bg = int(rng.integers(200, 256))
    fg = int(rng.integers(0, 61))
    img = np.full(ink.shape, bg, dtype=np.uint8)
    img[ink] = fg
    if noise_rate > 0:
        mask = rng.random(img.shape) < noise_rate
        img[mask] = np.where(rng.random(mask.sum()) < 0.5, fg, bg)
    return raster.encode(img)


def line_ground_truth(segments: list[tuple[int, str]]) -> str:
    """The flattened text a perfect reader produces for one line:
    segments in x order, words joined by single spaces."""
    parts = []
    for _x, text in sorted(segments, key=lambda s: s[0]):
        parts.append(" ".join(text.split()))
    return " ".join(p for p in parts if p)
