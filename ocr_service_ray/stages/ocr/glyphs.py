"""5x7 bitmap glyph font — the codec spec of the synthetic raster format.

The sandbox has no image libraries (cv2/PIL absent, no network), so the
OCR path works over a self-defined deterministic raster format (see
FIXTURES.md §3): fixture pages are rendered with this font and the
engine recognizes by template-matching against the same glyph bank —
exactly how the reference amortizes a warm model per worker
(/root/reference/app/ocr_engine.py:49-53), with the model replaced by a
dependency-free template bank.

Charset: A-Z 0-9 space ``. , / - :``. Every glyph has >= 2 ink pixels
(>= 8 at render scale 2) so single-pixel salt noise can never be
mistaken for a glyph after the despeckle pass.
"""

from __future__ import annotations

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
# Render/recognition scale of the SYNR format. 3 makes strokes 3 px so
# +-1 px rotation-resampling damage stays well under half a stroke width
# (at scale 2 single-glyph confusions like I/1 and ,/. were ~3e-4 per blob).
RENDER_SCALE = 3
ADVANCE = 7  # glyph width + 2 col spacing, in font pixels (gap survives deskew artifacts)

_FONT: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": ("#####", "...#.", "..#..", "...#.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": ("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    # comma carries a 3-row diagonal tail so it stays >= 10 XOR px away
    # from "." even after +-3 deg nearest-neighbor rotation damage
    ",": (".....", ".....", ".....", ".....", ".###.", "..##.", ".#..."),
    # full-width dash: a degraded comma (tail rows lost) would otherwise
    # be indistinguishable from a 3-cell dash after center-cropping
    "-": (".....", ".....", ".....", "#####", ".....", ".....", "....."),
    ":": (".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    "/": ("....#", "....#", "...#.", "..#..", ".#...", "#....", "#...."),
}

CHARSET = sorted(_FONT.keys())


def glyph_bitmap(ch: str) -> np.ndarray:
    """Boolean (7, 5) ink mask for one charset character."""
    rows = _FONT[ch]
    return np.array([[c == "#" for c in row] for row in rows], dtype=bool)


def glyph_bank(scale: int = 1) -> dict[str, np.ndarray]:
    """All glyph bitmaps, nearest-neighbor upscaled by ``scale``."""
    bank = {}
    for ch in CHARSET:
        g = glyph_bitmap(ch)
        if scale > 1:
            g = np.kron(g, np.ones((scale, scale), dtype=bool))
        bank[ch] = g
    return bank


def renderable(text: str) -> str:
    """Project arbitrary text onto the charset (uppercase, drop unknown)."""
    out = []
    for ch in text.upper():
        if ch in _FONT or ch == " ":
            out.append(ch)
    return "".join(out)
