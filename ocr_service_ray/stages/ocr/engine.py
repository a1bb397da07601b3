"""The OCR engine: decode -> preprocess ladder -> recognize -> tokens.

Mirrors the reference's engine surface (/root/reference/app/ocr_engine.py:86-139)
as a warm-state class meant to live inside a Ray actor pool:

- ``__init__`` builds the template bank once per actor (the analog of the
  PaddleOCR model load at app/ocr_engine.py:49-53).
- ``extract_text(payload)`` runs the preprocess attempt ladder (analog of
  app/ocr_engine.py:92-110: raw -> binarize -> zoom) and returns
  normalized (text, confidence, x, y) tokens sorted by (y, x).
- undecodable payloads return ``[]`` (error-record semantics downstream).

Ladder acceptance is strengthened vs the reference: the reference stops
at the first NON-EMPTY result, which can accept garbage from a skewed
page; we stop at the first HIGH-CONFIDENCE result (all-exact matches for
the fast attempt, mean confidence >= ``accept_conf`` after deskew) and
otherwise keep the best-scoring attempt. Deterministic by construction.
"""

from __future__ import annotations

import numpy as np

from ...ops import textops as T
from . import preprocess as P
from . import raster
from .recognize import TemplateBank, Word, recognize_page

_X_SENTINEL = 10**9


class OcrEngine:
    def __init__(self, conf_floor: float = 0.35, accept_conf: float = 0.9, scale: int | None = None):
        from . import glyphs as G

        if scale is None:
            scale = G.RENDER_SCALE
        self.bank = TemplateBank(scale=scale)
        self.conf_floor = conf_floor
        self.accept_conf = accept_conf
        self.retries = 0  # cumulative extra attempts (metrics)

    # ------------------------------------------------------------------
    def extract_text(self, payload: bytes | None) -> list[dict]:
        """SYNR payload -> normalized token dicts; [] for garbage input."""
        img = raster.decode(payload)
        if img is None:
            return []
        # min_neighbors=2 also removes 2-pixel salt clusters; safe because
        # every glyph stroke is >= 2 px wide at scale 2 (all ink pixels
        # keep >= 3 8-neighbors).
        ink = P.despeckle(P.binarize(img), min_neighbors=2)

        # cheap skew probe first: recognition is ~10x the cost of the
        # projection-profile estimate, so never waste a full recognize
        # pass on a page we already know is rotated (the reference's
        # ladder blindly runs the raw attempt first, ocr_engine.py:92-96)
        angle = P.estimate_skew(ink)
        attempts: list[list[Word]] = []
        if abs(angle) < 0.05:
            words = recognize_page(ink, self.bank)
            if words and all(w.confidence >= 0.999 for w in words):
                return self._normalize(words)
            attempts.append(words)
            work = ink
        else:
            self.retries += 1
            work, _total = P.deskew(ink, initial=angle)
            words = recognize_page(work, self.bank)
            if words and _mean_conf(words) >= self.accept_conf:
                return self._normalize(words)
            attempts.append(words)

        # final attempt: aggressive despeckle on the deskewed page
        self.retries += 1
        ink3 = P.despeckle(work, min_neighbors=2)
        words3 = recognize_page(ink3, self.bank)
        attempts.append(words3)
        best = max(attempts, key=_mean_conf)
        return self._normalize(best)

    def recognize_lines(self, payload: bytes | None) -> str | None:
        """SYNR payload -> full recognized text, lines joined by ``\\n``.

        The span-extraction contract: layout order (top-down lines,
        left-right words), whitespace-normalized per line. ``None`` when
        the payload is undecodable or yields no text.
        """
        tokens = self.extract_text(payload)
        if not tokens:
            return None
        lines: list[str] = []
        cur_y = None
        cur: list[str] = []
        for t in tokens:
            if cur_y is None or t["y_position"] != cur_y:
                if cur:
                    lines.append(" ".join(cur))
                cur = []
                cur_y = t["y_position"]
            cur.append(t["text"])
        if cur:
            lines.append(" ".join(cur))
        return "\n".join(lines)

    # ------------------------------------------------------------------
    def _normalize(self, words: list[Word]) -> list[dict]:
        """Word objects -> token dicts; filter + norm + sort.

        Semantics of the reference normalizer (app/ocr_engine.py:112-139):
        drop empty/low-confidence tokens, round confidence to 3dp, sort
        by (y, x) with null-x sentinel (app/ocr_engine.py:103).
        """
        out = []
        for w in words:
            text = T.norm_text(w.text)
            if not text or w.confidence < self.conf_floor:
                continue
            out.append(
                {
                    "text": text,
                    "confidence": round(w.confidence, 3),
                    "y_position": int(w.y),
                    "x_position": int(w.x),
                    "x_end": int(w.x_end),
                }
            )
        out.sort(
            key=lambda t: (
                t["y_position"],
                t["x_position"] if t["x_position"] is not None else _X_SENTINEL,
            )
        )
        return out


def _mean_conf(words: list[Word]) -> float:
    if not words:
        return 0.0
    return float(np.mean([w.confidence for w in words]))
