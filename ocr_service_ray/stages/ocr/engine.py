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
from . import sqr
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
    def extract_page(self, payload: bytes | None) -> dict:
        """SYNR payload -> {"tokens": [...], "qrcode": str | None}.

        Full page pass: decode -> despeckle -> skew probe -> (deskew) ->
        SQR code detect+mask -> recognition attempt ladder. The code
        block must be masked before glyph segmentation or it would shred
        into phantom tokens; its decoded payload is the analog of the
        reference's QR extraction (app/ocr_engine.py:56-83), surfaced
        alongside the tokens like ``structure_data(ocr, qr)`` merges
        them (app/main.py:122-124).
        """
        img = raster.decode(payload)
        if img is None:
            return {"tokens": [], "qrcode": None}
        # min_neighbors=2 also removes 2-pixel salt clusters; safe because
        # every glyph stroke is >= 3 px wide (all ink pixels keep >= 3
        # 8-neighbors).
        ink_full = P.despeckle(P.binarize(img), min_neighbors=2)
        ink = _crop_to_content(ink_full)

        # cheap skew probe first: recognition is ~10x the cost of the
        # projection-profile estimate, so never waste a full recognize
        # pass on a page we already know is rotated (the reference's
        # ladder blindly runs the raw attempt first, ocr_engine.py:92-96)
        angle = P.estimate_skew(ink)
        if abs(angle) < 0.05:
            work = ink
            rotated = False
        else:
            self.retries += 1
            # re-crop with rotation-aware padding: derotation moves edge
            # pixels vertically by up to (w/2)*sin(angle) (and
            # horizontally by (h/2)*sin), which a tight crop would clip
            s_ang = abs(float(np.sin(np.deg2rad(angle))))
            pad_y = 8 + int(s_ang * ink.shape[1] / 2) + 2
            pad_x = 8 + int(s_ang * ink.shape[0] / 2) + 2
            ink_r = _crop_to_content(ink_full, pad=pad_y, pad_x=pad_x)
            work, _total = P.deskew(ink_r, initial=angle)
            work = _crop_to_content(work)
            rotated = True
        work, qr = sqr.mask_sqr_region(work)

        attempts: list[list[Word]] = []
        words = recognize_page(work, self.bank)
        if words and (
            (not rotated and all(w.confidence >= 0.999 for w in words))
            or (rotated and self._page_ok(words))
        ):
            return {"tokens": self._normalize(words), "qrcode": qr}
        attempts.append(words)

        # attempt 2: aggressive despeckle
        self.retries += 1
        ink3 = P.despeckle(work, min_neighbors=2)
        words3 = recognize_page(ink3, self.bank)
        attempts.append(words3)
        best = max(attempts, key=_attempt_rank)
        if self._page_ok(best) or not rotated:
            return {"tokens": self._normalize(best), "qrcode": qr}

        # attempt 3 (rotated pages only): angle-jitter re-derotation.
        # Nearest-neighbor damage depends on the resample PHASE, so a
        # slightly different derotation angle re-renders every glyph
        # differently — the analog of the reference's preprocessing
        # variant ladder (app/ocr_engine.py:92-96).
        for delta in (0.3, -0.3):
            self.retries += 1
            alt = _crop_to_content(P.rotate_bool(ink_r, -(angle + delta)))
            alt, qr_alt = sqr.mask_sqr_region(alt)
            if qr is None:
                qr = qr_alt
            words_alt = recognize_page(alt, self.bank)
            attempts.append(words_alt)
            if words_alt and self._page_ok(words_alt):
                return {"tokens": self._normalize(words_alt), "qrcode": qr}
        best = max(attempts, key=_attempt_rank)
        return {"tokens": self._normalize(best), "qrcode": qr}

    def _page_ok(self, words: list[Word]) -> bool:
        """Accept a page only if the MEAN is high AND no word is weak —
        one mangled word must not drown in an otherwise clean page."""
        if not words:
            return False
        confs = [w.confidence for w in words]
        return (sum(confs) / len(confs)) >= self.accept_conf and min(confs) >= 0.75

    def extract_text(self, payload: bytes | None) -> list[dict]:
        """SYNR payload -> normalized token dicts; [] for garbage input."""
        return self.extract_page(payload)["tokens"]

    def extract_qrcode(self, payload: bytes | None) -> list[dict] | None:
        """Reference-shaped QR result (app/models.py:30-32 semantics):
        ``[{"data": url, "type": "QRCODE"}]`` or ``None`` when absent."""
        img = raster.decode(payload)
        if img is None:
            return None
        ink_full = P.despeckle(P.binarize(img), min_neighbors=2)
        ink = _crop_to_content(ink_full)
        # ladder: raw -> deskewed (mirrors the variant ladder at
        # app/ocr_engine.py:64-76; all failures swallowed -> None)
        data = sqr.decode_sqr(ink)
        if data is None:
            angle = P.estimate_skew(ink)
            if abs(angle) >= 0.05:
                s_ang = abs(float(np.sin(np.deg2rad(angle))))
                pad_y = 8 + int(s_ang * ink.shape[1] / 2) + 2
                pad_x = 8 + int(s_ang * ink.shape[0] / 2) + 2
                work, _ = P.deskew(
                    _crop_to_content(ink_full, pad=pad_y, pad_x=pad_x), initial=angle
                )
                data = sqr.decode_sqr(work)
        return [{"data": data, "type": "QRCODE"}] if data is not None else None

    def recognize_lines(self, payload: bytes | None) -> str | None:
        """SYNR payload -> full recognized text, lines joined by ``\\n``.

        The span-extraction contract: layout order (top-down lines,
        left-right words), whitespace-normalized per line. ``None`` when
        the payload is undecodable or yields no text.
        """
        page = self.recognize_page(payload)
        return page["text"] if page else None

    def recognize_page(self, payload: bytes | None) -> dict | None:
        """Like ``recognize_lines`` but also reports the mean token
        confidence (the reference's per-document ``confianca`` is the
        mean OCR confidence, app/models.py:26 / README example 0.956).
        Returns ``{"text": str, "confidence": float}`` or ``None``.
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
        import numpy as _np

        conf = float(round(_np.mean([t["confidence"] for t in tokens]), 3))
        return {"text": "\n".join(lines), "confidence": conf}

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


def _attempt_rank(words: list[Word]) -> tuple[float, float]:
    """Best-attempt ordering: worst word first, then page mean."""
    if not words:
        return (0.0, 0.0)
    confs = [w.confidence for w in words]
    return (min(confs), sum(confs) / len(confs))


def _crop_to_content(ink: np.ndarray, pad: int = 8, pad_x: int | None = None) -> np.ndarray:
    """Crop the page to its ink bounding box (+pad).

    Rendered pages carry wide blank margins; every downstream pass
    (deskew rotation, despeckle, code detection, segmentation) is linear
    in page AREA, so cropping typically halves the OCR stage's memory
    traffic. Token x/y become crop-relative — consistently for every
    token, so layout parsing (relative bands/columns) is unaffected.
    """
    if pad_x is None:
        pad_x = pad
    rows = np.flatnonzero(ink.any(axis=1))
    if rows.size == 0:
        return ink
    cols = np.flatnonzero(ink.any(axis=0))
    r0 = max(0, rows[0] - pad)
    r1 = min(ink.shape[0], rows[-1] + 1 + pad)
    c0 = max(0, cols[0] - pad_x)
    c1 = min(ink.shape[1], cols[-1] + 1 + pad_x)
    return ink[r0:r1, c0:c1]
