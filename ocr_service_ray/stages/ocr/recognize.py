"""Layout segmentation + glyph recognition (the from-scratch "model").

Tesseract-style stages over the binarized page: line segmentation by
row-projection runs, word/glyph segmentation by column-gap analysis,
recognition by template matching against the glyph bank. Plays the role
of the PaddleOCR call in the reference (/root/reference/app/ocr_engine.py:100)
and emits the same token record shape — (text, confidence, x, y) — as
its normalizer (app/ocr_engine.py:112-139).

Two match paths:
- FAST: downsample the glyph patch back to the 5x7 font grid and hash it
  into a dict of exact patterns (clean, unrotated glyphs hit this).
- ROBUST: vectorized XOR template matching with +-1 px shift search for
  glyphs degraded by deskew resampling or noise.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import glyphs as G

# Shift search for the robust matcher (raggedness is +-1 px).
_SHIFTS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _frame_dims(scale: int) -> tuple[int, int]:
    """Canonical match frame: glyph cell + 4 px padding for shifts."""
    return G.GLYPH_H * scale + 4, G.GLYPH_W * scale + 4


@dataclass
class Word:
    text: str
    confidence: float
    x: int  # leftmost ink column of the word (page coords)
    y: int  # top ink row of the word's line band (page coords)
    x_end: int = 0  # rightmost ink column (exclusive) — used for column-valley cuts


class TemplateBank:
    """Warm per-actor recognition state (built once in actor ``__init__``,
    mirroring the once-per-worker model load at
    /root/reference/app/ocr_engine.py:49-53)."""

    #: rotation-roundtrip degradation angles modeled in the bank
    VARIANT_ANGLES = (0.0, 1.5, -1.5, 3.0, -3.0)

    def __init__(self, scale: int = G.RENDER_SCALE):
        from .preprocess import rotate_bool

        self.scale = scale
        self.frame_h, self.frame_w = _frame_dims(scale)
        bank = G.glyph_bank(scale)
        base_chars: list[str] = list(bank.keys())
        # template stack includes rotate->derotate degraded variants of
        # every glyph: pages arrive rotated and are deskewed with
        # nearest-neighbor resampling, so the observed glyphs are ragged
        # in exactly this way — matching against in-bank degraded
        # variants beats matching clean templates with a looser metric
        templates: list[np.ndarray] = []
        owners: list[int] = []
        for i, ch in enumerate(base_chars):
            clean = _embed_centered(_crop_to_ink(bank[ch]), self.frame_h, self.frame_w)
            seen = {clean.tobytes()}
            templates.append(clean)
            owners.append(i)
            for a in self.VARIANT_ANGLES[1:]:
                # same NN rotate->derotate roundtrip the real pipeline applies
                ragged = _embed_centered(
                    _crop_to_ink(rotate_bool(rotate_bool(clean.astype(bool), a), -a)),
                    self.frame_h,
                    self.frame_w,
                )
                if ragged.tobytes() not in seen:
                    seen.add(ragged.tobytes())
                    templates.append(ragged)
                    owners.append(i)
        self.chars = base_chars
        self.owner = np.array(owners)
        self.stack = np.stack(templates).astype(np.uint8)
        self.ink = self.stack.reshape(len(self.stack), -1).sum(axis=1)
        # bit-packed templates for the XOR stage: popcount(xor(packed))
        # is bit-identical to the dense mismatch sum (pad bits are zero
        # on both sides) at ~1/8 the memory traffic
        self.stack_packed = np.packbits(self.stack.reshape(len(self.stack), -1), axis=1)
        self._pop8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)
        # pooled-grid prefilter state: crop-normalized float font-grid
        # per char (same stretch the patches get) + variant index lists
        self._pool_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        # pool from the SCALED bitmaps so the crop-stretch binning
        # aliases identically for templates and observed patches
        self.grid_t = np.stack([self._pool_grid(bank[ch]) for ch in base_chars])
        # pooled-accept gate margin DERIVED from the template set: the
        # minimum inter-class squared pooled distance (2.0 on this font,
        # D vs O). A constant margin tuned on one corpus silently
        # mis-calibrates when the font/renderer changes; this re-derives
        # on every bank build, so a tighter glyph set tightens the gate
        # automatically (ADVICE r2, recognize.py:200).
        dd = ((self.grid_t[:, None, :] - self.grid_t[None, :, :]) ** 2).sum(axis=2)
        np.fill_diagonal(dd, np.inf)
        self.pool_margin = float(dd.min())
        self.char_variants = [
            np.flatnonzero(self.owner == i) for i in range(len(base_chars))
        ]
        # short glyphs (punctuation) alias badly under crop-stretch, so
        # short patches skip the prefilter and XOR against this subset
        self.short_char_idx = [
            i for i, ch in enumerate(base_chars)
            if _crop_to_ink(G.glyph_bitmap(ch)).shape[0] <= G.GLYPH_H - 3
        ]
        self.short_variants = (
            np.concatenate([self.char_variants[i] for i in self.short_char_idx])
            if self.short_char_idx
            else np.arange(len(self.stack))
        )
        self.short_patch_h = (G.GLYPH_H - 2) * scale
        # exact-pattern dict on the 5x7 font grid
        self.exact: dict[bytes, str] = {}
        for ch in self.chars:
            g = G.glyph_bitmap(ch)
            self.exact[_crop_to_ink(g).tobytes() + bytes([_crop_to_ink(g).shape[1]])] = ch

    # ------------------------------------------------------------------
    def match_patches(self, patches: list[np.ndarray]) -> tuple[str, np.ndarray]:
        """Recognize a word's glyph patches; returns (text, per-glyph scores)."""
        out_chars: list[str] = []
        scores = np.ones(len(patches))
        robust_idx: list[int] = []
        for i, p in enumerate(patches):
            ch = self._match_fast(p)
            if ch is None:
                robust_idx.append(i)
                out_chars.append("?")
            else:
                out_chars.append(ch)
        if robust_idx:
            sub = [patches[i] for i in robust_idx]
            chars, subscores = self._match_robust(sub)
            for j, i in enumerate(robust_idx):
                out_chars[i] = chars[j]
                scores[i] = subscores[j]
            # satellite-prune retry: a salt cluster whose pixels all have
            # >= 2 8-neighbors survives despeckle(min_neighbors=2), and
            # when it sits within the 3 px column-merge tolerance of a
            # glyph it contaminates the patch — the crop box inflates and
            # _embed_centered misaligns the glyph body beyond the +-1 px
            # shift search (seen: a comma's 9x9 crop became 10x14 and
            # XOR-matched "." 21 vs "," 39). Only glyphs the robust pass
            # scored poorly are retried, and the pruned result replaces
            # the original only when it scores strictly better.
            for i in robust_idx:
                if scores[i] >= _RETRY_SCORE:
                    continue
                pruned = _prune_satellites(patches[i], self.scale)
                if pruned is None:
                    continue
                ch2, sc2 = self._match_robust([pruned])
                if sc2[0] > scores[i]:
                    out_chars[i] = ch2[0]
                    scores[i] = float(sc2[0])
        return "".join(out_chars), scores

    def _match_fast(self, patch: np.ndarray) -> str | None:
        s = self.scale
        h, w = patch.shape
        fh, fw = h // s, w // s
        if fh * s != h or fw * s != w or fh == 0 or fw == 0:
            return None
        # block-reduce back to the font grid
        grid = patch.reshape(fh, s, fw, s).sum(axis=(1, 3)) >= (s * s + 1) // 2
        key = grid.tobytes() + bytes([grid.shape[1]])
        return self.exact.get(key)

    def _pool_grid(self, patch: np.ndarray) -> np.ndarray:
        """Ink-cropped patch -> mean-pooled float font grid (GLYPH_H*GLYPH_W,)."""
        m = _crop_to_ink(np.asarray(patch, dtype=bool))
        h, w = m.shape
        key = (h, w)
        ops = self._pool_cache.get(key)
        if ops is None:
            R = np.zeros((G.GLYPH_H, h), dtype=np.float32)
            R[np.arange(h) * G.GLYPH_H // h, np.arange(h)] = 1.0
            C = np.zeros((w, G.GLYPH_W), dtype=np.float32)
            C[np.arange(w), np.arange(w) * G.GLYPH_W // w] = 1.0
            counts = np.maximum(R @ np.ones((h, w), dtype=np.float32) @ C, 1.0)
            ops = (R, C, counts)
            if len(self._pool_cache) < 4096:
                self._pool_cache[key] = ops
        R, C, counts = ops
        return ((R @ m.astype(np.float32) @ C) / counts).ravel()

    def _match_robust(self, patches: list[np.ndarray]) -> tuple[list[str], np.ndarray]:
        """Two-stage match: pooled-grid prefilter, then a small XOR pass.

        The full XOR against every template variant x 9 shifts moved
        ~8 MB of temporaries PER WORD and was the dominant memory-
        bandwidth consumer of the OCR stage. The pooled font-grid
        distance resolves the vast majority of degraded glyphs with two
        5x7 matmuls; only ambiguous patches escalate to the XOR stage,
        and then only against the top-5 candidate chars' variants.
        """
        n = len(patches)
        chars_out: list[str] = [""] * n
        scores = np.zeros(n)
        ncell = float(G.GLYPH_H * G.GLYPH_W)
        for i, p in enumerate(patches):
            crop_h = _crop_to_ink(np.asarray(p, dtype=bool)).shape[0]
            if crop_h < self.short_patch_h:
                t_sel = self.short_variants
            else:
                g = self._pool_grid(p)
                d = ((g[None, :] - self.grid_t) ** 2).sum(axis=1)
                # adaptive candidate width: a badly damaged glyph (large
                # best distance) can rank its true char outside the top
                # few pooled candidates, so widen the escalation set
                k = 5 if float(d.min()) <= 3.0 else 10
                top = np.argpartition(d, k - 1)[:k]
                top = top[np.argsort(d[top])]
                d1, d2 = float(d[top[0]]), float(d[top[1]])
                # accept gate: both caps are the bank-derived minimum
                # inter-class pooled distance (pool_margin, == 2.0 on
                # this font — the measured-safe constant: of 20,499
                # escalations on the full small corpus the XOR stage
                # overturned the pooled top-1 only 16 times, ALL with
                # d1 > 2.0). Geometrically: the patch sits closer to
                # top-1 than any two classes sit to each other, and the
                # runner-up is a full class-gap behind.
                if d1 <= self.pool_margin and d2 - d1 >= self.pool_margin:
                    chars_out[i] = self.chars[top[0]]
                    scores[i] = max(0.5, 1.0 - d1 / ncell)
                    continue
                # escalation: XOR vs the candidate chars' degraded variants
                t_sel = np.concatenate([self.char_variants[c] for c in top])
            base = _embed_centered(p, self.frame_h, self.frame_w)
            obs_ink = int(base.sum())
            # shifted views from one padded copy (np.roll x9 was a top
            # profile entry)
            pad = np.zeros((self.frame_h + 2, self.frame_w + 2), dtype=np.uint8)
            pad[1:-1, 1:-1] = base
            obs = np.stack(
                [
                    pad[1 + dy : 1 + dy + self.frame_h, 1 + dx : 1 + dx + self.frame_w]
                    for dy, dx in _SHIFTS
                ]
            )
            obs_p = np.packbits(obs.reshape(len(_SHIFTS), -1), axis=1)
            x = obs_p[:, None, :] ^ self.stack_packed[t_sel][None, :, :]
            mism = self._pop8[x].sum(axis=2, dtype=np.int64)
            best_over_shift = mism.min(axis=0)
            j = int(best_over_shift.argmin())
            best = int(best_over_shift[j])
            t = int(t_sel[j])
            chars_out[i] = self.chars[self.owner[t]]
            scores[i] = 1.0 - best / max(obs_ink + int(self.ink[t]), 1)
        return chars_out, scores


def _crop_to_ink(mask: np.ndarray) -> np.ndarray:
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0:
        return mask[:1, :1]
    return mask[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def _embed_centered(mask: np.ndarray, frame_h: int, frame_w: int) -> np.ndarray:
    """Center an ink-cropped mask in the canonical frame (uint8)."""
    out = np.zeros((frame_h, frame_w), dtype=np.uint8)
    m = _crop_to_ink(np.asarray(mask, dtype=bool))
    h, w = m.shape
    h = min(h, frame_h)
    w = min(w, frame_w)
    r0 = (frame_h - h) // 2
    c0 = (frame_w - w) // 2
    out[r0 : r0 + h, c0 : c0 + w] = m[:h, :w]
    return out


# ----------------------------------------------------------------------
# Segmentation


def segment_lines(
    ink: np.ndarray, min_gap: int = 2, min_row_ink: int = 3
) -> list[tuple[int, int]]:
    """(row_start, row_end) bands of text lines; merges gaps < ``min_gap``.

    A row counts as inked only with >= ``min_row_ink`` pixels so that a
    residual noise cluster between lines cannot bridge two bands.
    """
    prof = ink.sum(axis=1) >= min_row_ink
    runs = _runs(prof)
    merged: list[tuple[int, int]] = []
    for r0, r1 in runs:
        if merged and r0 - merged[-1][1] < min_gap:
            merged[-1] = (merged[-1][0], r1)
        else:
            merged.append((r0, r1))
    return merged


def segment_words(
    band: np.ndarray, scale: int = G.RENDER_SCALE, word_gap_px: int | None = None
) -> list[tuple[int, int, list[tuple[int, int]]]]:
    """Split a line band into words and glyph column-runs.

    Returns [(word_x0, word_x1, [(glyph_c0, glyph_c1), ...]), ...].
    Glyphs split on blank column runs >= 2 px; words on gaps >= 7 font px.
    """
    if word_gap_px is None:
        word_gap_px = 7 * scale
    prof = band.any(axis=0)
    cols = _runs(prof)
    # width-guarded fragment merge: glyph pieces separated by <= 2 blank
    # px (resampling holes, thinned "/") merge ONLY while the union still
    # fits one glyph cell — rotation can squeeze a real 4 px inter-char
    # gap down to 1 px, and an unguarded merge would swallow a character
    # rotation can smear a 10 px glyph to ~12 px, and real inter-char
    # unions start at ~20 px, so the guard has slack on both sides
    max_glyph_w = 5 * scale + 3
    merged_runs: list[tuple[int, int]] = []
    for c0, c1 in cols:
        if (
            merged_runs
            and c0 - merged_runs[-1][1] <= 3
            and c1 - merged_runs[-1][0] <= max_glyph_w
        ):
            merged_runs[-1] = (merged_runs[-1][0], c1)
        else:
            merged_runs.append((c0, c1))
    # drop sub-glyph noise runs BEFORE word grouping: a surviving salt
    # pair between two words would otherwise bridge the inter-word gap
    # (every real glyph has >= 2*scale^2 ink px; "." has 8 at scale 2)
    min_run_ink = scale * scale + 1
    glyph_runs = [
        (c0, c1) for c0, c1 in merged_runs if int(band[:, c0:c1].sum()) >= min_run_ink
    ]
    words: list[tuple[int, int, list[tuple[int, int]]]] = []
    cur: list[tuple[int, int]] = []
    for run in glyph_runs:
        if cur and run[0] - cur[-1][1] >= word_gap_px:
            words.append((cur[0][0], cur[-1][1], cur))
            cur = []
        cur.append(run)
    if cur:
        words.append((cur[0][0], cur[-1][1], cur))
    return words


def _runs(profile: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) runs of True in a 1-D boolean profile."""
    idx = np.flatnonzero(profile)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def recognize_page(
    ink: np.ndarray, bank: TemplateBank, min_glyph_ink: int | None = None
) -> list[Word]:
    """Full page -> word tokens with positions.

    ``min_glyph_ink`` filters residual noise clusters that survived
    despeckle (every real glyph has >= 4*scale^2 ink px; default cut is
    half of the smallest glyph's ink).
    """
    if min_glyph_ink is None:
        min_glyph_ink = 2 * bank.scale * bank.scale
    words: list[Word] = []
    for r0, r1 in segment_lines(ink):
        band = ink[r0:r1]
        for x0, x1, glyph_runs in segment_words(band, scale=bank.scale):
            patches = []
            for c0, c1 in glyph_runs:
                patch = band[:, c0:c1]
                if int(patch.sum()) < min_glyph_ink:
                    continue
                patches.append(_crop_patch(patch))
            if not patches:
                continue
            text, scores = bank.match_patches(patches)
            words.append(
                Word(
                    text=text,
                    confidence=float(scores.mean()) if len(scores) else 0.0,
                    x=int(x0),
                    y=int(r0),
                    x_end=int(x1),
                )
            )
    return words


# score below which a robust-matched glyph earns a satellite-prune retry;
# clean and variant-matched glyphs score >= ~0.95 (XOR residue of a few
# noise flips over ~100 ink px), so the gate only fires on genuinely
# degraded patches and the hot path never pays for the retry
_RETRY_SCORE = 0.9


def _prune_satellites(patch: np.ndarray, scale: int) -> np.ndarray | None:
    """Drop sub-stroke noise satellites OUTSIDE the glyph body's bbox.

    The harm mechanism is alignment: a satellite beyond the dominant
    component's bounding box inflates the crop, so the centered embedding
    shifts the glyph body past the +-1 px search. Only such components
    are pruned, and only when they are sub-stroke-sized (< scale*scale
    ink). Ragged fragments of a real glyph (rotation-resampling splits)
    lie inside or touching the body's bbox and are NEVER dropped —
    dropping interior ink systematically favors simpler glyph classes
    (a de-fragmented "R" reads "P"; seen at bench scale). Returns the
    re-cropped patch, or None when nothing qualifies.
    """
    m = np.asarray(patch, dtype=bool)
    comps = _components8(m)
    if len(comps) < 2:
        return None
    sizes = np.array([int(c.sum()) for c in comps])
    small = scale * scale
    if sizes.max() < 4 * small:
        return None
    main = comps[int(sizes.argmax())]
    rows = np.flatnonzero(main.any(axis=1))
    cols = np.flatnonzero(main.any(axis=0))
    r0, r1, c0, c1 = rows[0], rows[-1], cols[0], cols[-1]

    def outside_bbox(c: np.ndarray) -> bool:
        rr = np.flatnonzero(c.any(axis=1))
        cc = np.flatnonzero(c.any(axis=0))
        return rr[-1] < r0 or rr[0] > r1 or cc[-1] < c0 or cc[0] > c1

    merged = np.zeros_like(m)
    dropped = 0
    for c, s in zip(comps, sizes):
        if s < small and outside_bbox(c):
            dropped += 1
        else:
            merged |= c
    if dropped == 0:
        return None
    return _crop_patch(_crop_to_ink(merged).astype(patch.dtype))


def _components8(m: np.ndarray) -> list[np.ndarray]:
    """8-connected components of a small boolean mask (flood fill by
    dilation — patches are glyph-sized, and this only runs on the rare
    low-score retry path)."""
    remaining = m.copy()
    comps: list[np.ndarray] = []
    while remaining.any():
        seed = np.argwhere(remaining)[0]
        comp = np.zeros_like(m)
        comp[seed[0], seed[1]] = True
        n = 1
        while True:
            comp = _dilate8(comp) & m
            n2 = int(comp.sum())
            if n2 == n:
                break
            n = n2
        comps.append(comp)
        remaining &= ~comp
    return comps


def _dilate8(m: np.ndarray) -> np.ndarray:
    p = np.zeros((m.shape[0] + 2, m.shape[1] + 2), dtype=bool)
    p[1:-1, 1:-1] = m
    out = m.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out |= p[1 + dy : 1 + dy + m.shape[0], 1 + dx : 1 + dx + m.shape[1]]
    return out


def _crop_patch(patch: np.ndarray) -> np.ndarray:
    """Crop a glyph patch to its dominant row mass.

    Stray noise or rotation-bleed pixels vertically separated from the
    glyph would otherwise stretch the crop and push the centered
    embedding outside the +-1 px shift search. Row runs separated by
    <= 2 blank px are merged (":" has a 2 px internal gap at scale 2);
    the run with the most ink wins.
    """
    prof = patch.sum(axis=1)
    rows = np.flatnonzero(prof)
    if rows.size == 0:
        return patch[:1]
    # merge inked row runs with gaps <= 2
    runs: list[list[int]] = []  # [r0, r1, ink]
    for r in rows.tolist():
        if runs and r - runs[-1][1] <= 3:
            runs[-1][1] = r + 1
            runs[-1][2] += int(prof[r])
        else:
            runs.append([r, r + 1, int(prof[r])])
    r0, r1, _ = max(runs, key=lambda rn: rn[2])
    return patch[r0:r1]
