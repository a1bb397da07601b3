"""Image preprocessing: Otsu binarization, despeckle, rotation, deskew.

From-scratch numpy implementations of the CV primitives the reference
gets from cv2 (Otsu threshold at /root/reference/app/ocr_engine.py:66,364-367;
the preprocess attempt ladders at :64-74 and :92-96). Deskew (projection-
profile angle search) is the Tesseract-style stage the north rule asks
for; the reference never deskews because PaddleOCR's angle classifier
does it implicitly (``use_angle_cls=True``, app/ocr_engine.py:50).
"""

from __future__ import annotations

import numpy as np


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's method over the 256-bin histogram; returns the threshold.

    Pixels <= threshold are ink (dark) for our white-background pages.
    """
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127
    omega = np.cumsum(hist) / total  # class-0 probability
    mu = np.cumsum(hist * np.arange(256)) / total  # class-0 mean mass
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    return int(np.argmax(sigma_b))


def binarize(gray: np.ndarray) -> np.ndarray:
    """Boolean ink mask (True = ink) via Otsu."""
    t = otsu_threshold(gray)
    return gray <= t


def despeckle(ink: np.ndarray, min_neighbors: int = 1) -> np.ndarray:
    """Remove isolated ink pixels (fewer than ``min_neighbors`` 8-neighbors).

    Kills salt noise before segmentation so stray pixels never become
    phantom glyph boxes.
    """
    p = np.pad(ink, 1).astype(np.uint8)
    n = np.zeros_like(p[1:-1, 1:-1])
    for sl in (
        p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:],
        p[1:-1, :-2], p[1:-1, 2:],
        p[2:, :-2], p[2:, 1:-1], p[2:, 2:],
    ):
        n += sl  # in-place accumulation: no chained-add temporaries
    return ink & (n >= min_neighbors)


def rotate_bool(ink: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate a boolean mask about its center (nearest neighbor, same shape).

    Memory-lean: float32 broadcast + int32 flat gather (the naive
    int64-mgrid version moved ~40 MB of temporaries per VGA-sized page,
    which saturated node memory bandwidth with >8 concurrent OCR actors).
    """
    if abs(angle_deg) < 1e-9:
        return ink
    h, w = ink.shape
    theta = np.deg2rad(angle_deg)
    c, s = np.float32(np.cos(theta)), np.float32(np.sin(theta))
    cy, cx = np.float32((h - 1) / 2.0), np.float32((w - 1) / 2.0)
    y = (np.arange(h, dtype=np.float32) - cy)[:, None]
    x = (np.arange(w, dtype=np.float32) - cx)[None, :]
    src_r = np.rint(cy + s * x + c * y).astype(np.int32)
    src_c = np.rint(cx + c * x - s * y).astype(np.int32)
    valid = (src_r >= 0) & (src_r < h) & (src_c >= 0) & (src_c < w)
    np.clip(src_r, 0, h - 1, out=src_r)
    np.clip(src_c, 0, w - 1, out=src_c)
    src_r *= w
    src_r += src_c  # flat int32 index (h*w < 2^31 always for our pages)
    out = ink.ravel()[src_r.ravel()].reshape(h, w)
    out &= valid
    return out


def rotate_bilinear(ink: np.ndarray, angle_deg: float, thresh: float = 0.5) -> np.ndarray:
    """Anti-aliased mask rotation: bilinear sample + threshold.

    NOT used on the deskew path: with binary 2-3 px strokes the 0.5
    threshold erodes thin diagonals worse than nearest-neighbor raggedness
    (measured: 8347/8547 vs 8544/8547 media matches). Kept for stages
    operating on grayscale-ish masks.
    """
    if abs(angle_deg) < 1e-9:
        return ink
    h, w = ink.shape
    theta = np.deg2rad(angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rr, cc = np.mgrid[0:h, 0:w]
    y = rr - cy
    x = cc - cx
    fr = cy + (s * x + c * y)
    fc = cx + (c * x - s * y)
    r0 = np.floor(fr).astype(np.int64)
    c0 = np.floor(fc).astype(np.int64)
    dr = fr - r0
    dc = fc - c0
    src = ink.astype(np.float32)
    acc = np.zeros((h, w), dtype=np.float32)
    for (ro, co, wgt) in (
        (r0, c0, (1 - dr) * (1 - dc)),
        (r0, c0 + 1, (1 - dr) * dc),
        (r0 + 1, c0, dr * (1 - dc)),
        (r0 + 1, c0 + 1, dr * dc),
    ):
        valid = (ro >= 0) & (ro < h) & (co >= 0) & (co < w)
        acc[valid] += wgt[valid].astype(np.float32) * src[ro[valid], co[valid]]
    return acc >= thresh


def _coord_sharpness(rows, cols_c, angle_deg, n_rows):
    """Gradient energy of the row projection after rotating the ink pixel
    COORDINATES by ``-angle`` — exact profile, no image resampling."""
    t = np.float32(np.tan(np.deg2rad(angle_deg)))
    r = np.rint(rows + t * cols_c).astype(np.int32)
    r -= r.min()
    prof = np.bincount(r, minlength=n_rows).astype(np.float32)
    d = np.diff(prof)
    return float((d * d).sum())


def _grid_best(rows, cols_c, n_rows, center, half, step):
    best_a, best_v = center, -1.0
    a = center - half
    while a <= center + half + 1e-9:
        v = _coord_sharpness(rows, cols_c, a, n_rows)
        if v > best_v:
            best_a, best_v = a, v
        a += step
    return best_a


def estimate_skew(ink: np.ndarray, max_angle: float = 4.0) -> float:
    """Projection-profile deskew: angle (deg) whose un-rotation sharpens rows.

    Coarse-to-fine grid search over the exact coordinate-space projection
    profile (small-angle shear model, valid for the <=4 deg range).
    Returns the estimated page skew; rotate by ``-angle`` to correct.
    """
    rr, cc = np.nonzero(ink)
    if rr.size == 0:
        return 0.0
    # deterministic subsample: ~8k ink points estimate the angle as well
    # as 60k, and the 31 grid evaluations each touch every point — the
    # full-coordinate version moved ~45 MB per page probe
    if rr.size > 12000:
        step = rr.size // 8000
        rr = rr[::step]
        cc = cc[::step]
    rows = rr.astype(np.float32)
    cols_c = cc.astype(np.float32) - np.float32((ink.shape[1] - 1) / 2.0)
    n = ink.shape[0] + int(ink.shape[1] * np.tan(np.deg2rad(max_angle))) + 2
    a = _grid_best(rows, cols_c, n, 0.0, max_angle, 1.0)
    a = _grid_best(rows, cols_c, n, a, 1.0, 0.2)
    a = _grid_best(rows, cols_c, n, a, 0.2, 0.04)
    return a


def deskew(
    ink: np.ndarray,
    max_angle: float = 4.0,
    max_iter: int = 3,
    initial: float | None = None,
) -> tuple[np.ndarray, float]:
    """Estimate and remove page skew; returns (corrected ink, total angle).

    Iterates estimate->rotate: the residual estimate on an almost-
    corrected page is far more accurate than the first pass (the
    projection profile is sharper near alignment), so 2-3 cheap passes
    beat one expensive full-resolution search.
    """
    def _row_sharpness(mask: np.ndarray) -> float:
        d = np.diff(mask.sum(axis=1).astype(np.float64))
        return float((d * d).sum())

    angle = initial if initial is not None else estimate_skew(ink, max_angle)
    if abs(angle) < 0.05:
        return ink, 0.0
    # ONE image rotation: the estimator's coarse-to-fine search already
    # runs in coordinate space down to 0.04 deg, and iterative image
    # re-rotation both drifted on sparse pages and dominated the memory
    # bandwidth of the whole OCR stage.
    cur = rotate_bool(ink, -angle)
    # guard: a correction that un-sharpens the actual row profile means
    # the estimator misfired (sparse page) — keep the original.
    if _row_sharpness(cur) <= _row_sharpness(ink):
        return ink, 0.0
    return cur, angle
