"""SQR: the synthetic machine-readable 2-D code (QR-code analog).

The reference extracts a QR code from receipt photos through a
preprocessing attempt ladder (pyzbar + cv2 fallback,
/root/reference/app/ocr_engine.py:56-83) and hands the decoded URL to
the HTML path (/root/reference/app/main.py:122,157). pyzbar/cv2 are
unavailable in-sandbox, so — exactly like the raster format replaces
JPEG — a self-defined code format replaces QR, and the engine implements
a real detect→sample→decode pass over the binarized page:

Format (module size M px, grid n x n):
- 1-module solid border ring (the finder frame)
- interior (n-2)^2 modules, row-major payload bits:
  16-bit big-endian byte length, then payload bytes MSB-first
- the grid size n is the smallest that fits the payload

Detection: scan the ink mask for long solid horizontal runs (>= frame
width; glyph text never produces runs that long), verify the four frame
edges, then majority-sample each interior module's center. Failures
return ``None`` — swallowed-exception semantics like the reference's
ladder (app/ocr_engine.py:82-83).
"""

from __future__ import annotations

import numpy as np

MODULE = 6  # px per module (erosion-tolerant: rotate/deskew shaves <=2 px)


def _grid_size(payload: bytes) -> int:
    bits = 16 + 8 * len(payload)
    # floor of 8 inner modules: the detector requires >= 10 total
    # (min_modules) so even 1-byte payloads stay detectable
    n_inner = max(8, int(np.ceil(np.sqrt(bits))))
    return n_inner + 2


def encode_sqr(payload: str | bytes) -> np.ndarray:
    """Payload -> boolean ink mask of the code block (True = ink)."""
    data = payload.encode("utf-8") if isinstance(payload, str) else bytes(payload)
    if len(data) >= 1 << 16:
        raise ValueError("payload too long")
    n = _grid_size(data)
    inner = n - 2
    bits = np.zeros(inner * inner, dtype=bool)
    stream = [(len(data) >> (15 - i)) & 1 for i in range(16)]
    for byte in data:
        stream.extend((byte >> (7 - i)) & 1 for i in range(8))
    bits[: len(stream)] = np.array(stream, dtype=bool)
    grid = np.zeros((n, n), dtype=bool)
    grid[0, :] = grid[-1, :] = grid[:, 0] = grid[:, -1] = True  # frame
    grid[1:-1, 1:-1] = bits.reshape(inner, inner)
    return np.kron(grid, np.ones((MODULE, MODULE), dtype=bool))


def stamp_sqr(ink: np.ndarray, r0: int, c0: int, payload: str | bytes) -> np.ndarray:
    """Stamp the code (with a 1-module cleared quiet zone) into a mask."""
    block = encode_sqr(payload)
    h, w = block.shape
    q = MODULE
    ink[max(0, r0 - q) : r0 + h + q, max(0, c0 - q) : c0 + w + q] = False
    ink[r0 : r0 + h, c0 : c0 + w] = block
    return ink


# ----------------------------------------------------------------------
# Detection + decode


def _long_runs(row: np.ndarray, min_len: int, max_gap: int = 2) -> list[tuple[int, int]]:
    """Solid runs of True, tolerating pepper-noise holes <= max_gap px."""
    idx = np.flatnonzero(row)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > max_gap)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return [(int(s), int(e)) for s, e in zip(starts, ends) if e - s >= min_len]


def _vrun_len(col: np.ndarray, start: int, max_gap: int = 2) -> int:
    """Length of the gap-tolerant True run in ``col`` beginning at start."""
    n = 0
    gap = 0
    i = start
    while i < len(col):
        if col[i]:
            n = i - start + 1
            gap = 0
        else:
            gap += 1
            if gap > max_gap:
                break
        i += 1
    return n


def detect_sqr(ink: np.ndarray, min_modules: int = 8) -> tuple[int, int, int, int] | None:
    """Locate the code frame; returns (r0, c0, side_px, n_modules) or None.

    Rotation round-trips erode up to ~3 px off every edge, so the bottom
    edge is located by an explicit downward scan (never inferred from
    the top run's length) and the vertical edges are verified by their
    actual column density between the two horizontal edges.
    """
    h, w = ink.shape
    m = MODULE
    min_len = min_modules * m
    if w <= min_len:
        return None
    # vectorized prefilter: a frame edge is a near-solid window of
    # min_len columns, which glyph text (4-6 px inter-char gaps every
    # ~10 px) can never produce; one cumsum pass finds the few rows
    # worth scanning instead of running per-row gap analysis everywhere
    S = np.cumsum(ink, axis=1, dtype=np.int32)
    win = S[:, min_len:] - S[:, :-min_len]
    cand = np.flatnonzero(win.max(axis=1) >= min_len - 4)
    for r in cand:
        r = int(r)
        for c0, c1 in _long_runs(ink[r], min_len):
            run_h = c1 - c0
            # locate the bottom edge: bottom-most row below r with a
            # comparably long run in the same column range
            lo = r + min_len
            hi = min(h, r + run_h + 3 * m)
            cs = max(0, c0 - 3)
            ce = min(w, c1 + 3)
            rb = None
            for rr in range(hi - 1, lo - 1, -1):
                if _long_runs(ink[rr, cs:ce], int(0.8 * run_h)):
                    rb = rr
                    break
            if rb is None:
                continue
            side = rb - r + 1
            n = int(round(side / m))
            if n < min_modules or abs(run_h - side) > 3 * m:
                continue
            # verify the vertical edges between the horizontal ones
            col_l = ink[r : rb + 1, min(c0 + 2, w - 1)]
            col_r = ink[r : rb + 1, max(c1 - 3, 0)]
            if col_l.mean() < 0.7 or col_r.mean() < 0.7:
                continue
            return r, c0, side, n
    return None


def decode_sqr(
    ink: np.ndarray, found: tuple[int, int, int, int] | None = None
) -> str | None:
    """Detect + decode the code's payload from a page mask; None on failure."""
    if found is None:
        found = detect_sqr(ink)
    if found is None:
        return None
    r0, c0, side, n = found
    # edge erosion can shave enough off ``side`` to flip round(side/M)
    # to the wrong module count — try neighboring grid sizes with both
    # the measured and the nominal module pitch; a wrong combination
    # almost always fails the length/UTF-8 validation
    candidates = [
        (n, side / n),
        (n + 1, float(MODULE)),
        (n + 1, side / (n + 1)),
        (n, float(MODULE)),
        (n - 1, side / max(n - 1, 1)),
    ]
    for n_try, m_try in candidates:
        if n_try < 8:
            continue
        out = _decode_grid(ink, r0, c0, m_try, n_try)
        if out is not None:
            return out
    return None


def _decode_grid(ink: np.ndarray, r0: int, c0: int, m: float, n: int) -> str | None:
    inner = n - 2
    # sample each interior module center with a 2x2 majority
    rs = (r0 + (np.arange(1, n - 1) + 0.5) * m).astype(np.int64)
    cs = (c0 + (np.arange(1, n - 1) + 0.5) * m).astype(np.int64)
    votes = np.zeros((inner, inner), dtype=np.int16)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            votes += ink[np.clip(rs + dr, 0, ink.shape[0] - 1)][:, np.clip(cs + dc, 0, ink.shape[1] - 1)]
    bits = (votes >= 5).ravel()
    if bits.size < 16:
        return None
    length = 0
    for i in range(16):
        length = (length << 1) | int(bits[i])
    if 16 + 8 * length > bits.size:
        return None
    data = bytearray()
    pos = 16
    for _ in range(length):
        byte = 0
        for _ in range(8):
            byte = (byte << 1) | int(bits[pos])
            pos += 1
        data.append(byte)
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return None


def mask_sqr_region(ink: np.ndarray) -> tuple[np.ndarray, str | None]:
    """Decode the code (if any) and blank its region + quiet zone.

    Used by the OCR engine so the code block never reaches glyph
    segmentation (it would shred into phantom tokens otherwise).
    """
    found = detect_sqr(ink)
    if found is None:
        return ink, None
    r0, c0, side, _n = found
    payload = decode_sqr(ink, found)
    out = ink.copy()
    q = 2 * MODULE  # clear generously: eroded frames under-measure side
    out[max(0, r0 - q) : r0 + side + q, max(0, c0 - q) : c0 + side + q] = False
    return out, payload
