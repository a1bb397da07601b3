"""PDF layout parsing: recursive XY-cut reading order.

The north rule asks for "pdfminer-style XY-cut block ordering" — a
capability the reference lacks entirely (it only OCRs camera images).
Our ``pdf`` spans carry pseudo-positional text: one record per token,
``x y w h :: text`` per line (the shape a real pdfminer pass would
produce; real PDF decoding is out of scope in this sandbox — the layout
algorithm is the deliverable).

Algorithm (classic recursive XY-cut):
1. project token boxes on x; if a vertical whitespace valley of width
   >= ``min_gap_x`` exists, split on the WIDEST such valley and recurse
   left then right (column order);
2. else project on y; split on y-valleys >= ``min_gap_y`` into bands,
   recurse top-down;
3. terminal region: tokens sorted by (y, x), grouped into lines on y
   proximity, words joined by single spaces, lines by newlines.

Deterministic, pure-python over small per-span token lists; runs inside
a stateless ``map_batches`` stage.
"""

from __future__ import annotations

from typing import NamedTuple


class Box(NamedTuple):
    x: int
    y: int
    w: int
    h: int
    text: str


def parse_pdf_records(payload: str) -> list[Box]:
    """``x y w h :: text`` lines -> boxes; malformed lines are skipped."""
    boxes: list[Box] = []
    for line in (payload or "").splitlines():
        if " :: " not in line:
            continue
        head, _, text = line.partition(" :: ")
        parts = head.split()
        if len(parts) != 4:
            continue
        try:
            x, y, w, h = (int(p) for p in parts)
        except ValueError:
            continue
        boxes.append(Box(x, y, w, h, text))
    return boxes


def _valleys(intervals: list[tuple[int, int]], min_gap: int) -> list[tuple[int, int]]:
    """(gap_width, cut_position) for zero-occupancy valleys >= min_gap."""
    ivals = sorted(intervals)
    out = []
    cur_end = ivals[0][1]
    for a, b in ivals[1:]:
        if a > cur_end:
            if a - cur_end >= min_gap:
                out.append((a - cur_end, (a + cur_end) // 2))
            cur_end = b
        else:
            cur_end = max(cur_end, b)
    return out


def xy_cut(
    boxes: list[Box], min_gap_x: int = 40, min_gap_y: int = 18
) -> list[list[Box]]:
    """Recursive XY-cut -> terminal regions in reading order."""
    if not boxes:
        return []
    vx = _valleys([(b.x, b.x + b.w) for b in boxes], min_gap_x)
    if vx:
        cut = max(vx)[1]  # widest vertical valley -> column split
        left = [b for b in boxes if b.x + b.w <= cut]
        right = [b for b in boxes if b.x + b.w > cut]
        if left and right:
            return xy_cut(left, min_gap_x, min_gap_y) + xy_cut(right, min_gap_x, min_gap_y)
    vy = _valleys([(b.y, b.y + b.h) for b in boxes], min_gap_y)
    if vy:
        # split into ALL bands top-down in one pass (avoids deep recursion)
        cuts = sorted(c for _w, c in vy)
        bands: list[list[Box]] = [[] for _ in range(len(cuts) + 1)]
        for b in boxes:
            i = sum(1 for c in cuts if b.y >= c)
            bands[i].append(b)
        out: list[list[Box]] = []
        for band in bands:
            if band:
                out.extend(xy_cut(band, min_gap_x, min_gap_y))
        return out
    return [boxes]


def region_text(region: list[Box], line_tol: int = 6) -> list[str]:
    """Terminal region -> lines of x-ordered tokens (y-proximity grouping)."""
    lines: list[str] = []
    cur: list[Box] = []
    cur_y = None
    for b in sorted(region, key=lambda b: (b.y, b.x)):
        if cur_y is None or abs(b.y - cur_y) <= line_tol:
            cur.append(b)
            cur_y = b.y if cur_y is None else cur_y
        else:
            lines.append(" ".join(t.text for t in sorted(cur, key=lambda t: t.x)))
            cur = [b]
            cur_y = b.y
    if cur:
        lines.append(" ".join(t.text for t in sorted(cur, key=lambda t: t.x)))
    return lines


def extract_pdf_text(payload: str) -> str:
    """pdf span payload -> reading-order text (lines joined by newlines)."""
    boxes = parse_pdf_records(payload)
    if not boxes:
        return ""
    out: list[str] = []
    for region in xy_cut(boxes):
        out.extend(region_text(region))
    return "\n".join(out)
