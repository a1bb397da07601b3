"""SYNR raster codec: the synthetic image format of the media spans.

Format (FIXTURES.md §3): ASCII header ``SYNR <width> <height>\\n`` then
``width*height`` uint8 grayscale pixels, row-major. Replaces JPEG/PNG
because cv2/PIL are unavailable in-sandbox; plays the role of
``cv2.imdecode`` in the reference (/root/reference/app/ocr_engine.py:357-362):
garbage input decodes to ``None`` (never raises), which downstream turns
into an error RECORD, not a task failure (app/main.py:132-143 semantics).
"""

from __future__ import annotations

import numpy as np

MAGIC = b"SYNR"


def encode(img: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale array -> SYNR payload bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("SYNR encodes 2-D uint8 arrays")
    h, w = img.shape
    return b"SYNR %d %d\n" % (w, h) + img.tobytes()


def decode(payload: bytes | None) -> np.ndarray | None:
    """SYNR payload -> uint8 (h, w) array; ``None`` on any malformation."""
    if not payload or not isinstance(payload, (bytes, bytearray, memoryview)):
        return None
    payload = bytes(payload)
    if not payload.startswith(MAGIC):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    try:
        parts = payload[:nl].split()
        if len(parts) != 3:
            return None
        w, h = int(parts[1]), int(parts[2])
    except (ValueError, IndexError):
        return None
    if w <= 0 or h <= 0 or w * h > 64 * 1024 * 1024:
        return None
    body = payload[nl + 1 :]
    if len(body) != w * h:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w)
