"""Multimodal column stages: typed binary payloads + actor-pool plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages. The SYNR
raster path (stages/ocr/) is the fully-real image leg; the stages here
cover the remaining modalities. Real codecs (JPEG/PNG/ffmpeg) are NOT
available in this sandbox, so decode is stubbed exactly as the charter
prescribes: a clearly-marked deterministic fake behind the same batch
signature, with all Ray-side plumbing (schema, batch sizing, actor
state, output layout) real and tested. Swapping in a real codec touches
ONLY the ``_decode_*`` functions.

Deterministic fake formats:
- audio: ``"SYNA <sample_rate> <n>\\n"`` header + n float32 samples
- video: ``"SYNV <w> <h> <n_frames>\\n"`` + n_frames SYNR-style planes
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AUDIO_MAGIC = b"SYNA"
VIDEO_MAGIC = b"SYNV"

AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("duration_s", pa.float64()),
        ("rms", pa.float64()),
        ("zero_crossings", pa.int64()),
        ("status", pa.string()),  # "ok" | "erro"
    ]
)

FRAME_SAMPLE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("frame_index", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("frame", pa.binary()),  # SYNR payload per sampled frame
        ("status", pa.string()),
    ]
)


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    s = samples.astype(np.float32)
    return b"SYNA %d %d\n" % (sample_rate, len(s)) + s.tobytes()


def _decode_audio(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """STUB decode (deterministic fake format). Real impl: soundfile/ffmpeg."""
    if not payload or not bytes(payload).startswith(AUDIO_MAGIC):
        return None
    payload = bytes(payload)
    nl = payload.find(b"\n")
    try:
        _, rate_s, n_s = payload[:nl].split()
        rate, n = int(rate_s), int(n_s)
    except (ValueError, IndexError):
        return None
    body = payload[nl + 1 :]
    if n < 0 or len(body) != 4 * n or rate <= 0:
        return None
    return rate, np.frombuffer(body, dtype=np.float32)


def encode_video(frames: np.ndarray) -> bytes:
    """(n, h, w) uint8 -> SYNV payload."""
    n, h, w = frames.shape
    return b"SYNV %d %d %d\n" % (w, h, n) + frames.tobytes()


def _decode_video(payload: bytes | None) -> np.ndarray | None:
    """STUB decode (deterministic fake format). Real impl: ffmpeg."""
    if not payload or not bytes(payload).startswith(VIDEO_MAGIC):
        return None
    payload = bytes(payload)
    nl = payload.find(b"\n")
    try:
        _, w_s, h_s, n_s = payload[:nl].split()
        w, h, n = int(w_s), int(h_s), int(n_s)
    except (ValueError, IndexError):
        return None
    body = payload[nl + 1 :]
    if min(w, h, n) <= 0 or len(body) != w * h * n:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w)


class AudioFeatureStage:
    """Actor stage: audio payload -> scalar features.

    ``__init__`` is where a real model (VAD, whisper encoder, ...) would
    load once per actor; the stub keeps the signature and the error-
    record semantics (bad payload -> status="erro" row, never a raise).
    """

    def __init__(self) -> None:
        self.ready = True  # placeholder for warm model state

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in AUDIO_FEATURE_SCHEMA.names}
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("bytes").to_pylist()
        ):
            decoded = _decode_audio(payload)
            rows["media_ref"].append(ref)
            if decoded is None:
                for k in ("sample_rate", "n_samples", "zero_crossings"):
                    rows[k].append(0)
                rows["duration_s"].append(0.0)
                rows["rms"].append(0.0)
                rows["status"].append("erro")
                continue
            rate, s = decoded
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(s))
            rows["duration_s"].append(len(s) / rate)
            rows["rms"].append(float(np.sqrt(np.mean(s * s))) if len(s) else 0.0)
            rows["zero_crossings"].append(int(np.count_nonzero(np.diff(np.signbit(s)))))
            rows["status"].append("ok")
        return pa.Table.from_pydict(rows, schema=AUDIO_FEATURE_SCHEMA)


class FrameSampleStage:
    """Actor stage: video payload -> every k-th frame as SYNR images.

    Output frames feed the OCR stage (video-OCR composition) or any
    image featurizer; batch sizes must stay small because rows are fat
    (decoded planes), which is exactly what the schema metadata is for.
    """

    def __init__(self, every_k: int = 4, max_frames: int = 8) -> None:
        self.every_k = every_k
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ocr import raster

        rows = {k: [] for k in FRAME_SAMPLE_SCHEMA.names}
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("bytes").to_pylist()
        ):
            frames = _decode_video(payload)
            if frames is None:
                rows["media_ref"].append(ref)
                rows["frame_index"].append(-1)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["frame"].append(b"")
                rows["status"].append("erro")
                continue
            picked = list(range(0, len(frames), self.every_k))[: self.max_frames]
            for fi in picked:
                rows["media_ref"].append(ref)
                rows["frame_index"].append(fi)
                rows["height"].append(frames.shape[1])
                rows["width"].append(frames.shape[2])
                rows["frame"].append(raster.encode(frames[fi]))
                rows["status"].append("ok")
        return pa.Table.from_pydict(rows, schema=FRAME_SAMPLE_SCHEMA)


def resize_gray(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (numpy, no image libs) for image stages."""
    h, w = img.shape
    rr = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    cc = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return img[rr][:, cc]


IMAGE_FEATURE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("ink_ratio", pa.float64()),
        ("n_rows_with_ink", pa.int64()),
        ("status", pa.string()),
    ]
)


class ImageFeatureStage:
    """Actor stage: raster payload -> image features (size, ink density).

    The IMAGE leg is fully real in-sandbox — decode is the SYNR raster
    codec + Otsu binarization of the actual OCR path, not a stub.
    Same actor-pool contract: warm state in ``__init__``, error records
    for undecodable payloads, never a raise.
    """

    def __init__(self):
        from .ocr import preprocess, raster

        self._decode = raster.decode
        self._binarize = preprocess.binarize

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        rows = {k: [] for k in IMAGE_FEATURE_SCHEMA.names}
        for ref, payload in zip(refs, batch.column("bytes").to_pylist()):
            img = self._decode(payload)
            if img is None:
                rows["media_ref"].append(ref)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["ink_ratio"].append(0.0)
                rows["n_rows_with_ink"].append(0)
                rows["status"].append("erro")
                continue
            ink = self._binarize(img)
            rows["media_ref"].append(ref)
            rows["height"].append(int(ink.shape[0]))
            rows["width"].append(int(ink.shape[1]))
            rows["ink_ratio"].append(round(float(ink.mean()), 6))
            rows["n_rows_with_ink"].append(int((ink.any(axis=1)).sum()))
            rows["status"].append("ok")
        return pa.table(
            {
                name: pa.array(rows[name], IMAGE_FEATURE_SCHEMA.field(name).type)
                for name in IMAGE_FEATURE_SCHEMA.names
            }
        )


KEYFRAME_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("frame_index", pa.int32()),
        ("change", pa.float64()),  # mean |diff| vs previous keyframe
        ("frame", pa.binary()),
        ("status", pa.string()),
    ]
)


class KeyframeStage:
    """Actor stage: video payload -> scene-change keyframes.

    REAL algorithm (decode is the synthetic codec, the detection is
    not): frame 0 is always a keyframe; a later frame becomes one when
    its mean absolute pixel difference vs the PREVIOUS KEYFRAME exceeds
    ``threshold`` (classic cumulative scene-change detection — an
    every-k sampler re-OCRs near-identical frames; this emits one frame
    per visual change). Deterministic; exact keyframe indices are
    pinned by unit tests on constructed scene-change videos.
    """

    def __init__(self, threshold: float = 8.0, max_frames: int = 16) -> None:
        self.threshold = threshold
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ocr import raster

        rows = {k: [] for k in KEYFRAME_SCHEMA.names}
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("bytes").to_pylist()
        ):
            frames = _decode_video(payload)
            if frames is None:
                rows["media_ref"].append(ref)
                rows["frame_index"].append(-1)
                rows["change"].append(0.0)
                rows["frame"].append(b"")
                rows["status"].append("erro")
                continue
            prev = None
            n_emitted = 0
            for fi in range(len(frames)):
                f = frames[fi].astype(np.float64)
                change = 255.0 if prev is None else float(np.abs(f - prev).mean())
                if prev is None or change >= self.threshold:
                    rows["media_ref"].append(ref)
                    rows["frame_index"].append(fi)
                    rows["change"].append(round(change, 6))
                    rows["frame"].append(raster.encode(frames[fi]))
                    rows["status"].append("ok")
                    prev = f
                    n_emitted += 1
                    if n_emitted >= self.max_frames:
                        break
        return pa.Table.from_pydict(rows, schema=KEYFRAME_SCHEMA)


AUDIO_SEGMENT_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("seg_idx", pa.int32()),
        ("start_s", pa.float64()),
        ("end_s", pa.float64()),
        ("rms", pa.float64()),
        ("status", pa.string()),
    ]
)


class AudioSegmentStage:
    """Actor stage: audio payload -> voiced segments (silence split).

    REAL DSP (decode is the synthetic codec, the segmentation is not):
    RMS over fixed ``window_s`` windows; a segment is a maximal run of
    windows with rms >= ``threshold`` — the classic energy-VAD shape a
    speech pipeline runs before transcription. Vectorized (reshape +
    per-window RMS + run-length extraction); deterministic.
    """

    def __init__(self, window_s: float = 0.05, threshold: float = 0.1) -> None:
        self.window_s = window_s
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in AUDIO_SEGMENT_SCHEMA.names}
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("bytes").to_pylist()
        ):
            decoded = _decode_audio(payload)
            if decoded is None:
                rows["media_ref"].append(ref)
                rows["seg_idx"].append(-1)
                rows["start_s"].append(0.0)
                rows["end_s"].append(0.0)
                rows["rms"].append(0.0)
                rows["status"].append("erro")
                continue
            rate, s = decoded
            win = max(1, int(rate * self.window_s))
            n_win = len(s) // win
            if n_win == 0:
                continue
            w = s[: n_win * win].reshape(n_win, win).astype(np.float64)
            rms = np.sqrt((w * w).mean(axis=1))
            voiced = rms >= self.threshold
            # run-length extraction of voiced windows
            change = np.flatnonzero(np.diff(voiced.astype(np.int8)))
            bounds = np.concatenate(([0], change + 1, [n_win]))
            seg = 0
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                if not voiced[b0]:
                    continue
                rows["media_ref"].append(ref)
                rows["seg_idx"].append(seg)
                rows["start_s"].append(round(b0 * win / rate, 6))
                rows["end_s"].append(round(b1 * win / rate, 6))
                rows["rms"].append(round(float(rms[b0:b1].mean()), 6))
                rows["status"].append("ok")
                seg += 1
        return pa.Table.from_pydict(rows, schema=AUDIO_SEGMENT_SCHEMA)


THUMBNAIL_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("thumb", pa.binary()),  # SYNR payload, resized
        ("status", pa.string()),
    ]
)


class ThumbnailStage:
    """Actor stage: raster payload -> fixed-size thumbnail (SYNR).

    The RESIZE verb of the multimodal charter, fully real in-sandbox:
    SYNR decode + nearest-neighbor ``resize_gray`` + SYNR re-encode.
    Width/height report the ORIGINAL dimensions (the thumbnail's are the
    configured ones); undecodable payloads become error records.
    """

    def __init__(self, thumb_h: int = 32, thumb_w: int = 48) -> None:
        from .ocr import raster

        self.h, self.w = thumb_h, thumb_w
        self._decode = raster.decode
        self._encode = raster.encode

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in THUMBNAIL_SCHEMA.names}
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("bytes").to_pylist()
        ):
            img = self._decode(payload)
            rows["media_ref"].append(ref)
            if img is None:
                rows["width"].append(0)
                rows["height"].append(0)
                rows["thumb"].append(b"")
                rows["status"].append("erro")
                continue
            rows["height"].append(int(img.shape[0]))
            rows["width"].append(int(img.shape[1]))
            rows["thumb"].append(self._encode(resize_gray(img, self.h, self.w)))
            rows["status"].append("ok")
        return pa.Table.from_pydict(rows, schema=THUMBNAIL_SCHEMA)
