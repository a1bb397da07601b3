"""Arrow schemas for the interleaved-span document model.

The input shape is mandated by BASELINE.json ``input_hint``: a table of
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
The reference service (brcassiano/ocr-service) passes untyped dicts around
(``/root/reference/app/models.py:5-27``); we pin a fixed Arrow schema end
to end so batches stay zero-copy through the whole pipeline.
"""

from __future__ import annotations

import pyarrow as pa

# Span kinds understood by the pipeline.
KIND_TEXT = "text"
KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_MEDIA = "media"
KIND_ERROR = "erro"  # error-record semantics: reference app/main.py:132-143

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# Input document table (the north-rule shape).
DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Output document table: input shape + the reference's doc-level response
# fields (tipo_documento/confianca/mensagem, app/models.py:21-27) computed
# at reassembly.
DOC_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("tipo_documento", pa.string()),
        ("confianca", pa.float64()),
        ("mensagem", pa.string()),
    ]
)

# Sidecar media blob table (media_ref -> raster payload).
# qr_payload is generator ground truth: the SQR code's URL ("" if none).
BLOB_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("bytes", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("qr_payload", pa.string()),
    ]
)

# Flat (exploded) span rows — the pipeline's working shape between the
# explode stage and the reassembly groupby.
FLAT_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_id", pa.int32()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("cost", pa.int64()),  # estimated extraction cost (for skew repartition)
    ]
)

# OCR token rows (intermediate, inside the OCR stage). Mirrors the
# reference's raw-line record (/root/reference/app/models.py:5-9).
TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("text", pa.string()),
        ("confidence", pa.float64()),
        ("x_position", pa.int32()),
        ("y_position", pa.int32()),
    ]
)

# Structured item rows — the reference's ``Item`` model
# (/root/reference/app/models.py:12-18), column-ized.
ITEM_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sq", pa.string()),
        ("item", pa.string()),
        ("quantidade", pa.float64()),
        ("valor_unitario", pa.float64()),
        ("valor_total", pa.float64()),
        ("data_compra", pa.string()),
        ("data_venda", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
