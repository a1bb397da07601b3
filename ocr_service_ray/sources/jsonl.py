"""JSONL ingest: interleaved span documents from line-delimited JSON.

The reference accepts documents one HTTP request at a time
(/root/reference/app/main.py:108-143); batch users arrive with files.
This source reads JSONL of the form

    {"doc_id": "...", "spans": [{"kind": "text", "text": "...",
                                 "media_ref": "", "offset": 0}, ...]}

through ``ray.data.read_json`` and lands it in the engine's partitioned
storage layout (DOC_SCHEMA), ready for ``run_pipeline``. Missing span
fields get schema defaults; malformed rows become ``erro``-span docs
rather than failures (the engine's error-record discipline).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..core import storage
from ..core.schema import DOC_SCHEMA, SPAN_STRUCT


def _norm_span(s: dict) -> dict:
    return {
        "kind": str(s.get("kind", "erro")),
        "text": str(s.get("text", "") or ""),
        "media_ref": str(s.get("media_ref", "") or ""),
        "offset": int(s.get("offset", 0)),
    }


def rows_to_doc_table(rows: list[dict]) -> pa.Table:
    """Python dict rows -> DOC_SCHEMA table (malformed -> erro span)."""
    doc_ids: list[str] = []
    spans: list[list[dict]] = []
    for r in rows:
        try:
            did = str(r["doc_id"])
            sp = [_norm_span(s) for s in (r.get("spans") or [])]
        except (KeyError, TypeError, AttributeError):
            did = str(r.get("doc_id", f"bad-{len(doc_ids)}"))
            sp = [{"kind": "erro", "text": "", "media_ref": "", "offset": 0}]
        doc_ids.append(did)
        spans.append(sp)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
        }
    ).cast(DOC_SCHEMA)


def ingest_jsonl(
    src_path: str, docs_root: str, n_parts: int = 4, append: bool = False
) -> dict:
    """Distributed JSONL read -> partitioned doc storage (one data file +
    manifest per partition, the pipeline's resume unit).

    Partition assignment is a deterministic hash of doc_id so re-ingest
    is idempotent and independent of read parallelism. The target root
    is CLEARED first: a prior ingest with a different (source, n_parts)
    would otherwise leave stale committed partitions whose docs get
    silently duplicated into the new layout (same hazard run_pipeline
    guards against with clear_all_parts on resume=False).

    ``append=True`` is the INCREMENTAL-BATCH mode: the new drop lands as
    fresh partition ids after the existing ones (nothing cleared, nothing
    overwritten), so a follow-up ``run_pipeline(..., resume=True)``
    processes ONLY the new partitions — daily drops ride the existing
    checkpoint machinery with no special-case code.
    """
    import hashlib

    import ray
    import ray.data

    if append:
        existing = storage.list_parts(docs_root)
        offset = (max(existing) + 1) if existing else 0
    else:
        storage.clear_all_parts(docs_root)
        offset = 0
    ds = ray.data.read_json(src_path)

    def to_part_rows(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        t = rows_to_doc_table(rows)
        parts = [
            offset
            + int.from_bytes(
                hashlib.md5(d.encode("utf-8")).digest()[:4], "big"
            ) % n_parts
            for d in t.column("doc_id").to_pylist()
        ]
        return t.append_column("part_id", pa.array(parts, pa.int32()))

    tagged = ds.map_batches(to_part_rows, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("part_id")[0].as_py())
        out = group.drop_columns(["part_id"]).sort_by([("doc_id", "ascending")])
        storage.write_part(docs_root, part, out)
        storage.commit_manifest(
            docs_root, part, {"part_id": part, "n_docs": len(out), "source": src_path}
        )
        return pa.table({"part_id": pa.array([part], pa.int32()),
                         "n_docs": pa.array([len(out)], pa.int64())})

    rows = (
        tagged.groupby("part_id")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    return {
        "docs_root": docs_root,
        "n_parts": len(rows),
        "n_docs": int(sum(r["n_docs"] for r in rows)),
    }


@ray.remote
def _export_part(root: str, part: int, dest_dir: str) -> int:
    import json
    import os

    t = storage.read_part(root, part)
    os.makedirs(dest_dir, exist_ok=True)
    tmp = os.path.join(dest_dir, f".part-{part:05d}.jsonl.tmp")
    final = os.path.join(dest_dir, f"part-{part:05d}.jsonl")
    with open(tmp, "w") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row, ensure_ascii=False, default=str) + "\n")
    os.replace(tmp, final)
    return len(t)


def export_jsonl(root: str, dest_dir: str) -> dict:
    """Partitioned-storage docs -> one JSONL file per partition.

    Sink parity with the ingest side: one file per partition (the
    resume unit), atomic tmp+rename per file, parallel via one Ray task
    per partition. Re-export overwrites idempotently.
    """
    parts = storage.list_parts(root)
    counts = ray.get([_export_part.remote(root, p, dest_dir) for p in parts])
    return {"dest": dest_dir, "n_parts": len(parts), "n_docs": int(sum(counts))}



def ingest_text_csv(src_path: str, docs_root: str, n_parts: int = 4) -> dict:
    """CSV of (doc_id, text) -> single-text-span docs in the partitioned
    layout — the text-only on-ramp (CSV cannot carry nested spans; rows
    become one ``text`` span at offset 0). Same deterministic hash
    partitioning (and same clear-target-first stale-partition guard) as
    the JSONL path."""
    import hashlib

    import ray
    import ray.data

    storage.clear_all_parts(docs_root)
    ds = ray.data.read_csv(src_path)

    def to_part_rows(batch: pa.Table) -> pa.Table:
        rows = [
            {"doc_id": str(d),
             "spans": [{"kind": "text", "text": str(t or ""), "offset": 0}]}
            for d, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            )
        ]
        t = rows_to_doc_table(rows)
        parts = [
            int.from_bytes(hashlib.md5(d.encode("utf-8")).digest()[:4], "big") % n_parts
            for d in t.column("doc_id").to_pylist()
        ]
        return t.append_column("part_id", pa.array(parts, pa.int32()))

    tagged = ds.map_batches(to_part_rows, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("part_id")[0].as_py())
        out = group.drop_columns(["part_id"]).sort_by([("doc_id", "ascending")])
        storage.write_part(docs_root, part, out)
        storage.commit_manifest(
            docs_root, part, {"part_id": part, "n_docs": len(out), "source": src_path}
        )
        return pa.table({"part_id": pa.array([part], pa.int32()),
                         "n_docs": pa.array([len(out)], pa.int64())})

    rows = (
        tagged.groupby("part_id")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    return {
        "docs_root": docs_root,
        "n_parts": len(rows),
        "n_docs": int(sum(r["n_docs"] for r in rows)),
    }
