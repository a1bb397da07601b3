"""JSONL ingest source: schema mapping, idempotent partitioning, e2e."""

from __future__ import annotations

import json

import pytest

from ocr_service_ray.core import storage
from ocr_service_ray.core.schema import DOC_SCHEMA
from ocr_service_ray.sources.jsonl import ingest_jsonl, rows_to_doc_table


class TestRowsToDocTable:
    def test_normalizes_missing_fields(self):
        t = rows_to_doc_table(
            [
                {"doc_id": "a", "spans": [{"kind": "text", "text": "hi"}]},
                {"doc_id": "b", "spans": None},
                {"doc_id": "c", "spans": "not-a-list"},
            ]
        )
        assert t.schema.equals(DOC_SCHEMA)
        rows = t.to_pylist()
        assert rows[0]["spans"][0] == {
            "kind": "text", "text": "hi", "media_ref": "", "offset": 0
        }
        assert rows[1]["spans"] == []
        assert rows[2]["spans"][0]["kind"] == "erro"


@pytest.mark.usefixtures("ray_session")
class TestIngest:
    def test_reingest_smaller_nparts_leaves_no_stale_parts(self, tmp_path):
        """Re-ingesting into a root that holds a prior wider layout must
        clear it first — stale committed partitions would silently
        duplicate docs into the pipeline input."""
        src = tmp_path / "d.jsonl"
        with open(src, "w") as f:
            for i in range(30):
                f.write(json.dumps({
                    "doc_id": f"s-{i:03d}",
                    "spans": [{"kind": "text", "text": f"t {i}", "offset": 0}],
                }) + "\n")
        root = str(tmp_path / "docs")
        ingest_jsonl(str(src), root, n_parts=6)
        assert len(storage.list_parts(root)) == 6
        info = ingest_jsonl(str(src), root, n_parts=2)
        assert set(storage.list_parts(root)) == {0, 1}
        # total docs across parts == source docs, no duplication
        n = sum(len(storage.read_part(root, p)) for p in storage.list_parts(root))
        assert n == 30 == info["n_docs"]

    def test_incremental_append_ingest_rides_resume(self, tmp_path):
        """Daily-drop shape: a second JSONL drop appended as NEW
        partitions makes resume process only those — committed ones are
        skipped, and the final output holds both drops."""
        from ocr_service_ray.pipeline.run import run_pipeline

        def write_src(path, prefix, n):
            with open(path, "w") as f:
                for i in range(n):
                    f.write(json.dumps({
                        "doc_id": f"{prefix}-{i:03d}",
                        "spans": [{"kind": "text", "text": f"{prefix} {i}", "offset": 0}],
                    }) + "\n")

        root, out = str(tmp_path / "docs"), str(tmp_path / "out")
        src1, src2 = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
        write_src(src1, "day1", 20)
        write_src(src2, "day2", 15)
        ingest_jsonl(str(src1), root, n_parts=3)
        s1 = run_pipeline(root, str(tmp_path / "noblobs"), out)
        assert s1["processed"] == 3
        ingest_jsonl(str(src2), root, n_parts=3, append=True)
        assert set(storage.list_parts(root)) == {0, 1, 2, 3, 4, 5}
        s2 = run_pipeline(root, str(tmp_path / "noblobs"), out)
        assert s2["skipped_committed"] == 3
        assert s2["processed"] == 3
        got = set()
        for p in storage.list_parts(out):
            got |= {r["doc_id"] for r in storage.read_part(out, p).to_pylist()}
        assert got == {f"day1-{i:03d}" for i in range(20)} | {
            f"day2-{i:03d}" for i in range(15)
        }

    def test_jsonl_roundtrip_through_pipeline(self, tmp_path):
        src = tmp_path / "docs.jsonl"
        with open(src, "w") as f:
            for i in range(40):
                f.write(json.dumps({
                    "doc_id": f"j-{i:03d}",
                    "spans": [
                        {"kind": "text", "text": f"hello   doc {i}", "offset": 0},
                        {"kind": "text", "text": "2×3", "offset": 1},
                    ],
                }) + "\n")
        docs_root = str(tmp_path / "docs")
        info = ingest_jsonl(str(src), docs_root, n_parts=3)
        assert info["n_docs"] == 40
        assert set(storage.list_parts(docs_root)) <= {0, 1, 2}
        # ingest is idempotent: re-run produces identical partitions
        got_before = {p: storage.read_part(docs_root, p) for p in storage.list_parts(docs_root)}
        ingest_jsonl(str(src), docs_root, n_parts=3)
        for p, tbl in got_before.items():
            assert storage.read_part(docs_root, p).equals(tbl)
        # and the pipeline runs over the ingested layout
        from ocr_service_ray.pipeline.run import run_pipeline

        out = str(tmp_path / "out")
        run_pipeline(docs_root, str(tmp_path / "noblobs"), out)
        flat = [
            s
            for p in storage.list_parts(out)
            for r in storage.read_part(out, p).to_pylist()
            for s in r["spans"]
        ]
        assert len(flat) == 80
        # normalization applied: whitespace collapsed, × -> X
        texts = {s["text"] for s in flat}
        assert "2X3" in texts
        assert any(t.startswith("hello doc") for t in texts)


@pytest.mark.usefixtures("ray_session")
class TestExport:
    def test_jsonl_export_roundtrip(self, tmp_path):
        import pyarrow as pa

        from ocr_service_ray.sources.jsonl import export_jsonl

        docs_root = str(tmp_path / "docs")
        tbl = pa.table({
            "doc_id": pa.array(["a", "b"]),
            "spans": pa.array(
                [[{"kind": "text", "text": "olá", "media_ref": "", "offset": 0}],
                 [{"kind": "media", "text": "", "media_ref": "m-1", "offset": 0}]],
                DOC_SCHEMA.field("spans").type),
        })
        storage.write_part(docs_root, 0, tbl)
        dest = str(tmp_path / "exported")
        info = export_jsonl(docs_root, dest)
        assert info == {"dest": dest, "n_parts": 1, "n_docs": 2}
        # ingest the export -> identical doc table
        back_root = str(tmp_path / "back")
        ingest_jsonl(f"{dest}/part-00000.jsonl", back_root, n_parts=1)
        got = pa.concat_tables(
            storage.read_part(back_root, p) for p in storage.list_parts(back_root)
        ).sort_by([("doc_id", "ascending")])
        assert got.equals(tbl)


@pytest.mark.usefixtures("ray_session")
class TestCsvIngest:
    def test_csv_text_docs_through_pipeline(self, tmp_path):
        import csv

        from ocr_service_ray.sources.jsonl import ingest_text_csv

        src = tmp_path / "docs.csv"
        with open(src, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["doc_id", "text"])
            for i in range(20):
                w.writerow([f"c-{i:03d}", f"csv  doc {i} ×"])
        docs_root = str(tmp_path / "docs")
        info = ingest_text_csv(str(src), docs_root, n_parts=2)
        assert info["n_docs"] == 20
        from ocr_service_ray.pipeline.run import run_pipeline

        out = str(tmp_path / "out")
        run_pipeline(docs_root, str(tmp_path / "noblobs"), out)
        texts = [
            s["text"]
            for p in storage.list_parts(out)
            for r in storage.read_part(out, p).to_pylist()
            for s in r["spans"]
        ]
        assert len(texts) == 20
        assert all(t.startswith("csv doc") and t.endswith("X") for t in texts)
