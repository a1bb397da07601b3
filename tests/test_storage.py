"""Storage adapter: partition layout, manifests, resume primitives."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from ocr_service_ray.core import storage


def _tbl():
    return pa.table({"a": [1, 2, 3]})


class TestPartitionLayout:
    def test_write_read_roundtrip(self, tmp_path):
        root = str(tmp_path)
        storage.write_part(root, 3, _tbl())
        assert storage.read_part(root, 3).equals(_tbl())
        assert storage.list_parts(root) == [3]

    def test_commit_and_resume_sets(self, tmp_path):
        root = str(tmp_path)
        storage.write_part(root, 0, _tbl())
        storage.write_part(root, 1, _tbl())
        storage.commit_manifest(root, 0, {"n": 3})
        assert storage.committed_parts(root) == [0]
        removed = storage.clear_uncommitted(root)
        assert removed == [1]
        assert storage.list_parts(root) == [0]
        assert storage.read_manifest(root, 0)["n"] == 3

    def test_manifest_atomic_no_tmp_left(self, tmp_path):
        root = str(tmp_path)
        storage.commit_manifest(root, 7, {"x": 1})
        files = os.listdir(storage.part_dir(root, 7))
        assert files == ["manifest.json"]

    def test_data_files_selects_parts(self, tmp_path):
        root = str(tmp_path)
        for p in (0, 2, 5):
            storage.write_part(root, p, _tbl())
        assert len(storage.data_files(root)) == 3
        assert storage.data_files(root, [2]) == [storage.data_path(root, 2)]


class TestFreshRunCleanup:
    def test_clear_all_parts_removes_committed(self, tmp_path):
        root = str(tmp_path)
        storage.write_part(root, 0, _tbl())
        storage.commit_manifest(root, 0, {"n": 3})
        storage.write_part(root, 5, _tbl())
        removed = storage.clear_all_parts(root)
        assert removed == [0, 5]
        assert storage.list_parts(root) == []

    def test_clear_uncommitted_handles_dir_entries(self, tmp_path):
        # lance datasets are DIRECTORIES named data.lance; cleanup must
        # remove them too, not just flat files
        root = str(tmp_path)
        d = os.path.join(root, "part=2", "data.lance")
        os.makedirs(os.path.join(d, "data"))
        with open(os.path.join(d, "data", "frag.bin"), "w") as f:
            f.write("x")
        assert storage.clear_uncommitted(root) == [2]
        assert storage.list_parts(root) == []


class TestLanceLeg:
    """The lance branch is dormant in-sandbox (no ``lance`` package);
    these tests pin its logic with a fake module so regressions there
    don't ship untested (VERDICT r2 item 6 / ADVICE storage.py:173)."""

    class _FakeLance:
        def __init__(self):
            self.writes = []
            self.reads = []
            self._tables = {}

        def write_dataset(self, table, path, mode=None):
            self.writes.append({"path": path, "mode": mode, "rows": len(table)})
            self._tables[path] = table

        def dataset(self, path):
            self.reads.append(path)
            tables = self._tables

            class _DS:
                def to_table(self, columns=None):
                    t = tables[path]
                    return t.select(columns) if columns else t

            return _DS()

    def _enable(self, monkeypatch):
        fake = self._FakeLance()
        monkeypatch.setattr(storage, "HAVE_LANCE", True)
        monkeypatch.setattr(storage, "lance", fake, raising=False)
        return fake

    def test_write_read_roundtrip_via_fake_lance(self, tmp_path, monkeypatch):
        fake = self._enable(monkeypatch)
        root = str(tmp_path)
        storage.write_part(root, 3, _tbl())
        assert fake.writes == [
            {"path": storage.data_path(root, 3), "mode": "overwrite", "rows": 3}
        ]
        assert storage.data_path(root, 3).endswith("data.lance")
        got = storage.read_part(root, 3, columns=["a"])
        assert got.equals(_tbl())
        assert fake.reads == [storage.data_path(root, 3)]

    def test_ray_read_lance_stamps_paths_prunes_columns_and_unions(
        self, tmp_path, monkeypatch, ray_session
    ):
        import ray.data as rd

        self._enable(monkeypatch)
        calls = []
        tables = {
            "part=0/data.lance": pa.table({"a": [1, 2], "b": ["x", "y"]}),
            "part=1/data.lance": pa.table({"a": [3], "b": ["z"]}),
        }

        def fake_read_lance(uri, *, columns=None, override_num_blocks=None, **kw):
            calls.append({"uri": uri, "columns": columns,
                          "override_num_blocks": override_num_blocks})
            t = tables[uri]
            return rd.from_arrow(t.select(columns) if columns else t)

        monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
        ds = storage.ray_read(
            list(tables), include_paths=True, columns=["a"], override_num_blocks=8
        )
        out = ds.to_pandas().sort_values("a").reset_index(drop=True)
        # columns kwarg must reach read_lance (pruned read, not dropped)
        assert [c["columns"] for c in calls] == [["a"], ["a"]]
        assert [c["override_num_blocks"] for c in calls] == [4, 4]
        # both URIs unioned; path column stamped per source URI
        assert out["a"].tolist() == [1, 2, 3]
        assert out["path"].tolist() == [
            "part=0/data.lance", "part=0/data.lance", "part=1/data.lance"
        ]
        assert "b" not in out.columns


class TestCompaction:
    def _make_parts(self, root, sizes):
        for p, n in enumerate(sizes):
            t = pa.table({"doc_id": [f"d{p}-{i}" for i in range(n)],
                          "v": list(range(n))})
            storage.write_part(root, p, t)
            storage.commit_manifest(root, p, {"part_id": p, "n_docs": n})

    def test_compact_merges_contiguous_and_preserves_rows(self, tmp_path, ray_session):
        from ocr_service_ray.pipeline.compact import compact_parts, plan_bins

        root, out = str(tmp_path / "in"), str(tmp_path / "out")
        self._make_parts(root, [30, 30, 30, 90, 10, 10, 10])
        # greedy fill to <= target: [30+30+30], [90+10 = exactly 100], [10+10]
        assert plan_bins(root, 100) == [[0, 1, 2], [3, 4], [5, 6]]
        m = compact_parts(root, out, target_rows=100)
        assert m["n_bins"] == 3 and m["compacted"] == 3
        assert storage.list_parts(out) == [0, 1, 2]
        got = []
        for p in storage.list_parts(out):
            got.extend(storage.read_part(out, p).column("doc_id").to_pylist())
        want = []
        for p in storage.list_parts(root):
            want.extend(storage.read_part(root, p).column("doc_id").to_pylist())
        assert got == want  # contiguous order preserved
        # lineage recorded
        assert storage.read_manifest(out, 0)["source_parts"] == [0, 1, 2]

    def test_compact_resume_skips_committed(self, tmp_path, ray_session):
        from ocr_service_ray.pipeline.compact import compact_parts

        root, out = str(tmp_path / "in"), str(tmp_path / "out")
        self._make_parts(root, [10, 10, 10, 10])
        compact_parts(root, out, target_rows=20)
        import os

        mtime = os.path.getmtime(storage.data_path(out, 0))
        # drop bin 1's manifest -> it must be redone, bin 0 untouched
        os.unlink(storage.manifest_path(out, 1))
        m = compact_parts(root, out, target_rows=20)
        assert m["skipped_committed"] == 1 and m["compacted"] == 1
        assert os.path.getmtime(storage.data_path(out, 0)) == mtime


class TestZoneMapClustering:
    def test_cluster_prune_and_range_read(self, tmp_path, ray_session):
        import numpy as np

        from ocr_service_ray.pipeline.cluster import (
            cluster_parts,
            pruned_parts,
            read_range,
        )

        # unsorted input across 4 partitions
        rng = np.random.default_rng(5)
        vals = rng.permutation(2000)
        root = str(tmp_path / "in")
        for p in range(4):
            chunk = vals[p * 500 : (p + 1) * 500]
            storage.write_part(root, p, pa.table({
                "doc_id": pa.array([f"d{v}" for v in chunk]),
                "n_chars": pa.array(chunk.astype("int64")),
            }))
            storage.commit_manifest(root, p, {"part_id": p, "n_docs": 500})

        out = str(tmp_path / "clustered")
        m = cluster_parts(root, out, key="n_chars", target_rows=400)
        assert m["n_docs"] == 2000 and m["n_parts"] >= 4
        # zones are disjoint-ish and ordered: each part's min >= prev max
        zones = [storage.read_manifest(out, p) for p in storage.list_parts(out)]
        for a, b in zip(zones, zones[1:]):
            assert a["key_max"] <= b["key_min"]

        # a narrow range touches FEW partitions (pruning actually prunes)
        keep, total = pruned_parts(out, "n_chars", 100, 199)
        assert total == m["n_parts"]
        assert len(keep) <= max(1, total // 2)

        got = read_range(out, "n_chars", 100, 199).to_pandas()
        assert sorted(got["n_chars"]) == list(range(100, 200))

    def test_pruned_read_rejects_wrong_key(self, tmp_path, ray_session):
        from ocr_service_ray.pipeline.cluster import cluster_parts, pruned_parts

        root = str(tmp_path / "in")
        storage.write_part(root, 0, pa.table({"a": [3, 1, 2]}))
        storage.commit_manifest(root, 0, {"part_id": 0, "n_docs": 3})
        out = str(tmp_path / "c")
        cluster_parts(root, out, key="a", target_rows=10)
        with pytest.raises(ValueError):
            pruned_parts(out, "b", 0, 1)


class TestDeleteDocs:
    def test_targeted_delete_rewrites_only_hit_parts(self, tmp_path, ray_session):
        import os
        import time

        from ocr_service_ray.pipeline.compact import delete_docs

        root = str(tmp_path / "t")
        for p in range(4):
            t = pa.table({
                "doc_id": [f"d{p}-{i}" for i in range(10)],
                "v": list(range(10)),
            })
            storage.write_part(root, p, t)
            storage.commit_manifest(root, p, {"part_id": p, "n_docs": 10})
        victims = ["d1-3", "d1-7", "d3-0"]
        spath = os.path.join(root, "part=0")
        mtime_before = max(
            os.path.getmtime(os.path.join(spath, f)) for f in os.listdir(spath)
        )
        time.sleep(0.02)
        out = delete_docs(root, victims)
        assert out == {"n_parts_total": 4, "n_parts_rewritten": 2, "n_deleted": 3}
        # untouched part byte-identical (mtime pinned)
        mtime_after = max(
            os.path.getmtime(os.path.join(spath, f)) for f in os.listdir(spath)
        )
        assert mtime_after == mtime_before
        # victims gone, everyone else intact, tombstone lineage recorded
        remaining = [
            d for p in storage.list_parts(root)
            for d in storage.read_part(root, p).column("doc_id").to_pylist()
        ]
        assert set(victims).isdisjoint(remaining) and len(remaining) == 37
        m1 = storage.read_manifest(root, 1)
        assert m1["n_docs"] == 8 and m1["deleted"] == 2
        # idempotent: deleting the same ids again rewrites nothing
        out2 = delete_docs(root, victims)
        assert out2["n_parts_rewritten"] == 0 and out2["n_deleted"] == 0

    def test_delete_accumulates_tombstones(self, tmp_path, ray_session):
        from ocr_service_ray.pipeline.compact import delete_docs

        root = str(tmp_path / "t2")
        t = pa.table({"doc_id": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]})
        storage.write_part(root, 0, t)
        storage.commit_manifest(root, 0, {"part_id": 0, "n_docs": 4})
        delete_docs(root, ["a"])
        delete_docs(root, ["c"])
        m = storage.read_manifest(root, 0)
        assert m["n_docs"] == 2 and m["deleted"] == 2
