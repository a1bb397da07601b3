"""Storage adapter: partition layout, manifests, resume primitives."""

from __future__ import annotations

import os

import pyarrow as pa

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
