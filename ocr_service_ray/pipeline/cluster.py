"""Sort-clustering + zone-map pruned reads.

The 100-TB read-efficiency companion to compaction: rewrite a
partitioned table SORTED by a key, record each partition's (min, max)
of that key in its manifest (a zone map), and serve range queries by
opening ONLY the partitions whose zone overlaps the predicate — IO
proportional to selectivity, not table size. This is the partition-
pruning discipline the engine charter asks for, applied to arbitrary
keys (the IVF index applies the same idea to centroid cells).

Layout/commit semantics match the rest of the engine: one data file +
manifest per partition via the storage adapter (atomic tmp+rename),
lineage (source root) recorded.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..core import storage


@ray.remote
def _write_clustered_part(
    out_root: str, part_id: int, tbl: pa.Table, key: str, source_root: str
) -> dict:
    col = tbl.column(key)
    manifest = {
        "part_id": part_id,
        "n_docs": len(tbl),
        "cluster_key": key,
        "key_min": pa.compute.min(col).as_py(),
        "key_max": pa.compute.max(col).as_py(),
        "source_root": source_root,
    }
    storage.write_part(out_root, part_id, tbl)
    storage.commit_manifest(out_root, part_id, manifest)
    return manifest


def cluster_parts(
    root: str, out_root: str, key: str, target_rows: int = 64 * 1024
) -> dict:
    """Rewrite ``root`` sorted by ``key`` with zone-map manifests.

    Distributed sort (range partition); the sorted blocks stream into
    ~``target_rows`` output partitions written by parallel Ray tasks.
    The driver holds only block refs and per-part manifests.
    """
    storage.clear_all_parts(out_root)
    ds = storage.ray_read(storage.data_files(root)).sort(key)
    refs = ds.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    bins: list[list[int]] = []
    cur: list[int] = []
    cur_rows = 0
    for i, n in enumerate(counts):
        if n == 0:
            continue
        if cur and cur_rows + n > target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
        cur.append(i)
        cur_rows += n

    if cur:
        bins.append(cur)

    @ray.remote
    def concat(*tables: pa.Table) -> pa.Table:
        return pa.concat_tables(tables)

    manifests = ray.get(
        [
            _write_clustered_part.remote(
                out_root, b, concat.remote(*[refs[i] for i in members]), key, root
            )
            for b, members in enumerate(bins)
        ]
    )
    return {
        "n_parts": len(manifests),
        "n_docs": sum(m["n_docs"] for m in manifests),
        "key": key,
    }


def pruned_parts(root: str, key: str, lo, hi) -> tuple[list[int], int]:
    """(partitions whose zone overlaps [lo, hi], total partitions)."""
    keep = []
    parts = storage.list_parts(root)
    for p in parts:
        m = storage.read_manifest(root, p)
        if m.get("cluster_key") != key:
            raise ValueError(f"part {p} is not clustered by {key!r}")
        if m["key_max"] >= lo and m["key_min"] <= hi:
            keep.append(p)
    return keep, len(parts)


def read_range(root: str, key: str, lo, hi) -> "ray.data.Dataset":
    """Zone-map pruned range read: only overlapping partitions are
    opened, then an exact vectorized filter trims the boundary parts."""
    import pyarrow.compute as pc

    keep, _total = pruned_parts(root, key, lo, hi)
    if not keep:
        import ray.data as rd

        parts = storage.list_parts(root)
        if not parts:
            return rd.from_arrow(pa.table({}))
        # zero-row dataset with the table's real schema
        return rd.from_arrow(storage.read_part(root, parts[0]).slice(0, 0))
    ds = storage.ray_read(storage.data_files(root, keep))
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t.column(key), lo), pc.less_equal(t.column(key), hi))
        ),
        batch_format="pyarrow",
    )


_CLUSTERED_CACHE: dict[str, str] = {}


def docs_in_char_range(sf_dir: str, lo: int = 400, hi: int = 700) -> pa.Table:
    """Zone-map-pruned range query over documents clustered by n_chars.

    Builds (once, cached in /tmp) the sort-clustered layout from the sf
    documents table, then serves the range via ``read_range`` — only
    zone-overlapping partitions are opened. Oracle = plain BETWEEN; the
    pruning is an IO property, the RESULT is exact.
    """
    import os

    import pyarrow.parquet as pq

    if sf_dir in _CLUSTERED_CACHE:
        out_root = _CLUSTERED_CACHE[sf_dir]
    else:
        tag = sf_dir.strip("/").replace("/", "_")
        out_root = f"/tmp/graft_zonemap/{tag}-nchars"
        marker = os.path.join(out_root, "_BUILT")
        if not os.path.exists(marker):
            import shutil
            import tempfile

            shutil.rmtree(out_root, ignore_errors=True)
            # land the flat parquet in the engine's part layout first
            src_root = tempfile.mkdtemp(prefix="zonemap_src_")
            t = pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
            )
            storage.write_part(src_root, 0, t)
            storage.commit_manifest(src_root, 0, {"part_id": 0, "n_docs": len(t)})
            cluster_parts(src_root, out_root, key="n_chars", target_rows=1024)
            with open(marker, "w") as f:
                f.write("ok")
        _CLUSTERED_CACHE[sf_dir] = out_root

    ds = read_range(out_root, "n_chars", lo, hi)
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    tbl = (
        pa.concat_tables(tables)
        if tables
        else pa.table({"doc_id": pa.array([], pa.int64()),
                       "n_chars": pa.array([], pa.int64())})
    )
    return tbl.select(["doc_id", "n_chars"]).sort_by([("doc_id", "ascending")])
