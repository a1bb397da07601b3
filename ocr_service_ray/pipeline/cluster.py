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


# ----------------------------------------------------------------------
# Z-order (multi-dimension) clustering


def _spread_bits16(x):
    """Interleave-ready bit spread: 16-bit ints -> 32-bit with a zero
    between every bit (vectorized magic-number spread)."""
    import numpy as np

    x = x.astype(np.uint32) & np.uint32(0xFFFF)
    x = (x | (x << 8)) & np.uint32(0x00FF00FF)
    x = (x | (x << 4)) & np.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & np.uint32(0x33333333)
    x = (x | (x << 1)) & np.uint32(0x55555555)
    return x


def zorder_value(a, b):
    """Vectorized Morton code of two 16-bit lanes (a gets even bits)."""
    return (_spread_bits16(a) | (_spread_bits16(b) << 1)).astype("int64")


def cluster_parts_zorder(
    root: str, out_root: str, key_a: str, key_b: str, target_rows: int = 64 * 1024
) -> dict:
    """Z-ORDER clustering: rewrite ``root`` sorted by the Morton
    interleave of two keys, with per-part zone maps on BOTH columns —
    the lakehouse multi-dimension layout (Delta/Iceberg OPTIMIZE
    ZORDER BY): unlike a single-key sort, range/equality predicates on
    EITHER dimension prune partitions, because the space-filling curve
    keeps both coordinates locally contiguous.

    ``key_a`` must be numeric (clipped into 16 bits via min-shift);
    ``key_b`` may be a string — it is ranked against the distinct-value
    dictionary (small domain assumed: lang/source-style columns; the
    dictionary is computed once, broadcast, and NOT needed at read
    time because the zone maps store raw values).
    """
    import numpy as np
    import pyarrow.compute as pc

    storage.clear_all_parts(out_root)
    ds = storage.ray_read(storage.data_files(root)).materialize()
    # dimension stats: (min, max) of a + distinct dictionary of b. BOTH
    # lanes are min-max-normalized to the full 16 bits before the
    # interleave — with raw values a low-cardinality dimension (3 bits
    # of lang vs 11 bits of n_chars) would only occupy LOW Morton bit
    # positions and never influence the sort, so predicates on it would
    # never prune (measured: lang-only boxes opened every part).
    a_min = ds.min(key_a)
    a_max = ds.max(key_a)
    b_vals = sorted(
        {
            v
            for t in ray.get(
                ds.map_batches(
                    lambda t: pa.table(
                        {key_b: pc.unique(t.column(key_b))}
                    )
                    if t.num_rows
                    else pa.table({key_b: pa.array([], t.schema.field(key_b).type)}),
                    batch_format="pyarrow",
                ).to_arrow_refs()
            )
            for v in t.column(key_b).to_pylist()
        }
    )
    rank = {v: i for i, v in enumerate(b_vals)}
    rank_ref = ray.put(rank)

    a_span = max(1, int(a_max) - int(a_min))
    b_span = max(1, len(b_vals) - 1)

    def add_z(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_z", pa.array([], pa.int64()))
        rk = ray.get(rank_ref)
        a = (np.asarray(t.column(key_a), dtype=np.int64) - int(a_min)) * 0xFFFF // a_span
        a = np.clip(a, 0, 0xFFFF)
        b = np.fromiter(
            (rk[v] for v in t.column(key_b).to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        ) * 0xFFFF // b_span
        return t.append_column("_z", pa.array(zorder_value(a, b), pa.int64()))

    ds = ds.map_batches(add_z, batch_format="pyarrow").sort("_z")
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
    def write_zpart(out_root, part_id, source_root, *tables) -> dict:
        tbl = pa.concat_tables(tables).drop_columns(["_z"])
        manifest = {
            "part_id": part_id,
            "n_docs": len(tbl),
            "cluster_keys": [key_a, key_b],
            "zones": {
                k: [
                    pa.compute.min(tbl.column(k)).as_py(),
                    pa.compute.max(tbl.column(k)).as_py(),
                ]
                for k in (key_a, key_b)
            },
            "source_root": source_root,
        }
        storage.write_part(out_root, part_id, tbl)
        storage.commit_manifest(out_root, part_id, manifest)
        return manifest

    manifests = ray.get(
        [
            write_zpart.remote(out_root, b, root, *[refs[i] for i in members])
            for b, members in enumerate(bins)
        ]
    )
    return {
        "n_parts": len(manifests),
        "n_docs": sum(m["n_docs"] for m in manifests),
        "keys": [key_a, key_b],
    }


def pruned_parts_box(root: str, box: dict) -> tuple[list[int], int]:
    """Partitions whose zone maps overlap EVERY (key -> (lo, hi)) in
    ``box`` — predicates on either z-order dimension prune."""
    keep = []
    parts = storage.list_parts(root)
    for p in parts:
        m = storage.read_manifest(root, p)
        zones = m.get("zones")
        if zones is None:
            raise ValueError(f"part {p} has no multi-dim zone map")
        ok = True
        for k, (lo, hi) in box.items():
            zmin, zmax = zones[k]
            if zmax < lo or zmin > hi:
                ok = False
                break
        if ok:
            keep.append(p)
    return keep, len(parts)


def read_box(root: str, box: dict) -> "ray.data.Dataset":
    """Zone-map pruned BOX read over a z-order-clustered layout: only
    partitions overlapping every predicate open; an exact vectorized
    residual filter trims the boundary parts."""
    import pyarrow.compute as pc

    keep, _total = pruned_parts_box(root, box)
    import ray.data as rd

    if not keep:
        parts = storage.list_parts(root)
        if not parts:
            return rd.from_arrow(pa.table({}))
        return rd.from_arrow(storage.read_part(root, parts[0]).slice(0, 0))
    ds = storage.ray_read(storage.data_files(root, keep))

    def trim(t: pa.Table) -> pa.Table:
        m = None
        for k, (lo, hi) in box.items():
            c = pc.and_(
                pc.greater_equal(t.column(k), lo), pc.less_equal(t.column(k), hi)
            )
            m = c if m is None else pc.and_(m, c)
        return t.filter(m)

    return ds.map_batches(trim, batch_format="pyarrow")


_ZORDER_CACHE: dict[str, str] = {}


def docs_in_char_lang_box(
    sf_dir: str, lo: int = 400, hi: int = 700, stats: dict | None = None
) -> pa.Table:
    """Multi-dimension pruned box query: docs of the (data-derived) min
    lang with n_chars in [lo, hi], served from a Z-ORDER-clustered
    layout — both the lang equality AND the char range prune
    partitions (``stats`` records parts opened / total for the tests;
    the RESULT is exact, oracle = plain WHERE).
    """
    import os

    import pyarrow.parquet as pq

    if sf_dir in _ZORDER_CACHE:
        out_root = _ZORDER_CACHE[sf_dir]
    else:
        tag = sf_dir.strip("/").replace("/", "_")
        out_root = f"/tmp/graft_zorder/{tag}-nchars-lang"
        marker = os.path.join(out_root, "_BUILT")
        if not os.path.exists(marker):
            import shutil
            import tempfile

            shutil.rmtree(out_root, ignore_errors=True)
            src_root = tempfile.mkdtemp(prefix="zorder_src_")
            t = pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
            )
            storage.write_part(src_root, 0, t)
            storage.commit_manifest(src_root, 0, {"part_id": 0, "n_docs": len(t)})
            cluster_parts_zorder(
                src_root, out_root, key_a="n_chars", key_b="lang", target_rows=128
            )
            with open(marker, "w") as f:
                f.write("ok")
        _ZORDER_CACHE[sf_dir] = out_root

    lang = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang"])
        .column("lang")
    )
    lang = min(lang.to_pylist())
    box = {"n_chars": (lo, hi), "lang": (lang, lang)}
    if stats is not None:
        keep, total = pruned_parts_box(out_root, box)
        stats["parts_opened"] = len(keep)
        stats["parts_total"] = total
    ds = read_box(out_root, box)
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    tbl = (
        pa.concat_tables(tables)
        if tables
        else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_chars": pa.array([], pa.int64()),
             "lang": pa.array([], pa.string())}
        )
    )
    return tbl.select(["doc_id", "n_chars", "lang"]).sort_by(
        [("doc_id", "ascending")]
    )
