"""Partition compaction: merge small partitions into target-size ones.

At 100 TB the flagship's one-output-partition-per-input-partition layout
inherits the input's granularity; long-lived tables accumulate small
files (incremental ``ingest_jsonl(append=True)`` drops, skewed
partitions), and small files tax every subsequent scan (task overhead,
row-group fragmentation). Compaction is the standard maintenance pass:

- bins are CONTIGUOUS runs of source partitions (greedy fill to
  ``target_rows``) so doc locality and part-id ordering survive;
- one Ray task per bin reads its members and writes ONE compacted
  partition + manifest (atomic tmp+rename via the storage adapter);
- the manifest carries lineage (``source_parts``) and the run is
  RESUME-AWARE: re-running skips committed bins, exactly like
  ``run_pipeline`` (a crash mid-compaction loses at most one bin).

The reference has no persistence at all (request/response only,
/root/reference/app/main.py:108-143); this is engine-native machinery.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..core import storage


def plan_bins(root: str, target_rows: int) -> list[list[int]]:
    """Greedy contiguous binning of source partitions by manifest row
    counts (falls back to reading the part when a manifest is absent)."""
    bins: list[list[int]] = []
    cur: list[int] = []
    cur_rows = 0
    for p in storage.list_parts(root):
        try:
            n = int(storage.read_manifest(root, p).get("n_docs", 0))
        except FileNotFoundError:
            n = len(storage.read_part(root, p, columns=None))
        if cur and cur_rows + n > target_rows:
            bins.append(cur)
            cur, cur_rows = [], 0
        cur.append(p)
        cur_rows += n
    if cur:
        bins.append(cur)
    return bins


@ray.remote
def _compact_bin(root: str, out_root: str, bin_id: int, parts: list[int]) -> dict:
    tables = [storage.read_part(root, p) for p in parts]
    merged = pa.concat_tables(tables)
    storage.write_part(out_root, bin_id, merged)
    manifest = {
        "part_id": bin_id,
        "n_docs": len(merged),
        "source_parts": parts,
        "source_root": root,
    }
    storage.commit_manifest(out_root, bin_id, manifest)
    return manifest


def compact_parts(
    root: str, out_root: str, target_rows: int = 64 * 1024, resume: bool = True
) -> dict:
    """Compact ``root``'s partitions into ``out_root``; returns metrics.

    One Ray task per bin (parallel across bins); committed bins are
    skipped on re-run.
    """
    bins = plan_bins(root, target_rows)
    if resume:
        done = set(storage.committed_parts(out_root))
        storage.clear_uncommitted(out_root)
    else:
        done = set()
        storage.clear_all_parts(out_root)
    todo = [(i, b) for i, b in enumerate(bins) if i not in done]
    results = ray.get(
        [_compact_bin.remote(root, out_root, i, b) for i, b in todo]
    )
    return {
        "n_source_parts": sum(len(b) for b in bins),
        "n_bins": len(bins),
        "skipped_committed": len(bins) - len(todo),
        "compacted": len(results),
        "n_docs": sum(r["n_docs"] for r in results),
    }


@ray.remote
def _probe_part(root: str, part_id: int, victims: frozenset) -> tuple[int, int]:
    """(part_id, n_victims) using a COLUMN-PRUNED read of doc_id only —
    the membership probe never loads payloads. Key-type agnostic
    (string doc_ids in the span layouts, int64 in analytics ones)."""
    ids = storage.read_part(root, part_id, columns=["doc_id"]).column("doc_id")
    n = sum(1 for d in ids.to_pylist() if d in victims)
    return part_id, n


@ray.remote
def _rewrite_part(root: str, part_id: int, victims: frozenset) -> dict:
    import pyarrow.compute as pc

    tbl = storage.read_part(root, part_id)
    import numpy as np

    keep = pa.array(
        np.fromiter(
            (d not in victims for d in tbl.column("doc_id").to_pylist()),
            np.bool_,
            tbl.num_rows,
        )
    )
    out = tbl.filter(keep)
    n_deleted = tbl.num_rows - out.num_rows
    prior = storage.read_manifest(root, part_id)
    storage.write_part(root, part_id, out)
    manifest = dict(prior)
    manifest.update(
        {
            "part_id": part_id,
            "n_docs": out.num_rows,
            "deleted": int(n_deleted)
            + int(prior.get("deleted", 0)),
        }
    )
    storage.commit_manifest(root, part_id, manifest)
    return manifest


def delete_docs(root: str, doc_ids) -> dict:
    """Targeted DELETE over a part layout — the right-to-be-forgotten /
    retention verb: remove the given doc_ids, rewriting ONLY the
    partitions that actually contain them.

    Two phases, both parallel Ray tasks:
      1. PROBE: every partition is checked with a column-pruned doc_id
         read (payload columns never leave storage) — cheap metadata-
         scale IO that works for ANY layout (hash-partitioned, sorted,
         appended drops) without trusting a partition function;
      2. REWRITE: only partitions with hits are rewritten in place
         (atomic tmp+rename via the storage adapter); their manifests
         keep lineage and accumulate a ``deleted`` tombstone count.
    Untouched partitions keep their files and manifests byte-identical
    (mtime-pinned by the test) — at 100 TB a delete of k docs costs
    O(parts) doc_id-column probes + O(parts-with-hits) rewrites, not a
    full-table rewrite.
    """
    victims = frozenset(doc_ids)
    parts = storage.list_parts(root)
    probed = ray.get([_probe_part.remote(root, p, victims) for p in parts])
    hit_parts = [p for p, n in probed if n > 0]
    manifests = ray.get(
        [_rewrite_part.remote(root, p, victims) for p in hit_parts]
    )
    return {
        "n_parts_total": len(parts),
        "n_parts_rewritten": len(hit_parts),
        "n_deleted": sum(
            n for _, n in probed
        ),
    }
