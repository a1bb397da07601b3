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
