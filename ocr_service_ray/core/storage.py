"""Storage adapter: Lance when available, Parquet otherwise.

The north rule mandates Lance tables; the sandbox has no ``lance``
package (and no network to install one), so this adapter keeps an
identical directory/partition layout and switches the reader/writer call:

    <root>/part=<p>/data.parquet      (or data.lance)
    <root>/part=<p>/manifest.json     (commit marker: lineage + metrics)

A partition is COMMITTED iff its manifest exists; manifests are written
atomically (tmp file + rename) so a killed run never leaves a partial
manifest. Resume = skip committed partitions, delete + redo uncommitted
ones. This is the "checkpoint resume of unfinished partitions" required
by BASELINE.json; the reference has no persistence at all (request/
response only, /root/reference/app/main.py:108-143).
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance absent in sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except Exception:  # pragma: no cover
    HAVE_LANCE = False

_PART_RE = re.compile(r"^part=(\d+)$")


def part_dir(root: str, part_id: int) -> str:
    return os.path.join(root, f"part={part_id}")


def data_path(root: str, part_id: int) -> str:
    ext = "lance" if HAVE_LANCE else "parquet"
    return os.path.join(part_dir(root, part_id), f"data.{ext}")


def manifest_path(root: str, part_id: int) -> str:
    return os.path.join(part_dir(root, part_id), "manifest.json")


def list_parts(root: str) -> list[int]:
    """Partition ids present under ``root`` (sorted)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _PART_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def committed_parts(root: str) -> list[int]:
    return [p for p in list_parts(root) if os.path.exists(manifest_path(root, p))]


def write_part(
    root: str, part_id: int, table: pa.Table, compression: str | None = None
) -> str:
    """Write one partition's data file (no manifest — data only).

    ``compression=None`` picks zstd for text-ish tables but NONE when a
    binary ``bytes`` column dominates (media rasters): point-lookup
    latency of the blob sidecar is on the OCR hot path, and decompressing
    a whole part to serve a batch of refs costs more than the disk saves.
    """
    d = part_dir(root, part_id)
    os.makedirs(d, exist_ok=True)
    path = data_path(root, part_id)
    if compression is None:
        compression = "none" if "bytes" in table.schema.names else "zstd"
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, path, mode="overwrite")
    else:
        # small row groups on blob tables enable point lookups that read
        # ~1 row group instead of decoding the whole partition file
        row_group_size = 64 if "bytes" in table.schema.names else 64 * 1024
        # tmp + atomic rename: the data file either doesn't exist or is
        # COMPLETE — without this, a concurrent lister (list_parts goes
        # by directory presence) or a retried writer task can observe a
        # truncated/0-byte parquet mid-write (seen once under full-suite
        # memory pressure). The manifest stays the durable commit point;
        # this closes the narrower torn-data-file window.
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".data.tmp")
        os.close(fd)
        try:
            pq.write_table(
                table, tmp, compression=compression, row_group_size=row_group_size
            )
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return path


def read_part(root: str, part_id: int, columns: list[str] | None = None) -> pa.Table:
    path = data_path(root, part_id)
    if HAVE_LANCE:  # pragma: no cover
        return lance.dataset(path).to_table(columns=columns)
    return pq.read_table(path, columns=columns)


def data_files(root: str, parts: list[int] | None = None) -> list[str]:
    """Data file paths for the given (default: all) partitions."""
    if parts is None:
        parts = list_parts(root)
    return [data_path(root, p) for p in parts]


def commit_manifest(root: str, part_id: int, payload: dict[str, Any]) -> str:
    """Atomically write the partition manifest (tmp + rename)."""
    d = part_dir(root, part_id)
    os.makedirs(d, exist_ok=True)
    final = manifest_path(root, part_id)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, sort_keys=True, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return final


def read_manifest(root: str, part_id: int) -> dict[str, Any]:
    with open(manifest_path(root, part_id)) as f:
        return json.load(f)


def _rm_part_dir(d: str) -> None:
    """Remove a partition dir whose entries may be files (parquet) or
    directories (``data.lance`` is a directory tree)."""
    import shutil

    shutil.rmtree(d, ignore_errors=False)


def clear_uncommitted(root: str) -> list[int]:
    """Delete partition dirs that have data but no manifest; return their ids."""
    removed = []
    for p in list_parts(root):
        if not os.path.exists(manifest_path(root, p)):
            _rm_part_dir(part_dir(root, p))
            removed.append(p)
    return removed


def clear_all_parts(root: str) -> list[int]:
    """Delete every partition dir (fresh-run semantics, resume=False):
    stale committed partitions from a prior run must not survive into a
    new run's output or they pollute verify_output/readers."""
    removed = []
    for p in list_parts(root):
        _rm_part_dir(part_dir(root, p))
        removed.append(p)
    return removed


def ray_read(paths: list[str], **kwargs):
    """ray.data reader over the adapter's data files (parquet leg in-sandbox).

    The lance leg reads each dataset URI separately (``read_lance`` is a
    single-URI API with no ``include_paths``), forwarding ``columns``
    (pruned read at the source — Ray 2.49 read_lance supports it) and an
    ``override_num_blocks`` share per URI, stamps the path column the
    pipeline derives part ids from, and unions the per-partition
    datasets. The leg is dormant in-sandbox (no ``lance`` package) but
    covered by fake-module tests (tests/test_storage.py::TestLanceLeg).
    """
    import ray.data as rd

    if HAVE_LANCE:
        include_paths = kwargs.pop("include_paths", False)
        total_blocks = kwargs.pop("override_num_blocks", None)
        columns = kwargs.pop("columns", None)
        per_uri = max(1, (total_blocks or len(paths)) // max(1, len(paths)))
        parts = []
        for p in paths:
            ds = rd.read_lance(
                p,
                columns=columns,
                override_num_blocks=per_uri if total_blocks else None,
                **kwargs,
            )
            if include_paths:
                path = p

                def stamp(batch, _path=path):
                    import pyarrow as _pa

                    return batch.append_column(
                        "path", _pa.array([_path] * len(batch), _pa.string())
                    )

                ds = ds.map_batches(stamp, batch_format="pyarrow")
            parts.append(ds)
        out = parts[0]
        return out.union(*parts[1:]) if len(parts) > 1 else out
    return rd.read_parquet(paths, **kwargs)
