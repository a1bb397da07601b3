"""Ray Data batch stages: explode, stateless extract, OCR actor, reassembly.

The pipeline is LINEAR (read → explode+extract → [repartition] → OCR
actor pool → groupby(part_id) reassemble+write) rather than the
branch-per-kind + union shape: a branch point in a lazy Dataset DAG
re-executes the shared prefix once per consumer, which at 100 TB means
reading the input twice. Instead the stateless stage extracts text/html/
pdf spans inline and passes media rows through untouched; the actor
stage recognizes only the media rows of each batch. Doc-level skew
(a 50-media-span doc) is broken by the explode itself — spans, not
docs, are the unit of work — plus the optional explicit repartition.

Reference correspondence:
- explode/normalize:       app/ocr_engine.py:374-379 (M4)
- html leg:                app/nfce_parser.py:97-134 (M15/M16)
- pdf leg:                 north-rule XY-cut (no reference counterpart)
- OCR actor:               app/ocr_engine.py:49-139 (ST1/M1-M3)
- error records:           app/main.py:132-143 (status-200 error payloads)
"""

from __future__ import annotations

import re
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core import storage
from ..core.schema import KIND_ERROR, KIND_MEDIA, KIND_TEXT
from ..ops import textops as T
from .html_extract import extract_main_text
from .pdf_layout import extract_pdf_text

_PART_RE = re.compile(r"part=(\d+)")

FLAT_FIELDS = ("doc_id", "part_id", "offset", "kind", "text", "media_ref")


def part_id_of_path(path: str) -> int:
    m = _PART_RE.search(path)
    return int(m.group(1)) if m else -1


# Python re's unicode \s, spelled out for RE2 (which has ASCII \s):
# [ \t\n\r\f\v], file/group/record/unit separators, NEL, NBSP, ogham
# space, Zs block 2000-200A, LS/PS, NNBSP, MMSP, ideographic space.
_PY_WS_CLASS = (
    "[ \\t\\n\\r\\f\\v\\x{001c}-\\x{001f}\\x{0085}\\x{00a0}\\x{1680}"
    "\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]+"
)


def _norm_text_arrow(arr: pa.Array) -> pa.Array:
    """Vectorized ops.textops.norm_text over a string array.

    Same semantics (×->X, collapse whitespace, trim, correction chain in
    COMMON_CORRECTIONS order); equality with the scalar form is pinned by
    tests/test_pipeline_e2e.py and the generator oracle. RE2's ``\\s`` is
    ASCII-only, so the class below spells out Python's unicode ``\\s``
    exactly (controls 1C-1F, NEL, NBSP, Zs spaces, line/para separators)
    — the two forms are fuzz-verified equal on arbitrary unicode text.
    """
    a = pc.replace_substring(pc.fill_null(arr, ""), "×", "X")
    a = pc.replace_substring_regex(a, _PY_WS_CLASS, " ")
    a = pc.utf8_trim_whitespace(a)
    for wrong, right in T.COMMON_CORRECTIONS:
        a = pc.replace_substring(a, wrong, right)
    return a


def explode_and_extract(batch: pa.Table) -> pa.Table:
    """(doc_id, spans, path) docs -> flat extracted span rows.

    List explode is zero-copy Arrow (``list_parent_indices`` + ``take``);
    the per-row Python work is only the actual parsing (html/pdf) and the
    regex normalization of text spans. Media rows pass through with
    ``kind="media"`` for the downstream actor stage; any per-span
    extraction error becomes an ``erro`` row, never an exception.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parents = pc.list_parent_indices(spans)
    flat = spans.flatten()
    doc_id = pc.take(batch.column("doc_id"), parents)
    if "path" in batch.column_names:
        paths = batch.column("path")
        path_to_part = {p: part_id_of_path(p) for p in paths.unique().to_pylist()}
        part_per_doc = pa.array(
            [path_to_part[p] for p in paths.to_pylist()], type=pa.int32()
        )
        part_id = pc.take(part_per_doc, parents)
    else:
        part_id = pa.array(np.zeros(len(flat), dtype=np.int32))

    kinds_np = np.asarray(flat.field("kind").to_numpy(zero_copy_only=False))
    # text spans: fully vectorized pyarrow.compute normalization (the hot
    # leg — most spans are text); html/pdf keep per-row Python parsers
    out_text = np.asarray(_norm_text_arrow(flat.field("text")).to_numpy(zero_copy_only=False)).copy()
    out_kind = np.full(len(kinds_np), KIND_TEXT, dtype=object)
    out_conf = np.ones(len(kinds_np), dtype=np.float64)
    texts = flat.field("text")
    for i in np.flatnonzero(~np.isin(kinds_np, (KIND_TEXT,))):
        k = kinds_np[i]
        try:
            if k == "html":
                out_text[i] = extract_main_text(texts[i].as_py())
            elif k == "pdf":
                out_text[i] = extract_pdf_text(texts[i].as_py())
            elif k == KIND_MEDIA:
                out_kind[i] = KIND_MEDIA
                out_text[i] = ""
                out_conf[i] = 0.0
            else:
                out_kind[i] = KIND_ERROR
                out_text[i] = ""
                out_conf[i] = 0.0
        except Exception:
            out_kind[i] = KIND_ERROR
            out_text[i] = ""
            out_conf[i] = 0.0
    return pa.table(
        {
            "doc_id": doc_id,
            "part_id": part_id,
            "offset": flat.field("offset"),
            "kind": pa.array(out_kind, type=pa.string()),
            "text": pa.array(out_text, type=pa.string()),
            "media_ref": flat.field("media_ref"),
            "conf": pa.array(out_conf, type=pa.float64()),
        }
    )


class OcrStage:
    """Actor-pool stage: recognize media rows, pass the rest through.

    Warm state (template bank) is built once per actor in ``__init__``
    — the analog of the once-per-worker PaddleOCR model load
    (app/ocr_engine.py:49-53). Blob payloads are point-looked-up from
    the co-partitioned sidecar table (media_ref prefix encodes the blob
    partition) through a small per-actor LRU of partition dicts, so
    shuffled rows carry only refs, never bytes.

    MULTI-NODE CONTRACT: ``blobs_root`` is opened with local filesystem
    calls (pq.ParquetFile) from EVERY actor, so on a real cluster it
    must be a path every node resolves identically — shared storage
    (NFS mount) or an fsspec-compatible object-store URI the pyarrow
    filesystem layer can open (s3://... works through pq.ParquetFile's
    filesystem inference). For stores pyarrow cannot open directly,
    pass ``fetcher``: a picklable ``(blobs_root, part_id) ->
    pyarrow.Table`` callable (columns media_ref, bytes) that replaces
    the file open; the row-group index/LRU machinery then operates on
    its result. In-sandbox tests exercise the local-path and fetcher
    legs; the object-store leg is the same code path by construction.
    """

    def __init__(
        self,
        blobs_root: str,
        cache_parts: int = 4,
        blob_ref=None,
        conf_floor: float = 0.35,
        fetcher=None,
    ):
        from .ocr.engine import OcrEngine

        self.engine = OcrEngine(conf_floor=conf_floor)
        self.blobs_root = blobs_root
        self.fetcher = fetcher
        # row-group point-lookup state: per-part parquet handle +
        # ref -> (row_group, row) index (built from the tiny media_ref
        # column); LRU of decoded row-group dicts. Decoding a whole
        # partition file per lookup miss cost more than the OCR itself
        # once partitions grew past ~100 MB.
        self.max_handles = max(cache_parts, 4)
        self.max_rowgroups = 16
        self._handles: OrderedDict[int, tuple] = OrderedDict()  # part -> (pf, index)
        self._rg_cache: OrderedDict[tuple[int, int], dict[str, bytes]] = OrderedDict()
        # broadcast mode: the whole blob dict was ray.put by the driver
        # (small corpora only); partition mode leaves this None
        self._broadcast: dict[str, bytes] | None = None
        if blob_ref is not None:
            import ray

            self._broadcast = ray.get(blob_ref)

    # ------------------------------------------------------------------
    def _part_handle(self, part: int):
        if part in self._handles:
            self._handles.move_to_end(part)
            return self._handles[part]
        if self.fetcher is not None:
            # custom-store leg: the fetcher returns the whole partition
            # table; the index maps every ref into pseudo row group 0
            try:
                refs = self.fetcher(self.blobs_root, part).column("media_ref").to_pylist()
                handle = (None, {r: (0, i) for i, r in enumerate(refs)})
            except Exception:
                handle = (None, {})
            self._handles[part] = handle
            while len(self._handles) > self.max_handles:
                old_part, _ = self._handles.popitem(last=False)
                for key in [k for k in self._rg_cache if k[0] == old_part]:
                    del self._rg_cache[key]
            return handle
        import pyarrow.parquet as pq

        try:
            pf = pq.ParquetFile(storage.data_path(self.blobs_root, part))
            index: dict[str, tuple[int, int]] = {}
            row = 0
            bounds = []
            for rg in range(pf.metadata.num_row_groups):
                n = pf.metadata.row_group(rg).num_rows
                bounds.append((row, rg))
                row += n
            refs = pq.read_table(
                storage.data_path(self.blobs_root, part), columns=["media_ref"]
            ).column("media_ref").to_pylist()
            bi = 0
            for i, ref in enumerate(refs):
                while bi + 1 < len(bounds) and i >= bounds[bi + 1][0]:
                    bi += 1
                index[ref] = (bounds[bi][1], i - bounds[bi][0])
            handle = (pf, index)
        except Exception:
            handle = (None, {})
        self._handles[part] = handle
        while len(self._handles) > self.max_handles:
            old_part, _ = self._handles.popitem(last=False)
            # drop that part's cached row groups too
            for key in [k for k in self._rg_cache if k[0] == old_part]:
                del self._rg_cache[key]
        return handle

    def _row_group(self, part: int, rg: int) -> dict[str, bytes]:
        key = (part, rg)
        if key in self._rg_cache:
            self._rg_cache.move_to_end(key)
            return self._rg_cache[key]
        if self.fetcher is not None:
            try:
                t = self.fetcher(self.blobs_root, part)
                blobs = dict(
                    zip(t.column("media_ref").to_pylist(), t.column("bytes").to_pylist())
                )
            except Exception:
                blobs = {}
            self._rg_cache[key] = blobs
            while len(self._rg_cache) > self.max_rowgroups:
                self._rg_cache.popitem(last=False)
            return blobs
        pf, _ = self._part_handle(part)
        blobs: dict[str, bytes] = {}
        if pf is not None:
            try:
                t = pf.read_row_group(rg, columns=["media_ref", "bytes"])
                blobs = dict(
                    zip(t.column("media_ref").to_pylist(), t.column("bytes").to_pylist())
                )
            except Exception:
                blobs = {}
        self._rg_cache[key] = blobs
        while len(self._rg_cache) > self.max_rowgroups:
            self._rg_cache.popitem(last=False)
        return blobs

    def _lookup(self, ref: str) -> bytes | None:
        if self._broadcast is not None:
            return self._broadcast.get(ref)
        # "blob-{part:04d}-..." — partition-aligned by construction
        try:
            part = int(ref.split("-")[1])
        except (IndexError, ValueError):
            return None
        _, index = self._part_handle(part)
        loc = index.get(ref)
        if loc is None:
            return None
        return self._row_group(part, loc[0]).get(ref)

    # ------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        media_idx = [i for i, k in enumerate(kinds) if k == KIND_MEDIA]
        if not media_idx:
            return batch
        refs = batch.column("media_ref").to_pylist()
        texts = batch.column("text").to_pylist()
        confs = batch.column("conf").to_pylist()
        # visit refs in partition order for blob-cache locality
        for i in sorted(media_idx, key=lambda i: refs[i]):
            try:
                page = self.engine.recognize_page(self._lookup(refs[i]))
            except Exception:
                page = None
            if page is None:
                kinds[i] = KIND_ERROR
                texts[i] = ""
                confs[i] = 0.0
            else:
                kinds[i] = KIND_TEXT
                texts[i] = page["text"]
                confs[i] = page["confidence"]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "part_id": batch.column("part_id"),
                "offset": batch.column("offset"),
                "kind": pa.array(kinds, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "media_ref": batch.column("media_ref"),
                "conf": pa.array(confs, type=pa.float64()),
            }
        )


def make_partition_writer(out_root: str, docs_root: str | None = None):
    """Group fn for ``groupby("part_id").map_groups``: reassemble + commit.

    One group = every extracted span of one input partition (the doc_id →
    partition mapping is total: a doc's spans never straddle partitions,
    so grouping by part_id subsumes the doc_id reassembly shuffle while
    keeping ONE output file + manifest per input partition — the
    checkpoint/resume unit). Within the group the span sequences are
    rebuilt fully vectorized: stable Arrow sort on (doc_id, offset),
    then ``ListArray.from_arrays`` over the doc boundaries.
    """

    def write_partition(group: pa.Table) -> pa.Table:
        part = int(group.column("part_id")[0].as_py())
        tbl = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
        doc_ids = np.asarray(tbl.column("doc_id"))
        # boundaries of each doc run (input is sorted)
        change = np.flatnonzero(doc_ids[1:] != doc_ids[:-1]) + 1
        starts = np.concatenate(([0], change))
        offsets = np.concatenate((starts, [len(doc_ids)])).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [
                tbl.column("kind").combine_chunks(),
                tbl.column("text").combine_chunks(),
                tbl.column("media_ref").combine_chunks(),
                tbl.column("offset").combine_chunks(),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans_list = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)

        # doc-level status (reference structure_data semantics,
        # app/ocr_engine.py:152-173 / app/models.py:21-27, batch analog):
        # - tipo "erro" + mensagem when a doc yields NO text spans at all
        #   (= "Nenhuma linha OCR encontrada")
        # - else venda/gasto keyword classify over the joined span text
        # - confianca = mean per-span confidence (OCR mean token conf for
        #   recognized media, 1.0 deterministic extraction, 0.0 erro)
        kinds_np = np.asarray(tbl.column("kind"))
        texts_np = np.asarray(tbl.column("text"))
        conf_np = np.asarray(tbl.column("conf"), dtype=np.float64)
        is_text = kinds_np == KIND_TEXT
        is_err = kinds_np == KIND_ERROR
        seg = np.append(starts, len(doc_ids))
        n_text = np.add.reduceat(is_text.astype(np.int64), starts)
        n_err_doc = np.add.reduceat(is_err.astype(np.int64), starts)
        confianca = np.round(
            np.add.reduceat(conf_np, starts) / np.diff(seg), 3
        )
        tipos: list[str] = []
        msgs: list[str | None] = []
        for d in range(len(starts)):
            if n_text[d] == 0:
                tipos.append("erro")
                msgs.append("Nenhuma linha OCR encontrada")
                confianca[d] = 0.0
                continue
            lo, hi = seg[d], seg[d + 1]
            joined = "\n".join(texts_np[lo:hi][is_text[lo:hi]])
            tipos.append(T.classify_document(joined))
            msgs.append(f"{int(n_err_doc[d])} spans com erro" if n_err_doc[d] else None)
        out = pa.table(
            {
                "doc_id": pa.array(doc_ids[starts], type=pa.string()),
                "spans": spans_list,
                "tipo_documento": pa.array(tipos, type=pa.string()),
                "confianca": pa.array(confianca, type=pa.float64()),
                "mensagem": pa.array(msgs, type=pa.string()),
            }
        )
        n_errors = int(pc.sum(pc.equal(tbl.column("kind"), KIND_ERROR)).as_py() or 0)
        kind_counts = {
            str(r["values"]): int(r["counts"])
            for r in tbl.column("kind").value_counts().to_pylist()
        }
        storage.write_part(out_root, part, out)
        manifest = {
            "part_id": part,
            "n_docs": len(out),
            "n_spans": len(tbl),
            "n_errors": n_errors,
            "spans_by_kind": kind_counts,
        }
        if docs_root is not None:  # lineage: the exact input fragment
            manifest["input"] = storage.data_path(docs_root, part)
        storage.commit_manifest(out_root, part, manifest)
        return pa.table(
            {
                "part_id": pa.array([part], type=pa.int32()),
                "n_docs": pa.array([len(out)], type=pa.int64()),
                "n_spans": pa.array([len(tbl)], type=pa.int64()),
                "n_errors": pa.array([n_errors], type=pa.int64()),
            }
        )

    return write_partition
