"""End-to-end corpus curation decision — the capstone composition of
the training-data primitives: every document gets ONE status under the
deterministic rule ladder

    too_short   n_words < min_words         (length floor)
    exact_dup   not the min doc_id of its normalized-md5 group
    near_dup    in a verified near-dup cluster, not the cluster rep
    kept        otherwise

Rules are evaluated on the full corpus (a short doc still counts as a
dup partner for others); the ladder only fixes which REASON a
multiply-disqualified doc reports — mirrored exactly by the oracle's
CASE chain.

Distributed shape (nothing corpus-sized ever reaches the driver):

  pass A  fingerprint combiner -> groupby(h).aggregate(Min, Count);
          only groups with count > 1 collect — the {h: min_id} dup map
          is O(duplicate groups) and broadcast once via ray.put.
  pass B  the verified-LSH cluster table (cached pair machinery from
          ``dedup``); the non-rep drop set is O(docs-in-pairs).
  pass C  one streaming status pass over the corpus: per batch,
          n_words (RE2-exact token regex) + md5 fingerprint + two
          broadcast-set lookups -> status string. No shuffle.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from .hashing import md5_hex, normalize_text
from .text_analysis import _TOKEN


def curation_status(sf_dir: str, min_words: int = 10) -> pa.Table:
    from ray.data.aggregate import Count, Min

    from . import dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # pass A starts from the process-cached fingerprint table (one
    # normalize+md5 pass shared with exact_dedup / the snapshot family)
    groups = dedup.fingerprint_table(sf_dir).groupby("h").aggregate(
        Min("doc_id"), Count()
    )

    def dup_groups_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "count()" not in batch.column_names:
            return pa.table(
                {"h": pa.array([], pa.string()), "min_id": pa.array([], pa.int64())}
            )
        kept = batch.filter(pc.greater(batch.column("count()"), 1))
        return pa.table(
            {"h": kept.column("h"), "min_id": kept.column("min(doc_id)")}
        )

    dup_tbls = [
        t
        for t in ray.get(
            groups.map_batches(dup_groups_only, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    dup_map: dict[str, int] = {}
    for t in dup_tbls:
        dup_map.update(zip(t.column("h").to_pylist(), t.column("min_id").to_pylist()))

    clusters = dedup.neardup_clusters(sf_dir)
    near_drop = frozenset(
        int(d)
        for d, r in zip(
            clusters.column("doc_id").to_pylist(),
            clusters.column("cluster_rep").to_pylist(),
        )
        if d != r
    )

    dup_ref = ray.put(dup_map)
    near_ref = ray.put(near_drop)

    def status(batch: pa.Table) -> pa.Table:
        dm = ray.get(dup_ref)
        nd = ray.get(near_ref)
        out = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if len(_TOKEN.findall(text or "")) < min_words:
                out.append("too_short")
                continue
            m = dm.get(md5_hex(normalize_text(text)))
            if m is not None and doc_id != m:
                out.append("exact_dup")
            elif doc_id in nd:
                out.append("near_dup")
            else:
                out.append("kept")
        return pa.table(
            {"doc_id": batch.column("doc_id"), "status": pa.array(out, pa.string())}
        )

    out = docs.map_batches(status, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])
