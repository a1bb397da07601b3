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


def canonical_docs(sf_dir: str) -> pa.Table:
    """Cluster-representative election: every doc maps to the CANONICAL
    doc of its verified near-dup cluster — the member with the most
    content (max n_chars, ties -> min doc_id) — or to itself when it
    has no near-dups. ``keep`` marks the survivors. This upgrades
    keep-min-doc_id dedup (``neardup_clusters``) to the quality-aware
    retention policy real corpus curation uses: drop the duplicates,
    keep the best copy.

    Distributed shape: the cached verified-LSH cluster table is
    O(docs-in-pairs); the metadata needed to elect (n_chars of cluster
    members ONLY) comes from a column-pruned read filtered by a
    broadcast member set, so election happens on the driver over the
    duplicate-rate-sized table; the final corpus-wide assignment is one
    stateless broadcast-map pass. No shuffle beyond the pair machinery.
    """
    import numpy as np

    from . import dedup

    clusters = dedup.neardup_clusters(sf_dir)
    doc_ids = clusters.column("doc_id").to_pylist()
    reps = clusters.column("cluster_rep").to_pylist()
    member_of = dict(zip(doc_ids, reps))
    member_ref = ray.put(frozenset(member_of))

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def members_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ms = ray.get(member_ref)
        if batch.num_rows == 0:
            return batch
        mask = pa.array(
            np.fromiter(
                (int(d) in ms for d in batch.column("doc_id").to_pylist()),
                np.bool_,
                batch.num_rows,
            )
        )
        return batch.filter(mask)

    mtbls = [
        t
        for t in ray.get(
            docs.map_batches(members_only, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    canon_of: dict[int, int] = {}
    if mtbls:
        m = pa.concat_tables(mtbls).to_pandas()
        m["rep"] = m["doc_id"].map(member_of)
        m = m.sort_values(
            ["rep", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        best = m.groupby("rep", sort=False).head(1)
        rep_to_canon = dict(zip(best["rep"], best["doc_id"]))
        canon_of = {d: int(rep_to_canon[r]) for d, r in member_of.items()}
    canon_ref = ray.put(canon_of)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(canon_ref)
        ids = batch.column("doc_id").to_pylist()
        canon = np.fromiter(
            (cm.get(int(d), int(d)) for d in ids), np.int64, len(ids)
        )
        own = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "canonical_id": pa.array(canon, pa.int64()),
                "keep": pa.array(canon == own),
            }
        )

    out = docs.map_batches(assign, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).select(
        ["doc_id", "canonical_id", "keep"]
    ).sort_by([("doc_id", "ascending")])
