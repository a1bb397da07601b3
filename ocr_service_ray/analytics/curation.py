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


def _dup_structures(sf_dir: str):
    """Build + broadcast the two dup structures the status ladder needs:
    the {fingerprint: min doc_id} map over duplicate GROUPS (pass A) and
    the non-representative near-dup drop set (pass B) — both
    O(duplicate rate), never corpus-sized. Returns (dup_ref, near_ref)
    object refs shared by ``curation_status`` and ``export_curated``."""
    from ray.data.aggregate import Count, Min

    from . import dedup

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

    return ray.put(dup_map), ray.put(near_drop)


def _batch_statuses(
    batch: pa.Table, dm: dict, nd: frozenset, min_words: int
) -> list[str]:
    """The deterministic rule ladder applied to one batch (shared by
    the status query and the export sink — one definition of 'kept')."""
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
    return out


def curation_status(sf_dir: str, min_words: int = 10) -> pa.Table:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    dup_ref, near_ref = _dup_structures(sf_dir)

    def status(batch: pa.Table) -> pa.Table:
        out = _batch_statuses(
            batch, ray.get(dup_ref), ray.get(near_ref), min_words
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "status": pa.array(out, pa.string())}
        )

    out = docs.map_batches(status, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def export_curated(
    sf_dir: str,
    out_root: str,
    min_words: int = 10,
    n_parts: int = 8,
    resume: bool = False,
) -> dict:
    """Materialize the CURATED corpus — the artifact the whole curation
    ladder exists to produce: every ``kept`` document (full row, all
    columns) written as hash-partitioned parts with per-part lineage
    manifests, in the engine's resumable part layout (atomic
    tmp+rename commits; ``clear_all_parts`` first so a re-export is
    idempotent, the ingest precedent). ``resume=True`` instead SKIPS
    partitions whose manifest already committed (the run_pipeline wave
    contract applied to the sink): partition membership is a pure
    function of doc_id, so a committed part is already correct and
    only missing/uncommitted parts are rewritten.

    Distributed sink shape: the same broadcast dup structures as
    ``curation_status`` (O(duplicate rate)), ONE streaming pass filters
    kept docs and tags a deterministic partition (doc_id mod n_parts),
    and ``groupby(part).map_groups`` writes each part inside its own
    task — the driver only ever sees the per-part manifest rows. Drop
    counts per status ride along as integer partials so the summary is
    exact without a second pass.
    """
    from ..core import storage

    if resume:
        done = frozenset(storage.list_parts(out_root))
    else:
        storage.clear_all_parts(out_root)
        done = frozenset()
    dup_ref, near_ref = _dup_structures(sf_dir)

    def tag(batch: pa.Table) -> pa.Table:
        sts = _batch_statuses(
            batch, ray.get(dup_ref), ray.get(near_ref), min_words
        )
        import numpy as np

        arr = np.asarray(sts, dtype=object)
        kept = batch.filter(pa.array(arr == "kept"))
        ids = kept.column("doc_id").to_numpy(zero_copy_only=False)
        return kept.append_column(
            "part", pa.array((ids % n_parts).astype("int64"), pa.int64())
        )

    def write_group(group: pa.Table) -> pa.Table:
        part_id = int(group.column("part")[0].as_py())
        tbl = group.drop_columns(["part"]).sort_by([("doc_id", "ascending")])
        if part_id in done:  # committed in a prior run — skip rewrite
            return pa.table(
                {"part": pa.array([part_id], pa.int64()),
                 "n_docs": pa.array([len(tbl)], pa.int64())}
            )
        storage.write_part(out_root, part_id, tbl)
        storage.commit_manifest(
            out_root,
            part_id,
            {
                "part_id": part_id,
                "n_docs": len(tbl),
                "source_root": sf_dir,
                "rule": {"min_words": min_words, "ladder": "curation_status"},
            },
        )
        return pa.table(
            {"part": pa.array([part_id], pa.int64()),
             "n_docs": pa.array([len(tbl)], pa.int64())}
        )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    written = (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_group, batch_format="pyarrow")
    )
    rows = [
        t
        for t in ray.get(written.to_arrow_refs())
        if t.num_rows and "part" in t.column_names
    ]
    n_kept = sum(int(n) for t in rows for n in t.column("n_docs").to_pylist())
    return {
        "out_root": out_root,
        "n_parts": len(rows),
        "n_kept": n_kept,
    }


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


def leakage_safe_splits(sf_dir: str) -> pa.Table:
    """Train/val/test assignment with NO near-dup leakage across
    splits — the eval-hygiene upgrade of ``dataset_splits``: hashing
    raw doc_ids puts near-duplicates of a training doc into the test
    set (the classic contamination-by-near-dup failure); here the
    split is a pure function of the doc's near-dup CLUSTER
    REPRESENTATIVE (min doc_id of the verified component; the doc
    itself when it has no near-dups), so whole clusters co-assign by
    construction. Emits (doc_id, rep_id, split).

    Distributed shape: the verified cluster table is O(docs-in-pairs)
    (the cached LSH machinery), broadcast once; the corpus streams
    through a stateless map computing split = md5-prefix thresholds of
    the REP id — the same ~90/5/5 rule as dataset_splits, reproducible
    across cluster sizes and re-ingests. Oracle: the recursive-CTE
    closure joined to the same CASE thresholds.
    """
    from . import dedup
    from .hashing import md5_hex

    clusters = dedup.neardup_clusters(sf_dir)
    rep_of = dict(
        zip(
            clusters.column("doc_id").to_pylist(),
            clusters.column("cluster_rep").to_pylist(),
        )
    )
    rep_ref = ray.put(rep_of)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "rep_id": pa.array([], pa.int64()),
                 "split": pa.array([], pa.string())}
            )
        rm = ray.get(rep_ref)
        ids = batch.column("doc_id").to_pylist()
        reps = [int(rm.get(d, d)) for d in ids]
        splits = []
        for r in reps:
            h2 = md5_hex(str(r))[:2]
            splits.append("train" if h2 < "e6" else ("val" if h2 < "f3" else "test"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "rep_id": pa.array(reps, pa.int64()),
                "split": pa.array(splits, pa.string()),
            }
        )

    out = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def dataset_card(sf_dir: str, min_words: int = 10) -> pa.Table:
    """Auto-generated DATASET CARD numbers ("datasheets for datasets"):
    the one-table corpus summary a release ships with — sizes, domain
    cardinalities, token mass, and the dedup/quality headline counts.
    Emits (metric, value) int64 rows, metric-sorted:

        n_docs, n_sources, n_langs, total_chars, total_tokens,
        n_exact_dup_docs (docs minus distinct fingerprints),
        n_too_short (< min_words tokens)

    Distributed shape: ONE streaming pass over documents produces all
    per-doc partials (counts, char/token sums, too-short flags, and
    in-block-distinct source/lang sets); the fingerprint distinct
    count reuses the process-cached fingerprint table with a digest
    groupby. Driver state is O(blocks + distinct sources + langs).
    Every metric is a scalar SQL subquery — the whole card is
    oracle-exact.
    """
    import numpy as np

    from . import dedup

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tok = np.array(
            [len(_TOKEN.findall(t or "")) for t in texts], dtype=np.int64
        )
        srcs = sorted(set(batch.column("source").to_pylist()))
        langs = sorted(set(batch.column("lang").to_pylist()))
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "chars": pa.array(
                    [int(np.asarray(batch.column("n_chars"), np.int64).sum())],
                    pa.int64(),
                ),
                "tokens": pa.array([int(n_tok.sum())], pa.int64()),
                "too_short": pa.array([int((n_tok < min_words).sum())], pa.int64()),
                "sources": pa.array([srcs], pa.list_(pa.string())),
                "langs": pa.array([langs], pa.list_(pa.string())),
            }
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "lang", "source", "n_chars"],
            )
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    n_docs = sum(int(x) for t in parts for x in t.column("n_docs").to_pylist())
    chars = sum(int(x) for t in parts for x in t.column("chars").to_pylist())
    tokens = sum(int(x) for t in parts for x in t.column("tokens").to_pylist())
    short = sum(int(x) for t in parts for x in t.column("too_short").to_pylist())
    sources = {s for t in parts for row in t.column("sources").to_pylist() for s in row}
    langs = {l for t in parts for row in t.column("langs").to_pylist() for l in row}
    n_fp = dedup.fingerprint_table(sf_dir).groupby("h").count().count()
    metrics = {
        "n_docs": n_docs,
        "n_sources": len(sources),
        "n_langs": len(langs),
        "total_chars": chars,
        "total_tokens": tokens,
        "n_exact_dup_docs": n_docs - int(n_fp),
        "n_too_short": short,
    }
    keys = sorted(metrics)
    return pa.table(
        {
            "metric": pa.array(keys, pa.string()),
            "value": pa.array([int(metrics[k]) for k in keys], pa.int64()),
        }
    )


def curation_rates_by_source(sf_dir: str, min_words: int = 10) -> pa.Table:
    """The curation DASHBOARD rollup: per-(source, status) doc counts —
    which domains contribute the duplicate / too-short mass, the
    number that drives per-source crawl and filtering decisions.

    Same broadcast dup structures and rule ladder as
    ``curation_status`` (shared ``_batch_statuses`` — one definition),
    but the corpus pass reduces to per-block (source, status) COUNT
    partials in place, so the shuffle moves at most
    |sources| × 4 rows per block and the final groupby is tiny.
    """
    import numpy as np

    dup_ref, near_ref = _dup_structures(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        sts = _batch_statuses(
            batch, ray.get(dup_ref), ray.get(near_ref), min_words
        )
        keys = [
            f"{s}\x00{st}"
            for s, st in zip(batch.column("source").to_pylist(), sts)
        ]
        if not keys:
            return pa.table(
                {"key": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(np.asarray(keys, dtype=object), return_counts=True)
        return pa.table(
            {"key": pa.array(list(uniq), pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .sum("n")
    )
    rows = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not rows:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "status": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(rows)
    keys = tbl.column("key").to_pylist()
    ns = tbl.column(tbl.column_names[1]).to_pylist()
    srcs, stats = zip(*(k.split("\x00") for k in keys))
    return pa.table(
        {
            "source": pa.array(list(srcs), pa.string()),
            "status": pa.array(list(stats), pa.string()),
            "n_docs": pa.array([int(n) for n in ns], pa.int64()),
        }
    ).sort_by([("source", "ascending"), ("status", "ascending")])


# ----------------------------------------------------------------------
# deterministic global shuffle -> training shards


def shuffle_shards(sf_dir: str, n_shards: int = 16, seed: int = 0) -> pa.Table:
    """Deterministic GLOBAL SHUFFLE + shard/position placement — the
    last verb of a training-data pipeline: randomize document order
    corpus-wide (so no training batch sees crawl/source order), split
    into ``n_shards`` balanced output shards, and fix each document's
    position inside its shard. Everything is a pure function of
    (doc_id, seed): re-runs, resumes and different cluster sizes
    produce the identical placement (unlike ``random_shuffle``, whose
    permutation depends on RNG state and block layout), and changing
    ``seed`` yields an independent permutation for a new epoch.

    Key construction (SQL-replicable, driver-hash-verified): h =
    md5-lower64(decimal doc_id) XOR md5-lower64('seed:<seed>') — the
    per-doc hash is the same ``md5_batch_int_ids`` kernel as
    ``hash_sample``/``dataset_splits``, the seed folds in as a fixed
    64-bit mask, shard = h mod n_shards, pos = rank of (h, doc_id)
    within the shard.

    Ray shape: stateless vectorized key map -> ONE shard-keyed shuffle
    (``groupby(shard).map_groups``) -> in-group vectorized lexsort
    ranking. Partitioning assumption, as for ``export_curated``: a
    shard must fit one task, so at real scale size n_shards to
    ~corpus_bytes / 1 GiB (thousands of shards for 100 TB — md5 keys
    make them uniform; there is no hot-key risk). The placement map is
    O(1 row/doc); actual payload export streams through
    ``export_curated``-style per-shard writers ordered by pos.
    """
    import numpy as np

    from .hashing import md5_batch_int_ids, md5_hash_tokens

    mask = np.uint64(md5_hash_tokens([f"seed:{seed}"])[0])
    ns = np.uint64(n_shards)

    def key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "shard": pa.array([], pa.int32()),
                 "h": pa.array([], pa.int64())}
            )
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d = md5_batch_int_ids(ids)
        h = d[:, 8:16].copy().view(np.uint64).ravel() ^ mask
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shard": pa.array((h % ns).astype(np.int32)),
                "h": pa.array(h.view(np.int64)),
            }
        )

    def rank(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))  # ties (h) broken by doc_id, as the oracle
        pos = np.empty(len(order), np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "shard": group.column("shard"),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    out = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pyarrow")
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "shard": pa.array([], pa.int32()),
             "pos": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tables).sort_by(
        [("shard", "ascending"), ("pos", "ascending")]
    )
