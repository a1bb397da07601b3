"""Inverted text index: build-once bucket-partitioned posting lists +
pruned conjunctive term search.

The IVF precedent (similarity.ivf_build_index) applied to text: the
expensive artifact (term -> doc postings) is built ONCE as
hive-partitioned Parquet keyed by a term-hash bucket, and every search
afterwards is a PRUNED READ of only the queried terms' bucket dirs —
IO proportional to #query-buckets / n_buckets, never a corpus scan.
This is the retrieval layout a 100 TB corpus needs: the bucket id is a
pure function of the term, so the same partitioning key serves every
query, and index parts can be rebuilt per corpus shard independently.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

TEXT_INDEX_VERSION = 1


def _index_root(sf_dir: str, n_buckets: int) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return f"/tmp/graft_textidx/v{TEXT_INDEX_VERSION}/{tag}-b{n_buckets}"


def build_text_index(sf_dir: str, n_buckets: int = 16) -> str:
    """Build (once, cached in /tmp) the bucket-partitioned inverted
    index: distinct (term, doc_id) postings, hive-partitioned by
    ``bucket = md5-lower64(term) % n_buckets``.

    Distributed shape: stateless per-batch tokenize + in-batch
    distinct (the combiner that bounds output at distinct-pairs-per-
    block), then a streaming ``write_parquet`` with ``partition_cols``
    — no shuffle at all; duplicate postings across blocks are
    impossible (a (term, doc_id) pair lives in exactly one block
    because a doc lives in one block).
    """
    from .hashing import md5_hash_tokens
    from .text_analysis import _TERM

    root = _index_root(sf_dir, n_buckets)
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root
    shutil.rmtree(root, ignore_errors=True)
    ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_postings_fn(n_buckets), batch_format="pyarrow").write_parquet(
        root, partition_cols=["bucket"]
    )
    with open(marker, "w") as f:
        f.write("ok")
    return root


def _postings_fn(n_buckets: int):
    """Stateless distinct-(term, doc_id) postings combiner with the
    md5 bucket key — shared by the full build and the incremental
    append (identical bytes layout is what makes append valid)."""
    from .hashing import md5_hash_tokens
    from .text_analysis import _TERM

    def postings(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        docs: list[int] = []
        ids = batch.column("doc_id").to_pylist()
        for did, text in zip(ids, batch.column("text").to_pylist()):
            for t in set(_TERM.findall((text or "").lower())):
                terms.append(t)
                docs.append(did)
        if not terms:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        b = (md5_hash_tokens(terms) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(docs, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    return postings


def build_text_index_incremental(sf_dir: str, n_buckets: int = 16) -> list[str]:
    """Incremental index maintenance — the text-retrieval sibling of
    ``cross_snapshot_neardup_indexed``'s persistent LSH index: the BASE
    snapshot's postings (doc_id < T, the cross-snapshot split
    T = (max+1)//2) are built once under ``<root>/base``; a NEW
    snapshot's postings land as their own drop under ``<root>/incr``
    with the IDENTICAL bucket-hive layout. The base files are never
    rewritten or re-read during the append (mtime-pinned by a test) —
    at web scale this is what makes a daily crawl drop O(new docs),
    not O(archive).

    Each drop is its own sub-root with its own ``_BUILT`` marker and
    rmtree-on-retry, so a crashed half-written append is retried
    WITHOUT duplicating postings and without touching the base (the
    union-of-files layout has no cross-file state, but duplicate
    posting FILES would double-count in the intersection — per-drop
    atomicity is what rules that out).
    """
    root = _index_root(sf_dir, n_buckets) + "-incr"
    t_split = None
    subroots = []
    for name, pred in (("base", "doc_id < {t}"), ("incr", "doc_id >= {t}")):
        sub = os.path.join(root, name)
        subroots.append(sub)
        marker = os.path.join(sub, "_BUILT")
        if os.path.exists(marker):
            continue
        if t_split is None:
            t_split = (
                int(
                    ray.data.read_parquet(
                        f"{sf_dir}/documents.parquet", columns=["doc_id"]
                    ).max("doc_id")
                )
                + 1
            ) // 2
        shutil.rmtree(sub, ignore_errors=True)
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).filter(expr=pred.format(t=t_split)).map_batches(
            _postings_fn(n_buckets), batch_format="pyarrow"
        ).write_parquet(sub, partition_cols=["bucket"])
        with open(marker, "w") as f:
            f.write(str(t_split))
    return subroots


def text_search_incremental(
    sf_dir: str,
    terms: list[str] | None = None,
    n_buckets: int = 16,
    min_count: int = 5,
) -> pa.Table:
    """``text_search``'s contract served from the incrementally
    maintained index: base postings + appended new-snapshot postings,
    searched by the SAME pruned-read intersection tail. The oracle is
    the full-corpus SQL — incremental maintenance must be invisible to
    the query."""
    if terms is None:
        terms = _top_query_terms(sf_dir, 2, min_count)
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return _search_index_root(
        build_text_index_incremental(sf_dir, n_buckets), terms, n_buckets
    )


# process-level memo for the data-derived query terms: the derivation
# is a full corpus pass + term groupby (seconds of fixed Ray overhead)
# while the result is a deterministic pure function of the corpus —
# text_search and ranked_text_search share one entry (the established
# _COOC_CACHE / _FP_CACHE family pattern)
_QUERY_TERMS_CACHE: dict[tuple, list] = {}


def _top_query_terms(sf_dir: str, n_terms: int, min_count: int) -> list[str]:
    """Data-derived query: the ``n_terms`` RAREST corpus terms with at
    least ``min_count`` occurrences (ties -> term asc) — selective by
    construction on any corpus, derived by the usual count combiner."""
    key = (os.path.abspath(sf_dir), n_terms, min_count)
    if key in _QUERY_TERMS_CACHE:
        return list(_QUERY_TERMS_CACHE[key])
    from .text_analysis import _TERM, _docs

    def partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for text in batch.column("text").to_pylist():
            words.extend(_TERM.findall((text or "").lower()))
        if not words:
            return pa.table(
                {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(words, dtype=object), return_counts=True)
        return pa.table(
            {
                "term": pa.array(list(u), pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("n")
    )
    rows = []
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            rows.append(t)
    if not rows:
        _QUERY_TERMS_CACHE[key] = []
        return []
    tbl = pa.concat_tables(rows)
    terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
    n = tbl.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = n >= min_count
    terms, n = terms[keep], n[keep]
    order = np.lexsort((terms.astype(str), n))[:n_terms]
    out = sorted(terms[order].astype(str).tolist())
    _QUERY_TERMS_CACHE[key] = out
    return list(out)


def text_search(
    sf_dir: str,
    terms: list[str] | None = None,
    n_buckets: int = 16,
    min_count: int = 5,
) -> pa.Table:
    """Conjunctive (AND) term search over the inverted index: doc_ids
    containing EVERY query term. With ``terms=None`` the query is the
    data-derived "two rarest terms with >= min_count occurrences"
    (deterministic on any corpus; the oracle derives the same pair in
    SQL).

    The search is a PRUNED READ: only the query terms' hash-bucket
    partition dirs are opened (asserted by a filesystem-level test),
    postings are filtered to the exact terms per batch, reduced to
    per-block (doc_id, n_matched) partials, and one doc-keyed groupby
    applies the ``n_matched == len(terms)`` intersection.
    """
    from .hashing import md5_hash_tokens

    if terms is None:
        terms = _top_query_terms(sf_dir, 2, min_count)
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if not terms:
        return empty
    root = build_text_index(sf_dir, n_buckets)
    return _search_index_root(root, terms, n_buckets)


def _search_index_root(
    roots: str | list[str], terms: list[str], n_buckets: int
) -> pa.Table:
    """Shared AND-search tail over bucket-hive postings root(s) — the
    full build passes one root, the incremental build its [base, incr]
    drops; same layout, so one pruned-read + intersection plan serves
    both."""
    from .hashing import md5_hash_tokens

    if isinstance(roots, str):
        roots = [roots]
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    need = sorted(
        {int(h % np.uint64(n_buckets)) for h in md5_hash_tokens(list(terms))}
    )
    paths = [
        f
        for root in roots
        for b in need
        for f in sorted(glob.glob(os.path.join(root, f"bucket={b}", "*.parquet")))
    ]
    if not paths:
        return empty
    term_set = set(terms)
    k = len(term_set)

    def match(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "term" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        mask = pa.array([t in term_set for t in batch.column("term").to_pylist()])
        hit = batch.filter(mask)
        if hit.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        t = pa.table(
            {
                "doc_id": hit.column("doc_id"),
                "n": pa.array(np.ones(hit.num_rows, np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["doc_id"]).aggregate([("n", "sum")])
        return g.rename_columns(["doc_id", "n"])

    agg = (
        ray.data.read_parquet(paths, columns=["term", "doc_id"])
        .map_batches(match, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("n")
    )
    out = []
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            n = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.asarray(t.column("doc_id"), dtype=np.int64)[n == k]
            if len(ids):
                out.append(ids)
    if not out:
        return empty
    return pa.table(
        {"doc_id": pa.array(np.sort(np.concatenate(out)), pa.int64())}
    )


def _build_tf_index(sf_dir: str, n_buckets: int) -> str:
    """tf postings beside the boolean index (build-once per corpus):
    hive bucket-partitioned (term, doc_id, tf) rows, bucket =
    md5(term) % n_buckets. Serves ranked_text_search and bm25_search."""
    from .hashing import md5_hash_tokens
    from .text_analysis import _TERM

    root = _index_root(sf_dir, n_buckets) + "-tf"
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root
    shutil.rmtree(root, ignore_errors=True)

    def postings(batch: pa.Table) -> pa.Table:
        ts: list[str] = []
        ds_: list[int] = []
        tf: list[int] = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            words = _TERM.findall((text or "").lower())
            if not words:
                continue
            u, c = np.unique(np.asarray(words, dtype=object), return_counts=True)
            ts.extend(u.tolist())
            ds_.extend([did] * len(u))
            tf.extend(c.astype(np.int64).tolist())
        if not ts:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        b = (md5_hash_tokens(ts) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "term": pa.array(ts, pa.string()),
                "doc_id": pa.array(ds_, pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(postings, batch_format="pyarrow").write_parquet(
        root, partition_cols=["bucket"]
    )
    with open(marker, "w") as f:
        f.write("ok")
    return root


def _build_norms(sf_dir: str, n_buckets: int) -> str:
    """Doc-length sidecar (the Lucene "norms" file of this index):
    (doc_id, len) bucketed by doc_id % n_buckets for pruned per-doc
    lookup, plus a _STATS json with (n_docs, total_tokens) over docs
    with >= 1 token — the corpus constants BM25 needs."""
    import json

    from .text_analysis import _TERM

    root = _index_root(sf_dir, n_buckets) + "-norms"
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root
    shutil.rmtree(root, ignore_errors=True)

    def lens(batch: pa.Table) -> pa.Table:
        ds_: list[int] = []
        ln: list[int] = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            n = len(_TERM.findall((text or "").lower()))
            if n:
                ds_.append(did)
                ln.append(n)
        return pa.table(
            {
                "doc_id": pa.array(ds_, pa.int64()),
                "len": pa.array(ln, pa.int64()),
                "bucket": pa.array(
                    (np.asarray(ds_, np.int64) % n_buckets).astype(np.int32)
                    if ds_
                    else np.array([], np.int32),
                    pa.int32(),
                ),
            }
        )

    ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(lens, batch_format="pyarrow").write_parquet(
        root, partition_cols=["bucket"]
    )

    def stats_partial(batch: pa.Table) -> pa.Table:
        arr = batch.column("len").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(arr)], pa.int64()),
                "total": pa.array([int(arr.sum())], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(root, columns=["len"])
            .map_batches(stats_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    n_docs = sum(int(x) for t in parts for x in t.column("n").to_pylist())
    total = sum(int(x) for t in parts for x in t.column("total").to_pylist())
    with open(os.path.join(root, "_STATS"), "w") as f:
        json.dump({"n_docs": n_docs, "total_tokens": total}, f)
    with open(marker, "w") as f:
        f.write("ok")
    return root


def bm25_search(
    sf_dir: str,
    terms: list[str] | None = None,
    n_buckets: int = 16,
    min_count: int = 5,
    top_k: int = 20,
) -> pa.Table:
    """Full BM25 ranked retrieval (Robertson/Lucene variant, k1=1.2,
    b=0.75) over the pruned tf index + norms sidecar:

        score(d) = sum over query terms t with tf_td > 0 of
          ln((N - df_t + 0.5)/(df_t + 0.5) + 1) * tf_td*(k1+1)
            / (tf_td + k1*(1 - b + b*len_d/avglen))

    ranked desc (ties -> doc_id asc), top ``top_k``. With ``terms=None``
    the query is the data-derived "3 rarest terms with >= min_count
    occurrences" (ties -> term asc; deterministic on any corpus, SQL
    mirrors the derivation).

    Exactness (what ranked_text_search's docstring deferred): every
    per-(doc, term) BM25 contribution is quantized ONCE to int64 fixed
    point — floor(score_td * 2^20) — computed from the identical IEEE
    double expression on both sides (math.log == DuckDB ln, the
    lm_doc_scores contract), so per-doc integer sums, the ranking and
    the surfaced double score all hash-verify against the SQL oracle.

    Distributed shape: query-bucket PRUNED READ of tf postings (df_t =
    posting count, exact) + pruned norms lookup for the hit docs only;
    N/avglen come from the build-time _STATS constants. Rare-term
    postings bound the merged state; for frequent terms swap the tail
    for ranked_text_search's distributed (doc, tf) groupby + per-block
    top-k — same plan, contributions instead of raw tf.
    """
    import json
    import math

    from .hashing import md5_hash_tokens

    if terms is None:
        terms = _top_query_terms(sf_dir, 3, min_count)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "score_fp": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if not terms:
        return empty
    root = _build_tf_index(sf_dir, n_buckets)
    norms_root = _build_norms(sf_dir, n_buckets)
    with open(os.path.join(norms_root, "_STATS")) as f:
        stats = json.load(f)
    n_docs, total = int(stats["n_docs"]), int(stats["total_tokens"])
    if n_docs == 0:
        return empty
    need = sorted(
        {int(h % np.uint64(n_buckets)) for h in md5_hash_tokens(list(terms))}
    )
    paths = [
        f
        for b in need
        for f in sorted(glob.glob(os.path.join(root, f"bucket={b}", "*.parquet")))
    ]
    if not paths:
        return empty
    term_set = set(terms)

    def hit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "term" not in batch.column_names:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        mask = pa.array([t in term_set for t in batch.column("term").to_pylist()])
        return batch.filter(mask).select(["term", "doc_id", "tf"])

    hits_tbls = [
        t
        for t in ray.get(
            ray.data.read_parquet(paths, columns=["term", "doc_id", "tf"])
            .map_batches(hit, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not hits_tbls:
        return empty
    hits = pa.concat_tables(hits_tbls)
    h_terms = np.asarray(hits.column("term").to_pylist(), dtype=object)
    h_docs = hits.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    h_tf = hits.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    # df per term: each posting row is a distinct (term, doc) pair
    ut, t_inv = np.unique(h_terms, return_inverse=True)
    df = np.bincount(t_inv, minlength=len(ut)).astype(np.int64)
    # pruned norms lookup for the hit docs only
    hit_doc_set = np.unique(h_docs)
    nbuckets_needed = sorted({int(d % n_buckets) for d in hit_doc_set})
    npaths = [
        f
        for b in nbuckets_needed
        for f in sorted(
            glob.glob(os.path.join(norms_root, f"bucket={b}", "*.parquet"))
        )
    ]
    import pyarrow.parquet as pq

    lens_map: dict[int, int] = {}
    want = set(int(d) for d in hit_doc_set)
    for p in npaths:
        t = pq.read_table(p, columns=["doc_id", "len"])
        for d, ln in zip(t.column("doc_id").to_pylist(), t.column("len").to_pylist()):
            if d in want:
                lens_map[d] = ln
    avglen = float(total) / float(n_docs)
    # quantize each (doc, term) contribution: the identical IEEE chain
    # ln(idf_arg) * (tf*2.2) / (tf + 1.2*(0.25 + 0.75*len/avglen)) * 2^20
    fp = np.empty(len(h_docs), np.int64)
    for i in range(len(h_docs)):
        dfi = int(df[t_inv[i]])
        tfi = float(h_tf[i])
        idf = math.log(((n_docs - dfi) + 0.5) / (dfi + 0.5) + 1.0)
        denom = tfi + 1.2 * (0.25 + 0.75 * float(lens_map[int(h_docs[i])]) / avglen)
        fp[i] = math.floor(idf * (tfi * 2.2) / denom * 1048576.0)
    uids, d_inv = np.unique(h_docs, return_inverse=True)
    score_fp = np.zeros(len(uids), np.int64)
    np.add.at(score_fp, d_inv, fp)
    order = np.lexsort((uids, -score_fp))[:top_k]
    return pa.table(
        {
            "doc_id": pa.array(uids[order], pa.int64()),
            "score_fp": pa.array(score_fp[order], pa.int64()),
            "score": pa.array(
                score_fp[order].astype(np.float64) / 1048576.0, pa.float64()
            ),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
        }
    )


def ranked_text_search(
    sf_dir: str,
    terms: list[str] | None = None,
    n_buckets: int = 16,
    min_count: int = 5,
    top_k: int = 20,
) -> pa.Table:
    """Ranked (OR-semantics) retrieval over the inverted index: docs
    containing ANY query term, ranked by total term-frequency of the
    query terms (desc, ties -> doc_id asc), top ``top_k`` — the
    integer-exact core of tf ranking (BM25's float idf/length terms
    deliberately left off so the ranking is bit-reproducible and
    SQL-oracle-able; they apply as a monotone per-term reweight in the
    same plan).

    Same pruned-read shape as `text_search`, but postings carry the
    per-doc term FREQUENCY, so the index serves both boolean and
    ranked queries. Merge is a (doc, tf)-sum groupby followed by the
    distributed-top-k tail (per-block local top-k + driver merge).
    """
    from .hashing import md5_hash_tokens

    if terms is None:
        terms = _top_query_terms(sf_dir, 2, min_count)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "total_tf": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if not terms:
        return empty
    root = _build_tf_index(sf_dir, n_buckets)
    need = sorted(
        {int(h % np.uint64(n_buckets)) for h in md5_hash_tokens(list(terms))}
    )
    paths = [
        f
        for b in need
        for f in sorted(glob.glob(os.path.join(root, f"bucket={b}", "*.parquet")))
    ]
    if not paths:
        return empty
    term_set = set(terms)

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "term" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "tf": pa.array([], pa.int64())}
            )
        mask = pa.array([t in term_set for t in batch.column("term").to_pylist()])
        hit = batch.filter(mask)
        g = pa.TableGroupBy(
            pa.table({"doc_id": hit.column("doc_id"), "tf": hit.column("tf")}),
            ["doc_id"],
        ).aggregate([("tf", "sum")])
        return g.rename_columns(["doc_id", "tf"])

    agg = (
        ray.data.read_parquet(paths, columns=["term", "doc_id", "tf"])
        .map_batches(local_topk, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("tf")
    )
    rows = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not rows:
        return empty
    tbl = pa.concat_tables(rows)
    ids = np.asarray(tbl.column("doc_id"), dtype=np.int64)
    tf = tbl.column("sum(tf)").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -tf))[:top_k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "total_tf": pa.array(tf[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
        }
    )


def phrase_search(sf_dir: str, n_buckets: int = 16) -> pa.Table:
    """PHRASE retrieval: per-document positional counts of the corpus's
    most frequent word bigram (ties -> lexicographic (w1, w2)) — the
    two-phase plan real engines use when the index is term-granular:

      1. the phrase is DATA-DERIVED distributed: per-block bigram
         partials (np.unique over \\x00-joined pairs — the packed-key
         order equals (w1, w2) tuple order since \\x00 sorts below
         every token char) -> one gram-keyed groupby -> distributed
         sort + limit(1); the driver receives ONE row;
      2. candidate docs come from the boolean index's PRUNED bucket
         probe (`text_search` with the phrase's terms — adjacency
         implies conjunction, so no phrase doc is missed);
      3. only the candidates are re-read (isin pushdown) and verified
         with a vectorized positional count; docs where the words
         never sit adjacent drop out.

    Occurrences are POSITIONAL matches (i with ws[i]=w1, ws[i+1]=w2) —
    well-defined for w1 == w2 too, and exactly the oracle's
    generate_series count. Emits (doc_id, n_occurrences > 0).
    """
    import re

    import pyarrow.compute as pc

    term_re = re.compile(r"[a-z0-9]+")

    def bigram_partial(batch: pa.Table) -> pa.Table:
        all_g: list[str] = []
        for text in batch.column("text").to_pylist():
            ws = term_re.findall((text or "").lower())
            all_g.extend(f"{a}\x00{b}" for a, b in zip(ws, ws[1:]))
        if not all_g:
            return pa.table(
                {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(np.asarray(all_g, dtype=object), return_counts=True)
        return pa.table(
            {"gram": pa.array(list(uniq), pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # top-1 needs no distributed sort: after the gram-keyed groupby,
    # blocks hold DISJOINT grams, so each block's (n desc, gram asc)
    # best row is a complete candidate — emit one row per block and
    # pick the winner on the driver (O(n_blocks) rows, saves the
    # whole sort-shuffle stage a .sort().limit(1) would run)
    def block_top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        t = t.rename_columns(["gram", "n"])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        grams = np.asarray(t.column("gram").to_pylist(), dtype=object)
        best = np.lexsort((grams.astype(str), -n))[0]
        return pa.table(
            {"gram": pa.array([str(grams[best])], pa.string()),
             "n": pa.array([int(n[best])], pa.int64())}
        )

    top = (
        docs.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("gram")
        .sum("n")
        .map_batches(block_top1, batch_format="pyarrow")
    )
    rows = [t for t in ray.get(top.to_arrow_refs()) if t.num_rows]
    if rows:
        cand = pa.concat_tables(rows)
        n = cand.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        grams = np.asarray(cand.column("gram").to_pylist(), dtype=object)
        best = np.lexsort((grams.astype(str), -n))[0]
        rows = [cand.slice(int(best), 1)]
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_occurrences": pa.array([], pa.int64())}
    )
    if not rows:
        return empty
    w1, w2 = rows[0].column("gram")[0].as_py().split("\x00")

    cands = text_search(sf_dir, terms=sorted({w1, w2}), n_buckets=n_buckets)
    if cands.num_rows == 0:
        return empty
    cand_ids = cands.column("doc_id").to_pylist()

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        ids, occ = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = np.asarray(term_re.findall((text or "").lower()), dtype=object)
            if len(ws) < 2:
                continue
            n = int(((ws[:-1] == w1) & (ws[1:] == w2)).sum())
            if n > 0:
                ids.append(doc_id)
                occ.append(n)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_occurrences": pa.array(occ, pa.int64())}
        )

    out = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(cand_ids),
    ).map_batches(verify, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])
