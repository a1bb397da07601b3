"""Relational demo: combiner-pattern aggregation on lineitem.

The reference has no relational ops at all (SURVEY.md §2.4/2.5); this
module exists to pin the engine's canonical wide-aggregation shape:
pre-aggregate inside ``map_batches`` (the combiner), then a tiny
``groupby`` over the 6-combination key space — the shuffle moves
O(keys x blocks) rows instead of O(n).

Float discipline: money sums use integer cents (``round(x*100)`` as
int64) so the result is bit-identical regardless of summation order —
required for the driver's exact value-hash comparison against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style summary by (l_returnflag, l_linestatus)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: no pandas conversion in the hot path.
        # DuckDB round() is half-AWAY-from-zero; np.rint is half-to-even.
        v = batch.column("l_extendedprice").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": batch.column("l_quantity"),
                "sum_price_cents": pa.array(cents, pa.int64()),
                "count_order": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("sum_price_cents", "sum"), ("count_order", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "count_order"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "sum_price_cents", "count_order"])
        .to_pandas()
    )
    final = final.rename(
        columns={
            "sum(sum_qty)": "sum_qty",
            "sum(sum_price_cents)": "sum_price_cents",
            "sum(count_order)": "count_order",
        }
    )
    final["avg_qty"] = final["sum_qty"] / final["count_order"]
    final = final.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    final["count_order"] = final["count_order"].astype(np.int64)
    final["sum_price_cents"] = final["sum_price_cents"].astype(np.int64)
    return pa.Table.from_pandas(final, preserve_index=False)


def orders_by_nation(sf_dir: str) -> pa.Table:
    """Broadcast hash join: orders ⋈ customer ⋈ nation -> per-nation stats.

    The canonical small-side pattern the engine charter mandates: the
    customer->nation map (tiny vs orders) is built once and ``ray.put``
    ONCE; every task reads it zero-copy and does a vectorized lookup —
    the big side streams, no shuffle join. Final aggregate is the
    combiner shape (per-batch partial, 25-key final groupby).
    """
    import pyarrow.parquet as pq

    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ckeys = np.asarray(cust.column("c_custkey"))
    order_ck = np.argsort(ckeys)
    lookup_ref = ray.put((ckeys[order_ck], np.asarray(cust.column("c_nationkey"))[order_ck]))

    def partial(batch: pa.Table) -> pa.Table:
        keys_sorted, nk_sorted = ray.get(lookup_ref)
        ck = np.asarray(batch.column("o_custkey"))
        pos = np.clip(np.searchsorted(keys_sorted, ck), 0, len(keys_sorted) - 1)
        # validate the hit instead of assuming referential integrity: an
        # o_custkey absent from customer would silently join to a wrong
        # nation (and one past max(c_custkey) would IndexError). Inner-
        # join semantics on mismatch would silently drop revenue, so a
        # broken input fails LOUDLY here.
        bad = keys_sorted[pos] != ck
        if bad.any():
            raise ValueError(
                f"orders_by_nation: {int(bad.sum())} o_custkey values missing "
                f"from customer (first: {ck[bad][:5].tolist()})"
            )
        nk = nk_sorted[pos]
        v = batch.column("o_totalprice").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        t = pa.table(
            {
                "n_nationkey": pa.array(nk, pa.int64()),
                "n_orders": pa.array(np.ones(len(batch), np.int64)),
                "sum_price_cents": pa.array(cents, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["n_nationkey"]).aggregate(
            [("n_orders", "sum"), ("sum_price_cents", "sum")]
        )
        return g.rename_columns(["n_nationkey", "n_orders", "sum_price_cents"])

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    final = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .sum(["n_orders", "sum_price_cents"])
        .to_pandas()
        .rename(columns={"sum(n_orders)": "n_orders",
                         "sum(sum_price_cents)": "sum_price_cents"})
    )
    names = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))
    final["n_name"] = final["n_nationkey"].map(names)
    final["n_orders"] = final["n_orders"].astype(np.int64)
    final["sum_price_cents"] = final["sum_price_cents"].astype(np.int64)
    final = final[["n_name", "n_orders", "sum_price_cents"]].sort_values("n_name")
    return pa.Table.from_pandas(final.reset_index(drop=True), preserve_index=False)


def hash_sample(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic ~5% hash sample of documents (md5-prefix < '0d').

    Sampling that is reproducible across cluster sizes and restarts
    (unlike random_shuffle/random sample): membership is a pure function
    of the key — the property a 100 TB resumable pipeline needs.
    """
    from .hashing import md5_batch_int_ids

    def pick(batch: pa.Table) -> pa.Table:
        # vectorized md5 over the decimal id renderings; the oracle's
        # substr(md5(...), 1, 2) < '0d' on 2 hex chars == digest byte 0
        # < 0x0d (lexicographic hex compare of one byte is numeric)
        ids = np.asarray(batch.column("doc_id"))
        mask = pa.array(md5_batch_int_ids(ids)[:, 0] < 0x0D)
        return batch.filter(mask).select(["doc_id"])

    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(pick, batch_format="pyarrow")


def dataset_splits(sf_dir: str) -> pa.Table:
    """Deterministic train/val/test assignment (~90/5/5) + per
    (source, split) doc/char rollup — the split verb a training-data
    pipeline needs to be reproducible across cluster sizes, restarts
    and incremental re-runs: membership is a pure function of the
    doc_id (md5 prefix thresholds), never of arrival order or RNG
    state, so a re-ingested shard lands in the same split.

    Distributed shape: stateless vectorized md5 map (same
    ``md5_batch_int_ids`` kernel as ``hash_sample``) + a
    (source, split)-keyed count/sum combiner — partials reduce
    per block, the shuffle moves |sources|x3 rows.
    """
    from .hashing import md5_batch_int_ids

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        b0 = md5_batch_int_ids(ids)[:, 0]
        # hex-prefix thresholds: byte0 < 0xe6 -> train, < 0xf3 -> val
        split = np.where(b0 < 0xE6, "train", np.where(b0 < 0xF3, "val", "test"))
        t = pa.table(
            {
                "source": batch.column("source"),
                "split": pa.array(split, pa.string()),
                "n_docs": pa.array(np.ones(len(ids), np.int64)),
                "n_chars": batch.column("n_chars"),
            }
        )
        g = pa.TableGroupBy(t, ["source", "split"]).aggregate(
            [("n_docs", "sum"), ("n_chars", "sum")]
        )
        return g.rename_columns(["source", "split", "n_docs", "n_chars"])

    import ray.data

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "split"])
        .sum(["n_docs", "n_chars"])
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs", "sum(n_chars)": "n_chars"})
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    out = out.sort_values(["source", "split"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def top_docs_by_words(sf_dir: str, k: int = 50) -> pa.Table:
    """Top-k documents by word count: distributed sort + limit.

    Full (n_words DESC, doc_id ASC) tie-break so the boundary is
    deterministic and matches the SQL ORDER BY exactly.
    """
    import re as _re

    import ray
    import ray.data

    token = _re.compile(r"[^ \t\n\f\r]+")  # RE2 \S exactly (no \x0b)

    def count_words(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(
                    [len(token.findall(t or "")) for t in batch.column("text").to_pylist()],
                    pa.int64(),
                ),
            }
        )

    ds = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(count_words, batch_format="pyarrow")
        .sort(["n_words", "doc_id"], descending=[True, False])
        .limit(k)
    )
    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


def source_stats(sf_dir: str) -> pa.Table:
    """Per (source, lang): doc count, char sum, mean chars (combiner)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_docs": pa.array(np.ones(len(batch), np.int64)),
                "sum_chars": batch.column("n_chars"),
            }
        )
        g = pa.TableGroupBy(t, ["source", "lang"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "sum_chars"])

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    )
    final = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .sum(["n_docs", "sum_chars"])
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs", "sum(sum_chars)": "sum_chars"})
    )
    final["n_docs"] = final["n_docs"].astype(np.int64)
    final["sum_chars"] = final["sum_chars"].astype(np.int64)
    final["avg_chars"] = final["sum_chars"] / final["n_docs"]
    final = final.sort_values(["source", "lang"]).reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def revenue_by_nation(sf_dir: str, num_partitions: int = 16) -> pa.Table:
    """Large-large distributed equi-join: lineitem ⋈ orders on orderkey
    (both sides too big to broadcast), then customer→nation broadcast +
    combiner aggregate. Revenue = sum of cents(l_extendedprice *
    (1 - l_discount)) per nation.

    Ray shape — the canonical big-big join plan:
      1. lineitem map_batches combiner: per-batch partial revenue per
         l_orderkey (shrinks the join's left input to <= one row per
         (batch, orderkey) — most of lineitem's fan-in collapses here)
      2. native ``Dataset.join`` (hash, num_partitions) with orders
         projected to (o_orderkey, o_custkey) — the ONLY all-to-all
      3. custkey -> nationkey broadcast lookup (ray.put once) + another
         per-batch partial aggregate per nationkey
      4. tiny final groupby over 25 nations, names broadcast
    """
    import pyarrow.parquet as pq

    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ckeys = np.asarray(cust.column("c_custkey"))
    order_ck = np.argsort(ckeys)
    lookup_ref = ray.put(
        (ckeys[order_ck], np.asarray(cust.column("c_nationkey"))[order_ck])
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        # cents of ep*(1-disc): same op order as the SQL oracle
        v = (
            batch.column("l_extendedprice").to_numpy()
            * (1.0 - batch.column("l_discount").to_numpy())
        ) * 100.0
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        t = pa.table(
            {"l_orderkey": batch.column("l_orderkey"),
             "cents": pa.array(cents, pa.int64())}
        )
        g = pa.TableGroupBy(t, ["l_orderkey"]).aggregate([("cents", "sum")])
        return g.rename_columns(["l_orderkey", "cents"])

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = li.join(
        orders, "inner", num_partitions, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def by_nation_partial(batch: pa.Table) -> pa.Table:
        keys_sorted, nk_sorted = ray.get(lookup_ref)
        ck = np.asarray(batch.column("o_custkey"))
        pos = np.clip(np.searchsorted(keys_sorted, ck), 0, len(keys_sorted) - 1)
        if (keys_sorted[pos] != ck).any():
            raise ValueError("revenue_by_nation: o_custkey missing from customer")
        t = pa.table(
            {"n_nationkey": pa.array(nk_sorted[pos], pa.int64()),
             "revenue_cents": batch.column("cents")}
        )
        g = pa.TableGroupBy(t, ["n_nationkey"]).aggregate([("revenue_cents", "sum")])
        return g.rename_columns(["n_nationkey", "revenue_cents"])

    final = (
        joined.map_batches(by_nation_partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .sum("revenue_cents")
        .to_pandas()
        .rename(columns={"sum(revenue_cents)": "revenue_cents"})
    )
    names = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))
    final["n_name"] = final["n_nationkey"].map(names)
    final["revenue_cents"] = final["revenue_cents"].astype(np.int64)
    final = final[["n_name", "revenue_cents"]].sort_values("n_name")
    return pa.Table.from_pandas(final.reset_index(drop=True), preserve_index=False)


def stratified_sample(sf_dir: str, k: int = 5) -> pa.Table:
    """Deterministic per-source k-sample: the k docs with the smallest
    (md5(doc_id), doc_id) within each source — reproducible across
    cluster sizes AND balanced across strata (plain hash_sample skews
    with stratum size).

    Combiner shape (no full sort, no per-source materialization): each
    batch keeps its local top-k per source (vectorized md5 + lexsort),
    the final per-source merge sees only O(k x blocks) rows.
    """
    import pandas as pd

    from .hashing import md5_batch_int_ids

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        hexes = [d.tobytes().hex() for d in md5_batch_int_ids(ids)]
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "doc_id": ids, "h": hexes,
        })
        top = df.sort_values(["source", "h", "doc_id"]).groupby("source").head(k)
        return pa.Table.from_pandas(top, preserve_index=False)

    def merge(group: pa.Table) -> pa.Table:
        t = group.sort_by([("h", "ascending"), ("doc_id", "ascending")]).slice(0, k)
        return t.select(["source", "doc_id"])

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(merge, batch_format="pyarrow")
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tables)
    return tbl.sort_by([("source", "ascending"), ("doc_id", "ascending")])


def top_docs_per_source(sf_dir: str, k: int = 3) -> pa.Table:
    """Grouped top-k: the k longest docs (by n_chars, doc_id tie-break)
    within EVERY source — the per-group ranking shape (global top-k is
    ``top_docs_by_words``).

    Combiner: each batch keeps its local top-k per source, the final
    per-source merge sees O(k x blocks) rows — no global sort, no
    per-source materialization.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch.column("source").to_pylist(),
            "doc_id": np.asarray(batch.column("doc_id")),
            "n_chars": np.asarray(batch.column("n_chars")),
        })
        top = (
            df.sort_values(["source", "n_chars", "doc_id"],
                           ascending=[True, False, True])
            .groupby("source").head(k)
        )
        return pa.Table.from_pandas(top, preserve_index=False)

    def merge(group: pa.Table) -> pa.Table:
        idx = np.lexsort(
            (np.asarray(group.column("doc_id")), -np.asarray(group.column("n_chars")))
        )[:k]
        t = group.take(idx)
        return pa.table(
            {
                "source": t.column("source"),
                "doc_id": t.column("doc_id"),
                "n_chars": t.column("n_chars"),
                "rank": pa.array(np.arange(1, len(t) + 1, dtype=np.int64)),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(merge, batch_format="pyarrow")
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tables)
    return tbl.sort_by([("source", "ascending"), ("rank", "ascending")])


def rare_token_scores(sf_dir: str, common_df: int = 20) -> pa.Table:
    """Per-doc rare-token count: tokens whose corpus DOCUMENT frequency
    is < ``common_df`` — an integer-exact contamination/quality signal
    with the two-pass distributed shape of LM quality scoring:

      pass 1: distributed document-frequency (distinct-per-doc word ->
              groupby(word).count) — the corpus-sized shuffle
      pass 2: broadcast the COMMON word set (bounded by Zipf: at most
              n_docs * mean_words / common_df words can clear the bar,
              so the broadcast shrinks as the threshold rises — never
              the vocabulary) and count each doc's tokens outside it

    Integer counts keep the DuckDB oracle hash-exact where a float LM
    logprob sum would drift by summation order.
    """

    def doc_words(batch: pa.Table) -> pa.Table:
        from .hashing import split_words

        ids, words = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            uniq = set(split_words(text))
            ids.extend([doc_id] * len(uniq))
            words.extend(sorted(uniq))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "word": pa.array(words, pa.string())}
        )

    from .hashing import normalize_text

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    df_tbl = (
        docs.map_batches(doc_words, batch_format="pyarrow")
        .groupby("word")
        .count()
    )

    def common_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch.column("count()"), common_df)
        ).select(["word"])

    common_tbl = pa.concat_tables(
        [t for t in ray.get(
            df_tbl.map_batches(common_only, batch_format="pyarrow").to_arrow_refs()
        ) if t.num_rows]
        or [pa.table({"word": pa.array([], pa.string())})]
    )
    common_ref = ray.put(frozenset(common_tbl.column("word").to_pylist()))

    def score(batch: pa.Table) -> pa.Table:
        from .hashing import split_words

        common = ray.get(common_ref)
        out = []
        for text in batch.column("text").to_pylist():
            uniq = set(split_words(text))
            out.append(sum(1 for w in uniq if w not in common))
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_rare_tokens": pa.array(out, pa.int64())}
        )

    out = docs.map_batches(score, batch_format="pyarrow")
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
    return tbl.sort_by([("doc_id", "ascending")])


def source_lang_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP aggregate: doc counts + char sums at three levels —
    (source, lang), per-source subtotal, grand total ('ALL' markers).

    Distributed rollup plan: ONE combiner groupby computes the finest
    level; the coarser levels are re-aggregations of that small result
    on the driver (|sources| x |langs| rows) — never a second corpus
    pass.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_docs": pa.array(np.ones(len(batch), np.int64)),
                "sum_chars": pa.array(
                    np.asarray(batch.column("n_chars"), dtype=np.int64)
                ),
            }
        )
        g = pa.TableGroupBy(t, ["source", "lang"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "sum_chars"])

    base = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .sum(["n_docs", "sum_chars"])
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs", "sum(sum_chars)": "sum_chars"})
    )
    lvl1 = base.groupby("source", as_index=False)[["n_docs", "sum_chars"]].sum()
    lvl1["lang"] = "ALL"
    total = pd.DataFrame(
        {"source": ["ALL"], "lang": ["ALL"],
         "n_docs": [base["n_docs"].sum()], "sum_chars": [base["sum_chars"].sum()]}
    )
    out = pd.concat([base, lvl1, total], ignore_index=True)
    for c in ("n_docs", "sum_chars"):
        out[c] = out[c].astype(np.int64)
    out = out[["source", "lang", "n_docs", "sum_chars"]].sort_values(
        ["source", "lang"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def long_tail_docs(sf_dir: str, q: float = 0.9) -> pa.Table:
    """Docs at or above the corpus-global q-quantile of ``n_chars`` —
    the compose-two-operators shape (global quantile, then a filtered
    read) behind "keep the longest decile" curation rules.

      1. the quantile comes from a distributed VALUE HISTOGRAM:
         groupby(n_chars).count is a tiny shuffle (distinct lengths,
         not docs); the driver walks the sorted histogram to the
         quantile_disc rank ceil(q*n) - 1 holding only (value, count)
         pairs — no doc values ever collect.
      2. the filter is pushed INTO the parquet read (row-group pruning
         via the n_chars statistics), so at 100 TB the re-read touches
         only row groups overlapping the tail.
    """
    import math

    import pyarrow.compute as pc

    hist = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
        .groupby("n_chars")
        .count()
        .take_all()
    )
    hist.sort(key=lambda r: r["n_chars"])
    n = sum(r["count()"] for r in hist)
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())}
        )
    rank = max(0, math.ceil(q * n) - 1)  # quantile_disc, 0-based
    seen = 0
    for r in hist:
        seen += r["count()"]
        if seen > rank:
            cut = int(r["n_chars"])
            break
    tail = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"],
        filter=pc.field("n_chars") >= cut,
    )
    tables = [t for t in ray.get(tail.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def customers_without_big_orders(
    sf_dir: str, min_total: float = 400_000.0
) -> pa.Table:
    """Customers with no order of ``o_totalprice >= min_total`` — the
    big-big ANTI-join shape (neither side broadcast), completing the
    join family next to the inner equi-join (``revenue_by_nation``) and
    the semi-joins (``purchaser_clicks`` / ``_bloom``).

    Ray shape:
      1. the orders side is pruned AT THE READ (column projection +
         row-group predicate on o_totalprice), then collapses to
         DISTINCT o_custkey via a combiner groupby (per-block partials,
         then a key-uniform shuffle bounded by distinct qualifying
         customers, not order count) — at 100 TB the anti-join's build
         side is |customers with a big order|, never |orders|
      2. native ``Dataset.join(join_type="left_anti")`` on
         c_custkey = o_custkey — one hash-partitioned all-to-all,
         output is only the non-matching customer rows.

    Partition count adapts to side sizes (Ray 2.49's hash join cannot
    finalize empty partitions, same guard as
    ``dedup.cross_snapshot_dupes``).
    """
    import pyarrow.compute as pc

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def norm_keys(batch: pa.Table) -> pa.Table:
        # empty shuffle partitions carry degenerate schemas (Ray 2.49)
        # which break the Acero join's key resolution
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64())})
        return pa.table({"o_custkey": batch.column("o_custkey")})

    okeys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filter=pc.field("o_totalprice") >= min_total,
        )
        .groupby("o_custkey")
        .count()
        .map_batches(norm_keys, batch_format="pyarrow")
        .materialize()
    )
    cust = cust.materialize()
    n_left, n_right = cust.count(), okeys.count()
    if n_left == 0:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string())}
        )
    if n_right == 0:
        # nothing to anti-join against: every customer survives (an
        # all-empty right side also loses its schema inside the hash
        # shuffle, so the join itself cannot run)
        tables = [t for t in ray.get(cust.to_arrow_refs()) if t.num_rows]
    else:
        nparts = max(1, min(16, min(n_left, n_right) // 16))
        joined = cust.join(
            okeys, "left_anti", nparts, on=("c_custkey",), right_on=("o_custkey",)
        )
        tables = [
            t.select(["c_custkey", "c_name"])
            for t in ray.get(joined.to_arrow_refs())
            if t.num_rows and "c_custkey" in t.column_names
        ]
    if not tables:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string())}
        )
    out = pa.concat_tables(tables).sort_by([("c_custkey", "ascending")])
    return out.set_column(
        0, "c_custkey", out.column("c_custkey").cast(pa.int64())
    )


def user_purchase_error_profile(sf_dir: str, num_partitions: int = 16) -> pa.Table:
    """Big-big FULL OUTER join: per-user purchase stats ⟗ per-user
    error stats over ``events`` — users that only purchased, only
    erred, or both, with zero-filled counts (the COALESCE convention).

    Ray shape: each side is first collapsed by a per-batch combiner +
    groupby(user) to at most one row per user (so the join input is
    users, not events), then native ``Dataset.join(full_outer)`` hash-
    partitions both sides — the canonical plan when NEITHER side fits
    in memory and BOTH sides can dangle (left_anti/semi handle one-
    sided questions; full outer answers the union profile in one
    pass). Null sides are zero-filled vectorized post-join.
    """
    import ray

    def side(event_type: str, out_n: str, out_cents: str):
        def partial(batch: pa.Table) -> pa.Table:
            et = batch.column("event_type").to_numpy(zero_copy_only=False)
            keep = et == event_type
            v = np.asarray(batch.column("value"), dtype=np.float64)[keep] * 100
            cents = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
            t = pa.table(
                {
                    "user_id": batch.column("user_id").filter(pa.array(keep)),
                    out_n: pa.array(np.ones(len(cents), np.int64)),
                    out_cents: pa.array(cents, pa.int64()),
                }
            )
            g = pa.TableGroupBy(t, ["user_id"]).aggregate(
                [(out_n, "sum"), (out_cents, "sum")]
            )
            return g.rename_columns(["user_id", out_n, out_cents])

        def norm(b: pa.Table) -> pa.Table:
            # empty shuffle partitions carry degenerate schemas (the
            # Ray 2.49 quirk _collect handles elsewhere); the join's
            # schema resolution needs every block identically shaped
            if b.num_rows == 0 or f"sum({out_n})" not in b.column_names:
                return pa.table(
                    {
                        "user_id": pa.array([], pa.int64()),
                        out_n: pa.array([], pa.int64()),
                        out_cents: pa.array([], pa.int64()),
                    }
                )
            return b.rename_columns(["user_id", out_n, out_cents])

        return (
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
            )
            .map_batches(partial, batch_format="pyarrow")
            .groupby("user_id")
            .sum([out_n, out_cents])
            .map_batches(norm, batch_format="pyarrow")
        )

    left = side("purchase", "n_purchases", "purchase_cents").materialize()
    right = side("error", "n_errors", "error_cents").materialize()
    # size the hash-join partition count to the data: all-empty shuffle
    # partitions crash Acero's key resolution (same guard
    # customers_without_big_orders applies)
    n_l, n_r = left.count(), right.count()
    nparts = max(1, min(num_partitions, min(n_l, n_r) // 16))
    joined = left.join(
        right,
        "full_outer",
        nparts,
        on=("user_id",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_purchases": pa.array([], pa.int64()),
                    "purchase_cents": pa.array([], pa.int64()),
                    "n_errors": pa.array([], pa.int64()),
                    "error_cents": pa.array([], pa.int64()),
                }
            )
        cols = {"user_id": pc.cast(batch.column("user_id"), pa.int64())}
        for c in ("n_purchases", "purchase_cents", "n_errors", "error_cents"):
            cols[c] = pc.cast(pc.fill_null(batch.column(c), 0), pa.int64())
        return pa.table(cols)

    tables = [
        t for t in ray.get(joined.map_batches(finish, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows
    ]
    if not tables:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_purchases": pa.array([], pa.int64()),
                "purchase_cents": pa.array([], pa.int64()),
                "n_errors": pa.array([], pa.int64()),
                "error_cents": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("user_id", "ascending")])


def shipping_priority(
    sf_dir: str,
    segment: str | None = None,
    cutoff_days: int = 45,
    k: int = 10,
) -> pa.Table:
    """TPC-H Q3 shape — top-k unshipped-order revenue for one market
    segment: customer(filter) ⋈ orders(date<cutoff) ⋈ lineitem
    (shipdate>cutoff), grouped by order, top-k by revenue.

    Parameters are DATA-DERIVED so the same query exercises any corpus
    (incl. the fuzz tables): segment defaults to min(c_mktsegment),
    cutoff to min(o_orderdate) + ``cutoff_days`` — both cheap pruned
    min-aggregates mirrored by scalar subqueries in the oracle.

    Ray shape (one broadcast, one big-big shuffle, one combiner):
      1. the customer side collapses to a qualifying c_custkey SET —
         pruned read + vectorized segment filter -> ray.put broadcast +
         sorted-array searchsorted membership inside the orders pass
         (at a scale where the segment's customers outgrow a broadcast,
         the swap is the native left_semi join ``ann_topk_filtered``
         demonstrates);
      2. orders and lineitem are both pruned AT THE READ (column
         projection + row-group predicates on the date columns);
      3. one native inner join on the order key (big-big, neither side
         collected), then per-batch integer revenue-cents partials
         keyed by (l_orderkey, o_orderdate) — exact int64
         cents x (100 - discount%) arithmetic, order-insensitive —
         and a key-uniform groupby sum;
      4. distributed sort + limit for the top-k tail (full tie-break).
    """
    import pyarrow.compute as pc

    import ray

    if segment is None:
        segment = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
        ).min("c_mktsegment")
    min_date = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    ).min("o_orderdate")
    cut = np.datetime64(min_date, "us") + np.timedelta64(
        cutoff_days * 86400_000_000, "us"
    )

    custs = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == segment,
    )
    keys = np.sort(
        np.concatenate(
            [
                np.asarray(t.column("c_custkey"), dtype=np.int64)
                for t in ray.get(custs.to_arrow_refs())
                if t.num_rows
            ]
            or [np.array([], np.int64)]
        )
    )
    key_ref = ray.put(keys)

    def seg_orders(batch: pa.Table) -> pa.Table:
        # o_orderdate travels as int64 MICROSECONDS through every
        # distributed stage: Ray's shuffle/aggregate boundaries round-
        # trip key columns through numpy and degrade timestamp
        # precision (us -> s); the cast back happens once at the end
        empty = pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "od_us": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return empty
        ks = ray.get(key_ref)
        if len(ks) == 0:
            return empty
        ck = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        pos = np.clip(np.searchsorted(ks, ck), 0, len(ks) - 1)
        m = pa.array(ks[pos] == ck)
        kept = batch.filter(m)
        return pa.table(
            {
                # join key named l_orderkey so the join needs no rename
                "l_orderkey": kept.column("o_orderkey"),
                "od_us": kept.column("o_orderdate").cast(pa.int64()),
            }
        )

    orders = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=pc.field("o_orderdate") < cut,
        )
        .map_batches(seg_orders, batch_format="pyarrow")
        .materialize()
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_extendedprice" not in batch.column_names:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                }
            )
        ep = np.asarray(batch.column("l_extendedprice"), dtype=np.float64)
        dc = np.asarray(batch.column("l_discount"), dtype=np.float64)
        ep_c = np.floor(ep * 100 + 0.5).astype(np.int64)
        dc_c = np.floor(dc * 100 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "rev": pa.array(ep_c * (100 - dc_c), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["l_orderkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    li = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
            filter=pc.field("l_shipdate") > cut,
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .materialize()
    )

    empty_i = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "od_us": pa.array([], pa.int64()),
            "revenue_c100": pa.array([], pa.int64()),
        }
    )
    empty = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "revenue_c100": pa.array([], pa.int64()),
        }
    )
    n_left, n_right = li.count(), orders.count()
    if n_left == 0 or n_right == 0:
        return empty
    nparts = max(1, min(16, min(n_left, n_right) // 16))
    joined = li.join(orders, "inner", nparts, on=("l_orderkey",))

    def post_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "rev" not in batch.column_names:
            return empty_i
        g = pa.TableGroupBy(batch, ["l_orderkey", "od_us"]).aggregate(
            [("rev", "sum")]
        )
        return g.rename_columns(["l_orderkey", "od_us", "revenue_c100"])

    from ray.data.aggregate import Sum

    top = (
        joined.map_batches(post_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "od_us"])
        .aggregate(Sum("revenue_c100"))
        .map_batches(
            lambda b: b.rename_columns(["l_orderkey", "od_us", "revenue_c100"])
            if b.num_rows
            else empty_i,
            batch_format="pyarrow",
        )
        .sort(
            ["revenue_c100", "od_us", "l_orderkey"],
            descending=[True, False, False],
        )
        .limit(k)
    )
    tables = [t for t in ray.get(top.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    out = pa.concat_tables(tables)
    return pa.table(
        {
            "l_orderkey": out.column("l_orderkey"),
            "o_orderdate": out.column("od_us").cast(pa.timestamp("us")),
            "revenue_c100": out.column("revenue_c100"),
        }
    )


def priority_sample(sf_dir: str, k: int = 100) -> pa.Table:
    """Weighted sample WITHOUT replacement, deterministic: the A-ES /
    Efraimidis-Spirakis priority sample — each doc gets key
    ``u^(1/w)`` (u = md5-derived uniform of doc_id, w = n_chars) and
    the global top-``k`` keys win, so longer docs are proportionally
    likelier but membership stays a pure function of the key set (the
    hash_sample reproducibility contract, now with weights — the
    standard trick for weighted corpus subsampling that must be stable
    across cluster sizes, restarts and block layouts).

    Distributed shape: per-block vectorized md5 (the in-repo
    DuckDB-parity kernel) + key computation + LOCAL top-k; the driver
    merges blocks x k candidate rows — no shuffle, no global sort.
    Float parity with the oracle: u and the pow() are the identical
    IEEE expression (`h / 2^64 + 0.5`, libm pow) on both sides.
    """
    from .hashing import md5_batch_int_ids

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "key": pa.array([], pa.float64()),
                }
            )
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        w = np.maximum(
            np.asarray(batch.column("n_chars"), dtype=np.int64), 1
        ).astype(np.float64)
        # DuckDB md5_number_lower is UNSIGNED; mirror with <u8
        h = md5_batch_int_ids(ids)[:, 8:16].copy().view("<u8").ravel()
        u = h.astype(np.float64) / 18446744073709551616.0
        key = np.power(u, 1.0 / w)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": pa.array(
                    np.asarray(batch.column("n_chars"), dtype=np.int64)[order],
                    pa.int64(),
                ),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
            )
            .map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    cand = pa.concat_tables(parts)
    ids = np.asarray(cand.column("doc_id"))
    nch = np.asarray(cand.column("n_chars"))
    key = np.asarray(cand.column("key"))
    order = np.lexsort((ids, -key))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_chars": pa.array(nch[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
        }
    )


@ray.remote
def _profile_block(tbl: pa.Table, tbl_name: str, cols: list, n_shards: int):
    """Per-block profile partial: per-column (rows, nulls) counters and
    the block's DISTINCT surrogate keys, hash-sharded so the merge
    parallelizes over (column x shard)."""
    from .hashing import md5_hash_tokens

    counters = {}
    shards = {}
    for c in cols:
        col = tbl.column(c)
        valid = col.drop_null()
        typ = col.type
        if pa.types.is_integer(typ):
            keys = np.unique(np.asarray(valid, dtype=np.int64))
        elif pa.types.is_timestamp(typ):
            keys = np.unique(np.asarray(valid.cast(pa.int64()), dtype=np.int64))
        elif pa.types.is_floating(typ):
            v = np.asarray(valid, dtype=np.float64)
            v = np.where(v == 0.0, 0.0, v)  # -0.0 == 0.0 under SQL DISTINCT
            keys = np.unique(v).view(np.int64)
        else:
            keys = np.unique(md5_hash_tokens(valid.to_pylist()).view(np.int64))
        counters[c] = (len(col), col.null_count)
        sh = (keys % n_shards + n_shards) % n_shards
        shards[c] = [keys[sh == p] for p in range(n_shards)]
    return counters, shards


@ray.remote
def _merge_distinct(arrs: list) -> int:
    """Count distinct over one (column, hash-shard): np.unique of the
    concatenated per-block distinct arrays (shards are disjoint, so
    per-shard counts sum exactly)."""
    if not arrs:
        return 0
    return int(len(np.unique(np.concatenate(arrs))))


def profile_tables(sf_dir: str) -> pa.Table:
    """Dataset profiler — the data-quality gate a pipeline runs before
    training ingest: per column of the core tables, row count, null
    count and EXACT distinct count, computed in one streaming pass per
    table.

    Distributed shape, per table:
      - one column-pruned-free full scan (profiling reads everything
        by nature); per block a vectorized partial emits (col, n,
        n_nulls) counters plus the IN-BLOCK DISTINCT (col, key) pairs,
        where key is a perfect int64 surrogate — the value itself for
        int/timestamp columns, the bit pattern for floats (-0.0
        normalized to 0.0, matching SQL DISTINCT's IEEE equality), and
        the vectorized md5-lower64 for strings (collision odds
        n^2/2^64, the exact_dedup digest-grouping precedent);
      - each block's distinct keys are HASH-SHARDED (key mod P) so the
        merge runs as (column x shard) ``np.unique`` tasks over
        disjoint key ranges whose counts sum exactly — a measured
        35x win over Ray 2.49's sort-based groupby for this shape
        (the aggregate's fixed partition overhead dwarfs 300k rows;
        see git history), and at web scale P simply grows with the
        per-column key volume;
      - the per-(table, col) row/null counters are metadata-sized and
        sum on the driver.

    List columns (embedding) are profiled for rows/nulls only —
    distinct-by-value on nested types is out of scope and the column
    is excluded on both sides. Oracle: UNION ALL of per-column
    count/count(DISTINCT) aggregates.
    """
    n_shards = 8
    specs = {
        "documents": ["doc_id", "text", "lang", "source", "n_chars"],
        "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
        "embeddings": ["vec_id", "label"],
    }
    futs = []
    meta = []
    for tbl_name, cols in specs.items():
        refs = ray.data.read_parquet(
            f"{sf_dir}/{tbl_name}.parquet", columns=cols
        ).to_arrow_refs()
        for r in refs:
            futs.append(_profile_block.remote(r, tbl_name, cols, n_shards))
            meta.append((tbl_name, cols))
    results = ray.get(futs)
    counters: dict = {}
    shard_arrs: dict = {}
    for (tbl_name, cols), (cnt, sh) in zip(meta, results):
        for c in cols:
            n, nn = cnt[c]
            k = (tbl_name, c)
            cn, cnn = counters.get(k, (0, 0))
            counters[k] = (cn + n, cnn + nn)
            for p in range(n_shards):
                shard_arrs.setdefault((k, p), []).append(sh[c][p])
    merge_futs = {key: _merge_distinct.remote(arrs) for key, arrs in shard_arrs.items()}
    merged = ray.get(list(merge_futs.values()))
    distinct: dict = {}
    for (k, _p), cnt in zip(merge_futs.keys(), merged):
        distinct[k] = distinct.get(k, 0) + cnt
    rows = sorted(counters.keys())
    return pa.table(
        {
            "tbl": pa.array([t for t, _ in rows], pa.string()),
            "col": pa.array([c for _, c in rows], pa.string()),
            "n_rows": pa.array([counters[k][0] for k in rows], pa.int64()),
            "n_nulls": pa.array([counters[k][1] for k in rows], pa.int64()),
            "n_distinct": pa.array([distinct.get(k, 0) for k in rows], pa.int64()),
        }
    )


def customer_order_histogram(sf_dir: str) -> pa.Table:
    """TPC-H Q13 shape — the distribution of per-customer order counts
    INCLUDING zero-order customers (the left-join-then-re-aggregate
    pattern: a histogram of group sizes).

    Distributed shape: per-batch o_custkey count partials -> one
    custkey-keyed groupby (the only data-sized shuffle) -> per-block
    histogram partials over the per-customer counts -> a tiny
    count-keyed combiner. The zero bucket needs no join at all:
    ``#customers - #distinct purchasers`` — customer existence is a
    COUNT, so the customer table contributes one number (computed with
    a pruned single-column read), not a join side.
    """
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return pa.table(
                {"c": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "c": batch.column("o_custkey"),
                    "n": pa.array(np.ones(batch.num_rows, np.int64)),
                }
            ),
            ["c"],
        ).aggregate([("n", "sum")])
        return g.rename_columns(["c", "n"])

    per_cust = orders.map_batches(partial, batch_format="pyarrow").groupby("c").sum("n")

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sum(n)" not in batch.column_names:
            return pa.table(
                {"n_orders": pa.array([], pa.int64()),
                 "n_customers": pa.array([], pa.int64())}
            )
        cnts = batch.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(cnts, return_counts=True)
        return pa.table(
            {
                "n_orders": pa.array(u, pa.int64()),
                "n_customers": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    # final histogram merge happens on the DRIVER: the per-block
    # partials are already count-domain-sized (distinct order-counts
    # per block), so a second Ray aggregate would pay the fixed
    # shuffle overhead to move a few dozen rows
    rows = [
        t
        for t in ray.get(
            per_cust.map_batches(hist_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    n_customers_total = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    if rows:
        tbl = pa.concat_tables(rows)
        ks = np.asarray(tbl.column("n_orders"), dtype=np.int64)
        vs = np.asarray(tbl.column("n_customers"), dtype=np.int64)
        n_ord = np.unique(ks)
        n_cust = np.zeros(len(n_ord), dtype=np.int64)
        np.add.at(n_cust, np.searchsorted(n_ord, ks), vs)
    else:
        n_ord = np.array([], dtype=np.int64)
        n_cust = np.array([], dtype=np.int64)
    zero = n_customers_total - int(n_cust.sum())
    if zero > 0:
        n_ord = np.concatenate([n_ord, [0]])
        n_cust = np.concatenate([n_cust, [zero]])
    order = np.argsort(n_ord)
    return pa.table(
        {
            "n_orders": pa.array(n_ord[order], pa.int64()),
            "n_customers": pa.array(n_cust[order], pa.int64()),
        }
    )


def local_supplier_volume(sf_dir: str) -> pa.Table:
    """TPC-H Q5 shape — revenue by nation from lineitems whose CUSTOMER
    and SUPPLIER share a nation, restricted to the region of the
    lexicographically-first region name (data-derived so any corpus
    exercises the filter) — the canonical multi-join: one BIG-BIG join
    plus every dimension broadcast.

    Distributed shape:
      - region -> nation -> {custkey: nation, suppkey: nation} lookup
        maps built once from the pruned dimension reads and
        ``ray.put`` ONCE (region/nation/customer/supplier are the
        textbook small sides);
      - the one data-sized join, orders ⋈ lineitem on orderkey, runs
        as a native hash join of the two pruned big reads (orders is
        pre-filtered to the region's customers with a vectorized
        broadcast semi before the shuffle — the Q3 discipline);
      - per-batch vectorized same-nation check + integer-cents
        revenue combiner -> tiny nation-keyed groupby.
    """
    import pyarrow.parquet as pq

    import ray

    region = pq.read_table(f"{sf_dir}/region.parquet")
    rname = min(region.column("r_name").to_pylist())
    rkey = region.column("r_regionkey").to_pylist()[
        region.column("r_name").to_pylist().index(rname)
    ]
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = np.asarray(nation.column("n_nationkey"), dtype=np.int64)
    nrk = np.asarray(nation.column("n_regionkey"), dtype=np.int64)
    region_nations = set(nk[nrk == rkey].tolist())
    names = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ck = np.asarray(cust.column("c_custkey"), dtype=np.int64)
    cn = np.asarray(cust.column("c_nationkey"), dtype=np.int64)
    o = np.argsort(ck)
    cust_ref = ray.put((ck[o], cn[o]))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    sk = np.asarray(supp.column("s_suppkey"), dtype=np.int64)
    sn = np.asarray(supp.column("s_nationkey"), dtype=np.int64)
    o = np.argsort(sk)
    supp_ref = ray.put((sk[o], sn[o]))
    rn_ref = ray.put(np.asarray(sorted(region_nations), dtype=np.int64))

    def orders_semi(batch: pa.Table) -> pa.Table:
        ks, ns = ray.get(cust_ref)
        rn = ray.get(rn_ref)
        ock = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        pos = np.clip(np.searchsorted(ks, ock), 0, len(ks) - 1)
        ok = ks[pos] == ock
        nat = np.where(ok, ns[pos], -1)
        keep = np.isin(nat, rn)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.asarray(batch.column("o_orderkey"), dtype=np.int64)[keep],
                    pa.int64(),
                ),
                "c_nation": pa.array(nat[keep], pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(orders_semi, batch_format="pyarrow")
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = lineitem.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_suppkey" not in batch.column_names:
            return pa.table(
                {
                    "n_nationkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        ks, ns = ray.get(supp_ref)
        lsk = np.asarray(batch.column("l_suppkey"), dtype=np.int64)
        pos = np.clip(np.searchsorted(ks, lsk), 0, len(ks) - 1)
        ok = ks[pos] == lsk
        s_nat = np.where(ok, ns[pos], -2)
        keep = s_nat == np.asarray(batch.column("c_nation"), dtype=np.int64)
        if not keep.any():
            return pa.table(
                {
                    "n_nationkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        ep = np.asarray(batch.column("l_extendedprice"), dtype=np.float64)[keep]
        dc = np.asarray(batch.column("l_discount"), dtype=np.float64)[keep]
        v = ep * (1.0 - dc) * 100
        cents = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        t = pa.table(
            {
                "n_nationkey": pa.array(s_nat[keep], pa.int64()),
                "revenue_cents": pa.array(cents, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["n_nationkey"]).aggregate([("revenue_cents", "sum")])
        return g.rename_columns(["n_nationkey", "revenue_cents"])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .sum("revenue_cents")
        .to_pandas()
    )
    if len(agg) == 0:
        return pa.table(
            {"n_name": pa.array([], pa.string()),
             "revenue_cents": pa.array([], pa.int64())}
        )
    agg = agg.rename(columns={"sum(revenue_cents)": "revenue_cents"})
    agg["n_name"] = agg["n_nationkey"].map(names)
    agg["revenue_cents"] = agg["revenue_cents"].astype(np.int64)
    agg = agg.sort_values(
        ["revenue_cents", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(agg[["n_name", "revenue_cents"]], preserve_index=False)


def brand_volume(sf_dir: str) -> pa.Table:
    """Per-brand shipped volume: lineitem ⋈ part (the last dimension
    table) -> per p_brand quantity and discounted revenue in exact
    cents. Part is the canonical broadcast side (one ``ray.put`` of
    two sorted arrays); lineitem streams through a vectorized
    searchsorted lookup + combiner — no shuffle beyond the tiny
    brand-keyed final groupby.
    """
    import pyarrow.parquet as pq

    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = np.asarray(part.column("p_partkey"), dtype=np.int64)
    brands = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    o = np.argsort(pk)
    uniq_brands = np.unique(brands.astype(str))
    bidx = np.searchsorted(uniq_brands, brands[o].astype(str))
    look_ref = ray.put((pk[o], bidx))
    brands_ref = ray.put(uniq_brands)

    def partial(batch: pa.Table) -> pa.Table:
        ks, bi = ray.get(look_ref)
        ub = ray.get(brands_ref)
        lpk = np.asarray(batch.column("l_partkey"), dtype=np.int64)
        pos = np.clip(np.searchsorted(ks, lpk), 0, len(ks) - 1)
        if (ks[pos] != lpk).any():
            raise ValueError("brand_volume: l_partkey missing from part")
        ep = np.asarray(batch.column("l_extendedprice"), dtype=np.float64)
        dc = np.asarray(batch.column("l_discount"), dtype=np.float64)
        v = ep * (1.0 - dc) * 100
        cents = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        t = pa.table(
            {
                "p_brand": pa.array(ub[bi[pos]].tolist(), pa.string()),
                "sum_qty": batch.column("l_quantity"),
                "revenue_cents": pa.array(cents, pa.int64()),
                "n_items": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["p_brand"]).aggregate(
            [("sum_qty", "sum"), ("revenue_cents", "sum"), ("n_items", "sum")]
        )
        return g.rename_columns(["p_brand", "sum_qty", "revenue_cents", "n_items"])

    final = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .sum(["sum_qty", "revenue_cents", "n_items"])
        .to_pandas()
        .rename(
            columns={
                "sum(sum_qty)": "sum_qty",
                "sum(revenue_cents)": "revenue_cents",
                "sum(n_items)": "n_items",
            }
        )
    )
    final["sum_qty"] = final["sum_qty"].astype(np.int64)
    final["revenue_cents"] = final["revenue_cents"].astype(np.int64)
    final["n_items"] = final["n_items"].astype(np.int64)
    final = final.sort_values("p_brand").reset_index(drop=True)
    return pa.Table.from_pandas(
        final[["p_brand", "n_items", "sum_qty", "revenue_cents"]], preserve_index=False
    )


def returned_item_customers(
    sf_dir: str, window_days: int = 90, k: int = 20
) -> pa.Table:
    """TPC-H Q10 shape — top-k customers by revenue lost to RETURNED
    items in one quarter: lineitem(returnflag='R') ⋈ orders(date in
    [min, min+window)) ⋈ customer ⋈ nation, grouped by customer,
    top-k by revenue. The window start is DATA-DERIVED (min order
    date), the flag is max(l_returnflag) (-> 'R' on the sf corpora,
    still well-defined on any fuzz corpus).

    Ray shape — the dimension join happens AFTER the top-k, so no
    customer-sized broadcast exists anywhere:
      1. lineitem pruned at the read (columns + returnflag predicate),
         reduced per batch to (l_orderkey, int-cents revenue) partials;
      2. orders pruned at the read (date predicates) -> (l_orderkey,
         o_custkey) map; one native big-big inner join on the order
         key; per-batch custkey partials + one custkey groupby;
      3. distributed sort + limit -> k rows on the driver;
      4. ONLY those k custkeys are enriched: customer read with an
         isin predicate (row-group pruned, k rows returned), nation
         read outright (25 rows) — a point lookup, not a join stage.
    """
    import pyarrow.compute as pc

    import ray

    flag = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag"]
    ).max("l_returnflag")
    lo = np.datetime64(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
        ).min("o_orderdate"),
        "us",
    )
    hi = lo + np.timedelta64(window_days * 86400_000_000, "us")

    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "revenue_c100": pa.array([], pa.int64()),
            "c_acctbal": pa.array([], pa.float64()),
            "n_name": pa.array([], pa.string()),
        }
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_extendedprice" not in batch.column_names:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "rev": pa.array([], pa.int64())}
            )
        ep_c = np.floor(
            np.asarray(batch.column("l_extendedprice"), np.float64) * 100 + 0.5
        ).astype(np.int64)
        dc_c = np.floor(
            np.asarray(batch.column("l_discount"), np.float64) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "rev": pa.array(ep_c * (100 - dc_c), pa.int64()),
            }
        )
        return pa.TableGroupBy(t, ["l_orderkey"]).aggregate(
            [("rev", "sum")]
        ).rename_columns(["l_orderkey", "rev"])

    li = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
            filter=pc.field("l_returnflag") == flag,
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .materialize()
    )
    orders = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey"],
            filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": b.column("o_orderkey"),
                    "o_custkey": b.column("o_custkey"),
                }
            )
            if b.num_rows and "o_orderkey" in b.column_names
            else pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "o_custkey": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_left, n_right = li.count(), orders.count()
    if n_left == 0 or n_right == 0:
        return empty
    nparts = max(1, min(16, min(n_left, n_right) // 16))
    joined = li.join(orders, "inner", nparts, on=("l_orderkey",))

    empty_ck = pa.table(
        {"o_custkey": pa.array([], pa.int64()),
         "revenue_c100": pa.array([], pa.int64())}
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "rev" not in batch.column_names:
            return empty_ck
        return pa.TableGroupBy(batch, ["o_custkey"]).aggregate(
            [("rev", "sum")]
        ).rename_columns(["o_custkey", "revenue_c100"])

    from ray.data.aggregate import Sum

    top = (
        joined.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("revenue_c100"))
        .map_batches(
            lambda b: b.rename_columns(["o_custkey", "revenue_c100"])
            if b.num_rows
            else empty_ck,
            batch_format="pyarrow",
        )
        .sort(["revenue_c100", "o_custkey"], descending=[True, False])
        .limit(k)
    )
    tables = [t for t in ray.get(top.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    tk = pa.concat_tables(tables)
    cks = np.asarray(tk.column("o_custkey"), dtype=np.int64)
    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
            filter=pc.field("c_custkey").isin(cks.tolist()),
        )
        .to_pandas()
        .set_index("c_custkey")
    )
    nat = (
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        .to_pandas()
        .set_index("n_nationkey")["n_name"]
    )
    return pa.table(
        {
            "c_custkey": pa.array(cks, pa.int64()),
            "c_name": pa.array(
                [cust.loc[c, "c_name"] for c in cks], pa.string()
            ),
            "revenue_c100": tk.column("revenue_c100"),
            "c_acctbal": pa.array(
                [float(cust.loc[c, "c_acctbal"]) for c in cks], pa.float64()
            ),
            "n_name": pa.array(
                [nat[cust.loc[c, "c_nationkey"]] for c in cks], pa.string()
            ),
        }
    )


def forecast_revenue(sf_dir: str, window_days: int = 365) -> pa.Table:
    """TPC-H Q6 shape — the what-if revenue delta from discounts in a
    band: one filtered scan of lineitem, revenue = Σ extendedprice ×
    discount over (shipdate in [min, min+window), discount-cents in
    [dmin+1, dmin+3], quantity < 25). Every parameter is data-derived.

    The simplest possible distributed plan, shown because the READ does
    all the work: column projection + row-group predicates prune at the
    source, each batch reduces to ONE (revenue, count) integer partial
    (cents × cents -> c10000 units, order-free), and the driver sums
    O(blocks) scalars. No shuffle, no groupby, nothing corpus-sized.
    """
    import pyarrow.compute as pc

    import ray

    lo = np.datetime64(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_shipdate"]
        ).min("l_shipdate"),
        "us",
    )
    hi = lo + np.timedelta64(window_days * 86400_000_000, "us")
    dmin = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount"]
    ).min("l_discount")
    dmin_c = int(np.floor(dmin * 100 + 0.5))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_extendedprice" not in batch.column_names:
            return pa.table(
                {"rev": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        ep_c = np.floor(
            np.asarray(batch.column("l_extendedprice"), np.float64) * 100 + 0.5
        ).astype(np.int64)
        dc_c = np.floor(
            np.asarray(batch.column("l_discount"), np.float64) * 100 + 0.5
        ).astype(np.int64)
        qty = np.asarray(batch.column("l_quantity"), np.float64)
        m = (dc_c >= dmin_c + 1) & (dc_c <= dmin_c + 3) & (qty < 25)
        return pa.table(
            {
                "rev": pa.array([int((ep_c[m] * dc_c[m]).sum())], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_extendedprice", "l_discount", "l_quantity"],
                filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
            )
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    rev = sum(t.column("rev").to_pylist()[0] for t in parts) if parts else 0
    n = sum(t.column("n").to_pylist()[0] for t in parts) if parts else 0
    return pa.table(
        {
            "revenue_c10000": pa.array([rev], pa.int64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


def dataset_mixture(sf_dir: str) -> pa.Table:
    """Data-MIXTURE construction (the Pile / LLM-pretraining reweighting
    verb): rebalance the corpus so every source contributes equally by
    tokens, emitting per-document repeat counts — n_repeats = floor(f_s)
    plus one stochastic-rounding extra with probability frac(f_s),
    where f_s = (T/k)/tokens_s is the source's up/down-sampling factor.
    The stochastic rounding is DERANDOMIZED the engine way: the extra
    repeat fires iff the doc's md5-uniform (first 4 digest bytes) falls
    below floor(frac·2^32) — a pure function of doc_id, reproducible
    across cluster sizes and restarts, and exactly replicated in SQL
    via the lexicographic hex compare (`hash_sample` precedent).

    Distributed shape: pass 1 is a per-source token-sum combiner
    (source domain is tiny); the driver computes the k factors with
    the same double expression the oracle uses and broadcasts the
    {source: (base, threshold)} map; pass 2 is one stateless
    vectorized map. Nothing corpus-sized leaves the blocks.
    """
    from .hashing import md5_batch_int_ids
    from .text_analysis import _TOKEN

    def tok_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "source" not in batch.column_names:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "t": pa.array([], pa.int64())}
            )
        nt = np.array(
            [len(_TOKEN.findall(t or "")) for t in batch.column("text").to_pylist()],
            dtype=np.int64,
        )
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        uniq, inv = np.unique(src, return_inverse=True)
        sums = np.bincount(inv, weights=nt).astype(np.int64)
        return pa.table(
            {"source": pa.array(list(uniq), pa.string()),
             "t": pa.array(sums, pa.int64())}
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["source", "text"]
            )
            .map_batches(tok_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "source": pa.array([], pa.string()),
         "n_repeats": pa.array([], pa.int64())}
    )
    if not parts:
        return empty
    agg: dict[str, int] = {}
    for t in parts:
        for s, v in zip(t.column("source").to_pylist(), t.column("t").to_pylist()):
            agg[s] = agg.get(s, 0) + int(v)
    total = sum(agg.values())
    k = len(agg)
    plan: dict[str, tuple[int, int]] = {}
    for s, ts in agg.items():
        # identical double expression to the oracle: (T/k)/ts
        factor = (np.float64(total) / k) / np.float64(ts) if ts else 0.0
        base = int(np.floor(factor))
        thresh = int(np.floor((factor - np.floor(factor)) * 4294967296.0))
        plan[s] = (base, thresh)
    plan_ref = ray.put(plan)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        pl = ray.get(plan_ref)
        ids = np.asarray(batch.column("doc_id"))
        srcs = batch.column("source").to_pylist()
        u32 = md5_batch_int_ids(ids)[:, :4].copy().view(">u4").ravel()
        base = np.fromiter((pl[s][0] for s in srcs), np.int64, len(srcs))
        th = np.fromiter((pl[s][1] for s in srcs), np.int64, len(srcs))
        reps = base + (u32.astype(np.int64) < th).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_repeats": pa.array(reps, pa.int64()),
            }
        )

    out = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(assign, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def source_lang_cube(sf_dir: str) -> pa.Table:
    """CUBE aggregate — the remaining OLAP grouping verb next to the
    ROLLUP: doc counts + char sums for ALL 2^k grouping sets of
    (source, lang): (source, lang), (source, *), (*, lang), (*, *),
    'ALL' markers for the collapsed dimensions.

    Same distributed plan as ``source_lang_rollup``: ONE combiner
    groupby computes the finest cell; every coarser grouping set is a
    re-aggregation of that |sources|x|langs| result on the driver —
    the corpus is scanned once regardless of how many grouping sets
    the cube expands to.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_docs": pa.array(np.ones(len(batch), np.int64)),
                "sum_chars": pa.array(
                    np.asarray(batch.column("n_chars"), dtype=np.int64)
                ),
            }
        )
        g = pa.TableGroupBy(t, ["source", "lang"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "sum_chars"])

    base = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .sum(["n_docs", "sum_chars"])
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs", "sum(sum_chars)": "sum_chars"})
    )
    by_source = base.groupby("source", as_index=False)[["n_docs", "sum_chars"]].sum()
    by_source["lang"] = "ALL"
    by_lang = base.groupby("lang", as_index=False)[["n_docs", "sum_chars"]].sum()
    by_lang["source"] = "ALL"
    total = pd.DataFrame(
        {"source": ["ALL"], "lang": ["ALL"],
         "n_docs": [base["n_docs"].sum()], "sum_chars": [base["sum_chars"].sum()]}
    )
    out = pd.concat([base, by_source, by_lang, total], ignore_index=True)
    for c in ("n_docs", "sum_chars"):
        out[c] = out[c].astype(np.int64)
    out = out[["source", "lang", "n_docs", "sum_chars"]].sort_values(
        ["source", "lang"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def table_checksum(sf_dir: str) -> pa.Table:
    """Order-independent CONTENT CHECKSUM of the documents table — the
    replication/migration verification verb: two copies of a corpus
    match iff (n_rows, checksum) match, regardless of row order, block
    layout or cluster size. checksum = exact integer sum of
    md5-lower64(doc_id || '|' || text) over all rows (emitted as a
    string: the sum exceeds int64; Python ints and the oracle's
    HUGEINT are both exact).

    Pure combiner: each block reduces to one (count, sum) partial —
    addition is commutative/associative so the reduce is order-free —
    and the driver folds O(blocks) Python ints. No shuffle.
    """
    from .hashing import md5_hash64

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {"n": pa.array([], pa.int64()), "s": pa.array([], pa.string())}
            )
        total = 0
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            total += md5_hash64(f"{doc_id}|{text or ''}")
        return pa.table(
            {"n": pa.array([batch.num_rows], pa.int64()),
             "s": pa.array([str(total)], pa.string())}
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            )
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    n = sum(int(x) for t in parts for x in t.column("n").to_pylist())
    s = sum(int(x) for t in parts for x in t.column("s").to_pylist())
    return pa.table(
        {"n_rows": pa.array([n], pa.int64()),
         "checksum": pa.array([str(s)], pa.string())}
    )
