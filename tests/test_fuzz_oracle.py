"""Randomized oracle fuzz: run the SQL-oracled queries() entries
against DuckDB on GENERATED adversarial tables rather than the sf
fixtures — duplicate timestamps, tied values, negatives, half-cent
rounding boundaries, mega-user skew, duplicate / whitespace-variant /
empty documents, degenerate embedding dims. The sf corpora are
well-behaved; this file is where the edge semantics (RANGE peer rules,
rank ties, round() half-away, NaN guards, span-0 quantization) earn
their keep.

Everything reuses entry_api.queries() / oracle_sql() verbatim — both
are parameterized by the data directory, so the whole driver gate runs
unchanged over the fuzz tables.
"""

from __future__ import annotations

import json
import tempfile

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _gen_events(rng: np.random.Generator, n: int = 600) -> pa.Table:
    base = np.datetime64("2024-01-05T00:00:00", "us").astype(np.int64)
    # duplicate-heavy ts pool + a spread + one far outlier
    pool = np.sort(rng.integers(0, 5 * 86400_000_000, 40))
    offs = np.where(
        rng.random(n) < 0.5,
        rng.choice(pool, n),
        rng.integers(0, 20 * 86400_000_000, n),
    )
    offs[0] = 24 * 86400_000_000 * 24  # lone far-future event
    user = np.where(
        rng.random(n) < 0.4, 3, rng.integers(0, 12, n)
    ).astype(np.int64)  # mega-user skew
    et = rng.choice(EVENT_TYPES, n)
    et[:5] = EVENT_TYPES  # every type present
    # tied + boundary + negative + duplicate values
    v = np.round(rng.uniform(0, 560, n), 2)
    tie_pool = np.array([7.0, 7.0, 0.0, 1.005, 2.675, -5.25, 123.455])
    tie_idx = rng.random(n) < 0.35
    v[tie_idx] = rng.choice(tie_pool, int(tie_idx.sum()))
    props = np.array(
        [
            json.dumps({"k": int(k)}) if p < 0.8 else ("{}" if p < 0.9 else None)
            for k, p in zip(rng.integers(-5, 120, n), rng.random(n))
        ],
        dtype=object,
    )
    return pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(base + offs, pa.timestamp("us")),
            "user_id": pa.array(user),
            "event_type": pa.array(list(et), pa.string()),
            "value": pa.array(v, pa.float64()),
            "props": pa.array(list(props), pa.string()),
        }
    )


_VOCAB = ["alpha", "beta", "gamma", "delta", "the", "of", "is", "x1", "no2",
          "zz", "qq", "mid"]


def _gen_documents(rng: np.random.Generator, n: int = 80) -> pa.Table:
    texts: list[str] = []
    for i in range(n):
        k = int(rng.integers(3, 40))
        words = list(rng.choice(_VOCAB, k))
        sep = rng.choice([" ", "  ", "\t", " \n"], k).tolist()
        texts.append("".join(w + s for w, s in zip(words, sep)).rstrip())
    texts[0] = ""  # empty doc
    texts[1] = "short"
    for j in (5, 11, 17, 23):  # exact duplicate cluster
        texts[j] = "the quick alpha beta gamma delta of is zz qq mid x1"
    texts[7] = "the  quick\talpha beta gamma delta of is zz qq mid x1"  # ws variant
    texts[9] = "mail me at foo.bar@example.com or 10.0.0.1 ok"  # PII
    # a shared 8-gram across two non-identical docs
    shared = "one two three four five six seven eight"
    texts[13] = shared + " tail a"
    texts[19] = "head b " + shared
    lang = rng.choice(["en", "es", "pt"], n)
    source = rng.choice(["web", "mail", "scan"], n)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(list(lang), pa.string()),
            "source": pa.array(list(source), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def _gen_embeddings(rng: np.random.Generator, n: int = 40, d: int = 8) -> pa.Table:
    m = rng.normal(0, 1, (n, d)).astype(np.float32)
    m[:, 2] = 0.125  # constant dim: quantization span == 0
    m[4] = m[3]  # duplicate vector
    m[6] = 1e-8  # near-zero vector
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 4, n).astype(np.int32)),
        }
    )


EVENT_QUERIES = [
    "tumbling_counts", "hopping_counts", "sessionize", "sessionize_scan",
    "running_totals", "user_value_windows", "asof_join", "range_join",
    "time_to_conversion",
    "distinct_users", "value_quantiles", "value_quantiles_cont",
    "value_ntiles", "value_mad", "value_ranks", "value_mode", "value_trend",
    "zscore_outliers", "value_histogram", "daily_type_pivot",
    "daily_type_unpivot", "daily_new_users", "retention_cohorts",
    "funnel_counts", "user_journeys", "props_k_stats", "purchaser_clicks",
    "approx_distinct_users", "approx_quantiles_kmv",
    "purchaser_clicks_salted", "purchaser_clicks_auto",
    "purchaser_clicks_bloom",
    "user_purchase_error_profile", "rolling_active_users",
    "top_values_with_ties", "throttled_events", "event_transitions",
    "debounced_events", "interval_coverage", "item_cooccurrence",
    "triangle_count", "daily_counts_filled", "max_concurrency",
    "trimmed_mean", "decayed_user_scores", "event_session_ids",
    "incremental_tumbling_counts", "late_event_counts",
]

DOC_QUERIES = [
    "token_counts", "quality_scores", "fingerprints", "winnow_fingerprints",
    "fingerprint_matches", "text_normalize",
    "lang_id", "lang_mismatch", "exact_dedup", "simhash", "distinctive_terms",
    "dup_ngram_spans", "latest_doc_versions", "chunk_documents",
    "redact_pii", "hash_sample", "source_stats", "source_lang_rollup",
    "source_lang_cube",
    "top_docs_by_words", "snapshot_set_ops", "cross_snapshot_dupes",
    "minhash_pairs", "ngram_jaccard", "containment_pairs", "simhash_pairs",
    "cross_snapshot_neardup_idx",
    "rare_token_scores", "lm_doc_scores", "dsir_weights",
    "entropy_scores", "source_divergence",
    "repetition_scores", "bigram_counts", "doc_bigram_novelty", "singleton_docs", "dataset_splits",
    "leakage_safe_splits",
    "packed_sequences",
    "neardup_clusters", "neardup_clusters_fast",
    "curation_status", "curation_rates_by_source", "canonical_docs",
    "heavy_tokens",
    "top_docs_per_source", "stratified_sample", "long_tail_docs",
    "benchmark_contamination", "fuzzy_token_pairs", "cms_token_counts",
    "priority_sample", "text_search", "ranked_text_search", "phrase_search",
    "bm25_search", "text_search_incr",
    "token_canonical_map", "skyline_docs", "dataset_mixture",
    "table_checksum", "vocab_coverage", "dataset_card", "shuffle_shards",
    # round-5 additions over the plain documents table
    "gopher_filters", "blocklist_hits", "ttr_scores",
    "pii_rates_by_source", "cdc_chunks", "cdc_dup_chunks",
    "dedup_clean_docs", "soft_dedup_weights", "dup_doc_fraction",
    "ccnet_buckets", "quality_classifier", "dsir_sample",
    "source_overlap", "cross_snapshot_neardup",
    "docs_in_char_range", "docs_in_char_lang_box",
    "sorted_neighborhood_pairs",
]

TPCH_QUERIES = [
    "pricing_summary", "orders_by_nation", "revenue_by_nation",
    "customers_without_big_orders", "shipping_priority",
    "customer_order_histogram", "local_supplier_volume", "brand_volume",
    "returned_item_customers", "forecast_revenue",
]



def _gen_tpch(rng: np.random.Generator, d: str) -> None:
    n_nat, n_cust, n_ord, n_li = 6, 30, 200, 600
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int32)),
            "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)], pa.string()),
            "n_regionkey": pa.array((np.arange(n_nat) % 3).astype(np.int32)),
        }
    )
    # every custkey references a valid nation (orders_by_nation fails
    # loudly on dangling keys by design); one customer has NO orders
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:05d}" for i in range(1, n_cust + 1)]),
            "c_nationkey": pa.array(
                rng.integers(0, n_nat, n_cust).astype(np.int32)
            ),
            "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
            "c_mktsegment": pa.array(
                list(rng.choice(["AUTO", "HOUSE", "SHIP"], n_cust)), pa.string()
            ),
        }
    )
    ock = rng.integers(1, n_cust, n_ord).astype(np.int64)  # customer n_cust dangles
    price = np.round(rng.uniform(900, 470000, n_ord), 2)
    price[:8] = [400000.0, 399999.995, 400000.005, 123.455, 0.0, 449999.99,
                 400000.01, 65432.105]  # threshold + rounding edges
    base_day = np.datetime64("2024-02-01", "us").astype(np.int64)
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_custkey": pa.array(ock),
            "o_orderstatus": pa.array(list(rng.choice(["O", "F", "P"], n_ord))),
            "o_totalprice": pa.array(price, pa.float64()),
            "o_orderdate": pa.array(
                base_day + rng.integers(0, 90, n_ord) * 86400_000_000,
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(list(rng.choice(["1-URGENT", "3-LOW"], n_ord))),
        }
    )
    lok = rng.integers(1, n_ord + 1, n_li).astype(np.int64)
    ep = np.round(rng.uniform(1, 95000, n_li), 2)
    ep[:4] = [0.005, 1.015, 999.995, 0.0]
    disc = np.round(rng.choice([0.0, 0.01, 0.05, 0.1], n_li), 2)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(lok),
            "l_partkey": pa.array(rng.integers(1, 50, n_li).astype(np.int64)),
            "l_suppkey": pa.array(rng.integers(1, 10, n_li).astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 7, n_li).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 50, n_li).astype(np.float64)),
            "l_extendedprice": pa.array(ep, pa.float64()),
            "l_discount": pa.array(disc, pa.float64()),
            "l_tax": pa.array(np.round(rng.choice([0.0, 0.04], n_li), 2)),
            "l_returnflag": pa.array(list(rng.choice(["A", "N", "R"], n_li))),
            "l_linestatus": pa.array(list(rng.choice(["O", "F"], n_li))),
            "l_shipdate": pa.array(
                base_day + rng.integers(0, 120, n_li) * 86400_000_000,
                pa.timestamp("us"),
            ),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(3, dtype=np.int32)),
            "r_name": pa.array([f"REGION_{i}" for i in range(3)], pa.string()),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(1, 11, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:03d}" for i in range(1, 11)]),
            "s_nationkey": pa.array(rng.integers(0, n_nat, 10).astype(np.int32)),
            "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, 10), 2)),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(1, 51, dtype=np.int64)),
            "p_name": pa.array([f"part {i}" for i in range(1, 51)]),
            "p_brand": pa.array(
                list(rng.choice(["Brand#1", "Brand#2", "Brand#3"], 50)), pa.string()
            ),
            "p_type": pa.array(list(rng.choice(["STD", "ECO"], 50)), pa.string()),
            "p_size": pa.array(rng.integers(1, 50, 50).astype(np.int32)),
            "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, 50), 2)),
        }
    )
    for name, tbl in [("nation", nation), ("customer", cust),
                      ("orders", orders), ("lineitem", lineitem),
                      ("region", region), ("supplier", supplier),
                      ("part", part)]:
        pq.write_table(tbl, f"{d}/{name}.parquet")


EMB_QUERIES = ["embedding_quantize", "ann_topk", "embedding_neardup",
               "ann_topk_quantized", "knn_join", "dbscan_clusters",
               "embedding_drift", "ann_lsh_topk", "ann_topk_filtered",
               "ann_ivf_exhaustive", "graph_pagerank", "graph_hits",
               "embedding_components", "kcore_members", "clustering_coefficients",
               "graph_communities", "mmr_diverse_topk"]


@pytest.mark.usefixtures("ray_session")
class TestFuzzOracle:
    @staticmethod
    def _run(sf_dir: str, names: list[str]):
        from ocr_service_ray.pipeline import entry_api

        qs = entry_api.queries()
        oracles = entry_api.oracle_sql()
        con = duckdb.connect()
        import os

        for t in ("events", "documents", "embeddings", "nation",
                  "customer", "orders", "lineitem", "region", "supplier",
                  "part"):
            if os.path.exists(f"{sf_dir}/{t}.parquet"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
        failures = []
        for name in names:
            got = qs[name](sf_dir)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            got = pd.DataFrame(got)
            want = con.execute(oracles[name]).df()
            g = got[sorted(got.columns)].sort_values(
                sorted(got.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(
                sorted(want.columns)).reset_index(drop=True)
            try:
                assert list(g.columns) == list(w.columns), "columns"
                assert len(g) == len(w), f"rows {len(g)} != {len(w)}"
                for c in g.columns:
                    a, b = g[c], w[c]
                    if a.dtype != b.dtype:
                        b = b.astype(a.dtype)
                    pd.testing.assert_series_equal(a, b, check_names=False)
            except AssertionError as e:
                failures.append(f"{name}: {e}")
        assert not failures, "\n".join(failures)

    @pytest.mark.parametrize("seed", [3, 17, 29])
    def test_events_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        d = tempfile.mkdtemp(prefix=f"fuzz_ev_{seed}_")
        pq.write_table(_gen_events(rng), f"{d}/events.parquet")
        self._run(d, EVENT_QUERIES)

    @pytest.mark.parametrize("seed", [7, 19])
    def test_documents_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        d = tempfile.mkdtemp(prefix=f"fuzz_doc_{seed}_")
        pq.write_table(_gen_documents(rng), f"{d}/documents.parquet")
        self._run(d, DOC_QUERIES)

    @pytest.mark.parametrize("seed", [13, 23])
    def test_tpch_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        d = tempfile.mkdtemp(prefix=f"fuzz_tpch_{seed}_")
        _gen_tpch(rng, d)
        self._run(d, TPCH_QUERIES)

    @pytest.mark.parametrize("seed", [11, 31])
    def test_embeddings_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        d = tempfile.mkdtemp(prefix=f"fuzz_emb_{seed}_")
        pq.write_table(_gen_embeddings(rng), f"{d}/embeddings.parquet")
        pq.write_table(_gen_documents(rng, n=40), f"{d}/documents.parquet")
        self._run(d, EMB_QUERIES)


@pytest.mark.usefixtures("ray_session")
class TestFuzzProfile:
    @pytest.mark.parametrize("seed", [23])
    def test_profile_tables_fuzz(self, seed):
        """profile_tables needs documents+events+embeddings in ONE dir;
        nulls in props and duplicate/near-zero vectors exercise the
        null-count and float-surrogate paths."""
        rng = np.random.default_rng(seed)
        d = tempfile.mkdtemp(prefix="fuzz_prof_")
        pq.write_table(_gen_events(rng), f"{d}/events.parquet")
        pq.write_table(_gen_documents(rng), f"{d}/documents.parquet")
        pq.write_table(_gen_embeddings(rng), f"{d}/embeddings.parquet")
        TestFuzzOracle._run(d, ["profile_tables"])


@pytest.mark.usefixtures("ray_session")
class TestFuzzNoOracleOps:
    """Adversarial robustness for the no_oracle operators (their
    correctness is reference-pinned in test_analytics; here we assert
    structural invariants survive the hostile generators: constant
    dims, duplicate and near-zero vectors, degenerate texts)."""

    @pytest.mark.parametrize("seed", [11])
    def test_semantic_dedup_and_pca_on_adversarial_embeddings(self, seed):
        from ocr_service_ray.analytics.dedup import semantic_dedup
        from ocr_service_ray.analytics.similarity import embedding_pca, pca_fit

        rng = np.random.default_rng(seed)
        d = tempfile.mkdtemp(prefix=f"fuzz_noq_{seed}_")
        pq.write_table(_gen_embeddings(rng), f"{d}/embeddings.parquet")

        out = semantic_dedup(d).to_pandas()
        assert len(out) == 40 and out["vec_id"].is_monotonic_increasing
        # the planted exact duplicate (4 == 3) lands in the same
        # cluster and must be dropped in favor of the lower id
        dup = out.set_index("vec_id").loc[4]
        assert not dup["keep"] and int(dup["dup_of"]) == 3
        assert out[out["keep"]]["dup_of"].isna().all()

        proj = embedding_pca(d).to_pandas()
        assert len(proj) == 40 and proj.notna().all().all()
        _, comps, evals = pca_fit(d)
        assert (evals >= -1e-12).all()  # covariance PSD despite const dim
        assert np.isfinite(comps).all()
        # duplicate vectors project identically
        p3 = proj.set_index("vec_id").loc[3].to_numpy()
        p4 = proj.set_index("vec_id").loc[4].to_numpy()
        assert (p3 == p4).all()

    @pytest.mark.parametrize("seed", [7])
    def test_bpe_encode_on_adversarial_documents(self, seed):
        import re

        from ocr_service_ray.analytics.text_analysis import bpe_encode

        rng = np.random.default_rng(seed)
        d = tempfile.mkdtemp(prefix=f"fuzz_bpe_{seed}_")
        docs = _gen_documents(rng)
        pq.write_table(docs, f"{d}/documents.parquet")
        out = bpe_encode(d).to_pandas().set_index("doc_id")
        assert len(out) == docs.num_rows
        for did, text in zip(docs.column("doc_id").to_pylist(),
                             docs.column("text").to_pylist()):
            words = re.findall(r"[a-z0-9]+", (text or "").lower())
            chars = sum(len(w) for w in words)
            r = out.loc[did]
            assert int(r["n_words"]) == len(words)
            assert len(words) <= int(r["n_tokens"]) <= chars or (
                not words and int(r["n_tokens"]) == 0
            )
