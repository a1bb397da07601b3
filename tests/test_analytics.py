"""Analytics operators: local-unit + Ray-vs-DuckDB oracle equivalence.

Mirrors the driver's correctness gate at tiny cost (sf0.001 tables).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_service_ray.analytics.hashing import (
    MinHasher,
    hash_tokens,
    jaccard,
    normalize_text,
    shingles,
    simhash64,
)

SF = "/root/testdata/sf0.001"


class TestHashing:
    def test_md5_batch_parity_with_hashlib(self):
        import hashlib
        import random

        from ocr_service_ray.analytics.hashing import (
            md5_batch,
            md5_batch_int_ids,
            md5_hash64,
            md5_hash_tokens,
        )

        rng = random.Random(1)
        msgs = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 56)))
                for _ in range(2000)]
        want = np.stack([np.frombuffer(hashlib.md5(m).digest(), np.uint8)
                         for m in msgs])
        assert (md5_batch(msgs) == want).all()
        with pytest.raises(ValueError):
            md5_batch([b"x" * 56])

        ids = np.array(
            [0, 1, 9, 10, 99, 100, 12345, 10**17, 10**18 - 1]
            + [rng.randrange(10**12) for _ in range(3000)], np.int64)
        want = np.stack([np.frombuffer(hashlib.md5(str(i).encode()).digest(),
                                       np.uint8) for i in ids])
        assert (md5_batch_int_ids(ids) == want).all()

        # token path: short vectorized leg + long-token hashlib fallback
        toks = ["", "a", "hello", "x" * 55, "y" * 56, "z" * 200, "café", "日本語"]
        assert (md5_hash_tokens(toks)
                == np.array([md5_hash64(t) for t in toks], np.uint64)).all()

    def test_normalize_matches_sql_form(self):
        con = duckdb.connect()
        for s in ["  A  b\tC ", "x", "", "a\n\nb"]:
            want = con.execute(
                "SELECT trim(regexp_replace(lower(?), '\\s+', ' ', 'g'))", [s]
            ).fetchone()[0]
            assert normalize_text(s) == want

    def test_mulmod_exact(self):
        rng = np.random.default_rng(5)
        a = rng.integers(1, 2**61 - 1, 200, dtype=np.uint64)
        b = rng.integers(1, 2**61 - 1, 200, dtype=np.uint64)
        got = MinHasher._mulmod(a, b)
        want = (a.astype(object) * b.astype(object)) % (2**61 - 1)
        assert all(int(g) == int(w) for g, w in zip(got, want))

    def test_minhash_estimates_jaccard(self):
        mh = MinHasher(num_perm=128, seed=1)
        sa = [f"w{i}" for i in range(100)]
        sb = [f"w{i}" for i in range(80)] + [f"x{i}" for i in range(20)]
        siga = mh.signature(hash_tokens(sa))
        sigb = mh.signature(hash_tokens(sb))
        est = (siga == sigb).mean()
        true_j = jaccard(set(sa), set(sb))
        assert abs(est - true_j) < 0.15

    def test_simhash_locality(self):
        base = [f"w{i}" for i in range(100)]
        near = base[:-1] + ["zzz"]
        far = [f"q{i}" for i in range(100)]
        h = simhash64(hash_tokens(base))
        assert bin(h ^ simhash64(hash_tokens(near))).count("1") < 10
        assert bin(h ^ simhash64(hash_tokens(far))).count("1") > 15

    def test_shingles(self):
        assert shingles("a b c d", 3) == ["a b c", "b c d"]
        assert shingles("a b", 3) == ["a b"]
        assert shingles("", 3) == []

    def test_signature_deterministic_across_calls(self):
        mh1, mh2 = MinHasher(32, seed=1), MinHasher(32, seed=1)
        h = hash_tokens(["alpha", "beta"])
        assert (mh1.signature(h) == mh2.signature(h)).all()


@pytest.mark.usefixtures("ray_session")
class TestOracleEquivalence:
    """Each SQL-oracled query must match DuckDB exactly at sf0.001."""

    @pytest.fixture(scope="class")
    def con(self):
        con = duckdb.connect()
        for t in ("documents", "embeddings", "lineitem", "events", "orders",
                  "customer", "nation", "supplier", "region", "part"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        return con

    @staticmethod
    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    @pytest.mark.parametrize(
        "name",
        ["exact_dedup", "token_counts", "quality_scores", "fingerprints",
         "pricing_summary", "ann_topk", "embedding_neardup",
         "tumbling_counts", "sessionize", "minhash_pairs", "ngram_jaccard",
         "lang_id", "simhash", "text_normalize", "orders_by_nation",
         "hash_sample", "top_docs_by_words", "source_stats", "hopping_counts",
         "asof_join", "range_join", "sessionize_scan", "distinct_users",
         "value_quantiles", "approx_distinct_users", "ann_ivf_exhaustive",
         "revenue_by_nation", "stratified_sample", "running_totals",
         "neardup_clusters", "top_docs_per_source", "rare_token_scores",
         "approx_quantiles_kmv", "purchaser_clicks", "singleton_docs",
         "daily_type_pivot", "value_histogram", "source_lang_rollup",
         "redact_pii", "chunk_documents", "benchmark_contamination",
         "docs_in_char_range", "value_ntiles", "value_quantiles_cont",
         "customers_without_big_orders", "value_mad", "ann_topk_filtered",
         "cross_snapshot_neardup", "snapshot_set_ops", "daily_type_unpivot",
         "value_trend", "distinctive_terms", "user_journeys", "value_ranks",
         "zscore_outliers", "value_mode", "daily_new_users", "dup_ngram_spans",
         "user_purchase_error_profile", "props_k_stats", "embedding_quantize",
         "funnel_counts", "retention_cohorts", "latest_doc_versions",
         "rolling_active_users", "top_values_with_ties",
         "fuzzy_token_pairs", "item_cooccurrence", "simhash_pairs",
         "daily_counts_filled", "max_concurrency", "knn_join",
         "priority_sample", "triangle_count", "profile_tables",
         "trimmed_mean", "decayed_user_scores", "text_search",
         "ranked_text_search", "customer_order_histogram",
         "dbscan_clusters", "event_session_ids", "cms_token_counts",
         "incremental_tumbling_counts", "local_supplier_volume",
         "brand_volume", "token_canonical_map", "doc_bigram_novelty", "neardup_clusters_fast",
         "returned_item_customers", "forecast_revenue",
         "purchaser_clicks_salted", "docs_in_char_lang_box",
         "skyline_docs", "purchaser_clicks_auto", "dataset_mixture",
         "time_to_conversion", "cross_snapshot_neardup_idx",
         "source_lang_cube", "embedding_drift", "containment_pairs",
         "lang_mismatch", "table_checksum", "leakage_safe_splits",
         "phrase_search", "vocab_coverage", "dataset_card",
         "curation_rates_by_source", "lm_doc_scores", "dsir_weights",
         "bm25_search", "entropy_scores", "source_divergence",
         "late_event_counts", "text_search_incr", "gopher_filters",
         "blocklist_hits", "dup_doc_fraction", "soft_dedup_weights",
         "ttr_scores", "pii_rates_by_source", "cdc_chunks",
         "cdc_dup_chunks", "dedup_clean_docs", "ccnet_buckets",
         "quality_classifier", "dsir_sample", "source_overlap"],
    )
    def test_query_matches_oracle(self, con, name):
        from ocr_service_ray.pipeline import entry_api

        got = entry_api.queries()[name](SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.execute(entry_api.oracle_sql()[name]).df()
        g, w = self._canon(pd.DataFrame(got)), self._canon(want)
        assert list(g.columns) == list(w.columns)
        assert len(g) == len(w)
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype != b.dtype:
                b = b.astype(a.dtype)
            pd.testing.assert_series_equal(a, b, check_names=False)

    def test_value_quantiles_cont_edges(self):
        """Interpolation edges: a 1-row type (h=0 for every q, lo==hi),
        a 2-row type (pure interpolation), and integer positions
        (d=0 must return lo exactly) — all vs native quantile_cont."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import value_quantiles_cont

        d = tempfile.mkdtemp(prefix="qc_t_")
        # "one": 1 row; "two": 2 rows; "five": 5 rows so q=0.25/0.5/0.75
        # hit integer positions h = 1, 2, 3 (d == 0)
        vals = [42.0, 1.0, 2.0, 10.0, 20.0, 30.0, 40.0, 50.0]
        types = ["one", "two", "two", "five", "five", "five", "five", "five"]
        pq.write_table(
            pa.table({
                "event_id": pa.array(range(len(vals)), pa.int64()),
                "ts": pa.array([0] * len(vals), pa.timestamp("us")),
                "user_id": pa.array([0] * len(vals), pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array(vals),
                "props": pa.array([""] * len(vals)),
            }),
            f"{d}/events.parquet",
        )
        got = value_quantiles_cont(d).to_pandas()
        con2 = duckdb.connect()
        con2.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        want = con2.execute(
            "SELECT event_type, quantile_cont(value, 0.25) AS q25, "
            "quantile_cont(value, 0.5) AS q50, "
            "quantile_cont(value, 0.75) AS q75, "
            "quantile_cont(value, 0.9) AS q90 "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ).df()
        pd.testing.assert_frame_equal(got, want)

    def test_value_quantiles_tie_heavy_distribution(self, con):
        """Massive ties spanning sorted-block boundaries: the rank-pick
        must still land on the exact quantile_disc value."""
        import ray.data

        from ocr_service_ray.analytics.windows import value_quantiles

        rng = np.random.default_rng(777)
        # only 7 distinct values over 30k rows -> every sorted block
        # boundary cuts through a run of ties
        vals = rng.choice([1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 13.0], size=30_000)
        types = rng.choice(["a", "b"], size=30_000)
        tbl = pa.table({"event_type": pa.array(types), "value": pa.array(vals)})
        ds = ray.data.from_arrow(tbl).repartition(16)
        got = value_quantiles("", events=ds).to_pandas()
        con2 = duckdb.connect()
        con2.register("t", tbl.to_pandas())
        want = con2.execute(
            "SELECT event_type, "
            "CAST(quantile_disc(value, 0.25) AS DOUBLE) AS q25, "
            "CAST(quantile_disc(value, 0.5) AS DOUBLE) AS q50, "
            "CAST(quantile_disc(value, 0.75) AS DOUBLE) AS q75, "
            "CAST(quantile_disc(value, 0.9) AS DOUBLE) AS q90 "
            "FROM t GROUP BY event_type ORDER BY event_type"
        ).df()
        pd.testing.assert_frame_equal(got, want)

    def test_running_totals_duplicate_timestamp_tiebreak(self):
        """Identical timestamps within a user must order by event_id —
        the sf events may not contain ties, so the oracle match there
        doesn't prove the tie-break; this fixture does."""
        import pyarrow.parquet as pq
        import tempfile

        from ocr_service_ray.analytics.windows import running_totals

        ts = pa.array([1_000_000] * 4 + [2_000_000, 2_000_000], pa.timestamp("us"))
        tbl = pa.table({
            "event_id": pa.array([3, 1, 2, 0, 5, 4], pa.int64()),
            "user_id": pa.array([7] * 6, pa.int64()),
            "ts": ts,
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        })
        d = tempfile.mkdtemp(prefix="ties_")
        pq.write_table(tbl, f"{d}/events.parquet")
        got = running_totals(d).to_pandas()
        con2 = duckdb.connect()
        con2.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        want = con2.execute(
            "SELECT event_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents "
            "FROM events ORDER BY event_id"
        ).df()
        pd.testing.assert_frame_equal(got, want)

    def test_kmv_estimates_track_exact_quantiles(self):
        """The deterministic KMV sample's estimates must sit near the
        exact rank-pick quantiles (rank error ~1/sqrt(k) at k=256)."""
        from ocr_service_ray.analytics.windows import (
            approx_quantiles_kmv,
            value_quantiles,
        )

        exact = value_quantiles(SF).to_pandas().set_index("event_type")
        est = approx_quantiles_kmv(SF).to_pandas().set_index("event_type")
        assert set(exact.index) == set(est.index)
        for t in exact.index:
            for q in ("q25", "q50", "q75", "q90"):
                e, a = exact.loc[t, q], est.loc[t, f"{q}_est"]
                assert abs(a - e) <= 0.25 * max(abs(e), 1.0), (t, q, e, a)

    def test_neardup_clusters_chain_propagation(self):
        """Min-label propagation must cross multiple hops: a chain
        1-2-3-4-5 (no direct 1-5 pair) converges to rep 1 for all."""
        from ocr_service_ray.analytics.dedup import neardup_clusters

        pairs = pa.table({
            "doc_a": pa.array([4, 3, 2, 1], pa.int64()),
            "doc_b": pa.array([5, 4, 3, 2], pa.int64()),
            "jaccard": pa.array([1.0] * 4, pa.float64()),
        })
        out = neardup_clusters("", pairs=pairs).to_pandas()
        assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]
        assert out["cluster_rep"].tolist() == [1] * 5

    def test_neardup_clusters_doubling_plan_equality_and_rounds(self):
        """Pointer doubling must (a) produce the exact same labels as
        plain min-label propagation and (b) converge in O(log d) BSP
        rounds: on a 17-node chain the plain plan needs ~17 rounds
        (one hop per round) while shortcutting halves the path each
        round (reach 2r+1 per round -> <= 7 incl. convergence check)."""
        from ocr_service_ray.analytics.dedup import (
            neardup_clusters,
            neardup_clusters_doubling,
        )

        n = 17
        pairs = pa.table({
            "doc_a": pa.array(list(range(1, n)), pa.int64()),
            "doc_b": pa.array(list(range(2, n + 1)), pa.int64()),
            "jaccard": pa.array([1.0] * (n - 1), pa.float64()),
        })
        s_plain: dict = {}
        s_dbl: dict = {}
        out_plain = neardup_clusters("", pairs=pairs, stats=s_plain).to_pandas()
        out_dbl = neardup_clusters_doubling(
            "", pairs=pairs, stats=s_dbl
        ).to_pandas()
        assert out_dbl["doc_id"].tolist() == out_plain["doc_id"].tolist()
        assert (
            out_dbl["cluster_rep"].tolist()
            == out_plain["cluster_rep"].tolist()
            == [1] * n
        )
        assert s_plain["rounds"] >= n - 3, s_plain
        assert s_dbl["rounds"] <= 7, s_dbl

    def test_neardup_clusters_doubling_empty_and_two_components(self):
        """Degenerate inputs: no pairs -> empty table; two disjoint
        components keep distinct reps (no cross-component bleed)."""
        from ocr_service_ray.analytics.dedup import neardup_clusters_doubling

        empty = pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        })
        out = neardup_clusters_doubling("", pairs=empty)
        assert len(out) == 0
        pairs = pa.table({
            "doc_a": pa.array([10, 11, 30], pa.int64()),
            "doc_b": pa.array([11, 12, 31], pa.int64()),
            "jaccard": pa.array([1.0] * 3, pa.float64()),
        })
        out = neardup_clusters_doubling("", pairs=pairs).to_pandas()
        got = dict(zip(out["doc_id"], out["cluster_rep"]))
        assert got == {10: 10, 11: 10, 12: 10, 30: 30, 31: 30}

    def test_block_pair_sims_tolerates_empty_block(self):
        """A degenerate zero-row block must yield an empty pair table,
        not crash the whole embedding_neardup query (np.vstack raises on
        empty input)."""
        import ray

        from ocr_service_ray.analytics.dedup import _block_pair_sims

        empty = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        })
        full = pa.table({
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32())),
        })
        for a, b in ((empty, full), (full, empty), (empty, empty)):
            out = ray.get(_block_pair_sims.remote(a, b, 0.4, False))
            assert len(out) == 0 and out.column_names == ["vec_a", "vec_b"]

    def test_hot_bucket_bound_identical_cluster(self, tmp_path):
        """A giant identical-doc cluster must yield bounded task output:
        LSH emits O(k) star pairs to the representative (cluster stays
        connected); ngram truncates hot postings to the cap's smallest
        doc_ids (exact pairs within the kept prefix)."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        k = 300
        text = "the same boilerplate page body repeated on every mirror " * 4
        uniq = [f"unique document number {i} with its own words entirely" for i in range(5)]
        tbl = pa.table({
            "doc_id": pa.array(list(range(k + len(uniq))), pa.int64()),
            "text": pa.array([text] * k + uniq),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        sf = str(tmp_path)

        lsh = minhash_lsh_pairs(sf, max_bucket=16).to_pandas()
        # star pairs only: every member linked to the representative (0)
        assert len(lsh) == k - 1
        assert (lsh["doc_a"] == 0).all()
        assert sorted(lsh["doc_b"]) == list(range(1, k))
        assert (lsh["jaccard"] == 1.0).all()

        ng = ngram_jaccard_pairs(sf, max_posting=8).to_pandas()
        # pairs among the 8 smallest doc_ids of the hot postings, exact
        assert len(ng) == 8 * 7 // 2
        assert set(ng["doc_a"]) | set(ng["doc_b"]) == set(range(8))
        assert (ng["jaccard"] == 1.0).all()

    def test_cross_snapshot_neardup_hot_bucket_stars_to_base(self, tmp_path):
        """Same identical-cluster adversary for the INCREMENTAL LSH: an
        oversized cross-split bucket must emit exactly one star pair per
        NEW doc to the min BASE id — bounded output, every new doc still
        flagged, and no base×base or new×new pair anywhere."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.dedup import cross_snapshot_neardup

        k = 300  # doc_ids 0..299 identical; split T = 150
        text = "the same boilerplate page body repeated on every mirror " * 4
        tbl = pa.table({
            "doc_id": pa.array(list(range(k)), pa.int64()),
            "text": pa.array([text] * k),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))

        got = cross_snapshot_neardup(str(tmp_path), max_bucket=16).to_pandas()
        t = k // 2
        assert len(got) == t  # one pair per new doc
        assert (got["base_doc_id"] == 0).all()
        assert sorted(got["doc_id"]) == list(range(t, k))
        assert (got["jaccard"] == 1.0).all()

    def test_simhash_hot_bucket_stars_to_rep(self, tmp_path):
        """Identical-fingerprint mega-cluster adversary for simhash_pairs:
        every band bucket holds all k docs, so an uncapped task would emit
        k(k-1)/2 pairs; with the star-cap it must emit exactly k-1 verified
        hamming-0 pairs to the min-doc_id representative."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.dedup import simhash_pairs

        k = 300
        text = "the same boilerplate page body repeated on every mirror " * 4
        tbl = pa.table({
            "doc_id": pa.array(list(range(k)), pa.int64()),
            "text": pa.array([text] * k),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))

        got = simhash_pairs(str(tmp_path), max_bucket=16).to_pandas()
        assert len(got) == k - 1
        assert (got["doc_a"] == 0).all()
        assert sorted(got["doc_b"]) == list(range(1, k))
        assert (got["hamming"] == 0).all()

    def test_simhash_pairs_param_validation(self):
        """max_hamming >= bands (or a ragged 64-bit split) would silently
        drop qualifying pairs — must fail loudly instead."""
        from ocr_service_ray.analytics.dedup import simhash_pairs

        with pytest.raises(ValueError, match="max_hamming < bands"):
            simhash_pairs("/nonexistent", max_hamming=4, bands=4)
        with pytest.raises(ValueError, match="divide 64"):
            simhash_pairs("/nonexistent", max_hamming=2, bands=7)

    def test_value_quantiles_mega_type_skew(self, con):
        """One type holding ~99% of all rows must still be exact — the
        distributed rank-pick never materializes a type in one task."""
        import ray.data

        from ocr_service_ray.analytics.windows import value_quantiles

        rng = np.random.default_rng(31337)
        n_big = 50_000
        vals = np.concatenate(
            [np.round(rng.uniform(0, 1000, n_big), 4), [1.5, 2.5, 3.5]]
        )
        types = np.array(["mega"] * n_big + ["rare"] * 3)
        tbl = pa.table({"event_type": pa.array(types), "value": pa.array(vals)})
        # many small blocks: rank-pick must stitch ranks across blocks
        ds = ray.data.from_arrow(tbl).repartition(32)
        got = value_quantiles("", events=ds).to_pandas()
        con2 = duckdb.connect()
        con2.register("t", tbl.to_pandas())
        want = con2.execute(
            "SELECT event_type, "
            "CAST(quantile_disc(value, 0.25) AS DOUBLE) AS q25, "
            "CAST(quantile_disc(value, 0.5) AS DOUBLE) AS q50, "
            "CAST(quantile_disc(value, 0.75) AS DOUBLE) AS q75, "
            "CAST(quantile_disc(value, 0.9) AS DOUBLE) AS q90 "
            "FROM t GROUP BY event_type ORDER BY event_type"
        ).df()
        pd.testing.assert_frame_equal(got, want)

    def test_kmeans_blocking_invariance_and_quality(self):
        """Fixed-point accumulation makes the fitted centroids
        BIT-IDENTICAL for any block layout (the float version would
        drift with reduction order); assignments must beat random
        clustering on within-cluster similarity."""
        from ocr_service_ray.analytics.similarity import (
            _emb,
            _norm_rows,
            embedding_clusters,
            kmeans_fit,
        )

        c1 = kmeans_fit(SF, n_clusters=6, iters=4, ds=_emb(SF))
        c2 = kmeans_fit(SF, n_clusters=6, iters=4, ds=_emb(SF).repartition(13))
        assert np.array_equal(c1, c2)

        out = embedding_clusters(SF, n_clusters=6, iters=4).to_pandas()
        emb = _emb(SF).to_pandas().sort_values("vec_id")
        m = _norm_rows(np.vstack(emb["embedding"].to_numpy()).astype(np.float64))
        cl = out.sort_values("vec_id")["cluster"].to_numpy()
        # mean sim to own centroid > mean sim to global mean direction
        own = np.array([float(m[i] @ c1[cl[i]]) for i in range(len(m))]).mean()
        g = m.mean(axis=0)
        g /= np.linalg.norm(g)
        assert own > (m @ g).mean() + 0.01

    def test_ivf_recall_vs_brute(self):
        from ocr_service_ray.analytics.similarity import brute_topk, ivf_topk

        brute = brute_topk(SF).to_pandas()
        ivf = ivf_topk(SF).to_pandas()
        # recall@10 of the IVF approximation vs the exact baseline
        recalls = []
        for qid in brute["query_id"].unique():
            exact = set(brute[brute.query_id == qid]["neighbor_id"])
            approx = set(ivf[ivf.query_id == qid]["neighbor_id"])
            recalls.append(len(exact & approx) / len(exact))
        assert np.mean(recalls) >= 0.9  # nprobe=10/16 cells, pruned read

    def test_lsh_topk_recall_and_sql_parity(self):
        """ann_lsh_topk: recall@10 >= 0.9 vs the exact baseline (the IVF
        gate, same bar), AND full-result SQL parity — the fixed-point
        integer signature path must reproduce DuckDB's plane bank and
        bucket keys bit-for-bit, so the ORACLE check covers the exact
        candidate set, not just a recall bound."""
        import duckdb

        from ocr_service_ray.analytics.similarity import brute_topk, lsh_topk
        from ocr_service_ray.pipeline.entry_api import _lsh_topk_sql

        brute = brute_topk(SF).to_pandas()
        got = lsh_topk(SF).to_pandas()
        recalls = []
        for qid in brute["query_id"].unique():
            exact = set(brute[brute.query_id == qid]["neighbor_id"])
            approx = set(got[got.query_id == qid]["neighbor_id"])
            recalls.append(len(exact & approx) / len(exact))
        assert np.mean(recalls) >= 0.9
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
        )
        want = con.execute(_lsh_topk_sql()).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_lsh_plane_bank_matches_duckdb_md5(self):
        """The integer plane bank is the md5_number_lower expression —
        pin a sample of components against DuckDB directly."""
        import duckdb

        from ocr_service_ray.analytics.similarity import _lsh_plane_matrix

        pl = _lsh_plane_matrix(64, 5, 32)
        con = duckdb.connect()
        for t, b, j in ((0, 0, 0), (31, 4, 63), (7, 2, 11)):
            want = con.execute(
                "SELECT CAST(md5_number_lower(?) % 2001 AS BIGINT) - 1000",
                [f"lsh:{t}:{b}:{j}"],
            ).fetchone()[0]
            assert int(pl[t, b, j]) == want

    def test_ivf_reads_only_probed_cells(self, tmp_path):
        # the index layout must allow partition pruning: every vector
        # sits in exactly one cell dir, and the union of all cells is
        # the full table
        import glob
        import os

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.similarity import _ivf_root, ivf_build_index

        root = ivf_build_index(SF, n_clusters=16)
        files = glob.glob(os.path.join(root, "cell=*", "*.parquet"))
        assert files, "no cell partitions written"
        ids = []
        for f in files:
            ids.extend(pq.read_table(f, columns=["vec_id"]).column("vec_id").to_pylist())
        full = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
        assert sorted(ids) == sorted(full.column("vec_id").to_pylist())

    def test_minhash_pairs_schema(self):
        from ocr_service_ray.analytics.dedup import minhash_lsh_pairs

        t = minhash_lsh_pairs(SF)
        assert t.schema.names == ["doc_a", "doc_b", "jaccard"]


class TestMultimodal:
    def test_keyframe_stage_exact_scene_changes(self):
        """Constructed video: 3 scenes over 9 frames -> keyframes must be
        EXACTLY the first frame of each scene (plus error record)."""
        from ocr_service_ray.stages.multimodal import KeyframeStage, encode_video

        h, w = 20, 30
        scene_a = np.full((h, w), 10, np.uint8)
        scene_b = np.full((h, w), 200, np.uint8)
        scene_c = np.zeros((h, w), np.uint8)
        scene_c[:10] = 255
        frames = np.stack([scene_a] * 3 + [scene_b] * 4 + [scene_c] * 2)
        batch = pa.table({
            "media_ref": ["v", "bad"],
            "bytes": [encode_video(frames), b"junk"],
        })
        out = KeyframeStage(threshold=8.0)(batch).to_pylist()
        ok = [r for r in out if r["status"] == "ok"]
        assert [r["frame_index"] for r in ok] == [0, 3, 7]
        assert ok[1]["change"] == 190.0  # |200-10| everywhere
        assert [r["status"] for r in out if r["media_ref"] == "bad"] == ["erro"]

    def test_audio_segment_stage_exact_silence_split(self):
        """Constructed waveform: voice / silence / voice -> exactly two
        segments with exact boundaries (window-aligned input)."""
        from ocr_service_ray.stages.multimodal import AudioSegmentStage, encode_audio

        rate = 1000
        win = 50  # window_s 0.05 * 1000
        voiced = np.full(4 * win, 0.5, np.float32)
        silence = np.zeros(6 * win, np.float32)
        s = np.concatenate([voiced, silence, voiced, voiced])
        batch = pa.table({
            "media_ref": ["a"], "bytes": [encode_audio(s, rate)],
        })
        out = AudioSegmentStage(window_s=0.05, threshold=0.1)(batch).to_pylist()
        assert [(r["seg_idx"], r["start_s"], r["end_s"]) for r in out] == [
            (0, 0.0, 0.2), (1, 0.5, 0.9),
        ]
        assert all(abs(r["rms"] - 0.5) < 1e-9 for r in out)

    def test_audio_features_and_errors(self):
        import pyarrow as pa

        from ocr_service_ray.stages.multimodal import AudioFeatureStage, encode_audio

        s = np.sin(np.linspace(0, 40 * np.pi, 8000)).astype(np.float32)
        batch = pa.table(
            {
                "media_ref": ["a", "bad"],
                "bytes": [encode_audio(s, 8000), b"garbage"],
            }
        )
        out = AudioFeatureStage()(batch).to_pylist()
        ok, bad = out
        assert ok["status"] == "ok"
        assert ok["duration_s"] == 1.0
        assert 0.6 < ok["rms"] < 0.8  # sine rms ~ 1/sqrt(2)
        assert ok["zero_crossings"] in (39, 40)  # endpoint-dependent
        assert bad["status"] == "erro"

    def test_frame_sampling_roundtrip(self):
        import pyarrow as pa

        from ocr_service_ray.stages.multimodal import FrameSampleStage, encode_video
        from ocr_service_ray.stages.ocr import raster

        frames = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
        batch = pa.table({"media_ref": ["v"], "bytes": [encode_video(frames)]})
        out = FrameSampleStage(every_k=2)(batch).to_pylist()
        assert [r["frame_index"] for r in out] == [0, 2, 4]
        decoded = raster.decode(out[1]["frame"])
        assert np.array_equal(decoded, frames[2])

    def test_resize(self):
        from ocr_service_ray.stages.multimodal import resize_gray

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = resize_gray(img, 2, 2)
        assert out.shape == (2, 2)
        assert out[0, 0] == img[0, 0]


class TestEmbeddingNeardup:
    def test_block_pair_join_invariant_to_blocking(self):
        # the cross-block wedge logic must keep each unordered pair
        # exactly once regardless of how rows land in blocks
        import pyarrow as pa
        import ray
        import ray.data

        from ocr_service_ray.analytics.dedup import (
            _block_pair_sims,
            embedding_neardup_pairs,
        )

        ds = ray.data.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).repartition(7)
        refs = ds.to_arrow_refs()
        assert len(refs) > 1
        futs = []
        for i in range(len(refs)):
            for j in range(i, len(refs)):
                futs.append(_block_pair_sims.remote(refs[i], refs[j], 0.45, i == j))
        many = pa.concat_tables(ray.get(futs)).sort_by(
            [("vec_a", "ascending"), ("vec_b", "ascending")]
        )
        assert many.equals(embedding_neardup_pairs(SF))


class TestImageFeatures:
    def test_features_and_error_records(self):
        import numpy as np
        import pyarrow as pa

        from ocr_service_ray.fixtures.render import render_page
        from ocr_service_ray.stages.multimodal import ImageFeatureStage

        rng = np.random.default_rng(3)
        pay = render_page([[(0, "HELLO WORLD")]], rng)
        batch = pa.table({"media_ref": ["img-a", "img-bad"],
                          "bytes": [pay, b"not a raster"]})
        out = ImageFeatureStage()(batch).to_pylist()
        ok, bad = out
        assert ok["status"] == "ok"
        assert ok["width"] > 0 and ok["height"] > 0
        assert 0.0 < ok["ink_ratio"] < 0.5
        assert ok["n_rows_with_ink"] > 0
        assert bad["status"] == "erro" and bad["width"] == 0


class TestThumbnail:
    def test_thumbnail_stage_resizes_and_errors(self, ray_session):
        import numpy as np

        from ocr_service_ray.stages.multimodal import ThumbnailStage
        from ocr_service_ray.stages.ocr import raster

        img = np.zeros((64, 96), np.uint8)
        img[:32, :] = 200  # top half bright: survives resize recognizably
        batch = pa.table({
            "media_ref": ["t", "bad"],
            "bytes": [raster.encode(img), b"nope"],
        })
        out = ThumbnailStage(thumb_h=16, thumb_w=24)(batch).to_pylist()
        ok, bad = out
        assert (ok["height"], ok["width"]) == (64, 96)  # original dims
        thumb = raster.decode(ok["thumb"])
        assert thumb.shape == (16, 24)
        assert (thumb[:8] == 200).all() and (thumb[8:] == 0).all()
        assert bad["status"] == "erro" and bad["thumb"] == b""


@pytest.mark.usefixtures("ray_session")
class TestTextPipelineOps:
    """The sf corpus contains no PII and no cross-doc 13-gram overlap,
    so the driver's oracle equality there never exercises the POSITIVE
    paths; these fixtures do, still oracle-compared via DuckDB."""

    def _write_docs(self, tmp_path, texts):
        import pyarrow.parquet as pq

        tbl = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def _oracle(self, sf, name):
        from ocr_service_ray.pipeline import entry_api

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        return con.execute(entry_api.oracle_sql()[name]).df()

    def test_redact_pii_positive(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import redact_pii

        sf = self._write_docs(tmp_path, [
            "mail me at jo.doe+x@ex-ample.co.uk today",
            "call 555-123-4567 or 555 9876 5432 now",
            "server at 10.0.255.3 and also bob@host.org",
            "nothing sensitive here",
        ])
        got = redact_pii(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got["n_redactions"].tolist() == [1, 2, 2, 0]
        assert "<EMAIL>" in got["redacted"][0] and "jo.doe" not in got["redacted"][0]
        assert got["redacted"][1].count("<PHONE>") == 2
        assert "<IP>" in got["redacted"][2] and "<EMAIL>" in got["redacted"][2]
        want = self._oracle(sf, "redact_pii").sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_benchmark_contamination_positive(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import benchmark_contamination

        bench_text = " ".join(f"w{i}" for i in range(30))
        contaminated = "intro words " + " ".join(f"w{i}" for i in range(13)) + " outro"
        clean = " ".join(f"z{i}" for i in range(30))
        sf = self._write_docs(
            tmp_path, [bench_text] * 5 + [contaminated, clean]
        )
        got = benchmark_contamination(sf).to_pandas()
        by_id = dict(zip(got["doc_id"], got["n_contaminated_shingles"]))
        assert by_id[5] == 1  # exactly the one shared 13-gram
        assert by_id[6] == 0
        assert by_id[0] > 0  # benchmark docs self-hit, consistently on both sides
        want = self._oracle(sf, "benchmark_contamination")
        pd.testing.assert_frame_equal(
            got.sort_values("doc_id").reset_index(drop=True),
            want.sort_values("doc_id").reset_index(drop=True),
        )

    def test_chunk_documents_boundary_lengths(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import chunk_documents

        def words(n):
            return " ".join(f"t{i}" for i in range(n))

        sf = self._write_docs(
            tmp_path, [words(1), words(63), words(64), words(65), words(112), words(113)]
        )
        got = chunk_documents(sf).to_pandas()
        n_chunks = got.groupby("doc_id").size().to_dict()
        assert n_chunks == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 3}
        # overlap: chunk 1 of the 65-word doc starts at word 48
        c1 = got[(got.doc_id == 3) & (got.chunk_idx == 1)]["chunk"].iloc[0]
        assert c1.startswith("t48 ") and c1.endswith("t64")
        want = self._oracle(sf, "chunk_documents")
        pd.testing.assert_frame_equal(
            got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True),
            want.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True),
        )


@pytest.mark.usefixtures("ray_session")
class TestWinnowFingerprints:
    """MOSS winnowing (Schleimer et al. SIGMOD'03): parity vs a naive
    per-window pure-Python reference, the DuckDB oracle on adversarial
    (incl. unicode) text, and the paper's detection guarantee."""

    ADVERSARIAL = [
        "",                      # no grams
        "short",                 # < K chars after normalize
        "abcdefgh",              # exactly one gram
        "abcdefghi",             # two grams, one window
        "a  B\tc\nd EfGh ijK lmnop",      # ws collapse + case fold
        "zzzzzzzzzzzzzzzzzzzzzzzz",       # all-identical hashes (tie storm)
        "the quick brown fox jumps over the lazy dog " * 3,  # repeats
        "é€ü abcdefgh xyz é€ βγδ ΑΒΓ χψω", # multibyte codepoints
        "  leading and trailing   ",
    ]

    @staticmethod
    def _naive(text: str):
        """Direct transcription of the paper: hash every K-gram of the
        normalized text, slide a W window, keep the rightmost minimum
        of each window (dict-deduped)."""
        from ocr_service_ray.analytics.hashing import normalize_text
        from ocr_service_ray.analytics.text_analysis import (
            WINNOW_K, WINNOW_W, _KR_BASE, _KR_MOD,
        )

        s = normalize_text(text)
        hs = []
        for p in range(len(s) - WINNOW_K + 1):
            h = 0
            for ch in s[p:p + WINNOW_K]:
                h = (h * _KR_BASE + ord(ch)) % _KR_MOD
            hs.append(h)
        if not hs:
            return []
        sel = {}
        for s0 in range(max(1, len(hs) - WINNOW_W + 1)):
            win = hs[s0:s0 + WINNOW_W]
            best = min(range(len(win)), key=lambda i: (win[i], -i))
            sel[s0 + best] = win[best]
        return sorted((p + 1, h) for p, h in sel.items())

    def _write_docs(self, tmp_path, texts):
        import pyarrow.parquet as pq

        tbl = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_naive_reference_and_oracle_parity(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import winnow_fingerprints
        from ocr_service_ray.pipeline import entry_api

        sf = self._write_docs(tmp_path, self.ADVERSARIAL)
        got = winnow_fingerprints(sf).to_pandas()
        got = got.sort_values(["doc_id", "pos"]).reset_index(drop=True)
        want_rows = []
        for d, t in enumerate(self.ADVERSARIAL):
            for p, h in self._naive(t):
                want_rows.append((d, p, h))
        assert list(map(tuple, got.itertuples(index=False))) == want_rows
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = con.execute(entry_api.oracle_sql()["winnow_fingerprints"]).df()
        pd.testing.assert_frame_equal(
            got, want.sort_values(["doc_id", "pos"]).reset_index(drop=True)
        )

    def test_detection_guarantee(self, tmp_path):
        """Any shared substring of >= W+K-1 normalized chars must yield
        at least one shared fingerprint hash (the winnowing guarantee)."""
        from ocr_service_ray.analytics.text_analysis import winnow_fingerprints

        shared = "qwertyuiopasdfg"  # 15 chars == W+K-1
        assert len(shared) == 15
        sf = self._write_docs(
            tmp_path,
            ["AAA " + shared + " BBB ccc ddd", "eee fff " + shared + " ZZZ"],
        )
        got = winnow_fingerprints(sf).to_pandas()
        h0 = set(got[got.doc_id == 0]["h"])
        h1 = set(got[got.doc_id == 1]["h"])
        assert h0 & h1

    def test_fingerprint_matches_positive_and_boilerplate_drop(self, tmp_path):
        """Two docs sharing a long rare substring must pair; a
        boilerplate footer shared by MORE than max_df docs must
        contribute nothing (its prints are dropped by definition)."""
        from ocr_service_ray.analytics.text_analysis import fingerprint_matches
        from ocr_service_ray.pipeline import entry_api

        shared = "zqxjkvbnmwpfhdlg uryeitoa zqxvbnm"  # rare, > 2 windows
        footer = " common footer boilerplate all docs carry verbatim"
        texts = (
            ["AAA " + shared + " one" + footer, "BBB two " + shared + footer]
            + [f"doc {i} distinct words only here {i}" + footer for i in range(9)]
        )
        sf = self._write_docs(tmp_path, texts)
        got = fingerprint_matches(sf, max_df=8, min_shared=2)
        pairs = set(zip(got.column("doc_a").to_pylist(), got.column("doc_b").to_pylist()))
        assert (0, 1) in pairs
        # footer-only pairs (any pair among docs 2..10) must be absent:
        # the footer's prints have df = 11 > max_df
        assert not any(a >= 2 and b >= 2 for a, b in pairs)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = con.execute(entry_api.oracle_sql()["fingerprint_matches"]).df()
        pd.testing.assert_frame_equal(
            got.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
            want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        )

    def test_density_bound(self, tmp_path):
        """Winnowing selects at most one print per window start: the
        selected count is bounded by max(1, n_grams - W + 1) and is
        ~2/(W+1) of grams in expectation — pin the hard bound."""
        import numpy as np

        from ocr_service_ray.analytics.hashing import normalize_text
        from ocr_service_ray.analytics.text_analysis import (
            WINNOW_K, WINNOW_W, winnow_fingerprints,
        )

        rng = np.random.default_rng(11)
        texts = [
            "".join(rng.choice(list("abcdefgh "), 400)) for _ in range(8)
        ]
        sf = self._write_docs(tmp_path, texts)
        got = winnow_fingerprints(sf).to_pandas()
        for d, t in enumerate(texts):
            n_grams = len(normalize_text(t)) - WINNOW_K + 1
            n_sel = int((got.doc_id == d).sum())
            assert 1 <= n_sel <= max(1, n_grams - WINNOW_W + 1)


@pytest.mark.usefixtures("ray_session")
class TestUnicodeWhitespaceParity:
    """RE2 (DuckDB) treats \\s/\\b as ASCII and trim() strips Zs spaces;
    Python defaults are unicode-aware. Every SQL-mirrored operator is
    pinned to RE2 semantics — this corpus (NBSP, ideographic space,
    FS/NEL controls, accents) would expose any divergence the ASCII sf
    corpus cannot."""

    TEXTS = [
        "plain ascii words here",
        "nbsp\xa0joined words and\xa0more",          # NBSP inside tokens
        "ideographic　space　text",                    # U+3000
        "control\x1cseparated\x85words",              # FS + NEL (not RE2 \s)
        "vertical\x0btab\x0bkept",                    # \x0b: RE2 \S, Python ASCII \s
        "\xa0leading and trailing ",             # Zs trim edges
        "the café is the place",                 # \b next to accents
        "  tabs\tand\nnewlines  collapse  ",
        "thé the thé the",
    ]

    @pytest.fixture(scope="class")
    def sfdir(self, tmp_path_factory):
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("uni")
        tbl = pa.table({
            "doc_id": pa.array(list(range(len(self.TEXTS))), pa.int64()),
            "text": pa.array(self.TEXTS, pa.string()),
        })
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    @pytest.mark.parametrize(
        "name",
        ["token_counts", "quality_scores", "fingerprints", "simhash",
         "lang_id", "text_normalize", "exact_dedup", "chunk_documents",
         "rare_token_scores", "minhash_pairs", "ngram_jaccard",
         "benchmark_contamination", "redact_pii"],
    )
    def test_parity_on_unicode_corpus(self, sfdir, name):
        from ocr_service_ray.pipeline import entry_api

        got = entry_api.queries()[name](sfdir)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'"
        )
        want = con.execute(entry_api.oracle_sql()[name]).df()
        g = pd.DataFrame(got)
        g = g[sorted(g.columns)].sort_values(sorted(g.columns)).reset_index(drop=True)
        w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
        assert len(g) == len(w), (len(g), len(w))
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype != b.dtype:
                b = b.astype(a.dtype)
            pd.testing.assert_series_equal(a, b, check_names=False)


class TestRound3WindowOps:
    def test_user_value_windows_oracle(self):
        from ocr_service_ray.analytics.windows import user_value_windows

        got = user_value_windows(SF).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        want = con.execute(
            "WITH c AS (SELECT event_id, user_id, ts, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
            "SELECT event_id, "
            "CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 300 SECONDS PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS win_sum_cents, "
            "CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 300 SECONDS PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS win_n, "
            "CAST(cents - lag(cents, 1, 0) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS BIGINT) AS delta_cents "
            "FROM c ORDER BY event_id"
        ).df()
        pd.testing.assert_frame_equal(got, want)

    def test_user_value_windows_range_peer_rule(self):
        """SQL RANGE ... CURRENT ROW includes ALL ts-peers (even ones
        that sort after by event_id); the sf table may not contain
        duplicate timestamps, so the oracle match there doesn't prove
        the peer rule — this fixture does."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import user_value_windows

        ts = pa.array(
            [1_000_000_000] * 3 + [1_200_000_000, 400_000_000_000], pa.timestamp("us")
        )
        tbl = pa.table({
            "event_id": pa.array([2, 0, 1, 3, 4], pa.int64()),
            "user_id": pa.array([9] * 5, pa.int64()),
            "ts": ts,
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
        })
        d = tempfile.mkdtemp(prefix="peers_")
        pq.write_table(tbl, f"{d}/events.parquet")
        got = user_value_windows(d).to_pandas()
        # the three ts-peers each see all peers (700 cents); the 200s
        # -later event sees everything inside 300s; the far event only
        # itself — and its delta is vs the previous event regardless
        assert got["win_sum_cents"].tolist() == [700, 700, 700, 1500, 1600]
        assert got["win_n"].tolist() == [3, 3, 3, 4, 1]
        assert got["delta_cents"].tolist() == [200, 200, -300, 700, 800]

    def test_purchaser_clicks_bloom_plan_equality(self):
        from ocr_service_ray.analytics.windows import (
            purchaser_clicks,
            purchaser_clicks_bloom,
        )

        base = purchaser_clicks(SF).to_pandas()
        got = purchaser_clicks_bloom(SF).to_pandas()
        pd.testing.assert_frame_equal(got, base)

    def test_purchaser_clicks_bloom_survives_false_positives(self):
        """A deliberately tiny filter (64 bits) false-positives most of
        the user space; the residual co-partitioned check must still
        produce the exact result."""
        from ocr_service_ray.analytics.hashing import BloomFilter
        from ocr_service_ray.analytics.windows import (
            purchaser_clicks,
            purchaser_clicks_bloom,
        )

        tiny = BloomFilter(m_bits=64, n_hashes=5)
        tiny.add_many(np.arange(50, dtype=np.int64))
        # precondition: the tiny filter actually false-positives
        assert tiny.contains_many(np.arange(1000, 20000, dtype=np.int64)).mean() > 0.3
        base = purchaser_clicks(SF).to_pandas()
        got = purchaser_clicks_bloom(SF, m_bits=64).to_pandas()
        pd.testing.assert_frame_equal(got, base)

    def test_bloom_filter_one_sided(self):
        from ocr_service_ray.analytics.hashing import BloomFilter

        rng = np.random.default_rng(5)
        keys = rng.integers(0, 2**62, size=4000).astype(np.int64)
        bf = BloomFilter(m_bits=1 << 16, n_hashes=5)
        half_a, half_b = keys[:2000], keys[2000:]
        bf_a = BloomFilter(m_bits=1 << 16, n_hashes=5)
        bf_a.add_many(half_a)
        bf_b = BloomFilter(m_bits=1 << 16, n_hashes=5)
        bf_b.add_many(half_b)
        bf = bf_a.merge(bf_b)
        # no false negatives, ever
        assert bf.contains_many(keys).all()
        # false-positive rate in the expected ballpark for m/n=16, h=5
        probe = rng.integers(2**62, 2**63 - 1, size=20000).astype(np.int64)
        assert bf.contains_many(probe).mean() < 0.05


class TestHeavyHitters:
    ORACLE = (
        "WITH w AS (SELECT unnest(string_split(trim(regexp_replace("
        "lower(text), '\\s+', ' ', 'g')), ' ')) AS word FROM documents), "
        "t AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w "
        "WHERE word <> '' GROUP BY word), "
        "tot AS (SELECT sum(n) AS n_total FROM t) "
        "SELECT word, n FROM t, tot WHERE n >= ceil({phi} * n_total) "
        "ORDER BY word"
    )

    def test_heavy_tokens_oracle_and_forced_compression(self):
        from ocr_service_ray.analytics.text_analysis import heavy_hitter_tokens

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
        )
        want = con.execute(self.ORACLE.format(phi=0.001)).df()
        got = heavy_hitter_tokens(SF).to_pandas()
        pd.testing.assert_frame_equal(got, want)
        # k small enough that every block MUST compress (vocab >> 40):
        # the superset bound has to hold or the verify pass misses words
        got2 = heavy_hitter_tokens(SF, phi=0.001, k=40).to_pandas()
        pd.testing.assert_frame_equal(got2, want)

    def test_heavy_tokens_synthetic_adversarial(self):
        """Corpus engineered so distinct-per-block >> k and the heavy
        set sits just above threshold — exactness must survive the
        sketch's pruning."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import heavy_hitter_tokens

        rng = np.random.default_rng(11)
        docs = []
        # 400 docs of 50 unique rare words each (20k distinct singletons)
        for i in range(400):
            docs.append(" ".join(f"rare{i}_{j}" for j in range(50)))
        # plus two heavy words at ~0.5% and ~5%
        for _ in range(100):
            docs.append("edgeword " * 1 + "hotword " * 10)
        rng.shuffle(docs)
        d = tempfile.mkdtemp(prefix="hh_")
        tbl = pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        })
        pq.write_table(tbl, f"{d}/documents.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
        want = con.execute(self.ORACLE.format(phi=0.004)).df()
        assert "edgeword" in set(want["word"]) and "hotword" in set(want["word"])
        got = heavy_hitter_tokens(d, phi=0.004, k=500).to_pandas()
        pd.testing.assert_frame_equal(got, want)


class TestCorpusNgramStats:
    BIGRAM_CTE = (
        "WITH w AS (SELECT doc_id, string_split(trim(regexp_replace("
        "lower(text), '\\s+', ' ', 'g')), ' ') AS words FROM documents), "
        "g AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 1)) AS i "
        "FROM w WHERE len(words) >= 2 AND words[1] <> ''), "
        "b AS (SELECT doc_id, words[i] || ' ' || words[i+1] AS bg FROM g) "
    )

    def _views(self, d):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
        return con

    def test_repetition_scores_oracle(self):
        from ocr_service_ray.analytics.text_analysis import repetition_scores

        want = self._views(SF).execute(
            self.BIGRAM_CTE
            + "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_bigrams, "
            "CAST(sum(n) AS BIGINT) AS n_bigrams, "
            "CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_occurrences "
            "FROM (SELECT doc_id, bg, count(*) AS n FROM b GROUP BY doc_id, bg) c "
            "GROUP BY doc_id ORDER BY doc_id"
        ).df()
        got = repetition_scores(SF).to_pandas()
        pd.testing.assert_frame_equal(got, want)

    def test_bigram_counts_oracle(self):
        from ocr_service_ray.analytics.text_analysis import bigram_counts

        want = self._views(SF).execute(
            self.BIGRAM_CTE
            + "SELECT bg AS bigram, CAST(count(*) AS BIGINT) AS n FROM b "
            "GROUP BY bg HAVING count(*) >= 5 ORDER BY bigram"
        ).df()
        got = bigram_counts(SF).to_pandas()
        pd.testing.assert_frame_equal(got, want)

    def test_edge_docs(self):
        """0-word, 1-word and all-repeated docs: short docs are omitted
        (no bigrams), a doc of one repeated word is 100% duplicated
        mass, and the min_count floor applies to the corpus total."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import (
            bigram_counts,
            repetition_scores,
        )

        d = tempfile.mkdtemp(prefix="ngram_")
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["", "lonely", "spam spam spam spam", "a b a b c"]),
        })
        pq.write_table(tbl, f"{d}/documents.parquet")
        rep = repetition_scores(d).to_pandas()
        assert rep["doc_id"].tolist() == [2, 3]
        # doc 2: 3x "spam spam" -> 1 distinct, 3 occ, all duplicated
        assert rep.iloc[0].tolist() == [2, 1, 3, 3]
        # doc 3: bigrams [a b, b a, a b, b c] -> 3 distinct, 4 occ, 2 dup
        assert rep.iloc[1].tolist() == [3, 3, 4, 2]
        bg = bigram_counts(d, min_count=2).to_pandas()
        assert dict(zip(bg["bigram"], bg["n"])) == {"spam spam": 3, "a b": 2}


class TestLongTailDocs:
    def test_oracle(self):
        from ocr_service_ray.analytics.relational import long_tail_docs

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        want = con.execute(
            "SELECT doc_id, n_chars FROM documents WHERE n_chars >= "
            "(SELECT quantile_disc(n_chars, 0.9) FROM documents) ORDER BY doc_id"
        ).df()
        got = long_tail_docs(SF).to_pandas()
        pd.testing.assert_frame_equal(got, want)

    def test_tie_heavy_histogram(self):
        """Ties straddling the rank: 10 docs of length 5, 10 of length
        9 — q=0.5 rank lands mid-run, cut must be that run's value and
        the filter keeps the WHOLE run (plus everything longer)."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.relational import long_tail_docs

        d = tempfile.mkdtemp(prefix="tail_")
        tbl = pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "n_chars": pa.array([5] * 10 + [9] * 10, pa.int64()),
        })
        pq.write_table(tbl, f"{d}/documents.parquet")
        got = long_tail_docs(d, q=0.5).to_pandas()
        # quantile_disc(0.5) of [5x10, 9x10] = element 9 (0-based) = 5
        assert got["n_chars"].tolist() == [5] * 10 + [9] * 10
        got2 = long_tail_docs(d, q=0.55).to_pandas()
        # rank ceil(.55*20)-1 = 10 -> value 9; only the long run stays
        assert got2["n_chars"].tolist() == [9] * 10


class TestCurationStatus:
    def test_all_four_statuses_fixture(self):
        """The sf corpus has no short docs or exact dups, so the oracle
        match there doesn't prove those rungs — this fixture hits every
        rung and the ladder priority (a short doc that is ALSO a dup
        reports too_short)."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.curation import curation_status

        long_a = " ".join(f"w{i}" for i in range(40))
        long_b = long_a + " extra tail words here now"  # near-dup of a
        docs = [
            (0, long_a),                 # kept (rep of its cluster)
            (1, long_a),                 # exact_dup of 0
            (2, long_b),                 # near_dup (cluster rep 0)
            (3, "tiny doc"),             # too_short
            (4, "tiny doc"),             # too_short (NOT exact_dup: ladder)
            (5, " ".join(f"u{i}" for i in range(30))),  # kept, unique
        ]
        d = tempfile.mkdtemp(prefix="cur_")
        pq.write_table(
            pa.table({
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }),
            f"{d}/documents.parquet",
        )
        got = curation_status(d).to_pandas()
        assert got["status"].tolist() == [
            "kept", "exact_dup", "near_dup", "too_short", "too_short", "kept"
        ]

    def test_oracle_sf(self):
        import __ray_entry__ as e

        from ocr_service_ray.analytics.curation import curation_status

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        want = con.execute(e.oracle_sql()["curation_status"]).df()
        got = curation_status(SF).to_pandas()
        pd.testing.assert_frame_equal(got, want)


class TestCrossSnapshotDupes:
    def test_fixture_and_oracle(self):
        """The sf corpora contain no cross-snapshot dups (0-row oracle
        match at the driver); this fixture proves the positive path:
        normalization-equal texts across the doc_id split report the
        MIN base partner."""
        import tempfile

        import pyarrow.parquet as pq

        import __ray_entry__ as e
        from ocr_service_ray.analytics.dedup import cross_snapshot_dupes

        d = tempfile.mkdtemp(prefix="cross_t_")
        texts = [
            "alpha beta", "gamma delta", "ALPHA   beta",
            "unique one", "gamma  DELTA", "gamma delta",
        ]
        pq.write_table(
            pa.table({
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }),
            f"{d}/documents.parquet",
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
        want = con.execute(e.oracle_sql()["cross_snapshot_dupes"]).df()
        got = cross_snapshot_dupes(d).to_pandas()
        pd.testing.assert_frame_equal(got, want)
        # split T=3: docs 4,5 duplicate base docs 1 (gamma delta runs)
        assert got.to_dict("records") == [
            {"doc_id": 4, "base_doc_id": 1},
            {"doc_id": 5, "base_doc_id": 1},
        ]

    def test_sf_oracle(self):
        import __ray_entry__ as e

        from ocr_service_ray.analytics.dedup import cross_snapshot_dupes

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        want = con.execute(e.oracle_sql()["cross_snapshot_dupes"]).df()
        got = cross_snapshot_dupes(SF).to_pandas()
        assert len(got) == len(want)
        if len(got):
            pd.testing.assert_frame_equal(got, want)


class TestFilteredTopk:
    def test_neighbors_respect_predicate(self):
        from ocr_service_ray.analytics.similarity import filtered_topk

        got = filtered_topk(SF).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        en = set(
            con.execute("SELECT doc_id FROM documents WHERE lang = 'en'").df()["doc_id"]
        )
        assert len(got) > 0
        assert set(got["neighbor_id"]).issubset(en)

    def test_unmatched_predicate_is_empty(self):
        from ocr_service_ray.analytics.similarity import filtered_topk

        got = filtered_topk(SF, lang="xx")
        assert got.num_rows == 0
        assert got.column_names == ["query_id", "neighbor_id", "rank"]


class TestAntiJoin:
    def test_empty_right_side_keeps_everyone(self):
        """A threshold above every order price empties the anti-join's
        build side: all customers must come back (the degenerate-side
        guard, where Ray 2.49's hash join would choke on empty
        partitions)."""
        from ocr_service_ray.analytics.relational import (
            customers_without_big_orders,
        )

        sf = "/root/testdata/sf0.001"
        got = customers_without_big_orders(sf, min_total=10**9).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'")
        n = con.execute("SELECT count(*) FROM customer").fetchone()[0]
        assert len(got) == n
        assert got["c_custkey"].is_monotonic_increasing

    def test_everyone_matched_is_empty(self):
        """Threshold 0 makes every customer match (this corpus gives
        every customer an order): exact empty result with stable
        schema."""
        from ocr_service_ray.analytics.relational import (
            customers_without_big_orders,
        )

        got = customers_without_big_orders(
            "/root/testdata/sf0.001", min_total=0.0
        )
        assert got.num_rows == 0
        assert got.column_names == ["c_custkey", "c_name"]


class TestValueNtiles:
    def test_oracle_and_remainder_rule(self):
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import value_ntiles

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        want = con.execute(
            "SELECT event_id, CAST(ntile(4) OVER (ORDER BY value, event_id) "
            "AS BIGINT) AS bucket FROM events ORDER BY event_id"
        ).df()
        got = value_ntiles(SF).to_pandas()
        pd.testing.assert_frame_equal(got, want)
        # 7 rows / 4 buckets: remainder buckets 1..3 get 2 rows, bucket
        # 4 gets 1 (the SQL NTILE rule); and n < k degenerates to rank
        d = tempfile.mkdtemp(prefix="nt_t_")
        pq.write_table(
            pa.table({
                "event_id": pa.array(range(7), pa.int64()),
                "ts": pa.array([0] * 7, pa.timestamp("us")),
                "user_id": pa.array([0] * 7, pa.int64()),
                "event_type": pa.array(["x"] * 7),
                "value": pa.array([5.0, 1.0, 3.0, 2.0, 4.0, 7.0, 6.0]),
                "props": pa.array([""] * 7),
            }),
            f"{d}/events.parquet",
        )
        got2 = value_ntiles(d).to_pandas()
        assert got2["bucket"].tolist() == [3, 1, 2, 1, 2, 4, 3]
        got3 = value_ntiles(d, n_buckets=10).to_pandas()
        con2 = duckdb.connect()
        con2.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        want3 = con2.execute(
            "SELECT event_id, CAST(ntile(10) OVER (ORDER BY value, event_id) "
            "AS BIGINT) AS bucket FROM events ORDER BY event_id"
        ).df()
        pd.testing.assert_frame_equal(got3, want3)


class TestValueRanks:
    def test_mega_tie_runs_span_blocks(self):
        """Adversarial fixture for the cross-block run-continuation
        logic: a multi-file events dir (12 input blocks) where one
        (type, value) run is thousands of rows long, guaranteeing
        duplicate-value runs span sorted-block boundaries; rank /
        dense_rank / row_number / percent_rank must all match the SQL
        window oracle bit-for-bit."""
        import tempfile
        import os

        import numpy as np
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import value_ranks

        d = tempfile.mkdtemp(prefix="ranks_")
        os.makedirs(f"{d}/events.parquet")
        rng = np.random.default_rng(11)
        eid = 0
        for part in range(12):
            n = 500
            etype = rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1])
            # type a: almost all value 7.0 (one mega run); b/c: tiny domains
            val = np.where(
                etype == "a",
                np.where(rng.random(n) < 0.9, 7.0, 9.0),
                rng.integers(0, 4, size=n).astype(float),
            )
            tbl = pa.table({
                "event_id": pa.array(np.arange(eid, eid + n), pa.int64()),
                "ts": pa.array([1_000_000 * i for i in range(n)], pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "event_type": pa.array(list(etype), pa.string()),
                "value": pa.array(val, pa.float64()),
            })
            pq.write_table(tbl, f"{d}/events.parquet/part-{part:02d}.parquet")
            eid += n
        got = value_ranks(d).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
        want = con.execute(
            "SELECT event_id, event_type, "
            "CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, "
            "CAST(rank() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS rnk, "
            "CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS dense_rnk, "
            "CASE WHEN count(*) OVER (PARTITION BY event_type) > 1 THEN "
            "CAST(rank() OVER (PARTITION BY event_type ORDER BY value) - 1 AS DOUBLE) "
            "/ (count(*) OVER (PARTITION BY event_type) - 1) ELSE 0.0 END AS pct_rank "
            "FROM events ORDER BY event_id"
        ).df()
        pd.testing.assert_frame_equal(got, want)

    def test_single_row_partition(self):
        """n=1 partition: percent_rank is defined 0.0, not NaN."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import value_ranks

        tbl = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 0, 0], pa.timestamp("us")),
            "user_id": pa.array([0, 0, 0], pa.int64()),
            "event_type": pa.array(["solo", "duo", "duo"], pa.string()),
            "value": pa.array([5.0, 1.0, 1.0], pa.float64()),
        })
        d = tempfile.mkdtemp(prefix="solo_")
        pq.write_table(tbl, f"{d}/events.parquet")
        got = value_ranks(d).to_pandas()
        solo = got[got.event_type == "solo"].iloc[0]
        assert solo.pct_rank == 0.0 and solo.rnk == 1 and solo.dense_rnk == 1
        duo = got[got.event_type == "duo"]
        assert list(duo.rnk) == [1, 1] and list(duo.rn) == [1, 2]
        assert list(duo.pct_rank) == [0.0, 0.0]


class TestFullOuterProfile:
    def test_dangling_sides_zero_filled(self):
        """The sf corpora may have every user on both sides; this
        fixture pins genuine one-sided users (purchase-only and
        error-only) through the native full_outer join."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.relational import user_purchase_error_profile

        rows = [
            # user 1: both; user 2: purchase only; user 3: error only
            (1, "purchase", 10.0), (1, "error", 1.0),
            (2, "purchase", 20.0), (2, "purchase", 2.5),
            (3, "error", 30.0),
            (4, "click", 99.0),  # neither side: absent from output
        ]
        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        })
        d = tempfile.mkdtemp(prefix="fo_")
        pq.write_table(tbl, f"{d}/events.parquet")
        got = user_purchase_error_profile(d).to_pandas()
        assert list(got.user_id) == [1, 2, 3]
        assert list(got.n_purchases) == [1, 2, 0]
        assert list(got.purchase_cents) == [1000, 2250, 0]
        assert list(got.n_errors) == [1, 0, 1]
        assert list(got.error_cents) == [100, 0, 3000]


@pytest.mark.usefixtures("ray_session")
class TestBpeVocab:
    @staticmethod
    def _reference_bpe(word_freq: dict, n_merges: int):
        """Pure-Python Sennrich-style BPE over a word-frequency dict:
        overlapping pair counts, greedy left-to-right merge, tie-break
        (count desc, pair lexicographic asc)."""
        state = {tuple(w): f for w, f in word_freq.items()}
        merges = []
        for _ in range(n_merges):
            counts = {}
            for syms, f in state.items():
                for p in zip(syms, syms[1:]):
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            (l, r), n = best
            merges.append((l, r, n))
            new_state = {}
            for syms, f in state.items():
                res = []
                i = 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                key = tuple(res)
                new_state[key] = new_state.get(key, 0) + f
            state = new_state
        return merges

    def test_matches_reference_implementation(self):
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import bpe_vocab

        got = bpe_vocab(SF, n_merges=10).to_pandas()
        texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        wf = Counter()
        for t in texts.column("text").to_pylist():
            wf.update(re.findall(r"[a-z0-9]+", (t or "").lower()))
        want = self._reference_bpe(dict(wf), 10)
        assert len(got) == len(want)
        for i, (l, r, n) in enumerate(want):
            row = got.iloc[i]
            assert (row.left, row.right, int(row.pair_count)) == (l, r, n), (
                i, (row.left, row.right, int(row.pair_count)), (l, r, n)
            )

    def test_tiny_overlap_and_ties(self):
        """'aaaa' exercises overlapping pair counting (3 counted, 2
        mergeable) and deterministic lexicographic ties."""
        import tempfile

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import bpe_vocab

        tbl = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aaaa aaaa", "bb bb"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([9, 5], pa.int64()),
        })
        d = tempfile.mkdtemp(prefix="bpe_")
        pq.write_table(tbl, f"{d}/documents.parquet")
        got = bpe_vocab(d, n_merges=3).to_pandas()
        wf = {"aaaa": 2, "bb": 2}
        want = self._reference_bpe(wf, 3)
        assert [
            (r.left, r.right, int(r.pair_count)) for r in got.itertuples()
        ] == want


class TestAsofTieSemantics:
    def test_oracle_equals_native_asof_when_tie_free(self):
        """The driver oracle switched from native ASOF to an explicit
        window form (native ASOF leaves duplicate-build-ts ties
        unspecified — found by the oracle fuzz); on tie-free corpora
        like the sf tables the two must coincide, keeping the
        'matches DuckDB ASOF' claim pinned."""
        from ocr_service_ray.pipeline import entry_api

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        explicit = con.execute(entry_api.oracle_sql()["asof_join"]).df()
        native = con.execute(
            "SELECT a.event_id AS event_id, "
            "COALESCE(b.event_id, -1) AS prior_purchase_id, "
            "COALESCE(CAST(epoch_us(a.ts) - epoch_us(b.ts) AS DOUBLE) / 1000000.0, -1.0) AS gap_s "
            "FROM (SELECT * FROM events WHERE event_type = 'click') a "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b "
            "ON a.user_id = b.user_id AND a.ts > b.ts "
            "ORDER BY a.event_id"
        ).df()
        pd.testing.assert_frame_equal(explicit, native)


class TestFuzzyTokenPairs:
    """FastSS deletion-neighborhood join: the sf vocab exercises only a
    handful of distance-2 pairs, so these fixtures drive the full
    ladder — typo clusters (sub/ins/del), false-positive variant
    collisions, and a randomized banded-DP vs DuckDB levenshtein
    parity sweep."""

    def _sf(self, tmp_path, texts):
        import pyarrow.parquet as pq

        tbl = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_typo_corpus_matches_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import fuzzy_token_pairs
        from ocr_service_ray.pipeline import entry_api

        sf = self._sf(tmp_path, [
            # substitution / deletion / insertion variants of "table"
            "table table tble tables tadle",
            # a second cluster plus unrelated far words
            "receipt receit receipts zzzzzzzz qqqq",
            # shared-variant false positive shape: ab/ba-style words
            "abc bac cab xyz",
        ])
        got = fuzzy_token_pairs(sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        want = con.execute(entry_api.oracle_sql()["fuzzy_token_pairs"]).df()
        pd.testing.assert_frame_equal(got, want)
        # the positive path really fired
        assert len(got) >= 8

    def test_lev_banded_matches_duckdb(self):
        """_lev_le_k (banded DP, early exit) == levenshtein()<=k on a
        randomized sweep including length gaps beyond the band."""
        import numpy as np

        from ocr_service_ray.analytics.text_analysis import _lev_le_k

        rng = np.random.default_rng(42)
        alpha = list("abcd")
        words = [
            "".join(rng.choice(alpha, size=rng.integers(0, 9)))
            for _ in range(120)
        ]
        con = duckdb.connect()
        for k in (1, 2):
            for a in words[:40]:
                for b in words[40:80]:
                    want = con.execute(
                        "SELECT levenshtein(?, ?) <= ?", [a, b, k]
                    ).fetchone()[0]
                    assert _lev_le_k(a, b, k) == want, (a, b, k)


class TestGapFillAndSweepLine:
    """The sf events table is calendar-dense (every type occurs every
    day), so the oracle equality there never emits a 0 row; this
    fixture has real holes. The sweep fixture pins the ends-before-
    starts tie rule at exactly-touching intervals."""

    def _events(self, tmp_path, rows):
        import datetime

        import pyarrow.parquet as pq

        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, d, h) for d, h, *_ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        })
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def _oracle(self, sf, name):
        from ocr_service_ray.pipeline import entry_api

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        return con.execute(entry_api.oracle_sql()[name]).df()

    def test_gap_fill_emits_zero_rows(self, tmp_path):
        from ocr_service_ray.analytics.windows import daily_counts_filled

        # days 1, 2, 5 only; type 'b' missing entirely on day 2
        sf = self._events(tmp_path, [
            (1, 0, 1, "a", 1.0), (1, 1, 1, "b", 1.0),
            (2, 0, 2, "a", 1.0),
            (5, 0, 3, "a", 1.0), (5, 1, 3, "b", 1.0),
        ])
        got = daily_counts_filled(sf).to_pandas()
        want = self._oracle(sf, "daily_counts_filled")
        pd.testing.assert_frame_equal(got, want)
        # 5 calendar days x 2 types, and the holes really are zeros
        assert len(got) == 10
        assert (got["n_events"] == 0).sum() == 5

    def test_sweep_line_touching_intervals(self, tmp_path):
        from ocr_service_ray.analytics.windows import max_concurrency

        # user 1: [0h, +3600s) then [1h, +3600s) touch exactly ->
        # half-open semantics must NOT count them as overlapping;
        # user 2: three genuinely nested intervals -> peak 3
        sf = self._events(tmp_path, [
            (1, 0, 1, "a", 3600.0), (1, 1, 1, "a", 3600.0),
            (2, 0, 2, "a", 7200.0), (2, 1, 2, "a", 3600.0),
            (2, 1, 2, "a", 1800.0),
        ])
        got = max_concurrency(sf).to_pandas()
        want = self._oracle(sf, "max_concurrency")
        pd.testing.assert_frame_equal(got, want)
        assert got.set_index("user_id")["max_concurrent"].to_dict() == {1: 1, 2: 3}


class TestGraphPagerank:
    """No SQL oracle (iterative global state) — pinned by the exact
    pure-Python integer-recurrence reference (the kmeans/bpe
    precedent) plus a hand-built hub graph."""

    def test_matches_reference_sf(self):
        import numpy as np

        from ocr_service_ray.analytics.graph import (
            graph_pagerank,
            pagerank_reference,
        )
        from ocr_service_ray.analytics.similarity import knn_join

        t = graph_pagerank(SF, k=5, iters=6)
        e = knn_join(SF, k=5)
        edges = list(zip(e.column("vec_id").to_pylist(),
                         e.column("neighbor_id").to_pylist()))
        n = t.num_rows
        ref = pagerank_reference(edges, n, 5, 6)
        assert np.array_equal(np.asarray(t.column("score_micros")), ref)
        # non-degenerate: centrality actually varies
        assert ref.min() < ref.max()

    def test_hub_graph(self, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.graph import graph_pagerank

        # node 0 is the near-duplicate hub: vectors 1..8 all point at
        # it; 9..11 are an unrelated orthogonal clique
        rng = np.random.default_rng(3)
        hub = np.array([1.0] + [0.0] * 7)
        vecs = [hub]
        for _ in range(8):
            vecs.append(hub + rng.normal(0, 0.01, 8))
        base2 = np.array([0.0] * 7 + [1.0])
        for _ in range(3):
            vecs.append(base2 + rng.normal(0, 0.01, 8))
        tbl = pa.table({
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
            "label": pa.array([0] * 12, pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        out = graph_pagerank(str(tmp_path), k=3, iters=8).to_pandas()
        # vectors 1..8 all have node 0 as a nearest neighbor (8
        # in-links vs <=4 for anyone else): the hub must rank first
        assert int(out.loc[out["rank"] == 1, "vec_id"].iloc[0]) == 0

    def test_dataset_leg_bit_identical(self):
        """broadcast_max_nodes=0 forces the rank-as-Dataset join leg
        (the 10^12-node path, no O(n) driver state): it must produce
        the BIT-IDENTICAL table the broadcast leg produces, and both
        must match the pure-Python reference."""
        import numpy as np

        from ocr_service_ray.analytics.graph import (
            graph_pagerank,
            pagerank_reference,
        )
        from ocr_service_ray.analytics.similarity import knn_join

        broadcast = graph_pagerank(SF, k=5, iters=4)
        dataset = graph_pagerank(SF, k=5, iters=4, broadcast_max_nodes=0)
        assert broadcast.equals(dataset)
        e = knn_join(SF, k=5)
        edges = list(zip(e.column("vec_id").to_pylist(),
                         e.column("neighbor_id").to_pylist()))
        ref = pagerank_reference(edges, broadcast.num_rows, 5, 4)
        assert np.array_equal(np.asarray(dataset.column("score_micros")), ref)


class TestTriangleCount:
    """The sf co-occurrence graph is complete (every item pair meets
    support) so every orientation path degenerates; this sparse
    fixture pins the degree-orientation wedge plan on a graph with
    known triangles and a support-filtered edge."""

    def test_two_triangle_graph(self, tmp_path):
        import datetime

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.graph import triangle_count
        from ocr_service_ray.pipeline import entry_api

        rows = []
        # two users each with basket {1,2,3}; two with {3,4,5};
        # one lone user with {1,4} (support 1 -> edge dropped)
        baskets = [(10, [1, 2, 3]), (11, [1, 2, 3]),
                   (20, [3, 4, 5]), (21, [3, 4, 5]),
                   (30, [1, 4])]
        for uid, items in baskets:
            for it in items:
                rows.append((uid, it))
        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 0, i) for i in range(len(rows))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([f'{{"k": {r[1]}}}' for r in rows], pa.string()),
        })
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        got = triangle_count(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        want = con.execute(entry_api.oracle_sql()["triangle_count"]).df()
        pd.testing.assert_frame_equal(got, want)
        assert got.set_index("k")["n_triangles"].to_dict() == {
            1: 1, 2: 1, 3: 2, 4: 1, 5: 1
        }


class TestTrimmedMean:
    def test_boundary_ties_straddle(self, tmp_path):
        """10 values per type with the trim boundary INSIDE a tie run:
        rank-trim must drop exactly (trim - count(v<lo)) copies of the
        boundary value, not all or none of them."""
        import datetime

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import trimmed_mean
        from ocr_service_ray.pipeline import entry_api

        vals = [1.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 9.0, 9.0, 9.0]
        tbl = pa.table({
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 0, i) for i in range(len(vals))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1] * len(vals), pa.int64()),
            "event_type": pa.array(["x"] * len(vals), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * len(vals), pa.string()),
        })
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        got = trimmed_mean(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
        want = con.execute(entry_api.oracle_sql()["trimmed_mean"]).df()
        pd.testing.assert_frame_equal(got, want)
        # trim=1: drops one 1.0 and one 9.0; kept sum = 34.0 -> 3400c
        assert got.loc[0, "n_kept"] == 8 and got.loc[0, "sum_cents"] == 3400


class TestTextIndex:
    def test_index_partitions_cover_corpus(self):
        """Every posting sits in exactly the bucket dir its term
        hashes to (the property pruning relies on), and the union of
        buckets is the full distinct (term, doc) posting set."""
        import glob
        import os

        import numpy as np
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.hashing import md5_hash_tokens
        from ocr_service_ray.analytics.text_index import build_text_index

        root = build_text_index(SF, n_buckets=16)
        files = glob.glob(os.path.join(root, "bucket=*", "*.parquet"))
        assert files
        total = 0
        for f in files:
            b = int(f.split("bucket=")[1].split("/")[0])
            t = pq.read_table(f, columns=["term"])
            terms = t.column("term").to_pylist()
            total += len(terms)
            hb = md5_hash_tokens(terms) % np.uint64(16)
            assert (hb == b).all()
        # distinct postings == sum over docs of distinct terms per doc
        import duckdb as dk

        want = dk.connect().execute(
            f"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(
            lower(text), '[a-z0-9]+')) AS term FROM '{SF}/documents.parquet')
            SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM tok)"""
        ).fetchone()[0]
        assert total == want

    def test_search_reads_only_query_buckets(self, monkeypatch):
        """The search must open ONLY the query terms' bucket dirs."""
        import ray.data as rd

        from ocr_service_ray.analytics import text_index as ti

        seen = {}
        orig = rd.read_parquet

        def spy(paths, **kw):
            if isinstance(paths, list):
                seen["paths"] = paths
            return orig(paths, **kw)

        monkeypatch.setattr(rd, "read_parquet", spy)
        got = ti.text_search(SF, terms=["the"])
        assert "paths" in seen
        buckets = {p.split("bucket=")[1].split("/")[0] for p in seen["paths"]}
        assert len(buckets) == 1  # one term -> one bucket dir
        # and the result is the brute truth
        import duckdb as dk

        want = dk.connect().execute(
            f"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(
            lower(text), '[a-z0-9]+')) AS term FROM '{SF}/documents.parquet')
            SELECT DISTINCT doc_id FROM tok WHERE term = 'the' ORDER BY doc_id"""
        ).fetch_arrow_table()
        assert got.to_pylist() == want.to_pylist()

    def test_incremental_append_equals_full(self):
        """base+incr drops carry the full posting set; a crashed append
        retry rebuilds ONLY the incr drop (base files byte/mtime
        untouched, no duplicated postings); search over the appended
        index == search over the full build."""
        import glob
        import os
        import shutil

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics import text_index as ti

        root = ti._index_root(SF, 16) + "-incr"
        shutil.rmtree(root, ignore_errors=True)
        subroots = ti.build_text_index_incremental(SF, 16)
        base_files = sorted(glob.glob(os.path.join(subroots[0], "bucket=*", "*.parquet")))
        incr_files = sorted(glob.glob(os.path.join(subroots[1], "bucket=*", "*.parquet")))
        assert base_files and incr_files
        n_rows = lambda fs: sum(pq.read_metadata(f).num_rows for f in fs)
        full = glob.glob(os.path.join(ti.build_text_index(SF, 16), "bucket=*", "*.parquet"))
        incr_rows = n_rows(incr_files)
        assert n_rows(base_files) + incr_rows == n_rows(full)
        mtimes = {f: os.path.getmtime(f) for f in base_files}
        # crash-retry of the append: marker gone, files (possibly
        # partial) present -> the retry must replace the incr drop
        # only, never touch base, never double-count
        os.remove(os.path.join(subroots[1], "_BUILT"))
        ti.build_text_index_incremental(SF, 16)
        assert {
            f: os.path.getmtime(f)
            for f in sorted(glob.glob(os.path.join(subroots[0], "bucket=*", "*.parquet")))
        } == mtimes
        incr_files2 = sorted(glob.glob(os.path.join(subroots[1], "bucket=*", "*.parquet")))
        assert n_rows(incr_files2) == incr_rows
        got = ti.text_search_incremental(SF)
        want = ti.text_search(SF)
        assert got.to_pylist() == want.to_pylist()


@pytest.mark.usefixtures("ray_session")
class TestSemanticDedup:
    """SemDeDup (kmeans-bucketed within-cluster cosine dedup) — no SQL
    oracle (kmeans assignment isn't SQL-expressible), so it is pinned by
    a whole-corpus same-algorithm numpy reference plus structural
    consistency checks."""

    def _reference(self, sf, n_clusters=8, threshold=0.45):
        import numpy as np
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.similarity import _norm_rows, kmeans_fit

        cent = kmeans_fit(sf, n_clusters=n_clusters)
        tbl = pq.read_table(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_by([("vec_id", "ascending")])
        ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
        m = _norm_rows(np.vstack(tbl.column("embedding").to_pylist()).astype(np.float64))
        clusters = (m @ cent.T).argmax(axis=1)
        keep = {}
        dup_of = {}
        for c in np.unique(clusters):
            mask = clusters == c
            cids = ids[mask]
            cm = m[mask]
            sims = cm @ cm.T  # same canonical (vec_id-sorted) matrix as the op
            kept_idx: list[int] = []
            for i in range(len(cids)):
                best_j, best_s = -1, -np.inf
                for j in kept_idx:
                    if sims[i, j] > best_s:
                        best_j, best_s = j, sims[i, j]
                if best_s > threshold:
                    keep[int(cids[i])] = False
                    dup_of[int(cids[i])] = int(cids[best_j])
                else:
                    keep[int(cids[i])] = True
                    kept_idx.append(i)
        return clusters, ids, keep, dup_of

    def test_matches_reference_and_consistency(self):
        import numpy as np

        from ocr_service_ray.analytics.dedup import semantic_dedup
        from ocr_service_ray.analytics.similarity import _norm_rows

        out = semantic_dedup(SF).to_pandas()
        clusters, ids, keep, dup_of = self._reference(SF)
        assert len(out) == len(ids)
        got = out.set_index("vec_id")
        # exact parity with the same-algorithm driver reference
        for i, vid in enumerate(ids):
            assert got.loc[vid, "cluster"] == clusters[i]
            assert bool(got.loc[vid, "keep"]) == keep[int(vid)]
            if not keep[int(vid)]:
                assert int(got.loc[vid, "dup_of"]) == dup_of[int(vid)]
        # structural consistency: every drop names a kept, lower-id,
        # same-cluster vector whose TRUE cosine similarity > threshold
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_by([("vec_id", "ascending")])
        m = _norm_rows(np.vstack(tbl.column("embedding").to_pylist()).astype(np.float64))
        pos = {int(v): i for i, v in enumerate(np.asarray(tbl.column("vec_id")))}
        dropped = out[~out["keep"]]
        assert len(dropped) > 0  # the sf corpora contain planted near-dups
        for _, r in dropped.iterrows():
            ref = got.loc[r["dup_of"]]
            assert bool(ref["keep"]) and r["dup_of"] < r["vec_id"]
            assert ref["cluster"] == r["cluster"]
            sim = float(m[pos[int(r["vec_id"])]] @ m[pos[int(r["dup_of"])]])
            assert sim > 0.45
        # keeps never carry a dup_of
        assert out[out["keep"]]["dup_of"].isna().all()

    def test_data_derived_k_two_values(self):
        """n_clusters=None derives k from corpus size (ceil(n/target),
        floor 8): exact reference parity at two different auto-derived
        k values, and the derivation rule itself is pinned."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.dedup import (
            derived_n_clusters,
            semantic_dedup,
        )

        n = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
        assert derived_n_clusters(n, 512) == 8          # floor binds
        assert derived_n_clusters(n, 32) == -(-n // 32)  # ceil(n/32) > 8
        assert derived_n_clusters(10**12, 512) == -(-(10**12) // 512)
        for target in (512, 32):
            k = derived_n_clusters(n, target)
            out = (
                semantic_dedup(SF, target_cluster_size=target)
                .to_pandas()
                .set_index("vec_id")
            )
            clusters, ids, keep, dup_of = self._reference(SF, n_clusters=k)
            assert len(out) == len(ids)
            for i, vid in enumerate(ids):
                assert out.loc[vid, "cluster"] == clusters[i]
                assert bool(out.loc[vid, "keep"]) == keep[int(vid)]
                if not keep[int(vid)]:
                    assert int(out.loc[vid, "dup_of"]) == dup_of[int(vid)]


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingPca:
    """Distributed PCA — no SQL oracle (eigendecomposition); pinned by
    exact blocking invariance, a same-algorithm driver reference for the
    projections, and an eigenstructure cross-check against np.cov."""

    def test_fit_blocking_invariance(self):
        import ray.data

        from ocr_service_ray.analytics.similarity import _emb, pca_fit

        m1, c1, e1 = pca_fit(SF)
        m2, c2, e2 = pca_fit(SF, ds=_emb(SF).repartition(7))
        assert (m1 == m2).all() and (c1 == c2).all() and (e1 == e2).all()

    def test_projection_reference_and_eigenstructure(self):
        import numpy as np
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.similarity import embedding_pca, pca_fit

        out = embedding_pca(SF).to_pandas().set_index("vec_id").sort_index()
        mean, comps, evals = pca_fit(SF)
        tbl = pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_by([("vec_id", "ascending")])
        ids = np.asarray(tbl.column("vec_id"))
        m = np.vstack(tbl.column("embedding").to_pylist()).astype(np.float64)
        # same fixed-dimension-order accumulation as the operator ->
        # bit-identical projections
        y = np.zeros((len(m), comps.shape[0]))
        for j in range(comps.shape[1]):
            y += np.outer(m[:, j] - mean[j], comps[:, j])
        assert (out.index.to_numpy() == ids).all()  # both vec_id-sorted
        got = out[[f"pc{i+1}" for i in range(comps.shape[0])]].to_numpy()
        assert (got == y).all()
        # eigenstructure: fixed-point totals reproduce np.cov's spectrum
        cov = np.cov(m, rowvar=False, bias=True)
        ref = np.sort(np.linalg.eigvalsh(cov))[::-1][: len(evals)]
        assert np.allclose(evals, ref, atol=1e-5)
        # components orthonormal; projection variances == eigenvalues
        assert np.allclose(comps @ comps.T, np.eye(len(evals)), atol=1e-9)
        assert np.allclose(got.var(axis=0), evals, atol=1e-5)
        assert (np.diff(evals) <= 1e-12).all()  # descending


@pytest.mark.usefixtures("ray_session")
class TestBpeEncode:
    """Encode side of the tokenizer story — pinned by a pure-Python
    reference encode using the bpe_vocab merge table, plus the
    compression-bound invariants."""

    def test_matches_reference_encode(self):
        import re

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import bpe_encode, bpe_vocab

        got = bpe_encode(SF, n_merges=10).to_pandas().set_index("doc_id")
        vocab = bpe_vocab(SF, n_merges=10)
        merges = list(zip(vocab.column("left").to_pylist(),
                          vocab.column("right").to_pylist()))

        def encode_len(word: str) -> int:
            p = list(word)
            for l, r in merges:
                res, i = [], 0
                while i < len(p):
                    if i < len(p) - 1 and p[i] == l and p[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(p[i])
                        i += 1
                p = res
            return len(p)

        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        memo: dict = {}
        for did, text in zip(docs.column("doc_id").to_pylist(),
                             docs.column("text").to_pylist()):
            words = re.findall(r"[a-z0-9]+", (text or "").lower())
            want_tokens = 0
            for w in words:
                if w not in memo:
                    memo[w] = encode_len(w)
                want_tokens += memo[w]
            assert int(got.loc[did, "n_words"]) == len(words)
            assert int(got.loc[did, "n_tokens"]) == want_tokens, did
        # compression bounds: chars >= tokens >= words (merges only
        # shrink; every word is at least one token)
        n_chars = {
            did: sum(len(w) for w in re.findall(r"[a-z0-9]+", (t or "").lower()))
            for did, t in zip(docs.column("doc_id").to_pylist(),
                              docs.column("text").to_pylist())
        }
        assert (got["n_tokens"] >= got["n_words"]).all()
        assert all(int(got.loc[d, "n_tokens"]) <= c for d, c in n_chars.items())
        # more merges never increase the token count
        from ocr_service_ray.analytics.text_analysis import bpe_encode as be

        fewer = be(SF, n_merges=3).to_pandas().set_index("doc_id")
        assert (got["n_tokens"] <= fewer["n_tokens"]).all()


@pytest.mark.usefixtures("ray_session")
class TestSaltedJoin:
    """purchaser_clicks_salted: the hot-key-salting plan must equal the
    broadcast plan, and a mega-hot key must actually fan out across
    multiple salted join partitions."""

    def test_plan_equality_at_sf(self):
        from ocr_service_ray.analytics.windows import (
            purchaser_clicks,
            purchaser_clicks_salted,
        )

        a = purchaser_clicks(SF).to_pandas()
        b = purchaser_clicks_salted(SF).to_pandas()
        pd.testing.assert_frame_equal(a, b)

    def test_mega_hot_key_fans_out(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import purchaser_clicks_salted

        # user 7: 5000 clicks + 1 purchase (the hot key); users 1..5:
        # 3 clicks each, users 1,2 purchase; user 9 clicks, no purchase
        rows = []
        eid = 0
        for _ in range(5000):
            rows.append((eid, 7, "click")); eid += 1
        rows.append((eid, 7, "purchase")); eid += 1
        for u in range(1, 6):
            for _ in range(3):
                rows.append((eid, u, "click")); eid += 1
        for u in (1, 2):
            rows.append((eid, u, "purchase")); eid += 1
        for _ in range(4):
            rows.append((eid, 9, "click")); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        })
        pq.write_table(tbl, tmp_path / "events.parquet", row_group_size=512)
        st: dict = {}
        out = purchaser_clicks_salted(str(tmp_path), stats=st).to_pandas()
        got = dict(zip(out["user_id"], out["n_clicks"]))
        assert got == {1: 3, 2: 3, 7: 5000}
        assert 7 in st["hot_keys"]
        # the hot key's probe rows really spread across several salts
        assert st["hot_fanout"][7] >= 4


@pytest.mark.usefixtures("ray_session")
class TestZorderLayout:
    """Z-order clustering: the result is oracle-exact (parametrized
    list above); here we pin the IO property — predicates on EITHER
    dimension must prune partitions, which only holds when both lanes
    are normalized to the full bit width before the Morton interleave
    (the raw-value layout measurably failed the lang-only case)."""

    def test_both_dimensions_prune(self):
        from ocr_service_ray.pipeline.cluster import (
            _ZORDER_CACHE,
            docs_in_char_lang_box,
            pruned_parts_box,
        )

        st: dict = {}
        out = docs_in_char_lang_box(SF, stats=st).to_pandas()
        assert st["parts_total"] >= 4, st
        assert st["parts_opened"] < st["parts_total"], st
        root = _ZORDER_CACHE[SF]
        import pyarrow.parquet as pq

        langs = sorted(set(
            pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
            .column("lang").to_pylist()
        ))
        lang_only, total = pruned_parts_box(root, {"lang": (langs[0], langs[0])})
        chars_only, _ = pruned_parts_box(root, {"n_chars": (400, 700)})
        assert len(lang_only) < total, (len(lang_only), total)
        assert len(chars_only) < total, (len(chars_only), total)
        # the 2-D box is at least as selective as either 1-D box
        assert st["parts_opened"] <= min(len(lang_only), len(chars_only))
        # residual filter exactness survives part boundaries
        assert (out["lang"] == langs[0]).all()
        assert out["n_chars"].between(400, 700).all()

    def test_zorder_value_morton_property(self):
        """The Morton code must interleave: z(a, b) with single-bit
        inputs lands each lane at alternating positions."""
        import numpy as np

        from ocr_service_ray.pipeline.cluster import zorder_value

        a = np.array([1, 0, 3], np.int64)
        b = np.array([0, 1, 3], np.int64)
        z = zorder_value(a, b)
        assert z.tolist() == [1, 2, 15]
        # monotone in each lane when the other is fixed
        xs = np.arange(100, dtype=np.int64)
        assert (np.diff(zorder_value(xs, np.zeros(100, np.int64))) > 0).all()
        assert (np.diff(zorder_value(np.zeros(100, np.int64), xs)) > 0).all()


class TestSkylineKernel:
    """_skyline_2d tie/duplicate semantics + the merge theorem."""

    def test_ties_duplicates_antichain(self):
        import numpy as np

        from ocr_service_ray.analytics.text_analysis import _skyline_2d

        # anti-chain: every point survives
        a = np.array([1, 2, 3], np.int64)
        b = np.array([3, 2, 1], np.int64)
        assert _skyline_2d(a, b).all()
        # strict dominance removes; equal-in-one strict-in-other removes
        a = np.array([2, 2, 1, 3], np.int64)
        b = np.array([2, 3, 2, 3], np.int64)
        # (3,3) dominates everything else
        assert _skyline_2d(a, b).tolist() == [False, False, False, True]
        # exact duplicates of a maximal point are ALL kept
        a = np.array([5, 5, 4], np.int64)
        b = np.array([5, 5, 9], np.int64)
        assert _skyline_2d(a, b).tolist() == [True, True, True]
        # same-a group: only the max-b rows survive
        a = np.array([5, 5, 5], np.int64)
        b = np.array([1, 7, 7], np.int64)
        assert _skyline_2d(a, b).tolist() == [False, True, True]

    def test_merge_theorem_random(self):
        """Skyline(union of block skylines) == skyline(all points)."""
        import numpy as np

        from ocr_service_ray.analytics.text_analysis import _skyline_2d

        rng = np.random.default_rng(5)
        a = rng.integers(0, 40, 600).astype(np.int64)
        b = rng.integers(0, 40, 600).astype(np.int64)
        want = {(x, y) for x, y in zip(a[_skyline_2d(a, b)], b[_skyline_2d(a, b)])}
        cand_a, cand_b = [], []
        for blk in np.array_split(np.arange(600), 7):
            m = _skyline_2d(a[blk], b[blk])
            cand_a.extend(a[blk][m]); cand_b.extend(b[blk][m])
        ca, cb = np.array(cand_a, np.int64), np.array(cand_b, np.int64)
        got = {(x, y) for x, y in zip(ca[_skyline_2d(ca, cb)], cb[_skyline_2d(ca, cb)])}
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestAdaptiveJoinPlanner:
    """purchaser_clicks_auto: each routing branch must fire under the
    matching statistics and return the identical result."""

    def _mk_events(self, tmp_path, hot_clicks: int):
        import pyarrow.parquet as pq

        rows = []
        eid = 0
        for _ in range(hot_clicks):
            rows.append((eid, 7, "click")); eid += 1
        rows.append((eid, 7, "purchase")); eid += 1
        for u in range(1, 6):
            for _ in range(3):
                rows.append((eid, u, "click")); eid += 1
        for u in (1, 2):
            rows.append((eid, u, "purchase")); eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        })
        pq.write_table(tbl, tmp_path / "events.parquet", row_group_size=512)
        return str(tmp_path)

    def test_each_branch_fires_and_agrees(self, tmp_path):
        from ocr_service_ray.analytics.windows import (
            purchaser_clicks,
            purchaser_clicks_auto,
        )

        d = self._mk_events(tmp_path, hot_clicks=2000)
        want = purchaser_clicks(d).to_pandas()

        st: dict = {}
        got = purchaser_clicks_auto(d, stats=st).to_pandas()
        assert st["plan"] == "broadcast" and st["est_purchasers"] <= 10
        pd.testing.assert_frame_equal(got, want)

        st = {}
        got = purchaser_clicks_auto(d, broadcast_limit=0, stats=st).to_pandas()
        assert st["plan"] == "salted"  # user 7 dominates the clicks
        pd.testing.assert_frame_equal(got, want)

        st = {}
        got = purchaser_clicks_auto(
            d, broadcast_limit=0, skew_factor=1, stats=st
        ).to_pandas()
        assert st["plan"] == "bloom"  # skew gate disabled -> big-big
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestExportCurated:
    def test_roundtrip_lineage_idempotent(self, tmp_path):
        import pyarrow.compute as pc

        from ocr_service_ray.analytics.curation import (
            curation_status,
            export_curated,
        )
        from ocr_service_ray.core import storage

        st = curation_status(SF)
        kept = set(
            st.filter(pc.equal(st.column("status"), "kept"))
            .column("doc_id").to_pylist()
        )
        out = str(tmp_path / "curated")
        summ = export_curated(SF, out)
        assert summ["n_kept"] == len(kept)
        got: set = set()
        schema = None
        for p in storage.list_parts(out):
            t = storage.read_part(out, p)
            got |= set(t.column("doc_id").to_pylist())
            schema = t.schema
            m = storage.read_manifest(out, p)
            assert m["source_root"] == SF
            assert m["rule"]["ladder"] == "curation_status"
            assert m["n_docs"] == t.num_rows
        assert got == kept
        # full rows survive (all source columns, not just ids)
        assert {"doc_id", "text", "lang", "source", "n_chars"} <= set(schema.names)
        # re-export is idempotent (stale parts cleared, same doc set)
        summ2 = export_curated(SF, out)
        assert summ2["n_kept"] == summ["n_kept"]
        got2 = {
            d
            for p in storage.list_parts(out)
            for d in storage.read_part(out, p).column("doc_id").to_pylist()
        }
        assert got2 == kept

    def test_resume_skips_committed_parts(self, tmp_path):
        import os

        from ocr_service_ray.analytics.curation import export_curated
        from ocr_service_ray.core import storage

        out = str(tmp_path / "curated_r")
        export_curated(SF, out)
        parts = storage.list_parts(out)
        assert len(parts) >= 2
        victim = parts[0]
        survivor = parts[1]
        # simulate a crash after some parts committed: remove one
        # part's manifest + data, note another's mtime
        pdir = os.path.join(out, f"part={victim}")
        import shutil

        shutil.rmtree(pdir)
        spath = os.path.join(out, f"part={survivor}")
        mtime_before = max(
            os.path.getmtime(os.path.join(spath, f)) for f in os.listdir(spath)
        )
        export_curated(SF, out, resume=True)
        # the missing part is back, the committed one untouched
        assert victim in storage.list_parts(out)
        mtime_after = max(
            os.path.getmtime(os.path.join(spath, f)) for f in os.listdir(spath)
        )
        assert mtime_after == mtime_before
        got = {
            d
            for p in storage.list_parts(out)
            for d in storage.read_part(out, p).column("doc_id").to_pylist()
        }
        full = str(tmp_path / "curated_full")
        export_curated(SF, full)
        want = {
            d
            for p in storage.list_parts(full)
            for d in storage.read_part(full, p).column("doc_id").to_pylist()
        }
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestDatasetMixture:
    def test_rebalances_token_mass_per_source(self):
        """Each source's repeated token mass must land near the equal
        share T/k — within one max-doc-token quantum per stochastic
        rounding, far tighter than the raw per-source imbalance."""
        import re

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.relational import dataset_mixture

        out = dataset_mixture(SF).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "source", "text"])
        tok = {
            d: len(re.findall(r"[^ \t\n\f\r]+", t or ""))
            for d, t in zip(docs.column("doc_id").to_pylist(),
                            docs.column("text").to_pylist())
        }
        src_of = dict(zip(docs.column("doc_id").to_pylist(),
                          docs.column("source").to_pylist()))
        import numpy as np

        per_src: dict = {}
        for d, n in tok.items():
            s = src_of[d]
            per_src.setdefault(s, []).append((n, int(out.loc[d, "n_repeats"])))
        total = sum(n for v in per_src.values() for n, _ in v)
        share = total / len(per_src)
        for s, rows in per_src.items():
            raw = sum(n for n, _ in rows)
            mixed = sum(n * r for n, r in rows)
            # E[mixed] == share EXACTLY (factor * raw); the only error
            # is the per-doc Bernoulli rounding — bound it by 5 sigma
            # of sum(t_d^2 p(1-p)) plus one token quantum (tiny
            # per-source doc counts at sf0.001 make a fixed % wrong)
            factor = (np.float64(total) / len(per_src)) / np.float64(raw)
            p = factor - np.floor(factor)
            sd = np.sqrt(sum(n * n for n, _ in rows) * p * (1 - p))
            assert abs(mixed - share) <= 5 * sd + 1, (s, raw, mixed, share, sd)
            # every repeat count is base or base+1
            base = int(np.floor(factor))
            assert all(r in (base, base + 1) for _, r in rows), s
        assert (out["n_repeats"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
class TestLshSignatureIndex:
    """Persistent LSH index: the probe must equal the recompute plan,
    and a small incremental batch must touch only its own buckets."""

    def test_plan_equality_with_recompute(self):
        from ocr_service_ray.analytics.dedup import (
            cross_snapshot_neardup,
            cross_snapshot_neardup_indexed,
        )

        a = cross_snapshot_neardup(SF).to_pandas()
        b = cross_snapshot_neardup_indexed(SF).to_pandas()
        pd.testing.assert_frame_equal(a, b)

    def test_small_probe_prunes_buckets(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.dedup import (
            cross_snapshot_neardup_indexed,
        )

        # archive: docs 0..60 (T = (121+1)//2 = 61); new side: ONE doc
        # (id 121) that is a near-dup of archive doc 3
        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon"
        )
        texts = [f"{base} doc{i} unique{i} tail{i} words{i} here{i}" for i in range(61)]
        ids = list(range(61)) + [121]
        texts.append(texts[3] + " extra")
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["s"] * len(ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        st: dict = {}
        out = cross_snapshot_neardup_indexed(str(tmp_path), stats=st).to_pandas()
        # one new doc -> at most `bands` buckets probed, strictly fewer
        # than the layout's total
        assert st["buckets_probed"] <= 16 < st["buckets_total"] or (
            st["buckets_probed"] < st["buckets_total"]
        )
        assert (out["doc_id"] == 121).all() and 3 in set(out["base_doc_id"])


@pytest.mark.usefixtures("ray_session")
class TestIvfHotCell:
    def test_skewed_corpus_splits_hot_cell_files(self, tmp_path):
        """A duplicate-heavy corpus collapses k-means into one hot cell;
        the layout must cap rows per file so the cell reads as parallel
        bounded tasks, and the probe must still return full results."""
        import glob
        import os

        import numpy as np
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics import similarity

        rng = np.random.default_rng(3)
        n, d = 9000, 16
        m = rng.normal(0, 1, (n, d)).astype(np.float32)
        m[100:] = m[99]  # 8,900 identical vectors -> one hot cell
        pq.write_table(
            pa.table({
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array([list(map(float, r)) for r in m],
                                      pa.list_(pa.float32())),
            }),
            tmp_path / "embeddings.parquet",
        )
        root = similarity.ivf_build_index(str(tmp_path), n_clusters=8)
        per_cell = {
            c: sorted(glob.glob(os.path.join(root, c, "*.parquet")))
            for c in os.listdir(root)
            if c.startswith("cell=")
        }
        sizes = {
            c: [pq.read_metadata(f).num_rows for f in fs]
            for c, fs in per_cell.items()
        }
        assert all(r <= 4096 for rs in sizes.values() for r in rs), sizes
        assert max(len(fs) for fs in per_cell.values()) >= 2  # hot cell split
        out = similarity.ivf_topk(str(tmp_path), n_queries=4, k=5, n_clusters=8)
        assert out.num_rows == 20


@pytest.mark.usefixtures("ray_session")
class TestContainmentPairs:
    def test_quote_has_high_containment_low_jaccard(self, tmp_path):
        """The verb's point: a short doc fully quoted inside a long one
        passes containment but NOT symmetric Jaccard."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        quote = " ".join(f"q{i}" for i in range(12))
        long_doc = quote + " " + " ".join(f"l{i}" for i in range(200))
        other = " ".join(f"z{i}" for i in range(50))
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([quote, long_doc, other], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([len(quote), len(long_doc), len(other)], pa.int64()),
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        cont = containment_pairs(str(tmp_path)).to_pandas()
        assert len(cont) == 1
        r = cont.iloc[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["cont_a_in_b"] == 1.0  # every quote shingle is in the long doc
        assert r["cont_b_in_a"] < 0.1
        jac = ngram_jaccard_pairs(str(tmp_path)).to_pandas()
        assert len(jac) == 0  # symmetric Jaccard misses the quote


@pytest.mark.usefixtures("ray_session")
class TestLeakageSafeSplits:
    def test_clusters_never_straddle_splits(self):
        """The whole point: every verified near-dup pair lands in ONE
        split (plain dataset_splits would leak them across)."""
        from ocr_service_ray.analytics.curation import leakage_safe_splits
        from ocr_service_ray.analytics.dedup import minhash_lsh_pairs

        out = leakage_safe_splits(SF).to_pandas().set_index("doc_id")
        pairs = minhash_lsh_pairs(SF).to_pandas()
        assert len(pairs) > 0
        for _, r in pairs.iterrows():
            assert out.loc[r["doc_a"], "split"] == out.loc[r["doc_b"], "split"]
            assert out.loc[r["doc_a"], "rep_id"] == out.loc[r["doc_b"], "rep_id"]
        # singletons keep their own id as rep
        singles = out[out.index == out["rep_id"]]
        assert len(singles) > 0


@pytest.mark.usefixtures("ray_session")
class TestCompressionRatios:
    def test_direct_zlib_parity_and_monotonicity(self, tmp_path):
        import zlib

        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import compression_ratios

        out = compression_ratios(SF).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        for did, t in zip(docs.column("doc_id").to_pylist(),
                          docs.column("text").to_pylist()):
            raw = (t or "").encode("utf-8")
            assert int(out.loc[did, "n_bytes"]) == len(raw)
            assert int(out.loc[did, "n_compressed"]) == len(zlib.compress(raw, 6))
        # repeated text compresses far better than prose of equal length
        prose = ("the quick brown fox jumps over a lazy dog near the river "
                 "bank while seven wizards vexed a mime ") * 5
        spam = "buy now " * (len(prose) // 8)
        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([prose[:400], spam[:400]], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([400, 400], pa.int64()),
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        r = compression_ratios(str(tmp_path)).to_pandas().set_index("doc_id")
        assert r.loc[2, "n_compressed"] < r.loc[1, "n_compressed"] * 0.5


@pytest.mark.usefixtures("ray_session")
class TestItemCooccurrenceScaleGuards:
    def test_mega_basket_cap_bounds_pairs_and_counts_truncation(self, tmp_path):
        """One power-law user must not emit O(basket^2) pairs: baskets
        larger than max_basket truncate to the globally-most-frequent
        items (ties -> smaller k), and the truncation is surfaced in
        schema metadata — never silent."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import item_cooccurrence

        n_items, cap = 10_000, 128
        # users 0 and 1 share the same 10k-item mega-basket (every item
        # support 2 -> Apriori keeps all); user 2 has singleton items
        # (support 1 -> Apriori prunes them before pair emission)
        users = [0] * n_items + [1] * n_items + [2] * 10
        ks = list(range(n_items)) * 2 + list(range(20_000, 20_010))
        tbl = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "props": pa.array(['{"k": %d}' % k for k in ks], pa.string()),
        })
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = item_cooccurrence(str(tmp_path), min_support=2, max_basket=cap)
        md = got.schema.metadata
        assert int(md[b"truncated_items"]) == 2 * (n_items - cap)
        assert int(md[b"truncated_baskets"]) == 2
        df = got.to_pandas()
        # bounded output: exactly C(cap, 2) pairs over items 0..cap-1
        assert len(df) == cap * (cap - 1) // 2
        assert df["k_a"].max() < cap and df["k_b"].max() < cap
        assert (df["n_users"] == 2).all()
        # user 2's unsupported items never surface
        assert df["k_b"].max() < 20_000

    def test_empty_result_carries_truncation_metadata(self, tmp_path):
        """The no-pairs early return must attach the same zeroed
        truncation metadata the normal path always attaches — consumers
        read it unconditionally."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import item_cooccurrence

        # every item is a singleton (support 1): Apriori prunes all,
        # zero pairs emitted
        tbl = pa.table({
            "user_id": pa.array([1, 2, 3], pa.int64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}'], pa.string()),
        })
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = item_cooccurrence(str(tmp_path), min_support=2)
        assert got.num_rows == 0
        assert int(got.schema.metadata[b"truncated_items"]) == 0
        assert int(got.schema.metadata[b"truncated_baskets"]) == 0

    def test_oracle_path_raises_on_binding_cap(self, tmp_path, monkeypatch):
        """The oracle-compared queries() entry must fail LOUDLY when the
        mega-basket cap binds (the exact SQL oracle would silently
        hash-diverge otherwise)."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics import windows
        from ocr_service_ray.pipeline.entry_api import _q_item_cooccurrence

        n_items = 5000
        users = [0] * n_items + [1] * n_items
        ks = list(range(n_items)) * 2
        tbl = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "props": pa.array(['{"k": %d}' % k for k in ks], pa.string()),
        })
        pq.write_table(tbl, tmp_path / "events.parquet")
        orig = windows.item_cooccurrence
        monkeypatch.setattr(
            windows, "item_cooccurrence", lambda sf: orig(sf, max_basket=128)
        )
        with pytest.raises(ValueError, match="truncated"):
            _q_item_cooccurrence(str(tmp_path))

    def test_cap_not_binding_is_exact_and_unstamped(self, tmp_path):
        """Default cap far above basket sizes: result equals the exact
        DuckDB pair support and truncation counters read zero."""
        import duckdb
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import item_cooccurrence

        rng = np.random.default_rng(99)
        users = rng.integers(0, 40, size=2_000)
        ks = rng.integers(0, 25, size=2_000)
        tbl = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "props": pa.array(['{"k": %d}' % k for k in ks], pa.string()),
        })
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = item_cooccurrence(str(tmp_path), min_support=2)
        assert int(got.schema.metadata[b"truncated_items"]) == 0
        assert int(got.schema.metadata[b"truncated_baskets"]) == 0
        con2 = duckdb.connect()
        con2.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        want = con2.execute(
            "WITH uk AS (SELECT DISTINCT user_id, "
            "CAST(regexp_extract(props, '\"k\":\\s*(-?\\d+)', 1) AS BIGINT) AS k "
            "FROM events WHERE props LIKE '%k%'), "
            "p AS (SELECT a.k AS k_a, b.k AS k_b, count(*) AS n_users "
            "FROM uk a JOIN uk b ON a.user_id = b.user_id AND a.k < b.k "
            "GROUP BY 1, 2) "
            "SELECT k_a, k_b, n_users FROM p WHERE n_users >= 2 "
            "ORDER BY k_a, k_b"
        ).df()
        import pandas as pd
        pd.testing.assert_frame_equal(got.to_pandas(), want)


@pytest.mark.usefixtures("ray_session")
class TestTokenCanonicalMapDriverState:
    def test_driver_collects_only_pair_member_counts(self, tmp_path):
        """The driver must hold frequencies for PAIR-MEMBER words only,
        never the full type table: a corpus with a huge singleton
        vocabulary and two small variant clusters must collect exactly
        the 5 pair-member count rows."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics import text_analysis
        from ocr_service_ray.analytics.text_analysis import token_canonical_map

        # 3000 distinct singleton words, no two within edit distance 2:
        # each base-26 digit is written as a uniform letter TRIPLE, so
        # any digit difference costs >= 3 edits; plus two variant clusters
        def block_word(i: int) -> str:
            d = (i // 676 % 26, i // 26 % 26, i % 26)
            return "".join(chr(97 + x) * 3 for x in d)

        singles = " ".join(block_word(i) for i in range(3000))
        docs = [
            singles,
            "spelling speling spellling",  # cluster of 3 (canon: spelling)
            "spelling color colour",       # cluster of 2 + repeat
        ]
        tbl = pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for t in docs], pa.int64()),
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        out = token_canonical_map(str(tmp_path)).to_pandas().set_index("word")
        # full normalization dictionary still produced (vocab-sized RESULT)
        assert len(out) >= 3000
        assert out.loc["speling", "canonical"] == "spelling"
        assert out.loc["spellling", "canonical"] == "spelling"
        assert out.loc["colour", "canonical"] == "color"  # tie -> lexicographic? freq: color 1, colour 1 -> smallest
        assert out.loc["aaaaaaaaa", "canonical"] == "aaaaaaaaa"
        # the driver-state guarantee: only pair-member rows collected
        assert 0 < text_analysis._TCM_LAST_DRIVER_ROWS <= 10
        assert text_analysis._TCM_LAST_DRIVER_ROWS < 3000


class TestEmbMatrixParity:
    """_emb_matrix must be bit-identical to the old to_pylist/vstack
    path on every layout a batch can arrive in."""

    def test_layout_parity_bit_identical(self):
        from ocr_service_ray.analytics.vectors import _emb_matrix

        rng = np.random.default_rng(42)
        base = [list(map(float, rng.normal(size=24))) for _ in range(257)]
        for typ in (pa.list_(pa.float32()), pa.list_(pa.float64()),
                    pa.large_list(pa.float32()), pa.list_(pa.float32(), 24)):
            arr = pa.array(base, typ)
            want = np.vstack(arr.to_pylist()).astype(np.float64)
            assert np.array_equal(_emb_matrix(arr), want), str(typ)
            # chunked and sliced views (non-zero offsets)
            ch = pa.chunked_array([arr[:100], arr[100:]])
            assert np.array_equal(_emb_matrix(ch), want), f"chunked {typ}"
            sl = arr.slice(33, 180)
            assert np.array_equal(_emb_matrix(sl), want[33:213]), f"sliced {typ}"

    def test_packed_binary_parity(self):
        from ocr_service_ray.analytics.vectors import _emb_matrix

        rng = np.random.default_rng(7)
        rows = [rng.normal(size=16).astype(np.float32) for _ in range(50)]
        packed = pa.array([r.tobytes() for r in rows], pa.binary())
        want = np.vstack([np.frombuffer(r.tobytes(), np.float32) for r in rows]).astype(np.float64)
        assert np.array_equal(_emb_matrix(packed), want)

    def test_readonly_view_never_mutated_by_callers(self):
        """float64 child -> zero-copy READ-ONLY view; _norm_rows and the
        normalizing callers must allocate, not mutate."""
        from ocr_service_ray.analytics.similarity import _norm_rows
        from ocr_service_ray.analytics.vectors import _emb_matrix

        arr = pa.array([[3.0, 4.0], [6.0, 8.0]], pa.list_(pa.float64()))
        m = _emb_matrix(arr)
        assert not m.flags.writeable  # proves the zero-copy path taken
        normed = _norm_rows(m)
        assert np.allclose(normed, [[0.6, 0.8], [0.6, 0.8]])
        # source buffer untouched
        assert arr.to_pylist() == [[3.0, 4.0], [6.0, 8.0]]


class TestGreedyDedupScanMemoryBound:
    """_greedy_dedup_scan: chunked-exact equivalence + the oversized
    duplicate-heavy cluster that used to imply an O(n^2) sim matrix."""

    def _naive(self, ids, m, threshold):
        sims = m @ m.T
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in range(1, n):
            s = sims[i, :i].copy()
            s[~keep[:i]] = -np.inf
            j = int(np.argmax(s))
            if s[j] > threshold:
                keep[i] = False
                dup_of[i] = ids[j]
        return keep, dup_of

    def test_chunked_equals_naive_full_matrix(self):
        from ocr_service_ray.analytics.dedup import _greedy_dedup_scan
        from ocr_service_ray.analytics.similarity import _norm_rows

        rng = np.random.default_rng(31337)
        # clustered + noisy: plenty of near-dup ties straddling chunk
        # boundaries at chunk=16
        centers = rng.normal(size=(5, 12))
        m = _norm_rows(
            centers[rng.integers(0, 5, 400)] + 0.02 * rng.normal(size=(400, 12))
        )
        ids = np.sort(rng.choice(100_000, size=400, replace=False)).astype(np.int64)
        for thr in (0.2, 0.8, 0.999):
            nk, nd = self._naive(ids, m, thr)
            for chunk in (16, 64, 1024):
                ck, cd = _greedy_dedup_scan(ids, m, thr, chunk=chunk)
                assert np.array_equal(nk, ck), f"keep thr={thr} chunk={chunk}"
                assert np.array_equal(nd, cd), f"dup_of thr={thr} chunk={chunk}"

    def test_exact_ties_resolve_to_min_id_across_chunks(self):
        from ocr_service_ray.analytics.dedup import _greedy_dedup_scan

        # all identical vectors: every later item ties at sim 1.0 with
        # every kept candidate -> dup_of must be the FIRST (min id)
        m = np.tile(np.array([[0.6, 0.8]]), (50, 1))
        ids = np.arange(100, 150, dtype=np.int64)
        keep, dup_of = _greedy_dedup_scan(ids, m, 0.45, chunk=7)
        assert keep[0] and not keep[1:].any()
        assert (dup_of[1:] == 100).all()

    def test_8900_duplicate_cluster_bounded_memory(self):
        """8,900 near-identical vectors in ONE cluster (the IVF/LSH-cap
        adversarial corpus shape): the scan must complete with a
        working set ~chunk*kept, i.e. it never allocates the 8,900^2
        similarity matrix (633 MB); peak traced allocations stay far
        below that, and all but the first vector drop."""
        import tracemalloc

        from ocr_service_ray.analytics.dedup import _greedy_dedup_scan
        from ocr_service_ray.analytics.similarity import _norm_rows

        rng = np.random.default_rng(8900)
        base = rng.normal(size=64)
        m = _norm_rows(base + 1e-6 * rng.normal(size=(8900, 64)))
        ids = np.arange(8900, dtype=np.int64)
        tracemalloc.start()
        keep, dup_of = _greedy_dedup_scan(ids, m, 0.45)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert keep[0] and not keep[1:].any()
        assert (dup_of[1:] == 0).all()
        # full matrix would be 8900^2*8 bytes = 633 MB; chunked scan
        # peaks at the chunk block (1024^2*8 = 8 MB) plus bookkeeping
        assert peak < 120 * 1024 * 1024, f"peak {peak/1e6:.1f} MB"


class TestReceiptTruthClassifierConstant:
    def test_no_generator_word_can_trigger_venda(self):
        """The receipt-truth oracle hardcodes tipo_documento='gasto':
        valid only while no generator vocabulary word contains a
        KEYWORDS_VENDA trigger. Pin that invariant here so a vocabulary
        edit cannot silently break the oracle."""
        from ocr_service_ray.fixtures.gen import WORDS
        from ocr_service_ray.ops.textops import KEYWORDS_VENDA

        low = [w.lower() for w in WORDS]
        for k in KEYWORDS_VENDA:
            assert not any(k in w for w in low), k
        # receipt scaffolding strings are static; check them too
        for s in ("ltda", "emissao:", "sq.codigo desc", "valor total", "un x"):
            assert not any(k in s for k in KEYWORDS_VENDA), s


class TestGeneratorTruthOracleBootstrap:
    def test_oracle_sql_alone_provisions_truth_files(self):
        """The driver may evaluate oracle SQL before (or without) running
        the corresponding query: oracle_sql() itself must provision every
        generator-truth parquet it references, from a cold /tmp state."""
        import shutil

        import duckdb

        from ocr_service_ray.pipeline import entry_api as ea

        shutil.rmtree(ea._SPAN_TRUTH_ROOT, ignore_errors=True)
        shutil.rmtree(ea._MM_TRUTH_ROOT, ignore_errors=True)
        oracles = ea.oracle_sql()
        con = duckdb.connect()
        for name, min_rows in (
            ("span_extract", 100), ("span_errors", 0), ("qrcode_urls", 10),
            ("receipt_items", 10), ("html_totals", 10),
            ("html_item_values", 10), ("skew_metrics", 2),
            ("multimodal_features", 50), ("multimodal_segments", 50),
            ("doc_status_class", 100),
        ):
            df = con.execute(oracles[name]).df()
            assert len(df) >= min_rows, (name, len(df))

    def test_oracle_names_matches_oracle_sql_keys(self):
        """oracle_names() is the side-effect-free name set queries() uses
        for ordering — it must never drift from the real oracle dict."""
        from ocr_service_ray.pipeline import entry_api as ea

        assert ea.oracle_names() == frozenset(ea.oracle_sql())

    def test_oracle_names_touches_no_filesystem(self, tmp_path, monkeypatch):
        """Listing oracled names must not generate corpora or truth
        parquets (the round-4 queries() ordering regression)."""
        import shutil

        from ocr_service_ray.pipeline import entry_api as ea

        def boom(*a, **k):  # any corpus/truth generation is a failure
            raise AssertionError("oracle_names() must not touch /tmp")

        monkeypatch.setattr(ea, "_ensure_span_truth", boom)
        monkeypatch.setattr(ea, "_ensure_mm_truth", boom)
        monkeypatch.setattr(ea, "span_corpus", boom)
        names = ea.oracle_names()
        assert len(names) > 100 and "span_extract" in names

    def test_span_truth_scale_keyed_no_clobber(self):
        """Two scales' truth sets coexist: building 'tiny' after 'small'
        must leave the small files byte-identical (the v1 single-set
        layout rebuilt them in place)."""
        import hashlib

        from ocr_service_ray.pipeline import entry_api as ea

        small = ea._ensure_span_truth("small")
        digests = {
            k: hashlib.md5(open(p, "rb").read()).hexdigest()
            for k, p in small.items()
        }
        tiny = ea._ensure_span_truth("tiny")
        assert set(tiny.values()).isdisjoint(set(small.values()))
        for k, p in small.items():
            assert hashlib.md5(open(p, "rb").read()).hexdigest() == digests[k], k


@pytest.mark.usefixtures("ray_session")
class TestSimhashPairsPigeonhole:
    def test_constructed_hamming_boundary(self, tmp_path):
        """Pairs at hamming exactly 3 (kept) and 4 (dropped), with the
        differing bits placed INSIDE one band and SPREAD across bands —
        the pigeonhole guarantee must surface all of them."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.dedup import simhash_pairs

        # texts engineered via direct fingerprints is not possible (op
        # recomputes simhash from text), so verify on a text corpus with
        # planted exact dups + the oracle-free structural properties
        texts = [
            "alpha beta gamma delta epsilon zeta",      # 0
            "alpha beta gamma delta epsilon zeta",      # 1: exact dup of 0
            "alpha beta gamma delta epsilon eta",       # 2: near dup
            "completely different words here now",      # 3
        ]
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        got = simhash_pairs(str(tmp_path)).to_pandas()
        # exact dup pair must appear with hamming 0
        d = got[(got.doc_a == 0) & (got.doc_b == 1)]
        assert len(d) == 1 and int(d.hamming.iloc[0]) == 0
        # every reported pair obeys the threshold
        assert (got.hamming <= 3).all()
        # brute-force ground truth over the same fingerprints
        import numpy as np
        import ray as _ray
        from ocr_service_ray.analytics.dedup import _popcount64, simhash_fingerprints
        fp = pa.concat_tables([
            t for t in _ray.get(simhash_fingerprints(str(tmp_path)).to_arrow_refs())
            if t.num_rows
        ]).to_pandas().sort_values("doc_id")
        h = fp["simhash"].to_numpy().view(np.uint64)
        want = set()
        for i in range(len(h)):
            for j in range(i + 1, len(h)):
                ham = int(_popcount64(np.array([h[i] ^ h[j]], np.uint64))[0])
                if ham <= 3:
                    want.add((i, j, ham))
        assert set(map(tuple, got[["doc_a", "doc_b", "hamming"]].values)) == want

    def test_popcount64_parity(self):
        import numpy as np

        from ocr_service_ray.analytics.dedup import _popcount64

        rng = np.random.default_rng(1)
        xs = rng.integers(0, 2**63, size=500, dtype=np.int64).view(np.uint64)
        xs[0] = np.uint64(0xFFFFFFFFFFFFFFFF)
        xs[1] = np.uint64(0)
        got = _popcount64(xs)
        want = np.array([bin(int(x)).count("1") for x in xs], np.int64)
        assert np.array_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestOcrTokenText:
    def test_matches_generator_truth_at_tiny(self):
        """The blob-scan OCR token stream (text + order) equals the
        generator's intended span text exploded to tokens — via the
        scale-resolved oracle SQL, exactly as the driver compares."""
        import duckdb

        from ocr_service_ray.pipeline import entry_api as ea

        got = ea.q_ocr_token_text(SF).to_pandas()
        want = duckdb.connect().execute(ea.oracle_sql(SF)["ocr_token_text"]).df()
        assert list(got.columns) == list(want.columns)
        g = got.sort_values(["media_ref", "token_idx"]).reset_index(drop=True)
        w = want.sort_values(["media_ref", "token_idx"]).reset_index(drop=True)
        assert len(g) == len(w) and len(g) > 0
        for c in g.columns:
            pd.testing.assert_series_equal(g[c], w[c], check_names=False)

    def test_projection_of_raw_lines(self):
        """Sibling contract: same rows as ocr_raw_lines minus the
        recognizer-internal columns (confidence, y/x grid)."""
        from ocr_service_ray.pipeline import entry_api as ea

        raw = ea.q_ocr_raw_lines(SF)
        tok = ea.q_ocr_token_text(SF)
        assert tok.column_names == ["media_ref", "token_idx", "text"]
        assert tok.num_rows == raw.num_rows
        assert tok.equals(raw.select(["media_ref", "token_idx", "text"]))


@pytest.mark.usefixtures("ray_session")
class TestSpanTruthScaleSwitch:
    def test_scale_keyed_paths_and_idempotent_reuse(self):
        """Truth files are keyed BY SCALE (v2 layout): each scale gets
        its own file set, requesting another scale never rewrites an
        existing one, and re-requests are idempotent (DONE-marker
        fast path). Replaces the v1 single-mutable-set semantics this
        class used to pin (the round-4 advisory's race)."""
        import pyarrow.parquet as pq

        from ocr_service_ray.pipeline import entry_api as ea

        p_small = ea._ensure_span_truth("small")
        n_small = pq.read_table(p_small["spans"]).num_rows
        p_tiny = ea._ensure_span_truth("tiny")
        n_tiny = pq.read_table(p_tiny["spans"]).num_rows
        assert p_small["spans"] != p_tiny["spans"]  # per-scale paths
        assert f"{ea._SPAN_TRUTH_ROOT}/small/" in p_small["spans"]
        assert f"{ea._SPAN_TRUTH_ROOT}/tiny/" in p_tiny["spans"]
        assert n_tiny != n_small and n_tiny < n_small
        # small's file set is untouched by the tiny build and reuse is
        # idempotent
        assert pq.read_table(ea._ensure_span_truth("small")["spans"]).num_rows == n_small


class TestShuffleShards:
    """Deterministic global shuffle -> (shard, pos) placement."""

    def test_permutation_complete_and_positions_contiguous(self):
        import numpy as np

        from ocr_service_ray.analytics.curation import shuffle_shards

        got = shuffle_shards(SF, n_shards=8).to_pandas()
        import pandas as pd

        docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        # every doc exactly once
        assert sorted(got["doc_id"]) == sorted(docs["doc_id"])
        # per shard: pos is exactly 0..k-1
        for _, g in got.groupby("shard"):
            assert sorted(g["pos"]) == list(range(len(g)))

    def test_deterministic_and_seed_varies(self):
        from ocr_service_ray.analytics.curation import shuffle_shards

        a = shuffle_shards(SF, n_shards=8, seed=0).to_pandas()
        b = shuffle_shards(SF, n_shards=8, seed=0).to_pandas()
        assert a.equals(b)  # pure function of (doc_id, seed)
        c = shuffle_shards(SF, n_shards=8, seed=1).to_pandas()
        ka = list(zip(a["doc_id"], a["shard"], a["pos"]))
        kc = list(zip(c["doc_id"], c["shard"], c["pos"]))
        assert ka != kc  # a new seed is a new permutation

    def test_order_is_not_input_order(self):
        """The point of the op: within a shard, doc order must not be
        the crawl (doc_id) order."""
        from ocr_service_ray.analytics.curation import shuffle_shards

        got = shuffle_shards(SF, n_shards=4).to_pandas()
        scrambled = 0
        for _, g in got.groupby("shard"):
            ids = g.sort_values("pos")["doc_id"].tolist()
            if ids != sorted(ids):
                scrambled += 1
        assert scrambled == len(got["shard"].unique())


@pytest.mark.usefixtures("ray_session")
class TestLmQualityOps:
    """lm_doc_scores (CCNet bigram-LM quality) + dsir_weights (DSIR
    importance log-weights): the libm==DuckDB ln parity pin that the
    fixed-point contract rests on, a pure-Python naive reference, and
    the DuckDB oracle on adversarial fixtures."""

    TEXTS = [
        "",                                # no words
        "solo",                            # 1 word -> no bigram
        "a b",                             # single bigram
        "a a a a",                         # repeated-bigram doc
        "x Y  z\t x y Z",                  # ws collapse + case fold
        "the quick brown fox " * 5,        # boilerplate repeats
        "é€ βγ δδ é€ βγ",                  # multibyte
        "b a b c b a",                     # shared-left-word fanout
    ]
    LANGS = ["en", "de", "en", "fr", "en", "de", "zh", "en"]

    def _write_docs(self, tmp_path, texts, langs=None):
        import pyarrow.parquet as pq

        cols = {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
        if langs is not None:
            cols["lang"] = pa.array(langs, pa.string())
        pq.write_table(pa.table(cols), str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def _oracle(self, sf, name):
        from ocr_service_ray.pipeline import entry_api

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        return con.execute(entry_api.oracle_sql()[name]).df()

    def test_ln_parity_libm_vs_duckdb(self):
        """The load-bearing assumption: math.log (libm) is bit-identical
        to DuckDB's ln() for every double we feed it. numpy's vectorized
        np.log is NOT (1-ulp drift) — which is exactly why the operators
        quantize with math.log."""
        import math

        rng = np.random.default_rng(42)
        num = rng.integers(1, 10**7, 50000)
        den = rng.integers(1, 10**7, 50000)
        p = num.astype(np.float64) / den.astype(np.float64)
        con = duckdb.connect()
        con.register("t", pa.table({"p": p}))
        duck = con.sql("SELECT ln(p) AS l FROM t").fetchnumpy()["l"]
        ours = np.fromiter((math.log(x) for x in p), np.float64, count=len(p))
        assert np.array_equal(ours, duck)

    @staticmethod
    def _naive_lm(texts):
        import math
        from collections import Counter

        from ocr_service_ray.analytics.hashing import split_words

        bg = Counter()
        for t in texts:
            ws = split_words(t)
            bg.update(zip(ws, ws[1:]))
        cl = Counter()
        for (w1, _), c in bg.items():
            cl[w1] += c
        v = len({w2 for (_, w2) in bg})
        rows = {}
        for d, t in enumerate(texts):
            ws = split_words(t)
            grams = list(zip(ws, ws[1:]))
            if not grams:
                continue
            s = sum(
                math.floor(math.log((bg[g] + 1) / (cl[g[0]] + v)) * 1048576)
                for g in grams
            )
            rows[d] = (len(grams), s, s / len(grams) / 1048576.0)
        return rows

    def test_lm_doc_scores_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import lm_doc_scores

        sf = self._write_docs(tmp_path, self.TEXTS)
        got = lm_doc_scores(sf).to_pandas()
        want = self._naive_lm(self.TEXTS)
        assert list(got["doc_id"]) == sorted(want)
        for _, r in got.iterrows():
            n, s, avg = want[r["doc_id"]]
            assert (r["n_bigrams"], r["logprob_fp"]) == (n, s)
            assert r["avg_logprob"] == avg
        oracle = self._oracle(sf, "lm_doc_scores")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        # the repeated-boilerplate doc must outscore the one-off docs
        by_id = dict(zip(got["doc_id"], got["avg_logprob"]))
        assert by_id[5] > by_id[2]

    @staticmethod
    def _naive_dsir(texts, langs, target="en"):
        import math
        from collections import Counter

        from ocr_service_ray.analytics.hashing import split_words

        raw, tgt = Counter(), Counter()
        for t, lang in zip(texts, langs):
            ws = split_words(t)
            raw.update(ws)
            if lang == target:
                tgt.update(ws)
        v = len(raw)
        nr = sum(raw.values())
        nt = sum(tgt.values())
        rows = {}
        for d, t in enumerate(texts):
            ws = split_words(t)
            if not ws:
                continue
            s = sum(
                math.floor(
                    (math.log((tgt[w] + 1) / (nt + v))
                     - math.log((raw[w] + 1) / (nr + v))) * 1048576
                )
                for w in ws
            )
            rows[d] = (len(ws), s, s / len(ws) / 1048576.0)
        return rows

    def test_dsir_weights_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import dsir_weights

        sf = self._write_docs(tmp_path, self.TEXTS, self.LANGS)
        got = dsir_weights(sf).to_pandas()
        want = self._naive_dsir(self.TEXTS, self.LANGS)
        assert list(got["doc_id"]) == sorted(want)
        for _, r in got.iterrows():
            n, s, avg = want[r["doc_id"]]
            assert (r["n_tokens"], r["logweight_fp"]) == (n, s)
            assert r["avg_logweight"] == avg
        oracle = self._oracle(sf, "dsir_weights")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        # an English-marked doc's words weight ABOVE a never-English word
        # ("the quick brown fox" appears only in lang=de doc 5 -> its
        # tokens are downweighted vs doc 2's English-slice tokens)
        by_id = dict(zip(got["doc_id"], got["avg_logweight"]))
        assert by_id[2] > by_id[5]

    def test_dsir_no_target_docs(self, tmp_path):
        """Target slice empty: pt = 1/V for every word, still exact."""
        from ocr_service_ray.analytics.text_analysis import dsir_weights

        texts = ["aa bb cc", "bb cc dd", "aa aa"]
        sf = self._write_docs(tmp_path, texts, ["de", "fr", "zh"])
        got = dsir_weights(sf).to_pandas()
        want = self._naive_dsir(texts, ["de", "fr", "zh"])
        for _, r in got.iterrows():
            n, s, avg = want[r["doc_id"]]
            assert (r["n_tokens"], r["logweight_fp"]) == (n, s)
        oracle = self._oracle(sf, "dsir_weights")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )


@pytest.mark.usefixtures("ray_session")
class TestSourceOverlap:
    """source_overlap (cross-source vocabulary Jaccard): naive set
    reference, zero-overlap pairs included, DuckDB oracle."""

    def _write(self, tmp_path, texts, sources):
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "source": pa.array(sources, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        return str(tmp_path)

    def test_source_overlap_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.hashing import split_words
        from ocr_service_ray.analytics.text_analysis import source_overlap
        from ocr_service_ray.pipeline import entry_api

        texts = [
            "aa bb cc", "bb cc dd",          # s0
            "cc dd ee", "",                   # s1 (shares cc dd with s0)
            "zz yy",                          # s2 (disjoint from s0/s1)
            "aa zz",                          # s3 (bridges s0 and s2)
        ]
        sources = ["s0", "s0", "s1", "s1", "s2", "s3"]
        sf = self._write(tmp_path, texts, sources)
        got = source_overlap(sf).to_pandas()
        # naive sets
        vocab: dict = {}
        for t_, s_ in zip(texts, sources):
            vocab.setdefault(s_, set()).update(split_words(t_))
        srcs = sorted(vocab)
        assert len(got) == len(srcs) * (len(srcs) - 1) // 2
        for _, r in got.iterrows():
            va, vb = vocab[r["source_a"]], vocab[r["source_b"]]
            inter, union = len(va & vb), len(va | vb)
            assert (r["n_words_a"], r["n_words_b"], r["n_shared"]) == (
                len(va), len(vb), inter
            )
            assert r["jaccard"] == float(inter) / float(union)
        # the disjoint pair is present with zero overlap
        z = got[(got["source_a"] == "s1") & (got["source_b"] == "s2")]
        assert len(z) == 1 and z["n_shared"].iloc[0] == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = con.execute(entry_api.oracle_sql()["source_overlap"]).df()
        g = got.sort_values(["source_a", "source_b"]).reset_index(drop=True)
        w = want.sort_values(["source_a", "source_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w[g.columns], check_dtype=False)

    def test_source_overlap_single_source_empty(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import source_overlap

        sf = self._write(tmp_path, ["aa bb"], ["only"])
        assert source_overlap(sf).num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestDsirSample:
    """dsir_sample (Gumbel-top-k importance resampling apply): naive
    pure-Python reference, the DuckDB oracle, and proportionality
    sanity (heavier weights are sampled first in expectation)."""

    TEXTS = [
        "aa bb cc dd", "bb cc dd ee", "aa aa aa", "zz yy xx",
        "the and of is with", "el la los las es", "aa bb", "cc dd ee",
        "the the the and and", "mixed aa the bb and",
    ]
    LANGS = ["en", "de", "en", "fr", "en", "es", "en", "de", "en", "en"]

    def _write_docs(self, tmp_path):
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(self.TEXTS))), pa.int64()),
                    "text": pa.array(self.TEXTS, pa.string()),
                    "lang": pa.array(self.LANGS, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        return str(tmp_path)

    @staticmethod
    def _naive(texts, langs, k, seed=42, target="en"):
        import hashlib
        import math
        from collections import Counter

        from ocr_service_ray.analytics.hashing import split_words

        raw, tgt = Counter(), Counter()
        for t, lang in zip(texts, langs):
            ws = split_words(t)
            raw.update(ws)
            if lang == target:
                tgt.update(ws)
        v, nr, nt = len(raw), sum(raw.values()), sum(tgt.values())
        rows = []
        for d, t in enumerate(texts):
            ws = split_words(t)
            if not ws:
                continue
            s = sum(
                math.floor(
                    (math.log((tgt[w] + 1) / (nt + v))
                     - math.log((raw[w] + 1) / (nr + v))) * 1048576
                )
                for w in ws
            )
            h = int.from_bytes(
                hashlib.md5(f"{d}:dsir:{seed}".encode()).digest()[8:16], "little"
            )
            u = (float(h) + 1.0) / 18446744073709551616.0
            g = s / 1048576.0 - math.log(-math.log(u))
            rows.append((d, len(ws), s, g))
        rows.sort(key=lambda r: (-r[3], r[0]))
        return rows[:k]

    def test_dsir_sample_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import dsir_sample
        from ocr_service_ray.pipeline import entry_api

        sf = self._write_docs(tmp_path)
        got = dsir_sample(sf, k=4).to_pandas()
        want = self._naive(self.TEXTS, self.LANGS, k=4)
        assert sorted(got["doc_id"]) == sorted(d for d, *_ in want)
        by_id = {d: (n, s, g) for d, n, s, g in want}
        for _, r in got.iterrows():
            n, s, g = by_id[r["doc_id"]]
            assert (r["n_tokens"], r["logweight_fp"]) == (n, s)
            assert r["gumbel_key"] == g
        # oracle (k=64 > n docs -> all scored docs, same key chain)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want64 = con.execute(entry_api.oracle_sql()["dsir_sample"]).df()
        got64 = dsir_sample(sf).to_pandas()
        g = got64.sort_values("doc_id").reset_index(drop=True)
        w = want64.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w[g.columns], check_dtype=False)

    def test_dsir_sample_is_topk_of_weights_plus_noise(self, tmp_path):
        """The sample is EXACTLY the k largest (logw + Gumbel) keys of
        the dsir_weights table — pins the partial-topk merge."""
        from ocr_service_ray.analytics.text_analysis import (
            dsir_sample,
            dsir_weights,
        )

        sf = self._write_docs(tmp_path)
        full = dsir_weights(sf).to_pandas()
        got = dsir_sample(sf, k=3).to_pandas()
        assert len(got) == 3
        assert set(got["doc_id"]) <= set(full["doc_id"])
        # recompute keys for every doc and check the chosen set matches
        import hashlib
        import math

        keys = {}
        for _, r in full.iterrows():
            h = int.from_bytes(
                hashlib.md5(f"{int(r['doc_id'])}:dsir:42".encode()).digest()[8:16],
                "little",
            )
            u = (float(h) + 1.0) / 18446744073709551616.0
            keys[int(r["doc_id"])] = (
                r["logweight_fp"] / 1048576.0 - math.log(-math.log(u))
            )
        top3 = sorted(keys, key=lambda d: (-keys[d], d))[:3]
        assert sorted(got["doc_id"]) == sorted(top3)


@pytest.mark.usefixtures("ray_session")
class TestCcnetQualityClassifier:
    """ccnet_buckets (per-lang LM + perplexity tertiles) and
    quality_classifier (hashed-feature linear apply): pure-Python naive
    references, the DuckDB oracle on adversarial fixtures, and ntile
    allocation semantics."""

    TEXTS = [
        "",                                # no words -> dropped
        "solo",                            # 1 word -> no bigram -> dropped
        "a b", "a a a a", "x Y  z\t x y Z",
        "the quick brown fox " * 5,
        "\u00e9\u20ac \u03b2\u03b3 \u03b4\u03b4 \u00e9\u20ac \u03b2\u03b3",
        "b a b c b a",
        "m n o p q", "n o p m q", "q r s t m",          # 3-way en tie pool
        "zz yy", "one two three", "same same same",
    ]
    LANGS = ["en", "de", "en", "fr", "en", "de", "zh", "en",
             "en", "en", "en", "de", "en", "en"]

    def _write_docs(self, tmp_path, texts, langs):
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        return str(tmp_path)

    def _oracle(self, sf, name):
        from ocr_service_ray.pipeline import entry_api

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        return con.execute(entry_api.oracle_sql()[name]).df()

    @staticmethod
    def _naive_ccnet(texts, langs):
        import math
        from collections import Counter

        from ocr_service_ray.analytics.hashing import split_words

        bg: Counter = Counter()
        for t, lg in zip(texts, langs):
            ws = split_words(t)
            bg.update((lg, a, b) for a, b in zip(ws, ws[1:]))
        cl: Counter = Counter()
        for (lg, w1, _), c in bg.items():
            cl[(lg, w1)] += c
        vset: dict = {}
        for lg, _, w2 in bg:
            vset.setdefault(lg, set()).add(w2)
        rows = {}
        for d, (t, lg) in enumerate(zip(texts, langs)):
            ws = split_words(t)
            grams = list(zip(ws, ws[1:]))
            if not grams:
                continue
            s = sum(
                math.floor(
                    math.log(
                        (bg[(lg, a, b)] + 1) / (cl[(lg, a)] + len(vset[lg]))
                    )
                    * 1048576
                )
                for a, b in grams
            )
            rows[d] = (lg, len(grams), s, s / len(grams) / 1048576.0)
        # per-lang ntile(3) over (avg DESC, doc_id)
        by_lang: dict = {}
        for d, (lg, n, s, avg) in rows.items():
            by_lang.setdefault(lg, []).append((-avg, d))
        buckets = {}
        names = ["head", "middle", "tail"]
        for lg, members in by_lang.items():
            members.sort()
            n = len(members)
            base, rem = divmod(n, 3)
            boundary = rem * (base + 1)
            for r, (_, d) in enumerate(members):
                if base == 0:
                    b = r
                elif r < boundary:
                    b = r // (base + 1)
                else:
                    b = rem + (r - boundary) // base
                buckets[d] = names[min(b, 2)]
        return rows, buckets

    def test_ccnet_buckets_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import ccnet_buckets

        sf = self._write_docs(tmp_path, self.TEXTS, self.LANGS)
        got = ccnet_buckets(sf).to_pandas()
        want, buckets = self._naive_ccnet(self.TEXTS, self.LANGS)
        assert list(got["doc_id"]) == sorted(want)
        for _, r in got.iterrows():
            lg, n, s, avg = want[r["doc_id"]]
            assert (r["lang"], r["n_bigrams"], r["logprob_fp"]) == (lg, n, s)
            assert r["avg_logprob"] == avg
            assert r["bucket"] == buckets[r["doc_id"]]
        oracle = self._oracle(sf, "ccnet_buckets")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        # ntile allocation: en has 8 scored docs -> 3/3/2 tertiles
        en = got[got["lang"] == "en"]
        sizes = en["bucket"].value_counts()
        assert (sizes["head"], sizes["middle"], sizes["tail"]) == (3, 3, 2)
        # the boilerplate-repeat de doc must land in its lang's head
        assert got[got["doc_id"] == 5]["bucket"].iloc[0] == "head"

    def test_ccnet_buckets_degenerate_langs(self, tmp_path):
        """Languages with fewer docs than buckets: ntile gives each row
        its own bucket, in score order."""
        from ocr_service_ray.analytics.text_analysis import ccnet_buckets

        texts = ["a b c", "a b a b", "x y"]
        langs = ["fr", "fr", "zh"]
        sf = self._write_docs(tmp_path, texts, langs)
        got = ccnet_buckets(sf).to_pandas()
        oracle = self._oracle(sf, "ccnet_buckets")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        zh = got[got["lang"] == "zh"]
        assert list(zh["bucket"]) == ["head"]
        fr = set(got[got["lang"] == "fr"]["bucket"])
        assert fr == {"head", "middle"}

    def test_ccnet_buckets_block_boundary_invariance(self, tmp_path):
        """Tertile assignment must be invariant to sort-block layout:
        force tiny blocks so lang runs straddle block boundaries and
        the per-block offset bookkeeping is actually exercised."""
        import ray.data

        from ocr_service_ray.analytics.text_analysis import ccnet_buckets

        rng = np.random.default_rng(7)
        words = ["w%d" % i for i in range(50)]
        texts, langs = [], []
        for d in range(150):
            n = int(rng.integers(2, 12))
            texts.append(" ".join(words[int(i)] for i in rng.integers(0, 50, n)))
            langs.append(["en", "de", "fr"][d % 3])
        sf = self._write_docs(tmp_path, texts, langs)
        ctx = ray.data.DataContext.get_current()
        old = ctx.target_max_block_size
        ctx.target_max_block_size = 4096
        try:
            got = ccnet_buckets(sf).to_pandas().reset_index(drop=True)
        finally:
            ctx.target_max_block_size = old
        oracle = self._oracle(sf, "ccnet_buckets")
        pd.testing.assert_frame_equal(got, oracle.reset_index(drop=True))

    @staticmethod
    def _naive_quality(texts):
        import hashlib

        from ocr_service_ray.analytics.hashing import split_words

        def md5_low(s):
            return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")

        rows = {}
        for d, t in enumerate(texts):
            ws = split_words(t)
            if not ws:
                continue
            feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
            s = sum(
                (md5_low(f"qw:{md5_low(f) % 4096}") % 2001) - 1000 for f in feats
            )
            rows[d] = (
                len(feats),
                s,
                s / len(feats),
                "keep" if s >= 0 else "discard",
            )
        return rows

    def test_quality_classifier_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import quality_classifier

        sf = self._write_docs(tmp_path, self.TEXTS, self.LANGS)
        got = quality_classifier(sf).to_pandas()
        want = self._naive_quality(self.TEXTS)
        assert list(got["doc_id"]) == sorted(want)
        for _, r in got.iterrows():
            n, s, avg, label = want[r["doc_id"]]
            assert (r["n_feats"], r["score_fp"], r["label"]) == (n, s, label)
            assert r["avg_weight"] == avg
        oracle = self._oracle(sf, "quality_classifier")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        # both labels occur on this fixture (score signs split)
        assert set(got["label"]) <= {"keep", "discard"}


@pytest.mark.usefixtures("ray_session")
class TestBm25Search:
    """Full BM25 over the pruned index: pure-Python naive reference,
    the DuckDB oracle, and ranking sanity on a crafted fixture."""

    @staticmethod
    def _naive(texts, min_count=5, top_k=20):
        import math
        import re
        from collections import Counter

        term_re = re.compile(r"[a-z0-9]+")
        toks = [term_re.findall((t or "").lower()) for t in texts]
        cnt = Counter(w for ws in toks for w in ws)
        q = sorted(
            (w for w, c in cnt.items() if c >= min_count),
            key=lambda w: (cnt[w], w),
        )[:3]
        lens = {d: len(ws) for d, ws in enumerate(toks) if ws}
        n_docs = len(lens)
        total = sum(lens.values())
        if not q or not n_docs:
            return []
        avglen = float(total) / float(n_docs)
        df = {t: sum(1 for ws in toks if t in ws) for t in q}
        scores: dict[int, int] = {}
        for d, ws in enumerate(toks):
            c = Counter(ws)
            s = 0
            for t in q:
                tf = c.get(t, 0)
                if not tf:
                    continue
                idf = math.log(((n_docs - df[t]) + 0.5) / (df[t] + 0.5) + 1.0)
                denom = float(tf) + 1.2 * (0.25 + 0.75 * float(lens[d]) / avglen)
                s += math.floor(idf * (float(tf) * 2.2) / denom * 1048576.0)
            if s:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        return [
            (d, s, s / 1048576.0, r + 1) for r, (d, s) in enumerate(ranked)
        ]

    def test_naive_reference_and_oracle(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_index import bm25_search
        from ocr_service_ray.pipeline import entry_api

        # rare terms "qq"/"ww"/"zz" (5 occurrences each) in docs of very
        # different lengths -> length normalization must reorder them
        texts = (
            ["qq " * 5 + "filler " * 200]          # long doc, tf=5
            + ["qq ww zz pad"]                      # short doc, tf=1 each
            + ["ww " * 4 + "mid " * 30]             # medium, tf=4
            + ["zz zz zz zz pad pad"]               # short, tf=4
            + ["pad filler mid common " * 10] * 4   # background docs
        )
        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        sf = str(tmp_path)
        got = bm25_search(sf).to_pandas()
        want = self._naive(texts)
        assert (
            list(map(tuple, got[["doc_id", "score_fp", "score", "rank"]]
                     .itertuples(index=False)))
            == want
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        oracle = con.execute(entry_api.oracle_sql()["bm25_search"]).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        # sanity: the short doc hitting all three rare terms must beat
        # the long doc with one inflated tf (idf+length normalization)
        r = dict(zip(got["doc_id"], got["rank"]))
        assert r[1] < r[0]


@pytest.mark.usefixtures("ray_session")
class TestDocStatusClass:
    """doc_status_class: the oracled classification/message projection of
    doc_status (confianca stays gate-verified). The corpus never emits
    'venda', so the SQL keyword branch gets a crafted parity fixture
    (incl. unicode-lowercase keywords)."""

    def test_query_matches_oracle_tiny(self):
        import duckdb as dk

        from ocr_service_ray.pipeline import entry_api as ea

        got = ea.q_doc_status_class(SF).to_pandas()
        want = dk.connect().execute(
            ea.oracle_sql(SF)["doc_status_class"]
        ).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )
        assert len(got) and set(got["tipo_documento"]) <= {"gasto", "venda", "erro"}

    def test_sql_classifier_parity_on_crafted_spans(self, tmp_path):
        import duckdb as dk
        import pyarrow.parquet as pq

        from ocr_service_ray.ops.textops import classify_document
        from ocr_service_ray.pipeline import entry_api as ea

        rows = [
            # doc, offset, kind, text
            ("d0", 0, "text", "COMPRA NO MERCADO"),          # gasto
            ("d1", 0, "text", "PIX RECEBIDO DE FULANO"),      # venda
            ("d2", 0, "text", "CRÉDITO EM CONTA corrente"),   # venda (unicode lower)
            ("d3", 0, "text", "Depósito efetuado"),           # venda (accented)
            ("d4", 0, "erro", ""),                            # no text -> erro
            ("d5", 0, "text", "linha ok"),                    # mixed: gasto + err count
            ("d5", 1, "erro", ""),
            ("d5", 2, "erro", ""),
            ("d6", 0, "text", "RECI"),                        # keyword split across
            ("d6", 1, "text", "BO"),                          # spans must NOT match
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.string()),
                "offset": pa.array([r[1] for r in rows], pa.int32()),
                "kind": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "media_ref": pa.array([""] * len(rows), pa.string()),
            }
        )
        p = str(tmp_path / "spans.parquet")
        pq.write_table(tbl, p)
        sp = {k: p for k in ea._SPAN_TRUTH_KEYS}
        mm = {"multimodal_features": "", "multimodal_segments": ""}
        sql = ea._oracle_queries(sp, mm)["doc_status_class"]
        got = dk.connect().execute(sql).df()
        # pure-Python replay of the writer's status rule
        want = {}
        for d in ["d0", "d1", "d2", "d3", "d4", "d5", "d6"]:
            spans = [r for r in rows if r[0] == d]
            texts = [r[3] for r in spans if r[2] == "text"]
            n_err = sum(1 for r in spans if r[2] == "erro")
            if not texts:
                want[d] = ("erro", "Nenhuma linha OCR encontrada")
            else:
                want[d] = (
                    classify_document("\n".join(texts)),
                    f"{n_err} spans com erro" if n_err else "",
                )
        assert {
            r["doc_id"]: (r["tipo_documento"], r["mensagem"])
            for _, r in got.iterrows()
        } == want
        # the crafted corpus exercises every branch
        assert want["d1"][0] == "venda" and want["d2"][0] == "venda"
        assert want["d3"][0] == "venda" and want["d0"][0] == "gasto"
        assert want["d4"] == ("erro", "Nenhuma linha OCR encontrada")
        assert want["d5"][1] == "2 spans com erro"
        assert want["d6"][0] == "gasto"


@pytest.mark.usefixtures("ray_session")
class TestEntropyDivergenceLateness:
    """entropy_scores / source_divergence / late_event_counts: naive
    pure-Python references + DuckDB oracle parity on adversarial
    fixtures (repeat-heavy docs, single-word docs, multibyte, watermark
    boundary at exactly the allowed lateness)."""

    TEXTS = [
        "",                                # excluded (no words)
        "solo",                            # n=1 -> entropy 0
        "a a a a a",                       # all-repeat -> entropy 0
        "a b c d e",                       # all-distinct -> ln(5)
        "x Y  z\t x y Z",                  # ws collapse + case fold
        "the quick brown fox " * 5,        # boilerplate
        "é€ βγ δδ é€ βγ",                  # multibyte
    ]
    SOURCES = ["s1", "s1", "s2", "s2", "s1", "s3", "s2"]

    def _write_docs(self, tmp_path, texts, sources=None):
        import pyarrow.parquet as pq

        cols = {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
        if sources is not None:
            cols["source"] = pa.array(sources, pa.string())
        pq.write_table(pa.table(cols), str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def _oracle(self, sf, name, table="documents"):
        from ocr_service_ray.pipeline import entry_api

        con = duckdb.connect()
        con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{sf}/{table}.parquet'")
        return con.execute(entry_api.oracle_sql()[name]).df()

    @staticmethod
    def _naive_entropy(texts):
        import math
        from collections import Counter

        from ocr_service_ray.analytics.hashing import split_words

        rows = {}
        for d, t in enumerate(texts):
            ws = split_words(t)
            if not ws:
                continue
            n = len(ws)
            s = sum(
                c * math.floor(math.log(c) * 1048576)
                for c in Counter(ws).values()
            )
            rows[d] = (n, s, math.log(n) - s / n / 1048576.0)
        return rows

    def test_entropy_scores_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import entropy_scores

        sf = self._write_docs(tmp_path, self.TEXTS)
        got = entropy_scores(sf).to_pandas()
        want = self._naive_entropy(self.TEXTS)
        assert list(got["doc_id"]) == sorted(want)
        for _, r in got.iterrows():
            n, s, ent = want[r["doc_id"]]
            assert (r["n_tokens"], r["clnc_fp"]) == (n, s)
            assert r["entropy"] == ent
        oracle = self._oracle(sf, "entropy_scores")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        by_id = dict(zip(got["doc_id"], got["entropy"]))
        # semantic pins: degenerate docs at ~0 (doc 1 exactly — ln(1)=0
        # has no floor residue; doc 2 carries the fixed-point floor's
        # <=2^-20 quantization), diverse doc at ln(5), boilerplate between
        assert by_id[1] == 0.0 and 0.0 <= by_id[2] < 1e-5
        assert abs(by_id[3] - np.log(5)) < 1e-9
        assert 0.0 < by_id[5] < by_id[3]

    @staticmethod
    def _naive_divergence(texts, sources):
        import math
        from collections import Counter

        from ocr_service_ray.analytics.hashing import split_words

        per_src: dict = {}
        corpus = Counter()
        for t, s in zip(texts, sources):
            ws = split_words(t)
            per_src.setdefault(s, Counter()).update(ws)
            corpus.update(ws)
        tot = sum(corpus.values())
        rows = {}
        for s, cnt in per_src.items():
            if not cnt:
                continue
            t_s = sum(cnt.values())
            kl = sum(
                c * math.floor(math.log(
                    float(c) * float(tot) / (float(t_s) * float(corpus[w]))
                ) * 1048576)
                for w, c in cnt.items()
            )
            rows[s] = (t_s, kl, kl / t_s / 1048576.0)
        return rows

    def test_source_divergence_naive_and_oracle(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import source_divergence

        sf = self._write_docs(tmp_path, self.TEXTS, self.SOURCES)
        got = source_divergence(sf).to_pandas()
        want = self._naive_divergence(self.TEXTS, self.SOURCES)
        assert list(got["source"]) == sorted(want)
        for _, r in got.iterrows():
            t_s, kl_fp, kl = want[r["source"]]
            assert (r["n_tokens"], r["kl_fp"]) == (t_s, kl_fp)
            assert r["kl"] == kl
        oracle = self._oracle(sf, "source_divergence")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), oracle.reset_index(drop=True)
        )
        # Gibbs: true KL >= 0; the per-term floor can shave at most
        # 2^-20 per token off the quantized value
        assert (got["kl"] > -1e-4).all()

    def test_source_divergence_single_source_is_zero(self, tmp_path):
        """One source == the corpus: every ln argument is exactly 1.0
        -> fp terms all floor(0)=0 -> KL exactly 0."""
        from ocr_service_ray.analytics.text_analysis import source_divergence

        sf = self._write_docs(
            tmp_path, ["a b c", "b c d", "a a"], ["only", "only", "only"]
        )
        got = source_divergence(sf).to_pandas()
        assert list(got["kl_fp"]) == [0] and list(got["kl"]) == [0.0]

    def test_late_event_counts_replay_and_oracle(self, tmp_path):
        """Arrival-order watermark replay with hand-pinned boundaries:
        first event on time; ts == wm - lateness on time (strict <);
        one microsecond below -> late; watermark never regresses."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.windows import late_event_counts

        base = pd.Timestamp("2024-03-01 12:00:00")
        sec = pd.Timedelta(seconds=1)
        us = pd.Timedelta(microseconds=1)
        rows = [
            # arrival order == event_id; event-times jump around
            (1, base),                       # first -> on time, wm=base
            (2, base + 3600 * sec),          # ahead -> on time, wm advances
            (3, base + 3000 * sec),          # 600s behind wm exactly -> ON time
            (4, base + 3000 * sec - us),     # 600s+1us behind -> LATE
            (5, base - 86400 * sec),         # previous day, far behind -> LATE
            (6, base + 7200 * sec),          # ahead again -> on time
            (7, base + 6600 * sec - us),     # behind new wm by 600s+1us -> LATE
        ]
        df = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
                "user_id": [1] * len(rows),
                "event_type": ["view"] * len(rows),
                "value": [1.0] * len(rows),
            }
        )
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / "events.parquet"))
        got = late_event_counts(str(tmp_path)).to_pandas()
        day0 = int(pd.Timestamp("2024-02-29").timestamp())
        day1 = int(pd.Timestamp("2024-03-01").timestamp())
        assert got.to_records(index=False).tolist() == [
            (day0, 0, 1),      # event 5
            (day1, 4, 2),      # events 1,2,3,6 on time; 4,7 late
        ]
        from ocr_service_ray.pipeline import entry_api

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        oracle = con.execute(entry_api.oracle_sql()["late_event_counts"]).df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      oracle.reset_index(drop=True))


class TestCurationFilters:
    """Semantics pins for the round-5 curation-filter family (the SQL
    equivalence itself is covered by TestOracleEquivalence)."""

    def test_blocklist_token_exact_not_substring(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import blocklist_hits

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "duplicate sparkle slowly",  # substrings only: no hits
                    "dup spark slow dup",        # 4 hits, 3 distinct terms
                    "",                           # empty doc
                ],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": pa.array([24, 19, 0], pa.int64()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        got = blocklist_hits(str(tmp_path)).to_pandas().sort_values("doc_id")
        assert got["n_hits"].tolist() == [0, 4, 0]
        assert got["n_terms"].tolist() == [0, 3, 0]
        assert got["blocked"].tolist() == [False, True, False]

    def test_soft_dedup_weights_sum_equals_distinct(self):
        from ocr_service_ray.analytics.dedup import exact_dedup, soft_dedup_weights

        w = soft_dedup_weights(SF).to_pandas()
        n_docs = len(w)
        n_distinct = exact_dedup(SF).count()
        # every doc keeps a row; weights sum to the distinct-content count
        assert n_docs == 500
        assert abs(w["weight"].sum() - n_distinct) < 1e-9
        assert (w.loc[w["n_copies"] == 1, "weight"] == 1.0).all()

    def test_gopher_rules_fire_on_adversarial_docs(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import gopher_filters

        good = "the quick brown fox jumps over a lazy dog and that is fine " * 5
        short = "too short"
        symbols = "# ... # ... " + "word " * 20  # 4 symbols / 24 words > 0.1
        longwords = " ".join(["x" * 20] * 40)
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [good, short, symbols, longwords],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": pa.array([len(good), len(short), len(symbols),
                                     len(longwords)], pa.int64()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        got = (
            gopher_filters(str(tmp_path)).to_pandas().set_index("doc_id")
        )
        assert bool(got.loc[1, "passed"])
        assert not bool(got.loc[2, "pass_word_count"])
        assert not bool(got.loc[3, "pass_symbols"])
        assert not bool(got.loc[4, "pass_mean_len"])

    def test_dup_doc_fraction_bounds_and_planted_dup(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import dup_doc_fraction

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        texts = [
            shared + " one two three",
            shared + " four five six",
            "seven eight nine ten eleven twelve thirteen fourteen fifteen",
            "tiny",  # < 8 tokens: excluded
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": texts,
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        got = dup_doc_fraction(str(tmp_path)).to_pandas().set_index("doc_id")
        assert 4 not in got.index
        # docs 1/2 share exactly the one 8-gram prefix window
        assert got.loc[1, "n_dup"] == 1 and got.loc[2, "n_dup"] == 1
        assert got.loc[3, "n_dup"] == 0 and got.loc[3, "dup_frac"] == 0.0
        assert ((got["dup_frac"] >= 0) & (got["dup_frac"] <= 1)).all()


class TestCdcChunks:
    """Content-defined chunking semantics pins (SQL equivalence is in
    TestOracleEquivalence)."""

    @staticmethod
    def _write_docs(tmp_path, texts):
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_chunks_tile_the_normalized_text(self, tmp_path):
        from ocr_service_ray.analytics.hashing import md5_hex, normalize_text
        from ocr_service_ray.analytics.text_analysis import cdc_chunks

        texts = [
            "the quick brown fox jumps over the lazy dog " * 8,
            "tiny",          # < 8 normalized chars: one whole chunk
            "",              # empty: no rows
            "spark row key " * 30,
        ]
        d = self._write_docs(tmp_path, texts)
        got = cdc_chunks(d).to_pandas().sort_values(["doc_id", "chunk_idx"])
        assert 3 not in set(got["doc_id"])
        for doc_id, text in ((1, texts[0]), (2, texts[1]), (4, texts[3])):
            s = normalize_text(text)
            g = got[got["doc_id"] == doc_id]
            # chunk_idx is 1..k dense; chunks tile [1, len(s)] exactly
            assert g["chunk_idx"].tolist() == list(range(1, len(g) + 1))
            assert g["start"].iloc[0] == 1
            assert (g["start"] + g["len"]).iloc[-1] == len(s) + 1
            assert (
                g["start"].iloc[1:].to_numpy()
                == (g["start"] + g["len"]).iloc[:-1].to_numpy()
            ).all()
            # hashes are md5 of the exact substrings
            for _, r in g.iterrows():
                seg = s[r["start"] - 1 : r["start"] - 1 + r["len"]]
                assert md5_hex(seg) == r["chunk_hash"]

    def test_boundaries_shift_with_content(self, tmp_path, tmp_path_factory):
        """The CDC property: prepending text only re-chunks the prefix —
        chunk hashes after the first new boundary are preserved."""
        from ocr_service_ray.analytics.text_analysis import _CDC_CACHE, cdc_chunks

        base = "the quick brown fox jumps over the lazy dog " * 10
        d1 = self._write_docs(tmp_path, [base])
        h1 = cdc_chunks(d1).to_pandas()["chunk_hash"].tolist()
        _CDC_CACHE.clear()
        d2 = self._write_docs(tmp_path_factory.mktemp("shifted"), ["PREFIX " + base])
        h2 = cdc_chunks(d2).to_pandas()["chunk_hash"].tolist()
        _CDC_CACHE.clear()
        # all but the first chunk of the original survive the prepend
        assert len(h1) > 2
        assert set(h1[1:]).issubset(set(h2))

    def test_dup_chunks_planted(self, tmp_path):
        from ocr_service_ray.analytics.text_analysis import (
            _CDC_CACHE,
            cdc_chunks,
            cdc_dup_chunks,
        )

        # this string has cuts every 44 normalized chars (probed) — the
        # "merge sort ..." vocab string has NONE (periodic 8-grams that
        # all miss ≡0 mod 64), a nice reminder that CDC boundaries are
        # content luck, not guarantees
        shared = "the quick brown fox jumps over the lazy dog " * 6
        texts = [shared + "alpha suffix one", shared + "beta ending two",
                 "completely different unrelated content here now"]
        d = self._write_docs(tmp_path, texts)
        _CDC_CACHE.clear()
        dup = cdc_dup_chunks(d)
        assert dup.num_rows >= 1
        nd = dup.column("n_docs").to_pylist()
        assert all(x >= 2 for x in nd)
        # the duplicated chunks really exist in both docs' chunk sets
        chunks = cdc_chunks(d).to_pandas()
        for h in dup.column("chunk_hash").to_pylist():
            docs = set(chunks.loc[chunks["chunk_hash"] == h, "doc_id"])
            assert len(docs) >= 2
        _CDC_CACHE.clear()

    def test_ttr_and_pii_rollup_consistency(self):
        from ocr_service_ray.analytics.text_analysis import (
            pii_rates_by_source,
            redact_pii,
            ttr_scores,
        )

        t = ttr_scores(SF).to_pandas()
        assert ((t["ttr"] >= 0) & (t["ttr"] <= 1)).all()
        assert (t["n_types"] <= t["n_tokens"]).all()
        roll = pii_rates_by_source(SF).to_pandas()
        red = redact_pii(SF).to_pandas()
        # rollup totals must equal the per-doc scrub pass totals
        assert roll["n_redactions"].sum() == red["n_redactions"].sum()
        assert roll["n_docs"].sum() == len(red)


class TestDedupCleanDocs:
    def test_planted_dup_removed_and_pass_through(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.text_analysis import (
            _DUP_GRAMS_CACHE,
            dedup_clean_docs,
        )

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
        texts = [
            shared + " one two three",
            shared + " four five six",
            "seven eight nine ten eleven twelve thirteen fourteen fifteen",
            "tiny doc",
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": texts,
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        _DUP_GRAMS_CACHE.clear()
        got = dedup_clean_docs(str(tmp_path)).to_pandas().set_index("doc_id")
        _DUP_GRAMS_CACHE.clear()
        # docs 1/2: the 8 shared-window tokens cut, suffix survives
        assert got.loc[1, "clean_text"] == "one two three"
        assert got.loc[2, "clean_text"] == "four five six"
        assert got.loc[1, "n_removed"] == 8 and got.loc[1, "n_tokens"] == 11
        # doc 3 has no corpus dup: identity pass-through of the token join
        assert got.loc[3, "clean_text"] == texts[2]
        assert got.loc[3, "n_removed"] == 0
        # short doc: no windows, unchanged
        assert got.loc[4, "clean_text"] == "tiny doc"

    def test_consistent_with_dup_doc_fraction(self):
        from ocr_service_ray.analytics.text_analysis import (
            dedup_clean_docs,
            dup_doc_fraction,
        )

        clean = dedup_clean_docs(SF).to_pandas().set_index("doc_id")
        frac = dup_doc_fraction(SF).to_pandas().set_index("doc_id")
        # removal count is a coverage superset of the dup-window count:
        # zero dup windows <=> zero removals; covered tokens >= windows
        joined = clean.join(frac, how="inner", rsuffix="_f")
        assert ((joined["n_removed"] == 0) == (joined["n_dup"] == 0)).all()
        assert (joined.loc[joined["n_dup"] > 0, "n_removed"] >= 8).all()
        # token accounting: clean token count + removed == original
        ntok_clean = clean["clean_text"].str.split().map(len)
        ntok_clean[clean["clean_text"] == ""] = 0
        assert ((ntok_clean + clean["n_removed"]) == clean["n_tokens"]).all()

    def test_driver_merge_and_shuffle_legs_identical(self, monkeypatch):
        from ocr_service_ray.analytics import text_analysis as ta

        ta._DUP_GRAMS_CACHE.clear()
        merged = ta.dup_ngram_spans(SF)
        ta._DUP_GRAMS_CACHE.clear()
        monkeypatch.setattr(ta, "_DRIVER_MERGE_MAX_ROWS", 0)
        shuffled = ta.dup_ngram_spans(SF)
        ta._DUP_GRAMS_CACHE.clear()
        assert merged.equals(shuffled)


def _oracle_sqls():
    """Side-effect-free oracle dict (placeholder truth paths): the
    graph/dedup oracles under test reference only real tables."""
    from ocr_service_ray.pipeline import entry_api

    sp = {k: "" for k in entry_api._SPAN_TRUTH_KEYS}
    mm = {"multimodal_features": "", "multimodal_segments": ""}
    return entry_api._oracle_queries(sp, mm)


def _duck(sf, name, tables=("documents", "embeddings")):
    import os

    con = duckdb.connect()
    for t in tables:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(_oracle_sqls()[name]).df()


class TestGraphHits:
    """Integer HITS: pinned three ways — the pure-numpy reference, the
    unrolled-CTE SQL oracle, and a hand-built hub fixture."""

    def test_matches_reference_and_oracle_sf(self):
        from ocr_service_ray.analytics.graph import graph_hits, hits_reference
        from ocr_service_ray.analytics.similarity import knn_join

        t = graph_hits(SF)
        e = knn_join(SF, k=5)
        edges = list(zip(e.column("vec_id").to_pylist(),
                         e.column("neighbor_id").to_pylist()))
        a, h = hits_reference(edges, t.num_rows, 4)
        assert np.array_equal(np.asarray(t.column("authority")), a)
        assert np.array_equal(np.asarray(t.column("hub")), h)
        # scores vary and the rescale keeps them bounded
        assert a.min() < a.max()
        assert int(a.max()) < 2_000_000 and int(h.max()) < 2_000_000
        want = _duck(SF, "graph_hits").sort_values("vec_id").reset_index(drop=True)
        got = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_hub_graph_authority(self, tmp_path):
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.graph import graph_hits

        # node 0: every other vector's nearest neighbor -> top authority
        rng = np.random.default_rng(5)
        hub = np.array([1.0] + [0.0] * 7)
        vecs = [hub] + [hub + rng.normal(0, 0.01, 8) for _ in range(9)]
        tbl = pa.table({
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
            "label": pa.array([0] * 10, pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        out = graph_hits(str(tmp_path), k=3).to_pandas()
        assert int(out.loc[out["rank"] == 1, "vec_id"].iloc[0]) == 0

    def test_identical_vectors_overflow_safe(self, tmp_path):
        """Degenerate corpus (all vectors identical): maximal in-degree
        concentration — the regime the per-iteration max-rescale exists
        for. Must terminate with bounded int64 scores and match the
        reference."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.graph import graph_hits, hits_reference
        from ocr_service_ray.analytics.similarity import knn_join

        n = 60
        tbl = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([[1.0, 0.0, 0.0]] * n, pa.list_(pa.float64())),
            "label": pa.array([0] * n, pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        t = graph_hits(str(tmp_path), k=5, iters=6)
        e = knn_join(str(tmp_path), k=5)
        edges = list(zip(e.column("vec_id").to_pylist(),
                         e.column("neighbor_id").to_pylist()))
        a, h = hits_reference(edges, n, 6)
        assert np.array_equal(np.asarray(t.column("authority")), a)
        assert int(np.asarray(t.column("authority")).max()) < 2_000_000


class TestEmbeddingComponents:
    def test_closure_of_pairs_and_oracle(self):
        from ocr_service_ray.analytics.dedup import (
            embedding_components,
            embedding_neardup_pairs,
        )

        got = embedding_components(SF).to_pandas()
        want = _duck(SF, "embedding_components").sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
        # independent union-find over the pair list
        pairs = embedding_neardup_pairs(SF)
        parent: dict[int, int] = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(pairs.column("vec_a").to_pylist(),
                        pairs.column("vec_b").to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp: dict[int, list[int]] = {}
        for v in got["vec_id"]:
            comp.setdefault(find(int(v)), []).append(int(v))
        expect = {v: min(comp[find(int(v))]) for v in got["vec_id"]}
        assert got.set_index("vec_id")["cluster_rep"].to_dict() == expect
        # full domain: one row per vector, singletons rep themselves
        assert len(got) == 500
        members = set(pairs.column("vec_a").to_pylist()) | set(
            pairs.column("vec_b").to_pylist())
        singles = got[~got["vec_id"].isin(members)]
        assert (singles["vec_id"] == singles["cluster_rep"]).all()


class TestSortedNeighborhood:
    def test_oracle_sf(self):
        from ocr_service_ray.analytics.dedup import sorted_neighborhood_pairs

        got = sorted_neighborhood_pairs(SF).to_pandas().reset_index(drop=True)
        want = _duck(SF, "sorted_neighborhood_pairs").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) > 0  # the sf corpus near-dups share prefixes

    def _write(self, tmp_path, texts):
        import pyarrow.parquet as pq

        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_block_boundary_invariance(self, tmp_path):
        """Force tiny sort blocks so rank windows straddle block
        boundaries: the carry hand-off must reproduce the single-node
        oracle exactly."""
        import ray.data

        from ocr_service_ray.analytics.dedup import sorted_neighborhood_pairs

        rng = np.random.default_rng(11)
        words = ["tok%02d" % i for i in range(40)]
        texts = []
        for d in range(90):
            base = " ".join(words[int(i)] for i in rng.integers(0, 40, 12))
            texts.append(f"group{d:03d} {base}")
            if d % 3 == 0:  # a same-prefix near-dup right next in sort order
                texts.append(f"group{d:03d} {base} extra")
        texts.append("")        # empty docs are excluded, not crashed on
        texts.append("   ")
        sf = self._write(tmp_path, texts)
        ctx = ray.data.DataContext.get_current()
        old = ctx.target_max_block_size
        ctx.target_max_block_size = 2048
        try:
            got = sorted_neighborhood_pairs(sf).to_pandas().reset_index(drop=True)
        finally:
            ctx.target_max_block_size = old
        want = _duck(sf, "sorted_neighborhood_pairs").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) >= 30

    def test_prefix_mutation_recall_tradeoff(self, tmp_path):
        """The documented miss: a near-dup whose FIRST words differ
        sorts far away and is not windowed — while the same edit at the
        end is found. (LSH banding covers the head-edit regime.)"""
        from ocr_service_ray.analytics.dedup import sorted_neighborhood_pairs

        body = " ".join("w%02d" % i for i in range(30))
        texts = [
            f"aaa {body}",
            f"aaa {body} tail-edit",        # same prefix -> adjacent -> found
            f"zzz {body}",                  # head edit -> sorts away
        ]
        # spacer docs push 'zzz' beyond the window from 'aaa'
        texts += [f"mid{i:02d} spacer doc {i}" for i in range(20)]
        sf = self._write(tmp_path, texts)
        got = sorted_neighborhood_pairs(sf).to_pandas()
        pairs = set(zip(got["doc_a"], got["doc_b"]))
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs


class TestKcoreMembers:
    def test_oracle_and_reference_sf(self):
        from ocr_service_ray.analytics.dedup import embedding_neardup_pairs
        from ocr_service_ray.analytics.graph import kcore_members, kcore_reference

        got = kcore_members(SF).to_pandas().reset_index(drop=True)
        want = _duck(SF, "kcore_members").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert 0 < len(got) < 500  # non-trivial peel on the sf corpus
        pairs = embedding_neardup_pairs(SF, 0.35)
        edges = list(zip(pairs.column("vec_a").to_pylist(),
                         pairs.column("vec_b").to_pylist()))
        alive, deg = kcore_reference(edges, 500, 2, 32)
        assert np.flatnonzero(alive).tolist() == got["vec_id"].tolist()
        assert deg[alive].tolist() == got["deg"].tolist()
        # every member keeps >= kmin member-neighbors (converged core)
        assert (got["deg"] >= 2).all()

    def test_triangle_with_pendant_chain(self, tmp_path):
        """Hand graph (edge set pinned by the cosines): triangle
        {0,1,2}, node 3 tied to all three, pendant chain 3-4-5. The
        2-core is {0,1,2,3}: 5 peels (deg 1), THEN 4 peels (deg 1 only
        after 5 is gone) — the cascade takes two rounds, exercising
        the iterated removal, while 3 survives on its triangle ties."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.graph import kcore_members

        # triangle: three near-identical vectors; chain: each step
        # close only to its predecessor, drifting away from the core
        base = np.array([1.0, 0.0, 0.0, 0.0])
        vecs = [base, base + 0.01, base + 0.02]
        drift = np.array([0.0, 1.0, 0.0, 0.0])
        cur = base
        for i in range(3):
            cur = 0.55 * cur / np.linalg.norm(cur) + 0.85 * drift
            drift = np.roll(drift, 1)
            vecs.append(cur.copy())
        tbl = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
            "label": pa.array([0] * len(vecs), pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        got = kcore_members(str(tmp_path)).to_pandas()
        want = _duck(str(tmp_path), "kcore_members").reset_index(drop=True)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
        assert set(got["vec_id"]) == {0, 1, 2, 3}
        assert got.set_index("vec_id")["deg"].to_dict() == {0: 3, 1: 3, 2: 3, 3: 3}


class TestClusteringCoefficients:
    def test_oracle_sf(self):
        from ocr_service_ray.analytics.graph import clustering_coefficients

        got = clustering_coefficients(SF).to_pandas().reset_index(drop=True)
        want = _duck(SF, "clustering_coefficients").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) == 500 and (got["n_tri"] > 0).any()
        # triangle identity: each triangle contributes 3 corner counts
        assert got["n_tri"].sum() % 3 == 0

    def test_k4_with_pendant_chain(self, tmp_path):
        """Same fixture as the k-core test (K4 on {0,1,2,3}, chain
        3-4-5): K4-only nodes are fully clustered (coeff 1.0), the
        articulation node 3 is diluted by its chain edge (3/C(4,2) =
        0.5), chain nodes have no closed wedge (0.0)."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.graph import clustering_coefficients

        base = np.array([1.0, 0.0, 0.0, 0.0])
        vecs = [base, base + 0.01, base + 0.02]
        drift = np.array([0.0, 1.0, 0.0, 0.0])
        cur = base
        for i in range(3):
            cur = 0.55 * cur / np.linalg.norm(cur) + 0.85 * drift
            drift = np.roll(drift, 1)
            vecs.append(cur.copy())
        tbl = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
            "label": pa.array([0] * len(vecs), pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        got = clustering_coefficients(str(tmp_path)).to_pandas()
        want = _duck(str(tmp_path), "clustering_coefficients").reset_index(drop=True)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
        by = got.set_index("vec_id")
        assert by.loc[[0, 1, 2], "coeff"].tolist() == [1.0, 1.0, 1.0]
        assert by.loc[3, "coeff"] == 0.5
        assert by.loc[[4, 5], "coeff"].tolist() == [0.0, 0.0]
        assert by.loc[[0, 1, 2, 3], "n_tri"].tolist() == [3, 3, 3, 3]


class TestGraphCommunities:
    def test_oracle_and_reference_sf(self):
        from ocr_service_ray.analytics.dedup import embedding_neardup_pairs
        from ocr_service_ray.analytics.graph import graph_communities, lpa_reference

        got = graph_communities(SF).to_pandas().reset_index(drop=True)
        want = _duck(SF, "graph_communities").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        pairs = embedding_neardup_pairs(SF, 0.35)
        edges = list(zip(pairs.column("vec_a").to_pylist(),
                         pairs.column("vec_b").to_pylist()))
        ref = lpa_reference(edges, 500, 4)
        assert np.array_equal(ref, got["community"].to_numpy())
        # non-trivial: some labels propagated, isolated nodes kept
        assert 1 < got["community"].nunique() < 500

    def test_path_oscillation_fixed_round(self, tmp_path):
        """Path 0-1-2 (cos edges 0-1 and 1-2 only): synchronous LPA
        oscillates with period 2, and round 1 exercises the mode TIE
        (node 1 sees {0, 2} -> smallest wins). The fixed-round state
        after 4 rounds is [0, 1, 0] — all three implementations (Ray,
        numpy reference, SQL oracle) must agree on it exactly."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.graph import graph_communities

        import math
        vecs = [
            [1.0, 0.0],
            [math.cos(math.radians(60)), math.sin(math.radians(60))],
            [math.cos(math.radians(120)), math.sin(math.radians(120))],
        ]
        tbl = pa.table({
            "vec_id": pa.array(range(3), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
            "label": pa.array([0] * 3, pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        got = graph_communities(str(tmp_path)).to_pandas()
        want = _duck(str(tmp_path), "graph_communities").reset_index(drop=True)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
        assert got["community"].tolist() == [0, 1, 0]


class TestMmrDiverseTopk:
    def test_oracle_sf(self):
        from ocr_service_ray.analytics.similarity import mmr_diverse_topk

        got = mmr_diverse_topk(SF).to_pandas().reset_index(drop=True)
        want = _duck(SF, "mmr_diverse_topk").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) == 10
        # greedy invariants: steps 1..10, no repeats, anchor excluded
        assert got["step"].tolist() == list(range(1, 11))
        assert got["vec_id"].is_unique and (got["vec_id"] != 0).all()
        assert int(got.loc[0, "div_penalty"]) == 0

    def test_diversity_beats_redundancy(self, tmp_path):
        """Three near-clones share a strong off-axis component (their
        mutual similarity EXCEEDS their anchor relevance), one diverse
        candidate is nearly as relevant, one is orthogonal. Relevance
        order is 1,2,3,4,5; MMR must demote the clones: after clone 1
        the diverse vector AND the orthogonal one both outscore the
        remaining clones (whose 2*rel - div goes negative)."""
        import pyarrow.parquet as pq

        from ocr_service_ray.analytics.similarity import mmr_diverse_topk

        vecs = [
            [1.0, 0.0, 0.0, 0.0],
            [0.80, 0.0, 0.0, 0.60],
            [0.80, 0.01, 0.0, 0.60],
            [0.80, 0.0, 0.01, 0.60],
            [0.75, 0.66, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
        ]
        tbl = pa.table({
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
            "label": pa.array([0] * 6, pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
        got = mmr_diverse_topk(str(tmp_path), k=5).to_pandas()
        assert got["vec_id"].tolist() == [1, 4, 5, 2, 3]
        # the redundant clones end with negative marginal scores
        assert (got.loc[got["vec_id"].isin([2, 3]), "score"] < 0).all()
        # k=10 default vs 5 candidates: both sides emit 5 rows
        full = mmr_diverse_topk(str(tmp_path)).to_pandas()
        want = _duck(str(tmp_path), "mmr_diverse_topk").reset_index(drop=True)
        pd.testing.assert_frame_equal(full.reset_index(drop=True), want)
        assert len(full) == 5
