"""Benchmark harness.

Default: run the headline extraction pipeline + representative analytics
queries at $GRAFT_SF_DIR (default /root/testdata/sf0.1) under
ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE
JSON line:
    {"metric": ..., "value": docs_per_sec, "unit": "docs/sec",
     "queries": {name: sec}, "sf": ..., "num_cpus": N}

--scaling: run the identical pipeline job twice in FRESH processes at
N and 4N cpus (default 4 and 16; override N with $GRAFT_SCALE_LO) on
the same input and report both throughputs + scaling efficiency
((dps_4N/dps_N)/4); appends the result to BENCH/BASELINE.md. This is
the sandbox substitution for the north rule's N-vs-4N-node criterion
(BASELINE.json / driver directive); see BENCH/BASELINE.md for why the
default pair avoids the box's SMT region.

--one-run --num-cpus N: internal child mode; times ONLY run_pipeline
(corpus generation is cached, ray.init excluded).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time


def sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def default_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def host_load() -> dict:
    """Machine-checkable host-load snapshot (loadavg + top CPU eaters):
    headline throughput on this box swings ±20% with EXTERNAL load, so
    every bench artifact carries the evidence needed to attribute
    variance instead of asserting it."""
    snap: dict = {}
    try:
        with open("/proc/loadavg") as f:
            snap["loadavg"] = [float(x) for x in f.read().split()[:3]]
    except OSError:
        snap["loadavg"] = None
    try:
        out = subprocess.run(
            ["ps", "-eo", "comm,%cpu", "--sort=-%cpu", "--no-headers"],
            capture_output=True, text=True, timeout=5,
        ).stdout.splitlines()
        top = []
        for line in out[:3]:
            parts = line.rsplit(None, 1)
            if len(parts) == 2:
                top.append([parts[0], float(parts[1])])
        snap["top"] = top
    except Exception:
        snap["top"] = None
    return snap


def settle(max_wait_s: float = 60.0, target_load: float = 4.0) -> float:
    """Wait (bounded) for the box to quiesce before a TIMED child run.

    Measured this round: a headline child launched seconds after a
    previous Ray session exited read 796 docs/s while back-to-back
    standalone runs on the idle box read 1,329/1,408 — draining workers
    from the PREVIOUS measurement, not the code, set the number. The
    wait is recorded in the artifact (`settle_s`) alongside the load
    snapshot, so a reading taken on a still-busy box is visible rather
    than silently low."""
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < max_wait_s:
        try:
            with open("/proc/loadavg") as f:
                load1 = float(f.read().split()[0])
        except OSError:
            break
        if load1 < target_load:
            break
        time.sleep(2.0)
    return round(time.perf_counter() - t0, 1)


def one_run(num_cpus: int, scale: str) -> dict:
    """Fresh-session timed pipeline run; returns metrics dict."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        from ocr_service_ray.pipeline.entry_api import span_corpus
        from ocr_service_ray.pipeline.run import run_pipeline, verify_output

        info = span_corpus(scale)  # cached after first call
        out = tempfile.mkdtemp(prefix=f"bench_out_{scale}_{num_cpus}_")
        t0 = time.perf_counter()
        run_pipeline(info["docs"], info["blobs"], out)
        wall = time.perf_counter() - t0
        check = verify_output(out, info["expected"])
        return {
            "num_cpus": num_cpus,
            "scale": scale,
            "n_docs": info["n_docs"],
            "n_spans": info["n_spans"],
            "wall_s": round(wall, 3),
            "docs_per_sec": round(info["n_docs"] / wall, 3),
            "match_rate": check["match_rate"],
            "load": host_load(),
        }
    finally:
        ray.shutdown()


def run_queries(num_cpus: int) -> dict:
    """Time representative analytics queries at sf_dir."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        from ocr_service_ray.analytics import (
            curation,
            dedup,
            relational,
            similarity,
            text_analysis,
            windows,
        )
        from ocr_service_ray.pipeline import cluster

        timings = {}
        for name, fn in {
            "exact_dedup": lambda: dedup.exact_dedup(sf_dir()).materialize(),
            "minhash_pairs": lambda: dedup.minhash_lsh_pairs(sf_dir()),
            "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(sf_dir()),
            "simhash": lambda: dedup.simhash_fingerprints(sf_dir()).materialize(),
            "embedding_neardup": lambda: dedup.embedding_neardup_pairs(sf_dir()),
            "ann_topk": lambda: similarity.brute_topk(sf_dir()),
            "ann_topk_filtered": lambda: similarity.filtered_topk(sf_dir()),
            "ann_topk_quantized": lambda: similarity.quantized_topk(sf_dir()),
            "ann_ivf_topk": lambda: similarity.ivf_topk(sf_dir()),
            "mmr_diverse_topk": lambda: similarity.mmr_diverse_topk(sf_dir()),
            "knn_join": lambda: similarity.knn_join(sf_dir()),
            "triangle_count": lambda: __import__("ocr_service_ray.analytics.graph", fromlist=["triangle_count"]).triangle_count(sf_dir()),
            "graph_pagerank": lambda: __import__("ocr_service_ray.analytics.graph", fromlist=["graph_pagerank"]).graph_pagerank(sf_dir()),
            "graph_hits": lambda: __import__("ocr_service_ray.analytics.graph", fromlist=["graph_hits"]).graph_hits(sf_dir()),
            "kcore_members": lambda: __import__("ocr_service_ray.analytics.graph", fromlist=["kcore_members"]).kcore_members(sf_dir()),
            "clustering_coefficients": lambda: __import__("ocr_service_ray.analytics.graph", fromlist=["clustering_coefficients"]).clustering_coefficients(sf_dir()),
            "graph_communities": lambda: __import__("ocr_service_ray.analytics.graph", fromlist=["graph_communities"]).graph_communities(sf_dir()),
            "embedding_components": lambda: dedup.embedding_components(sf_dir()),
            "sorted_neighborhood_pairs": lambda: dedup.sorted_neighborhood_pairs(sf_dir()),
            "ann_ivf_exhaustive": lambda: similarity.ivf_topk(sf_dir(), nprobe=16),
            "ann_lsh_topk": lambda: similarity.lsh_topk(sf_dir()),
            "lang_id": lambda: text_analysis.lang_id(sf_dir()).materialize(),
            "text_normalize": lambda: text_analysis.text_normalize(sf_dir()).materialize(),
            "token_counts": lambda: text_analysis.token_counts(sf_dir()).materialize(),
            "quality_scores": lambda: text_analysis.quality_scores(sf_dir()).materialize(),
            "gopher_filters": lambda: text_analysis.gopher_filters(sf_dir()).materialize(),
            "blocklist_hits": lambda: text_analysis.blocklist_hits(sf_dir()).materialize(),
            "dup_doc_fraction": lambda: text_analysis.dup_doc_fraction(sf_dir()),
            "soft_dedup_weights": lambda: dedup.soft_dedup_weights(sf_dir()).materialize(),
            "ttr_scores": lambda: text_analysis.ttr_scores(sf_dir()).materialize(),
            "pii_rates_by_source": lambda: text_analysis.pii_rates_by_source(sf_dir()),
            "cdc_chunks": lambda: text_analysis.cdc_chunks(sf_dir()),
            "cdc_dup_chunks": lambda: text_analysis.cdc_dup_chunks(sf_dir()),
            "dedup_clean_docs": lambda: text_analysis.dedup_clean_docs(sf_dir()),
            "fingerprints": lambda: text_analysis.fingerprints(sf_dir()).materialize(),
            "winnow_fingerprints": lambda: text_analysis.winnow_fingerprints(sf_dir()).materialize(),
            "fingerprint_matches": lambda: text_analysis.fingerprint_matches(sf_dir()),
            "lm_doc_scores": lambda: text_analysis.lm_doc_scores(sf_dir()),
            "dsir_weights": lambda: text_analysis.dsir_weights(sf_dir()),
            "ccnet_buckets": lambda: text_analysis.ccnet_buckets(sf_dir()),
            "dsir_sample": lambda: text_analysis.dsir_sample(sf_dir()),
            "source_overlap": lambda: text_analysis.source_overlap(sf_dir()),
            "quality_classifier": lambda: text_analysis.quality_classifier(sf_dir()),
            "bm25_search": lambda: __import__("ocr_service_ray.analytics.text_index", fromlist=["bm25_search"]).bm25_search(sf_dir()),
            "pricing_summary": lambda: relational.pricing_summary(sf_dir()),
            "orders_by_nation": lambda: relational.orders_by_nation(sf_dir()),
            "top_docs_by_words": lambda: relational.top_docs_by_words(sf_dir()),
            "source_stats": lambda: relational.source_stats(sf_dir()),
            "tumbling_counts": lambda: windows.tumbling_counts(sf_dir()),
            "incremental_tumbling_counts": lambda: windows.incremental_tumbling_counts(sf_dir()),
            "hopping_counts": lambda: windows.hopping_counts(sf_dir()),
            "sessionize": lambda: windows.sessionize(sf_dir()),
            "event_session_ids": lambda: windows.event_session_ids(sf_dir()),
            "sessionize_scan": lambda: windows.sessionize_segmented(sf_dir()),
            "asof_join": lambda: windows.asof_last_purchase(sf_dir()),
            "range_join": lambda: windows.range_join_error_clicks(sf_dir()),
            "distinct_users": lambda: windows.distinct_users(sf_dir()),
            "approx_distinct_users": lambda: windows.approx_distinct_users(sf_dir()),
            "value_quantiles": lambda: windows.value_quantiles(sf_dir()),
            "hash_sample": lambda: relational.hash_sample(sf_dir()).materialize(),
            "priority_sample": lambda: relational.priority_sample(sf_dir()),
            "profile_tables": lambda: relational.profile_tables(sf_dir()),
            "text_search": lambda: __import__("ocr_service_ray.analytics.text_index", fromlist=["text_search"]).text_search(sf_dir()),
            "ranked_text_search": lambda: __import__("ocr_service_ray.analytics.text_index", fromlist=["ranked_text_search"]).ranked_text_search(sf_dir()),
            "revenue_by_nation": lambda: relational.revenue_by_nation(sf_dir()),
            "customers_without_big_orders": lambda: relational.customers_without_big_orders(sf_dir()),
            "customer_order_histogram": lambda: relational.customer_order_histogram(sf_dir()),
            "local_supplier_volume": lambda: relational.local_supplier_volume(sf_dir()),
            "brand_volume": lambda: relational.brand_volume(sf_dir()),
            "stratified_sample": lambda: relational.stratified_sample(sf_dir()),
            "running_totals": lambda: windows.running_totals(sf_dir()),
            "neardup_clusters": lambda: dedup.neardup_clusters(sf_dir()),
            "top_docs_per_source": lambda: relational.top_docs_per_source(sf_dir()),
            "rare_token_scores": lambda: relational.rare_token_scores(sf_dir()),
            "approx_quantiles_kmv": lambda: windows.approx_quantiles_kmv(sf_dir()),
            "purchaser_clicks": lambda: windows.purchaser_clicks(sf_dir()),
            "singleton_docs": lambda: dedup.singleton_docs(sf_dir()),
            "daily_type_pivot": lambda: windows.daily_type_pivot(sf_dir()),
            "value_histogram": lambda: windows.value_histogram(sf_dir()),
            "source_lang_rollup": lambda: relational.source_lang_rollup(sf_dir()),
            "embedding_clusters": lambda: similarity.embedding_clusters(sf_dir()),
            "dbscan_clusters": lambda: similarity.dbscan_clusters(sf_dir()),
            "redact_pii": lambda: text_analysis.redact_pii(sf_dir()).materialize(),
            "chunk_documents": lambda: text_analysis.chunk_documents(sf_dir()),
            "benchmark_contamination": lambda: text_analysis.benchmark_contamination(sf_dir()),
            "docs_in_char_range": lambda: cluster.docs_in_char_range(sf_dir()),
            "user_value_windows": lambda: windows.user_value_windows(sf_dir()),
            "value_ntiles": lambda: windows.value_ntiles(sf_dir()),
            "value_quantiles_cont": lambda: windows.value_quantiles_cont(sf_dir()),
            "value_mad": lambda: windows.value_mad(sf_dir()),
            "trimmed_mean": lambda: windows.trimmed_mean(sf_dir()),
            "decayed_user_scores": lambda: windows.decayed_user_scores(sf_dir()),
            "purchaser_clicks_bloom": lambda: windows.purchaser_clicks_bloom(sf_dir()),
            "heavy_tokens": lambda: text_analysis.heavy_hitter_tokens(sf_dir()),
            "repetition_scores": lambda: text_analysis.repetition_scores(sf_dir()),
            "bigram_counts": lambda: text_analysis.bigram_counts(sf_dir()),
            "fuzzy_token_pairs": lambda: text_analysis.fuzzy_token_pairs(sf_dir()),
            "cms_token_counts": lambda: text_analysis.cms_token_counts(sf_dir()),
            "token_canonical_map": lambda: text_analysis.token_canonical_map(sf_dir()),
            "item_cooccurrence": lambda: windows.item_cooccurrence(sf_dir()),
            "daily_counts_filled": lambda: windows.daily_counts_filled(sf_dir()),
            "max_concurrency": lambda: windows.max_concurrency(sf_dir()),
            "long_tail_docs": lambda: relational.long_tail_docs(sf_dir()),
            "curation_status": lambda: curation.curation_status(sf_dir()),
            "shuffle_shards": lambda: curation.shuffle_shards(sf_dir()),
            "cross_snapshot_dupes": lambda: dedup.cross_snapshot_dupes(sf_dir()),
            "cross_snapshot_neardup": lambda: dedup.cross_snapshot_neardup(sf_dir()),
            "snapshot_set_ops": lambda: dedup.snapshot_set_ops(sf_dir()),
            "daily_type_unpivot": lambda: windows.daily_type_unpivot(sf_dir()),
            "value_trend": lambda: windows.value_trend(sf_dir()),
            "distinctive_terms": lambda: text_analysis.distinctive_terms(sf_dir()),
            "user_journeys": lambda: windows.user_journeys(sf_dir()),
            "value_ranks": lambda: windows.value_ranks(sf_dir()),
            "zscore_outliers": lambda: windows.zscore_outliers(sf_dir()),
            "value_mode": lambda: windows.value_mode(sf_dir()),
            "daily_new_users": lambda: windows.daily_new_users(sf_dir()),
            "dup_ngram_spans": lambda: text_analysis.dup_ngram_spans(sf_dir()),
            "user_purchase_error_profile": lambda: relational.user_purchase_error_profile(sf_dir()),
            "props_k_stats": lambda: windows.props_k_stats(sf_dir()),
            "funnel_counts": lambda: windows.funnel_counts(sf_dir()),
            "retention_cohorts": lambda: windows.retention_cohorts(sf_dir()),
            "latest_doc_versions": lambda: dedup.latest_doc_versions(sf_dir()),
            "rolling_active_users": lambda: windows.rolling_active_users(sf_dir()),
            "top_values_with_ties": lambda: windows.top_values_with_ties(sf_dir()),
            "bpe_vocab": lambda: text_analysis.bpe_vocab(sf_dir()),
            "embedding_quantize": lambda: similarity.embedding_quantize(sf_dir()),
            "throttled_events": lambda: windows.throttled_events(sf_dir()),
            "event_transitions": lambda: windows.event_transitions(sf_dir()),
            "debounced_events": lambda: windows.debounced_events(sf_dir()),
            "interval_coverage": lambda: windows.interval_coverage(sf_dir()),
            "dataset_splits": lambda: relational.dataset_splits(sf_dir()),
            "shipping_priority": lambda: relational.shipping_priority(sf_dir()),
            "packed_sequences": lambda: text_analysis.packed_sequences(sf_dir()),
            "canonical_docs": lambda: curation.canonical_docs(sf_dir()),
            "neardup_clusters_fast": lambda: dedup.neardup_clusters_doubling(sf_dir()),
            "semantic_dedup": lambda: dedup.semantic_dedup(sf_dir()),
            "embedding_pca": lambda: similarity.embedding_pca(sf_dir()),
            "bpe_encode": lambda: text_analysis.bpe_encode(sf_dir()),
            "returned_item_customers": lambda: relational.returned_item_customers(sf_dir()),
            "forecast_revenue": lambda: relational.forecast_revenue(sf_dir()),
            "purchaser_clicks_salted": lambda: windows.purchaser_clicks_salted(sf_dir()),
            "docs_in_char_lang_box": lambda: cluster.docs_in_char_lang_box(sf_dir()),
            "skyline_docs": lambda: text_analysis.skyline_docs(sf_dir()),
            "dataset_mixture": lambda: relational.dataset_mixture(sf_dir()),
            "time_to_conversion": lambda: windows.time_to_conversion(sf_dir()),
            "cross_snapshot_neardup_idx": lambda: dedup.cross_snapshot_neardup_indexed(sf_dir()),
            "purchaser_clicks_auto": lambda: windows.purchaser_clicks_auto(sf_dir()),
            "source_lang_cube": lambda: relational.source_lang_cube(sf_dir()),
            "embedding_drift": lambda: similarity.embedding_drift(sf_dir()),
            "containment_pairs": lambda: dedup.containment_pairs(sf_dir()),
            "lang_mismatch": lambda: text_analysis.lang_mismatch(sf_dir()),
            "table_checksum": lambda: relational.table_checksum(sf_dir()),
            "leakage_safe_splits": lambda: curation.leakage_safe_splits(sf_dir()),
            "compression_ratios": lambda: text_analysis.compression_ratios(sf_dir()),
            "phrase_search": lambda: __import__("ocr_service_ray.analytics.text_index", fromlist=["phrase_search"]).phrase_search(sf_dir()),
            "vocab_coverage": lambda: text_analysis.vocab_coverage(sf_dir()),
            "dataset_card": lambda: curation.dataset_card(sf_dir()),
            "curation_rates_by_source": lambda: curation.curation_rates_by_source(sf_dir()),
            "doc_bigram_novelty": lambda: text_analysis.doc_bigram_novelty(sf_dir()),
            "simhash_pairs": lambda: dedup.simhash_pairs(sf_dir()),
            "text_search_incr": lambda: __import__("ocr_service_ray.analytics.text_index", fromlist=["text_search_incremental"]).text_search_incremental(sf_dir()),
            "entropy_scores": lambda: text_analysis.entropy_scores(sf_dir()),
            "source_divergence": lambda: text_analysis.source_divergence(sf_dir()),
            "late_event_counts": lambda: windows.late_event_counts(sf_dir()),
        }.items():
            served_from_memo = _memo_probe(name, sf_dir())
            t0 = time.perf_counter()
            fn()
            elapsed = round(time.perf_counter() - t0, 3)
            # memoized results (e.g. item_cooccurrence's pair table was
            # already computed inside triangle_count) would read as an
            # unrepresentative 0.0 s — stamp them instead.
            timings[name] = "cached" if served_from_memo else elapsed
        return timings
    finally:
        ray.shutdown()


def _memo_probe(name: str, sf: str) -> bool:
    """True when `name` will be served from a module-level memo cache
    populated earlier in this bench process (its timing would be ~0)."""
    try:
        if name == "item_cooccurrence":
            from ocr_service_ray.analytics import windows

            return any(k[0] == sf for k in windows._COOC_CACHE)
        if name == "bpe_vocab":
            from ocr_service_ray.analytics import text_analysis

            return any(k[0] == sf for k in text_analysis._BPE_CACHE)
    except Exception:
        return False
    return False


def child_run(num_cpus: int, scale: str, env_extra: dict | None = None) -> dict:
    """Spawn a FRESH process for a timed pipeline run."""
    settle_s = settle()
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    out = subprocess.run(
        [sys.executable, __file__, "--one-run", "--num-cpus", str(num_cpus), "--bench-scale", scale],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
        env=env,
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            result = json.loads(line)
            result["settle_s"] = settle_s
            return result
    raise RuntimeError(f"child failed: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def scale_for_sf() -> str:
    d = sf_dir()
    if "sf0.001" in d:
        return "tiny"
    if "sf0.01" in d:
        return "small"
    # sf0.1 headline runs the full 65k-doc bench corpus: fixed costs
    # (session spin-up, actor-pool warm-up) amortize over 4x the docs,
    # so the number reflects steady-state throughput, not ramp.
    return os.environ.get("GRAFT_BENCH_SCALE", "bench")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--one-run", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=0)
    ap.add_argument("--bench-scale", default=None)
    ap.add_argument("--skip-queries", action="store_true")
    args = ap.parse_args()
    scale = args.bench_scale or scale_for_sf()

    if args.one_run:
        print(json.dumps(one_run(args.num_cpus or default_cpus(), scale)))
        return 0

    if args.scaling:
        # warm the corpus cache once so neither child pays generation
        from ocr_service_ray.pipeline.entry_api import span_corpus

        span_corpus(scale)
        # N vs 4N parallelism. Default 4 -> 16: a pure-CPU microbenchmark
        # on this box measures 32 concurrent processes at only ~20
        # effective cores (SMT), i.e. a hard 0.63 ceiling for 8->32 that
        # no software can beat; 4 and 16 both sit in physical-core
        # territory (~0.95 microbench efficiency), so the pair actually
        # measures the PIPELINE's scaling, not the CPU topology's.
        lo_n = int(os.environ.get("GRAFT_SCALE_LO", "4"))
        hi_n = 4 * lo_n
        # equal actor fraction at both sizes (3/4 vs 12/16): the default
        # integer reserve gives 3/4 vs 14/16 actors, which reads as
        # dishonest SUPERLINEAR efficiency even though per-actor
        # throughput is flat. Production default (no env) keeps the
        # larger pool.
        env = {"GRAFT_POOL_FRACTION": "0.75"}
        lo = child_run(lo_n, scale, env)
        hi = child_run(hi_n, scale, env)
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi_n / lo_n)
        result = {
            "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}_cpus",
            "value": round(eff, 3),
            "unit": "fraction",
            "runs": [lo, hi],
            "sf": sf_dir(),
        }
        print(json.dumps(result))
        _append_baseline(result)
        return 0

    # default: headline pipeline (fresh child process) + analytics queries
    head = child_run(args.num_cpus or default_cpus(), scale)
    queries = {} if args.skip_queries else run_queries(args.num_cpus or default_cpus())
    # Full per-query timings go to a FILE; the stdout summary line must
    # stay short (<~2 KB) because the driver captures only a tail of
    # stdout — a 143-entry dict truncated the line and broke parsing in
    # round 3 (BENCH_r03.json parsed: null).
    os.makedirs("BENCH", exist_ok=True)
    with open(os.path.join("BENCH", "queries_latest.json"), "w") as f:
        json.dump(
            {"sf": sf_dir(), "num_cpus": args.num_cpus or default_cpus(),
             "n_queries": len(queries), "queries": queries},
            f, indent=1, sort_keys=True,
        )
    numeric = {k: v for k, v in queries.items() if isinstance(v, (int, float))}
    slowest = dict(sorted(numeric.items(), key=lambda kv: -kv[1])[:12])
    print(
        json.dumps(
            {
                "metric": "extracted_docs_per_sec",
                "value": head["docs_per_sec"],
                "unit": "docs/sec",
                "queries": slowest,
                "n_queries": len(queries),
                "queries_total_s": round(sum(numeric.values()), 1),
                "queries_file": "BENCH/queries_latest.json",
                "sf": sf_dir(),
                "num_cpus": args.num_cpus or default_cpus(),
                "headline": head,
                "load": host_load(),
            },
            separators=(",", ":"),
        )
    )
    return 0


def _append_baseline(result: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    path = os.path.join("BENCH", "BASELINE.md")
    lo, hi = result["runs"]
    lines = [
        "",
        f"## Scaling run ({result['sf']}, scale={lo['scale']}, {lo['n_docs']} docs)",
        "",
        "| num_cpus | wall (s) | docs/sec | match rate |",
        "|---|---|---|---|",
        f"| {lo['num_cpus']} | {lo['wall_s']} | {lo['docs_per_sec']} | {lo['match_rate']} |",
        f"| {hi['num_cpus']} | {hi['wall_s']} | {hi['docs_per_sec']} | {hi['match_rate']} |",
        "",
        f"**Scaling efficiency ({lo['num_cpus']} -> {hi['num_cpus']} cpus): {result['value']}** (target >= 0.8)",
        "",
    ]
    with open(path, "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    raise SystemExit(main())
