"""Text analysis operators over the ``documents`` table.

All stateless vectorized ``map_batches`` stages. Where a DuckDB oracle
exists, the Python expression is written to be IEEE/semantics-identical
to the SQL form (same regex engine-compatible patterns, same integer
counts, same division order) so the driver's value-hash comparison is
exact, not approximate.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

from .hashing import md5_hex, normalize_text

# re.ASCII everywhere a pattern is mirrored in a DuckDB (RE2) oracle:
# RE2's \s/\S/\b are ASCII-only while Python's default is unicode-aware
# — identical on ASCII corpora, divergent on NBSP/accented input (the
# same latent-divergence class batch_stages._PY_WS_CLASS fixed for the
# span pipeline, here resolved by pinning Python to RE2 semantics).
# RE2 \s is exactly [ \t\n\f\r] (no \x0b) — spell the classes out
_TOKEN = re.compile(r"[^ \t\n\f\r]+")
_SUBWORD = re.compile(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 \t\n\f\r]")
_PUNCT = re.compile(r"[.,;:!?]")
_ALPHA = re.compile(r"[A-Za-z]")
_STOPWORDS = re.compile(r"\b(the|a|of|and|in|to|is)\b", re.ASCII)
_WS_SPLIT = re.compile(r"[ \t\n\f\r]+")

# crude per-language stopword markers for the heuristic language id
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "los", "las", "es", "con", "para"),
    "fr": ("le", "la", "les", "est", "avec", "pour"),
    "de": ("der", "die", "das", "und", "ist", "mit"),
    "pt": ("o", "os", "das", "com", "para", "nao"),
}


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def token_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_tokens, n_subwords): whitespace + BPE-ish counts."""

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array([len(_TOKEN.findall(t or "")) for t in texts], pa.int64()),
                "n_subwords": pa.array(
                    [len(_SUBWORD.findall(t or "")) for t in texts], pa.int64()
                ),
            }
        )

    return _docs(sf_dir).map_batches(counts, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    """Length / punctuation / stopword quality facets per document."""

    def q(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_chars, n_words, punct_ratio, stop_ratio = [], [], [], []
        for t in texts:
            t = t or ""
            nc = len(t)
            nw = len(_TOKEN.findall(t))
            np_ = len(_PUNCT.findall(t))
            ns = len(_STOPWORDS.findall(t.lower()))
            n_chars.append(nc)
            n_words.append(nw)
            punct_ratio.append(np_ / nc if nc else 0.0)
            stop_ratio.append(ns / nw if nw else 0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_text": pa.array(n_chars, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "punct_ratio": pa.array(punct_ratio, pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(q, batch_format="pyarrow")


# the 8 stop words of the Gopher rule "contains at least 2 of ..."
# (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1.1)
_GOPHER_STOPS = frozenset(("the", "be", "to", "of", "and", "that", "have", "with"))
# word-count band scaled to the synthetic corpus (Gopher: 50..100_000)
_GOPHER_MIN_WORDS = 30
_GOPHER_MAX_WORDS = 100_000


def _gopher_metrics(t: str | None) -> tuple:
    """(n_words, mean_word_len, alpha_frac, symbol_ratio, stop_hits) —
    the ONE implementation behind gopher_filters and curation_funnel
    (single source of truth for the rule inputs)."""
    t = t or ""
    words = _TOKEN.findall(t)
    nw = len(words)
    return (
        nw,
        sum(len(w) for w in words) / nw if nw else 0.0,
        sum(1 for w in words if _ALPHA.search(w)) / nw if nw else 0.0,
        (t.count("#") + t.count("...")) / nw if nw else 0.0,
        len(_GOPHER_STOPS.intersection(_TERM.findall(t.lower()))),
    )


def gopher_passed(t: str | None) -> bool:
    """The gopher_filters conjunction for one document."""
    nw, ml, af, sr, sh = _gopher_metrics(t)
    return (
        _GOPHER_MIN_WORDS <= nw <= _GOPHER_MAX_WORDS
        and 3.0 <= ml <= 10.0
        and af > 0.8
        and sr <= 0.1
        and sh >= 2
    )


def gopher_filters(sf_dir: str) -> "ray.data.Dataset":
    """Gopher/MassiveText repetition-free quality rules, one boolean per
    rule plus the conjunction (Rae et al. 2021, App. A1.1): word-count
    band, mean-word-length in [3, 10], >80% of words contain an
    alphabetic character, symbol-to-word ratio ('#' or '...') <= 0.1,
    and >= 2 of the 8 canonical stop words present. Docs are KEPT as
    rows either way — ``passed`` is the filter decision, so the same
    table drives both the filter and its audit dashboard.

    Ray shape: one stateless vectorized pass, no shuffle; every ratio
    is a single IEEE division mirrored exactly by the DuckDB oracle.
    """

    def g(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_words_c, mean_len_c, alpha_c, sym_c, stop_c = [], [], [], [], []
        for t in texts:
            nw, ml, af, sr, sh = _gopher_metrics(t)
            n_words_c.append(nw)
            mean_len_c.append(ml)
            alpha_c.append(af)
            sym_c.append(sr)
            stop_c.append(sh)
        nw_arr = pa.array(n_words_c, pa.int64())
        ml_arr = pa.array(mean_len_c, pa.float64())
        al_arr = pa.array(alpha_c, pa.float64())
        sy_arr = pa.array(sym_c, pa.float64())
        st_arr = pa.array(stop_c, pa.int64())
        p_wc = [(_GOPHER_MIN_WORDS <= n <= _GOPHER_MAX_WORDS) for n in n_words_c]
        p_ml = [(3.0 <= m <= 10.0) for m in mean_len_c]
        p_al = [a > 0.8 for a in alpha_c]
        p_sy = [s <= 0.1 for s in sym_c]
        p_st = [s >= 2 for s in stop_c]
        passed = [all(f) for f in zip(p_wc, p_ml, p_al, p_sy, p_st)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": nw_arr,
                "mean_word_len": ml_arr,
                "alpha_frac": al_arr,
                "symbol_ratio": sy_arr,
                "stop_hits": st_arr,
                "pass_word_count": pa.array(p_wc, pa.bool_()),
                "pass_mean_len": pa.array(p_ml, pa.bool_()),
                "pass_alpha": pa.array(p_al, pa.bool_()),
                "pass_symbols": pa.array(p_sy, pa.bool_()),
                "pass_stops": pa.array(p_st, pa.bool_()),
                "passed": pa.array(passed, pa.bool_()),
            }
        )

    return _docs(sf_dir).map_batches(g, batch_format="pyarrow")


# C4-style badword blocklist, drawn from the synthetic vocabulary so
# the filter exercises real hit paths at every sf (Raffel et al. 2020
# filter docs containing any term of a public blocklist).
_BLOCKLIST = frozenset(("spark", "dup", "slow"))


def blocklist_hits(sf_dir: str) -> "ray.data.Dataset":
    """C4-style blocklist filter audit: per document, total blocked-term
    occurrences, distinct blocked terms, and the drop decision
    (``blocked`` = any hit). Matching is token-exact (the ``[a-z0-9]+``
    lowercase tokenizer shared with the n-gram family), not substring —
    'duplicate' does not hit 'dup'.

    Ray shape: stateless vectorized pass with the (tiny, constant)
    blocklist compiled per process; no shuffle. At 100 TB the list
    rides the closure (or ``ray.put`` for large lists) — never re-read
    per batch.
    """

    def b(batch: pa.Table) -> pa.Table:
        hits_c, terms_c = [], []
        for t in batch.column("text").to_pylist():
            toks = _TERM.findall((t or "").lower())
            hits_c.append(sum(1 for w in toks if w in _BLOCKLIST))
            terms_c.append(len(_BLOCKLIST.intersection(toks)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_hits": pa.array(hits_c, pa.int64()),
                "n_terms": pa.array(terms_c, pa.int64()),
                "blocked": pa.array([h > 0 for h in hits_c], pa.bool_()),
            }
        )

    return _docs(sf_dir).map_batches(b, batch_format="pyarrow")


def ttr_scores(sf_dir: str) -> "ray.data.Dataset":
    """Type-token ratio per document (lexical-diversity quality facet:
    template/boilerplate spam has few types per token, prose is high):
    ``(doc_id, n_tokens, n_types, ttr)`` over the shared ``[a-z0-9]+``
    lowercase tokenizer. One stateless vectorized pass, no shuffle;
    ttr is a single IEEE division mirrored by the oracle."""

    def ttr(batch: pa.Table) -> pa.Table:
        n_tok, n_typ = [], []
        for t in batch.column("text").to_pylist():
            toks = _TERM.findall((t or "").lower())
            n_tok.append(len(toks))
            n_typ.append(len(set(toks)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_types": pa.array(n_typ, pa.int64()),
                "ttr": pa.array(
                    [ty / to if to else 0.0 for ty, to in zip(n_typ, n_tok)],
                    pa.float64(),
                ),
            }
        )

    return _docs(sf_dir).map_batches(ttr, batch_format="pyarrow")


def pii_rates_by_source(sf_dir: str) -> pa.Table:
    """Per-source PII scrub dashboard: doc counts, docs containing any
    PII hit, total redaction count and the doc-level PII rate — the
    rollup an operator reads after ``redact_pii`` runs over a crawl.

    Distributed shape: one column-pruned pass reusing the redact_pii
    RE2 count kernels (pyarrow.compute, zero Python per row), reduced
    in-batch to per-source partials; the driver stream-merges the
    domain-bounded partial tables (sources are a small fixed domain —
    the item_cooccurrence/profile_tables precedent), so there is no
    shuffle at all."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        a = pc.fill_null(batch.column("text"), "")
        n = None
        for pat, _ in _PII_PATTERNS:
            c = pc.count_substring_regex(a, pat)
            n = c if n is None else pc.add(n, c)
        tbl = pa.table(
            {
                "source": batch.column("source"),
                "n_red": pc.cast(n, pa.int64()),
            }
        )
        srcs = tbl.column("source").to_pylist()
        reds = tbl.column("n_red").to_pylist()
        agg: dict[str, list[int]] = {}
        for s, r in zip(srcs, reds):
            e = agg.setdefault(s, [0, 0, 0])
            e[0] += 1
            e[1] += 1 if r > 0 else 0
            e[2] += r
        keys = sorted(agg)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "docs_with_pii": pa.array([agg[k][1] for k in keys], pa.int64()),
                "n_redactions": pa.array([agg[k][2] for k in keys], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).map_batches(partial, batch_format="pyarrow")
    merged: dict[str, list[int]] = {}
    for t in ray.get(ds.to_arrow_refs()):
        for s, nd, dp, nr in zip(
            t.column("source").to_pylist(),
            t.column("n_docs").to_pylist(),
            t.column("docs_with_pii").to_pylist(),
            t.column("n_redactions").to_pylist(),
        ):
            e = merged.setdefault(s, [0, 0, 0])
            e[0] += nd
            e[1] += dp
            e[2] += nr
    keys = sorted(merged)
    return pa.table(
        {
            "source": pa.array(keys, pa.string()),
            "n_docs": pa.array([merged[k][0] for k in keys], pa.int64()),
            "docs_with_pii": pa.array([merged[k][1] for k in keys], pa.int64()),
            "n_redactions": pa.array([merged[k][2] for k in keys], pa.int64()),
            "pii_rate": pa.array(
                [merged[k][1] / merged[k][0] for k in keys], pa.float64()
            ),
        }
    )


# Content-defined chunking divisor: a cut falls after every Karp-Rabin
# 8-gram whose hash ≡ 0 (mod 64) — expected chunk length 64 normalized
# chars (LBFS/FastCDC gear at its simplest setting, public algorithm).
# Reuses the winnow constants so the SQL oracle reuses the winnow CTE.
CDC_DIVISOR = 64

# cdc_chunks feeds both its own query and cdc_dup_chunks' rollup;
# memoize the materialized chunk dataset per corpus (_FP_CACHE pattern)
_CDC_CACHE: dict[str, "ray.data.Dataset"] = {}


def cdc_chunks(sf_dir: str) -> "ray.data.Dataset":
    """Content-defined chunking for storage-level dedup: per document,
    chunks cut where the rolling Karp-Rabin 8-gram hash of the
    dedup-normalized text ≡ 0 (mod ``CDC_DIVISOR``) — boundaries move
    WITH the content, so an insertion only re-chunks its neighborhood
    (the LBFS/FastCDC property fixed-size chunking lacks). Output:
    ``(doc_id, chunk_idx, start, len, chunk_hash)`` with 1-based char
    positions in the normalized text; docs shorter than the gram width
    become one whole-doc chunk; empty docs emit nothing.

    Ray shape: one stateless vectorized pass (the winnow hash kernel:
    windowed dot against the power vector), no shuffle; output is
    O(n_chars / DIVISOR) rows per doc. Chunk hashes then feed the
    hash-keyed dedup rollup exactly like the n-gram postings ops.
    """
    ds = _CDC_CACHE.get(sf_dir)
    if ds is not None:
        return ds

    def chunks(batch: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view

        ids, idxs, starts, lens, hashes = [], [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            s = normalize_text(t)
            L = len(s)
            if L == 0:
                continue
            if L < WINNOW_K:
                ends = [L]
            else:
                cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                H = (sliding_window_view(cp, WINNOW_K) @ _KR_POW) % _KR_MOD
                # gram at 0-based index j ends at 1-based char j + K
                ends = (np.nonzero(H % CDC_DIVISOR == 0)[0] + WINNOW_K).tolist()
                if not ends or ends[-1] != L:
                    ends.append(L)
            prev = 0
            for ci, e in enumerate(ends, 1):
                ids.append(d)
                idxs.append(ci)
                starts.append(prev + 1)
                lens.append(e - prev)
                hashes.append(md5_hex(s[prev:e]))
                prev = e
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "start": pa.array(starts, pa.int64()),
                "len": pa.array(lens, pa.int64()),
                "chunk_hash": pa.array(hashes, pa.string()),
            }
        )

    ds = _docs(sf_dir).map_batches(chunks, batch_format="pyarrow").materialize()
    _CDC_CACHE[sf_dir] = ds
    return ds


def cdc_dup_chunks(sf_dir: str) -> pa.Table:
    """Storage-dedup payoff view: every CDC chunk hash present in >= 2
    distinct documents, with doc- and occurrence-counts — what a
    chunk-store would actually deduplicate. Same plan as
    ``dup_ngram_spans``: in-batch np.unique combiner over the memoized
    chunk table, then ONE hash-keyed groupby + the >=2-docs filter."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "chunk_hash": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_occ": pa.array([], pa.int64()),
                }
            )
        from collections import Counter

        hs = batch.column("chunk_hash").to_pylist()
        dids = batch.column("doc_id").to_pylist()
        occ = Counter(hs)
        docs = Counter(h for _, h in set(zip(dids, hs)))
        keys = sorted(docs)
        return pa.table(
            {
                "chunk_hash": pa.array(keys, pa.string()),
                "n_docs": pa.array([docs[h] for h in keys], pa.int64()),
                "n_occ": pa.array([occ[h] for h in keys], pa.int64()),
            }
        )

    agg = (
        cdc_chunks(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("chunk_hash")
        .sum(["n_docs", "n_occ"])
    )
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "chunk_hash": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_occ": pa.array([], pa.int64()),
        }
    )
    if not tables:
        return empty
    tbl = pa.concat_tables(tables)
    nd = tbl.column("sum(n_docs)").to_numpy(zero_copy_only=False)
    keep = nd >= 2
    if not keep.any():
        return empty
    return pa.table(
        {
            "chunk_hash": pa.array(
                np.asarray(tbl.column("chunk_hash").to_pylist(), object)[keep],
                pa.string(),
            ),
            "n_docs": pa.array(nd[keep].astype(np.int64), pa.int64()),
            "n_occ": pa.array(
                tbl.column("sum(n_occ)").to_numpy(zero_copy_only=False)[keep].astype(
                    np.int64
                ),
                pa.int64(),
            ),
        }
    ).sort_by([("chunk_hash", "ascending")])


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, fp): md5 of the dedup-normalized text."""

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(
                    [md5_hex(normalize_text(t)) for t in batch.column("text").to_pylist()]
                ),
            }
        )

    return _docs(sf_dir).map_batches(fp, batch_format="pyarrow")


# Karp-Rabin winnowing parameters (Schleimer et al., SIGMOD'03 — the
# MOSS local fingerprinting algorithm). K/W=8 gives the standard
# guarantee: any shared substring of >= W+K-1 = 15 normalized chars is
# caught by at least one shared fingerprint. B/M are fixed so the
# polynomial is reproducible as an unrolled BIGINT expression in the
# DuckDB oracle (terms <= 0x10FFFF * (M-1) * K < 2^63: no overflow on
# either side).
WINNOW_K = 8
WINNOW_W = 8
_KR_BASE = 257
_KR_MOD = 1_000_000_007
_KR_POW = np.array(
    [pow(_KR_BASE, WINNOW_K - 1 - j, _KR_MOD) for j in range(WINNOW_K)], np.int64
)


def winnow_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, pos, h): winnowed Karp-Rabin k-gram fingerprints.

    Per document: dedup-normalize (lower / collapse ws / trim — the
    same ``normalize_text`` the md5 fingerprints use), hash every
    K-char gram with the Karp-Rabin polynomial
    ``sum(cp[p+j] * B^(K-1-j)) mod M`` (the rolling-recurrence hash in
    its windowed-dot form), then select the rightmost-minimum hash of
    every W-consecutive-gram window (robust winnowing). Documents with
    fewer than W grams contribute their single overall rightmost min;
    documents shorter than K chars contribute nothing. ``pos`` is the
    1-based gram start in the normalized text.

    Ray shape: one stateless vectorized map over ``documents`` — no
    shuffle; output is O(n_chars / W) rows per doc. At 100 TB this is
    the fingerprint-extraction pass of a MOSS-style overlap pipeline;
    selected prints then feed a (h)-keyed groupby exactly like the
    n-gram postings ops.
    """

    def wf(batch: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view

        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_d: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        for d, t in zip(doc_ids, batch.column("text").to_pylist()):
            s = normalize_text(t)
            if len(s) < WINNOW_K:
                continue
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            H = (sliding_window_view(cp, WINNOW_K) @ _KR_POW) % _KR_MOD
            n = H.shape[0]
            if n <= WINNOW_W:
                # single window over all grams; argmin of the reversed
                # view picks the RIGHTMOST minimum
                sel = np.array([n - 1 - int(np.argmin(H[::-1]))])
            else:
                win = sliding_window_view(H, WINNOW_W)
                idx = WINNOW_W - 1 - np.argmin(win[:, ::-1], axis=1)
                sel = np.unique(np.arange(win.shape[0]) + idx)
            out_d.append(np.full(sel.shape[0], d, np.int64))
            out_p.append(sel + 1)
            out_h.append(H[sel])
        if not out_d:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d)),
                "pos": pa.array(np.concatenate(out_p)),
                "h": pa.array(np.concatenate(out_h)),
            }
        )

    return _docs(sf_dir).map_batches(wf, batch_format="pyarrow")


def fingerprint_matches(
    sf_dir: str, max_df: int = 8, min_shared: int = 2, n_buckets: int = 64
) -> pa.Table:
    """MOSS overlap detection over the winnowed fingerprints: pairs of
    documents sharing >= ``min_shared`` RARE winnowed prints, where
    rare means document frequency <= ``max_df`` (high-df prints are
    boilerplate by definition — dropping them is part of the MATCH
    SEMANTICS, mirrored exactly by the SQL oracle, not a lossy cap).

    The df filter doubles as the hot-posting bound: every surviving
    posting list has <= max_df members, so per-bucket pair emission is
    O(max_df^2) by construction — no truncation caveat anywhere.

    Ray shape: the winnow_fingerprints map (no shuffle) -> per-batch
    distinct (doc_id, h) prints with an h-hash ``bucket`` column ->
    ONE bucket-keyed groupby (B group calls, not n_h) whose kernel
    segments by h, applies the df filter, emits triu pairs and
    combines (doc_a, doc_b) in-kernel -> one pair-keyed groupby sum
    (pair domain, unbounded at corpus scale — stays a Dataset
    shuffle) -> driver HAVING filter on the reduced aggregate.
    """

    def prints(batch: pa.Table) -> pa.Table:
        # a document's winnow rows are emitted inside one batch, so
        # in-batch distinct (doc_id, h) is globally distinct
        g = pa.TableGroupBy(batch.select(["doc_id", "h"]), ["doc_id", "h"]).aggregate([])
        b = (
            np.asarray(g.column("h"), dtype=np.int64) % n_buckets
        )
        return g.append_column("bucket", pa.array(b, pa.int64()))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
        h = np.asarray(group.column("h"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(h) != 0]))
        ends = np.append(starts[1:], len(h))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            if not 2 <= e - s <= max_df:
                continue
            ds_ = d[s:e]
            ia, ib = np.triu_indices(len(ds_), 1)
            out_a.append(ds_[ia])
            out_b.append(ds_[ib])
        if not out_a:
            return empty
        t = pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
                "n_shared": pa.array(
                    np.ones(sum(len(a) for a in out_a), np.int64), pa.int64()
                ),
            }
        )
        g = pa.TableGroupBy(t, ["doc_a", "doc_b"]).aggregate([("n_shared", "sum")])
        return g.rename_columns(["doc_a", "doc_b", "n_shared"])

    agg = (
        winnow_fingerprints(sf_dir)
        .map_batches(prints, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .sum("n_shared")
    )
    import ray

    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
    tbl = pa.concat_tables(tables)
    n = tbl.column("sum(n_shared)").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = n >= min_shared
    return pa.table(
        {
            "doc_a": pa.array(
                tbl.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)[keep],
                pa.int64(),
            ),
            "doc_b": pa.array(
                tbl.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)[keep],
                pa.int64(),
            ),
            "n_shared": pa.array(n[keep], pa.int64()),
        }
    ).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def text_normalize(sf_dir: str) -> "ray.data.Dataset":
    """Reference M4 token normalization applied corpus-wide.

    Exposes ops.textops.norm_text (/root/reference/app/ocr_engine.py:374-379
    semantics) as a driver-verifiable stateless map: the DuckDB oracle is
    the identical replace()/regexp_replace chain.
    """
    from ..ops.textops import norm_text

    def nt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm": pa.array(
                    [norm_text(t) for t in batch.column("text").to_pylist()], pa.string()
                ),
            }
        )

    return _docs(sf_dir).map_batches(nt, batch_format="pyarrow")


_CJK = re.compile("[一-鿿]")


def _predict_langs(texts: list) -> list[str]:
    """The heuristic language-id kernel (stopword votes + CJK script
    check) shared by ``lang_id`` and ``lang_mismatch`` — one definition
    of the prediction, CASE-chain-argmax tie order preserved."""
    preds = []
    for t in texts:
        t = t or ""
        if _CJK.search(t):
            preds.append("zh")
            continue
        words = set(w for w in _WS_SPLIT.split(t.lower()) if w)
        best, best_n = "en", -1
        for lang, markers in _LANG_MARKERS.items():
            n = sum(1 for m in markers if m in words)
            if n > best_n:
                best, best_n = lang, n
        preds.append(best)
    return preds


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    """Heuristic language id: stopword votes + script ranges.

    SQL-oracled: distinct-marker votes per language + a CASE-chain argmax
    with first-language-wins ties (matching the dict iteration order).
    """

    def lid(batch: pa.Table) -> pa.Table:
        preds = _predict_langs(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds)})

    return _docs(sf_dir).map_batches(lid, batch_format="pyarrow")


def lang_mismatch(sf_dir: str) -> pa.Table:
    """LABEL-NOISE detection: documents whose declared ``lang`` column
    disagrees with the heuristic language-id prediction — the
    mislabeled-metadata audit every curation pipeline runs before
    trusting per-language sampling weights. One streaming pass (doc_id,
    text, lang -> predict -> filter), no shuffle; emits (doc_id, lang,
    lang_pred) for the disagreements only."""

    def mm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "lang": pa.array([], pa.string()),
                 "lang_pred": pa.array([], pa.string())}
            )
        preds = _predict_langs(batch.column("text").to_pylist())
        langs = batch.column("lang").to_pylist()
        mask = pa.array([p != l for p, l in zip(preds, langs)])
        kept = batch.filter(mask)
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "lang": kept.column("lang"),
                "lang_pred": pa.array(
                    [p for p, l in zip(preds, langs) if p != l], pa.string()
                ),
            }
        )

    out = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(mm, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "lang": pa.array([], pa.string()),
             "lang_pred": pa.array([], pa.string())}
        )
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


# PII-style pattern redaction: pyarrow.compute's replace_substring_regex
# is RE2 — the same engine DuckDB's regexp_replace uses, so patterns
# behave identically on both sides and the oracle is exact.
_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3,4}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, redacted, n_redactions): emails / phone-ish numbers /
    IPv4 literals replaced with typed placeholders — the standard
    pre-training scrub pass, fully vectorized (pyarrow.compute RE2
    kernels, zero Python per row) and oracle-exact (DuckDB shares the
    RE2 engine)."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        a = pc.fill_null(batch.column("text"), "")
        n = None
        for pat, _ in _PII_PATTERNS:
            c = pc.count_substring_regex(a, pat)
            n = c if n is None else pc.add(n, c)
        for pat, repl in _PII_PATTERNS:
            a = pc.replace_substring_regex(a, pat, repl)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "redacted": a,
                "n_redactions": pc.cast(n, pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(scrub, batch_format="pyarrow")


def chunk_documents(
    sf_dir: str, chunk_words: int = 64, stride_words: int = 48
) -> pa.Table:
    """Sliding-window document chunking: each doc -> overlapping chunks
    of ``chunk_words`` whitespace tokens every ``stride_words`` — the
    flat_map (one row -> many rows) shape every context-window training
    pipeline needs. Chunk boundaries are a pure function of the word
    sequence, so the SQL oracle slices identically."""

    def chunks(batch: pa.Table) -> pa.Table:
        ids, idxs, texts, n_words = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            # oracle-matching word list: ASCII-ws collapse + Zs trim +
            # split on the single space (bare .split() would also split
            # on unicode whitespace RE2 does not treat as \s)
            from .hashing import _ZS

            norm = _WS_SPLIT.sub(" ", text or "").strip(_ZS)
            words = [w for w in norm.split(" ")] if norm and norm.split(" ")[0] else []
            if not words:
                continue
            i = 0
            ci = 0
            while True:
                piece = words[i : i + chunk_words]
                ids.append(doc_id)
                idxs.append(ci)
                texts.append(" ".join(piece))
                n_words.append(len(piece))
                if i + chunk_words >= len(words):
                    break
                i += stride_words
                ci += 1
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk": pa.array(texts, pa.string()),
                "n_words": pa.array(n_words, pa.int64()),
            }
        )

    import ray

    out = _docs(sf_dir).map_batches(chunks, batch_format="pyarrow")
    # drop zero-row blocks: empty read splits pass through with the
    # INPUT schema and break a naive concat
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tables) if tables else pa.table(
        {"doc_id": pa.array([], pa.int64()), "chunk_idx": pa.array([], pa.int64()),
         "chunk": pa.array([], pa.string()), "n_words": pa.array([], pa.int64())}
    )
    return tbl.sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])


def benchmark_contamination(
    sf_dir: str, n_benchmark: int = 5, shingle_k: int = 13
) -> pa.Table:
    """Decontamination check: flag corpus docs sharing any ``shingle_k``-
    word shingle with the 'benchmark' set (here: doc_id < n_benchmark,
    standing in for an eval suite). The canonical two-pass shape:

      1. benchmark shingle set built once from the tiny benchmark slice
         and BROADCAST (``ray.put``) — eval suites are small by nature
      2. the corpus streams through a vectorized any-hit membership
         check — no shuffle, no join

    13-gram overlap is the published decontamination heuristic (GPT-3
    appendix-style); integer hit counts keep the oracle exact.
    """
    import pyarrow.compute as pc
    import ray

    from .hashing import shingles

    bench = (
        _docs(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.less(t.column("doc_id"), n_benchmark)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    bench_shingles = set()
    for _, row in bench.iterrows():
        bench_shingles.update(shingles(row["text"], shingle_k))
    bench_ref = ray.put(frozenset(bench_shingles))

    def check(batch: pa.Table) -> pa.Table:
        bs = ray.get(bench_ref)
        ids, hits = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = set(shingles(text, shingle_k))
            ids.append(doc_id)
            hits.append(len(sh & bs))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_contaminated_shingles": pa.array(hits, pa.int64()),
            }
        )

    out = _docs(sf_dir).map_batches(check, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tables) if tables else pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_contaminated_shingles": pa.array([], pa.int64())}
    )
    return tbl.sort_by([("doc_id", "ascending")])


def heavy_hitter_tokens(
    sf_dir: str, phi: float = 0.001, k: int | None = None
) -> pa.Table:
    """Corpus heavy hitters: every word whose occurrence count is
    >= ceil(phi * N), N = total word occurrences — EXACT, by the
    sketch-then-verify plan (the frequent-items workhorse of corpus
    curation: stopword discovery, boilerplate token detection).

      pass 1 (sketch): each block compresses its exact word histogram
        to a k-counter Misra-Gries summary (np.unique, fully
        vectorized; subtract the (k+1)-th largest count, keep
        positives — per-block undercount <= block_tokens/(k+1)).
        Summaries are merged DISTRIBUTEDLY by groupby(word).sum —
        counter addition is the mergeable-summaries property, so the
        shuffle moves <= k rows per block, never the vocabulary.
      pass 2 (verify): candidates = words whose merged sketch count
        clears phi*N - N/(k+1) (a SUPERSET of the true heavy set, by
        the summed undercount bound); broadcast them (<= ~2/phi words
        by mass conservation) and take exact partial counts per block,
        then a tiny groupby + threshold.

    The sketch only prunes — pass 2 counts are exact — so the result
    is hash-identical to the brute GROUP BY ... HAVING oracle. k
    defaults to ceil(2/phi); pass a small k in tests to force the
    compression path.
    """
    import math

    import numpy as np
    import ray

    from .hashing import split_words

    if k is None:
        k = math.ceil(2.0 / phi)

    def mg_summary(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for text in batch.column("text").to_pylist():
            words.extend(split_words(text))
        n_tok = len(words)
        if n_tok:
            uniq, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
            if len(uniq) > k:
                cut = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
                adj = counts - cut
                keep = adj > 0
                uniq, counts = uniq[keep], adj[keep]
        else:
            uniq, counts = np.array([], dtype=object), np.array([], np.int64)
        # empty-string sentinel row carries the block's token total
        # (split_words filters empties, so the key can't collide with a
        # real word; null would break Ray's sort-based shuffle)
        return pa.table(
            {
                "word": pa.array(list(uniq) + [""], pa.string()),
                "cnt": pa.array(list(counts.astype(np.int64)) + [n_tok], pa.int64()),
            }
        )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    merged = (
        docs.map_batches(mg_summary, batch_format="pyarrow")
        .groupby("word")
        .sum("cnt")
        .materialize()  # <= k rows/block merged; tiny, read twice below
    )
    parts = [t for t in ray.get(merged.to_arrow_refs()) if t.num_rows]
    sketch = pa.concat_tables(parts)
    words_list = sketch.column("word").to_pylist()
    cnt_col = sketch.column("sum(cnt)").to_numpy(zero_copy_only=False)
    null_mask = np.asarray([w == "" for w in words_list])
    n_total = int(cnt_col[null_mask].sum())
    if n_total == 0:
        return pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    threshold = math.ceil(phi * n_total)
    cand_floor = threshold - n_total // (k + 1) - 1  # superset bound
    cand_mask = (~null_mask) & (cnt_col >= max(cand_floor, 1))
    candidates = frozenset(w for w, m in zip(words_list, cand_mask) if m)
    cand_ref = ray.put(candidates)

    def exact_partial(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        hits: list[str] = []
        for text in batch.column("text").to_pylist():
            hits.extend(w for w in split_words(text) if w in cand)
        if not hits:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(hits, dtype=object), return_counts=True)
        return pa.table(
            {
                "word": pa.array(list(uniq), pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    exact = docs.map_batches(exact_partial, batch_format="pyarrow").groupby("word").sum("n")
    parts = [t for t in ray.get(exact.to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    tbl = pa.concat_tables(parts)
    n_arr = tbl.column("sum(n)").to_numpy(zero_copy_only=False)
    keep = n_arr >= threshold
    return pa.table(
        {
            "word": pa.array(np.asarray(tbl.column("word").to_pylist(), object)[keep], pa.string()),
            "n": pa.array(n_arr[keep].astype(np.int64), pa.int64()),
        }
    ).sort_by([("word", "ascending")])


def repetition_scores(sf_dir: str) -> pa.Table:
    """Per-doc inner-repetition signal (the Gopher-rule family): over
    the doc's word bigrams, the distinct-bigram count, total bigram
    occurrences, and occurrences belonging to a repeated bigram —
    integer-exact, so the quality-filter thresholds downstream are
    reproducible. Docs with < 2 words have no bigrams and are omitted
    (mirrors the oracle's WHERE).

    Stateless vectorized map — no shuffle; per-doc np.unique over the
    bigram array does the counting.
    """
    import numpy as np

    from .hashing import split_words

    def rep(batch: pa.Table) -> pa.Table:
        ids, nd, nb, ndup = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            words = split_words(text)
            if len(words) < 2:
                continue
            grams = np.asarray(
                [f"{a} {b}" for a, b in zip(words, words[1:])], dtype=object
            )
            _, counts = np.unique(grams, return_counts=True)
            ids.append(doc_id)
            nd.append(len(counts))
            nb.append(int(counts.sum()))
            ndup.append(int(counts[counts > 1].sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_distinct_bigrams": pa.array(nd, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "n_dup_occurrences": pa.array(ndup, pa.int64()),
            }
        )

    out = _docs(sf_dir).map_batches(rep, batch_format="pyarrow")
    import ray

    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def bigram_counts(sf_dir: str, min_count: int = 5) -> pa.Table:
    """Corpus n-gram LM count table: every word bigram with total
    occurrence count >= ``min_count`` — the count-collection pass of
    n-gram language-model training / boilerplate mining.

    Ray shape: per-block partial bigram counts (np.unique inside the
    batch — the combiner bounds the shuffle at distinct-bigrams-per-
    block, not token count), then groupby(bigram).sum and the HAVING
    filter. The bigram-vocabulary shuffle is the honest cost of an LM
    count build; at 100 TB shard it by bigram hash (Ray's sort-based
    groupby already range-partitions the key).
    """
    import numpy as np
    import ray

    from .hashing import split_words

    def partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for text in batch.column("text").to_pylist():
            words = split_words(text)
            grams.extend(f"{a} {b}" for a, b in zip(words, words[1:]))
        if not grams:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(list(uniq), pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("n")
    )
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(tables)
    n_arr = tbl.column("sum(n)").to_numpy(zero_copy_only=False)
    keep = n_arr >= min_count
    return pa.table(
        {
            "bigram": pa.array(
                np.asarray(tbl.column("bigram").to_pylist(), object)[keep], pa.string()
            ),
            "n": pa.array(n_arr[keep].astype(np.int64), pa.int64()),
        }
    ).sort_by([("bigram", "ascending")])


_TERM = re.compile(r"[a-z0-9]+")


def distinctive_terms(sf_dir: str, top_k: int = 3) -> pa.Table:
    """Per-doc top-``top_k`` distinctive terms — the exact-integer core
    of TF-IDF feature extraction. Terms are ranked by (tf DESC,
    corpus-df ASC, term ASC): most frequent in the doc, rarest in the
    corpus, lexicographic tie-break — a fully integer-exact ordering
    (no float idf in the ranking, so the DuckDB oracle is hash-exact
    rather than ulp-lucky; a float ``tf*ln((N+1)/(df+1))`` score ranks
    identically whenever df differs and is derivable from the emitted
    (tf, df, N) downstream).

    Distributed shape (two pruned passes over ``documents``):
    1. corpus document-frequency: per-batch partial df counts (each
       doc's DISTINCT terms, vectorized np.unique over the batch
       explode) -> one small groupby(term).sum — the only shuffle, and
       it moves (term, count) partials, never text.
    2. per-doc ranking: df map is broadcast via ``ray.put`` (synthetic
       vocab is tiny; at web scale swap the broadcast for a hash join
       of the exploded (doc, term, tf) table against the df table —
       same downstream ranking, documented trade); each batch scores
       its docs locally with a searchsorted df lookup + lexicographic
       sort, so the per-doc top-k never shuffles either.

    The reference has no term-statistics support (SURVEY.md §2.9).
    """
    from collections import Counter

    def df_partial(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        for text in batch.column("text").to_pylist():
            terms.extend(set(_TERM.findall((text or "").lower())))
        if not terms:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(terms, dtype=object), return_counts=True)
        return pa.table(
            {
                "term": pa.array(list(uniq), pa.string()),
                "df": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("df")
    )
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if tables:
        import pyarrow.compute as pc

        df_tbl = pa.concat_tables(tables)
        order = pc.sort_indices(df_tbl.column("term"))
        terms_sorted = np.asarray(df_tbl.column("term").take(order).to_pylist(), object)
        df_sorted = df_tbl.column("sum(df)").take(order).to_numpy(zero_copy_only=False)
    else:
        terms_sorted = np.asarray([], object)
        df_sorted = np.asarray([], np.int64)
    df_ref = ray.put((terms_sorted, df_sorted))

    def rank(batch: pa.Table) -> pa.Table:
        vocab, dfs = ray.get(df_ref)
        doc_ids, rnks, terms, tfs, out_dfs = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            tf = Counter(_TERM.findall((text or "").lower()))
            if not tf:
                continue
            t_arr = np.asarray(list(tf.keys()), object)
            tf_arr = np.asarray(list(tf.values()), np.int64)
            d_arr = dfs[np.searchsorted(vocab, t_arr)]
            # lexicographic (tf desc, df asc, term asc): last key first
            pick = np.lexsort((t_arr, d_arr, -tf_arr))[:top_k]
            doc_ids.extend([doc_id] * len(pick))
            rnks.extend(range(1, len(pick) + 1))
            terms.extend(t_arr[pick])
            tfs.extend(tf_arr[pick])
            out_dfs.extend(d_arr[pick])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "rnk": pa.array(rnks, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "df": pa.array(out_dfs, pa.int64()),
            }
        )

    out = _docs(sf_dir).map_batches(rank, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    )
    return tbl.sort_by([("doc_id", "ascending"), ("rnk", "ascending")])


# dup_ngram_spans feeds both its own query and dup_doc_fraction's
# broadcast probe; memoize the (small) dup-gram result table per
# (corpus, n) so the family pays for ONE gram shuffle per process
# (the _PAIRS_CACHE / _FP_CACHE pattern).
_DUP_GRAMS_CACHE: dict[tuple, pa.Table] = {}

# Combined-partial row count under which a single driver-side np.unique
# merge replaces the distributed gram-keyed groupby (whose sort shuffle
# has seconds of fixed overhead regardless of size). ~5M rows of
# (gram, int64, int64) is a few hundred MB — well inside driver heap;
# a 100-TB corpus blows past this and takes the shuffle leg.
_DRIVER_MERGE_MAX_ROWS = 5_000_000


def dup_ngram_spans(sf_dir: str, n: int = 8) -> pa.Table:
    cached = _DUP_GRAMS_CACHE.get((sf_dir, n))
    if cached is None:
        cached = _DUP_GRAMS_CACHE[(sf_dir, n)] = _dup_ngram_spans_impl(sf_dir, n)
    return cached


def _dup_ngram_spans_impl(sf_dir: str, n: int) -> pa.Table:
    """Exact duplicated-substring detection: every word ``n``-gram that
    appears in >= 2 distinct documents, with its doc- and
    occurrence-counts — the corpus-level core of exact substring
    deduplication (Lee et al. 2022's "Deduplicating Training Data
    Makes Language Models Better" does this over suffix arrays; at the
    n-gram granularity the distributed plan is a pure combiner).

    Distributed shape: per-batch window explode (tokens -> n-grams,
    vectorized slicing per doc) immediately reduced to per-batch
    (gram, n_docs, n_occ) partials via np.unique — so the one shuffle
    moves gram partials, never document text — then groupby(gram).sum
    + a distinct-doc>=2 filter. At web scale the gram string would be
    a 128-bit hash with an optional verify pass (same plan, smaller
    keys); here the literal gram keeps the DuckDB oracle exact.
    """

    def partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        doc_grams: list[str] = []  # distinct within doc for n_docs partials
        for text in batch.column("text").to_pylist():
            toks = _TERM.findall((text or "").lower())
            if len(toks) < n:
                continue
            local = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            grams.extend(local)
            doc_grams.extend(set(local))
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_occ": pa.array([], pa.int64()),
            }
        )
        if not grams:
            return empty
        occ_u, occ_c = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        doc_u, doc_c = np.unique(np.asarray(doc_grams, dtype=object), return_counts=True)
        # occ_u is a superset-equal key set of doc_u (same grams)
        occ = dict(zip(occ_u, occ_c))
        return pa.table(
            {
                "gram": pa.array(list(doc_u), pa.string()),
                "n_docs": pa.array(doc_c.astype(np.int64), pa.int64()),
                "n_occ": pa.array([int(occ[g]) for g in doc_u], pa.int64()),
            }
        )

    partials = [
        t
        for t in ray.get(
            _docs(sf_dir).map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.table(
        {
            "gram": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_occ": pa.array([], pa.int64()),
        }
    )
    if not partials:
        return empty
    tbl = pa.concat_tables(partials)
    if tbl.num_rows <= _DRIVER_MERGE_MAX_ROWS:
        # Small-side fast path: the per-batch-combined partials fit the
        # driver comfortably, and Ray's sort-based groupby costs ~8s of
        # fixed shuffle overhead on a table this small. One vectorized
        # np.unique merge replaces the shuffle; past the threshold the
        # distributed gram-keyed groupby below is the same plan at scale.
        grams = np.asarray(tbl.column("gram").to_pylist(), dtype=object)
        u, inv = np.unique(grams, return_inverse=True)
        nd_s = np.zeros(len(u), np.int64)
        np.add.at(nd_s, inv, tbl.column("n_docs").to_numpy(zero_copy_only=False))
        no_s = np.zeros(len(u), np.int64)
        np.add.at(no_s, inv, tbl.column("n_occ").to_numpy(zero_copy_only=False))
        keep = nd_s >= 2
        return pa.table(
            {
                "gram": pa.array(u[keep], pa.string()),
                "n_docs": pa.array(nd_s[keep], pa.int64()),
                "n_occ": pa.array(no_s[keep], pa.int64()),
            }
        ).sort_by([("gram", "ascending")])
    agg = (
        ray.data.from_arrow(partials)
        .groupby("gram")
        .sum(["n_docs", "n_occ"])
    )
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    tbl = pa.concat_tables(tables)
    nd = tbl.column("sum(n_docs)").to_numpy(zero_copy_only=False)
    keep = nd >= 2
    return pa.table(
        {
            "gram": pa.array(
                np.asarray(tbl.column("gram").to_pylist(), object)[keep], pa.string()
            ),
            "n_docs": pa.array(nd[keep].astype(np.int64), pa.int64()),
            "n_occ": pa.array(
                tbl.column("sum(n_occ)").to_numpy(zero_copy_only=False)[keep].astype(np.int64),
                pa.int64(),
            ),
        }
    ).sort_by([("gram", "ascending")])


def dup_doc_fraction(sf_dir: str, n: int = 8) -> pa.Table:
    """Per-document duplicated-text fraction: of a doc's word
    ``n``-gram positions, the share whose gram occurs in >= 2 distinct
    documents — the doc-grain rollup Lee et al. 2022 use to decide
    which documents exact-substring dedup actually touches. Docs with
    fewer than ``n`` tokens carry no grams and are excluded (division
    by zero has no meaning for them).

    Distributed shape: the corpus-level dup-gram table comes from the
    ``dup_ngram_spans`` plan (in-batch np.unique combiner, ONE
    gram-keyed shuffle); its >= 2-docs survivors — O(duplicate rate),
    not O(corpus) — are broadcast once via ``ray.put`` and probed in a
    second stateless pass that re-derives each doc's grams in-batch.
    When the dup-gram side outgrows the broadcast budget at 100 TB the
    same result keeps the plan shape with a gram-keyed shuffle of
    (gram, doc_id, count) partials joined against the survivor set —
    documented fallback, same two-pass cost.
    """
    dup = dup_ngram_spans(sf_dir, n)
    dup_ref = ray.put(frozenset(dup.column("gram").to_pylist()))

    def frac(batch: pa.Table) -> pa.Table:
        dset = ray.get(dup_ref)
        ids, n_grams_c, n_dup_c = [], [], []
        for d, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _TERM.findall((text or "").lower())
            if len(toks) < n:
                continue
            total = len(toks) - n + 1
            dup_pos = sum(
                1
                for j in range(total)
                if " ".join(toks[j:j + n]) in dset
            )
            ids.append(d)
            n_grams_c.append(total)
            n_dup_c.append(dup_pos)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(n_grams_c, pa.int64()),
                "n_dup": pa.array(n_dup_c, pa.int64()),
                "dup_frac": pa.array(
                    [d / t for d, t in zip(n_dup_c, n_grams_c)], pa.float64()
                ),
            }
        )

    tables = [
        t
        for t in ray.get(
            _docs(sf_dir).map_batches(frac, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "n_dup": pa.array([], pa.int64()),
                "dup_frac": pa.array([], pa.float64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def dedup_clean_docs(sf_dir: str, n: int = 8) -> pa.Table:
    """Exact-substring dedup with the REMOVAL applied (Lee et al. 2022's
    actionable output): every token covered by any corpus-duplicated
    word ``n``-gram window is cut, and the survivors re-join to the
    cleaned document. Output ``(doc_id, clean_text, n_removed,
    n_tokens)`` for EVERY document (cleaning operates on the lowercase
    ``[a-z0-9]+`` token stream — the same normalization the dup-gram
    table is built on; docs with < ``n`` tokens carry no windows and
    pass through unchanged).

    Distributed shape: the memoized ``dup_ngram_spans`` table (ONE
    gram shuffle per process, shared with ``dup_doc_fraction``) is
    broadcast once; the cleaning pass is stateless and vectorized per
    batch — overlapping dup windows merge via a per-doc boolean
    coverage mask, not interval arithmetic. Same broadcast-budget
    posture and gram-keyed-shuffle fallback as ``dup_doc_fraction``.
    """
    dup = dup_ngram_spans(sf_dir, n)
    dup_ref = ray.put(frozenset(dup.column("gram").to_pylist()))

    def clean(batch: pa.Table) -> pa.Table:
        dset = ray.get(dup_ref)
        ids, texts_out, removed, ntoks = [], [], [], []
        for d, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _TERM.findall((text or "").lower())
            L = len(toks)
            cov = np.zeros(L, dtype=bool)
            if L >= n:
                for j in range(L - n + 1):
                    if " ".join(toks[j:j + n]) in dset:
                        cov[j:j + n] = True
            ids.append(d)
            texts_out.append(" ".join(t for t, c in zip(toks, cov) if not c))
            removed.append(int(cov.sum()))
            ntoks.append(L)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": pa.array(texts_out, pa.string()),
                "n_removed": pa.array(removed, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
            }
        )

    tables = [
        t
        for t in ray.get(
            _docs(sf_dir).map_batches(clean, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_removed": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


# trained merge tables shared by bpe_vocab / bpe_encode (the process-
# cache pattern of _PAIRS_CACHE / _FP_CACHE: per-query timings are only
# meaningful for the FIRST query of the family in a process)
_BPE_CACHE: dict = {}


def bpe_vocab(sf_dir: str, n_merges: int = 10) -> pa.Table:
    cached = _BPE_CACHE.get((sf_dir, n_merges))
    if cached is not None:
        return cached
    out = _bpe_vocab_impl(sf_dir, n_merges)
    _BPE_CACHE[(sf_dir, n_merges)] = out
    return out


def _bpe_vocab_impl(sf_dir: str, n_merges: int = 10) -> pa.Table:
    """Distributed BPE tokenizer training (the merge-table core of
    Sennrich et al. 2016): learn ``n_merges`` byte-pair merges over
    the corpus word distribution, deterministic tie-break
    (count DESC, pair lexicographic ASC).

    Distributed shape: one corpus pass builds the WORD-FREQUENCY table
    via the usual combiner (per-batch np.unique + groupby(word).sum) —
    after that every BPE iteration runs over the word-type table, not
    the corpus: map_batches emits IN-BLOCK-REDUCED (pair, weighted
    count) partials from each word's current symbol sequence, the
    driver merges the domain-sized partials (distinct pairs are
    bounded by the symbol vocabulary — no Dataset groupby needed per
    iteration) and picks the global argmax (broadcast as the next
    merge rule), and a vectorized map applies the merge to the symbol
    sequences. The word-type table is the right unit at web scale (it
    is orders of magnitude smaller than the corpus and shrinks no
    further), and the per-iteration state that moves is ONE merge rule.

    No SQL oracle (iterative global-argmax is not expressible as one
    query); pinned instead by an exact pure-Python reference
    implementation over the same word-frequency table
    (tests/test_analytics.py::TestBpeVocab), the kmeans precedent.
    """

    def word_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # fully Arrow-kernel corpus pass (this is the only stage that
        # touches every byte of the corpus): lower -> regex split on
        # non-token runs -> flatten -> drop boundary empties. Identical
        # to _TERM.findall(text.lower()) per row — split on the
        # complement class yields exactly the [a-z0-9]+ runs plus empty
        # head/tail strings, which the filter removes.
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z0-9]+"
        )
        flat = pc.list_flatten(toks)  # null rows (null text) drop out
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "freq": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(flat)  # in-batch combiner, C++ hash table
        return pa.table(
            {
                "word": vc.field("values"),
                "freq": vc.field("counts").cast(pa.int64()),
            }
        )

    word_freq = (
        _docs(sf_dir)
        .map_batches(word_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("freq")
    )

    # symbol sequences as space-joined strings (Arrow-friendly state)
    def init_syms(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return pa.table(
                {"syms": pa.array([], pa.string()), "freq": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "syms": pa.array(
                    [" ".join(w) for w in batch.column("word").to_pylist()],
                    pa.string(),
                ),
                "freq": pa.array(
                    batch.column("sum(freq)").to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    state = word_freq.map_batches(init_syms, batch_format="pyarrow").materialize()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):

        def pair_partial(batch: pa.Table) -> pa.Table:
            pairs: list[str] = []
            weights: list[int] = []
            freqs = batch.column("freq").to_numpy(zero_copy_only=False)
            for syms, f in zip(batch.column("syms").to_pylist(), freqs):
                parts = syms.split(" ")
                for a, b in zip(parts, parts[1:]):
                    pairs.append(f"{a}\x00{b}")
                    weights.append(int(f))
            if not pairs:
                return pa.table(
                    {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
                )
            arr = np.asarray(pairs, dtype=object)
            uniq, inv = np.unique(arr, return_inverse=True)
            w = np.bincount(inv, weights=np.asarray(weights, np.float64)).astype(np.int64)
            return pa.table(
                {"pair": pa.array(list(uniq), pa.string()), "n": pa.array(w, pa.int64())}
            )

        # partials are already in-block-reduced (np.unique combiner), so
        # the merge is a DRIVER reduction over domain-sized tables —
        # distinct pairs per block, bounded by the symbol vocabulary,
        # never by corpus or word-type count. This replaces a full
        # Dataset groupby per iteration (Ray 2.49's sort-based groupby
        # carries a ~1 s fixed overhead that dominated bpe_vocab's
        # runtime: the customer_order_histogram / profile_tables
        # precedent applies verbatim).
        counts = [
            t
            for t in ray.get(
                state.map_batches(pair_partial, batch_format="pyarrow").to_arrow_refs()
            )
            if t.num_rows
        ]
        if not counts:
            break
        ct = pa.concat_tables(counts)
        pairs_all = np.asarray(ct.column("pair").to_pylist(), dtype=object)
        n_all = ct.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(pairs_all, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, n_all)  # exact int64, order-free
        # global argmax, tie-break lexicographic asc on the pair string
        best_i = np.lexsort((uniq, -sums))[0]
        left, right = uniq[best_i].split("\x00")
        merges.append((left, right, int(sums[best_i])))
        bigram = f"{left} {right}"
        merged = f"{left}{right}"

        def apply_merge(
            batch: pa.Table, left=left, right=right, merged=merged
        ) -> pa.Table:
            # canonical greedy left-to-right non-overlapping merge
            syms = []
            for s in batch.column("syms").to_pylist():
                p = s.split(" ")
                res = []
                i = 0
                while i < len(p):
                    if i < len(p) - 1 and p[i] == left and p[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(p[i])
                        i += 1
                syms.append(" ".join(res))
            return pa.table(
                {"syms": pa.array(syms, pa.string()), "freq": batch.column("freq")}
            )

        state = state.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pa.table(
        {
            "merge_idx": pa.array(np.arange(len(merges), dtype=np.int64)),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


class _BpeEncoder:
    """Actor-pool encode stage: holds the trained merge table (applied
    in training order, greedy left-to-right — the exact inverse-of-
    training contract) plus a word-type memo dict, so each distinct
    word is encoded ONCE per actor lifetime (words follow a Zipf law;
    the memo hit rate is the whole point of warm actors here)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self._merges = [(l, r, l + r) for l, r in merges]
        self._memo: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        hit = self._memo.get(word)
        if hit is not None:
            return hit
        p = list(word)
        for left, right, merged in self._merges:
            if left not in p or right not in p:
                continue
            res = []
            i = 0
            while i < len(p):
                if i < len(p) - 1 and p[i] == left and p[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(p[i])
                    i += 1
            p = res
        n = len(p)
        self._memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_words": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        n_words = np.zeros(batch.num_rows, np.int64)
        n_tokens = np.zeros(batch.num_rows, np.int64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            words = _TERM.findall((text or "").lower())
            n_words[i] = len(words)
            n_tokens[i] = sum(self._encode_len(w) for w in words)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )


def bpe_encode(sf_dir: str, n_merges: int = 10) -> pa.Table:
    """Apply the ``bpe_vocab``-trained tokenizer to the corpus — the
    other half of the tokenizer story (train on the word-type table,
    ENCODE the corpus): per document (doc_id, n_words, n_tokens) where
    n_tokens is the BPE token count under the learned merge table.

    Ray shape: the merge table is tiny (the model), trained once and
    shipped to a ``map_batches`` ACTOR POOL via constructor kwargs —
    state (merge ranks + a word-type encode memo) built once per actor
    in ``__init__``, reused across batches; the corpus streams through
    in one pass with no shuffle at all. No SQL oracle (the merge table
    is iterative); pinned by an exact pure-Python reference encode in
    tests plus compression-bound invariants (chars >= tokens >= words).
    """
    vocab = bpe_vocab(sf_dir, n_merges=n_merges)
    merges = list(
        zip(vocab.column("left").to_pylist(), vocab.column("right").to_pylist())
    )
    out = _docs(sf_dir).map_batches(
        _BpeEncoder,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"merges": merges},
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_words": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def packed_sequences(sf_dir: str, seq_len: int = 2048) -> pa.Table:
    """Sequence packing for LLM pretraining, concat-and-chunk style:
    the corpus token stream (docs concatenated in doc_id order, tokens
    = RE2 ``\\S+``) is cut into fixed ``seq_len`` sequences; each doc
    reports the sequence range it lands in and its offset inside the
    first one. Unlike greedy bin-packing this wastes zero tokens and —
    crucially for the distributed plan — is a PURE PREFIX SUM, not a
    sequential carry.

    Ray shape (the rank-assignment family, see ``value_ntiles``):
    vectorized token-count map -> one range-partition sort on doc_id ->
    a metadata-only pass fetches per-block token SUMS (one scalar per
    block, never values) -> driver prefix over O(blocks) scalars ->
    one vectorized task per block maps local cumsum + block offset to
    (first_seq, last_seq, offset). Nothing corpus-sized ever leaves
    the blocks except the sort itself.
    """
    import ray
    import ray.data

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(
                    [len(_TOKEN.findall(t or "")) for t in texts], pa.int64()
                ),
            }
        )

    refs = (
        _docs(sf_dir)
        .map_batches(counts, batch_format="pyarrow")
        .sort("doc_id")
        .to_arrow_refs()
    )

    @ray.remote
    def block_sum(tbl: pa.Table) -> int:
        if tbl.num_rows == 0 or "n_tokens" not in tbl.column_names:
            return 0
        return int(np.asarray(tbl.column("n_tokens")).sum())

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def assign(tbl: pa.Table, offset: int) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "first_seq": pa.array([], pa.int64()),
                "last_seq": pa.array([], pa.int64()),
                "offset_in_seq": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0 or "doc_id" not in tbl.column_names:
            return empty
        nt = np.asarray(tbl.column("n_tokens"), dtype=np.int64)
        start = offset + np.concatenate([[0], np.cumsum(nt)[:-1]]).astype(np.int64)
        first = start // seq_len
        # empty docs sit AT their start position (first == last)
        last = np.where(nt > 0, (start + nt - 1) // seq_len, first)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_tokens": pa.array(nt, pa.int64()),
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
                "offset_in_seq": pa.array(start % seq_len, pa.int64()),
            }
        )

    parts = ray.get(
        [assign.remote(r, int(off)) for r, off in zip(refs, offsets)]
    )
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "first_seq": pa.array([], pa.int64()),
                "last_seq": pa.array([], pa.int64()),
                "offset_in_seq": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts).sort_by([("doc_id", "ascending")])


def _lev_le_k(a: str, b: str, k: int) -> bool:
    """Exact ``levenshtein(a, b) <= k`` candidate verification: banded
    dynamic program of width ``2k+1`` with early exit when a whole band
    row exceeds ``k`` — O(len * k) per pair, and pairs are candidate-
    sized (the minhash broadcast-verify precedent), never corpus-sized.
    """
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    big = k + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [big] * (lb + 1)
        cur[0] = i
        lo = max(1, i - k)
        hi = min(lb, i + k)
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[lo : hi + 1]) > k:
            return False
        prev = cur
    return prev[lb] <= k


def fuzzy_token_pairs(sf_dir: str, min_len: int = 3, max_dist: int = 2) -> pa.Table:
    """Fuzzy string-similarity join over the corpus word-TYPE table:
    every unordered pair of distinct word types within Levenshtein
    distance ``max_dist`` (the spell-variant / typo-consolidation
    primitive for OCR-output vocab cleanup and fuzzy-key blocking; the
    reference has no analogue — SURVEY.md §2.9 gap).

    Distributed FastSS plan (Bocek et al. 2007, deletion
    neighborhoods):
      1. word-type table via the usual per-block distinct combiner
         (shuffle bounded by distinct-words-per-block) — the TYPE
         table, not the corpus, is the unit of work, and at web scale
         it is orders of magnitude smaller;
      2. each type emits its deletion neighborhood of depth
         ``max_dist`` (all subsets of <= max_dist deleted positions,
         ~L^2/2 variants for k=2); ``groupby(variant)`` buckets
         candidates — FastSS guarantees recall 1 for lev <= k (the
         aligned non-edited positions form a shared variant), and
         bucket size is INTRINSICALLY bounded by a constant in the
         alphabet size and word length, so there is no hot-key cliff
         to cap (unlike LSH bands);
      3. pair-keyed groupby dedups candidates that share several
         variants, then a per-batch verify applies the exact banded-DP
         ``_lev_le_k`` predicate (candidate-sized work).

    Oracle: DuckDB ``levenshtein`` all-pairs over the same
    tokenization — O(|types|^2) there vs near-linear here.
    """
    from itertools import combinations

    def word_partial(batch: pa.Table) -> pa.Table:
        words: set[str] = set()
        for text in batch.column("text").to_pylist():
            words.update(
                w for w in _TERM.findall((text or "").lower()) if len(w) >= min_len
            )
        return pa.table({"word": pa.array(sorted(words), pa.string())})

    types = (
        _docs(sf_dir)
        .map_batches(word_partial, batch_format="pyarrow")
        .groupby("word")
        .count()
    )

    def variants(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return pa.table(
                {"variant": pa.array([], pa.string()), "word": pa.array([], pa.string())}
            )
        vs: list[str] = []
        ws: list[str] = []
        for w in batch.column("word").to_pylist():
            neigh = {w}
            for d in range(1, max_dist + 1):
                for pos in combinations(range(len(w)), d):
                    drop = set(pos)
                    neigh.add("".join(c for i, c in enumerate(w) if i not in drop))
            vs.extend(neigh)
            ws.extend([w] * len(neigh))
        return pa.table(
            {"variant": pa.array(vs, pa.string()), "word": pa.array(ws, pa.string())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ws = sorted(set(group.column("word").to_pylist()))
        a: list[str] = []
        b: list[str] = []
        # bucket membership is alphabet/length-bounded, so the O(B^2)
        # loop is constant-bounded per bucket
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                a.append(ws[i])
                b.append(ws[j])
        return pa.table(
            {"word_a": pa.array(a, pa.string()), "word_b": pa.array(b, pa.string())}
        )

    candidates = (
        types.map_batches(variants, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["word_a", "word_b"])
        .count()
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word_a" not in batch.column_names:
            return pa.table(
                {"word_a": pa.array([], pa.string()), "word_b": pa.array([], pa.string())}
            )
        aa = batch.column("word_a").to_pylist()
        bb = batch.column("word_b").to_pylist()
        keep = [_lev_le_k(x, y, max_dist) for x, y in zip(aa, bb)]
        return pa.table(
            {
                "word_a": pa.array([x for x, k in zip(aa, keep) if k], pa.string()),
                "word_b": pa.array([y for y, k in zip(bb, keep) if k], pa.string()),
            }
        )

    out = candidates.map_batches(verify, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {"word_a": pa.array([], pa.string()), "word_b": pa.array([], pa.string())}
        )
    return pa.concat_tables(tables).sort_by(
        [("word_a", "ascending"), ("word_b", "ascending")]
    )


def cms_token_counts(
    sf_dir: str, depth: int = 4, width: int = 1024, top_k: int = 20
) -> pa.Table:
    """Count-Min sketch over corpus token occurrences, with the sketch
    ESTIMATES themselves oracled (the HLL precedent): row ``j`` hashes
    tokens with ``md5-lower64(word + '#j') % width``, cells sum
    occurrence counts, and a point query is the min over rows — DuckDB
    reproduces every cell load and the min bit-for-bit, so the
    "approximate" operator still gets a hash-exact driver row.

    Distributed shape: per-block (depth x width) int64 cell partials
    (vectorized bincount over the md5 kernel's hashes) — Count-Min is
    MERGEABLE BY ADDITION, so partials sum in any order (here a
    driver-side elementwise sum of 32 KiB matrices; an AggregateFn
    tree at fleet scale). The report joins the estimates against the
    exact counts of the top-``top_k`` tokens (combiner + driver top-k)
    so over-estimation bias is visible in the output.
    """
    from .hashing import md5_hash_tokens

    def partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for text in batch.column("text").to_pylist():
            words.extend(_TERM.findall((text or "").lower()))
        cells = np.zeros((depth, width), dtype=np.int64)
        exact: dict = {}
        if words:
            arr = np.asarray(words, dtype=object)
            u, c = np.unique(arr, return_counts=True)
            for j in range(depth):
                h = (
                    md5_hash_tokens([f"{w}#{j}" for w in u.tolist()])
                    % np.uint64(width)
                ).astype(np.int64)
                np.add.at(cells[j], h, c)
            exact = dict(zip(u.tolist(), c.astype(np.int64).tolist()))
        # one row per block: the sketch plus the block's exact partials
        return pa.table(
            {
                "cells": pa.array([cells.ravel().tolist()], pa.list_(pa.int64())),
                "words": pa.array([list(exact.keys())], pa.list_(pa.string())),
                "counts": pa.array([list(exact.values())], pa.list_(pa.int64())),
            }
        )

    rows = [
        t
        for t in ray.get(
            _docs(sf_dir).map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.table(
        {
            "word": pa.array([], pa.string()),
            "n_exact": pa.array([], pa.int64()),
            "n_est": pa.array([], pa.int64()),
        }
    )
    if not rows:
        return empty
    sketch = np.zeros((depth, width), dtype=np.int64)
    totals: dict = {}
    for t in rows:
        for cells, ws, cs in zip(
            t.column("cells").to_pylist(),
            t.column("words").to_pylist(),
            t.column("counts").to_pylist(),
        ):
            sketch += np.asarray(cells, dtype=np.int64).reshape(depth, width)
            for w, c in zip(ws, cs):
                totals[w] = totals.get(w, 0) + c
    if not totals:
        return empty
    terms = np.asarray(list(totals.keys()), dtype=object)
    n = np.asarray(list(totals.values()), dtype=np.int64)
    order = np.lexsort((terms.astype(str), -n))[:top_k]
    sel = sorted(terms[order].astype(str).tolist())
    est = []
    for w in sel:
        hs = [
            int(md5_hash_tokens([f"{w}#{j}"])[0] % np.uint64(width))
            for j in range(depth)
        ]
        est.append(int(min(sketch[j][h] for j, h in enumerate(hs))))
    return pa.table(
        {
            "word": pa.array(sel, pa.string()),
            "n_exact": pa.array([int(totals[w]) for w in sel], pa.int64()),
            "n_est": pa.array(est, pa.int64()),
        }
    )


# instrumentation for the driver-state guarantee: number of count rows
# the last token_canonical_map call collected driver-side (must equal
# the pair-member vocabulary, never the full type table — pinned by a test)
_TCM_LAST_DRIVER_ROWS = -1


def token_canonical_map(sf_dir: str, min_len: int = 3, max_dist: int = 2) -> pa.Table:
    """Entity-resolution / spelling-normalization map: every word type
    (len >= ``min_len``) mapped to its cluster's CANONICAL spelling —
    clusters are connected components of the FastSS edit-distance
    graph (`fuzzy_token_pairs`), the canonical member is the most
    frequent type (ties -> lexicographically smallest). Singletons map
    to themselves, so the output is the complete normalization
    dictionary OCR/typo cleanup applies as a broadcast map.

    Distributed shape: the corpus pass is the usual word-count
    combiner, materialized ONCE (both consumers below read the same
    blocks); the variant graph, its components, and the frequency
    election all live on the CANDIDATE-PAIR table — the driver
    collects counts ONLY for pair-member words (an `is_in` filter over
    the distributed count table; O(spelling-variant rate), the dbscan
    precedent for pair-table-sized driver state; the BSP propagation
    is the swap-in if a vocabulary's variant graph ever outgrows
    that).  The full type table is never materialized driver-side:
    singleton assignment is a stateless broadcast-map pass over the
    distributed count blocks.

    Oracle: recursive-CTE closure over the same levenshtein pairs +
    window election.
    """

    def count_partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for text in batch.column("text").to_pylist():
            words.extend(
                w for w in _TERM.findall((text or "").lower()) if len(w) >= min_len
            )
        if not words:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(words, dtype=object), return_counts=True)
        return pa.table(
            {
                "word": pa.array(list(u), pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    counts_ds = (
        _docs(sf_dir)
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
        .materialize()
    )
    empty = pa.table(
        {"word": pa.array([], pa.string()), "canonical": pa.array([], pa.string())}
    )

    pairs = fuzzy_token_pairs(sf_dir, min_len=min_len, max_dist=max_dist)
    pair_a = pairs.column("word_a").to_pylist()
    pair_b = pairs.column("word_b").to_pylist()
    members = sorted(set(pair_a) | set(pair_b))
    member_set_ref = ray.put(pa.array(members, pa.string()))

    def member_counts(batch: pa.Table) -> pa.Table:
        # pair-member frequency lookup: keep only words that appear in
        # some edit-distance pair — the election needs nothing else.
        import pyarrow.compute as pc

        if batch.num_rows == 0 or "word" not in batch.column_names:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        mask = pc.is_in(batch.column("word"), value_set=ray.get(member_set_ref))
        kept = batch.filter(mask)
        return pa.table(
            {"word": kept.column("word"), "n": kept.column("sum(n)")}
        )

    member_tbls = [
        t
        for t in ray.get(
            counts_ds.map_batches(member_counts, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    global _TCM_LAST_DRIVER_ROWS
    _TCM_LAST_DRIVER_ROWS = sum(t.num_rows for t in member_tbls)
    fmap: dict[str, int] = {}
    for t in member_tbls:
        fmap.update(
            zip(t.column("word").to_pylist(),
                (int(x) for x in t.column("n").to_pylist()))
        )

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pair_a, pair_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by lexicographic root (deterministic)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    comp: dict[str, str] = {w: find(w) for w in members}
    # election per component: max freq, tie -> smallest word
    best: dict[str, tuple] = {}
    for w, r in comp.items():
        key = (-fmap.get(w, 0), w)
        if r not in best or key < best[r]:
            best[r] = key
    canon = {w: best[r][1] for w, r in comp.items()}
    canon_ref = ray.put(canon)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return empty
        cm = ray.get(canon_ref)
        ws = batch.column("word").to_pylist()
        return pa.table(
            {
                "word": pa.array(ws, pa.string()),
                "canonical": pa.array([cm.get(w, w) for w in ws], pa.string()),
            }
        )

    out = counts_ds.map_batches(assign, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables).sort_by([("word", "ascending")])


def _skyline_2d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D maxima (Pareto frontier) under dominance
    q ≻ p iff q.a >= p.a, q.b >= p.b and strict in one coordinate.
    EXACT-duplicate points are all kept (neither strictly dominates).
    Vectorized per unique a-value, scanning a descending: a point
    survives iff its b equals its a-group's max AND strictly exceeds
    the best b among strictly-greater a."""
    keep = np.zeros(len(a), dtype=bool)
    order = np.argsort(-a, kind="stable")
    ua = a[order]
    best_b = -np.inf  # max b among points with strictly greater a
    i = 0
    while i < len(ua):
        j = i
        while j < len(ua) and ua[j] == ua[i]:
            j += 1
        grp = order[i:j]
        gmax = b[grp].max()
        if gmax > best_b:
            keep[grp[b[grp] == gmax]] = True
        best_b = max(best_b, gmax)
        i = j
    return keep


def skyline_docs(sf_dir: str) -> pa.Table:
    """Pareto-frontier curation filter: documents MAXIMAL in
    (n_chars, n_tokens) — no other doc is >= in both and strictly
    better in one. The multi-objective selection verb (keep documents
    not dominated on every quality axis) that single-score ranking
    can't express.

    Distributed shape (the skyline-merge theorem does the work): each
    block computes its LOCAL skyline vectorized — the union of local
    skylines provably contains the global frontier, because a point's
    dominator is either in its own block's skyline or dominated by a
    point that is — so the driver merges only O(skyline x blocks) rows
    and re-runs the same kernel once. No shuffle at all.

    Oracle: the NOT EXISTS dominance anti-join in SQL — exact,
    including duplicate-point and tie semantics.
    """

    def local(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_chars": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        nc = np.asarray(batch.column("n_chars"), dtype=np.int64)
        nt = np.array(
            [len(_TOKEN.findall(t or "")) for t in batch.column("text").to_pylist()],
            dtype=np.int64,
        )
        m = _skyline_2d(nc, nt)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(batch.column("doc_id"), np.int64)[m], pa.int64()
                ),
                "n_chars": pa.array(nc[m], pa.int64()),
                "n_tokens": pa.array(nt[m], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "n_chars"],
            )
            .map_batches(local, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_chars": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64())}
        )
    cand = pa.concat_tables(parts)
    a = np.asarray(cand.column("n_chars"), np.int64)
    b = np.asarray(cand.column("n_tokens"), np.int64)
    m = _skyline_2d(a, b)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(cand.column("doc_id"), np.int64)[m]),
            "n_chars": pa.array(a[m], pa.int64()),
            "n_tokens": pa.array(b[m], pa.int64()),
        }
    ).sort_by([("doc_id", "ascending")])


def compression_ratios(sf_dir: str) -> pa.Table:
    """Compression-ratio quality signal: zlib(level 6) compressed size
    per document — the repetitiveness heuristic web-corpus filters use
    alongside the n-gram facets (`repetition_scores`): boilerplate and
    template spam compress far better than natural prose, so a LOW
    ratio flags machine-generated/repetitive docs and a ratio ~1 flags
    random noise. Emits integer (n_bytes, n_compressed) — the ratio is
    one division away, and integers keep the operator exactly
    reference-testable (zlib is deterministic for a fixed level).

    Stateless vectorized-enough map (zlib releases the GIL; one C call
    per doc), no shuffle. No SQL oracle (DuckDB has no zlib); pinned by
    a direct-zlib parity test plus the monotonicity fixture
    (repeated text compresses smaller than prose of equal length).
    """
    import zlib

    def comp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_bytes": pa.array([], pa.int64()),
                 "n_compressed": pa.array([], pa.int64())}
            )
        nb, nc = [], []
        for t in batch.column("text").to_pylist():
            raw = (t or "").encode("utf-8")
            nb.append(len(raw))
            nc.append(len(zlib.compress(raw, 6)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array(nb, pa.int64()),
                "n_compressed": pa.array(nc, pa.int64()),
            }
        )

    out = _docs(sf_dir).map_batches(comp, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])


def vocab_coverage(sf_dir: str, ks: tuple = (10, 100)) -> pa.Table:
    """Tokenizer-budget planning: what fraction of corpus word
    OCCURRENCES the top-K most frequent word types cover (Zipf mass) —
    the number that decides a vocabulary size before training a
    tokenizer. Emits integer (k, covered, total) per requested K
    (count desc, word asc rank order, the heavy-hitters tie rule).

    Distributed shape: the usual word-count combiner (per-block
    np.unique -> ONE word-keyed groupby), then a distributed sort +
    limit(max(ks)) — the driver holds max(ks) rows and a cumsum;
    total occurrences come from O(blocks) integer partials. Exact,
    same split_words tokenizer as the heavy-hitters family.
    """
    from .hashing import split_words

    def wc(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for text in batch.column("text").to_pylist():
            words.extend(split_words(text))
        if not words:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(np.asarray(words, dtype=object), return_counts=True)
        return pa.table(
            {"word": pa.array(list(uniq), pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    counts = (
        _docs(sf_dir)
        .map_batches(wc, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["word", "n"]) if t.num_rows else t,
            batch_format="pyarrow",
        )
        .materialize()
    )
    total = int(counts.sum("n") or 0)
    kmax = max(ks)
    top = counts.sort(["n", "word"], descending=[True, False]).limit(kmax)
    rows = [t for t in ray.get(top.to_arrow_refs()) if t.num_rows]
    ns = (
        np.asarray(pa.concat_tables(rows).column("n"), np.int64)
        if rows
        else np.array([], np.int64)
    )
    cum = np.cumsum(ns)
    out_k, out_c = [], []
    for k in sorted(ks):
        out_k.append(int(k))
        out_c.append(int(cum[min(k, len(cum)) - 1]) if len(cum) else 0)
    return pa.table(
        {
            "k": pa.array(out_k, pa.int64()),
            "covered": pa.array(out_c, pa.int64()),
            "total": pa.array([total] * len(out_k), pa.int64()),
        }
    )


def doc_bigram_novelty(sf_dir: str) -> pa.Table:
    """Cross-document novelty signal: per doc, how many of its word
    bigrams are UNIQUE in the whole corpus (total occurrence count 1).
    Low novelty = templated/boilerplate text repeated across documents
    — the cross-doc complement of `repetition_scores` (within-doc) and
    `dup_ngram_spans` (exact 8-gram spans); the CCNet/Gopher family's
    cheap corpus-repetition filter.

    Output: (doc_id, n_bigrams, n_unique, novelty) for every doc with
    at least one bigram; novelty = n_unique / n_bigrams (exact IEEE
    int/int division, same on the SQL side).

    Ray shape (JOIN-FREE attribution): per-block (doc_id, bigram, n)
    partials -> ONE bigram-keyed groupby computing (sum n, min doc_id).
    A bigram with total 1 occurred in exactly one block of one doc, so
    its min(doc_id) IS the owning doc — no join-back of the corpus
    table against the doc table. The count-1 rows collapse through a
    per-block combiner to doc-keyed partials (a doc-domain-sized
    second shuffle); per-doc bigram totals are exact per block (one
    row = one whole doc) and never shuffle.
    """
    from ray.data.aggregate import Min, Sum

    from .hashing import split_words

    def partial(batch: pa.Table) -> pa.Table:
        rows_d: list[int] = []
        rows_b: list[str] = []
        rows_n: list[int] = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            words = split_words(text)
            if len(words) < 2:
                continue
            grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
            uniq, counts = np.unique(np.asarray(grams, dtype=object), return_counts=True)
            rows_d.extend([did] * len(uniq))
            rows_b.extend(uniq.tolist())
            rows_n.extend(counts.astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(rows_d, pa.int64()),
                "bigram": pa.array(rows_b, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    pairs = _docs(sf_dir).map_batches(partial, batch_format="pyarrow").materialize()

    # per-doc totals: one row per doc (docs never split across blocks)
    def doc_totals(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_bigrams": pa.array([], pa.int64())}
            )
        g = pa.TableGroupBy(batch.select(["doc_id", "n"]), ["doc_id"]).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["doc_id", "n_bigrams"])

    totals_tbls = [
        t for t in ray.get(
            pairs.map_batches(doc_totals, batch_format="pyarrow").to_arrow_refs()
        ) if t.num_rows
    ]

    # corpus pass: bigram-keyed (sum n, min doc) -> count-1 rows are
    # attributable to min(doc_id); combiner collapses to doc partials
    corpus = pairs.groupby("bigram").aggregate(Sum("n"), Min("doc_id"))

    def unique_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sum(n)" not in batch.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_unique": pa.array([], pa.int64())}
            )
        import pyarrow.compute as pc

        ones = batch.filter(pc.equal(batch.column("sum(n)"), 1))
        if ones.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_unique": pa.array([], pa.int64())}
            )
        g = pa.TableGroupBy(
            ones.select(["min(doc_id)"]).rename_columns(["doc_id"]), ["doc_id"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "n_unique"])

    uniq_agg = (
        corpus.map_batches(unique_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("n_unique")
    )
    uniq_tbls = [t for t in ray.get(uniq_agg.to_arrow_refs()) if t.num_rows]

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "n_bigrams": pa.array([], pa.int64()),
         "n_unique": pa.array([], pa.int64()), "novelty": pa.array([], pa.float64())}
    )
    if not totals_tbls:
        return empty
    tot = pa.concat_tables(totals_tbls)
    dids = tot.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    nbg = tot.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
    n_unique = np.zeros(len(dids), np.int64)
    if uniq_tbls:
        u = pa.concat_tables(uniq_tbls)
        udids = u.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        uvals = u.column("sum(n_unique)").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(dids, kind="stable")
        pos = np.searchsorted(dids[order], udids)
        n_unique[order[pos]] = uvals
    out = pa.table(
        {
            "doc_id": pa.array(dids, pa.int64()),
            "n_bigrams": pa.array(nbg, pa.int64()),
            "n_unique": pa.array(n_unique, pa.int64()),
            "novelty": pa.array(n_unique / nbg, pa.float64()),
        }
    )
    return out.sort_by([("doc_id", "ascending")])


# fixed-point log-probability scale: 2^20 (the embedding_drift /
# value_trend precedent — quantize the ONE float per distinct input,
# keep every SUM integer so summation order can't diverge)
_LM_FP = 1048576.0


def _gram_batch(batch: pa.Table):
    """Flat (doc_ids, grams, doc_lengths) word-bigram explode of a
    batch — the shared kernel of the LM score pass."""
    from .hashing import split_words

    ids: list = []
    grams: list[str] = []
    lens: list[int] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        words = split_words(text)
        n = max(0, len(words) - 1)
        if n == 0:
            continue
        ids.append(doc_id)
        lens.append(n)
        grams.extend(f"{a} {b}" for a, b in zip(words, words[1:]))
    return ids, grams, lens


def lm_doc_scores(sf_dir: str) -> pa.Table:
    """Bigram-LM document quality scores — the CCNet/KenLM
    perplexity-filter shape (Wenzek et al., LREC 2020): train an
    add-one-smoothed bigram LM on the corpus, then score every document
    by its total and mean log-probability under that LM. Low-probability
    docs are gibberish/OCR noise; anomalously high ones are boilerplate
    — both ends are standard curation cut points.

        p(w2 | w1) = (c(w1 w2) + 1) / (c(w1·) + V)

    with c(w1·) the corpus count of bigrams starting w1 and V the
    distinct-right-word vocabulary size.

    Exactness: a float logprob SUM would drift by summation order (the
    trap the rare_token_scores docstring names) — so each DISTINCT
    bigram's log-prob is quantized ONCE to int64 fixed-point
    (floor(ln(p) * 2^20)) and the per-doc reduction is an integer sum.
    ln() is math.log (libm), bit-identical to DuckDB's ln() — pinned by
    a grid test — and p is the same IEEE double expression both sides,
    so the SQL oracle hash-verifies the scores exactly.

    Ray shape: ONE bigram-keyed groupby over in-batch np.unique count
    partials (the LM-training shuffle, same as bigram_counts); the
    reduced bigram TYPE table (Zipf-bounded, the bpe_vocab argument)
    lands on the driver where left-word totals and V are derived and
    each bigram's contribution is quantized (math.log memoized per
    distinct (c_bg, c_left) pair — Zipf collapses these to a handful);
    the {bigram -> fp} map broadcasts once via ray.put; pass 2 streams
    the corpus through a stateless vectorized searchsorted lookup with
    np.add.reduceat per-doc sums. At web-scale vocab, swap the
    broadcast for a bigram-keyed hash join (the distinctive_terms note
    applies verbatim).
    """
    import math

    import ray

    def partial(batch: pa.Table) -> pa.Table:
        _, grams, _ = _gram_batch(batch)
        if not grams:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(list(uniq), pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    docs = _docs(sf_dir)
    agg = docs.map_batches(partial, batch_format="pyarrow").groupby("bigram").sum("n")
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "logprob_fp": pa.array([], pa.int64()),
            "avg_logprob": pa.array([], pa.float64()),
        }
    )
    if not tables:
        return empty
    lm = pa.concat_tables(tables)
    bigrams = np.asarray(lm.column("bigram").to_pylist(), dtype=object)
    cbg = lm.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    # left-word totals and the right-word vocabulary from the REDUCED table
    lefts = np.asarray([b.split(" ", 1)[0] for b in bigrams], dtype=object)
    rights = np.asarray([b.split(" ", 1)[1] for b in bigrams], dtype=object)
    uls, inv = np.unique(lefts, return_inverse=True)
    cl_per_left = np.zeros(len(uls), np.int64)
    np.add.at(cl_per_left, inv, cbg)
    cl = cl_per_left[inv]
    v = int(len(np.unique(rights)))
    # quantize once per distinct (c_bg, c_left) pair (Zipf collapses
    # these to a handful): math.log == DuckDB ln, bit-for-bit
    pairs = np.stack([cbg, cl], axis=1)
    upairs, inv2 = np.unique(pairs, axis=0, return_inverse=True)
    ufp = np.fromiter(
        (
            math.floor(math.log((int(a) + 1) / (int(b) + v)) * _LM_FP)
            for a, b in upairs
        ),
        np.int64,
        count=len(upairs),
    )
    fp = ufp[inv2]
    order = np.argsort(bigrams, kind="stable")
    lm_ref = ray.put((bigrams[order], fp[order]))

    def score(batch: pa.Table) -> pa.Table:
        keys, fps = ray.get(lm_ref)
        ids, grams, lens = _gram_batch(batch)
        if not ids:
            return empty
        flat = np.asarray(grams, dtype=object)
        contrib = fps[np.searchsorted(keys, flat)]
        starts = np.concatenate(([0], np.cumsum(np.asarray(lens, np.int64))[:-1]))
        sums = np.add.reduceat(contrib, starts)
        n = np.asarray(lens, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(n, pa.int64()),
                "logprob_fp": pa.array(sums.astype(np.int64), pa.int64()),
                "avg_logprob": pa.array(
                    sums.astype(np.float64) / n.astype(np.float64) / _LM_FP,
                    pa.float64(),
                ),
            }
        )

    out = docs.map_batches(score, batch_format="pyarrow")
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return empty
    return pa.concat_tables(tbls).sort_by([("doc_id", "ascending")])


def _dsir_scored(sf_dir: str, target_lang: str = "en"):
    """Shared DSIR scoring passes — returns ``(scored Dataset | None,
    empty-schema table)``; ``dsir_weights`` materializes it per doc and
    ``dsir_sample`` reduces it to a top-k without materializing.

    DSIR importance-resampling log-weights (Xie et al., NeurIPS
    2023): score every document by how much more likely its unigrams
    are under the TARGET distribution (here the ``target_lang`` slice —
    the in-corpus analog of DSIR's Wikipedia-vs-CommonCrawl setup) than
    under the RAW corpus distribution:

        log w(doc) = sum over token occurrences of
                     ln p_target(w) - ln p_raw(w)

    with both distributions add-one-smoothed over the shared vocabulary
    (V = distinct words corpus-wide). Sampling proportionally to w
    reweights raw data toward the target domain — the published recipe
    for LLM pretraining data selection.

    Exactness: per-WORD contribution quantized once to int64 fixed
    point (floor((ln(pt) - ln(pr)) * 2^20)); math.log == DuckDB ln
    bit-for-bit and both ratios are the same IEEE doubles both sides,
    so per-doc integer sums hash-verify against the SQL oracle.

    Ray shape: one word-keyed groupby over in-batch (word, n_all,
    n_target) np.unique count partials (the word-TYPE table, Zipf-
    bounded — bpe_vocab precedent); contributions quantized on the
    driver (memoized per distinct (c_target, c_raw) pair) and broadcast
    once via ray.put; pass 2 streams the corpus through the same
    searchsorted + reduceat kernel as lm_doc_scores. Web-scale vocab:
    swap the broadcast for a word-keyed hash join.
    """
    import math

    import ray

    from .hashing import split_words

    def word_batch(batch: pa.Table):
        ids: list = []
        words: list[str] = []
        lens: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = split_words(text)
            if not ws:
                continue
            ids.append(doc_id)
            lens.append(len(ws))
            words.extend(ws)
        return ids, words, lens

    def partial(batch: pa.Table) -> pa.Table:
        from .hashing import split_words as sw

        all_words: list[str] = []
        tgt_words: list[str] = []
        for text, lang in zip(
            batch.column("text").to_pylist(), batch.column("lang").to_pylist()
        ):
            ws = sw(text)
            all_words.extend(ws)
            if lang == target_lang:
                tgt_words.extend(ws)
        if not all_words:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "n_raw": pa.array([], pa.int64()),
                    "n_tgt": pa.array([], pa.int64()),
                }
            )
        uniq, counts = np.unique(np.asarray(all_words, dtype=object), return_counts=True)
        n_tgt = np.zeros(len(uniq), np.int64)
        if tgt_words:
            tu, tc = np.unique(np.asarray(tgt_words, dtype=object), return_counts=True)
            n_tgt[np.searchsorted(uniq, tu)] = tc
        return pa.table(
            {
                "word": pa.array(list(uniq), pa.string()),
                "n_raw": pa.array(counts.astype(np.int64), pa.int64()),
                "n_tgt": pa.array(n_tgt, pa.int64()),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum(["n_raw", "n_tgt"])
    )
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "logweight_fp": pa.array([], pa.int64()),
            "avg_logweight": pa.array([], pa.float64()),
        }
    )
    if not tables:
        return None, empty
    vocab_tbl = pa.concat_tables(tables)
    words = np.asarray(vocab_tbl.column("word").to_pylist(), dtype=object)
    n_raw = vocab_tbl.column("sum(n_raw)").to_numpy(zero_copy_only=False).astype(np.int64)
    n_tgt = vocab_tbl.column("sum(n_tgt)").to_numpy(zero_copy_only=False).astype(np.int64)
    v = int(len(words))
    nr = int(n_raw.sum())
    nt = int(n_tgt.sum())
    pairs = np.stack([n_tgt, n_raw], axis=1)
    upairs, inv2 = np.unique(pairs, axis=0, return_inverse=True)
    ufp = np.fromiter(
        (
            math.floor(
                (math.log((int(a) + 1) / (nt + v)) - math.log((int(b) + 1) / (nr + v)))
                * _LM_FP
            )
            for a, b in upairs
        ),
        np.int64,
        count=len(upairs),
    )
    fp = ufp[inv2]
    order = np.argsort(words, kind="stable")
    vocab_ref = ray.put((words[order], fp[order]))

    def score(batch: pa.Table) -> pa.Table:
        keys, fps = ray.get(vocab_ref)
        ids, ws, lens = word_batch(batch)
        if not ids:
            return empty
        flat = np.asarray(ws, dtype=object)
        contrib = fps[np.searchsorted(keys, flat)]
        starts = np.concatenate(([0], np.cumsum(np.asarray(lens, np.int64))[:-1]))
        sums = np.add.reduceat(contrib, starts)
        n = np.asarray(lens, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "logweight_fp": pa.array(sums.astype(np.int64), pa.int64()),
                "avg_logweight": pa.array(
                    sums.astype(np.float64) / n.astype(np.float64) / _LM_FP,
                    pa.float64(),
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow"), empty


def dsir_weights(sf_dir: str, target_lang: str = "en") -> pa.Table:
    """Per-doc DSIR importance log-weights — the full scored table
    (see ``_dsir_scored`` for the algorithm, exactness contract and
    Ray shape)."""
    import ray

    out, empty = _dsir_scored(sf_dir, target_lang)
    if out is None:
        return empty
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return empty
    return pa.concat_tables(tbls).sort_by([("doc_id", "ascending")])


def dsir_sample(
    sf_dir: str, target_lang: str = "en", k: int = 64, seed: int = 42
) -> pa.Table:
    """DSIR importance RESAMPLING — the apply step of Xie et al. 2023:
    draw the ``k`` documents to keep, with probability proportional to
    the importance weight w(doc) = exp(log w), via the Gumbel-top-k
    trick (Kool et al., ICML 2019): key(doc) = log w(doc) + G(doc)
    with G standard Gumbel noise; the k largest keys are an exact
    without-replacement sample ∝ w. The noise is DETERMINISTIC —
    G = -ln(-ln(u)) with u = (md5-lower64(doc_id || ':dsir:' || seed)
    + 1) / 2^64 — so the draw is reproducible and SQL-reproducible
    (md5_number_lower + the same IEEE double chain; ln is libm ==
    DuckDB ln bit-for-bit, the lm_doc_scores grid pin).

    Ray shape: the shared ``_dsir_scored`` streaming pass (one
    word-TYPE groupby + broadcast contribution map), then a per-batch
    Gumbel-key top-k partial — each batch emits at most k candidate
    rows, the union of per-batch top-ks provably contains the global
    top-k — merged on the driver (O(batches × k) state). No global
    sort, no per-doc materialization. The two libm ln calls per doc
    are the exactness cost; at 10^12 docs swap them for np.log (1-ulp
    drift, irrelevant to a sampling decision) or pre-quantized Gumbel
    tables if the selection boundary need not be bit-stable.
    """
    import math

    import ray

    from .hashing import md5_hash_tokens

    out, _ = _dsir_scored(sf_dir, target_lang)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "logweight_fp": pa.array([], pa.int64()),
            "gumbel_key": pa.array([], pa.float64()),
        }
    )
    if out is None:
        return empty

    def topk_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        fp = (
            batch.column("logweight_fp")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_hash_tokens([f"{d}:dsir:{seed}" for d in ids])
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        logw = fp.astype(np.float64) / _LM_FP

        def lnln(x: float) -> float:
            t = -math.log(x)  # x in (0,1] -> t >= 0; t == 0 only at the
            return math.log(t) if t > 0.0 else -math.inf  # 2^-53 u==1 edge

        g = logw - np.fromiter((lnln(x) for x in u), np.float64, count=len(u))
        order = np.lexsort((ids, -g))[: int(k)]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_tokens": pa.array(n[order], pa.int64()),
                "logweight_fp": pa.array(fp[order], pa.int64()),
                "gumbel_key": pa.array(g[order], pa.float64()),
            }
        )

    cands = out.map_batches(topk_partial, batch_format="pyarrow")
    tbls = [t for t in ray.get(cands.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return empty
    merged = pa.concat_tables(tbls)
    ids = merged.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    g = merged.column("gumbel_key").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -g))[: int(k)]
    return merged.take(pa.array(np.sort(order))).sort_by(
        [("doc_id", "ascending")]
    )


def entropy_scores(sf_dir: str) -> pa.Table:
    """Per-document word-entropy quality signal (the token-diversity
    member of the Gopher-rule family, next to ``repetition_scores``
    (bigram repetition) and ``compression_ratios`` (zlib)): Shannon
    entropy of the document's unigram distribution,

        H(doc) = ln(n) - (sum over distinct words of c*ln(c)) / n

    in nats. Template/boilerplate spam (few distinct words repeated)
    scores near 0; diverse prose approaches ln(n_distinct). Both tails
    are standard curation cut points.

    Exactness: each distinct count's ln(c) is quantized ONCE to int64
    fixed point (floor(ln(c) * 2^20) — the lm_doc_scores contract), so
    the per-doc reduction sum(c * fp(c)) is an integer and the final
    entropy is ONE identical IEEE expression both sides
    (ln(n) - S/n/2^20). Docs with zero words are excluded (no
    distribution to score), mirrored by the oracle's words[1] <> ''.

    Ray shape: stateless vectorized map — NO shuffle and no corpus
    state at all (entropy is per-doc). Per batch: one tokenize pass,
    np.unique word-ids, a (doc_idx * n_vocab + word_id) combined-key
    np.unique for per-doc counts, memoized math.log per DISTINCT count
    value (Zipf collapses these to a handful), np.add.at per-doc sums.
    """
    import math

    import ray

    from .hashing import split_words

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "clnc_fp": pa.array([], pa.int64()),
            "entropy": pa.array([], pa.float64()),
        }
    )

    def score(batch: pa.Table) -> pa.Table:
        ids: list = []
        words: list[str] = []
        lens: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = split_words(text)
            if not ws:
                continue
            ids.append(doc_id)
            lens.append(len(ws))
            words.extend(ws)
        if not ids:
            return empty
        flat = np.asarray(words, dtype=object)
        _, word_id = np.unique(flat, return_inverse=True)
        n_vocab = int(word_id.max()) + 1
        doc_idx = np.repeat(
            np.arange(len(ids), dtype=np.int64), np.asarray(lens, np.int64)
        )
        key = doc_idx * n_vocab + word_id
        ukey, counts = np.unique(key, return_counts=True)
        # fixed-point ln once per DISTINCT count value (math.log ==
        # DuckDB ln bit-for-bit; the lm_doc_scores grid test covers it)
        uc, cinv = np.unique(counts, return_inverse=True)
        ufp = np.fromiter(
            (math.floor(math.log(int(c)) * _LM_FP) for c in uc),
            np.int64,
            count=len(uc),
        )
        term = counts.astype(np.int64) * ufp[cinv]
        sums = np.zeros(len(ids), np.int64)
        np.add.at(sums, ukey // n_vocab, term)
        # ln(n) through math.log per DISTINCT length (np.log is not
        # pinned to libm; math.log == DuckDB ln is)
        ln_arr = np.asarray(lens, np.int64)
        ulen, linv = np.unique(ln_arr, return_inverse=True)
        uln = np.fromiter(
            (math.log(float(x)) for x in ulen), np.float64, count=len(ulen)
        )
        n = ln_arr.astype(np.float64)
        ent = uln[linv] - sums.astype(np.float64) / n / _LM_FP
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "clnc_fp": pa.array(sums, pa.int64()),
                "entropy": pa.array(ent, pa.float64()),
            }
        )

    out = _docs(sf_dir).map_batches(score, batch_format="pyarrow")
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return empty
    return pa.concat_tables(tbls).sort_by([("doc_id", "ascending")])


def source_divergence(sf_dir: str) -> pa.Table:
    """Per-source unigram KL divergence from the corpus distribution —
    the domain-shift dashboard for mixture construction (which sources
    look like the corpus average, which are outliers worth reweighting;
    the measurement side of DSIR's importance weights):

        KL(p_s || p) = sum over words of (c_sw/T_s) * ln((c_sw*T)/(T_s*c_w))

    reported as the T_s-scaled integer sum kl_fp = sum c_sw * fp(...)
    plus the derived kl double. No smoothing needed: every word of
    source s has c_sw >= 1 and hence c_w >= 1.

    Exactness: per-(source,word) contribution quantized once to int64
    fixed point; the ln argument is the identical CAST-then-multiply
    double chain both sides (float(c_sw)*float(T) / (float(T_s)*
    float(c_w))), so integer sums hash-verify. kl = kl_fp/T_s/2^20,
    one shared IEEE expression.

    Ray shape: one (source\\x00word)-keyed groupby over in-batch
    vectorized count partials (combined-key np.unique — the
    entropy_scores kernel with source in place of doc); the reduced
    per-source type table (Zipf-bounded per source) lands on the
    driver, where word totals, source totals and the fixed-point terms
    are derived and summed to ONE row per source. At web-scale vocab
    the driver reduce swaps for a word-keyed join producing per-word
    contributions plus a source-keyed sum (the distinctive_terms note).
    kl_fp is int64; at 100-TB token counts the per-source sum should be
    carried as python-int / HUGEINT (the table_checksum precedent).
    """
    import math

    import ray

    from .hashing import split_words

    def partial(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        words: list[str] = []
        lens: list[int] = []
        for source, text in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = split_words(text)
            if not ws:
                continue
            srcs.append(source)
            lens.append(len(ws))
            words.extend(ws)
        if not srcs:
            return pa.table(
                {
                    "sk": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "word": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        flat = np.asarray(words, dtype=object)
        uw, word_id = np.unique(flat, return_inverse=True)
        usrc, src_row = np.unique(np.asarray(srcs, dtype=object), return_inverse=True)
        src_idx = np.repeat(src_row, np.asarray(lens, np.int64))
        key = src_idx.astype(np.int64) * len(uw) + word_id
        ukey, counts = np.unique(key, return_counts=True)
        s = usrc[ukey // len(uw)]
        w = uw[ukey % len(uw)]
        return pa.table(
            {
                "sk": pa.array([f"{a}\x00{b}" for a, b in zip(s, w)], pa.string()),
                "source": pa.array(list(s), pa.string()),
                "word": pa.array(list(w), pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    agg = docs.map_batches(partial, batch_format="pyarrow").groupby("sk").sum("n")
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "kl_fp": pa.array([], pa.int64()),
            "kl": pa.array([], pa.float64()),
        }
    )
    if not tables:
        return empty
    tbl = pa.concat_tables(tables)
    sk = tbl.column("sk").to_pylist()
    c_sw = tbl.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    srcs = np.asarray([k.split("\x00", 1)[0] for k in sk], dtype=object)
    words = np.asarray([k.split("\x00", 1)[1] for k in sk], dtype=object)
    usrc, sinv = np.unique(srcs, return_inverse=True)
    t_s = np.zeros(len(usrc), np.int64)
    np.add.at(t_s, sinv, c_sw)
    uw, winv = np.unique(words, return_inverse=True)
    c_w = np.zeros(len(uw), np.int64)
    np.add.at(c_w, winv, c_sw)
    t = int(c_sw.sum())
    # fixed-point term per row; memoized per distinct (c_sw, T_s, c_w)
    triple = np.stack([c_sw, t_s[sinv], c_w[winv]], axis=1)
    utriple, tinv = np.unique(triple, axis=0, return_inverse=True)
    ufp = np.fromiter(
        (
            math.floor(
                math.log(float(a) * float(t) / (float(b) * float(c))) * _LM_FP
            )
            for a, b, c in utriple
        ),
        np.int64,
        count=len(utriple),
    )
    term = c_sw * ufp[tinv]
    kl_fp = np.zeros(len(usrc), np.int64)
    np.add.at(kl_fp, sinv, term)
    return pa.table(
        {
            "source": pa.array(list(usrc), pa.string()),
            "n_tokens": pa.array(t_s, pa.int64()),
            "kl_fp": pa.array(kl_fp, pa.int64()),
            "kl": pa.array(
                kl_fp.astype(np.float64) / t_s.astype(np.float64) / _LM_FP,
                pa.float64(),
            ),
        }
    ).sort_by([("source", "ascending")])


def ccnet_buckets(sf_dir: str) -> pa.Table:
    """CCNet head/middle/tail corpus bucketing (Wenzek et al., LREC
    2020): train a PER-LANGUAGE add-one-smoothed bigram LM, score every
    document under its own language's LM (the in-corpus analog of
    CCNet's per-language KenLM), then split each language's documents
    into perplexity tertiles — ``head`` (most fluent third, lowest
    perplexity = highest mean log-prob), ``middle``, ``tail``. The
    bucket column is the published curation knob: train on head+middle,
    drop or down-weight tail.

    Exactness: per-bigram contributions use the ``lm_doc_scores``
    int64 fixed-point contract (floor(ln(p) * 2^20), math.log == DuckDB
    ln bit-for-bit), so per-doc integer sums are order-free; the mean
    log-prob double is the identical IEEE expression both sides; the
    tertile is SQL ``ntile(3) OVER (PARTITION BY lang ORDER BY
    avg_logprob DESC, doc_id)`` — a deterministic total order — with
    DuckDB's ntile row-allocation (first n%k buckets get one extra row)
    replicated exactly.

    Ray shape: ONE (lang, bigram)-keyed groupby over in-batch np.unique
    count partials trains all per-lang LMs in a single shuffle (the
    ``source_divergence`` composite-key pattern); the reduced TYPE
    table is Zipf-bounded per language, contributions quantize on the
    driver (memoized per distinct (c_bg, c_left, V_lang) triple) and
    broadcast once via ray.put; the score pass streams the corpus
    through the searchsorted+reduceat kernel. The tertile is the
    ``value_ntiles`` rank-assignment shape on the PER-DOC score table
    (one row per doc — 8 bytes x a few columns, not the corpus): one
    range-partition sort on (lang, -avg, doc_id), a metadata-only pass
    collecting per-block per-lang ROW COUNTS (never scores), per-lang
    prefix offsets on the driver (O(blocks x langs) state), then one
    vectorized bucket-assignment task per block. At 10^12 docs the
    score-table sort is the one unavoidable all-to-all; everything
    else is streaming or metadata.
    """
    import math

    import ray

    from .hashing import split_words

    def gram_batch(batch: pa.Table):
        ids: list = []
        langs: list[str] = []
        keys: list[str] = []
        lens: list[int] = []
        for doc_id, lang, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            words = split_words(text)
            n = max(0, len(words) - 1)
            if n == 0:
                continue
            ids.append(doc_id)
            langs.append(lang)
            lens.append(n)
            keys.extend(f"{lang}\x00{a} {b}" for a, b in zip(words, words[1:]))
        return ids, langs, keys, lens

    def partial(batch: pa.Table) -> pa.Table:
        _, _, keys, _ = gram_batch(batch)
        if not keys:
            return pa.table(
                {"lb": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(keys, dtype=object), return_counts=True)
        return pa.table(
            {
                "lb": pa.array(list(uniq), pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    agg = docs.map_batches(partial, batch_format="pyarrow").groupby("lb").sum("n")
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "n_bigrams": pa.array([], pa.int64()),
            "logprob_fp": pa.array([], pa.int64()),
            "avg_logprob": pa.array([], pa.float64()),
            "bucket": pa.array([], pa.string()),
        }
    )
    if not tables:
        return empty
    lm = pa.concat_tables(tables)
    lb = lm.column("lb").to_pylist()
    cbg = lm.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    lm_langs = np.asarray([k.split("\x00", 1)[0] for k in lb], dtype=object)
    grams = np.asarray([k.split("\x00", 1)[1] for k in lb], dtype=object)
    lefts = np.asarray(
        [f"{lg}\x00{g.split(' ', 1)[0]}" for lg, g in zip(lm_langs, grams)],
        dtype=object,
    )
    rights = np.asarray(
        [f"{lg}\x00{g.split(' ', 1)[1]}" for lg, g in zip(lm_langs, grams)],
        dtype=object,
    )
    uls, linv = np.unique(lefts, return_inverse=True)
    cl_per_left = np.zeros(len(uls), np.int64)
    np.add.at(cl_per_left, linv, cbg)
    cl = cl_per_left[linv]
    # per-lang right-word vocabulary V
    ulangs, lang_inv = np.unique(lm_langs, return_inverse=True)
    v_per_lang = np.zeros(len(ulangs), np.int64)
    ur = np.unique(rights)
    ur_langs = np.asarray([k.split("\x00", 1)[0] for k in ur], dtype=object)
    rl, rc = np.unique(ur_langs, return_counts=True)
    v_per_lang[np.searchsorted(ulangs, rl)] = rc
    v = v_per_lang[lang_inv]
    triple = np.stack([cbg, cl, v], axis=1)
    utriple, tinv = np.unique(triple, axis=0, return_inverse=True)
    ufp = np.fromiter(
        (
            math.floor(math.log((int(a) + 1) / (int(b) + int(c))) * _LM_FP)
            for a, b, c in utriple
        ),
        np.int64,
        count=len(utriple),
    )
    fp = ufp[tinv]
    keys_arr = np.asarray(lb, dtype=object)
    order = np.argsort(keys_arr, kind="stable")
    lm_ref = ray.put((keys_arr[order], fp[order]))

    def score(batch: pa.Table) -> pa.Table:
        keys, fps = ray.get(lm_ref)
        ids, langs, gkeys, lens = gram_batch(batch)
        if not ids:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "logprob_fp": pa.array([], pa.int64()),
                    "avg_logprob": pa.array([], pa.float64()),
                    "neg_avg": pa.array([], pa.float64()),
                }
            )
        flat = np.asarray(gkeys, dtype=object)
        contrib = fps[np.searchsorted(keys, flat)]
        starts = np.concatenate(([0], np.cumsum(np.asarray(lens, np.int64))[:-1]))
        sums = np.add.reduceat(contrib, starts)
        n = np.asarray(lens, np.int64)
        avg = sums.astype(np.float64) / n.astype(np.float64) / _LM_FP
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "n_bigrams": pa.array(n, pa.int64()),
                "logprob_fp": pa.array(sums.astype(np.int64), pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
                # ascending-sort key for DESC score order (avg < 0
                # always — ln p < 0 — so no -0.0 ambiguity)
                "neg_avg": pa.array(-avg, pa.float64()),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    refs = scored.sort(["lang", "neg_avg", "doc_id"]).to_arrow_refs()

    @ray.remote
    def block_lang_runs(tbl: pa.Table):
        """Metadata only: ordered (lang, count) runs of this block."""
        if tbl.num_rows == 0 or "lang" not in tbl.column_names:
            return []
        langs = np.asarray(tbl.column("lang").to_pylist(), dtype=object)
        change = np.flatnonzero(langs[1:] != langs[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(langs)]))
        return [(str(langs[s]), int(e - s)) for s, e in zip(starts, ends)]

    runs_per_block = ray.get([block_lang_runs.remote(r) for r in refs])
    n_per_lang: dict = {}
    offsets_per_block: list = []
    for runs in runs_per_block:
        offs = []
        for lang, cnt in runs:
            offs.append(n_per_lang.get(lang, 0))
            n_per_lang[lang] = n_per_lang.get(lang, 0) + cnt
        offsets_per_block.append(offs)
    if not n_per_lang:
        return empty
    names = np.asarray(["head", "middle", "tail"], dtype=object)

    @ray.remote
    def assign(tbl: pa.Table, runs, offs) -> pa.Table:
        if tbl.num_rows == 0 or "doc_id" not in tbl.column_names:
            return empty
        bucket = np.empty(tbl.num_rows, np.int64)
        pos = 0
        for (lang, cnt), off in zip(runs, offs):
            nl = n_per_lang[lang]
            base, rem = divmod(nl, 3)
            boundary = rem * (base + 1)
            r = off + np.arange(cnt, dtype=np.int64)
            if base == 0:
                b = r  # fewer rows than buckets: row i -> bucket i+1
            else:
                small = np.maximum(r - boundary, 0)
                b = np.where(r < boundary, r // (base + 1), rem + small // base)
            bucket[pos : pos + cnt] = b
            pos += cnt
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "lang": tbl.column("lang"),
                "n_bigrams": tbl.column("n_bigrams"),
                "logprob_fp": tbl.column("logprob_fp"),
                "avg_logprob": tbl.column("avg_logprob"),
                "bucket": pa.array(names[np.minimum(bucket, 2)], pa.string()),
            }
        )

    parts = ray.get(
        [
            assign.remote(ref, runs, offs)
            for ref, runs, offs in zip(refs, runs_per_block, offsets_per_block)
        ]
    )
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return empty
    return pa.concat_tables(parts).sort_by([("doc_id", "ascending")])


def quality_classifier(sf_dir: str, n_buckets: int = 4096) -> pa.Table:
    """Hashed-feature linear quality classifier APPLY — the fastText /
    CCNet quality-model serving shape (Joulin et al. 2017: bag of
    hashed unigram+bigram features -> linear layer). Here the weight
    vector is a deterministic md5-derived stand-in (the sandbox has no
    trained model; what is being exercised is the APPLY plan: vectorized
    feature hashing, weight-table lookup, per-doc reduction, threshold
    label), so the whole stage is SQL-reproducible and hash-verified —
    swap ``weights`` for real trained weights and nothing else changes.

        feature set  f(doc) = word unigrams + word bigrams (occurrences)
        bucket(f)    = md5-lower64(f) % n_buckets
        weight(b)    = (md5-lower64('qw:' || b) % 2001) - 1000
        score_fp     = sum over occurrences of weight(bucket(f))
        label        = 'keep' if score_fp >= 0 else 'discard'

    Exactness: md5-lower64 == DuckDB ``md5_number_lower`` (the
    ``cms_token_counts`` precedent), integer weights sum order-free,
    and ``avg_weight`` is one shared IEEE division — hash-exact vs the
    SQL oracle.

    Ray shape: ONE stateless streaming ``map_batches`` pass — no
    shuffle at all. The 8-byte x ``n_buckets`` weight table is built
    once on the driver and ships inside the task closure (at a real
    model's 2M buckets, move it to ``ray.put`` + per-actor fetch, the
    broadcast-small-side pattern); per batch the flat feature list is
    hashed by the vectorized single-block numpy MD5 and reduced with
    np.add.reduceat. Trivially linear at 10^12 docs.
    """
    import ray

    from .hashing import md5_hash_tokens, split_words

    weights = (
        md5_hash_tokens([f"qw:{b}" for b in range(n_buckets)]) % np.uint64(2001)
    ).astype(np.int64) - 1000
    nb = np.uint64(n_buckets)

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_feats": pa.array([], pa.int64()),
            "score_fp": pa.array([], pa.int64()),
            "avg_weight": pa.array([], pa.float64()),
            "label": pa.array([], pa.string()),
        }
    )

    def apply(batch: pa.Table) -> pa.Table:
        ids: list = []
        feats: list[str] = []
        lens: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            words = split_words(text)
            if not words:
                continue
            ids.append(doc_id)
            lens.append(len(words) + max(0, len(words) - 1))
            feats.extend(words)
            feats.extend(f"{a} {b}" for a, b in zip(words, words[1:]))
        if not ids:
            return empty
        contrib = weights[(md5_hash_tokens(feats) % nb).astype(np.int64)]
        # reduceat needs per-doc runs contiguous: regroup (uni then bi
        # per doc is already contiguous — feats appends per doc)
        starts = np.concatenate(([0], np.cumsum(np.asarray(lens, np.int64))[:-1]))
        sums = np.add.reduceat(contrib, starts)
        n = np.asarray(lens, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_feats": pa.array(n, pa.int64()),
                "score_fp": pa.array(sums.astype(np.int64), pa.int64()),
                "avg_weight": pa.array(
                    sums.astype(np.float64) / n.astype(np.float64), pa.float64()
                ),
                "label": pa.array(
                    np.where(sums >= 0, "keep", "discard").astype(object),
                    pa.string(),
                ),
            }
        )

    out = _docs(sf_dir).map_batches(apply, batch_format="pyarrow")
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return empty
    return pa.concat_tables(tbls).sort_by([("doc_id", "ascending")])


def source_overlap(sf_dir: str) -> pa.Table:
    """Cross-source vocabulary overlap — the corpus-comparison view of
    a WIMBD-style audit (Elazar et al., 2024): for every unordered pair
    of sources, the exact word-TYPE intersection size and Jaccard
    similarity. High overlap between two crawls flags redundant
    acquisition; near-zero overlap flags a domain outlier. Pairs with
    zero shared words are emitted too (a dashboard needs the zeros).

    Exactness: all counts are integers from one distinct-(source,word)
    reduction; ``jaccard`` is one shared IEEE division — hash-exact vs
    the SQL oracle.

    Ray shape: in-batch np.unique distinct partials -> ONE
    (source,word)-keyed groupby (the ``source_divergence`` composite-key
    pattern); the reduced table is Zipf-bounded x S sources and lands
    on the driver, where per-word source BITMASKS collapse it to a
    histogram of distinct masks (driver pair math is O(distinct_masks
    x S^2), S = #sources). Web-scale: keep the same first shuffle but
    fold the bitmask OR into an AggregateFn and reduce the mask
    HISTOGRAM per block so the driver never sees the word table —
    O(2^S) state, with S bounded by catalog design.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        from .hashing import split_words

        keys: list[str] = []
        for source, text in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            for w in set(split_words(text)):
                keys.append(f"{source}\x00{w}")
        if not keys:
            return pa.table(
                {"sk": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        uniq = np.unique(np.asarray(keys, dtype=object))
        return pa.table(
            {
                "sk": pa.array(list(uniq), pa.string()),
                "n": pa.array(np.ones(len(uniq), np.int64), pa.int64()),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    agg = docs.map_batches(partial, batch_format="pyarrow").groupby("sk").sum("n")
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_words_a": pa.array([], pa.int64()),
            "n_words_b": pa.array([], pa.int64()),
            "n_shared": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if not tables:
        return empty
    sk = pa.concat_tables(tables).column("sk").to_pylist()
    srcs = np.asarray([k.split("\x00", 1)[0] for k in sk], dtype=object)
    words = np.asarray([k.split("\x00", 1)[1] for k in sk], dtype=object)
    usrc, sinv = np.unique(srcs, return_inverse=True)
    s = len(usrc)
    if s < 2:
        return empty
    if s > 64:
        raise ValueError(f"source_overlap: bitmask path supports <= 64 sources, got {s}")
    uw, winv = np.unique(words, return_inverse=True)
    mask = np.zeros(len(uw), np.uint64)
    np.bitwise_or.at(mask, winv, np.uint64(1) << sinv.astype(np.uint64))
    umask, mcount = np.unique(mask, return_counts=True)
    bits = (umask[:, None] >> np.arange(s, dtype=np.uint64)[None, :]) & np.uint64(1)
    per_source = (bits * mcount[:, None]).sum(axis=0).astype(np.int64)
    rows = {k: [] for k in empty.column_names}
    for i in range(s):
        for j in range(i + 1, s):
            both = ((bits[:, i] & bits[:, j]) * mcount).sum()
            na, nb = int(per_source[i]), int(per_source[j])
            rows["source_a"].append(str(usrc[i]))
            rows["source_b"].append(str(usrc[j]))
            rows["n_words_a"].append(na)
            rows["n_words_b"].append(nb)
            rows["n_shared"].append(int(both))
            rows["jaccard"].append(float(both) / float(na + nb - both))
    return pa.table(
        {
            "source_a": pa.array(rows["source_a"], pa.string()),
            "source_b": pa.array(rows["source_b"], pa.string()),
            "n_words_a": pa.array(rows["n_words_a"], pa.int64()),
            "n_words_b": pa.array(rows["n_words_b"], pa.int64()),
            "n_shared": pa.array(rows["n_shared"], pa.int64()),
            "jaccard": pa.array(rows["jaccard"], pa.float64()),
        }
    )
