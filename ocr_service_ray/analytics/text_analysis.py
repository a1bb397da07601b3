"""Text analysis operators over the ``documents`` table.

All stateless vectorized ``map_batches`` stages. Where a DuckDB oracle
exists, the Python expression is written to be IEEE/semantics-identical
to the SQL form (same regex engine-compatible patterns, same integer
counts, same division order) so the driver's value-hash comparison is
exact, not approximate.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from .hashing import md5_hex, normalize_text

_TOKEN = re.compile(r"\S+")
_SUBWORD = re.compile(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]")
_PUNCT = re.compile(r"[.,;:!?]")
_ALPHA = re.compile(r"[A-Za-z]")
_STOPWORDS = re.compile(r"\b(the|a|of|and|in|to|is)\b")

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


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    """Heuristic language id: stopword votes + script ranges.

    SQL-oracled: distinct-marker votes per language + a CASE-chain argmax
    with first-language-wins ties (matching the dict iteration order).
    """

    def lid(batch: pa.Table) -> pa.Table:
        cjk = re.compile("[一-鿿]")
        preds = []
        for t in batch.column("text").to_pylist():
            t = t or ""
            if cjk.search(t):
                preds.append("zh")
                continue
            words = set(t.lower().split())
            best, best_n = "en", -1
            for lang, markers in _LANG_MARKERS.items():
                n = sum(1 for m in markers if m in words)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds)})

    return _docs(sf_dir).map_batches(lid, batch_format="pyarrow")
