"""Deduplication operators over the ``documents`` table.

The reference's only dedup is per-receipt dedupe-by-sq
(/root/reference/app/ocr_engine.py:264-282, reimplemented in
stages/ocr/layout.py). At 100 TB a training-data engine needs corpus-
level dedup; these operators are the canonical Ray Data shapes:

- exact:    hash-partition (groupby on content hash) + min-per-group
- MinHash:  shingle → signature (vectorized, warm actor state) → LSH
            band buckets → groupby(bucket) emits candidate pairs →
            exact-Jaccard verification of candidates only
- SimHash:  64-bit signature per doc (stateless vectorized map)
- embedding near-dup: block x broadcast-matrix cosine (ray.put once,
  zero-copy numpy view in every task), emit pairs above threshold

Scale notes: the only all-to-all ops are the content-hash groupby
(exact) and the tiny band-bucket groupby (LSH); candidate verification
touches only bucket-colliding pairs, never the n^2 cross product. The
brute-force embedding pass is the correctness baseline; the LSH/IVF
path in similarity.py is the scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .hashing import (
    MinHasher,
    hash_tokens,
    jaccard,
    md5_hex,
    normalize_text,
    shingles,
    simhash64,
)


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ----------------------------------------------------------------------
# Exact dedup


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Keep min(doc_id) per normalized-content hash.

    Ray shape: stateless hash map_batches → groupby(hash).min(doc_id)
    (ONE shuffle, keys are digests so the hash partitioning is uniform).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [md5_hex(normalize_text(t)) for t in batch.column("text").to_pylist()]
        return pa.table({"h": pa.array(hashes), "doc_id": batch.column("doc_id")})

    ds = _docs(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    out = ds.groupby("h").min("doc_id")
    return out.select_columns(["min(doc_id)"]).rename_columns({"min(doc_id)": "doc_id"})


# ----------------------------------------------------------------------
# MinHash + LSH near-dup


class _SignatureStage:
    """Warm MinHasher per actor; vectorized signature per doc."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int):
        self.mh = MinHasher(num_perm=num_perm, seed=1)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        band_ids: list[int] = []
        band_keys: list[str] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = self.mh.signature(hash_tokens(shingles(text, self.shingle_k)))
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_keys.append(chunk.tobytes().hex())
        return pa.table(
            {
                "band": pa.array(band_ids, type=pa.int32()),
                "key": pa.array(band_keys),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
            }
        )


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
) -> pa.Table:
    """Near-duplicate pairs via MinHash-LSH with exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) for verified pairs above threshold.
    """
    ds = _docs(sf_dir).map_batches(
        _SignatureStage,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
        concurrency=(1, 4),
        batch_format="pyarrow",
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
        )

    cand = (
        ds.groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_arrow_refs()
    )
    tables = [t for t in ray.get(cand) if t.num_rows]
    if not tables:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    pairs = pa.concat_tables(tables)
    # dedup candidate pairs across bands (small driver-side set)
    uniq = sorted(
        set(zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()))
    )
    # exact verification of candidates only (distributed)
    need_ids = {d for p in uniq for d in p}
    texts = {}
    for batch in _docs(sf_dir).iter_batches(batch_format="pyarrow"):
        for doc_id, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            if doc_id in need_ids:
                texts[doc_id] = set(shingles(text, shingle_k))
    out_a, out_b, out_j = [], [], []
    for a, b in uniq:
        j = jaccard(texts.get(a, set()), texts.get(b, set()))
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return pa.table(
        {
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "jaccard": pa.array(out_j, type=pa.float64()),
        }
    )


# ----------------------------------------------------------------------
# SimHash fingerprints


def simhash_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """64-bit SimHash per document (stateless vectorized map)."""

    def sh(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            words = normalize_text(text).split()
            uniq, counts = np.unique(np.array(words, dtype=object), return_counts=True)
            out.append(simhash64(hash_tokens(list(uniq)), counts.astype(np.float64)))
        # int64 view of the uint64 fingerprint (Arrow-friendly)
        signed = np.array(out, dtype=np.uint64).view(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(signed)})

    return _docs(sf_dir).map_batches(sh, batch_format="pyarrow")


# ----------------------------------------------------------------------
# Embedding cosine near-dup


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Pairs (a < b) of embeddings with cosine similarity > threshold.

    Broadcast pattern: the (n, d) normalized matrix is ``ray.put`` ONCE;
    every task reads it zero-copy from the object store and matmuls its
    block against it — no pairwise shuffle. Baseline for the LSH/IVF
    scale path (similarity.py).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = np.vstack(full["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)

    def block_pairs(batch: pa.Table) -> pa.Table:
        m = ray.get(mat_ref)
        all_ids = ray.get(ids_ref)
        bids = np.asarray(batch.column("vec_id"))
        bmat = np.vstack(batch.column("embedding").to_pylist()).astype(np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ m.T
        bi, gj = np.nonzero(sims > threshold)
        a = bids[bi]
        b = all_ids[gj]
        keep = a < b  # each unordered pair once
        return pa.table(
            {
                "vec_a": pa.array(a[keep], type=pa.int64()),
                "vec_b": pa.array(b[keep], type=pa.int64()),
            }
        )

    out = ds.map_batches(block_pairs, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs())]
    )
    return tbl.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])
