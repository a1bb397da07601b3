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


import functools


@functools.lru_cache(maxsize=4)
def _hasher(num_perm: int) -> MinHasher:
    # cached per worker PROCESS: task-based map_batches reuses workers,
    # so this gets the warm-state benefit without actor-pool startup
    # latency (MinHasher construction is microseconds anyway)
    return MinHasher(num_perm=num_perm, seed=1)


def _signature_batch(batch: pa.Table, num_perm: int, bands: int, shingle_k: int) -> pa.Table:
    mh = _hasher(num_perm)
    rows_per_band = num_perm // bands
    doc_ids: list[int] = []
    band_ids: list[int] = []
    band_keys: list[str] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sig = mh.signature(hash_tokens(shingles(text, shingle_k)))
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
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
        _signature_batch,
        fn_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_size=256,
        batch_format="pyarrow",
    )

    # Bucket-collision detection: a per-group map_groups over ~bands x
    # n_docs mostly-singleton buckets pays Python overhead per group.
    # Instead: vectorized count per bucket (C aggregation), keep only
    # hot buckets (collisions are rare by construction), then one
    # vectorized filter pass collects the colliding rows.
    sig = ds.materialize()
    counts = sig.groupby(["band", "key"]).count().to_pandas()
    hot = counts[counts["count()"] > 1]
    if hot.empty:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    hot_keys = set(zip(hot["band"].tolist(), hot["key"].tolist()))

    def keep_hot(batch: pa.Table) -> pa.Table:
        mask = [
            (b, k) in hot_keys
            for b, k in zip(batch.column("band").to_pylist(), batch.column("key").to_pylist())
        ]
        return batch.filter(pa.array(mask))

    cand = pa.concat_tables(
        ray.get(sig.map_batches(keep_hot, batch_format="pyarrow").to_arrow_refs())
    )
    buckets: dict[tuple, list[int]] = {}
    for b, k, d in zip(
        cand.column("band").to_pylist(),
        cand.column("key").to_pylist(),
        cand.column("doc_id").to_pylist(),
    ):
        buckets.setdefault((b, k), []).append(d)
    uniq = sorted(
        {
            (ids[i], ids[j])
            for ids in map(sorted, buckets.values())
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        }
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
