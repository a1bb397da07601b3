"""Deduplication operators over the ``documents`` table.

The reference's only dedup is per-receipt dedupe-by-sq
(/root/reference/app/ocr_engine.py:264-282, reimplemented in
stages/ocr/layout.py). At 100 TB a training-data engine needs corpus-
level dedup; these operators are the canonical Ray Data shapes:

- exact:    hash-partition (groupby on content hash) + min-per-group
- MinHash:  shingle → signature (vectorized) → LSH band buckets →
            distributed bucket aggregate → distributed pair emission →
            exact-Jaccard verify of candidates (broadcast shingle dict)
- n-gram Jaccard: EXACT pairs via the inverted-index join (posting
            lists per shingle hash → co-occurrence counts) — the same
            plan the SQL oracle runs; the sketch path is the scale path
- SimHash:  64-bit signature per doc (stateless vectorized map; token
            hash = md5-lower64 so DuckDB can replicate it exactly)
- embedding near-dup: EXACT block-pair join over object-store block
            refs (one task per block pair, never a driver-side matrix)

Scale notes: the only corpus-sized all-to-all ops are the content-hash
groupby (exact), the band-bucket groupby (LSH), and the posting-list
groupby (ngram); every candidate/verify structure is bounded by the
duplicate rate, not the corpus — the driver never holds corpus-sized
state. Exact embedding all-pairs is O(n^2) compute by definition; the
sub-quadratic approximate route is IVF/LSH in similarity.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .vectors import _emb_matrix

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


def _collect(ds: "ray.data.Dataset", empty_schema: pa.Schema) -> pa.Table:
    """Concat a (small) dataset's Arrow blocks, tolerating the degenerate
    schemas Ray attaches to EMPTY shuffle output blocks (null-typed
    columns), which break a naive ``pa.concat_tables``."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tables:
        return empty_schema.empty_table()
    return pa.concat_tables(tables)


# ----------------------------------------------------------------------
# Exact dedup

# exact_dedup / cross_snapshot_dupes / snapshot_set_ops /
# curation_status all start from the same (doc_id, md5-of-normalized-
# text) table; memoize the MATERIALIZED fingerprint dataset per corpus
# so the family pays for ONE normalize+md5 pass per process (the same
# pattern as the pipeline's blob_scan cache and dedup's _PAIRS_CACHE).
# The pinned blocks are (int64, 32-char hex) — tiny next to the corpus.
_FP_CACHE: dict[str, "ray.data.Dataset"] = {}


def fingerprint_table(sf_dir: str) -> "ray.data.Dataset":
    ds = _FP_CACHE.get(sf_dir)
    if ds is None:

        def fp(batch: pa.Table) -> pa.Table:
            hashes = [
                md5_hex(normalize_text(t)) for t in batch.column("text").to_pylist()
            ]
            return pa.table({"h": pa.array(hashes), "doc_id": batch.column("doc_id")})

        ds = _docs(sf_dir).map_batches(fp, batch_format="pyarrow").materialize()
        _FP_CACHE[sf_dir] = ds
    return ds


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Keep min(doc_id) per normalized-content hash.

    Ray shape: stateless hash map_batches → groupby(hash).min(doc_id)
    (ONE shuffle, keys are digests so the hash partitioning is uniform).
    """
    ds = fingerprint_table(sf_dir)
    out = ds.groupby("h").min("doc_id")
    return out.select_columns(["min(doc_id)"]).rename_columns({"min(doc_id)": "doc_id"})


def soft_dedup_weights(sf_dir: str) -> "ray.data.Dataset":
    """SoftDeDup: keep EVERY document but down-weight exact duplicates
    to ``1 / n_copies`` so a sampler sees each distinct content once in
    expectation (soft deduplication — reweight-not-remove, the
    alternative the hard ``exact_dedup`` policy discards; cf. the
    reference's dedupe-by-sq keep-best policy at
    /root/reference/app/ocr_engine.py:253-263, which is the hard form).

    Output: ``(doc_id, n_copies, weight)`` for every document.

    Distributed shape: the memoized fingerprint pass, then ONE
    groupby(h).count() whose *filtered* result (hashes with count >= 2
    — O(dup groups), the duplicate rate, not the corpus) is broadcast
    via ``ray.put`` and applied in a stateless map over the fingerprint
    table. Unique docs (the overwhelming majority at 100 TB) never
    leave their block: weight defaults to 1.0 without a lookup hit.
    """
    ds = fingerprint_table(sf_dir)
    counts = ds.groupby("h").count()

    def dups_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("count()"), pa.scalar(2)))

    dup_tables = [
        t
        for t in ray.get(
            counts.map_batches(dups_only, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    dup_counts: dict[str, int] = {}
    for t in dup_tables:
        dup_counts.update(
            zip(t.column("h").to_pylist(), t.column("count()").to_pylist())
        )
    dup_ref = ray.put(dup_counts)

    def weigh(batch: pa.Table) -> pa.Table:
        dc = ray.get(dup_ref)
        ns = [dc.get(h, 1) for h in batch.column("h").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_copies": pa.array(ns, pa.int64()),
                "weight": pa.array([1.0 / n for n in ns], pa.float64()),
            }
        )

    return ds.map_batches(weigh, batch_format="pyarrow")


# ----------------------------------------------------------------------
# MinHash + LSH near-dup


import functools


@functools.lru_cache(maxsize=4)
def _hasher(num_perm: int) -> MinHasher:
    # cached per worker PROCESS: task-based map_batches reuses workers,
    # so this gets the warm-state benefit without actor-pool startup
    # latency (MinHasher construction is microseconds anyway)
    return MinHasher(num_perm=num_perm, seed=1)


# minhash_lsh_pairs and cross_snapshot_neardup run the identical
# shingle->minhash->band signature pass (the dominant cost of either);
# memoize the materialized signature table per (corpus, params) so the
# second family member free-rides (the _FP_CACHE pattern).
_SIG_CACHE: dict[tuple, "ray.data.Dataset"] = {}


def _signatures(
    sf_dir: str, num_perm: int, bands: int, shingle_k: int
) -> "ray.data.Dataset":
    key = (sf_dir, num_perm, bands, shingle_k)
    ds = _SIG_CACHE.get(key)
    if ds is None:
        ds = (
            _docs(sf_dir)
            .map_batches(
                _signature_batch,
                fn_kwargs={
                    "num_perm": num_perm, "bands": bands, "shingle_k": shingle_k
                },
                batch_size=256,
                batch_format="pyarrow",
            )
            .materialize()
        )
        _SIG_CACHE[key] = ds
    return ds


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


# minhash_pairs / neardup_clusters / singleton_docs all consume the
# same verified pair list; memoize it per (corpus, params) so the three
# queries pay for ONE LSH pass per process (same pattern as the
# pipeline's blob_scan cache).
_PAIRS_CACHE: dict[tuple, pa.Table] = {}


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
    max_bucket: int = 256,
) -> pa.Table:
    """Near-duplicate pairs via MinHash-LSH with exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) for verified pairs above threshold.

    Fully distributed shape (the Spark-textbook LSH plan, no driver-side
    corpus-sized state):

    1. signature map_batches -> (band, key, doc_id) rows           [map]
    2. groupby(band, key).aggregate(collect doc_ids)               [shuffle 1:
       the ONLY corpus-sized exchange; keys are hash digests so the
       partitioning is uniform]
    3. vectorized pair emission from multi-doc buckets only        [map]
    4. groupby(doc_a, doc_b) distinct                              [shuffle 2:
       O(candidate pairs), tiny by construction]
    5. exact-Jaccard verify: broadcast the candidate doc-id set
       (``ray.put`` once, O(candidates)), extract shingle sets for
       ONLY those docs in a distributed pass over documents, then
       verify pairs against the broadcast shingle dict              [map]

    Driver memory is O(verified result + candidate shingle sets) —
    proportional to the duplicate rate, never to the corpus.

    Hot-bucket bound: a degenerate bucket of k colliding docs (k
    boilerplate-identical pages at web scale) would emit k(k-1)/2 pairs
    inside ONE task. Buckets larger than ``max_bucket`` instead emit
    STAR pairs to the bucket's min doc_id — O(k) output, and the
    cluster stays connected through that representative (identical docs
    co-bucket in every band with the same min, so dedup-by-component is
    unaffected). Recall consequence, documented: a pair of two
    non-representative members of an oversized bucket is reported only
    if some other (smaller) bucket also contains both. Precision is
    untouched — every emitted candidate still passes the exact-Jaccard
    verify. The cap never triggers on the sf corpora (pairs identical
    with the cap disabled); the adversarial identical-cluster test pins
    the bounded-output behavior.
    """
    cache_key = (sf_dir, num_perm, bands, shingle_k, threshold, max_bucket)
    cached = _PAIRS_CACHE.get(cache_key)
    if cached is not None:
        return cached
    from ray.data.aggregate import AggregateFn

    sig = _signatures(sf_dir, num_perm, bands, shingle_k)

    # shuffle 1: bucket doc_ids per (band, key). accumulate_block gets the
    # group's rows as one Arrow slice -> vectorized per bucket.
    collect_ids = AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda acc, block: acc + block.column("doc_id").to_pylist(),
        merge=lambda a, b: a + b,
        name="docs",
    )
    buckets = sig.groupby(["band", "key"]).aggregate(collect_ids)

    def emit_pairs(batch: pa.Table) -> pa.Table:
        out_a: list[int] = []
        out_b: list[int] = []
        for ids in batch.column("docs").to_pylist():
            if len(ids) < 2:
                continue  # singleton buckets (the overwhelming majority)
            ids = sorted(set(ids))
            if len(ids) > max_bucket:
                # hot bucket: O(k) star pairs to the representative
                rep = ids[0]
                out_a.extend([rep] * (len(ids) - 1))
                out_b.extend(ids[1:])
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64())}
        )

    # shuffle 2 (tiny): the same pair fires in several bands; distinct it
    # distributedly before paying verification.
    distinct = (
        buckets.map_batches(emit_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
    )
    pair_tbl = _collect(
        distinct,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("count()", pa.int64())]),
    )  # O(candidates)
    if len(pair_tbl) == 0:
        out = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
        _PAIRS_CACHE[cache_key] = out
        return out
    a_ids = pair_tbl.column("doc_a").to_pylist()
    b_ids = pair_tbl.column("doc_b").to_pylist()
    need_ref = ray.put(frozenset(a_ids) | frozenset(b_ids))

    # distributed shingle-set extraction for candidate docs only
    def cand_shingles(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids, sets = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if doc_id in need:
                ids.append(doc_id)
                sets.append(sorted(set(shingles(text, shingle_k))))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "sh": pa.array(sets, pa.list_(pa.string()))}
        )

    sh_blocks = [
        t
        for t in ray.get(
            _docs(sf_dir)
            .map_batches(cand_shingles, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows  # Ray 2.49 emits schema-less empty blocks
    ]
    sh_tbl = (
        pa.concat_tables(sh_blocks)
        if sh_blocks
        else pa.table(
            {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.list_(pa.string()))}
        )
    )
    sh_ref = ray.put(
        dict(zip(sh_tbl.column("doc_id").to_pylist(),
                 (set(s) for s in sh_tbl.column("sh").to_pylist())))
    )

    # distributed exact verification over the candidate-pair dataset
    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()):
            j = jaccard(sh.get(a, set()), sh.get(b, set()))
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pa.table(
            {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(out_j, pa.float64())}
        )

    verified = ray.data.from_arrow(pair_tbl.select(["doc_a", "doc_b"])).map_batches(
        verify, batch_format="pyarrow"
    )
    tbl = _collect(
        verified,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]),
    )
    out = tbl.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
    _PAIRS_CACHE[cache_key] = out
    return out


# ----------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index join — no sketch)


def ngram_jaccard_pairs(
    sf_dir: str, shingle_k: int = 5, threshold: float = 0.6, max_posting: int = 512
) -> pa.Table:
    """EXACT word-k-shingle Jaccard pairs >= threshold.

    A different distributed shape from MinHash-LSH: the classic
    inverted-index join (the same plan the DuckDB oracle runs):

    1. (shingle_hash, doc_id) posting rows, DISTINCT per doc       [map]
    2. groupby(shingle_hash) -> postings list -> co-occurring
       pair increments                                             [shuffle 1]
    3. groupby(doc_a, doc_b).sum -> intersection size c            [shuffle 2,
       O(co-occurring pairs)]
    4. |A|,|B| from a filtered distributed pass + broadcast;
       jaccard = c / (|A| + |B| - c)                               [map]

    Exactness rests on 64-bit blake2b shingle hashing (collision prob
    ~ n_shingles^2 / 2^64, negligible and deterministic). Compute is
    O(sum of posting-list sizes squared): right when near-dup shingles
    are rare; the sketch path (minhash_lsh_pairs) is the scale path
    when they are not.

    Hot-posting bound: a stop-shingle shared by k docs would emit
    k(k-1)/2 increments in one task. Posting lists longer than
    ``max_posting`` are deterministically truncated to the max_posting
    SMALLEST doc_ids before pairing, bounding per-bucket output at
    O(max_posting^2). Consequence, documented: the result is EXACT iff
    no posting exceeds the cap (true on the sf corpora — pairs
    identical with the cap disabled); above it, the intersection count
    c loses the truncated shingle's contribution for pairs outside the
    kept prefix, so jaccard is only ever UNDER-estimated — precision is
    preserved (every reported pair is a true >= threshold pair among
    the kept index), recall degrades on hot-shingle pairs. The
    identical-cluster fixture pins the bound; the LSH path remains the
    recall-safe route for hot corpora.
    """
    inter_tbl, sizes = _shingle_intersections(sf_dir, shingle_k, max_posting)
    if len(inter_tbl) == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    a_ids = inter_tbl.column("doc_a").to_pylist()
    b_ids = inter_tbl.column("doc_b").to_pylist()
    c = np.asarray(inter_tbl.column("count()"), dtype=np.int64)
    na = np.array([sizes[a] for a in a_ids], dtype=np.int64)
    nb = np.array([sizes[b] for b in b_ids], dtype=np.int64)
    jac = c / (na + nb - c)
    keep = jac >= threshold
    out = pa.table(
        {
            "doc_a": pa.array(np.asarray(a_ids)[keep], pa.int64()),
            "doc_b": pa.array(np.asarray(b_ids)[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        }
    )
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# process memo for the shared inverted-index core: ngram_jaccard_pairs
# and containment_pairs call it with identical default params and only
# differ in final scoring — one entry serves both (the _PAIRS_CACHE /
# _SIG_CACHE family pattern; result is pair-domain bounded).
_SHINGLE_CACHE: dict[tuple, tuple] = {}


def _shingle_intersections(
    sf_dir: str, shingle_k: int, max_posting: int
) -> tuple[pa.Table, dict]:
    """Shared inverted-index core for the exact shingle-set joins
    (``ngram_jaccard_pairs``, ``containment_pairs``): returns the
    co-occurrence table (doc_a, doc_b, count()) and the {doc_id:
    |shingle set|} sizes for every candidate. Same plan, hot-posting
    truncation and hashing notes as documented on ngram_jaccard_pairs."""
    from ray.data.aggregate import AggregateFn

    memo_key = (os.path.abspath(sf_dir), shingle_k, max_posting)
    if memo_key in _SHINGLE_CACHE:
        return _SHINGLE_CACHE[memo_key]

    docs = _docs(sf_dir)

    def postings(batch: pa.Table) -> pa.Table:
        hs: list[int] = []
        ids: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            uniq = set(shingles(text, shingle_k))
            sig = hash_tokens(sorted(uniq)).view(np.int64)
            hs.extend(sig.tolist())
            ids.extend([doc_id] * len(sig))
        return pa.table(
            {"h": pa.array(hs, pa.int64()), "doc_id": pa.array(ids, pa.int64())}
        )

    collect_ids = AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda acc, block: acc + block.column("doc_id").to_pylist(),
        merge=lambda a, b: a + b,
        name="docs",
    )
    buckets = docs.map_batches(postings, batch_format="pyarrow").groupby("h").aggregate(
        collect_ids
    )

    def emit_pairs(batch: pa.Table) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for ids in batch.column("docs").to_pylist():
            if len(ids) < 2:
                continue
            # deterministic stop-shingle truncation
            uniq = np.unique(np.asarray(ids, dtype=np.int64))[:max_posting]
            if len(uniq) < 2:
                continue
            ia, ib = np.triu_indices(len(uniq), 1)
            out_a.append(uniq[ia])
            out_b.append(uniq[ib])
        if not out_a:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {"doc_a": pa.array(np.concatenate(out_a), pa.int64()),
             "doc_b": pa.array(np.concatenate(out_b), pa.int64())}
        )

    inter = (
        buckets.map_batches(emit_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
    )
    inter_tbl = _collect(
        inter,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("count()", pa.int64())]),
    )
    if len(inter_tbl) == 0:
        _SHINGLE_CACHE[memo_key] = (inter_tbl, {})
        return inter_tbl, {}
    a_ids = inter_tbl.column("doc_a").to_pylist()
    b_ids = inter_tbl.column("doc_b").to_pylist()
    need_ref = ray.put(frozenset(a_ids) | frozenset(b_ids))

    def cand_sizes(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids, ns = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if doc_id in need:
                ids.append(doc_id)
                ns.append(len(set(shingles(text, shingle_k))))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(ns, pa.int64())}
        )

    sz_tbl = _collect(
        docs.map_batches(cand_sizes, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("n", pa.int64())]),
    )
    sizes = dict(zip(sz_tbl.column("doc_id").to_pylist(), sz_tbl.column("n").to_pylist()))
    _SHINGLE_CACHE[memo_key] = (inter_tbl, sizes)
    return inter_tbl, sizes


# ----------------------------------------------------------------------
# SimHash fingerprints


def simhash_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """64-bit SimHash per document (stateless vectorized map).

    Token hash is md5-lower64 (== DuckDB ``md5_number_lower``) so the
    whole sketch is replicable in SQL — the driver verifies it exactly.
    """
    from .hashing import md5_hash_tokens

    def sh(batch: pa.Table) -> pa.Table:
        from .hashing import split_words

        out = []
        for text in batch.column("text").to_pylist():
            words = split_words(text)
            uniq, counts = np.unique(np.array(words, dtype=object), return_counts=True)
            out.append(simhash64(md5_hash_tokens(list(uniq)), counts.astype(np.float64)))
        # int64 view of the uint64 fingerprint (Arrow-friendly)
        signed = np.array(out, dtype=np.uint64).view(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(signed)})

    return _docs(sf_dir).map_batches(sh, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy<2 lacks bitwise_count)."""
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(len(x), 64)
        .sum(axis=1)
        .astype(np.int64)
    )


def simhash_pairs(
    sf_dir: str, max_hamming: int = 3, bands: int = 4, max_bucket: int = 4096
) -> pa.Table:
    """SimHash near-duplicate PAIRS: (doc_a, doc_b, hamming) for every
    pair of documents whose 64-bit SimHash fingerprints differ in at
    most ``max_hamming`` bits — Manku/Jain/Das Sarma's web near-dup
    detection (WWW 2007), the bit-sketch complement of the MinHash LSH
    path.

    EXACT by pigeonhole, not probabilistic: the fingerprint is split
    into ``bands`` equal bit-chunks; a pair within hamming distance
    ``max_hamming`` < ``bands`` differs in at most ``max_hamming``
    chunks, so at least one chunk is IDENTICAL and the pair surfaces in
    that chunk's bucket. Candidates are verified with the true popcount
    in the same task (fingerprints travel with the bucket — no
    join-back, no broadcast of the fingerprint table).

    Ray shape: stateless fingerprint map -> (band, key) groupby (the
    only shuffle; bucket rows carry (doc_id, simhash)) -> per-bucket
    pair emission + exact hamming verify -> distinct-pair groupby
    (a pair fires once per identical band).

    Hot-bucket bound (same guard as ``minhash_lsh_pairs``): a
    boilerplate-heavy web corpus can put millions of identical- or
    near-identical-fingerprint docs into ONE band bucket, and naive
    all-pairs emission there is O(k^2) inside a single task. Buckets
    larger than ``max_bucket`` instead emit STAR pairs to the bucket's
    min doc_id, each still verified with the true popcount — O(k)
    output, and an identical-fingerprint cluster (hamming 0, the only
    realistic way a bucket gets huge) stays fully connected through
    the representative, which co-buckets with every member in every
    band. Recall consequence, documented: a qualifying pair of two
    non-representative members of an oversized bucket is reported only
    if some other (smaller) band bucket also contains both. Precision
    is untouched — every emitted pair carries its exact hamming and
    must pass ``<= max_hamming``. Unlike the MinHash path (16-byte
    digest keys, collisions only from true similarity), simhash band
    keys are just 64/bands bits, so ORDINARY buckets grow ~linearly
    with corpus size (measured: max 42 at sf0.01, 317 at sf0.1) — the
    default cap (4096) is sized an order of magnitude above that so
    it never binds at the oracle-verified scales (results identical
    with the cap disabled at sf0.01 AND sf0.1), while still bounding
    a degenerate task to ~8M emitted candidates. Web-scale callers
    tune it down and accept rep-connected recall, exactly as for
    ``minhash_lsh_pairs``. The adversarial identical-fingerprint test
    pins the bounded output.

    Pigeonhole exactness requires ``max_hamming < bands`` (otherwise a
    qualifying pair may differ in EVERY chunk and never co-bucket) and
    an even 64-bit split — both validated loudly rather than silently
    dropping pairs.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"simhash_pairs pigeonhole exactness requires max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands}): a pair at "
            f"distance >= bands can differ in every chunk and be missed"
        )
    if 64 % bands != 0:
        raise ValueError(f"bands must divide 64 evenly (got bands={bands})")
    from ray.data.aggregate import AggregateFn

    fp = simhash_fingerprints(sf_dir)
    band_bits = 64 // bands
    mask = (1 << band_bits) - 1

    def band_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()), "key": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "simhash": pa.array([], pa.int64())}
            )
        h = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        bs, ks, ds_, hs = [], [], [], []
        for b in range(bands):
            bs.append(np.full(n, b, np.int32))
            ks.append(((h >> (band_bits * b)) & mask).astype(np.int64))
            ds_.append(ids)
            hs.append(h.view(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bs), pa.int32()),
                "key": pa.array(np.concatenate(ks), pa.int64()),
                "doc_id": pa.array(np.concatenate(ds_), pa.int64()),
                "simhash": pa.array(np.concatenate(hs), pa.int64()),
            }
        )

    collect_rows = AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda acc, block: acc
        + list(zip(block.column("doc_id").to_pylist(),
                   block.column("simhash").to_pylist())),
        merge=lambda a, b: a + b,
        name="members",
    )
    buckets = fp.map_batches(band_partial, batch_format="pyarrow").groupby(
        ["band", "key"]
    ).aggregate(collect_rows)

    def emit_verified(batch: pa.Table) -> pa.Table:
        out_a: list[int] = []
        out_b: list[int] = []
        out_h: list[int] = []
        for members in batch.column("members").to_pylist():
            if len(members) < 2:
                continue
            # arrow roundtrips the (doc_id, simhash) tuples as lists
            members = sorted({(m[0], m[1]) for m in members})
            ids = np.array([m[0] for m in members], np.int64)
            hsh = np.array([m[1] for m in members], np.int64).view(np.uint64)
            if len(ids) > max_bucket:
                # hot bucket: O(k) star pairs to the min-doc_id
                # representative, each verified with the true popcount
                ia = np.zeros(len(ids) - 1, np.intp)
                ib = np.arange(1, len(ids), dtype=np.intp)
            else:
                ia, ib = np.triu_indices(len(ids), 1)
            ham = _popcount64(np.bitwise_xor(hsh[ia], hsh[ib]))
            keep = ham <= max_hamming
            out_a.extend(ids[ia][keep].tolist())
            out_b.extend(ids[ib][keep].tolist())
            out_h.extend(ham[keep].tolist())
        return pa.table(
            {"doc_a": pa.array(out_a, pa.int64()),
             "doc_b": pa.array(out_b, pa.int64()),
             "hamming": pa.array(out_h, pa.int64())}
        )

    distinct = (
        buckets.map_batches(emit_verified, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .min("hamming")
    )
    tbl = _collect(
        distinct,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("min(hamming)", pa.int64())]),
    )
    return pa.table(
        {
            "doc_a": tbl.column("doc_a"),
            "doc_b": tbl.column("doc_b"),
            "hamming": tbl.column("min(hamming)")
            if "min(hamming)" in tbl.column_names else tbl.column("hamming"),
        }
    ).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# ----------------------------------------------------------------------
# Embedding cosine near-dup


def _load_block(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(tbl.column("vec_id"))
    if len(ids) == 0:
        # degenerate empty shuffle/read block: np.vstack of an empty
        # list raises — return an empty matrix so the pair task emits
        # an empty table instead of crashing the query
        return ids, np.zeros((0, 1), dtype=np.float64)
    # _emb_matrix may return a read-only zero-copy view: normalize
    # out-of-place (same values, new buffer)
    m = _emb_matrix(tbl.column("embedding"))
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return ids, m


@ray.remote
def _block_pair_sims(ta: pa.Table, tb: pa.Table, threshold: float, same: bool) -> pa.Table:
    """Exact cosine pairs between two blocks, each unordered pair once.

    Same-block: keep the a < b wedge (both orders appear in the matmul).
    Cross-block: every unordered pair appears exactly once -> emit as
    (min, max)."""
    ids_a, ma = _load_block(ta)
    ids_b, mb = _load_block(tb)
    if len(ids_a) == 0 or len(ids_b) == 0:
        return pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
        )
    sims = ma @ mb.T
    ai, bj = np.nonzero(sims > threshold)
    a = ids_a[ai]
    b = ids_b[bj]
    if same:
        keep = a < b
        a, b = a[keep], b[keep]
    else:
        a, b = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(b, pa.int64())})


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Pairs (a < b) of embeddings with cosine similarity > threshold.

    EXACT all-pairs as a block-pair join: the dataset's Arrow blocks stay
    in the object store (zero-copy refs); one task per block pair (i <= j)
    matmuls the two blocks and emits its threshold survivors. The driver
    holds only block refs and the final (small) pair list — never the
    matrix. O(n^2) compute is inherent to exactness; the sub-quadratic
    path is the IVF/LSH candidate route (similarity.py, minhash), which
    is approximate by design. (This corpus's threshold pairs sit at
    cos ~ 0.45 — unclusterable grazes — so exactness here REQUIRES the
    full block-pair sweep; bucketed candidates provably miss ~30%.)
    """
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    refs = ds.to_arrow_refs()
    futs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futs.append(_block_pair_sims.remote(refs[i], refs[j], threshold, i == j))
    tbl = pa.concat_tables(ray.get(futs))
    return tbl.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


# ----------------------------------------------------------------------
# Near-dup clusters (connected components over verified pairs)


def neardup_clusters(sf_dir: str, stats: dict | None = None, **lsh_kwargs) -> pa.Table:
    """Connected components over the verified near-dup pairs:
    (doc_id, cluster_rep) where cluster_rep = min doc_id of the
    component — the assignment step that turns a pair list into the
    keep-one-per-cluster dedup decision.

    Distributed shape (BSP min-label propagation, every step a Ray
    groupby — no driver-side graph):

      labels(node) := node
      repeat: every node sends its label to its neighbors;
              new label := min(own, incoming)          [groupby(node)]
      until the label sum stops changing (monotone -> fixed point).

    Each iteration MATERIALIZES the label dataset — iterative lineage
    would otherwise re-execute all prior rounds per step. Propagation
    needs O(component diameter) rounds (near-dup clusters are shallow;
    pointer-doubling is the O(log n) upgrade if they ever are not, at
    the cost of a second shuffle per round). The pair list itself is
    O(duplicate rate), so edges are small relative to the corpus; the
    label table is bounded by the number of docs IN pairs, not the
    corpus.
    """
    pairs = lsh_kwargs.pop("pairs", None)
    if pairs is None:
        pairs = minhash_lsh_pairs(sf_dir, **lsh_kwargs)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster_rep": pa.array([], pa.int64())}
    )
    if len(pairs) == 0:
        return empty
    a = np.asarray(pairs.column("doc_a"), dtype=np.int64)
    b = np.asarray(pairs.column("doc_b"), dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes = np.unique(src)
    # edge rows: (node, cand=neighbor, label=null); label rows:
    # (node, cand=null, label) — same schema, union-able
    edges = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(src),
                "cand": pa.array(dst),
                "label": pa.array([None] * len(src), pa.int64()),
            }
        )
    ).materialize()
    labels = ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "label": pa.array(nodes)})
    ).materialize()
    prev_sum = None
    rounds = 0
    for _ in range(64):
        rounds += 1

        def send(group: pa.Table) -> pa.Table:
            lbl_np = group.column("label").to_numpy(zero_copy_only=False)
            is_label = ~np.isnan(lbl_np.astype(np.float64))
            lbl = int(lbl_np[is_label][0])
            cand_np = group.column("cand").to_numpy(zero_copy_only=False)
            out_nodes = cand_np[~is_label].astype(np.int64)
            node = int(group.column("node")[0].as_py())
            return pa.table(
                {
                    "node": pa.array(np.append(out_nodes, node), pa.int64()),
                    "cand": pa.array(
                        np.full(len(out_nodes) + 1, lbl, np.int64), pa.int64()
                    ),
                }
            )

        tagged = edges.union(
            labels.map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "cand": pa.array([None] * len(t), pa.int64()),
                        "label": t.column("label"),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        labels = (
            tagged.groupby("node")
            .map_groups(send, batch_format="pyarrow")
            .groupby("node")
            .min("cand")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError("neardup_clusters: no convergence in 64 rounds")
    if stats is not None:
        stats["rounds"] = rounds
    tbl = _collect(labels, pa.schema([("node", pa.int64()), ("label", pa.int64())]))
    return pa.table(
        {"doc_id": tbl.column("node"), "cluster_rep": tbl.column("label")}
    ).sort_by([("doc_id", "ascending")])


def embedding_components(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Single-linkage embedding clustering: connected components over
    the cosine-threshold pair graph — the cluster-ASSIGNMENT step the
    ``embedding_neardup`` pair list feeds (the vector-space analog of
    ``neardup_clusters``, which assigns over text-shingle pairs).
    Returns one row per VECTOR: (vec_id, cluster_rep) with cluster_rep
    = min vec_id of the component; a vector with no threshold neighbor
    is its own singleton cluster.

    Distributed shape — pure composition of two existing scale shapes:
    the exact block-pair cosine join (``embedding_neardup_pairs``,
    object-store block refs, driver holds only the pair list) feeds the
    BSP min-label-propagation components of ``neardup_clusters`` (every
    step a Ray groupby, label table bounded by pair MEMBERS); the full-
    domain fill is a broadcast map — the assignment dict is
    O(pair members) = O(duplicate rate), ``ray.put`` once, and the
    embeddings id column streams through a vectorized lookup, so no
    corpus-sized driver state and no extra shuffle.
    """
    pairs = embedding_neardup_pairs(sf_dir, threshold)
    cc = neardup_clusters(
        sf_dir,
        pairs=pa.table(
            {"doc_a": pairs.column("vec_a"), "doc_b": pairs.column("vec_b")}
        ),
    )
    rep = dict(
        zip(
            np.asarray(cc.column("doc_id"), dtype=np.int64).tolist(),
            np.asarray(cc.column("cluster_rep"), dtype=np.int64).tolist(),
        )
    )
    rep_ref = ray.put(rep)

    def assign(batch: pa.Table) -> pa.Table:
        m = ray.get(rep_ref)
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        out = np.fromiter(
            (m.get(int(i), int(i)) for i in ids), dtype=np.int64, count=len(ids)
        )
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "cluster_rep": pa.array(out, pa.int64())}
        )

    out = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(assign, batch_format="pyarrow")
    tbl = _collect(out, pa.schema([("vec_id", pa.int64()), ("cluster_rep", pa.int64())]))
    return tbl.sort_by([("vec_id", "ascending")])


def singleton_docs(sf_dir: str, **lsh_kwargs) -> pa.Table:
    """Broadcast ANTI-join: doc_ids with NO verified near-duplicate —
    the keep-side complement of the pair list. The pair-member set is
    O(duplicate rate), so it broadcasts (``ray.put`` once); documents
    stream through a vectorized NOT-IN filter — no shuffle. (The
    semi-join twin lives in windows.purchaser_clicks.)
    """
    pairs = minhash_lsh_pairs(sf_dir, **lsh_kwargs)
    members = frozenset(np.asarray(pairs.column("doc_a")).tolist()) | frozenset(
        np.asarray(pairs.column("doc_b")).tolist()
    )
    members_ref = ray.put(members)

    def keep(batch: pa.Table) -> pa.Table:
        ms = ray.get(members_ref)
        ids = np.asarray(batch.column("doc_id"))
        mask = np.fromiter((int(i) not in ms for i in ids), dtype=bool, count=len(ids))
        return pa.table({"doc_id": pa.array(ids[mask], pa.int64())})

    out = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(keep, batch_format="pyarrow")
    tbl = _collect(out, pa.schema([("doc_id", pa.int64())]))
    return tbl.sort_by([("doc_id", "ascending")])


def cross_snapshot_dupes(sf_dir: str) -> pa.Table:
    """Incremental (cross-snapshot) exact dedup: which docs of the NEW
    snapshot duplicate any doc of the BASE corpus — the
    dedup-the-new-crawl-against-the-archive pass, where re-fingerprint-
    grouping the union (plain ``exact_dedup``) would redo the archive
    every increment.

    Snapshots are modeled deterministically inside the one documents
    table: base = doc_id < T, new = doc_id >= T with
    T = (max(doc_id) + 1) // 2 (the oracle computes the same split).

    Ray shape — dedup as a BIG-BIG hash join (neither side broadcast):
      1. both sides fingerprint via the same stateless combiner;
         base collapses to DISTINCT hashes (groupby.min as witness)
      2. native ``Dataset.join`` on the digest — uniform keys, the
         only all-to-all; output is O(new-side duplicates)
    Returns (doc_id, base_doc_id): each duplicated new doc with the
    min base doc it duplicates.
    """
    import pyarrow.compute as pc

    fp_ds = fingerprint_table(sf_dir)
    t_split = (int(fp_ds.max("doc_id")) + 1) // 2

    def norm_base(batch: pa.Table) -> pa.Table:
        # empty shuffle partitions carry degenerate schemas (Ray 2.49)
        # which break the Acero join's key resolution — re-emit the
        # canonical schema unconditionally
        if batch.num_rows == 0 or "h" not in batch.column_names:
            return pa.table(
                {"h": pa.array([], pa.string()),
                 "base_doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {"h": batch.column("h"), "base_doc_id": batch.column("min(doc_id)")}
        )

    def side(keep_base: bool):
        # split the cached fingerprint table by the snapshot boundary
        # (a vectorized in-memory filter; on a cold cache this is the
        # same single corpus pass the old pruned double-read paid twice)
        def split(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "doc_id" not in batch.column_names:
                return pa.table(
                    {"h": pa.array([], pa.string()),
                     "doc_id": pa.array([], pa.int64())}
                )
            ids = pc.cast(batch.column("doc_id"), pa.int64())
            mask = (
                pc.less(ids, t_split) if keep_base else pc.greater_equal(ids, t_split)
            )
            kept = batch.filter(mask)
            return pa.table({"h": kept.column("h"), "doc_id": kept.column("doc_id")})

        return fp_ds.map_batches(split, batch_format="pyarrow")

    base = (
        side(keep_base=True)
        .groupby("h")
        .min("doc_id")
        .map_batches(norm_base, batch_format="pyarrow")
    )
    new = side(keep_base=False)
    # Ray 2.49's hash join breaks on EMPTY partitions (the aggregator
    # builds them schema-less) — size the partition count so every
    # partition statistically holds rows; at sf scale this is 16, on
    # tiny fixtures it degrades to a single-partition join.
    base = base.materialize()
    new = new.materialize()
    n_base, n_new = base.count(), new.count()
    if n_base == 0 or n_new == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "base_doc_id": pa.array([], pa.int64())}
        )
    nparts = max(1, min(16, min(n_base, n_new) // 16))
    joined = new.join(base, "inner", nparts, on=("h",))
    tables = [
        t.select(["doc_id", "base_doc_id"])
        for t in ray.get(joined.to_arrow_refs())
        if t.num_rows
    ]
    if not tables:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "base_doc_id": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])

def cross_snapshot_neardup(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
    max_bucket: int = 256,
) -> pa.Table:
    """Incremental NEAR-dup: which docs of the NEW snapshot are
    near-duplicates (shingle-Jaccard >= threshold) of any BASE-corpus
    doc — the fuzzy twin of ``cross_snapshot_dupes``. Same deterministic
    split: base = doc_id < T, new = doc_id >= T, T = (max+1)//2.

    The plan is ``minhash_lsh_pairs``'s distributed LSH with one
    load-bearing change: pair emission is CROSS-SIDE ONLY. Bucket ids
    are split into base/new at emission time, so archive-internal
    duplicate clusters — the dominant pair volume in a mature corpus —
    never materialize anywhere; candidate count, verify work and driver
    state are all O(new-side near-dups), which is what makes the pass
    incremental rather than a recompute.

    Hot-bucket bound (same contract as the full LSH): an oversized
    bucket emits O(|new|) star pairs from the bucket's MIN BASE id
    instead of |base|x|new|; precision is untouched (exact verify),
    recall caveat identical to minhash_lsh_pairs.

    Returns (doc_id [new side], base_doc_id, jaccard), all verified
    exact pairs, sorted.
    """
    from ray.data.aggregate import AggregateFn

    docs = _docs(sf_dir)
    t_split = (int(docs.max("doc_id")) + 1) // 2

    sig = _signatures(sf_dir, num_perm, bands, shingle_k)
    collect_ids = AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda acc, block: acc + block.column("doc_id").to_pylist(),
        merge=lambda a, b: a + b,
        name="docs",
    )
    buckets = sig.groupby(["band", "key"]).aggregate(collect_ids)

    def emit_cross_pairs(batch: pa.Table) -> pa.Table:
        out_b: list[int] = []
        out_n: list[int] = []
        for ids in batch.column("docs").to_pylist():
            if len(ids) < 2:
                continue
            ids = sorted(set(ids))
            base = [i for i in ids if i < t_split]
            new = [i for i in ids if i >= t_split]
            if not base or not new:
                continue  # intra-side buckets carry no incremental work
            if len(ids) > max_bucket:
                rep = base[0]
                out_b.extend([rep] * len(new))
                out_n.extend(new)
                continue
            for nb in base:
                out_b.extend([nb] * len(new))
                out_n.extend(new)
        return pa.table(
            {"base_doc_id": pa.array(out_b, pa.int64()),
             "doc_id": pa.array(out_n, pa.int64())}
        )

    distinct = (
        buckets.map_batches(emit_cross_pairs, batch_format="pyarrow")
        .groupby(["base_doc_id", "doc_id"])
        .count()
    )
    pair_tbl = _collect(
        distinct,
        pa.schema(
            [("base_doc_id", pa.int64()), ("doc_id", pa.int64()), ("count()", pa.int64())]
        ),
    )
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "base_doc_id": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    if len(pair_tbl) == 0:
        return empty
    return _verify_cross_pairs(sf_dir, pair_tbl, shingle_k, threshold)


def _verify_cross_pairs(
    sf_dir: str, pair_tbl: pa.Table, shingle_k: int, threshold: float
) -> pa.Table:
    """Shared exact-verify tail for the incremental near-dup plans
    (recompute and indexed probe): broadcast the candidate docs'
    shingle sets (O(candidates), the duplicate-rate bound) and emit
    only pairs with true Jaccard >= threshold."""
    docs = _docs(sf_dir)
    need_ref = ray.put(
        frozenset(pair_tbl.column("base_doc_id").to_pylist())
        | frozenset(pair_tbl.column("doc_id").to_pylist())
    )

    def cand_shingles(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids, sets = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if doc_id in need:
                ids.append(doc_id)
                sets.append(sorted(set(shingles(text, shingle_k))))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "sh": pa.array(sets, pa.list_(pa.string()))}
        )

    sh_blocks = [
        t
        for t in ray.get(
            docs.map_batches(cand_shingles, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    sh_tbl = (
        pa.concat_tables(sh_blocks)
        if sh_blocks
        else pa.table(
            {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.list_(pa.string()))}
        )
    )
    sh_ref = ray.put(
        dict(zip(sh_tbl.column("doc_id").to_pylist(),
                 (set(s) for s in sh_tbl.column("sh").to_pylist())))
    )

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        out_n, out_b, out_j = [], [], []
        for b, n in zip(
            batch.column("base_doc_id").to_pylist(), batch.column("doc_id").to_pylist()
        ):
            j = jaccard(sh.get(b, set()), sh.get(n, set()))
            if j >= threshold:
                out_n.append(n)
                out_b.append(b)
                out_j.append(j)
        return pa.table(
            {"doc_id": pa.array(out_n, pa.int64()),
             "base_doc_id": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(out_j, pa.float64())}
        )

    verified = ray.data.from_arrow(
        pair_tbl.select(["base_doc_id", "doc_id"])
    ).map_batches(verify, batch_format="pyarrow")
    tbl = _collect(
        verified,
        pa.schema(
            [("doc_id", pa.int64()), ("base_doc_id", pa.int64()), ("jaccard", pa.float64())]
        ),
    )
    return tbl.sort_by([("doc_id", "ascending"), ("base_doc_id", "ascending")])

def snapshot_set_ops(sf_dir: str) -> pa.Table:
    """Distinct-fingerprint SET OPS across the snapshot split (same
    deterministic T as the cross-snapshot operators): how many distinct
    content fingerprints are in the base only (EXCEPT), the new
    snapshot only (reverse EXCEPT), both (INTERSECT), and either
    (UNION) — the crawl-drift dashboard numbers.

    Ray shape: fingerprint map with 0/1 side flags → ONE groupby(h)
    taking max(side) flags (the only corpus-sized shuffle, uniform
    digest keys) → per-block category bincount partials → O(blocks)
    driver sum. No fingerprint list ever reaches the driver.
    """
    fp_ds = fingerprint_table(sf_dir)
    t_split = (int(fp_ds.max("doc_id")) + 1) // 2

    def flag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {"h": pa.array([], pa.string()),
                 "in_base": pa.array([], pa.int64()),
                 "in_new": pa.array([], pa.int64())}
            )
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table(
            {"h": batch.column("h"),
             "in_base": pa.array((ids < t_split).astype(np.int64), pa.int64()),
             "in_new": pa.array((ids >= t_split).astype(np.int64), pa.int64())}
        )

    flags = (
        fp_ds.map_batches(flag, batch_format="pyarrow")
        .groupby("h")
        .max(["in_base", "in_new"])
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "max(in_base)" not in batch.column_names:
            z = [0]
            return pa.table(
                {"base_only": pa.array(z, pa.int64()),
                 "new_only": pa.array(z, pa.int64()),
                 "both": pa.array(z, pa.int64())}
            )
        b = np.asarray(batch.column("max(in_base)"), dtype=np.int64)
        n = np.asarray(batch.column("max(in_new)"), dtype=np.int64)
        return pa.table(
            {"base_only": pa.array([int(((b == 1) & (n == 0)).sum())], pa.int64()),
             "new_only": pa.array([int(((b == 0) & (n == 1)).sum())], pa.int64()),
             "both": pa.array([int(((b == 1) & (n == 1)).sum())], pa.int64())}
        )

    parts = _collect(
        flags.map_batches(partial_counts, batch_format="pyarrow"),
        pa.schema(
            [("base_only", pa.int64()), ("new_only", pa.int64()), ("both", pa.int64())]
        ),
    )
    base_only = int(pa.compute.sum(parts.column("base_only")).as_py() or 0)
    new_only = int(pa.compute.sum(parts.column("new_only")).as_py() or 0)
    both = int(pa.compute.sum(parts.column("both")).as_py() or 0)
    return pa.table(
        {"base_only": pa.array([base_only], pa.int64()),
         "new_only": pa.array([new_only], pa.int64()),
         "both": pa.array([both], pa.int64()),
         "union_count": pa.array([base_only + new_only + both], pa.int64())}
    )


def latest_doc_versions(sf_dir: str) -> pa.Table:
    """MERGE / upsert (CDC latest-wins): apply an updates snapshot on
    top of a base snapshot, keeping exactly one row per doc_id — the
    highest version — with the winner's payload stats. The lakehouse
    compaction verb: base is the full documents table at version 1,
    the updates snapshot is modeled deterministically as every
    doc_id % 7 == 0 re-ingested at version 2 with an appended edit
    marker (payload length + 5), so the oracle constructs the
    identical union and the winning payload is distinguishable.

    Ray shape: union(base, updates) -> ONE doc-keyed hash shuffle ->
    per-group vectorized argmax(version) (each group holds at most
    n_versions rows, so groups are bounded by the snapshot count, not
    the corpus); the payload travels with its row, so no join-back
    pass is needed. At web scale the union sides would be separate
    partitioned tables read with aligned partitioning — the plan is
    unchanged.
    """
    import pyarrow.compute as pc

    def base_rows(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column("text"), "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "version": pa.array(
                    np.ones(batch.num_rows, np.int64), pa.int64()
                ),
                "text_len": pc.cast(pc.utf8_length(txt), pa.int64()),
            }
        )

    def update_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        keep = ids % 7 == 0
        txt = pc.fill_null(batch.column("text").filter(pa.array(keep)), "")
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "version": pa.array(np.full(int(keep.sum()), 2, np.int64)),
                "text_len": pc.add(pc.cast(pc.utf8_length(txt), pa.int64()), 5),
            }
        )

    base = _docs(sf_dir).map_batches(base_rows, batch_format="pyarrow")
    updates = _docs(sf_dir).map_batches(update_rows, batch_format="pyarrow")

    def pick_latest(group: pa.Table) -> pa.Table:
        v = np.asarray(group.column("version"))
        i = int(np.argmax(v))
        return group.take([i])

    merged = (
        base.union(updates)
        .groupby("doc_id")
        .map_groups(pick_latest, batch_format="pyarrow")
    )
    out = _collect(
        merged,
        pa.schema(
            [("doc_id", pa.int64()), ("version", pa.int64()), ("text_len", pa.int64())]
        ),
    )
    return out.sort_by([("doc_id", "ascending")])


def neardup_clusters_doubling(
    sf_dir: str, stats: dict | None = None, **lsh_kwargs
) -> pa.Table:
    """Connected components with POINTER DOUBLING — the O(log n)-round
    upgrade the plain ``neardup_clusters`` docstring names: each BSP
    round does (1) the neighbor-min propagation superstep and (2) a
    SHORTCUT superstep ``label(v) <- label(label(v))`` (each node asks
    its current representative for ITS representative), so label paths
    halve every round and deep-chain components converge in
    O(log diameter) rounds instead of O(diameter).

    Same output contract as `neardup_clusters` (plan-equality pinned by
    a 17-node chain fixture that also asserts the round counts: ~6 vs
    ~17). Two shuffles per round instead of one — the classic
    rounds-vs-bandwidth trade; both plans are exposed, the sessionize /
    sessionize_scan precedent.
    """
    pairs = lsh_kwargs.pop("pairs", None)
    if pairs is None:
        pairs = minhash_lsh_pairs(sf_dir, **lsh_kwargs)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster_rep": pa.array([], pa.int64())}
    )
    if len(pairs) == 0:
        return empty
    a = np.asarray(pairs.column("doc_a"), dtype=np.int64)
    b = np.asarray(pairs.column("doc_b"), dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes = np.unique(src)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(src),
                "cand": pa.array(dst),
                "label": pa.array([None] * len(src), pa.int64()),
            }
        )
    ).materialize()
    labels = ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "label": pa.array(nodes)})
    ).materialize()

    def as_tagged(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "cand": pa.array([None] * len(t), pa.int64()),
                "label": t.column("label"),
            }
        )

    def send(group: pa.Table) -> pa.Table:
        lbl_np = group.column("label").to_numpy(zero_copy_only=False)
        is_label = ~np.isnan(lbl_np.astype(np.float64))
        lbl = int(lbl_np[is_label][0])
        cand_np = group.column("cand").to_numpy(zero_copy_only=False)
        out_nodes = cand_np[~is_label].astype(np.int64)
        node = int(group.column("node")[0].as_py())
        return pa.table(
            {
                "node": pa.array(np.append(out_nodes, node), pa.int64()),
                "cand": pa.array(np.full(len(out_nodes) + 1, lbl, np.int64)),
            }
        )

    def answer(group: pa.Table) -> pa.Table:
        # rows: one label row (ret null) + query rows (ret = asker)
        lbl_np = group.column("label").to_numpy(zero_copy_only=False)
        is_label = ~np.isnan(lbl_np.astype(np.float64))
        lbl = int(lbl_np[is_label][0])
        ret = group.column("ret").to_numpy(zero_copy_only=False)
        askers = ret[~is_label].astype(np.int64)
        if len(askers) == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "cand": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "node": pa.array(askers, pa.int64()),
                "cand": pa.array(np.full(len(askers), lbl, np.int64)),
            }
        )

    prev_sum = None
    rounds = 0
    for _ in range(16):
        rounds += 1
        # superstep 1: neighbor-min (identical to the plain plan)
        tagged = edges.union(labels.map_batches(as_tagged, batch_format="pyarrow"))
        labels = (
            tagged.groupby("node")
            .map_groups(send, batch_format="pyarrow")
            .groupby("node")
            .min("cand")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # superstep 2: shortcut — ask label(v) for label(label(v))
        queries = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("label"),
                    "ret": t.column("node"),
                    "label": pa.array([None] * len(t), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        lab_tagged = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "ret": pa.array([None] * len(t), pa.int64()),
                    "label": t.column("label"),
                }
            ),
            batch_format="pyarrow",
        )
        shortcut = (
            queries.union(lab_tagged)
            .groupby("node")
            .map_groups(answer, batch_format="pyarrow")
        )
        labels = (
            labels.map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "cand": t.column("label")}
                ),
                batch_format="pyarrow",
            )
            .union(shortcut)
            .groupby("node")
            .min("cand")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError("neardup_clusters_doubling: no convergence in 16 rounds")
    if stats is not None:
        stats["rounds"] = rounds
    tbl = _collect(labels, pa.schema([("node", pa.int64()), ("label", pa.int64())]))
    return pa.table(
        {"doc_id": tbl.column("node"), "cluster_rep": tbl.column("label")}
    ).sort_by([("doc_id", "ascending")])


def _greedy_dedup_scan(
    ids: np.ndarray, m: np.ndarray, threshold: float, chunk: int = 1024
) -> tuple[np.ndarray, np.ndarray]:
    """Memory-bounded EXACT evaluation of the SemDeDup greedy scan.

    Semantically identical to building the full n x n similarity
    matrix and scanning it (same keeps, same dup_of, same tie-breaks),
    but the working set is O(chunk * n_kept) instead of O(n^2): items
    are processed in id order in fixed chunks; each chunk computes its
    similarities against the ALREADY-KEPT prefix (whose decisions are
    final) plus a chunk-internal block.  A duplicate-heavy oversized
    cluster — the very corpus dedup targets, where a second k-means
    level cannot split ties between identical vectors — therefore costs
    O(n * n_kept * d) time and near-constant memory, not an O(n^2)
    matrix in one task.  Pinned by an equivalence test against the
    naive full-matrix scan and an 8,900-duplicate adversarial fixture.
    """
    n = len(ids)
    keep = np.ones(n, dtype=bool)
    dup_of = np.full(n, -1, dtype=np.int64)
    kept_rows: list[np.ndarray] = []  # kept vectors from FINISHED chunks
    kept_ids: list[int] = []
    for s0 in range(0, n, chunk):
        s1 = min(s0 + chunk, n)
        cm = m[s0:s1]
        if kept_ids:
            kprev = np.vstack(kept_rows)
            sims_prev = cm @ kprev.T  # (chunk, n_kept_prev)
            kprev_ids = np.asarray(kept_ids, dtype=np.int64)
        sims_in = cm @ cm.T  # (chunk, chunk)
        for i in range(s1 - s0):
            best_s, best_id = -np.inf, -1
            if kept_ids:
                # prefix candidates are ALL kept and id-ascending:
                # argmax returns the first max -> min id (the original
                # full-matrix tie-break)
                j = int(np.argmax(sims_prev[i]))
                best_s, best_id = float(sims_prev[i][j]), int(kprev_ids[j])
            row = sims_in[i, :i]
            kin = keep[s0 : s0 + i]
            if i and kin.any():
                masked = np.where(kin, row, -np.inf)
                j = int(np.argmax(masked))
                # strict > : prefix ids are all smaller, so equal sims
                # resolve to the prefix candidate (min id), as before
                if float(masked[j]) > best_s:
                    best_s, best_id = float(masked[j]), int(ids[s0 + j])
            if best_s > threshold:
                keep[s0 + i] = False
                dup_of[s0 + i] = best_id
        for i in range(s0, s1):
            if keep[i]:
                kept_rows.append(m[i])
                kept_ids.append(int(ids[i]))
    return keep, dup_of


def derived_n_clusters(n_vectors: int, target_cluster_size: int = 512) -> int:
    """SemDeDup cluster count scaled to the corpus: k = ceil(n / target)
    with a floor of 8. The paper runs ~100k clusters over web-scale
    corpora for exactly this reason — a FIXED k makes each cluster's
    O(size * d) vector payload grow linearly with the corpus until one
    group no longer fits a task; deriving k from n keeps the expected
    group payload constant (target_cluster_size * d) at any scale."""
    return max(8, -(-n_vectors // target_cluster_size))


def semantic_dedup(
    sf_dir: str,
    n_clusters: int | None = None,
    threshold: float = 0.45,
    kmeans_iters: int = 8,
    target_cluster_size: int = 512,
) -> pa.Table:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then run
    the exact pairwise-cosine dedup only WITHIN each cluster — the
    sub-quadratic route to embedding near-dup removal that
    ``embedding_neardup_pairs`` (exact all-pairs) cannot take at 100 TB.

    Output: one row per vector — (vec_id, cluster, keep, dup_of).
    Within a cluster, ids are scanned ascending; a vector is DROPPED
    (keep=false) iff some already-KEPT lower id in the same cluster has
    cosine similarity > ``threshold`` (dup_of = that kept id with max
    similarity, ties -> min id; null for keeps). Greedy-by-min-id makes
    the decision deterministic and order-free.

    Ray shape:
      1. ``kmeans_fit`` (fixed-point distributed k-means — bit-identical
         across block layouts) fits centroids; one stateless map assigns
         (vec_id, cluster, embedding).
      2. ``groupby("cluster").map_groups``: ONE shuffle keyed by cluster;
         each group sorts by vec_id (canonical matrix -> deterministic
         BLAS result) and runs the CHUNKED greedy scan
         (``_greedy_dedup_scan``): exact same decisions as the full
         similarity matrix, but working memory is O(chunk * n_kept),
         never O(cluster_size^2) — an oversized duplicate-heavy cluster
         (which a second k-means level could NOT split: identical
         vectors tie on every centroid) keeps n_kept ~ 1 and runs in
         near-constant memory.  n_clusters bounds the group's
         O(size * d) vector payload itself; when not given explicitly
         it is DERIVED from the corpus size (``derived_n_clusters``:
         ceil(n / target_cluster_size), floor 8 — the paper's ~100k
         clusters at web scale fall out of the same rule) from parquet
         ROW-COUNT METADATA, no data read.
    Compute is O(sum size * kept * d) <= n^2/k vs the exact join's n^2.

    No SQL oracle (kmeans assignment is not SQL-expressible); pinned by
    an exact same-algorithm numpy reference (whole-corpus, driver-side)
    plus a drop<->true-near-dup consistency check in tests.
    """
    from .similarity import _norm_rows, kmeans_fit

    if n_clusters is None:
        import pyarrow.parquet as pq

        n_vectors = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
        n_clusters = derived_n_clusters(n_vectors, target_cluster_size)
    cent = kmeans_fit(sf_dir, n_clusters=n_clusters, iters=kmeans_iters)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64()),
                 "embedding": pa.array([], pa.list_(pa.float32()))}
            )
        c = ray.get(cent_ref)
        m = _norm_rows(_emb_matrix(batch.column("embedding")))
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array((m @ c.T).argmax(axis=1).astype(np.int64)),
                "embedding": batch.column("embedding"),
            }
        )

    def dedup_cluster(group: pa.Table) -> pa.Table:
        group = group.sort_by([("vec_id", "ascending")])
        ids = np.asarray(group.column("vec_id"), dtype=np.int64)
        m = _norm_rows(_emb_matrix(group.column("embedding")))
        keep, dup_of = _greedy_dedup_scan(ids, m, threshold)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": group.column("cluster"),
                "keep": pa.array(keep),
                "dup_of": pa.array(
                    np.where(keep, None, dup_of), pa.int64(), from_pandas=True
                ),
            }
        )

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )
    tbl = _collect(
        out,
        pa.schema(
            [("vec_id", pa.int64()), ("cluster", pa.int64()),
             ("keep", pa.bool_()), ("dup_of", pa.int64())]
        ),
    )
    return tbl.sort_by([("vec_id", "ascending")])


# ----------------------------------------------------------------------
# Persistent LSH signature index (incremental probe without recompute)

# bump when the signature/bucket-layout code changes so stale /tmp
# indexes from older code auto-invalidate (the IVF_VERSION pattern)
LSH_INDEX_VERSION = 2


def _lsh_index_root(
    sf_dir: str, num_perm: int, bands: int, shingle_k: int, n_buckets: int
) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return (
        f"/tmp/graft_lshidx/v{LSH_INDEX_VERSION}/"
        f"{tag}-p{num_perm}b{bands}k{shingle_k}-B{n_buckets}"
    )


def _bucket_of(bands_arr: np.ndarray, keys: list[str], n_buckets: int) -> np.ndarray:
    """Deterministic bucket id from (band, key): the key's first 8 hex
    chars (uniform minhash bits) xor the band, mod n_buckets."""
    ints = np.fromiter(
        (int(k[:8], 16) for k in keys), dtype=np.int64, count=len(keys)
    )
    return (ints ^ bands_arr.astype(np.int64)) % n_buckets


def lsh_build_index(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    n_buckets: int = 32,
) -> str:
    """Persist the ARCHIVE side's LSH band signatures as a hive
    bucket-partitioned layout ``<root>/bucket=<b>/*.parquet`` with rows
    (band, key, doc_id) — the signature STORE that makes incremental
    near-dup a PROBE instead of a recompute: ``cross_snapshot_neardup``
    re-signatures the whole archive every run (amortized only by a
    process cache); this index is built ONCE per (corpus, params) and
    a new-snapshot probe reads only the buckets its own signatures
    touch (the text-index / IVF pruned-read pattern applied to dedup).
    Archive = doc_id < T, T = (max+1)//2 — the same deterministic
    snapshot split as the other cross-snapshot operators (T recorded
    in the marker for the probe)."""
    import json
    import os

    root = _lsh_index_root(sf_dir, num_perm, bands, shingle_k, n_buckets)
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root
    import shutil

    import pyarrow.compute as pc

    shutil.rmtree(root, ignore_errors=True)
    t_split = (int(_docs(sf_dir).max("doc_id")) + 1) // 2

    def bucketed(batch: pa.Table) -> pa.Table:
        sig = _signature_batch(
            batch, num_perm=num_perm, bands=bands, shingle_k=shingle_k
        )
        if sig.num_rows == 0:
            return sig.append_column("bucket", pa.array([], pa.int32()))
        b = _bucket_of(
            np.asarray(sig.column("band"), np.int64),
            sig.column("key").to_pylist(),
            n_buckets,
        )
        return sig.append_column("bucket", pa.array(b.astype(np.int32)))

    (
        _docs(sf_dir)
        .filter(expr=f"doc_id < {t_split}")
        .map_batches(bucketed, batch_size=256, batch_format="pyarrow")
        # boilerplate-heavy corpora can pile one band-key's signatures
        # into a single bucket; cap file size so a hot bucket reads as
        # parallel bounded tasks (same discipline as the IVF cells)
        .write_parquet(root, partition_cols=["bucket"], max_rows_per_file=65536)
    )
    with open(marker, "w") as f:
        json.dump({"t_split": t_split}, f)
    return root


def cross_snapshot_neardup_indexed(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
    n_buckets: int = 32,
    stats: dict | None = None,
) -> pa.Table:
    """``cross_snapshot_neardup`` served from the PERSISTENT signature
    index: the new snapshot's signatures are computed (new side only —
    the incremental batch), the archive is a PRUNED READ of just the
    buckets those signatures touch, and candidates are the cross-side
    (band, key) matches, exact-verified by the shared tail. Same
    output contract and SQL oracle as the recompute plan; ``stats``
    records buckets probed / total for the pruning test.

    At 100 TB this is the difference between re-signaturing the whole
    archive per ingest batch and touching O(new-batch × bands / B) of
    a prebuilt layout."""
    import glob
    import json
    import os

    root = lsh_build_index(sf_dir, num_perm, bands, shingle_k, n_buckets)
    with open(os.path.join(root, "_BUILT")) as f:
        t_split = json.load(f)["t_split"]

    # new-side signatures -> driver dict {(band, key): [new ids]}
    def sig_new(batch: pa.Table) -> pa.Table:
        return _signature_batch(
            batch, num_perm=num_perm, bands=bands, shingle_k=shingle_k
        )

    new_sig_tbls = [
        t
        for t in ray.get(
            _docs(sf_dir)
            .filter(expr=f"doc_id >= {t_split}")
            .map_batches(sig_new, batch_size=256, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "base_doc_id": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    if not new_sig_tbls:
        return empty
    new_sig = pa.concat_tables(new_sig_tbls)
    lookup: dict[tuple, list[int]] = {}
    for band, key, did in zip(
        new_sig.column("band").to_pylist(),
        new_sig.column("key").to_pylist(),
        new_sig.column("doc_id").to_pylist(),
    ):
        lookup.setdefault((band, key), []).append(did)
    touched = sorted(
        set(
            _bucket_of(
                np.asarray(new_sig.column("band"), np.int64),
                new_sig.column("key").to_pylist(),
                n_buckets,
            ).tolist()
        )
    )
    if stats is not None:
        stats["buckets_probed"] = len(touched)
        stats["buckets_total"] = n_buckets
    paths = [
        f
        for b in touched
        for f in sorted(glob.glob(os.path.join(root, f"bucket={b}", "*.parquet")))
    ]
    if not paths:
        return empty
    lookup_ref = ray.put(lookup)

    def emit(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        out_b, out_n = [], []
        for band, key, did in zip(
            batch.column("band").to_pylist(),
            batch.column("key").to_pylist(),
            batch.column("doc_id").to_pylist(),
        ):
            hits = lk.get((band, key))
            if hits:
                out_b.extend([did] * len(hits))
                out_n.extend(hits)
        return pa.table(
            {"base_doc_id": pa.array(out_b, pa.int64()),
             "doc_id": pa.array(out_n, pa.int64())}
        )

    distinct = (
        ray.data.read_parquet(paths, columns=["band", "key", "doc_id"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby(["base_doc_id", "doc_id"])
        .count()
    )
    pair_tbl = _collect(
        distinct,
        pa.schema(
            [("base_doc_id", pa.int64()), ("doc_id", pa.int64()), ("count()", pa.int64())]
        ),
    )
    if len(pair_tbl) == 0:
        return empty
    return _verify_cross_pairs(sf_dir, pair_tbl, shingle_k, threshold)


def containment_pairs(
    sf_dir: str, shingle_k: int = 5, threshold: float = 0.8, max_posting: int = 512
) -> pa.Table:
    """ASYMMETRIC near-dup: shingle-set CONTAINMENT |A∩B| / |A| — the
    quote/boilerplate-detection verb symmetric Jaccard misses: a short
    doc fully quoted inside a long one has high containment but low
    Jaccard (the union is dominated by the long doc). Emits
    (doc_a, doc_b, cont_a_in_b, cont_b_in_a) for pairs where EITHER
    direction reaches ``threshold``.

    Same inverted-index core as ``ngram_jaccard_pairs``
    (`_shingle_intersections` — one definition of the intersection
    counts, hot-posting truncation included); only the final scoring
    differs. Oracle: the same co-occurrence SQL with the containment
    formulas.
    """
    inter_tbl, sizes = _shingle_intersections(sf_dir, shingle_k, max_posting)
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "cont_a_in_b": pa.array([], pa.float64()),
         "cont_b_in_a": pa.array([], pa.float64())}
    )
    if len(inter_tbl) == 0:
        return empty
    a_ids = inter_tbl.column("doc_a").to_pylist()
    b_ids = inter_tbl.column("doc_b").to_pylist()
    c = np.asarray(inter_tbl.column("count()"), dtype=np.int64)
    na = np.array([sizes[a] for a in a_ids], dtype=np.int64)
    nb = np.array([sizes[b] for b in b_ids], dtype=np.int64)
    cab = c / na  # A's shingles found in B
    cba = c / nb
    keep = (cab >= threshold) | (cba >= threshold)
    out = pa.table(
        {
            "doc_a": pa.array(np.asarray(a_ids)[keep], pa.int64()),
            "doc_b": pa.array(np.asarray(b_ids)[keep], pa.int64()),
            "cont_a_in_b": pa.array(cab[keep], pa.float64()),
            "cont_b_in_a": pa.array(cba[keep], pa.float64()),
        }
    )
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# ----------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995)


@ray.remote
def _block_num_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _snm_block(
    target: pa.Table, carries: list, window: int, threshold: float
) -> pa.Table:
    """Pairs whose HIGHER-ranked member lives in ``target``: the carry
    blocks supply the ``window`` rows ranked immediately before the
    target block, so rank distance == index distance in the combined
    array (ranks are consecutive) and no cross-task pair is missed or
    duplicated (each pair is owned by the task holding its second row)."""
    from .hashing import jaccard, shingles

    # carries arrive as a LIST of refs (Ray resolves only top-level
    # args): fetch explicitly — still zero-copy from the object store
    tail = pa.concat_tables(ray.get(list(carries))) if carries else None
    if tail is not None and tail.num_rows > window:
        tail = tail.slice(tail.num_rows - window, window)
    combined = pa.concat_tables([tail, target]) if tail is not None else target
    base = combined.num_rows - target.num_rows
    ids = np.asarray(combined.column("doc_id"), dtype=np.int64)
    sets = [frozenset(shingles(t)) for t in combined.column("text").to_pylist()]
    out_a: list[int] = []
    out_b: list[int] = []
    out_j: list[float] = []
    for j in range(base, combined.num_rows):
        if not sets[j]:
            continue
        for i in range(max(0, j - window), j):
            if not sets[i]:
                continue
            jc = jaccard(sets[i], sets[j])
            if jc >= threshold:
                a, b = int(ids[i]), int(ids[j])
                if a > b:
                    a, b = b, a
                out_a.append(a)
                out_b.append(b)
                out_j.append(jc)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


def sorted_neighborhood_pairs(
    sf_dir: str, prefix_len: int = 24, window: int = 8, threshold: float = 0.6
) -> pa.Table:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995
    'The merge/purge problem') — the third candidate-generation
    mechanism next to LSH banding (``minhash_lsh_pairs``) and the
    inverted-index join (``ngram_jaccard_pairs``): sort the corpus by a
    blocking key (first ``prefix_len`` chars of the dedup-normalized
    text), slide a ``window``-row neighborhood over the GLOBAL rank
    order, and exact-verify only pairs within the window (word-5-
    shingle Jaccard >= ``threshold``, the corpus-wide pair contract).
    By construction it finds near-dups whose normalized texts share a
    prefix — the method's documented recall trade-off (a mutation in
    the first words hides a pair; LSH covers that regime) in exchange
    for a SHUFFLE-FREE verify: candidate count is O(n * window), no
    posting lists, no bucket skew — hot keys cost nothing because the
    neighborhood is fixed-width regardless of key multiplicity.

    Ray shape: one vectorized key map -> ONE range-partition sort on
    (key, doc_id) — the same single all-to-all every rank op here pays
    (``ccnet_buckets``/``value_ntiles``) -> a metadata pass collecting
    per-block ROW COUNTS (never rows) -> one task per sorted block,
    handed refs to just enough preceding blocks to cover the ``window``
    rows before its boundary (rank distance == index distance, so
    cross-block pairs are exact, each owned by its second row's task).
    At 100 TB the sort would carry (key, doc_id, shingle-hash array)
    instead of raw text — same plan, lighter payload; pairs per task
    stay O(block_rows * window).

    Returns (doc_a, doc_b, jaccard), doc_a < doc_b, sorted. Pairs where
    either side has no shingles (empty normalized text) are excluded —
    matching the SQL oracle, whose shingle relation drops empty docs.
    """
    from .hashing import normalize_text

    def keyed(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        keys = [normalize_text(t)[:prefix_len] for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "key": pa.array(keys, pa.string()),
            }
        )

    ds = (
        _docs(sf_dir)
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["key", "doc_id"])
        .materialize()
    )
    # metadata-only row counts: the materialized dataset's block
    # metadata already carries num_rows (no task per block, no block
    # touch); fall back to a counting task only if a count is unknown
    blocks = [
        (r, m.num_rows)
        for bundle in ds.iter_internal_ref_bundles()
        for r, m in bundle.blocks
    ]
    live = [
        (r, c if c is not None else ray.get(_block_num_rows.remote(r)))
        for r, c in blocks
    ]
    live = [(r, c) for r, c in live if c > 0]
    futs = []
    for i, (ref, _c) in enumerate(live):
        carry_refs: list = []
        need = window
        j = i - 1
        while need > 0 and j >= 0:
            carry_refs.insert(0, live[j][0])
            need -= live[j][1]
            j -= 1
        futs.append(_snm_block.remote(ref, carry_refs, window, threshold))
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    parts = [t for t in ray.get(futs) if t.num_rows] if futs else []
    if not parts:
        return empty
    return pa.concat_tables(parts).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")]
    )
