"""Approximate-nearest-neighbor search over the embeddings table.

Two paths per the engine charter:
- brute-force cosine top-k (the correctness baseline): the query matrix
  is broadcast once via ``ray.put``; each block computes a numpy matmul
  and its local top-k, and the tiny per-block winners are merged by a
  final groupby — never materializing the full similarity matrix.
- IVF (scale path): deterministic seeded k-means-lite builds coarse
  centroids on a sample; vectors are bucketed by nearest centroid
  (hash-partitioned groupby) and queries probe only the ``nprobe``
  nearest buckets. Recall < 1.0 by design; baseline is the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .vectors import _emb_matrix


def _emb(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    tbl = (
        _emb(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.less(t.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = tbl["vec_id"].to_numpy()
    q = _norm_rows(np.vstack(tbl["embedding"].to_numpy()).astype(np.float64))
    return ids, q


def brute_topk(sf_dir: str, n_queries: int = 8, k: int = 10) -> pa.Table:
    """Exact cosine top-k: (query_id, neighbor_id, rank), rank 1-based.

    Ties broken by ascending neighbor_id (same ORDER BY as the oracle).
    """
    qids, q = _query_matrix(sf_dir, n_queries)
    return _exact_topk(_emb(sf_dir), qids, q, k)


def _exact_topk(
    ds: "ray.data.Dataset", qids: np.ndarray, q: np.ndarray, k: int
) -> pa.Table:
    """Shared exact-top-k tail: broadcast query matrix, per-block local
    top-k (numpy matmul), tiny driver merge of n_queries×k×blocks rows."""
    q_ref = ray.put(q)

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"qi": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id"))
        # zero-copy Arrow->numpy (handles the packed-binary join form too)
        m = _norm_rows(_emb_matrix(batch.column("embedding")))
        sims = qm @ m.T  # (n_queries, block)
        kk = min(k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # local top-k with (sim desc, id asc) tie-break
            order = np.lexsort((ids, -sims[qi]))[:kk]
            out_q.extend([qi] * len(order))
            out_n.extend(ids[order].tolist())
            out_s.extend(sims[qi][order].tolist())
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = pa.concat_tables(
        ray.get(ds.map_batches(block_topk, batch_format="pyarrow").to_arrow_refs())
    )
    # final merge: tiny (n_queries * k * n_blocks rows)
    qi = np.asarray(partials.column("qi"))
    nid = np.asarray(partials.column("neighbor_id"))
    sim = np.asarray(partials.column("sim"))
    out_rows = {"query_id": [], "neighbor_id": [], "rank": []}
    for q_idx in range(len(qids)):
        mask = qi == q_idx
        order = np.lexsort((nid[mask], -sim[mask]))[:k]
        out_rows["query_id"].extend([int(qids[q_idx])] * len(order))
        out_rows["neighbor_id"].extend(nid[mask][order].tolist())
        out_rows["rank"].extend(range(1, len(order) + 1))
    return pa.table(
        {
            "query_id": pa.array(out_rows["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out_rows["neighbor_id"], type=pa.int64()),
            "rank": pa.array(out_rows["rank"], type=pa.int64()),
        }
    )


def filtered_topk(
    sf_dir: str, n_queries: int = 8, k: int = 10, lang: str = "en"
) -> pa.Table:
    """Metadata-FILTERED exact vector search: cosine top-k restricted to
    neighbors whose document matches a predicate (here lang = ?) — the
    filtered-ANN verb every production vector engine exposes.

    Ray shape (filter side is corpus-sized at 100 TB, so broadcast is
    wrong by construction):
      1. the predicate side is pruned AT THE READ (documents scanned
         with a pushdown filter, doc_id column only)
      2. native ``Dataset.join(join_type="left_semi")`` embeddings ⋈
         allowed-docs on vec_id = doc_id — one hash-partitioned
         all-to-all keeps only qualifying vectors, metadata never
         rides along with the embedding payload. The vector payload is
         PACKED to float32 bytes first (Acero joins cannot carry
         list<float> non-key fields); the top-k kernel unpacks it.
      3. the shared exact-top-k tail (`_exact_topk`): broadcast query
         matrix, per-block matmul + local top-k, tiny driver merge.
    """
    import pyarrow.compute as pc

    qids, q = _query_matrix(sf_dir, n_queries)
    allowed = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id"],
        filter=pc.field("lang") == lang,
    ).materialize()
    n_allowed = allowed.count()
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()),
         "neighbor_id": pa.array([], pa.int64()),
         "rank": pa.array([], pa.int64())}
    )
    if n_allowed == 0:
        return empty

    def pack(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], pa.binary())}
            )
        m = np.ascontiguousarray(
            _emb_matrix(batch.column("embedding"), dtype=np.float32)
        )
        n, dim = m.shape
        offsets = np.arange(n + 1, dtype=np.int32) * (dim * 4)
        packed = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(m.tobytes())],
        )
        return pa.table({"vec_id": batch.column("vec_id"), "embedding": packed})

    emb = _emb(sf_dir).map_batches(pack, batch_format="pyarrow").materialize()
    # Ray 2.49's hash join cannot finalize empty partitions — adapt the
    # partition count to the smaller side (same guard as the other
    # native-join operators).
    nparts = max(1, min(16, min(n_allowed, emb.count()) // 16))
    joined = emb.join(
        allowed, "left_semi", nparts, on=("vec_id",), right_on=("doc_id",)
    )
    out = _exact_topk(joined, qids, q, k)
    return out if out.num_rows else empty


# ----------------------------------------------------------------------
# IVF scale path


def _kmeans_lite(x: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Deterministic k-means on normalized vectors (cosine ≡ dot)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cent[c] = v / n
    return cent


# bump when the index-building code (k-means, assignment, layout)
# changes so stale /tmp indexes from older code auto-invalidate
IVF_VERSION = 3


def _ivf_root(sf_dir: str, n_clusters: int) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return f"/tmp/graft_ivf/v{IVF_VERSION}/{tag}-c{n_clusters}"


def ivf_build_index(sf_dir: str, n_clusters: int = 16, seed: int = 0) -> str:
    """Build (once, cached in /tmp) the cell-partitioned IVF layout.

    Centroids fit on a bounded seeded sample; assignment runs as a
    distributed stateless map; vectors land as hive-partitioned Parquet
    ``<root>/cell=<c>/...`` so a query's nprobe cells are a PRUNED READ —
    IO proportional to nprobe/n_clusters of the corpus, not a full scan.
    At cluster scale this is the layout the north rule's partitioning
    discipline asks for: cell id is the partition key, reused by every
    probe.
    """
    import os

    root = _ivf_root(sf_dir, n_clusters)
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    sample = _emb(sf_dir).limit(4096).to_pandas()
    x = _norm_rows(np.vstack(sample["embedding"].to_numpy()).astype(np.float64))
    cent = _kmeans_lite(x, n_clusters, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _norm_rows(_emb_matrix(batch.column("embedding")))
        cells = (m @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cells, pa.int32()))

    # a skewed corpus can dump most vectors into ONE cell (k-means
    # collapses on duplicate-heavy data); capping rows per file keeps a
    # hot cell readable as MANY parallel tasks with bounded memory
    # instead of one giant file (the probe's per-block top-k only needs
    # block-sized state, so correctness is unaffected)
    _emb(sf_dir).map_batches(assign, batch_format="pyarrow").write_parquet(
        root, partition_cols=["cell"], max_rows_per_file=4096
    )
    np.save(os.path.join(root, "centroids.npy"), cent)
    with open(marker, "w") as f:
        f.write("ok")
    return root


def ivf_topk(
    sf_dir: str, n_queries: int = 8, k: int = 10, n_clusters: int = 16, nprobe: int = 10
) -> pa.Table:
    """IVF-bucketed ANN over the cell-partitioned index: the read itself
    is pruned to the union of the queries' nprobe cells (hive partition
    dirs), so both IO and compute scale with nprobe/n_clusters.
    Recall < 1.0 by design; ``brute_topk`` is the baseline (recall@10
    >= 0.9 gate in tests/test_analytics.py). The synthetic embeddings are
    near-uniform on the sphere — the worst case for IVF — hence the high
    default nprobe; real text-embedding corpora cluster far better and
    prune correspondingly harder.
    """
    import os

    root = ivf_build_index(sf_dir, n_clusters)
    cent = np.load(os.path.join(root, "centroids.npy"))
    qids, q = _query_matrix(sf_dir, n_queries)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (n_queries, nprobe)
    # pruned read: ONLY the probed cells' partition dirs leave storage
    need = sorted({int(c) for row in probe for c in row})
    import glob as _glob

    paths = [
        f
        for c in need
        for f in sorted(_glob.glob(os.path.join(root, f"cell={c}", "*.parquet")))
    ]
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    def block_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        pr = ray.get(probe_ref)
        ids = np.asarray(batch.column("vec_id"))
        # cell id from the hive dir name (partition col isn't in the file)
        cells = np.array(
            [int(p.split("cell=")[1].split("/")[0]) for p in batch.column("path").to_pylist()],
            dtype=np.int64,
        )
        m = _norm_rows(_emb_matrix(batch.column("embedding")))
        out_q, out_n, out_s = [], [], []
        for q_idx in range(qm.shape[0]):
            mask = np.isin(cells, pr[q_idx])
            if not mask.any():
                continue
            sims = qm[q_idx] @ m[mask].T
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -sims))[: min(k, len(sub_ids))]
            out_q.extend([q_idx] * len(order))
            out_n.extend(sub_ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    cells_ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"], include_paths=True)
    partials = pa.concat_tables(
        ray.get(cells_ds.map_batches(block_topk, batch_format="pyarrow").to_arrow_refs())
    )
    qi = np.asarray(partials.column("qi"))
    nid = np.asarray(partials.column("neighbor_id"))
    sim = np.asarray(partials.column("sim"))
    rows = {"query_id": [], "neighbor_id": [], "rank": []}
    for q_idx in range(len(qids)):
        mask = qi == q_idx
        order = np.lexsort((nid[mask], -sim[mask]))[:k]
        rows["query_id"].extend([int(qids[q_idx])] * len(order))
        rows["neighbor_id"].extend(nid[mask][order].tolist())
        rows["rank"].extend(range(1, len(order) + 1))
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int64()),
        }
    )


_LSH_FX_SCALE = 1 << 20  # fixed-point scale for signature dots


def _lsh_plane_matrix(dim: int, n_bits: int, n_tables: int) -> np.ndarray:
    """Deterministic INTEGER hyperplane bank, (n_tables, n_bits, dim)
    int64 in [-1000, 1000]: component = md5-lower64("lsh:t:b:j") % 2001
    - 1000 — the exact expression DuckDB's ``md5_number_lower`` computes,
    so the whole signature step is SQL-replicable bit-for-bit (the
    simhash/KMV precedent). Integer planes + fixed-point embeddings make
    the sign decision EXACT int64 arithmetic: no float summation-order
    hazard between numpy and the SQL oracle."""
    from .hashing import md5_hash_tokens

    toks = [
        f"lsh:{t}:{b}:{j}"
        for t in range(n_tables)
        for b in range(n_bits)
        for j in range(dim)
    ]
    h = md5_hash_tokens(toks)
    p = (h % np.uint64(2001)).astype(np.int64) - 1000
    return p.reshape(n_tables, n_bits, dim)


def _lsh_keys(raw: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(rows, n_tables) int64 bucket keys from RAW (unnormalized)
    embeddings: fixed-point quantize -> exact int64 dots -> sign bits
    packed per table. floor(x * S + 0.5) matches the oracle's
    floor()-based rounding exactly (np.rint's half-to-even would not)."""
    n_tables, n_bits, dim = planes.shape
    fx = np.floor(raw.astype(np.float64) * _LSH_FX_SCALE + 0.5).astype(np.int64)
    dots = fx @ planes.reshape(n_tables * n_bits, dim).T  # exact int64
    bits = (dots >= 0).astype(np.int64).reshape(len(raw), n_tables, n_bits)
    weights = np.int64(1) << np.arange(n_bits, dtype=np.int64)
    return (bits * weights).sum(axis=2)  # (rows, n_tables)


def lsh_topk(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 32,
) -> pa.Table:
    """LSH-bucketed ANN (random-hyperplane / SimHash-for-cosine — the
    second named scale path next to IVF): a vector is a CANDIDATE for a
    query iff they share a bucket key in ANY of the ``n_tables`` tables;
    candidates are reranked with the exact cosine. Returns
    (query_id, neighbor_id, rank) like ``brute_topk``/``ivf_topk``.

    SQL-ORACLED OUTRIGHT (unlike IVF, whose index lives in /tmp): the
    integer plane bank and fixed-point signature dots are replicated in
    DuckDB exactly (md5_number_lower + BIGINT arithmetic), so candidate
    sets are identical by construction and the driver hash-verifies the
    full result, not just a recall bound. A recall >= 0.9 gate vs
    ``brute_topk`` is additionally pinned in tests.

    Ray shape: plane bank broadcast once (``ray.put``); ONE stateless
    map over the embeddings computes block signatures (one int64
    matmul), matches them against the broadcast query signatures, and
    emits local top-k among the block's candidates; tiny driver merge
    (n_queries x k x blocks rows), no shuffle at all. The default
    (n_bits=4, n_tables=32) is tuned for the near-uniform synthetic
    embeddings (the IVF high-nprobe argument, similarity.py:265): real
    text-embedding corpora cluster far better and support much deeper
    pruning (more bits, fewer candidates).
    """
    import pyarrow.compute as pc

    # raw (unnormalized) query vectors: signatures must quantize the
    # same values the oracle sees
    qtbl = (
        _emb(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.less(t.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    qids = qtbl["vec_id"].to_numpy()
    q_raw = np.vstack(qtbl["embedding"].to_numpy()).astype(np.float64)
    if len(qids) == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}
        )
    dim = q_raw.shape[1]
    planes = _lsh_plane_matrix(dim, n_bits, n_tables)
    q = _norm_rows(q_raw)
    qkeys = _lsh_keys(q_raw, planes)  # (n_queries, n_tables)
    planes_ref = ray.put(planes)
    q_ref = ray.put(q)
    qkeys_ref = ray.put(qkeys)

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"qi": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        pl = ray.get(planes_ref)
        qm = ray.get(q_ref)
        qk = ray.get(qkeys_ref)
        ids = np.asarray(batch.column("vec_id"))
        raw = _emb_matrix(batch.column("embedding")).astype(np.float64)
        keys = _lsh_keys(raw, pl)  # (block, n_tables)
        # candidate mask: any-table key equality (n_queries x block)
        cand = (qk[:, None, :] == keys[None, :, :]).any(axis=2)
        m = _norm_rows(raw)
        out_q, out_n, out_s = [], [], []
        for q_idx in range(qm.shape[0]):
            mask = cand[q_idx]
            if not mask.any():
                continue
            sims = qm[q_idx] @ m[mask].T
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -sims))[: min(k, len(sub_ids))]
            out_q.extend([q_idx] * len(order))
            out_n.extend(sub_ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = pa.concat_tables(
        ray.get(
            _emb(sf_dir).map_batches(block_topk, batch_format="pyarrow").to_arrow_refs()
        )
    )
    qi = np.asarray(partials.column("qi"))
    nid = np.asarray(partials.column("neighbor_id"))
    sim = np.asarray(partials.column("sim"))
    rows = {"query_id": [], "neighbor_id": [], "rank": []}
    for q_idx in range(len(qids)):
        mask = qi == q_idx
        order = np.lexsort((nid[mask], -sim[mask]))[:k]
        rows["query_id"].extend([int(qids[q_idx])] * len(order))
        rows["neighbor_id"].extend(nid[mask][order].tolist())
        rows["rank"].extend(range(1, len(order) + 1))
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int64()),
        }
    )


# ----------------------------------------------------------------------
# Distributed k-means (iterative BSP over the full table)

_KM_SCALE = 1 << 20  # fixed-point accumulation scale


def kmeans_fit(
    sf_dir: str, n_clusters: int = 8, iters: int = 8, seed: int = 0, ds=None
) -> np.ndarray:
    """Full-table distributed k-means over normalized embeddings.

    Per iteration: broadcast centroids (``ray.put`` once) -> map_batches
    computes per-batch partial CLUSTER SUMS in FIXED-POINT int64
    (embeddings scaled by 2^20 and rounded) -> tiny driver reduce of
    k x (dim+1) integers -> new centroids. Integer partials make the
    reduction ORDER-INDEPENDENT, so the fitted centroids are
    bit-identical for ANY block layout / cluster size — the same
    determinism discipline as the span pipeline (float partial sums
    would drift with reduction order and break the blocking-invariance
    guarantee). Seeding matches ``_kmeans_lite``-style deterministic
    init (seeded choice of initial rows via the bounded sample read).
    """
    sample = _emb(sf_dir).limit(4096).to_pandas()
    x0 = _norm_rows(np.vstack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x0), size=min(n_clusters, len(x0)), replace=False)
    cent = x0[np.sort(idx)].copy()

    if ds is None:
        ds = _emb(sf_dir)
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _norm_rows(_emb_matrix(batch.column("embedding")))
            assign = (m @ c.T).argmax(axis=1)
            fx = np.rint(m * _KM_SCALE).astype(np.int64)
            k, d = c.shape
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, assign, fx)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "count": pa.array(counts),
                    "sums": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        parts = ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        k, d = cent.shape
        tot = np.zeros((k, d), dtype=object)  # python ints: exact any scale
        cnt = np.zeros(k, dtype=np.int64)
        for t in parts:
            if t.num_rows == 0 or "cluster" not in t.column_names:
                continue
            cl = np.asarray(t.column("cluster"))
            cnt_p = np.asarray(t.column("count"))
            sums_p = t.column("sums").to_pylist()
            for i, c_id in enumerate(cl):
                cnt[c_id] += cnt_p[i]
                tot[c_id] += np.array(sums_p[i], dtype=object)
        new = cent.copy()
        for c_id in range(k):
            if cnt[c_id] == 0:
                continue
            v = (tot[c_id].astype(np.float64) / _KM_SCALE) / cnt[c_id]
            n = np.linalg.norm(v)
            if n > 1e-12:
                new[c_id] = v / n
        cent = new
    return cent


def embedding_clusters(sf_dir: str, n_clusters: int = 8, iters: int = 8) -> pa.Table:
    """(vec_id, cluster) assignments from the distributed k-means fit —
    deterministic across block layouts (see ``kmeans_fit``). No SQL
    oracle (iterative); invariance + quality pinned by tests."""
    cent = kmeans_fit(sf_dir, n_clusters=n_clusters, iters=iters)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _norm_rows(_emb_matrix(batch.column("embedding")))
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array((m @ c.T).argmax(axis=1).astype(np.int64)),
            }
        )

    out = _emb(sf_dir).map_batches(assign, batch_format="pyarrow")
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
    return tbl.sort_by([("vec_id", "ascending")])


def embedding_quantize(sf_dir: str) -> pa.Table:
    """Int8-style scalar quantization of the embedding column: per-dim
    min/max over the corpus, then q = floor((x - mn) * 255 / (mx - mn)
    + 0.5) per component — the storage-compression pass a web-scale
    vector pipeline runs before ANN indexing. Emits a per-vector
    integer profile (component sum / min / max of q) rather than the
    d-wide codes so the result is compact and integer-exact.

    Distributed shape: pass 1 is a per-block (dim, min, max) partial —
    d rows per block, reduced driver-side (min/max are order-free, no
    float accumulation anywhere); the d-length scale vectors are
    broadcast via ``ray.put``; pass 2 quantizes each block vectorized
    (one reshape + one fused numpy expression). All float arithmetic
    is the same fixed double-precision expression the oracle SQL
    evaluates, so q is bit-identical.
    """

    def to_matrix(batch: pa.Table) -> np.ndarray:
        col = batch.column("embedding").combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        return flat.reshape(batch.num_rows, -1)

    def minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.float64()),
                 "mx": pa.array([], pa.float64())}
            )
        m = to_matrix(batch)
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "mn": pa.array(m.min(axis=0), pa.float64()),
                "mx": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            _emb(sf_dir).map_batches(minmax, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "q_sum": pa.array([], pa.int64()),
             "q_min": pa.array([], pa.int64()),
             "q_max": pa.array([], pa.int64())}
        )
    allp = pa.concat_tables(parts).to_pandas()
    g = allp.groupby("dim", sort=True).agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = g["mn"].to_numpy()
    mx = g["mx"].to_numpy()
    scale_ref = ray.put((mn, mx))

    def quant(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "q_sum": pa.array([], pa.int64()),
                 "q_min": pa.array([], pa.int64()),
                 "q_max": pa.array([], pa.int64())}
            )
        mn_, mx_ = ray.get(scale_ref)
        m = to_matrix(batch)
        span = mx_ - mn_
        with np.errstate(divide="ignore", invalid="ignore"):
            v = (m - mn_) * 255.0 / span
        q = np.floor(v + 0.5)
        q = np.where(span > 0, q, 0.0).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "q_sum": pa.array(q.sum(axis=1), pa.int64()),
                "q_min": pa.array(q.min(axis=1), pa.int64()),
                "q_max": pa.array(q.max(axis=1), pa.int64()),
            }
        )

    out = _emb(sf_dir).map_batches(quant, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("vec_id", "ascending")])


def quantized_topk(sf_dir: str, n_queries: int = 8, k: int = 10) -> pa.Table:
    """Vector search over int8-QUANTIZED codes — max-inner-product top-k
    on the compressed representation (the memory-bound regime real
    vector stores run in: 4x smaller vectors, integer SIMD math). The
    scores are exact int64 dot products of the quantized codes, so
    unlike float ANN this approximate-by-quantization search is still
    bit-exactly oracle-able end to end.

    Distributed shape:
      1. per-dim (min, max) partials — d rows per block, order-free
         driver reduce (same pass as ``embedding_quantize``);
      2. the d-length scales and the quantized query matrix broadcast
         once via ``ray.put``;
      3. per-block: one fused quantize expression + one integer matmul
         + local top-k (sim desc, id asc) — O(n_queries x k) rows leave
         each block;
      4. tiny driver merge to global ranks.
    """

    def to_matrix(batch: pa.Table) -> np.ndarray:
        col = batch.column("embedding").combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        return flat.reshape(batch.num_rows, -1)

    def minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.float64()),
                 "mx": pa.array([], pa.float64())}
            )
        m = to_matrix(batch)
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "mn": pa.array(m.min(axis=0), pa.float64()),
                "mx": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    parts = [
        t
        for t in ray.get(
            _emb(sf_dir).map_batches(minmax, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return empty
    mm = pa.concat_tables(parts).to_pandas().groupby("dim").agg(
        mn=("mn", "min"), mx=("mx", "max")
    )
    mn = mm["mn"].to_numpy()
    mx = mm["mx"].to_numpy()
    span = mx - mn
    ok = span > 0

    def quantize(m: np.ndarray) -> np.ndarray:
        # EXACT oracle expression: floor((x - mn) * 255 / (mx - mn)
        # + 0.5), constant-span dims -> 0
        q = np.zeros_like(m, dtype=np.int64)
        q[:, ok] = np.floor(
            (m[:, ok] - mn[ok]) * 255.0 / span[ok] + 0.5
        ).astype(np.int64)
        return q

    import pyarrow.compute as pc

    qtbl = (
        _emb(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.less(t.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    if len(qtbl) == 0:
        return empty
    qids = qtbl["vec_id"].to_numpy()
    qm = quantize(np.vstack(qtbl["embedding"].to_numpy()).astype(np.float64))
    state_ref = ray.put((mn, mx, qm))

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"qi": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.int64())}
            )
        b_mn, b_mx, b_qm = ray.get(state_ref)
        b_span = b_mx - b_mn
        b_ok = b_span > 0
        m = to_matrix(batch)
        q = np.zeros_like(m, dtype=np.int64)
        q[:, b_ok] = np.floor(
            (m[:, b_ok] - b_mn[b_ok]) * 255.0 / b_span[b_ok] + 0.5
        ).astype(np.int64)
        ids = np.asarray(batch.column("vec_id"))
        scores = b_qm @ q.T  # exact int64 inner products
        kk = min(k, scores.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(scores.shape[0]):
            order = np.lexsort((ids, -scores[qi]))[:kk]
            out_q.extend([qi] * len(order))
            out_n.extend(ids[order].tolist())
            out_s.extend(scores[qi][order].tolist())
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.int64()),
            }
        )

    partials = pa.concat_tables(
        ray.get(
            _emb(sf_dir).map_batches(block_topk, batch_format="pyarrow").to_arrow_refs()
        )
    )
    qi = np.asarray(partials.column("qi"))
    nid = np.asarray(partials.column("neighbor_id"))
    sc = np.asarray(partials.column("score"))
    rows = {"query_id": [], "neighbor_id": [], "score": [], "rank": []}
    for q_idx in range(len(qids)):
        mask = qi == q_idx
        order = np.lexsort((nid[mask], -sc[mask]))[:k]
        rows["query_id"].extend([int(qids[q_idx])] * len(order))
        rows["neighbor_id"].extend(nid[mask][order].tolist())
        rows["score"].extend(sc[mask][order].tolist())
        rows["rank"].extend(range(1, len(order) + 1))
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
            "score": pa.array(rows["score"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
        }
    )


@ray.remote
def _knn_block(left: pa.Table, right_refs: list, k: int) -> pa.Table:
    """Top-k neighbors for every row of ``left`` against the whole
    table, streamed one right block at a time (memory = left block +
    one right block + the (m, k) running winners — never the full
    similarity matrix)."""
    from ..analytics.dedup import _load_block

    lids, lm = _load_block(left)
    if len(lids) == 0:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    m = len(lids)
    best_s = np.full((m, 0), 0.0)
    best_i = np.full((m, 0), 0, dtype=np.int64)
    for ref in right_refs:
        rids, rm = _load_block(ray.get(ref))
        if len(rids) == 0:
            continue
        sims = lm @ rm.T  # rows are already L2-normalized
        cand_s = np.concatenate([best_s, sims], axis=1)
        cand_i = np.concatenate(
            [best_i, np.broadcast_to(rids, (m, len(rids)))], axis=1
        )
        # self-exclusion: a vector is never its own neighbor
        cand_s[cand_i == lids[:, None]] = -np.inf
        # row-wise lexicographic (sim desc, id asc): stable argsort by
        # the secondary key first, then by the primary
        sec = np.argsort(cand_i, axis=1, kind="stable")
        pri = np.argsort(
            -np.take_along_axis(cand_s, sec, axis=1), axis=1, kind="stable"
        )
        order = np.take_along_axis(sec, pri, axis=1)[:, :k]
        best_s = np.take_along_axis(cand_s, order, axis=1)
        best_i = np.take_along_axis(cand_i, order, axis=1)
    kk = best_s.shape[1]
    valid = np.isfinite(best_s)
    ranks = np.broadcast_to(np.arange(1, kk + 1, dtype=np.int64), (m, kk))
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(lids, kk)[valid.ravel()], pa.int64()),
            "neighbor_id": pa.array(best_i.ravel()[valid.ravel()], pa.int64()),
            "rank": pa.array(ranks.ravel()[valid.ravel()], pa.int64()),
        }
    )


def knn_join(sf_dir: str, k: int = 5) -> pa.Table:
    """Exact k-NN graph build: for EVERY vector, its ``k`` nearest
    neighbors by cosine (self excluded; ties -> ascending neighbor id)
    — the all-rows twin of ``brute_topk`` and the input to graph-based
    dedup/cluster steps (kNN-graph connected components, HNSW seeding).

    Distributed shape: one task per LEFT block; each task streams the
    full block-ref list one RIGHT block at a time, maintaining an
    (m, k) running winner set via vectorized two-key argsorts — O(n^2)
    total multiply (inherent to the exact contract; `ivf_topk` is the
    approximate scale path) but O(block + k) memory, no shuffle at
    all, and n/B-way parallelism. Normalization happens once per block
    inside `_load_block`, not per pair.

    Oracle: DuckDB `list_cosine_similarity` self-join + row_number
    window — identical float64 expression and tie order.
    """
    refs = _emb(sf_dir).to_arrow_refs()
    futs = [_knn_block.remote(r, refs, k) for r in refs]
    tbl = pa.concat_tables(ray.get(futs))
    if tbl.num_rows == 0:
        return tbl
    return tbl.sort_by([("vec_id", "ascending"), ("rank", "ascending")])


def dbscan_clusters(
    sf_dir: str, eps_sim: float = 0.35, min_pts: int = 3
) -> pa.Table:
    """Exact DBSCAN over the embedding table (density clustering): a
    point is CORE if it has >= ``min_pts`` neighbors with cosine
    similarity > ``eps_sim``; clusters are connected components of
    core-core edges; non-core points with a core neighbor join their
    minimum-labeled core cluster (the deterministic pin of DBSCAN's
    arbitrary border assignment); everything else is noise (-1).

    Composition of verified machinery, not a new engine path:
      - the eps-graph is the exact block-pair cosine join
        (`dedup.embedding_neardup_pairs` — object-store refs, no
        driver matrix);
      - degrees/core flags are a vectorized pass over the PAIR table
        (O(eps-graph), the near-dup-rate bound, never corpus-sized);
      - components run on the BSP min-label propagation
        (`dedup.neardup_clusters` with the core-core pair list
        injected), isolated cores self-label;
      - the final corpus-wide assignment is one broadcast-map over
        the embeddings read (labels dict is O(points-in-pairs)).

    Oracle: recursive-CTE closure + border min-attach in SQL — exact.
    """
    from .dedup import embedding_neardup_pairs, neardup_clusters

    pairs = embedding_neardup_pairs(sf_dir, threshold=eps_sim)
    a = np.asarray(pairs.column("vec_a"), dtype=np.int64)
    b = np.asarray(pairs.column("vec_b"), dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes, inv = np.unique(src, return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes))
    core_nodes = set(nodes[deg >= min_pts].tolist())

    labels: dict[int, int] = {v: v for v in core_nodes}  # isolated cores
    cc_mask = np.array(
        [s in core_nodes and d in core_nodes for s, d in zip(a, b)], dtype=bool
    )
    if cc_mask.any():
        comp = neardup_clusters(
            sf_dir,
            pairs=pa.table(
                {
                    "doc_a": pa.array(a[cc_mask], pa.int64()),
                    "doc_b": pa.array(b[cc_mask], pa.int64()),
                }
            ),
        )
        for v, lbl in zip(
            comp.column("doc_id").to_pylist(), comp.column("cluster_rep").to_pylist()
        ):
            labels[int(v)] = int(lbl)
    # border attach: min over core neighbors' component labels
    border: dict[int, int] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s not in core_nodes and d in core_nodes:
            cand = labels[d]
            if s not in border or cand < border[s]:
                border[s] = cand
    labels.update(border)

    lbl_ref = ray.put(labels)

    def assign(batch: pa.Table) -> pa.Table:
        lb = ray.get(lbl_ref)
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        out = np.fromiter(
            (lb.get(int(i), -1) for i in ids), dtype=np.int64, count=len(ids)
        )
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(out, pa.int64()),
            }
        )

    out = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .map_batches(assign, batch_format="pyarrow")
    )
    return pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    ).sort_by([("vec_id", "ascending")])


# ----------------------------------------------------------------------
# Distributed PCA (exact covariance combiner)

_PCA_SCALE = 1 << 20  # fixed-point scale for exact moment partials


def pca_fit(sf_dir: str, n_components: int = 4, ds=None):
    """Distributed PCA fit over the raw (un-normalized) embedding table.

    Pass 1 is a pure combiner: each block emits (n, Σfx, fxᵀfx) where
    fx = rint(x·2^20) int64 — one row of d + d² integers per block,
    reduced driver-side in arbitrary-precision Python ints, so the
    moment totals are EXACT and order-free (the kmeans_fit fixed-point
    discipline; float partial sums would drift with reduction order).
    The d×d Gram entries stay inside int64 per block because map_batches
    caps rows at 4096 (4096·2^40·max|x|² ≈ 2^56 for |x| ≤ 4).

    The d×d covariance, eigendecomposition (np.linalg.eigh) and the
    component sign convention (largest-|entry| coordinate positive,
    ties -> lowest index) all happen ONCE on the driver from the exact
    integer totals — bit-identical for any block layout.

    Returns (mean, components[p×d], explained_var[p]).
    """
    if ds is None:
        ds = _emb(sf_dir)

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {"n": pa.array([], pa.int64()),
                 "s": pa.array([], pa.list_(pa.int64())),
                 "g": pa.array([], pa.list_(pa.int64()))}
            )
        m = _emb_matrix(batch.column("embedding"))
        fx = np.rint(m * _PCA_SCALE).astype(np.int64)
        g = fx.T @ fx  # exact int64 matmul (numpy integer path, no BLAS)
        return pa.table(
            {
                "n": pa.array([len(m)], pa.int64()),
                "s": pa.array([fx.sum(axis=0)], pa.list_(pa.int64())),
                "g": pa.array([g.ravel()], pa.list_(pa.int64())),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(
                moments, batch_format="pyarrow", batch_size=4096
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        raise ValueError("pca_fit: empty embeddings table")
    n_tot = 0
    s_tot = None
    g_tot = None
    for t in parts:
        for i in range(t.num_rows):
            n_tot += t.column("n")[i].as_py()
            s = np.array(t.column("s")[i].as_py(), dtype=object)
            g = np.array(t.column("g")[i].as_py(), dtype=object)
            s_tot = s if s_tot is None else s_tot + s
            g_tot = g if g_tot is None else g_tot + g
    d = len(s_tot)
    mean = s_tot.astype(np.float64) / (_PCA_SCALE * n_tot)
    ex2 = g_tot.astype(np.float64).reshape(d, d) / (
        float(_PCA_SCALE) ** 2 * n_tot
    )
    cov = ex2 - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals, kind="stable")[:n_components]
    comps = evecs[:, order].T.copy()  # (p, d)
    for r in range(comps.shape[0]):
        # sign convention: the largest-|entry| coordinate is positive
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return mean, comps, evals[order]


def embedding_pca(sf_dir: str, n_components: int = 4) -> pa.Table:
    """Per-vector PCA projections (vec_id, pc1..pcP) — the
    dimensionality-reduction pass feeding visualization / cheap-filter
    stages in an embedding curation pipeline.

    The fitted (mean, components) are broadcast once via ``ray.put``;
    the projection y = (x - mean) @ Wᵀ is evaluated as an explicit
    fixed-order accumulation over dimensions (j = 0..d-1) so every
    row's float64 result is bit-identical regardless of block layout
    or BLAS blocking — the blocking-invariance guarantee the rest of
    the engine keeps. No SQL oracle (eigendecomposition); pinned by a
    same-algorithm driver reference, an eigenstructure cross-check
    against np.cov, and a blocking-invariance test.
    """
    mean, comps, _ = pca_fit(sf_dir, n_components=n_components)
    state = ray.put((mean, comps))

    def project(batch: pa.Table) -> pa.Table:
        names = [f"pc{i + 1}" for i in range(n_components)]
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 **{nm: pa.array([], pa.float64()) for nm in names}}
            )
        mu, w = ray.get(state)
        m = _emb_matrix(batch.column("embedding"))
        y = np.zeros((len(m), w.shape[0]), np.float64)
        for j in range(w.shape[1]):  # fixed dimension order -> bit-stable
            y += np.outer(m[:, j] - mu[j], w[:, j])
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                **{nm: pa.array(y[:, i], pa.float64()) for i, nm in enumerate(names)},
            }
        )

    out = _emb(sf_dir).map_batches(project, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("vec_id", "ascending")])


def embedding_drift(sf_dir: str) -> pa.Table:
    """Distribution-SHIFT detection between embedding snapshots: exact
    per-dimension first moments of the base side (vec_id < T) vs the
    new side (vec_id >= T, T = (max+1)//2 — the engine's standard
    snapshot split). Emits (dim, n_base, n_new, sum_base_fx,
    sum_new_fx) where fx = floor(x · 2^20 + 0.5) int64 (the repo's
    cents convention — NOT rint, whose ties-to-even diverges from SQL
    round on exact .5) — the moment table is EXACT, order-free
    and hence SQL-oracle-able (float means would diverge from the
    oracle's summation order in the last ulp). Mean drift per dim is
    one division away for the consumer; the raw integer moments are
    what a monitoring pipeline stores and diffs.

    Distributed shape: each block reduces to at most 2·d partial rows
    (side, dim, n, sum_fx); the driver sum over O(blocks·d) integers is
    exact. One corpus pass, no shuffle.
    """
    t_split = (
        int(
            ray.data.read_parquet(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
            ).max("vec_id")
        )
        + 1
    ) // 2

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"side": pa.array([], pa.int32()),
                 "dim": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "s": pa.array([], pa.int64())}
            )
        ids = np.asarray(batch.column("vec_id"), np.int64)
        m = _emb_matrix(batch.column("embedding"))
        fx = np.floor(m * (1 << 20) + 0.5).astype(np.int64)
        sides, dims, ns, ss = [], [], [], []
        for side, mask in ((0, ids < t_split), (1, ids >= t_split)):
            if not mask.any():
                continue
            sub = fx[mask]
            d = sub.shape[1]
            sides.extend([side] * d)
            dims.extend(range(d))
            ns.extend([int(mask.sum())] * d)
            ss.extend(sub.sum(axis=0).tolist())
        return pa.table(
            {"side": pa.array(sides, pa.int32()),
             "dim": pa.array(dims, pa.int64()),
             "n": pa.array(ns, pa.int64()),
             "s": pa.array(ss, pa.int64())}
        )

    parts = [
        t
        for t in ray.get(
            _emb(sf_dir)
            .map_batches(moments, batch_format="pyarrow", batch_size=4096)
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    acc: dict[tuple[int, int], list[int]] = {}
    for t in parts:
        for side, dim, n, s in zip(
            t.column("side").to_pylist(), t.column("dim").to_pylist(),
            t.column("n").to_pylist(), t.column("s").to_pylist(),
        ):
            cur = acc.setdefault((side, dim), [0, 0])
            cur[0] += n
            cur[1] += s
    dims = sorted({d for _, d in acc})
    return pa.table(
        {
            "dim": pa.array(dims, pa.int64()),
            "n_base": pa.array([acc.get((0, d), [0, 0])[0] for d in dims], pa.int64()),
            "n_new": pa.array([acc.get((1, d), [0, 0])[0] for d in dims], pa.int64()),
            "sum_base_fx": pa.array(
                [acc.get((0, d), [0, 0])[1] for d in dims], pa.int64()
            ),
            "sum_new_fx": pa.array(
                [acc.get((1, d), [0, 0])[1] for d in dims], pa.int64()
            ),
        }
    )


# ----------------------------------------------------------------------
# MMR diversified selection


@ray.remote
def _mmr_matvec_block(block: pa.Table, vec: np.ndarray) -> tuple:
    """Integer matvec of one quantized-code block against ``vec``."""
    if block.num_rows == 0 or "vec_id" not in block.column_names:
        return (np.array([], np.int64), np.array([], np.int64))
    col = block.column("codes").combine_chunks()
    q = np.asarray(col.values, dtype=np.int64).reshape(block.num_rows, -1)
    ids = np.asarray(block.column("vec_id"), dtype=np.int64)
    return (ids, q @ vec)


@ray.remote
def _mmr_row_of(block: pa.Table, vec_id: int):
    """The quantized row of ``vec_id`` if it lives in this block."""
    if block.num_rows == 0 or "vec_id" not in block.column_names:
        return None
    ids = np.asarray(block.column("vec_id"), dtype=np.int64)
    hit = np.flatnonzero(ids == vec_id)
    if len(hit) == 0:
        return None
    col = block.column("codes").combine_chunks()
    q = np.asarray(col.values, dtype=np.int64).reshape(block.num_rows, -1)
    return q[int(hit[0])].copy()


def mmr_diverse_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR 1998) — the training-data verb behind "pick k
    samples RELEVANT to an anchor but not redundant with each other"
    (diverse few-shot/eval-set selection). Greedy: each step selects
    the candidate maximizing ``lambda*rel - (1-lambda)*maxdiv``; with
    lambda = 1/2 that order is the all-integer ``2*rel(d) -
    max_{s in S} sim(d, s)`` — ties break to the smallest vec_id.

    Similarity is the int64 inner product of the corpus-min/max
    uint8-QUANTIZED codes (the ``quantized_topk`` contract): inputs
    are exact parquet floats, the quantization expression is
    replicated token-for-token in SQL, and everything after it is
    integer arithmetic — so the greedy cascade (where a 1-ulp float
    difference would snowball into different selections) is bit-exact
    against the unrolled oracle. Anchor = vec_id 0; candidates = all
    other vectors; fewer than ``k`` candidates yields that many rows
    (both sides degrade identically).

    Distributed shape: one per-dim (min, max) pass (shared expression
    with ``embedding_quantize``); per step the newly selected quantized
    vector broadcasts via ``ray.put`` and each block emits the integer
    dot for its rows (a matvec partial, the broadcast-BSP shape) —
    the driver keeps only O(n) rel/runmax vectors, the broadcast-leg
    regime. Returns (step, vec_id, rel, div_penalty, score), step
    1-based in selection order.
    """
    empty = pa.table(
        {
            "step": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "rel": pa.array([], pa.int64()),
            "div_penalty": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        }
    )

    def to_matrix(batch: pa.Table) -> np.ndarray:
        col = batch.column("embedding").combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        return flat.reshape(batch.num_rows, -1)

    def minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "embedding" not in batch.column_names:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.float64()),
                 "mx": pa.array([], pa.float64())}
            )
        m = to_matrix(batch)
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "mn": pa.array(m.min(axis=0), pa.float64()),
                "mx": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            _emb(sf_dir).map_batches(minmax, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return empty
    mm = pa.concat_tables(parts).to_pandas().groupby("dim").agg(
        mn=("mn", "min"), mx=("mx", "max")
    )
    mn, mx = mm["mn"].to_numpy(), mm["mx"].to_numpy()
    span = mx - mn
    ok = span > 0

    def quantize(m: np.ndarray) -> np.ndarray:
        # EXACT oracle expression: floor((x - mn) * 255 / span + 0.5)
        q = np.zeros_like(m, dtype=np.int64)
        q[:, ok] = np.floor((m[:, ok] - mn[ok]) * 255.0 / span[ok] + 0.5).astype(
            np.int64
        )
        return q

    state_ref = ray.put((mn, mx))

    # quantize ONCE into a materialized integer-code dataset: the k
    # greedy steps then touch only int64 codes (no parquet re-read, no
    # re-quantize per step)
    def to_codes(batch: pa.Table, _s=state_ref) -> pa.Table:
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "codes": pa.array([], pa.list_(pa.int64()))}
            )
        b_mn, b_mx = ray.get(_s)
        b_span = b_mx - b_mn
        b_ok = b_span > 0
        m = to_matrix(batch)
        q = np.zeros_like(m, dtype=np.int64)
        q[:, b_ok] = np.floor(
            (m[:, b_ok] - b_mn[b_ok]) * 255.0 / b_span[b_ok] + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "codes": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    # the k greedy steps run as raw tasks over the materialized code
    # block refs (the embedding_neardup pattern): no per-step Dataset
    # pipeline overhead, blocks stay in the object store
    code_refs = (
        _emb(sf_dir)
        .map_batches(to_codes, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )

    def dots_for(vec: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Integer <codes(row), vec> for every row — one broadcast matvec."""
        vec_ref = ray.put(vec)
        parts = ray.get([_mmr_matvec_block.remote(r, vec_ref) for r in code_refs])
        ids_l = [p[0] for p in parts if len(p[0])]
        dots_l = [p[1] for p in parts if len(p[0])]
        if not ids_l:
            return np.array([], np.int64), np.array([], np.int64)
        return np.concatenate(ids_l), np.concatenate(dots_l)

    def fetch_codes(vec_id: int) -> np.ndarray | None:
        """The quantized row of one vector: point tasks over the code
        block refs (no parquet, no floats)."""
        for row in ray.get([_mmr_row_of.remote(r, vec_id) for r in code_refs]):
            if row is not None:
                return row
        return None

    q0 = fetch_codes(0)
    if q0 is None:
        return empty

    ids, rel_d = dots_for(q0)
    order = np.argsort(ids, kind="stable")
    ids, rel_d = ids[order], rel_d[order]
    n = int(ids.max()) + 1 if len(ids) else 0
    rel = np.zeros(n, dtype=np.int64)
    rel[ids] = rel_d
    cand = np.ones(n, dtype=bool)
    cand[0] = False  # the anchor is never a candidate
    runmax = np.zeros(n, dtype=np.int64)
    out_step, out_id, out_rel, out_div, out_score = [], [], [], [], []
    emb_cache: dict[int, np.ndarray] = {}
    for step in range(1, k + 1):
        if not cand.any():
            break
        score = 2 * rel - runmax
        # argmax over the candidate SUBSET (never negate a sentinel:
        # -int64.min overflows back to int64.min and sorts masked rows
        # first); ties -> smallest vec_id
        idx = np.flatnonzero(cand)
        pick = int(idx[np.lexsort((idx, -score[idx]))[0]])
        out_step.append(step)
        out_id.append(pick)
        out_rel.append(int(rel[pick]))
        out_div.append(int(runmax[pick]))
        out_score.append(int(score[pick]))
        cand[pick] = False
        if step < k and cand.any():
            qs = fetch_codes(pick)
            d_ids, d_dots = dots_for(qs)
            dv = np.zeros(n, dtype=np.int64)
            dv[d_ids] = d_dots
            runmax = np.maximum(runmax, dv)
    return pa.table(
        {
            "step": pa.array(out_step, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "rel": pa.array(out_rel, pa.int64()),
            "div_penalty": pa.array(out_div, pa.int64()),
            "score": pa.array(out_score, pa.int64()),
        }
    )
