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


def _emb(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    tbl = (
        _emb(sf_dir)
        .filter(lambda r: r["vec_id"] < n_queries)
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
    q_ref = ray.put(q)

    def block_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id"))
        m = _norm_rows(np.vstack(batch.column("embedding").to_pylist()).astype(np.float64))
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
        ray.get(_emb(sf_dir).map_batches(block_topk, batch_format="pyarrow").to_arrow_refs())
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


def ivf_topk(
    sf_dir: str, n_queries: int = 8, k: int = 10, n_clusters: int = 16, nprobe: int = 4
) -> pa.Table:
    """IVF-bucketed ANN: probe only nprobe nearest coarse cells.

    The centroid model is fit on a driver-side sample (small, seeded)
    and broadcast; assignment + per-cell search run distributed. At
    cluster scale the cells become the partitioning key so each query
    touches nprobe partitions instead of the full corpus.
    """
    qids, q = _query_matrix(sf_dir, n_queries)
    sample = _emb(sf_dir).limit(4096).to_pandas()
    x = _norm_rows(np.vstack(sample["embedding"].to_numpy()).astype(np.float64))
    cent = _kmeans_lite(x, n_clusters)
    cent_ref = ray.put(cent)
    q_ref = ray.put(q)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (n_queries, nprobe)
    probe_ref = ray.put(probe)

    def block_topk(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qm = ray.get(q_ref)
        pr = ray.get(probe_ref)
        ids = np.asarray(batch.column("vec_id"))
        m = _norm_rows(np.vstack(batch.column("embedding").to_pylist()).astype(np.float64))
        cells = (m @ c.T).argmax(axis=1)
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

    partials = pa.concat_tables(
        ray.get(_emb(sf_dir).map_batches(block_topk, batch_format="pyarrow").to_arrow_refs())
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
