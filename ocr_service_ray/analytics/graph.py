"""Iterative graph analytics over the derived kNN similarity graph.

The reference has no graph capability at all (SURVEY.md §2.9); a
training-data pipeline needs graph centrality for representative /
diversity selection over similarity graphs (pick canonical docs by
PageRank mass instead of raw quality), and the BSP shape here is the
template any iterative Pregel-style op follows on Ray Data.

Determinism discipline (the kmeans_fit precedent): ranks are FIXED-
POINT int64 micro-units and every per-iteration reduction is an
integer sum — order-free across block layouts — so results are
bit-identical however Ray splits the edge set, and a pure-Python
reference implementation pins the semantics exactly (no SQL oracle:
iterative global state).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def pagerank_reference(
    edges: list[tuple[int, int]], n_nodes: int, k: int, iters: int
) -> np.ndarray:
    """Pure-Python/numpy single-process reference: the exact integer
    recurrence the distributed plan computes —
    ``r'(v) = 150_000 + (85 * sum_{u->v} (r(u) // k)) // 100``
    (d = 0.85 fixed-point, uniform out-degree k, start 1_000_000).
    """
    src = np.asarray([e[0] for e in edges], dtype=np.int64)
    dst = np.asarray([e[1] for e in edges], dtype=np.int64)
    r = np.full(n_nodes, 1_000_000, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(s, dst, r[src] // k)
        r = 150_000 + (85 * s) // 100
    return r


def _vec_count(sf_dir: str) -> int:
    """Verified-contiguous node count of the embeddings table (the
    0..n-1 vec_id domain every graph op here indexes by)."""
    ids_ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(
        lambda t: pa.table(
            {"vec_id": pa.array(np.unique(np.asarray(t.column("vec_id"), dtype=np.int64)))}
        ),
        batch_format="pyarrow",
    )
    parts = [
        np.asarray(t.column("vec_id"))
        for t in ray.get(ids_ds.to_arrow_refs())
        if t.num_rows
    ]
    ids = np.unique(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)
    n = len(ids)
    if n and not (ids[0] == 0 and ids[-1] == n - 1):
        raise ValueError("kNN graph ops expect a contiguous vec_id domain")
    return n


def _sum_partials(mapped: "ray.data.Dataset", n: int) -> np.ndarray:
    """Driver reduce of per-block (key, count) partials into a dense
    int64 vector — the merge half of every broadcast-leg superstep
    here. ``np.add.at`` (unbuffered) rather than fancy-index ``+=``:
    keys are unique within one combiner output, but if the executor
    ever bundles several map outputs into a single block a repeated
    key must accumulate, not silently last-write."""
    out = np.zeros(n, dtype=np.int64)
    for ref in mapped.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            d = np.asarray(t.column(0), dtype=np.int64)
            c = t.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(out, d, c)
    return out


def _knn_edge_setup(sf_dir: str, k: int) -> tuple[list, int]:
    """Edge blocks of the exact kNN cosine graph over the embeddings
    table (the `knn_join` edge set) + the verified node count — the
    shared front end of graph_pagerank / graph_hits.

    Edge build is the `_knn_block` block tasks; the returned refs stay
    in the OBJECT STORE (callers wrap them with ``from_arrow_refs`` or
    map over them) — edges never gather on the driver. Node ids are
    the contiguous 0..n-1 vec_id domain, verified here rather than
    assumed (per-block unique partials merged on the driver: the ids
    end up driver-resident either way for the contiguity check, so a
    Ray groupby would only pre-sort what the driver is about to hold).
    """
    from .similarity import _emb, _knn_block

    refs = _emb(sf_dir).to_arrow_refs()
    edge_refs = [_knn_block.remote(r, refs, k) for r in refs]
    return edge_refs, _vec_count(sf_dir)


def graph_pagerank(
    sf_dir: str,
    k: int = 5,
    iters: int = 8,
    broadcast_max_nodes: int = 200_000_000,
) -> pa.Table:
    """PageRank over the exact kNN cosine graph of the embeddings
    table (each vector -> its k nearest neighbors, the `knn_join`
    edge set): centrality-based representative scoring.

    Distributed shape — TWO legs computing the identical integer
    recurrence (bit-identical; pinned by a both-branches test):

    Broadcast leg (node-count <= ``broadcast_max_nodes``, i.e. the
    dense int64 rank vector fits a worker heap — 200M nodes = 1.6 GB):
      - edge build: the `knn_join` block tasks, kept as OBJECT-STORE
        refs (`from_arrow_refs`) — edges never gather on the driver;
      - per iteration (BSP superstep): the rank vector is broadcast
        once via ``ray.put`` (the Pregel-aggregator pattern), each
        edge block computes vectorized ``rank[src] // k``
        contributions reduced per-dst INSIDE the block (TableGroupBy
        combiner), and one dst-keyed groupby sums partials — the only
        shuffle, sized by distinct dst per block, not edge count.

    Dataset leg (node-count > threshold — the 10^12-doc path): ranks
    live as a ``(vec_id, r)`` Dataset in the object store; no O(n)
    driver or single-worker state at any point of the iteration.
      - reduce-side join: union-tag rank rows (dst = -1 sentinel)
        with edge rows, groupby(hash bucket of src) — B bounded groups,
        vectorized sorted-key ``searchsorted`` join per bucket emitting
        per-dst-combined ``r // k`` contributions [shuffle 1];
      - contribution sum: union the per-dst partials with a domain-
        zero fill (every node, c = 0) so no-in-edge nodes surface,
        groupby(dst).sum [shuffle 2], then the integer damping map;
      - ranks materialize per superstep (object store, spillable) so
        lineage stays O(1) deep across iterations.

    Every node has exactly ``k`` out-edges (kNN), so there is no
    dangling mass and out-degree needs no join. Returns
    (vec_id, score_micros, rank) with rank 1 = highest centrality
    (ties -> ascending vec_id).
    """
    edge_refs, n = _knn_edge_setup(sf_dir, k)
    if n == 0:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "score_micros": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    edges_ds = ray.data.from_arrow_refs(edge_refs)
    if n > broadcast_max_nodes:
        return _pagerank_dataset_leg(edges_ds, n, k, iters)
    rank = np.full(n, 1_000_000, dtype=np.int64)
    for _ in range(iters):
        rank_ref = ray.put(rank)

        def contrib(batch: pa.Table, _r=rank_ref) -> pa.Table:
            if batch.num_rows == 0 or "vec_id" not in batch.column_names:
                return pa.table(
                    {"dst": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            r = ray.get(_r)
            src = np.asarray(batch.column("vec_id"), dtype=np.int64)
            dst = np.asarray(batch.column("neighbor_id"), dtype=np.int64)
            t = pa.table(
                {"dst": pa.array(dst, pa.int64()), "c": pa.array(r[src] // k, pa.int64())}
            )
            g = pa.TableGroupBy(t, ["dst"]).aggregate([("c", "sum")])
            return g.rename_columns(["dst", "c"])

        # the superstep needs no Ray shuffle in THIS leg: the driver
        # already owns the O(n) rank vector (that is the leg's
        # documented regime), and each block partial is per-dst
        # combined, so summing partials into s driver-side replaces a
        # dst-keyed groupby whose output the driver was about to pull
        # anyway. Integer adds are order-free — bit-identical across
        # block layouts (reference-equality test).
        s = _sum_partials(edges_ds.map_batches(contrib, batch_format="pyarrow"), n)
        rank = 150_000 + (85 * s) // 100

    order = np.lexsort((np.arange(n), -rank))
    ordinal = np.empty(n, dtype=np.int64)
    ordinal[order] = np.arange(1, n + 1)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "score_micros": pa.array(rank, pa.int64()),
            "rank": pa.array(ordinal, pa.int64()),
        }
    )


def _pagerank_dataset_leg(
    edges_ds: "ray.data.Dataset", n: int, k: int, iters: int, n_buckets: int = 256
) -> pa.Table:
    """Rank-as-Dataset BSP supersteps (see graph_pagerank docstring).

    All state between supersteps is a materialized ``(vec_id, r)``
    Dataset — nothing node-count-sized ever lives on the driver or in
    one task. The per-superstep reduce-side join is keyed by HASH
    BUCKET (``src % n_buckets``), not by node: a bucket group holds
    ~n/B rank rows + ~m/B edge rows and joins them with one vectorized
    sort + ``searchsorted`` — B Python group calls per superstep
    instead of n (per-NODE groups would mean 10^12 Python invocations
    at target scale). Integer arithmetic is identical to the broadcast
    leg (sum of ``r // k`` per dst is order-free), so results are
    bit-identical across legs and block layouts.
    """
    edges_tagged = edges_ds.map_batches(
        lambda b: pa.table(
            {
                "bucket": pa.array(
                    np.asarray(b.column("vec_id"), dtype=np.int64) % n_buckets,
                    pa.int64(),
                )
                if "vec_id" in b.column_names
                else pa.array([], pa.int64()),
                "key": b.column("vec_id").cast(pa.int64())
                if "vec_id" in b.column_names
                else pa.array([], pa.int64()),
                "dst": b.column("neighbor_id").cast(pa.int64())
                if "neighbor_id" in b.column_names
                else pa.array([], pa.int64()),
                "r": pa.nulls(
                    b.num_rows if "vec_id" in b.column_names else 0, pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").cast(pa.int64())
        return pa.table(
            {
                "vec_id": ids,
                "r": pa.array(np.full(len(ids), 1_000_000, np.int64)),
            }
        )

    domain = ray.data.range(n)
    ranks = domain.map_batches(init_ranks, batch_format="pyarrow").materialize()
    # domain-zero fill rows, built once: every node surfaces in the
    # contribution sum even with no in-edges (s = 0 -> r' = 150_000)
    zeros = domain.map_batches(
        lambda b: pa.table(
            {
                "dst": b.column("id").cast(pa.int64()),
                "c": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def bucket_join(group: pa.Table) -> pa.Table:
        # rank rows (dst == -1 sentinel) and edge rows of one hash
        # bucket: vectorized rank lookup via sorted keys + searchsorted.
        dst = np.asarray(group.column("dst"), dtype=np.int64)
        key = np.asarray(group.column("key"), dtype=np.int64)
        is_rank = dst == -1
        # edge rows carry a null r: fill before the numpy view so the
        # int64 dtype survives (nulls would otherwise float the column)
        r_arr = (
            pc.fill_null(group.column("r"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        rk, rv = key[is_rank], r_arr[is_rank]
        order = np.argsort(rk, kind="stable")
        rk, rv = rk[order], rv[order]
        src, out = key[~is_rank], dst[~is_rank]
        if len(out) == 0:
            return pa.table(
                {"dst": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(rk, src)
        contrib = rv[pos] // k
        # in-bucket per-dst combine before the dst shuffle
        t = pa.table(
            {"dst": pa.array(out, pa.int64()), "c": pa.array(contrib, pa.int64())}
        )
        g = pa.TableGroupBy(t, ["dst"]).aggregate([("c", "sum")])
        return g.rename_columns(["dst", "c"])

    for _ in range(iters):
        ranks_tagged = ranks.map_batches(
            lambda b: pa.table(
                {
                    "bucket": pa.array(
                        np.asarray(b.column("vec_id"), dtype=np.int64)
                        % n_buckets,
                        pa.int64(),
                    ),
                    "key": b.column("vec_id"),
                    "dst": pa.array(np.full(b.num_rows, -1, np.int64)),
                    "r": b.column("r"),
                }
            ),
            batch_format="pyarrow",
        )
        contribs = (
            edges_tagged.union(ranks_tagged)
            .groupby("bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
        )
        summed = zeros.union(contribs).groupby("dst").sum("c")
        ranks = summed.map_batches(
            lambda b: pa.table(
                {
                    "vec_id": b.column("dst"),
                    "r": pa.array(
                        150_000
                        + (
                            85
                            * b.column("sum(c)")
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)
                        )
                        // 100,
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    parts = [t for t in ray.get(ranks.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(parts).sort_by([("vec_id", "ascending")])
    rank = tbl.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((np.arange(n), -rank))
    ordinal = np.empty(n, dtype=np.int64)
    ordinal[order] = np.arange(1, n + 1)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "score_micros": pa.array(rank, pa.int64()),
            "rank": pa.array(ordinal, pa.int64()),
        }
    )


def triangle_count(sf_dir: str, min_support: int = 2) -> pa.Table:
    """Per-node triangle participation counts over the item
    co-occurrence graph (nodes = ``props.k`` items, edges = pairs with
    user support >= ``min_support``) — the clustering-coefficient /
    community-density primitive.

    Distributed shape (degree-orientation wedge plan):
      - the edge list is the REDUCED co-occurrence aggregate (item-
        domain-bounded, independent of event count) built by the
        `item_cooccurrence` pipeline;
      - orient each edge low-degree -> high-degree (ties: smaller id)
        so every out-adjacency is O(sqrt(m)) — the classic bound that
        kills the high-degree wedge explosion;
      - wedge emission: one src-keyed groupby over oriented edges,
        per-group vectorized triu pairs of out-neighbors;
      - closure check: the oriented edge set is broadcast ONCE as a
        sorted packed-int64 key array (domain-bounded small side) and
        each wedge batch runs a vectorized ``searchsorted``
        membership test — no second shuffle;
      - per-node +1 partials for all three corners, one final
        node-keyed combiner groupby.

    Every triangle is found exactly once (its unique cyclic
    orientation under the total degree order). Oracle: 3-way self-join
    SQL on the same support-filtered edge set.
    """
    from .windows import item_cooccurrence

    edges = item_cooccurrence(sf_dir, min_support=min_support)
    a = np.asarray(edges.column("k_a"), dtype=np.int64)
    b = np.asarray(edges.column("k_b"), dtype=np.int64)
    empty = pa.table(
        {"k": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())}
    )
    if len(a) == 0:
        return empty
    # degree-ordered orientation (vectorized over the reduced edge set)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv)
    da, db = deg[inv[: len(a)]], deg[inv[len(a) :]]
    # rank = (degree, id) total order; orient src -> dst along it
    lower_first = (da < db) | ((da == db) & (a < b))
    src = np.where(lower_first, a, b)
    dst = np.where(lower_first, b, a)
    # packed closure key must be INJECTIVE over the full id range —
    # with negative ids (props.k can be negative) max+1 is NOT a valid
    # base (range straddles zero -> collisions; caught by the oracle
    # fuzz overcounting triangles). Rebase to [0, width) first.
    base = int(nodes.min())
    shift = int(nodes.max()) - base + 1
    edge_keys = np.sort((src - base) * shift + (dst - base))
    keys_ref = ray.put(edge_keys)

    oriented = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )

    rank_key = {int(n): (int(d), int(n)) for n, d in zip(nodes, deg)}

    def wedges(group: pa.Table, _keys=keys_ref, _shift=shift, _base=base) -> pa.Table:
        s = int(group.column("src")[0].as_py())
        outs = np.asarray(group.column("dst"), dtype=np.int64)
        if len(outs) < 2:
            return pa.table(
                {"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        # order out-neighbors by the same (degree, id) total order so
        # the wedge (lo -> hi) matches the oriented closing edge
        import numpy as _np

        ok = sorted(outs.tolist(), key=lambda x: rank_key[x])
        outs = _np.asarray(ok, dtype=_np.int64)
        ia, ib = _np.triu_indices(len(outs), 1)
        w_lo, w_hi = outs[ia], outs[ib]
        keys = ray.get(_keys)
        want = (w_lo - _base) * _shift + (w_hi - _base)
        hit = _np.clip(_np.searchsorted(keys, want), 0, len(keys) - 1)
        closed = keys[hit] == want
        if not closed.any():
            return pa.table(
                {"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        corners = _np.concatenate(
            [_np.full(int(closed.sum()), s, _np.int64), w_lo[closed], w_hi[closed]]
        )
        t = pa.table(
            {
                "k": pa.array(corners, pa.int64()),
                "n": pa.array(_np.ones(len(corners), _np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["k"]).aggregate([("n", "sum")])
        return g.rename_columns(["k", "n"])

    agg = (
        oriented.groupby("src")
        .map_groups(wedges, batch_format="pyarrow")
        .groupby("k")
        .sum("n")
    )
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    tbl = pa.concat_tables(tables)
    return pa.table(
        {
            "k": tbl.column("k"),
            "n_triangles": pa.array(
                tbl.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64(),
            ),
        }
    ).sort_by([("k", "ascending")])


# ----------------------------------------------------------------------
# HITS hubs & authorities


def hits_reference(
    edges: list[tuple[int, int]], n_nodes: int, iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy single-process reference of the exact integer
    recurrence ``graph_hits`` computes (Kleinberg 1999, JACM 46(5),
    re-based on scaled int64 instead of L2 normalization):

        a_raw(v) = sum_{u->v} h(u);  a = a_raw // max(1, max(a_raw) // 10^6)
        h_raw(u) = sum_{u->v} a(v);  h = h_raw // max(1, max(h_raw) // 10^6)

    starting from h = 10^6. The per-iteration max-rescale replaces the
    paper's float normalization: scores stay in ~[0, 2*10^6] so int64
    never overflows for ANY degree distribution, every reduction is an
    order-free integer sum, and ranking is unchanged (floor division
    by a positive global constant is monotone).
    """
    src = np.asarray([e[0] for e in edges], dtype=np.int64)
    dst = np.asarray([e[1] for e in edges], dtype=np.int64)
    h = np.full(n_nodes, 1_000_000, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(iters):
        a = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(a, dst, h[src])
        a //= max(1, int(a.max(initial=0)) // 1_000_000)
        h = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(h, src, a[dst])
        h //= max(1, int(h.max(initial=0)) // 1_000_000)
    return a, h


def graph_hits(sf_dir: str, k: int = 5, iters: int = 4) -> pa.Table:
    """HITS hubs/authorities over the exact kNN cosine graph — the
    second classic link-analysis centrality next to ``graph_pagerank``:
    an *authority* is a vector many hubs point at (a density/prototype
    signal on a similarity graph), a *hub* is one whose out-neighbors
    are authorities. The reference has no graph capability (SURVEY.md
    §2.9); see ``hits_reference`` for the exact integer recurrence and
    why the max-rescale makes it overflow-safe and order-free.

    Distributed shape — the ``graph_pagerank`` broadcast-leg BSP, two
    half-steps per iteration (authority from hubs, hubs from
    authorities). Per half-step the O(n) score vector is broadcast once
    via ``ray.put``; each edge block reduces its contributions per
    target INSIDE the block (TableGroupBy combiner) and the driver sums
    the tiny per-block partials — the regime where the dense int64
    vector fits a worker heap (200M nodes = 1.6 GB). Beyond that the
    ``_pagerank_dataset_leg`` union-tag + hash-bucket-join shape
    applies verbatim (scores as a Dataset, per-superstep materialize);
    not duplicated here. The global max per half-step is the BSP
    aggregator: each partial's max folds into the driver reduce at no
    extra pass.

    Returns (vec_id, authority, hub, rank): rank 1 = highest authority
    (ties -> ascending vec_id). SQL-oracled via unrolled CTEs (the
    ``graph_pagerank`` technique): all arithmetic is BIGINT sum / floor
    division / max on non-negatives, so DuckDB replicates it exactly.
    """
    edge_refs, n = _knn_edge_setup(sf_dir, k)
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "authority": pa.array([], pa.int64()),
            "hub": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    edges_ds = ray.data.from_arrow_refs(edge_refs).materialize()

    def half_step(vec: np.ndarray, out_key: str, in_key: str) -> np.ndarray:
        """One propagation: new[target] = sum over edges of vec[source],
        where (source, target) = (out_key, in_key) columns."""
        vec_ref = ray.put(vec)

        def contrib(batch: pa.Table, _v=vec_ref) -> pa.Table:
            if batch.num_rows == 0 or "vec_id" not in batch.column_names:
                return pa.table(
                    {"t": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            v = ray.get(_v)
            src = np.asarray(batch.column(out_key), dtype=np.int64)
            tgt = np.asarray(batch.column(in_key), dtype=np.int64)
            t = pa.table(
                {"t": pa.array(tgt, pa.int64()), "c": pa.array(v[src], pa.int64())}
            )
            g = pa.TableGroupBy(t, ["t"]).aggregate([("c", "sum")])
            return g.rename_columns(["t", "c"])

        s = _sum_partials(edges_ds.map_batches(contrib, batch_format="pyarrow"), n)
        s //= max(1, int(s.max(initial=0)) // 1_000_000)
        return s

    h = np.full(n, 1_000_000, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = half_step(h, "vec_id", "neighbor_id")
        h = half_step(a, "neighbor_id", "vec_id")

    order = np.lexsort((np.arange(n), -a))
    ordinal = np.empty(n, dtype=np.int64)
    ordinal[order] = np.arange(1, n + 1)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "authority": pa.array(a, pa.int64()),
            "hub": pa.array(h, pa.int64()),
            "rank": pa.array(ordinal, pa.int64()),
        }
    )


# ----------------------------------------------------------------------
# k-core peeling


def kcore_reference(
    und_edges: list[tuple[int, int]], n_nodes: int, kmin: int, rounds: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy reference of the exact fixed-round peel
    ``kcore_members`` computes: simultaneous removal — each round every
    node whose degree among the CURRENTLY alive nodes is < ``kmin``
    drops (all at once, so the result is deterministic and order-free);
    after ``rounds`` rounds (or earlier stability, which yields the
    identical state) returns (alive mask, degree among alive).
    """
    a = np.asarray([e[0] for e in und_edges], dtype=np.int64)
    b = np.asarray([e[1] for e in und_edges], dtype=np.int64)
    alive = np.ones(n_nodes, dtype=bool)
    for _ in range(rounds):
        deg = np.zeros(n_nodes, dtype=np.int64)
        live = alive[a] & alive[b]
        np.add.at(deg, a[live], 1)
        np.add.at(deg, b[live], 1)
        new_alive = alive & (deg >= kmin)
        if np.array_equal(new_alive, alive):
            break
        alive = new_alive
    deg = np.zeros(n_nodes, dtype=np.int64)
    live = alive[a] & alive[b]
    np.add.at(deg, a[live], 1)
    np.add.at(deg, b[live], 1)
    return alive, deg


def kcore_members(
    sf_dir: str, threshold: float = 0.35, kmin: int = 2, rounds: int = 32
) -> pa.Table:
    """k-core of the cosine-THRESHOLD similarity graph (Seidman 1983,
    'Network structure and minimum degree') — the fourth classic graph
    op here next to PageRank / HITS / triangles: iteratively peel
    nodes with fewer than ``kmin`` alive neighbors; what survives is
    the dense similarity core (for curation: high-redundancy regions
    worth aggressive dedup; the complement of the long tail). The
    THRESHOLD graph is the right substrate — the kNN graph guarantees
    out-degree k for every node, so its cores are degenerate (all or
    nothing, verified on the sf corpora); threshold degrees vary with
    true local density (``dbscan_clusters`` uses the same 0.35 edge
    set).

    Semantics are FIXED-ROUND (exactly ``rounds`` simultaneous-removal
    rounds; early stability yields the identical state), so the
    distributed plan, the numpy reference and the unrolled SQL oracle
    agree with no convergence caveat — the ``graph_hits`` contract.
    The sf corpora converge in <= 9 rounds; an unconverged round cap
    still matches the oracle exactly (both sides compute round 32).

    Distributed shape: the edge list is ``embedding_neardup_pairs``
    (exact block-pair join over object-store refs; O(threshold-pair)
    output, the dup-rate-bounded regime); then the ``graph_pagerank``
    broadcast-leg BSP — per round the O(n) alive bitmask is
    ``ray.put`` once, each edge block counts both-alive endpoint
    degrees INSIDE the block (per-node combiner) and the driver sums
    the tiny partials. Beyond the broadcast regime the
    ``_pagerank_dataset_leg`` union-tag join applies to the alive
    table verbatim. Returns surviving (vec_id, deg) — degree among
    members — sorted by vec_id.
    """
    from .dedup import embedding_neardup_pairs

    n = _vec_count(sf_dir)
    empty = pa.table(
        {"vec_id": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
    )
    if n == 0:
        return empty
    pairs = embedding_neardup_pairs(sf_dir, threshold)
    if len(pairs) == 0:
        return empty
    und = ray.data.from_arrow(
        pa.table({"a": pairs.column("vec_a"), "b": pairs.column("vec_b")})
    ).materialize()

    alive = np.ones(n, dtype=bool)

    def degrees(mask: np.ndarray) -> np.ndarray:
        mask_ref = ray.put(mask)

        def contrib(batch: pa.Table, _m=mask_ref) -> pa.Table:
            if batch.num_rows == 0 or "a" not in batch.column_names:
                return pa.table(
                    {"t": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            m = ray.get(_m)
            a = np.asarray(batch.column("a"), dtype=np.int64)
            b = np.asarray(batch.column("b"), dtype=np.int64)
            live = m[a] & m[b]
            ends = np.concatenate([a[live], b[live]])
            t = pa.table(
                {
                    "t": pa.array(ends, pa.int64()),
                    "c": pa.array(np.ones(len(ends), np.int64)),
                }
            )
            g = pa.TableGroupBy(t, ["t"]).aggregate([("c", "sum")])
            return g.rename_columns(["t", "c"])

        return _sum_partials(und.map_batches(contrib, batch_format="pyarrow"), n)

    stable = False
    for _ in range(rounds):
        deg = degrees(alive)
        new_alive = alive & (deg >= kmin)
        if np.array_equal(new_alive, alive):
            stable = True  # deg already describes the final alive set
            break
        alive = new_alive
    if not stable:  # round cap hit with the last peel unapplied to deg
        deg = degrees(alive)
    ids = np.flatnonzero(alive).astype(np.int64)
    return pa.table(
        {"vec_id": pa.array(ids, pa.int64()), "deg": pa.array(deg[ids], pa.int64())}
    )


# ----------------------------------------------------------------------
# Local clustering coefficients


def clustering_coefficients(sf_dir: str, threshold: float = 0.35) -> pa.Table:
    """Local clustering coefficient per vector over the cosine-
    threshold similarity graph (Watts & Strogatz 1998): coeff(v) =
    2 * triangles(v) / (deg(v) * (deg(v) - 1)) — how close v's
    similarity neighborhood is to a clique. The curation read: high
    coeff = v sits in a tight near-dup/community pocket (pair it with
    ``kcore_members``); coeff ~ 0 at high degree = a hub bridging
    unrelated regions. Same 0.35 edge set as ``kcore_members`` /
    ``dbscan_clusters``.

    Distributed shape — the ``triangle_count`` degree-orientation
    wedge plan applied to the ``embedding_neardup_pairs`` edge list
    (O(dup-rate) edges, the bounded regime): orient low-degree ->
    high-degree so out-adjacencies are O(sqrt(m)), one src-keyed
    groupby emits triu wedge pairs, closure is a broadcast sorted
    packed-key ``searchsorted`` (no second shuffle), per-corner +1
    partials combine per node. Degrees fall out of the same pair list
    with one bincount. Full domain output: every vector, zero-degree
    rows included.

    Returns (vec_id, deg, n_tri, coeff) sorted by vec_id; coeff is the
    IEEE-double expression ``2.0 * n_tri / (deg * (deg - 1))`` (0.0
    when deg < 2) — identical in the SQL oracle, so hash-exact.
    """
    from .dedup import embedding_neardup_pairs

    n = _vec_count(sf_dir)
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64()),
            "n_tri": pa.array([], pa.int64()),
            "coeff": pa.array([], pa.float64()),
        }
    )
    if n == 0:
        return empty
    pairs = embedding_neardup_pairs(sf_dir, threshold)
    a = np.asarray(pairs.column("vec_a"), dtype=np.int64)
    b = np.asarray(pairs.column("vec_b"), dtype=np.int64)
    deg_full = np.zeros(n, dtype=np.int64)
    np.add.at(deg_full, a, 1)
    np.add.at(deg_full, b, 1)
    tri = np.zeros(n, dtype=np.int64)
    if len(a):
        # degree-ordered orientation (the triangle_count plan; vec_ids
        # are verified non-negative so max+1 packing is injective)
        da, db = deg_full[a], deg_full[b]
        lower_first = (da < db) | ((da == db) & (a < b))
        src = np.where(lower_first, a, b)
        dst = np.where(lower_first, b, a)
        shift = n
        edge_keys = np.sort(src * shift + dst)
        keys_ref = ray.put(edge_keys)
        deg_ref = ray.put(deg_full)

        oriented = ray.data.from_arrow(
            pa.table(
                {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
            )
        )

        def wedges(group: pa.Table, _keys=keys_ref, _deg=deg_ref, _shift=shift) -> pa.Table:
            s = int(group.column("src")[0].as_py())
            outs = np.asarray(group.column("dst"), dtype=np.int64)
            if len(outs) < 2:
                return pa.table(
                    {"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
                )
            dv = ray.get(_deg)
            # out-neighbors sorted by the same (degree, id) total order
            # so the wedge (lo -> hi) matches the oriented closing edge
            order = np.lexsort((outs, dv[outs]))
            outs = outs[order]
            ia, ib = np.triu_indices(len(outs), 1)
            w_lo, w_hi = outs[ia], outs[ib]
            keys = ray.get(_keys)
            want = w_lo * _shift + w_hi
            hit = np.clip(np.searchsorted(keys, want), 0, len(keys) - 1)
            closed = keys[hit] == want
            if not closed.any():
                return pa.table(
                    {"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
                )
            corners = np.concatenate(
                [np.full(int(closed.sum()), s, np.int64), w_lo[closed], w_hi[closed]]
            )
            t = pa.table(
                {
                    "k": pa.array(corners, pa.int64()),
                    "n": pa.array(np.ones(len(corners), np.int64)),
                }
            )
            g = pa.TableGroupBy(t, ["k"]).aggregate([("n", "sum")])
            return g.rename_columns(["k", "n"])

        agg = (
            oriented.groupby("src")
            .map_groups(wedges, batch_format="pyarrow")
            .groupby("k")
            .sum("n")
        )
        for t in ray.get(agg.to_arrow_refs()):
            if t.num_rows:
                k = np.asarray(t.column("k"), dtype=np.int64)
                c = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
                np.add.at(tri, k, c)

    coeff = np.zeros(n, dtype=np.float64)
    m2 = deg_full >= 2
    coeff[m2] = 2.0 * tri[m2] / (deg_full[m2] * (deg_full[m2] - 1))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "deg": pa.array(deg_full, pa.int64()),
            "n_tri": pa.array(tri, pa.int64()),
            "coeff": pa.array(coeff, pa.float64()),
        }
    )


# ----------------------------------------------------------------------
# Label-propagation communities


def lpa_reference(
    und_edges: list[tuple[int, int]], n_nodes: int, rounds: int
) -> np.ndarray:
    """Pure-numpy reference of the exact synchronous label-propagation
    recurrence ``graph_communities`` computes: labels start as node
    ids; each round EVERY node simultaneously adopts the mode of its
    neighbors' labels (ties -> smallest label; isolated nodes keep
    their own). Synchronous LPA can oscillate on bipartite structures
    — the FIXED-ROUND semantics make that a non-issue for exactness
    (all three implementations compute the identical round-``rounds``
    state).
    """
    a = np.asarray([e[0] for e in und_edges], dtype=np.int64)
    b = np.asarray([e[1] for e in und_edges], dtype=np.int64)
    v = np.concatenate([a, b])
    o = np.concatenate([b, a])
    lbl = np.arange(n_nodes, dtype=np.int64)
    for _ in range(rounds):
        if len(v) == 0:
            break
        nl = lbl[o]
        # mode per node, ties -> smallest label: sort (v, label), run-
        # length counts, then lexicographic argmax on (count, -label)
        order = np.lexsort((nl, v))
        sv, sl = v[order], nl[order]
        new_run = np.concatenate([[True], (sv[1:] != sv[:-1]) | (sl[1:] != sl[:-1])])
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, len(sv)))
        rv, rl = sv[starts], sl[starts]
        best = np.full(n_nodes, -1, dtype=np.int64)
        best_c = np.zeros(n_nodes, dtype=np.int64)
        for node, label, c in zip(rv, rl, counts):
            if c > best_c[node] or (c == best_c[node] and (best[node] == -1 or label < best[node])):
                best_c[node] = c
                best[node] = label
        nxt = lbl.copy()
        has = best != -1
        nxt[has] = best[has]
        if np.array_equal(nxt, lbl):
            break
        lbl = nxt
    return lbl


def graph_communities(sf_dir: str, threshold: float = 0.35, rounds: int = 4) -> pa.Table:
    """Synchronous label-propagation communities (Raghavan, Albert &
    Kumara 2007, Phys. Rev. E 76) over the cosine-threshold similarity
    graph — the sixth graph op: unlike ``embedding_components`` (which
    merges everything reachable), LPA's majority rule splits a
    connected component into DENSE pockets, the community grain a
    mixture/diversity sampler wants. Deterministic variant: labels
    start as vec_ids, every node simultaneously adopts its neighbors'
    mode label (ties -> smallest; isolated nodes keep their own), and
    semantics are FIXED-ROUND (the ``graph_hits``/``kcore`` contract)
    so synchronous oscillation cannot break oracle equality.

    Distributed shape: per round the O(n) label vector broadcasts once
    (``ray.put``); each edge block of the ``embedding_neardup_pairs``
    list emits per-(node, label) count partials combined IN-block
    (TableGroupBy), and the driver's run-length mode pick works on the
    O(m)-bounded partial stream — the same domain-bounded driver-merge
    regime as the pagerank broadcast leg (m = threshold pairs = dup-
    rate bounded). Beyond the broadcast regime the mode pick becomes a
    (node)-keyed groupby over the same partials — one shuffle per
    round, the `_pagerank_dataset_leg` shape. Returns full-domain
    (vec_id, community) sorted by vec_id.
    """
    from .dedup import embedding_neardup_pairs

    n = _vec_count(sf_dir)
    if n == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "community": pa.array([], pa.int64())}
        )
    pairs = embedding_neardup_pairs(sf_dir, threshold)
    lbl = np.arange(n, dtype=np.int64)
    if len(pairs):
        a = np.asarray(pairs.column("vec_a"), dtype=np.int64)
        b = np.asarray(pairs.column("vec_b"), dtype=np.int64)
        sym = ray.data.from_arrow(
            pa.table(
                {
                    "v": pa.array(np.concatenate([a, b]), pa.int64()),
                    "o": pa.array(np.concatenate([b, a]), pa.int64()),
                }
            )
        ).materialize()

        for _ in range(rounds):
            lbl_ref = ray.put(lbl)

            def contrib(batch: pa.Table, _l=lbl_ref) -> pa.Table:
                if batch.num_rows == 0 or "v" not in batch.column_names:
                    return pa.table(
                        {"v": pa.array([], pa.int64()),
                         "lbl": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())}
                    )
                labels = ray.get(_l)
                v = np.asarray(batch.column("v"), dtype=np.int64)
                o = np.asarray(batch.column("o"), dtype=np.int64)
                t = pa.table(
                    {
                        "v": pa.array(v, pa.int64()),
                        "lbl": pa.array(labels[o], pa.int64()),
                        "c": pa.array(np.ones(len(v), np.int64)),
                    }
                )
                g = pa.TableGroupBy(t, ["v", "lbl"]).aggregate([("c", "sum")])
                return g.rename_columns(["v", "lbl", "c"])

            # driver merge of the O(m)-bounded (v, lbl, c) partials:
            # run-length reduce + lexicographic mode pick
            vs, ls, cs = [], [], []
            for ref in sym.map_batches(contrib, batch_format="pyarrow").to_arrow_refs():
                t = ray.get(ref)
                if t.num_rows:
                    vs.append(np.asarray(t.column("v"), dtype=np.int64))
                    ls.append(np.asarray(t.column("lbl"), dtype=np.int64))
                    cs.append(t.column("c").to_numpy(zero_copy_only=False).astype(np.int64))
            if not vs:
                break
            v = np.concatenate(vs)
            l = np.concatenate(ls)
            c = np.concatenate(cs)
            order = np.lexsort((l, v))
            v, l, c = v[order], l[order], c[order]
            new_run = np.concatenate([[True], (v[1:] != v[:-1]) | (l[1:] != l[:-1])])
            grp = np.cumsum(new_run) - 1
            csum = np.zeros(grp[-1] + 1, dtype=np.int64)
            np.add.at(csum, grp, c)
            rv, rl = v[new_run], l[new_run]
            # per node: max count, tie -> smallest label (rl ascending
            # within a node, so stable first-hit on sorted -count wins)
            nxt = lbl.copy()
            ordp = np.lexsort((rl, -csum, rv))
            rv2 = rv[ordp]
            first = np.concatenate([[True], rv2[1:] != rv2[:-1]])
            nxt[rv2[first]] = rl[ordp][first]
            if np.array_equal(nxt, lbl):
                break
            lbl = nxt
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "community": pa.array(lbl, pa.int64()),
        }
    )
