"""Windowed / session operators over the ``events`` stream table.

The reference has no streaming semantics at all (SURVEY.md §2.9); these
are the batch forms a training-data pipeline needs for event streams:

- tumbling window aggregate: combiner pattern — floor timestamps to the
  window inside ``map_batches`` (vectorized), partial-aggregate per
  (window, type), then a small groupby over the reduced key space.
- hopping windows: same combiner, events replicated into their
  size/hop overlapping windows inside the batch.
- sessionization (gaps-and-islands), two plans: hash-shuffle by user +
  per-group scan (one user = one group), and the segmented-scan plan
  (global sort + interior/boundary split + distributed merge) with no
  per-user group bound — both oracle-exact.
- as-of join (per-user searchsorted) and bucketed range join
  (probe-side replication into overlapping time buckets).
- exact count-distinct (two-level groupby) and discrete quantiles
  (quantile_disc convention).

Float/time discipline for the DuckDB oracles: window starts are epoch
SECONDS as int64, money sums are integer cents, durations are exact
microsecond diffs divided by 1e6 (bit-identical in both engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _events(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


_ARROW_UNIT = {"h": "hour", "min": "minute", "d": "day"}


def tumbling_counts(sf_dir: str, window: str = "h") -> pa.Table:
    """Per (window_start, event_type): event count + value sum in cents."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: floor_temporal + int cast, no pandas.
        import pyarrow.compute as pc

        win = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit=_ARROW_UNIT[window]),
                    pa.timestamp("s")),
            pa.int64(),
        )
        # DuckDB round() is half-AWAY-from-zero; np.rint is half-to-even.
        v = batch.column("value").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        t = pa.table(
            {
                "window_start_s": win,
                "event_type": batch.column("event_type"),
                "n_events": pa.array(np.ones(len(batch), np.int64)),
                "sum_value_cents": pa.array(cents, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["window_start_s", "event_type"]).aggregate(
            [("n_events", "sum"), ("sum_value_cents", "sum")]
        )
        return g.rename_columns(
            ["window_start_s", "event_type", "n_events", "sum_value_cents"]
        )

    partials = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    final = (
        partials.groupby(["window_start_s", "event_type"])
        .sum(["n_events", "sum_value_cents"])
        .to_pandas()
        .rename(columns={"sum(n_events)": "n_events", "sum(sum_value_cents)": "sum_value_cents"})
    )
    final["n_events"] = final["n_events"].astype(np.int64)
    final["sum_value_cents"] = final["sum_value_cents"].astype(np.int64)
    final = final.sort_values(["window_start_s", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def _sorted_ts_group(group: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """Arrow-native prologue shared by the per-user map_groups kernels:
    stable (ts, event_id) sort + a µs-int64 view of ts. Replaces the
    former ``group.to_pandas().sort_values([...])`` round-trip — groups
    are per-user (bounded) so this was overhead rather than a scale
    limit, but it removes a DataFrame construction per group across
    ~10 operators. The total order equals the pandas one exactly
    (event_id is unique, both sorts are stable multi-key)."""
    g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    ts_us = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    return g, ts_us


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Per (user_id, session_idx): event count + duration.

    Sessions split on inactivity > ``gap_minutes``; events ordered by
    (ts, event_id) within user (full tie-break for determinism).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        g, ts_us = _sorted_ts_group(group)
        n = len(ts_us)
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (np.diff(ts_us) > gap_us).astype(np.int64)
        # sessions are CONTIGUOUS runs in the sorted order: boundary
        # indexing replaces the former pandas groupby-agg (one user per
        # group, session_idx already ascending)
        starts = np.flatnonzero(np.r_[np.int64(1), brk[1:]])
        ends = np.r_[starts[1:], n]
        uid = int(g.column("user_id")[0].as_py())
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid, np.int64)),
                "session_idx": pa.array(np.cumsum(brk)[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "duration_s": pa.array(
                    (ts_us[ends - 1] - ts_us[starts]) / 1_000_000.0, pa.float64()
                ),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "user_id"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tbl = out.to_pandas().sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(tbl, preserve_index=False)


def hopping_counts(sf_dir: str, size_s: int = 3600, hop_s: int = 900) -> pa.Table:
    """Hopping (sliding) window aggregate: each event lands in
    size/hop overlapping windows (here 4: 1h windows every 15min).

    Combiner shape like tumbling, but the per-batch map REPLICATES each
    event into its windows vectorized (tile/repeat) before the partial
    aggregate — the window fan-out never leaves the batch, so the
    shuffle still moves only (window, type) partials.
    """
    import pyarrow.compute as pc

    n_hops = size_s // hop_s
    hop_us = hop_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        base = us // hop_us  # hop index of the event's own hop bucket
        win = ((base[None, :] - np.arange(n_hops)[:, None]) * hop_s).reshape(-1)
        v = batch.column("value").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        et = np.asarray(batch.column("event_type").to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "window_start_s": pa.array(win, pa.int64()),
                "event_type": pa.array(np.tile(et, n_hops)),
                "n_events": pa.array(np.ones(len(win), np.int64)),
                "sum_value_cents": pa.array(np.tile(cents, n_hops), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["window_start_s", "event_type"]).aggregate(
            [("n_events", "sum"), ("sum_value_cents", "sum")]
        )
        return g.rename_columns(
            ["window_start_s", "event_type", "n_events", "sum_value_cents"]
        )

    partials = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    final = (
        partials.groupby(["window_start_s", "event_type"])
        .sum(["n_events", "sum_value_cents"])
        .to_pandas()
        .rename(columns={"sum(n_events)": "n_events", "sum(sum_value_cents)": "sum_value_cents"})
    )
    final["n_events"] = final["n_events"].astype(np.int64)
    final["sum_value_cents"] = final["sum_value_cents"].astype(np.int64)
    final = final.sort_values(["window_start_s", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def asof_last_purchase(sf_dir: str) -> pa.Table:
    """AS-OF join: each 'click' event matched to the SAME user's latest
    strictly-earlier 'purchase' event (or -1 if none). Tie semantics
    are EXPLICIT: among purchases sharing the latest qualifying ts, the
    max event_id wins (the oracle fuzz showed DuckDB's native ASOF
    leaves that choice unspecified; the driver oracle encodes this
    tie-break, and equivalence with native ASOF on tie-free corpora is
    pinned separately).

    The canonical time-series join Ray Data lacks natively, composed as
    the charter prescribes: hash-shuffle by user_id, then a vectorized
    per-group ``searchsorted`` (both sides of one user fit one group —
    the same partitioning assumption as sessionize, documented there).
    """

    def per_user(group: pa.Table) -> pa.Table:
        g, ts_us = _sorted_ts_group(group)
        etypes = np.asarray(g.column("event_type"))
        eids = np.asarray(g.column("event_id"), dtype=np.int64)
        is_click = etypes == "click"
        is_buy = etypes == "purchase"
        click_ts, click_id = ts_us[is_click], eids[is_click]
        buy_ts, buy_id = ts_us[is_buy], eids[is_buy]
        if buy_ts.size == 0:
            prior = np.full(len(click_id), -1, dtype=np.int64)
            gap = np.full(len(click_id), -1.0)
        else:
            # latest purchase strictly before each click
            pos = np.searchsorted(buy_ts, click_ts, side="left") - 1
            has = pos >= 0
            safe = np.clip(pos, 0, None)
            prior = np.where(has, buy_id[safe], -1).astype(np.int64)
            gap = np.where(has, (click_ts - buy_ts[safe]) / 1_000_000.0, -1.0)
        return pa.table(
            {
                "event_id": pa.array(click_id, pa.int64()),
                "prior_purchase_id": pa.array(prior, pa.int64()),
                "gap_s": pa.array(gap, pa.float64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tbl = pa.concat_tables([t for t in ray.get(out.to_arrow_refs()) if t.num_rows])
    return tbl.sort_by([("event_id", "ascending")])


import ray  # noqa: E402  (used by asof_last_purchase's collection)


def range_join_error_clicks(sf_dir: str, lookback_s: int = 300) -> pa.Table:
    """Range join: per 'error' event, the count of 'click' events (any
    user) in the strictly-preceding ``lookback_s`` window.

    Bucketed range-join shape (the scale-safe plan for interval joins):
    both sides are keyed by a time bucket of width = lookback; the probe
    side is REPLICATED into the 2 buckets its window can overlap, so
    every matching pair is co-located by one hash shuffle; within a
    bucket the count is a vectorized two-``searchsorted`` difference.
    A final groupby(event_id).sum merges the per-bucket partials.
    Oracle: DuckDB inequality join + group-count.
    """
    import pyarrow.compute as pc

    bucket_us = lookback_s * 1_000_000

    def keyed(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        et = np.asarray(batch.column("event_type").to_numpy(zero_copy_only=False))
        eid = np.asarray(batch.column("event_id"))
        is_click = et == "click"
        is_err = et == "error"
        bins = us // bucket_us
        # build side: clicks in their own bucket
        cb = bins[is_click]
        # probe side: errors live in their bucket and the previous one
        eb = bins[is_err]
        out_bin = np.concatenate([cb, eb, eb - 1])
        out_role = np.concatenate(
            [np.zeros(cb.size, np.int8), np.ones(2 * eb.size, np.int8)]
        )
        out_us = np.concatenate([us[is_click], us[is_err], us[is_err]])
        out_id = np.concatenate([eid[is_click], eid[is_err], eid[is_err]])
        return pa.table(
            {
                "bin": pa.array(out_bin, pa.int64()),
                "role": pa.array(out_role, pa.int8()),
                "us": pa.array(out_us, pa.int64()),
                "event_id": pa.array(out_id, pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        role = np.asarray(group.column("role"))
        us = np.asarray(group.column("us"))
        eid = np.asarray(group.column("event_id"))
        clicks = np.sort(us[role == 0])
        err_us = us[role == 1]
        err_id = eid[role == 1]
        if err_id.size == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        # clicks in this bucket within [err - lookback, err)
        lo = np.searchsorted(clicks, err_us - bucket_us, side="left")
        hi = np.searchsorted(clicks, err_us, side="left")
        # clicks is already limited to this bucket, so the absolute-range
        # searchsorted yields exactly this bucket's share of the window;
        # the probe's replica in the other bucket contributes the rest
        n = (hi - lo).astype(np.int64)
        return pa.table(
            {"event_id": pa.array(err_id, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])
    partials = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    final = (
        partials.groupby("event_id")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n_clicks"})
    )
    final["n_clicks"] = final["n_clicks"].astype(np.int64)
    final = final.sort_values("event_id").reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def sessionize_segmented(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Sessionization WITHOUT the one-group-per-user assumption — the
    scale path for mega-users whose raw events exceed a single group.

    Segmented-scan shape:

    1. global ``sort(user_id, ts, event_id)`` (range partition)
    2. per sorted block: vectorized run detection -> session SEGMENTS;
       a segment is FINAL (interior) unless it is its user's first or
       last segment in the block — only those can continue across a
       block boundary (interior segments are fenced by > gap on both
       sides, so cross-block merging cannot reach them)
    3. boundary segments (O(blocks + users), tiny) merge distributed in
       a per-user ``map_groups`` over SEGMENTS, not events
    4. final ranks: one groupby over the SESSION table (events/session
       smaller than the input by the compression factor)

    Output and oracle are identical to ``sessionize``; equality of the
    two plans is pinned in tests.

    Partitioning assumption (documented per the engine charter): each
    map task's batch is a CONTIGUOUS run of the sorted order (Ray
    bundles sorted blocks in order). Interior-segment finality only
    holds for contiguous runs; a non-contiguous bundle could misclassify
    a junction segment.
    """
    import pyarrow.compute as pc

    gap_us = gap_minutes * 60 * 1_000_000

    def segments(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "start_us": pa.array([], pa.int64()),
                 "end_us": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "boundary": pa.array([], pa.bool_())}
            )
        uid = np.asarray(batch.column("user_id"))
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        new_user = uid[1:] != uid[:-1]
        brk = new_user | (np.diff(us) > gap_us)
        starts_idx = np.flatnonzero(np.concatenate(([True], brk)))
        ends_idx = np.concatenate((starts_idx[1:] - 1, [len(us) - 1]))
        seg_user = uid[starts_idx]
        first_of_user = np.concatenate(([True], seg_user[1:] != seg_user[:-1]))
        last_of_user = np.concatenate((seg_user[1:] != seg_user[:-1], [True]))
        return pa.table(
            {
                "user_id": pa.array(seg_user, pa.int64()),
                "start_us": pa.array(us[starts_idx], pa.int64()),
                "end_us": pa.array(us[ends_idx], pa.int64()),
                "n_events": pa.array((ends_idx - starts_idx + 1).astype(np.int64)),
                "boundary": pa.array(first_of_user | last_of_user),
            }
        )

    # materialize ONCE: the segment table is consumed by two filters
    # below, and re-executing a lazy sort gives different (sampled)
    # range boundaries per execution — the two views would disagree on
    # which segments are interior. Segments ~= sessions, far smaller
    # than events, so pinning them in the object store is cheap.
    segs = (
        _events(sf_dir, ["event_id", "ts", "user_id"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(segments, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    def split(batch: pa.Table, keep_boundary: bool) -> pa.Table:
        mask = batch.column("boundary")
        if not keep_boundary:
            mask = pc.invert(mask)
        return batch.filter(mask).drop_columns(["boundary"])

    interior = segs.map_batches(split, fn_kwargs={"keep_boundary": False},
                                batch_format="pyarrow")
    bnd = segs.map_batches(split, fn_kwargs={"keep_boundary": True},
                           batch_format="pyarrow")

    def merge_user(group: pa.Table) -> pa.Table:
        t = group.sort_by([("start_us", "ascending"), ("end_us", "ascending")])
        s = np.asarray(t.column("start_us"))
        e = np.asarray(t.column("end_us"))
        n = np.asarray(t.column("n_events"))
        uid = t.column("user_id")[0].as_py()
        out = []
        cs, ce, cn = s[0], e[0], n[0]
        for i in range(1, len(s)):
            if s[i] - ce <= gap_us:
                ce = max(ce, e[i])
                cn += n[i]
            else:
                out.append((cs, ce, cn))
                cs, ce, cn = s[i], e[i], n[i]
        out.append((cs, ce, cn))
        return pa.table(
            {
                "user_id": pa.array([uid] * len(out), pa.int64()),
                "start_us": pa.array([o[0] for o in out], pa.int64()),
                "end_us": pa.array([o[1] for o in out], pa.int64()),
                "n_events": pa.array([int(o[2]) for o in out], pa.int64()),
            }
        )

    merged = bnd.groupby("user_id").map_groups(merge_user, batch_format="pyarrow")

    def rank_user(group: pa.Table) -> pa.Table:
        t = group.sort_by([("start_us", "ascending")])
        s = np.asarray(t.column("start_us"))
        e = np.asarray(t.column("end_us"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "session_idx": pa.array(np.arange(len(t), dtype=np.int64)),
                "n_events": t.column("n_events"),
                "duration_s": pa.array((e - s) / 1_000_000.0, pa.float64()),
            }
        )

    sessions = (
        interior.union(merged).groupby("user_id").map_groups(
            rank_user, batch_format="pyarrow"
        )
    )
    tables = [t for t in ray.get(sessions.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tables) if tables else pa.table(
        {"user_id": pa.array([], pa.int64()), "session_idx": pa.array([], pa.int64()),
         "n_events": pa.array([], pa.int64()), "duration_s": pa.array([], pa.float64())}
    )
    return tbl.sort_by([("user_id", "ascending"), ("session_idx", "ascending")])


def distinct_users(sf_dir: str) -> pa.Table:
    """Exact count-distinct per event_type via the two-level groupby:
    dedupe on (event_type, user_id) first (uniform hash shuffle), then a
    tiny per-type count. The scale-safe exact plan — the approximate
    alternative (HyperLogLog) trades the first shuffle for a sketch."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type"])
    pairs = (
        ds.groupby(["event_type", "user_id"])
        .count()
        .groupby("event_type")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_users"})
    )
    pairs["n_users"] = pairs["n_users"].astype(np.int64)
    pairs = pairs.sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(pairs, preserve_index=False)


def value_quantiles(
    sf_dir: str, qs: tuple = (0.25, 0.5, 0.75, 0.9), events: "ray.data.Dataset" = None
) -> pa.Table:
    """Per event_type discrete EXACT quantiles of ``value`` (DuckDB
    quantile_disc convention: 0-based index ceil(q*n) - 1 of the sorted
    values) — via distributed rank-pick, no per-type materialization.

    Plan (every step bounded by block size, never by type cardinality —
    the round-2 version's groupby(event_type).map_groups put ~n/5 rows
    in one task; with 5 types at 100 TB that is a multi-TB local sort):

      1. per-type totals: tiny combiner groupby → target rank
         ceil(q*n)-1 per (type, q) on the driver (|types| × |qs| ints).
      2. distributed range-partition sort on (event_type, value);
         blocks come back in global sorted order.
      3. per-block run-length summaries (type, count) — O(runs) per
         block, values never leave the workers — give each block's
         global rank offset per type by prefix-summing in order.
      4. point-pick: only the handful of blocks owning a target rank
         are touched again, each returning |hits| scalars.
    """
    ds = events if events is not None else _events(sf_dir, ["event_type", "value"])
    totals = {
        r["event_type"]: r["count()"]
        for r in ds.groupby("event_type").count().take_all()
    }
    # (type, q) -> global 0-based rank among that type's sorted values
    ranks: dict[str, dict] = {
        t: {q: max(0, int(np.ceil(q * n)) - 1) for q in qs}
        for t, n in totals.items()
    }
    want = {t: sorted(set(r.values())) for t, r in ranks.items()}
    results = _type_rank_pick(ds, want)

    types = sorted(totals)
    cols: dict[str, list] = {"event_type": types}
    for q in qs:
        cols[f"q{int(q * 100)}"] = [results[(t, ranks[t][q])] for t in types]
    return pa.table(
        {k: pa.array(v, pa.string() if k == "event_type" else pa.float64())
         for k, v in cols.items()}
    )


def _type_rank_pick(ds, want: dict) -> dict:
    """Distributed rank-pick: return ``{(event_type, rank): value}`` for
    the requested 0-based ranks of each type's sorted ``value`` column.

    One range-partition sort on (event_type, value); per-block
    run-length summaries (type, count) — values never leave the
    workers — prefix-summed in block order give each run's global rank
    offset, and only the blocks owning a requested rank are touched
    again, each returning |hits| scalars. Driver state is O(runs),
    never O(rows).
    """
    import ray

    refs = ds.sort(["event_type", "value"]).to_arrow_refs()

    @ray.remote
    def run_summary(tbl: pa.Table) -> list[tuple[str, int]]:
        # empty sort-output blocks carry degenerate schemas (Ray 2.49
        # quirk, same as dedup._collect) — treat as no runs
        if tbl.num_rows == 0 or "event_type" not in tbl.column_names:
            return []
        et = np.asarray(tbl.column("event_type").to_numpy(zero_copy_only=False))
        change = np.flatnonzero(et[1:] != et[:-1]) + 1
        starts = np.concatenate(([0], change, [len(et)]))
        return [
            (str(et[starts[i]]), int(starts[i + 1] - starts[i]))
            for i in range(len(starts) - 1)
        ]

    @ray.remote
    def pick(tbl: pa.Table, picks: list[tuple[str, int, int]]) -> list[tuple]:
        # picks: (event_type, rank, local_row) -> value at local_row
        v = np.asarray(tbl.column("value"), dtype=np.float64)
        return [(t, rank, float(v[row])) for t, rank, row in picks]

    summaries = ray.get([run_summary.remote(r) for r in refs])
    # global start rank of each block's runs, per type (blocks are in
    # global sorted order after Dataset.sort)
    seen: dict[str, int] = {}
    block_picks: dict[int, list[tuple[str, int, int]]] = {}
    for bi, runs in enumerate(summaries):
        # local start row of each run within the block
        local = 0
        for t, cnt in runs:
            base = seen.get(t, 0)
            for rank in want.get(t, ()):
                if base <= rank < base + cnt:
                    block_picks.setdefault(bi, []).append(
                        (t, rank, local + (rank - base))
                    )
            seen[t] = base + cnt
            local += cnt
    results: dict[tuple[str, int], float] = {}
    for part in ray.get(
        [pick.remote(refs[bi], ps) for bi, ps in sorted(block_picks.items())]
    ):
        for t, rank, val in part:
            results[(t, rank)] = val
    return results


def value_mad(sf_dir: str) -> pa.Table:
    """Per event_type median absolute deviation (robust spread):
    MAD = quantile_disc(|value - median(value)|, 0.5), median itself by
    the quantile_disc convention.

    The point of this operator is COMPOSITION of the distributed
    rank-pick: pass 1 picks each type's median (O(types) driver state),
    the tiny median map is broadcast into a stateless vectorized
    map_batches that derives the |value - med| column, and pass 2
    rank-picks the median of the derived column. Neither pass ever
    materializes a type's values anywhere; total cost is two
    range-partition sorts.
    """
    ds = _events(sf_dir, ["event_type", "value"])
    totals = {
        r["event_type"]: r["count()"]
        for r in ds.groupby("event_type").count().take_all()
    }
    if not totals:
        return pa.table(
            {"event_type": pa.array([], pa.string()),
             "mad": pa.array([], pa.float64())}
        )
    med_rank = {t: max(0, int(np.ceil(0.5 * n)) - 1) for t, n in totals.items()}
    med = _type_rank_pick(ds, {t: [r] for t, r in med_rank.items()})
    types = sorted(totals)
    types_arr = np.array(types)
    med_arr = np.array([med[(t, med_rank[t])] for t in types], dtype=np.float64)

    def abs_dev(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "value": pa.array([], pa.float64())}
            )
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        # every event_type is in types by construction (pass-1 groupby)
        idx = np.searchsorted(types_arr, et.astype(str))
        v = np.asarray(batch.column("value"), dtype=np.float64)
        return pa.table(
            {"event_type": batch.column("event_type"),
             "value": pa.array(np.abs(v - med_arr[idx]), pa.float64())}
        )

    dev = ds.map_batches(abs_dev, batch_format="pyarrow")
    mad = _type_rank_pick(dev, {t: [med_rank[t]] for t in types})
    return pa.table(
        {"event_type": pa.array(types, pa.string()),
         "mad": pa.array([mad[(t, med_rank[t])] for t in types], pa.float64())}
    )


def value_quantiles_cont(
    sf_dir: str, qs: tuple = (0.25, 0.5, 0.75, 0.9)
) -> pa.Table:
    """Per event_type CONTINUOUS (interpolated) quantiles of ``value``
    — DuckDB ``quantile_cont`` semantics, bit-exact: at position
    h = q*(n-1), result = lo*(1-d) + hi*d with lo = sorted[floor(h)],
    hi = sorted[ceil(h)], d = h - floor(h) (the exact FP op order was
    probed against DuckDB on both sf0.01 and sf0.1 — other
    algebraically-equal forms differ in the last ulp).

    Same distributed rank-pick plan as :func:`value_quantiles` (shared
    ``_type_rank_pick``): each (type, q) needs at most TWO point ranks,
    so the pick set stays O(|types| × |qs|) no matter the corpus size;
    the interpolation is |types| × |qs| scalar FLOPs on the driver.
    """
    ds = _events(sf_dir, ["event_type", "value"])
    totals = {
        r["event_type"]: r["count()"]
        for r in ds.groupby("event_type").count().take_all()
    }
    # (type, q) -> the two bracketing ranks of position h = q*(n-1)
    bounds: dict[str, dict] = {}
    for t, n in totals.items():
        per_q = {}
        for q in qs:
            h = q * (n - 1)
            per_q[q] = (int(np.floor(h)), int(np.ceil(h)), h)
        bounds[t] = per_q
    want = {
        t: sorted({r for frn, crn, _ in per_q.values() for r in (frn, crn)})
        for t, per_q in bounds.items()
    }
    results = _type_rank_pick(ds, want)

    types = sorted(totals)
    cols: dict[str, list] = {"event_type": types}
    for q in qs:
        vals = []
        for t in types:
            frn, crn, h = bounds[t][q]
            lo, hi = results[(t, frn)], results[(t, crn)]
            d = h - frn
            vals.append(lo * (1 - d) + hi * d)
        cols[f"q{int(q * 100)}"] = vals
    return pa.table(
        {k: pa.array(v, pa.string() if k == "event_type" else pa.float64())
         for k, v in cols.items()}
    )


def approx_distinct_users(sf_dir: str, p: int = 12) -> pa.Table:
    """HyperLogLog approximate count-distinct per event_type.

    The sketch alternative to ``distinct_users``: ONE shuffle of 2^p-byte
    register blobs per (batch, type) instead of a corpus-sized
    (type, user) dedupe exchange — the shape that wins when the key
    cardinality itself is huge. Deterministic (md5-based hashing), and —
    since the hash is DuckDB's md5_number_lower and the register sum is
    computed in exact dyadic-integer space — the whole sketch is
    replicated in SQL: the driver hash-verifies the ESTIMATE itself, not
    just row counts. The exact count is emitted alongside (n_users), so
    the ~1.6% error bound at p=12 is visible in the output; it is also
    pinned by a tolerance test.
    """
    from ray.data.aggregate import AggregateFn

    from .hashing import HyperLogLog, md5_hash64

    def sketch_batches(batch: pa.Table) -> pa.Table:
        # one partial sketch per (batch, event_type): the combiner step
        et = np.asarray(batch.column("event_type").to_numpy(zero_copy_only=False))
        uid = np.asarray(batch.column("user_id"))
        types, regs = [], []
        for t in np.unique(et):
            hll = HyperLogLog(p)
            hashes = np.fromiter(
                (md5_hash64(str(u)) for u in uid[et == t]), dtype=np.uint64
            )
            hll.add_hashes(hashes)
            types.append(str(t))
            regs.append(hll.registers.tobytes())
        return pa.table(
            {"event_type": pa.array(types, pa.string()),
             "regs": pa.array(regs, pa.binary())}
        )

    def merge_regs(acc: bytes | None, block: pa.Table) -> bytes:
        out = np.frombuffer(acc, dtype=np.uint8).copy() if acc else np.zeros(1 << p, np.uint8)
        for b in block.column("regs").to_pylist():
            np.maximum(out, np.frombuffer(b, dtype=np.uint8), out=out)
        return out.tobytes()

    agg = AggregateFn(
        init=lambda k: None,
        accumulate_block=merge_regs,
        merge=lambda a, b: (
            np.maximum(
                np.frombuffer(a, np.uint8), np.frombuffer(b, np.uint8)
            ).tobytes()
            if a and b else (a or b)
        ),
        name="regs",
    )
    partials = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        sketch_batches, batch_format="pyarrow"
    )
    merged = partials.groupby("event_type").aggregate(agg)
    rows = []
    for t in ray.get(merged.to_arrow_refs()):
        for r in t.to_pylist():
            hll = HyperLogLog(p)
            hll.registers = np.frombuffer(r["regs"], dtype=np.uint8).copy()
            rows.append((r["event_type"], hll.estimate_rounded()))
    rows.sort()
    exact = {
        r["event_type"]: r["n_users"]
        for r in distinct_users(sf_dir).to_pylist()
    }
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_users": pa.array([exact[r[0]] for r in rows], pa.int64()),
            "approx_users": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def running_totals(sf_dir: str) -> pa.Table:
    """Per-user running value total over time (the prefix-scan shape):
    for every event, the cumulative cents of that user's values up to
    and including it, ordered by (ts, event_id).

    Ray shape: groupby(user_id).map_groups with an in-group sort +
    vectorized cumsum. One user = one group (the same per-user bound as
    ``sessionize``; ``sessionize_segmented`` demonstrates the
    segmented-scan plan that removes the bound when single users exceed
    a task). Integer-cents discipline keeps the sums bit-identical to
    the SQL window oracle.
    """

    def per_user(group: pa.Table) -> pa.Table:
        t = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        v = t.column("value").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "cum_cents": pa.array(np.cumsum(cents), pa.int64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tables)
    return tbl.sort_by([("event_id", "ascending")])


def approx_quantiles_kmv(
    sf_dir: str, k: int = 256, qs: tuple = (0.25, 0.5, 0.75, 0.9)
) -> pa.Table:
    """Approximate per-type quantiles from a KMV (k-minimum-values)
    sample: each event_type keeps the k events with the SMALLEST
    (md5(event_id), event_id) rank; quantiles are estimated from that
    sample with the quantile_disc convention.

    Why KMV instead of a t-digest: the sketch is DETERMINISTIC (the
    sample is a pure function of the data, not of arrival order),
    MERGEABLE (union + re-take-k — the AggregateFn merge below), and
    therefore fully SQL-replicable: the DuckDB oracle reproduces the
    exact sample and hence the exact estimates, so the driver
    hash-verifies an *approximate* operator. A t-digest's centroids
    depend on merge order — unverifiable by construction.

    Shape: one shuffle of k-row sketch partials per (batch, type);
    the value column never moves in full (contrast ``value_quantiles``,
    the exact rank-pick path).
    """
    from ray.data.aggregate import AggregateFn

    from .hashing import md5_batch_int_ids

    def sketch_batches(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_numpy(zero_copy_only=False))
        ids = np.asarray(batch.column("event_id"))
        vals = np.asarray(batch.column("value"), dtype=np.float64)
        hexes = np.array([d.tobytes().hex() for d in md5_batch_int_ids(ids)])
        types, sk = [], []
        for t in np.unique(et):
            m = et == t
            order = np.lexsort((ids[m], hexes[m]))[:k]
            types.append(str(t))
            sk.append(list(zip(hexes[m][order], ids[m][order].tolist(),
                               vals[m][order].tolist())))
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "sketch": pa.array(
                sk, pa.list_(pa.struct([("h", pa.string()), ("i", pa.int64()),
                                        ("v", pa.float64())]))),
        })

    def take_k(entries: list) -> list:
        entries.sort(key=lambda e: (e["h"], e["i"]))
        return entries[:k]

    agg = AggregateFn(
        init=lambda key: [],
        accumulate_block=lambda acc, block: take_k(
            acc + [e for row in block.column("sketch").to_pylist() for e in row]
        ),
        merge=lambda a, b: take_k(list(a) + list(b)),
        name="sketch",
    )
    partials = _events(sf_dir, ["event_id", "event_type", "value"]).map_batches(
        sketch_batches, batch_format="pyarrow"
    )
    merged = partials.groupby("event_type").aggregate(agg)
    rows = []
    for t in ray.get(merged.to_arrow_refs()):
        for r in t.to_pylist():
            v = np.sort(np.array([e["v"] for e in r["sketch"]], dtype=np.float64))
            n = len(v)
            ests = [float(v[max(0, int(np.ceil(q * n)) - 1)]) for q in qs]
            rows.append((r["event_type"], ests))
    rows.sort()
    cols: dict = {"event_type": pa.array([r[0] for r in rows], pa.string())}
    for qi, q in enumerate(qs):
        cols[f"q{int(q * 100)}_est"] = pa.array(
            [r[1][qi] for r in rows], pa.float64()
        )
    return pa.table(cols)


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def purchaser_clicks(sf_dir: str) -> pa.Table:
    """Semi-join + aggregate: click counts for users who have >= 1
    purchase. The broadcast-semi-join shape: a distributed distinct
    pass builds the (small) purchaser set, ``ray.put`` ONCE, then the
    big side streams through a vectorized membership filter + combiner
    count — no shuffle join. At web scale, when the key set outgrows a
    broadcast dict, the same plan swaps the frozenset for a Bloom
    filter (false positives then need a residual exact check).
    """
    import ray
    import pyarrow.compute as pc

    # predicate PUSHDOWN at the read: only purchase rows' row groups
    # leave storage for the key-set pass (prune-at-the-read discipline)
    purchasers = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type"],
            filter=pc.field("event_type") == "purchase",
        )
        .groupby("user_id")
        .count()
    )
    keys = frozenset(
        int(u)
        for t in ray.get(purchasers.to_arrow_refs())
        if t.num_rows
        for u in t.column("user_id").to_pylist()
    )
    keys_ref = ray.put(keys)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks = ray.get(keys_ref)
        b = batch.filter(pc.equal(batch.column("event_type"), "click"))
        uid = np.asarray(b.column("user_id"))
        mask = np.fromiter((int(u) in ks for u in uid), dtype=bool, count=len(uid))
        t = pa.table(
            {"user_id": pa.array(uid[mask], pa.int64()),
             "n_clicks": pa.array(np.ones(int(mask.sum()), np.int64))}
        )
        g = pa.TableGroupBy(t, ["user_id"]).aggregate([("n_clicks", "sum")])
        return g.rename_columns(["user_id", "n_clicks"])

    final = (
        _events(sf_dir, ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .sum("n_clicks")
        .to_pandas()
        .rename(columns={"sum(n_clicks)": "n_clicks"})
    )
    if "n_clicks" not in final.columns:  # empty result loses its schema
        return pa.table(
            {"user_id": pa.array([], pa.int64()), "n_clicks": pa.array([], pa.int64())}
        )
    final["n_clicks"] = final["n_clicks"].astype(np.int64)
    final = final.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def daily_type_pivot(sf_dir: str) -> pa.Table:
    """Pivot (wide aggregate): per DAY, one count column per event
    type. The combiner computes the whole pivot row-block per batch
    (vectorized bincount over day x type), so the shuffle moves only
    |days| x |types| partials — the long->wide reshape never touches
    full rows."""
    import pyarrow.compute as pc

    types = _EVENT_TYPES

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("s")), pa.int64()
        ).to_numpy()
        et = np.asarray(batch.column("event_type").to_numpy(zero_copy_only=False))
        days, inv = np.unique(day, return_inverse=True)
        cols: dict = {"day_s": pa.array(days, pa.int64())}
        for t in types:
            cols[f"n_{t}"] = pa.array(
                np.bincount(inv, weights=(et == t).astype(np.float64),
                            minlength=len(days)).astype(np.int64)
            )
        return pa.table(cols)

    partials = _events(sf_dir, ["ts", "event_type"]).map_batches(
        partial, batch_format="pyarrow"
    )
    final = (
        partials.groupby("day_s")
        .sum([f"n_{t}" for t in types])
        .to_pandas()
        .rename(columns={f"sum(n_{t})": f"n_{t}" for t in types})
    )
    for t in types:
        final[f"n_{t}"] = final[f"n_{t}"].astype(np.int64)
    final = final.sort_values("day_s").reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def daily_type_unpivot(sf_dir: str) -> pa.Table:
    """Unpivot (wide -> long melt), the inverse reshape verb of
    ``daily_type_pivot``: each wide pivot row (day, n_click, n_error,
    ...) becomes |types| long rows (day, event_type, n), zero counts
    included (they are values in the pivot, not NULLs).

    Ray shape: the pivot itself is the existing distributed combiner;
    the melt is a stateless VECTORIZED one-to-many map over the wide
    blocks (np.repeat/np.tile — |types|x row multiplication with no
    Python per row), the same flat_map shape as chunk_documents.
    """
    wide = daily_type_pivot(sf_dir)
    types = _EVENT_TYPES

    def melt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "day_s" not in batch.column_names:
            return pa.table(
                {"day_s": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        day = np.asarray(batch.column("day_s"), dtype=np.int64)
        counts = np.stack(
            [np.asarray(batch.column(f"n_{t}"), dtype=np.int64) for t in types],
            axis=1,
        )  # (rows, types)
        return pa.table(
            {"day_s": pa.array(np.repeat(day, len(types)), pa.int64()),
             "event_type": pa.array(
                 np.tile(np.array(types), len(day)), pa.string()
             ),
             "n": pa.array(counts.reshape(-1), pa.int64())}
        )

    from .dedup import _collect

    out = _collect(
        ray.data.from_arrow(wide).map_batches(melt, batch_format="pyarrow"),
        pa.schema(
            [("day_s", pa.int64()), ("event_type", pa.string()), ("n", pa.int64())]
        ),
    )
    return out.sort_by([("day_s", "ascending"), ("event_type", "ascending")])


def value_histogram(sf_dir: str, width: float = 10.0) -> pa.Table:
    """Fixed-width histogram of ``value`` per event_type (bin =
    floor(value / width)): vectorized per-batch bincount combiner, tiny
    final groupby — the distributed histogram shape."""

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_numpy(zero_copy_only=False))
        b = np.floor(
            np.asarray(batch.column("value"), dtype=np.float64) / width
        ).astype(np.int64)
        t = pa.table(
            {"event_type": pa.array(et), "bin": pa.array(b, pa.int64()),
             "n": pa.array(np.ones(len(b), np.int64))}
        )
        g = pa.TableGroupBy(t, ["event_type", "bin"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "bin", "n"])

    final = (
        _events(sf_dir, ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    final["n"] = final["n"].astype(np.int64)
    final = final.sort_values(["event_type", "bin"]).reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def value_trend(sf_dir: str) -> pa.Table:
    """Per event_type linear trend of value over time: OLS slope /
    intercept / Pearson correlation of (x = seconds since 2024-01-01,
    y = value in integer cents).

    Distributed shape: all five moment sums (Σx Σy Σxy Σx² Σy²) are
    EXACT int64 partials computed vectorized per batch (x ≤ 2.6e6 s for
    a month of data, y ≤ ~6e4 cents → Σx² ≲ 1e17 per type, safely in
    int64 up to ~1e9 rows/type; overflow would need a wider epoch — use
    a later reference date, not floats), reduced by one tiny
    groupby(event_type).sum over ≤ types × blocks rows. The float
    finish (slope/intercept/corr) happens ONCE per type on the reduced
    sums with a single fixed IEEE expression — bit-identical to the
    oracle SQL evaluating the same expression on the same exact sums,
    no accumulation-order sensitivity anywhere. The reference has no
    regression support (SURVEY.md §2.9); this is the distributed-
    moments member of the combiner family.
    """
    ref_us = int(pd.Timestamp("2024-01-01").value // 1000)  # epoch micros

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = np.asarray(batch.column("ts").cast(pa.int64()), dtype=np.int64)
        x = (ts_us - ref_us) // 1_000_000
        v = np.asarray(batch.column("value"), dtype=np.float64) * 100
        y = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x, pa.int64()),
                "sy": pa.array(y, pa.int64()),
                "sxy": pa.array(x * y, pa.int64()),
                "sxx": pa.array(x * x, pa.int64()),
                "syy": pa.array(y * y, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["event_type"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
        )
        return g.rename_columns(["event_type", "n", "sx", "sy", "sxy", "sxx", "syy"])

    sums = (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "sx", "sy", "sxy", "sxx", "syy"])
        .to_pandas()
        .rename(columns={f"sum({c})": c for c in ("n", "sx", "sy", "sxy", "sxx", "syy")})
    )
    n = sums["n"].astype(np.float64).to_numpy()
    sx = sums["sx"].astype(np.float64).to_numpy()
    sy = sums["sy"].astype(np.float64).to_numpy()
    sxy = sums["sxy"].astype(np.float64).to_numpy()
    sxx = sums["sxx"].astype(np.float64).to_numpy()
    syy = sums["syy"].astype(np.float64).to_numpy()
    cov_n = n * sxy - sx * sy  # n² × covariance
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    intercept = (sy - slope * sx) / n
    corr = cov_n / np.sqrt(var_x * var_y)
    out = pd.DataFrame(
        {
            "event_type": sums["event_type"],
            "n": sums["n"].astype(np.int64),
            "slope": slope,
            "intercept": intercept,
            "corr_xy": corr,
        }
    ).sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def value_ranks(sf_dir: str) -> pa.Table:
    """The SQL rank family per partition: rank / dense_rank /
    row_number / percent_rank of ``value`` within ``event_type``
    (peers by value; row_number tie-broken by event_id).

    Distributed shape (the rank-ASSIGNMENT sibling of ``value_ntiles``,
    generalized to PARTITIONED ranks with duplicate-value runs that may
    span block boundaries): one range-partition sort on (event_type,
    value, event_id) — the only all-to-all — then a METADATA-ONLY
    per-block pass summarizing each block's type-segments (rows,
    distinct values, boundary values, trailing-run length; O(types per
    block), never row data), a driver prefix scan over those summaries
    that threads run continuation across blocks (a value-run crossing a
    block boundary keeps its global rank start; its distinct value is
    counted once), and finally one vectorized task per block assigning
    all four ranks from (offsets, local run ids). Driver state is
    O(blocks), row data never leaves the cluster.

    percent_rank = (rank - 1) / (n_partition - 1) — the same two exact
    integers divided once on both sides, so hash-exact.
    """
    import ray

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    refs = ds.sort(["event_type", "value", "event_id"]).to_arrow_refs()

    @ray.remote
    def summarize(tbl: pa.Table) -> list:
        if tbl.num_rows == 0 or "event_type" not in tbl.column_names:
            return []
        et = np.asarray(tbl.column("event_type").to_pylist(), dtype=object)
        v = np.asarray(tbl.column("value"), dtype=np.float64)
        segs = []
        new_seg = np.r_[True, et[1:] != et[:-1]]
        starts = np.flatnonzero(new_seg)
        ends = np.r_[starts[1:], len(et)]
        for s, e in zip(starts, ends):
            sv = v[s:e]
            new_run = np.r_[True, sv[1:] != sv[:-1]]
            n_trail = int((len(sv) - 1) - np.flatnonzero(new_run)[-1]) + 1
            segs.append(
                {
                    "etype": et[s],
                    "n_rows": int(e - s),
                    "n_distinct": int(new_run.sum()),
                    "first_val": float(sv[0]),
                    "last_val": float(sv[-1]),
                    "n_trailing": n_trail,
                }
            )
        return segs

    block_segs = ray.get([summarize.remote(r) for r in refs])

    # driver prefix scan: thread per-type row/distinct offsets and the
    # boundary run's global start across blocks (metadata only)
    cum_rows: dict = {}
    cum_distinct: dict = {}
    prev_type: object = None
    prev_val: float | None = None
    run_start = 0  # within-type row offset where the current trailing run began
    plans = []  # per block: list of (rows_before, dense_base, first_run_base|None)
    for segs in block_segs:
        plan = []
        for seg in segs:
            t = seg["etype"]
            rows_before = cum_rows.get(t, 0)
            distinct_before = cum_distinct.get(t, 0)
            continuing = t == prev_type and seg["first_val"] == prev_val
            plan.append(
                (
                    rows_before,
                    distinct_before + (0 if continuing else 1),
                    run_start if continuing else None,
                )
            )
            cum_rows[t] = rows_before + seg["n_rows"]
            cum_distinct[t] = (
                distinct_before + seg["n_distinct"] - (1 if continuing else 0)
            )
            if not (continuing and seg["n_distinct"] == 1):
                run_start = rows_before + seg["n_rows"] - seg["n_trailing"]
            prev_type, prev_val = t, seg["last_val"]
        plans.append(plan)
    totals_ref = ray.put(dict(cum_rows))

    @ray.remote
    def assign(tbl: pa.Table, plan: list) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "rn": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "dense_rnk": pa.array([], pa.int64()),
                "pct_rank": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0 or "event_type" not in tbl.column_names:
            return empty
        totals = ray.get(totals_ref)
        et = np.asarray(tbl.column("event_type").to_pylist(), dtype=object)
        v = np.asarray(tbl.column("value"), dtype=np.float64)
        rn = np.empty(len(et), np.int64)
        rnk = np.empty(len(et), np.int64)
        dense = np.empty(len(et), np.int64)
        pct = np.empty(len(et), np.float64)
        new_seg = np.r_[True, et[1:] != et[:-1]]
        starts = np.flatnonzero(new_seg)
        ends = np.r_[starts[1:], len(et)]
        for (s, e), (rows_before, dense_base, first_run_base) in zip(
            zip(starts, ends), plan
        ):
            sv = v[s:e]
            m = e - s
            local = np.arange(m, dtype=np.int64)
            new_run = np.r_[True, sv[1:] != sv[:-1]]
            run_id = np.cumsum(new_run) - 1
            run_start_idx = np.flatnonzero(new_run)  # local idx of each run start
            run_rank = rows_before + run_start_idx + 1
            if first_run_base is not None:
                run_rank[0] = first_run_base + 1
            rn[s:e] = rows_before + local + 1
            rnk[s:e] = run_rank[run_id]
            dense[s:e] = dense_base + run_id
            n_t = totals[et[s]]
            pct[s:e] = (
                (rnk[s:e] - 1) / (n_t - 1) if n_t > 1 else np.zeros(m)
            )
        return pa.table(
            {
                "event_id": tbl.column("event_id"),
                "event_type": tbl.column("event_type"),
                "rn": pa.array(rn, pa.int64()),
                "rnk": pa.array(rnk, pa.int64()),
                "dense_rnk": pa.array(dense, pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    parts = ray.get([assign.remote(r, p) for r, p in zip(refs, plans)])
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "rn": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "dense_rnk": pa.array([], pa.int64()),
                "pct_rank": pa.array([], pa.float64()),
            }
        )
    return pa.concat_tables(parts).sort_by([("event_id", "ascending")])


def zscore_outliers(sf_dir: str, threshold: float = 3.0) -> pa.Table:
    """Per-type z-score anomaly filter: events whose value-cents sit
    more than ``threshold`` sample standard deviations from their
    type's mean.

    Two-pass distributed shape: pass 1 is the exact-int moments
    combiner (n, Σy, Σy² per type — same int64 partials as
    ``value_trend``); the tiny per-type stats are broadcast via
    ``ray.put`` and pass 2 is a stateless vectorized filter over a
    pruned re-read. Mean/sd/z are computed with ONE fixed IEEE
    expression from the exact sums — identical on the oracle side, so
    the boundary comparison (|z| > t) can never disagree.
    """

    def moments(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("value"), dtype=np.float64) * 100
        y = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(y), np.int64)),
                "sy": pa.array(y, pa.int64()),
                "syy": pa.array(y * y, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["event_type"]).aggregate(
            [("n", "sum"), ("sy", "sum"), ("syy", "sum")]
        )
        return g.rename_columns(["event_type", "n", "sy", "syy"])

    stats = (
        _events(sf_dir, ["event_type", "value"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "sy", "syy"])
        .to_pandas()
    )
    lookup = {}
    for _, r in stats.iterrows():
        n = float(r["sum(n)"])
        sy = float(r["sum(sy)"])
        syy = float(r["sum(syy)"])
        mean = sy / n
        sd = np.sqrt((n * syy - sy * sy) / (n * (n - 1))) if n > 1 else 0.0
        lookup[r["event_type"]] = (mean, float(sd))
    stats_ref = ray.put(lookup)

    def flag(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        v = np.asarray(batch.column("value"), dtype=np.float64) * 100
        y = np.floor(np.abs(v) + 0.5) * np.sign(v)
        mean = np.asarray([st[t][0] for t in et])
        sd = np.asarray([st[t][1] for t in et])
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (y - mean) / sd
        # sd == 0 (degenerate all-equal type) yields NaN z; NaN compares
        # differently in DuckDB (NaN > x is true there) — exclude the
        # degenerate case explicitly on BOTH sides instead
        keep = (sd > 0) & (np.abs(z) > threshold)
        return pa.table(
            {
                "event_id": batch.column("event_id").filter(pa.array(keep)),
                "event_type": batch.column("event_type").filter(pa.array(keep)),
                "z": pa.array(z[keep], pa.float64()),
            }
        )

    out = _events(sf_dir, ["event_id", "event_type", "value"]).map_batches(
        flag, batch_format="pyarrow"
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "z": pa.array([], pa.float64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("event_id", "ascending")])


def rolling_active_users(sf_dir: str, window_days: int = 7) -> pa.Table:
    """Sliding-window DISTINCT count: per day, the number of distinct
    users active in the trailing ``window_days`` window — the
    rolling-MAU/WAU verb, where plain window sums don't work because
    distinct doesn't decompose.

    Distributed shape: events collapse to in-batch-distinct
    (day, user) pairs first (the only corpus-sized reduction); each
    pair then replicates into the <= window_days windows it can serve
    — all INSIDE the batch, hopping_counts-style — and a two-level
    groupby ((window_day, user) distinct, then count per window_day)
    finishes. The shuffle moves (day, user) replicas bounded by
    window_days x distinct pairs, never events. Windows are emitted
    only for days that have events (calendar gaps carry no row).
    """
    import pyarrow.compute as pc

    day_us = 86400 * 1_000_000

    def pairs_replicated(batch: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("s")),
            pa.int64(),
        )
        t = pa.table({"day_s": win, "user_id": batch.column("user_id")})
        t = pa.TableGroupBy(t, ["day_s", "user_id"]).aggregate([])
        day = np.asarray(t.column("day_s"))
        user = np.asarray(t.column("user_id"))
        # replicate each (day,user) into the window_days windows ending
        # at day .. day + window_days - 1 (vectorized tile/repeat)
        offs = np.arange(window_days, dtype=np.int64) * 86400
        wday = (np.repeat(day, window_days) + np.tile(offs, len(day)))
        return pa.table(
            {
                "window_day_s": pa.array(wday, pa.int64()),
                "user_id": pa.array(np.repeat(user, window_days), pa.int64()),
            }
        )

    ds = _events(sf_dir, ["ts", "user_id"])
    # days that actually have events (the output domain)
    have_days = (
        ds.map_batches(
            lambda b: pa.TableGroupBy(
                pa.table(
                    {"day_s": pc.cast(
                        pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                                pa.timestamp("s")), pa.int64())}
                ),
                ["day_s"],
            ).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("day_s")
        .count()
        .to_pandas()["day_s"]
        .to_numpy()
    )
    have = set(int(x) for x in have_days)

    counts = (
        ds.map_batches(pairs_replicated, batch_format="pyarrow")
        .groupby(["window_day_s", "user_id"])
        .count()
        .groupby("window_day_s")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_active"})
    )
    counts = counts[counts["window_day_s"].isin(have)].reset_index(drop=True)
    counts["n_active"] = counts["n_active"].astype(np.int64)
    counts = counts.rename(columns={"window_day_s": "day_s"}).sort_values(
        "day_s"
    ).reset_index(drop=True)
    return pa.Table.from_pandas(counts, preserve_index=False)


def top_values_with_ties(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-``k`` events by value WITH TIES (SQL ``rank() <= k``): every
    event whose value ties the k-th largest is kept, so the result can
    exceed k rows — the threshold semantics plain row_number top-k
    misses.

    Distributed shape: per-block local top-k values (vectorized
    partition) merge to a threshold on the driver (O(k x blocks)
    scalars); the threshold broadcasts into a stateless filter pass —
    no global sort, no corpus shuffle at all.
    """

    def block_topk(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("value"), dtype=np.float64)
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.float64())})
        keep = np.sort(v)[-k:]
        return pa.table({"v": pa.array(keep, pa.float64())})

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    tops = [
        t for t in ray.get(
            ds.map_batches(block_topk, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tops:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
            }
        )
    allv = np.sort(
        np.concatenate([np.asarray(t.column("v")) for t in tops])
    )[::-1]
    thresh = allv[min(k, len(allv)) - 1]

    def keep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("value"), dtype=np.float64)
        m = pa.array(v >= thresh)
        return pa.table(
            {
                "event_id": batch.column("event_id").filter(m),
                "event_type": batch.column("event_type").filter(m),
                "value": batch.column("value").filter(m),
            }
        )

    out = ds.map_batches(keep, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by(
        [("value", "descending"), ("event_id", "ascending")]
    )


def funnel_counts(sf_dir: str) -> pa.Table:
    """Ordered funnel conversion view -> click -> purchase: how many
    users completed each prefix (a later stage must occur STRICTLY
    after the earliest completion of the previous one).

    Distributed shape: hash-shuffle by user (the session-family key),
    per-group vectorized stage scan (three searchsorted probes over
    the user's sorted timestamps), then a 3-row count combiner. The
    per-user group is bounded by that user's events.
    """
    stages = ("view", "click", "purchase")

    def per_user(group: pa.Table) -> pa.Table:
        g, ts = _sorted_ts_group(group)
        et = np.asarray(g.column("event_type"))
        reached = 0
        prev_t = -1
        for st in stages:
            mask = (et == st) & (ts > prev_t)
            if not mask.any():
                break
            prev_t = ts[mask].min()
            reached += 1
        return pa.table(
            {
                "user_id": pa.array([g.column("user_id")[0].as_py()], pa.int64()),
                "reached": pa.array([reached], pa.int64()),
            }
        )

    per = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "reached" not in batch.column_names:
            return pa.table(
                {"stage": pa.array([], pa.int64()), "n_users": pa.array([], pa.int64())}
            )
        r = np.asarray(batch.column("reached"))
        # a user that reached stage s counts toward every stage <= s
        counts = np.zeros(len(stages), np.int64)
        for s in range(1, len(stages) + 1):
            counts[s - 1] = int((r >= s).sum())
        return pa.table(
            {
                "stage": pa.array(np.arange(1, len(stages) + 1, dtype=np.int64)),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    final = (
        per.map_batches(partial, batch_format="pyarrow")
        .groupby("stage")
        .sum("n_users")
        .to_pandas()
        .rename(columns={"sum(n_users)": "n_users"})
    )
    final["n_users"] = final["n_users"].astype(np.int64)
    final = final.sort_values("stage").reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def retention_cohorts(sf_dir: str) -> pa.Table:
    """Cohort retention triangle: users grouped by first-seen day
    (cohort); for each (cohort_day, day_offset) the number of cohort
    users active that many days later.

    Distributed shape: ONE user-keyed shuffle of the in-batch-distinct
    (day, user) pairs; each per-user group is bounded by the calendar
    (<= days-in-corpus rows), emits (first_day, day - first_day)
    partials; a tiny (cohort, offset)-keyed count combiner finishes.
    No join needed — the cohort assignment and the activity offsets
    live in the same group."""
    import pyarrow.compute as pc

    def day_user(batch: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("s")),
            pa.int64(),
        )
        t = pa.table({"user_id": batch.column("user_id"), "day_s": win})
        return pa.TableGroupBy(t, ["user_id", "day_s"]).aggregate([])

    def per_user(group: pa.Table) -> pa.Table:
        days = np.unique(np.asarray(group.column("day_s")))
        fd = days[0]
        return pa.table(
            {
                "cohort_day_s": pa.array(np.full(len(days), fd), pa.int64()),
                "day_offset": pa.array((days - fd) // 86400, pa.int64()),
                "n_users": pa.array(np.ones(len(days), np.int64)),
            }
        )

    final = (
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(day_user, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["cohort_day_s", "day_offset"])
        .sum("n_users")
        .to_pandas()
        .rename(columns={"sum(n_users)": "n_users"})
    )
    final["n_users"] = final["n_users"].astype(np.int64)
    final = final.sort_values(["cohort_day_s", "day_offset"]).reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def props_k_stats(sf_dir: str) -> pa.Table:
    """Semi-structured extraction: parse the JSON ``props`` column's
    integer field ``k`` and aggregate (count, value cents) per k.

    The extraction is fully vectorized — ``pyarrow.compute``'s
    ``extract_regex`` RE2 kernel, the engine DuckDB's JSON/regex path
    shares, so no Python-per-row JSON parsing in the hot loop (a
    general-schema variant would switch to a per-batch
    ``json.loads`` actor stage; for a fixed field the regex kernel is
    the fast path and exactly mirrors ``json_extract``). Combiner
    aggregate: k-keyed partials, one tiny shuffle."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            pc.fill_null(batch.column("props"), ""), r'"k":\s*(?P<kv>-?\d+)'
        )
        k = pc.cast(pc.struct_field(ex, "kv"), pa.int64())
        v = np.asarray(batch.column("value"), dtype=np.float64) * 100
        cents = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        valid = pc.is_valid(k)
        t = pa.table(
            {
                "k": pc.filter(k, valid),
                "n": pa.array(
                    np.ones(int(pc.sum(pc.cast(valid, pa.int64())).as_py() or 0), np.int64)
                ),
                "sum_cents": pa.array(cents[np.asarray(valid)], pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["k"]).aggregate([("n", "sum"), ("sum_cents", "sum")])
        return g.rename_columns(["k", "n", "sum_cents"])

    final = (
        _events(sf_dir, ["props", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum(["n", "sum_cents"])
        .to_pandas()
        .rename(columns={"sum(n)": "n", "sum(sum_cents)": "sum_cents"})
    )
    final["n"] = final["n"].astype(np.int64)
    final["sum_cents"] = final["sum_cents"].astype(np.int64)
    final = final.sort_values("k").reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def value_mode(sf_dir: str) -> pa.Table:
    """Per-type mode of value-cents (ties -> smallest value): the
    distributed MODE shape — per-batch (type, cents) count partials,
    one groupby over the reduced (type, cents) key space (bounded by
    the value domain, not the row count), then a driver-side argmax
    over the tiny aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("value"), dtype=np.float64) * 100
        y = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(y, pa.int64()),
                "n": pa.array(np.ones(len(y), np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["event_type", "cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "cents", "n"])

    agg = (
        _events(sf_dir, ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    agg = agg.sort_values(["event_type", "n", "cents"], ascending=[True, False, True])
    out = agg.groupby("event_type", sort=True).head(1).reset_index(drop=True)
    out = out.rename(columns={"cents": "mode_cents"})[["event_type", "mode_cents", "n"]]
    out["mode_cents"] = out["mode_cents"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def daily_new_users(sf_dir: str) -> pa.Table:
    """Per day: distinct active users, first-seen (new) users, and the
    cumulative user count — the growth-accounting verbs.

    Distributed shape: two combiner aggregates — (a) first-seen day per
    user via per-batch min partials + groupby(user).min (user-keyed,
    uniform), (b) daily active via the two-level exact-distinct groupby
    (day,user) -> day. Both reduce to day-keyed tables bounded by the
    calendar, so the cumulative sum is a driver-side prefix over a
    tiny table."""
    import pyarrow.compute as pc

    def day_user(batch: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("s")),
            pa.int64(),
        )
        t = pa.table({"day_s": win, "user_id": batch.column("user_id")})
        # in-batch distinct: shrink the shuffle to unique (day, user)
        g = pa.TableGroupBy(t, ["day_s", "user_id"]).aggregate([])
        return g

    pairs = (
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(day_user, batch_format="pyarrow")
        .groupby(["day_s", "user_id"])
        .count()
        # consumed twice (first-seen + daily-active); materialize the
        # distinct (day,user) table once instead of re-shuffling
        .materialize()
    )
    first = (
        pairs.groupby("user_id")
        .min("day_s")
        .to_pandas()
        .rename(columns={"min(day_s)": "fd"})
    )
    active = (
        pairs.groupby("day_s")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_active"})
    )
    new = first.groupby("fd").size().rename("n_new").reset_index()
    out = active.merge(new, left_on="day_s", right_on="fd", how="left").drop(
        columns=["fd"]
    )
    out["n_new"] = out["n_new"].fillna(0).astype(np.int64)
    out["n_active"] = out["n_active"].astype(np.int64)
    out = out.sort_values("day_s").reset_index(drop=True)
    out["cum_users"] = out["n_new"].cumsum().astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def user_journeys(sf_dir: str, prefix_len: int = 8) -> pa.Table:
    """Sequence mining: frequency of each user's first-``prefix_len``
    event-type path (events ordered by (ts, event_id)).

    Distributed shape: hash-shuffle by user_id (bounded groups — a
    user's events, same partitioning key the session family reuses) ->
    per-group vectorized path build -> the path frequency count is a
    per-batch np.unique partial + one tiny groupby(path).sum, so the
    second shuffle moves (path, count) partials only. The reference has
    no sequence analysis (SURVEY.md §2.9).
    """

    def per_user(group: pa.Table) -> pa.Table:
        g, _ = _sorted_ts_group(group)
        et = np.asarray(g.column("event_type"))[:prefix_len]
        return pa.table({"path": pa.array([">".join(et)], pa.string())})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "path" not in batch.column_names:
            return pa.table(
                {"path": pa.array([], pa.string()), "n_users": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(
            np.asarray(batch.column("path").to_pylist(), dtype=object), return_counts=True
        )
        return pa.table(
            {
                "path": pa.array(list(uniq), pa.string()),
                "n_users": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    final = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("path")
        .sum("n_users")
        .to_pandas()
        .rename(columns={"sum(n_users)": "n_users"})
    )
    final["n_users"] = final["n_users"].astype(np.int64)
    final = final.sort_values("path").reset_index(drop=True)
    return pa.Table.from_pandas(final, preserve_index=False)


def event_transitions(sf_dir: str) -> pa.Table:
    """Behavior mining: corpus-wide Markov transition counts between
    consecutive event types within a user's (ts, event_id)-ordered
    stream, plus the per-``from_type`` transition probability.

    Distributed shape: one user-keyed shuffle (the session family's
    partitioning assumption: a user's events fit one group) -> per-group
    vectorized lag + in-group ``np.unique`` pair counts, so the second
    shuffle moves (from, to, n) PARTIALS only -> tiny groupby sum; the
    probability is a driver-side division over the |types|² table.
    """

    def per_user(group: pa.Table) -> pa.Table:
        g, _ = _sorted_ts_group(group)
        et = np.asarray(g.column("event_type"))
        if len(et) < 2:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pairs = np.char.add(np.char.add(et[:-1].astype("U32"), ">"),
                            et[1:].astype("U32"))
        uniq, counts = np.unique(pairs, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(list(uniq), pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("pair")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    agg = agg[agg["pair"].notna()]
    split = agg["pair"].str.split(">", n=1, expand=True)
    agg["from_type"], agg["to_type"] = split[0], split[1]
    agg["n"] = agg["n"].astype(np.int64)
    tot = agg.groupby("from_type")["n"].transform("sum")
    agg["p"] = agg["n"].astype(np.float64) / tot.astype(np.float64)
    out = agg[["from_type", "to_type", "n", "p"]].sort_values(
        ["from_type", "to_type"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def user_value_windows(sf_dir: str, lookback_s: int = 300) -> pa.Table:
    """Per-event time-RANGE sliding window + lag, per user: for every
    event, the sum/count of that user's value-cents over
    ``[ts - lookback, ts]`` (SQL ``RANGE BETWEEN INTERVAL ... PRECEDING
    AND CURRENT ROW`` — including ts-peers, per the RANGE peer rule)
    and the cents delta vs the previous event (``lag(cents, 1, 0)``).

    The reference has no window functions (SURVEY.md §2.9); this is the
    moving-aggregate member of the per-user scan family next to
    ``running_totals`` (prefix scan) and ``sessionize`` (gap scan).

    Ray shape: groupby(user_id).map_groups; inside a group everything
    is vectorized — two np.searchsorted calls find each row's window
    bounds on the sorted microsecond timestamps, and the window sum is
    a difference of integer-cents prefix sums (exact, so hash-identical
    to the DuckDB window oracle; a float prefix-sum difference would
    drift by summation order).
    """

    def per_user(group: pa.Table) -> pa.Table:
        t = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts_us = t.column("ts").cast(pa.int64()).to_numpy()
        v = t.column("value").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        lo = np.searchsorted(ts_us, ts_us - lookback_s * 1_000_000, side="left")
        hi = np.searchsorted(ts_us, ts_us, side="right")  # RANGE: all ts-peers
        csum = np.concatenate([[0], np.cumsum(cents)])
        delta = cents - np.concatenate([[0], cents[:-1]])
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "win_sum_cents": pa.array(csum[hi] - csum[lo], pa.int64()),
                "win_n": pa.array((hi - lo).astype(np.int64), pa.int64()),
                "delta_cents": pa.array(delta, pa.int64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables).sort_by([("event_id", "ascending")])


def purchaser_clicks_bloom(sf_dir: str, m_bits: int = 1 << 17) -> pa.Table:
    """``purchaser_clicks`` by the BIG-BIG plan: when the purchaser key
    set outgrows a driver broadcast, prefilter the probe side with a
    Bloom filter and make the result exact with a co-partitioned
    residual check — the key set never exists in one place.

      1. build: pushdown-read purchase rows, per-block Bloom bit
         arrays (``map_batches``), OR-merge driver-side — a few KB per
         block regardless of key count.
      2. probe: clicks stream through a vectorized Bloom membership
         mask (false positives pass, true purchasers all pass) and are
         partial-counted per user inside the batch.
      3. residual exact check: union the surviving probe partials with
         the build side's distinct-key rows, then ONE vectorized
         ``groupby(user_id).aggregate(Sum, Max)``; a user survives iff
         a build row is present (max(is_key) > 0) and it has clicks.
         Shuffle volume = survivors + keys, both Bloom-shrunk/tiny.

    Result is EXACT (same oracle as ``purchaser_clicks``; plan equality
    is pinned by a test).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from .hashing import BloomFilter

    build = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type"],
        filter=pc.field("event_type") == "purchase",
    ).groupby("user_id").count()

    def block_bloom(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits=m_bits)
        bf.add_many(batch.column("user_id").to_numpy())
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    build = build.materialize()  # small distinct-key table, read twice below
    bloom = BloomFilter(m_bits=m_bits)
    for t in ray.get(build.map_batches(block_bloom, batch_format="pyarrow").to_arrow_refs()):
        if not t.num_rows:  # Ray 2.49 emits schema-less empty blocks
            continue
        for raw in t.column("bits").to_pylist():
            bloom.bits |= np.frombuffer(raw, dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    def probe_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bf = _ray.get(bloom_ref)
        b = batch.filter(pc.equal(batch.column("event_type"), "click"))
        uid = b.column("user_id").to_numpy()
        uid = uid[bf.contains_many(uid)]
        ids, counts = np.unique(uid, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(ids, pa.int64()),
                "n_clicks": pa.array(counts.astype(np.int64), pa.int64()),
                "is_key": pa.array(np.zeros(len(ids), bool)),
            }
        )

    def key_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "n_clicks": pa.array(np.zeros(n, np.int64)),
                "is_key": pa.array(np.ones(n, np.int64)),
            }
        )

    def keep_verified(batch: pa.Table) -> pa.Table:
        # a group survives iff a build-side key row is present AND it
        # has clicks — vectorized over the aggregated block, no
        # per-group Python
        if batch.num_rows == 0 or "sum(n_clicks)" not in batch.column_names:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "n_clicks": pa.array([], pa.int64())}
            )
        n = batch.column("sum(n_clicks)")
        mask = pc.and_(
            pc.greater(batch.column("max(is_key)"), 0), pc.greater(n, 0)
        )
        kept = batch.filter(mask)
        return pa.table(
            {"user_id": kept.column("user_id"), "n_clicks": kept.column("sum(n_clicks)")}
        )

    probe = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        probe_partial, batch_format="pyarrow"
    )
    keys = build.map_batches(key_rows, batch_format="pyarrow")
    out = (
        probe.union(keys)
        .groupby("user_id")
        .aggregate(Sum("n_clicks"), Max("is_key"))
        .map_batches(keep_verified, batch_format="pyarrow")
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {"user_id": pa.array([], pa.int64()), "n_clicks": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tables).sort_by([("user_id", "ascending")])


def throttled_events(sf_dir: str, window_s: int = 600) -> pa.Table:
    """Rate-limit thinning: keep the FIRST event per (user_id, tumbling
    ``window_s`` window) — first = min (ts, event_id) — plus how many
    events that window held. The keep-first-per-key verb used to
    throttle crawl/event firehoses before downstream aggregation.

    Distributed shape — the packed-sortable-key ARGMIN combiner: each
    row is encoded as one fixed-width big-endian binary key
    (ts_us(8) || event_id(8) || event_type(16)), so "first row per
    key" becomes ``groupby(user, win).min(key)``: a plain min/sum
    combiner whose partials reduce inside every block before the ONE
    shuffle, with the whole winning row riding in the key — no
    join-back, no map_groups, no per-group Python. The winners are
    decoded vectorized at the Arrow buffer level in a final
    map_batches. (Lexicographic binary order == (ts, event_id) order
    because both ints are non-negative and big-endian; event_id is
    unique so the type tail never decides a comparison.)
    """
    wus = window_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts_us = np.asarray(batch.column("ts").cast(pa.int64()), dtype=np.int64)
        win = (ts_us // wus) * window_s
        eid = np.asarray(batch.column("event_id"), dtype=np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype("S16")
        m = np.empty((n, 32), np.uint8)
        m[:, :8] = ts_us.astype(">i8").view(np.uint8).reshape(-1, 8)
        m[:, 8:16] = eid.astype(">i8").view(np.uint8).reshape(-1, 8)
        m[:, 16:32] = np.frombuffer(et.tobytes(), np.uint8).reshape(-1, 16)
        offs = np.arange(n + 1, dtype=np.int32) * 32
        key = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(m.tobytes())],
        )
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "win_s": pa.array(win, pa.int64()),
                "key": key,
                "n": pa.array(np.ones(n, np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["user_id", "win_s"]).aggregate(
            [("key", "min"), ("n", "sum")]
        )
        return g.rename_columns(["user_id", "win_s", "key", "n"])

    def decode(batch: pa.Table) -> pa.Table:
        arr = batch.column("min(key)").combine_chunks()
        n = len(arr)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "win_s": pa.array([], pa.int64()),
                    "kept_event_id": pa.array([], pa.int64()),
                    "kept_ts_us": pa.array([], pa.int64()),
                    "kept_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        off = np.frombuffer(arr.buffers()[1], odt)[arr.offset : arr.offset + n]
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        m = data[off[:, None].astype(np.int64) + np.arange(32)[None, :]]
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "win_s": batch.column("win_s"),
                "kept_event_id": pa.array(
                    m[:, 8:16].copy().view(">i8").ravel().astype(np.int64)
                ),
                "kept_ts_us": pa.array(
                    m[:, :8].copy().view(">i8").ravel().astype(np.int64)
                ),
                "kept_type": pa.array(
                    m[:, 16:32].copy().view("S16").ravel().astype("U16")
                ),
                "n_events": batch.column("sum(n)"),
            }
        )

    from ray.data.aggregate import Min, Sum

    out = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "win_s"])
        .aggregate(Min("key"), Sum("n"))
        .map_batches(decode, batch_format="pyarrow")
    )
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return decode(pa.table({"min(key)": pa.array([], pa.binary()),
                                "user_id": pa.array([], pa.int64()),
                                "win_s": pa.array([], pa.int64()),
                                "sum(n)": pa.array([], pa.int64())}))
    return pa.concat_tables(tables).sort_by(
        [("user_id", "ascending"), ("win_s", "ascending")]
    )


def value_ntiles(sf_dir: str, n_buckets: int = 4) -> pa.Table:
    """Global NTILE bucket per event over (value, event_id) order — the
    distributed RANK-ASSIGNMENT shape (every row gets a function of its
    GLOBAL position, unlike the rank-PICK of ``value_quantiles``).

    SQL NTILE semantics replicated exactly: with n rows, the first
    n % k buckets hold floor(n/k) + 1 rows, the rest floor(n/k).

    Ray shape: range-partition sort on (value, event_id) — the one
    all-to-all — then a metadata-only pass collects per-block ROW
    COUNTS (never values) to prefix-sum each block's global offset;
    finally one vectorized task per block maps local index + offset ->
    bucket. Driver state is O(blocks).
    """
    import ray

    ds = _events(sf_dir, ["event_id", "value"])
    refs = ds.sort(["value", "event_id"]).to_arrow_refs()

    @ray.remote
    def block_rows(tbl: pa.Table) -> int:
        return tbl.num_rows

    counts = ray.get([block_rows.remote(r) for r in refs])
    n = int(sum(counts))
    if n == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()), "bucket": pa.array([], pa.int64())}
        )
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    base, rem = divmod(n, n_buckets)
    # global 0-based rank r -> bucket: first `rem` buckets have base+1
    boundary = rem * (base + 1)

    @ray.remote
    def assign(tbl: pa.Table, offset: int) -> pa.Table:
        if tbl.num_rows == 0 or "event_id" not in tbl.column_names:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64())}
            )
        r = offset + np.arange(tbl.num_rows, dtype=np.int64)
        if base == 0:
            bucket = r + 1  # degenerate: fewer rows than buckets
        else:
            small = np.maximum(r - boundary, 0)
            bucket = np.where(
                r < boundary, r // (base + 1), rem + small // base
            ) + 1
        return pa.table(
            {"event_id": tbl.column("event_id"),
             "bucket": pa.array(bucket.astype(np.int64), pa.int64())}
        )

    parts = ray.get(
        [assign.remote(ref, int(off)) for ref, off in zip(refs, offsets)]
    )
    return pa.concat_tables([t for t in parts if t.num_rows]).sort_by(
        [("event_id", "ascending")]
    )


def debounced_events(sf_dir: str, quiet_s: int = 60) -> pa.Table:
    """Debounce: keep an event only if the PREVIOUS event of the same
    (user_id, event_type) — by (ts, event_id) order, kept or not — is
    more than ``quiet_s`` older (lag semantics, so the decision is a
    pure window function, not a sequential carry like throttling-vs-
    last-KEPT would be). Emits the kept events with their gap.

    Distributed shape: one user-keyed shuffle (session-family bound),
    then a per-group vectorized pass — sort by (type, ts, id), one
    boundary mask per type run, one diff — no per-row Python.
    """
    q_us = quiet_s * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [("event_type", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]
        )
        ts_us = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type"))
        n = len(ts_us)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        gap[1:] = ts_us[1:] - ts_us[:-1]
        gap[first] = -1
        keep = first | (gap > q_us)
        kept = g.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": kept.column("event_id"),
                "user_id": kept.column("user_id"),
                "event_type": kept.column("event_type"),
                "gap_us": pa.array(gap[keep], pa.int64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("event_id", "ascending")])


def interval_coverage(sf_dir: str) -> pa.Table:
    """Interval-union per user: each event opens a VARIABLE-length
    interval [ts, ts + |value| seconds); report how many merged islands
    the user's intervals form and the total covered microseconds.
    Variable lengths make this a true interval-union problem (a running
    max over interval ENDS decides the merge), not gap sessionization.

    Distributed shape: one user-keyed shuffle, per-group vectorized
    island detection (sort by start, ``np.maximum.accumulate`` of ends,
    one boundary mask) -> one (user, n_islands, covered) row per group.
    Integer-microsecond arithmetic keeps it bit-exact vs the SQL
    running-max island oracle.
    """

    def per_user(group: pa.Table) -> pa.Table:
        g, s = _sorted_ts_group(group)
        v = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        dur = np.floor(np.abs(v) * 1_000_000 + 0.5).astype(np.int64)
        e = s + dur
        # running max of interval ends over all EARLIER intervals
        cme = np.maximum.accumulate(e)
        new_island = np.empty(len(s), dtype=bool)
        new_island[0] = True
        new_island[1:] = s[1:] > cme[:-1]
        starts = s[new_island]
        # island end = running max at the last member = cme just before
        # the next island starts (or at the very end)
        idx = np.flatnonzero(new_island)
        ends = np.concatenate([cme[idx[1:] - 1], [cme[-1]]])
        covered = int((ends - starts).sum())
        return pa.table(
            {
                "user_id": pa.array([int(g.column("user_id")[0].as_py())], pa.int64()),
                "n_islands": pa.array([int(new_island.sum())], pa.int64()),
                "covered_us": pa.array([covered], pa.int64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_islands": pa.array([], pa.int64()),
                "covered_us": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("user_id", "ascending")])


_COOC_CACHE: dict[tuple, pa.Table] = {}
# sentinel keys for truncation partials flowing through the pair
# combiner (outside any real props.k domain; stripped driver-side)
_COOC_TRUNC_ITEMS = -(2**62)
_COOC_TRUNC_BASKETS = -(2**62) + 1


def item_cooccurrence(
    sf_dir: str, min_support: int = 2, max_basket: int = 4096
) -> pa.Table:
    """Market-basket co-occurrence mining: for every unordered pair of
    ``props.k`` items that occur for the same user, the number of
    users with both (support) — the candidate-pair pass of frequent-
    itemset mining / co-click similarity.

    Distributed shape:
      1. per-batch vectorized extraction (RE2 ``extract_regex``, the
         props_k_stats kernel) reduced to in-batch DISTINCT
         (user, k) pairs — the shuffle moves distinct pairs per
         block, not events;
      2. Apriori item prefilter (EXACT): per-item occurrence counts
         over the block-distinct pairs are an UPPER BOUND on true user
         support, so items whose bound is < min_support cannot appear
         in any qualifying pair — they are dropped from baskets before
         pair emission.  Item-domain-sized broadcast via ``ray.put``.
      3. one user-HASH-keyed groupby (B buckets, not n_users groups —
         a user still lands wholly in one bucket); the per-bucket
         kernel dedups (user, k) across blocks vectorized and emits
         per-user triu pairs with an in-kernel (k_a, k_b) combine.
         Baskets larger than ``max_basket`` (post-filter)
         are TRUNCATED to the max_basket globally-most-frequent items
         (ties -> smaller k) — the mega-basket guard mirroring the LSH
         hot-bucket star-cap (dedup.py ``max_bucket``): one power-law
         user cannot emit O(basket^2) unbounded pairs in a single
         task.  Truncation is counted (sentinel partial summed through
         the combiner) and surfaced in the result's schema metadata
         (``truncated_items`` / ``truncated_baskets``), never silent.
      4. (k_a, k_b) support combiner — key space is bounded by the
         item-pair domain, not user count — then the HAVING floor.
    """
    key = (sf_dir, min_support, max_basket)
    if key in _COOC_CACHE:
        return _COOC_CACHE[key]
    import pyarrow.compute as pc

    def distinct_partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            pc.fill_null(batch.column("props"), ""), r'"k":\s*(?P<kv>-?\d+)'
        )
        k = pc.cast(pc.struct_field(ex, "kv"), pa.int64())
        valid = pc.is_valid(k)
        t = pa.table(
            {
                "user_id": pc.filter(batch.column("user_id"), valid),
                "k": pc.filter(k, valid),
            }
        )
        g = pa.TableGroupBy(t, ["user_id", "k"]).aggregate([])
        return g

    def per_bucket_pairs(group: pa.Table) -> pa.Table:
        # one vectorized kernel per user-hash BUCKET (B group calls,
        # not n_users — the pagerank dataset-leg treatment): Apriori
        # filter + cross-block (user, k) dedup over the whole bucket
        # at once, then per-user triu emission with an in-kernel
        # (k_a, k_b) combine.
        empty = pa.table(
            {
                "k_a": pa.array([], pa.int64()),
                "k_b": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        k = np.asarray(group.column("k"), dtype=np.int64)
        f_items, f_counts = ray.get(freq_ref)
        # Apriori prefilter: items that cannot reach min_support never
        # pair-qualify; dropping them here is exact and shrinks baskets.
        if len(f_items):
            pos = np.clip(np.searchsorted(f_items, k), 0, len(f_items) - 1)
            mask = f_items[pos] == k
            u, k, pos = u[mask], k[mask], pos[mask]
        else:
            u, k, pos = u[:0], k[:0], np.array([], np.int64)
        if len(u) == 0:
            return empty
        # distinct (user, k) across blocks (blocks were only
        # in-block-distinct), sorted so each user's items are a
        # contiguous ascending segment
        order = np.lexsort((k, u))
        u, k, pos = u[order], k[order], pos[order]
        first = np.concatenate([[True], (np.diff(u) != 0) | (np.diff(k) != 0)])
        u, k, pos = u[first], k[first], pos[first]
        starts = np.flatnonzero(np.concatenate([[True], np.diff(u) != 0]))
        ends = np.append(starts[1:], len(u))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        n_trunc_items = 0
        n_trunc_baskets = 0
        for s, e in zip(starts, ends):
            ks = k[s:e]
            if len(ks) > max_basket:
                # mega-basket guard: keep the max_basket globally-most-
                # frequent items (ties -> smaller k); count what fell off.
                counts = f_counts[pos[s:e]]
                sel = np.lexsort((ks, -counts))
                n_trunc_items += len(ks) - max_basket
                n_trunc_baskets += 1
                ks = np.sort(ks[sel[:max_basket]])
            if len(ks) < 2:
                continue
            ia, ib = np.triu_indices(len(ks), 1)
            out_a.append(ks[ia])
            out_b.append(ks[ib])
            out_n.append(np.ones(len(ia), np.int64))
        if n_trunc_items or n_trunc_baskets:
            out_a.append(np.array([_COOC_TRUNC_ITEMS, _COOC_TRUNC_BASKETS], np.int64))
            out_b.append(np.array([_COOC_TRUNC_ITEMS, _COOC_TRUNC_BASKETS], np.int64))
            out_n.append(np.array([n_trunc_items, n_trunc_baskets], np.int64))
        if not out_a:
            return empty
        t = pa.table(
            {
                "k_a": pa.array(np.concatenate(out_a), pa.int64()),
                "k_b": pa.array(np.concatenate(out_b), pa.int64()),
                "n_users": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["k_a", "k_b"]).aggregate([("n_users", "sum")])
        return g.rename_columns(["k_a", "k_b", "n_users"])

    # block-distinct (user, k) pairs, materialized ONCE: consumed by
    # both the item-count pass and the basket groupby (no re-extract).
    # `bucket` pre-computes the user-hash shuffle key: grouping B
    # buckets instead of n_users groups keeps the same co-location
    # guarantee (a user lands wholly in one bucket) without n_users
    # Python group invocations.
    n_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = distinct_partial(batch)
        b = np.asarray(t.column("user_id"), dtype=np.int64) % n_buckets
        return t.append_column("bucket", pa.array(b, pa.int64()))

    pairs_ds = (
        _events(sf_dir, ["user_id", "props"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()
    )

    def item_partial(batch: pa.Table) -> pa.Table:
        # per-block item occurrence counts: an UPPER BOUND on true user
        # support (a user can recur across blocks), which is all the
        # Apriori prune needs for exactness.
        g = pa.TableGroupBy(batch.select(["k"]), ["k"]).aggregate([("k", "count")])
        return g.rename_columns(["k", "ub"])

    # the item aggregate ends up driver-resident either way (it IS the
    # ray.put broadcast below), so skip the Ray groupby and stream-merge
    # the domain-bounded per-block partials on the driver: O(domain)
    # resident, one block partial in flight.
    iks = np.array([], np.int64)
    ubs = np.array([], np.int64)
    for ref in pairs_ds.map_batches(item_partial, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        tk = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        tu = t.column("ub").to_numpy(zero_copy_only=False).astype(np.int64)
        both = np.concatenate([iks, tk])
        iks, inv = np.unique(both, return_inverse=True)
        ubs = np.bincount(inv, weights=np.concatenate([ubs, tu]).astype(np.float64)).astype(
            np.int64
        )
    fmask = ubs >= min_support
    freq_items = np.ascontiguousarray(iks[fmask])
    freq_counts = np.ascontiguousarray(ubs[fmask])
    freq_ref = ray.put((freq_items, freq_counts))

    # cross-bucket combine happens ON THE DRIVER as a streaming merge:
    # the query contract materializes the pair table driver-side
    # anyway, and each bucket's output is already (k_a, k_b)-combined
    # and pair-domain-bounded — so a second Ray shuffle would only
    # re-sort what the driver is about to hold. O(pair domain)
    # resident, one bucket output in flight.
    bucketed = pairs_ds.groupby("bucket").map_groups(
        per_bucket_pairs, batch_format="pyarrow"
    )
    ka = np.array([], np.int64)
    kb = np.array([], np.int64)
    n = np.array([], np.int64)
    for ref in bucketed.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        a2 = np.concatenate([ka, t.column("k_a").to_numpy(zero_copy_only=False).astype(np.int64)])
        b2 = np.concatenate([kb, t.column("k_b").to_numpy(zero_copy_only=False).astype(np.int64)])
        n2 = np.concatenate([n, t.column("n_users").to_numpy(zero_copy_only=False).astype(np.int64)])
        order = np.lexsort((b2, a2))
        a2, b2, n2 = a2[order], b2[order], n2[order]
        first = np.concatenate([[True], (np.diff(a2) != 0) | (np.diff(b2) != 0)])
        idx = np.flatnonzero(first)
        ka, kb = a2[first], b2[first]
        n = np.add.reduceat(n2, idx)
    empty = pa.table(
        {
            "k_a": pa.array([], pa.int64()),
            "k_b": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        }
    )
    if len(ka) == 0:
        # same metadata contract as the normal path: consumers read
        # truncation counters unconditionally
        empty = empty.replace_schema_metadata(
            {b"truncated_items": b"0", b"truncated_baskets": b"0"}
        )
        _COOC_CACHE[key] = empty
        return empty
    # strip + surface the truncation partials (schema metadata, never
    # silent, never polluting the result rows)
    trunc_items = int(n[ka == _COOC_TRUNC_ITEMS].sum())
    trunc_baskets = int(n[ka == _COOC_TRUNC_BASKETS].sum())
    real = ka > _COOC_TRUNC_BASKETS
    ka, kb, n = ka[real], kb[real], n[real]
    keep = n >= min_support
    out = pa.table(
        {
            "k_a": pa.array(ka[keep], pa.int64()),
            "k_b": pa.array(kb[keep], pa.int64()),
            "n_users": pa.array(n[keep], pa.int64()),
        }
    ).sort_by([("k_a", "ascending"), ("k_b", "ascending")])
    out = out.replace_schema_metadata(
        {
            b"truncated_items": str(trunc_items).encode(),
            b"truncated_baskets": str(trunc_baskets).encode(),
        }
    )
    _COOC_CACHE[key] = out
    return out


def daily_counts_filled(sf_dir: str) -> pa.Table:
    """Time-series resample with gap fill: per (day, event_type) event
    counts over the FULL calendar span — days with no events of a type
    emit an explicit 0 row (the regularization step before trend /
    anomaly models that choke on missing buckets).

    Distributed shape: the usual (day, type) count combiner reduces
    the corpus to calendar-domain-sized partials, one tiny groupby;
    the dense (day x type) grid is then constructed driver-side over
    the REDUCED aggregate (days-by-types, metadata-sized — the
    daily_new_users precedent), a vectorized np.repeat/np.tile cross
    with a searchsorted fill. No corpus-sized step depends on the
    calendar length.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("s")),
            pa.int64(),
        )
        t = pa.table(
            {
                "day_s": day,
                "event_type": batch.column("event_type"),
                "n_events": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["day_s", "event_type"]).aggregate([("n_events", "sum")])
        return g.rename_columns(["day_s", "event_type", "n_events"])

    agg = (
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["day_s", "event_type"])
        .sum("n_events")
    )
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "day_s": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
        }
    )
    if not tables:
        return empty
    c = pa.concat_tables(tables)
    days = c.column("day_s").to_numpy(zero_copy_only=False).astype(np.int64)
    types = np.asarray(c.column("event_type").to_pylist(), dtype=object)
    n = c.column("sum(n_events)").to_numpy(zero_copy_only=False).astype(np.int64)
    grid_days = np.arange(days.min(), days.max() + 86400, 86400, dtype=np.int64)
    uniq_types = np.unique(types.astype(str))
    gd = np.repeat(grid_days, len(uniq_types))
    gt = np.tile(uniq_types, len(grid_days))
    # integer fill key: day-index * |types| + type-index (exact, no
    # string-order assumptions); searchsorted over the sparse agg
    ti = np.searchsorted(uniq_types, types.astype(str))
    di = (days - days.min()) // 86400
    skey = np.sort(di * len(uniq_types) + ti)
    sn = n[np.argsort(di * len(uniq_types) + ti, kind="stable")]
    gkey = np.arange(len(gd), dtype=np.int64)
    pos = np.clip(np.searchsorted(skey, gkey), 0, len(skey) - 1)
    hit = skey[pos] == gkey
    out_n = np.zeros(len(gkey), dtype=np.int64)
    out_n[hit] = sn[pos[hit]]
    return pa.table(
        {
            "day_s": pa.array(gd, pa.int64()),
            "event_type": pa.array(gt, pa.string()),
            "n_events": pa.array(out_n, pa.int64()),
        }
    )


def max_concurrency(sf_dir: str) -> pa.Table:
    """Sweep-line max-overlap per user: each event opens the same
    [ts, ts + |value| sec) interval family as ``interval_coverage``;
    report the maximum number of simultaneously open intervals and the
    earliest microsecond it is first reached (capacity planning /
    concurrent-session analytics).

    Distributed shape: one user-keyed shuffle, then the classic
    vectorized sweep inside the group — +1 at starts, -1 at ends,
    lexicographic sort with ends-before-starts at equal timestamps
    (half-open semantics), ``np.cumsum`` running occupancy, one argmax.
    """

    def per_user(group: pa.Table) -> pa.Table:
        s = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = group.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        dur = np.floor(np.abs(v) * 1_000_000 + 0.5).astype(np.int64)
        e = s + dur
        t = np.concatenate([s, e])
        delta = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        order = np.lexsort((delta, t))  # ends (-1) before starts (+1) on ties
        occ = np.cumsum(delta[order])
        peak = int(occ.max())
        at = int(t[order][int(np.argmax(occ))])
        return pa.table(
            {
                "user_id": pa.array(
                    [int(group.column("user_id")[0].as_py())], pa.int64()
                ),
                "max_concurrent": pa.array([peak], pa.int64()),
                "first_at_us": pa.array([at], pa.int64()),
            }
        )

    ds = _events(sf_dir, ["ts", "user_id", "value"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "max_concurrent": pa.array([], pa.int64()),
                "first_at_us": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("user_id", "ascending")])


def trimmed_mean(sf_dir: str, trim_frac: float = 0.1) -> pa.Table:
    """Per-type 10%-trimmed mean (robust location): drop the lowest
    and highest ``floor(n * trim_frac)`` values BY RANK and average the
    rest — the outlier-robust aggregate monitoring pipelines use where
    a plain mean is skew-dominated.

    Distributed shape (no group ever materializes):
      1. per-type counts -> trim bound; rank-pick the boundary values
         ``lo`` (rank = trim) and ``hi`` (rank = n-1-trim) via the
         shared ``_type_rank_pick`` (two range-partition sorts);
      2. one broadcast-combiner pass computes, per type, the exact
         integer-cents sums/counts of the strict tails (v < lo,
         v > hi) plus the total — then the driver removes the
         tail sums and the *partial* boundary-tie copies
         (``trim - count(v < lo)`` copies of lo, symmetrically hi):
         rank-trimming with duplicate boundary values is exact even
         though tied rows are interchangeable, because ties share a
         value and hence a cents contribution.
    The final mean is ONE float division of exact integers (oracle
    parity). Ties-straddling-the-boundary is pinned by a fixture.
    """
    ds = _events(sf_dir, ["event_type", "value"])
    totals = {
        r["event_type"]: r["count()"]
        for r in ds.groupby("event_type").count().take_all()
    }
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_kept": pa.array([], pa.int64()),
            "sum_cents": pa.array([], pa.int64()),
            "trimmed_mean_cents": pa.array([], pa.float64()),
        }
    )
    if not totals:
        return empty
    trim = {t: int(np.floor(n * trim_frac)) for t, n in totals.items()}
    ranks = {t: sorted({trim[t], totals[t] - 1 - trim[t]}) for t in totals}
    picked = _type_rank_pick(ds, ranks)
    types = sorted(totals)
    types_arr = np.array(types)
    lo_arr = np.array([picked[(t, trim[t])] for t in types], dtype=np.float64)
    hi_arr = np.array(
        [picked[(t, totals[t] - 1 - trim[t])] for t in types], dtype=np.float64
    )

    def tails(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "s_total": pa.array([], pa.int64()),
                    "s_lt": pa.array([], pa.int64()),
                    "c_lt": pa.array([], pa.int64()),
                    "s_gt": pa.array([], pa.int64()),
                    "c_gt": pa.array([], pa.int64()),
                }
            )
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        idx = np.searchsorted(types_arr, et)
        v = np.asarray(batch.column("value"), dtype=np.float64)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        lt = v < lo_arr[idx]
        gt = v > hi_arr[idx]
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "s_total": pa.array(c, pa.int64()),
                "s_lt": pa.array(np.where(lt, c, 0), pa.int64()),
                "c_lt": pa.array(lt.astype(np.int64), pa.int64()),
                "s_gt": pa.array(np.where(gt, c, 0), pa.int64()),
                "c_gt": pa.array(gt.astype(np.int64), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["event_type"]).aggregate(
            [("s_total", "sum"), ("s_lt", "sum"), ("c_lt", "sum"),
             ("s_gt", "sum"), ("c_gt", "sum")]
        )
        return g.rename_columns(
            ["event_type", "s_total", "s_lt", "c_lt", "s_gt", "c_gt"]
        )

    agg = (
        ds.map_batches(tails, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["s_total", "s_lt", "c_lt", "s_gt", "c_gt"])
        .to_pandas()
    )
    agg = agg.sort_values("event_type").reset_index(drop=True)
    out_t, out_n, out_s, out_m = [], [], [], []
    for _, row in agg.iterrows():
        t = row["event_type"]
        n = totals[t]
        tr = trim[t]
        i = int(np.searchsorted(types_arr, t))
        lo_c = int(np.floor(abs(lo_arr[i]) * 100 + 0.5) * np.sign(lo_arr[i]))
        hi_c = int(np.floor(abs(hi_arr[i]) * 100 + 0.5) * np.sign(hi_arr[i]))
        s = int(row["sum(s_total)"])
        s -= int(row["sum(s_lt)"]) + (tr - int(row["sum(c_lt)"])) * lo_c
        s -= int(row["sum(s_gt)"]) + (tr - int(row["sum(c_gt)"])) * hi_c
        kept = n - 2 * tr
        out_t.append(t)
        out_n.append(kept)
        out_s.append(s)
        out_m.append(float(s) / float(kept))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "n_kept": pa.array(out_n, pa.int64()),
            "sum_cents": pa.array(out_s, pa.int64()),
            "trimmed_mean_cents": pa.array(out_m, pa.float64()),
        }
    )


def decayed_user_scores(sf_dir: str, horizon: int = 16) -> pa.Table:
    """Exponentially-decayed recency engagement score per user: the
    newest event weighs 2^15, each older event half that, over the
    last ``horizon`` (16) events — the recommender/engagement-ranking
    primitive, made ORDER-EXACT by dyadic weights: every term is
    ``cents << (15 - age)``, an int64, so the sum is bit-identical in
    any engine (no float pow drift) and fully SQL-oracle-able.

    Distributed shape: one user-keyed shuffle (the session-family
    bound), per-group vectorized tail-select (lexsort desc by
    (ts, event_id), top-16) + integer dot with the shift weights.
    """

    def per_user(group: pa.Table) -> pa.Table:
        ts_us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = np.asarray(group.column("event_id"), dtype=np.int64)
        v = group.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        cents = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        order = np.lexsort((-eid, -ts_us))[:horizon]
        w = np.int64(1) << (15 - np.arange(len(order), dtype=np.int64))
        score = int((cents[order] * w).sum())
        return pa.table(
            {
                "user_id": pa.array(
                    [int(group.column("user_id")[0].as_py())], pa.int64()
                ),
                "n_scored": pa.array([len(order)], pa.int64()),
                "score_2p15": pa.array([score], pa.int64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_scored": pa.array([], pa.int64()),
                "score_2p15": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("user_id", "ascending")])


def event_session_ids(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Per-EVENT session assignment: every event tagged with its
    (user's) 1-based session index and ordinal within the session —
    the scatter-back grain `sessionize` aggregates away, needed when
    downstream features join back onto raw events (same 30-min gap
    rule, same (ts, event_id) total order).

    Distributed shape: one user-keyed shuffle, vectorized in-group
    gap-indicator cumsum (no Python per row); output is event-grain so
    nothing aggregates — the shuffle is the whole cost, as for any
    event-enrichment pass.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        g, ts_us = _sorted_ts_group(group)
        n = len(ts_us)
        new = np.ones(n, dtype=np.int64)
        if n > 1:
            new[1:] = (ts_us[1:] - ts_us[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        # ordinal within session: position - start offset of the session
        starts = np.flatnonzero(new == 1)
        offs = np.repeat(starts, np.diff(np.append(starts, n)))
        ordinal = np.arange(n, dtype=np.int64) - offs + 1
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "session_idx": pa.array(sid, pa.int64()),
                "ordinal": pa.array(ordinal, pa.int64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "user_id"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "ordinal": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by([("event_id", "ascending")])


def incremental_tumbling_counts(sf_dir: str, window: str = "h") -> pa.Table:
    """Incremental materialized-view maintenance for the tumbling
    aggregate: the corpus is split into a BASE snapshot (event_id % 10
    != 0) whose per-window partials play the stored state, and a DELTA
    batch (the rest) whose partials are merged INTO that state with
    one key-aligned sum — the IVM contract that the merged state is
    indistinguishable from a full recompute (the oracle runs the plain
    aggregate over everything, so the driver hash-checks exactly
    that).

    Distributed shape: both legs are the usual window combiner with a
    PUSHED-DOWN split predicate at the read (neither leg scans the
    other's rows twice); the merge is a groupby over two
    window-domain-sized partial tables — the cost of maintaining a
    streaming aggregate is the delta's size, never the history's.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit=_ARROW_UNIT[window]),
                    pa.timestamp("s")),
            pa.int64(),
        )
        v = batch.column("value").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        t = pa.table(
            {
                "window_start_s": win,
                "event_type": batch.column("event_type"),
                "n_events": pa.array(np.ones(len(batch), np.int64)),
                "sum_value_cents": pa.array(cents, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["window_start_s", "event_type"]).aggregate(
            [("n_events", "sum"), ("sum_value_cents", "sum")]
        )
        return g.rename_columns(
            ["window_start_s", "event_type", "n_events", "sum_value_cents"]
        )

    def leg(pred):
        import pyarrow.compute as _pc
        import pyarrow.dataset as _pd

        return (
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "ts", "event_type", "value"],
                filter=pred,
            )
            .map_batches(partial, batch_format="pyarrow")
        )

    import pyarrow.compute as _pc
    import pyarrow.dataset as pds

    # Expression lacks %: use (id - (id/10)*10) == 0 via divide+multiply
    idf = pds.field("event_id")
    rem = _pc.subtract(idf, _pc.multiply(_pc.divide(idf, 10), 10))
    base = leg(_pc.not_equal(rem, 0))
    delta = leg(_pc.equal(rem, 0))
    merged = (
        base.union(delta)
        .groupby(["window_start_s", "event_type"])
        .sum(["n_events", "sum_value_cents"])
        .to_pandas()
        .rename(
            columns={
                "sum(n_events)": "n_events",
                "sum(sum_value_cents)": "sum_value_cents",
            }
        )
    )
    merged["n_events"] = merged["n_events"].astype(np.int64)
    merged["sum_value_cents"] = merged["sum_value_cents"].astype(np.int64)
    merged = merged.sort_values(["window_start_s", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(merged, preserve_index=False)


def purchaser_clicks_salted(
    sf_dir: str,
    n_salts: int = 8,
    hot_candidates: int = 4,
    stats: dict | None = None,
) -> pa.Table:
    """``purchaser_clicks`` by the SALTED big-big shuffle-join plan —
    the third plan for the same contract (broadcast / bloom / salted)
    and the engine's explicit demonstration of HOT-KEY SALTING: when a
    handful of keys carry most of the probe side, a plain hash join
    sends every hot-key row to one partition; salting splits each hot
    key across ``n_salts`` partitions and re-merges after the join.

      1. HOT-KEY DETECTION without corpus-sized driver state: each
         click block emits its local top-``hot_candidates`` user
         counts; the driver sums the O(candidates x blocks) partials
         and marks as hot every key whose observed count exceeds
         total/16 (any agreed-on set is CORRECT — salting only needs
         both sides to agree; the threshold only tunes balance).
      2. BUILD side: the distinct-purchaser table maps to (user_id,
         salt) rows — one row (salt 0) for cold keys, ``n_salts``
         REPLICATED rows for hot keys (the classic replicate-the-
         small-side-of-the-hot-key trick).
      3. PROBE side: clicks partial-count per (user_id, salt) with
         salt = event_id mod n_salts for hot keys, 0 otherwise — so a
         hot key's rows spread across n_salts join partitions.
      4. ONE native inner join on the composite (user_id, salt) key,
         then a tiny groupby(user_id).sum de-salts.

    Result is EXACT (same oracle as ``purchaser_clicks``; plan
    equality pinned by tests, plus a mega-hot-key fixture asserting
    the hot key really fans out across salts). ``stats`` (out-param)
    records the detected hot keys and the salt fan-out for that test.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    empty = pa.table(
        {"user_id": pa.array([], pa.int64()), "n_clicks": pa.array([], pa.int64())}
    )

    # --- pass 1: approximate hot-key candidates from per-block partials
    def top_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("event_type"), "click"))
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "tot": pa.array([], pa.int64())}
            )
        ids, counts = np.unique(np.asarray(b.column("user_id"), np.int64),
                                return_counts=True)
        order = np.lexsort((ids, -counts))[:hot_candidates]
        return pa.table(
            {
                "user_id": pa.array(ids[order], pa.int64()),
                "n": pa.array(counts[order].astype(np.int64), pa.int64()),
                "tot": pa.array(
                    np.full(len(order), int(counts.sum()), np.int64), pa.int64()
                ),
            }
        )

    parts = [
        t
        for t in ray.get(
            _events(sf_dir, ["user_id", "event_type"])
            .map_batches(top_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return empty
    cand = pa.concat_tables(parts)
    ids = np.asarray(cand.column("user_id"), np.int64)
    ns = np.asarray(cand.column("n"), np.int64)
    # total clicks = sum of each block's tot (tot is per-block constant,
    # counted once per block via the first row trick: every row of a
    # block carries it, but np.unique over (block) isn't available —
    # instead sum n over ALL rows underestimates; so recompute exactly:
    total_clicks = int(
        sum(t.column("tot").to_pylist()[0] for t in parts)
    )
    uniq = np.unique(ids)
    approx = {int(u): int(ns[ids == u].sum()) for u in uniq}
    hot = sorted(u for u, c in approx.items() if c > max(1, total_clicks // 16))
    hot_set = frozenset(hot)
    hot_ref = ray.put(hot_set)
    if stats is not None:
        stats["hot_keys"] = hot
        stats["n_salts"] = n_salts

    # --- build side: distinct purchasers -> (user_id, salt) rows
    purchasers = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type"],
            filter=pc.field("event_type") == "purchase",
        )
        .groupby("user_id")
        .count()
    )

    def replicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "salt": pa.array([], pa.int64())}
            )
        hs = ray.get(hot_ref)
        uid = np.asarray(batch.column("user_id"), np.int64)
        is_hot = np.isin(uid, np.fromiter(hs, np.int64, count=len(hs)))
        reps = np.where(is_hot, n_salts, 1)
        out_uid = np.repeat(uid, reps)
        salts = np.concatenate(
            [np.arange(r, dtype=np.int64) for r in reps]
        ) if len(reps) else np.array([], np.int64)
        return pa.table(
            {"user_id": pa.array(out_uid, pa.int64()),
             "salt": pa.array(salts, pa.int64())}
        )

    build = purchasers.map_batches(replicate, batch_format="pyarrow").materialize()

    # --- probe side: per-(user, salt) click partials
    def probe_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("event_type"), "click"))
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "salt": pa.array([], pa.int64()),
                 "n_clicks": pa.array([], pa.int64())}
            )
        hs = ray.get(hot_ref)
        uid = np.asarray(b.column("user_id"), np.int64)
        eid = np.asarray(b.column("event_id"), np.int64)
        is_hot = np.isin(uid, np.fromiter(hs, np.int64, count=len(hs)))
        salt = np.where(is_hot, eid % n_salts, 0).astype(np.int64)
        t = pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "salt": pa.array(salt, pa.int64()),
                "n_clicks": pa.array(np.ones(len(uid), np.int64)),
            }
        )
        return pa.TableGroupBy(t, ["user_id", "salt"]).aggregate(
            [("n_clicks", "sum")]
        ).rename_columns(["user_id", "salt", "n_clicks"])

    probe = (
        _events(sf_dir, ["event_id", "user_id", "event_type"])
        .map_batches(probe_partial, batch_format="pyarrow")
        .materialize()
    )
    n_b, n_p = build.count(), probe.count()
    if n_b == 0 or n_p == 0:
        return empty
    nparts = max(1, min(16, min(n_b, n_p) // 16))
    joined = probe.join(build, "inner", nparts, on=("user_id", "salt"))

    if stats is not None:
        # salt fan-out actually exercised for the hot keys (test hook)
        fan = {}
        for t in ray.get(probe.to_arrow_refs()):
            if not t.num_rows or "user_id" not in t.column_names:
                continue
            for u, s in zip(t.column("user_id").to_pylist(),
                            t.column("salt").to_pylist()):
                if int(u) in hot_set:
                    fan.setdefault(int(u), set()).add(int(s))
        stats["hot_fanout"] = {u: len(s) for u, s in fan.items()}

    def desalt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_clicks" not in batch.column_names:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_clicks": pa.array([], pa.int64())}
            )
        return pa.TableGroupBy(batch, ["user_id"]).aggregate(
            [("n_clicks", "sum")]
        ).rename_columns(["user_id", "n_clicks"])

    final = (
        joined.map_batches(desalt, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_clicks"))
    )
    tables = [t for t in ray.get(final.to_arrow_refs())
              if t.num_rows and "user_id" in t.column_names]
    if not tables:
        return empty
    out = pa.concat_tables(tables).rename_columns(["user_id", "n_clicks"])
    return out.sort_by([("user_id", "ascending")])


def purchaser_clicks_auto(
    sf_dir: str,
    broadcast_limit: int = 100_000,
    skew_factor: int = 16,
    stats: dict | None = None,
) -> pa.Table:
    """ADAPTIVE plan selection for the purchaser-clicks contract — the
    optimizer step on top of the three physical plans this engine
    ships (broadcast / bloom / salted): one cheap statistics pass over
    events estimates (a) the distinct-purchaser cardinality via
    per-block HyperLogLog partials (2^12 bytes per block, never the
    key set) and (b) click-key skew via per-block top-candidate
    counts; the driver then routes:

      est_purchasers <= broadcast_limit        -> broadcast semi-join
      hot key (approx count > clicks/skew_factor) -> salted shuffle join
      otherwise                                 -> bloom big-big plan

    This is the cost-based-optimizer shape (estimate -> threshold ->
    physical plan) rather than a fourth plan; every branch returns the
    identical oracle-exact result, and ``stats`` records the estimates
    + the chosen plan so tests can force and assert each branch.
    """
    import pyarrow.compute as pc

    from .hashing import HyperLogLog, md5_hash64

    p = 12

    def stat_partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = np.asarray(batch.column("user_id"), np.int64)
        purch = uid[et == "purchase"]
        clicks = uid[et == "click"]
        hll = HyperLogLog(p)
        if len(purch):
            hll.add_hashes(
                np.fromiter((md5_hash64(str(u)) for u in purch), dtype=np.uint64)
            )
        rows_kind = ["hll"]
        rows_regs = [hll.registers.tobytes()]
        rows_uid = [0]
        rows_n = [0]
        rows_tot = [0]
        if len(clicks):
            ids, counts = np.unique(clicks, return_counts=True)
            order = np.lexsort((ids, -counts))[:4]
            for i in order:
                rows_kind.append("cand")
                rows_regs.append(b"")
                rows_uid.append(int(ids[i]))
                rows_n.append(int(counts[i]))
                rows_tot.append(int(counts.sum()))
        return pa.table(
            {
                "kind": pa.array(rows_kind, pa.string()),
                "regs": pa.array(rows_regs, pa.binary()),
                "user_id": pa.array(rows_uid, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "tot": pa.array(rows_tot, pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            _events(sf_dir, ["user_id", "event_type"])
            .map_batches(stat_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "kind" in t.column_names
    ]
    regs = np.zeros(1 << p, np.uint8)
    cand: dict[int, int] = {}
    total_clicks = 0
    for t in parts:
        kinds = t.column("kind").to_pylist()
        for i, k in enumerate(kinds):
            if k == "hll":
                np.maximum(
                    regs,
                    np.frombuffer(t.column("regs")[i].as_py(), np.uint8),
                    out=regs,
                )
            else:
                u = t.column("user_id")[i].as_py()
                cand[u] = cand.get(u, 0) + t.column("n")[i].as_py()
        tots = [
            t.column("tot")[i].as_py() for i, k in enumerate(kinds) if k == "cand"
        ]
        if tots:
            total_clicks += tots[0]
    hll = HyperLogLog(p)
    hll.registers = regs
    est = hll.estimate_rounded()
    max_cand = max(cand.values(), default=0)
    skewed = total_clicks > 0 and max_cand > max(1, total_clicks // skew_factor)
    if est <= broadcast_limit:
        plan = "broadcast"
        out = purchaser_clicks(sf_dir)
    elif skewed:
        plan = "salted"
        out = purchaser_clicks_salted(sf_dir)
    else:
        plan = "bloom"
        out = purchaser_clicks_bloom(sf_dir)
    if stats is not None:
        stats.update(
            {
                "plan": plan,
                "est_purchasers": est,
                "max_candidate_clicks": max_cand,
                "total_clicks": total_clicks,
            }
        )
    return out


def time_to_conversion(sf_dir: str) -> pa.Table:
    """FORWARD as-of join — the attribution twin of
    ``asof_last_purchase``: each 'click' matched to the SAME user's
    earliest strictly-LATER 'purchase' (or -1 if none), with explicit
    tie semantics (among purchases sharing the earliest qualifying ts,
    the MIN event_id wins — the mirror of the backward join's
    max-event_id rule, and just as unspecified in native ASOF).

    Same distributed shape as the backward join: one hash shuffle by
    user_id, vectorized per-group ``searchsorted`` with side='right'
    (the (ts, event_id)-sorted purchase array makes the tie rule free:
    the first row of an equal-ts run IS the min event_id). Emits
    (event_id, next_purchase_id, gap_s).
    """

    def per_user(group: pa.Table) -> pa.Table:
        g, ts_us = _sorted_ts_group(group)
        etypes = np.asarray(g.column("event_type"))
        eids = np.asarray(g.column("event_id"), dtype=np.int64)
        is_click = etypes == "click"
        is_buy = etypes == "purchase"
        click_ts, click_id = ts_us[is_click], eids[is_click]
        buy_ts, buy_id = ts_us[is_buy], eids[is_buy]
        if buy_ts.size == 0:
            nxt = np.full(len(click_id), -1, dtype=np.int64)
            gap = np.full(len(click_id), -1.0)
        else:
            # earliest purchase strictly after each click
            pos = np.searchsorted(buy_ts, click_ts, side="right")
            has = pos < len(buy_ts)
            safe = np.clip(pos, 0, len(buy_ts) - 1)
            nxt = np.where(has, buy_id[safe], -1).astype(np.int64)
            gap = np.where(has, (buy_ts[safe] - click_ts) / 1_000_000.0, -1.0)
        return pa.table(
            {
                "event_id": pa.array(click_id, pa.int64()),
                "next_purchase_id": pa.array(nxt, pa.int64()),
                "gap_s": pa.array(gap, pa.float64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    tbl = pa.concat_tables([t for t in ray.get(out.to_arrow_refs()) if t.num_rows])
    return tbl.sort_by([("event_id", "ascending")])


def late_event_counts(sf_dir: str, lateness_s: int = 600) -> pa.Table:
    """Watermark accounting — the streaming late-data verb (Beam/Flink
    semantics in batch form): replay the stream in ARRIVAL order
    (event_id), carry a low watermark = max event-time seen so far
    minus ``lateness_s`` of allowed lateness, and count per tumbling
    day how many events arrived on time vs late (event-time behind the
    watermark at arrival). The on-time/late split is what sizes state
    retention and triggers/allowed-lateness policy for a real streaming
    deployment of the same pipeline.

    An event is late iff some STRICTLY earlier arrival carried an
    event-time more than ``lateness_s`` ahead of it; the first arrival
    is on time by definition (empty prefix, SQL wm IS NULL).

    Ray shape (the value_ranks prefix discipline, specialized to a
    prefix MAX): one event_id range-partition sort — the only
    all-to-all — then a metadata-only per-block pass (each block's max
    event-time, one scalar per block), an O(blocks) driver exclusive
    prefix-max, and one vectorized task per block combining the carried
    prefix with the in-block exclusive cummax and emitting (day, n_on_time,
    n_late) count partials. Driver state is O(blocks + days); row data
    never leaves the cluster.
    """
    import ray

    us = np.int64(86_400_000_000)
    late_us = np.int64(lateness_s) * 1_000_000
    refs = _events(sf_dir, ["event_id", "ts"]).sort("event_id").to_arrow_refs()

    @ray.remote
    def block_max(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        ts = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return int(ts.max())

    maxes = ray.get([block_max.remote(r) for r in refs])
    prefixes: list = []
    run = None
    for m in maxes:
        prefixes.append(run)
        if m is not None:
            run = m if run is None else max(run, m)

    @ray.remote
    def partial(tbl: pa.Table, prefix) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "day_s": pa.array([], pa.int64()),
                    "n_on_time": pa.array([], pa.int64()),
                    "n_late": pa.array([], pa.int64()),
                }
            )
        ts = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # sentinel for "empty prefix": min//2 keeps wm - late_us
        # representable (no int64 wrap), and no real event-time can be
        # below it, so the first arrival reads on-time with no mask
        lo = np.iinfo(np.int64).min // 2
        first = lo if prefix is None else np.int64(prefix)
        shifted = np.concatenate(([first], np.maximum.accumulate(ts)[:-1]))
        wm = np.maximum(shifted, first)
        late = ts < wm - late_us
        day_s = ts // us * 86_400
        key = day_s * 2 + late
        ukey, counts = np.unique(key, return_counts=True)
        days = ukey // 2
        is_late = (ukey % 2).astype(bool)
        udays = np.unique(days)
        on_t = np.zeros(len(udays), np.int64)
        lt = np.zeros(len(udays), np.int64)
        pos = np.searchsorted(udays, days)
        np.add.at(lt, pos[is_late], counts[is_late])
        np.add.at(on_t, pos[~is_late], counts[~is_late])
        return pa.table(
            {
                "day_s": pa.array(udays, pa.int64()),
                "n_on_time": pa.array(on_t, pa.int64()),
                "n_late": pa.array(lt, pa.int64()),
            }
        )

    parts = pa.concat_tables(
        ray.get([partial.remote(r, p) for r, p in zip(refs, prefixes)])
    )
    if parts.num_rows == 0:
        return parts
    g = pa.TableGroupBy(parts, "day_s").aggregate(
        [("n_on_time", "sum"), ("n_late", "sum")]
    )
    return g.rename_columns(["day_s", "n_on_time", "n_late"]).sort_by(
        [("day_s", "ascending")]
    )
