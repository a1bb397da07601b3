"""Hand-computed edge cases for the windowed/join operators.

The oracle-equivalence tests cover real data; these pin the boundary
semantics (strict vs inclusive, replication counts, empty sides) with
tiny synthetic event tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _write_events(tmp_path, rows):
    import pyarrow.parquet as pq

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestWindowEdges:
    def test_asof_strictly_earlier_and_missing(self, tmp_path):
        from ocr_service_ray.analytics.windows import asof_last_purchase

        sf = _write_events(tmp_path, [
            # user 1: purchase exactly AT click ts must NOT match (strict >)
            {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1,
             "event_type": "purchase", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 10:00:00", "user_id": 1,
             "event_type": "click", "value": 1.0},
            # user 1: later click matches purchase 1
            {"event_id": 3, "ts": "2024-01-01 10:00:05", "user_id": 1,
             "event_type": "click", "value": 1.0},
            # user 2: click with no purchases at all
            {"event_id": 4, "ts": "2024-01-01 11:00:00", "user_id": 2,
             "event_type": "click", "value": 1.0},
        ])
        got = {r["event_id"]: r for r in asof_last_purchase(sf).to_pylist()}
        assert got[2]["prior_purchase_id"] == -1 and got[2]["gap_s"] == -1.0
        assert got[3]["prior_purchase_id"] == 1 and got[3]["gap_s"] == 5.0
        assert got[4]["prior_purchase_id"] == -1

    def test_range_join_window_boundaries(self, tmp_path):
        from ocr_service_ray.analytics.windows import range_join_error_clicks

        base = pd.Timestamp("2024-01-01 10:00:00")
        sf = _write_events(tmp_path, [
            # clicks at err-300s (IN, >=), err-1us-equivalent (IN), err (OUT, <)
            {"event_id": 1, "ts": base - pd.Timedelta(seconds=300), "user_id": 1,
             "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": base - pd.Timedelta(seconds=1), "user_id": 2,
             "event_type": "click", "value": 1.0},
            {"event_id": 3, "ts": base, "user_id": 3,
             "event_type": "click", "value": 1.0},
            {"event_id": 4, "ts": base - pd.Timedelta(seconds=301), "user_id": 4,
             "event_type": "click", "value": 1.0},  # OUT (too old)
            {"event_id": 5, "ts": base, "user_id": 5,
             "event_type": "error", "value": 1.0},
        ])
        got = range_join_error_clicks(sf).to_pylist()
        assert got == [{"event_id": 5, "n_clicks": 2}]

    def test_hopping_replication_count(self, tmp_path):
        from ocr_service_ray.analytics.windows import hopping_counts

        sf = _write_events(tmp_path, [
            {"event_id": 1, "ts": "2024-01-01 10:07:00", "user_id": 1,
             "event_type": "view", "value": 2.0},
        ])
        got = hopping_counts(sf).to_pylist()
        # one event -> exactly size/hop = 4 windows, all count 1
        assert len(got) == 4
        assert all(r["n_events"] == 1 and r["sum_value_cents"] == 200 for r in got)
        starts = [r["window_start_s"] for r in got]
        assert starts == sorted(starts)
        assert all(b - a == 900 for a, b in zip(starts, starts[1:]))

    def test_sessionize_segmented_matches_map_groups_plan(self, tmp_path):
        from ocr_service_ray.analytics.windows import sessionize, sessionize_segmented

        rng = np.random.default_rng(11)
        rows = []
        eid = 0
        for u in range(5):
            t = pd.Timestamp("2024-01-01")
            for _ in range(50):
                t = t + pd.Timedelta(seconds=int(rng.integers(1, 4000)))
                rows.append({"event_id": eid, "ts": t, "user_id": u,
                             "event_type": "view", "value": 1.0})
                eid += 1
        sf = _write_events(tmp_path, rows)
        a = sessionize(sf).to_pandas().reset_index(drop=True)
        b = sessionize_segmented(sf).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_like=True)


@pytest.mark.usefixtures("ray_session")
class TestHll:
    def test_hll_within_error_bound_of_exact(self):
        from ocr_service_ray.analytics.windows import (
            approx_distinct_users,
            distinct_users,
        )

        SF = "/root/testdata/sf0.001"
        exact = {r["event_type"]: r["n_users"] for r in distinct_users(SF).to_pylist()}
        approx = {r["event_type"]: r["approx_users"]
                  for r in approx_distinct_users(SF).to_pylist()}
        assert set(exact) == set(approx)
        for t, n in exact.items():
            assert abs(approx[t] - n) / max(n, 1) < 0.05, (t, n, approx[t])

    def test_hll_merge_equals_single_pass(self):
        import numpy as np

        from ocr_service_ray.analytics.hashing import HyperLogLog, md5_hash64

        hashes = np.fromiter(
            (md5_hash64(str(i)) for i in range(5000)), dtype=np.uint64
        )
        one = HyperLogLog(12).add_hashes(hashes)
        a = HyperLogLog(12).add_hashes(hashes[:2000])
        b = HyperLogLog(12).add_hashes(hashes[2000:])
        assert np.array_equal(a.merge(b).registers, one.registers)
        assert abs(one.estimate() - 5000) / 5000 < 0.05
