"""Relational demo: combiner-pattern aggregation on lineitem.

The reference has no relational ops at all (SURVEY.md §2.4/2.5); this
module exists to pin the engine's canonical wide-aggregation shape:
pre-aggregate inside ``map_batches`` (the combiner), then a tiny
``groupby`` over the 6-combination key space — the shuffle moves
O(keys x blocks) rows instead of O(n).

Float discipline: money sums use integer cents (``round(x*100)`` as
int64) so the result is bit-identical regardless of summation order —
required for the driver's exact value-hash comparison against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style summary by (l_returnflag, l_linestatus)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: no pandas conversion in the hot path.
        # DuckDB round() is half-AWAY-from-zero; np.rint is half-to-even.
        v = batch.column("l_extendedprice").to_numpy() * 100
        cents = np.floor(np.abs(v) + 0.5).astype(np.int64) * np.sign(v).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": batch.column("l_quantity"),
                "sum_price_cents": pa.array(cents, pa.int64()),
                "count_order": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("sum_price_cents", "sum"), ("count_order", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "count_order"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "sum_price_cents", "count_order"])
        .to_pandas()
    )
    final = final.rename(
        columns={
            "sum(sum_qty)": "sum_qty",
            "sum(sum_price_cents)": "sum_price_cents",
            "sum(count_order)": "count_order",
        }
    )
    final["avg_qty"] = final["sum_qty"] / final["count_order"]
    final = final.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    final["count_order"] = final["count_order"].astype(np.int64)
    final["sum_price_cents"] = final["sum_price_cents"].astype(np.int64)
    return pa.Table.from_pandas(final, preserve_index=False)
