"""Relational operators over the TPC-H-ish tables — the generic dataflow
shapes of SURVEY.md §2 (B9/B10 filters, E aggregations, D1 broadcast lookup
join, F1 top-k, windowed aggregate) as Ray Data pipelines with partial
aggregation before every shuffle."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def lineitem_agg(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style grouped aggregate with per-batch partial aggregation
    (combine inside map_batches, then a small groupby over partials)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue"] = batch["l_extendedprice"] * (1.0 - batch["l_discount"])
        g = batch.groupby(["l_returnflag", "l_linestatus"], sort=True).agg(
            sum_qty=("l_quantity", "sum"),
            sum_price=("l_extendedprice", "sum"),
            sum_revenue=("revenue", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return g.reset_index()

    partials = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pandas", batch_size=65536)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price", alias_name="sum_price"),
            Sum("sum_revenue", alias_name="sum_revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    for c, nd in [("sum_qty", 2), ("sum_price", 2), ("sum_revenue", 2)]:
        out[c] = np.round(out[c], nd)
    return pa.Table.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"], ignore_index=True),
        preserve_index=False,
    )


def orders_by_segment(sf_dir: str) -> pa.Table:
    """Broadcast join: the small customer dimension is ray.put once and
    looked up per batch (D1 in SURVEY.md §2.D — never a shuffle join for a
    small side)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class JoinAgg:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            seg = batch["o_custkey"].map(self.lookup)
            b = pd.DataFrame({"c_mktsegment": seg, "o_totalprice": batch["o_totalprice"]})
            g = b.groupby("c_mktsegment", sort=True).agg(
                n_orders=("o_totalprice", "size"), total=("o_totalprice", "sum")
            )
            return g.reset_index()

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        JoinAgg, batch_format="pandas", batch_size=65536, concurrency=(1, 4)
    )
    out = (
        partials.groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total", alias_name="total"))
        .to_pandas()
    )
    out["total"] = np.round(out["total"], 2)
    return pa.Table.from_pandas(out.sort_values("c_mktsegment", ignore_index=True), preserve_index=False)


def topk_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Distributed top-k: per-batch partial top-k, then exact final sort of
    the tiny candidate set (F1 semantics: value desc, key asc tiebreak)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)

    cands = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    ).to_pandas()
    cands = cands.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)
    cands = cands.reset_index(drop=True)
    cands.insert(0, "rank", np.arange(1, len(cands) + 1, dtype=np.int64))
    return pa.Table.from_pandas(cands, preserve_index=False)


def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate: event-time floored to the hour inside
    map_batches (no watermark machinery needed for batch, SURVEY.md §2.I),
    partial per batch, tiny final groupby."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "hour": batch["ts"].dt.floor("h"),
                "value": batch["value"],
            }
        )
        g = b.groupby(["event_type", "hour"], sort=True).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        return g.reset_index()

    partials = _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    out = (
        partials.groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = np.round(out["sum_value"], 6)
    t = pa.Table.from_pandas(
        out.sort_values(["event_type", "hour"], ignore_index=True), preserve_index=False
    )
    # pandas yields ns-precision timestamps; SQL engines (and the oracle)
    # use µs — align so value comparison is representation-independent
    hour_idx = t.schema.get_field_index("hour")
    return t.set_column(hour_idx, "hour", t["hour"].cast(pa.timestamp("us")))


def filter_project_lineitem(sf_dir: str) -> pa.Table:
    """Predicate + projection pushed to the parquet read (B9/B10: prune at
    the read, filter with vectorized Arrow kernels)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_discount", "l_returnflag"],
    )
    out = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["l_quantity"], 45.0), pc.equal(t["l_returnflag"], "R"))
        ),
        batch_format="pyarrow",
        batch_size=65536,
    )
    g = out.groupby("l_orderkey").aggregate(
        Count(alias_name="n_items"), Sum("l_quantity", alias_name="sum_qty")
    ).to_pandas()
    g["sum_qty"] = np.round(g["sum_qty"], 2)
    return pa.Table.from_pandas(g.sort_values("l_orderkey", ignore_index=True), preserve_index=False)
