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
    from librecatastro_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _combine_partials(
    partials: ray.data.Dataset, keys: list[str], sum_cols: list[str], schema: pa.Schema
) -> pd.DataFrame:
    """Finish a LOW-cardinality aggregation without a shuffle: a second
    map_batches combine level (bounded fan-in tree over the per-batch
    partials), then a driver-side final combine over the tiny surviving
    rows.  For O(10) groups a Ray ``groupby`` would hash-exchange to
    ``num_cpus`` output partitions — most empty, each emitting a schema-less
    RefBundle (executor schema-drift warnings) — an all-to-all for nothing.
    Driver fan-in is ≤ |groups| rows per 65536 partial rows, tiny at any
    corpus size."""

    def combine(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        g = batch.group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in sum_cols]
        )
        arrays = [
            g[f.name if f.name in keys else f"{f.name}_sum"].cast(f.type)
            for f in schema
        ]
        return pa.table(arrays, schema=schema)

    out = partials.map_batches(
        combine, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    return out.groupby(keys, as_index=False)[sum_cols].sum()


_LINEITEM_PARTIAL_SCHEMA = pa.schema(
    [
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("sum_qty", pa.float64()),
        ("sum_price", pa.float64()),
        ("sum_revenue", pa.float64()),
        ("n_rows", pa.int64()),
    ]
)


def lineitem_agg(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style grouped aggregate with per-batch partial aggregation
    (combine inside map_batches, then a shuffle-free partial-combine tree —
    see :func:`_combine_partials`) — zero-copy Arrow batches, Arrow C++
    group-by kernels, and a schema-stable empty partial."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _LINEITEM_PARTIAL_SCHEMA.empty_table()
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.append_column("revenue", revenue)
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("revenue", "sum"),
             ([], "count_all")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": g["l_quantity_sum"],
                "sum_price": g["l_extendedprice_sum"],
                "sum_revenue": g["revenue_sum"],
                "n_rows": g["count_all"].cast(pa.int64()),
            }
        )

    partials = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = _combine_partials(
        partials,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_price", "sum_revenue", "n_rows"],
        _LINEITEM_PARTIAL_SCHEMA,
    )
    for c, nd in [("sum_qty", 2), ("sum_price", 2), ("sum_revenue", 2)]:
        out[c] = np.round(out[c], nd)
    return pa.Table.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"], ignore_index=True),
        preserve_index=False,
    )


_SEGMENT_PARTIAL_SCHEMA = pa.schema(
    [("c_mktsegment", pa.string()), ("n_orders", pa.int64()), ("total", pa.float64())]
)


def orders_by_segment(sf_dir: str) -> pa.Table:
    """Broadcast join: the small customer dimension is ray.put once (as
    sorted key/value arrays) and probed per batch with one searchsorted
    (D1 in SURVEY.md §2.D — never a shuffle join for a small side)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    order = np.argsort(cust["c_custkey"].to_numpy())
    lookup_ref = ray.put(
        (cust["c_custkey"].to_numpy()[order], cust["c_mktsegment"].to_numpy()[order])
    )

    class JoinAgg:
        def __init__(self):
            self.keys, self.segs = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0 or len(self.keys) == 0:
                return _SEGMENT_PARTIAL_SCHEMA.empty_table()
            ck = batch["o_custkey"].to_numpy()
            pos = np.searchsorted(self.keys, ck)
            pos[pos == len(self.keys)] = len(self.keys) - 1
            matched = self.keys[pos] == ck
            # inner-join semantics: orders without a customer row are dropped
            # (matches the oracle's `orders JOIN customer`)
            t = pa.table(
                {
                    "c_mktsegment": pa.array(self.segs[pos][matched]),
                    "o_totalprice": batch["o_totalprice"].filter(pa.array(matched)),
                }
            )
            if len(t) == 0:
                return _SEGMENT_PARTIAL_SCHEMA.empty_table()
            g = t.group_by("c_mktsegment", use_threads=False).aggregate(
                [([], "count_all"), ("o_totalprice", "sum")]
            )
            return pa.table(
                {
                    "c_mktsegment": g["c_mktsegment"],
                    "n_orders": g["count_all"].cast(pa.int64()),
                    "total": g["o_totalprice_sum"],
                }
            )

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        JoinAgg, batch_format="pyarrow", batch_size=65536, concurrency=(1, 4),
        # the broadcast ref lives in the object store: a restarted actor could
        # not re-fetch it if it went out of scope (ray#53727) — rerun instead
        max_restarts=0,
    )
    out = _combine_partials(
        partials, ["c_mktsegment"], ["n_orders", "total"], _SEGMENT_PARTIAL_SCHEMA
    )
    out["total"] = np.round(out["total"], 2)
    return pa.Table.from_pandas(out.sort_values("c_mktsegment", ignore_index=True), preserve_index=False)


def topk_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Distributed top-k: per-batch partial top-k, then exact final sort of
    the tiny candidate set (F1 semantics: value desc, key asc tiebreak)."""

    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        )
        return batch.take(idx.slice(0, k))

    cands = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    cands = cands.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)
    cands = cands.reset_index(drop=True)
    cands.insert(0, "rank", np.arange(1, len(cands) + 1, dtype=np.int64))
    return pa.Table.from_pandas(cands, preserve_index=False)


def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate: event-time floored to the hour inside
    map_batches (no watermark machinery needed for batch, SURVEY.md §2.I),
    partial per batch, tiny final groupby."""

    import pyarrow.compute as pc

    empty_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.timestamp("us")),
         ("n", pa.int64()), ("sum_value", pa.float64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_schema.empty_table()
        hour = pc.floor_temporal(batch["ts"], unit="hour").cast(pa.timestamp("us"))
        t = pa.table(
            {"event_type": batch["event_type"], "hour": hour, "value": batch["value"]}
        )
        g = t.group_by(["event_type", "hour"], use_threads=False).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour": g["hour"],
                "n": g["count_all"].cast(pa.int64()),
                "sum_value": g["value_sum"],
            }
        )

    partials = _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
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

    from librecatastro_ray.sources.readers import read_parquet_clean

    ds = read_parquet_clean(
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


def nested_unnest(sf_dir: str) -> ray.data.Dataset:
    """Nested-document data model pass-through (the reference's document
    shape: an ``address`` struct + a ``constructions`` list-of-struct,
    reference: src/utils/elasticsearch_utils.py:38-56): stage 1 BUILDS the
    nested Arrow columns, stage 2 (a separate map_batches, so the nested
    blocks cross the object store) UNNESTS them back to flat rows with
    pyarrow list kernels.  Proves pa.struct / pa.list_(pa.struct) columns
    survive Dataset block transport end-to-end."""
    import pyarrow.compute as pc

    from librecatastro_ray.sources.readers import read_parquet_clean

    def build_nested(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        city = batch["source"].combine_chunks() if isinstance(
            batch["source"], pa.ChunkedArray) else batch["source"]
        address = pa.StructArray.from_arrays(
            [city, pa.array(did % 100, pa.int64())], ["city", "zip"]
        )
        n_cons = (did % 4).astype(np.int64)
        total = int(n_cons.sum())
        starts = np.zeros(len(did), dtype=np.int64)
        np.cumsum(n_cons[:-1], out=starts[1:])
        floors = np.arange(total, dtype=np.int64) - np.repeat(starts, n_cons)
        rep_doc = np.repeat(did, n_cons)
        area = np.round(((rep_doc * 31 + floors * 7) % 1000) / 10.0, 1)
        values = pa.StructArray.from_arrays(
            [pa.array(floors, pa.int64()), pa.array(area, pa.float64())],
            ["floor", "area"],
        )
        offsets = np.zeros(len(did) + 1, dtype=np.int32)
        np.cumsum(n_cons, out=offsets[1:])
        constructions = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        return pa.table(
            {"doc_id": batch["doc_id"], "address": address, "constructions": constructions}
        )

    def unnest(batch: pa.Table) -> pa.Table:
        cons = batch["constructions"].combine_chunks() if isinstance(
            batch["constructions"], pa.ChunkedArray) else batch["constructions"]
        addr = batch["address"].combine_chunks() if isinstance(
            batch["address"], pa.ChunkedArray) else batch["address"]
        parents = pc.list_parent_indices(cons)
        flat = pc.list_flatten(cons)
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(parents),
                "city": addr.field("city").take(parents),
                "zip": addr.field("zip").take(parents),
                "floor": flat.field("floor"),
                "area": flat.field("area"),
            }
        )

    return (
        read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "source"])
        .map_batches(build_nested, batch_format="pyarrow", batch_size=4096)
        .map_batches(unnest, batch_format="pyarrow", batch_size=4096)
    )


ASOF_N_BUCKETS = 64


def asof_join_events(sf_dir: str, n_buckets: int = ASOF_N_BUCKETS) -> pa.Table:
    """AS-OF JOIN (a custom operator Ray Data lacks natively): for every
    'click' event, the most recent PRIOR-or-equal 'view' event of the SAME
    user.  Composed per the partitioned-as-of recipe: filter both sides at
    the read → co-locate by a BOUNDED bucket of the equality key
    (``user_id % n_buckets``, never per-user groups — a million-user event
    log would otherwise become a million tiny map_groups calls, the same
    per-group-overhead cliff the round-3 scatter merge removed) → ONE
    vectorized ``pd.merge_asof(..., by="user_id")`` per bucket (pandas'
    C-level grouped as-of over the ts-sorted bucket frame).  Partitioning
    assumption (documented): one BUCKET of users fits in a group; n_buckets
    scales with the cluster, not the key domain."""

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    _EMPTY = pd.DataFrame(
        {"event_id": pd.Series(dtype="int64"), "user_id": pd.Series(dtype="int64"),
         "ts": pd.Series(dtype="datetime64[us]"),
         "view_event_id": pd.Series(dtype="int64"),
         "view_ts": pd.Series(dtype="datetime64[us]"),
         "gap_us": pd.Series(dtype="int64")}
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # merge_asof(by=...) requires both frames globally sorted on the
        # "on" key; grouping by user_id happens inside the C kernel.
        # Secondary event_id sort key: with merge_asof taking the LAST tied
        # right row per group, ties on view_ts resolve to the max
        # view_event_id — deterministic, mirrored in the oracle's tie-break.
        clicks = g[g.event_type == "click"].sort_values(
            ["ts", "event_id"], kind="stable")
        views = g[g.event_type == "view"].sort_values(
            ["ts", "event_id"], kind="stable")
        if clicks.empty or views.empty:
            return _EMPTY
        m = pd.merge_asof(
            clicks[["event_id", "user_id", "ts"]],
            views[["event_id", "user_id", "ts"]].rename(
                columns={"event_id": "view_event_id", "ts": "view_ts"}),
            left_on="ts", right_on="view_ts", by="user_id",
            direction="backward",
        )
        m = m[m.view_event_id.notna()]  # inner as-of semantics
        if m.empty:
            return _EMPTY
        m["view_event_id"] = m["view_event_id"].astype("int64")
        m["gap_us"] = (
            m["ts"].astype("datetime64[us]").astype("int64")
            - m["view_ts"].astype("datetime64[us]").astype("int64")
        )
        return m[["event_id", "user_id", "ts", "view_event_id", "view_ts", "gap_us"]]

    def keep_kinds(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(["click", "view"])))
        bucket = t["user_id"].to_numpy() % np.int64(n_buckets)
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    out = (
        ds.map_batches(keep_kinds, batch_format="pyarrow")  # prune before the shuffle
        .groupby("bucket")  # ≤ n_buckets groups regardless of user count
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0 or "event_id" not in out.columns:
        # zero clicks/views anywhere: an all-empty Dataset loses its schema
        # through to_pandas — return the typed empty shape
        return pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("ts", pa.timestamp("us")), ("view_event_id", pa.int64()),
             ("view_ts", pa.timestamp("us")), ("gap_us", pa.int64())]
        ).empty_table()
    t = pa.Table.from_pandas(
        out.sort_values("event_id", ignore_index=True), preserve_index=False
    )
    for col in ("ts", "view_ts"):
        i = t.schema.get_field_index(col)
        t = t.set_column(i, col, t[col].cast(pa.timestamp("us")))
    return t


def events_sliding(sf_dir: str) -> pa.Table:
    """Hopping-window aggregate (1-hour windows every 15 minutes): each
    event fans out to the 4 windows covering it inside map_batches (numpy
    repeat — no per-row Python), partials aggregate per batch, tiny final
    groupby.  The window fan-out is the custom streaming-window operator
    re-expressed for batch."""
    import pyarrow.compute as pc

    hop_us = 15 * 60 * 1_000_000
    n_hops = 4  # 1h window / 15min hop
    empty_schema = pa.schema(
        [("event_type", pa.string()), ("window_start", pa.timestamp("us")),
         ("n", pa.int64()), ("sum_value", pa.float64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_schema.empty_table()
        floored = (
            pc.floor_temporal(batch["ts"], multiple=15, unit="minute")
            .cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        k = np.tile(np.arange(n_hops, dtype=np.int64), len(batch))
        ws = np.repeat(floored, n_hops) - k * hop_us
        t = pa.table(
            {
                "event_type": pa.array(
                    np.repeat(batch["event_type"].to_numpy(zero_copy_only=False), n_hops)
                ),
                "window_start": pa.array(ws.astype("datetime64[us]"), pa.timestamp("us")),
                "value": pa.array(np.repeat(batch["value"].to_numpy(), n_hops)),
            }
        )
        g = t.group_by(["event_type", "window_start"], use_threads=False).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return pa.table(
            {"event_type": g["event_type"], "window_start": g["window_start"],
             "n": g["count_all"].cast(pa.int64()), "sum_value": g["value_sum"]}
        )

    partials = _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    out = (
        partials.groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = np.round(out["sum_value"], 6)
    t = pa.Table.from_pandas(
        out.sort_values(["event_type", "window_start"], ignore_index=True),
        preserve_index=False,
    )
    i = t.schema.get_field_index("window_start")
    return t.set_column(i, "window_start", t["window_start"].cast(pa.timestamp("us")))


# B11 geo filter: a fixed convex test polygon (ccw) — the reference filters
# scraped coordinates by province polygons (reference:
# src/librecatastro/scrapping/searchers/geo_polygon.py:36-44); the engine
# re-expresses containment as vectorized cross-product arithmetic.
GEO_POLYGON = [(-90.0, -45.0), (60.0, -45.0), (90.0, 30.0), (0.0, 60.0), (-90.0, 30.0)]


def geo_filter_events(sf_dir: str) -> ray.data.Dataset:
    """Point-in-convex-polygon filter (SURVEY §2 B11): each event gets a
    DETERMINISTIC synthetic coordinate (derived from its ids — the testdata
    carries no geo tier), then a vectorized half-plane test against the ccw
    polygon keeps inside points.  Cross products in numpy over Arrow
    batches; the same arithmetic is the SQL oracle."""
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with siblings)

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema(
                [("event_id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64())]
            ).empty_table()
        eid = batch["event_id"].to_numpy()
        uid = batch["user_id"].to_numpy()
        lon = ((uid * 7919 + eid) % 36000) / 100.0 - 180.0
        lat = ((eid * 104729) % 18000) / 100.0 - 90.0
        inside = np.ones(len(eid), dtype=bool)
        n = len(GEO_POLYGON)
        for i in range(n):
            x1, y1 = GEO_POLYGON[i]
            x2, y2 = GEO_POLYGON[(i + 1) % n]
            cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
            inside &= cross >= 0.0
        return pa.table(
            {
                "event_id": pa.array(eid[inside], pa.int64()),
                "lon": pa.array(np.round(lon[inside], 6), pa.float64()),
                "lat": pa.array(np.round(lat[inside], 6), pa.float64()),
            }
        )

    return _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=65536
    )
