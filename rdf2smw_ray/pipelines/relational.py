"""Relational operator suite over the TPC-H-ish testdata tables.

Demonstrates the engine's generic operator inventory — filter,
project, partial+final aggregation, broadcast hash join, sort/top-k,
distinct, tumbling window — each shaped for scale:

- aggregations pre-reduce inside ``map_batches`` (one row per key per
  batch) before the small final ``groupby`` (ray_guide "Aggregation at
  scale");
- dimension joins broadcast the small side via ``ray.put`` and map it
  inside the stream (no shuffle);
- top-k takes per-batch local top-k, merging only k rows per batch.

Every function takes ``sf_dir`` and returns a pandas DataFrame with
deterministic column names and rounded floats so the DuckDB oracle
(oracle_sql in __ray_entry__) hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: filter → partial agg → final agg
# ---------------------------------------------------------------------------
def pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                count_order=("l_quantity", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    final = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    final["sum_qty"] = final["sum_qty"].round(2)
    final["sum_base_price"] = final["sum_base_price"].round(2)
    final["sum_disc_price"] = final["sum_disc_price"].round(2)
    final["avg_qty"] = (final["sum_qty"] / final["count_order"]).round(4)
    final["count_order"] = final["count_order"].astype("int64")
    return final.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Broadcast dimension join: orders ⟕ customer ⟕ nation → per-nation stats
# ---------------------------------------------------------------------------
def orders_per_nation(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust_to_nation = dict(
        zip(
            cust["c_custkey"],
            cust["c_nationkey"].map(dict(zip(nation["n_nationkey"], nation["n_name"]))),
        )
    )
    ref = ray.put(cust_to_nation)

    class JoinNation:
        def __init__(self, lookup_ref):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["n_name"] = df["o_custkey"].map(self.lookup)
            g = (
                df.groupby("n_name", sort=False)
                .agg(order_count=("o_orderkey", "size"), total_price=("o_totalprice", "sum"))
                .reset_index()
            )
            return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    from rdf2smw_ray.util import pool

    partials = orders.map_batches(
        JoinNation,
        fn_constructor_kwargs={"lookup_ref": ref},
        batch_format="pyarrow",
        concurrency=pool(4),
    )
    out = (
        partials.groupby("n_name")
        .aggregate(
            Sum("order_count", alias_name="order_count"),
            Sum("total_price", alias_name="total_price"),
        )
        .to_pandas()
    )
    out["order_count"] = out["order_count"].astype("int64")
    out["total_price"] = out["total_price"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Filter + project + top-k (per-batch local top-k, merge k per batch)
# ---------------------------------------------------------------------------
def top_orders(sf_dir: str, k: int = 10) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k),
            preserve_index=False,
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(k)
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out.reset_index(drop=True)


def filter_highvalue(sf_dir: str, threshold: float = 400000.0) -> pd.DataFrame:
    """Vectorized filter + projection; returns count + aggregate only
    (small result), not the row stream."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    filtered = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], threshold)),
        batch_format="pyarrow",
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {"n": [len(df)], "total": [float(df["o_totalprice"].sum())]}
        )

    from ray.data.aggregate import Sum

    p = filtered.map_batches(partial, batch_format="pyarrow")
    res = p.aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="total"))
    n = int(res["n"] or 0)
    total = round(float(res["total"] or 0.0), 2)
    return pd.DataFrame({"n": pd.Series([n], dtype="int64"), "total": [total]})


# ---------------------------------------------------------------------------
# Distinct / tumbling window over the events stream table
# ---------------------------------------------------------------------------
def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = sorted(v for v in ds.unique("event_type") if v is not None)
    return pd.DataFrame({"event_type": pd.Series(vals, dtype=object)})


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per user: count + sum(value). Window =
    groupby(key, floor(ts)) — the batch-engine restatement of a
    streaming tumbling window (ray_guide 'Streaming-shaped
    workloads')."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        g = (
            df.groupby(["user_id", "hour"], sort=False)
            .agg(n=("value", "size"), total=("value", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="total"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["total"] = out["total"].round(2)
    out = out.sort_values(["user_id", "hour"]).reset_index(drop=True)
    # string timestamps dodge ns-vs-us unit mismatches vs the SQL oracle
    out["hour"] = out["hour"].dt.strftime("%Y-%m-%d %H:%M:%S")
    return out


def top_orders_per_nation(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k: the k highest-value orders per nation
    (groupby(key).map_groups local sort+head — no global sort)."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    lookup = dict(
        zip(
            cust["c_custkey"],
            cust["c_nationkey"].map(dict(zip(nation["n_nationkey"], nation["n_name"]))),
        )
    )
    ref = ray.put(lookup)

    def tag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_name"] = df["o_custkey"].map(ray.get(ref))
        return pa.Table.from_pandas(
            df[["n_name", "o_orderkey", "o_totalprice"]], preserve_index=False
        )

    def topk(df: pd.DataFrame) -> pa.Table:
        out = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("n_name")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
    )
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out.sort_values(["n_name", "o_orderkey"]).reset_index(drop=True)


TOPK_PER_NATION_SQL = """
SELECT n_name, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice FROM (
  SELECT n_name, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
) WHERE rn <= 3 ORDER BY n_name, o_orderkey
"""


def median_value_per_event_type(sf_dir: str) -> pd.DataFrame:
    """Exact per-group median via groupby(key).map_groups (per-key
    sort; keys are few, groups fit memory — the exact-quantile shape;
    approximate sketches are the scale path for high-cardinality keys)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def med(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "event_type": [df["event_type"].iat[0]],
                "median_value": [round(float(df["value"].median()), 2)],
            }
        )

    out = ds.groupby("event_type").map_groups(med, batch_format="pandas").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


MEDIAN_SQL = """
SELECT event_type, ROUND(CAST(MEDIAN(value) AS DOUBLE), 2) AS median_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Large-side hash join demo (both sides big): lineitem ⋈ orders on orderkey
# ---------------------------------------------------------------------------
def revenue_per_orderpriority(sf_dir: str, *, num_buckets: int = 16) -> pd.DataFrame:
    """lineitem ⋈ orders as an EXPLICIT partitioned hash join
    (ray_guide "portable pattern"): both sides tagged and co-shuffled
    on ``hash(orderkey) % num_buckets``, merged AND pre-aggregated
    inside each bucket, tiny final groupby. (Ray's experimental
    ``Dataset.join`` operator stalls intermittently at low CPU counts —
    see stages/resolve.py — so the engine owns its join.)"""
    import numpy as np

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def bucket_of(keys: pd.Series) -> np.ndarray:
        h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
        return (h % num_buckets).astype(np.int32)

    def tag_li(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "key": df["l_orderkey"],
                    "price": df["l_extendedprice"],
                    "disc": df["l_discount"],
                    "prio": None,
                    "side": np.int8(0),
                    "bucket": bucket_of(df["l_orderkey"]),
                }
            ),
            preserve_index=False,
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "key": df["o_orderkey"],
                    "price": np.nan,
                    "disc": np.nan,
                    "prio": df["o_orderpriority"].astype(object),
                    "side": np.int8(1),
                    "bucket": bucket_of(df["o_orderkey"]),
                }
            ),
            preserve_index=False,
        )

    unioned = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def merge_agg(df: pd.DataFrame) -> pa.Table:
        left = df[df["side"] == 0].drop(columns=["prio"])
        right = df[df["side"] == 1][["key", "prio"]].drop_duplicates("key")
        m = left.merge(right, on="key", how="inner")
        m["rev"] = m["price"] * (1 - m["disc"])
        g = (
            m.groupby("prio", sort=False)
            .agg(revenue=("rev", "sum"), n_items=("rev", "size"))
            .reset_index()
            .rename(columns={"prio": "o_orderpriority"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        unioned.groupby("bucket")
        .map_groups(merge_agg, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)
