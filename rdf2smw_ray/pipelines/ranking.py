"""Distributed global window ranking: ROW_NUMBER / NTILE over the
whole table without a single-node sort.

SQL's ``ROW_NUMBER() OVER (ORDER BY v, id)`` needs every row's global
position — the textbook distributed answer (and the one Ray Data's own
``sort`` uses internally) is RANGE PARTITIONING + a PREFIX SCAN:

1. one cheap pass finds the global [min, max] of the sort column;
2. each row is routed to an equi-width value range bucket (a function
   of the VALUE only, so ties never straddle buckets and the
   tie-break stays local);
3. per-bucket row counts come back to the driver — O(num_buckets)
   ints — and an exclusive scan over them yields each bucket's
   global rank offset;
4. a second local pass sorts each bucket by (v, id) and adds the
   offset: exact global ROW_NUMBER, and NTILE(k) is then pure integer
   arithmetic on (rank, n).

No stage ever holds more than one bucket; driver state is
O(num_buckets). Equi-width ranges assume the sort column is not
pathologically skewed — for skewed columns swap step 2's boundaries
for sampled quantiles (``sketches.approx_quantiles``) without
touching the scan; the bucket-id function is the only seam.

The reference engine has no window functions; this extends the
relational suite (SURVEY.md §2 extension operators) the same way
``running_user_total`` / ``rolling_value_sum`` do for the
partitioned-window family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ntile(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 1-based global ranks: the first n%k tiles get
    ceil(n/k) rows, the rest floor(n/k) — exactly DuckDB/ANSI."""
    q, r = divmod(n, k)
    big = r * (q + 1)  # rows covered by the q+1-sized tiles
    r0 = rank - 1
    small = np.maximum(r0 - big, 0)
    return np.where(
        r0 < big,
        r0 // max(q + 1, 1) + 1,
        r + small // max(q, 1) + 1,
    ).astype(np.int64)


def global_rank(
    ds,
    *,
    value_col: str,
    id_col: str,
    tiles: int = 4,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """(id, rnk, tile): rnk = ROW_NUMBER() OVER (ORDER BY value, id),
    tile = NTILE(tiles) over the same order."""
    import ray
    from ray.data.aggregate import Max, Min

    from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

    if num_buckets is None:
        num_buckets = auto_buckets(dataset_est_bytes(ds))

    ds = ds.select_columns([id_col, value_col]).materialize()
    if ds.count() == 0:
        # Min/Max over an empty dataset return None; float(None) raises
        return pd.DataFrame(
            {
                id_col: pd.Series([], dtype="int64"),
                "rnk": pd.Series([], dtype="int64"),
                "tile": pd.Series([], dtype="int64"),
            }
        )
    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    if not (np.isfinite(lo) and np.isfinite(hi)):
        # inf min/max would poison every bucket id (Min/Max skip NaN,
        # so NaN rows are caught per-batch in add_bucket below)
        raise ValueError(
            f"global_rank: {value_col} contains inf (min={lo}, max={hi}); "
            "filter or impute before ranking"
        )
    width = (hi - lo) / num_buckets or 1.0

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(v).any():
            # NaN casts to INT64_MIN and lands silently in bucket 0,
            # corrupting the global order — refuse instead
            raise ValueError(
                f"global_rank: {value_col} contains NaN; "
                "filter or impute before ranking"
            )
        b = np.clip(((v - lo) / width).astype(np.int64), 0, num_buckets - 1)
        return batch.append_column("__bucket", pa.array(b.astype(np.int32), pa.int32()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    # pass 1: bucket counts -> bounded driver exclusive scan
    counts = (
        bucketed.groupby("__bucket").count().to_pandas().sort_values("__bucket")
    )
    n_total = int(counts["count()"].sum())
    offs = dict(
        zip(
            counts["__bucket"].astype(int),
            np.concatenate(
                ([0], counts["count()"].to_numpy()[:-1].cumsum())
            ).astype(np.int64),
        )
    )
    offs_ref = ray.put(offs)

    # pass 2: local sort + bucket offset = exact global row number
    def assign(df: pd.DataFrame) -> pa.Table:
        base = ray.get(offs_ref)[int(df["__bucket"].iat[0])]
        df = df.sort_values([value_col, id_col], kind="mergesort")
        rnk = base + np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "rnk": pa.array(rnk, pa.int64()),
                "tile": pa.array(_ntile(rnk, n_total, tiles), pa.int64()),
            }
        )

    out = (
        bucketed.groupby("__bucket")
        .map_groups(assign, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(id_col).reset_index(drop=True)


def order_value_rank(sf_dir: str) -> pd.DataFrame:
    """Every order's global price rank and quartile (NTILE(4)) — the
    registered query over the orders table."""
    from rdf2smw_ray.pipelines.relational import _read

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = global_rank(ds, value_col="o_totalprice", id_col="o_orderkey")
    return out.rename(columns={"rnk": "price_rank", "tile": "quartile"})


ORDER_VALUE_RANK_SQL = """
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS price_rank,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         AS quartile
FROM orders ORDER BY o_orderkey
"""


def dense_rank_strings(ds, *, column: str, num_buckets: int | None = None,
                       sample_target: int = 8192):
    """Order-preserving dense int64 ids for a column of DISTINCT
    strings: (v, id) with id = rank of v in lexicographic order.

    The numeric ``global_rank`` above range-partitions on equi-width
    value buckets; strings have no width, so the boundaries come from
    a DETERMINISTIC hash-gated sample (rate sized to ``sample_target``
    rows, so driver state stays bounded at any corpus size — the
    standard distributed-sort boundary sample). Then the same shape:
    per-bucket counts → exclusive driver scan → local sort + offset.

    min(id) over any subset equals the id of min(string) — the
    property the entity-canonicalization pipeline (fuzzy_pairs →
    connected components → min representative) relies on.
    """
    import ray

    from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

    ds = ds.select_columns([column]).materialize()
    n = ds.count()
    if n == 0:
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table({column: pa.array([], pa.string()), "id": pa.array([], pa.int64())})
        )
    if num_buckets is None:
        num_buckets = auto_buckets(dataset_est_bytes(ds))
    rate = min(1.0, sample_target / max(n, 1))
    thr = (
        np.iinfo(np.uint64).max
        if rate >= 1.0
        else np.uint64(rate * float(np.iinfo(np.uint64).max))
    )

    def sample(batch: pa.Table) -> pa.Table:
        v = pd.Series(batch[column].to_pylist(), dtype=object)
        h = pd.util.hash_pandas_object(v, index=False).to_numpy().astype(np.uint64)
        return pa.table({column: pa.array(v[h <= thr].to_numpy(), pa.string())})

    boundary_rows = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    smp = np.sort(boundary_rows[column].to_numpy()) if len(boundary_rows) else np.array([], dtype=object)
    if len(smp) >= num_buckets:
        idx = (np.arange(1, num_buckets) * len(smp)) // num_buckets
        bounds = smp[idx]
    else:
        bounds = smp[1:] if len(smp) > 1 else np.array([], dtype=object)
    bounds_ref = ray.put(bounds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        v = pd.Series(batch[column].to_pylist(), dtype=object).to_numpy()
        bk = np.searchsorted(b, v, side="right") if len(b) else np.zeros(len(v), dtype=np.int64)
        return batch.append_column(
            "__bucket", pa.array(np.asarray(bk, dtype=np.int32), pa.int32())
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()
    counts = (
        bucketed.groupby("__bucket").count().to_pandas().sort_values("__bucket")
    )
    offs = dict(
        zip(
            counts["__bucket"].astype(int),
            np.concatenate(
                ([0], counts["count()"].to_numpy()[:-1].cumsum())
            ).astype(np.int64),
        )
    )
    offs_ref = ray.put(offs)

    def assign(df: pd.DataFrame) -> pa.Table:
        base = ray.get(offs_ref)[int(df["__bucket"].iat[0])]
        df = df.sort_values(column, kind="mergesort")
        return pa.table(
            {
                column: pa.array(df[column].to_numpy(), pa.string()),
                "id": pa.array(
                    base + np.arange(len(df), dtype=np.int64), pa.int64()
                ),
            }
        )

    return bucketed.groupby("__bucket").map_groups(assign, batch_format="pandas")


def grouped_rank(
    ds,
    *,
    key_col: str,
    value_col: str,
    id_col: str,
    tiles: int = 4,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Partitioned window ranking: ROW_NUMBER / NTILE *within each
    key* — without ever materializing one key's whole partition in a
    task (the low-cardinality-key regime where groupby(key).map_groups
    is exactly the whole-group materialization VERDICT r2 flagged).

    Same scan shape as :func:`global_rank`, with the range partition
    COMPOSITE: rows route to (key, value-range bucket); per-(key,
    bucket) counts come back to the driver (O(keys × num_buckets)
    ints), the exclusive scan runs per key, and each (key, bucket)
    task adds its offset after a local sort. A 5-key table with 10^9
    rows per key still fans out to 5 × num_buckets bounded tasks."""
    import ray
    from ray.data.aggregate import Max, Min

    ds = ds.select_columns([key_col, id_col, value_col]).materialize()
    # per-key min/max: tiny (one row per key)
    mm = (
        ds.groupby(key_col)
        .aggregate(Min(value_col, alias_name="lo"), Max(value_col, alias_name="hi"))
        .to_pandas()
    )
    lo = dict(zip(mm[key_col], mm["lo"].astype(float)))
    width = {
        k: ((h - l) / num_buckets or 1.0)
        for k, l, h in zip(mm[key_col], mm["lo"].astype(float), mm["hi"].astype(float))
    }
    lo_ref, w_ref = ray.put(lo), ray.put(width)

    def add_bucket(batch: pa.Table) -> pa.Table:
        lo_m, w_m = ray.get(lo_ref), ray.get(w_ref)
        keys = pd.Series(batch[key_col].to_pylist(), dtype=object)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        kl = keys.map(lo_m).to_numpy(dtype=np.float64)
        kw = keys.map(w_m).to_numpy(dtype=np.float64)
        b = np.clip(((v - kl) / kw).astype(np.int64), 0, num_buckets - 1)
        # \x1f composes the (key, bucket) id — keys must not contain it
        # (explicit raise, not assert: python -O strips asserts and a
        # \x1f in a key would silently corrupt the composite id)
        if keys.str.contains("\x1f").any():
            raise ValueError(
                f"grouped_rank: {key_col} contains the \\x1f separator; "
                "composite (key, bucket) ids would be ambiguous"
            )
        comp = keys.astype(str) + "\x1f" + pd.Series(b).astype(str)
        return batch.append_column("__kb", pa.array(comp.to_numpy(), pa.string()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    counts = bucketed.groupby("__kb").count().to_pandas()
    kb = counts["__kb"].str.split("\x1f", expand=True)
    counts["key"], counts["b"] = kb[0], kb[1].astype(int)
    counts = counts.sort_values(["key", "b"])
    counts["off"] = counts.groupby("key")["count()"].cumsum() - counts["count()"]
    n_per_key = counts.groupby("key")["count()"].sum().to_dict()
    offs = dict(zip(counts["__kb"], counts["off"].astype(np.int64)))
    offs_ref, n_ref = ray.put(offs), ray.put(n_per_key)

    def assign(df: pd.DataFrame) -> pa.Table:
        kbv = df["__kb"].iat[0]
        key = kbv.split("\x1f")[0]
        base = ray.get(offs_ref)[kbv]
        n_total = int(ray.get(n_ref)[key])
        df = df.sort_values([value_col, id_col], kind="mergesort")
        rnk = base + np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.table(
            {
                key_col: pa.array(df[key_col].to_numpy(), pa.string()),
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "rnk": pa.array(rnk, pa.int64()),
                "tile": pa.array(_ntile(rnk, n_total, tiles), pa.int64()),
            }
        )

    out = (
        bucketed.groupby("__kb")
        .map_groups(assign, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(id_col).reset_index(drop=True)


def order_rank_in_priority(sf_dir: str) -> pd.DataFrame:
    """Every order's price rank and quartile WITHIN its order
    priority — the partitioned-window registered query (5 hot keys,
    each ~20% of the table: the regime where per-key map_groups would
    materialize a fifth of the corpus in one task)."""
    from rdf2smw_ray.pipelines.relational import _read

    ds = _read(
        sf_dir, "orders", columns=["o_orderpriority", "o_orderkey", "o_totalprice"]
    )
    out = grouped_rank(
        ds, key_col="o_orderpriority", value_col="o_totalprice", id_col="o_orderkey"
    )
    return out.rename(columns={"rnk": "price_rank", "tile": "quartile"})


ORDER_RANK_IN_PRIORITY_SQL = """
SELECT o_orderpriority, o_orderkey,
       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS price_rank,
       CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         AS quartile
FROM orders ORDER BY o_orderkey
"""


def quantile_normalize(sf_dir: str) -> pd.DataFrame:
    """Quantile normalization per key — the ML feature-preprocessing
    transform: each event's value is replaced by its integer per-mille
    percentile rank within its event_type, permille =
    (rank-1)*1000 // (n-1). Composes :func:`grouped_rank` (the bounded
    composite-(key, range-bucket) scan — no whole-partition tasks)
    over floor-cents values, so ranking ties and the final integers
    are bit-identical cross-engine; the per-key n comes free as the
    max rank. Single-row groups floor-guard the denominator at 1."""
    from rdf2smw_ray.pipelines.relational import _read

    ds = _read(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def add_cents(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "event_id": batch["event_id"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    ranked = grouped_rank(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        key_col="event_type",
        value_col="cents",
        id_col="event_id",
    )
    n = ranked.groupby("event_type")["rnk"].transform("max").to_numpy()
    ranked["permille"] = (
        (ranked["rnk"].to_numpy() - 1) * 1000 // np.maximum(n - 1, 1)
    ).astype("int64")
    out = ranked[["event_id", "event_type", "permille"]]
    return out.sort_values("event_id").reset_index(drop=True)


QUANTILE_NORMALIZE_SQL = """
SELECT event_id, event_type,
       CAST((ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY CAST(FLOOR(value * 100) AS BIGINT), event_id) - 1) * 1000
            // GREATEST(COUNT(*) OVER (PARTITION BY event_type) - 1, 1)
            AS BIGINT) AS permille
FROM events ORDER BY event_id
"""


def quantity_dense_rank(sf_dir: str) -> pd.DataFrame:
    """DENSE_RANK completion of the window-rank family: the dense rank
    of each distinct quantity within its return flag. Dense rank ==
    ROW_NUMBER over the DISTINCT value table, so this composes the
    distinct combiner with :func:`grouped_rank` — no new scan shape."""
    from ray.data.aggregate import Count

    from rdf2smw_ray.pipelines.relational import _read

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        q = df["l_quantity"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "l_returnflag": pa.array(df["l_returnflag"].to_numpy(), pa.string()),
                "l_quantity": pa.array(q, pa.float64()),
                # grouped_rank needs a distinct id column; quantities
                # are integral so the int view is a faithful id
                "qty_id": pa.array(q.astype(np.int64), pa.int64()),
            }
        )

    distinct = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_quantity", "qty_id"])
        .aggregate(Count(alias_name="__c"))
        .select_columns(["l_returnflag", "l_quantity", "qty_id"])
    )
    out = grouped_rank(
        distinct,
        key_col="l_returnflag",
        value_col="l_quantity",
        id_col="qty_id",
        num_buckets=8,
    )
    out = out.rename(columns={"rnk": "dense_rank", "qty_id": "l_quantity"}).drop(
        columns=["tile"]
    )
    # SQL ROUND returns DOUBLE — match the dtype, not just the value
    out["l_quantity"] = out["l_quantity"].astype(float).round(2)
    return (
        out[["l_returnflag", "l_quantity", "dense_rank"]]
        .sort_values(["l_returnflag", "l_quantity"])
        .reset_index(drop=True)
    )


QUANTITY_DENSE_RANK_SQL = """
SELECT DISTINCT l_returnflag, ROUND(l_quantity, 2) AS l_quantity,
       DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
         AS dense_rank
FROM lineitem ORDER BY 1, 2
"""


def value_gini(sf_dir: str) -> pd.DataFrame:
    """Exact Gini concentration of event value — the corpus-inequality
    metric (how concentrated is activity/value across events). Needs
    every row's GLOBAL rank in value order; computed with the same
    range-partition + prefix-scan shape as :func:`global_rank` but
    reduced IN PLACE: each bucket contributes Σ local_rank·cents,
    Σ cents and n, and the bucket's global offset enters as
    offset·Σcents on the driver — one scan, O(num_buckets) driver
    state, all arithmetic in exact BIGINTs (cents × ranks), so the
    final Gini is a single deterministic float division."""
    import ray
    from ray.data.aggregate import Max, Min

    from rdf2smw_ray.pipelines.relational import _read
    from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

    ds = _read(sf_dir, "events", columns=["event_id", "value"]).materialize()
    if ds.count() == 0:
        return pd.DataFrame(
            {
                "n": pd.Series([0], dtype="int64"),
                "sum_cents": pd.Series([0], dtype="int64"),
                "sum_rank_cents": pd.Series([0], dtype="int64"),
                "gini": [0.0],
            }
        )
    num_buckets = auto_buckets(dataset_est_bytes(ds))
    mm = ds.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    width = (hi - lo) / num_buckets or 1.0

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, num_buckets - 1)
        return batch.append_column("__bucket", pa.array(b.astype(np.int32), pa.int32()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["value", "event_id"], kind="mergesort")
        cents = np.floor(df["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        local = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.table(
            {
                "__bucket": pa.array(
                    [int(df["__bucket"].iat[0])], pa.int64()
                ),
                "n": pa.array([len(df)], pa.int64()),
                "sum_cents": pa.array([int(cents.sum())], pa.int64()),
                "sum_rank_cents": pa.array([int((local * cents).sum())], pa.int64()),
            }
        )

    parts = (
        bucketed.groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("__bucket")
    )
    offs = np.concatenate(([0], parts["n"].to_numpy()[:-1].cumsum()))
    n = int(parts["n"].sum())
    s = int(parts["sum_cents"].sum())
    src = int(parts["sum_rank_cents"].sum() + (offs * parts["sum_cents"].to_numpy()).sum())
    gini = (2.0 * src) / (n * s) - (n + 1.0) / n if n and s else 0.0
    return pd.DataFrame(
        {
            "n": pd.Series([n], dtype="int64"),
            "sum_cents": pd.Series([s], dtype="int64"),
            "sum_rank_cents": pd.Series([src], dtype="int64"),
            "gini": [round(gini, 6)],
        }
    )


VALUE_GINI_SQL = """
WITH r AS (
  SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn
  FROM events
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sum_cents,
         CAST(SUM(rn * cents) AS BIGINT) AS sum_rank_cents
  FROM r
)
SELECT n, sum_cents, sum_rank_cents,
       ROUND(2.0 * sum_rank_cents / (n * sum_cents) - (n + 1.0) / n, 6)
         AS gini
FROM a
"""
