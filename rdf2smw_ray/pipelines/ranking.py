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
    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    width = (hi - lo) / num_buckets or 1.0

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
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
