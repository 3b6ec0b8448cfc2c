"""Keyed argmax / keep-first — the distributed reduce behind
"latest per key", "best per cluster", CDC compaction.

Shape: a per-batch local combiner (≤1 row per key per batch enters
the shuffle), then a COARSE-bucketed exact reduce — the per-bucket
frame is vectorized across all of its keys (sort + drop_duplicates),
never one Python call per key. A ``repartition(1)`` final pass would
instead funnel every key's winner through one task — fine on a laptop,
a bottleneck when keys ∝ data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rdf2smw_ray.util import table_from_pandas


def keyed_first(
    ds,
    key_cols: list[str],
    sort_cols: list[str],
    ascending: list[bool],
    *,
    num_buckets: int | None = None,
):
    """Keep the first row per key under (sort_cols, ascending) —
    exact, at any parallelism."""
    from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

    if num_buckets is None:
        num_buckets = auto_buckets(dataset_est_bytes(ds))

    def local(batch) -> pa.Table:
        df = batch if isinstance(batch, pd.DataFrame) else batch.to_pandas()
        best = df.sort_values(sort_cols, ascending=ascending, kind="mergesort").drop_duplicates(
            key_cols
        )
        return table_from_pandas(best, preserve_index=False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(batch[key_cols[0]].to_pandas()), index=False
        ).to_numpy()
        return batch.append_column(
            "__rbucket", pa.array((h % num_buckets).astype(np.int32), pa.int32())
        )

    def merge(df: pd.DataFrame) -> pa.Table:
        return local(df.drop(columns=["__rbucket"]))

    return (
        ds.map_batches(local, batch_format="pyarrow")  # combiner
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__rbucket")
        .map_groups(merge, batch_format="pandas")
    )
