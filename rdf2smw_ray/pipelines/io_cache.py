"""Session-scoped materialized cache for the small oracle-contract
tables.

The driver gate and ``bench.py`` call ~50 query callables in one Ray
session, and every one of them re-read its parquet input — at sf0.01
the per-query read + fresh execution warm-up (~1–2 s) was half the
~192 s gate wall (round-2 VERDICT item 5). Here each (session, table)
is read ONCE, stripped of its pandas schema metadata (the driver's
parquet files carry a ``b'pandas'`` metadata dict that makes
``pa.Schema`` unhashable, which disables Ray's block-schema dedup and
spams "Failed to hash the schemas" warnings — VERDICT item 7), and
materialized into the object store; queries then run zero-copy
projections of the cached blocks.

Scope: this is gate/bench amortization for the SMALL test tables, not
a production pattern — the production pipelines (kg, checkpointed)
read their own column-pruned parquet and never route through here. A
100-TB table must stream, so the cache is opt-out via
``GRAFT_NO_TABLE_CACHE=1`` and is only ever keyed by the current Ray
job (refs from a dead session are dropped, never reused).
"""

from __future__ import annotations

import os
import threading

import pyarrow as pa

_CACHE: dict = {}
# gate_mirror drives query legs from a small thread pool; the fill
# (materialize + stale-job evict) must not race or mutate the dict
# under another thread's iteration
_LOCK = threading.Lock()


def _clean_schema(path: str):
    """File schema with the ``b'pandas'`` metadata dict stripped —
    handed to ``read_parquet`` so even the read tasks emit hashable
    block schemas (the metadata otherwise disables Ray's schema
    dedup with a per-unify warning)."""
    import pyarrow.parquet as pq

    return pq.read_schema(path).remove_metadata()


def cached_table(sf_dir: str, table: str, columns=None):
    import ray
    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    if os.environ.get("GRAFT_NO_TABLE_CACHE") or not ray.is_initialized():
        schema = _clean_schema(path)
        if columns:
            # the declared schema must match the projection, or the
            # read emits full-schema empty blocks beside projected ones
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.read_parquet(
            path,
            columns=list(columns) if columns else None,
            schema=schema,
        )
    job = ray.get_runtime_context().get_job_id()
    key = (job, path)
    with _LOCK:
        ds = _CACHE.get(key)
        if ds is None:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            # full-width read: the cache serves every query's projection.
            # Forced block count keeps downstream parallelism (column
            # pruning/materialization otherwise collapses tiny tables to a
            # couple of blocks — BASELINE.md round-1 measurement)
            ds = rd.read_parquet(
                path,
                schema=_clean_schema(path),
                override_num_blocks=max(16, 2 * ncpu),
            ).materialize()
            for k in [k for k in _CACHE if k[0] != job]:
                del _CACHE[k]
            _CACHE[key] = ds
    return ds.select_columns(list(columns)) if columns else ds
