"""Category filter — keep pages carrying at least one allowlisted
category.

Restates the reference's ``CategoryFilterer``
(/root/reference/components/catfilterer.go:3-36, present but unwired
in main.go:89-90): a vectorized predicate over the ``categories`` list
column instead of a per-record goroutine.
"""

from __future__ import annotations

import pyarrow as pa


def filter_pages_by_categories(pages, allow: list[str]):
    """pages Dataset → pages whose ``categories`` intersect ``allow``
    (set semantics, exact match — catfilterer.go:19-27)."""
    allow_set = set(allow)

    def keep(batch: pa.Table) -> pa.Table:
        cats = batch["categories"].to_pylist()
        mask = pa.array([bool(allow_set.intersection(c or ())) for c in cats])
        return batch.filter(mask)

    return pages.map_batches(keep, batch_format="pyarrow")
