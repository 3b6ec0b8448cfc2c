"""groupby(subject) page fold — THE core shuffle.

Restates the reference's ``TripleAggregator`` + per-aggregate page
construction (/root/reference/components/tripleaggregator.go:7-31 and
triplestowikipageconv.go:85-151) as a **combiner + keyed merge**:

1. ``_pack_batch`` (map_batches, no shuffle): vectorized per-batch
   partial fold — first-wins dedup of facts on (subj, property, value)
   and of category candidates on (subj, value, depth), then one packed
   row per subject per batch (list columns). This is the combiner that
   makes head-entity skew a non-issue: a subject with millions of
   rows contributes ≤1 row per input block to the shuffle, so the
   reduce-side group size is bounded by the block count, not the fact
   count (the explicit skew handling required by the north rule —
   batch-granular, strictly finer than key salting).
2. ``groupby(subj)`` merge: concatenates a subject's few partials,
   restores global order by ``seq`` (every kept entry carries the
   minimum seq of its dedup key, so "first occurrence globally" is
   exact), finalizes the page.

Page semantics (bit-for-bit vs the reference, see tests):
- facts: order-preserving first-wins dedup (iptypes.go:53-64);
- categories: first-wins dedup on name (iptypes.go:70-81);
- SpecificCategory: value of the first triple (input order) achieving
  the maximum super-category depth, only when depth > 0
  (triplestowikipageconv.go:136-142);
- "Equivalent URI" fact appended through the same dedup (:148-150).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rdf2smw_ray.functions.wikititle import page_title
from rdf2smw_ray.schemas import PAGES_SCHEMA

_PACKED_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("subj_title", pa.string()),
        pa.field("subj_type", pa.int32()),
        pa.field("min_seq", pa.int64()),
        pa.field("props", pa.list_(pa.string())),
        pa.field("vals", pa.list_(pa.string())),
        pa.field("iscat", pa.list_(pa.bool_())),
        pa.field("depths", pa.list_(pa.int32())),
        pa.field("seqs", pa.list_(pa.int64())),
    ]
)


def _pack_batch(batch: pa.Table) -> pa.Table:
    """Vectorized partial fold: ≤1 packed row per subject per batch.

    Entirely offset-based: rows are deduped and sorted by
    (subj, seq), group boundaries become Arrow ListArray offsets — no
    per-group Python work at all."""
    df = batch.to_pandas()
    if df.empty:
        return _PACKED_SCHEMA.empty_table()
    df = df.sort_values("seq", kind="mergesort")
    facts = df[~df["is_cat"]].drop_duplicates(["subj", "property", "value"])
    cats = df[df["is_cat"]].drop_duplicates(["subj", "value", "depth"])
    part = pd.concat([facts, cats])

    subj_codes, subj_uniq = pd.factorize(part["subj"], sort=False)
    order = np.lexsort((part["seq"].to_numpy(), subj_codes))
    part = part.iloc[order]
    codes = subj_codes[order]

    boundaries = np.flatnonzero(np.diff(codes) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    offsets = pa.array(
        np.concatenate((starts, [len(part)])).astype(np.int32)
    )

    def lst(values: pa.Array) -> pa.Array:
        return pa.ListArray.from_arrays(offsets, values)

    first = part.iloc[starts]
    return pa.Table.from_arrays(
        [
            pa.array(first["subj"], pa.string()),
            pa.array(first["subj_title"], pa.string()),
            pa.array(first["subj_type"], pa.int32()),
            pa.array(first["seq"], pa.int64()),  # min seq: first row per group
            lst(pa.array(part["property"], pa.string())),
            lst(pa.array(part["value"], pa.string())),
            lst(pa.array(part["is_cat"], pa.bool_())),
            lst(pa.array(part["depth"], pa.int32())),
            lst(pa.array(part["seq"], pa.int64())),
        ],
        schema=_PACKED_SCHEMA,
    )


def _finalize(
    subj: str, subj_title: str, subj_type: int, props, vals, iscat, depths, seqs
) -> dict:
    """Merge partial entry lists (already per-key deduped within each
    partial) into the final page. Inputs are flat python/numpy arrays;
    order restored by stable argsort on seq."""
    order = np.argsort(np.asarray(seqs, dtype=np.int64), kind="stable")
    facts: list[tuple[str, str]] = []
    seen_facts: set[tuple[str, str]] = set()
    cats: list[str] = []
    seen_cats: set[str] = set()
    specific = ""
    top = 0
    for i in order:
        v = vals[i]
        if iscat[i]:
            d = depths[i]
            if d > top:
                top = d
                specific = v
            if v not in seen_cats:
                seen_cats.add(v)
                cats.append(v)
        else:
            k = (props[i], v)
            if k not in seen_facts:
                seen_facts.add(k)
                facts.append(k)
    k = ("Equivalent URI", subj)
    if k not in seen_facts:
        facts.append(k)
    return {
        "title": page_title(subj_title, subj_type),
        "page_type": subj_type,
        "facts": [{"property": p, "value": v} for p, v in facts],
        "categories": cats,
        "specific_category": specific,
        "subj": subj,
    }


def _merge_group(df: pd.DataFrame) -> pa.Table:
    """One subject's partials → one page row."""
    if len(df) > 1:
        df = df.sort_values("min_seq", kind="mergesort")
        props = [p for row in df["props"] for p in row]
        vals = [v for row in df["vals"] for v in row]
        iscat = [c for row in df["iscat"] for c in row]
        depths = [d for row in df["depths"] for d in row]
        seqs = [s for row in df["seqs"] for s in row]
    else:
        r = df.iloc[0]
        props, vals, iscat, depths, seqs = (
            list(r["props"]),
            list(r["vals"]),
            list(r["iscat"]),
            list(r["depths"]),
            list(r["seqs"]),
        )
    page = _finalize(
        df["subj"].iat[0],
        df["subj_title"].iat[0],
        int(df["subj_type"].iat[0]),
        props,
        vals,
        iscat,
        depths,
        seqs,
    )
    return pa.Table.from_pydict(
        {k: [page[k]] for k in PAGES_SCHEMA.names}, schema=PAGES_SCHEMA
    )


def fold_pages(resolved, *, salt: int = 1):
    """resolved Dataset → pages Dataset (PAGES_SCHEMA), one row per
    subject.

    ``salt`` is accepted for API stability but the combiner makes it
    moot: partial folding is always batch-granular (finer than any
    salt), so the keyed shuffle only ever moves deduped packed rows.
    """
    packed = resolved.map_batches(_pack_batch, batch_format="pyarrow")
    return packed.groupby("subj").map_groups(_merge_group, batch_format="pandas")
