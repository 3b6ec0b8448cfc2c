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
2. bucketed merge: the shuffle key is ``hash(subj) % merge_buckets``,
   and each bucket merges ALL of its subjects in one vectorized call
   (``_merge_bucket``) — the reduce side costs ``merge_buckets``
   Python invocations total, not one per subject (at web scale,
   subjects number in the millions). Every kept entry carries the
   minimum ``seq`` of its dedup key, so "first occurrence globally"
   is exact after the merge's re-sort.

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




def _merge_bucket(df: pd.DataFrame) -> pa.Table:
    """Merge ALL subjects of one hash bucket vectorized (one call per
    bucket instead of one per subject — at web scale one-call-per-
    subject means millions of Python invocations)."""
    from rdf2smw_ray.functions.wikititle import page_title_series

    df = df.sort_values(["subj", "min_seq"], kind="mergesort")
    meta = df.drop_duplicates("subj")  # first partial per subject
    subj_order = meta["subj"].to_numpy()
    code_of = {s: i for i, s in enumerate(subj_order)}
    m = len(subj_order)

    reps = df["props"].map(len).to_numpy()
    flat = pd.DataFrame(
        {
            "subj": np.repeat(df["subj"].to_numpy(), reps),
            "prop": np.concatenate(df["props"].to_numpy()) if reps.sum() else np.array([], dtype=object),
            "value": np.concatenate(df["vals"].to_numpy()) if reps.sum() else np.array([], dtype=object),
            "is_cat": np.concatenate(df["iscat"].to_numpy()) if reps.sum() else np.array([], dtype=bool),
            "depth": np.concatenate(df["depths"].to_numpy()) if reps.sum() else np.array([], dtype=np.int32),
            "seq": np.concatenate(df["seqs"].to_numpy()) if reps.sum() else np.array([], dtype=np.int64),
        }
    ).sort_values("seq", kind="mergesort")

    facts = flat[~flat["is_cat"]].drop_duplicates(["subj", "prop", "value"])
    cat_cand = flat[flat["is_cat"]].drop_duplicates(["subj", "value", "depth"])

    # Equivalent URI (first-wins against existing facts)
    have_eq = set(
        facts.loc[
            (facts["prop"] == "Equivalent URI") & (facts["value"] == facts["subj"]),
            "subj",
        ]
    )
    need = [s for s in subj_order if s not in have_eq]
    if need:
        facts = pd.concat(
            [
                facts,
                pd.DataFrame(
                    {
                        "subj": need,
                        "prop": "Equivalent URI",
                        "value": need,
                        "is_cat": False,
                        "depth": 0,
                        "seq": np.int64(1 << 62),
                    }
                ),
            ]
        )

    def ordered_lists(rows: pd.DataFrame, build_values):
        codes = rows["subj"].map(code_of).to_numpy(dtype=np.int64)
        order = np.lexsort((rows["seq"].to_numpy(), codes))
        rows = rows.iloc[order]
        counts = np.bincount(codes[order], minlength=m)
        offsets = pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
        return pa.ListArray.from_arrays(offsets, build_values(rows))

    facts_list = ordered_lists(
        facts,
        lambda r: pa.StructArray.from_arrays(
            [pa.array(r["prop"], pa.string()), pa.array(r["value"], pa.string())],
            ["property", "value"],
        ),
    )
    cats_list = ordered_lists(
        cat_cand.drop_duplicates(["subj", "value"]),
        lambda r: pa.array(r["value"], pa.string()),
    )

    # SpecificCategory: first candidate (input order) achieving the
    # per-subject max depth, only when that max > 0
    deep = cat_cand[cat_cand["depth"] > 0]
    spec_map: dict[str, str] = {}
    if len(deep):
        maxd = deep.groupby("subj")["depth"].transform("max")
        best = (
            deep[deep["depth"] == maxd]
            .sort_values("seq", kind="mergesort")
            .drop_duplicates("subj")
        )
        spec_map = dict(zip(best["subj"], best["value"]))

    titles = page_title_series(
        meta["subj_title"].reset_index(drop=True),
        meta["subj_type"].reset_index(drop=True),
    )
    return pa.Table.from_arrays(
        [
            pa.array(titles, pa.string()),
            pa.array(meta["subj_type"], pa.int32()),
            facts_list,
            cats_list,
            pa.array([spec_map.get(s, "") for s in subj_order], pa.string()),
            pa.array(subj_order, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def fold_pages(resolved, *, salt: int = 1, merge_buckets: int | None = None):
    """resolved Dataset → pages Dataset (PAGES_SCHEMA), one row per
    subject.

    Two-level keyed aggregation: batch-granular combiner (``salt`` is
    accepted for API stability but the combiner is strictly finer than
    any salt), then a shuffle on ``hash(subj) % merge_buckets`` with a
    fully vectorized multi-subject merge per bucket — the reduce side
    costs ``merge_buckets`` Python calls total, not one per subject.

    ``merge_buckets`` defaults to ``tuning.auto_buckets`` over the
    input's estimated bytes (floor = CPU count), so per-bucket reduce
    memory stays bounded as the corpus grows instead of requiring a
    hand-retuned constant at 100x (round-1 scale-killer #5).
    """
    if merge_buckets is None:
        from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

        merge_buckets = auto_buckets(dataset_est_bytes(resolved))
    packed = resolved.map_batches(_pack_batch, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(batch["subj"].to_pylist()), index=False
        ).to_numpy()
        return batch.append_column(
            "bucket", pa.array((h % merge_buckets).astype(np.int32), pa.int32())
        )

    bucketed = packed.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(_merge_bucket, batch_format="pandas")
