"""groupby(subject) page fold — THE core shuffle.

Restates the reference's ``TripleAggregator`` + per-aggregate page
construction (/root/reference/components/tripleaggregator.go:7-31 and
triplestowikipageconv.go:85-151,148-150) as a keyed Ray Data
aggregation over already-resolved rows:

- facts: order-preserving first-wins dedup on (property, value)
  (iptypes.go:53-64), order = first-occurrence ``seq`` order;
- categories: first-wins dedup on name (iptypes.go:70-81);
- SpecificCategory: the category value of the first triple (in input
  order) achieving the maximum super-category depth, only when that
  depth > 0 (triplestowikipageconv.go:136-142) — "" otherwise (the
  reference nil, which would crash its renderer; we fall back at
  render time like mwxmlcreator.go:71-74 intends);
- the "Equivalent URI" provenance fact appended last via the same
  first-wins dedup (triplestowikipageconv.go:148-150).

Skew: ``salt > 1`` enables the two-phase fold for head entities —
phase 1 groups on ``(subj, seq % salt)`` and reduces each shard to
deduped partials, phase 2 merges the (much smaller) partials per
subject. The merge is exact: every partial keeps the minimum ``seq``
per dedup key, so "first occurrence globally" is recoverable, and
SpecificCategory candidates carry (value, depth, min seq) so the
"first row achieving max depth" rule is preserved. Equivalence
salted == unsalted is unit-tested.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from rdf2smw_ray.functions.wikititle import page_title
from rdf2smw_ray.schemas import PAGES_SCHEMA

_EMPTY_FACTS: list = []


def _finalize_page(
    subj: str,
    subj_title: str,
    subj_type: int,
    rows: pd.DataFrame,
) -> dict:
    """rows: columns property, value, is_cat, depth, sorted by seq,
    already first-wins-deduped per kind (facts on (property, value),
    categories on value) EXCEPT specific-category candidates which are
    passed pre-dedup via (value, depth) in the ``cat_rows`` frame."""
    facts_df = rows[~rows["is_cat"]]
    cat_rows = rows[rows["is_cat"]]

    facts = list(zip(facts_df["property"], facts_df["value"]))
    if ("Equivalent URI", subj) not in set(facts):
        facts.append(("Equivalent URI", subj))

    cats = list(dict.fromkeys(cat_rows["value"]))

    specific = ""
    if len(cat_rows):
        maxd = int(cat_rows["depth"].max())
        if maxd > 0:
            specific = cat_rows.loc[cat_rows["depth"] == maxd, "value"].iloc[0]

    return {
        "title": page_title(subj_title, subj_type),
        "page_type": subj_type,
        "facts": [{"property": p, "value": v} for p, v in facts],
        "categories": cats,
        "specific_category": specific,
        "subj": subj,
    }


def _pages_table(pages: list[dict]) -> pa.Table:
    if not pages:
        return PAGES_SCHEMA.empty_table()
    return pa.Table.from_pydict(
        {k: [p[k] for p in pages] for k in PAGES_SCHEMA.names}, schema=PAGES_SCHEMA
    )


def _fold_group(df: pd.DataFrame) -> pa.Table:
    """One subject group (resolved rows) → one page row."""
    df = df.sort_values("seq", kind="mergesort")
    # dedup facts first-wins; keep ALL category rows (specific-category
    # tracking happens pre-dedup in the reference)
    dedup = pd.concat(
        [
            df[~df["is_cat"]].drop_duplicates(["property", "value"]),
            df[df["is_cat"]],
        ]
    ).sort_values("seq", kind="mergesort")
    page = _finalize_page(
        df["subj"].iat[0], df["subj_title"].iat[0], int(df["subj_type"].iat[0]), dedup
    )
    return _pages_table([page])


def _fold_partial(df: pd.DataFrame) -> pa.Table:
    """Phase-1 (salted) partial fold: dedup within the shard, keep min
    seq per key so the global merge can restore first-occurrence order."""
    df = df.sort_values("seq", kind="mergesort")
    facts = df[~df["is_cat"]].drop_duplicates(["property", "value"])
    # distinct (value, depth) candidates with their first seq
    cats = df[df["is_cat"]].drop_duplicates(["value", "depth"])
    part = pd.concat([facts, cats]).sort_values("seq", kind="mergesort")
    rows = [
        {
            "property": p,
            "value": v,
            "is_cat": bool(c),
            "depth": int(d),
            "seq": int(s),
        }
        for p, v, c, d, s in zip(
            part["property"], part["value"], part["is_cat"], part["depth"], part["seq"]
        )
    ]
    return pa.table(
        {
            "subj": pa.array([df["subj"].iat[0]], pa.string()),
            "subj_title": pa.array([df["subj_title"].iat[0]], pa.string()),
            "subj_type": pa.array([int(df["subj_type"].iat[0])], pa.int32()),
            "min_seq": pa.array([int(df["seq"].iat[0])], pa.int64()),
            "rows": pa.array(
                [rows],
                pa.list_(
                    pa.struct(
                        [
                            ("property", pa.string()),
                            ("value", pa.string()),
                            ("is_cat", pa.bool_()),
                            ("depth", pa.int32()),
                            ("seq", pa.int64()),
                        ]
                    )
                ),
            ),
        }
    )


def _merge_partials(df: pd.DataFrame) -> pa.Table:
    """Phase-2: merge a subject's partials into the final page."""
    df = df.sort_values("min_seq", kind="mergesort")
    all_rows = [r for part in df["rows"] for r in part]
    rows = pd.DataFrame(all_rows).sort_values("seq", kind="mergesort")
    dedup = pd.concat(
        [
            rows[~rows["is_cat"]].drop_duplicates(["property", "value"]),
            rows[rows["is_cat"]].drop_duplicates(["value", "depth"]),
        ]
    ).sort_values("seq", kind="mergesort")
    page = _finalize_page(
        df["subj"].iat[0], df["subj_title"].iat[0], int(df["subj_type"].iat[0]), dedup
    )
    return _pages_table([page])


def fold_pages(resolved, *, salt: int = 1):
    """resolved Dataset → pages Dataset (PAGES_SCHEMA), one row per subject.

    ``salt=1``: single groupby(subj). ``salt=K>1``: two-phase salted
    fold for head-entity skew — shard key is ``seq % K`` so a hot
    subject's rows spread over K reducers before the tiny final merge.
    """
    if salt <= 1:
        return resolved.groupby("subj").map_groups(_fold_group, batch_format="pandas")

    def add_salt(batch: pa.Table) -> pa.Table:
        import numpy as np

        shard = (batch["seq"].to_numpy() % salt).astype(np.int32)
        return batch.append_column("shard", pa.array(shard, pa.int32()))

    salted = resolved.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby(["subj", "shard"]).map_groups(
        _fold_partial, batch_format="pandas"
    )
    return partials.groupby("subj").map_groups(_merge_partials, batch_format="pandas")
