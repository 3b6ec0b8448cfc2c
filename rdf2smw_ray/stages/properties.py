"""Property-page aggregation.

The reference accumulates property pages in operator-local state
(``predPageIndex``, /root/reference/components/triplestowikipageconv.go:81,96-132,152-175)
and flushes them at end-of-stream. That breaks determinism, resume and
parallelism, so here it is a real keyed aggregation:

- every predicate occurrence contributes its observed object kind
  ("Has type": IRI → Page, string/langString → Text, integer/float →
  Number — :110,123-132), partial-reduced per batch before the (tiny)
  groupby on the predicate title;
- a predicate whose URI is itself a subject typed as an owl property
  gets its own page's facts/categories merged in (:154-166), with the
  "Has type" facts first (the reference's ordering is
  map-iteration-nondeterministic; the fact SET is identical).

The final assembly happens on the driver over the already-aggregated
per-predicate rows: |property pages| = |distinct predicates| — schema
vocabulary, not data volume — small even at web scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from rdf2smw_ray.schemas import PAGES_SCHEMA, URITYPE_PREDICATE


def _kind_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: min seq per (pred_title, has_type) incl. the
    has_type="" row that guarantees the property page exists at all
    (predPageIndex entry is created for EVERY predicate — :98-100).
    Pure-Arrow group_by: no pandas conversion on this full-stream
    scan."""
    g = batch.group_by(["pred_title", "property", "has_type"]).aggregate(
        [("seq", "min")]
    )
    # select/rename BY NAME: the key-columns-first ordering of
    # group_by().aggregate() output is a pyarrow-version behavior
    # (ADVICE round 2 — positional rename mislabels on a pyarrow bump)
    return pa.table(
        {
            "pred_title": g["pred_title"],
            "property": g["property"],
            "has_type": g["has_type"],
            "seq": g["seq_min"],
        }
    )


def build_property_pages(resolved, pages) -> pa.Table:
    """resolved + folded pages → property-page table (PAGES_SCHEMA).

    Returns a driver-resident Arrow table (small: one row per distinct
    predicate title ∪ predicate-typed subject).
    """
    kinds = (
        resolved.select_columns(["pred_title", "property", "has_type", "seq"])
        .map_batches(_kind_partial, batch_format="pyarrow")
        .groupby(["pred_title", "property", "has_type"])
        .min("seq")
        .to_pandas()
    )
    seq_col = "min(seq)" if "min(seq)" in kinds.columns else "seq"
    if "pred_title" not in kinds.columns:  # empty input
        kinds = pd.DataFrame(
            {"pred_title": [], "property": [], "has_type": [], seq_col: []}
        )

    def _only_pred_pages(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch["page_type"], URITYPE_PREDICATE))

    pred_subject_pages = pages.map_batches(
        _only_pred_pages, batch_format="pyarrow"
    ).to_pandas()
    subject_by_title = {r["title"]: r for _, r in pred_subject_pages.iterrows()}

    # assemble per predicate title, ordered by first appearance (min seq)
    out: list[dict] = []
    min_seq_by_title = kinds.groupby("pred_title")[seq_col].min().to_dict()
    titles = sorted(
        set(kinds["pred_title"]).union(subject_by_title),
        key=lambda t: (min_seq_by_title.get(t, 1 << 62), t),
    )
    kinds_by_title: dict[str, pd.DataFrame] = {
        t: g.sort_values(seq_col) for t, g in kinds.groupby("pred_title", sort=False)
    }
    for title in titles:
        g = kinds_by_title.get(title)
        facts: list[tuple[str, str]] = []
        prop_name = title[len("Property:"):] if title.startswith("Property:") else title
        if g is not None:
            prop_name = g["property"].iloc[0]
            for _, r in g.iterrows():
                if r["has_type"] and ("Has type", r["has_type"]) not in facts:
                    facts.append(("Has type", r["has_type"]))
        cats: list[str] = []
        specific = ""
        subj = ""
        sp = subject_by_title.get(title)
        if sp is not None:
            for f in sp["facts"]:
                k = (f["property"], f["value"])
                if k not in facts:
                    facts.append(k)
            cats = list(sp["categories"])
            specific = sp["specific_category"]
            subj = sp["subj"]
        out.append(
            {
                "title": title,
                "page_type": URITYPE_PREDICATE,
                "facts": [{"property": p, "value": v} for p, v in facts],
                "categories": cats,
                "specific_category": specific,
                "subj": subj,
            }
        )
    if not out:
        return PAGES_SCHEMA.empty_table()
    return pa.Table.from_pydict(
        {k: [p[k] for p in out] for k in PAGES_SCHEMA.names}, schema=PAGES_SCHEMA
    )
