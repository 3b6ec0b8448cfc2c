"""Sidecar build — the distributed dictionary replacing the
reference's whole-dataset resource index.

The reference materializes EVERY subject's full aggregate into one
heap map (/root/reference/components/residxcreator.go:18-23) and does
random-access lookups during conversion
(triplestowikipageconv.go:106,202,279). Those lookups only ever read:

1. title-deciding property values (findTitleInTriples, :267-276),
2. ``rdf:type`` objects for type classification (:177-195),
3. ``rdf:type``/``rdfs:subClassOf`` edges for the super-category walk
   (:278-292).

So the sidecar keeps exactly ``{uri, title, uri_type, depth}`` for the
subjects that carry any of those triples — a tiny filtered projection
of the dataset (∝ titled/typed entities, not facts). Small side →
broadcast with ``ray.put``; see ``stages/resolve.py`` for the lookup
consumers and the partitioned-join fallback.

Scale notes: the two groupbys here run over the *filtered* triples
(title + type predicates only), with per-batch partial reduction
before the shuffle. The class-graph depth walk runs on the driver over
the class-only subgraph (objects of type/subClassOf triples and their
edges), which is bounded by ontology size, not data size.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rdf2smw_ray.functions.wikititle import (
    CATEGORY_PREDICATES,
    CATEGORY_TYPES,
    PROPERTY_TYPES,
    TITLE_PROPERTIES,
    TYPE_PROPERTY_URI,
    clean_title_series,
    local_name_series,
)
from rdf2smw_ray.schemas import (
    SIDECAR_SCHEMA,
    URITYPE_CLASS,
    URITYPE_PREDICATE,
    URITYPE_UNDEFINED,
)

_LOOKUP_PREDS = list(TITLE_PROPERTIES) + list(CATEGORY_PREDICATES)
_TITLE_PRIORITY = {p: i for i, p in enumerate(TITLE_PROPERTIES)}
_TYPE_OBJ_TO_URITYPE = {
    **{p: URITYPE_PREDICATE for p in PROPERTY_TYPES},
    **{c: URITYPE_CLASS for c in CATEGORY_TYPES},
}

MAX_DEPTH = 64  # cycle guard — the reference would recurse forever on a cycle


def _filter_lookup_triples(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_in(batch["pred"], value_set=pa.array(_LOOKUP_PREDS)))


def _title_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: best (priority, seq) title candidate per subject."""
    df = batch.to_pandas()
    df = df[df["pred"].isin(_TITLE_PRIORITY)]
    if df.empty:
        return pa.table(
            {"subj": pa.array([], pa.string()), "prio": pa.array([], pa.int64()),
             "seq": pa.array([], pa.int64()), "raw_title": pa.array([], pa.string())}
        )
    df = df.assign(prio=df["pred"].map(_TITLE_PRIORITY))
    df = df.sort_values(["prio", "seq"], kind="mergesort").drop_duplicates("subj")
    return pa.Table.from_pandas(
        df[["subj", "prio", "seq"]].assign(raw_title=df["obj"]), preserve_index=False
    )


def _type_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: earliest classifying type triple per subject
    (determineType scans triples in order — triplestowikipageconv.go:177-195)."""
    df = batch.to_pandas()
    df = df[(df["pred"] == TYPE_PROPERTY_URI) & df["obj"].isin(_TYPE_OBJ_TO_URITYPE)]
    if df.empty:
        return pa.table(
            {"subj": pa.array([], pa.string()), "seq": pa.array([], pa.int64()),
             "uri_type": pa.array([], pa.int32())}
        )
    df = df.sort_values("seq", kind="mergesort").drop_duplicates("subj")
    return pa.table(
        {
            "subj": pa.array(df["subj"], pa.string()),
            "seq": pa.array(df["seq"], pa.int64()),
            "uri_type": pa.array(
                df["obj"].map(_TYPE_OBJ_TO_URITYPE).astype("int32"), pa.int32()
            ),
        }
    )


def _first_per_key(df: pd.DataFrame, order_cols: list[str]) -> pd.DataFrame:
    return df.sort_values(order_cols, kind="mergesort").drop_duplicates("subj")


def compute_depths(edges: pd.DataFrame, eval_uris: list[str]) -> dict[str, int]:
    """Super-category depth per URI (countSuperCategories,
    triplestowikipageconv.go:278-292): d(u) = max over u's
    type/subClassOf triples of d(obj)+1, else 0. Memoized, iterative,
    capped at MAX_DEPTH on cycles (the reference would stack-overflow)."""
    adj: dict[str, list[str]] = {}
    for s, o in zip(edges["subj"], edges["obj"]):
        adj.setdefault(s, []).append(o)
    memo: dict[str, int] = {}

    def depth(u: str) -> int:
        if u in memo:
            return memo[u]
        memo[u] = 0  # cycle guard: re-entrant lookups see 0
        objs = adj.get(u)
        if objs:
            d = max((depth(o) + 1) for o in objs)
            memo[u] = min(d, MAX_DEPTH)
        return memo[u]

    return {u: depth(u) for u in eval_uris}


def build_sidecar(triples) -> pa.Table:
    """Build the sidecar lookup table from a triples Dataset.

    Returns a driver-resident Arrow table (SIDECAR_SCHEMA). Distributed
    work: filter + per-batch partial reduce + two small groupbys; only
    the already-reduced per-subject rows reach the driver.
    """
    relevant = (
        triples.select_columns(["subj", "pred", "obj", "seq"])
        .map_batches(_filter_lookup_triples, batch_format="pyarrow")
        .materialize()  # tiny (metadata triples only); reused three times
    )

    # --- titles: best (priority, seq) per subject -------------------------
    title_partials = relevant.map_batches(_title_partial, batch_format="pyarrow")
    titles = title_partials.groupby("subj").map_groups(
        lambda df: _first_per_key(df, ["prio", "seq"]), batch_format="pandas"
    )
    titles_pdf = titles.to_pandas()

    # --- types: earliest classifying triple per subject -------------------
    type_partials = relevant.map_batches(_type_partial, batch_format="pyarrow")
    types = type_partials.groupby("subj").map_groups(
        lambda df: _first_per_key(df, ["seq"]), batch_format="pandas"
    )
    types_pdf = types.to_pandas()

    # --- depths: driver-side walk of the class-only subgraph -------------
    def _cat_edges(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["pred"], value_set=pa.array(list(CATEGORY_PREDICATES)))
        t = batch.filter(m)
        return t.select(["subj", "obj"])

    cat_edges = relevant.map_batches(_cat_edges, batch_format="pyarrow")
    uniq_objs = cat_edges.unique("obj") or []  # None on an empty dataset
    eval_uris = [u for u in uniq_objs if u is not None]
    eval_set = set(eval_uris)
    if eval_set:
        cls_edges = cat_edges.map_batches(
            lambda t: t.filter(
                pc.is_in(t["subj"], value_set=pa.array(sorted(eval_set)))
            ),
            batch_format="pyarrow",
        ).to_pandas()
    else:
        cls_edges = pd.DataFrame({"subj": [], "obj": []})
    depths = compute_depths(cls_edges, eval_uris)

    # --- assemble ---------------------------------------------------------
    uris: dict[str, dict] = {}
    for r in titles_pdf.itertuples():
        uris.setdefault(r.subj, {})["raw_title"] = r.raw_title
    for r in types_pdf.itertuples():
        uris.setdefault(r.subj, {})["uri_type"] = int(r.uri_type)
    for u, d in depths.items():
        if d > 0:
            uris.setdefault(u, {})["depth"] = d

    keys = sorted(uris)
    raw = pd.Series([uris[k].get("raw_title", "") for k in keys], dtype=object)
    # empty title value falls back to the local name, exactly like a
    # missing one (triplestowikipageconv.go:215-221)
    fallback = raw.eq("") | raw.isna()
    raw = raw.where(~fallback, local_name_series(pd.Series(keys, dtype=object)))
    final_titles = clean_title_series(raw.astype(str)) if keys else pd.Series([], dtype=object)

    return pa.Table.from_pydict(
        {
            "uri": pa.array(keys, pa.string()),
            "title": pa.array(list(final_titles), pa.string()),
            "uri_type": pa.array(
                [uris[k].get("uri_type", URITYPE_UNDEFINED) for k in keys], pa.int32()
            ),
            "depth": pa.array([uris[k].get("depth", 0) for k in keys], pa.int32()),
        },
        schema=SIDECAR_SCHEMA,
    )


def sidecar_lookup(sidecar: pa.Table) -> dict[str, dict]:
    """Three plain dicts for fast ``Series.map`` lookups inside actors."""
    uris = sidecar["uri"].to_pylist()
    return {
        "title": dict(zip(uris, sidecar["title"].to_pylist())),
        "uri_type": dict(zip(uris, sidecar["uri_type"].to_pylist())),
        "depth": dict(zip(uris, sidecar["depth"].to_pylist())),
    }
