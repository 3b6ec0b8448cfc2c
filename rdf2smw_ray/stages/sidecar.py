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
of the dataset (∝ titled/typed entities, not facts).

Execution shape: ONE distributed pass over the triples
(``map_batches`` partial-reducing each batch to per-subject candidate
rows tagged by kind), then a driver-side final reduce — the partials
are already per-subject-per-batch, so what reaches the driver is
bounded by (titled/typed subjects × blocks), and the driver holds the
assembled sidecar anyway (it IS the broadcast payload). The class-only
depth walk (objects of type/subClassOf triples and their edges) is
bounded by ontology size, not data size. For sidecars too big for one
machine, resolve with the partitioned-join path
(stages/resolve.py::resolve_triples_join) instead of broadcast.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from rdf2smw_ray.util import table_from_pandas
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

_TITLE_PRIORITY = {p: i for i, p in enumerate(TITLE_PROPERTIES)}
_TYPE_OBJ_TO_URITYPE = {
    **{p: URITYPE_PREDICATE for p in PROPERTY_TYPES},
    **{c: URITYPE_CLASS for c in CATEGORY_TYPES},
}

MAX_DEPTH = 64  # cycle guard — the reference would recurse forever on a cycle

# partial-row kinds
_K_TITLE, _K_TYPE, _K_EDGE = 0, 1, 2

_PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.int8()),
        pa.field("subj", pa.string()),
        pa.field("obj", pa.string()),  # raw title / type obj / edge obj
        pa.field("prio", pa.int32()),  # title priority (titles only)
        pa.field("seq", pa.int64()),
    ]
)


_INTERESTING_PREDS = pa.array(
    sorted({*TITLE_PROPERTIES, TYPE_PROPERTY_URI, *CATEGORY_PREDICATES})
)


def _sidecar_partial(batch: pa.Table) -> pa.Table:
    """Single-pass per-batch partial: best title candidate + earliest
    classifying type triple per subject, plus distinct class edges.

    The Arrow-level predicate filter runs BEFORE the pandas
    conversion — only title/type/subclass rows (a fraction of the
    stream) ever pay the conversion."""
    batch = batch.filter(pc.is_in(batch["pred"], value_set=_INTERESTING_PREDS))
    if batch.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    df = batch.to_pandas()
    parts = []

    titles = df[df["pred"].isin(_TITLE_PRIORITY)]
    if len(titles):
        t = titles.assign(prio=titles["pred"].map(_TITLE_PRIORITY).astype("int32"))
        t = t.sort_values(["prio", "seq"], kind="mergesort").drop_duplicates("subj")
        parts.append(
            pd.DataFrame(
                {"kind": _K_TITLE, "subj": t["subj"], "obj": t["obj"], "prio": t["prio"], "seq": t["seq"]}
            )
        )

    types = df[
        (df["pred"] == TYPE_PROPERTY_URI) & df["obj"].isin(_TYPE_OBJ_TO_URITYPE)
    ]
    if len(types):
        ty = types.sort_values("seq", kind="mergesort").drop_duplicates("subj")
        parts.append(
            pd.DataFrame(
                {"kind": _K_TYPE, "subj": ty["subj"], "obj": ty["obj"], "prio": 0, "seq": ty["seq"]}
            )
        )

    edges = df[df["pred"].isin(CATEGORY_PREDICATES)]
    if len(edges):
        e = edges.drop_duplicates(["subj", "obj"])
        parts.append(
            pd.DataFrame(
                {"kind": _K_EDGE, "subj": e["subj"], "obj": e["obj"], "prio": 0, "seq": e["seq"]}
            )
        )

    if not parts:
        return _PARTIAL_SCHEMA.empty_table()
    out = pd.concat(parts, ignore_index=True)
    out["kind"] = out["kind"].astype("int8")
    out["prio"] = out["prio"].astype("int32")
    return table_from_pandas(out, preserve_index=False).cast(_PARTIAL_SCHEMA)


def compute_depths(edges: pd.DataFrame, eval_uris: list[str]) -> dict[str, int]:
    """Super-category depth per URI (countSuperCategories,
    triplestowikipageconv.go:278-292): d(u) = max over u's
    type/subClassOf triples of d(obj)+1, else 0. Memoized, capped at
    MAX_DEPTH on cycles (the reference would stack-overflow)."""
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
    """Build the sidecar lookup table from a triples Dataset in one
    distributed pass + a driver-side reduce. Returns a driver-resident
    Arrow table (SIDECAR_SCHEMA)."""
    partials = (
        triples.select_columns(["subj", "pred", "obj", "seq"])
        .map_batches(_sidecar_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if partials.empty:
        return SIDECAR_SCHEMA.empty_table()

    titles = partials[partials["kind"] == _K_TITLE]
    titles = titles.sort_values(["prio", "seq"], kind="mergesort").drop_duplicates("subj")

    types = partials[partials["kind"] == _K_TYPE]
    types = types.sort_values("seq", kind="mergesort").drop_duplicates("subj")
    types = types.assign(uri_type=types["obj"].map(_TYPE_OBJ_TO_URITYPE).astype("int32"))

    edges = partials[partials["kind"] == _K_EDGE].drop_duplicates(["subj", "obj"])
    eval_uris = sorted(set(edges["obj"]))
    eval_set = set(eval_uris)
    cls_edges = edges[edges["subj"].isin(eval_set)]
    depths = compute_depths(cls_edges, eval_uris)

    uris: dict[str, dict] = {}
    for r in titles.itertuples():
        uris.setdefault(r.subj, {})["raw_title"] = r.obj
    for r in types.itertuples():
        uris.setdefault(r.subj, {})["uri_type"] = int(r.uri_type)
    for u, d in depths.items():
        if d > 0:
            uris.setdefault(u, {})["depth"] = d

    keys = sorted(uris)
    if not keys:
        return SIDECAR_SCHEMA.empty_table()
    raw = pd.Series([uris[k].get("raw_title", "") for k in keys], dtype=object)
    # empty title value falls back to the local name, exactly like a
    # missing one (triplestowikipageconv.go:215-221)
    fallback = raw.eq("") | raw.isna()
    raw = raw.where(~fallback, local_name_series(pd.Series(keys, dtype=object)))
    final_titles = clean_title_series(raw.astype(str))

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


def build_sidecar_ds(triples, *, merge_buckets: int | None = None):
    """Fully distributed sidecar build → sidecar Dataset (SIDECAR_SCHEMA).

    For corpora whose titled/typed-entity count is too large for the
    driver-reduced :func:`build_sidecar` (the broadcast path): the same
    single-pass partials are shuffled on ``hash(subj) % merge_buckets``
    and reduced per bucket with vectorized first-per-key logic. Only
    the class-graph depth walk still runs on the driver — bounded by
    ontology size (distinct objects of type/subClassOf triples), not
    entity count. Pair with
    ``stages/resolve.py::resolve_triples_join``.
    """
    import ray
    import ray.data as rd

    if merge_buckets is None:
        from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

        # the sidecar carries only titled/typed entities — far smaller
        # than the triple stream — so target finer buckets
        merge_buckets = auto_buckets(
            dataset_est_bytes(triples) // 4, target_bucket_bytes=16 << 20
        )

    partials = triples.select_columns(["subj", "pred", "obj", "seq"]).map_batches(
        _sidecar_partial, batch_format="pyarrow"
    ).materialize()

    # --- driver: class-graph depths (ontology-bounded) -------------------
    edge_rows = partials.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], _K_EDGE)).select(["subj", "obj"]),
        batch_format="pyarrow",
    ).to_pandas()
    if len(edge_rows):
        edge_rows = edge_rows.drop_duplicates(["subj", "obj"])
        eval_uris = sorted(set(edge_rows["obj"]))
        depths = {
            u: d
            for u, d in compute_depths(
                edge_rows[edge_rows["subj"].isin(set(eval_uris))], eval_uris
            ).items()
            if d > 0
        }
    else:
        depths = {}
    depth_ref = ray.put(depths)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(batch["subj"].to_pylist()), index=False
        ).to_numpy()
        return batch.append_column(
            "bucket",
            pa.array((h % merge_buckets).astype("int32"), pa.int32()),
        )

    def merge_bucket(df: pd.DataFrame) -> pa.Table:
        dmap = ray.get(depth_ref)
        titles = df[df["kind"] == _K_TITLE]
        titles = titles.sort_values(["prio", "seq"], kind="mergesort").drop_duplicates(
            "subj"
        )
        types = df[df["kind"] == _K_TYPE]
        types = types.sort_values("seq", kind="mergesort").drop_duplicates("subj")
        type_map = dict(
            zip(types["subj"], types["obj"].map(_TYPE_OBJ_TO_URITYPE).astype(int))
        )
        title_map = dict(zip(titles["subj"], titles["obj"]))
        keys = sorted(
            set(titles["subj"]) | set(types["subj"]) | (set(df["subj"]) & set(dmap))
        )
        if not keys:
            return SIDECAR_SCHEMA.empty_table()
        raw = pd.Series([title_map.get(k, "") for k in keys], dtype=object)
        fb = raw.eq("") | raw.isna()
        raw = raw.where(~fb, local_name_series(pd.Series(keys, dtype=object)))
        final = clean_title_series(raw.astype(str))
        return pa.Table.from_pydict(
            {
                "uri": pa.array(keys, pa.string()),
                "title": pa.array(list(final), pa.string()),
                "uri_type": pa.array(
                    [type_map.get(k, URITYPE_UNDEFINED) for k in keys], pa.int32()
                ),
                "depth": pa.array([dmap.get(k, 0) for k in keys], pa.int32()),
            },
            schema=SIDECAR_SCHEMA,
        )

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def sidecar_lookup(sidecar: pa.Table) -> dict[str, dict]:
    """Three plain dicts for fast ``Series.map`` lookups inside workers."""
    uris = sidecar["uri"].to_pylist()
    return {
        "title": dict(zip(uris, sidecar["title"].to_pylist())),
        "uri_type": dict(zip(uris, sidecar["uri_type"].to_pylist())),
        "depth": dict(zip(uris, sidecar["depth"].to_pylist())),
    }
