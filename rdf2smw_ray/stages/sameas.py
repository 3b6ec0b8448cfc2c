"""owl:sameAs canonicalization — merge co-referent URIs before the
page fold.

An extension beyond the reference (which has no co-reference
handling): ``owl:sameAs`` statements are collected (a tiny filtered
subset, like the sidecar), resolved to canonical representatives with
a driver-side union-find (the alias graph is bounded by
explicitly-asserted equivalences, not corpus size), and the canonical
map is broadcast so one vectorized ``map_batches`` pass rewrites
``subj``/IRI-``obj``. The sameAs statements themselves are dropped
(they are fully absorbed by the rewrite).

Canonical representative: the lexicographically smallest URI of each
equivalence class — deterministic at any parallelism.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from rdf2smw_ray.util import table_from_pandas
import pyarrow.compute as pc

from rdf2smw_ray.schemas import OBJ_IRI

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _union_find(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # canonical = lexicographic min of each class
    classes: dict[str, list[str]] = {}
    for x in list(parent):
        classes.setdefault(find(x), []).append(x)
    out = {}
    for members in classes.values():
        canon = min(members)
        for m in members:
            if m != canon:
                out[m] = canon
    return out


def canonicalize_sameas(triples):
    """triples Dataset → (rewritten Dataset, canonical_map dict).

    Triples with pred owl:sameAs are consumed; all other rows have
    subj / IRI obj rewritten to class representatives.
    """
    import ray

    edge_rows = (
        triples.map_batches(
            lambda t: t.filter(pc.equal(t["pred"], OWL_SAMEAS)).select(
                ["subj", "obj", "obj_kind"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if edge_rows.empty:
        return triples, {}
    edges = [
        (s, o)
        for s, o, k in zip(edge_rows["subj"], edge_rows["obj"], edge_rows["obj_kind"])
        if k == OBJ_IRI
    ]
    canon = _union_find(edges)
    if not canon:
        return triples, {}
    ref = ray.put(canon)

    def rewrite(batch: pa.Table) -> pa.Table:
        cmap = ray.get(ref)
        t = batch.filter(pc.not_equal(batch["pred"], OWL_SAMEAS))
        df = t.to_pandas()
        df["subj"] = df["subj"].map(lambda u: cmap.get(u, u))
        is_iri = df["obj_kind"] == OBJ_IRI
        df.loc[is_iri, "obj"] = df.loc[is_iri, "obj"].map(lambda u: cmap.get(u, u))
        return table_from_pandas(df, preserve_index=False).cast(t.schema)

    return triples.map_batches(rewrite, batch_format="pyarrow"), canon
