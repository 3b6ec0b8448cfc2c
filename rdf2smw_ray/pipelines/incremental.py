"""Incremental KG update: fold + render ONLY the pages a delta can
touch, instead of recomputing the corpus.

At 100 TB the recurring cost of KG construction is not the first build
but the daily delta: a new crawl slice adds facts to a sliver of
subjects, yet a naive rerun re-resolves, re-folds and re-renders every
page. This operator computes the exact affected set and runs the back
half on that subset only:

1. the new sidecar is built over base ∪ delta (one streaming pass —
   the sidecar is the one structure whose entries can change the
   rendering of pages whose own facts did not change);
2. ``changed`` = URIs whose sidecar row (title, uri_type, depth)
   differs from the previous run's sidecar — a retitled entity changes
   the VALUE text on every page that references it, a re-typed
   predicate changes fact routing, a depth change moves
   SpecificCategory;
3. affected subjects = subjects of delta triples ∪ subjects of base
   triples that mention a changed URI as subj/pred/obj (broadcast set
   membership inside ``map_batches`` — ``changed`` is
   schema/label-proportional, the same driver-bounded order as the
   sidecar itself, never data-proportional);
4. base ∪ delta is semi-joined on the affected subjects (bucketed
   co-shuffle) and only those triples pay resolve → fold → render.

Exactness contract (pinned by tests/test_incremental.py): the updated
pages are byte-identical to a full recompute's pages for the same
subjects, and every page the full recompute renders differently from
the base run IS in the affected set. Property/template pages are
schema-proportional global aggregates — recompute them from the union
on their own cadence (they are cheap); this operator targets content
pages, which are corpus-proportional.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from rdf2smw_ray.schemas import URITYPE_PREDICATE
from rdf2smw_ray.stages.fold import fold_pages
from rdf2smw_ray.stages.render import DEFAULT_TIMESTAMP, render_pages
from rdf2smw_ray.stages.resolve import resolve_triples
from rdf2smw_ray.stages.sidecar import build_sidecar


def sidecar_changes(prev: pa.Table, new: pa.Table) -> set[str]:
    """URIs whose (title, uri_type, depth) row differs between two
    sidecar tables (including URIs present in only one)."""

    def as_map(t: pa.Table) -> dict:
        return {
            u: (ti, ty, d)
            for u, ti, ty, d in zip(
                t["uri"].to_pylist(),
                t["title"].to_pylist(),
                t["uri_type"].to_pylist(),
                t["depth"].to_pylist(),
            )
        }

    pm, nm = as_map(prev), as_map(new)
    return {u for u in pm.keys() | nm.keys() if pm.get(u) != nm.get(u)}


def incremental_update(
    base_triples,
    delta_triples,
    prev_sidecar: pa.Table,
    *,
    use_templates: bool = True,
    timestamp: str = DEFAULT_TIMESTAMP,
    salt: int = 1,
    resolver_concurrency: int | tuple[int, int] = 4,
    num_buckets: int | None = None,
):
    """Returns a dict:

    - ``content``: rendered content pages for every affected subject
      (upsert these over the previous run's page store; a retitled
      subject's old title is superseded — see ``retracted_titles``)
    - ``sidecar``: the new sidecar (persist it for the next delta)
    - ``changed_uris``: the sidecar-diff set (diagnostics)
    - ``retracted_titles``: previous titles of changed URIs whose
      title moved — delete these from the page store on upsert
    """
    import ray

    from rdf2smw_ray.stages.join import bucketed_join

    union = base_triples.union(delta_triples)
    sidecar = build_sidecar(union)
    changed = sidecar_changes(prev_sidecar, sidecar)
    changed_ref = ray.put(changed)

    def base_affected(batch: pa.Table) -> pa.Table:
        ch = ray.get(changed_ref)
        df = batch.to_pandas()
        m = df["subj"].isin(ch) | df["pred"].isin(ch) | df["obj"].isin(ch)
        return pa.table({"subj": pa.array(df.loc[m, "subj"].unique(), pa.string())})

    def delta_subjects(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table({"subj": pa.array(df["subj"].unique(), pa.string())})

    affected = base_triples.map_batches(
        base_affected, batch_format="pyarrow"
    ).union(delta_triples.map_batches(delta_subjects, batch_format="pyarrow"))

    refold = bucketed_join(
        union, affected, key="subj", how="semi", num_buckets=num_buckets
    )

    resolved = resolve_triples(refold, sidecar, concurrency=resolver_concurrency)
    pages = fold_pages(resolved, salt=salt)
    content = pages.map_batches(
        lambda t: t.filter(pc.not_equal(t["page_type"], URITYPE_PREDICATE)),
        batch_format="pyarrow",
    )
    rendered = render_pages(content, use_templates=use_templates, timestamp=timestamp)

    new_titles = dict(
        zip(sidecar["uri"].to_pylist(), sidecar["title"].to_pylist())
    )
    prev_titles = dict(
        zip(prev_sidecar["uri"].to_pylist(), prev_sidecar["title"].to_pylist())
    )
    retracted = sorted(
        prev_titles[u]
        for u in changed
        if u in prev_titles and prev_titles[u] != new_titles.get(u)
    )

    return {
        "content": rendered,
        "sidecar": sidecar,
        "changed_uris": changed,
        "retracted_titles": retracted,
    }
