"""The rdf2smw back half: triples Dataset → rendered wiki pages.

Ray-Data restatement of the reference dataflow
(/root/reference/main.go:114-150):

    triples ─→ sidecar build (filtered groupby, broadcast)   [ops 5-7]
            ─→ TripleResolver actor pool (entity linking)     [op 9 per-triple]
            ─→ salted groupby(subj) page fold                 [ops 4+9 fold]
            ─→ {content pages, property pages, template pages}[ops 9/11 state → aggregations]
            ─→ render (wikitext + XML, injected clock)        [op 11]

Stage boundaries that the reference held as operator-local state
(predPageIndex, tplPropertyIdx) are real keyed aggregations here, so
every stage is retryable and the pipeline is resumable (see
state/checkpoint.py for the manifest-writing variant).

Scale notes: ``materialize`` pins the resolved stream + folded pages
in the object store so the three downstream consumers don't recompute
the resolve; at very large scale run the checkpointed variant instead,
which persists those boundaries as partitioned Parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from rdf2smw_ray.schemas import URITYPE_PREDICATE
from rdf2smw_ray.stages.fold import fold_pages
from rdf2smw_ray.stages.properties import build_property_pages
from rdf2smw_ray.stages.render import (
    DEFAULT_TIMESTAMP,
    build_template_pages,
    render_pages,
)
from rdf2smw_ray.stages.resolve import resolve_triples
from rdf2smw_ray.stages.sidecar import build_sidecar


def rdf2smw_pipeline(
    triples,
    *,
    use_templates: bool = True,
    timestamp: str = DEFAULT_TIMESTAMP,
    salt: int = 1,
    resolver_concurrency: int | tuple[int, int] = 4,
    materialize: bool = True,
    canonicalize: bool = False,
):
    """Run the full back half. Returns a dict of Datasets:

    - ``pages``: all folded page records (PAGES_SCHEMA)
    - ``content``: rendered non-property pages (RENDERED_SCHEMA)
    - ``properties``: rendered property pages
    - ``templates``: rendered template pages (empty unless
      ``use_templates``)
    plus the driver-resident ``sidecar`` Arrow table.
    """
    import ray.data as rd

    if canonicalize:
        # EXTENSION (off by default — the reference treats owl:sameAs
        # as an ordinary predicate): merge co-referent URIs first.
        from rdf2smw_ray.stages.sameas import canonicalize_sameas

        triples, _ = canonicalize_sameas(triples)

    sidecar = build_sidecar(triples)
    resolved = resolve_triples(triples, sidecar, concurrency=resolver_concurrency)
    if materialize:
        resolved = resolved.materialize()

    pages = fold_pages(resolved, salt=salt)
    if materialize:
        pages = pages.materialize()

    content = pages.map_batches(
        lambda t: t.filter(pc.not_equal(t["page_type"], URITYPE_PREDICATE)),
        batch_format="pyarrow",
    )
    property_pages = rd.from_arrow(build_property_pages(resolved, pages))

    rendered_content = render_pages(
        content, use_templates=use_templates, timestamp=timestamp
    )
    rendered_properties = render_pages(
        property_pages, use_templates=use_templates, timestamp=timestamp
    )

    if use_templates:
        templates = build_template_pages(
            [content, property_pages], timestamp=timestamp
        )
    else:
        from rdf2smw_ray.schemas import RENDERED_SCHEMA

        templates = rd.from_arrow(RENDERED_SCHEMA.empty_table())

    return {
        "sidecar": sidecar,
        "pages": pages,
        "content": rendered_content,
        "properties": rendered_properties,
        "templates": templates,
    }


def fact_triples(pages) -> "pa.Table":
    """Explode page records into the emitted (title, property, value)
    fact set (+ (title, 'Category', cat) rows) — the P/R comparison
    surface against the reference semantics."""

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t, p, v = [], [], []
        for title, facts, cats in zip(df["title"], df["facts"], df["categories"]):
            for f in facts:
                t.append(title)
                p.append(f["property"])
                v.append(f["value"])
            for c in cats:
                t.append(title)
                p.append("Category")
                v.append(c)
        return pa.table(
            {
                "title": pa.array(t, pa.string()),
                "property": pa.array(p, pa.string()),
                "value": pa.array(v, pa.string()),
            }
        )

    return pages.map_batches(explode, batch_format="pyarrow")
