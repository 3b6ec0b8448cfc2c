"""The full KG-construction pipeline (the flagship / north-star DAG):

    read_parquet(web_pages)
      → extract_text (actor pool, html dropped immediately)
      → extract_triples (actor pool, pattern rules)      [canonical table #1]
      → rdf2smw back half (sidecar → resolve → fold → render)
                                                          [pages + property/template]

All stages stream; nothing materializes the full input. The only
driver-resident artifacts are the sidecar (∝ titled/typed entities)
and the property/template page sets (∝ schema vocabulary).
"""

from __future__ import annotations

from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
from rdf2smw_ray.sources.webpages import synth_web_pages
from rdf2smw_ray.stages.extract_text import extract_text
from rdf2smw_ray.stages.extract_triples import extract_triples


def kg_pipeline(
    web_pages,
    *,
    use_templates: bool = True,
    salt: int = 1,
    concurrency: int | tuple[int, int] = 4,
    materialize: bool = True,
):
    """web_pages Dataset → dict of output Datasets (see
    rdf2smw_pipeline) plus the canonical ``triples`` Dataset."""
    # Extract stages run as stateless tasks (compiled state cached per
    # warm worker process); swap to actor pools via the stage wrappers
    # when the extractors carry heavy state (models).
    pages_text = extract_text(web_pages)
    triples = extract_triples(pages_text)
    if materialize:
        triples = triples.materialize()
    out = rdf2smw_pipeline(
        triples,
        use_templates=use_templates,
        salt=salt,
        resolver_concurrency=concurrency,
        materialize=materialize,
    )
    out["triples"] = triples
    return out


def flagship(sf_dir: str, *, concurrency: int | tuple[int, int] = 4, salt: int = 1):
    """documents.parquet at ``sf_dir`` → synthetic web pages → full KG
    pipeline. Returns the pipeline output dict."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    web_pages = synth_web_pages(docs)
    return kg_pipeline(web_pages, concurrency=concurrency, salt=salt)
