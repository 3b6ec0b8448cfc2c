"""rdf2smw_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference tool (rdfio/rdf2smw, a
single-process Go RDF→Semantic-MediaWiki converter — see
/root/reference/main.go:38-151) as streaming ``ray.data.Dataset``
pipelines, generalized to web-scale inputs: Parquet web pages →
text extraction → triple extraction → entity linking / URI-to-title
canonicalization → groupby(subject) page fold → rendered fact pages +
canonical triple table.

Layout
------
- ``schemas``    Arrow schemas for every logical table.
- ``functions``  pure vectorizable kernels (title cleanup, escaping,
                 text stats, hashing) — no Ray, no I/O.
- ``sources``    readers/generators (N-Triples, synthetic web pages).
- ``stages``     map_batches / groupby building blocks (extract,
                 resolve, fold, render, property/template pages).
- ``pipelines``  end-to-end compositions (rdf2smw back half, full KG
                 pipeline, dedup / ANN / text-stats operators).
- ``state``      broadcast sidecar handling + checkpoint manifests.
- ``oracle``     independent pure-Python restatement of the reference
                 semantics, used only by tests as the P/R oracle.

Nothing in this package calls ``ray.init()``/``ray.shutdown()``; the
caller (driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"


def _install_benign_schema_warning_filter() -> None:
    """Suppress ONE known-benign Ray Data warning variant.

    Ray 2.49's sort / aggregate operators emit zero-column empty blocks
    for empty range partitions; the streaming executor then logs
    "Operator produced a RefBundle with a different schema ... new
    schema: ." once per operator. The bundle is 0 rows and carries no
    data — the divergence is Ray-internal and unobservable in results.
    Only that exact variant (empty NEW schema) is filtered; a real
    schema divergence (non-empty differing schema) still logs.

    Opt out with GRAFT_KEEP_SCHEMA_WARNINGS=1.
    """
    import logging
    import os

    if os.environ.get("GRAFT_KEEP_SCHEMA_WARNINGS"):
        return

    class _EmptySchemaBundleFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg
                and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaBundleFilter())


_install_benign_schema_warning_filter()
