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
