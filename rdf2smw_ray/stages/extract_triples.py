"""Triple extraction — text → (subj, pred, obj) statements.

Two extractors, both actor-pool ``map_batches`` stages with patterns /
gazetteers prepared once per actor (``__init__``), vectorized across
each batch, flat-map shaped (1 page → N triple rows, TRIPLES_SCHEMA):

- ``PatternTripleExtractor``: SVO pattern rules over sentences (the
  information-extraction front half generalizing the reference's file
  parser — ttlfilereader.go is "file → triples", this is "page →
  triples"). Pattern order matters ("is a subtype of" before "is a").
  Classes observed in type positions additionally emit
  ``rdf:type owl:Class`` statements (ontology induction) so the back
  half classifies them as Category pages exactly like reference data
  that declares its classes.

- ``GazetteerMentionExtractor``: dictionary-based mention detection —
  a broadcast term list matched per batch, emitting
  ``(doc_uri, kg:mentions, term_uri)`` rows. The gazetteer is shipped
  once via ``ray.put`` and read in ``__init__``.

Ordering: ``seq = (hash64(url) & 2^40-1) << 20 | statement_index`` —
deterministic at any parallelism. Cross-page order is arbitrary (the
reference's page order is map-iteration-nondeterministic anyway);
within-page statement order is preserved, which is what the
first-wins/dedup semantics observe.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from rdf2smw_ray.schemas import OBJ_IRI, OBJ_LITERAL, TRIPLES_SCHEMA

KG = "http://kg.example.org/"
ENTITY_NS = KG + "entity/"
CLASS_NS = KG + "class/"
PROP_NS = KG + "prop/"
DOC_NS = KG + "doc/"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

MENTIONS_PRED = PROP_NS + "mentions"

# Default gazetteer for the testdata word-salad corpus
DEFAULT_GAZETTEER = (
    "spark", "stream", "window", "filter", "customer", "query",
    "table", "join", "merge", "sort",
)


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash (blake2b; Python's hash() is salted)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def url_seq_base(url: str) -> int:
    return (stable_hash64(url) & ((1 << 40) - 1)) << 20


class PatternTripleExtractor:
    """SVO pattern rules → triples. One page's statements share a
    url-derived seq base; rule hits are emitted in sentence order."""

    def __init__(self):
        # (compiled pattern, handler) — ORDER MATTERS
        self.rules = [
            (
                re.compile(r"(\w+) is a subtype of (\w+)\."),
                self._subclass,
            ),
            (
                re.compile(r'(\w+) is known as "([^"]+)"\.'),
                self._label,
            ),
            (
                re.compile(r"(\w+) is a (\w+)\."),
                self._type,
            ),
            (
                re.compile(r"(\w+) works with (\w+)\."),
                self._rel("works_with"),
            ),
            (
                re.compile(r"(\w+) refers to (\w+)\."),
                self._rel("refers_to"),
            ),
            (
                re.compile(r"(\w+) has size (\d+)\."),
                self._size,
            ),
        ]

    # handlers return (subj, pred, obj, obj_kind, obj_datatype) tuples
    @staticmethod
    def _subclass(m):
        return [
            (CLASS_NS + m.group(1), RDFS_SUBCLASS, CLASS_NS + m.group(2), OBJ_IRI, ""),
            (CLASS_NS + m.group(1), RDF_TYPE, OWL_CLASS, OBJ_IRI, ""),
            (CLASS_NS + m.group(2), RDF_TYPE, OWL_CLASS, OBJ_IRI, ""),
        ]

    @staticmethod
    def _label(m):
        name = m.group(1)
        ns = CLASS_NS if name.startswith("Class_") else ENTITY_NS
        return [(ns + name, RDFS_LABEL, m.group(2), OBJ_LITERAL, XSD_STRING)]

    @staticmethod
    def _type(m):
        return [
            (ENTITY_NS + m.group(1), RDF_TYPE, CLASS_NS + m.group(2), OBJ_IRI, ""),
            (CLASS_NS + m.group(2), RDF_TYPE, OWL_CLASS, OBJ_IRI, ""),
        ]

    @staticmethod
    def _rel(prop):
        def handler(m):
            return [
                (
                    ENTITY_NS + m.group(1),
                    PROP_NS + prop,
                    ENTITY_NS + m.group(2),
                    OBJ_IRI,
                    "",
                )
            ]

        return handler

    @staticmethod
    def _size(m):
        return [
            (ENTITY_NS + m.group(1), PROP_NS + "has_size", m.group(2), OBJ_LITERAL, XSD_INT)
        ]

    def extract_page(self, url: str, text: str) -> list[tuple]:
        """All statements of one page, in sentence order."""
        out = []
        base = url_seq_base(url)
        idx = 0
        for line in text.split("\n"):
            line = line.strip()
            if not line:
                continue
            for rx, handler in self.rules:
                m = rx.match(line)
                if m is not None:
                    for s, p, o, kind, dt in handler(m):
                        out.append((s, p, o, kind, dt, base + idx, url))
                        idx += 1
                    break
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            rows.extend(self.extract_page(url, text or ""))
        if not rows:
            return TRIPLES_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {
                "subj": [r[0] for r in rows],
                "pred": [r[1] for r in rows],
                "obj": [r[2] for r in rows],
                "obj_is_iri": [r[3] == OBJ_IRI for r in rows],
                "obj_kind": [r[3] for r in rows],
                "obj_datatype": [r[4] for r in rows],
                "obj_lang": ["" for _ in rows],
                "seq": [r[5] for r in rows],
                "src": [r[6] for r in rows],
            },
            schema=TRIPLES_SCHEMA,
        )


class GazetteerMentionExtractor:
    """Dictionary-based mention detection over a text column.

    ``gazetteer_ref``: ray.ObjectRef of a list of terms (broadcast
    once), or pass ``terms`` directly for tests. Emits one row per
    mention occurrence: (doc_uri, kg:mentions, term) — term kept as a
    literal so SQL oracles can compare directly.
    """

    def __init__(self, gazetteer_ref=None, terms=None, id_column="doc_id", text_column="text"):
        if terms is None:
            import ray

            terms = ray.get(gazetteer_ref)
        self.terms = list(terms)
        self.pattern = re.compile(r"\b(" + "|".join(map(re.escape, self.terms)) + r")\b")
        self.id_column = id_column
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        texts = batch[self.text_column].to_pylist()
        out_ids, out_terms = [], []
        for i, t in zip(ids, texts):
            for m in self.pattern.finditer(t or ""):
                out_ids.append(i)
                out_terms.append(m.group(1))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "term": pa.array(out_terms, pa.string()),
            }
        )


_DEFAULT_PATTERN_EXTRACTOR: PatternTripleExtractor | None = None


def _extract_triples_batch(batch: pa.Table) -> pa.Table:
    global _DEFAULT_PATTERN_EXTRACTOR
    if _DEFAULT_PATTERN_EXTRACTOR is None:  # once per worker process
        _DEFAULT_PATTERN_EXTRACTOR = PatternTripleExtractor()
    return _DEFAULT_PATTERN_EXTRACTOR(batch)


def extract_triples(pages, *, concurrency: int | tuple[int, int] | None = None, batch_size: int = 1024):
    """web pages (url, text) → triples Dataset (TRIPLES_SCHEMA).

    Stateless tasks by default (patterns compiled once per warm worker
    process); pass ``concurrency`` for an actor pool when the
    extractor carries heavy state (models, tokenizers)."""
    from rdf2smw_ray.util import pool

    if concurrency is None:
        return pages.map_batches(
            _extract_triples_batch, batch_format="pyarrow", batch_size=batch_size
        )
    return pages.map_batches(
        PatternTripleExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )
