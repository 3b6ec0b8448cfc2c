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
        """Scalar reference kernel: all statements of one page, in
        sentence order (tests assert the vectorized batch path matches
        it exactly, seq included)."""
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

    # statements emitted per rule hit, in rule order (mirrors handlers)
    _STMTS_PER_RULE = (3, 1, 2, 1, 1, 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized batch path (round-1 fix #8): pages exploded to
        lines ONCE, one anchored ``str.extract`` per rule over all
        still-unmatched lines (first-rule-wins), statement seqs from a
        per-page exclusive cumsum — no per-line Python loop."""
        import pandas as pd

        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        if not urls:
            return TRIPLES_SCHEMA.empty_table()

        s = pd.Series(texts, dtype=object).fillna("")
        ex = s.str.split("\n").explode()
        lines = pd.DataFrame(
            {"page": ex.index.to_numpy(dtype=np.int64), "line": ex.str.strip()}
        )
        lines = lines[lines["line"].astype(bool)].reset_index(drop=True)
        nl = len(lines)
        if nl == 0:
            return TRIPLES_SCHEMA.empty_table()

        rule_id = np.full(nl, -1, dtype=np.int8)
        g1 = np.empty(nl, dtype=object)
        g2 = np.empty(nl, dtype=object)
        for ri, (rx, _h) in enumerate(self.rules):
            todo = rule_id < 0
            if not todo.any():
                break
            extr = lines.loc[todo, "line"].str.extract(
                "^" + rx.pattern, expand=True
            )
            hit = extr[0].notna()
            if not hit.any():
                continue
            pos = extr.index[hit].to_numpy()
            rule_id[pos] = ri
            g1[pos] = extr.loc[hit, 0].to_numpy()
            g2[pos] = extr.loc[hit, 1].to_numpy()

        nst = np.zeros(nl, dtype=np.int64)
        matched = rule_id >= 0
        nst[matched] = np.asarray(self._STMTS_PER_RULE, dtype=np.int64)[
            rule_id[matched]
        ]
        # per-page exclusive cumsum → first seq offset of each line
        lines["n"] = nst
        start = lines.groupby("page")["n"].cumsum().to_numpy() - nst
        bases = np.array([url_seq_base(u) for u in urls], dtype=np.int64)
        seq0 = bases[lines["page"].to_numpy()] + start
        url_arr = np.array(urls, dtype=object)[lines["page"].to_numpy()]

        out: list[pa.Table] = []

        def emit(mask, subj, pred, obj, kind, dt, off):
            n = int(mask.sum())
            if n == 0:
                return
            out.append(
                pa.Table.from_pydict(
                    {
                        "subj": pa.array(subj, pa.string()),
                        "pred": pa.array(np.full(n, pred, dtype=object), pa.string()),
                        "obj": pa.array(obj, pa.string()),
                        "obj_is_iri": pa.array(
                            np.full(n, kind == OBJ_IRI), pa.bool_()
                        ),
                        "obj_kind": pa.array(
                            np.full(n, kind, dtype=object), pa.string()
                        ),
                        "obj_datatype": pa.array(
                            np.full(n, dt, dtype=object), pa.string()
                        ),
                        "obj_lang": pa.array(np.full(n, "", dtype=object), pa.string()),
                        "seq": pa.array(seq0[mask] + off, pa.int64()),
                        "src": pa.array(url_arr[mask], pa.string()),
                    },
                    schema=TRIPLES_SCHEMA,
                )
            )

        def cat(prefix, arr):
            return pd.Series(arr, dtype=object).radd(prefix).to_numpy()

        m = rule_id == 0  # subclass
        if m.any():
            c1, c2 = cat(CLASS_NS, g1[m]), cat(CLASS_NS, g2[m])
            emit(m, c1, RDFS_SUBCLASS, c2, OBJ_IRI, "", 0)
            emit(m, c1, RDF_TYPE, np.full(int(m.sum()), OWL_CLASS, dtype=object), OBJ_IRI, "", 1)
            emit(m, c2, RDF_TYPE, np.full(int(m.sum()), OWL_CLASS, dtype=object), OBJ_IRI, "", 2)
        m = rule_id == 1  # label
        if m.any():
            names = pd.Series(g1[m], dtype=object)
            ns = np.where(
                names.str.startswith("Class_").to_numpy(), CLASS_NS, ENTITY_NS
            )
            subj = (pd.Series(ns, dtype=object) + names.to_numpy()).to_numpy()
            emit(m, subj, RDFS_LABEL, g2[m], OBJ_LITERAL, XSD_STRING, 0)
        m = rule_id == 2  # type
        if m.any():
            e1, c2 = cat(ENTITY_NS, g1[m]), cat(CLASS_NS, g2[m])
            emit(m, e1, RDF_TYPE, c2, OBJ_IRI, "", 0)
            emit(m, c2, RDF_TYPE, np.full(int(m.sum()), OWL_CLASS, dtype=object), OBJ_IRI, "", 1)
        for ri, prop in ((3, "works_with"), (4, "refers_to")):
            m = rule_id == ri
            if m.any():
                emit(
                    m,
                    cat(ENTITY_NS, g1[m]),
                    PROP_NS + prop,
                    cat(ENTITY_NS, g2[m]),
                    OBJ_IRI,
                    "",
                    0,
                )
        m = rule_id == 5  # has size
        if m.any():
            emit(m, cat(ENTITY_NS, g1[m]), PROP_NS + "has_size", g2[m], OBJ_LITERAL, XSD_INT, 0)

        if not out:
            return TRIPLES_SCHEMA.empty_table()
        return pa.concat_tables(out).cast(TRIPLES_SCHEMA)


class GazetteerMentionExtractor:
    """Dictionary-based mention detection over a text column.

    ``gazetteer_ref``: ray.ObjectRef of a list of terms (broadcast
    once), or pass ``terms`` directly for tests. Emits one row per
    mention occurrence: (doc_uri, kg:mentions, term) — term kept as a
    literal so SQL oracles can compare directly.

    ``emit="pairs"`` emits ADJACENT mention bigrams (doc_id, term_a,
    term_b) instead — formed HERE, while the whole document's text is
    one input row, so a bigram can never straddle an output block
    boundary (pairing downstream with a per-batch ``shift(-1)`` loses
    the cross-block pair whenever Ray splits the mentions table on
    ``target_max_block_size``).
    """

    def __init__(
        self,
        gazetteer_ref=None,
        terms=None,
        id_column="doc_id",
        text_column="text",
        emit="mentions",
    ):
        if terms is None:
            import ray

            terms = ray.get(gazetteer_ref)
        self.terms = list(terms)
        self.pattern = re.compile(r"\b(" + "|".join(map(re.escape, self.terms)) + r")\b")
        self.id_column = id_column
        self.text_column = text_column
        if emit not in ("mentions", "pairs"):
            raise ValueError(f"emit must be 'mentions' or 'pairs', got {emit!r}")
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized: one C-regex ``findall`` per batch; occurrence
        order per doc is preserved (same as a finditer loop)."""
        import pandas as pd

        ids = np.asarray(batch[self.id_column].to_pandas())
        texts = pd.Series(batch[self.text_column].to_pylist(), dtype=object).fillna("")
        hits = texts.str.findall(self.pattern)
        counts = hits.map(len).to_numpy()
        flat = np.array([t for doc_hits in hits for t in doc_hits], dtype=object)
        if self.emit == "mentions":
            return pa.table(
                {
                    "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                    "term": pa.array(flat, pa.string()),
                }
            )
        # adjacent pairs within each doc: drop the LAST mention of
        # every doc from side a and the FIRST from side b — the two
        # masked views align into (m_i, m_{i+1}) pairs per doc
        ends = np.cumsum(counts)
        starts = ends - counts
        mask_a = np.ones(len(flat), dtype=bool)
        last_idx = ends[counts > 0] - 1
        mask_a[last_idx] = False
        mask_b = np.ones(len(flat), dtype=bool)
        mask_b[starts[counts > 0]] = False
        pair_counts = np.maximum(counts - 1, 0)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, pair_counts), pa.int64()),
                "term_a": pa.array(flat[mask_a], pa.string()),
                "term_b": pa.array(flat[mask_b], pa.string()),
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
