"""Deterministic TTL-style triple fixtures (FIXTURES.md F2).

Exercises every reference semantic: title-property priority, page-type
routing, subClassOf chains / SpecificCategory, all four literal
datatypes, cleanup characters, truncation, first-wins dedup,
multi-value adjacency, blank-node objects, missing-index edges, and a
skewed head subject. No wall-clock, no randomness — pure arithmetic.
"""

from __future__ import annotations

import pyarrow as pa

from rdf2smw_ray.schemas import OBJ_BLANK, OBJ_IRI, OBJ_LITERAL, TRIPLES_SCHEMA

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
DC_TITLE = "http://purl.org/dc/elements/1.1/title"
FOAF_NAME = "http://xmlns.com/foaf/0.1/name"
SWIVT_PAGE = "http://semantic-mediawiki.org/swivt/1.0#page"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_OBJPROP = "http://www.w3.org/2002/07/owl#ObjectProperty"
OWL_DTPROP = "http://www.w3.org/2002/07/owl#DatatypeProperty"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_FLOAT = "http://www.w3.org/2001/XMLSchema#float"
LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _iri(s, p, o):
    return (s, p, o, OBJ_IRI, "", "")


def _lit(s, p, o, dt=XSD_STRING, lang=""):
    return (s, p, o, OBJ_LITERAL, dt, lang)


def _blank(s, p, label="_:b0"):
    return (s, p, label, OBJ_BLANK, "", "")


def fixture_triples(head_facts: int = 1000) -> pa.Table:
    """The F2 fixture as a TRIPLES_SCHEMA Arrow table."""
    t: list[tuple] = []

    # --- class hierarchy of depth 3 (Device > Gadget > Widget) -----------
    t.append(_iri(EX + "Widget", RDF_TYPE, OWL_CLASS))
    t.append(_iri(EX + "Widget", SUBCLASS, EX + "Gadget"))
    t.append(_lit(EX + "Widget", LABEL, "Widget"))
    t.append(_iri(EX + "Gadget", RDF_TYPE, OWL_CLASS))
    t.append(_iri(EX + "Gadget", SUBCLASS, EX + "Device"))
    t.append(_iri(EX + "Device", RDF_TYPE, OWL_CLASS))

    # --- predicates typed as properties ----------------------------------
    t.append(_iri(EX + "prop/worksWith", RDF_TYPE, OWL_OBJPROP))
    t.append(_lit(EX + "prop/worksWith", LABEL, "works with"))
    t.append(_iri(EX + "prop/size", RDF_TYPE, OWL_DTPROP))

    # --- s1: two title properties (priority check: label wins over
    # foaf:name because it comes earlier in TITLE_PROPERTIES), multiple
    # categories (Widget deepest → SpecificCategory), every datatype,
    # duplicate facts, adjacent multi-values, blank node --------------------
    s1 = EX + "s1"
    t.append(_lit(s1, FOAF_NAME, "S One By Name"))
    t.append(_lit(s1, LABEL, "S One"))
    t.append(_iri(s1, RDF_TYPE, EX + "Widget"))
    t.append(_iri(s1, RDF_TYPE, EX + "Device"))
    t.append(_lit(s1, EX + "prop/size", "42", XSD_INT))
    t.append(_lit(s1, EX + "prop/size", "42.5", XSD_FLOAT))
    t.append(_iri(s1, EX + "prop/worksWith", EX + "s2"))
    t.append(_iri(s1, EX + "prop/worksWith", EX + "s3"))
    t.append(_lit(s1, EX + "prop/comment", "hello world"))
    t.append(_lit(s1, EX + "prop/comment", "hello world"))  # dup → first-wins
    t.append(_lit(s1, EX + "prop/comment", "hallo welt", LANGSTRING, "de"))
    t.append(_blank(s1, EX + "prop/related"))

    # --- s2: swivt:page beats label; points at an unindexed URI ----------
    s2 = EX + "s2"
    t.append(_lit(s2, LABEL, "S Two Label"))
    t.append(_lit(s2, SWIVT_PAGE, "S Two Page"))
    t.append(_iri(s2, RDF_TYPE, EX + "Gadget"))
    t.append(_iri(s2, EX + "prop/worksWith", EX + "unindexed/thing"))

    # --- s3: no title property → local-name fallback; category absent
    # from the index (nil-SpecificCategory edge — must not crash) ----------
    s3 = EX + "s3"
    t.append(_iri(s3, RDF_TYPE, EX + "UnknownClass"))
    t.append(_lit(s3, EX + "prop/comment", "plain subject"))

    # --- s4: cleanup characters + namespace-suffix regexes + truncation ---
    s4 = EX + "weird#chars[a]{b}|c<d>e?f&g,h.i=j"
    t.append(_lit(s4, EX + "prop/comment", "value with (ns:suffix) kept?"))
    t.append(_lit(s4, DC_TITLE, "Weird [Title] with (ex:ns) and {braces}"))
    long_local = "word " * 60  # > 250 chars → truncation path
    s5 = EX + "long/" + long_local.strip().replace(" ", "_")
    t.append(_lit(s5, LABEL, long_local.strip()))
    t.append(_lit(s5, EX + "prop/comment", "long title subject"))

    # --- s6: literal value carrying a strip-suffix " (ns:x)" --------------
    s6 = EX + "s6"
    t.append(_lit(s6, EX + "prop/comment", "Niacin (ns:compound)"))
    t.append(_lit(s6, EX + "prop/comment", "Alt [ns:alt]"))

    # --- predicate that is also a plain subject (merge path) --------------
    t.append(_lit(EX + "prop/comment", LABEL, "comment"))

    # --- head subject with many facts (salting / skew) --------------------
    head = EX + "head"
    t.append(_lit(head, LABEL, "Head Entity"))
    t.append(_iri(head, RDF_TYPE, EX + "Widget"))
    for i in range(head_facts):
        t.append(_lit(head, EX + f"prop/p{i % 7}", f"v{i}", XSD_INT if i % 3 else XSD_STRING))

    rows = {
        "subj": [x[0] for x in t],
        "pred": [x[1] for x in t],
        "obj": [x[2] for x in t],
        "obj_is_iri": [x[3] == OBJ_IRI for x in t],
        "obj_kind": [x[3] for x in t],
        "obj_datatype": [x[4] for x in t],
        "obj_lang": [x[5] for x in t],
        "seq": list(range(len(t))),
        "src": ["fixture" for _ in t],
    }
    return pa.Table.from_pydict(rows, schema=TRIPLES_SCHEMA)
