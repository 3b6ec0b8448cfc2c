"""owl:sameAs canonicalization tests."""

import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.schemas import OBJ_IRI, OBJ_LITERAL, TRIPLES_SCHEMA
from rdf2smw_ray.stages.sameas import OWL_SAMEAS, _union_find, canonicalize_sameas

LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def _t(rows):
    return pa.Table.from_pydict(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_is_iri": [r[3] == OBJ_IRI for r in rows],
            "obj_kind": [r[3] for r in rows],
            "obj_datatype": ["" if r[3] == OBJ_IRI else "http://www.w3.org/2001/XMLSchema#string" for r in rows],
            "obj_lang": [""] * len(rows),
            "seq": list(range(len(rows))),
            "src": [""] * len(rows),
        },
        schema=TRIPLES_SCHEMA,
    )


def test_union_find_canonical_is_lexmin():
    canon = _union_find([("b", "c"), ("a", "b"), ("x", "y")])
    assert canon == {"b": "a", "c": "a", "y": "x"}


def test_canonicalize_merges_pages():
    rows = [
        ("http://e/a1", LABEL, "Alias One", OBJ_LITERAL),
        ("http://e/a2", LABEL, "Alias Two", OBJ_LITERAL),
        ("http://e/a2", OWL_SAMEAS, "http://e/a1", OBJ_IRI),
        ("http://e/a2", "http://e/likes", "http://e/z", OBJ_IRI),
        ("http://e/other", "http://e/knows", "http://e/a2", OBJ_IRI),
    ]
    ds, canon = canonicalize_sameas(rd.from_arrow(_t(rows)))
    assert canon == {"http://e/a2": "http://e/a1"}
    df = ds.to_pandas()
    # sameAs rows consumed; a2 rewritten everywhere (subject + object)
    assert not (df["pred"] == OWL_SAMEAS).any()
    assert "http://e/a2" not in set(df["subj"]) | set(df[df["obj_kind"] == "iri"]["obj"])
    # downstream fold produces ONE merged page
    from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline

    res = rdf2smw_pipeline(ds, resolver_concurrency=2)
    pages = res["content"].to_pandas()
    merged = pages[pages["subj"] == "http://e/a1"]
    assert len(merged) == 1
    facts = {(f["property"], f["value"]) for f in merged.iloc[0]["facts"]}
    assert ("Label", "Alias One") in facts and ("Label", "Alias Two") in facts


def test_canonicalize_noop_without_sameas():
    rows = [("http://e/a", LABEL, "A", OBJ_LITERAL)]
    ds, canon = canonicalize_sameas(rd.from_arrow(_t(rows)))
    assert canon == {}
    assert ds.count() == 1
