"""Turtle-subset reader tests."""

import pytest

import ray.data as rd

from rdf2smw_ray.sources.turtle import parse_turtle, read_turtle

TTL = """
@prefix ex: <http://example.org/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .

ex:s1 rdfs:label "S One" ;
      a ex:Widget ;
      ex:knows ex:s2 , ex:s3 .

ex:s2 ex:age 42 ;
      ex:height 1.85 ;
      ex:active true ;
      ex:note "hallo"@de ;
      ex:count "7"^^<http://www.w3.org/2001/XMLSchema#integer> .

# a comment line
<http://example.org/s3> <http://example.org/related> _:b0 .
"""


def test_parse_turtle_subset():
    t = parse_turtle(TTL)
    rows = t.to_pylist()
    spo = {(r["subj"], r["pred"], r["obj"]) for r in rows}
    assert ("http://example.org/s1", "http://www.w3.org/2000/01/rdf-schema#label", "S One") in spo
    assert (
        "http://example.org/s1",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://example.org/Widget",
    ) in spo
    # object list expands to two triples
    knows = [r for r in rows if r["pred"].endswith("knows")]
    assert {r["obj"] for r in knows} == {"http://example.org/s2", "http://example.org/s3"}
    # typed literals
    byp = {r["pred"].rsplit("/", 1)[-1]: r for r in rows if r["subj"].endswith("s2")}
    assert byp["age"]["obj_datatype"].endswith("#integer")
    assert byp["height"]["obj_datatype"].endswith("#decimal")
    assert byp["active"]["obj_datatype"].endswith("#boolean")
    assert byp["note"]["obj_lang"] == "de" and byp["note"]["obj_datatype"].endswith("langString")
    assert byp["count"]["obj"] == "7" and byp["count"]["obj_datatype"].endswith("#integer")
    # blank node object
    assert any(r["obj_kind"] == "blank" for r in rows)
    # seq strictly increasing in statement order
    seqs = [r["seq"] for r in rows]
    assert seqs == sorted(seqs)


def test_parse_turtle_undefined_prefix():
    with pytest.raises(ValueError, match="undefined prefix"):
        parse_turtle("foo:x foo:y foo:z .")


def test_read_turtle_dataset(tmp_path):
    p = tmp_path / "a.ttl"
    p.write_text(TTL)
    bad = tmp_path / "b.ttl"
    bad.write_text("this is ( not parseable [ turtle")
    ds = read_turtle([str(p), str(bad)])
    df = ds.to_pandas()
    assert len(df) == 10  # bad file dead-lettered, good file parsed
    assert set(df["src"]) == {str(p)}


def test_turtle_through_pipeline(tmp_path):
    from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline

    p = tmp_path / "a.ttl"
    p.write_text(TTL)
    res = rdf2smw_pipeline(read_turtle(str(p)), resolver_concurrency=2)
    titles = set(res["content"].to_pandas()["title"])
    assert "S One" in titles


FULL_TTL = """
@base <http://base.org/dir/> .
@prefix ex: <http://example.org/> .
@prefix : <rel/> .

<item1> ex:rel <../up> , <#frag> .
:local ex:q "short" .
ex:s ex:list ( 1 2.5 "three" ex:four ) ;
     ex:props [ ex:a 1 ; ex:b [ ex:c true ] ] ;
     ex:empty () .
[ ex:x 1 ] .
[] ex:y 2 .
ex:long ex:val \"\"\"multi
line "quoted" text\"\"\" .
ex:sq ex:v 'single' , '''long single''' .
ex:num ex:d 1.5e3 , -2E-2 , .5 , -7 .
"""


def _spo(table):
    return {(r["subj"], r["pred"], r["obj"]) for r in table.to_pylist()}


def test_base_and_relative_iris():
    t = parse_turtle(FULL_TTL)
    spo = _spo(t)
    assert ("http://base.org/dir/item1", "http://example.org/rel", "http://base.org/up") in spo
    # RFC 3986: a fragment-only reference resolves against the base URI
    assert ("http://base.org/dir/item1", "http://example.org/rel", "http://base.org/dir/#frag") in spo
    # relative prefix IRI resolved against base
    assert ("http://base.org/dir/rel/local", "http://example.org/q", "short") in spo


def test_collections_expand_to_first_rest():
    rows = parse_turtle(FULL_TTL).to_pylist()
    firsts = [r for r in rows if r["pred"].endswith("#first")]
    assert [r["obj"] for r in firsts] == ["1", "2.5", "three", "http://example.org/four"]
    rests = [r for r in rows if r["pred"].endswith("#rest")]
    assert rests[-1]["obj"].endswith("#nil")
    # empty collection → rdf:nil directly
    empty = [r for r in rows if r["pred"].endswith("/empty")]
    assert empty[0]["obj"].endswith("#nil") and empty[0]["obj_kind"] == "iri"


def test_blank_node_property_lists():
    rows = parse_turtle(FULL_TTL).to_pylist()
    props = [r for r in rows if r["pred"].endswith("/props")]
    inner = props[0]["obj"]
    assert inner.startswith("_:")
    nested = [r for r in rows if r["subj"] == inner and r["pred"].endswith("/b")]
    assert nested and nested[0]["obj"].startswith("_:")
    # bare BNPL subject and anonymous [] subject both emit their triples
    assert any(r["subj"].startswith("_:") and r["pred"].endswith("/x") for r in rows)
    assert any(r["subj"].startswith("_:") and r["pred"].endswith("/y") for r in rows)


def test_long_and_single_quoted_literals():
    rows = parse_turtle(FULL_TTL).to_pylist()
    vals = {r["obj"] for r in rows if r["pred"].endswith("/val")}
    assert 'multi\nline "quoted" text' in vals
    vs = {r["obj"] for r in rows if r["pred"].endswith("/v")}
    assert vs == {"single", "long single"}


def test_numeric_shorthand_datatypes():
    rows = parse_turtle(FULL_TTL).to_pylist()
    d = {r["obj"]: r["obj_datatype"] for r in rows if r["pred"].endswith("/d")}
    assert d["1.5e3"].endswith("#double")
    assert d["-2E-2"].endswith("#double")
    assert d[".5"].endswith("#decimal")
    assert d["-7"].endswith("#integer")


def test_truncated_input_raises_valueerror_not_indexerror():
    for frag in [
        "@prefix ex: <http://e/> . ex:s ex:p",
        "@prefix ex: <http://e/> . ex:s ex:p \"lit\"^^",
        "@prefix ex: <http://e/> . ex:s ex:p (",
        "@prefix ex: <http://e/> . ex:s ex:p [",
        "@prefix",
    ]:
        with pytest.raises(ValueError):
            parse_turtle(frag)


def test_turtle_random_literals_roundtrip():
    """Randomized literal escaping through the Turtle tokenizer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rdf2smw_ray.sources.ntriples import escape_literal

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=50))
    def inner(s):
        ttl = f'<http://e/s> <http://e/p> "{escape_literal(s)}" .'
        t = parse_turtle(ttl)
        assert t.num_rows == 1
        assert t["obj"].to_pylist()[0] == s

    inner()


def test_read_turtle_audited(tmp_path):
    from rdf2smw_ray.sources.ntriples import split_dead_letters
    from rdf2smw_ray.sources.turtle import read_turtle_audited

    good = tmp_path / "good.ttl"
    good.write_text(TTL)
    bad = tmp_path / "bad.ttl"
    bad.write_text("@prefix ex: <http://e/> .\nex:s ex:p [ unclosed")
    clean, errors = split_dead_letters(
        read_turtle_audited([str(good), str(bad)])
    )
    cdf, edf = clean.to_pandas(), errors.to_pandas()
    assert len(cdf) == 10 and "error_line" not in cdf.columns
    assert len(edf) == 1
    assert edf["src"].iloc[0] == str(bad)
    assert "turtle" in edf["error_line"].iloc[0]
