"""Edge-case regressions: empty input, garbage-only input, dead-letter
parsing (the reference log.Fatals on a parse error —
/root/reference/components/ttlfilereader.go:56-61 — we dead-letter)."""

import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
from rdf2smw_ray.schemas import TRIPLES_SCHEMA
from rdf2smw_ray.sources.ntriples import (
    parse_ntriples_lines,
    triples_to_ntriples,
    unescape_literal,
)


def test_empty_input_pipeline():
    empty = rd.from_arrow(TRIPLES_SCHEMA.empty_table())
    res = rdf2smw_pipeline(empty, resolver_concurrency=2)
    assert res["pages"].count() == 0
    assert res["properties"].count() == 0
    assert res["templates"].count() == 0


def test_parse_dead_letters_malformed_lines():
    import pandas as pd

    lines = pd.Series(
        [
            '<http://a> <http://p> "v" .',
            "GARBAGE",
            "# comment",
            "",
            "<http://a> <http://p> <http://b> .",
        ]
    )
    t = parse_ntriples_lines(lines)
    assert t.num_rows == 2
    assert t["seq"].to_pylist() == [0, 4]  # line numbers preserved


def test_parse_literal_forms():
    import pandas as pd

    lines = pd.Series(
        [
            '<http://a> <http://p> "plain" .',
            '<http://a> <http://p> "typed"^^<http://www.w3.org/2001/XMLSchema#integer> .',
            '<http://a> <http://p> "tagged"@en .',
            '<http://a> <http://p> "esc \\"q\\" \\\\ \\n" .',
            "<http://a> <http://p> _:b0 .",
        ]
    )
    t = parse_ntriples_lines(lines).to_pylist()
    assert t[0]["obj_datatype"].endswith("#string")
    assert t[1]["obj_datatype"].endswith("#integer")
    assert t[2]["obj_lang"] == "en" and t[2]["obj_datatype"].endswith("langString")
    assert t[3]["obj"] == 'esc "q" \\ \n'
    assert t[4]["obj_kind"] == "blank"


def test_unescape():
    assert unescape_literal(r"a\tb\nc\\d\"e") == 'a\tb\nc\\d"e'
    assert unescape_literal(r"é\U0001F600") == "é😀"


def test_ntriples_roundtrip():
    from rdf2smw_ray.sources.fixtures import fixture_triples

    import pyarrow.compute as pc

    t = fixture_triples(head_facts=5)
    # URIs containing <> cannot be expressed in N-Triples syntax (the
    # fixture has one on purpose to exercise title cleanup) — exclude
    # them from the serialization round-trip.
    ok = pc.invert(pc.match_substring_regex(t["subj"], "[<>]"))
    t = t.filter(ok)
    text = triples_to_ntriples(t)
    import pandas as pd

    t2 = parse_ntriples_lines(pd.Series(text.split("\n")))
    a = t.to_pandas().sort_values("seq")
    b = t2.to_pandas().sort_values("seq")
    for col in ["subj", "pred", "obj", "obj_kind", "obj_lang"]:
        assert list(a[col]) == list(b[col]), col
