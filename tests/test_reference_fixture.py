"""Parity on the reference's OWN test fixture — the exact N-Triples
from /root/reference/components/tripleaggregator_test.go:28-35 fed
through file → reader → full pipeline, checked against the oracle and
against the reference test's own assertions (two aggregates of three
triples, grouped by subject)."""

import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.oracle import pyoracle
from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
from rdf2smw_ray.sources.ntriples import read_ntriples

REFERENCE_NT = """
<http://example.org/s1> <http://example.org/p1> "o1" .
<http://example.org/s1> <http://example.org/p2> "o2" .
<http://example.org/s1> <http://example.org/p3> "o3" .
<http://example.org/s2> <http://example.org/p4> "o4" .
<http://example.org/s2> <http://example.org/p5> "o5" .
<http://example.org/s2> <http://example.org/p6> "o6" .
"""


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    p = tmp_path_factory.mktemp("ref") / "ref.nt"
    p.write_text(REFERENCE_NT)
    triples = read_ntriples(str(p))
    return triples, rdf2smw_pipeline(triples, resolver_concurrency=2)


def test_groupby_matches_reference_assertions(result):
    """tripleaggregator_test.go:56-105: two aggregates keyed s1/s2 with
    three triples each, in input order."""
    triples, res = result
    pages = res["pages"].to_pandas().set_index("subj")
    assert set(pages.index) == {"http://example.org/s1", "http://example.org/s2"}
    s1 = pages.loc["http://example.org/s1"]
    # 3 data facts + Equivalent URI
    facts = [(f["property"], f["value"]) for f in s1["facts"]]
    assert facts == [
        ("P1", "o1"),
        ("P2", "o2"),
        ("P3", "o3"),
        ("Equivalent URI", "http://example.org/s1"),
    ]


def test_fact_set_matches_oracle_on_reference_fixture(result):
    triples, res = result
    oracle = pyoracle.convert(triples.to_pandas().sort_values("seq").to_dict("records"))
    want = pyoracle.fact_triple_set(oracle)
    got = set()
    for stream in ("content", "properties"):
        for _, r in res[stream].to_pandas().iterrows():
            for f in r["facts"]:
                got.add((r["title"], f["property"], f["value"]))
            for c in r["categories"]:
                got.add((r["title"], "Category", c))
    assert got == want
