"""End-to-end back-half tests: fixture triples → pipeline → compare
against the independent pure-Python oracle (P/R gate ≥ 0.95; we
assert exact set equality, which is stronger)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.oracle import pyoracle
from rdf2smw_ray.pipelines.rdf2smw import fact_triples, rdf2smw_pipeline
from rdf2smw_ray.schemas import URITYPE_CLASS, URITYPE_PREDICATE
from rdf2smw_ray.sources.fixtures import fixture_triples


@pytest.fixture(scope="module")
def fixture_table() -> pa.Table:
    return fixture_triples(head_facts=50)


@pytest.fixture(scope="module")
def oracle_result(fixture_table):
    triples = fixture_table.to_pylist()
    return pyoracle.convert(triples)


@pytest.fixture(scope="module")
def pipeline_result(fixture_table):
    ds = rd.from_arrow(fixture_table)
    return rdf2smw_pipeline(ds, resolver_concurrency=2)


def _engine_fact_set(pipeline_result):
    out = set()
    for stream in ("content", "properties"):
        df = pipeline_result[stream].to_pandas()
        for _, r in df.iterrows():
            for f in r["facts"]:
                out.add((r["title"], f["property"], f["value"]))
            for c in r["categories"]:
                out.add((r["title"], "Category", c))
    return out


def test_fact_set_matches_oracle(pipeline_result, oracle_result):
    engine = _engine_fact_set(pipeline_result)
    oracle = pyoracle.fact_triple_set(oracle_result)
    missing = oracle - engine
    extra = engine - oracle
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:10]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:10]}"


def test_precision_recall_at_least_095(pipeline_result, oracle_result):
    engine = _engine_fact_set(pipeline_result)
    oracle = pyoracle.fact_triple_set(oracle_result)
    tp = len(engine & oracle)
    precision = tp / max(1, len(engine))
    recall = tp / max(1, len(oracle))
    assert precision >= 0.95 and recall >= 0.95


def test_page_titles_match_oracle(pipeline_result, oracle_result):
    engine_titles = set(pipeline_result["content"].to_pandas()["title"]) | set(
        pipeline_result["properties"].to_pandas()["title"]
    )
    oracle_titles = {
        p["title"]
        for p in oracle_result["content_pages"] + oracle_result["property_pages"]
    }
    assert engine_titles == oracle_titles


def test_content_fact_order_matches_oracle(pipeline_result, oracle_result):
    """Within-page fact ORDER is deterministic (seq order, first-wins)
    for content pages in both engines."""
    engine = {
        r["title"]: [(f["property"], f["value"]) for f in r["facts"]]
        for _, r in pipeline_result["content"].to_pandas().iterrows()
    }
    for p in oracle_result["content_pages"]:
        assert engine[p["title"]] == p["facts"], p["title"]


def test_specific_category(pipeline_result, oracle_result):
    engine = {
        r["title"]: r["specific_category"]
        for _, r in pipeline_result["content"].to_pandas().iterrows()
    }
    for p in oracle_result["content_pages"]:
        want = p["specific"] if p["specific"] is not None else ""
        assert engine[p["title"]] == want, p["title"]


def test_wikitext_matches_oracle_for_content_pages(pipeline_result, oracle_result):
    engine = {
        r["title"]: r["wikitext"]
        for _, r in pipeline_result["content"].to_pandas().iterrows()
    }
    for p in oracle_result["content_pages"]:
        assert engine[p["title"]] == p["wikitext"], p["title"]


def test_xml_matches_oracle_for_content_pages(pipeline_result, oracle_result):
    engine = {
        r["title"]: r["xml"]
        for _, r in pipeline_result["content"].to_pandas().iterrows()
    }
    for p in oracle_result["content_pages"]:
        assert engine[p["title"]] == p["xml"], p["title"]


def test_template_pages_match_oracle(pipeline_result, oracle_result):
    engine = {
        r["title"]: r["wikitext"]
        for _, r in pipeline_result["templates"].to_pandas().iterrows()
    }
    oracle = {p["title"]: p["wikitext"] for p in oracle_result["template_pages"]}
    assert engine == oracle


def test_page_type_routing(pipeline_result):
    content = pipeline_result["content"].to_pandas()
    props = pipeline_result["properties"].to_pandas()
    assert (props["page_type"] == URITYPE_PREDICATE).all()
    assert (content["page_type"] != URITYPE_PREDICATE).all()
    # classes got Category: titles
    classes = content[content["page_type"] == URITYPE_CLASS]
    assert classes["title"].str.startswith("Category:").all()


def test_salted_fold_equals_unsalted(fixture_table):
    ds = rd.from_arrow(fixture_table)
    plain = rdf2smw_pipeline(ds, resolver_concurrency=2, salt=1)
    salted = rdf2smw_pipeline(ds, resolver_concurrency=2, salt=4)

    def norm(res):
        df = res["pages"].to_pandas().sort_values("title")
        return [
            (
                r["title"],
                int(r["page_type"]),
                tuple((f["property"], f["value"]) for f in r["facts"]),
                tuple(r["categories"]),
                r["specific_category"],
            )
            for _, r in df.iterrows()
        ]

    assert norm(plain) == norm(salted)
