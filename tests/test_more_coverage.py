"""Coverage tests: category filter, join-mode resolver parity,
bare-fact (use_templates=False) rendering vs oracle, line-oriented
reader, extra title-property priorities."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.oracle import pyoracle
from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
from rdf2smw_ray.schemas import OBJ_LITERAL, TRIPLES_SCHEMA
from rdf2smw_ray.sources.fixtures import fixture_triples
from rdf2smw_ray.stages.catfilter import filter_pages_by_categories


def test_category_filter():
    fx = fixture_triples(head_facts=10)
    res = rdf2smw_pipeline(rd.from_arrow(fx), resolver_concurrency=2)
    kept = filter_pages_by_categories(res["pages"], ["Widget"]).to_pandas()
    assert len(kept) > 0
    assert all("Widget" in list(c) for c in kept["categories"])
    none = filter_pages_by_categories(res["pages"], ["NoSuchCategory"]).to_pandas()
    assert len(none) == 0


def test_join_mode_resolver_matches_broadcast():
    from rdf2smw_ray.stages.fold import fold_pages
    from rdf2smw_ray.stages.resolve import resolve_triples, resolve_triples_join
    from rdf2smw_ray.stages.sidecar import build_sidecar

    fx = fixture_triples(head_facts=20)
    ds = rd.from_arrow(fx)
    sidecar = build_sidecar(ds)

    broadcast = resolve_triples(ds, sidecar, mode="task").to_pandas()
    joined = resolve_triples_join(ds, rd.from_arrow(sidecar), num_partitions=4).to_pandas()

    cols = list(broadcast.columns)
    a = broadcast[cols].sort_values(["subj", "seq"]).reset_index(drop=True)
    b = joined[cols].sort_values(["subj", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bare_fact_rendering_matches_oracle():
    fx = fixture_triples(head_facts=10)
    res = rdf2smw_pipeline(rd.from_arrow(fx), use_templates=False, resolver_concurrency=2)
    oracle = pyoracle.convert(fx.to_pylist(), use_templates=False)
    engine = {
        r["title"]: r["wikitext"]
        for _, r in res["content"].to_pandas().iterrows()
    }
    for p in oracle["content_pages"]:
        assert engine[p["title"]] == p["wikitext"], p["title"]
    # no template pages in bare mode
    assert res["templates"].count() == 0


def test_line_oriented_reader(tmp_path):
    from rdf2smw_ray.sources.ntriples import read_ntriples_lines

    p = tmp_path / "x.nt"
    p.write_text(
        '<http://a> <http://p> "v1" .\n'
        "garbage line\n"
        "<http://a> <http://p> <http://b> .\n"
    )
    t = read_ntriples_lines(str(p)).to_pandas()
    assert len(t) == 2
    assert set(t["subj"]) == {"http://a"}


def test_remaining_title_property_priorities():
    """dcterms:title and skos:preferredLabel slots in the priority
    chain (triplestowikipageconv.go:12-19)."""
    rows = [
        ("http://e/x", "http://purl.org/dc/terms/title", "From Dcterms", OBJ_LITERAL),
        ("http://e/x", "http://www.w3.org/2004/02/skos/core#preferredLabel", "From Skos", OBJ_LITERAL),
        ("http://e/y", "http://www.w3.org/2004/02/skos/core#preferredLabel", "Y Skos", OBJ_LITERAL),
        ("http://e/y", "http://xmlns.com/foaf/0.1/name", "Y Foaf", OBJ_LITERAL),
    ]
    t = pa.Table.from_pydict(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_is_iri": [False] * 4,
            "obj_kind": [r[3] for r in rows],
            "obj_datatype": ["http://www.w3.org/2001/XMLSchema#string"] * 4,
            "obj_lang": [""] * 4,
            "seq": list(range(4)),
            "src": [""] * 4,
        },
        schema=TRIPLES_SCHEMA,
    )
    res = rdf2smw_pipeline(rd.from_arrow(t), resolver_concurrency=2)
    titles = set(res["content"].to_pandas()["title"])
    assert "From Dcterms" in titles  # dcterms beats skos
    assert "Y Skos" in titles  # skos beats foaf


def test_ann_ivf_partial_probe_recall():
    """IVF with nprobe=4/16 must recover most of the exact top-10 on
    the testdata embeddings (clustered corpus → high recall), and
    full probe must equal brute force exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rdf2smw_ray.pipelines.ann import ann_brute_topk, ann_ivf_topk

    sf = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    t = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.asarray(
        t.filter(pa.compute.equal(t["vec_id"], 0))["embedding"].to_pylist()[0],
        dtype=np.float64,
    )
    exact = ann_brute_topk(emb, q, k=10, concurrency=2)
    full = ann_ivf_topk(emb, q, k=10, n_lists=16, nprobe=16, concurrency=2)
    assert list(full["vec_id"]) == list(exact["vec_id"])
    partial = ann_ivf_topk(emb, q, k=10, n_lists=16, nprobe=4, concurrency=2)
    recall = len(set(partial["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.5, recall
