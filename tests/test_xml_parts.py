"""Per-partition XML parts sink + stitching."""

import os

import pytest

import ray.data as rd

from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
from rdf2smw_ray.sources.fixtures import fixture_triples
from rdf2smw_ray.state.checkpoint import stitch_xml_parts, write_xml_dump, write_xml_parts


def test_xml_parts_and_stitch(tmp_path):
    res = rdf2smw_pipeline(
        rd.from_arrow(fixture_triples(head_facts=10)), resolver_concurrency=2
    )
    parts_dir = str(tmp_path / "parts")
    summary = write_xml_parts(res["content"], parts_dir)
    assert summary["pages"] == res["content"].count()
    manifests = [f for f in os.listdir(parts_dir) if f.endswith(".xmlfrag.manifest.json")]
    assert len(manifests) == summary["parts"] > 0
    assert os.path.exists(os.path.join(parts_dir, "_run.manifest.json"))

    stitched = str(tmp_path / "pages.xml")
    stitch_xml_parts(parts_dir, stitched)
    direct = str(tmp_path / "direct.xml")
    write_xml_dump(res["content"], direct)
    # same framing; same page multiset (order may differ across parts)
    a, b = open(stitched).read(), open(direct).read()
    assert a.startswith("<mediawiki>\n") and a.rstrip().endswith("</mediawiki>")
    assert sorted(a.split("<page>")) == sorted(b.split("<page>"))
