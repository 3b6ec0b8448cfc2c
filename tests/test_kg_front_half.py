"""Front-half tests: synthetic web pages, byte-identical text
extraction, pattern triple extraction, full-KG end-to-end."""

import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.sources.webpages import (
    grammar_sentences,
    synth_batch,
    synth_web_pages,
    wrap_html,
)
from rdf2smw_ray.stages.extract_text import HtmlTextExtractor, extract_text_bytes
from rdf2smw_ray.stages.extract_triples import (
    CLASS_NS,
    ENTITY_NS,
    PROP_NS,
    RDF_TYPE,
    RDFS_LABEL,
    RDFS_SUBCLASS,
    PatternTripleExtractor,
    url_seq_base,
)


def _docs_table(n=20):
    return pa.table(
        {
            "doc_id": list(range(n)),
            "text": [f"boiler words {i}" for i in range(n)],
            "lang": ["en"] * n,
        }
    )


def test_extract_text_inverts_wrap_html():
    for text in [
        "plain line",
        'with "quotes" & ampersand <angle> brackets',
        "multi\nline\n\ntext",
        "unicode: ünïcode 😀",
    ]:
        assert extract_text_bytes(wrap_html(text)) == text


def test_extract_text_byte_identical_per_url():
    pages = synth_batch(_docs_table(50))
    texts1 = [extract_text_bytes(h) for h in pages["html"].to_pylist()]
    texts2 = [extract_text_bytes(h) for h in pages["html"].to_pylist()]
    assert texts1 == texts2
    assert texts1 == pages["text"].to_pylist()


def test_extract_text_fallback_body_and_plain():
    assert extract_text_bytes(b"<body>Hi <b>there</b></body>") == "Hi there"
    assert extract_text_bytes(b"no tags at all") == "no tags at all"
    assert (
        extract_text_bytes(b"<body>keep<script>drop()</script>it</body>") == "keepit"
    )


def test_pattern_extractor_rules():
    ex = PatternTripleExtractor()
    text = "\n".join(
        [
            'Entity_5 is known as "Ent Five".',
            "Entity_5 is a Class_2.",
            "Entity_5 works with Entity_6.",
            "Entity_5 has size 42.",
            "Class_2 is a subtype of Class_3.",
            "not a statement line",
        ]
    )
    rows = ex.extract_page("https://x.org/p", text)
    spo = [(r[0], r[1], r[2]) for r in rows]
    assert (ENTITY_NS + "Entity_5", RDFS_LABEL, "Ent Five") in spo
    assert (ENTITY_NS + "Entity_5", RDF_TYPE, CLASS_NS + "Class_2") in spo
    assert (CLASS_NS + "Class_2", RDF_TYPE, "http://www.w3.org/2002/07/owl#Class") in spo
    assert (ENTITY_NS + "Entity_5", PROP_NS + "works_with", ENTITY_NS + "Entity_6") in spo
    assert (ENTITY_NS + "Entity_5", PROP_NS + "has_size", "42") in spo
    assert (CLASS_NS + "Class_2", RDFS_SUBCLASS, CLASS_NS + "Class_3") in spo
    # within-page order: seq strictly increasing from the url base
    seqs = [r[5] for r in rows]
    assert seqs == sorted(seqs)
    assert seqs[0] == url_seq_base("https://x.org/p")


def test_pattern_order_subtype_before_is_a():
    ex = PatternTripleExtractor()
    rows = ex.extract_page("u", "Class_1 is a subtype of Class_2.")
    preds = {r[1] for r in rows}
    assert RDFS_SUBCLASS in preds
    assert RDF_TYPE in preds  # ontology induction only
    assert not any(r[0].startswith(ENTITY_NS) for r in rows)


def test_kg_pipeline_end_to_end():
    from rdf2smw_ray.pipelines.kg import kg_pipeline

    docs = rd.from_arrow(_docs_table(40))
    pages = synth_web_pages(docs)
    out = kg_pipeline(pages, concurrency=2)
    n_pages = out["pages"].count()
    assert n_pages > 0
    content = out["content"].to_pandas()
    # the head entity (mentioned by every page) exists exactly once
    hub = content[content["subj"] == ENTITY_NS + "Entity_0"]
    assert len(hub) == 1
    # title = earliest label by (priority, seq): doc 0 labels Entity_0
    # "Ent 0 Label" before "The Hub" on the same page
    assert hub["title"].iloc[0] == "Ent 0 Label"
    # classes became Category pages
    assert content["title"].str.startswith("Category:").any()
    props = out["properties"].to_pandas()
    assert set(props["title"]) >= {
        "Property:Works_with",
        "Property:Has_size",
        "Property:Refers_to",
        "Property:Label",
        "Property:Type",
    }


def test_flagship_parallelism_invariance():
    """Same pages, different block structure → identical fact sets."""
    from rdf2smw_ray.pipelines.kg import kg_pipeline

    docs1 = rd.from_arrow(_docs_table(30))
    docs2 = rd.from_arrow(_docs_table(30)).repartition(7)

    def fact_set(out):
        res = set()
        for stream in ("content", "properties"):
            for _, r in out[stream].to_pandas().iterrows():
                for f in r["facts"]:
                    res.add((r["title"], f["property"], f["value"]))
        return res

    s1 = fact_set(kg_pipeline(synth_web_pages(docs1), concurrency=2))
    s2 = fact_set(kg_pipeline(synth_web_pages(docs2), concurrency=2))
    assert s1 == s2
