"""Robust real-HTML extractor (stages/html_text.py): cases the
regex-inverse extractor cannot handle, plus agreement with the
synthetic envelope."""

import numpy as np
import pyarrow as pa

from rdf2smw_ray.stages.html_text import robust_extract_text


def test_attributes_containing_gt():
    html = b'<body><p><a title="a > b" href="/x">link text</a></p></body>'
    out = robust_extract_text(html)
    assert out == "link text"
    assert "a > b" not in out


def test_comments_with_markup_dropped():
    html = b"<body><p>keep</p><!-- <p>hidden</p> --><p>also</p></body>"
    assert robust_extract_text(html) == "keep\nalso"


def test_script_style_noscript_dropped():
    html = (
        b"<body><script>var x = '<p>no</p>';</script>"
        b"<style>p::before{content:'<b>no</b>'}</style>"
        b"<noscript><p>enable js</p></noscript><p>yes</p></body>"
    )
    assert robust_extract_text(html) == "yes"


def test_boilerplate_elements_dropped_anywhere():
    html = (
        b"<body><div><nav>Home About</nav><p>content</p>"
        b"<footer>&copy; corp</footer></div>"
        b"<aside>related</aside></body>"
    )
    out = robust_extract_text(html)
    assert out == "content"


def test_main_preferred_over_body():
    html = (
        b"<body><p>outside</p><main><p>inside one</p></main>"
        b"<p>between</p><article><p>inside two</p></article></body>"
    )
    out = robust_extract_text(html)
    assert out == "inside one\ninside two"
    # without main preference the whole cleaned body is kept
    out_all = robust_extract_text(html, prefer_main=False)
    assert out_all == "outside\ninside one\nbetween\ninside two"


def test_entities_named_and_numeric():
    html = b"<body><p>caf&eacute; &amp; bar &#x41;&#66; &lt;tag&gt;</p></body>"
    assert robust_extract_text(html) == "café & bar AB <tag>"


def test_malformed_markup_never_raises():
    cases = [
        b"<body><p>unclosed",
        b"</div></div><p>stray closers</p>",
        b"<body><p>bare & ampersand and <not-a-tag",
        b"<main><main>double nested</main>",
        b"",
        b"\xff\xfe garbage bytes <p>x</p>",
    ]
    for html in cases:
        robust_extract_text(html)  # must not raise
    assert robust_extract_text(b"<body><p>unclosed") == "unclosed"


def test_block_elements_break_lines_inline_do_not():
    html = (
        b"<body><h1>Title</h1><p>one <b>bold</b> <i>ital</i></p>"
        b"<ul><li>a</li><li>b</li></ul>line<br>break</body>"
    )
    out = robust_extract_text(html)
    assert out.split("\n") == ["Title", "one bold ital", "a", "b", "line", "break"]


def test_whitespace_normalization():
    html = b"<body><p>  a\t\tb  </p><div></div><div></div><p>c</p></body>"
    assert robust_extract_text(html) == "a b\nc"


def test_agrees_with_synthetic_envelope():
    """On generator pages the robust engine recovers the same content
    as the byte-exact inverse, modulo its documented normalization."""
    from rdf2smw_ray.sources.webpages import synth_batch
    from rdf2smw_ray.stages.extract_text import extract_text_bytes
    from rdf2smw_ray.stages.html_text import _normalize

    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(50, dtype=np.int64)),
            "text": pa.array(
                [f"word salad {i} with  spacing\nand lines" for i in range(50)]
            ),
            "lang": pa.array(["en"] * 50),
        }
    )
    pages = synth_batch(batch)
    for html in pages["html"].to_pylist():
        exact = extract_text_bytes(html)
        robust = robust_extract_text(html)
        assert robust == _normalize(exact)


def test_dataset_stage_engine_robust(ray_session):
    import ray.data as rd

    from rdf2smw_ray.stages.extract_text import extract_text

    rows = [
        {"url": "http://a", "html": b"<body><main><p>alpha</p></main></body>"},
        {"url": "http://b", "html": b'<body><p><a title="x > y">beta</a></p></body>'},
    ]
    ds = rd.from_items(rows)
    out = {r["url"]: r["text"] for r in extract_text(ds, engine="robust").take_all()}
    assert out == {"http://a": "alpha", "http://b": "beta"}
