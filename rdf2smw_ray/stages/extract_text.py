"""HTML → main-content text extraction.

Actor-pool ``map_batches`` stage (regexes compiled once per actor in
``__init__``). The per-row invariant (BASELINE.json input_hint): the
extracted text is byte-identical per url across runs and parallelism
levels — guaranteed here because extraction is a pure function of the
html bytes (no wall-clock, no ambient state), and unit-tested against
the synthetic generator's inverse.

Extraction semantics: take the <main>…</main> region (boilerplate
removal — nav/header/footer are dropped), else fall back to <body>,
else the whole document; strip <script>/<style> subtrees, strip all
remaining tags, decode the standard HTML entities.
"""

from __future__ import annotations

import re

import pyarrow as pa

_MAIN_RE = re.compile(rb"<main[^>]*>(.*?)</main>", re.S | re.I)
_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.S | re.I)
_SCRIPT_RE = re.compile(rb"<(script|style)[^>]*>.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]+>")

_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&nbsp;", b" "),
    (b"&amp;", b"&"),  # must come last
]


def extract_text_bytes(html: bytes) -> str:
    m = _MAIN_RE.search(html)
    if m is None:
        m = _BODY_RE.search(html)
    region = m.group(1) if m is not None else html
    region = _SCRIPT_RE.sub(b"", region)
    region = _TAG_RE.sub(b"", region)
    for ent, ch in _ENTITIES:
        region = region.replace(ent, ch)
    return region.decode("utf-8", errors="replace")


class HtmlTextExtractor:
    """map_batches(HtmlTextExtractor, concurrency=N) — drops the heavy
    ``html`` column immediately after extraction (SURVEY.md §7.4)."""

    def __init__(self, output_column: str = "text", drop_html: bool = True):
        self.output_column = output_column
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text_bytes(h) for h in batch["html"].to_pylist()]
        if self.output_column in batch.column_names:
            batch = batch.drop_columns([self.output_column])
        out = batch.append_column(self.output_column, pa.array(texts, pa.string()))
        if self.drop_html and "html" in out.column_names:
            out = out.drop_columns(["html"])
        return out


_DEFAULT_EXTRACTOR = HtmlTextExtractor()


def _extract_batch(batch: pa.Table) -> pa.Table:
    return _DEFAULT_EXTRACTOR(batch)


def _extract_batch_robust(batch: pa.Table) -> pa.Table:
    from rdf2smw_ray.stages.html_text import RobustHtmlTextExtractor

    return RobustHtmlTextExtractor()(batch)


def extract_text(
    web_pages,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    engine: str = "synthetic",
):
    """web_pages Dataset → same rows with ``text`` re-derived from
    ``html`` and the html column dropped. Small batch_size: html rows
    are wide (binary payloads).

    ``engine="synthetic"`` (default): the byte-exact inverse of the
    synthetic page envelope — the bench/driver contract.
    ``engine="robust"``: the tolerant real-HTML tokenizer
    (:mod:`rdf2smw_ray.stages.html_text`) for pages not produced by
    the synthetic generator.

    Runs as stateless tasks by default — the extractor state (a few
    compiled regexes) lives at module level, built once per worker
    process, and Ray reuses warm workers across stages, so tasks avoid
    the actor-pool spawn burst. Pass ``concurrency`` to force an actor
    pool (the right shape once the extractor loads real models)."""
    from rdf2smw_ray.util import pool

    if engine == "robust":
        from rdf2smw_ray.stages.html_text import RobustHtmlTextExtractor

        fn, cls = _extract_batch_robust, RobustHtmlTextExtractor
    else:
        fn, cls = _extract_batch, HtmlTextExtractor
    if concurrency is None:
        return web_pages.map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size
        )
    return web_pages.map_batches(
        cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )
