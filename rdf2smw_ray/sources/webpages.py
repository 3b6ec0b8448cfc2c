"""Synthetic Common-Crawl-style web pages (BASELINE.json input_hint).

Deterministic generator: every page derives purely from ``doc_id``
arithmetic (seed-free, wall-clock-free), so any scale factor produces
the same pages at any parallelism. Each page's ``text`` contains
grammar sentences that the pattern extractor
(stages/extract_triples.py) can parse into a rich knowledge graph —
entity labels, rdf:type statements, a subclass chain, literal facts —
plus the source document's word-salad as boilerplate. ``html`` wraps
``text`` in a fixed envelope with nav/script/style noise such that
``extract_text(html) == text`` byte-identically (the per-url invariant
from BASELINE.json input_hint).

Skew: EVERY page mentions Entity_0 (``refers to`` sentence), making it
a head entity whose groupby(subject) group grows with corpus size —
the case the salted fold exists for.
"""

from __future__ import annotations

import html as html_mod

import numpy as np
import pandas as pa_pd
import pyarrow as pa

from rdf2smw_ray.schemas import WEB_PAGES_SCHEMA

_EPOCH_US = 1_600_000_000_000_000  # fixed epoch (2020-09-13T12:26:40Z)

N_CLASSES = 8
_ENT_MOD = 1009  # prime modulo for entity ids


def grammar_sentences(doc_id: int) -> list[str]:
    """The deterministic statement set for one page."""
    d = int(doc_id)
    e1 = (3 * d) % _ENT_MOD
    e2 = (3 * d + 1) % _ENT_MOD
    k = e1 % N_CLASSES
    sents = [
        f'Entity_{e1} is known as "Ent {e1} Label".',
        f"Entity_{e1} is a Class_{k}.",
        f"Entity_{e1} works with Entity_{e2}.",
        f"Entity_{e1} has size {d % 100}.",
        f"Entity_{e1} refers to Entity_0.",  # head-entity skew
    ]
    if d % 11 < N_CLASSES - 1:
        c = d % 11
        sents.append(f"Class_{c} is a subtype of Class_{c + 1}.")
    if d % 20 == 0:
        sents.append(f'Class_{k} is known as "Klass {k}".')
    if d % 50 == 0:
        sents.append('Entity_0 is known as "The Hub".')
        sents.append("Entity_0 is a Class_0.")
    return sents


_HTML_PREFIX = (
    "<html><head><title>Synthetic page</title>"
    "<script>var tracker = 1;</script>"
    "<style>.nav{color:#333}</style></head>\n"
    "<body><nav><ul><li><a href=\"/\">Home</a></li>"
    "<li><a href=\"/about\">About</a></li></ul></nav>\n<main>"
)
_HTML_SUFFIX = "</main>\n<footer>&copy; 2020 Example Corp</footer></body></html>"


def wrap_html(text: str) -> bytes:
    """text → full html bytes; extract_text inverts this exactly."""
    return (_HTML_PREFIX + html_mod.escape(text, quote=False) + _HTML_SUFFIX).encode(
        "utf-8"
    )


def synth_batch(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id, text, lang, ...) → web_pages batch."""
    doc_ids = batch["doc_id"].to_numpy()
    boiler = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else ["en"] * len(doc_ids)
    urls, tss, htmls, texts = [], [], [], []
    for d, b in zip(doc_ids, boiler):
        d = int(d)
        text = "\n".join(grammar_sentences(d)) + "\n\n" + (b or "")
        urls.append(f"https://ex{d % 10}.org/page/{d}")
        tss.append(_EPOCH_US + d * 60_000_000)
        htmls.append(wrap_html(text))
        texts.append(text)
    return pa.Table.from_pydict(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=WEB_PAGES_SCHEMA,
    )


def synth_web_pages(documents_ds):
    """documents Dataset → web_pages Dataset (WEB_PAGES_SCHEMA)."""
    return documents_ds.map_batches(synth_batch, batch_format="pyarrow")


def page_texts(documents_ds):
    """documents Dataset → (doc_id, text) with the page-text formula
    (grammar sentences + blank line + boilerplate) but keyed by doc_id
    instead of url — the line-granularity ops run over this."""

    def _batch(batch: pa.Table) -> pa.Table:
        texts = [
            "\n".join(grammar_sentences(int(d))) + "\n\n" + (b or "")
            for d, b in zip(batch["doc_id"].to_numpy(), batch["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(texts, pa.string())}
        )

    return documents_ds.map_batches(_batch, batch_format="pyarrow")
