"""Text-analysis operators for training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All are stateless/actor ``map_batches`` stages, vectorized where the
kernel allows. Regex choices deliberately match what a DuckDB oracle
can express (``regexp_extract_all``) so the driver can value-check
them.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
_STOP_RE = re.compile(r"\b(" + "|".join(STOPWORDS) + r")\b")
PUNCT_RE = re.compile(r"[.!?,;:]")


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_chars, n_tokens."""
    texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
    n_tokens = texts.str.count(r"\S+").astype("int64")
    n_chars = texts.str.len().astype("int64")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        }
    )


def token_stats(docs):
    return docs.map_batches(token_stats_batch, batch_format="pyarrow")


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics: token count, mean token length, stopword
    ratio, punctuation ratio. All rounded to 6 decimals for stable
    cross-engine comparison."""
    texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
    n_tokens = texts.str.count(r"\S+").astype("int64")
    n_chars = texts.str.len().astype("int64")
    n_stop = texts.str.count(_STOP_RE).astype("int64")
    n_punct = texts.str.count(PUNCT_RE).astype("int64")
    denom_t = n_tokens.clip(lower=1).astype("float64")
    denom_c = n_chars.clip(lower=1).astype("float64")
    # mean token length = (chars - whitespace) / tokens
    n_ws = texts.str.count(r"\s").astype("int64")
    avg_token_len = ((n_chars - n_ws) / denom_t).round(6)
    stop_ratio = (n_stop / denom_t).round(6)
    punct_ratio = (n_punct / denom_c).round(6)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "avg_token_len": pa.array(avg_token_len, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
        }
    )


def quality_score(docs):
    return docs.map_batches(quality_score_batch, batch_format="pyarrow")


def normalize_text_batch(batch: pa.Table) -> pa.Table:
    """Text normalization: lowercase, collapse whitespace runs, strip —
    the canonical pre-tokenization cleanup for training corpora."""
    texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
    norm = (
        texts.str.lower()
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )
    return pa.table(
        {"doc_id": batch["doc_id"], "norm_text": pa.array(norm, pa.string())}
    )


def normalize_text(docs):
    return docs.map_batches(normalize_text_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Language ID — tiny stopword-profile heuristic (no external models in
# this environment; the plumbing — actor pool with profiles compiled
# once — is the scale-relevant part).
# ---------------------------------------------------------------------------
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour"),
}


class LangId:
    """Actor stage: profiles compiled once per actor."""

    def __init__(self):
        self.profiles = {
            lang: re.compile(r"\b(" + "|".join(words) + r")\b")
            for lang, words in LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        scores = {
            lang: texts.str.count(rx).to_numpy()
            for lang, rx in self.profiles.items()
        }
        langs = list(scores)
        mat = np.stack([scores[l] for l in langs], axis=1)
        best = mat.argmax(axis=1)
        none = mat.max(axis=1) == 0
        pred = np.array(langs, dtype=object)[best]
        pred[none] = "und"
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred, pa.string())}
        )


def lang_id(docs, *, concurrency=4):
    from rdf2smw_ray.util import pool

    return docs.map_batches(
        LangId, batch_format="pyarrow", concurrency=pool(concurrency)
    )


# ---------------------------------------------------------------------------
# Document fingerprint — winnowing-style rolling hash (Rabin-Karp over
# token hashes, minimum over windows). Deterministic.
# ---------------------------------------------------------------------------
_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def fingerprint_text(text: str, window: int = 4) -> int:
    toks = TOKEN_RE.findall(text)
    if not toks:
        return 0
    import hashlib

    hs = [
        int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        for t in toks
    ]
    if len(hs) < window:
        window = len(hs)
    best = None
    acc = 0
    power = pow(_FP_BASE, window - 1, _FP_MOD)
    for i, h in enumerate(hs):
        acc = (acc * _FP_BASE + h) % _FP_MOD
        if i >= window:
            acc = (acc - hs[i - window] * power * _FP_BASE) % _FP_MOD
        if i >= window - 1:
            best = acc if best is None or acc < best else best
    return best if best is not None else 0


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    fps = [fingerprint_text(t or "") for t in batch["text"].to_pylist()]
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.uint64())}
    )


def fingerprints(docs):
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")
