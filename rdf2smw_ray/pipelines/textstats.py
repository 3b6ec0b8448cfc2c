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

from rdf2smw_ray.util import table_from_pandas

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


# GPT-2-style pre-tokenizer pattern, restricted to constructs RE2 also
# supports (no lookahead) so the DuckDB oracle runs the SAME pattern:
# contractions | space+letters | space+digits | space+other | whitespace runs
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
_BPE_RE = re.compile(BPE_PATTERN)


def bpe_token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_bpe_tokens — token counting under a BPE-ish
    pre-tokenizer regex (the whitespace+punct split a trainer's token
    accounting uses), vectorized via one C-regex count per batch."""
    texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
    n = texts.str.count(_BPE_RE).astype("int64")
    return pa.table(
        {"doc_id": batch["doc_id"], "n_bpe_tokens": pa.array(n, pa.int64())}
    )


def bpe_token_stats(docs):
    return docs.map_batches(bpe_token_stats_batch, batch_format="pyarrow")


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
# Deterministic sampling — hash-gate on a stable key. The same rows are
# kept at ANY parallelism, on reruns, and by the SQL oracle (md5 is the
# shared hash). The canonical "take x% of the corpus" trainer op.
# ---------------------------------------------------------------------------
def deterministic_sample(ds, key: str = "doc_id", *, rate_hex: str = "33"):
    """Keep rows whose ``md5(str(key))`` starts below ``rate_hex``
    (two hex chars → rate = int(rate_hex,16)/256; "33" ≈ 20%)."""
    import hashlib

    def keep(batch: pa.Table) -> pa.Table:
        keys = pd.Series(batch[key].to_pylist())
        mask = keys.map(
            lambda v: hashlib.md5(str(v).encode()).hexdigest()[:2] < rate_hex
        )
        return batch.filter(pa.array(mask.to_numpy()))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Corpus n-gram statistics — combiner-first heavy hitters.
# ---------------------------------------------------------------------------
def top_bigrams(docs, *, k: int = 20):
    """Top-k corpus bigrams by count: per-batch bigram counting
    (combiner — only distinct (bigram, n) rows shuffle), groupby sum,
    per-batch local top-k, tiny driver merge."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        toks = texts.str.split()
        flat = []
        for t in toks:
            flat.extend(f"{a} {b}" for a, b in zip(t, t[1:]))
        if not flat:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        vc = pd.Series(flat, dtype=object).value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    summed = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return table_from_pandas(
            df.sort_values(["n", "bigram"], ascending=[False, True]).head(k),
            preserve_index=False,
        )

    out = summed.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["n", "bigram"], ascending=[False, True]).head(k)
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def tfidf_top_terms(docs, n_docs: int, *, k: int = 3, num_buckets: int | None = None):
    """Top-k TF-IDF terms per document (score = tf · ln(N/df), rounded
    to 6 decimals; ties broken by token ascending).

    100-TB shape: tf is computed inside the batch (a document's tokens
    live in its own row); df is the distinct-per-doc combiner +
    ``groupby(token).sum`` (same partial as :func:`token_doc_freq`,
    untruncated); tf and df meet in a bucketed co-shuffle on token (the
    vocabulary never sits on the driver); the per-doc top-k runs as a
    per-batch combiner (k best per doc per batch is a valid partial of
    the global per-doc top-k) followed by one coarse-bucketed final
    selection keyed by doc hash.
    """
    from ray.data.aggregate import Sum

    from rdf2smw_ray.stages.join import bucketed_join

    def tf_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        out_id, out_tok, out_tf = [], [], []
        for i, toks in zip(ids, texts.str.split()):
            if not toks:
                continue
            vc = pd.Series(toks, dtype=object).value_counts()
            out_id.extend([i] * len(vc))
            out_tok.extend(vc.index.tolist())
            out_tf.extend(vc.to_numpy().tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "token": pa.array(out_tok, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    def df_partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        flat: list[str] = []
        for t in texts.str.split():
            flat.extend(set(t))
        vc = pd.Series(flat, dtype=object).value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), pa.string()),
                "df": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    tf_rows = docs.map_batches(tf_partial, batch_format="pyarrow")
    df_rows = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )
    joined = bucketed_join(
        tf_rows,
        df_rows,
        key="token",
        how="inner",
        right_cols={"df": "df"},
        num_buckets=num_buckets,
    )

    def score_and_trim(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["score"] = np.round(
            df["tf"].to_numpy(np.float64)
            * np.log(float(n_docs) / df["df"].to_numpy(np.float64)),
            6,
        )
        best = (
            df.sort_values(["doc_id", "score", "token"], ascending=[True, False, True])
            .groupby("doc_id", sort=False)
            .head(k)
        )
        return table_from_pandas(
            best[["doc_id", "token", "score"]], preserve_index=False
        )

    trimmed = joined.map_batches(score_and_trim, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch["doc_id"].to_pandas().astype("int64"), index=False
        ).to_numpy()
        return batch.append_column(
            "__b", pa.array((h % 64).astype(np.int32), pa.int32())
        )

    def final_topk(df: pd.DataFrame) -> pa.Table:
        best = (
            df.sort_values(["doc_id", "score", "token"], ascending=[True, False, True])
            .groupby("doc_id", sort=False)
            .head(k)
        )
        return table_from_pandas(
            best[["doc_id", "token", "score"]], preserve_index=False
        )

    out = (
        trimmed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_id", "token"]).reset_index(drop=True)


def token_doc_freq(docs, *, k: int = 50):
    """Document frequency per token (distinct-per-doc combiner →
    groupby sum → top-k) — the idf building block."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        flat = []
        for t in texts.str.split():
            flat.extend(set(t))
        if not flat:
            return pa.table(
                {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        vc = pd.Series(flat, dtype=object).value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), pa.string()),
                "df": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    summed = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return table_from_pandas(
            df.sort_values(["df", "token"], ascending=[False, True]).head(k),
            preserve_index=False,
        )

    out = summed.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["df", "token"], ascending=[False, True]).head(k)
    out["df"] = out["df"].astype("int64")
    return out.reset_index(drop=True)


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
    """Scalar reference kernel (tests assert the vectorized batch
    kernel matches it exactly)."""
    toks = TOKEN_RE.findall(text)
    if not toks:
        return 0
    # same token-hash kernel as the batch path (dedup._hash64_tokens)
    # so the scalar-vs-batch equality test pins the ROLLING-HASH logic
    from rdf2smw_ray.pipelines.dedup import _hash64_tokens

    hs = [int(h) for h in _hash64_tokens(toks)]
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


# --- vectorized modular arithmetic over the Mersenne prime 2^61-1 ----------
_M61 = np.uint64(_FP_MOD)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for uint64 x (2^61 ≡ 1, so fold the top bits)."""
    y = (x >> np.uint64(61)) + (x & _M61)
    return np.where(y >= _M61, y - _M61, y)


def _mulmod61(a: np.ndarray, b) -> np.ndarray:
    """(a*b) mod (2^61-1), both < 2^61, in pure uint64 arithmetic:
    31-bit limb split keeps every partial product under 2^62."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    lo31 = np.uint64((1 << 31) - 1)
    a_hi, a_lo = a >> np.uint64(31), a & lo31
    b_hi, b_lo = b >> np.uint64(31), b & lo31
    # a*b = a_hi*b_hi*2^62 + (a_hi*b_lo + a_lo*b_hi)*2^31 + a_lo*b_lo
    t1 = _mod61(_mod61(a_hi * b_hi) << np.uint64(1))  # *2^62 ≡ *2
    mid = _mod61(a_hi * b_lo + a_lo * b_hi)
    # mid*2^31: split at bit 30 so the shifted limb stays under 2^61
    mid = _mod61((mid >> np.uint64(30)) + ((mid & np.uint64((1 << 30) - 1)) << np.uint64(31)))
    t3 = _mod61(a_lo * b_lo)
    return _mod61(t1 + mid + t3)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Batch-vectorized winnowing (round-1 fix #5): unique tokens
    hashed once, all window hashes computed as k shifted
    ``_mulmod61`` slices over the concatenated token-hash array,
    per-doc minimum via ``minimum.reduceat``. Docs shorter than the
    window fall back to the scalar kernel (rare). Values are exactly
    :func:`fingerprint_text` per row."""
    window = 4
    texts = batch["text"].to_pylist()
    toks_per_doc = [TOKEN_RE.findall(t or "") for t in texts]
    counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)

    short = (counts > 0) & (counts < window)
    for i in np.flatnonzero(short):
        out[i] = fingerprint_text(texts[i] or "", window)

    big = counts >= window
    if big.any():
        flat_tokens = [tok for toks in toks_per_doc for tok in toks]
        if flat_tokens:
            uniq, inv = np.unique(np.array(flat_tokens, dtype=object), return_inverse=True)
            from rdf2smw_ray.pipelines.dedup import _hash64_tokens

            flat = _mod61(_hash64_tokens(list(uniq))[inv])
            N = len(flat)
            powers = [
                np.uint64(pow(_FP_BASE, window - 1 - t, _FP_MOD)) for t in range(window)
            ]
            w = np.zeros(N - window + 1, dtype=np.uint64)
            for t in range(window):
                w = _mod61(w + _mulmod61(flat[t : N - window + 1 + t], powers[t]))
            # invalidate windows that cross a doc boundary
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            valid = doc_idx[: N - window + 1] == doc_idx[window - 1 :]
            w = np.where(valid, w, np.uint64(0xFFFFFFFFFFFFFFFF))
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            offs = np.clip(starts[big], 0, max(0, len(w) - 1))
            # segments are contiguous in w-space; cross-boundary slots
            # are max-sentinels so they never win the per-doc min
            out[big] = np.minimum.reduceat(w, offs)
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(out, pa.uint64())}
    )


def fingerprints(docs):
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Repetition quality signals (Gopher-style filters): the standard
# web-corpus repetition heuristics over whitespace tokens. One batch =
# one flat token frame; everything is pandas-C groupbys, no per-doc
# Python loop.
# ---------------------------------------------------------------------------
def _repetition_raw(texts: pd.Series):
    """Per-doc raw repetition counters over whitespace tokens:
    (n_tokens, max_token_count, n_unique_tokens, dup_2gram_positions,
    total_2gram_positions) as int64 arrays. One flat token frame per
    batch, pandas-C groupbys — no per-doc Python loop."""
    toks = texts.str.split()
    counts = toks.map(len).to_numpy()
    n_docs = len(texts)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    flat = np.concatenate([t for t in toks if t] or [[]]).astype(object)

    n = np.zeros(n_docs, dtype=np.int64)
    maxc = np.zeros(n_docs, dtype=np.int64)
    nuniq = np.zeros(n_docs, dtype=np.int64)
    dup = np.zeros(n_docs, dtype=np.int64)
    tot = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        df = pd.DataFrame({"d": doc_idx, "t": flat})
        tc = df.groupby(["d", "t"], sort=False).size()
        per_doc = tc.groupby(level=0)
        m, u, s = per_doc.max(), per_doc.size(), per_doc.sum()
        maxc[m.index] = m
        nuniq[u.index] = u
        n[s.index] = s

        # 2-grams: adjacent pairs within each doc (mask the seam
        # between consecutive docs in the flat array)
        if len(flat) > 1:
            same = doc_idx[:-1] == doc_idx[1:]
            g = pd.DataFrame(
                {
                    "d": doc_idx[:-1][same],
                    "g": pd.Series(flat[:-1][same]) + " " + pd.Series(flat[1:][same]),
                }
            )
            if len(g):
                gc = g.groupby(["d", "g"], sort=False).size()
                d = gc.where(gc > 1, 0).groupby(level=0).sum()
                t = gc.groupby(level=0).sum()
                dup[d.index] = d
                tot[t.index] = t
    return n, maxc, nuniq, dup, tot


def _safe_div(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.divide(a, b, out=np.zeros(len(a), dtype=np.float64), where=b > 0)


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, top_token_frac (most frequent token's share of all
    tokens), dup_2gram_frac (share of 2-gram positions whose 2-gram
    occurs more than once in the doc), unique_token_ratio. Rounded to
    6 decimals (cross-engine float contract)."""
    texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
    n, maxc, nuniq, dup, tot = _repetition_raw(texts)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "top_token_frac": pa.array(_safe_div(maxc, n).round(6), pa.float64()),
            "dup_2gram_frac": pa.array(_safe_div(dup, tot).round(6), pa.float64()),
            "unique_token_ratio": pa.array(_safe_div(nuniq, n).round(6), pa.float64()),
        }
    )


def repetition_stats(docs):
    return docs.map_batches(repetition_stats_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gopher-style composite quality filter: ordered first-failing-rule
# keep/drop decision. Thresholds compare UNROUNDED ratios (identical
# IEEE division in numpy and the SQL oracle — no cross-engine rounding
# hazard) and the output carries no floats at all, only the decision.
# ---------------------------------------------------------------------------
QUALITY_FILTER_RULES = {
    "min_tokens": 24,        # n_tokens < 24            -> too_short
    "max_top_token_frac": 0.125,   # maxc/n > 0.125     -> repetitive_token
    "max_dup_2gram_frac": 0.12,    # dup/tot > 0.12     -> repetitive_2gram
    "min_unique_ratio": 0.35,      # nuniq/n < 0.35     -> low_diversity
}


def quality_filter_batch(batch: pa.Table) -> pa.Table:
    """doc_id, keep (bool), reject_reason ('' when kept). Rules fire
    in a fixed order; the first failing rule names the reason."""
    texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
    n, maxc, nuniq, dup, tot = _repetition_raw(texts)
    r = QUALITY_FILTER_RULES
    reason = np.select(
        [
            n < r["min_tokens"],
            _safe_div(maxc, n) > r["max_top_token_frac"],
            _safe_div(dup, tot) > r["max_dup_2gram_frac"],
            _safe_div(nuniq, n) < r["min_unique_ratio"],
        ],
        ["too_short", "repetitive_token", "repetitive_2gram", "low_diversity"],
        default="",
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "keep": pa.array(reason == "", pa.bool_()),
            "reject_reason": pa.array(reason, pa.string()),
        }
    )


def quality_filter(docs):
    """Per-doc keep/drop + reason. A production run chains
    ``docs.filter`` on the kept ids (or inlines the mask) — returning
    the decision table keeps the op auditable (per-reason counts are
    one tiny groupby away)."""
    return docs.map_batches(quality_filter_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Unigram-LM scoring: the simplest corpus-level perplexity proxy a
# training-data pipeline runs (real pipelines swap in a KenLM; the
# two-pass shape — combiner-first frequency build, broadcast score
# table, streamed scoring pass — is identical).
# ---------------------------------------------------------------------------
def token_frequencies(docs):
    """Global (token, c) counts: per-batch value_counts combiner →
    groupby(token) sum. Returns the aggregated Dataset (one row per
    vocabulary entry — vocabulary-proportional, not corpus-
    proportional)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        vc = texts.str.split().explode().dropna().value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), pa.string()),
                "c": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
    )


def unigram_logprob(docs, *, max_vocab: int | None = None, oov_floor_count: float = 1.0):
    """doc_id, avg_logprob = mean over token positions of
    ln(count(token) / total_tokens), frequencies from the SAME corpus.
    The log-prob table is broadcast once (``ray.put``) and read per
    batch; scoring is a vectorized Series.map + groupby mean.

    ``max_vocab`` is the open-web scale path: the broadcast table keeps
    only the top-V tokens by (count desc, token asc) — selected with a
    per-batch local top-V combiner over the aggregated frequency
    Dataset, so the full vocabulary never sits on the driver — and
    out-of-table tokens score at the floor ln(oov_floor_count/total).
    With ``max_vocab=None`` every corpus token is in the table and the
    floor is unreachable (no OOV by construction)."""
    import ray

    freq = token_frequencies(docs)
    if max_vocab is None:
        fp = freq.to_pandas()
        total = float(fp["c"].sum())
    else:
        # consumed twice (total + top-V): materialize the bounded
        # vocabulary aggregate instead of re-running the corpus scan
        freq = freq.materialize()
        total = float(freq.sum("c"))

        def local_topv(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return table_from_pandas(
                df.sort_values(["c", "token"], ascending=[False, True]).head(max_vocab),
                preserve_index=False,
            )

        fp = freq.map_batches(local_topv, batch_format="pyarrow").to_pandas()
        fp = fp.sort_values(["c", "token"], ascending=[False, True]).head(max_vocab)
    logp = dict(zip(fp["token"], np.log(fp["c"].to_numpy() / total)))
    floor = float(np.log(oov_floor_count / total))
    ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        ids = batch["doc_id"]
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        toks = texts.str.split().explode().dropna()
        lp = toks.map(table).fillna(floor)
        mean = lp.groupby(level=0).mean().round(6)
        vals = np.full(len(ids), np.nan)
        vals[mean.index] = mean
        return pa.table(
            {"doc_id": ids, "avg_logprob": pa.array(vals, pa.float64())}
        )

    return docs.map_batches(score, batch_format="pyarrow")


def token_count_histogram(docs):
    """Counts-of-counts (the Zipf/vocabulary curve): how many distinct
    tokens occur exactly c times. Two-level aggregation — the
    token-frequency shuffle, then a per-batch value_counts combiner
    over c and a TINY second groupby (rows = distinct counts)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vc = pd.Series(batch["c"].to_numpy()).value_counts()
        return pa.table(
            {
                "c": pa.array(vc.index.to_numpy(), pa.int64()),
                "n_tokens": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    return (
        token_frequencies(docs)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
    )


# ---------------------------------------------------------------------------
# Source mixing (pretraining data weighting): per-source deterministic
# downsample rates — the "mixture" step that turns raw crawl + curated
# sources into a training blend. Same md5 gate as deterministic_sample
# so the kept set is identical at any parallelism and in SQL.
# ---------------------------------------------------------------------------
def mixture_sample(ds, rates_hex: dict, *, key: str = "doc_id", source_col: str = "source", default_hex: str = "00"):
    """Keep a row iff ``md5(str(key))[:2] < rates_hex[source]`` (two
    hex chars → rate ≈ int(h,16)/256; sources absent from the map use
    ``default_hex``, "00" = drop). The rates map is a handful of
    entries BY NATURE — it ships inside the task closure, no shuffle,
    no state."""
    import hashlib

    def keep(batch: pa.Table) -> pa.Table:
        keys = pd.Series(batch[key].to_pylist())
        cuts = pd.Series(batch[source_col].to_pylist()).map(
            lambda s: rates_hex.get(s, default_hex)
        )
        h = keys.map(lambda v: hashlib.md5(str(v).encode()).hexdigest()[:2])
        return batch.filter(pa.array((h < cuts).to_numpy()))

    return ds.map_batches(keep, batch_format="pyarrow")


def pmi_top_bigrams(docs, *, k: int = 20, min_count: int = 5):
    """Top-k collocations by pointwise mutual information:
    pmi = ln( (c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)) ), restricted to
    bigrams with at least ``min_count`` occurrences.

    Scale shape: unigram and bigram tables are combiner-first token
    shuffles; the min_count filter runs BEFORE the two bucketed
    co-shuffle joins that attach c_a and c_b (the vocabulary never
    sits on the driver); final selection is per-batch local top-k +
    a driver-small merge ranked on ROUND(pmi,6) with bigram
    tie-break."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.stages.join import bucketed_join

    def bigram_partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        toks = texts.str.split()
        flat = []
        for t in toks:
            flat.extend(f"{a} {b}" for a, b in zip(t, t[1:]))
        vc = pd.Series(flat, dtype=object).value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    # materialize the two vocabulary-proportional aggregates: each is
    # consumed twice (total + join/filter) and would otherwise re-run
    # its whole corpus-scan lineage per consumer
    freq = token_frequencies(docs).materialize()
    big = (
        docs.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    n_uni = float(freq.sum("c"))
    n_bi = float(big.sum("n"))

    def split_filter(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["n"] >= min_count]
        parts = df["bigram"].str.split(" ", n=1, expand=True)
        if len(df) == 0:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "tok1": pa.array([], pa.string()),
                    "tok2": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "bigram": pa.array(df["bigram"].to_numpy(), pa.string()),
                "n": pa.array(df["n"].to_numpy(), pa.int64()),
                "tok1": pa.array(parts[0].to_numpy(), pa.string()),
                "tok2": pa.array(parts[1].to_numpy(), pa.string()),
            }
        )

    cand = big.map_batches(split_filter, batch_format="pyarrow")
    j1 = bucketed_join(cand, freq, key="tok1", right_key="token", right_cols={"c": "ca"})
    j2 = bucketed_join(j1, freq, key="tok2", right_key="token", right_cols={"c": "cb"})

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = df["n"].to_numpy(dtype=np.float64) / n_bi
        y = (df["ca"].to_numpy(dtype=np.float64) / n_uni) * (
            df["cb"].to_numpy(dtype=np.float64) / n_uni
        )
        df["pmi"] = np.log(x / y).round(6)
        df = df.sort_values(["pmi", "bigram"], ascending=[False, True]).head(k)
        return table_from_pandas(
            df[["bigram", "n", "pmi"]].reset_index(drop=True), preserve_index=False
        )

    out = j2.map_batches(score, batch_format="pyarrow").to_pandas()
    if "bigram" not in out.columns:
        return pd.DataFrame(
            {
                "bigram": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "pmi": pd.Series([], dtype="float64"),
            }
        )
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["pmi", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def stratified_sample_k(docs, *, k: int = 5):
    """Deterministic stratified sample: the k docs with the smallest
    ``md5(str(doc_id))`` per source — reservoir-style fixed-k-per-group
    sampling with a rerun-stable, engine-independent order (the same
    md5 gate family as deterministic_sample). Combiner-first: each
    batch keeps its local k per source, so at most k × n_blocks rows
    per stratum reach the final per-group reduce. Strata here are the
    low-cardinality ``source`` column; for high-cardinality strata
    bucket the final reduce like stages/reduce.keyed_first."""
    import hashlib

    def _keep_k(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["source", "h", "doc_id"], kind="mergesort")
            .groupby("source", sort=False)
            .head(k)
        )

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select(["source", "doc_id"]).to_pandas()
        df["h"] = df["doc_id"].map(
            lambda v: hashlib.md5(str(v).encode()).hexdigest()
        )
        return table_from_pandas(_keep_k(df), preserve_index=False)

    def final(df: pd.DataFrame) -> pa.Table:
        out = _keep_k(df)[["source", "doc_id"]]
        return pa.table(
            {
                "source": pa.array(out["source"], pa.string()),
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            }
        )

    return (
        docs.map_batches(local, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


def top_tokens_per_lang(docs, *, k: int = 3) -> pd.DataFrame:
    """Grouped heavy hitters: the k most frequent tokens PER LANGUAGE
    (tie-break: token ascending) — the per-group variant of
    :func:`top_bigrams`'s global top-k. Combiner-first throughout:
    per-batch (lang, token) counts shuffle once, the per-lang top-k is
    taken locally per block after the global sum (≤ k·langs rows per
    block reach the final selection), and the final per-lang head-k is
    a groupby over those candidates — the corpus never sorts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        langs = pd.Series(batch["lang"].to_pylist(), dtype=object)
        toks = texts.str.split()
        counts = toks.map(len).to_numpy()
        if counts.sum() == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate([t for t in toks if t]).astype(object)
        lang_rep = np.repeat(langs.to_numpy(), counts)
        g = (
            pd.DataFrame({"lang": lang_rep, "token": flat})
            .groupby(["lang", "token"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"].to_numpy(), pa.string()),
                "token": pa.array(g["token"].to_numpy(), pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    summed = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n", "token"], ascending=[False, True])
        return table_from_pandas(
            df.groupby("lang", sort=False).head(k), preserve_index=False
        )

    out = summed.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["n", "token"], ascending=[False, True])
    out = out.groupby("lang", sort=False).head(k)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang", "token"]).reset_index(drop=True)


TOP_TOKENS_PER_LANG_SQL = r"""
WITH t AS (SELECT lang, string_split_regex(text, '\s+') AS w FROM documents),
c AS (
  SELECT lang, token, COUNT(*) AS n
  FROM (SELECT lang, unnest(w) AS token FROM t)
  WHERE token <> '' GROUP BY 1, 2
),
r AS (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rn
  FROM c
)
SELECT lang, token, CAST(n AS BIGINT) AS n
FROM r WHERE rn <= 3 ORDER BY lang, token
"""
