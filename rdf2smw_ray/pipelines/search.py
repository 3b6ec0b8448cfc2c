"""BM25 keyword retrieval over the documents table — the lexical half
of a similarity-search stack (ANN over embeddings lives in ann.py).

Two streamed passes, both combiner-first:
1. corpus-stats pass — ONE map_batches emits per-query-term
   docs-containing counts plus a marker row carrying (n_docs,
   total_tokens); a tiny groupby-sum reduces it to |terms|+1 rows on
   the driver (query terms are a handful BY NATURE — this is the
   broadcast-small-side pattern, not a vocabulary shuffle).
2. scoring pass — per batch: explode tokens, mask to query terms, per
   (doc, term) tf via one groupby, vectorized BM25, local top-k; the
   global merge sorts k·n_batches rows (driver-small).

Scores are ranked on ROUND(score, 6) with doc_id tie-break so the
ordering (and the top-k row SET) is identical in numpy and the DuckDB
oracle regardless of last-ulp float noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_STATS_KEY = "\x00stats"


def _term_stats(docs, terms: tuple[str, ...], text_col: str):
    """One pass → {term: df} + (n_docs, total_tokens)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[text_col].to_pylist(), dtype=object).fillna("")
        toks = texts.str.split()
        counts = toks.map(len).to_numpy()
        flat = np.concatenate([t for t in toks if t] or [[]]).astype(object)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        mask = pd.Series(flat).isin(terms).to_numpy() if len(flat) else np.array([], bool)
        hit = pd.DataFrame({"d": doc_idx[mask], "t": flat[mask]})
        # docs containing each term, within this batch
        d_per_term = hit.drop_duplicates().groupby("t", sort=False).size()
        out_terms = list(d_per_term.index) + [_STATS_KEY, _STATS_KEY + "n"]
        out_vals = list(d_per_term.to_numpy()) + [int(counts.sum()), len(texts)]
        return pa.table(
            {
                "term": pa.array(out_terms, pa.string()),
                "v": pa.array(np.asarray(out_vals, dtype=np.int64), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    m = dict(zip(agg["term"], agg["v"]))
    total_tokens = int(m.pop(_STATS_KEY, 0))
    n_docs = int(m.pop(_STATS_KEY + "n", 0))
    return m, n_docs, total_tokens


def bm25_topk(
    docs,
    terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Top-k docs by BM25 (Lucene idf form: ln((N-df+.5)/(df+.5)+1)).
    Returns a driver-small DataFrame (doc_id, score)."""
    terms_t = tuple(dict.fromkeys(terms))
    if any(t.startswith("\x00") for t in terms_t):
        raise ValueError("query terms may not start with NUL (stats marker)")
    df_map, n_docs, total_tokens = _term_stats(docs, terms_t, text_col)
    if n_docs == 0 or not df_map:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")})
    avgdl = total_tokens / n_docs
    idf = {
        t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
        for t, d in df_map.items()
    }

    def score_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = pd.Series(batch[text_col].to_pylist(), dtype=object).fillna("")
        toks = texts.str.split()
        dl = toks.map(len).to_numpy().astype(np.float64)
        flat = np.concatenate([t for t in toks if t] or [[]]).astype(object)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), toks.map(len).to_numpy())
        mask = pd.Series(flat).isin(idf).to_numpy() if len(flat) else np.array([], bool)
        tf = (
            pd.DataFrame({"d": doc_idx[mask], "t": flat[mask]})
            .groupby(["d", "t"], sort=False)
            .size()
            .reset_index(name="c")
        )
        if not len(tf):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        c = tf["c"].to_numpy().astype(np.float64)
        d = tf["d"].to_numpy()
        w = tf["t"].map(idf).to_numpy().astype(np.float64)
        norm = k1 * (1.0 - b + b * dl[d] / avgdl)
        contrib = w * (c * (k1 + 1.0)) / (c + norm)
        s = pd.Series(contrib).groupby(d).sum()
        out = pd.DataFrame(
            {"doc_id": ids[s.index].astype(np.int64), "score": s.to_numpy().round(6)}
        )
        out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = docs.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    if "doc_id" not in partials.columns:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")})
    return (
        partials.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
