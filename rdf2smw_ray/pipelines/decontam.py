"""Benchmark decontamination: flag training documents sharing any
token n-gram with a benchmark/eval set — the standard pre-training
hygiene pass (the GPT-3/PaLM papers use 8–13-gram overlap).

Scale shape: the benchmark side is small BY NATURE (eval sets are
thousands of documents, not billions), so its n-gram set is built with
one streamed pass (per-batch dedup combiner) and broadcast ONCE via
``ray.put``; the corpus-proportional training side streams through a
``map_batches`` membership test — no shuffle at all. Membership is one
vectorized ``Series.isin`` over the batch's flat gram frame plus a
``bincount`` per doc, not a per-doc Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _flat_grams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, gram) flat arrays for all n-gram positions in a
    batch: one split pass, seam-masked adjacency joins — vectorized."""
    toks = texts.str.split()
    counts = toks.map(len).to_numpy()
    n_docs = len(texts)
    flat = np.concatenate([t for t in toks if t] or [[]]).astype(object)
    if len(flat) < n:
        return np.array([], dtype=np.int64), np.array([], dtype=object)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    # a gram starting at position i is valid iff positions i..i+n-1
    # are all in the same doc
    valid = doc_idx[: len(flat) - n + 1] == doc_idx[n - 1 :]
    gram = pd.Series(flat[: len(flat) - n + 1])
    for t in range(1, n):
        gram = gram + " " + pd.Series(flat[t : len(flat) - n + 1 + t])
    return doc_idx[: len(flat) - n + 1][valid], gram.to_numpy()[valid]


def benchmark_ngrams(bench_docs, *, n: int = 13) -> frozenset:
    """Distinct token n-grams of the benchmark set: per-batch dedup
    combiner, union on the driver (benchmark-proportional — bounded by
    the eval suite's size, never by the corpus)."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        _, grams = _flat_grams(texts, n)
        return pa.table({"gram": pa.array(pd.unique(grams), pa.string())})

    out = bench_docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "gram" not in out.columns:  # every batch was shorter than n tokens
        return frozenset()
    return frozenset(out["gram"])


def decontaminate(docs, *, bench_source: str, n: int = 13):
    """Per training doc (source != bench_source): number of token
    n-gram positions that also occur in the benchmark (source ==
    bench_source), and a contaminated flag. Returns a Dataset of
    (doc_id, n_hits, contaminated) — downstream drops flagged docs.
    """
    import ray

    bench = docs.map_batches(
        lambda t, s=bench_source: t.filter(pc.equal(t["source"], s)),
        batch_format="pyarrow",
    )
    train = docs.map_batches(
        lambda t, s=bench_source: t.filter(pc.not_equal(t["source"], s)),
        batch_format="pyarrow",
    )
    ref = ray.put(benchmark_ngrams(bench, n=n))

    def score(batch: pa.Table) -> pa.Table:
        grams_set = ray.get(ref)
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        doc_idx, grams = _flat_grams(texts, n)
        hits = np.zeros(len(texts), dtype=np.int64)
        if len(grams):
            hit = pd.Series(grams).isin(grams_set).to_numpy()
            hits = np.bincount(doc_idx[hit], minlength=len(texts)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(hits > 0, pa.bool_()),
            }
        )

    return train.map_batches(score, batch_format="pyarrow")
