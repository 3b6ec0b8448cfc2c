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


def decontaminate_distributed(docs, *, bench_source: str, n: int = 13):
    """Same contract as :func:`decontaminate`, but the benchmark n-gram
    set is NEVER collected to the driver — the path for an eval suite
    too large to broadcast (or a corpus-vs-corpus overlap audit).

    Shape: both sides explode to gram rows (training side keeps
    (doc_id, gram) with a per-batch (doc, gram)→count combiner so
    repeated grams inside a doc shuffle once), then ONE bucketed
    semi-join on the gram key keeps training gram rows that exist in
    the benchmark, and a groupby(doc_id) sum yields per-doc hit
    counts; docs with no hits are restored by a left join against the
    training doc ids."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from rdf2smw_ray.stages.join import bucketed_join

    bench = docs.map_batches(
        lambda t, s=bench_source: t.filter(pc.equal(t["source"], s)),
        batch_format="pyarrow",
    )
    train = docs.map_batches(
        lambda t, s=bench_source: t.filter(pc.not_equal(t["source"], s)),
        batch_format="pyarrow",
    )

    def bench_grams(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        _, grams = _flat_grams(texts, n)
        return pa.table({"gram": pa.array(pd.unique(grams), pa.string())})

    def train_grams(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        doc_idx, grams = _flat_grams(texts, n)
        g = (
            pd.DataFrame({"doc_id": ids[doc_idx], "gram": grams})
            .groupby(["doc_id", "gram"], sort=False)
            .size()
            .rename("n_pos")
            .reset_index()
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "gram": pa.array(g["gram"].to_numpy(), pa.string()),
                "n_pos": pa.array(g["n_pos"].to_numpy(), pa.int64()),
            }
        )

    hits = bucketed_join(
        train.map_batches(train_grams, batch_format="pyarrow"),
        bench.map_batches(bench_grams, batch_format="pyarrow"),
        key="gram",
        how="semi",
    )

    def hit_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("doc_id", sort=False)["n_pos"].sum()
        return pa.table(
            {
                "doc_id": pa.array(g.index.to_numpy(), pa.int64()),
                "n_hits": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    per_doc_hits = (
        hits.map_batches(hit_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_hits", alias_name="n_hits"))
    )
    train_ids = train.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )
    joined = bucketed_join(
        train_ids, per_doc_hits, key="doc_id", how="left", right_cols={"n_hits": "n_hits"}
    )

    def finalize(batch: pa.Table) -> pa.Table:
        hitsv = batch["n_hits"].to_pandas().fillna(0).astype("int64").to_numpy()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pa.array(hitsv, pa.int64()),
                "contaminated": pa.array(hitsv > 0, pa.bool_()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")
