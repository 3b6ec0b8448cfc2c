"""Context-window packing for LLM training data.

Two operators over the documents table:

- ``token_chunks``: split each doc into fixed-size overlapping token
  windows (window/stride) — the chunking step before tokenized
  training shards. Embarrassingly parallel; chunk boundaries are pure
  integer arithmetic so the DuckDB oracle reconstructs the identical
  chunk text by list slicing.

- ``sequence_packing``: assign each doc (in global doc_id order) to a
  fixed-capacity training sequence by cumulative token count — a
  DISTRIBUTED PREFIX SCAN: range-bucket by doc_id, local sums, one
  bounded driver-side exclusive scan over bucket totals, then a second
  local pass adds the bucket offset. No global sort, no whole-corpus
  task; driver state is O(num_buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def token_chunks(docs, *, window: int = 50, stride: int = 40):
    """(doc_id, chunk_idx, chunk_text) fixed windows; the tail chunk is
    shorter. Chunk i covers tokens [i*stride, min(i*stride+window, n))."""
    assert 0 < stride <= window

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_doc, out_idx, out_text = [], [], []
        for d, txt in zip(ids, texts):
            toks = (txt or "").split()
            n = len(toks)
            if n == 0:
                continue
            for i in range((n + stride - 1) // stride):
                s = i * stride
                out_doc.append(d)
                out_idx.append(i)
                out_text.append(" ".join(toks[s : s + window]))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_doc, dtype=np.int64), pa.int64()),
                "chunk_idx": pa.array(np.asarray(out_idx, dtype=np.int64), pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow")


TOKEN_CHUNKS_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
), c AS (
  SELECT doc_id, w, len(w) AS n,
         unnest(generate_series(0, (len(w) + 39) // 40 - 1)) AS i
  FROM t WHERE len(w) > 0
)
SELECT doc_id, i AS chunk_idx,
       array_to_string(w[i*40 + 1 : LEAST(i*40 + 50, n)], ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_idx
"""


def sequence_packing(docs, *, cap: int = 256, num_buckets: int | None = None):
    """(doc_id, seq_id): seq_id = (prefix_tokens_before_doc) // cap in
    doc_id order — linear sequence packing via distributed scan."""
    import ray
    from ray.data.aggregate import Max, Sum

    from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

    if num_buckets is None:
        num_buckets = auto_buckets(dataset_est_bytes(docs))

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        n = texts.str.split().str.len().to_numpy().astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    per_doc = docs.map_batches(counts, batch_format="pyarrow").materialize()
    max_id = int(per_doc.aggregate(Max("doc_id"))["max(doc_id)"])
    width = max(1, (max_id + num_buckets) // num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch["doc_id"].to_numpy(zero_copy_only=False) // width
        return batch.append_column(
            "__bucket", pa.array(b.astype(np.int32), pa.int32())
        )

    bucketed = per_doc.map_batches(add_bucket, batch_format="pyarrow")

    # pass 1: bucket totals → bounded driver exclusive scan
    totals = (
        bucketed.groupby("__bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("__bucket")
    )
    offs = dict(
        zip(
            totals["__bucket"].astype(int),
            np.concatenate(([0], totals["n"].to_numpy()[:-1].cumsum())).astype(
                np.int64
            ),
        )
    )
    offs_ref = ray.put(offs)

    # pass 2: local in-bucket cumsum + the bucket's global offset
    def assign(df: pd.DataFrame) -> pa.Table:
        base = ray.get(offs_ref)[int(df["__bucket"].iat[0])]
        df = df.sort_values("doc_id", kind="mergesort")
        n = df["n"].to_numpy()
        before = base + np.concatenate(([0], n[:-1].cumsum()))
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "seq_id": pa.array(before // cap, pa.int64()),
            }
        )

    return (
        bucketed.groupby("__bucket")
        .map_groups(assign, batch_format="pandas")
    )


SEQUENCE_PACKING_SQL = r"""
WITH t AS (
  SELECT doc_id, len(string_split_regex(text, '\s+')) AS n FROM documents
), s AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS run
  FROM t
)
SELECT doc_id, CAST((run - n) // 256 AS BIGINT) AS seq_id
FROM s ORDER BY doc_id
"""
