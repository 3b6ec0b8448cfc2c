"""Intra-corpus duplicated n-gram span statistics.

The per-document "how much of this text also appears elsewhere"
signal from exact-substring dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"), restated at token
n-gram granularity: an n-gram POSITION in a document is *duplicated*
when the same n-gram text occurs in at least one OTHER document.
Corpora keep the per-doc duplicated fraction as a quality feature and
filter or down-weight high-dup documents.

Scale shape (no broadcast — the dup-gram set is corpus-proportional,
unlike decontamination's bounded benchmark set):

1. per batch: flat (doc, gram) occurrence counts via ONE split pass +
   seam-masked adjacency joins (``decontam._flat_grams``); each
   document is a single row, so per-batch (doc, gram) counts are
   already global — the shuffle carries ≤1 row per (doc, gram);
2. ONE co-shuffle on ``hash(gram)``: inside a bucket the gram's
   document frequency and its per-doc attribution are both local —
   per doc the bucket emits partial (n_grams, dup_grams) sums;
3. a small groupby(doc_id) adds bucket partials; zero-gram documents
   (shorter than n tokens) are restored by a left join from the doc-id
   spine (``stages.join.bucketed_join``).

Driver state: none. Stages hold one gram-hash bucket at a time.

Scale note: the shuffle key is the gram TEXT (what the SQL oracle
groups by). At 100-TB scale swap it for a 128-bit digest of the gram
— the shape is unchanged and a birthday collision at 2^64 grams is
negligible; text is kept here because exactness against the oracle is
the point of the gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rdf2smw_ray.pipelines.decontam import _flat_grams


def dup_ngram_stats(docs, *, n: int = 5, num_buckets: int | None = None):
    """Dataset of (doc_id, n_grams, dup_grams, dup_pct): token n-gram
    positions per doc, positions whose gram occurs in ≥2 distinct
    docs, and the floor-integer percentage (exact BIGINT arithmetic —
    no float parity hazard)."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.stages.join import bucketed_join
    from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

    if num_buckets is None:
        num_buckets = auto_buckets(dataset_est_bytes(docs))

    def gram_counts(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx, grams = _flat_grams(texts, n)
        if not len(grams):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "__bucket": pa.array([], pa.int32()),
                }
            )
        g = (
            pd.DataFrame({"doc_id": ids[doc_idx], "gram": grams})
            .groupby(["doc_id", "gram"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        h = pd.util.hash_pandas_object(g["gram"], index=False).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "gram": pa.array(g["gram"].to_numpy(), pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
                "__bucket": pa.array(
                    (h % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        # document frequency per gram is complete inside its hash bucket
        nd = df.groupby("gram", sort=False)["doc_id"].transform("size")
        dup = np.where(nd.to_numpy() >= 2, df["cnt"].to_numpy(), 0)
        g = (
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(),
                    "n_grams": df["cnt"].to_numpy(),
                    "dup_grams": dup,
                }
            )
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "n_grams": pa.array(g["n_grams"].to_numpy(), pa.int64()),
                "dup_grams": pa.array(g["dup_grams"].to_numpy(), pa.int64()),
            }
        )

    import ray.data as rd

    per_doc = (
        docs.map_batches(gram_counts, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("n_grams", alias_name="n_grams"),
            Sum("dup_grams", alias_name="dup_grams"),
        )
    )
    # an all-short corpus leaves zero blocks -> schema None; a typed
    # empty union keeps the downstream join schema-stable
    per_doc = per_doc.union(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "dup_grams": pa.array([], pa.int64()),
                }
            )
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        ng = batch["n_grams"].to_numpy(zero_copy_only=False)
        dg = batch["dup_grams"].to_numpy(zero_copy_only=False)
        ng = np.nan_to_num(ng.astype(np.float64)).astype(np.int64)
        dg = np.nan_to_num(dg.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(ng, pa.int64()),
                "dup_grams": pa.array(dg, pa.int64()),
                "dup_pct": pa.array(dg * 100 // np.maximum(ng, 1), pa.int64()),
            }
        )

    # zero-gram docs (shorter than n tokens) re-enter via the doc-id spine
    spine = docs.select_columns(["doc_id"])
    joined = bucketed_join(
        spine,
        per_doc,
        key="doc_id",
        how="left",
        right_cols={"n_grams": "n_grams", "dup_grams": "dup_grams"},
    )
    return joined.map_batches(finalize, batch_format="pyarrow")


DUP_NGRAM_STATS_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
g AS (
  SELECT doc_id,
         [array_to_string(w[i:i+4], ' ') FOR i IN generate_series(1, len(w)-4)] AS gs
  FROM t
),
cnt AS (
  SELECT doc_id, gram, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(gs) AS gram FROM g) occ GROUP BY 1, 2
),
df AS (SELECT gram, COUNT(*) AS nd FROM cnt GROUP BY 1),
per AS (
  SELECT cnt.doc_id, SUM(cnt.c) AS n_grams,
         SUM(CASE WHEN df.nd >= 2 THEN cnt.c ELSE 0 END) AS dup_grams
  FROM cnt JOIN df USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.dup_grams, 0) AS BIGINT) AS dup_grams,
       CAST(COALESCE(p.dup_grams, 0) * 100 // GREATEST(COALESCE(p.n_grams, 0), 1)
            AS BIGINT) AS dup_pct
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY doc_id
"""
