"""Corpus health report: the one-row-per-metric audit a training-data
pipeline publishes after ingest — corpus size, token volume, language
spread, benchmark contamination, quality-filter failures, duplicated
n-gram mass. Integrates five of the engine's operator families into a
single exact-integer result set (every metric is a BIGINT; the ratio
metric is a per-mille floor division, so the whole report hash-checks
against SQL).

Every metric reduces to O(1) rows BEFORE leaving its pipeline: counts
are per-batch partial sums + one aggregate; nothing docs-proportional
reaches the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _count_rows(ds) -> int:
    return int(ds.count())


def _sum_metric(ds, fn) -> int:
    """One partial-count pass: fn(batch) -> int, summed exactly."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"c": pa.array([int(fn(batch))], pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow").aggregate(Sum("c"))
    return int(out["sum(c)"] or 0)


def corpus_report(sf_dir: str) -> pd.DataFrame:
    from rdf2smw_ray.pipelines.decontam import decontaminate
    from rdf2smw_ray.pipelines.io_cache import cached_table
    from rdf2smw_ray.pipelines.spans import dup_ngram_stats
    from rdf2smw_ray.pipelines.textstats import quality_filter

    docs = cached_table(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    text_only = docs.select_columns(["doc_id", "text"])

    n_docs = _count_rows(docs)
    total_tokens = _sum_metric(
        text_only,
        lambda b: int(
            pd.Series(b["text"].to_pylist(), dtype=object)
            .fillna("")
            .str.split()
            .map(len)
            .sum()
        ),
    )
    n_langs = _count_rows(docs.select_columns(["lang"]).groupby("lang").count())
    contaminated = _sum_metric(
        decontaminate(
            docs.select_columns(["doc_id", "text", "source"]),
            bench_source="src0",
            n=5,
        ),
        lambda b: int(
            (b["n_hits"].to_numpy(zero_copy_only=False) > 0).sum()
        ),
    )
    quality_failed = _sum_metric(
        quality_filter(text_only),
        lambda b: int(
            (~np.asarray(b["keep"].to_pylist(), dtype=bool)).sum()
        ),
    )
    spans = dup_ngram_stats(text_only, n=5)
    from ray.data.aggregate import Sum

    agg = spans.aggregate(Sum("n_grams"), Sum("dup_grams"))
    dup_permille = int(
        (agg["sum(dup_grams)"] or 0) * 1000 // max(agg["sum(n_grams)"] or 0, 1)
    )

    rows = {
        "contaminated_docs": contaminated,
        "dup_gram_permille": dup_permille,
        "n_docs": n_docs,
        "n_langs": n_langs,
        "quality_failed": quality_failed,
        "total_tokens": total_tokens,
    }
    return pd.DataFrame(
        {
            "metric": list(rows),
            "value": pd.Series(list(rows.values()), dtype="int64"),
        }
    ).sort_values("metric").reset_index(drop=True)


def corpus_report_sql(quality_filter_sql: str) -> str:
    return f"""
WITH t AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS w FROM documents),
g AS (
  SELECT doc_id, source,
         [array_to_string(w[i:i+4], ' ') FOR i IN generate_series(1, len(w)-4)] AS gs
  FROM t
),
bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE source = 'src0'),
contaminated AS (
  SELECT COUNT(DISTINCT tr.doc_id) AS c
  FROM (SELECT doc_id, unnest(gs) AS gram FROM g WHERE source <> 'src0') tr
  JOIN bench USING (gram)
),
cnt AS (
  SELECT doc_id, gram, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(gs) AS gram FROM g) occ GROUP BY 1, 2
),
df AS (SELECT gram, COUNT(*) AS nd FROM cnt GROUP BY 1),
dupmass AS (
  SELECT SUM(cnt.c) AS n_grams,
         SUM(CASE WHEN df.nd >= 2 THEN cnt.c ELSE 0 END) AS dup_grams
  FROM cnt JOIN df USING (gram)
),
qf AS (SELECT COUNT(*) AS c FROM ({quality_filter_sql}) WHERE NOT keep)
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM documents
  UNION ALL
  SELECT 'total_tokens', CAST(SUM(len(w)) AS BIGINT) FROM t
  UNION ALL
  SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
  UNION ALL
  SELECT 'contaminated_docs', CAST(c AS BIGINT) FROM contaminated
  UNION ALL
  SELECT 'quality_failed', CAST(c AS BIGINT) FROM qf
  UNION ALL
  SELECT 'dup_gram_permille',
         CAST(COALESCE(dup_grams, 0) * 1000 // GREATEST(COALESCE(n_grams, 0), 1)
              AS BIGINT)
  FROM dupmass
) ORDER BY metric
"""


_MERSENNE61 = (1 << 61) - 1


def table_checksum(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Order-independent per-partition integrity checksum over the
    documents table — the anti-entropy primitive a replicated store
    runs to locate divergent partitions without moving data: two
    replicas compare the tiny (bucket, n, checksum) result and ship
    only buckets that differ.

    Per row h = int(md5(doc_id|text)[:15 hex], 16); the bucket
    checksum is SUM(h) mod 2^61-1 — modular addition is commutative
    and associative, so the value is independent of row order, block
    split, and parallelism, and per-batch partials (each reduced mod M
    to stay in int64) fold exactly on the driver. Driver state =
    blocks × num_buckets tiny rows. The DuckDB oracle folds the same
    15-hex-digit prefix positionally (powers of 16 are powers of 2 —
    exact in float64) and sums in HUGEINT, so the checksum hash-checks
    cross-engine."""
    import hashlib

    from rdf2smw_ray.pipelines.io_cache import cached_table

    ds = cached_table(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        buckets = ids % num_buckets
        sums = np.zeros(num_buckets, dtype=object)
        counts = np.zeros(num_buckets, dtype=np.int64)
        for i, t, b in zip(ids, texts, buckets):
            h = int(
                hashlib.md5(f"{i}|{t or ''}".encode("utf-8")).hexdigest()[:15], 16
            )
            sums[b] += h
            counts[b] += 1
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
                "part": pa.array(
                    [int(sums[b]) % _MERSENNE61 for b in nz], pa.int64()
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or "bucket" not in parts.columns:
        # an empty table has 0 populated buckets — return the typed
        # empty frame the SQL oracle produces, don't raise
        return pd.DataFrame(
            {
                "bucket": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "checksum": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby("bucket", as_index=False)
        .agg(
            n=("n", "sum"),
            checksum=("part", lambda s: int(sum(int(v) for v in s)) % _MERSENNE61),
        )
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["bucket"] = out["bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["checksum"] = out["checksum"].astype("int64")
    return out


TABLE_CHECKSUM_SQL = r"""
WITH h AS (
  SELECT doc_id % 16 AS bucket,
         substr(md5(CONCAT(CAST(doc_id AS VARCHAR), '|', COALESCE(text, ''))), 1, 15) AS hx
  FROM documents),
v AS (
  SELECT bucket, CAST(list_sum([
    (CASE WHEN hx[i] >= '0' AND hx[i] <= '9' THEN ascii(hx[i]) - 48
          ELSE ascii(hx[i]) - 87 END)
    * CAST(power(16, 15 - i) AS BIGINT)
    FOR i IN generate_series(1, 15)]) AS HUGEINT) AS hv
  FROM h)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(hv) % 2305843009213693951 AS BIGINT) AS checksum
FROM v GROUP BY 1 ORDER BY 1
"""
