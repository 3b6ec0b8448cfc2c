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


def _flat_gram_positions(
    texts: pd.Series, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_index, pos_1based, gram) flat arrays for all n-gram
    positions in a batch — ``decontam._flat_grams`` extended with the
    1-based in-doc token position each gram starts at (the SQL
    oracle's ``generate_series(1, len(w)-n+1)`` convention)."""
    toks = texts.str.split()
    counts = toks.map(len).to_numpy()
    n_docs = len(texts)
    flat = np.concatenate([t for t in toks if t] or [[]]).astype(object)
    if len(flat) < n:
        e = np.array([], dtype=np.int64)
        return e, e, np.array([], dtype=object)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    offsets = np.r_[0, np.cumsum(counts)][:-1]  # flat index of each doc's token 1
    valid = doc_idx[: len(flat) - n + 1] == doc_idx[n - 1 :]
    gram = pd.Series(flat[: len(flat) - n + 1])
    for t in range(1, n):
        gram = gram + " " + pd.Series(flat[t : len(flat) - n + 1 + t])
    d = doc_idx[: len(flat) - n + 1][valid]
    pos = np.arange(len(flat) - n + 1, dtype=np.int64)[valid] - offsets[d] + 1
    return d, pos, gram.to_numpy()[valid]


# 1-based position packs with doc_id into one sortable BIGINT rank;
# 2^20 caps documents at ~1M tokens (same packing/limit as
# linededup's doc*2^20+ln rank — overflow-guarded there, assumed and
# asserted here).
_POS_BITS = 20


def dedup_spans(docs, *, n: int = 5, num_buckets: int | None = None):
    """Exact-substring SPAN REMOVAL (the Lee et al. 2022 intervention,
    not just the ``dup_ngram_stats`` measurement), restated at token
    n-gram granularity with a deterministic corpus-wide first-wins
    rule:

    - an n-gram OCCURRENCE at 1-based token position ``pos`` of doc
      ``d`` is a *duplicate* iff an occurrence of the same gram text
      exists at a smaller rank ``doc_id * 2^20 + pos`` (i.e. earlier
      in (doc_id, pos) order — anywhere in the corpus, including
      earlier in the same document);
    - every token covered by at least one duplicate occurrence
      (positions ``pos .. pos+n-1``) is REMOVED;
    - ``kept_text`` is the single-space join of the surviving tokens
      (documents shorter than ``n`` tokens survive whole).

    Scale shape — same ONE gram-hash co-shuffle as
    ``dup_ngram_stats`` plus one doc-hash co-shuffle to rebuild text:

    1. per batch: flat (doc, pos, gram) occurrences; in-doc repeats
       are decided LOCALLY (an occurrence after the in-doc first is a
       duplicate no matter what the rest of the corpus holds), so the
       gram shuffle carries ≤1 row per (doc, gram): the in-doc-first
       position plus the local-duplicate positions as a list payload;
    2. per gram-hash bucket: the gram's global min rank is local;
       in-doc-first occurrences that lose emit their position, local
       duplicates always emit — output is a small (doc_id, start)
       span stream;
    3. spans + doc text co-shuffle on ``hash(doc_id)``: interval
       union via a vectorized delta/cumsum sweep over the bucket's
       flat token array, then per-doc token join.

    Driver state: none. ``docs`` is consumed twice (gram pass + text
    rebuild) — pass a materialized/cached input or accept a re-read,
    exactly as ``dup_ngram_stats``'s spine join does.

    Returns a Dataset of (doc_id, n_tokens, kept_tokens,
    removed_tokens, kept_text)."""
    from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

    if num_buckets is None:
        num_buckets = auto_buckets(dataset_est_bytes(docs))
    pos_cap = 1 << _POS_BITS

    def occurrences(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d, pos, grams = _flat_gram_positions(texts, n)
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "extra": pa.array([], pa.list_(pa.int64())),
                "__bucket": pa.array([], pa.int32()),
            }
        )
        if not len(grams):
            return empty
        if pos.max() >= pos_cap:
            raise ValueError(
                f"document exceeds {pos_cap} tokens — the doc*2^{_POS_BITS}+pos "
                "rank packing would overflow; raise _POS_BITS or chunk the doc"
            )
        if ids.size and (ids.min() < 0 or ids.max() >= (1 << (63 - _POS_BITS))):
            # hashed/snowflake ids >= 2^43 would wrap the packed rank
            # negative and silently corrupt the first-wins order — fail
            # loudly like the pos bound above
            raise ValueError(
                f"doc_id outside [0, 2^{63 - _POS_BITS}) — the "
                f"doc*2^{_POS_BITS}+pos rank packing would overflow int64; "
                "remap ids densely (e.g. dense_rank) before dedup_spans"
            )
        gcode, guniq = pd.factorize(pd.Series(grams), sort=False)
        order = np.lexsort((pos, gcode, d))
        # sorted by (doc, gram, pos): group firsts are in-doc-first
        # occurrences; the rest are local duplicates
        d_s, g_s, p_s = d[order], gcode[order], pos[order]
        newgrp = np.r_[True, (d_s[1:] != d_s[:-1]) | (g_s[1:] != g_s[:-1])]
        starts = np.flatnonzero(newgrp)
        sizes = np.diff(np.r_[starts, len(p_s)])
        offs = np.r_[0, np.cumsum(sizes - 1)]
        extra = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(p_s[~newgrp], pa.int64())
        )
        first_grams = guniq.to_numpy()[g_s[newgrp]]
        h = pd.util.hash_pandas_object(pd.Series(first_grams), index=False).to_numpy()
        return pa.table(
            {
                "gram": pa.array(first_grams, pa.string()),
                "doc_id": pa.array(ids[d_s[newgrp]], pa.int64()),
                "pos": pa.array(p_s[newgrp], pa.int64()),
                "extra": extra,
                "__bucket": pa.array((h % num_buckets).astype(np.int32), pa.int32()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "start": pa.array([], pa.int64())}
            )
        doc = df["doc_id"].to_numpy().astype(np.int64)
        pos = df["pos"].to_numpy().astype(np.int64)
        rank = doc * pos_cap + pos
        minr = (
            pd.Series(rank).groupby(df["gram"].to_numpy(), sort=False).transform("min")
        ).to_numpy()
        lose = rank > minr
        # losers' first positions + every local-duplicate position
        extras = df["extra"].to_numpy()
        elens = np.fromiter((len(e) for e in extras), dtype=np.int64, count=len(df))
        if elens.sum():
            flat_extra = np.concatenate([np.asarray(e, dtype=np.int64) for e in extras if len(e)])
            extra_doc = np.repeat(doc, elens)
        else:
            flat_extra = np.array([], dtype=np.int64)
            extra_doc = np.array([], dtype=np.int64)
        out_doc = np.concatenate([doc[lose], extra_doc])
        out_start = np.concatenate([pos[lose], flat_extra])
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "start": pa.array(out_start, pa.int64()),
            }
        )

    spans = (
        docs.map_batches(occurrences, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )

    # --- rebuild: spans + doc text co-shuffled on hash(doc_id) -----------
    def tag_spans(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "start": t["start"],
                "text": pa.array([""] * len(t), pa.string()),
                "__dbucket": pa.array(
                    (doc % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    def tag_docs(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "start": pa.array(np.full(len(t), -1, dtype=np.int64), pa.int64()),
                "text": t["text"],
                "__dbucket": pa.array(
                    (doc % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    tagged = spans.map_batches(tag_spans, batch_format="pyarrow").union(
        docs.select_columns(["doc_id", "text"]).map_batches(
            tag_docs, batch_format="pyarrow"
        )
    )

    def rebuild(df: pd.DataFrame) -> pa.Table:
        is_doc = df["start"].to_numpy() == -1
        drows = df[is_doc]
        ids = drows["doc_id"].to_numpy().astype(np.int64)
        texts = pd.Series(drows["text"].to_numpy(), dtype=object).fillna("")
        toks = texts.str.split()
        counts = toks.map(len).to_numpy().astype(np.int64)
        empty_cols = {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "kept_tokens": pa.array([], pa.int64()),
            "removed_tokens": pa.array([], pa.int64()),
            "kept_text": pa.array([], pa.string()),
        }
        if len(drows) == 0:
            return pa.table(empty_cols)
        order = np.argsort(ids, kind="stable")
        ids, counts = ids[order], counts[order]
        tok_lists = toks.to_numpy()[order]
        flat = (
            np.concatenate([t for t in tok_lists if t]).astype(object)
            if counts.sum()
            else np.array([], dtype=object)
        )
        offs = np.r_[0, np.cumsum(counts)]
        # interval union over the bucket's flat token array
        delta = np.zeros(len(flat) + 1, dtype=np.int64)
        srows = df[~is_doc]
        if len(srows):
            sdoc = srows["doc_id"].to_numpy().astype(np.int64)
            sstart = srows["start"].to_numpy().astype(np.int64)
            di = np.searchsorted(ids, sdoc)
            lo = offs[di] + sstart - 1
            hi = np.minimum(lo + n, offs[di + 1])
            np.add.at(delta, lo, 1)
            np.add.at(delta, hi, -1)
        removed = np.cumsum(delta[:-1]) > 0
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        kept_counts = np.zeros(len(ids), dtype=np.int64)
        if len(flat):
            np.add.at(kept_counts, doc_idx[~removed], 1)
        kept_text = np.full(len(ids), "", dtype=object)
        if len(flat):
            joined = (
                pd.Series(flat[~removed])
                .groupby(doc_idx[~removed], sort=False)
                .agg(" ".join)
            )
            kept_text[joined.index.to_numpy()] = joined.to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "kept_tokens": pa.array(kept_counts, pa.int64()),
                "removed_tokens": pa.array(counts - kept_counts, pa.int64()),
                "kept_text": pa.array(kept_text, pa.string()),
            }
        )

    return tagged.groupby("__dbucket").map_groups(rebuild, batch_format="pandas")


DUP_NGRAM_STATS_SQL = r"""
WITH t AS (SELECT doc_id,
                  -- filter empties so '' and edge-whitespace text
                  -- tokenizes exactly like Python str.split()
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
           FROM documents),
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


# n is fixed at 5 (w[i:i+4] is 1-based INCLUSIVE = 5 tokens;
# generate_series(0, 4) covers the 5 removed positions) — the Python
# query pins n=5 to match.
DEDUP_SPANS_SQL = r"""
WITH t AS (SELECT doc_id,
                  -- filter empties so '' and edge-whitespace text
                  -- tokenizes exactly like Python str.split()
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
           FROM documents),
occ AS (
  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram
  FROM (SELECT doc_id,
               unnest([{'pos': i, 'gram': array_to_string(w[i:i+4], ' ')}
                       FOR i IN generate_series(1, len(w)-4)]) AS u
        FROM t)
),
firsts AS (SELECT gram, MIN(doc_id * 1048576 + pos) AS r0 FROM occ GROUP BY 1),
dups AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN firsts f USING (gram)
  WHERE o.doc_id * 1048576 + o.pos > f.r0
),
removed AS (
  SELECT DISTINCT doc_id, pos + k AS rp
  FROM dups, generate_series(0, 4) AS s(k)
),
toks AS (
  SELECT doc_id, u['i'] AS i, u['tok'] AS tok
  FROM (SELECT doc_id,
               unnest([{'i': i, 'tok': w[i]} FOR i IN generate_series(1, len(w))]) AS u
        FROM t)
),
keptagg AS (
  SELECT k.doc_id,
         string_agg(k.tok, ' ' ORDER BY k.i) AS kept_text,
         COUNT(*) AS kept_tokens
  FROM toks k LEFT JOIN removed r ON k.doc_id = r.doc_id AND k.i = r.rp
  WHERE r.doc_id IS NULL GROUP BY 1
),
lens AS (SELECT doc_id, len(w) AS n_tokens FROM t)
SELECT l.doc_id,
       CAST(l.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(ka.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(l.n_tokens - COALESCE(ka.kept_tokens, 0) AS BIGINT) AS removed_tokens,
       COALESCE(ka.kept_text, '') AS kept_text
FROM lens l LEFT JOIN keptagg ka USING (doc_id)
ORDER BY doc_id
"""
