"""Global line/paragraph-level exact deduplication: keep the FIRST
corpus-wide occurrence of every distinct non-empty line (C4/RefinedWeb
paragraph dedup, at line granularity).

Scale shape:
- the explode stage emits one row per DISTINCT line per batch (a
  batch-local min-rank combiner runs first), keyed by the line's md5
  hex — the shuffle carries 32-byte keys + an int64 rank, never the
  line text;
- the winner per line is a native ``groupby(key).min(rank)`` — one
  all-to-all over the combined keys;
- per-doc kept counts come from decoding the winner ranks (rank =
  doc_id * 2^20 + line_no, asserted overflow-safe) and summing — a
  second small per-doc groupby, no join.

The md5 key is also what the DuckDB oracle groups by, so the whole
chain is hash-checkable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MAX_LINES_PER_DOC = 1 << 20  # rank = doc_id * 2^20 + line_no (1-based)


def _explode_min_rank(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    if len(ids) and int(ids.max()) >= (2**63 - 1) // MAX_LINES_PER_DOC:
        raise ValueError("doc ids too large for the rank encoding")
    texts = pd.Series(batch[text_col].to_pylist(), dtype=object).fillna("")
    lines = texts.str.split("\n")
    counts = lines.map(len).to_numpy()
    if len(counts) and int(counts.max()) >= MAX_LINES_PER_DOC:
        raise ValueError(
            f"document with >= {MAX_LINES_PER_DOC} lines breaks the rank "
            "encoding; raise MAX_LINES_PER_DOC or pre-chunk the document"
        )
    df = pd.DataFrame(
        {
            "doc": np.repeat(ids.astype(np.int64), counts),
            "line": np.concatenate(list(lines) or [[]]).astype(object),
        }
    )
    df = df[df["line"] != ""]
    # 1-based position among the doc's NON-empty lines (both engines
    # renumber after dropping empties)
    ln = df.groupby("doc", sort=False).cumcount().to_numpy() + 1
    df["rank"] = df["doc"].to_numpy() * MAX_LINES_PER_DOC + ln
    # batch-local combiner: min rank per distinct line, then hash only
    # the combined survivors (one C md5 call per distinct line)
    m = df.groupby("line", sort=False)["rank"].min()
    keys = [hashlib.md5(l.encode("utf-8")).hexdigest() for l in m.index]
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "rank": pa.array(m.to_numpy(), pa.int64()),
        }
    )


def _winner_counts(batch: pa.Table) -> pa.Table:
    doc = batch["rank"].to_numpy() // MAX_LINES_PER_DOC
    vc = pd.Series(doc).value_counts()
    return pa.table(
        {
            "doc_id": pa.array(vc.index.to_numpy(), pa.int64()),
            "n_kept": pa.array(vc.to_numpy(), pa.int64()),
            "n_lines": pa.array(np.zeros(len(vc), dtype=np.int64), pa.int64()),
        }
    )


def _line_totals(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    texts = pd.Series(batch[text_col].to_pylist(), dtype=object).fillna("")
    n = (
        texts.str.split("\n")
        .map(lambda ls: sum(1 for l in ls if l != ""))
        .to_numpy()
        .astype(np.int64)
    )
    return pa.table(
        {
            "doc_id": batch[id_col],
            "n_kept": pa.array(np.zeros(len(n), dtype=np.int64), pa.int64()),
            "n_lines": pa.array(n, pa.int64()),
        }
    )


def line_dedup_counts(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (id, text) → Dataset of (doc_id, n_lines, n_kept,
    n_dropped): n_kept = lines whose first corpus-wide occurrence is in
    this doc (within-doc repeats drop too)."""
    from ray.data.aggregate import Min, Sum

    winners = (
        docs.map_batches(
            lambda t: _explode_min_rank(t, id_col, text_col),
            batch_format="pyarrow",
        )
        .groupby("key")
        .aggregate(Min("rank", alias_name="rank"))
    )
    kept = winners.map_batches(_winner_counts, batch_format="pyarrow")
    totals = docs.map_batches(
        lambda t: _line_totals(t, id_col, text_col), batch_format="pyarrow"
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": batch["n_lines"],
                "n_kept": batch["n_kept"],
                "n_dropped": pa.array(
                    batch["n_lines"].to_numpy() - batch["n_kept"].to_numpy(),
                    pa.int64(),
                ),
            }
        )

    return (
        kept.union(totals)
        .groupby("doc_id")
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("n_kept", alias_name="n_kept"))
        .map_batches(finalize, batch_format="pyarrow")
    )
