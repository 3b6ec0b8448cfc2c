"""Corpus snapshot diff: added / removed / changed / same per
document between two crawl versions — the CDC audit a recurring-crawl
pipeline runs before deciding what to reprocess (the row-level
complement of ``incremental.py``'s KG-specific affected-set logic).

Shape: each side reduces to (doc_id, md5(text)) inside ``map_batches``
(one C hash call per doc — the ``line_dedup`` precedent), then ONE
full outer join on doc_id (``stages.join.bucketed_join``) classifies
every id: present-left-only → removed, present-right-only → added,
both with differing digests → changed, else same. Content never
shuffles — only 16-byte digests.

The registered query synthesizes the new snapshot deterministically
from the base corpus (key arithmetic mirrored in the SQL oracle, the
``pii_redact`` pattern): doc_id % 7 == 3 dropped, % 5 == 0 edited,
and a shifted copy of % 11 == 0 added under doc_id + 1_000_000.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _digest_batch(batch: pa.Table, id_col: str, text_col: str, out: str) -> pa.Table:
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch[text_col].to_pylist()
    h = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {id_col: pa.array(ids, pa.int64()), out: pa.array(h, pa.string())}
    )


def corpus_diff(base, new, *, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (doc_id, status) for every id in either snapshot."""
    from rdf2smw_ray.stages.join import bucketed_join

    bh = base.map_batches(
        lambda t: _digest_batch(t, id_col, text_col, "h_old"),
        batch_format="pyarrow",
    )
    nh = new.map_batches(
        lambda t: _digest_batch(t, id_col, text_col, "h_new"),
        batch_format="pyarrow",
    )
    joined = bucketed_join(
        bh, nh, key=id_col, how="outer", right_cols={"h_new": "h_new"}
    )

    def classify(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        old = df["h_old"]
        new_ = df["h_new"]
        status = np.where(
            old.isna(),
            "added",
            np.where(new_.isna(), "removed", np.where(old == new_, "same", "changed")),
        )
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "status": pa.array(status, pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def corpus_diff_query(sf_dir: str) -> pd.DataFrame:
    """Base documents vs a deterministically synthesized next crawl."""
    from rdf2smw_ray.pipelines.io_cache import cached_table

    base = cached_table(sf_dir, "documents", ["doc_id", "text"])

    def synth_new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        keep = ids % 7 != 3
        edited = np.where(ids % 5 == 0, texts + " rev2", texts)
        out_ids = [ids[keep]]
        out_txt = [edited[keep]]
        addm = ids % 11 == 0
        out_ids.append(ids[addm] + 1_000_000)
        out_txt.append((texts[addm] + " fresh").to_numpy())
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "text": pa.array(np.concatenate(out_txt), pa.string()),
            }
        )

    new = base.map_batches(synth_new, batch_format="pyarrow")
    out = corpus_diff(base, new).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


CORPUS_DIFF_SQL = """
WITH newer AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 3
  UNION ALL
  SELECT doc_id + 1000000, text || ' fresh' FROM documents WHERE doc_id % 11 = 0
)
SELECT COALESCE(b.doc_id, n.doc_id) AS doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN md5(b.text) = md5(n.text) THEN 'same'
            ELSE 'changed' END AS status
FROM documents b FULL OUTER JOIN newer n USING (doc_id)
ORDER BY doc_id
"""
