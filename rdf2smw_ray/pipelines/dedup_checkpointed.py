"""Checkpointed, resumable near-dup dedup run (round-3 VERDICT item 9).

The LSH → verify → cluster → keep-best chain is the engine's longest
multi-shuffle pipeline (~3 exchanges end-to-end after the round-3
single-co-shuffle verify) — exactly the run a real 100-TB job restarts.
Each stage writes its parquet output + an atomic manifest
(state/checkpoint.StageCheckpoint); a rerun resumes from the last
completed stage and produces byte-identical results (all stages are
seeded-deterministic).

Layout under ``out_dir``::

    stages/candidate_pairs/*.parquet + candidate_pairs.manifest.json
    stages/verified_pairs/*.parquet  + verified_pairs.manifest.json
    stages/clusters/*.parquet        + clusters.manifest.json
    stages/keep_best/*.parquet       + keep_best.manifest.json

Manifests record the dedup parameters and an input-content digest, so
a rerun with different thresholds or changed input recomputes instead
of resuming stale stages.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from rdf2smw_ray.state.checkpoint import StageCheckpoint, file_fingerprint

_PAIRS_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
_CLUSTERS_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])
_KEEP_SCHEMA = pa.schema(
    [
        ("cluster_id", pa.int64()),
        ("kept_doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


def _input_digest(doc_paths: list[str]) -> str:
    h = hashlib.blake2b(digest_size=8)
    for p in sorted(doc_paths):
        h.update(p.encode())
        h.update(file_fingerprint(p).encode())
    return h.hexdigest()


def _write_stage(ds, schema: pa.Schema):
    """Stage body: write the Dataset (or an explicit typed empty file —
    pairs can legitimately be empty) under the tmp dir."""

    def fn(tmp_dir: str) -> dict:
        n = ds.count()
        if n == 0:
            import pyarrow.parquet as pq

            pq.write_table(schema.empty_table(), os.path.join(tmp_dir, "empty.parquet"))
        else:
            ds.write_parquet(tmp_dir)
        return {"rows": n}

    return fn


def run_dedup_checkpointed(
    doc_paths: list[str],
    out_dir: str,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    concurrency: int = 4,
    fail_after_stage: str | None = None,  # test hook: simulate a crash
) -> dict:
    """Run (or resume) exact-verified near-dup dedup over document
    parquet files. Returns per-stage output dirs + row counts and which
    stages were resumed from their manifest."""
    import pyarrow.compute as pc
    import ray.data as rd

    from rdf2smw_ray.pipelines.dedup import (
        _verify_jaccard_edges,
        connected_components,
        lsh_all_bucket_pairs,
    )
    from rdf2smw_ray.pipelines.textstats import token_stats
    from rdf2smw_ray.stages.join import bucketed_join
    from rdf2smw_ray.stages.reduce import keyed_first

    stages = StageCheckpoint(os.path.join(out_dir, "stages"))
    params = {
        "threshold": threshold,
        "num_perm": num_perm,
        "bands": bands,
        "k": k,
        "input": _input_digest(doc_paths),
    }
    skipped: dict[str, bool] = {}

    def docs():
        return rd.read_parquet(doc_paths, columns=["doc_id", "text"])

    def eligible():
        import pandas as pd

        def long_enough(batch: pa.Table) -> pa.Table:
            texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
            return batch.filter(pa.array((texts.str.count(r"\S+") >= k).to_numpy()))

        return docs().map_batches(long_enough, batch_format="pyarrow")

    def _maybe_fail(name: str) -> None:
        if fail_after_stage == name:
            raise RuntimeError(f"injected failure after stage {name!r} (test hook)")

    # ---- stage 1: LSH candidate pairs -----------------------------------
    def cand_fn(tmp_dir: str) -> dict:
        pairs = lsh_all_bucket_pairs(
            eligible(), num_perm=num_perm, bands=bands, k=k, concurrency=concurrency
        )
        return _write_stage(pairs, _PAIRS_SCHEMA)(tmp_dir)

    cand_dir, skipped["candidate_pairs"] = stages.stage(
        "candidate_pairs", cand_fn, params=params
    )
    _maybe_fail("candidate_pairs")

    # ---- stage 2: exact-Jaccard verification ----------------------------
    def verify_fn(tmp_dir: str) -> dict:
        pairs = rd.read_parquet(cand_dir).map_batches(
            lambda t: t.filter(pc.is_valid(t["doc_a"])), batch_format="pyarrow"
        )
        verified = _verify_jaccard_edges(
            pairs, eligible(), a_col="doc_a", b_col="doc_b",
            threshold=threshold, k=k,
        )
        return _write_stage(verified, _PAIRS_SCHEMA)(tmp_dir)

    ver_dir, skipped["verified_pairs"] = stages.stage(
        "verified_pairs", verify_fn, params=params
    )
    _maybe_fail("verified_pairs")

    # ---- stage 3: connected components → clusters -----------------------
    def cluster_fn(tmp_dir: str) -> dict:
        edges = rd.read_parquet(ver_dir).map_batches(
            lambda t: t.filter(pc.is_valid(t["doc_a"])), batch_format="pyarrow"
        )
        clusters = connected_components(edges, "doc_a", "doc_b")
        return _write_stage(clusters, _CLUSTERS_SCHEMA)(tmp_dir)

    clus_dir, skipped["clusters"] = stages.stage("clusters", cluster_fn, params=params)
    _maybe_fail("clusters")

    # ---- stage 4: keep-best representative per cluster ------------------
    def keep_fn(tmp_dir: str) -> dict:
        clusters = rd.read_parquet(clus_dir).map_batches(
            lambda t: t.filter(pc.is_valid(t["node"])), batch_format="pyarrow"
        )
        stats = token_stats(docs())
        joined = bucketed_join(
            clusters, stats, key="node", right_key="doc_id",
            right_cols={"n_tokens": "n_tokens"}, how="inner",
        )
        best = keyed_first(
            joined, ["label"], ["n_tokens", "node"], [False, True]
        ).map_batches(
            lambda t: pa.table(
                {
                    "cluster_id": t["label"].cast(pa.int64()),
                    "kept_doc_id": t["node"].cast(pa.int64()),
                    "n_tokens": t["n_tokens"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        return _write_stage(best, _KEEP_SCHEMA)(tmp_dir)

    keep_dir, skipped["keep_best"] = stages.stage("keep_best", keep_fn, params=params)

    return {
        "dirs": {
            "candidate_pairs": cand_dir,
            "verified_pairs": ver_dir,
            "clusters": clus_dir,
            "keep_best": keep_dir,
        },
        "skipped": skipped,
    }
