"""End-to-end training-shard preparation — the complete LLM data-prep
run as ONE restartable pipeline:

    quality filter → benchmark decontamination → eligible corpus
    → sequence packing (distributed prefix scan) → hive-partitioned
    training shards (+ manifest)

Every stage is an existing engine operator; this module contributes
the CHECKPOINTED COMPOSITION (state/checkpoint.StageCheckpoint with
input-digest invalidation, the ``run_curation_checkpointed`` pattern)
and the final partitioned sink, so a killed 100-TB run resumes after
its last completed stage and a finished run is a directory tree a
trainer can consume shard-by-shard.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from rdf2smw_ray.pipelines.curation import _input_digest
from rdf2smw_ray.state.checkpoint import StageCheckpoint, write_partitioned


def prepare_training_shards(
    doc_paths: list[str],
    out_dir: str,
    *,
    bench_source: str = "src0",
    ngram: int = 5,
    cap: int = 256,
    num_shards: int = 8,
    fail_after_stage: str | None = None,  # test hook
) -> dict:
    import ray.data as rd

    from rdf2smw_ray.pipelines.decontam import decontaminate
    from rdf2smw_ray.pipelines.packing import sequence_packing
    from rdf2smw_ray.pipelines.textstats import quality_filter
    from rdf2smw_ray.stages.join import bucketed_join

    stages = StageCheckpoint(os.path.join(out_dir, "stages"))
    params = {
        "input": _input_digest(doc_paths),
        "bench": bench_source,
        "n": ngram,
        "cap": cap,
        "shards": num_shards,
    }
    skipped: dict[str, bool] = {}

    def docs(cols):
        return rd.read_parquet(doc_paths, columns=cols)

    def _maybe_fail(name: str) -> None:
        if fail_after_stage == name:
            raise RuntimeError(f"injected failure after stage {name!r} (test hook)")

    # ---- stage 1: quality decisions ----------------------------------
    def quality_fn(tmp: str) -> dict:
        ds = quality_filter(docs(["doc_id", "text"]))
        n = ds.count()
        ds.write_parquet(tmp)
        return {"rows": n}

    quality_dir, skipped["quality"] = stages.stage("quality", quality_fn, params=params)
    _maybe_fail("quality")

    # ---- stage 2: benchmark contamination -----------------------------
    def decontam_fn(tmp: str) -> dict:
        ds = decontaminate(
            docs(["doc_id", "text", "source"]), bench_source=bench_source, n=ngram
        )
        n = ds.count()
        ds.write_parquet(tmp)
        return {"rows": n}

    decontam_dir, skipped["decontam"] = stages.stage(
        "decontam", decontam_fn, params=params
    )
    _maybe_fail("decontam")

    # ---- stage 3: eligible corpus → packed sequence assignment --------
    def packed_fn(tmp: str) -> dict:
        kept = rd.read_parquet(quality_dir).map_batches(
            lambda t: t.filter(t["keep"]).select(["doc_id"]),
            batch_format="pyarrow",
        )
        clean = rd.read_parquet(decontam_dir).map_batches(
            lambda t: t.filter(pa.compute.invert(t["contaminated"])).select(
                ["doc_id"]
            ),
            batch_format="pyarrow",
        )
        eligible = bucketed_join(
            bucketed_join(docs(["doc_id", "text"]), kept, key="doc_id", how="semi"),
            clean,
            key="doc_id",
            how="semi",
        )
        packed = sequence_packing(eligible, cap=cap)
        n = packed.count()
        packed.write_parquet(tmp)
        return {"rows": n}

    packed_dir, skipped["packed"] = stages.stage("packed", packed_fn, params=params)
    _maybe_fail("packed")

    # ---- stage 4: shard assembly (text re-attached, hive layout) ------
    def shard_batch(batch: pa.Table) -> pa.Table:
        seq = batch["seq_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array((seq % num_shards).astype(np.int64), pa.int64())
        )

    packed = rd.read_parquet(packed_dir)
    with_text = bucketed_join(
        packed,
        docs(["doc_id", "text"]),
        key="doc_id",
        right_cols={"text": "text"},
    ).map_batches(shard_batch, batch_format="pyarrow")
    shard_dir = os.path.join(out_dir, "shards")
    manifest = write_partitioned(with_text, shard_dir, partition_cols=["shard"])
    return {
        "quality": quality_dir,
        "decontam": decontam_dir,
        "packed": packed_dir,
        "shards": shard_dir,
        "manifest": manifest,
        "skipped": skipped,
    }
