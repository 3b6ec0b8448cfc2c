"""End-to-end corpus curation: quality filter → (kept docs only) →
page-text line dedup — the composed hygiene pass a training-data run
executes before tokenization, with a checkpointed, resumable variant.

Composition matters: the line-dedup winners are computed among KEPT
documents only, so the output differs from running the stages
independently — the gate query value-checks exactly this interaction.

``run_curation_checkpointed`` is the restartable form: each stage
writes partitioned parquet + an atomic manifest
(state/checkpoint.StageCheckpoint) keyed by the input digest, so a
killed run resumes after the last completed stage and skips recompute.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from rdf2smw_ray.state.checkpoint import StageCheckpoint, file_fingerprint

_DECISION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("keep", pa.bool_()),
        ("reject_reason", pa.string()),
    ]
)


def curated_line_counts(docs):
    """In-memory composition over a (doc_id, text) documents Dataset:
    quality decisions → semi-join kept docs → page texts → first-wins
    line dedup among the kept corpus. Returns (doc_id, n_lines,
    n_kept, n_dropped) for kept docs only."""
    import pyarrow.compute as pc

    from rdf2smw_ray.pipelines.linededup import line_dedup_counts
    from rdf2smw_ray.pipelines.textstats import quality_filter
    from rdf2smw_ray.sources.webpages import page_texts
    from rdf2smw_ray.stages.join import bucketed_join

    kept_ids = quality_filter(docs).map_batches(
        lambda t: t.filter(t["keep"]).select(["doc_id"]),
        batch_format="pyarrow",
    )
    kept_docs = bucketed_join(docs, kept_ids, key="doc_id", how="semi")
    return line_dedup_counts(page_texts(kept_docs))


def _input_digest(doc_paths: list[str]) -> str:
    h = hashlib.blake2b(digest_size=8)
    for p in sorted(doc_paths):
        h.update(p.encode())
        h.update(file_fingerprint(p).encode())
    return h.hexdigest()


def run_curation_checkpointed(
    doc_paths: list[str],
    out_dir: str,
    *,
    fail_after_stage: str | None = None,  # test hook: simulate a crash
) -> dict:
    """Run (or resume) the curation chain over document parquet files.

    Layout under ``out_dir``::

        stages/quality/*.parquet   + quality.manifest.json
        stages/curated/*.parquet   + curated.manifest.json
    """
    import ray.data as rd

    from rdf2smw_ray.pipelines.linededup import line_dedup_counts
    from rdf2smw_ray.pipelines.textstats import quality_filter
    from rdf2smw_ray.sources.webpages import page_texts
    from rdf2smw_ray.stages.join import bucketed_join

    stages = StageCheckpoint(os.path.join(out_dir, "stages"))
    params = {"input": _input_digest(doc_paths)}
    skipped: dict[str, bool] = {}

    def docs():
        return rd.read_parquet(doc_paths, columns=["doc_id", "text"])

    def _maybe_fail(name: str) -> None:
        if fail_after_stage == name:
            raise RuntimeError(f"injected failure after stage {name!r} (test hook)")

    # ---- stage 1: quality decisions -------------------------------------
    def quality_fn(tmp_dir: str) -> dict:
        ds = quality_filter(docs())
        n = ds.count()
        ds.write_parquet(tmp_dir)
        return {"rows": n}

    quality_dir, skipped["quality"] = stages.stage(
        "quality", quality_fn, params=params
    )
    _maybe_fail("quality")

    # ---- stage 2: kept-corpus line dedup ---------------------------------
    def curated_fn(tmp_dir: str) -> dict:
        kept_ids = rd.read_parquet(quality_dir).map_batches(
            lambda t: t.filter(t["keep"]).select(["doc_id"]),
            batch_format="pyarrow",
        )
        kept_docs = bucketed_join(docs(), kept_ids, key="doc_id", how="semi")
        out = line_dedup_counts(page_texts(kept_docs))
        n = out.count()
        out.write_parquet(tmp_dir)
        return {"rows": n}

    curated_dir, skipped["curated"] = stages.stage(
        "curated", curated_fn, params=params
    )
    _maybe_fail("curated")

    return {"quality": quality_dir, "curated": curated_dir, "skipped": skipped}
