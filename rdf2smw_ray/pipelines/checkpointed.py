"""Checkpointed, resumable end-to-end KG run.

Layout under ``out_dir``::

    triples/shard-XXXX/part-*.parquet   + shard-XXXX.manifest.json
    stages/pages/*.parquet              + pages.manifest.json
    stages/properties/*.parquet         + properties.manifest.json
    stages/templates/*.parquet          + templates.manifest.json
    pages.xml / properties.xml / templates.xml (optional dumps)

Front half resumes per input shard; back half resumes per stage. All
stages are deterministic, so a resumed run's outputs are
byte-identical to an uninterrupted one (tested in
tests/test_resume.py).
"""

from __future__ import annotations

import os

from rdf2smw_ray.stages.extract_text import extract_text
from rdf2smw_ray.stages.extract_triples import extract_triples
from rdf2smw_ray.state.checkpoint import ShardedRun, StageCheckpoint, write_xml_dump


def _extract_shard_arrow(path: str, shard_out: str) -> dict:
    """Self-contained per-shard front half (runs as ONE Ray task in
    parallel mode): pure pyarrow — read shard, extract text + triples
    with the same batch kernels the Dataset stages use, write parquet.
    No nested Dataset execution, so shards cost no per-execution
    scheduler overhead."""
    import pyarrow.parquet as pq

    from rdf2smw_ray.stages.extract_text import HtmlTextExtractor
    from rdf2smw_ray.stages.extract_triples import PatternTripleExtractor

    pages = pq.read_table(path)
    text = HtmlTextExtractor()(pages)
    triples = PatternTripleExtractor()(text)
    pq.write_table(triples, os.path.join(shard_out, "triples.parquet"))
    return {"rows_in": pages.num_rows, "rows_out": triples.num_rows}


def run_kg_checkpointed(
    web_page_paths: list[str],
    out_dir: str,
    *,
    use_templates: bool = True,
    timestamp: str | None = None,
    salt: int = 1,
    concurrency: int | tuple[int, int] = 4,
    write_xml: bool = False,
    parallel_shards: bool = True,
    fail_after_shards: int | None = None,  # test hook: simulate a crash
) -> dict:
    """Run (or resume) the full pipeline over web-page parquet shards.

    ``parallel_shards=True`` (default): the front half runs
    task-per-shard (``_extract_shard_arrow``); set False to run each
    shard as its own Dataset pipeline (only useful for single shards
    too large for one task)."""
    import ray.data as rd

    from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
    from rdf2smw_ray.stages.render import DEFAULT_TIMESTAMP

    if timestamp is None:
        timestamp = DEFAULT_TIMESTAMP
    # stage manifests record the timestamp (and template mode): a rerun
    # with a different --timestamp recomputes instead of resuming
    # stale XML (ADVICE round-1)
    stage_params = {"timestamp": timestamp, "use_templates": use_templates}

    triples_run = ShardedRun(os.path.join(out_dir, "triples"))

    processed = {"n": 0}

    def process_shard(path: str, shard_out: str) -> dict:
        if fail_after_shards is not None and processed["n"] >= fail_after_shards:
            raise RuntimeError("injected failure (test hook)")
        pages = rd.read_parquet(path)
        triples = extract_triples(
            extract_text(pages, concurrency=concurrency), concurrency=concurrency
        )
        triples.write_parquet(shard_out)
        processed["n"] += 1
        return {"rows_out": triples.count()}

    if fail_after_shards is not None or not parallel_shards:
        summary = triples_run.process_shards(web_page_paths, process_shard)
    else:
        summary = triples_run.process_shards(
            web_page_paths, _extract_shard_arrow, ray_parallel=True
        )

    # ---- back half over ALL completed shards ----------------------------
    stages = StageCheckpoint(os.path.join(out_dir, "stages"))
    stage_names = ("pages", "properties", "templates")
    if summary["processed"] > 0:
        # new/changed shards invalidate the global stages
        for name in stage_names:
            stages.invalidate(name)

    if all(stages.is_done(n, stage_params) for n in stage_names):
        # fully resumed: nothing to recompute
        dirs = {n: stages.stage_dir(n) for n in stage_names}
        if write_xml:
            for name, d in dirs.items():
                write_xml_dump(rd.read_parquet(d), os.path.join(out_dir, f"{name}.xml"))
        return {
            "shards": summary,
            "pages_dir": dirs["pages"],
            "properties_dir": dirs["properties"],
            "templates_dir": dirs["templates"],
        }

    triple_files = sorted(
        os.path.join(d, f)
        for d in triples_run.completed_output_dirs()
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )

    result = rdf2smw_pipeline(
        rd.read_parquet(triple_files),
        use_templates=use_templates,
        timestamp=timestamp,
        salt=salt,
        resolver_concurrency=concurrency,
    )

    def _write(ds):
        def fn(tmp_dir: str) -> dict:
            n = ds.count()
            if n == 0:
                # write an explicit empty file so read_parquet of the
                # stage dir works on resume / in the CLI
                import pyarrow.parquet as pq

                from rdf2smw_ray.schemas import RENDERED_SCHEMA

                pq.write_table(
                    RENDERED_SCHEMA.empty_table(),
                    os.path.join(tmp_dir, "empty.parquet"),
                )
            else:
                ds.write_parquet(tmp_dir)
            return {"rows": n}

        return fn

    pages_dir, _ = stages.stage("pages", _write(result["content"]), params=stage_params)
    props_dir, _ = stages.stage("properties", _write(result["properties"]), params=stage_params)
    tpl_dir, _ = stages.stage("templates", _write(result["templates"]), params=stage_params)

    if write_xml:
        for name, d in (("pages", pages_dir), ("properties", props_dir), ("templates", tpl_dir)):
            write_xml_dump(rd.read_parquet(d), os.path.join(out_dir, f"{name}.xml"))

    return {
        "shards": summary,
        "pages_dir": pages_dir,
        "properties_dir": props_dir,
        "templates_dir": tpl_dir,
    }
