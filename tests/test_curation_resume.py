"""Checkpoint/resume for the composed curation chain (quality →
kept-corpus line dedup): crash after stage 1, rerun, verify the
quality stage is skipped and the final output is identical to an
uninterrupted run."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rdf2smw_ray.pipelines.curation import run_curation_checkpointed


def _write_docs(path):
    import duckdb

    con = duckdb.connect()
    t = con.execute(
        "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetch_arrow_table()
    pq.write_table(t, path)


def _read_sorted(d):
    import ray.data as rd

    return (
        rd.read_parquet(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def test_curation_resume_identical(ray_session, tmp_path):
    src = str(tmp_path / "docs.parquet")
    _write_docs(src)

    # uninterrupted reference run
    ref = run_curation_checkpointed([src], str(tmp_path / "ref"))
    assert ref["skipped"] == {"quality": False, "curated": False}
    ref_out = _read_sorted(ref["curated"])
    assert len(ref_out) > 0
    assert (ref_out["n_lines"] - ref_out["n_kept"] == ref_out["n_dropped"]).all()

    # crash after stage 1, then resume
    out_dir = str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_curation_checkpointed([src], out_dir, fail_after_stage="quality")
    res = run_curation_checkpointed([src], out_dir)
    assert res["skipped"] == {"quality": True, "curated": False}
    pd.testing.assert_frame_equal(_read_sorted(res["curated"]), ref_out)

    # a second rerun is a full skip
    res2 = run_curation_checkpointed([src], out_dir)
    assert res2["skipped"] == {"quality": True, "curated": True}


def test_curation_input_change_invalidates(ray_session, tmp_path):
    src = str(tmp_path / "docs.parquet")
    _write_docs(src)
    out_dir = str(tmp_path / "run")
    run_curation_checkpointed([src], out_dir)

    # mutate the input: the digest changes, stages must recompute
    t = pq.read_table(src)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), src)
    res = run_curation_checkpointed([src], out_dir)
    assert res["skipped"] == {"quality": False, "curated": False}
