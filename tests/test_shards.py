"""End-to-end training-shard preparation: crash/resume semantics and
output equivalence — a killed run resumes after its last completed
stage (completed stages skipped, not recomputed) and the final shard
tree is content-identical to an uninterrupted run."""

import pandas as pd
import pyarrow.dataset as pads
import pytest

from rdf2smw_ray.pipelines.shards import prepare_training_shards

SF = "/root/testdata/sf0.001"


def _shard_frame(shard_dir: str) -> pd.DataFrame:
    return (
        pads.dataset(shard_dir, partitioning="hive")
        .to_table()
        .to_pandas()
        .astype({"shard": "int64"})
        .sort_values(["doc_id"])
        .reset_index(drop=True)[["doc_id", "seq_id", "text", "shard"]]
    )


def test_prepare_training_shards_resume_and_equivalence(ray_session, tmp_path):
    paths = [f"{SF}/documents.parquet"]

    # uninterrupted reference run
    ref = prepare_training_shards(paths, str(tmp_path / "ref"))
    assert ref["manifest"]["rows"] > 0
    assert not any(ref["skipped"].values())

    # crashed run: dies after stage 2
    with pytest.raises(RuntimeError, match="injected failure"):
        prepare_training_shards(
            paths, str(tmp_path / "resumed"), fail_after_stage="decontam"
        )
    # resume: stages 1-2 skipped, 3-4 computed
    res = prepare_training_shards(paths, str(tmp_path / "resumed"))
    assert res["skipped"]["quality"] and res["skipped"]["decontam"]
    assert not res["skipped"]["packed"]

    a, b = _shard_frame(ref["shards"]), _shard_frame(res["shards"])
    pd.testing.assert_frame_equal(a, b)
    # the shard layout is the hive tree the manifest declares
    assert sorted(res["manifest"]["partitions"]) == res["manifest"]["partitions"]
    assert res["manifest"]["rows"] == len(b)
    # contaminated + rejected docs are really gone
    assert len(b) < 500  # sf0.001 has 500 docs; filters must bite


def test_prepare_training_shards_param_invalidation(ray_session, tmp_path):
    paths = [f"{SF}/documents.parquet"]
    first = prepare_training_shards(paths, str(tmp_path / "run"), cap=256)
    assert not any(first["skipped"].values())
    a = _shard_frame(first["shards"])  # capture BEFORE reruns overwrite the tree
    # identical params: every stage skips
    again = prepare_training_shards(paths, str(tmp_path / "run"), cap=256)
    assert all(again["skipped"].values())
    # changed packing cap: stage checkpoints invalidate, nothing skips
    changed = prepare_training_shards(paths, str(tmp_path / "run"), cap=128)
    assert not any(changed["skipped"].values())
    c = _shard_frame(changed["shards"])
    assert not a["seq_id"].equals(c["seq_id"])  # the cap really changed packing
    assert set(a["doc_id"]) == set(c["doc_id"])  # same eligible corpus
