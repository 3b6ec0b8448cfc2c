"""Kill/rerun resume coverage for the dedup chain (round-3 VERDICT
item 9): a run crashed mid-chain resumes from the last completed stage
manifest and produces results identical to an uninterrupted run."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path) -> list[str]:
    rng = np.random.RandomState(5)
    base_words = [f"w{i}" for i in range(60)]
    texts, ids = [], []
    doc_id = 0
    for c in range(8):
        core = " ".join(rng.choice(base_words, size=40))
        for dup in range(3):  # 3 near-identical docs per cluster
            tail = " ".join(rng.choice(base_words, size=2)) if dup else ""
            texts.append((core + " " + tail).strip())
            ids.append(doc_id)
            doc_id += 1
    for _ in range(20):  # unique background docs
        texts.append(" ".join(rng.choice(base_words, size=40)))
        ids.append(doc_id)
        doc_id += 1
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    paths = []
    for i in range(2):
        p = str(tmp_path / f"docs-{i}.parquet")
        pq.write_table(t.slice(i * 22, 22), p)
        paths.append(p)
    return paths


def _load(d: str) -> pd.DataFrame:
    import glob

    frames = [pq.read_table(p).to_pandas() for p in sorted(glob.glob(f"{d}/*.parquet"))]
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_dedup_resume_after_crash(tmp_path):
    from rdf2smw_ray.pipelines.dedup_checkpointed import run_dedup_checkpointed

    paths = _write_docs(tmp_path)
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    # uninterrupted reference run
    ref = run_dedup_checkpointed(paths, clean_dir, threshold=0.5, concurrency=2)
    assert not any(ref["skipped"].values())

    # crash right after the verify stage completes
    with pytest.raises(RuntimeError, match="injected failure"):
        run_dedup_checkpointed(
            paths, crash_dir, threshold=0.5, concurrency=2,
            fail_after_stage="verified_pairs",
        )
    # the completed stages left manifests; later stages did not run
    assert os.path.exists(
        os.path.join(crash_dir, "stages", "verified_pairs.manifest.json")
    )
    assert not os.path.exists(
        os.path.join(crash_dir, "stages", "clusters.manifest.json")
    )

    # resume: candidate+verify are skipped, the rest compute
    res = run_dedup_checkpointed(paths, crash_dir, threshold=0.5, concurrency=2)
    assert res["skipped"]["candidate_pairs"] and res["skipped"]["verified_pairs"]
    assert not res["skipped"]["clusters"] and not res["skipped"]["keep_best"]

    # resumed outputs identical to the uninterrupted run, stage by stage
    for name in ("candidate_pairs", "verified_pairs", "clusters", "keep_best"):
        pd.testing.assert_frame_equal(
            _load(res["dirs"][name]), _load(ref["dirs"][name]), check_like=True
        )
    # sanity: the synthetic clusters were actually found
    keep = _load(ref["dirs"]["keep_best"])
    assert len(keep) >= 6  # ≥6 of the 8 planted clusters survive banding


def test_dedup_resume_invalidates_on_param_change(tmp_path):
    from rdf2smw_ray.pipelines.dedup_checkpointed import run_dedup_checkpointed

    paths = _write_docs(tmp_path)
    out = str(tmp_path / "out")
    run_dedup_checkpointed(paths, out, threshold=0.5, concurrency=2)
    # different threshold → stale manifests must NOT be resumed
    res = run_dedup_checkpointed(paths, out, threshold=0.9, concurrency=2)
    assert not any(res["skipped"].values())
