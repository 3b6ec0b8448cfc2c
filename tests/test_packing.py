"""pipelines/packing.py — chunking boundaries and the distributed
prefix scan vs local references."""

import numpy as np
import pandas as pd
import pytest


def _docs_df(n=200, seed=1):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [
                " ".join(f"w{j}" for j in range(rng.randint(1, 120)))
                for _ in range(n)
            ],
        }
    )


def test_token_chunks_boundaries(ray_session):
    import ray.data as rd

    from rdf2smw_ray.pipelines.packing import token_chunks

    df = _docs_df()
    got = token_chunks(rd.from_pandas(df), window=50, stride=40).to_pandas()
    got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    rows = []
    for d, txt in zip(df["doc_id"], df["text"]):
        toks = txt.split()
        for i in range((len(toks) + 39) // 40):
            rows.append((d, i, " ".join(toks[i * 40 : i * 40 + 50])))
    want = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk_text"])
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("num_buckets", [1, 7])
def test_sequence_packing_matches_local_scan(ray_session, num_buckets):
    import ray.data as rd

    from rdf2smw_ray.pipelines.packing import sequence_packing

    df = _docs_df(seed=2)
    got = (
        sequence_packing(rd.from_pandas(df), cap=300, num_buckets=num_buckets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = df["text"].str.split().str.len().to_numpy()
    before = np.concatenate(([0], n[:-1].cumsum()))
    want = pd.DataFrame({"doc_id": df["doc_id"], "seq_id": before // 300})
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    assert got["seq_id"].nunique() > 1  # real multi-sequence packing
