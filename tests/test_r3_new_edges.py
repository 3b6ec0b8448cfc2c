"""Degenerate-input coverage for the round-3 session additions: empty
corpora, all-too-short documents, single-key/single-row ranking —
every operator must return schema-stable, semantically-zero output
rather than crash or lose columns."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)


def test_dup_ngram_stats_all_short_docs(ray_session):
    from rdf2smw_ray.pipelines.spans import dup_ngram_stats

    out = (
        dup_ngram_stats(_docs(["a b", "c", "", "x y z"]), n=5, num_buckets=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert (out["n_grams"] == 0).all()
    assert (out["dup_grams"] == 0).all()
    assert (out["dup_pct"] == 0).all()


def test_dup_ngram_stats_identical_docs(ray_session):
    from rdf2smw_ray.pipelines.spans import dup_ngram_stats

    t = "a b c d e f g"
    out = (
        dup_ngram_stats(_docs([t, t, "q r s t u v w"]), n=3, num_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["dup_pct"].tolist() == [100, 100, 0]


def test_fuzzy_pairs_no_hits_schema_stable(ray_session):
    from rdf2smw_ray.pipelines.fuzzy import fuzzy_part_pairs  # noqa: F401
    from rdf2smw_ray.pipelines.fuzzy import _pairs_frame, fuzzy_pairs

    ds = rd.from_arrow(
        pa.table({"p_name": pa.array(["aaaaaaaa", "zzzz"], pa.string())})
    )
    out = _pairs_frame(fuzzy_pairs(ds, column="p_name", max_dist=1, salts=2).to_pandas())
    assert list(out.columns) == ["name_a", "name_b", "dist"]
    assert len(out) == 0


def test_fuzzy_canon_all_singletons(ray_session):
    from rdf2smw_ray.pipelines.fuzzy import fuzzy_canon

    names = ["alpha###1", "beta%%%22", "gamma@@333"]
    ds = rd.from_arrow(pa.table({"p_name": pa.array(names, pa.string())}))
    out = (
        fuzzy_canon(ds, column="p_name", max_dist=1)
        .to_pandas()
        .sort_values("name")
        .reset_index(drop=True)
    )
    assert out["name"].tolist() == sorted(names)
    assert (out["name"] == out["canon"]).all()


def test_global_rank_single_row(ray_session):
    from rdf2smw_ray.pipelines.ranking import global_rank

    ds = rd.from_pandas(pd.DataFrame({"id": [7], "v": [3.5]}))
    out = global_rank(ds, value_col="v", id_col="id", tiles=4, num_buckets=4)
    assert out["rnk"].tolist() == [1]
    assert out["tile"].tolist() == [1]


def test_grouped_rank_single_key_single_bucket(ray_session):
    from rdf2smw_ray.pipelines.ranking import grouped_rank

    df = pd.DataFrame({"k": ["x"] * 5, "id": range(5), "v": [2.0] * 5})
    out = grouped_rank(
        rd.from_pandas(df), key_col="k", value_col="v", id_col="id",
        tiles=2, num_buckets=3,
    )
    assert out["rnk"].tolist() == [1, 2, 3, 4, 5]
    assert out["tile"].tolist() == [1, 1, 1, 2, 2]


def test_knn_graph_auto_tiles_vs_brute(ray_session):
    import pyarrow as pa

    from rdf2smw_ray.pipelines.ann import knn_graph

    rng = np.random.RandomState(9)
    n, d, k = 60, 8, 3
    mat = rng.randn(n, d).astype(np.float64)
    flat = pa.array(mat.ravel(), pa.float64())
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(flat, d),
        }
    )
    out = knn_graph(rd.from_arrow(tbl).repartition(3), k=k)  # auto num_tiles
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = norm @ norm.T
    np.fill_diagonal(scores, -np.inf)
    for i in range(n):
        s6 = np.round(scores[i], 6)
        order = np.lexsort((np.arange(n), -s6))[:k]
        got = out[out["vec_id"] == i].sort_values("rk")["nbr_id"].tolist()
        assert got == list(order)


def test_uncached_read_with_projection(ray_session, monkeypatch):
    """GRAFT_NO_TABLE_CACHE + a column subset must project the declared
    schema too (full schema beside projected blocks -> ArrowInvalid)."""
    from rdf2smw_ray.pipelines.io_cache import cached_table

    monkeypatch.setenv("GRAFT_NO_TABLE_CACHE", "1")
    ds = cached_table("/root/testdata/sf0.001", "events", ["event_type", "value"])
    df = ds.to_pandas()
    assert list(df.columns) == ["event_type", "value"]
    assert len(df) == 1000
