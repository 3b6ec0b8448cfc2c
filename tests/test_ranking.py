"""Unit coverage for the distributed global ranking operator beyond
the sf0.001 oracle mirror: the NTILE integer formula against DuckDB's
window function for awkward (n, k), and the degenerate all-equal-value
distribution (every row lands in one range bucket — ranks must still
be exact and the tie-break deterministic)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from rdf2smw_ray.pipelines.ranking import _ntile, global_rank


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (103, 7), (15000, 4)])
def test_ntile_formula_matches_duckdb(n, k):
    ranks = np.arange(1, n + 1, dtype=np.int64)
    got = _ntile(ranks, n, k)
    exp = duckdb.sql(
        f"SELECT NTILE({k}) OVER (ORDER BY i) AS t FROM range({n}) r(i) ORDER BY i"
    ).df()["t"].to_numpy()
    assert (got == exp).all()


def test_global_rank_all_equal_values(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"id": np.arange(37, dtype=np.int64), "v": 5.0})
    out = global_rank(
        rd.from_pandas(df), value_col="v", id_col="id", tiles=3, num_buckets=8
    )
    # all ties -> rank order is the id tie-break
    assert (out["rnk"].to_numpy() == np.arange(1, 38)).all()
    assert out["tile"].value_counts().sort_index().tolist() == [13, 12, 12]


def test_global_rank_skewed_values(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(7)
    v = np.concatenate([rng.zipf(1.5, 400).astype(np.float64), [1e9]])
    df = pd.DataFrame({"id": np.arange(len(v), dtype=np.int64), "v": v})
    out = global_rank(
        rd.from_pandas(df), value_col="v", id_col="id", num_buckets=16
    )
    exp = df.sort_values(["v", "id"]).reset_index(drop=True)
    got = out.set_index("rnk").sort_index()
    assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()


def test_dense_rank_strings_order_preserving(ray_session):
    import ray.data as rd

    from rdf2smw_ray.pipelines.ranking import dense_rank_strings

    rng = np.random.RandomState(3)
    names = list({"".join(rng.choice(list("abcdef"), rng.randint(1, 10))) for _ in range(300)})
    ds = rd.from_pandas(pd.DataFrame({"v": names})).repartition(5)
    # tiny sample_target forces the sampled-boundary path
    out = (
        dense_rank_strings(ds, column="v", num_buckets=6, sample_target=40)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(out) == len(names)
    assert out["id"].tolist() == list(range(len(names)))
    assert out["v"].tolist() == sorted(names)


def test_grouped_rank_two_hot_keys(ray_session):
    import duckdb
    import ray.data as rd

    from rdf2smw_ray.pipelines.ranking import grouped_rank

    rng = np.random.RandomState(11)
    n = 4000
    df = pd.DataFrame(
        {
            "k": np.where(rng.rand(n) < 0.7, "hot", "cold"),
            "id": np.arange(n, dtype=np.int64),
            "v": np.round(rng.rand(n) * 100, 2),
        }
    )
    out = grouped_rank(
        rd.from_pandas(df).repartition(6),
        key_col="k", value_col="v", id_col="id", tiles=3, num_buckets=8,
    )
    exp = duckdb.sql(
        """SELECT k, id,
                  ROW_NUMBER() OVER (PARTITION BY k ORDER BY v, id) AS price_rank,
                  CAST(NTILE(3) OVER (PARTITION BY k ORDER BY v, id) AS BIGINT) AS tile
           FROM df ORDER BY id"""
    ).df()
    got = out.rename(columns={"rnk": "price_rank"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
