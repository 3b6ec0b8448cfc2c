"""HyperLogLog sketch tests: accuracy, mergeability, serialization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.pipelines.sketches import HLL, _hash64, approx_distinct


def test_hll_accuracy():
    h = HLL(p=12)
    h.add_hashes(_hash64([f"item-{i}" for i in range(10_000)]))
    est = h.estimate()
    assert abs(est - 10_000) / 10_000 < 0.05  # 1.04/sqrt(4096) ≈ 1.6%


def test_hll_merge_equals_union():
    a = HLL(p=12).add_hashes(_hash64([f"x{i}" for i in range(5000)]))
    b = HLL(p=12).add_hashes(_hash64([f"x{i}" for i in range(2500, 7500)]))
    u = HLL(p=12).add_hashes(_hash64([f"x{i}" for i in range(7500)]))
    merged = a.merge(b)
    assert np.array_equal(merged.registers, u.registers)


def test_hll_serialize_roundtrip():
    h = HLL(p=10).add_hashes(_hash64(list(range(1000))))
    h2 = HLL.deserialize(h.serialize())
    assert h2.p == 10 and np.array_equal(h2.registers, h.registers)


def test_approx_distinct_dataset():
    ds = rd.from_arrow(
        pa.table({"u": [f"user-{i % 700}" for i in range(20_000)]})
    ).repartition(8)
    est = approx_distinct(ds, "u")
    assert abs(est - 700) / 700 < 0.05


def test_approx_distinct_on_events():
    est = approx_distinct(
        rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"]),
        "user_id",
    )
    import duckdb

    exact = duckdb.sql(
        "select count(distinct user_id) from read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.1


def test_approx_quantiles_accuracy():
    import numpy as np
    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import approx_quantiles

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["value"])
    vals = ds.to_pandas()["value"].to_numpy()
    qs = [0.1, 0.5, 0.9, 0.99]
    got = approx_quantiles(ds, "value", qs, num_bins=4096)
    want = np.quantile(vals, qs)
    tol = 2 * (vals.max() - vals.min()) / 4096
    for g, w in zip(got, want):
        assert abs(g - w) <= tol, (g, w, tol)


def test_approx_quantiles_degenerate():
    import math

    import pyarrow as pa
    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import approx_quantiles

    const = rd.from_arrow(pa.table({"v": [7.0] * 100}))
    assert approx_quantiles(const, "v", [0.5]) == [7.0]
    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert math.isnan(approx_quantiles(empty, "v", [0.5])[0])


# ---------------------------------------------------------------------------
# exact_median_per_key (round-3 VERDICT item 1)
# ---------------------------------------------------------------------------
def test_exact_median_per_key_matches_pandas():
    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import exact_median_per_key

    rng = np.random.RandomState(11)
    frames = []
    # mixed regimes: skew (one huge key), duplicates, even/odd counts,
    # negative values, a constant key
    frames.append(pd.DataFrame({"k": "big", "v": rng.lognormal(0, 2, 20001)}))
    frames.append(pd.DataFrame({"k": "even", "v": rng.uniform(-50, 50, 5000)}))
    frames.append(pd.DataFrame({"k": "dups", "v": rng.randint(0, 7, 3001).astype(float)}))
    frames.append(pd.DataFrame({"k": "const", "v": np.full(100, 3.25)}))
    frames.append(pd.DataFrame({"k": "tiny", "v": [1.0, 2.0]}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=4)
    ds = rd.from_pandas(df).repartition(16)
    # tiny threshold + few bins → forces ≥2 refinement rounds on "big"
    got = exact_median_per_key(
        ds, "k", "v", num_bins=16, exact_threshold=64
    )
    want = (
        df.groupby("k")["v"].median().rename("median").reset_index()
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.rename(columns={"k": "k"}), atol=0, rtol=0)


def test_exact_median_ignores_nans():
    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import exact_median_per_key

    df = pd.DataFrame(
        {"k": ["a"] * 6 + ["b"] * 3, "v": [1, 2, np.nan, 4, np.nan, 9, 5, np.nan, 7]}
    )
    ds = rd.from_pandas(df)
    got = exact_median_per_key(ds, "k", "v", num_bins=4, exact_threshold=2)
    want = df.groupby("k")["v"].median().rename("median").reset_index()
    pd.testing.assert_frame_equal(got, want)


def test_exact_percentile_disc_matches_numpy(ray_session):
    """PERCENTILE_DISC generalization: rank ceil(q·n) order statistic,
    exact on random data with heavy ties, refinement path forced."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import exact_percentile_per_key

    rng = np.random.RandomState(42)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 7, 5000),
            # ties on purpose: values quantized to one decimal
            "v": np.round(rng.exponential(10, 5000), 1),
        }
    )
    got = exact_percentile_per_key(
        rd.from_pandas(df), "k", "v", num=9, den=10, out_col="p90",
        exact_threshold=50, num_bins=16,
    )
    want = {
        k: np.sort(g["v"].to_numpy())[(9 * len(g) + 9) // 10 - 1]
        for k, g in df.groupby("k")
    }
    got_map = dict(zip(got["k"], got["p90"]))
    assert got_map == want


def test_cms_one_sided_and_bounded(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter

    from rdf2smw_ray.pipelines.sketches import cms_token_counts

    rng = __import__("random").Random(3)
    vocab = [f"t{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40)))
        for _ in range(300)
    ]
    docs = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})).repartition(5)
    true = Counter(tok for t in texts for tok in t.split())
    n_total = sum(true.values())
    cand = sorted(vocab[:30])
    d, w = 4, 1 << 12
    out = cms_token_counts(docs, cand, d=d, w=w).set_index("token")["est"]
    eps_bound = int(np.ceil(np.e / w * n_total)) + 1
    for tok in cand:
        assert out[tok] >= true[tok]          # never under-counts
        assert out[tok] <= true[tok] + max(eps_bound, 3)
