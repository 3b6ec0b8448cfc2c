"""HyperLogLog sketch tests: accuracy, mergeability, serialization."""

import numpy as np
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
