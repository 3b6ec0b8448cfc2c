"""stages/bloom.py — distributed Bloom build + Bloom-prefiltered anti
join."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from rdf2smw_ray.stages.bloom import BloomFilter, bloom_anti_join, build_bloom


def test_bloom_no_false_negatives_and_low_fp():
    bf = BloomFilter(m_bits=1 << 16, k=7)
    present = pd.Series(np.arange(0, 2000, dtype=np.int64))
    absent = pd.Series(np.arange(100_000, 110_000, dtype=np.int64))
    bf.add(present)
    assert bf.might_contain(present).all()  # no false negatives, ever
    fp = bf.might_contain(absent).mean()
    assert fp < 0.05, fp  # 2000 keys in 64k bits, k=7 → tiny fp rate


def test_distributed_build_equals_local():
    keys = np.concatenate([np.arange(500), np.arange(10_000, 10_500)]).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(7)
    dist = build_bloom(ds, "k", m_bits=1 << 16)
    local = BloomFilter(m_bits=1 << 16)
    local.add(pd.Series(keys))
    assert np.array_equal(dist.bits, local.bits)


def test_bloom_anti_join_equals_exact():
    rng = np.random.RandomState(11)
    left = pd.DataFrame({"k": rng.randint(0, 3000, 5000).astype(np.int64)})
    right = pd.DataFrame({"rk": rng.randint(0, 1500, 4000).astype(np.int64)})
    got = (
        bloom_anti_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", right_key="rk", m_bits=1 << 16,
        )
        .to_pandas()["k"]
        .sort_values()
        .reset_index(drop=True)
    )
    want = (
        left.loc[~left["k"].isin(set(right["rk"])), "k"]
        .sort_values()
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got, want)
