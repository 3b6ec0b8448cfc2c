"""Fuzzy edit-distance join: the vectorized DP kernel is pinned to a
scalar reference, and the blocked pair generation is pinned to a
brute-force all-pairs sweep on random corpora (every pair found, no
pair duplicated, owner/salt bookkeeping exact)."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rdf2smw_ray.pipelines.fuzzy import fuzzy_pairs, lev_batch


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(prev + (a[i - 1] != b[j - 1]), dp[j] + 1, dp[j - 1] + 1)
            prev = cur
    return dp[len(b)]


def test_lev_kernel_scalar_parity():
    rng = random.Random(13)
    a = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 9))) for _ in range(800)]
    b = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 9))) for _ in range(800)]
    got = lev_batch(pd.Series(a), pd.Series(b))
    assert (got == np.array([_lev_ref(x, y) for x, y in zip(a, b)])).all()


def test_fuzzy_pairs_brute_force_parity(ray_session):
    rng = random.Random(29)
    vocab = ["red", "blue", "small", "ring", "bolt", "gear", "gizmo"]
    names = list(
        {f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(60)}
    )
    ds = rd.from_arrow(
        pa.table({"p_name": pa.array(names * 3, pa.string())})
    ).repartition(4)
    for k in (1, 2, 3):
        out = fuzzy_pairs(ds, column="p_name", max_dist=k, salts=3).to_pandas()
        if out.empty:
            out = pd.DataFrame(columns=["name_a", "name_b", "dist"])
        out = out.sort_values(["name_a", "name_b"]).reset_index(drop=True)
        exp = []
        for i, a in enumerate(names):
            for b in names[i + 1 :]:
                d = _lev_ref(a, b)
                if d <= k:
                    exp.append((min(a, b), max(a, b), d))
        exp.sort()
        got = list(out.itertuples(index=False, name=None))
        assert got == exp


def test_lev_kernel_unicode():
    """Astral-plane and combining characters through the utf-32
    encode: codepoint-level distances must match the scalar DP."""
    cases = [
        ("café", "café"),       # precomposed vs combining
        ("\U0001F600ab", "ab\U0001F600"),  # emoji moved
        ("你好", "你好吗"),
        ("", "\U0001F680"),
        ("áb", "ab"),
    ]
    a = pd.Series([x for x, _ in cases])
    b = pd.Series([y for _, y in cases])
    got = lev_batch(a, b)
    exp = np.array([_lev_ref(x, y) for x, y in cases])
    assert (got == exp).all()
