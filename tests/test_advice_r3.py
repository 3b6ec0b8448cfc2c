"""Round-3 ADVICE regression tests: composite-key overflow fallback,
seq_base path normalization, cross-dtype join keys, NaN-consistent
approximate quantiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# windows.clicks_before_purchase_window: int64-safe composite key
# ---------------------------------------------------------------------------
def _synth_events(n_users: int, span_days: int, seed: int = 7) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2020-01-01").value
    for u in range(n_users):
        n_ev = rng.randint(2, 8)
        ts = base + rng.randint(0, span_days * 86_400_000_000_000, size=n_ev)
        for t in np.sort(ts):
            rows.append(
                (
                    u,
                    eid,
                    t,
                    rng.choice(["click", "purchase", "view"], p=[0.5, 0.3, 0.2]),
                )
            )
            eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_ns", "event_type"])
    df["ts"] = pd.to_datetime(df["ts_ns"])
    return df.drop(columns=["ts_ns"])


def _brute_window_counts(df: pd.DataFrame, window_minutes: int) -> pd.DataFrame:
    w = np.int64(window_minutes * 60 * 1_000_000_000)
    ts = df["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
    out = []
    for i in np.flatnonzero((df["event_type"] == "purchase").to_numpy()):
        u, t = df["user_id"].iat[i], ts[i]
        mask = (
            (df["user_id"] == u).to_numpy()
            & (df["event_type"] == "click").to_numpy()
            & (ts < t)
            & (ts > t - w)
        )
        out.append((int(u), int(df["event_id"].iat[i]), int(mask.sum())))
    return (
        pd.DataFrame(out, columns=["user_id", "purchase_id", "n_clicks"])
        .sort_values(["user_id", "purchase_id"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "n_users,span_days",
    [
        (20, 2),  # fast path: composite key fits easily
        (400, 400),  # overflow regime: 400 users x ~3.5e16 ns span > 2^63
    ],
)
def test_window_counts_both_regimes(tmp_path, n_users, span_days):
    from rdf2smw_ray.pipelines import windows

    df = _synth_events(n_users, span_days)
    span_ns = (
        df["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64).max()
        - df["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64).min()
    )
    if span_days == 400:
        # the regime the round-2 ADVICE flagged: global-range span would wrap
        assert n_users * (int(span_ns) + 3_600_000_000_000) > 2**63 - 1
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = windows.clicks_before_purchase_window(str(tmp_path))
    want = _brute_window_counts(df, 60)
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# sources: resolve_seq_base normalization fallback (shared by all readers)
# ---------------------------------------------------------------------------
def test_resolve_seq_base():
    from rdf2smw_ray.sources.ntriples import resolve_seq_base

    idx = {"data/a.ttl": 0, "data/b.ttl": 1}
    assert resolve_seq_base("data/b.ttl", idx) == 1  # exact
    assert resolve_seq_base("/abs/prefix/data/b.ttl", idx) == 1  # absolutized
    assert resolve_seq_base("b.ttl", idx) == 1  # shortened
    assert resolve_seq_base("unrelated.ttl", idx) == 0  # miss → 0


def test_read_turtle_audited_distinct_seq_bases(tmp_path):
    """Two files must land in distinct seq ranges (first-wins ordering
    downstream depends on it) — audited reader included."""
    from rdf2smw_ray.sources.ntriples import _FILE_SEQ_STRIDE
    from rdf2smw_ray.sources.turtle import read_turtle, read_turtle_audited

    for name, subj in [("a.ttl", "s1"), ("b.ttl", "s2")]:
        (tmp_path / name).write_text(
            f"<http://x.org/{subj}> <http://x.org/p> \"v\" .\n"
        )
    for reader in (read_turtle, read_turtle_audited):
        out = reader(str(tmp_path)).to_pandas()
        bases = sorted(set(out["seq"] // _FILE_SEQ_STRIDE))
        assert bases == [0, 1], f"{reader.__name__}: {bases}"


# ---------------------------------------------------------------------------
# stages/join + stages/bloom: cross-dtype key hashing
# ---------------------------------------------------------------------------
def test_bucketed_join_mixed_int_widths():
    import ray.data as rd

    from rdf2smw_ray.stages.join import bucketed_join

    keys = [-5, -1, 0, 3, 1000]
    left = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int32()), "lv": list(range(5))})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "rv": [10, 20, 30, 40, 50]})
    )
    out = (
        bucketed_join(left, right, key="k", how="inner", num_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 5, f"dropped matches across int widths: {out}"
    assert out["rv"].tolist() == [10, 20, 30, 40, 50]


def test_bloom_mixed_int_widths():
    from rdf2smw_ray.stages.bloom import BloomFilter

    bf = BloomFilter(1 << 12, 5)
    bf.add(pd.Series(np.array([-5, -1, 7], dtype=np.int32)))
    hit = bf.might_contain(pd.Series(np.array([-5, -1, 7, 999], dtype=np.int64)))
    assert hit[:3].all()


# ---------------------------------------------------------------------------
# sketches.approx_quantiles with NaNs in the column
# ---------------------------------------------------------------------------
def test_approx_quantiles_with_nans():
    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import approx_quantiles

    rng = np.random.RandomState(3)
    v = rng.uniform(0, 100, size=5000)
    v[rng.choice(5000, size=1500, replace=False)] = np.nan
    ds = rd.from_arrow(pa.table({"value": v})).repartition(8)
    qs = [0.1, 0.5, 0.9]
    got = approx_quantiles(ds, "value", qs, num_bins=2048)
    want = np.nanquantile(v, qs)
    tol = 100 / 2048 * 2  # two bin widths
    assert np.all(np.abs(np.array(got) - want) < tol), (got, want)


# ---------------------------------------------------------------------------
# stages/bloom: width auto-sizing (round-3 VERDICT item 2)
# ---------------------------------------------------------------------------
def test_bloom_bits_for_grows_with_keys():
    from rdf2smw_ray.stages.bloom import bloom_bits_for

    assert bloom_bits_for(0) == 1 << 20  # floor
    assert bloom_bits_for(100) == 1 << 20
    m1 = bloom_bits_for(1_000_000)
    m2 = bloom_bits_for(10_000_000)
    assert m1 >= 10 * 1_000_000 and m1 & (m1 - 1) == 0
    assert m2 > m1
    assert bloom_bits_for(10**12) == 1 << 27  # cap


# ---------------------------------------------------------------------------
# dedup token hashing: vectorized kernel (round-3 VERDICT item 3)
# ---------------------------------------------------------------------------
def test_hash64_tokens_vectorized_quality():
    """The siphash replacement must be deterministic, 64-bit-spread and
    collision-free at working-set scale (the blake2b kernel is kept as
    the quality reference for this transition)."""
    from rdf2smw_ray.pipelines.dedup import _hash64_tokens, _hash64_tokens_blake

    toks = [f"tok{i}" for i in range(20000)] + ["a", "b", "", "émile", "漢字"]
    h1 = _hash64_tokens(toks)
    h2 = _hash64_tokens(list(toks))
    assert (h1 == h2).all()  # deterministic
    assert h1.dtype == np.uint64
    assert len(np.unique(h1)) == len(set(toks))  # no collisions
    # both kernels agree on the token SET structure (distinctness), the
    # property every downstream op (shingles/simhash/winnowing) uses
    hb = _hash64_tokens_blake(toks)
    assert len(np.unique(hb)) == len(set(toks))
    # spread: top byte is populated across the range
    assert len(np.unique(h1 >> np.uint64(56))) > 100
