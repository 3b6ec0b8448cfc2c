"""stages/join.py — bucketed hash join correctness (vs pandas) and the
round-1 VERDICT "done" criteria: auto-sized widths grow with input,
and the join-family queries keep only O(dimension) rows on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rdf2smw_ray.stages.join import bucketed_join
from rdf2smw_ray.tuning import auto_buckets

SF_DIR = "/root/testdata/sf0.001"


def _mk(left_n=2000, right_n=300, seed=7):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            # skewed: key 0 is hot, some keys have no right match
            "k": np.concatenate(
                [np.zeros(left_n // 4, dtype=np.int64), rng.randint(0, 500, left_n - left_n // 4)]
            ),
            "lv": rng.randint(0, 1000, left_n).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.arange(right_n, dtype=np.int64),
            "rv": rng.randint(0, 1000, right_n).astype(np.int64),
        }
    ).drop_duplicates("rk")
    return left, right


def _run(left, right, how, **kw):
    import ray.data as rd

    out = bucketed_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        key="k",
        right_key="rk",
        how=how,
        num_buckets=5,
        **kw,
    ).to_pandas()
    return out


def _sorted(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_inner_join_matches_pandas():
    left, right = _mk()
    got = _run(left, right, "inner", right_cols={"rv": "rv"})
    want = left.merge(right.rename(columns={"rk": "k"}), on="k", how="inner")
    pd.testing.assert_frame_equal(
        _sorted(got, ["k", "lv", "rv"]), _sorted(want, ["k", "lv", "rv"])
    )


def test_left_join_matches_pandas():
    left, right = _mk()
    got = _run(left, right, "left", right_cols={"rv": "rv"})
    want = left.merge(right.rename(columns={"rk": "k"}), on="k", how="left")
    got["rv"] = got["rv"].astype("float64")
    want["rv"] = want["rv"].astype("float64")
    pd.testing.assert_frame_equal(
        _sorted(got, ["k", "lv", "rv"]), _sorted(want, ["k", "lv", "rv"])
    )


@pytest.mark.parametrize("how", ["right", "outer"])
def test_right_outer_join_matches_pandas(how):
    left, right = _mk()
    got = _run(left, right, how, right_cols={"rv": "rv"}, multiplicity="all")
    want = left.merge(right.rename(columns={"rk": "k"}), on="k", how=how)
    for c in ("lv", "rv"):
        got[c] = got[c].astype("float64")
        want[c] = want[c].astype("float64")
    got["k"] = got["k"].astype("int64")
    want["k"] = want["k"].astype("int64")
    pd.testing.assert_frame_equal(
        _sorted(got, ["k", "lv", "rv"]), _sorted(want, ["k", "lv", "rv"])
    )
    if how == "outer":
        # unmatched rows from BOTH sides must survive, null-padded
        assert got["lv"].isna().any() and got["rv"].isna().any()


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_semi_anti_join_matches_pandas(how):
    left, right = _mk()
    in_right = left["k"].isin(set(right["rk"]))
    want = left[in_right if how == "semi" else ~in_right]
    got = _run(left, right, how)
    pd.testing.assert_frame_equal(
        _sorted(got, ["k", "lv"]), _sorted(want, ["k", "lv"])
    )


def test_anti_join_empty_result():
    left, right = _mk()
    right_all = pd.DataFrame({"rk": left["k"].unique()})
    got = _run(left, right_all, "anti")
    assert len(got) == 0


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
@pytest.mark.parametrize("mult", ["lookup", "all"])
def test_broadcast_path_equals_shuffle_path(how, mult):
    """The size-gated broadcast strategy must be value-identical to the
    bucket co-shuffle for every mode it serves — including duplicated
    right keys (identical payload rows, so `lookup`'s arbitrary pick is
    value-deterministic) and the hot key 0."""
    left, right = _mk()
    right_dup = pd.concat([right, right.head(40)], ignore_index=True)
    kw = dict(multiplicity=mult)
    if how in ("inner", "left"):
        kw["right_cols"] = {"rv": "rv"}
        cols = ["k", "lv", "rv"]
    else:
        cols = ["k", "lv"]
    a = _run(left, right_dup, how, broadcast="force", **kw)
    b = _run(left, right_dup, how, broadcast="never", **kw)
    pd.testing.assert_frame_equal(_sorted(a, cols), _sorted(b, cols))


def test_broadcast_mixed_int_key_widths():
    """int32 right key vs int64 left key (incl. negative values — the
    dtype-width hashing hazard from round-2 ADVICE) must match by value
    on the broadcast path."""
    left = pd.DataFrame(
        {"k": np.array([-5, -5, 3, 7, 9], dtype=np.int64), "lv": np.arange(5)}
    )
    right = pd.DataFrame(
        {"rk": np.array([-5, 3, 8], dtype=np.int32), "rv": [10, 20, 30]}
    )
    got = _run(left, right, "inner", right_cols={"rv": "rv"}, broadcast="force")
    want = left.merge(
        right.assign(k=right["rk"].astype(np.int64)).drop(columns=["rk"]), on="k"
    )
    pd.testing.assert_frame_equal(
        _sorted(got, ["k", "lv", "rv"]), _sorted(want, ["k", "lv", "rv"])
    )


def test_broadcast_threshold_fallback(monkeypatch):
    """A 1-byte threshold sends `auto` down the fall-through branch —
    the co-shuffle of the already-reduced right side — which must be
    value-identical to both the broadcast and the plain shuffle."""
    monkeypatch.setenv("GRAFT_BROADCAST_JOIN_BYTES", "1")
    left, right = _mk()
    got = _run(left, right, "left", right_cols={"rv": "rv"}, broadcast="auto")
    monkeypatch.delenv("GRAFT_BROADCAST_JOIN_BYTES")
    want = _run(left, right, "left", right_cols={"rv": "rv"}, broadcast="never")
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(_sorted(got, cols), _sorted(want, cols))


def test_broadcast_with_overreported_left_schema(ray_session):
    """Ray 2.49 quirk: .schema() of a select_columns projection over a
    materialized map_batches output reports the UNPROJECTED upstream
    schema. Both join strategies must tolerate it by null-padding the
    phantom column (this is the BFS frontier lineage that broke the
    first broadcast cut)."""
    import pyarrow.compute as pc
    import ray.data as rd

    base = rd.from_items(
        [{"node": "a", "dist": 1}, {"node": "b", "dist": 2}]
    ).materialize()
    frontier = base.map_batches(
        lambda t: t.filter(pc.greater(t["dist"], 0)), batch_format="pyarrow"
    ).materialize()
    left = frontier.select_columns(["node"])
    right = rd.from_pandas(pd.DataFrame({"u": ["a", "b"], "v": ["x", "y"]}))
    outs = {}
    for mode in ("force", "never"):
        out = bucketed_join(
            left,
            right,
            key="node",
            right_key="u",
            right_cols={"v": "nbr"},
            multiplicity="all",
            broadcast=mode,
        ).to_pandas()
        outs[mode] = out.sort_values("node").reset_index(drop=True)
    assert list(outs["force"]["nbr"]) == ["x", "y"]
    pd.testing.assert_frame_equal(outs["force"], outs["never"])


def test_auto_buckets_grows_with_input_and_floors_at_cpus():
    floor = auto_buckets(0)
    assert floor >= 1
    assert auto_buckets(10 << 30) > auto_buckets(1 << 30) >= floor
    assert auto_buckets(1 << 50) == 4096  # capped
    # explicit floor override
    assert auto_buckets(0, min_buckets=7) == 7


@pytest.mark.parametrize("driver_threshold", [1_000_000, 0])
def test_connected_components_chain_clique_pair(driver_threshold):
    """Both paths: driver union-find (small graphs) and the
    distributed label-propagation loop (threshold=0 forces it)."""
    import pyarrow as pa
    import ray.data as rd

    from rdf2smw_ray.pipelines.dedup import connected_components

    # chain 10-11-12-13-14, clique {20,21,22}, pair {30,31}
    chain = [(10, 11), (11, 12), (12, 13), (13, 14)]
    clique = [(20, 21), (20, 22), (21, 22)]
    pair = [(30, 31)]
    edges = rd.from_arrow(
        pa.table(
            {
                "doc_a": [a for a, _ in chain + clique + pair],
                "doc_b": [b for _, b in chain + clique + pair],
            }
        )
    )
    out = (
        connected_components(edges, "doc_a", "doc_b", driver_threshold=driver_threshold)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = dict(zip(out["node"], out["label"]))
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_join_queries_driver_reads_only_dimension_tables(monkeypatch):
    """The round-1 fix contract: the join-family queries must not pull
    any data-proportional table (customer/orders/lineitem) onto the
    driver — only dimension tables (nation/region) may be read there.
    Worker-side ray.data reads run in separate processes and are not
    affected by this monkeypatch, so any hit recorded here IS a
    driver-side read."""
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines import relational, windows

    seen: list[str] = []
    orig = pq.read_table

    def spy(path, *a, **kw):
        seen.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(pq, "read_table", spy)

    relational.orders_per_nation(SF_DIR)
    relational.top_orders_per_nation(SF_DIR)
    relational.revenue_per_orderpriority(SF_DIR)
    windows.customers_without_orders(SF_DIR)
    windows.orders_from_europe(SF_DIR)

    big = [p for p in seen if any(t in p for t in ("customer", "orders", "lineitem"))]
    assert big == [], f"driver read data-proportional tables: {big}"
    for p in seen:
        assert "nation" in p or "region" in p, p


def test_join_preserves_large_int64_exactly(ray_session):
    """Null padding in the bucket union must not round int64 values
    above 2^53 through float64 (seq keys / ns timestamps regression:
    adjacent values collapsed to one float, breaking downstream
    ordering)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from rdf2smw_ray.stages.join import bucketed_join

    base = 960130463883591680  # ~2^59.7: float64 ulp at this magnitude is 128
    seqs = np.arange(base, base + 50, dtype=np.int64)
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(50) % 7, pa.int64()),
                "seq": pa.array(seqs, pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
                  "v": pa.array(list("abcdefg"), pa.string())})
    )
    for how in ("inner", "left", "semi"):
        out = bucketed_join(
            left, right, key="k", how=how, num_buckets=4
        ).to_pandas()
        assert sorted(out["seq"]) == sorted(seqs.tolist()), how


def test_bucketed_join_multiplicity_all(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdf2smw_ray.stages.join import bucketed_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 2], pa.int64()), "lv": ["a", "b", "c"]})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 3], pa.int64()), "rv": ["x", "y", "z"]})
    )
    # lookup: each left row matches at most once
    look = bucketed_join(left, right, key="k", num_buckets=2).to_pandas()
    assert len(look) == 2  # k=1 left rows a,b each matched once; k=2 dropped
    # all: k=1 (2 left × 2 right) = 4 rows
    allm = (
        bucketed_join(left, right, key="k", num_buckets=2, multiplicity="all")
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(allm) == 4
    assert sorted(map(tuple, allm[["lv", "rv"]].to_numpy())) == [
        ("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
    ]
