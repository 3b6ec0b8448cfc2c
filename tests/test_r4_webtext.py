"""Round-4 webtext ops: Misra-Gries heavy hitters + URL canonicalization."""

import numpy as np
import pandas as pd
import pytest


def test_mg_compress_keeps_true_heavy_hitters():
    """MG invariant: after any sequence of block-compressions and
    merges, every token with true count > N/k is still present."""
    from rdf2smw_ray.pipelines.sketches import _mg_compress

    rng = np.random.default_rng(7)
    k = 8
    # skewed stream: token 0 is 30% of the stream, long uniform tail
    stream = np.where(rng.random(20_000) < 0.3, 0, rng.integers(1, 500, 20_000))
    true = pd.Series(stream).value_counts()
    n = len(stream)
    heavy = set(true[true * k > n].index)
    assert heavy, "fixture must contain at least one heavy hitter"

    # simulate block-wise accumulation + pairwise merges
    summaries = []
    for chunk in np.array_split(stream, 16):
        s: dict = {}
        u, c = np.unique(chunk, return_counts=True)
        for t, w in zip(u, c):
            s[int(t)] = s.get(int(t), 0) + int(w)
        summaries.append(_mg_compress(s, k))
    while len(summaries) > 1:
        a, b = summaries.pop(), summaries.pop()
        out = dict(a)
        for t, c in b.items():
            out[t] = out.get(t, 0) + c
        summaries.append(_mg_compress(out, k))
    cand = set(summaries[0])
    assert heavy <= cand
    assert len(cand) <= k


def test_mg_compress_bounds_size():
    from rdf2smw_ray.pipelines.sketches import _mg_compress

    d = {i: i + 1 for i in range(100)}
    out = _mg_compress(d, 10)
    assert len(out) <= 10
    assert all(v > 0 for v in out.values())
    # survivors are the largest counters
    assert set(out) == set(range(90, 100))


def test_canonicalize_urls_rules():
    from rdf2smw_ray.pipelines.weburl import canonicalize_urls

    raw = pd.Series(
        [
            "https://ex1.org/page/3",
            "https://EX1.ORG/page/3/",
            "https://www.ex1.org/page/3?utm_source=feed",
            "HTTPS://ex1.org/page/3#frag",
            "http://Host.Example.com/A/B?x=1&y=2#z",  # path case preserved
            "https://ex2.org",  # no path at all
            None,
            "example.com/a?x=1",  # scheme-less: passes through stripped
            "//cdn.ex.org/asset.js",  # protocol-relative: not merged to ""
        ]
    )
    out = canonicalize_urls(raw)
    assert list(out[:4]) == ["https://ex1.org/page/3"] * 4
    assert out[4] == "http://host.example.com/A/B"
    assert out[5] == "https://ex2.org"
    assert out[6] == ""
    assert out[7] == "example.com/a"
    assert out[8] == "//cdn.ex.org/asset.js"
    # distinct scheme-less urls must NOT collapse into one dedup group
    assert out[7] != out[8]


def test_heavy_hitters_empty_and_null_corpus(ray_session):
    """Empty / all-NULL corpora return a typed empty frame; NULL text
    contributes zero tokens (matching unnest(string_split(NULL, ' ')))."""
    import pyarrow as pa
    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import heavy_hitters

    empty = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = heavy_hitters(empty, k=4)
    assert len(out) == 0 and list(out.columns) == ["token", "cnt"]

    nulls = rd.from_arrow(pa.table({"text": pa.array([None, "a a b", None], pa.string())}))
    out = heavy_hitters(nulls, k=4)
    # total=3 tokens; a(2)*4>3 and b(1)*4>3 -> both heavy
    assert list(map(tuple, out.itertuples(index=False))) == [("a", 2), ("b", 1)]


def test_heavy_hitters_exact_on_tiny_corpus(ray_session):
    """End-to-end: the sketch-driven 2-pass output equals a brute-force
    exact count even when k is barely above the heavy set size."""
    import collections

    import ray.data as rd

    from rdf2smw_ray.pipelines.sketches import heavy_hitters

    texts = (["a a a a b b c"] * 5) + (["d e f g h i j k"] * 3)
    ds = rd.from_items([{"text": t} for t in texts]).repartition(4)
    out = heavy_hitters(ds, k=4)

    c = collections.Counter()
    for t in texts:
        c.update(t.split(" "))
    n = sum(c.values())
    want = sorted((t, cnt) for t, cnt in c.items() if cnt * 4 > n)
    assert list(map(tuple, out.itertuples(index=False))) == want


def _brute_first_wins(ids, mat, threshold):
    """Reference: global greedy first-wins dedup over kept rows."""
    import numpy as np

    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    n = len(ids)
    keep = np.ones(n, dtype=bool)
    dup_of = np.full(n, -1, dtype=np.int64)
    for j in range(1, n):
        kept_idx = np.flatnonzero(keep[:j])
        if len(kept_idx):
            sims = mat[kept_idx] @ mat[j]
            m = int(np.argmax(sims))
            if sims[m] >= threshold:
                keep[j] = False
                dup_of[j] = ids[kept_idx[m]]
    return ids, keep, dup_of


def test_semantic_dedup_single_cluster_equals_brute_force(ray_session):
    """n_lists=1 puts everything in one cluster, so the clustered path
    must reproduce the brute-force global first-wins rule exactly."""
    import numpy as np
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.ann import _unit, semantic_dedup
    from rdf2smw_ray.pipelines.io_cache import cached_table

    sf = "/root/testdata/sf0.001"
    out = (
        semantic_dedup(cached_table(sf, "embeddings"), threshold=0.95, n_lists=1)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    mat = _unit(np.asarray(t["embedding"].to_pylist(), dtype=np.float64))
    rids, rkeep, rdup = _brute_first_wins(ids.astype(np.int64), mat, 0.95)
    assert (out["vec_id"].to_numpy() == rids).all()
    assert (out["keep"].to_numpy() == rkeep).all()
    assert (out["dup_of"].to_numpy() == rdup).all()


def test_semantic_dedup_clustered_full_recall(ray_session):
    """The clustered path (n_lists=8) removes the SAME rows as the
    global rule on this fixture: true near-dups are nearest
    neighbours, so they co-locate in one k-means cluster."""
    import numpy as np
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.ann import _unit, semantic_dedup
    from rdf2smw_ray.pipelines.io_cache import cached_table

    sf = "/root/testdata/sf0.001"
    out = (
        semantic_dedup(cached_table(sf, "embeddings"), threshold=0.95, n_lists=8)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy().astype(np.int64)
    mat = _unit(np.asarray(t["embedding"].to_pylist(), dtype=np.float64))
    _, rkeep, _ = _brute_first_wins(ids, mat, 0.95)
    removed_global = set(ids[~rkeep])
    removed_clustered = set(out.loc[~out["keep"], "vec_id"])
    assert removed_clustered == removed_global
    # determinism across runs
    out2 = (
        semantic_dedup(cached_table(sf, "embeddings"), threshold=0.95, n_lists=8)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)
