"""Randomized brute-force parity for the round-3 kernels: generate
small seeded corpora, compare the distributed operators against
pure-Python scalar references."""

import math
import random
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rdf2smw_ray.pipelines.decontam import decontaminate
from rdf2smw_ray.pipelines.linededup import line_dedup_counts
from rdf2smw_ray.pipelines.textstats import repetition_stats

VOCAB = [f"w{i}" for i in range(12)]


def _corpus(seed, n_docs=40, max_tokens=30):
    rng = random.Random(seed)
    return [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, max_tokens)))
        for _ in range(n_docs)
    ]


def _ds(ids, texts, extra=None):
    cols = {"doc_id": pa.array(ids, pa.int64()), "text": texts}
    if extra:
        cols.update(extra)
    # several blocks so combiners + shuffles actually run
    return rd.from_arrow(pa.table(cols)).repartition(5)


def test_repetition_stats_random_parity(ray_session):
    for seed in (1, 2, 3):
        texts = _corpus(seed)
        ids = list(range(len(texts)))
        out = (
            repetition_stats(_ds(ids, texts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, t in enumerate(texts):
            toks = t.split()
            row = out.loc[i]
            if not toks:
                assert row["top_token_frac"] == 0.0
                continue
            c = Counter(toks)
            assert row["top_token_frac"] == round(max(c.values()) / len(toks), 6)
            assert row["unique_token_ratio"] == round(len(c) / len(toks), 6)
            grams = Counter(zip(toks, toks[1:]))
            tot = sum(grams.values())
            dup = sum(v for v in grams.values() if v > 1)
            exp = round(dup / tot, 6) if tot else 0.0
            assert row["dup_2gram_frac"] == exp


def test_line_dedup_random_parity(ray_session):
    rng = random.Random(7)
    # multi-line docs from a small line alphabet → heavy cross-doc dups
    lines_pool = [f"L{i}" for i in range(6)]
    texts = [
        "\n".join(rng.choice(lines_pool) for _ in range(rng.randint(0, 8)))
        for _ in range(30)
    ]
    ids = list(range(len(texts)))
    out = (
        line_dedup_counts(_ds(ids, texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force first-wins
    seen = set()
    kept = Counter()
    totals = Counter()
    for d in ids:
        for ln in texts[d].split("\n"):
            if ln == "":
                continue
            totals[d] += 1
            if ln not in seen:
                seen.add(ln)
                kept[d] += 1
    assert out["doc_id"].tolist() == ids
    assert out["n_lines"].tolist() == [totals[d] for d in ids]
    assert out["n_kept"].tolist() == [kept[d] for d in ids]


def test_decontaminate_random_parity(ray_session):
    for seed in (11, 12):
        texts = _corpus(seed, n_docs=30, max_tokens=20)
        ids = list(range(len(texts)))
        sources = ["bench" if i % 5 == 0 else "train" for i in ids]
        n = 3
        out = (
            decontaminate(
                _ds(ids, texts, {"source": sources}), bench_source="bench", n=n
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        def grams(t):
            w = t.split()
            return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]

        bench = set()
        for i in ids:
            if sources[i] == "bench":
                bench.update(grams(texts[i]))
        exp = {
            i: sum(g in bench for g in grams(texts[i]))
            for i in ids
            if sources[i] != "bench"
        }
        assert out["doc_id"].tolist() == sorted(exp)
        assert out["n_hits"].tolist() == [exp[i] for i in sorted(exp)]


def test_global_interval_count_random_parity(ray_session):
    """Big-big time-interval join (temporal bucketing + probe
    replication) vs a single-array brute force, including exact
    boundary hits at t and t-w and a probe window spanning two
    buckets."""
    import ray.data as rd

    from rdf2smw_ray.pipelines.windows import _global_interval_count

    W = np.int64(7 * 60 * 1_000_000)
    base = pd.Timestamp("2025-06-01").value // 1000
    for seed in (5, 23):
        rng = np.random.RandomState(seed)
        n = 2500
        ts_us = base + rng.randint(0, 2_000_000_000, n).astype(np.int64)
        kinds = rng.choice(["click", "purchase", "view"], n, p=[0.5, 0.3, 0.2])
        # force boundary cases: a click exactly AT a purchase ts
        # (inclusive) and exactly at ts - W (exclusive)
        kinds[0] = "purchase"
        kinds[1] = "click"
        ts_us[1] = ts_us[0]
        kinds[2] = "click"
        ts_us[2] = ts_us[0] - int(W)
        ev = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": pd.to_datetime(ts_us * 1000),
                "event_type": kinds,
            }
        )
        out = (
            _global_interval_count(rd.from_pandas(ev), window_us=W, num_buckets=13)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        t = ev["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        cts = np.sort(t[kinds == "click"])
        isp = kinds == "purchase"
        brute = np.searchsorted(cts, t[isp], side="right") - np.searchsorted(
            cts, t[isp] - W, side="right"
        )
        assert out["event_id"].tolist() == sorted(ev["event_id"].to_numpy()[isp])
        order = np.argsort(ev["event_id"].to_numpy()[isp], kind="stable")
        assert (out["n_clicks"].to_numpy() == brute[order]).all()


def test_cross_corpus_near_dup_cross_side_only(ray_session):
    """Incremental dedup must emit ONLY base×new pairs: same-side
    near-duplicates (base×base, new×new) are by-design invisible, and
    every emitted pair meets the exact Jaccard threshold."""
    from rdf2smw_ray.pipelines.dedup import cross_corpus_near_dup

    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    far = "one two three four five six seven eight nine ten"
    docs = pd.DataFrame(
        {
            # 0,2 base near-dups of each other AND of new docs 1,3; 4/5 unrelated
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [text_a, text_a, text_b, text_b, far, far + " eleven"],
        }
    )
    out = (
        cross_corpus_near_dup(
            rd.from_pandas(docs),
            is_new=lambda ids: (np.asarray(ids, dtype=np.int64) % 2) == 1,
            threshold=0.8,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["base_id", "new_id"])
        .reset_index(drop=True)
    )
    assert (out["base_id"] % 2 == 0).all() and (out["new_id"] % 2 == 1).all()
    # exact expectation: identical texts have J=1.0; (4,5) shares 6 of 7
    # shingles (0.857 ≥ 0.8); cross pairs of text_a vs text_b like (0,3)
    # share 5 of 7 (0.714 < 0.8) and must be absent
    got = set(zip(out["base_id"], out["new_id"]))
    assert got == {(0, 1), (2, 3), (4, 5)}


def test_pareto_skyline_random_parity(ray_session, tmp_path, monkeypatch):
    """Distributed 2-D skyline (price-range buckets + cross-bucket
    prefix-min carry) vs an O(n²) brute force, with heavy price ties
    and an exact duplicate pair (both must survive)."""
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.relational import pareto_orders

    monkeypatch.setenv("GRAFT_NO_TABLE_CACHE", "1")
    rng = np.random.RandomState(3)
    n = 4000
    price = rng.randint(0, 400, n).astype(float)
    date = pd.to_datetime(
        1_700_000_000_000_000
        + rng.randint(0, 10_000, n).astype(np.int64) * 86_400_000_000
    )
    dv = date.values.copy()
    price[10] = price[11]
    dv[11] = dv[10]  # exact duplicate on both dimensions
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_totalprice": price,
            "o_orderdate": pd.to_datetime(dv),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    got = pareto_orders(str(tmp_path))
    p = df["o_totalprice"].to_numpy()
    t = df["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
    keep = [
        i
        for i in range(n)
        if not ((p >= p[i]) & (t <= t[i]) & ((p > p[i]) | (t < t[i]))).any()
    ]
    exp = df.iloc[keep].copy()
    exp["o_orderdate"] = exp["o_orderdate"].dt.strftime("%Y-%m-%d")
    exp = exp.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_prefix_filter_exact_recall_random(ray_session):
    """Prefix filtering guarantees recall 1.0 for ANY corpus (unlike
    LSH banding): verified pairs must equal the exact all-pairs shingle
    Jaccard on random corpora with heavy near-dup structure."""
    from rdf2smw_ray.pipelines.dedup import prefix_filter_pairs, shingle_hashes

    for seed in (2, 9):
        rng = random.Random(seed)
        base = [
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(6, 18)))
            for _ in range(18)
        ]
        # mutated copies at varying distances → pairs straddling t=0.7
        texts = list(base)
        for b in base[:10]:
            w = b.split()
            i = rng.randrange(len(w))
            w[i] = rng.choice(VOCAB)
            texts.append(" ".join(w))
        ids = list(range(len(texts)))
        t = 0.7
        out = (
            prefix_filter_pairs(_ds(ids, texts), threshold=t, k=3, concurrency=2)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        sets = {
            i: set(shingle_hashes(texts[i], 3).tolist())
            for i in ids
            if len(texts[i].split()) >= 3
        }
        exp = sorted(
            (a, b)
            for a in sets
            for b in sets
            if a < b
            and len(sets[a] & sets[b]) / max(1, len(sets[a] | sets[b])) >= t
        )
        assert list(zip(out["doc_a"], out["doc_b"])) == exp


def test_dup_ngram_stats_random_parity(ray_session):
    from rdf2smw_ray.pipelines.spans import dup_ngram_stats

    n = 3
    for seed in (11, 12):
        texts = _corpus(seed, n_docs=30, max_tokens=20)
        ids = list(range(len(texts)))
        out = (
            dup_ngram_stats(_ds(ids, texts), n=n, num_buckets=7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # scalar reference: gram -> set of docs containing it
        grams_per_doc = [
            [" ".join(t.split()[i : i + n]) for i in range(len(t.split()) - n + 1)]
            for t in texts
        ]
        docs_per_gram = Counter()
        for gs in grams_per_doc:
            for g in set(gs):
                docs_per_gram[g] += 1
        assert len(out) == len(texts)
        for i, gs in enumerate(grams_per_doc):
            row = out.loc[i]
            dup = sum(1 for g in gs if docs_per_gram[g] >= 2)
            assert row["n_grams"] == len(gs)
            assert row["dup_grams"] == dup
            assert row["dup_pct"] == dup * 100 // max(len(gs), 1)
