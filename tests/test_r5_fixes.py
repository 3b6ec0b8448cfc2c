"""Round-5 regression tests: VERDICT r4 'Next round' #1 (scale-safe
semantic_dedup) and the five r4 ADVICE items."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# VERDICT #1 / ADVICE #1 — semantic_dedup scale defaults
# ---------------------------------------------------------------------------
def _brute(ids, mat, threshold):
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
    return keep, dup_of


def test_semantic_dedup_auto_n_lists(ray_session):
    """n_lists='auto' derives the cluster count from corpus size:
    ceil(count / target_cluster_size), floored at 1 — so a fixed
    default can never make cluster size ∝ corpus size."""
    from rdf2smw_ray.pipelines.ann import semantic_dedup
    from rdf2smw_ray.pipelines.io_cache import cached_table

    emb = cached_table(SF, "embeddings")  # 500 rows
    # target 100 → ceil(500/100) = 5 clusters; target 10^6 → 1 cluster
    out_small_target = (
        semantic_dedup(emb, threshold=0.95, target_cluster_size=100)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    out_one_cluster = (
        semantic_dedup(emb, threshold=0.95, target_cluster_size=1_000_000)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # the one-cluster auto config IS brute force
    t = pq.read_table(f"{SF}/embeddings.parquet")
    from rdf2smw_ray.pipelines.ann import _unit

    ids = t["vec_id"].to_numpy().astype(np.int64)
    mat = _unit(np.asarray(t["embedding"].to_pylist(), dtype=np.float64))
    keep, dup_of = _brute(ids, mat, 0.95)
    assert (out_one_cluster["keep"].to_numpy() == keep).all()
    assert (out_one_cluster["dup_of"].to_numpy() == dup_of).all()
    # the multi-cluster auto config still removes the same dup SET on
    # this fixture (near-dups co-locate) and covers every row once
    assert len(out_small_target) == 500
    assert set(out_small_target.loc[~out_small_target["keep"], "vec_id"]) == set(
        ids[~keep]
    )


def test_semantic_dedup_chunked_tiled_equals_rowwise(ray_session):
    """The chunked greedy with tiny chunk/tile sizes (forcing many
    chunk boundaries and many kept-set tiles) must equal the
    single-chunk path bit for bit — pins the capped-cluster path."""
    from rdf2smw_ray.pipelines.ann import semantic_dedup
    from rdf2smw_ray.pipelines.io_cache import cached_table

    emb = cached_table(SF, "embeddings")
    base = (
        semantic_dedup(emb, threshold=0.95, n_lists=1)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    tiled = (
        semantic_dedup(emb, threshold=0.95, n_lists=1, chunk_rows=17, kept_tile_rows=23)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert base.equals(tiled)


def test_semantic_dedup_empty_input(ray_session):
    """ADVICE #1: an empty embeddings input must return an empty
    result, not crash in _unit on a 1-D np.asarray([])."""
    import ray

    from rdf2smw_ray.pipelines.ann import semantic_dedup

    empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    out = semantic_dedup(empty, threshold=0.95, n_lists=1).to_pandas()
    assert len(out) == 0


def test_ivf_centroid_sample_hash_gated(ray_session):
    """When the corpus exceeds sample_size, training samples by
    splitmix64(vec_id) — a uniform hash gate, not an insert-order
    prefix — and is deterministic across runs."""
    import ray

    from rdf2smw_ray.pipelines.ann import train_ivf_centroids

    rng = np.random.RandomState(7)
    n, d = 600, 8
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [rng.randn(d).astype(np.float64).tolist() for _ in range(n)],
                pa.list_(pa.float64()),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    c1 = train_ivf_centroids(ds, n_lists=4, sample_size=64)
    c2 = train_ivf_centroids(ds, n_lists=4, sample_size=64)
    assert c1.shape == (4, d)
    assert np.array_equal(c1, c2)
    # a prefix sample (vec_id < 64) and the hash-gated sample must
    # differ on this corpus — proves the gate is not a prefix
    from rdf2smw_ray.pipelines.ann import _splitmix64

    h = _splitmix64(np.arange(n, dtype=np.int64).view(np.uint64))
    chosen = np.lexsort((np.arange(n), h))[:64]
    assert not np.array_equal(np.sort(chosen), np.arange(64))


def test_semantic_dedup_planted_dups_chunk_boundaries(ray_session):
    """The testdata embeddings contain NO pairs ≥ 0.95 cosine (max
    ~0.51), so equality tests on them are vacuous for the dup branch.
    This test PLANTS dense near-dup structure (clusters of noisy
    copies, exact copies, argmax ties) and checks the chunked/tiled
    greedy — with chunk boundaries INSIDE dup groups — against the
    row-wise brute-force rule bit for bit."""
    import ray

    from rdf2smw_ray.pipelines.ann import _unit, semantic_dedup

    rng = np.random.RandomState(11)
    d = 16
    base = rng.randn(40, d)
    rows = []
    for i in range(40):
        rows.append(base[i])
        # noisy copies of every 2nd base vector → cosine ~0.99+
        if i % 2 == 0:
            for _ in range(3):
                rows.append(base[i] + 0.02 * rng.randn(d))
        # exact copies (sim == 1.0, argmax ties between copies)
        if i % 5 == 0:
            rows.append(base[i].copy())
    mat = np.asarray(rows, dtype=np.float64)
    n = len(mat)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = (
        semantic_dedup(ds, threshold=0.95, n_lists=1, chunk_rows=7, kept_tile_rows=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    keep, dup_of = _brute(ids, _unit(mat), 0.95)
    assert (~keep).sum() > 30  # the dup branch genuinely fires
    assert (out["keep"].to_numpy() == keep).all()
    assert (out["dup_of"].to_numpy() == dup_of).all()
    # and the default (single-chunk-sized) config agrees too
    out2 = (
        semantic_dedup(ds, threshold=0.95, n_lists=1)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


# ---------------------------------------------------------------------------
# ADVICE #4 — exact_percentiles_per_key duplicate out_col
# ---------------------------------------------------------------------------
def test_exact_percentiles_duplicate_out_col_raises(ray_session):
    import ray

    from rdf2smw_ray.pipelines.sketches import exact_percentiles_per_key

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1, 1], "v": [1, 2]}))
    with pytest.raises(ValueError, match="duplicate out_col"):
        exact_percentiles_per_key(ds, "k", "v", [(1, 4, "p"), (3, 4, "p")])


# ---------------------------------------------------------------------------
# ADVICE #3 — order_priority_check ships deduplicated keys
# ---------------------------------------------------------------------------
def test_order_priority_check_matches_duckdb(ray_session):
    import duckdb

    from rdf2smw_ray.pipelines.relational import (
        ORDER_PRIORITY_CHECK_SQL,
        order_priority_check,
    )

    got = order_priority_check(SF).sort_values("o_orderpriority").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet';"
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet';"
    )
    want = (
        con.execute(ORDER_PRIORITY_CHECK_SQL)
        .df()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype(want.dtypes.to_dict()), want
    )


# ---------------------------------------------------------------------------
# ADVICE #2 — returned_item_revenue inner-merges customer
# ---------------------------------------------------------------------------
def test_returned_item_revenue_matches_duckdb(ray_session):
    import duckdb

    from rdf2smw_ray.pipelines.relational import (
        RETURNED_ITEM_REVENUE_SQL,
        returned_item_revenue,
    )

    got = returned_item_revenue(SF).reset_index(drop=True)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.execute(RETURNED_ITEM_REVENUE_SQL).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype(want.dtypes.to_dict()), want
    )


# ---------------------------------------------------------------------------
# VERDICT #2 — exact-substring span REMOVAL
# ---------------------------------------------------------------------------
def _brute_dedup_spans(docs: pd.DataFrame, n: int) -> pd.DataFrame:
    """Scalar reference: corpus-wide (doc_id, pos) first-wins; every
    token covered by a non-first n-gram occurrence is removed."""
    occ = {}
    toks = {int(r.doc_id): (r.text or "").split() for r in docs.itertuples()}
    for did in sorted(toks):
        w = toks[did]
        for i in range(len(w) - n + 1):
            g = " ".join(w[i : i + n])
            r = did * (1 << 20) + (i + 1)
            if g not in occ or r < occ[g]:
                occ[g] = r
    rows = []
    for did in sorted(toks):
        w = toks[did]
        rem = np.zeros(len(w), bool)
        for i in range(len(w) - n + 1):
            g = " ".join(w[i : i + n])
            if did * (1 << 20) + (i + 1) > occ[g]:
                rem[i : i + n] = True
        kept = [t for t, m in zip(w, rem) if not m]
        rows.append((did, len(w), len(kept), len(w) - len(kept), " ".join(kept)))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_tokens", "kept_tokens", "removed_tokens", "kept_text"],
    )


def test_dedup_spans_matches_brute_force_testdata(ray_session):
    from rdf2smw_ray.pipelines.io_cache import cached_table
    from rdf2smw_ray.pipelines.spans import dedup_spans

    out = (
        dedup_spans(cached_table(SF, "documents"), n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    ref = _brute_dedup_spans(docs, 5)
    assert ref["removed_tokens"].sum() > 0  # the removal branch fires
    pd.testing.assert_frame_equal(
        out[ref.columns.tolist()].astype(ref.dtypes.to_dict()), ref
    )


def test_dedup_spans_edge_cases(ray_session):
    """Short docs survive whole; empty text yields empty kept_text;
    in-doc repeats are removed even with no cross-doc duplicate;
    overlapping spans union; results hold across many small blocks."""
    import ray

    from rdf2smw_ray.pipelines.spans import dedup_spans

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d e f g",          # source of the shared 5-gram
                "x a b c d e y",           # cross-doc dup: 'a b c d e' at pos 2
                "p q r",                   # shorter than n — survives whole
                "",                         # empty
                "m m m m m m m m m m",      # in-doc repeats: dup grams at
                                            # pos 2..6 cover tokens 2..10
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(5)
    out = (
        dedup_spans(ds, n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _brute_dedup_spans(docs, 5)
    pd.testing.assert_frame_equal(
        out[ref.columns.tolist()].astype(ref.dtypes.to_dict()), ref
    )
    # pin the interesting rows explicitly
    assert out.loc[out.doc_id == 2, "kept_text"].iloc[0] == "x y"
    assert out.loc[out.doc_id == 3, "kept_text"].iloc[0] == "p q r"
    assert out.loc[out.doc_id == 4, "kept_text"].iloc[0] == ""
    assert out.loc[out.doc_id == 5, "kept_text"].iloc[0] == "m"


# ---------------------------------------------------------------------------
# VERDICT #6 — self-certifying approximate queries
# ---------------------------------------------------------------------------
def test_self_certifying_queries_emit_evidence(ray_session):
    """Each formerly run-only approximate query now emits its own
    accuracy evidence as columns (and raises internally on a bound
    violation — so merely completing IS the certification)."""
    from rdf2smw_ray.pipelines.queries import (
        q_approx_distinct_users,
        q_cms_token_counts,
        q_minhash_dedup,
        q_simhash,
        q_value_quantiles,
    )

    adu = q_approx_distinct_users(SF)
    assert {"approx_users", "exact_users", "rel_err_bp"} <= set(adu.columns)
    assert int(adu["rel_err_bp"].iloc[0]) <= 1000

    vq = q_value_quantiles(SF)
    assert {"abs_err", "within_bound"} <= set(vq.columns)
    assert (vq["within_bound"] == 1).all()

    cms = q_cms_token_counts(SF)
    assert {"est", "exact", "overcount"} <= set(cms.columns)
    assert (cms["overcount"] >= 0).all()

    mh = q_minhash_dedup(SF)
    assert "recall_vs_exact_pct" in mh.columns
    assert (mh["recall_vs_exact_pct"] >= 95).all()  # certified at gate scale

    sh = q_simhash(SF)
    assert "in_verified_sample" in sh.columns
    assert sh["in_verified_sample"].sum() > 0


# ---------------------------------------------------------------------------
# Round-5 review-pass fixes
# ---------------------------------------------------------------------------
def test_ivf_recap_warns_and_scaled_sample_respects_n_lists(ray_session):
    """n_lists beyond the sample must WARN (not silently degrade); a
    sample sized to the list count must deliver exactly n_lists."""
    import ray

    from rdf2smw_ray.pipelines.ann import train_ivf_centroids

    rng = np.random.RandomState(7)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(200, dtype=np.int64),
                "embedding": list(rng.randn(200, 8)),
            }
        )
    )
    with pytest.warns(UserWarning, match="exceeds the"):
        cent = train_ivf_centroids(ds, n_lists=32, sample_size=16)
    assert len(cent) == 16  # capped, loudly
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        cent = train_ivf_centroids(ds, n_lists=32, sample_size=128)
    assert len(cent) == 32  # sample covers the list count: no warning


def test_dedup_spans_doc_id_overflow_raises(ray_session):
    import ray

    from rdf2smw_ray.pipelines.spans import dedup_spans

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1 << 50], dtype=np.int64),  # snowflake-style id
                "text": ["a b c d e f g h"],
            }
        )
    )
    with pytest.raises(Exception, match="doc_id outside"):
        dedup_spans(ds, n=5).to_pandas()


def test_minhash_recall_vacuous_on_no_dup_corpus(ray_session, tmp_path):
    """A corpus with zero exact near-duplicates must certify recall=100
    (vacuous), not trip the 95% floor with 0/0 -> 0."""
    from rdf2smw_ray.pipelines.queries import q_minhash_dedup

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(12, dtype=np.int64),
            "text": [
                " ".join(f"w{i}x{j}" for j in range(30)) for i in range(12)
            ],  # pairwise-disjoint shingles
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    out = q_minhash_dedup(str(tmp_path))
    assert len(out) == 0 or (out["dup_of"] >= 0).all()
    assert (out["recall_vs_exact_pct"] == 100).all() or len(out) == 0


def test_simhash_empty_md5_sample_is_vacuous(ray_session, tmp_path):
    """A tiny corpus where the md5 gate selects no docs must not raise."""
    import hashlib

    from rdf2smw_ray.pipelines.queries import q_simhash

    ids = [i for i in range(200) if hashlib.md5(str(i).encode()).hexdigest()[:2] >= "20"][:6]
    docs = pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "text": [f"doc {i} body text here" for i in ids],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    out = q_simhash(str(tmp_path))
    assert len(out) == len(ids)
    assert not out["in_verified_sample"].any()


def test_ann_lsh_emits_scan_fraction(ray_session):
    from rdf2smw_ray.pipelines.queries import q_ann_lsh

    out = q_ann_lsh("/root/testdata/sf0.001")
    assert "scan_frac_pct" in out.columns
    assert 0 < int(out["scan_frac_pct"].iloc[0]) < 100
    assert int(out["recall_vs_exact_pct"].iloc[0]) >= max(
        15, int(out["scan_frac_pct"].iloc[0]) // 2
    )


def test_self_certifying_media_and_semantic_dedup(ray_session):
    """The last two rows-only queries also self-certify now:
    media_features re-derives a hash-gated sample of features straight
    from the seed bytes (no codec) and must match exactly;
    semantic_dedup precision-checks every reported duplicate with a
    driver matmul and emits measured recall vs the global exact set."""
    from rdf2smw_ray.pipelines.queries import q_media_features, q_semantic_dedup

    mf = q_media_features(SF)
    assert "in_verified_sample" in mf.columns
    assert mf["in_verified_sample"].sum() > 0  # real, non-vacuous sample

    sd = q_semantic_dedup(SF)
    assert "recall_vs_exact_pct" in sd.columns
    assert int(sd["recall_vs_exact_pct"].iloc[0]) == 100  # vacuous on fixture


def test_media_features_certification_catches_defects(ray_session, monkeypatch):
    """Negative control: corrupt the feature kernel and the in-query
    certification must raise (proves the check is not vacuous)."""
    import rdf2smw_ray.pipelines.multimodal as mm
    from rdf2smw_ray.pipelines import queries as Q

    real = mm.media_features

    def broken(media_ds, **kw):
        ds = real(media_ds, **kw)

        def shift(df):
            df = df.copy()
            df["mean_val"] = df["mean_val"] + 1.0
            return df

        return ds.map_batches(shift, batch_format="pandas")

    monkeypatch.setattr(mm, "media_features", broken)
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="media_features sample mismatch"):
        Q.q_media_features(SF)


def test_spans_sql_parity_on_empty_and_padded_text(ray_session, tmp_path):
    """The SQL oracles must tokenize '' and edge-whitespace text
    exactly like Python str.split() (DuckDB string_split_regex keeps
    empty edge tokens; the oracles filter them). The shipped fixtures
    contain no such text, so this pins the edge case directly."""
    import duckdb
    import pyarrow.parquet as pq
    import ray

    from rdf2smw_ray.pipelines.spans import (
        DEDUP_SPANS_SQL,
        DUP_NGRAM_STATS_SQL,
        dedup_spans,
        dup_ngram_stats,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g",
                    "  a b c d e f g  ",  # padded — same tokens as doc 1
                    "",
                    "   ",
                    "x  y",
                    "q r s t u a b c d e",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )

    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    for op, sql, cols in [
        (dedup_spans, DEDUP_SPANS_SQL, ["n_tokens", "kept_tokens", "removed_tokens", "kept_text"]),
        (dup_ngram_stats, DUP_NGRAM_STATS_SQL, ["n_grams", "dup_grams", "dup_pct"]),
    ]:
        got = op(ds, n=5).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(sql).fetch_df().sort_values("doc_id").reset_index(drop=True)
        for c in cols:
            assert list(got[c]) == list(want[c]), (op.__name__, c, got[c], want[c])
    # empty/whitespace docs must read as 0 tokens, and the padded doc
    # must dedup identically to its unpadded twin
    dd = dedup_spans(ds, n=5).to_pandas().set_index("doc_id")
    assert dd.loc[3, "n_tokens"] == 0 and dd.loc[4, "n_tokens"] == 0
    assert dd.loc[2, "kept_text"] == ""  # full 7-gram span of doc 1 repeated


def test_media_features_certification_catches_dropped_rows(ray_session, monkeypatch):
    """The sample is drawn from the INPUT id set, so an operator that
    silently drops rows must fail certification (second negative
    control, complementing the value-corruption one)."""
    import rdf2smw_ray.pipelines.multimodal as mm
    from rdf2smw_ray.pipelines import queries as Q

    real = mm.media_features

    def dropping(media_ds, **kw):
        ds = real(media_ds, **kw)
        return ds.filter(lambda row: int(row["media_id"]) % 7 != 0)

    monkeypatch.setattr(mm, "media_features", dropping)
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="media_features sample mismatch"):
        Q.q_media_features(SF)


def test_cosine_cert_empty_corpus(ray_session, tmp_path):
    """An empty embeddings table must certify vacuously (recall 100,
    no AxisError from the 1-D empty matrix) and reject any reported
    pairs."""
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.queries import _cosine_cert

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    assert int(_cosine_cert(str(tmp_path), [], 0.9, name="t")) == 100
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="pairs reported on an empty corpus"):
        _cosine_cert(str(tmp_path), [(2, 1)], 0.9, name="t")


def test_rolling_time_window_peers_and_boundary(ray_session, tmp_path):
    """RANGE-frame semantics pinned on adversarial structure: equal-ts
    peer rows (frame includes ALL peers regardless of position), an
    event exactly 1h earlier (inclusive preceding bound), one just
    outside, and negative values — must match DuckDB's
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW exactly."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.windows import (
        ROLLING_TIME_WINDOW_SQL,
        rolling_time_window,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600, "s")
    s = np.timedelta64(1, "s")
    events = pa.table(
        {
            "event_id": pa.array(list(range(8)), pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 2], pa.int64()),
            "ts": pa.array(
                [
                    base,            # anchor
                    base + h,        # exactly 1h later: frame includes anchor
                    base + h,        # PEER of event 1 (equal ts)
                    base + h + s,    # anchor now outside (1h+1s)
                    base + 3 * h,    # isolated
                    base,            # user 2
                    base + h - s,    # inside
                    base + 2 * h,    # outside both
                ],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.11, 2.22, 4.44, 8.88, 0.5, -3.33, 7.0, 1.0], pa.float64()),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    got = rolling_time_window(str(tmp_path), window_hours=1)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    want = con.execute(ROLLING_TIME_WINDOW_SQL).fetch_df()
    assert got["win_cents"].tolist() == want["win_cents"].tolist()
    assert got["win_n"].tolist() == want["win_n"].tolist()
    # the two equal-ts peers must see identical frames (peer inclusion)
    g = got.set_index("event_id")
    assert g.loc[1, "win_cents"] == g.loc[2, "win_cents"]
    assert g.loc[1, "win_n"] == g.loc[2, "win_n"] == 3  # anchor + both peers


def test_top_orders_with_ties_includes_boundary_ties(ray_session, tmp_path):
    """WITH TIES semantics pinned on data where the k-th value is tied:
    the result must contain MORE than k rows (every boundary tie) and
    match DuckDB RANK() <= k exactly."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.relational import (
        TOP_ORDERS_WITH_TIES_SQL,
        top_orders_with_ties,
    )

    # 3 distinct high values, then FOUR ties straddling the k=10 cut
    prices = [500.0, 400.0, 300.0] + [200.0] * 4 + [100.0] * 8
    orders = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, len(prices) + 1)), pa.int64()),
            "o_totalprice": pa.array(prices, pa.float64()),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = top_orders_with_ties(str(tmp_path), k=10)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'")
    want = con.execute(TOP_ORDERS_WITH_TIES_SQL).fetch_df()
    # rank of the 100.0 group = 1 + 3 + 4 = 8 <= 10, so ALL 15 rows stay
    assert len(got) == len(want) == 15
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["price_cents"].tolist() == want["price_cents"].tolist()
    assert got["rnk"].tolist() == want["rnk"].tolist()
    assert got["rnk"].max() == 8


def test_table_checksum_partitioning_invariant(ray_session, tmp_path):
    """The checksum must be identical under any row order and block
    split (modular addition is commutative/associative) and must
    CHANGE when any row's text changes."""
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.report import table_checksum

    rng = np.random.RandomState(7)
    n = 300
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([f"text {i} {'x' * (i % 17)}" for i in range(n)], pa.string()),
        }
    )
    d1 = tmp_path / "a"
    d1.mkdir()
    pq.write_table(docs, d1 / "documents.parquet")
    base = table_checksum(str(d1))

    # shuffled row order must checksum identically
    perm = rng.permutation(n)
    shuf = docs.take(perm)
    d3 = tmp_path / "c"
    d3.mkdir()
    pq.write_table(shuf, d3 / "documents.parquet", row_group_size=37)
    # the odd row_group_size forces different block boundaries too
    assert table_checksum(str(d3)).equals(base)

    # a single changed row flips exactly that bucket's checksum
    texts = docs["text"].to_pylist()
    texts[42] = "tampered"
    d4 = tmp_path / "d"
    d4.mkdir()
    pq.write_table(
        pa.table({"doc_id": docs["doc_id"], "text": pa.array(texts, pa.string())}),
        d4 / "documents.parquet",
    )
    tampered = table_checksum(str(d4))
    diff = base.merge(tampered, on="bucket", suffixes=("_a", "_b"))
    changed = diff[diff["checksum_a"] != diff["checksum_b"]]["bucket"].tolist()
    assert changed == [42 % 16]


def test_weighted_median_tie_boundary(ray_session, tmp_path):
    """Lower-weighted-median boundary pinned: when the cumulative
    weight hits EXACTLY half the total (cum*2 == tot), the smaller
    value wins in both engines."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.relational import (
        WEIGHTED_MEDIAN_SQL,
        weighted_median_prices,
    )

    li = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "B", "B", "B"], pa.string()),
            "l_extendedprice": pa.array([1.00, 2.00, 1.00, 2.00, 3.00], pa.float64()),
            "l_quantity": pa.array([5.0, 5.0, 1.0, 1.0, 6.0], pa.float64()),
        }
    )
    pq.write_table(li, tmp_path / "lineitem.parquet")
    got = weighted_median_prices(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet'")
    want = con.execute(WEIGHTED_MEDIAN_SQL).fetch_df()
    assert got["wmedian_cents"].tolist() == want["wmedian_cents"].tolist()
    # A: 5 vs 5 — exact half at v=100, the SMALLER value wins
    assert got.set_index("l_returnflag").loc["A", "wmedian_cents"] == 100
    # B: weight mass 1,1,6 — median lands on 300
    assert got.set_index("l_returnflag").loc["B", "wmedian_cents"] == 300


def test_rolling_time_window_property_random(ray_session, tmp_path):
    """Property check: the composite-key vectorized kernel equals an
    O(n²) per-row brute force on randomized small logs — duplicate
    timestamps, tight clusters, singleton users, exact-boundary gaps."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.windows import rolling_time_window

    base = np.int64(1_700_000_000_000_000)  # us epoch
    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),          # user
                st.integers(min_value=0, max_value=4 * 3600),   # ts offset (s)
                st.integers(min_value=-500, max_value=500),     # cents
            ),
            min_size=1,
            max_size=25,
        )
    )
    def run(rows):
        counter[0] += 1
        d = tmp_path / f"case{counter[0]}"
        d.mkdir()
        n = len(rows)
        tbl = pa.table(
            {
                "event_id": pa.array(list(range(n)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    (base + np.array([r[1] for r in rows], dtype=np.int64) * 1_000_000)
                    .astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "value": pa.array([r[2] / 100.0 for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, d / "events.parquet")
        got = rolling_time_window(str(d), window_hours=1).set_index("event_id")
        # brute force: all rows of same user with ts in [ts_i - 1h, ts_i]
        ts = np.array([r[1] for r in rows], dtype=np.int64) * 1_000_000
        cents = np.floor(np.array([r[2] / 100.0 for r in rows]) * 100).astype(np.int64)
        for i in range(n):
            m = np.array(
                [
                    rows[j][0] == rows[i][0]
                    and ts[i] - 3_600_000_000 <= ts[j] <= ts[i]
                    for j in range(n)
                ]
            )
            assert got.loc[i, "win_cents"] == int(cents[m].sum()), (i, rows)
            assert got.loc[i, "win_n"] == int(m.sum()), (i, rows)

    run()


def test_rolling_time_window_overflow_fallback(ray_session, tmp_path):
    """The composite-key product can exceed int64 (many users × a wide
    ts span); the per-user-segment fallback must produce the same
    RANGE-frame result. 1100 users spread over ~150 years makes
    (n_users)·span > 2^62 — asserted as the branch precondition — and
    the output is checked against the DuckDB oracle."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.windows import (
        ROLLING_TIME_WINDOW_SQL,
        rolling_time_window,
    )

    n_users = 1100
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    day_us = 86_400_000_000
    # two events per user: 30 min apart (inside the 1h window), users
    # spaced 50 days apart → ts range ≈ 150 years
    ts, users, eids = [], [], []
    for u in range(n_users):
        t0 = base + u * 50 * day_us
        ts += [t0, t0 + 1_800_000_000]
        users += [u, u]
        eids += [2 * u, 2 * u + 1]
    span = (max(ts) - min(ts)) + 3_600_000_000 + 1
    assert n_users * span >= 2**62  # precondition: fallback branch runs
    tbl = pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]"), pa.timestamp("us")),
            "value": pa.array([1.0] * len(ts), pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = rolling_time_window(str(tmp_path), window_hours=1)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    want = con.execute(ROLLING_TIME_WINDOW_SQL).fetch_df()
    assert got["win_cents"].tolist() == want["win_cents"].tolist()
    assert got["win_n"].tolist() == want["win_n"].tolist()
    # second event of each user sees both events (30 min < 1h window)
    assert got.set_index("event_id").loc[1, "win_n"] == 2


def test_new_operators_empty_inputs(ray_session, tmp_path):
    """Every late-round operator must return its typed empty frame on
    an empty input table, matching the SQL oracle, instead of raising
    on the all-empty-upstream column-drop gotcha."""
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.dq import k_anonymity_audit
    from rdf2smw_ray.pipelines.relational import top_orders_with_ties
    from rdf2smw_ray.pipelines.report import table_checksum

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "c_mktsegment": pa.array([], pa.string()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    assert len(top_orders_with_ties(str(tmp_path))) == 0
    assert len(k_anonymity_audit(str(tmp_path))) == 0
    assert len(table_checksum(str(tmp_path))) == 0
