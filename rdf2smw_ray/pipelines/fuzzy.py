"""Fuzzy string self-join: all pairs of distinct values within
Levenshtein edit distance k — entity-resolution blocking + a
batch-vectorized edit-distance kernel.

Blocking is LOSSLESS for this predicate: ``lev(a, b) <= k`` implies
``|len(a) - len(b)| <= k``, so candidate generation groups values by
length and only compares a length-L value against values of length
L..L+k. Each pair is generated exactly once, in the bucket of its
SHORTER element (ties broken lexicographically). Hot length classes
are salted: the x-side (pair owner) splits into ``salts`` hash
sub-buckets and the y-side replicates across them — the standard
block-nested join decomposition, so one popular length never becomes
a single straggler task.

The kernel evaluates the classic DP for ALL candidate pairs at once
(numpy, no per-pair Python): row i's insertion chain
``dp[j] = min_{j'<=j}(cand[j'] + j - j')`` is a slope-1 prefix
minimum — subtract j, ``np.minimum.accumulate``, add j back — so one
DP row costs one vector pass over a (pairs × maxlen) matrix and the
whole kernel is O(maxlen) numpy passes. Pair slabs are capped so the
matrix stays cache-sized regardless of bucket fan-out.

The scalar reference lives in the tests (same contract as the
SimHash/winnowing kernels: vectorization is pinned by equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SLAB = 1 << 15  # pairs per DP slab


def _encode(strs: pd.Series, width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, NUL-padded — one vectorized
    pad + one frombuffer, no per-string Python."""
    padded = strs.str.pad(width, side="right", fillchar="\0")
    buf = "".join(padded.tolist()).encode("utf-32-le")
    return np.frombuffer(buf, dtype=np.uint32).reshape(len(strs), width)


def lev_batch(a: pd.Series, b: pd.Series, max_dist: int | None = None) -> np.ndarray:
    """Levenshtein distance for each aligned (a[i], b[i]) pair,
    vectorized across pairs. With ``max_dist`` set, pairs whose
    distance provably exceeds it skip the DP and report
    ``max_dist + 1`` (the join only keeps d ≤ max_dist); distances
    within the bound are always exact."""
    la = a.str.len().to_numpy().astype(np.int64)
    lb = b.str.len().to_numpy().astype(np.int64)
    out = np.empty(len(a), dtype=np.int64)
    for s in range(0, len(a), _SLAB):
        out[s : s + _SLAB] = _lev_slab(
            a.iloc[s : s + _SLAB], b.iloc[s : s + _SLAB],
            la[s : s + _SLAB], lb[s : s + _SLAB], max_dist,
        )
    return out


def _trim_affixes(ac, bc, la, lb):
    """Strip the common prefix and (non-overlapping) common suffix of
    each aligned pair — the exact-preserving reduction every diff
    kernel applies first. Returns gathered core code matrices + core
    lengths. All vectorized; on near-duplicate-heavy corpora (shared
    long prefixes, e.g. `Customer#00012…`) this shrinks the DP width
    by an order of magnitude."""
    m = len(la)
    minlen = np.minimum(la, lb)
    w = int(minlen.max()) if m else 0
    j = np.arange(w, dtype=np.int64)
    valid = j < minlen[:, None]
    pref_eq = np.logical_and.accumulate((ac[:, :w] == bc[:, :w]) & valid, axis=1)
    p = pref_eq.sum(axis=1)
    # suffix: compare backwards, stopping before the consumed prefix
    rows = np.arange(m)[:, None]
    ia = np.maximum(la[:, None] - 1 - j, 0)
    ib = np.maximum(lb[:, None] - 1 - j, 0)
    lim = (minlen - p)[:, None]
    suf_eq = np.logical_and.accumulate(
        (np.take_along_axis(ac, ia, 1)[:, :w] == np.take_along_axis(bc, ib, 1)[:, :w])
        & (j < lim),
        axis=1,
    )
    s = suf_eq.sum(axis=1)
    ca, cb = la - p - s, lb - p - s
    wa2, wb2 = int(ca.max()) if m else 0, int(cb.max()) if m else 0
    ja = np.minimum(p[:, None] + np.arange(max(wa2, 1)), ac.shape[1] - 1)
    jb = np.minimum(p[:, None] + np.arange(max(wb2, 1)), bc.shape[1] - 1)
    return (
        np.take_along_axis(ac, ja, 1),
        np.take_along_axis(bc, jb, 1),
        ca,
        cb,
    )


def _lev_slab(a, b, la, lb, max_dist=None) -> np.ndarray:
    if len(a) == 0:
        return np.empty(0, dtype=np.int64)
    wa0, wb0 = max(int(la.max()), 1), max(int(lb.max()), 1)
    return _lev_codes(_encode(a, wa0), _encode(b, wb0), la, lb, max_dist)


def _lev_codes(ac, bc, la, lb, max_dist=None) -> np.ndarray:
    """DP core over pre-encoded aligned code-matrix rows."""
    m = len(la)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    ac, bc, la, lb = _trim_affixes(ac, bc, la, lb)
    res = np.empty(m, dtype=np.int64)
    # zero-core pairs are pure insert/delete runs — no DP needed
    direct = (la == 0) | (lb == 0)
    res[direct] = np.maximum(la, lb)[direct]
    need = ~direct
    if max_dist is not None:
        # |len diff| is a lower bound: those pairs can only lose
        skip = need & (np.abs(la - lb) > max_dist)
        res[skip] = max_dist + 1
        need &= ~skip
    if not need.any():
        return res
    idx = np.flatnonzero(need)
    ac, bc, la2, lb2 = ac[idx], bc[idx], la[idx], lb[idx]
    wa, wb = int(la2.max()), int(lb2.max())
    sub = np.empty(len(idx), dtype=np.int64)
    j_idx = np.arange(wb + 1, dtype=np.int32)
    dp = np.broadcast_to(j_idx, (len(idx), wb + 1)).copy()
    for i in range(1, wa + 1):
        cost = (ac[:, i - 1 : i] != bc[:, :wb]).astype(np.int32)  # (m', wb)
        cand = np.empty_like(dp)
        cand[:, 0] = i
        cand[:, 1:] = np.minimum(dp[:, :-1] + cost, dp[:, 1:] + 1)
        # insertion chain: dp[j] = min_{j'<=j} cand[j'] + (j - j')
        dp = np.minimum.accumulate(cand - j_idx, axis=1) + j_idx
        done = la2 == i
        if done.any():
            sub[done] = dp[done, lb2[done]]
    res[idx] = sub
    return res


def distinct_values(values, *, column: str):
    """Dataset of distinct non-null ``column`` values as column ``v``
    (per-batch dedup combiner + one groupby)."""

    def distinct_partial(batch: pa.Table) -> pa.Table:
        u = pd.unique(pd.Series(batch[column].to_pylist(), dtype=object).dropna())
        return pa.table({"v": pa.array(u, pa.string())})

    return (
        values.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("v")
        .count()
        .select_columns(["v"])
    )


def fuzzy_pairs(
    values,
    *,
    column: str,
    max_dist: int = 2,
    salts: int | None = None,
    distinct=None,
):
    """Dataset of (name_a, name_b, dist): distinct values of
    ``column`` within edit distance ``max_dist``, name_a < name_b.

    Hot length classes are decomposed TWO-SIDED: x splits into S hash
    groups and y into S hash groups, pairing in S² (length, sx, sy)
    buckets — S² parallel tasks for the same O(S) per-row replication
    a one-sided split pays (the grid form of block-nested join
    decomposition). ``salts=None`` sizes S from the distinct count so
    a single dominant length class still fans out to ~n²/S² sized
    tasks."""
    if distinct is None:
        distinct = distinct_values(values, column=column)
    if salts is None:
        distinct = distinct.materialize()
        salts = int(np.clip(distinct.count() // 2000, 1, 64))

    def emit(batch: pa.Table) -> pa.Table:
        v = pd.Series(batch["v"].to_pylist(), dtype=object)
        ln = v.str.len().to_numpy().astype(np.int64)
        salt = (
            pd.util.hash_pandas_object(v, index=False).to_numpy() % salts
        ).astype(np.int64)
        rows_v, rows_b, rows_x = [], [], []
        # x (owner) rows: bucket (len, own-salt, every y-salt)
        for sy in range(salts):
            rows_v.append(v.to_numpy())
            rows_b.append((ln * salts + salt) * salts + sy)
            rows_x.append(np.ones(len(v), dtype=bool))
        # y rows: bucket (len-d, every x-salt, own-salt)
        for d in range(0, max_dist + 1):
            tgt = ln - d
            keep = tgt >= 0
            for sx in range(salts):
                rows_v.append(v.to_numpy()[keep])
                rows_b.append((tgt[keep] * salts + sx) * salts + salt[keep])
                rows_x.append(np.zeros(int(keep.sum()), dtype=bool))
        return pa.table(
            {
                "v": pa.array(np.concatenate(rows_v), pa.string()),
                "__bucket": pa.array(
                    np.concatenate(rows_b).astype(np.int64), pa.int64()
                ),
                "is_x": pa.array(np.concatenate(rows_x), pa.bool_()),
            }
        )

    def pairs(df: pd.DataFrame) -> pa.Table:
        blen = int(df["__bucket"].iat[0]) // (salts * salts)
        xs = df.loc[df["is_x"], "v"].drop_duplicates()
        ys = df.loc[~df["is_x"], "v"].drop_duplicates()
        xs = xs[xs.str.len() == blen]
        empty = pa.table(
            {
                "name_a": pa.array([], pa.string()),
                "name_b": pa.array([], pa.string()),
                "dist": pa.array([], pa.int64()),
            }
        )
        nx, ny = len(xs), len(ys)
        if not nx or not ny:
            return empty
        # encode each side ONCE; the cartesian candidate space is pure
        # integer index math + row gathers — pair strings materialize
        # only for the hits (the object-array cross product dominated
        # this stage's cost before)
        xs_arr, ys_arr = xs.to_numpy(), ys.to_numpy()
        ly = ys.str.len().to_numpy().astype(np.int64)
        w = max(blen + max_dist, 1)
        xc, yc = _encode(xs, w), _encode(pd.Series(ys_arr), w)
        out_a, out_b, out_d = [], [], []
        for s in range(0, nx * ny, _SLAB):
            pid = np.arange(s, min(s + _SLAB, nx * ny), dtype=np.int64)
            ia, ib = pid // ny, pid % ny
            # same-length pairs: owner is the lexicographically smaller
            # side — vectorized lexicographic compare over code rows
            same = ly[ib] == blen
            acr, bcr = xc[ia], yc[ib]
            diff = acr != bcr
            any_diff = diff.any(axis=1)
            fd = diff.argmax(axis=1)
            r = np.arange(len(pid))
            a_lt_b = np.where(any_diff, acr[r, fd] < bcr[r, fd], False)
            keep = ~same | a_lt_b
            if not keep.any():
                continue
            ia, ib = ia[keep], ib[keep]
            d = _lev_codes(
                acr[keep], bcr[keep],
                np.full(len(ia), blen, dtype=np.int64), ly[ib], max_dist,
            )
            hit = d <= max_dist
            if hit.any():
                out_a.append(xs_arr[ia[hit]])
                out_b.append(ys_arr[ib[hit]])
                out_d.append(d[hit])
        if not out_a:
            return empty
        av = np.concatenate(out_a)
        bv = np.concatenate(out_b)
        lo = np.where(av < bv, av, bv)  # output order is lexicographic,
        hi = np.where(av < bv, bv, av)  # not shorter-side-first
        return pa.table(
            {
                "name_a": pa.array(lo, pa.string()),
                "name_b": pa.array(hi, pa.string()),
                "dist": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    return (
        distinct.map_batches(emit, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def _pairs_frame(out: pd.DataFrame) -> pd.DataFrame:
    """Schema-stable empty guard: an all-empty Dataset loses its
    column names through to_pandas."""
    if out.empty:
        out = pd.DataFrame(
            {
                "name_a": pd.Series(dtype=object),
                "name_b": pd.Series(dtype=object),
                "dist": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


def fuzzy_part_pairs(sf_dir: str) -> pd.DataFrame:
    """Distinct part-name pairs within edit distance 2 — the
    registered query (entity-resolution blocking over a dimension
    column; several length classes exercise the blocking)."""
    from rdf2smw_ray.pipelines.relational import _read

    out = fuzzy_pairs(
        _read(sf_dir, "part", columns=["p_name"]), column="p_name", max_dist=2
    ).to_pandas()
    return _pairs_frame(out)


def fuzzy_customer_pairs(sf_dir: str) -> pd.DataFrame:
    """Customer-name pairs within edit distance 2 — every name has the
    SAME length, so the whole corpus lands in one length class and the
    result hinges on the salt decomposition (the hot-key regime)."""
    from rdf2smw_ray.pipelines.relational import _read

    out = fuzzy_pairs(
        _read(sf_dir, "customer", columns=["c_name"]), column="c_name", max_dist=2
    ).to_pandas()
    return _pairs_frame(out)


FUZZY_PART_PAIRS_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY 1, 2
"""

FUZZY_CUSTOMER_PAIRS_SQL = """
WITH names AS (SELECT DISTINCT c_name FROM customer)
SELECT a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 2
ORDER BY 1, 2
"""


def fuzzy_canon(values, *, column: str, max_dist: int = 2, salts: int = 4):
    """End-to-end entity canonicalization: (name, canon) where canon
    is the lexicographically smallest name reachable through edit-
    distance-≤k edges (singletons map to themselves).

    Composition of three distributed pieces, all reused:

    1. :func:`fuzzy_pairs` — blocked + vectorized candidate edges;
    2. ``ranking.dense_rank_strings`` — order-preserving int64 ids
       (min(id) ≡ min(name), so integer min-label components yield the
       lexicographic representative);
    3. ``dedup.connected_components`` — driver union-find for small
       edge lists, Dataset-op label propagation above the threshold.

    Names re-enter as strings via id joins; the whole chain ships only
    (id, id) edges and (id, name) pairs between stages."""
    from rdf2smw_ray.pipelines.dedup import connected_components
    from rdf2smw_ray.pipelines.ranking import dense_rank_strings
    from rdf2smw_ray.stages.join import bucketed_join

    import ray.data as rd

    distinct = distinct_values(values, column=column).materialize()
    pairs = fuzzy_pairs(
        values, column=column, max_dist=max_dist, salts=salts, distinct=distinct
    ).union(
        # no-hit corpora leave zero blocks -> schema None; typed empty
        # union keeps the id joins schema-stable
        rd.from_arrow(
            pa.table(
                {
                    "name_a": pa.array([], pa.string()),
                    "name_b": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        )
    )
    ids = dense_rank_strings(distinct, column="v").materialize()

    e1 = bucketed_join(
        pairs, ids, key="name_a", right_key="v", right_cols={"id": "ida"}
    )
    e2 = bucketed_join(
        e1, ids, key="name_b", right_key="v", right_cols={"id": "idb"}
    )
    cc = connected_components(e2, "ida", "idb")
    named = bucketed_join(
        cc, ids, key="node", right_key="id", right_cols={"v": "name"}
    )
    named = bucketed_join(
        named, ids, key="label", right_key="id", right_cols={"v": "canon"}
    )
    full = bucketed_join(
        ids,
        named,
        key="v",
        right_key="name",
        right_cols={"canon": "canon"},
        how="left",
    )

    def finalize(batch: pa.Table) -> pa.Table:
        name = pd.Series(batch["v"].to_pylist(), dtype=object)
        canon = pd.Series(batch["canon"].to_pylist(), dtype=object)
        return pa.table(
            {
                "name": pa.array(name.to_numpy(), pa.string()),
                "canon": pa.array(canon.fillna(name).to_numpy(), pa.string()),
            }
        )

    return full.map_batches(finalize, batch_format="pyarrow")


def fuzzy_part_canon(sf_dir: str) -> pd.DataFrame:
    """Canonical representative per part name under edit-distance-2
    equivalence closure — the registered query."""
    from rdf2smw_ray.pipelines.relational import _read

    out = fuzzy_canon(
        _read(sf_dir, "part", columns=["p_name"]), column="p_name", max_dist=2
    ).to_pandas()
    return out.sort_values("name").reset_index(drop=True)


FUZZY_PART_CANON_SQL = """
WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
pairs AS MATERIALIZED (
  SELECT a.p_name AS a, b.p_name AS b
  FROM names a JOIN names b ON a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 2
),
edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
reach AS (
  SELECT p_name AS n, p_name AS m FROM names
  UNION
  SELECT r.n, e.b AS m FROM reach r JOIN edges e ON e.a = r.m
)
SELECT n AS name, MIN(m) AS canon FROM reach GROUP BY 1 ORDER BY 1
"""
