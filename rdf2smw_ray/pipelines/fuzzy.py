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


def lev_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Exact Levenshtein distance for each aligned (a[i], b[i]) pair,
    vectorized across pairs."""
    la = a.str.len().to_numpy().astype(np.int64)
    lb = b.str.len().to_numpy().astype(np.int64)
    out = np.empty(len(a), dtype=np.int64)
    for s in range(0, len(a), _SLAB):
        out[s : s + _SLAB] = _lev_slab(
            a.iloc[s : s + _SLAB], b.iloc[s : s + _SLAB],
            la[s : s + _SLAB], lb[s : s + _SLAB],
        )
    return out


def _lev_slab(a, b, la, lb) -> np.ndarray:
    m = len(a)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    wa, wb = max(int(la.max()), 1), max(int(lb.max()), 1)
    ac, bc = _encode(a, wa), _encode(b, wb)
    res = np.empty(m, dtype=np.int64)
    res[la == 0] = lb[la == 0]
    j_idx = np.arange(wb + 1, dtype=np.int64)
    dp = np.broadcast_to(j_idx, (m, wb + 1)).copy()
    for i in range(1, wa + 1):
        cost = (ac[:, i - 1 : i] != bc).astype(np.int64)  # (m, wb)
        cand = np.empty_like(dp)
        cand[:, 0] = i
        cand[:, 1:] = np.minimum(dp[:, :-1] + cost, dp[:, 1:] + 1)
        # insertion chain: dp[j] = min_{j'<=j} cand[j'] + (j - j')
        dp = np.minimum.accumulate(cand - j_idx, axis=1) + j_idx
        done = la == i
        if done.any():
            res[done] = dp[done, lb[done]]
    return res


def fuzzy_pairs(
    values,
    *,
    column: str,
    max_dist: int = 2,
    salts: int = 4,
):
    """Dataset of (name_a, name_b, dist): distinct values of
    ``column`` within edit distance ``max_dist``, name_a < name_b."""
    def distinct_partial(batch: pa.Table) -> pa.Table:
        u = pd.unique(pd.Series(batch[column].to_pylist(), dtype=object).dropna())
        return pa.table({"v": pa.array(u, pa.string())})

    distinct = (
        values.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("v")
        .count()
        .select_columns(["v"])
    )

    def emit(batch: pa.Table) -> pa.Table:
        v = pd.Series(batch["v"].to_pylist(), dtype=object)
        ln = v.str.len().to_numpy().astype(np.int64)
        salt = (
            pd.util.hash_pandas_object(v, index=False).to_numpy() % salts
        ).astype(np.int64)
        rows_v, rows_b, rows_x = [], [], []
        # x (owner) row: the pair's shorter / lexicographically-first side
        rows_v.append(v.to_numpy())
        rows_b.append(ln * salts + salt)
        rows_x.append(np.ones(len(v), dtype=bool))
        # y rows: replicate to every salt of lengths len, len-1, .., len-k
        for d in range(0, max_dist + 1):
            tgt = ln - d
            keep = tgt >= 0
            for s in range(salts):
                rows_v.append(v.to_numpy()[keep])
                rows_b.append(tgt[keep] * salts + s)
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
        blen = int(df["__bucket"].iat[0]) // salts
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
        if not len(xs) or not len(ys):
            return empty
        a = pd.Series(np.repeat(xs.to_numpy(), len(ys)))
        b = pd.Series(np.tile(ys.to_numpy(), len(xs)))
        # same-length pairs: owner is the lexicographically smaller side
        keep = (b.str.len() > blen) | (a < b)
        a, b = a[keep].reset_index(drop=True), b[keep].reset_index(drop=True)
        if not len(a):
            return empty
        d = lev_batch(a, b)
        hit = d <= max_dist
        av, bv = a[hit].to_numpy(), b[hit].to_numpy()
        lo = np.where(av < bv, av, bv)  # output order is lexicographic,
        hi = np.where(av < bv, bv, av)  # not shorter-side-first
        return pa.table(
            {
                "name_a": pa.array(lo, pa.string()),
                "name_b": pa.array(hi, pa.string()),
                "dist": pa.array(d[hit], pa.int64()),
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
