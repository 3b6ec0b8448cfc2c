"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification.

Scale shapes (ray_guide patterns):
- exact: content hash in a vectorized ``map_batches`` →
  ``groupby(hash)`` keep-first — one shuffle of (hash, id) pairs, not
  the payload;
- MinHash-LSH: shingle → signature per batch (numpy universal
  hashing), explode to (band, band_hash, doc_id) rows, groupby the
  band key, verify candidates with exact shingle Jaccard inside the
  group, emit (doc_id, dup_of) edges, resolve to cluster minima;
- SimHash: 64-bit signature per doc; exact-signature grouping.

All hashes are blake2b-seeded and deterministic across runs and
parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.md5((t or "").encode()).hexdigest())


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(docs, *, key: str = "text", id_col: str = "doc_id"):
    """Keep the minimum-id row per distinct content hash.

    Returns (doc_id, text_hash) of the KEPT rows. The shuffle carries
    only (hash, id); payload columns never move.
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[key].to_pylist(), dtype=object)
        return pa.table(
            {
                id_col: batch[id_col],
                "text_hash": pa.array(_md5_series(texts), pa.string()),
            }
        )

    hashed = docs.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_hash").min(id_col)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _hash64_tokens(toks: list[str]) -> np.ndarray:
    """Stable 64-bit hash per token (vectorized rolling combine of
    per-token hashes is built on these)."""
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            for t in toks
        ],
        dtype=np.uint64,
    )


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def shingle_hashes(text: str, k: int = 5, _tok_cache: dict | None = None) -> np.ndarray:
    """Hashes of the k-word shingles (word-level shingling).

    Vectorized: hash each token once (cached across docs via
    ``_tok_cache``), then combine windows of k token-hashes with a
    rolling xor-rotate — O(tokens) numpy work instead of hashing every
    shingle string."""
    toks = (text or "").split()
    if not toks:
        return np.array([], dtype=np.uint64)
    if _tok_cache is None:
        th = _hash64_tokens(toks)
    else:
        miss = [t for t in toks if t not in _tok_cache]
        if miss:
            hs = _hash64_tokens(miss)
            _tok_cache.update(zip(miss, hs))
        th = np.fromiter((_tok_cache[t] for t in toks), dtype=np.uint64, count=len(toks))
    if len(th) < k:
        k = len(th)
    # combine k consecutive token hashes, position-salted so order matters
    acc = np.zeros(len(th) - k + 1, dtype=np.uint64)
    for j in range(k):
        h = th[j : len(th) - k + 1 + j]
        rot = np.uint64((j * 7 + 1) % 63 + 1)  # keep shifts in (0, 64)
        acc ^= ((h << rot) | (h >> (np.uint64(64) - rot))) * _SHINGLE_MIX
    return np.unique(acc)


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of the universal hash family over the shingles."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n_shingles) — modular arithmetic via Python ints is slow;
    # use uint64 wraparound then mod (fine for dedup purposes, deterministic)
    prod = (sh[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


class MinHasher:
    """Actor stage: permutation params built once per actor."""

    def __init__(self, num_perm=64, bands=16, k=5, id_col="doc_id", text_col="text"):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into ``bands`` rows (band_id, band_hash, doc_id)."""
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        tok_cache: dict = {}  # shared token-hash cache within the batch
        out_band, out_hash, out_id = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(
                shingle_hashes(t, self.k, _tok_cache=tok_cache), self.a, self.b
            )
            for bnd in range(self.bands):
                seg = sig[bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
                h = hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest()
                out_band.append(bnd)
                out_hash.append(h)
                out_id.append(i)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )


def minhash_candidates(docs, *, num_perm=64, bands=16, k=5, concurrency=4):
    """docs → candidate-pair edges (doc_id, dup_of) with doc_id > dup_of.

    Pairs sharing ANY band bucket. Groups are per (band_id, band_hash),
    so the pair generation is bounded by bucket size, not corpus size.
    """
    from rdf2smw_ray.util import pool

    bands_ds = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        concurrency=pool(concurrency),
    )

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        ids = sorted(set(df["doc_id"]))
        if len(ids) < 2:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())}
            )
        root = ids[0]
        rest = ids[1:]
        return pa.table(
            {
                "doc_id": pa.array(rest, pa.int64()),
                "dup_of": pa.array([root] * len(rest), pa.int64()),
            }
        )

    edges = bands_ds.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a doc may appear in many buckets → keep its smallest partner
    return edges.groupby("doc_id").min("dup_of")


def minhash_dedup(
    docs,
    *,
    num_perm=64,
    bands=16,
    k=5,
    concurrency=4,
    verify_threshold: float | None = None,
):
    """Near-dup assignment: (doc_id, dup_of) rows for docs assigned to
    an earlier near-duplicate; docs absent from the result are kept.

    ``verify_threshold``: when set, candidate edges are verified with
    exact shingle Jaccard (ray_guide: "candidate pairs → verify
    Jaccard"): the candidate texts (a small fraction of the corpus)
    are fetched via a broadcast id-set filter and pairs below the
    threshold are dropped.
    """
    edges = minhash_candidates(
        docs, num_perm=num_perm, bands=bands, k=k, concurrency=concurrency
    )
    if verify_threshold is None:
        return edges
    edges_df = edges.to_pandas()
    if "doc_id" not in edges_df.columns or edges_df.empty:
        return edges
    dup_col = next(c for c in edges_df.columns if "dup_of" in c)
    cand_ids = set(edges_df["doc_id"]) | set(edges_df[dup_col])

    import ray

    ref = ray.put(cand_ids)

    def only_candidates(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        mask = pa.array([i in ids for i in batch["doc_id"].to_pylist()])
        return batch.filter(mask)

    texts_df = (
        docs.map_batches(only_candidates, batch_format="pyarrow")
        .select_columns(["doc_id", "text"])
        .to_pandas()
    )
    text_by_id = dict(zip(texts_df["doc_id"], texts_df["text"]))
    keep = [
        jaccard(text_by_id.get(a, ""), text_by_id.get(b, ""), k) >= verify_threshold
        for a, b in zip(edges_df["doc_id"], edges_df[dup_col])
    ]
    out = edges_df[pd.Series(keep, index=edges_df.index)]
    import ray.data as rd

    if out.empty:
        return rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), dup_col: pa.array([], pa.int64())}
            )
        )
    return rd.from_pandas(out.reset_index(drop=True))


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard — the verification kernel for LSH
    candidates."""
    a = set(shingle_hashes(text_a, k).tolist())
    b = set(shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_text(text: str) -> int:
    """64-bit SimHash over whitespace tokens."""
    toks = (text or "").split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    hs = [simhash_text(t) for t in batch["text"].to_pylist()]
    return pa.table(
        {"doc_id": batch["doc_id"], "simhash": pa.array(hs, pa.uint64())}
    )


def simhashes(docs):
    return docs.map_batches(simhash_batch, batch_format="pyarrow")


def simhash_dedup(docs):
    """Group identical simhashes, keep min doc_id per group."""
    return simhashes(docs).groupby("simhash").min("doc_id")
