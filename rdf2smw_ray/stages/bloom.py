"""Distributed Bloom filter — build as a tree-merged aggregate, apply
as a broadcast membership test.

The web-scale anti/semi-join alternative flagged in the round-1
VERDICT: instead of co-shuffling both key streams, build an m-bit
filter over the right side's keys (per-block partial bitmaps, OR-merged
by Ray's aggregate tree — the driver only ever holds the FIXED-size
bitmap, never a key set), broadcast it once via ``ray.put``, and
prefilter the left stream inside ``map_batches``.

Bloom semantics: ``might_contain == False`` is definitive. So an anti
join splits the left stream into DEFINITELY-unmatched rows (kept
immediately, typically the vast majority) and maybe-matched rows
(true matches + false positives) that go through the exact bucketed
anti join (stages/join.py) — whose input is now a tiny fraction of
the left side.

Hashing: double hashing over two independent deterministic 64-bit
key hashes (``pd.util.hash_pandas_object`` with distinct hash keys):
``index_i = (h1 + i*h2) mod m``. Deterministic across processes and
runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HK1 = "bloomhash1_0123456"[:16].ljust(16, "0")
_HK2 = "bloomhash2_6543210"[:16].ljust(16, "0")


def _key_hashes(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    from rdf2smw_ray.stages.join import norm_key_series

    values = norm_key_series(values)  # int32 -5 must hash like int64 -5
    h1 = pd.util.hash_pandas_object(values, index=False, hash_key=_HK1).to_numpy()
    h2 = pd.util.hash_pandas_object(values, index=False, hash_key=_HK2).to_numpy()
    return h1, h2 | np.uint64(1)  # odd step → full cycle for power-of-2 m


def bloom_bits_for(
    n_keys: int, *, bits_per_key: int = 10, floor: int = 1 << 20, cap: int = 1 << 27
) -> int:
    """Power-of-two bitmap width sized to the expected key count
    (~10 bits/key ≈ 1% false positives at k=7). Clamped: tiny inputs
    keep a cheap floor; the cap (16 MB of bits at 1<<27) stays
    broadcast-friendly. Round-2 VERDICT item 2: a fixed width lets the
    FP rate climb with the candidate set and quietly regrows the
    "prefiltered" shuffle toward the full corpus."""
    m = floor
    target = bits_per_key * max(1, n_keys)
    while m < target and m < cap:
        m <<= 1
    return m


class BloomFilter:
    """Fixed-size bitmap with k double-hashed probes. ``m_bits`` must
    be a power of two (mask instead of modulo)."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 7, bits: np.ndarray | None = None):
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
        self.m = m_bits
        self.k = k
        self.words = m_bits // 64
        self.bits = bits if bits is not None else np.zeros(self.words, dtype=np.uint64)

    def _indices(self, values: pd.Series) -> np.ndarray:
        """(k, n) bit indices."""
        h1, h2 = _key_hashes(values)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & np.uint64(self.m - 1)

    def add(self, values: pd.Series) -> None:
        idx = self._indices(values).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63)))

    def might_contain(self, values: pd.Series) -> np.ndarray:
        """Boolean mask; False is definitive absence."""
        idx = self._indices(values)
        word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        return BloomFilter(self.m, self.k, np.bitwise_or(self.bits, other.bits))

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())


def build_bloom(ds, key: str, *, m_bits: int = 1 << 23, k: int = 7) -> BloomFilter:
    """Distributed build: per-block partial bitmaps, OR-merged by the
    aggregate tree. Driver memory = one bitmap, independent of rows."""
    from ray.data.aggregate import AggregateFn

    def accumulate(state: np.ndarray, block) -> np.ndarray:
        df = block.to_pandas() if isinstance(block, pa.Table) else block
        bf = BloomFilter(m_bits, k, state.copy())
        bf.add(df[key])
        return bf.bits

    agg = AggregateFn(
        init=lambda _k: np.zeros(m_bits // 64, dtype=np.uint64),
        merge=lambda a, b: np.bitwise_or(a, b),
        accumulate_block=accumulate,
        name="bloom",
    )
    res = ds.aggregate(agg)
    bits = res["bloom"] if isinstance(res, dict) else res
    return BloomFilter(m_bits, k, np.asarray(bits, dtype=np.uint64))


def bloom_anti_join(left_ds, right_ds, *, key: str, right_key: str | None = None,
                    m_bits: int = 1 << 23, k: int = 7, est_bytes: int | None = None):
    """Anti join with a Bloom prefilter: rows whose key misses the
    filter are DEFINITELY unmatched and stream straight through; only
    the maybe-matched remainder (right matches + Bloom false
    positives) pays the exact bucketed co-shuffle."""
    import ray

    from rdf2smw_ray.stages.join import bucketed_join

    rkey = right_key or key
    bloom = build_bloom(right_ds.select_columns([rkey]), rkey, m_bits=m_bits, k=k)
    ref = ray.put(bloom.bits)

    def split(batch: pa.Table, want_definite: bool) -> pa.Table:
        bf = BloomFilter(m_bits, k, ray.get(ref))
        maybe = bf.might_contain(pd.Series(batch[key].to_pandas()))
        return batch.filter(pa.array(~maybe if want_definite else maybe))

    import functools

    definite = left_ds.map_batches(
        functools.partial(split, want_definite=True), batch_format="pyarrow"
    )
    maybe = left_ds.map_batches(
        functools.partial(split, want_definite=False), batch_format="pyarrow"
    )
    exact = bucketed_join(
        maybe, right_ds, key=key, right_key=rkey, how="anti", est_bytes=est_bytes
    )
    return definite.union(exact)
