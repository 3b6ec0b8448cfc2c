"""Mergeable sketches — approximate aggregations as partial+final
(ray_guide "Aggregation at scale": one serialized sketch per batch,
merged in a tiny second stage).

HyperLogLog (dense, numpy registers) for approximate distinct counts.
Standard error ≈ 1.04/√(2^p).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash64(values: list) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
            )
            for v in values
        ],
        dtype=np.uint64,
    )


class HLL:
    """Dense HyperLogLog with 2^p registers; mergeable by max."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hs: np.ndarray) -> "HLL":
        idx = (hs >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hs << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1
        rank = np.zeros(len(hs), dtype=np.uint8)
        remaining = rest.copy()
        mask_done = np.zeros(len(hs), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            top = (remaining >> np.uint64(63)) & np.uint64(1)
            newly = (~mask_done) & (top == 1)
            rank[newly] = r
            mask_done |= newly
            remaining = remaining << np.uint64(1)
            if mask_done.all():
                break
        rank[~mask_done] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes) -> "HLL":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


def approx_distinct(ds, column: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one HLL per batch, merged on
    the driver (sketches are tiny — 2^p bytes each)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        h = HLL(p).add_hashes(_hash64(batch[column].to_pylist()))
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    parts = ds.select_columns([column]).map_batches(
        sketch_batch, batch_format="pyarrow"
    )
    merged = HLL(p)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for s in b["sketch"].to_pylist():
            merged.merge(HLL.deserialize(s))
    return merged.estimate()


# ---------------------------------------------------------------------------
# Approximate quantiles — mergeable fixed-width histogram sketch.
# Two cheap passes: (1) global min/max (tiny aggregate), (2) per-batch
# histogram partials summed by Ray's native aggregate. Quantiles come
# from the cumulative histogram with linear interpolation; error is
# bounded by one bin width of the value range (range/num_bins).
# ---------------------------------------------------------------------------
def approx_quantiles(
    ds, column: str, qs: list[float], *, num_bins: int = 4096
) -> list[float]:
    """Approximate quantiles of ``column`` at probabilities ``qs``.

    Scale shape: each batch contributes one `num_bins` count vector
    (vectorized ``np.bincount``); partials tree-merge by addition; the
    driver holds only two histograms' worth of state. No sort, no
    shuffle of the data itself."""
    from ray.data.aggregate import AggregateFn

    proj = ds.select_columns([column])

    def minmax_block(state, block):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        # same valid-value mask as the histogram pass: nulls/NaNs must
        # not count toward n, or the q*n targets overshoot the
        # cumulative histogram (ADVICE round 2)
        v = np.asarray(t[column].to_pandas(), dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return state
        return (
            min(state[0], float(v.min())),
            max(state[1], float(v.max())),
            state[2] + len(v),
        )

    mm = proj.aggregate(
        AggregateFn(
            init=lambda _k: (float("inf"), float("-inf"), 0),
            merge=lambda a, b: (min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2]),
            accumulate_block=minmax_block,
            name="minmax",
        )
    )["minmax"]
    lo, hi, n = mm
    if n == 0:
        return [float("nan")] * len(qs)
    if hi == lo:
        return [float(lo)] * len(qs)
    width = (hi - lo) / num_bins

    def hist_block(state, block):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        v = np.asarray(t[column].to_pandas(), dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, num_bins - 1)
        return state + np.bincount(idx, minlength=num_bins)

    hist = proj.aggregate(
        AggregateFn(
            init=lambda _k: np.zeros(num_bins, dtype=np.int64),
            merge=lambda a, b: a + b,
            accumulate_block=hist_block,
            name="hist",
        )
    )["hist"]

    cum = np.cumsum(hist)
    out = []
    for q in qs:
        target = q * n
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, num_bins - 1)
        prev = cum[b - 1] if b > 0 else 0
        inbin = hist[b]
        frac = (target - prev) / inbin if inbin > 0 else 0.0
        out.append(float(lo + (b + min(max(frac, 0.0), 1.0)) * width))
    return out
