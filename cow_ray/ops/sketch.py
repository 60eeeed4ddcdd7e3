"""Mergeable sketches: HyperLogLog approximate distinct counting
(Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007).

The aggregation-at-scale pattern for non-algebraic aggregates (guide:
"emit one serialized sketch per batch and merge them in a second, tiny
stage — sketches are designed to be mergeable"): each ``map_batches``
task hashes its column slice and emits ONE register-array row; the
merge is an elementwise max over a handful of rows.  The exchange is
``O(num_batches × 2^p)`` bytes, never the data.

Deterministic (fixed hash seed) and vectorized (numpy register
updates).  Standard HLL with the bias-corrected estimator; ±~1.04/√m
relative error (m = 2^p registers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Stable 64-bit hashes of a string column (polars, vectorized)."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(pa.chunked_array([arr])).hash(seed=7).to_numpy()


def hll_registers(values: pa.Array, p: int = 12) -> np.ndarray:
    """One batch → its HLL register array (uint8, length 2^p)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash64(values)
    if h.size == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    work = h << np.uint64(p)
    # rank = 1 + number of leading zeros of the remaining 64-p bits
    # (capped at 64-p+1 when they are all zero)
    rank = np.zeros(h.size, dtype=np.uint8)
    found = np.zeros(h.size, dtype=bool)
    for r in range(1, 64 - p + 1):
        top = (work >> np.uint64(63)).astype(bool)
        newly = top & ~found
        rank[newly] = r
        found |= top
        if found.all():
            break
        work = work << np.uint64(1)
    rank[~found] = 64 - p + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = float(regs.size)
    inv = np.power(2.0, -regs.astype(np.float64))
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # small-range correction
    return raw


def approx_distinct_multi(ds, cols: list[str], p: int = 12) -> dict[str, float]:
    """Distributed approximate distinct counts for several columns in a
    SINGLE pass (one sketch row per (batch, column))."""

    def sketch(batch: pa.Table) -> pa.Table:
        rows = []
        for col in cols:
            rows.append({"col": col,
                         "regs": hll_registers(batch[col], p).tolist()})
        return pa.Table.from_pylist(rows)

    merged = {c: np.zeros(1 << p, dtype=np.uint8) for c in cols}
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        c = row["col"]
        merged[c] = np.maximum(merged[c],
                               np.asarray(row["regs"], dtype=np.uint8))
    return {c: hll_estimate(r) for c, r in merged.items()}


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate distinct count of a string column."""
    return approx_distinct_multi(ds, [col], p)[col]
