"""Range (interval) join: match each row's scalar value to the
interval containing it — the broadcast-side variant (interval tables
are small: bands, tiers, SLA windows), which is the scale-correct
shape: the fact table never shuffles; the interval table ships once
via the task closure and each batch resolves membership with one
vectorized binary search.

For non-overlapping sorted intervals the lookup is exact; overlapping
interval sets need an interval tree — out of scope here (document the
assumption, same stance as the as-of partitioning contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def interval_join(
    ds,
    intervals: list[tuple],
    value_col: str,
    *,
    label_col: str = "band",
    drop_unmatched: bool = True,
):
    """``intervals`` is a list of ``(label, lo, hi)`` with inclusive
    bounds, non-overlapping.  Appends ``label_col``; inner-join
    semantics by default (rows outside every interval dropped)."""
    # fail FAST at call time: an empty/invalid interval list would
    # otherwise only explode at task runtime inside every map task
    if not intervals:
        raise ValueError("interval_join needs at least one interval")
    for lab, lo, hi in intervals:
        if lo > hi:
            raise ValueError(
                f"interval {lab!r} has lo {lo} > hi {hi}"
            )
    ivs = sorted(intervals, key=lambda t: t[1])
    for (_, _, h1), (_, l2, _) in zip(ivs, ivs[1:]):
        if l2 <= h1:
            raise ValueError("intervals must be non-overlapping")
    labels = np.array([t[0] for t in ivs])
    los = np.array([t[1] for t in ivs], dtype=np.float64)
    his = np.array([t[2] for t in ivs], dtype=np.float64)

    def attach(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(np.searchsorted(los, v, side="right") - 1, 0,
                      len(ivs) - 1)
        hit = (v >= los[idx]) & (v <= his[idx])
        out = batch.append_column(
            label_col,
            pa.array(np.where(hit, labels[idx], None), type=pa.string()),
        )
        return out.filter(pa.array(hit)) if drop_unmatched else out

    return ds.map_batches(attach, batch_format="pyarrow")
