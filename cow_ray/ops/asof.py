"""As-of join — the time-series operator Ray Data has no primitive
for, composed from union → keyed groupby → per-group vectorized merge
(the brief's pattern (a): map_batches + groupby().map_groups + sort).

Semantics (``direction="backward"``, the common case): each left row
is joined to the right row with the greatest ``ts_right`` ≤ its
``ts_left`` within the same key — "the most recent quote before the
trade".  Ties on ``ts_right`` are broken deterministically by the
first payload column (max wins), so the result is hash-comparable
against DuckDB's ``ASOF JOIN`` over a per-(key, ts) pre-deduplicated
right side.

Partitioning (round 3): the exchange keys on ``hash(key) %
num_partitions`` — whole keys co-locate, the int partition key keeps
the sort cheap, and the merge is one vectorized pass per PARTITION
(per-key work is a numpy searchsorted inside the partition, not a
Python ``map_groups`` call per key).  Contracts: a partition must fit
a worker (size ``num_partitions``), and a single hot key must stay
under ``max_group_rows`` (named error at the edge).  The exchange
moves each table exactly once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _typed_nulls(dtype: np.dtype, n: int):
    if dtype.kind == "M":
        return np.full(n, np.datetime64("NaT"), dtype=dtype)
    if dtype.kind in "fiu":
        return np.full(n, np.nan, dtype=np.float64)
    return np.full(n, None, dtype=object)


def asof_join(
    left_ds,
    right_ds,
    *,
    key_left: str,
    ts_left: str,
    key_right: str,
    ts_right: str,
    right_payload: list[str],
    direction: str = "backward",
    max_group_rows: int = 5_000_000,
    num_partitions: int = 16,
):
    """Left as-of join of two Datasets.  Returns the left columns plus
    ``right_payload`` columns (null where no right row qualifies).

    The exchange is keyed on ``hash(key) % num_partitions`` (whole
    keys co-locate; the merge is ONE vectorized pass per partition,
    not one Python call per key).  Size ``num_partitions`` so a
    partition (≈ both tables' bytes / num_partitions) fits a worker
    heap.  ``max_group_rows`` enforces the per-KEY contract at its
    edge: a hot key whose two-sided history exceeds it raises a NAMED
    error instead of an opaque worker OOM.  Remedies: pre-aggregate
    the right side, split the key range by time, or raise the limit
    deliberately on big-memory workers."""
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")

    import pyarrow as pa

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    ltypes = dict(zip(left_schema.names, left_schema.types))
    rtypes = dict(zip(right_schema.names, right_schema.types))
    left_cols = list(left_schema.names)
    clash = set(left_cols) & set(right_payload)
    if clash:
        raise ValueError(
            f"right_payload columns {sorted(clash)} collide with left "
            "columns — rename one side before joining"
        )

    from ..stages.canonicalize import hash_mod

    # tag with properly-TYPED null columns (an object-dtype None column
    # would force schema coercion at the union and defeat Arrow nulls);
    # __part co-locates whole keys so the exchange sorts a SMALL int
    # key and the merge runs once per partition, not once per key
    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__k": b[key_left], "__t": b[ts_left],
                "__part": hash_mod(b[key_left], num_partitions),
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in left_cols:
            cols[c] = b[c]
        for c in right_payload:
            cols[c] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__k": b[key_right], "__t": b[ts_right],
                "__part": hash_mod(b[key_right], num_partitions),
                "__side": pa.array(np.ones(n, dtype=np.int8))}
        for c in left_cols:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in right_payload:
            cols[c] = b[c]
        return pa.table(cols)

    combined = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        """One whole hash partition (many keys): sort both sides once
        by (key, ts[, payload]), find per-key blocks with searchsorted,
        build ONE gather index over the rights, then a single typed
        gather per payload column — no per-key pandas slicing."""
        lefts = g[g["__side"] == 0]
        rights = g[g["__side"] == 1]
        out = lefts[left_cols].copy()
        if lefts.empty or rights.empty:
            # keep the output schema IDENTICAL across partitions — a
            # rights-only partition must still emit (0 rows of) the
            # payload columns or downstream schema-dependent ops wobble
            for c in right_payload:
                out[c] = _typed_nulls(g[c].to_numpy().dtype, len(out))
            return out
        # deterministic tie-break: at equal right ts the LAST row in
        # (ts, payload...) order wins = max payload
        rights = rights.sort_values(["__k", "__t"] + right_payload,
                                    kind="stable")
        lorder = np.argsort(lefts["__k"].to_numpy(), kind="stable")
        lefts = lefts.iloc[lorder]
        out = out.iloc[lorder]
        rk = rights["__k"].to_numpy()
        rt = rights["__t"].to_numpy()
        lk = lefts["__k"].to_numpy()
        lt = lefts["__t"].to_numpy()
        gidx = np.full(len(lefts), -1, dtype=np.int64)
        # per-key loop with vectorized searchsorted inside — keys per
        # partition are bounded by the hash split; the heavy per-row
        # work stays in numpy
        newk = np.r_[True, lk[1:] != lk[:-1]]
        kstarts = np.flatnonzero(newk)
        kends = np.r_[kstarts[1:], len(lk)]
        for s, e in zip(kstarts, kends):
            n_rows = e - s
            rs = np.searchsorted(rk, lk[s])
            re_ = np.searchsorted(rk, lk[s], side="right")
            if max(n_rows, re_ - rs) > max_group_rows:
                raise RuntimeError(
                    f"asof_join hot key {lk[s]!r}: "
                    f"{max(n_rows, re_ - rs)} rows exceed "
                    f"max_group_rows={max_group_rows} — the one-key-"
                    "fits-a-worker contract; pre-aggregate the right "
                    "side, split by time range, or raise max_group_rows"
                )
            if re_ > rs:
                idx = np.searchsorted(rt[rs:re_], lt[s:e],
                                      side="right") - 1
                gidx[s:e] = np.where(idx >= 0, rs + idx, -1)
        hit = gidx >= 0
        safe = np.clip(gidx, 0, len(rights) - 1)
        for c in right_payload:
            vals = rights[c].to_numpy()[safe]
            # dtype-preserving nulls (an object column would wobble the
            # output schema block to block)
            if vals.dtype.kind == "M":
                out[c] = np.where(hit, vals, np.datetime64("NaT"))
            elif vals.dtype.kind in "fiu":
                out[c] = np.where(hit, vals.astype(np.float64), np.nan)
            else:
                out[c] = np.where(hit, vals, None)
        return out

    return combined.groupby("__part").map_groups(
        merge_part, batch_format="pandas"
    )
