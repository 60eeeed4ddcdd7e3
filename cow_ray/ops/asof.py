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

Partitioning assumption (documented per the brief): one group =
one (key)'s rows from BOTH sides, so per-key data must fit a worker —
the same contract as every ``map_groups`` sessionization.  The
exchange moves each table exactly once, keyed by the join key.
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
):
    """Left as-of join of two Datasets.  Returns the left columns plus
    ``right_payload`` columns (null where no right row qualifies).

    ``max_group_rows`` enforces the documented one-key-fits-a-worker
    contract at its edge: a hot key whose two-sided history exceeds it
    raises a NAMED error (below) instead of an opaque worker OOM.
    Remedies: pre-aggregate the right side, split the key range by
    time, or raise the limit deliberately on big-memory workers."""
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

    # tag with properly-TYPED null columns (an object-dtype None column
    # would force schema coercion at the union and defeat Arrow nulls)
    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__k": b[key_left], "__t": b[ts_left],
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in left_cols:
            cols[c] = b[c]
        for c in right_payload:
            cols[c] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__k": b[key_right], "__t": b[ts_right],
                "__side": pa.array(np.ones(n, dtype=np.int8))}
        for c in left_cols:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in right_payload:
            cols[c] = b[c]
        return pa.table(cols)

    combined = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_group_rows:
            raise RuntimeError(
                f"asof_join hot key {g['__k'].iloc[0]!r}: {len(g)} rows "
                f"exceed max_group_rows={max_group_rows} — the one-key-"
                "fits-a-worker contract; pre-aggregate the right side, "
                "split by time range, or raise max_group_rows"
            )
        lefts = g[g["__side"] == 0]
        rights = g[g["__side"] == 1]
        out = lefts[left_cols].copy()
        if rights.empty:
            for c in right_payload:
                out[c] = _typed_nulls(g[c].to_numpy().dtype, len(out))
            return out
        # deterministic tie-break: at equal right ts the LAST row in
        # (ts, payload...) order wins = max payload
        rights = rights.sort_values(["__t"] + right_payload,
                                    kind="stable")
        rts = rights["__t"].to_numpy()
        lts = lefts["__t"].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        hit = idx >= 0
        safe = np.clip(idx, 0, len(rights) - 1)
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

    return combined.groupby("__k").map_groups(merge, batch_format="pandas")
