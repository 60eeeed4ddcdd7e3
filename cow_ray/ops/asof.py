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

    out_fields = [(c, ltypes[c]) for c in left_cols] + [
        (c, rtypes[c]) for c in right_payload
    ]
    out_schema = pa.schema(out_fields)

    def merge_part(g: pa.Table) -> pa.Table:
        """One whole hash partition (many keys), pure Arrow + numpy:
        sort both sides once ((key, ts[, payload]) via
        ``pc.sort_indices``), find per-key blocks with searchsorted,
        build ONE gather index over the rights, then a single
        ``pc.take`` + ``pc.if_else`` per payload column — no per-key
        slicing, no Arrow↔pandas round-trip (round-3 verdict #4: the
        pandas layer here was pure conversion overhead)."""
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g["__side"].to_numpy(zero_copy_only=False)
        lefts = g.filter(pa.array(side == 0))
        rights = g.filter(pa.array(side == 1))
        if lefts.num_rows == 0 or rights.num_rows == 0:
            # keep the output schema IDENTICAL across partitions — a
            # rights-only partition must still emit (0 rows of) the
            # payload columns or downstream schema-dependent ops wobble
            cols = [lefts[c] for c in left_cols] + [
                pa.nulls(lefts.num_rows, rtypes[c]) for c in right_payload
            ]
            return pa.table(cols, schema=out_schema)
        # deterministic tie-break: at equal right ts the LAST row in
        # (ts, payload...) order wins = max payload (total order over
        # (k, ts, payload...), so sort stability is irrelevant)
        ridx = pc.sort_indices(
            rights,
            sort_keys=[("__k", "ascending"), ("__t", "ascending")]
            + [(c, "ascending") for c in right_payload],
        )
        rights = rights.take(ridx)
        lidx = pc.sort_indices(lefts, sort_keys=[("__k", "ascending")])
        lefts = lefts.take(lidx)
        rk = rights["__k"].to_numpy(zero_copy_only=False)
        rt = rights["__t"].to_numpy(zero_copy_only=False)
        lk = lefts["__k"].to_numpy(zero_copy_only=False)
        lt = lefts["__t"].to_numpy(zero_copy_only=False)
        gidx = np.full(len(lk), -1, dtype=np.int64)
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
        hit = pa.array(gidx >= 0)
        safe = pa.array(np.clip(gidx, 0, rights.num_rows - 1))
        cols = [lefts[c] for c in left_cols]
        for c in right_payload:
            taken = pc.take(
                rights[c].combine_chunks()
                if isinstance(rights[c], pa.ChunkedArray)
                else rights[c],
                safe,
            )
            # Arrow nulls where no right row qualifies — types survive
            # exactly (the pandas version floated int payloads)
            cols.append(pc.if_else(hit, taken, pa.scalar(None, type=rtypes[c])))
        return pa.table(cols, schema=out_schema)

    return combined.groupby("__part").map_groups(
        merge_part, batch_format="pyarrow"
    )
