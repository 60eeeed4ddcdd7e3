"""Corpus sampling and per-group selection operators.

Training-data pipelines need *deterministic, content-addressed*
sampling (the same doc is in or out of the sample on every run, every
engine, every shard layout — execution-order sampling like
``Dataset.random_sample`` cannot give an oracle-checkable result) and
per-group top-k selection (e.g. the k highest-quality documents per
language).  Both are pure streaming maps plus, for top-k, one bounded
groupby whose exchange carries ≈ k × groups × blocks rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .md5np import md5_first_byte, md5_hex_arrow


def _key_array(batch: pa.Table, key_col: str, op: str):
    """Null-key contract for the content-addressed operators: a null
    identifier is an upstream data bug and would silently diverge from
    the SQL oracle (DuckDB's ``md5(NULL)`` is NULL, falling into
    IN-filter drop / CASE ELSE / NULLS-LAST rank), so it is refused
    loudly instead of hashed as ``str(None)``."""
    col = batch[key_col]
    if col.null_count:
        raise ValueError(
            f"{op}: key column {key_col!r} contains "
            f"{col.null_count} null(s) — content-addressed keys must "
            "be non-null (fill or filter first)")
    return col


def hash_sample(ds, key_col: str, hex_prefixes: tuple = ("0", "1")):
    """Deterministic content-hash sample: keep rows whose
    ``md5(str(key))`` hex digest starts with one of ``hex_prefixes``
    (rate = len(prefixes)/16).  Matches DuckDB's
    ``substr(md5(CAST(key AS VARCHAR)), 1, 1) IN (...)`` exactly, so
    the sample is oracle-checkable.  Embarrassingly parallel — no
    exchange; the md5 runs in the vectorized lane kernel
    (ops/md5np.py) straight off the Arrow buffers.  Null keys raise
    (see :func:`_key_array`)."""
    # first hex digit == high nibble of the first digest byte
    nibbles = {int(p, 16) for p in hex_prefixes}

    def pick(batch: pa.Table) -> pa.Table:
        b = md5_first_byte(_key_array(batch, key_col, "hash_sample"))
        mask = np.isin(b >> 4, list(nibbles))
        return batch.filter(pa.array(mask))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sample(ds, group_cols: list, n: int, key_col: str):
    """Deterministic stratified sample: ``n`` rows per group, chosen by
    md5-rank of the key within the group — content-addressed like
    :func:`hash_sample` (stable under any partitioning/engine), but
    with an exact per-stratum quota instead of a global rate.  Built
    on the map-side-pruned :func:`group_top_k`, so the exchange
    carries ≈ n × groups × blocks rows.  Null keys raise (see
    :func:`_key_array`)."""

    def rank(batch: pa.Table) -> pa.Table:
        h = md5_hex_arrow(_key_array(batch, key_col,
                                     "stratified_sample"))
        return batch.append_column("__rank", h)

    out = group_top_k(
        ds.map_batches(rank, batch_format="pyarrow"),
        group_cols, "__rank", k=n, descending=False, tie_col=key_col,
    )

    def drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["__rank"])

    return out.map_batches(drop, batch_format="pyarrow")


def group_top_k(ds, group_cols: list, order_col: str, k: int = 3,
                descending: bool = True, tie_col: str | None = None):
    """Per-group top-k with a map-side prune: each batch keeps its own
    local top-k per group first (top-k is a monoid: global winners are
    winners of local winners), so the groupby exchange carries
    ≈ k × groups × blocks rows instead of every row.  Deterministic
    total order via ``tie_col`` (ascending).  Pure Arrow: one sort +
    run-position mask per batch; the final per-group merge is bounded
    by group count × k rows."""
    import numpy as np
    import pyarrow.compute as pc

    order_keys = [(order_col, "descending" if descending else "ascending")]
    if tie_col:
        order_keys.append((tie_col, "ascending"))

    def local_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        sk = [(c, "ascending") for c in group_cols] + order_keys
        s = batch.take(pc.sort_indices(batch, sort_keys=sk))
        new = np.zeros(s.num_rows, dtype=bool)
        new[0] = True
        for c in group_cols:
            v = s[c].to_numpy(zero_copy_only=False)
            new[1:] |= v[1:] != v[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        pos = np.arange(s.num_rows) - starts[seg]
        return s.filter(pa.array(pos < k))

    def final_top(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        return g.take(pc.sort_indices(g, sort_keys=order_keys)).slice(0, k)

    return (
        ds.map_batches(local_top, batch_format="pyarrow")
        .groupby(group_cols)
        .map_groups(final_top, batch_format="pyarrow")
    )


def shuffle_by_hash(ds, key_col: str, keep_hash: bool = False,
                    hash_col: str = "__shuffle_md5"):
    """Deterministic global shuffle — the final stage before training
    serialization: order the corpus by ``md5(str(key))`` (ties by the
    key itself), so the "random" order is content-addressed and
    reproducible across runs, shard layouts, and engines (SQL mirror:
    ``ORDER BY md5(CAST(key AS VARCHAR)), key``).  ONE range-partition
    sort exchange; the md5 ranks come from the vectorized lane kernel
    (ops/md5np.py).  Null keys raise (see :func:`_key_array`)."""

    def rank(batch: pa.Table) -> pa.Table:
        h = md5_hex_arrow(_key_array(batch, key_col,
                                     "shuffle_by_hash"))
        return batch.append_column(hash_col, h)

    out = ds.map_batches(rank, batch_format="pyarrow").sort(
        [hash_col, key_col])
    if keep_hash:
        return out
    return out.map_batches(
        lambda b: b.drop_columns([hash_col]), batch_format="pyarrow")


def hash_split(ds, key_col: str, splits=(("train", 90), ("val", 5),
                                         ("test", 5)),
               out_col: str = "split"):
    """Deterministic train/val/test assignment: the first two hex
    digits of ``md5(str(key))`` (0..255) bucket each row into the
    requested percent ranges — content-addressed, so a row keeps its
    split across runs, shards, and engines (same md5-on-string
    contract as :func:`hash_sample`; mirrored by the SQL oracle with
    one CASE over the same digit pair).  Weights are integer percent
    points and must sum to ≤ 100; any remainder falls into the LAST
    split.  Embarrassingly parallel — no exchange; the bucket byte
    comes from the vectorized md5 lane kernel (ops/md5np.py).  Null
    keys raise (see :func:`_key_array`)."""
    total = sum(w for _, w in splits)
    if total > 100 or not splits or any(w <= 0 for _, w in splits):
        raise ValueError("split weights must be positive and sum ≤ 100")
    # cumulative upper bounds in 1/100ths scaled to the 256 bucket
    # space: bucket b belongs to the first split with b*100 < cum*256
    bounds = []
    cum = 0
    for name, w in splits:
        cum += w
        bounds.append((name, cum))
    bounds[-1] = (bounds[-1][0], 100)  # remainder → last split

    names = pa.array([name for name, _ in bounds], type=pa.string())
    ubs = np.array([ub for _, ub in bounds], dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        b = md5_first_byte(_key_array(batch, key_col, "hash_split")
                           ).astype(np.int64)
        # first split whose bound clears the bucket: searchsorted over
        # the cumulative upper bounds (b*100 < ub*256)
        split_idx = np.searchsorted(ubs * 256, b * 100, side="right")
        return batch.append_column(out_col, names.take(
            pa.array(split_idx, type=pa.int64())))

    return ds.map_batches(assign, batch_format="pyarrow")
