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

import hashlib

import pyarrow as pa


def hash_sample(ds, key_col: str, hex_prefixes: tuple = ("0", "1")):
    """Deterministic content-hash sample: keep rows whose
    ``md5(str(key))`` hex digest starts with one of ``hex_prefixes``
    (rate = len(prefixes)/16).  Matches DuckDB's
    ``substr(md5(CAST(key AS VARCHAR)), 1, 1) IN (...)`` exactly, so
    the sample is oracle-checkable.  Embarrassingly parallel — no
    exchange; hashing is the per-row work (same stance as
    ``doc_fingerprint``)."""
    prefixes = set(hex_prefixes)

    def pick(batch: pa.Table) -> pa.Table:
        vals = batch[key_col].to_pylist()
        mask = pa.array(
            [
                hashlib.md5(str(v).encode("utf-8")).hexdigest()[0] in prefixes
                for v in vals
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sample(ds, group_cols: list, n: int, key_col: str):
    """Deterministic stratified sample: ``n`` rows per group, chosen by
    md5-rank of the key within the group — content-addressed like
    :func:`hash_sample` (stable under any partitioning/engine), but
    with an exact per-stratum quota instead of a global rate.  Built
    on the map-side-pruned :func:`group_top_k`, so the exchange
    carries ≈ n × groups × blocks rows."""
    import hashlib as _hashlib

    import pyarrow as pa_

    def rank(batch: pa_.Table) -> pa_.Table:
        h = [
            _hashlib.md5(str(v).encode("utf-8")).hexdigest()
            for v in batch[key_col].to_pylist()
        ]
        return batch.append_column("__rank", pa_.array(h,
                                                       type=pa_.string()))

    out = group_top_k(
        ds.map_batches(rank, batch_format="pyarrow"),
        group_cols, "__rank", k=n, descending=False, tie_col=key_col,
    )

    def drop(batch: pa_.Table) -> pa_.Table:
        return batch.drop_columns(["__rank"])

    return out.map_batches(drop, batch_format="pyarrow")


def group_top_k(ds, group_cols: list, order_col: str, k: int = 3,
                descending: bool = True, tie_col: str | None = None):
    """Per-group top-k with a map-side prune: each batch keeps its own
    local top-k per group first (top-k is a monoid: global winners are
    winners of local winners), so the groupby exchange carries
    ≈ k × groups × blocks rows instead of every row.  Deterministic
    total order via ``tie_col`` (ascending)."""
    import pandas as pd

    by = [order_col] + ([tie_col] if tie_col else [])
    asc = [not descending] + ([True] if tie_col else [])

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(by, ascending=asc)
            .groupby(group_cols, sort=False)
            .head(k)
        )

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(by, ascending=asc).head(k)

    return (
        ds.map_batches(local_top, batch_format="pandas")
        .groupby(group_cols)
        .map_groups(final_top, batch_format="pandas")
    )
