"""Canonicalization shuffles: exact triple dedup and surface-form
canonicalization (north rule: "canonicalization is a distributed
groupby-aggregate shuffle on normalized surface-form keys with explicit
salting of hot entities").

The reference has **no** global dedup — each 5,000-row chunk's rdflib
graph set-dedups locally and cross-chunk duplicates survive in the
``.nq`` output (SURVEY.md §2.5).  The engine normalizes to set
semantics with a two-level scheme that keeps the all-to-all exchange
as small as possible:

1. **local distinct** inside every ``map_batches`` call
   (``pyarrow.Table.group_by`` over all six triple columns — the Arrow
   analogue of the reference's within-chunk graph-set dedup);
2. **hash partition + per-partition distinct**: a stable 64-bit key
   hash (polars' vectorized ``Series.hash``) modulo ``num_parts``
   becomes the shuffle key; each partition deduplicates independently.
   Key-hash partitioning is uniform by construction, so *this* shuffle
   needs no salting — skew lives in semantic keys, not content hashes.

Surface-form canonicalization is the skew-prone one (head entities):
it pre-aggregates counts inside each batch (one row per distinct
(key, surface) per batch — a hot key leaves each block once, bounding
the exchange), optionally salts the first groupby, and argmaxes per
key in a final tiny stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import triples as _triples

KEY_SEP = "\x1f"
NULL_MARK = "\x00"

TRIPLE_COLS = [f.name for f in _triples.TRIPLE_SCHEMA]


def content_key(table: pa.Table, cols: list[str]) -> pa.Array:
    """One string key per row from ``cols`` (nulls distinguished from
    empty strings by a sentinel)."""
    parts = []
    for c in cols:
        col = table[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(pc.fill_null(pc.cast(col, pa.string()), NULL_MARK))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, KEY_SEP)


def first_per_key(table: pa.Table, key_cols: list[str],
                  order_keys: list[tuple]) -> pa.Table:
    """Vectorized "first row per key after ordering" (min-by): ONE
    Arrow sort by (key_cols..., order_keys...) then a numpy
    run-boundary mask — the pure-Arrow replacement for the
    sort_values + drop_duplicates pandas round-trip (round-3 verdict
    #4).  Works per batch (map-side partial) and per hash partition
    (global merge) identically because min-by is associative."""
    if table.num_rows == 0:
        return table
    sk = [(c, "ascending") for c in key_cols] + list(order_keys)
    s = table.take(pc.sort_indices(table, sort_keys=sk))
    new = np.zeros(s.num_rows, dtype=bool)
    new[0] = True
    for c in key_cols:
        v = s[c].to_numpy(zero_copy_only=False)
        new[1:] |= v[1:] != v[:-1]
    return s.filter(pa.array(new))


def hash_mod(arr: pa.Array | pa.ChunkedArray, mod: int, seed: int = 0) -> pa.Array:
    """Stable vectorized 64-bit hash (polars) modulo ``mod`` →
    int32 partition ids.  Deterministic across processes/runs for a
    fixed polars version — the property exact resume relies on."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = pl.from_arrow(pa.chunked_array([arr])).hash(seed=seed) % mod
    out = h.cast(pl.Int32).to_arrow()
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def local_distinct(table: pa.Table, cols: list[str] | None = None) -> pa.Table:
    """Within-batch exact dedup (vectorized group_by; single-threaded —
    Ray already runs one task per core)."""
    cols = cols or table.column_names
    return table.select(cols).group_by(cols, use_threads=False).aggregate([])


def dedup_triples(ds, num_parts: int = 64, cols: list[str] | None = None):
    """Exact global distinct over the triple table (Dataset in →
    Dataset out).

    ``num_parts`` bounds per-partition memory: each partition is one
    group materialized on a worker (choose ≈ total_bytes / 256 MiB; the
    content-hash key distributes uniformly, so parts are even).

    Scale note: this uses Ray's ``groupby`` shuffle, which is fine for
    query-sized data but measured ~10× slower than the filesystem
    scatter/gather at the 10M-triple mark (low-cardinality sort keys).
    For store-bound flows always prefer
    ``materialize_triples(..., dedup=True)`` — dedup there rides the
    partitioned write for free (see stages/materialize.py)."""
    cols = cols or TRIPLE_COLS

    def prep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__part", pa.array([], type=pa.int32()))
        batch = local_distinct(batch, cols)
        part = hash_mod(content_key(batch, cols), num_parts)
        return batch.append_column("__part", part)

    staged = ds.map_batches(prep, batch_format="pyarrow")

    def per_part(group: pa.Table) -> pa.Table:
        return local_distinct(group.drop_columns(["__part"]), cols)

    return staged.groupby("__part").map_groups(per_part, batch_format="pyarrow")


def grouped_count(ds, keys: list[str], salt: int = 0, count_col: str = "n"):
    """Count rows per key tuple with batch-level pre-aggregation and an
    optional explicit salt phase.

    * phase 0 (map-side): ``group_by(keys).count`` inside every batch —
      a hot key leaves each block as ONE row, which already bounds the
      shuffle at #blocks rows per key;
    * phase 1 (optional, ``salt > 0``): group on ``keys + [__salt]``
      where ``__salt = arange(n) % salt``, merging partial counts in
      ``salt`` independent reducers — use when #blocks itself is huge
      and a single reducer per hot key would still be a straggler;
    * phase 2: final ``groupby(keys).sum``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(keys)
            .group_by(keys, use_threads=False)
            .aggregate([([], "count_all")])
        )
        t = t.select(keys + ["count_all"]).rename_columns(
            keys + [count_col])
        if salt > 0:
            t = t.append_column(
                "__salt", pa.array(np.arange(t.num_rows) % salt, type=pa.int32())
            )
        return t

    staged = ds.map_batches(partial, batch_format="pyarrow")
    if salt > 0:
        staged = (
            staged.groupby(keys + ["__salt"])
            .aggregate(Sum(count_col, alias_name=count_col))
            .drop_columns(["__salt"])
        )
    return staged.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))


def normalize_surface(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """The normalized surface-form key: casefold + whitespace collapse +
    trim (vectorized)."""
    a = pc.utf8_lower(arr)
    a = pc.replace_substring_regex(a, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(a)


def canonicalize_surface_forms(
    mentions,
    surface_col: str = "surface",
    entity_col: str = "entity_id",
    salt: int = 8,
):
    """The north-rule canonicalization shuffle: group mentions on the
    *normalized surface form*, count per (surface_key, entity), and
    elect one canonical entity per surface key (max support, then
    lexicographically smallest — deterministic).

    Returns a small Dataset ``(surface_key, entity_id, n, n_total)``
    with one row per surface key.  ONE keyed exchange: batches
    pre-count per (surface_key, entity) — a hot surface form leaves
    each block as one row, which is what the ``salt`` phase used to
    protect; hash partitioning on the surface key then lands each
    key's ≤ #blocks partial rows in one partition, where the merge,
    election and totals are a single vectorized pass (the previous
    shape ran two generic sort-aggregates plus one Python ``elect``
    call per key).  ``salt`` is kept for API compatibility and ignored.
    """

    num_parts = 16

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "surface_key", normalize_surface(batch[surface_col])
        )
        t = (
            batch.select(["surface_key", entity_col])
            .group_by(["surface_key", entity_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        t = t.select(["surface_key", entity_col, "count_all"]
                     ).rename_columns(["surface_key", entity_col, "n"])
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], type=pa.int32()))
        return t.append_column("__part", hash_mod(t["surface_key"],
                                                  num_parts))

    def per_part(group: pa.Table) -> pa.Table:
        import numpy as np

        if group.num_rows == 0:
            # same guard as every other map_groups UDF in the repo —
            # empty groups currently never reach the UDF, but a 0-row
            # table would make the starts=[0] take() below raise
            empty = group.drop_columns(["__part"]).select(
                ["surface_key", entity_col]
            )
            return empty.append_column(
                "n", pa.array([], type=pa.int64())
            ).append_column("n_total", pa.array([], type=pa.int64()))

        agg = (
            group.drop_columns(["__part"])
            .group_by(["surface_key", entity_col], use_threads=False)
            .aggregate([("n", "sum")])
        )
        agg = agg.select(["surface_key", entity_col, "n_sum"]
                         ).rename_columns(["surface_key", entity_col, "n"])
        # election: sort (key asc, n desc, entity asc); first row per
        # key wins; n_total = per-key sum (vectorized boundary scan)
        import pyarrow.compute as pc_

        order = pc_.sort_indices(
            agg,
            sort_keys=[("surface_key", "ascending"), ("n", "descending"),
                       (entity_col, "ascending")],
        )
        s = agg.take(order)
        keys = s["surface_key"].to_numpy(zero_copy_only=False)
        nvals = s["n"].to_numpy(zero_copy_only=False)
        newk = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(newk)
        ends = np.r_[starts[1:], len(keys)]
        totals = np.add.reduceat(nvals, starts) if len(keys) else \
            np.array([], dtype=np.int64)
        # reduceat single-segment quirk does not apply: starts are
        # strictly increasing with at least one element per segment
        out = s.take(pa.array(starts))
        return out.append_column(
            "n_total", pa.array(totals.astype(np.int64))
        )

    return (
        mentions.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
    )
