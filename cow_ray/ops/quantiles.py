"""Exact distributed quantiles over a discrete-valued column.

The classic histogram reduction: each batch emits its local
``(value, count)`` pairs (map-side combine), the partials coalesce to
ONE block (``distinct_per_batch × blocks`` rows — the `_tiny_rollup`
argument from pipelines.queries applies: Ray's sort-based groupby
would pay its full fixed exchange for a KB-sized merge), and one
vectorized pass takes cumulative counts and reads the answers off.

Quantile contract (mirrored by the SQL oracle, all-integer so there
is no float-boundary risk — ``0.99·(n−1)`` in IEEE doubles rounds
BELOW the exact product and floors wrong; per-mille integer ranks
cannot): for q‰, the answer is the value at sorted-multiset index
``(q · (n−1)) // 1000``, i.e. the first value whose cumulative count
exceeds that index.

Exactness requires the distinct-value domain to be bounded
(``max_distinct`` guard, default 4M ≈ 64 MB of partials — lengths,
scores, sizes and other telemetry columns qualify).  A continuous
column needs a sketch with explicit error bars — that is
:func:`sketch_quantiles` below (deterministic merge-and-prune
ε-summary); ``exact_quantiles`` refuses loudly rather than silently
approximating.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def exact_quantiles(ds, col: str, q_permille=(250, 500, 750, 900, 990),
                    max_distinct: int = 4_000_000):
    """→ Dataset ``(q float64, value)`` with one row per requested
    per-mille rank, exact over the full distribution."""
    qs = [int(q) for q in q_permille]
    if not qs or any(q < 0 or q > 1000 for q in qs):
        raise ValueError("q_permille must be in [0, 1000]")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"v": batch[col]})
        g = t.group_by(["v"], use_threads=False).aggregate(
            [("v", "count")])
        return pa.table({"v": g["v"],
                         "c": g["v_count"].cast(pa.int64())})

    def final(batch: pa.Table) -> pa.Table:
        vt = batch.column("v").type
        if batch.num_rows == 0:
            return pa.table({"q": pa.array([], type=pa.float64()),
                             "value": pa.array([], type=vt)})
        g = batch.group_by(["v"], use_threads=False).aggregate(
            [("c", "sum")])
        if g.num_rows > max_distinct:
            raise ValueError(
                f"exact_quantiles: {g.num_rows} distinct values exceed "
                f"max_distinct={max_distinct}; use sketch_quantiles "
                "for continuous domains")
        order = pa.compute.sort_indices(g, sort_keys=[("v", "ascending")])
        g = g.take(order)
        c = g["c_sum"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(c)
        n = int(cum[-1])
        idx = np.array([(q * (n - 1)) // 1000 for q in qs],
                       dtype=np.int64)
        pos = np.searchsorted(cum, idx, side="right")
        return pa.table(
            {"q": pa.array([q / 1000.0 for q in qs],
                           type=pa.float64()),
             "value": g["v"].take(pa.array(pos))})

    # batch_size=None: `final` must see the coalesced partials as ONE
    # batch (the similarity._finish_topk contract)
    return (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow",
                         batch_size=None))


# ------------------------------------------------------------------
# ε-approximate quantiles for CONTINUOUS domains (the sketch
# counterpart exact_quantiles refuses to be).  Deterministic
# merge-and-prune summaries in the Manku–Rajagopalan–Lindsay (SIGMOD
# 1998) / mergeable-summaries tradition: every block compresses its
# SORTED values to weighted points whose cumulative weight is the
# exact local rank, pruned so consecutive retained ranks differ by at
# most the block's error budget; merging is concat + sort + cumsum
# (rank errors ADD across levels, so each of the ≤2 levels spends
# eps/2).  No randomness (unlike KLL), so results are reproducible
# given the same block layout, and the rank-error bound
# ``|true_rank(answer) − q·n| ≤ eps·n`` is a worst-case guarantee,
# asserted against brute force in tests.
# ------------------------------------------------------------------


def _compress_weighted(v: np.ndarray, w: np.ndarray, budget: int):
    """Prune sorted weighted points so consecutive retained cumulative
    ranks differ by ≤ budget + max(w); always keeps the last point
    (the running maximum).  Adds ≤ budget + max(w_in) rank error —
    callers SUBTRACT max(w_in) from their error allowance when sizing
    ``budget`` so the level's total stays within its eps share (a
    heavy input point otherwise rides on top of the budget and the
    published worst-case bound silently loosens)."""
    if len(v) == 0 or budget <= 1:
        return v, w
    cum = np.cumsum(w)
    total = int(cum[-1])
    targets = np.arange(budget, total + 1, budget, dtype=np.int64)
    idx = np.unique(np.searchsorted(cum, targets, side="left"))
    if len(idx) == 0 or idx[-1] != len(v) - 1:
        idx = np.append(idx, len(v) - 1)
    new_w = np.diff(np.concatenate([np.zeros(1, dtype=np.int64),
                                    cum[idx]]))
    return v[idx], new_w


def sketch_quantiles(ds, col: str,
                     q_permille=(250, 500, 750, 900, 990),
                     eps_permille: int = 10,
                     max_driver_points: int = 2_000_000,
                     num_combine_parts: int = 32):
    """→ pyarrow Table ``(q float64, value float64, eps float64)`` —
    one row per requested per-mille rank, each value guaranteed within
    ``eps_permille/1000 · n`` ranks of the exact answer.

    Shape: one streaming pass compresses each block to ~``2/eps``
    weighted points (numpy sort + prune — no per-row Python); the
    partials are KB-sized, so they normally merge on the driver in one
    vectorized pass.  Above ``max_driver_points`` (≈1e6 blocks at
    100 TB) a distributed pre-combine level merges+re-prunes per
    partition first — each level spends half the error budget, so the
    published bound holds on both paths (the forced-combine path is
    accuracy-tested too).  Nulls and NaNs are excluded (matching SQL
    aggregate semantics)."""
    import ray

    qs = [int(q) for q in q_permille]
    if not qs or any(q < 0 or q > 1000 for q in qs):
        raise ValueError("q_permille must be in [0, 1000]")
    if not 1 <= int(eps_permille) <= 500:
        raise ValueError("eps_permille must be in [1, 500]")
    eps = eps_permille / 1000.0

    def partial(batch: pa.Table) -> pa.Table:
        a = batch[col].cast(pa.float64()).combine_chunks()
        v = a.to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        v.sort()
        # unit weights: allowance eps/2·n minus max(w_in)=1 keeps the
        # block's prune error ≤ eps/2·n exactly
        budget = max(1, int(eps / 2 * len(v)) - 1)
        v, w = _compress_weighted(v, np.ones(len(v), dtype=np.int64),
                                  budget)
        return pa.table({"v": pa.array(v, type=pa.float64()),
                         "w": pa.array(w, type=pa.int64())})

    def combine(batch: pa.Table) -> pa.Table:
        # one partition of partial summaries → merged + re-pruned
        v = batch["v"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        if len(w) == 0:
            return pa.table({"v": pa.array([], type=pa.float64()),
                             "w": pa.array([], type=pa.int64())})
        # allowance eps/2·W minus the heaviest incoming point: a
        # summary point from one huge block can weigh ~eps/2·n_block,
        # and without the subtraction the prune's real error is
        # budget + max(w) — above the level's eps/2 share (review
        # finding; the skewed-layout accuracy test pins this)
        budget = max(1, int(eps / 2 * int(w.sum())) - int(w.max()))
        v, w = _compress_weighted(v, w, budget)
        return pa.table({"v": pa.array(v, type=pa.float64()),
                         "w": pa.array(w, type=pa.int64())})

    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pyarrow")
             .materialize())
    if parts.count() > max_driver_points:
        parts = (parts.repartition(num_combine_parts)
                 .map_batches(combine, batch_format="pyarrow",
                              batch_size=None)
                 .materialize())

    refs = [r for b in parts.iter_internal_ref_bundles()
            for r in b.block_refs]
    tabs = [t for t in ray.get(refs) if t.num_rows]
    if not tabs:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64()),
                         "eps": pa.array([], type=pa.float64())})
    t = pa.concat_tables(tabs)
    v = t["v"].to_numpy(zero_copy_only=False)
    w = t["w"].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    n = int(cum[-1])
    ranks = np.array([(q * (n - 1)) // 1000 + 1 for q in qs],
                     dtype=np.int64)
    pos = np.minimum(np.searchsorted(cum, ranks, side="left"),
                     len(v) - 1)
    return pa.table({
        "q": pa.array([q / 1000.0 for q in qs], type=pa.float64()),
        "value": pa.array(v[pos], type=pa.float64()),
        "eps": pa.array([eps] * len(qs), type=pa.float64()),
    })
