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
column needs a sketch (t-digest / KLL); that is a different operator
with different guarantees — this one refuses loudly rather than
silently approximating.
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
                f"max_distinct={max_distinct}; use a sketch for "
                "continuous domains")
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
