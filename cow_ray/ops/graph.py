"""Distributed graph operators: connected components over an edge
Dataset.

The one consumer today is transitive near-duplicate clustering
(``pipelines.curate``): verified near-dup pairs form an undirected
graph whose components are duplicate clusters; the keep-rule is "min
id per component".  Round-2 did this with a driver-side union-find
behind a hard pair-count guard; this operator removes that ceiling —
everything below is Dataset-level (groupby shuffles), no driver
materialization of edges or labels.

Algorithm: the **alternating large-star / small-star algorithm** of
Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
Components in MapReduce and Beyond" (SoCC 2014) — public literature.
Per node u with neighborhood Γ(u) and m = min(Γ(u) ∪ {u}):

* **large-star** rewires every strictly larger neighbor to m:
  emit {(v, m) : v ∈ Γ(u), v > u};
* **small-star** rewires the rest: emit {(v, m) : v ∈ Γ(u), v ≤ u}
  ∪ {(u, m)}.

Both preserve connectivity; their alternation converges in O(log n)
rounds to a fixpoint in which every component is a star centered at
its minimum id (the paper's Theorem 3 — a plain min-neighbor
contraction, by contrast, shrinks a path graph by only one edge per
round).  Components then fall out of one groupby-min over the final
star edges.

Shapes: each half-round is ONE keyed exchange — hash-partition the
symmetric edge list on node id, full neighborhoods assemble per
partition, the star rewiring is a vectorized boundary scan (no
per-node Python).  Termination is detected with an exact,
driver-scalar edge-set fingerprint (order-independent u64 mix-sum +
count): equal fingerprints in consecutive rounds ⇔ the edge set is a
fixpoint.  Per-round ``materialize()`` is required anyway to stop
lineage re-execution across iterations and is bounded by the edge
set, not the corpus.  Node-id hash partitioning is uniform; the one
skew risk — a giant star's full neighborhood landing on one worker —
is inherent to the algorithm's per-node grouping and bounded by the
largest true component.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Sum


def _hash_part(keys: np.ndarray, mod: int) -> np.ndarray:
    """splitmix64 of the int64 key, mod partitions — uniform and
    deterministic (no polars/string round-trip for int keys)."""
    z = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return ((z ^ (z >> np.uint64(31))) % np.uint64(mod)).astype(np.int32)


def _mix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _np_col(batch: pa.Table, name: str) -> np.ndarray:
    c = batch[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


_EDGE_SCHEMA = pa.schema(
    [("__part", pa.int32()), ("node", pa.int64()), ("nbr", pa.int64())]
)


def _stage_sym(col_a: str, col_b: str, num_partitions: int):
    """(a, b) rows → symmetric (part, node, nbr) rows keyed for the
    per-node grouping; self-loops dropped, batch-locally deduped."""

    def sym(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EDGE_SCHEMA.empty_table()
        a, b = _np_col(batch, col_a), _np_col(batch, col_b)
        keep = a != b
        a, b = a[keep], b[keep]
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        t = pa.table({"node": pa.array(node), "nbr": pa.array(nbr)})
        t = t.group_by(["node", "nbr"], use_threads=False).aggregate([])
        part = _hash_part(
            t["node"].combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(t["node"], pa.ChunkedArray)
            else t["node"].to_numpy(zero_copy_only=False),
            num_partitions,
        )
        return pa.table(
            {"__part": pa.array(part), "node": t["node"], "nbr": t["nbr"]}
        )

    return sym


def _fp_partial(a: np.ndarray, b: np.ndarray) -> np.int64:
    """Wrapped-u64 mix-sum over directed (a, b) rows — the edge-set
    fingerprint partial (order-independent, exact)."""
    h = _mix64(a.astype(np.uint64) * np.uint64(0x100000001B3)
               ^ _mix64(b.astype(np.uint64)))
    return h.sum(dtype=np.uint64).astype(np.int64)


def _with_fp_cols(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    """(id_a, id_b) edges + fused fingerprint-partial columns: row 0
    carries this block's (wrapped mix-sum, row count), the rest 0 —
    so convergence detection is ONE tiny Sum aggregate over the
    already-materialized round output instead of a separate
    re-execution per round (round-3 verdict #3: the extra fingerprint
    passes were most of the per-round fixed cost at toy edge counts)."""
    n = src.size
    fp = np.zeros(n, dtype=np.int64)
    cnt = np.zeros(n, dtype=np.int64)
    if n:
        fp[0] = _fp_partial(src, dst)
        cnt[0] = n
    return pa.table(
        {"id_a": pa.array(src), "id_b": pa.array(dst),
         "fp": pa.array(fp), "n": pa.array(cnt)}
    )


_OUT_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()),
     ("fp", pa.int64()), ("n", pa.int64())]
)


def _star_op(large: bool):
    """Vectorized large-/small-star rewiring over one hash partition
    (full neighborhoods co-located by the node-keyed groupby).  The
    small-star half (the one whose output is materialized per round)
    emits fused fingerprint partials; the large-star half is consumed
    immediately and carries plain edges."""

    def op(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        node = _np_col(group, "node")
        nbr = _np_col(group, "nbr")
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        newn = np.r_[True, node[1:] != node[:-1]]
        starts = np.flatnonzero(newn)
        # per-node min neighbor (sorted → first of each run), then m
        m_per_node = np.minimum(node[starts], nbr[starts])
        # expand m back to rows
        seg = np.cumsum(newn) - 1
        m = m_per_node[seg]
        if large:
            mask = nbr > node
            src, dst = nbr[mask], m[mask]
        else:
            mask = nbr <= node
            src = np.concatenate([nbr[mask], node[starts]])
            dst = np.concatenate([m[mask], m_per_node])
        keep = src != dst
        return _with_fp_cols(src[keep], dst[keep])

    return op


def _half_round(edges, large: bool, num_partitions: int):
    staged = edges.map_batches(
        _stage_sym("id_a", "id_b", num_partitions), batch_format="pyarrow"
    )
    return staged.groupby("__part").map_groups(
        _star_op(large), batch_format="pyarrow"
    )


def _fp_of(edges) -> tuple[int, int]:
    """Fold the fused (fp, n) partial columns: one Sum aggregate over
    the materialized edge set → two driver scalars.  int64 wrap-around
    IS the intended mod-2^64 arithmetic."""
    agg = edges.aggregate(Sum("fp", alias_name="fp"),
                          Sum("n", alias_name="n"))
    return (int(agg["fp"] or 0) % (1 << 64), int(agg["n"] or 0))


def connected_components(edges, col_a: str = "id_a", col_b: str = "id_b",
                         num_partitions: int = 16, max_iter: int = 64):
    """Edge Dataset → (node, component) Dataset, component = min
    reachable node id.  Isolated nodes (no incident non-loop edge)
    are not emitted — their component is themselves.

    ``max_iter`` bounds the alternating rounds (O(log n) expected;
    64 ≫ log₂ of any feasible node count); non-convergence raises
    loudly rather than silently truncating.
    """
    import ray.data

    # normalize input to (id_a, id_b) directed rows + fused fp partials
    def norm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        return _with_fp_cols(_np_col(batch, col_a), _np_col(batch, col_b))

    cur = edges.map_batches(norm, batch_format="pyarrow").materialize()
    fp_prev = _fp_of(cur)
    if fp_prev[1] == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], type=pa.int64()),
                      "component": pa.array([], type=pa.int64())})
        )
    for _ in range(max_iter):
        cur = _half_round(cur, True, num_partitions)
        cur = _half_round(cur, False, num_partitions).materialize()
        fp = _fp_of(cur)
        if fp == fp_prev:
            break
        fp_prev = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating star rounds"
        )

    # fixpoint = stars centered at component minima → component(u) =
    # min(Γ(u) ∪ u), one groupby-min over the final symmetric edges
    from ray.data.aggregate import Min

    staged = cur.map_batches(
        _stage_sym("id_a", "id_b", num_partitions), batch_format="pyarrow"
    )
    lab = staged.groupby("node").aggregate(Min("nbr", alias_name="component"))

    def with_self(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("node", pa.int64()), ("component", pa.int64())]
            ).empty_table()
        nv = _np_col(batch, "node")
        lv = _np_col(batch, "component")
        return pa.table(
            {"node": pa.array(nv),
             "component": pa.array(np.minimum(nv, lv))}
        )

    return lab.map_batches(with_self, batch_format="pyarrow")
