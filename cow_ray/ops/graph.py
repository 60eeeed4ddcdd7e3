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

Round-4 cost structure (measured: 144 edges cost 7.3 s — ALL of it
Ray's fixed per-exchange constant, none of it data):

* **map-side local contraction**: before any exchange, each input
  block is contracted with vectorized min-label propagation — output
  is a star forest per local component plus the rewired residual
  cross-component edges (connectivity-preserving for ANY partial
  labeling, so the propagation pass cap is safe).  This is the
  classic two-phase CC optimization: at 100 TB it shrinks what the
  first exchange carries from |E| to ~|V_block| per block; at toy
  scale it usually finishes whole components before round 1.
* **bounded single-task finisher**: when the contracted edge count is
  ≤ ``local_solve_max_edges`` (default 2M rows ≈ 32 MB — one worker's
  batch, NOT a driver pull), the remaining forest coalesces to one
  partition and a full min-label fixpoint solve finishes in
  milliseconds, skipping every alternating round.  Above the
  threshold the O(log n) star rounds run exactly as before — the
  finisher changes the constant, not the asymptotics.
* **fingerprint fold over raw block refs**: the per-round (fp, n)
  fold reads two columns of already-materialized blocks; Dataset's
  ``aggregate`` spins its whole sort machinery (~0.25 s/round) for
  what is a scalar sum, so this is one of the rare justified raw-Ray
  escapes — one tiny task per block ref, ~10 ms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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


def _min_labels(a: np.ndarray, b: np.ndarray, max_passes: int
                ) -> tuple[np.ndarray, np.ndarray, bool]:
    """Vectorized min-label propagation with pointer-jump shortcutting
    over the edge list (a, b): returns ``(nodes, labels, converged)``
    where ``labels[i]`` is the smallest node id reached from
    ``nodes[i]`` within ``max_passes`` sweeps.  Each sweep is a few
    numpy kernels over the edges; labels decrease monotonically, so a
    no-change sweep IS the fixpoint (every edge's endpoints share a
    label and labels are self-rooted).  Partial labels (cap hit) are
    still ids of same-component nodes — callers that need exactness
    must check ``converged``."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: a.size], inv[a.size :]
    # par holds INDICES into nodes; nodes is sorted, so index order ==
    # node-id order and minimum-index == minimum-id
    par = np.arange(nodes.size)
    converged = False
    for _ in range(max_passes):
        m = np.minimum(par[ia], par[ib])
        new = par.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        new = new[new]  # shortcut: halve label-chain depth
        if np.array_equal(new, par):
            converged = True
            break
        par = new
    return nodes, nodes[par], converged


def _contract_block(a: np.ndarray, b: np.ndarray,
                    max_passes: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Connectivity-preserving block-local contraction: min-label the
    block's subgraph (pass-capped), emit the star forest
    ``(u, label(u))`` for non-roots PLUS the rewired residual edges
    ``(label(a), label(b))`` that still cross labels.  Exact for any
    labeling: an original path a–b survives as a–L(a) … L(a)–L(b) …
    L(b)–b.  When the block converges (the common case) the residual
    is empty and the output is ≤ |V_block| − #components edges."""
    nodes, lab, _ = _min_labels(a, b, max_passes)
    star_mask = lab != nodes
    # rewire residuals via searchsorted (nodes sorted by construction)
    ra = lab[np.searchsorted(nodes, a)]
    rb = lab[np.searchsorted(nodes, b)]
    res = ra != rb
    src = np.concatenate([nodes[star_mask], ra[res]])
    dst = np.concatenate([lab[star_mask], rb[res]])
    if res.any():
        # dedup (a few residuals only reach here on a pass-cap hit)
        pair = np.unique(np.stack([src, dst], axis=1), axis=0)
        src, dst = pair[:, 0], pair[:, 1]
    return src, dst


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
    """Fold the fused (fp, n) partial columns of a MATERIALIZED edge
    set into two driver scalars.  Deliberate raw-Ray escape (see
    module docstring): one tiny task per block ref beats Dataset's
    sort-aggregate machinery (~0.25 s fixed) by ~25×.  int64
    wrap-around IS the intended mod-2^64 arithmetic."""
    import ray

    @ray.remote(num_cpus=0.25)
    def block_fp(block: pa.Table) -> tuple[int, int]:
        # empty blocks skip the upstream map UDF entirely (observed
        # Ray behavior) and can arrive with the pre-norm schema
        if block.num_rows == 0 or "fp" not in block.schema.names:
            return (0, 0)
        fp = (block.column("fp").to_numpy(zero_copy_only=False)
              .astype(np.uint64).sum(dtype=np.uint64))
        n = int(block.column("n").to_numpy(zero_copy_only=False).sum())
        return (int(fp), n)

    refs = []
    for bundle in edges.iter_internal_ref_bundles():
        refs.extend(block_fp.remote(br) for br in bundle.block_refs)
    fp = n = 0
    for bfp, bn in ray.get(refs):
        fp = (fp + bfp) % (1 << 64)
        n += bn
    return (fp, n)


_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("component", pa.int64())])


def _solve_local(batch: pa.Table) -> pa.Table:
    """Finisher over the coalesced contracted forest: full min-label
    fixpoint (uncapped — labels strictly decrease per sweep, so the
    fixpoint is reached; the generous cap only guards a logic bug) →
    every node of the forest labeled with its component minimum."""
    if batch.num_rows == 0:
        return _LABEL_SCHEMA.empty_table()
    a = _np_col(batch, "id_a")
    b = _np_col(batch, "id_b")
    nodes, lab, converged = _min_labels(a, b, max_passes=256)
    if not converged:  # pragma: no cover - 256 ≫ log2(any node count)
        raise RuntimeError("local CC solve did not converge in 256 sweeps")
    return pa.table({"node": pa.array(nodes), "component": pa.array(lab)})


def connected_components(edges, col_a: str = "id_a", col_b: str = "id_b",
                         num_partitions: int = 16, max_iter: int = 64,
                         local_solve_max_edges: int = 2_000_000):
    """Edge Dataset → (node, component) Dataset, component = min
    reachable node id.  Isolated nodes (no incident non-loop edge)
    are not emitted — their component is themselves.

    Phase 1 contracts each input block locally (map-side, no
    exchange).  If the surviving forest is ≤ ``local_solve_max_edges``
    rows (~32 MB at the default — one worker task's batch, bounded
    and documented, NEVER the driver), a single-partition fixpoint
    solve finishes immediately; otherwise the alternating
    large-/small-star rounds run until the edge-set fingerprint is
    stable.  ``max_iter`` bounds the rounds (O(log n) expected; 64 ≫
    log₂ of any feasible node count); non-convergence raises loudly
    rather than silently truncating.
    """
    import ray.data

    # normalize + CONTRACT each input block: self-loops dropped, the
    # block's subgraph collapsed to star forest + residuals before
    # anything crosses the wire
    def norm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        a, b = _np_col(batch, col_a), _np_col(batch, col_b)
        keep = a != b
        a, b = a[keep], b[keep]
        if a.size == 0:
            return _OUT_SCHEMA.empty_table()
        src, dst = _contract_block(a, b)
        return _with_fp_cols(src, dst)

    cur = edges.map_batches(norm, batch_format="pyarrow").materialize()
    fp_prev = _fp_of(cur)
    if fp_prev[1] == 0:
        return ray.data.from_arrow(_LABEL_SCHEMA.empty_table())

    converged = False
    for _ in range(max_iter):
        if fp_prev[1] <= local_solve_max_edges:
            break
        cur = _half_round(cur, True, num_partitions)
        cur = _half_round(cur, False, num_partitions).materialize()
        fp = _fp_of(cur)
        if fp == fp_prev:
            converged = True
            break
        fp_prev = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating star rounds"
        )

    if not converged:
        # bounded finisher: coalesce the small forest into ONE task
        # and fixpoint-solve it (batch_size=None: the solver must see
        # the whole block as one batch)
        return cur.select_columns(["id_a", "id_b"]).repartition(1).map_batches(
            _solve_local, batch_format="pyarrow", batch_size=None)

    # star fixpoint path: component(u) = min(Γ(u) ∪ u) — partition-
    # level vectorized min instead of a high-cardinality sort-groupby
    staged = cur.map_batches(
        _stage_sym("id_a", "id_b", num_partitions), batch_format="pyarrow"
    )

    def part_min(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _LABEL_SCHEMA.empty_table()
        node = _np_col(group, "node")
        nbr = _np_col(group, "nbr")
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        nv = node[starts]
        return pa.table(
            {"node": pa.array(nv),
             "component": pa.array(np.minimum(nv, nbr[starts]))}
        )

    return staged.groupby("__part").map_groups(
        part_min, batch_format="pyarrow")



# ---------------------------------------------------------------------------
# PageRank (Page et al., 1999) — fixed-iteration, exact-integer variant
# ---------------------------------------------------------------------------

_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank_n9", pa.int64()),
                          ("rank", pa.float64())])

PR_FANIN = 256  # max *args per build/concat task in the scatter tree


def _pr_scatter(block: pa.Table, P: int, col_src: str, col_dst: str):
    """One input block → P edge sub-tables bucketed by hash(src) and
    P candidate-node sub-arrays bucketed by hash(node) (srcs and dsts
    both contribute node candidates)."""
    s = _np_col(block, col_src)
    d = _np_col(block, col_dst)
    ep = _hash_part(s, P)
    order = np.argsort(ep, kind="stable")
    s, d, ep = s[order], d[order], ep[order]
    bounds = np.searchsorted(ep, np.arange(P + 1))
    edge_parts = [
        pa.table({"src": pa.array(s[bounds[p]:bounds[p + 1]]),
                  "dst": pa.array(d[bounds[p]:bounds[p + 1]])})
        for p in range(P)]
    cand = np.unique(np.concatenate([s, d]))
    np_part = _hash_part(cand, P)
    node_parts = [pa.array(cand[np_part == p]) for p in range(P)]
    return (*edge_parts, *node_parts)


def _pr_build(n_edge_subs: int, *subs):
    """Assemble one partition: concat edges, attach outdeg (all of a
    src's edges are in its partition, so outdeg is local), distinct
    sorted node list.  ``subs`` = edge sub-tables then node sub-arrays
    (flat *args because Ray only resolves TOP-LEVEL ObjectRef
    arguments — refs inside a list would arrive unresolved).
    Returns (edges_table, nodes_array, n_nodes)."""
    edge_subs = subs[:n_edge_subs]
    node_subs = subs[n_edge_subs:]
    et = pa.concat_tables([t for t in edge_subs if t.num_rows])\
        if any(t.num_rows for t in edge_subs) else \
        pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64())})
    s = _np_col(et, "src") if et.num_rows else np.array([], np.int64)
    if s.size:
        uniq, inv, cnt = np.unique(s, return_inverse=True,
                                   return_counts=True)
        outdeg = cnt[inv]
    else:
        outdeg = np.array([], dtype=np.int64)
    nodes = (np.unique(np.concatenate([a.to_numpy() for a in node_subs]))
             if node_subs else np.array([], dtype=np.int64))
    et = pa.table({"src": pa.array(s),
                   "dst": pa.array(_np_col(et, "dst") if et.num_rows
                                   else np.array([], np.int64)),
                   "outdeg": pa.array(outdeg)})
    return et, nodes, int(nodes.size)


def _pr_contrib(edges: pa.Table, nodes: np.ndarray, ranks: np.ndarray,
                P: int):
    """One iteration, map half for one partition: contribution
    ``r[src] // outdeg`` per edge, combined by dst locally, bucketed
    by hash(dst) → P (dst, c) sub-tables."""
    empty = pa.table({"dst": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.int64())})
    if edges.num_rows == 0:
        return tuple([empty] * P)
    src = _np_col(edges, "src")
    dst = _np_col(edges, "dst")
    outdeg = _np_col(edges, "outdeg")
    r_src = ranks[np.searchsorted(nodes, src)]
    c = r_src // outdeg
    du, inv = np.unique(dst, return_inverse=True)
    cs = np.zeros(len(du), dtype=np.int64)
    np.add.at(cs, inv, c)
    dp = _hash_part(du, P)
    return tuple(
        pa.table({"dst": pa.array(du[dp == p]),
                  "c": pa.array(cs[dp == p])}) for p in range(P))


def _pr_update(nodes: np.ndarray, base: int, *contrib_subs):
    """One iteration, reduce half for one partition: sum inbound
    contributions per node, apply base + (85·s)//100.  Flat *args for
    the same top-level-ref-resolution reason as ``_pr_build``."""
    s = np.zeros(nodes.size, dtype=np.int64)
    for t in contrib_subs:
        if t.num_rows:
            np.add.at(s, np.searchsorted(nodes, _np_col(t, "dst")),
                      _np_col(t, "c"))
    return base + (85 * s) // 100


def pagerank(edges, iters: int = 5, col_src: str = "src",
             col_dst: str = "dst", num_partitions: int = 16):
    """Fixed-iteration PageRank over an edge Dataset, returning a
    Dataset ``(node, rank_n9, rank)`` for every node in src ∪ dst.

    Exact-integer contract (mirrored literally by the unrolled SQL
    oracle ``pipelines.queries.SQL_PAGERANK_DOCS``, so results
    hash-match across engines with ZERO float-reassociation risk):

    * ranks live in int64 "nanos"; ``r0 = 10^9 // n``
    * per-edge contribution = ``r[src] // outdeg[src]`` (floor div)
    * ``r' = (150_000_000 // n) + (85 · Σ contrib) // 100``
      (damping 0.85 as the 85/100 integer ratio; dangling mass is
      dropped — documented variant)

    Execution is the justified raw-Ray escape this module's docstring
    reserves for iteration state the Dataset API cannot co-partition:
    a Dataset ``groupby`` costs a fixed ~2 s exchange and PageRank
    needs 2·iters of them (measured 55 s for 5 iterations at toy
    scale).  Instead the edge list is hash-scattered by src ONCE into
    ``P`` object-store partitions (outdeg local to each), node lists
    by hash(node), and each iteration is 2·P small tasks passing
    O(P²) *refs* through the driver — the Pregel/SpMV shape.  Data
    never leaves the object store; driver traffic is refs and per-
    partition counts only.  At cluster scale P scales with cores and
    each partition is one task's working set.
    """
    import ray
    import ray.data

    P = num_partitions
    scatter = ray.remote(num_returns=2 * P)(_pr_scatter)
    build = ray.remote(num_returns=3)(_pr_build)
    contrib = ray.remote(num_returns=P)(_pr_contrib)
    update = ray.remote(_pr_update)

    blocks = (edges.select_columns([col_src, col_dst])
              .map_batches(lambda b: b, batch_format="pyarrow")
              .materialize())
    block_refs = []
    for bundle in blocks.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    if not block_refs:
        return ray.data.from_arrow(_RANK_SCHEMA.empty_table())

    scat = [scatter.remote(br, P, col_src, col_dst)
            for br in block_refs]  # each: 2P refs

    # tree fan-in: a build task must not take one argument per input
    # block (breaks around 1e5 blocks); pre-concat edge/node subs in
    # groups of ≤ PR_FANIN until one group remains per partition
    def _concat_pair(k, *subs):
        et = [t for t in subs[:k] if t.num_rows]
        nv = [a for a in subs[k:]]
        e = (pa.concat_tables(et) if et else
             pa.table({"src": pa.array([], type=pa.int64()),
                       "dst": pa.array([], type=pa.int64())}))
        nodes = (np.unique(np.concatenate(
            [a.to_numpy(zero_copy_only=False) for a in nv])) if nv
            else np.array([], dtype=np.int64))
        return e, pa.array(nodes)

    concat_pair = ray.remote(num_returns=2)(_concat_pair)

    edge_refs, node_refs, counts = [], [], []
    for p in range(P):
        es = [s[p] for s in scat]
        ns = [s[P + p] for s in scat]
        while len(es) > PR_FANIN:
            nes, nns = [], []
            for lo in range(0, len(es), PR_FANIN):
                e, nv = concat_pair.remote(
                    len(es[lo:lo + PR_FANIN]),
                    *es[lo:lo + PR_FANIN], *ns[lo:lo + PR_FANIN])
                nes.append(e)
                nns.append(nv)
            es, ns = nes, nns
        e, nv, c = build.remote(len(es), *es, *ns)
        edge_refs.append(e)
        node_refs.append(nv)
        counts.append(c)
    n = sum(ray.get(counts))
    if n == 0:
        return ray.data.from_arrow(_RANK_SCHEMA.empty_table())
    r0 = 1_000_000_000 // n
    base = 150_000_000 // n

    init = ray.remote(lambda nv: np.full(nv.size, r0, dtype=np.int64))
    rank_refs = [init.remote(nv) for nv in node_refs]

    for _ in range(iters):
        cref = [contrib.remote(edge_refs[p], node_refs[p], rank_refs[p],
                               P) for p in range(P)]
        rank_refs = [update.remote(node_refs[p], base,
                                   *[cref[q][p] for q in range(P)])
                     for p in range(P)]

    finish = ray.remote(
        lambda nv, r: pa.table({"node": pa.array(nv),
                                "rank_n9": pa.array(r),
                                "rank": pa.array(r / 1e9)}))
    out_refs = [finish.remote(node_refs[p], rank_refs[p])
                for p in range(P)]
    return ray.data.from_arrow_refs(out_refs)


# ---------------------------------------------------- triangle counting


class WedgeDegreeError(ValueError):
    """An oriented vertex exceeded ``max_wedge_degree`` — the wedge
    fan-out C(d,2) for that vertex would dominate the job (the "curse
    of the last reducer").  Raise loudly rather than silently explode;
    callers raise the cap or pre-filter hub vertices."""


TRIANGLES_LOCAL_MAX = 2_000_000  # edges; ~32 MB of int64 pairs


def _triangles_local(max_wedge_degree: int, *blocks) -> int:
    """Whole-graph triangle count in ONE task over the normalized
    distinct edge blocks — the small-graph fast path (a Dataset
    exchange costs ~2 s of fixed machinery; six of them dominate any
    graph whose edges fit one worker).  Same algorithm, same guard."""
    tabs = [b for b in blocks if b.num_rows]
    if not tabs:
        return 0
    t = pa.concat_tables(tabs)
    lo = _np_col(t, "lo")
    hi = _np_col(t, "hi")
    nodes, inv = np.unique(np.concatenate([lo, hi]),
                           return_inverse=True)
    a, b = inv[: len(lo)], inv[len(lo):]
    deg = np.bincount(np.concatenate([a, b]), minlength=len(nodes))
    # orient low-(deg, id)-rank -> high
    a_first = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
    src = np.where(a_first, a, b)
    dst = np.where(a_first, b, a)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    newrun = np.r_[True, src[1:] != src[:-1]]
    starts = np.flatnonzero(newrun)
    lens = np.diff(np.r_[starts, len(src)])
    if lens.max(initial=0) > max_wedge_degree:
        v = nodes[src[starts[int(np.argmax(lens))]]]
        raise WedgeDegreeError(
            f"vertex {v} has oriented degree {int(lens.max())} > "
            f"max_wedge_degree={max_wedge_degree}")
    # edge membership set over (min-id, max-id) pairs
    elo = np.minimum(a, b)
    ehi = np.maximum(a, b)
    ek = np.empty(len(elo), dtype=[("a", "<i8"), ("b", "<i8")])
    ek["a"], ek["b"] = elo, ehi
    ek.sort()
    total = 0
    for st, ln in zip(starts[lens >= 2], lens[lens >= 2]):
        ia, ib = np.triu_indices(int(ln), k=1)
        seg = dst[st:st + ln]
        wk = np.empty(len(ia), dtype=[("a", "<i8"), ("b", "<i8")])
        wk["a"], wk["b"] = seg[ia], seg[ib]
        pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
        total += int((ek[pos] == wk).sum())
    return total


def count_triangles(edges, col_a: str = "id_a", col_b: str = "id_b",
                    num_partitions: int = 16,
                    max_wedge_degree: int = 20_000,
                    max_wedges_per_partition: int = 50_000_000,
                    local_max_edges: int | None = None) -> int:
    """Exact triangle count of the undirected simple graph in
    ``edges`` — degree-ordered wedge generation (Suri & Vassilvitskii,
    "Counting triangles and the curse of the last reducer", WWW 2011).

    Every triangle has exactly ONE vertex of minimal (degree, id) rank
    among its three, so emitting wedges only at each edge's lower-rank
    endpoint counts each triangle exactly once, and per-vertex wedge
    fan-out is bounded by O(sqrt(m)) oriented degree on real
    (power-law) graphs instead of the raw hub degree.

    Scale shape: six int-keyed exchanges, nothing wider —
    normalize-distinct (pair key), degree count (node key), two
    degree-attach rounds (lo key, hi key), wedge generation (src key),
    wedge closing (pair key).  All per-partition work is vectorized
    (lexsort + run-boundary scans + ``np.triu_indices`` per source
    run); the only driver value is the final scalar sum.  Orientation
    affects cost, never the count — the DuckDB oracle uses plain
    ``u < v`` joins and must agree exactly.
    """
    import pyarrow.compute as pc

    P = num_partitions

    # ---- 1. normalize to distinct undirected (lo, hi), drop loops
    def norm(batch: pa.Table) -> pa.Table:
        a = _np_col(batch, col_a)
        b = _np_col(batch, col_b)
        keep = a != b
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        part = ((_mix64(lo) ^ _mix64(hi + np.uint64(0x517C))) %
                np.uint64(P)).astype(np.int32)
        t = pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                      "__part": pa.array(part)})
        # batch-local pre-distinct shrinks the exchange
        return t.group_by(["lo", "hi", "__part"],
                          use_threads=False).aggregate([])

    def part_distinct(g: pa.Table) -> pa.Table:
        return g.select(["lo", "hi"]).group_by(
            ["lo", "hi"], use_threads=False).aggregate([])

    e = (edges.map_batches(norm, batch_format="pyarrow")
         .groupby("__part")
         .map_groups(lambda g: part_distinct(g), batch_format="pyarrow")
         ).materialize()  # consumed three times below (degrees, attach, close)

    # small-graph fast path: below the guard the whole count runs in
    # ONE bounded task over the normalized blocks (six Dataset
    # exchanges of fixed ~2 s machinery would otherwise dominate);
    # the distributed path is forced + equality-tested in tests
    cap = (TRIANGLES_LOCAL_MAX if local_max_edges is None
           else local_max_edges)
    if e.count() <= cap:
        import ray

        refs = [r for bundle in e.iter_internal_ref_bundles()
                for r in bundle.block_refs]
        return int(ray.get(ray.remote(_triangles_local).remote(
            max_wedge_degree, *refs)))

    # ---- 2. degrees: per-batch partial counts -> node-keyed exchange
    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([_np_col(batch, "lo"),
                                _np_col(batch, "hi")])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({
            "node": pa.array(uniq),
            "c": pa.array(cnt.astype(np.int64)),
            "__part": pa.array(_hash_part(uniq, P))})

    def deg_sum(g: pa.Table) -> pa.Table:
        agg = g.select(["node", "c"]).group_by(
            ["node"], use_threads=False).aggregate([("c", "sum")])
        return agg.rename_columns(["node", "deg"])

    degrees = (e.map_batches(deg_partial, batch_format="pyarrow")
               .groupby("__part")
               .map_groups(deg_sum, batch_format="pyarrow")
               ).materialize()  # joined twice

    # ---- 3. attach deg to both endpoints (two tagged-union rounds)
    def attach_round(ds_edges, key: str, out_name: str):
        def tag_e(batch: pa.Table) -> pa.Table:
            cols = {n: batch[n] for n in batch.column_names}
            cols["node"] = batch[key]
            cols["deg"] = pa.array(
                np.full(batch.num_rows, -1, dtype=np.int64))
            t = pa.table(cols)
            return t.append_column(
                "__part", pa.array(_hash_part(_np_col(t, "node"), P)))

        def tag_d(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"lo": pa.array(np.full(n, -1, dtype=np.int64)),
                    "hi": pa.array(np.full(n, -1, dtype=np.int64))}
            if out_name == "deg_hi":
                cols["deg_lo"] = pa.array(
                    np.full(n, -1, dtype=np.int64))
            cols["node"] = batch["node"]
            cols["deg"] = batch["deg"]
            t = pa.table(cols)
            return t.append_column(
                "__part", pa.array(_hash_part(_np_col(t, "node"), P)))

        def join(g: pa.Table) -> pa.Table:
            is_deg = _np_col(g, "deg") >= 0
            d_node = _np_col(g, "node")[is_deg]
            d_val = _np_col(g, "deg")[is_deg]
            order = np.argsort(d_node, kind="stable")
            d_node, d_val = d_node[order], d_val[order]
            rows = g.filter(pa.array(~is_deg))
            e_node = _np_col(rows, "node")
            pos = np.searchsorted(d_node, e_node)
            pos = np.minimum(pos, max(len(d_node) - 1, 0))
            val = (d_val[pos] if len(d_node)
                   else np.zeros(len(e_node), dtype=np.int64))
            out = {n: rows[n] for n in rows.column_names
                   if n not in ("node", "deg", "__part")}
            out[out_name] = pa.array(val)
            return pa.table(out)

        tagged = ds_edges.map_batches(tag_e, batch_format="pyarrow") \
            .union(degrees.map_batches(tag_d, batch_format="pyarrow"))
        return tagged.groupby("__part").map_groups(
            join, batch_format="pyarrow")

    e1 = attach_round(e, "lo", "deg_lo")
    e2 = attach_round(e1, "hi", "deg_hi")

    # ---- 4. orient by (deg, id) rank; wedge generation per source
    def orient(batch: pa.Table) -> pa.Table:
        lo = _np_col(batch, "lo")
        hi = _np_col(batch, "hi")
        dlo = _np_col(batch, "deg_lo")
        dhi = _np_col(batch, "deg_hi")
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        return pa.table({
            "src": pa.array(src), "dst": pa.array(dst),
            "__part": pa.array(_hash_part(src, P))})

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table({"n1": pa.array([], pa.int64()),
                          "n2": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        src = _np_col(g, "src")
        dst = _np_col(g, "dst")
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        newrun = np.r_[True, src[1:] != src[:-1]]
        starts = np.flatnonzero(newrun)
        lens = np.diff(np.r_[starts, len(src)])
        if lens.max(initial=0) > max_wedge_degree:
            v = src[starts[int(np.argmax(lens))]]
            raise WedgeDegreeError(
                f"vertex {v} has oriented degree {int(lens.max())} > "
                f"max_wedge_degree={max_wedge_degree}")
        # volume guard: many sub-cap vertices in one partition can
        # still sum to an OOM — bound total pairs, loudly
        total_pairs = int((lens.astype(np.int64)
                           * (lens.astype(np.int64) - 1) // 2).sum())
        if total_pairs > max_wedges_per_partition:
            raise WedgeDegreeError(
                f"partition would emit {total_pairs} wedges > "
                f"max_wedges_per_partition={max_wedges_per_partition};"
                " raise num_partitions or the cap")
        o1, o2 = [], []
        for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
            ia, ib = np.triu_indices(int(ln), k=1)
            seg = dst[s:s + ln]  # sorted by id -> pairs canonical
            o1.append(seg[ia])
            o2.append(seg[ib])
        if not o1:
            return empty
        return pa.table({"n1": pa.array(np.concatenate(o1)),
                         "n2": pa.array(np.concatenate(o2))})

    w = (e2.map_batches(orient, batch_format="pyarrow")
         .groupby("__part")
         .map_groups(lambda g: wedges(g.drop_columns(["__part"])),
                     batch_format="pyarrow"))

    # ---- 5. close wedges against the edge set (pair-keyed exchange)
    def tag_pair(kind: int):
        def fn(batch: pa.Table) -> pa.Table:
            a = _np_col(batch, "n1" if kind else "lo")
            b = _np_col(batch, "n2" if kind else "hi")
            part = ((_mix64(a) ^ _mix64(b + np.uint64(0x517C))) %
                    np.uint64(P)).astype(np.int32)
            return pa.table({
                "a": pa.array(a), "b": pa.array(b),
                "kind": pa.array(np.full(len(a), kind, dtype=np.int8)),
                "__part": pa.array(part)})

        return fn

    def close(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"t": pa.array([], pa.int64())})
        kind = g["kind"].to_numpy(zero_copy_only=False)
        a = _np_col(g, "a")
        b = _np_col(g, "b")
        ek = np.empty(int((kind == 0).sum()),
                      dtype=[("a", "<i8"), ("b", "<i8")])
        ek["a"], ek["b"] = a[kind == 0], b[kind == 0]
        ek.sort()
        wk = np.empty(int((kind == 1).sum()),
                      dtype=[("a", "<i8"), ("b", "<i8")])
        wk["a"], wk["b"] = a[kind == 1], b[kind == 1]
        if len(ek) == 0 or len(wk) == 0:
            return pa.table({"t": pa.array([0], pa.int64())})
        pos = np.searchsorted(ek, wk)
        pos = np.minimum(pos, len(ek) - 1)
        hits = int((ek[pos] == wk).sum())
        return pa.table({"t": pa.array([hits], pa.int64())})

    closed = (w.map_batches(tag_pair(1), batch_format="pyarrow")
              .union(e.map_batches(tag_pair(0), batch_format="pyarrow"))
              .groupby("__part")
              .map_groups(lambda g: close(g.drop_columns(["__part"])),
                          batch_format="pyarrow"))
    total = closed.sum("t")
    return int(total if total is not None else 0)
