"""Distributed k-means and SemDeDup-style semantic deduplication over
an embedding column (``list<float>``).

Algorithms (public literature): Lloyd's algorithm (Lloyd, IEEE Trans.
Inf. Theory 1982); semantic dedup via within-cluster cosine pruning
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023).

Scale shape
-----------
* **k-means** is the classic partial-sums reduction: each
  ``map_batches`` task assigns its batch to the broadcast centroids
  (one GEMM) and emits ONE partial row — flattened ``k×d`` sums +
  ``k`` counts + SSE.  Partials are merged in a deterministic
  two-level reduce (mod-partition on the batch's min row id →
  per-partition sorted sum → tiny driver sum over ``R`` rows), so the
  driver never sees more than ``reduce_partitions`` rows and two runs
  add floats in the same order (bitwise-reproducible centroids).
  The exchange per iteration is ``num_blocks`` rows of ``k×d``
  doubles — never the corpus.
* **SemDeDup** = assign (broadcast scan) → per-cluster cosine pair
  emission (keyed exchange on the cluster id; tiled GEMM so memory
  stays bounded while work remains the paper's inherent O(m²) within
  a cluster — ``k`` is the knob that bounds m) → distributed
  connected components (:func:`cow_ray.ops.graph.connected_components`)
  → a hash-partitioned anti-join that drops every non-root member.
  No driver materialization anywhere: the drop set meets the corpus
  reduce-side on one id-keyed exchange.

At 10^12 rows you would train centroids on a sample
(:func:`cow_ray.ops.similarity.train_centroids`) and run ONE
assignment pass; full-pass Lloyd's here caches the projected
``(id, vec)`` columns once (object store, spillable) so the ``iters``
passes re-read Arrow blocks, not parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _as_matrix, _norm_rows

_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _dist2_assign(m: np.ndarray, cent: np.ndarray):
    """Squared-Euclidean assignment via ||x||² − 2x·c + ||c||²;
    one GEMM per batch, argmin ties broken toward the lower centroid
    id (numpy argmin semantics — deterministic)."""
    d2 = (
        (m * m).sum(axis=1, keepdims=True)
        - 2.0 * (m @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    a = d2.argmin(axis=1)
    return a, np.maximum(d2[np.arange(len(a)), a], 0.0)


def _init_centroids(ds, k: int, seed: int, sample_size: int,
                    id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic seeded init from a bounded driver-side sample
    (the IVF contract, similarity.py:366): sample rows are sorted by
    id so the draw is independent of block arrival order."""
    rows = ds.limit(sample_size).take_all()
    if not rows:
        raise ValueError("kmeans: empty input dataset")
    rows.sort(key=lambda r: r[id_col])
    x = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(x), size=min(k, len(x)), replace=False)
    return x[pick].copy()


DRIVER_PARTIALS_MAX = 64 << 20  # bytes of per-block partials


def kmeans(ds, k: int = 8, iters: int = 10, seed: int = 13,
           sample_size: int = 2048, id_col: str = "vec_id",
           vec_col: str = "embedding", reduce_partitions: int = 16,
           cache: bool = True):
    """Full-data Lloyd's: returns ``(centroids (k,d) float64,
    inertia_history list[float])``.  Deterministic for a fixed input
    (seeded init + ordered float reduction).  Empty clusters keep
    their previous centroid.

    Partial merge has two paths, both deterministic (partials sorted
    by batch key before summing): when ``num_blocks × k×d`` partial
    bytes fit ``DRIVER_PARTIALS_MAX`` (64 MB) the driver sums them
    directly — a Dataset ``groupby`` costs a fixed ~2 s exchange and
    SIX of them made the toy-scale query 21 s; above the guard the
    two-level mod-partition reduce keeps the driver pull at
    ``reduce_partitions`` rows."""
    import ray

    proj = ds.select_columns([id_col, vec_col])
    if cache:
        proj = proj.materialize()
    cent = _init_centroids(proj, k, seed, sample_size, id_col, vec_col)
    k_eff, dim = cent.shape
    per_block = k_eff * dim * 8 + k_eff * 8 + 32
    driver_ok = (cache
                 and proj.num_blocks() * per_block <= DRIVER_PARTIALS_MAX)
    history: list[float] = []

    block_refs: list = []
    if driver_ok:
        # raw-task iteration over the materialized block refs (the
        # graph.pagerank escape): per-iteration Dataset execution
        # costs a fixed ~1 s even on tiny cached inputs, and Lloyd's
        # pays it ``iters`` times; a plain task per block costs ms.
        # Refs passed at top level are auto-resolved by Ray.
        for bundle in proj.iter_internal_ref_bundles():
            block_refs.extend(bundle.block_refs)

        def _block_partial(block: pa.Table, c: np.ndarray):
            if block.num_rows == 0:
                return None
            m = _as_matrix(block[vec_col])
            ids = block[id_col].to_numpy(zero_copy_only=False)
            a, d2 = _dist2_assign(m, c)
            sums = np.zeros((k_eff, dim), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k_eff).astype(np.int64)
            return (int(ids.min()), sums, counts, float(d2.sum()))

        partial_task = ray.remote(_block_partial)

    def partials_of(handle):
        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"key": pa.array([], type=pa.int64()),
                     "sums": pa.array([], type=pa.list_(pa.float64())),
                     "counts": pa.array([], type=pa.list_(pa.int64())),
                     "sse": pa.array([], type=pa.float64())}
                )
            c = ray.get(handle)
            m = _as_matrix(batch[vec_col])
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            a, d2 = _dist2_assign(m, c)
            sums = np.zeros((k_eff, dim), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k_eff).astype(np.int64)
            return pa.table(
                {"key": pa.array([int(ids.min())], type=pa.int64()),
                 "sums": pa.array([sums.ravel()],
                                  type=pa.list_(pa.float64())),
                 "counts": pa.array([counts], type=pa.list_(pa.int64())),
                 "sse": pa.array([float(d2.sum())], type=pa.float64())}
            )

        return partial

    def merge_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        # sorted by the deterministic batch key → stable float order
        g = g.take(pa.compute.sort_indices(g, sort_keys=[("key",
                                                          "ascending")]))
        s = _as_matrix(g["sums"]).sum(axis=0)
        n = _as_matrix(g["counts"]).sum(axis=0).astype(np.int64)
        e = g["sse"].to_numpy(zero_copy_only=False).sum()
        return pa.table(
            {"key": pa.array([g["key"][0].as_py()], type=pa.int64()),
             "sums": pa.array([s], type=pa.list_(pa.float64())),
             "counts": pa.array([n], type=pa.list_(pa.int64())),
             "sse": pa.array([float(e)], type=pa.float64())}
        )

    for _ in range(iters):
        handle = ray.put(cent)
        if driver_ok:
            got = ray.get([partial_task.remote(br, handle)
                           for br in block_refs])
            rows = [{"key": g[0], "sums": g[1].ravel(), "counts": g[2],
                     "sse": g[3]} for g in got if g is not None]
        else:
            p = proj.map_batches(partials_of(handle),
                                 batch_format="pyarrow")
            p = p.add_column(
                "part",
                lambda b: pa.array(
                    (b["key"].to_numpy(zero_copy_only=False)
                     % reduce_partitions).astype(np.int32)
                ),
                batch_format="pyarrow",
            )
            rows = (
                p.groupby("part")
                .map_groups(
                    lambda g: merge_part(g.drop_columns(["part"])),
                    batch_format="pyarrow")
                .take_all()
            )
        rows.sort(key=lambda r: r["key"])
        sums = np.zeros((k_eff, dim), dtype=np.float64)
        counts = np.zeros(k_eff, dtype=np.int64)
        sse = 0.0
        for r in rows:
            sums += np.asarray(r["sums"], dtype=np.float64).reshape(
                k_eff, dim)
            counts += np.asarray(r["counts"], dtype=np.int64)
            sse += r["sse"]
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / counts[nz, None]
        history.append(float(sse))
    return cent, history


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id",
                  vec_col: str = "embedding", keep_vec: bool = True):
    """Broadcast-scan assignment: appends ``cluster`` (int32) and
    ``dist2`` (float64 squared distance) to every row."""
    import ray

    cent = np.asarray(centroids, dtype=np.float64)
    handle = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "cluster", pa.array([], type=pa.int32())
            ).append_column("dist2", pa.array([], type=pa.float64()))
        c = ray.get(handle)
        a, d2 = _dist2_assign(_as_matrix(batch[vec_col]), c)
        out = batch if keep_vec else batch.drop_columns([vec_col])
        return out.append_column(
            "cluster", pa.array(a.astype(np.int32))
        ).append_column("dist2", pa.array(d2))

    return ds.map_batches(assign, batch_format="pyarrow")


def _cluster_pairs(group: pa.Table, *, id_col: str, vec_col: str,
                   threshold: float, tile: int = 1024) -> pa.Table:
    """All within-cluster pairs with cosine ≥ threshold, ``id_a <
    id_b``.  The GEMM is tiled so peak memory is ``tile × m`` floats
    regardless of cluster size; work stays the paper's inherent O(m²)."""
    if group.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    m = _norm_rows(_as_matrix(group[vec_col])[order])
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    n = len(ids)
    for lo in range(0, n, tile):
        hi = min(lo + tile, n)
        sim = m[lo:hi] @ m[lo:].T  # only j ≥ lo (upper triangle tiles)
        ii, jj = np.nonzero(sim >= threshold)
        jj_abs = jj + lo
        ii_abs = ii + lo
        keep = jj_abs > ii_abs
        out_a.append(ids[ii_abs[keep]])
        out_b.append(ids[jj_abs[keep]])
    a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
    return pa.table({"id_a": pa.array(a, type=pa.int64()),
                     "id_b": pa.array(b, type=pa.int64())})


SEMDEDUP_LOCAL_MAX = 2_000_000  # row cap for the single-task finisher
SEMDEDUP_LOCAL_MAX_BYTES = 512 << 20  # rows × dim × 8 cap — a row cap
# alone ignores embedding width (2M × 768-d float64 ≈ 12 GB in one
# task); the byte bound keeps the finisher's matrix at one task's
# working set


def _semdedup_local(threshold: float, id_col: str, vec_col: str,
                    *blocks):
    """Bounded single-TASK finisher (not a driver pull — same
    contract as graph.connected_components' local solve): per-cluster
    thresholded pairs → vectorized min-label components → min-id
    keep.  Semantics identical to the distributed path."""
    from .graph import _min_labels

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("cluster", pa.int32()),
                            ("keep", pa.bool_())])
    tabs = [b for b in blocks if b.num_rows]
    if not tabs:
        return out_schema.empty_table()
    t = pa.concat_tables(tabs)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    cl = t["cluster"].to_numpy(zero_copy_only=False)
    order = np.argsort(cl, kind="stable")
    scl = cl[order]
    ea, eb = [], []
    for c in np.unique(cl):
        lo, hi = np.searchsorted(scl, [c, c + 1])
        p = _cluster_pairs(t.take(order[lo:hi]), id_col=id_col,
                           vec_col=vec_col, threshold=threshold)
        ea.append(p["id_a"].to_numpy(zero_copy_only=False))
        eb.append(p["id_b"].to_numpy(zero_copy_only=False))
    a = np.concatenate(ea) if ea else np.array([], dtype=np.int64)
    b = np.concatenate(eb) if eb else np.array([], dtype=np.int64)
    keep = np.ones(len(ids), dtype=bool)
    if a.size:
        nodes, labels, converged = _min_labels(a, b, max_passes=64)
        if not converged:
            raise RuntimeError("semdedup local solve did not converge")
        drop = nodes[labels != nodes]
        keep = ~np.isin(ids, drop)
    return pa.table({id_col: pa.array(ids, type=pa.int64()),
                     "cluster": pa.array(cl.astype(np.int32)),
                     "keep": pa.array(keep)})


def semdedup(ds, k: int = 8, threshold: float = 0.95, iters: int = 10,
             seed: int = 13, id_col: str = "vec_id",
             vec_col: str = "embedding", num_partitions: int = 16):
    """SemDeDup: cluster, emit within-cluster cosine-≥-threshold
    pairs, connect, keep the min-id member of every duplicate group.

    Returns a Dataset of ``(id_col, cluster, keep)`` — ``keep=False``
    rows are the semantic duplicates a curation pipeline would drop.
    Fully distributed above ``SEMDEDUP_LOCAL_MAX`` rows: the drop set
    meets the assignment reduce-side on one id-keyed exchange (no
    driver pull, no broadcast guard).  At or below the guard the whole
    pair/component/keep chain runs in ONE bounded Ray task over the
    assigned blocks — two Dataset exchanges of pure fixed cost
    (~5 s) collapse to ~0.2 s, and the row cap keeps the task's
    working set at one batch.
    """
    import ray
    import ray.data

    from .graph import connected_components
    from ..stages.canonicalize import hash_mod

    cent, _ = kmeans(ds, k=k, iters=iters, seed=seed, id_col=id_col,
                     vec_col=vec_col)
    assigned = kmeans_assign(ds, cent, id_col=id_col, vec_col=vec_col
                             ).materialize()  # consumed twice below

    n_rows = assigned.count()
    dim = cent.shape[1]
    if (n_rows <= SEMDEDUP_LOCAL_MAX
            and n_rows * dim * 8 <= SEMDEDUP_LOCAL_MAX_BYTES):
        refs = []
        for bundle in assigned.iter_internal_ref_bundles():
            refs.extend(bundle.block_refs)
        out = ray.remote(_semdedup_local).remote(
            threshold, id_col, vec_col, *refs)
        return ray.data.from_arrow_refs([out])

    pairs = (
        assigned.select_columns([id_col, vec_col, "cluster"])
        .groupby("cluster")
        .map_groups(
            lambda g: _cluster_pairs(
                g, id_col=id_col, vec_col=vec_col, threshold=threshold),
            batch_format="pyarrow",
        )
    )
    comp = connected_components(pairs, num_partitions=num_partitions)

    # reduce-side anti-join: assignment rows (kind=0) ∪ non-root
    # labels (kind=1) partition on the id; keep = "no kind=1 row with
    # my id in my partition"
    def tag_assigned(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"id": batch[id_col],
             "cluster": batch["cluster"],
             "kind": pa.array(
                 np.zeros(batch.num_rows, dtype=np.int8))}
        )

    def tag_drop(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        comp_id = batch["component"].to_numpy(zero_copy_only=False)
        drop = node[node != comp_id]
        return pa.table(
            {"id": pa.array(drop, type=pa.int64()),
             "cluster": pa.array(
                 np.full(len(drop), -1, dtype=np.int32)),
             "kind": pa.array(np.ones(len(drop), dtype=np.int8))}
        )

    tagged = assigned.map_batches(
        tag_assigned, batch_format="pyarrow"
    ).union(comp.map_batches(tag_drop, batch_format="pyarrow"))
    tagged = tagged.add_column(
        "part", lambda b: hash_mod(b["id"], num_partitions),
        batch_format="pyarrow",
    )

    def resolve(g: pa.Table) -> pa.Table:
        out_schema = pa.schema([(id_col, pa.int64()),
                                ("cluster", pa.int32()),
                                ("keep", pa.bool_())])
        if g.num_rows == 0:
            return out_schema.empty_table()
        kind = g["kind"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        dropped = np.unique(ids[kind == 1])
        rows = kind == 0
        rid = ids[rows]
        idx = np.searchsorted(dropped, rid)
        idx[idx == len(dropped)] = max(len(dropped) - 1, 0)
        keep = (dropped[idx] != rid) if len(dropped) else np.ones(
            len(rid), dtype=bool)
        return pa.table(
            {id_col: pa.array(rid, type=pa.int64()),
             "cluster": pa.array(
                 g["cluster"].to_numpy(zero_copy_only=False)[rows],
                 type=pa.int32()),
             "keep": pa.array(keep)})

    return (
        tagged.groupby("part")
        .map_groups(lambda g: resolve(g.drop_columns(["part"])),
                    batch_format="pyarrow")
    )
