"""Quality-aware near-duplicate collapse: keep the BEST member of
every duplicate cluster, not an arbitrary one.

Published recipe shape (RefinedWeb, Dolma, and the SemDeDup family all
do a variant): near-dup pair detection → connected components over the
pair graph (Kiveris et al., the engine's ``ops/graph``) → per-component
representative selection by a quality score (length, LM score,
classifier logit) with a deterministic tie-break (best score, then
smallest id) → drop the rest.  ``ops/cluster.semdedup`` keeps the
min-id member; this operator generalizes the winner rule to any score
column, which is what a production curation pipeline actually wants
(keep the cleanest copy, drop the mirror spam).

Scale shape (nothing here ships text or vectors):

* components: groupby-only O(log n) rounds (``connected_components``);
* label⋈score meet: ONE id-keyed exchange carrying only the labeled
  (i.e. duplicated) subset's ``(id, component)`` rows plus the corpus'
  ``(id, score)`` int/float rows;
* winner selection: ONE component-keyed exchange of the labeled subset
  — per-partition ``np.lexsort`` + run-boundary scan picks every
  component's winner vectorized (no per-key ``map_groups``);
* keep verdict: the reduce-side anti-join of ``ops/cluster.semdedup``
  — drop rows and corpus rows co-partition on the id; ``keep`` =
  no drop row landed beside me.  No driver materialization, no
  broadcast-size guard needed anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.canonicalize import hash_mod

KEEPBEST_BCAST_MAX = 5_000_000  # pair-graph nodes worth broadcasting

# tagged-union kind codes
_K_SCORE = 0   # corpus row: (id, score)
_K_LABEL = 1   # component label: (id, comp)
_K_DROP = 2    # resolved drop verdict: (id,)


def _meet_labels(g: pa.Table) -> pa.Table:
    """One id-partition of the tagged union → ``(comp, id, score)``
    for every labeled id (labels without a matching corpus row are
    dropped — a pair referencing an unknown id must not crash the
    job)."""
    out_schema = pa.schema([("comp", pa.int64()), ("id", pa.int64()),
                            ("score", pa.float64())])
    if g.num_rows == 0:
        return out_schema.empty_table()
    kind = g["kind"].to_numpy(zero_copy_only=False)
    ids = g["id"].to_numpy(zero_copy_only=False)
    score = g["score"].to_numpy(zero_copy_only=False)
    comp = g["comp"].to_numpy(zero_copy_only=False)

    s_ids = ids[kind == _K_SCORE]
    s_val = score[kind == _K_SCORE]
    order = np.argsort(s_ids, kind="stable")
    s_ids, s_val = s_ids[order], s_val[order]

    l_ids = ids[kind == _K_LABEL]
    l_comp = comp[kind == _K_LABEL]
    if len(l_ids) == 0 or len(s_ids) == 0:
        return out_schema.empty_table()
    pos = np.searchsorted(s_ids, l_ids)
    pos_c = np.minimum(pos, len(s_ids) - 1)
    hit = s_ids[pos_c] == l_ids
    return pa.table({
        "comp": pa.array(l_comp[hit], pa.int64()),
        "id": pa.array(l_ids[hit], pa.int64()),
        "score": pa.array(s_val[pos_c[hit]], pa.float64()),
    })


def _pick_drops(g: pa.Table, higher_better: bool) -> pa.Table:
    """One component-partition of ``(comp, id, score)`` → the NON-
    winner member ids, vectorized over all components in the partition
    (lexsort to (comp, best-score-first, id); run boundaries mark each
    component's winner)."""
    if g.num_rows == 0:
        return pa.schema([("id", pa.int64())]).empty_table()
    comp = g["comp"].to_numpy(zero_copy_only=False)
    ids = g["id"].to_numpy(zero_copy_only=False)
    score = g["score"].to_numpy(zero_copy_only=False)
    skey = -score if higher_better else score
    order = np.lexsort((ids, skey, comp))
    comp_s, ids_s = comp[order], ids[order]
    is_winner = np.empty(len(comp_s), dtype=bool)
    is_winner[0] = True
    is_winner[1:] = comp_s[1:] != comp_s[:-1]
    return pa.table({"id": pa.array(ids_s[~is_winner], pa.int64())})


def keep_best(ds, pairs, *, id_col: str = "doc_id",
              score_col: str = "score", higher_better: bool = True,
              col_a: str = "id_a", col_b: str = "id_b",
              num_partitions: int = 16,
              bcast_max_nodes: int | None = None):
    """Collapse the duplicate-pair graph ``pairs`` over corpus ``ds``
    to one representative per connected component — the member with
    the best ``score_col`` (tie: smallest id).  Unpaired rows keep.

    Returns a Dataset ``(id_col, score_col, keep: bool)``; callers
    filter ``keep`` and (if they need payloads) semijoin back to the
    corpus — ids and scores are the only columns that ever cross an
    exchange here.

    When the pair graph's node set fits ``bcast_max_nodes`` (default
    ``KEEPBEST_BCAST_MAX``), the label→score meet and winner selection
    run driver-side over the (small) labeled subset gathered by a
    map-side-filtered scan, and the verdict is one broadcast-drop-set
    scan — removing all three id/component exchanges (each is ~2 s of
    fixed Dataset machinery regardless of data size).  Above the cap
    the fully-distributed reduce-side path runs; both are
    equality-tested."""
    import ray

    from .graph import connected_components

    comp = connected_components(pairs, col_a, col_b,
                                num_partitions=num_partitions)

    cap = (KEEPBEST_BCAST_MAX if bcast_max_nodes is None
           else bcast_max_nodes)
    comp = comp.materialize()
    n_nodes = comp.count()
    if n_nodes <= cap:
        node_t = []
        for b in comp.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
            if b.num_rows:
                node_t.append(b)
        if not node_t:
            # no edges: every row keeps
            def all_keep(batch: pa.Table) -> pa.Table:
                return pa.table({
                    id_col: batch[id_col].cast(pa.int64()),
                    score_col: batch[score_col].cast(pa.float64()),
                    "keep": pa.array(
                        np.ones(batch.num_rows, dtype=bool))})

            return ds.map_batches(all_keep, batch_format="pyarrow")
        ct = pa.concat_tables(node_t)
        node = ct["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        compid = ct["component"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(node, kind="stable")
        node_s, comp_s = node[order], compid[order]
        member_ref = ray.put(node_s)

        def gather_scores(batch: pa.Table) -> pa.Table:
            members = ray.get(member_ref)
            ids = batch[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos = np.minimum(np.searchsorted(members, ids),
                             len(members) - 1)
            hit = members[pos] == ids
            t = batch.filter(pa.array(hit))
            return pa.table({
                "id": t[id_col].cast(pa.int64()),
                "score": t[score_col].cast(pa.float64())})

        sc_t = []
        for b in (ds.map_batches(gather_scores, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow",
                                batch_size=None)):
            if b.num_rows:
                sc_t.append(b)
        if sc_t:
            st = pa.concat_tables(sc_t)
            sid = st["id"].to_numpy(zero_copy_only=False)
            sval = st["score"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(node_s, sid),
                             len(node_s) - 1)
            hit = node_s[pos] == sid
            labeled = pa.table({
                "comp": pa.array(comp_s[pos[hit]], pa.int64()),
                "id": pa.array(sid[hit], pa.int64()),
                "score": pa.array(sval[hit], pa.float64())})
            drops = _pick_drops(labeled, higher_better)
            drop_arr = np.sort(
                drops["id"].to_numpy(zero_copy_only=False))
        else:
            drop_arr = np.empty(0, dtype=np.int64)
        drop_ref = ray.put(drop_arr)

        def verdict(batch: pa.Table) -> pa.Table:
            dropped = ray.get(drop_ref)
            ids = batch[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            if len(dropped):
                pos = np.minimum(np.searchsorted(dropped, ids),
                                 len(dropped) - 1)
                keep = dropped[pos] != ids
            else:
                keep = np.ones(len(ids), dtype=bool)
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                score_col: batch[score_col].cast(pa.float64()),
                "keep": pa.array(keep)})

        return ds.map_batches(verdict, batch_format="pyarrow")

    def tag_scores(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "id": batch[id_col].cast(pa.int64()),
            "score": batch[score_col].cast(pa.float64()),
            "comp": pa.array(np.zeros(n, dtype=np.int64)),
            "kind": pa.array(np.full(n, _K_SCORE, dtype=np.int8)),
        })

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "id": batch["node"].cast(pa.int64()),
            "score": pa.array(np.zeros(n, dtype=np.float64)),
            "comp": batch["component"].cast(pa.int64()),
            "kind": pa.array(np.full(n, _K_LABEL, dtype=np.int8)),
        })

    scores = ds.map_batches(tag_scores, batch_format="pyarrow")
    tagged = scores.union(
        comp.map_batches(tag_labels, batch_format="pyarrow"))
    tagged = tagged.add_column(
        "part", lambda b: hash_mod(b["id"], num_partitions),
        batch_format="pyarrow")
    labeled = (
        tagged.groupby("part")
        .map_groups(lambda g: _meet_labels(g.drop_columns(["part"])),
                    batch_format="pyarrow"))

    labeled = labeled.add_column(
        "part", lambda b: hash_mod(b["comp"], num_partitions),
        batch_format="pyarrow")
    drops = (
        labeled.groupby("part")
        .map_groups(
            lambda g: _pick_drops(g.drop_columns(["part"]),
                                  higher_better),
            batch_format="pyarrow"))

    # final reduce-side anti-join (the semdedup verdict shape)
    def tag_drop(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "id": batch["id"],
            "score": pa.array(np.zeros(n, dtype=np.float64)),
            "kind": pa.array(np.full(n, _K_DROP, dtype=np.int8)),
        })

    verdict_in = scores.drop_columns(["comp"]).union(
        drops.map_batches(tag_drop, batch_format="pyarrow"))
    verdict_in = verdict_in.add_column(
        "part", lambda b: hash_mod(b["id"], num_partitions),
        batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        out_schema = pa.schema([(id_col, pa.int64()),
                                (score_col, pa.float64()),
                                ("keep", pa.bool_())])
        if g.num_rows == 0:
            return out_schema.empty_table()
        kind = g["kind"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        score = g["score"].to_numpy(zero_copy_only=False)
        dropped = np.unique(ids[kind == _K_DROP])
        rows = kind == _K_SCORE
        rid = ids[rows]
        if len(dropped):
            pos = np.minimum(np.searchsorted(dropped, rid),
                             len(dropped) - 1)
            keep = dropped[pos] != rid
        else:
            keep = np.ones(len(rid), dtype=bool)
        return pa.table({
            id_col: pa.array(rid, pa.int64()),
            score_col: pa.array(score[rows], pa.float64()),
            "keep": pa.array(keep),
        })

    return (
        verdict_in.groupby("part")
        .map_groups(lambda g: resolve(g.drop_columns(["part"])),
                    batch_format="pyarrow"))
