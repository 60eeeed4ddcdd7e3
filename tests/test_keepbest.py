"""keep_best: quality-aware duplicate-cluster collapse vs a
brute-force union-find + argmax oracle."""

import numpy as np
import pyarrow as pa
import pytest


def oracle_keep(ids, scores, pairs, higher_better=True):
    """Single-process union-find + per-component argmax."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)
    keep = set()
    score = dict(zip(ids, scores))
    for members in comps.values():
        if len(members) == 1:
            keep.add(members[0])
            continue
        key = (lambda m: (-score[m], m)) if higher_better else \
            (lambda m: (score[m], m))
        keep.add(sorted(members, key=key)[0])
    return keep


def run_keep_best(ids, scores, pairs, **kw):
    import ray.data

    from cow_ray.ops.keepbest import keep_best

    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}))
    pr = ray.data.from_arrow(pa.table(
        {"id_a": pa.array([a for a, _ in pairs], pa.int64()),
         "id_b": pa.array([b for _, b in pairs], pa.int64())}))
    out = keep_best(ds, pr, id_col="doc_id", score_col="score",
                    num_partitions=4, **kw)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = t.sort_by("doc_id")
    if "bcast_max_nodes" not in kw:
        # both paths must agree: broadcast (default here) vs the
        # forced fully-distributed reduce-side chain
        dist = run_keep_best(ids, scores, pairs, bcast_max_nodes=0,
                             **kw)
        assert t.to_pylist() == dist.to_pylist()
    return t


class TestKeepBest:
    def test_winner_is_not_min_id(self, ray_session):
        # component {1,2,3}: best score on 3 → 1,2 dropped
        ids = [1, 2, 3, 4]
        scores = [0.1, 0.5, 0.9, 0.2]
        t = run_keep_best(ids, scores, [(1, 2), (2, 3)])
        kept = set(np.array(t["doc_id"])[np.array(t["keep"])].tolist())
        assert kept == {3, 4}
        assert t.num_rows == 4  # verdict covers every input row

    def test_tie_breaks_to_min_id(self, ray_session):
        ids = [10, 11, 12]
        scores = [0.5, 0.5, 0.5]
        t = run_keep_best(ids, scores, [(10, 11), (11, 12)])
        kept = set(np.array(t["doc_id"])[np.array(t["keep"])].tolist())
        assert kept == {10}

    def test_lower_better(self, ray_session):
        ids = [1, 2, 3]
        scores = [5.0, 2.0, 9.0]
        t = run_keep_best(ids, scores, [(1, 2), (2, 3)],
                          higher_better=False)
        kept = set(np.array(t["doc_id"])[np.array(t["keep"])].tolist())
        assert kept == {2}

    def test_pair_to_unknown_id_ignored(self, ray_session):
        ids = [1, 2]
        scores = [1.0, 2.0]
        t = run_keep_best(ids, scores, [(1, 99)])
        kept = set(np.array(t["doc_id"])[np.array(t["keep"])].tolist())
        # 99 has no corpus row; 1 must survive (its "component" has no
        # other scored member)
        assert 2 in kept and 1 in kept

    def test_matches_oracle_random(self, ray_session):
        rng = np.random.default_rng(7)
        n = 200
        ids = list(range(n))
        scores = rng.random(n).round(6).tolist()
        pairs = [tuple(sorted(map(int, rng.integers(0, n, 2))))
                 for _ in range(120)]
        pairs = [p for p in pairs if p[0] != p[1]]
        t = run_keep_best(ids, scores, pairs)
        kept = set(np.array(t["doc_id"])[np.array(t["keep"])].tolist())
        assert kept == oracle_keep(ids, scores, pairs)
