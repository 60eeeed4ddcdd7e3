"""count_triangles vs brute force (itertools over the adjacency
set); degree-orientation invariance, duplicate/loop/reversed-edge
normalization, and the wedge-degree guard."""

import itertools

import numpy as np
import pyarrow as pa
import pytest


def brute(pairs):
    adj = {}
    edges = set()
    for a, b in pairs:
        if a == b:
            continue
        e = (min(a, b), max(a, b))
        if e in edges:
            continue
        edges.add(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for (u, v) in edges:
        n += len(adj[u] & adj[v] - {u, v})
    # each triangle counted once per edge = 3 times
    assert n % 3 == 0
    return n // 3


def run(pairs, **kw):
    import ray.data

    from cow_ray.ops.graph import count_triangles

    ds = ray.data.from_arrow(pa.table(
        {"id_a": pa.array([a for a, _ in pairs], pa.int64()),
         "id_b": pa.array([b for _, b in pairs], pa.int64())}
    )).repartition(3)
    return count_triangles(ds, num_partitions=4, **kw)


def run_both(pairs, **kw):
    """Local fast path AND forced-distributed path must agree."""
    local = run(pairs, **kw)
    dist = run(pairs, local_max_edges=0, **kw)
    assert local == dist, (local, dist)
    return local


class TestTriangles:
    def test_small_known(self, ray_session):
        # one triangle + a pendant edge
        assert run_both([(1, 2), (2, 3), (3, 1), (3, 4)]) == 1

    def test_k5(self, ray_session):
        pairs = list(itertools.combinations(range(5), 2))
        assert run_both(pairs) == 10  # C(5,3)

    def test_duplicates_loops_reversed(self, ray_session):
        pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 1), (1, 3)]
        assert run(pairs) == 1

    def test_no_triangles(self, ray_session):
        assert run([(1, 2), (3, 4), (5, 6), (2, 3)]) == 0

    def test_random_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(11)
        pairs = [tuple(map(int, rng.integers(0, 60, 2)))
                 for _ in range(400)]
        pairs = [p for p in pairs if p[0] != p[1]]
        assert run_both(pairs) == brute(pairs)

    def test_star_hub(self, ray_session):
        """A hub star (degree 30) with rim edges: degree orientation
        must put wedges on the low-degree rim vertices, so a tiny
        max_wedge_degree still succeeds."""
        pairs = [(0, i) for i in range(1, 31)]
        pairs += [(i, i + 1) for i in range(1, 30)]
        # each rim edge (i, i+1) closes a triangle with the hub
        assert run(pairs, max_wedge_degree=4) == 29

    def test_wedge_guard_raises(self, ray_session):
        from cow_ray.ops.graph import WedgeDegreeError

        # K8: every vertex has degree 7; oriented degree up to 7
        pairs = list(itertools.combinations(range(8), 2))
        with pytest.raises(Exception) as ei:
            run(pairs, max_wedge_degree=2)
        with pytest.raises(Exception):
            run(pairs, max_wedge_degree=2, local_max_edges=0)
        assert "WedgeDegreeError" in str(ei.value) or isinstance(
            ei.value, WedgeDegreeError) or "max_wedge_degree" in str(
            ei.value)
