"""Distributed k-means + SemDeDup (ops/cluster.py): the distributed
partial-sums Lloyd's must match a single-process numpy reference with
the same init, byte-for-byte across runs; SemDeDup's keep set must
match a brute-force within-cluster oracle."""

import numpy as np
import pyarrow.parquet as pq
import pytest

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(EMB)


@pytest.fixture(scope="module")
def emb_np():
    tbl = pq.read_table(EMB)
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    m = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    labels = np.asarray(tbl["label"].to_pylist())
    return ids, m, labels


def _reference_lloyd(m, cent0, iters):
    """Plain single-process Lloyd's with the same empty-cluster rule."""
    cent = cent0.copy()
    for _ in range(iters):
        d2 = ((m * m).sum(1, keepdims=True) - 2.0 * (m @ cent.T)
              + (cent * cent).sum(1)[None, :])
        a = d2.argmin(axis=1)
        for c in range(len(cent)):
            members = m[a == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


class TestKMeans:
    def test_matches_reference_and_labels(self, emb_ds, emb_np):
        from cow_ray.ops.cluster import (_dist2_assign, _init_centroids,
                                         kmeans, kmeans_assign)

        ids, m, labels = emb_np
        k = len(np.unique(labels))
        cent, hist = kmeans(emb_ds, k=k, iters=8, seed=13)
        assert cent.shape == (k, m.shape[1])
        # SSE history is monotone non-increasing (Lloyd's invariant)
        assert all(b <= a + 1e-6 for a, b in zip(hist, hist[1:]))

        cent0 = _init_centroids(emb_ds, k, 13, 2048, "vec_id",
                                "embedding")
        ref = _reference_lloyd(m, cent0, iters=8)
        # same arithmetic up to float re-association across batches
        assert np.allclose(cent, ref, atol=1e-8)

        # (the synthetic labels carry no geometric structure —
        # within-label cosine ≈ 0 — so no purity claim here; blob
        # recovery is tested separately below)
        a, _ = _dist2_assign(m, cent)
        out = kmeans_assign(emb_ds, cent).take_all()
        got = {r["vec_id"]: r["cluster"] for r in out}
        assert len(got) == len(ids)
        assert all(got[int(i)] == int(c) for i, c in zip(ids, a))

    def test_recovers_separated_blobs(self, ray_session):
        import pyarrow as pa
        import ray.data

        from cow_ray.ops.cluster import _dist2_assign, kmeans

        rng = np.random.default_rng(0)
        centers = rng.normal(size=(4, 16)) * 10.0
        lab = np.repeat(np.arange(4), 100)
        pts = centers[lab] + rng.normal(size=(400, 16))
        ds = ray.data.from_arrow(pa.table(
            {"vec_id": pa.array(np.arange(400), type=pa.int64()),
             "embedding": pa.array(list(pts),
                                   type=pa.list_(pa.float32()))}
        )).repartition(7)
        cent, _ = kmeans(ds, k=4, iters=10, seed=3)
        a, _ = _dist2_assign(pts, cent)
        purity = sum(
            np.unique(lab[a == c], return_counts=True)[1].max()
            for c in np.unique(a))
        assert purity / len(lab) == 1.0

    def test_deterministic_across_runs(self, emb_ds):
        from cow_ray.ops.cluster import kmeans

        c1, h1 = kmeans(emb_ds, k=5, iters=4, seed=7)
        c2, h2 = kmeans(emb_ds, k=5, iters=4, seed=7)
        assert np.array_equal(c1, c2) and h1 == h2


class TestSemDeDup:
    def test_keep_set_matches_bruteforce(self, emb_ds, emb_np):
        from cow_ray.ops.cluster import (_dist2_assign, kmeans,
                                         semdedup)

        # the synthetic embeddings are near-orthogonal (max off-diag
        # cosine 0.479), so exercise the full pipeline at a threshold
        # where real pairs exist; planted true duplicates are covered
        # by test_planted_duplicates_dropped
        ids, m, labels = emb_np
        thr = 0.45
        out = semdedup(emb_ds, k=4, threshold=thr, iters=4,
                       seed=13).take_all()
        got_keep = {r["vec_id"] for r in out if r["keep"]}
        assert len(out) == len(ids)

        # brute-force oracle with the same clustering
        cent, _ = kmeans(emb_ds, k=4, iters=4, seed=13)
        a, _ = _dist2_assign(m, cent)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for c in np.unique(a):
            sel = np.where(a == c)[0]
            sim = mn[sel] @ mn[sel].T
            for i in range(len(sel)):
                for j in range(i + 1, len(sel)):
                    if sim[i, j] >= thr:
                        ra, rb = find(int(ids[sel[i]])), find(
                            int(ids[sel[j]]))
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        want_keep = {i for i in parent if find(i) == i}
        assert got_keep == want_keep
        assert len(want_keep) < len(ids)  # thr chosen so pairs exist

    def test_planted_duplicates_dropped(self, ray_session):
        import pyarrow as pa
        import ray.data

        from cow_ray.ops.cluster import semdedup

        rng = np.random.default_rng(1)
        centers = rng.normal(size=(3, 16)) * 10.0
        lab = np.repeat(np.arange(3), 50)
        pts = centers[lab] + rng.normal(size=(150, 16))
        # plant exact-direction dups: rows 150..159 copy rows 0..9
        # with a tiny perturbation (cos > 0.9999)
        dups = pts[:10] * 1.0001
        allpts = np.vstack([pts, dups])
        ds = ray.data.from_arrow(pa.table(
            {"vec_id": pa.array(np.arange(160), type=pa.int64()),
             "embedding": pa.array(list(allpts),
                                   type=pa.list_(pa.float32()))}
        )).repartition(5)
        out = semdedup(ds, k=3, threshold=0.9999, iters=6,
                       seed=3).take_all()
        kept = {r["vec_id"] for r in out if r["keep"]}
        dropped = {r["vec_id"] for r in out if not r["keep"]}
        assert dropped == set(range(150, 160))  # min-id original kept
        assert set(range(150)) <= kept

    def test_clusters_reported(self, emb_ds):
        from cow_ray.ops.cluster import semdedup

        out = semdedup(emb_ds, k=3, threshold=0.999, iters=3,
                       seed=5).take_all()
        assert {r["cluster"] for r in out} <= set(range(3))


def test_two_level_reduce_path_matches(emb_ds, monkeypatch):
    """Force the guarded two-level partial reduce (the >64MB-partials
    scale path) and check it lands on the same centroids as the
    raw-task driver-sum path (different float association order, so
    allclose rather than bitwise)."""
    import cow_ray.ops.cluster as cluster_mod

    c_fast, h_fast = cluster_mod.kmeans(emb_ds, k=5, iters=4, seed=7)
    monkeypatch.setattr(cluster_mod, "DRIVER_PARTIALS_MAX", 0)
    c_slow, h_slow = cluster_mod.kmeans(emb_ds, k=5, iters=4, seed=7)
    assert np.allclose(c_fast, c_slow, atol=1e-8)
    assert np.allclose(h_fast, h_slow, rtol=1e-10)


def test_semdedup_distributed_path_matches_local(emb_ds, monkeypatch):
    """Force the distributed pair/CC/anti-join path (the above-guard
    scale path) and check it emits exactly the local finisher's
    keep set."""
    import cow_ray.ops.cluster as cluster_mod

    fast = sorted(
        (r["vec_id"], r["keep"]) for r in cluster_mod.semdedup(
            emb_ds, k=4, threshold=0.45, iters=3, seed=13).take_all())
    monkeypatch.setattr(cluster_mod, "SEMDEDUP_LOCAL_MAX", 0)
    slow = sorted(
        (r["vec_id"], r["keep"]) for r in cluster_mod.semdedup(
            emb_ds, k=4, threshold=0.45, iters=3, seed=13).take_all())
    assert fast == slow and any(not k for _, k in fast)
