"""Decontamination operator: hash kernel vs a brute-force string
oracle, Bloom superset property, drop mode, broadcast-ref plumbing."""

import re

import numpy as np
import pyarrow as pa
import pytest

from cow_ray.ops.decontam import (
    DecontamIndexTooLarge,
    _GramHasher,
    bloom_from_index,
    build_ngram_index,
    decontaminate,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox naps in the lazy sun",   # shares 4-grams w/ 0
    "Pack MY box with FIVE dozen liquor jugs!!",  # case/punct dup of 1
    "tiny doc",                                   # < n tokens
    "",
]


def brute_grams(text: str, n: int) -> set:
    toks = re.findall(r"[a-z0-9']+", (text or "").lower())
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


class TestGramHasher:
    def test_matches_brute_force_counts(self):
        """Hash-set intersections equal string-set intersections on
        every doc pair (no collisions at this scale)."""
        h = _GramHasher(4)
        hashes = [h.doc_grams(t) for t in DOCS]
        strings = [brute_grams(t, 4) for t in DOCS]
        for i in range(len(DOCS)):
            assert len(hashes[i]) == len(strings[i])
            for j in range(len(DOCS)):
                got = len(np.intersect1d(hashes[i], hashes[j]))
                assert got == len(strings[i] & strings[j]), (i, j)

    def test_short_and_empty_docs(self):
        h = _GramHasher(4)
        assert len(h.doc_grams("tiny doc")) == 0
        assert len(h.doc_grams("")) == 0
        assert len(h.doc_grams(None)) == 0

    def test_order_sensitive(self):
        h = _GramHasher(2)
        a = h.doc_grams("alpha beta")
        b = h.doc_grams("beta alpha")
        assert not np.intersect1d(a, b).size


class TestIndexAndBloom:
    def test_build_index_streams_and_dedups(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(
            pa.table({"text": DOCS})).repartition(3)
        idx = build_ngram_index(ds, n=4)
        expect = set()
        for t in DOCS:
            expect |= brute_grams(t, 4)
        assert len(idx) == len(expect)
        assert (np.sort(idx) == idx).all()

    def test_max_grams_guard(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(pa.table({"text": DOCS}))
        with pytest.raises(DecontamIndexTooLarge):
            build_ngram_index(ds, n=4, max_grams=3)

    def test_bloom_is_superset_of_exact(self):
        h = _GramHasher(3)
        idx = h.doc_grams(DOCS[0])
        bloom = bloom_from_index(idx, bits_per_gram=16, k=4)
        from cow_ray.ops.decontam import _bloom_hits

        # every indexed gram passes (no false negatives)
        assert _bloom_hits(idx, bloom).all()
        # random probes: FP rate far below 50%
        rng = np.random.default_rng(7)
        probes = rng.integers(0, 2**63, size=4096, dtype=np.int64)
        probes = probes.astype(np.uint64)
        fp = _bloom_hits(np.setdiff1d(probes, idx), bloom).mean()
        assert fp < 0.05


class TestDecontaminate:
    def _corpus(self, ray_session):
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"doc_id": list(range(len(DOCS))), "text": DOCS}))

    def test_annotate_counts(self, ray_session):
        # benchmark = doc 0 and 1; corpus = the rest
        bench = set()
        for t in DOCS[:2]:
            bench |= brute_grams(t, 4)
        h = _GramHasher(4)
        idx = np.unique(np.concatenate(
            [h.doc_grams(t) for t in DOCS[:2]]))
        out = decontaminate(self._corpus(ray_session), idx, n=4)
        rows = {r["doc_id"]: r["n_hit"] for r in out.take_all()}
        for i, t in enumerate(DOCS):
            assert rows[i] == len(brute_grams(t, 4) & bench), i

    def test_drop_mode_and_objectref(self, ray_session):
        import ray

        h = _GramHasher(4)
        idx = np.unique(np.concatenate(
            [h.doc_grams(t) for t in DOCS[:2]]))
        out = decontaminate(self._corpus(ray_session), ray.put(idx),
                            n=4, mode="drop")
        kept = sorted(r["doc_id"] for r in out.take_all())
        # docs 0..3 hit the index (2 and 3 via overlap/dup); 4, 5 clean
        assert kept == [4, 5]

    def test_bloom_backend_superset(self, ray_session):
        h = _GramHasher(4)
        idx = np.unique(np.concatenate(
            [h.doc_grams(t) for t in DOCS[:2]]))
        exact = decontaminate(self._corpus(ray_session), idx, n=4)
        bloom = decontaminate(self._corpus(ray_session),
                              bloom_from_index(idx), n=4)
        e = {r["doc_id"]: r["n_hit"] for r in exact.take_all()}
        b = {r["doc_id"]: r["n_hit"] for r in bloom.take_all()}
        for i in e:
            assert b[i] >= e[i]  # one-sided error only

    def test_empty_index(self, ray_session):
        out = decontaminate(self._corpus(ray_session),
                            np.empty(0, dtype=np.uint64), n=4)
        assert all(r["n_hit"] == 0 for r in out.take_all())
