"""bpe_pair_stats vs a brute-force pure-Python pair counter."""

import re
from collections import Counter

import pytest


def brute(rows, top_k):
    wc = Counter()
    for r in rows:
        wc.update(re.findall(r"[a-z0-9']+", (r["text"] or "").lower()))
    pc_ = Counter()
    for w, c in wc.items():
        for a, b in zip(w, w[1:]):
            pc_[(a, b)] += c
    items = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
    return items[:top_k]


def run(rows, top_k, **kw):
    import ray.data

    from cow_ray.ops.bpepairs import bpe_pair_stats

    ds = ray.data.from_items(rows).repartition(3)
    t = bpe_pair_stats(ds, top_k=top_k, **kw)
    return [((a, b), c) for a, b, c in
            zip(t["c1"].to_pylist(), t["c2"].to_pylist(),
                t["cnt"].to_pylist())]


ROWS = [
    {"doc_id": 0, "text": "the theme of the thesis"},
    {"doc_id": 1, "text": "there then the"},
    {"doc_id": 2, "text": "banana bandana"},
    {"doc_id": 3, "text": ""},
    {"doc_id": 4, "text": None},
    {"doc_id": 5, "text": "a bb ccc dddd"},  # single-char words too
] + [{"doc_id": 6 + i, "text": f"lower lowest low{i}"} for i in range(20)]


class TestBpePairs:
    def test_matches_brute_force(self, ray_session):
        assert run(ROWS, 15) == brute(ROWS, 15)

    def test_weighting_is_by_word_frequency(self, ray_session):
        # 'th' appears in the/theme/thesis/there/then — weight is the
        # sum of those WORD counts, not document counts
        got = dict(run(ROWS, 50))
        want = dict(brute(ROWS, 10**9))
        assert got[("t", "h")] == want[("t", "h")] >= 5

    def test_pairs_do_not_cross_words(self, ray_session):
        rows = [{"doc_id": 0, "text": "ab ba"}]
        got = dict(run(rows, 10))
        assert got == {("a", "b"): 1, ("b", "a"): 1}

    def test_empty(self, ray_session):
        assert run([{"doc_id": 0, "text": ""}], 5) == []
