"""Stupid-Backoff bigram LM vs a single-process brute-force oracle
(identical truncation + quantization contract)."""

import math
import re

import numpy as np
import pytest

WORD = re.compile(r"[a-z0-9']+")


def brute_force(rows, vocab_size, bigram_size):
    toks = {r["doc_id"]: WORD.findall((r["text"] or "").lower())
            for r in rows}
    flat = [t for ts in toks.values() for t in ts]
    total = len(flat)
    if total == 0:
        return {r["doc_id"]: (0, 0) for r in rows}
    uni = {}
    for t in flat:
        uni[t] = uni.get(t, 0) + 1
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
                 [:vocab_size])
    m_uni = {t: math.floor(math.log(c / total) * 1e6 + 0.5)
             for t, c in vocab.items()}
    unk = math.floor(math.log(0.5 / total) * 1e6 + 0.5)
    alpha = math.floor(math.log(0.4) * 1e6 + 0.5)
    bi = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    bitop = sorted(bi.items(),
                   key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
    m_bi = {}
    for (a, b), c in bitop[:bigram_size]:
        if a in vocab:
            m_bi[(a, b)] = math.floor(
                math.log(c / vocab[a]) * 1e6 + 0.5)
    out = {}
    for did, ts in toks.items():
        cost = 0
        for i, t in enumerate(ts):
            if i == 0:
                cost += -m_uni.get(t, unk) * 1000
            elif (ts[i - 1], t) in m_bi:
                cost += -m_bi[(ts[i - 1], t)] * 1000
            else:
                cost += -(m_uni.get(t, unk) + alpha) * 1000
        out[did] = (len(ts), cost)
    return out


ROWS = [
    {"doc_id": 0, "text": "the cat sat on the mat the cat ran"},
    {"doc_id": 1, "text": "the cat sat on the mat again and again"},
    {"doc_id": 2, "text": "dogs chase the cat but the cat sat still"},
    {"doc_id": 3, "text": ""},
    {"doc_id": 4, "text": None},
    {"doc_id": 5, "text": "one"},
    {"doc_id": 6, "text": "zz'q unknown glyph soup"},
] + [{"doc_id": 7 + i,
      "text": f"shared prefix w{i % 4} suffix t{i} shared prefix"}
     for i in range(40)]


class TestBigramLM:
    def run_engine(self, rows, V, B):
        import ray
        import ray.data

        from cow_ray.ops.lm import bigram_nll_scores, train_bigram_lm

        ds = ray.data.from_items(rows).repartition(5)
        lm = train_bigram_lm(ds, vocab_size=V, bigram_size=B)
        return lm, {r["doc_id"]: (r["n_tokens"], r["nll2_n9"])
                    for r in bigram_nll_scores(ds, ray.put(lm)).take_all()}

    def test_matches_brute_force(self, ray_session):
        lm, got = self.run_engine(ROWS, 32, 64)
        want = brute_force(ROWS, 32, 64)
        assert got == want
        assert lm["bigrams"] > 0 and lm["vocab"] == 32

    def test_no_truncation_matches_too(self, ray_session):
        _, got = self.run_engine(ROWS, 10_000, 10_000)
        assert got == brute_force(ROWS, 10_000, 10_000)

    def test_bigram_beats_backoff_on_seen_text(self, ray_session):
        """A doc made of the corpus' most frequent bigram must score a
        LOWER per-token NLL under the bigram model than the unigram
        backoff would give it."""
        import ray
        import ray.data

        from cow_ray.ops.lm import (
            bigram_nll_scores,
            nll_scores,
            train_bigram_lm,
            train_unigram_lm,
        )

        rows = [{"doc_id": i, "text": "alpha beta " * 10}
                for i in range(8)]
        ds = ray.data.from_items(rows).repartition(2)
        bi = train_bigram_lm(ds, vocab_size=16, bigram_size=16)
        uni = train_unigram_lm(ds, vocab_size=16, quantize=True)
        got_bi = bigram_nll_scores(ds, ray.put(bi)).take_all()[0]
        got_uni = nll_scores(ds, ray.put(uni)).take_all()[0]
        assert got_bi["nll2_n9"] < got_uni["nll_n9"]

    def test_empty_corpus(self, ray_session):
        import ray.data

        from cow_ray.ops.lm import bigram_nll_scores, train_bigram_lm

        rows = [{"doc_id": 1, "text": ""}, {"doc_id": 2, "text": None}]
        ds = ray.data.from_items(rows)
        lm = train_bigram_lm(ds)
        assert lm["total"] == 0 and lm["bigrams"] == 0
        out = {r["doc_id"]: r["nll2_n9"]
               for r in bigram_nll_scores(ds, lm).take_all()}
        assert out == {1: 0, 2: 0}

    def test_bigrams_never_cross_documents(self, ray_session):
        """'b a' is adjacent only ACROSS the two docs — it must not
        appear in the model."""
        import ray.data

        from cow_ray.ops.lm import train_bigram_lm
        from cow_ray.ops.lm import _hash64
        import pyarrow as pa

        rows = [{"doc_id": 0, "text": "a b"}, {"doc_id": 1, "text": "a b"}]
        ds = ray.data.from_items(rows).repartition(2)
        lm = train_bigram_lm(ds, vocab_size=8, bigram_size=8)
        assert lm["bigrams"] == 1
        h_ab = _hash64(pa.array(["a b"], pa.large_string()))[0]
        h_ba = _hash64(pa.array(["b a"], pa.large_string()))[0]
        assert h_ab in lm["bi_hash"] and h_ba not in lm["bi_hash"]
