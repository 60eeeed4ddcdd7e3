"""Naive-Bayes quality classifier (cow_ray/ops/nbayes.py)."""

import numpy as np
import pyarrow as pa
import pytest

from cow_ray.ops.nbayes import score_nb, train_nb


def _corpus():
    # class-1 docs speak "alpha beta", class-0 docs speak "gamma delta"
    rows = []
    for i in range(40):
        pos = i % 2 == 0
        text = ("alpha beta alpha shared" if pos
                else "gamma delta gamma shared")
        rows.append({"doc_id": i, "text": text, "y": pos})
    rows.append({"doc_id": 100, "text": "", "y": False})  # empty doc
    return pa.Table.from_pylist(rows)


def _brute_model(tbl, vocab_size=4096):
    """Pure-Python reference implementation of the train_nb math."""
    import re
    from collections import Counter

    toks = []
    for r in tbl.to_pylist():
        for t in re.split(r"[^a-z0-9']+", r["text"].lower()):
            if t:
                toks.append((t, 1 if r["y"] else 0))
    c = Counter(t for t, _ in toks)
    c1 = Counter(t for t, y in toks if y)
    T1 = sum(1 for _, y in toks if y)
    T0 = len(toks) - T1
    vocab = sorted(c, key=lambda t: (-c[t], t))[:vocab_size]
    V = len(vocab)
    m = {t: int(np.floor((np.log((c1[t] + 1) / (T1 + V))
                          - np.log((c[t] - c1[t] + 1) / (T0 + V)))
                         * 1e6 + 0.5)) for t in vocab}
    ys = [r["y"] for r in tbl.to_pylist()]
    D1 = sum(ys)
    prior = int(np.floor(np.log(D1 / (len(ys) - D1)) * 1e6 + 0.5))
    oov = int(np.floor((np.log(1 / (T1 + V)) - np.log(1 / (T0 + V)))
                       * 1e6 + 0.5))
    return m, prior, oov


def test_train_matches_brute_force(ray_session):
    import ray.data

    tbl = _corpus()
    model = train_nb(ray.data.from_arrow(tbl), "y", num_parts=4)
    m_ref, prior_ref, oov_ref = _brute_model(tbl)
    assert model["vocab"] == len(m_ref)
    assert model["prior_m"] == prior_ref
    assert model["oov_m"] == oov_ref
    assert sorted(model["m"].tolist()) == sorted(m_ref.values())


def test_scores_separate_classes(ray_session):
    import ray
    import ray.data

    tbl = _corpus()
    ds = ray.data.from_arrow(tbl)
    model = train_nb(ds, "y", num_parts=4)
    out = {r["doc_id"]: r for r in
           score_nb(ds, ray.put(model)).take_all()}
    assert out[0]["pred"] is True and out[0]["nb_n9"] > 0
    assert out[1]["pred"] is False and out[1]["nb_n9"] < 0
    # empty doc scores the bare prior
    assert out[100]["n_tokens"] == 0
    assert out[100]["nb_n9"] == model["prior_m"] * 1000


def test_oov_token_gets_oov_delta(ray_session):
    import ray
    import ray.data

    tbl = _corpus()
    model = train_nb(ray.data.from_arrow(tbl), "y", num_parts=4)
    probe = ray.data.from_arrow(pa.table(
        {"doc_id": [0], "text": ["zzznovel"]}))
    r = score_nb(probe, ray.put(model)).take_all()[0]
    assert r["nb_n9"] == (model["prior_m"] + model["oov_m"]) * 1000


def test_vocab_truncation_keeps_top_by_count(ray_session):
    import ray.data

    tbl = _corpus()
    model = train_nb(ray.data.from_arrow(tbl), "y", vocab_size=2,
                     num_parts=4)
    # top-2 by count: alpha/gamma tie at 40 each... shared=40 too;
    # tie broken by token asc -> alpha, gamma
    assert model["vocab"] == 2


def test_degenerate_labels_raise(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": [1, 2], "text": ["a", "b"],
                    "y": [True, True]})
    with pytest.raises(ValueError, match="degenerate"):
        train_nb(ray.data.from_arrow(tbl), "y", num_parts=2)


def test_null_labels_raise(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": [1, 2], "text": ["a", "b"],
                    "y": pa.array([True, None])})
    with pytest.raises(Exception, match="null"):
        train_nb(ray.data.from_arrow(tbl), "y", num_parts=2)
