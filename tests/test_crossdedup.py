"""Doc-level cross-corpus dedup (cow_ray/ops/crossdedup.py)."""

import numpy as np
import pyarrow as pa
import pytest

from cow_ray.ops.crossdedup import (
    _digests16,
    dedup_against,
    ref_digest_set,
)


def test_digests_match_hashlib():
    import hashlib

    texts = ["", "a", "hello world", "x" * 200, "café"]
    d = _digests16(pa.array(texts))
    for t, got in zip(texts, d):
        assert got == hashlib.md5(t.encode()).digest()


def test_ref_digest_set_distinct_sorted(ray_session):
    import ray.data

    ref = ray.data.from_arrow(pa.table(
        {"text": ["b", "a", "b", "c", None, "a"]}))
    s = ref_digest_set(ref)
    assert len(s) == 3
    assert (np.sort(s) == s).all()


def test_ref_budget_raises(ray_session):
    import ray.data

    ref = ray.data.from_arrow(pa.table(
        {"text": [f"t{i}" for i in range(10)]}))
    with pytest.raises(ValueError, match="broadcast budget"):
        ref_digest_set(ref, max_ref=3)


def test_dedup_against_membership(ray_session):
    import ray.data

    train = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["keep me", "benchmark text", "keep too",
                 "benchmark text", None]}))
    ref = ray.data.from_arrow(pa.table(
        {"text": ["benchmark text", "unused"]}))
    out = dedup_against(train, ref).take_all()
    # both copies of the contaminated text drop; null text kept
    assert [r["doc_id"] for r in out] == [1, 3, 5]


def test_dedup_against_precomputed_ref(ray_session):
    import ray
    import ray.data

    train = ray.data.from_arrow(pa.table(
        {"doc_id": [1, 2], "text": ["a", "b"]}))
    digs = ref_digest_set(ray.data.from_arrow(pa.table(
        {"text": ["b"]})))
    out = dedup_against(train, ref_digests=ray.put(digs)).take_all()
    assert [r["doc_id"] for r in out] == [1]
    with pytest.raises(ValueError, match="need ref"):
        dedup_against(train)


def test_empty_ref_is_identity(ray_session):
    import ray.data

    train = ray.data.from_arrow(pa.table(
        {"doc_id": [1, 2], "text": ["a", "b"]}))
    ref = ray.data.from_arrow(pa.table(
        {"text": pa.array([], type=pa.string())}))
    assert dedup_against(train, ref).count() == 2
