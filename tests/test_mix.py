"""Deterministic corpus mixture (cow_ray/ops/mix.py)."""

import numpy as np
import pyarrow as pa
import pytest

from cow_ray.ops.md5np import md5_first_byte
from cow_ray.ops.mix import _expand_fn, mixture, plan_weights


def test_plan_weights_integer_contract():
    assert plan_weights({"a": 2.4}) == {"a": (2, 102)}
    assert plan_weights({"a": 1.0}) == {"a": (1, 0)}
    assert plan_weights({"a": 0.25}) == {"a": (0, 64)}
    # near-integer rounds up to a clean full epoch, not thresh=256
    assert plan_weights({"a": 1.999}) == {"a": (2, 0)}


def test_plan_weights_rejects_bad_input():
    with pytest.raises(ValueError):
        plan_weights({"a": -0.1})
    with pytest.raises(ValueError):
        plan_weights({"a": float("nan")})
    with pytest.raises(ValueError):
        plan_weights({"a": 0.0, "b": 0.001})  # b rounds to zero too


def _table(ids):
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "payload": [f"p{i}" for i in ids]})


def test_expand_full_epochs_only():
    fn = _expand_fn("s", 3, 0, "doc_id", "mix_source", "epoch")
    out = fn(_table([7, 8]))
    assert out["doc_id"].to_pylist() == [7, 7, 7, 8, 8, 8]
    assert out["epoch"].to_pylist() == [0, 1, 2, 0, 1, 2]
    assert set(out["mix_source"].to_pylist()) == {"s"}
    # payload duplicated alongside
    assert out["payload"].to_pylist()[:3] == ["p7", "p7", "p7"]


def test_expand_fractional_matches_md5_bucket():
    ids = list(range(400))
    fn = _expand_fn("head", 1, 102, "doc_id", "mix_source", "epoch")
    out = fn(_table(ids))
    buckets = md5_first_byte(pa.array([f"{i}#head" for i in ids]))
    want_counts = 1 + (buckets < 102)
    got_counts = np.bincount(out["doc_id"].to_numpy(), minlength=400)
    assert (got_counts == want_counts).all()
    # deterministic rate ≈ 102/256 on the fractional epoch
    frac = (out["epoch"].to_numpy() == 1).sum() / 400
    assert abs(frac - 102 / 256) < 0.08


def test_expand_batch_split_invariance():
    ids = list(range(100))
    fn = _expand_fn("x", 2, 64, "doc_id", "mix_source", "epoch")
    whole = fn(_table(ids))
    halves = pa.concat_tables([fn(_table(ids[:50])),
                               fn(_table(ids[50:]))])
    key = lambda t: sorted(zip(t["doc_id"].to_pylist(),
                               t["epoch"].to_pylist()))
    assert key(whole) == key(halves)


def test_salting_decorrelates_sources():
    ids = [str(i) for i in range(256)]
    a = md5_first_byte(pa.array([f"{i}#a" for i in ids])) < 128
    b = md5_first_byte(pa.array([f"{i}#b" for i in ids])) < 128
    assert (a != b).any()


def test_mixture_guards():
    import ray.data

    ds = ray.data.from_arrow(_table([1]))
    with pytest.raises(ValueError, match="duplicate"):
        mixture([("a", ds, 1.0), ("a", ds, 1.0)], "doc_id")


def test_mixture_union_counts(ray_session):
    import ray.data

    ids_a, ids_b = list(range(200)), list(range(1000, 1200))
    dsa = ray.data.from_arrow(_table(ids_a))
    dsb = ray.data.from_arrow(_table(ids_b))
    out = mixture([("a", dsa, 2.0), ("b", dsb, 0.5)], "doc_id")
    tbl = pa.Table.from_pandas(out.to_pandas())
    n_a = (np.array(tbl["mix_source"]) == "a").sum()
    buckets = md5_first_byte(pa.array([f"{i}#b" for i in ids_b]))
    assert n_a == 400  # two full epochs, no fractional
    assert (np.array(tbl["mix_source"]) == "b").sum() == \
        (buckets < 128).sum()


def test_mixture_drops_zero_weight_source(ray_session):
    import ray.data

    dsa = ray.data.from_arrow(_table([1, 2]))
    dsb = ray.data.from_arrow(_table([3]))
    out = mixture([("a", dsa, 1.0), ("b", dsb, 0.0)], "doc_id")
    assert set(r["mix_source"] for r in out.take_all()) == {"a"}


def test_shuffle_by_hash_order_matches_sql(ray_session):
    import duckdb
    import ray.data

    from cow_ray.ops.sample import shuffle_by_hash

    ids = list(range(300))
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(ids, type=pa.int64())}))
    got = [r["doc_id"] for r in
           shuffle_by_hash(ds, "doc_id").take_all()]
    want = [r[0] for r in duckdb.sql(
        "SELECT i FROM (SELECT unnest(range(0, 300)) AS i) "
        "ORDER BY md5(CAST(i AS VARCHAR)), i").fetchall()]
    assert got == want
    assert sorted(got) == ids  # a permutation, nothing lost


def test_shuffle_by_hash_keeps_hash_when_asked(ray_session):
    import ray.data

    from cow_ray.ops.sample import shuffle_by_hash

    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2, 3], type=pa.int64())}))
    rows = shuffle_by_hash(ds, "doc_id", keep_hash=True).take_all()
    assert all(len(r["__shuffle_md5"]) == 32 for r in rows)


def test_plan_weights_tiny_nonzero_raises():
    with pytest.raises(ValueError, match="granularity"):
        plan_weights({"big": 1.0, "tiny": 0.001})


def test_plan_weights_rounds_half_up():
    # 1/512 * 256 = 0.5 -> half-up to 1 (banker's round would give 0)
    assert plan_weights({"a": 1 / 512}) == {"a": (0, 1)}


def test_expand_empty_batch():
    fn = _expand_fn("s", 2, 102, "doc_id", "mix_source", "epoch")
    out = fn(_table([]))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "payload", "mix_source",
                                "epoch"]
