"""Driver-contract tests: entry() smoke + a sample of queries() vs
their oracle_sql() through the same compare the evaluation driver uses
(full rehearsal: ``python tools/check_queries.py``)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

SAMPLE = ["kg_doc_triples", "kg_source_triples_dedup", "text_quality",
          "dedup_exact_docs", "q1_pricing_summary", "events_first"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


def _hashable(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


def test_entry_smoke(entry_mod):
    ds = entry_mod.entry()
    assert ds.count() > 1000
    assert set(ds.schema().names) == {
        "subj", "pred", "obj_lex", "obj_kind", "obj_datatype", "obj_lang"
    }


def test_every_query_has_callable(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 12


def test_join_conserves_rows(ray_session):
    """FK invariant: every lineitem has an order, so the inner join must
    conserve rows exactly (moved here from the query path, where a
    blanket except + mid-query materialize used to guard it)."""
    from cow_ray.pipelines.queries import QUERIES, _read

    expected = _read(SF, "lineitem", columns=["l_orderkey"]).count()
    out = QUERIES["lineitem_orders_join"](SF).to_pandas()
    assert int(out["n_items"].sum()) == expected


def test_join_strategies_equivalent(ray_session, monkeypatch):
    """All three join strategies (default partitioned union join,
    native hash-partitioned Dataset.join, broadcast) must produce the
    identical rollup."""
    from cow_ray.pipelines.queries import QUERIES

    part = QUERIES["lineitem_orders_join"](SF).to_pandas()
    monkeypatch.setenv("COW_RAY_JOIN_STRATEGY", "native")
    native = QUERIES["lineitem_orders_join"](SF).to_pandas()
    monkeypatch.setenv("COW_RAY_JOIN_STRATEGY", "broadcast")
    bcast = QUERIES["lineitem_orders_join"](SF).to_pandas()
    assert _hashable(part) == _hashable(native)
    assert _hashable(part) == _hashable(bcast)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(entry_mod, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = fn(SF).to_pandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem", "orders", "customer",
              "nation", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert _hashable(got) == _hashable(want)
