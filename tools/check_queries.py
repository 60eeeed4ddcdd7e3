"""Driver-gate rehearsal: run every queries() entry at a given sf_dir,
run its oracle_sql() in DuckDB over the same parquet tables, and
compare row count + schema + order-insensitive value hash the way the
evaluation driver does.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha1()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    # the driver sees e.queries() only; the gate also rehearses the
    # rows-only variants kept outside the driver's ~50-entry window
    from cow_ray.pipelines.queries import EXTRA_QUERIES, ORACLES

    qs = {**e.queries(), **EXTRA_QUERIES}
    # full ORACLES (not e.oracle_sql(), which is filtered to the
    # driver window): the gate also hash-verifies oracled
    # EXTRA_QUERIES entries
    oracles = dict(ORACLES)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
            if len(got) == 0 and name not in ("emb_near_dup",):
                print(f"     WARNING: empty result for {name}")
            continue
        want = con.execute(oracles[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        gh, wh = value_hash(got), value_hash(want)
        ok_hash = gh == wh
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
              f"hash_ok={ok_hash} [{dt:.1f}s]")
        if not ok_hash and ok_cols and ok_rows:
            g = got[sorted(got.columns)]
            w = want[sorted(want.columns)]
            gs = set(tuple(str(v) for v in r) for r in g.itertuples(index=False))
            ws = set(tuple(str(v) for v in r) for r in w.itertuples(index=False))
            print("     only-in-got:", list(gs - ws)[:3])
            print("     only-in-want:", list(ws - gs)[:3])

    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
