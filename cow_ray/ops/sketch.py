"""Mergeable sketches: HyperLogLog approximate distinct counting
(Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007).

The aggregation-at-scale pattern for non-algebraic aggregates (guide:
"emit one serialized sketch per batch and merge them in a second, tiny
stage — sketches are designed to be mergeable"): each ``map_batches``
task hashes its column slice and emits ONE register-array row; the
merge is an elementwise max over a handful of rows.  The exchange is
``O(num_batches × 2^p)`` bytes, never the data.

Deterministic (fixed hash seed) and vectorized (numpy register
updates).  Standard HLL with the bias-corrected estimator; ±~1.04/√m
relative error (m = 2^p registers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Stable 64-bit hashes of a string column (polars, vectorized)."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(pa.chunked_array([arr])).hash(seed=7).to_numpy()


def hll_registers(values: pa.Array, p: int = 12) -> np.ndarray:
    """One batch → its HLL register array (uint8, length 2^p)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash64(values)
    if h.size == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    work = h << np.uint64(p)
    # rank = 1 + number of leading zeros of the remaining 64-p bits
    # (capped at 64-p+1 when they are all zero)
    rank = np.zeros(h.size, dtype=np.uint8)
    found = np.zeros(h.size, dtype=bool)
    for r in range(1, 64 - p + 1):
        top = (work >> np.uint64(63)).astype(bool)
        newly = top & ~found
        rank[newly] = r
        found |= top
        if found.all():
            break
        work = work << np.uint64(1)
    rank[~found] = 64 - p + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = float(regs.size)
    inv = np.power(2.0, -regs.astype(np.float64))
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # small-range correction
    return raw


def approx_distinct_multi(ds, cols: list[str], p: int = 12) -> dict[str, float]:
    """Distributed approximate distinct counts for several columns in a
    SINGLE pass (one sketch row per (batch, column))."""

    def sketch(batch: pa.Table) -> pa.Table:
        rows = []
        for col in cols:
            rows.append({"col": col,
                         "regs": hll_registers(batch[col], p).tolist()})
        return pa.Table.from_pylist(rows)

    merged = {c: np.zeros(1 << p, dtype=np.uint8) for c in cols}
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        c = row["col"]
        merged[c] = np.maximum(merged[c],
                               np.asarray(row["regs"], dtype=np.uint8))
    return {c: hll_estimate(r) for c, r in merged.items()}


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate distinct count of a string column."""
    return approx_distinct_multi(ds, [col], p)[col]


# ---------- heavy hitters (Misra-Gries candidates + exact recount) ----------


def mg_sketch(items, k: int) -> dict:
    """Misra-Gries frequent-items summary with ``k`` counters (Misra &
    Gries, "Finding repeated elements", Sci. Comput. Program. 1982).
    Guarantee: any item with true frequency > n/(k+1) is present in
    the returned dict; counts are undercounts by at most n/(k+1)."""
    counters: dict = {}
    for x in items:
        if x in counters:
            counters[x] += 1
        elif len(counters) < k:
            counters[x] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_doc_tokens(ds, *, phi_inv: int = 20, text_col: str = "text",
                     id_col: str = "doc_id", slack: int = 2,
                     max_candidates: int = 100_000):
    """EXACT tokens whose document frequency is ≥ ``1/phi_inv`` of the
    corpus (df · phi_inv ≥ N — integer arithmetic, so the DuckDB
    oracle hashes identically), found WITHOUT a token-level shuffle:

    1. candidate pass — each batch runs a Misra-Gries summary with
       ``k = phi_inv · slack`` counters over its per-doc DISTINCT
       tokens and emits its ≤ k keys.  The UNION of per-batch sketch
       keys is a superset of any merged-sketch survivor set (a global
       φ-heavy token is > 1/(k+1)-heavy in at least one batch, by
       averaging), so no false negatives; size ≤ batches × k, bounded
       by construction and guarded by ``max_candidates``.
    2. exact pass — the candidate list broadcasts via ``ray.put``;
       each batch emits per-candidate partial df counts + its doc
       count, merged by one coalesced vectorized rollup (KBs).

    The exchange never carries token-level data — pass 1 returns
    sketch keys, pass 2 returns ``candidates × batches`` partial rows.
    Tokenization matches ``token_doc_freq`` (``[a-z0-9']+`` on the
    lowered text) for oracle parity."""
    import re

    import pyarrow.compute as pc
    import ray
    import ray.data

    k = phi_inv * slack
    word_re = re.compile(r"[a-z0-9']+")

    def doc_tokens(t: str | None):
        return set(word_re.findall((t or "").lower()))

    def sketch_batch(batch: pa.Table) -> pa.Table:
        stream = (tok for t in
                  pc.fill_null(batch[text_col], "").to_pylist()
                  for tok in doc_tokens(t))
        return pa.table(
            {"token": pa.array(list(mg_sketch(stream, k)),
                               type=pa.large_string())})

    cand: set[str] = set()
    for b in ds.select_columns([text_col]).map_batches(
            sketch_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        cand.update(b["token"].to_pylist())
        if len(cand) > max_candidates:
            raise RuntimeError(
                f"heavy-hitter candidate union exceeds {max_candidates}"
                " — raise phi_inv or lower slack")
    cand_list = sorted(cand)
    cand_ref = ray.put(cand_list)
    partial_schema = pa.schema(
        [("token", pa.large_string()), ("df", pa.int64()),
         ("n_docs", pa.int64())])

    def recount(batch: pa.Table) -> pa.Table:
        cl = ray.get(cand_ref)
        cset = set(cl)
        df: dict = {}
        texts = pc.fill_null(batch[text_col], "").to_pylist()
        for t in texts:
            for tok in doc_tokens(t) & cset:
                df[tok] = df.get(tok, 0) + 1
        toks = sorted(df)
        return pa.table(
            {"token": pa.array(toks + ["\x00__n__"],
                               type=pa.large_string()),
             "df": pa.array([df[t] for t in toks] + [0],
                            type=pa.int64()),
             "n_docs": pa.array([0] * len(toks) + [len(texts)],
                                type=pa.int64())})

    partials = ds.select_columns([text_col]).map_batches(
        recount, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema([("token", pa.large_string()),
                              ("df", pa.int64())]).empty_table()
        agg = batch.group_by(["token"], use_threads=False).aggregate(
            [("df", "sum"), ("n_docs", "sum")])
        n = pc.sum(agg["n_docs_sum"]).as_py() or 0
        agg = agg.filter(pc.and_(
            pc.not_equal(agg["token"], "\x00__n__"),
            pc.greater_equal(pc.multiply(agg["df_sum"], phi_inv),
                             pa.scalar(n, type=pa.int64()))))
        agg = agg.sort_by("token")
        return pa.table({"token": agg["token"],
                         "df": pc.cast(agg["df_sum"], pa.int64())})

    # batch_size=None: the rollup must see the coalesced block whole
    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None)
