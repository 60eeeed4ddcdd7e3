"""BM25 ranked keyword retrieval over a text column.

Okapi BM25 (Robertson & Walker, SIGIR 1994) with the non-negative
idf variant ``ln(1 + (N − df + ½)/(df + ½))`` (the form used by
Lucene).  Tokenization follows the repo-wide oracle contract
(textstats.token_doc_partial): ``lower(text)`` split on
``[^a-z0-9']+``, empty fragments dropped.

Scale shape: two column-pruned corpus scans and NO corpus-sized
exchange.

1. **stats scan** — each batch emits ONE partial row (per-term df
   counts, doc count, token count); a coalesced tiny-rollup gives
   N, avgdl and df per query term (``num_blocks × (T+2)`` ints
   cross the wire).
2. **score scan** — idf/avgdl ride a tiny broadcast closure; each
   batch computes per-doc tf for the query terms with Arrow kernels
   (split → is_in → group_by) and emits its LOCAL top-k; one
   coalesced vectorized merge finishes (``num_blocks × k`` rows).

Cross-engine exactness: each per-term contribution is rounded to 9
decimals and accumulated in INTEGER nanos, so the per-doc sum is
order-free and the DuckDB oracle hashes identically (no float
re-association risk).  Ranking = (score desc, doc_id asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT = "[^a-z0-9']+"


def _doc_token_pairs(batch: pa.Table, text_col: str):
    """(doc_index, token) pairs under the oracle tokenization
    contract, plus per-doc non-empty token counts."""
    n = batch.num_rows
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(batch[text_col], "")),
        pattern=TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "")
    pairs = pa.table({"d": pa.array(doc_idx), "token": flat}).filter(keep)
    dl = np.zeros(n, dtype=np.int64)
    np.add.at(dl, pairs["d"].to_numpy(zero_copy_only=False), 1)
    return pairs, dl


def _corpus_stats(ds, terms: list[str], text_col: str):
    """One scan → (N, total_tokens, df per term).  The exchange is
    one (T+2)-int row per batch, merged in a single coalesced pass."""
    t_arr = pa.array(terms, type=pa.string())
    T = len(terms)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"n_docs": pa.array([], type=pa.int64()),
                 "n_tokens": pa.array([], type=pa.int64()),
                 "dfs": pa.array([], type=pa.list_(pa.int64()))})
        pairs, dl = _doc_token_pairs(batch, text_col)
        hit = pairs.filter(pc.is_in(pairs["token"], value_set=t_arr))
        dfs = np.zeros(T, dtype=np.int64)
        if hit.num_rows:
            distinct = hit.group_by(["d", "token"],
                                    use_threads=False).aggregate([])
            ti = pc.index_in(distinct["token"], value_set=t_arr
                             ).to_numpy(zero_copy_only=False)
            np.add.at(dfs, ti, 1)
        return pa.table(
            {"n_docs": pa.array([batch.num_rows], type=pa.int64()),
             "n_tokens": pa.array([int(dl.sum())], type=pa.int64()),
             "dfs": pa.array([dfs], type=pa.list_(pa.int64()))})

    parts = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow")
             .take_all())
    n_docs = sum(r["n_docs"] for r in parts)
    n_tokens = sum(r["n_tokens"] for r in parts)
    dfs = np.zeros(T, dtype=np.int64)
    for r in parts:
        dfs += np.asarray(r["dfs"], dtype=np.int64)
    return n_docs, n_tokens, dfs


def bm25_topk(ds, terms: list[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text"):
    """Top-k documents by BM25 score for a bag of query terms.
    Returns ``(id_col, score float64 [exact 9-decimal], rank)``.

    The integer-nano accumulation makes the result hash-identical to
    the DuckDB oracle (pipelines/queries.py SQL_BM25_DOCS)."""
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("bm25_topk: empty term list")
    n_docs, n_tokens, dfs = _corpus_stats(ds, terms, text_col)
    if n_docs == 0:
        return ds.select_columns([id_col]).limit(0)
    avgdl = n_tokens / n_docs if n_tokens else 1.0
    # idf quantized to micros: ln() is the one op whose last ulp may
    # differ between numpy and DuckDB's libm; quantizing the T
    # per-term values (not per-contribution) shrinks any boundary
    # risk to ~1e-10 per TERM.  All remaining arithmetic is IEEE
    # +,*,/ in matched evaluation order → bit-identical.
    idf = np.floor(
        np.log(1.0 + (n_docs - dfs + 0.5) / (dfs + 0.5)) * 1e6 + 0.5
    ) / 1e6
    t_arr = pa.array(terms, type=pa.string())

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("score_n9", pa.int64())])

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pairs, dl = _doc_token_pairs(batch, text_col)
        hit = pairs.filter(pc.is_in(pairs["token"], value_set=t_arr))
        if hit.num_rows == 0:
            return out_schema.empty_table()
        hit = hit.append_column(
            "one", pa.array(np.ones(hit.num_rows, dtype=np.int64)))
        tf_tbl = hit.group_by(["d", "token"], use_threads=False
                              ).aggregate([("one", "sum")])
        d = tf_tbl["d"].to_numpy(zero_copy_only=False)
        ti = pc.index_in(tf_tbl["token"], value_set=t_arr
                         ).to_numpy(zero_copy_only=False)
        tf = tf_tbl["one_sum"].to_numpy(zero_copy_only=False
                                        ).astype(np.float64)
        norm = k1 * (1.0 - b + b * dl[d] / avgdl)
        contrib = idf[ti] * tf * (k1 + 1.0) / (tf + norm)
        # exact, order-free accumulation: integer nanos per term
        # (floor(+0.5), not banker's rounding — matches SQL floor)
        nanos = np.floor(contrib * 1e9 + 0.5).astype(np.int64)
        score = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(score, d, nanos)
        # candidates = docs containing ANY query term, even if their
        # quantized score is 0 (idf micro-rounds to 0 when df≈N at
        # N≳2e6) — the SQL oracle keeps those rows, so dropping them
        # here would break the hash contract when fewer than k docs
        # score positive
        cand = np.unique(d)
        order = np.lexsort((ids[cand], -score[cand]))[:k]
        sel = cand[order]
        return pa.table({id_col: pa.array(ids[sel], type=pa.int64()),
                         "score_n9": pa.array(score[sel],
                                              type=pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [(id_col, pa.int64()), ("score", pa.float64()),
                 ("rank", pa.int64())]).empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        s = batch["score_n9"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {id_col: pa.array(ids[order], type=pa.int64()),
             "score": pa.array(s[order] / 1e9, type=pa.float64()),
             "rank": pa.array(np.arange(1, len(order) + 1,
                                        dtype=np.int64))})

    # batch_size=None: the merge must see the coalesced candidates as
    # ONE batch (same contract as similarity._finish_topk)
    return (ds.select_columns([id_col, text_col])
            .map_batches(local_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow",
                         batch_size=None))
