"""Multinomial Naive-Bayes text classifier — the model-based quality
scorer of the classic curation recipes (CCNet trains a linear
classifier over the LM features, Wenzek et al. 2020; GPT-3 §A.2 and
PaLM use a logistic/NB-style quality classifier over web text; NB is
the public-baseline form that needs no iterative optimizer, so
training stays ONE exchange).

Training (``train_nb``) follows ops/lm.py's shape exactly:

* map-side: vectorized tokenize + per-batch ``(token → count,
  count_in_class1)`` partials (a Zipfian batch collapses to its
  distinct tokens before anything crosses the wire), plus sentinel
  rows carrying exact per-class token totals and doc counts;
* ONE token-keyed exchange, per-partition sum + top-``vocab_size``
  truncation (count desc, token asc — the doc_nll contract, mirrored
  verbatim by the SQL oracle's ``ORDER BY c DESC, token LIMIT V``);
* driver merge bounded by ``parts × V`` rows.

The model is a broadcast-ready table of MICRO-quantized per-token
log-odds (Laplace α=1): ``m_t = floor((ln((c1+1)/(T1+V)) −
ln((c0+1)/(T0+V)))·1e6 + 0.5)`` — the ops/bm25.py integer pattern, so
per-document scores are exact int64 nanos and hash-match a DuckDB
oracle with zero float-reassociation risk.  OOV tokens get the same
formula at ``c1=c0=0``; the class prior ``ln(n1/n0)`` rides along.

Scoring (``score_nb``) is a single broadcast-lookup scan: sorted
uint64 token hashes + int64 deltas ship ONCE via ``ray.put``;
per-doc sums are one ``np.add.reduceat``.  The corpus never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _broadcast_lookup, _hash64, _segment_sum, _tokenize

# sentinels ride the token exchange (token-disjoint partitions make
# their per-partition sums exact): c = class-1 value, c1 unused/dup
_TOT_KEY = "\x00__tot__"    # c = all-token count, c1 = class-1 tokens
_DOCS_KEY = "\x00__docs__"  # c = all-doc count,   c1 = class-1 docs


def train_nb(ds, label_col: str, text_col: str = "text",
             vocab_size: int = 4096, num_parts: int = 32) -> dict:
    """Train the NB model; returns a broadcast-ready dict
    ``{"hash": sorted uint64[V], "m": int64[V] (micro log-odds),
    "oov_m": int, "prior_m": int, "vocab": V}``.

    ``label_col`` must be boolean (or 0/1) and non-null; a corpus
    where either class is empty raises (the prior is undefined)."""

    def partial(batch: pa.Table) -> pa.Table:
        y_col = batch[label_col]
        if y_col.null_count:
            raise ValueError(
                f"train_nb: label column {label_col!r} has nulls")
        y = pc.cast(y_col, pa.int64()).to_numpy(zero_copy_only=False)
        flat, lens = _tokenize(batch, text_col)
        y_rep = np.repeat(y, lens)
        t = (pa.table({"token": flat,
                       "y": pa.array(y_rep, type=pa.int64())})
             .group_by(["token"], use_threads=False)
             .aggregate([("y", "sum"), ([], "count_all")])
             .rename_columns(["token", "c1", "c"]))
        from ..stages.canonicalize import hash_mod

        sent_tok = pa.array([_TOT_KEY, _DOCS_KEY],
                            type=pa.large_string())
        tok = pa.concat_arrays(
            [t["token"].combine_chunks().cast(pa.large_string()),
             sent_tok])
        c1 = pa.concat_arrays(
            [t["c1"].combine_chunks().cast(pa.int64()),
             pa.array([int(y_rep.sum()), int(y.sum())],
                      type=pa.int64())])
        c = pa.concat_arrays(
            [t["c"].combine_chunks().cast(pa.int64()),
             pa.array([len(y_rep), len(y)], type=pa.int64())])
        return pa.table({"token": tok, "c1": c1, "c": c,
                         "__part": hash_mod(tok, num_parts)})

    def per_part(group: pa.Table) -> pa.Table:
        agg = (group.select(["token", "c1", "c"])
               .group_by(["token"], use_threads=False)
               .aggregate([("c1", "sum"), ("c", "sum")])
               .rename_columns(["token", "c1", "c"]))
        sent = pc.is_in(agg["token"], value_set=pa.array(
            [_TOT_KEY, _DOCS_KEY], type=pa.large_string()))
        keep = agg.filter(sent)
        top = (agg.filter(pc.invert(sent))
               .sort_by([("c", "descending"), ("token", "ascending")])
               .slice(0, vocab_size))
        return pa.concat_tables([top, keep])

    parts = (ds.select_columns([text_col, label_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(per_part, batch_format="pyarrow"))
    toks: list = []
    c1s: list = []
    cs: list = []
    T = T1 = D = D1 = 0
    for b in parts.iter_batches(batch_format="pyarrow",
                                batch_size=None):
        for t, c1, c in zip(b["token"].to_pylist(),
                            b["c1"].to_pylist(), b["c"].to_pylist()):
            if t == _TOT_KEY:
                T += c
                T1 += c1
            elif t == _DOCS_KEY:
                D += c
                D1 += c1
            else:
                toks.append(t)
                c1s.append(c1)
                cs.append(c)
    if D1 == 0 or D1 == D:
        raise ValueError(
            f"train_nb: degenerate labels ({D1}/{D} positive) — the "
            "class prior ln(n1/n0) is undefined")
    cs = np.asarray(cs, dtype=np.int64)
    c1s = np.asarray(c1s, dtype=np.int64)
    # global top-V (partitions token-disjoint; doc_nll tie contract)
    order = np.lexsort((np.asarray(toks, dtype=object), -cs))
    order = order[:vocab_size]
    V = len(order)
    T0, c0s = T - T1, cs - c1s
    # EXACT shape mirrored in SQL: ln((c1+1)/(T1+V)) − ln((c0+1)/(T0+V))
    d = (np.log((c1s[order] + 1) / (T1 + V))
         - np.log((c0s[order] + 1) / (T0 + V)))
    m = np.floor(d * 1e6 + 0.5).astype(np.int64)
    oov_m = int(np.floor(
        (np.log(1 / (T1 + V)) - np.log(1 / (T0 + V))) * 1e6 + 0.5))
    prior_m = int(np.floor(np.log(D1 / (D - D1)) * 1e6 + 0.5))
    h = _hash64(pa.array([toks[i] for i in order],
                         type=pa.large_string()))
    sort = np.argsort(h, kind="stable")
    return {"hash": h[sort], "m": m[sort], "oov_m": oov_m,
            "prior_m": prior_m, "vocab": V,
            "tok_total": (T1, T0), "doc_total": (D1, D - D1)}


def score_nb(ds, model, text_col: str = "text",
             id_col: str = "doc_id", score_col: str = "nb_n9",
             pred_col: str = "pred"):
    """Per-document NB log-odds score in exact integer nanos plus the
    boolean class prediction (``score > 0``).  ``model`` is a
    ``train_nb`` dict or a ``ray.ObjectRef`` to one — pass the ref so
    the table ships to plasma once.  0-token docs score the bare
    prior.  Output ``(id_col, n_tokens, score_col, pred_col)``."""

    def score(batch: pa.Table) -> pa.Table:
        tab = model
        import ray

        if isinstance(tab, ray.ObjectRef):
            tab = ray.get(tab)
        flat, lens = _tokenize(batch, text_col)
        n = batch.num_rows
        lens = np.asarray(lens, dtype=np.int64)
        sums = np.zeros(n, dtype=np.int64)
        if len(flat):
            tok_m = _broadcast_lookup(_hash64(flat), tab["hash"],
                                      tab["m"], tab["oov_m"])
            sums = _segment_sum(tok_m, lens, n, np.int64)
        total = (tab["prior_m"] + sums) * 1000
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(lens),
            score_col: pa.array(total.astype(np.int64)),
            pred_col: pa.array(total > 0),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
