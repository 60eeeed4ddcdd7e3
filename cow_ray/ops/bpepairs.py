"""BPE merge-candidate statistics — the inner step of byte-pair-
encoding tokenizer TRAINING (Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 §3.2):
count adjacent symbol pairs across the corpus vocabulary, weighted by
word frequency; the argmax pair is the next merge.  This operator
computes the first iteration's full candidate table (top-K pairs) —
the part that touches the corpus and therefore the part that has to
be distributed; subsequent merge iterations operate on the (small)
vocabulary alone, driver-side in any published implementation.

Scale shape:

* per-batch: tokenize (the repo's ``[a-z0-9']+`` DuckDB-parity
  contract), collapse to distinct words with local counts, then ONE
  vectorized char-pair pass over a single NUL-joined buffer
  (``np.frombuffer`` of UTF-32 — no per-word Python loop): pair keys
  are ``(cp1 << 32) | cp2`` uint64s, weights are word counts,
  batch-local sums via sort + ``reduceat``;
* ONE small int-keyed exchange of ``(pair_key, weight)`` partials;
  partitions are pair-disjoint so per-partition top-K is exact and
  the driver merges ``≤ parts × K`` rows (the ops/lm.py trainer
  contract), tie contract (count desc, c1 asc, c2 asc).

Pairs never cross a word boundary (BPE's invariant) — the NUL
separator masks them out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _tokenize

_SEP = np.uint32(0)  # NUL never appears in [a-z0-9']+ tokens


def _pair_partial(words: pa.Array, counts: np.ndarray):
    """(pair_key u64[], weight i64[]) — batch-local weighted adjacent
    char-pair sums over the distinct-word list."""
    if len(words) == 0:
        return (np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.int64))
    joined = "\x00".join(words.to_pylist())
    u = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if len(u) < 2:
        return (np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.int64))
    c1, c2 = u[:-1], u[1:]
    ok = (c1 != _SEP) & (c2 != _SEP)
    # word index of each position = NULs seen so far
    widx = np.cumsum(u == _SEP)[:-1]
    keys = ((c1[ok].astype(np.uint64) << np.uint64(32))
            | c2[ok].astype(np.uint64))
    w = counts[widx[ok]]
    order = np.argsort(keys, kind="stable")
    keys, w = keys[order], w[order]
    uk, starts = np.unique(keys, return_index=True)
    sums = np.add.reduceat(w, starts) if len(w) else w
    return uk, sums.astype(np.int64)


def bpe_pair_stats(ds, text_col: str = "text", top_k: int = 20,
                   num_parts: int = 16) -> pa.Table:
    """Corpus-wide weighted adjacent-char-pair counts, exact top-K.
    Returns an Arrow table ``(c1, c2, cnt)`` sorted by the tie
    contract (cnt desc, c1 asc, c2 asc)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _tokenize(batch, text_col)
        empty = pa.table({"k": pa.array([], pa.uint64()),
                          "w": pa.array([], pa.int64()),
                          "__part": pa.array([], pa.int32())})
        if len(flat) == 0:
            return empty
        wc = (pa.table({"w": flat})
              .group_by(["w"], use_threads=False)
              .aggregate([([], "count_all")]))
        words = wc["w"].combine_chunks()
        counts = wc["count_all"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        keys, sums = _pair_partial(words, counts)
        if len(keys) == 0:
            return empty
        return pa.table({
            "k": pa.array(keys, pa.uint64()),
            "w": pa.array(sums),
            "__part": pa.array((keys % num_parts).astype(np.int32))})

    def per_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.uint64()),
                          "w": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = g["w"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, w = k[order], w[order]
        uk, starts = np.unique(k, return_index=True)
        sums = np.add.reduceat(w, starts) if len(w) else w
        # exact local top-K under the global tie contract:
        # (cnt desc, c1 asc, c2 asc) == (cnt desc, key asc)
        order = np.lexsort((uk, -sums))[:top_k]
        return pa.table({"k": pa.array(uk[order], pa.uint64()),
                         "w": pa.array(sums[order].astype(np.int64))})

    parts = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(per_part, batch_format="pyarrow"))
    ks: list = []
    ws: list = []
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        ks.append(b["k"].to_numpy(zero_copy_only=False))
        ws.append(b["w"].to_numpy(zero_copy_only=False))
    if not ks or not sum(len(a) for a in ks):
        return pa.table({"c1": pa.array([], pa.string()),
                         "c2": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    k = np.concatenate(ks).astype(np.uint64)
    w = np.concatenate(ws).astype(np.int64)
    order = np.lexsort((k, -w))[:top_k]
    k, w = k[order], w[order]
    c1 = [chr(int(x >> np.uint64(32))) for x in k]
    c2 = [chr(int(x & np.uint64(0xFFFFFFFF))) for x in k]
    return pa.table({"c1": pa.array(c1, pa.string()),
                     "c2": pa.array(c2, pa.string()),
                     "cnt": pa.array(w)})
