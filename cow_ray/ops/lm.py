"""Unigram language-model perplexity scoring for corpus quality.

Semantics follow the published LLM-corpus practice (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", LREC 2020; also Brown et al. 2020 §2.2's quality filtering):
train a language model on the corpus (CCNet uses a KenLM 5-gram; this
is the documented unigram simplification — no external LM deps in the
env), then score every document's perplexity and bucket/filter on it.
Reference parity note: the reference engine has no LM scoring; this is
part of the §"beyond the reference" LLM-pipeline family, like
`ops/decontam.py`.

Scale shape (the part that matters at 100 TB):

* training is ONE vocabulary-keyed exchange: per-batch vectorized
  token counts (Arrow ``split_pattern_regex`` + ``group_by`` — the
  map-side partial collapses a Zipfian batch to its distinct tokens),
  hash-partitioned on token, per-partition sum + top-``vocab_size``
  truncation.  The driver pull is bounded by ``num_parts × vocab_size``
  rows (partitions are disjoint by token, so the global top-V is the
  top-V of the per-partition top-Vs); corpus total-token counts ride
  along as exact per-partition sentinel sums, so OOV mass is priced
  correctly no matter how hard the tail is truncated.
* scoring is a single ``map_batches`` scan: the logprob table
  (sorted uint64 token hashes + float64 logprobs) broadcasts ONCE via
  ``ray.put``; lookups are ``np.searchsorted`` on the hash array and
  per-doc means are one segmented ``np.add.reduceat``.  No shuffle
  touches the corpus side.

Token→uint64 hashing uses the same polars 64-bit hash as
`stages/canonicalize.hash_mod` — internal only (the table is built and
consumed inside one job; never compared across engines), with the
usual negligible-collision caveat.  Tokenization matches the repo-wide
DuckDB-parity contract: maximal ``[a-z0-9']+`` runs of lowered text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# sentinel token carrying each partition's PRE-truncation total count
_TOTAL_KEY = "\x00__total__"


def _hash64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Stable vectorized 64-bit token hash (polars; same primitive as
    canonicalize.hash_mod)."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return (pl.from_arrow(pa.chunked_array([arr.cast(pa.large_string())]))
            .hash(seed=0).to_numpy().astype(np.uint64))


def _tokenize(batch: pa.Table, text_col: str):
    """(flat tokens, per-doc lengths) with the repo tokenization
    contract — all Arrow kernels."""
    col = batch[text_col]
    if pa.types.is_null(col.type):  # all-None batch
        col = col.cast(pa.large_string())
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(col, "")), pattern="[^a-z0-9']+")
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    if len(flat) and not pc.all(keep).as_py():
        # recompute per-doc lengths over the non-empty tokens only
        n = batch.num_rows
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        doc_idx = doc_idx[keep.to_numpy(zero_copy_only=False)]
        lens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        flat = flat.filter(keep)
    return flat, lens


def _broadcast_lookup(h: np.ndarray, vocab_h: np.ndarray,
                      values: np.ndarray, default) -> np.ndarray:
    """Per-token value lookup against a sorted uint64 hash table;
    misses (and empty vocab) get ``default``.  Shared by the LM
    scorers here and ops/nbayes.py."""
    if len(vocab_h) == 0:
        return np.full(len(h), default,
                       dtype=np.asarray(values).dtype)
    pos = np.searchsorted(vocab_h, h)
    in_v = pos < len(vocab_h)
    pos_c = np.where(in_v, pos, 0)
    return np.where(in_v & (vocab_h[pos_c] == h), values[pos_c],
                    default)


def _segment_sum(values: np.ndarray, lens: np.ndarray, n: int,
                 dtype) -> np.ndarray:
    """Per-document sums over the flat token-value array.  reduceat
    rejects a start index == len(values), which happens whenever a
    batch's LAST doc has zero tokens — reduce over non-empty docs
    only (their starts are strictly increasing and in range) and
    scatter back."""
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    nz = lens > 0
    sums = np.zeros(n, dtype=dtype)
    if nz.any():
        sums[nz] = np.add.reduceat(values, starts[nz])
    return sums


def train_unigram_lm(ds, text_col: str = "text",
                     vocab_size: int = 65_536, num_parts: int = 32,
                     quantize: bool = False) -> dict:
    """Distributed exact top-``vocab_size`` unigram counts + corpus
    total, folded to a broadcast-ready logprob table ``{"hash":
    sorted uint64[V], "logp": float64[V], "unk": float}``.

    In-vocab: ``log(c / total)`` (MLE).  OOV: ``log(0.5 / total)`` —
    strictly below the rarest possible vocab entry (count 1), so
    truncation never *rewards* unseen tokens.

    ``quantize=True`` additionally stores MICRO-quantized logprobs as
    int64 (``m = floor(ln(c/total)·1e6 + 0.5)``, the ops/bm25.py
    pattern) under ``logp_micro`` / ``unk_micro`` and replaces
    ``logp`` with ``m/1e6`` — the exact-integer basis that lets
    per-document NLL hash-match a SQL oracle with zero float
    reassociation risk."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _tokenize(batch, text_col)
        t = (pa.table({"token": flat})
             .group_by(["token"], use_threads=False)
             .aggregate([([], "count_all")])
             .rename_columns(["token", "c"]))
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], type=pa.large_string()),
                             "c": pa.array([], type=pa.int64()),
                             "__part": pa.array([], type=pa.int32())})
        from ..stages.canonicalize import hash_mod

        return pa.table({
            "token": t["token"].cast(pa.large_string()),
            "c": pc.cast(t["c"], pa.int64()),
            "__part": hash_mod(t["token"], num_parts),
        })

    def per_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"token": pa.array([], type=pa.large_string()),
                             "c": pa.array([], type=pa.int64())})
        agg = (group.select(["token", "c"])
               .group_by(["token"], use_threads=False)
               .aggregate([("c", "sum")])
               .rename_columns(["token", "c"]))
        total = int(pc.sum(agg["c"]).as_py() or 0)
        top = (agg.sort_by([("c", "descending"), ("token", "ascending")])
               .slice(0, vocab_size))
        return pa.table({
            "token": pa.concat_arrays(
                [top["token"].combine_chunks().cast(pa.large_string()),
                 pa.array([_TOTAL_KEY], type=pa.large_string())]),
            "c": pa.concat_arrays(
                [top["c"].combine_chunks().cast(pa.int64()),
                 pa.array([total], type=pa.int64())]),
        })

    parts = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(per_part, batch_format="pyarrow"))
    toks: list = []
    counts: list = []
    total = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        tl = b["token"].to_pylist()
        cl = b["c"].to_pylist()
        for t, c in zip(tl, cl):
            if t == _TOTAL_KEY:
                total += c
            else:
                toks.append(t)
                counts.append(c)
    if total == 0:
        out = {"hash": np.empty(0, dtype=np.uint64),
               "logp": np.empty(0, dtype=np.float64),
               "unk": 0.0, "total": 0, "vocab": 0}
        if quantize:  # keys conditional so nll_scores' guard holds
            out["logp_micro"] = np.empty(0, dtype=np.int64)
            out["unk_micro"] = 0
        return out
    counts = np.asarray(counts, dtype=np.int64)
    # global top-V: partitions are token-disjoint, so per-partition
    # sums are final and a driver-side head over ≤ parts × V rows is
    # exact (ties broken by token for determinism)
    order = np.lexsort((np.asarray(toks, dtype=object), -counts))
    order = order[:vocab_size]
    tok_arr = pa.array([toks[i] for i in order], type=pa.large_string())
    h = _hash64(tok_arr)
    sort = np.argsort(h, kind="stable")
    out = {"hash": h[sort],
           "logp": np.log(counts[order][sort] / total),
           "unk": float(np.log(0.5 / total)),
           "total": int(total), "vocab": len(order)}
    if quantize:
        m = np.floor(out["logp"] * 1e6 + 0.5).astype(np.int64)
        out["logp_micro"] = m
        out["logp"] = m / 1e6
        unk_m = int(np.floor(out["unk"] * 1e6 + 0.5))
        out["unk_micro"] = unk_m
        out["unk"] = unk_m / 1e6
    return out


def perplexity_scores(ds, lm, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Per-document unigram perplexity ``exp(-mean log p(tok))`` as a
    single broadcast-lookup scan.  ``lm`` is a table from
    ``train_unigram_lm`` or a ``ray.ObjectRef`` to one — pass the ref
    for real corpora so the table ships to plasma once, not once per
    task pickle.  Output: ``(id_col, n_tokens, ppl)``; 0-token docs get
    ``ppl = null``."""

    def score(batch: pa.Table) -> pa.Table:
        # plain task, not an actor pool: ray.get of an already-local
        # plasma object is ~µs and warm general-pool workers beat
        # actor cold start (see ops/decontam.py)
        tab = lm
        try:
            import ray

            if isinstance(tab, ray.ObjectRef):
                tab = ray.get(tab)
        except ImportError:  # pragma: no cover - ray always present
            pass
        flat, lens = _tokenize(batch, text_col)
        n = batch.num_rows
        if len(flat) == 0:
            return pa.table({
                id_col: batch[id_col],
                "n_tokens": pa.array(np.zeros(n, dtype=np.int64)),
                "ppl": pa.nulls(n, type=pa.float64()),
            })
        lp = _broadcast_lookup(_hash64(flat), tab["hash"],
                               tab["logp"], tab["unk"])
        lens = np.asarray(lens, dtype=np.int64)
        sums = _segment_sum(lp, lens, n, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.exp(-sums / lens)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(lens.astype(np.int64)),
            "ppl": pa.array(np.where(lens > 0, ppl, np.nan),
                            mask=(lens == 0)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def nll_scores(ds, lm, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document negative log-likelihood in exact integer NANOS —
    the hash-oracled sibling of :func:`perplexity_scores`.  Requires a
    ``train_unigram_lm(..., quantize=True)`` table: each token costs
    ``-m · 1000`` nanos (``m`` = micro-quantized logprob, so the
    product is an exact small integer) and the per-doc sum is
    order-free.  Output ``(id_col, n_tokens, nll_n9)`` — all int64,
    zero float risk; 0-token docs score 0.  Perplexity is the
    monotone transform ``exp(nll_n9 / (1e9 · n_tokens))`` — derive it
    downstream when a float is wanted."""

    def score(batch: pa.Table) -> pa.Table:
        tab = lm
        try:
            import ray

            if isinstance(tab, ray.ObjectRef):
                tab = ray.get(tab)
        except ImportError:  # pragma: no cover
            pass
        if "logp_micro" not in tab:
            raise ValueError(
                "nll_scores needs train_unigram_lm(quantize=True)")
        flat, lens = _tokenize(batch, text_col)
        n = batch.num_rows
        lens = np.asarray(lens, dtype=np.int64)
        if len(flat) == 0:
            return pa.table({
                id_col: batch[id_col],
                "n_tokens": pa.array(np.zeros(n, dtype=np.int64)),
                "nll_n9": pa.array(np.zeros(n, dtype=np.int64))})
        m = _broadcast_lookup(_hash64(flat), tab["hash"],
                              tab["logp_micro"], tab["unk_micro"])
        cost = -m * 1000  # exact: micros → nanos, sign flipped
        sums = _segment_sum(cost, lens, n, np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(lens),
            "nll_n9": pa.array(sums.astype(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


# ------------------------------------------------- bigram stupid backoff


#: micro-quantized ln(0.4) — the Stupid Backoff discount (Brants et
#: al., EMNLP 2007 §4: S(w2|w1) = c(w1 w2)/c(w1) if seen, else
#: α·S(w2), α = 0.4; "stupid" because it forgoes normalization for
#: web-scale trainability — exactly this engine's use case).
_ALPHA_MICRO = int(np.floor(np.log(0.4) * 1e6 + 0.5))

_BI_MISS = np.int64(np.iinfo(np.int64).min)


def _bigram_keys(flat, lens: np.ndarray):
    """Within-document adjacent-token pair keys ``"w1 w2"`` (tokens
    are ``[a-z0-9']+`` so the space separator is unambiguous and the
    SQL mirror is ``w1 || ' ' || w2``).  Returns (keys, rest_idx):
    ``rest_idx[i]`` is the flat index of key i's SECOND token."""
    import pyarrow.compute as _pc

    total = len(flat)
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    first = np.zeros(total, dtype=bool)
    nz = lens > 0
    first[starts[nz]] = True
    rest_idx = np.nonzero(~first)[0]
    if len(rest_idx) == 0:
        return pa.array([], type=pa.large_string()), rest_idx
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    w1 = flat.take(pa.array(rest_idx - 1))
    w2 = flat.take(pa.array(rest_idx))
    return _pc.binary_join_element_wise(
        w1.cast(pa.large_string()), w2.cast(pa.large_string()),
        pa.scalar(" ", pa.large_string())
    ), rest_idx


def train_bigram_lm(ds, text_col: str = "text",
                    vocab_size: int = 4096, bigram_size: int = 16384,
                    num_parts: int = 32) -> dict:
    """Stupid-Backoff bigram model in ONE corpus scan + ONE
    string-keyed exchange: per-batch partials emit unigram tokens and
    ``"w1 w2"`` bigram keys into the SAME exchange (token strings
    never contain spaces, so the two keyspaces are disjoint);
    partitions are key-disjoint, making per-partition top-V/top-B
    exact, and the driver merges ≤ ``parts × (V + B)`` rows.

    Quantization contract (the ``doc_nll`` pattern): unigram
    ``m = floor(ln(c/total)·1e6 + 0.5)``; a bigram is scoreable iff it
    is in the global top-``bigram_size`` (count desc, key asc ties)
    AND its ``w1`` made the unigram top-``vocab_size`` — then
    ``m_bi = floor(ln(c_bi/c_w1)·1e6 + 0.5)``; everything else backs
    off to ``α + unigram`` in exact integer micros."""

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.canonicalize import hash_mod

        flat, lens = _tokenize(batch, text_col)
        empty = pa.table({"key": pa.array([], type=pa.large_string()),
                          "c": pa.array([], type=pa.int64()),
                          "kind": pa.array([], type=pa.int8()),
                          "__part": pa.array([], type=pa.int32())})
        if len(flat) == 0:
            return empty
        bkeys, _ = _bigram_keys(flat, lens)
        tabs = []
        for kind, keys in ((0, flat), (1, bkeys)):
            if len(keys) == 0:
                continue
            t = (pa.table({"key": keys})
                 .group_by(["key"], use_threads=False)
                 .aggregate([([], "count_all")])
                 .rename_columns(["key", "c"]))
            tabs.append(pa.table({
                "key": t["key"].cast(pa.large_string()),
                "c": pc.cast(t["c"], pa.int64()),
                "kind": pa.array(
                    np.full(t.num_rows, kind, dtype=np.int8)),
            }))
        if not tabs:
            return empty
        out = pa.concat_tables(tabs)
        return out.append_column("__part", hash_mod(out["key"], num_parts))

    def per_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], type=pa.large_string()),
                          "c": pa.array([], type=pa.int64()),
                          "kind": pa.array([], type=pa.int8())})
        if group.num_rows == 0:
            return empty
        agg = (group.select(["key", "kind", "c"])
               .group_by(["key", "kind"], use_threads=False)
               .aggregate([("c", "sum")])
               .rename_columns(["key", "kind", "c"]))
        outs = []
        for kind, cap in ((0, vocab_size), (1, bigram_size)):
            sub = agg.filter(pc.equal(agg["kind"], kind))
            if sub.num_rows == 0:
                continue
            top = (sub.sort_by([("c", "descending"), ("key", "ascending")])
                   .slice(0, cap))
            outs.append(top.select(["key", "c", "kind"]))
            if kind == 0:
                total = int(pc.sum(sub["c"]).as_py() or 0)
                outs.append(pa.table({
                    "key": pa.array([_TOTAL_KEY], pa.large_string()),
                    "c": pa.array([total], pa.int64()),
                    "kind": pa.array([0], pa.int8())}))
        return (pa.concat_tables(outs).combine_chunks() if outs
                else empty)

    parts = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(per_part, batch_format="pyarrow"))

    uni_k: list = []
    uni_c: list = []
    bi_k: list = []
    bi_c: list = []
    total = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for k, c, kd in zip(b["key"].to_pylist(), b["c"].to_pylist(),
                            b["kind"].to_pylist()):
            if kd == 0:
                if k == _TOTAL_KEY:
                    total += c
                else:
                    uni_k.append(k)
                    uni_c.append(c)
            else:
                bi_k.append(k)
                bi_c.append(c)

    out = {"hash": np.empty(0, dtype=np.uint64),
           "logp_micro": np.empty(0, dtype=np.int64),
           "unk_micro": 0,
           "bi_hash": np.empty(0, dtype=np.uint64),
           "bi_micro": np.empty(0, dtype=np.int64),
           "alpha_micro": _ALPHA_MICRO,
           "total": int(total), "vocab": 0, "bigrams": 0}
    if total == 0:
        return out

    uni_c_a = np.asarray(uni_c, dtype=np.int64)
    order = np.lexsort((np.asarray(uni_k, dtype=object), -uni_c_a))
    order = order[:vocab_size]
    vocab_tok = [uni_k[i] for i in order]
    vocab_cnt = uni_c_a[order]
    m_uni = np.floor(
        np.log(vocab_cnt / total) * 1e6 + 0.5).astype(np.int64)
    h = _hash64(pa.array(vocab_tok, type=pa.large_string()))
    s = np.argsort(h, kind="stable")
    out["hash"], out["logp_micro"] = h[s], m_uni[s]
    out["unk_micro"] = int(np.floor(np.log(0.5 / total) * 1e6 + 0.5))
    out["vocab"] = len(vocab_tok)
    w1_count = dict(zip(vocab_tok, vocab_cnt.tolist()))

    if bi_k:
        bi_c_a = np.asarray(bi_c, dtype=np.int64)
        order = np.lexsort((np.asarray(bi_k, dtype=object), -bi_c_a))
        order = order[:bigram_size]
        keys, ms = [], []
        for i in order:
            k = bi_k[i]
            cw1 = w1_count.get(k.split(" ", 1)[0])
            if cw1 is None:  # w1 fell out of the unigram vocab
                continue
            keys.append(k)
            ms.append(int(np.floor(
                np.log(bi_c_a[i] / cw1) * 1e6 + 0.5)))
        if keys:
            h = _hash64(pa.array(keys, type=pa.large_string()))
            ms = np.asarray(ms, dtype=np.int64)
            s = np.argsort(h, kind="stable")
            out["bi_hash"], out["bi_micro"] = h[s], ms[s]
            out["bigrams"] = len(keys)
    return out


def bigram_nll_scores(ds, lm, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Per-document Stupid-Backoff NLL in exact integer nanos, one
    broadcast-lookup scan (``lm`` from :func:`train_bigram_lm`,
    optionally a ``ray.ObjectRef``).  Cost model: each document's
    first token pays its unigram micro-cost; every later token pays
    the bigram micro-cost when its ``(w1, w2)`` is in the model, else
    ``α + unigram(w2)`` — all integers, order-free sums.  Output
    ``(id_col, n_tokens, nll2_n9)``."""

    def score(batch: pa.Table) -> pa.Table:
        tab = lm
        try:
            import ray

            if isinstance(tab, ray.ObjectRef):
                tab = ray.get(tab)
        except ImportError:  # pragma: no cover
            pass
        flat, lens = _tokenize(batch, text_col)
        n = batch.num_rows
        lens = np.asarray(lens, dtype=np.int64)
        if len(flat) == 0:
            return pa.table({
                id_col: batch[id_col],
                "n_tokens": pa.array(np.zeros(n, dtype=np.int64)),
                "nll2_n9": pa.array(np.zeros(n, dtype=np.int64))})
        m_uni = _broadcast_lookup(_hash64(flat), tab["hash"],
                                  tab["logp_micro"], tab["unk_micro"])
        bkeys, rest_idx = _bigram_keys(flat, lens)
        cost = np.empty(len(flat), dtype=np.int64)
        cost[:] = -m_uni * 1000  # first-of-doc positions keep this
        if len(rest_idx):
            m_bi = _broadcast_lookup(
                _hash64(bkeys), tab["bi_hash"], tab["bi_micro"],
                _BI_MISS)
            backoff = -(m_uni[rest_idx] + tab["alpha_micro"]) * 1000
            cost[rest_idx] = np.where(
                m_bi != _BI_MISS, -m_bi * 1000, backoff)
        sums = _segment_sum(cost, lens, n, np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(lens),
            "nll2_n9": pa.array(sums.astype(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
