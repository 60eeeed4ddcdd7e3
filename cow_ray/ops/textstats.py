"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

All are vectorized ``map_batches`` transforms over Arrow string columns
(``pyarrow.compute`` regex kernels); language-ID keeps its profile
table as per-call constant state (cheap — pure dicts).  Each has a
``queries()`` entry over the ``documents`` table; the SQL-expressible
ones (token/char counts, quality ratios, md5 fingerprint) are oracled
against DuckDB with bit-identical semantics (same RE2 regexes both
sides).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# shared regexes (RE2 syntax — identical strings are used in the DuckDB
# oracle SQL so both engines run the same pattern)
TOKEN_RE = r"\S+"
WORD_RE = r"[A-Za-z0-9_']+"
PUNCT_RE = r"[.,;:!?]"
STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
# BPE-ish pre-tokenizer (GPT-2-style contractions + word/number/other
# runs, public pattern shape)
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds n_tokens (whitespace tokens), n_words, n_bpe (BPE-ish
    pieces), n_chars."""
    t = batch[text_col]
    batch = batch.append_column(
        "n_tokens", pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.int64())
    )
    batch = batch.append_column(
        "n_words", pc.cast(pc.count_substring_regex(t, WORD_RE), pa.int64())
    )
    batch = batch.append_column(
        "n_bpe", pc.cast(pc.count_substring_regex(t, BPE_RE), pa.int64())
    )
    batch = batch.append_column(
        "n_chars_calc", pc.cast(pc.utf8_length(t), pa.int64())
    )
    return batch


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length/punctuation/stopword quality signals (the classic cheap
    web-text filters).

    The cross-engine-comparable columns are integer ppm (parts per
    million), computed as ``floor(1e6 * a / b)`` — float division and
    multiplication are correctly-rounded IEEE ops in every engine, and
    ``floor`` has no round-half ambiguity, so DuckDB reproduces them
    bit-identically (``round()`` would not: Arrow rounds half-to-even,
    DuckDB half-away-from-zero — 1/128 = 0.0078125 disagrees at 6
    digits).  Convenience float ratios are also attached."""
    t = batch[text_col]
    n_tok = pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.float64())
    n_chars = pc.cast(pc.utf8_length(t), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(t, PUNCT_RE), pa.float64())
    n_stop = pc.cast(
        pc.count_substring_regex(pc.utf8_lower(t), STOPWORD_RE), pa.float64()
    )
    denom_tok = pc.max_element_wise(n_tok, 1.0)
    denom_chars = pc.max_element_wise(n_chars, 1.0)

    def ppm(num, den):
        return pc.cast(
            pc.floor(pc.multiply(pc.divide(num, den), 1e6)), pa.int64()
        )

    batch = batch.append_column("punct_ppm", ppm(n_punct, denom_chars))
    batch = batch.append_column("stop_ppm", ppm(n_stop, denom_tok))
    batch = batch.append_column("mean_token_len_ppm", ppm(n_chars, denom_tok))
    batch = batch.append_column("punct_ratio", pc.divide(n_punct, denom_chars))
    batch = batch.append_column("stop_ratio", pc.divide(n_stop, denom_tok))
    batch = batch.append_column("mean_token_len", pc.divide(n_chars, denom_tok))
    return batch


def md5_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    """Content fingerprint = md5 hex of the utf-8 text (matches
    DuckDB's ``md5()``).  Hashes straight off the Arrow string buffer
    via ops/md5np.py — no per-row Python string; the hash itself runs
    in OpenSSL for multi-block texts and in the numpy lane kernel for
    short ones.  Nulls fingerprint as the empty string (the existing
    ``v or ""`` contract)."""
    from .md5np import md5_hex_arrow

    col = pc.fill_null(batch[text_col], "")
    return batch.append_column(out_col, md5_hex_arrow(col))


def token_doc_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Map-side combiner for token document frequency: lowercase →
    regex-split → per-document distinct tokens → per-batch partial
    counts, all with Arrow kernels (split_pattern_regex + a two-level
    hash group_by; documents never span batches, so batch-local
    per-doc distinct is exact).  The groupby exchange then carries one
    row per (token, batch) — vocabulary-sized, not corpus-sized.

    Tokenization contract (mirrored by the DuckDB oracle):
    ``lower(text)`` split on ``[^a-z0-9']+``, empty fragments
    dropped."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "df": pa.array([], type=pa.int64())})
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(batch[text_col], "")), pattern="[^a-z0-9']+"
    )
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), lens))
    pairs = pa.table({"d": doc_idx, "token": flat}).filter(
        pc.not_equal(flat, "")
    )
    distinct = (
        pairs.group_by(["d", "token"], use_threads=False)
        .aggregate([([], "count_all")])
        .select(["token"])
    )
    partial = (
        distinct.group_by(["token"], use_threads=False)
        .aggregate([([], "count_all")])
    )
    return partial.select(["token", "count_all"]).rename_columns(
        ["token", "df"])


def token_doc_freq(ds, text_col: str = "text", limit: int = 50):
    """Corpus-wide token document frequency, top ``limit`` by
    (df desc, token asc) — the vocabulary-statistics building block
    (IDF tables, stopword discovery).  One vocabulary-keyed groupby
    after the map-side partial; the sort input is vocabulary-sized."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(
            lambda b: token_doc_partial(b, text_col), batch_format="pyarrow"
        )
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .sort(["df", "token"], descending=[True, False])
        .limit(limit)
    )


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al., "Scaling
    Language Models: ... Gopher", 2021 — the canonical LLM-corpus
    repetition filters): per document, the duplicate-LINE and
    duplicate-WORD fractions as exact floor-ppm integers
    (``(1e6*(n-distinct)) // n`` — pure integer arithmetic, so the
    DuckDB oracle matches bit-for-bit).  Vectorized end-to-end with
    polars list kernels (split/extract_all + list.len/n_unique); no
    per-row Python."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", text_col]))
    t = pl.col(text_col).fill_null("")
    lines = t.str.split("\n")
    words = t.str.extract_all(WORD_RE)
    stats = df.select(
        pl.col("doc_id"),
        lines.list.len().cast(pl.Int64).alias("n_lines"),
        lines.list.n_unique().cast(pl.Int64).alias("u_lines"),
        words.list.len().cast(pl.Int64).alias("n_words"),
        words.list.n_unique().cast(pl.Int64).alias("u_words"),
    ).with_columns(
        pl.when(pl.col("n_lines") > 0)
        .then((1_000_000 * (pl.col("n_lines") - pl.col("u_lines")))
              // pl.col("n_lines"))
        .otherwise(0).alias("dup_line_ppm"),
        pl.when(pl.col("n_words") > 0)
        .then((1_000_000 * (pl.col("n_words") - pl.col("u_words")))
              // pl.col("n_words"))
        .otherwise(0).alias("dup_word_ppm"),
    ).select(["doc_id", "n_lines", "n_words", "dup_line_ppm",
              "dup_word_ppm"])
    out = stats.to_arrow()
    return out.cast(pa.schema([
        ("doc_id", batch.schema.field("doc_id").type),
        ("n_lines", pa.int64()), ("n_words", pa.int64()),
        ("dup_line_ppm", pa.int64()), ("dup_word_ppm", pa.int64()),
    ]))


# GPT-2-style BPE pre-tokenizer pattern (Radford et al. 2019), RE2-safe
# variant: the original's `\s+(?!\S)` lookahead is unsupported by RE2,
# so trailing-space merging is approximated by a plain `\s+` branch —
# token COUNTS differ from the exact pattern only on runs of interior
# whitespace followed by non-space, where this variant counts one
# whitespace token instead of splitting the last space onto the next
# word.  Both Arrow and DuckDB run RE2, so the count is cross-engine
# exact by construction.
BPE_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+"
          r"| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token count per document: matches of the GPT-2
    pre-tokenizer regex (RE2-safe variant, see ``BPE_RE``) — the
    standard cheap proxy for LLM token budgets at corpus scale (the
    real tokenizer's merges only ever SPLIT these pre-tokens
    further)."""
    t = pc.fill_null(batch[text_col], "")
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bpe_tokens": pc.cast(
            pc.count_substring_regex(t, BPE_RE), pa.int64()
        ),
    })


def c4_line_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """C4-style line-level quality signals (Raffel et al., "Exploring
    the Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", 2020 — the C4 cleaning heuristics): per document,
    the fraction of lines ending in terminal punctuation, the fraction
    of short lines (< 3 words), and the boilerplate flags the C4
    recipe drops on (``lorem ipsum``, curly braces).  Fractions are
    exact floor-ppm integers (integer arithmetic → DuckDB-hash-stable);
    vectorized with polars list kernels."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", text_col]))
    t = pl.col(text_col).fill_null("")
    lines = t.str.split("\n")
    term = lines.list.eval(
        pl.element().str.contains(r'[.!?"]\s*$')
    ).list.sum()
    short = lines.list.eval(
        pl.element().str.count_matches(WORD_RE) < 3
    ).list.sum()
    stats = df.select(
        pl.col("doc_id"),
        lines.list.len().cast(pl.Int64).alias("n_lines"),
        term.cast(pl.Int64).alias("t_lines"),
        short.cast(pl.Int64).alias("s_lines"),
        t.str.to_lowercase().str.contains("lorem ipsum", literal=True)
        .cast(pl.Int64).alias("has_lorem"),
        t.str.contains("{", literal=True).cast(pl.Int64)
        .alias("has_brace"),
    ).with_columns(
        ((1_000_000 * pl.col("t_lines")) // pl.col("n_lines"))
        .alias("term_punct_ppm"),
        ((1_000_000 * pl.col("s_lines")) // pl.col("n_lines"))
        .alias("short_line_ppm"),
    ).select(["doc_id", "n_lines", "term_punct_ppm", "short_line_ppm",
              "has_lorem", "has_brace"])
    return stats.to_arrow().cast(pa.schema([
        ("doc_id", batch.schema.field("doc_id").type),
        ("n_lines", pa.int64()), ("term_punct_ppm", pa.int64()),
        ("short_line_ppm", pa.int64()), ("has_lorem", pa.int64()),
        ("has_brace", pa.int64()),
    ]))


def bigram_entropy(batch: pa.Table, text_col: str = "text",
                   out_col: str = "entropy_mbits") -> pa.Table:
    """Character-bigram Shannon entropy per document, in integer
    milli-bits (floor) — the classic cheap gibberish/boilerplate
    signal: natural language sits ~5-8 bits/bigram, random bytes near
    the ceiling, single-char spam near 0.  Per-doc numpy (byte-pair
    codes → np.unique counts → p·log2 p); rows-only at the driver
    gate (a float log-sum is not hash-stable cross-engine)."""
    out = []
    for v in batch[text_col].to_pylist():
        data = np.frombuffer((v or "").encode("utf-8"), dtype=np.uint8)
        if len(data) < 2:
            out.append(0)
            continue
        codes = data[:-1].astype(np.uint32) * 256 + data[1:]
        _, counts = np.unique(codes, return_counts=True)
        p = counts / counts.sum()
        h = float(-(p * np.log2(p)).sum())
        out.append(int(np.floor(h * 1000)))
    return batch.append_column(out_col, pa.array(out, type=pa.int64()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        window: int = 16, out_col: str = "roll_fp") -> pa.Table:
    """Rabin-Karp-style rolling-hash document fingerprint: min of the
    rolling window hashes (a winnowing-style representative).  Pure
    numpy per row; deterministic; not SQL-expressible (rows-only
    check)."""
    B = np.uint64(1000003)
    out = []
    for v in batch[text_col].to_pylist():
        data = np.frombuffer((v or "").encode("utf-8"), dtype=np.uint8)
        if len(data) < window:
            h = np.uint64(0)
            for b in data.astype(np.uint64):
                h = h * B + b
            out.append(int(h))
            continue
        powers = B ** np.arange(window, dtype=np.uint64)[::-1]
        strided = np.lib.stride_tricks.sliding_window_view(
            data.astype(np.uint64), window
        )
        hashes = (strided * powers).sum(axis=1, dtype=np.uint64)
        out.append(int(hashes.min()))
    return batch.append_column(out_col, pa.array(out, type=pa.uint64()))


# ---- language identification (n-gram/stopword heuristic) ----

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to", "was", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "es": ("el", "los", "las", "es", "una", "que", "por"),
    "nl": ("de", "het", "een", "en", "niet", "voor", "zijn"),
}


class LangId:
    """Actor-pool UDF: heuristic language ID.  Profiles + compiled
    per-language regexes built once per actor; per batch it's one
    vectorized count per language + a CJK codepoint test."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.lang_res = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in _LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch[self.text_col])
        n = batch.num_rows
        scores = np.zeros((len(self.lang_res), n), dtype=np.int64)
        langs = list(self.lang_res)
        for i, lang in enumerate(langs):
            scores[i] = pc.count_substring_regex(
                t, self.lang_res[lang]
            ).to_numpy(zero_copy_only=False)
        # CJK: any codepoint in the unified-ideograph block → "zh"
        cjk = pc.count_substring_regex(t, r"[\x{4E00}-\x{9FFF}]").to_numpy(
            zero_copy_only=False
        )
        best = np.asarray(langs)[scores.argmax(axis=0)]
        best = np.where(scores.max(axis=0) == 0, "und", best)
        best = np.where(cjk > 0, "zh", best)
        return batch.append_column(
            self.out_col, pa.array(best.tolist(), type=pa.string())
        )


def tfidf_topterms(ds, k: int = 3, vocab_limit: int = 200,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Per-document top-k terms by tf·idf (Spärck Jones 1972) over a
    bounded vocabulary — the keyword-extraction building block.

    Contract (mirrored by the SQL oracle, hash-exact):

    * vocabulary = top ``vocab_limit`` tokens by (df desc, token asc)
      under the shared tokenizer contract (token_doc_partial) —
      bounded, so the idf table broadcasts;
    * ``idf = ln(N / df)`` quantized to micros (the one libm op —
      same per-term boundary argument as ops/bm25.py);
    * ``score = tf · idf`` is an exact double (int × micro-quantized
      value, product < 2^53), so cross-engine ordering and hashing
      are deterministic; per-doc rank ties break on token asc.

    ONE corpus scan, zero corpus exchange: documents never span
    batches, so each batch emits its own docs' top-k directly; the
    only other traffic is the vocabulary-sized df rollup."""
    import ray

    n_docs = ds.count()
    vocab_rows = token_doc_freq(ds, text_col=text_col,
                                limit=vocab_limit).take_all()
    if not vocab_rows or n_docs == 0:
        return ds.select_columns([id_col]).limit(0)
    toks = [r["token"] for r in vocab_rows]
    dfs = np.array([r["df"] for r in vocab_rows], dtype=np.float64)
    idf_q = np.floor(np.log(float(n_docs) / dfs) * 1e6 + 0.5) / 1e6
    t_arr = pa.array(toks, type=pa.string())
    # batch-invariant vocab artifacts computed ONCE: ascii tiebreak
    # ranks + the object-dtype token array (recomputing these per
    # batch was pure repeated work on the scan path)
    tok_np = np.asarray(toks, dtype=object)
    tok_rank = np.empty(len(toks), dtype=np.int64)
    tok_rank[np.argsort(np.asarray(toks))] = np.arange(len(toks))
    handle = ray.put((t_arr, idf_q, tok_np, tok_rank))

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("token", pa.string()),
                            ("score", pa.float64()),
                            ("rank", pa.int64())])

    def per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        terms, idf, tok_np_w, tok_rank_w = ray.get(handle)
        n = batch.num_rows
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        split = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(batch[text_col], "")),
            pattern="[^a-z0-9']+")
        flat = pc.list_flatten(split)
        lens = pc.list_value_length(split).to_numpy(
            zero_copy_only=False)
        d_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), lens))
        pairs = pa.table({"d": d_idx, "token": flat}).filter(
            pc.and_(pc.not_equal(flat, ""),
                    pc.is_in(flat, value_set=terms)))
        if pairs.num_rows == 0:
            return out_schema.empty_table()
        pairs = pairs.append_column(
            "one", pa.array(np.ones(pairs.num_rows, dtype=np.int64)))
        tf_tbl = pairs.group_by(["d", "token"], use_threads=False
                                ).aggregate([("one", "sum")])
        d = tf_tbl["d"].to_numpy(zero_copy_only=False)
        ti = pc.index_in(tf_tbl["token"], value_set=terms).to_numpy(
            zero_copy_only=False)
        tf = tf_tbl["one_sum"].to_numpy(zero_copy_only=False)
        score = tf * idf[ti]
        # numeric tiebreak surrogate: rank of each vocab token in
        # ascending string order (tokens are ascii, so numpy/DuckDB
        # orderings agree); precomputed once on the driver
        order = np.lexsort((tok_rank_w[ti], -score, d))
        tok_strings = tok_np_w[ti]
        d_s, score_s, tok_s = d[order], score[order], tok_strings[order]
        starts = np.r_[True, d_s[1:] != d_s[:-1]]
        pos = np.arange(len(d_s)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(d_s)), 0))
        keep = pos < k
        return pa.table(
            {id_col: pa.array(ids[d_s[keep]], type=pa.int64()),
             "token": pa.array(tok_s[keep], type=pa.string()),
             "score": pa.array(score_s[keep], type=pa.float64()),
             "rank": pa.array((pos[keep] + 1).astype(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow")


def compression_stats(batch: pa.Table, text_col: str = "text",
                      level: int = 6) -> pa.Table:
    """Per-document zlib compressibility — the repetitiousness signal
    the published quality filters use alongside the Gopher rules
    (highly compressible text is templated/boilerplate; nearly
    incompressible text is often binary junk or hash soup).

    The per-document ``zlib.compress`` call is inherent — DEFLATE is a
    sequential C routine over each payload, the same contract class as
    the md5 fingerprints; everything around it stays Arrow.  Output
    appends ``raw_bytes``, ``comp_bytes`` and ``compress_ppm``
    (``comp/raw`` in parts-per-million, exact int64 — deterministic
    for a fixed zlib/level); empty docs get null ``compress_ppm``."""
    import zlib

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):  # all-None block
        col = col.cast(pa.string())
    texts = pc.fill_null(col, "").to_pylist()
    raw = np.empty(len(texts), dtype=np.int64)
    comp = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, level))
    with np.errstate(divide="ignore", invalid="ignore"):
        ppm = np.where(raw > 0, comp * 1_000_000 // np.maximum(raw, 1),
                       0)
    return (batch.append_column("raw_bytes", pa.array(raw))
            .append_column("comp_bytes", pa.array(comp))
            .append_column("compress_ppm",
                           pa.array(ppm, mask=(raw == 0))))
