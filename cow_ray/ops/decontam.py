"""Benchmark n-gram decontamination for training corpora.

Semantics follow the published LLM-corpus practice (Brown et al. 2020
NeurIPS, appendix C; Rae et al. 2021 "Scaling Language Models" §A.4):
a *benchmark* (eval-set) corpus defines a set of word n-grams; any
training document containing one of those n-grams is contaminated and
gets flagged/dropped.

Scale shape (the part that matters at 100 TB):

* the benchmark side is small by nature (eval sets are MBs, not TBs) —
  its n-gram set is folded to a sorted ``uint64`` hash array on the
  driver (streamed, bounded by ``max_grams``) and **broadcast once via
  ``ray.put``**; every corpus task reads it zero-copy from the object
  store.  No shuffle touches the 100-TB side — decontamination is a
  single ``map_batches`` scan.
* membership is ``np.searchsorted`` on the sorted array (exact), or a
  bit-packed Bloom filter (``bloom_from_index``) when even the exact
  array is too big to broadcast — false-positive rate is configurable
  and one-sided (a Bloom hit set is a superset of the exact hit set),
  so the Bloom path over-drops slightly but never leaks contamination.

Tokenisation matches the repo-wide DuckDB-parity contract
(``ops/textstats.py``): tokens are maximal ``[a-z0-9']+`` runs of the
lowercased text.  Gram identity is a 64-bit polynomial hash over md5
token hashes — internal only (never compared across engines), with the
usual negligible-collision caveat.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# FNV-1a 64-bit prime as the polynomial base; uint64 arithmetic wraps
# mod 2**64 (numpy overflow is the defined behaviour here).
_POLY_P = np.uint64(0x100000001B3)
_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


class DecontamIndexTooLarge(RuntimeError):
    """The benchmark n-gram set exceeded ``max_grams`` — the contract
    is that the benchmark side is small; a benchmark this large should
    go through ``bloom_from_index`` on a pre-reduced gram table."""


class _GramHasher:
    """Per-actor tokenizer + n-gram hasher with a token→md5 memo
    (web-text vocabularies are zipfian, so hashing amortises)."""

    def __init__(self, n: int):
        self.n = n
        self.word_re = re.compile(r"[a-z0-9']+")
        self._memo: dict[str, np.uint64] = {}
        self._pows = _POLY_P ** np.arange(n - 1, -1, -1, dtype=np.uint64)

    def _th(self, tok: str) -> np.uint64:
        v = self._memo.get(tok)
        if v is None:
            v = self._memo[tok] = np.uint64(int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"))
        return v

    def doc_grams(self, text: str | None) -> np.ndarray:
        """Distinct n-gram hashes of one document (uint64, unsorted
        input → returned unique-sorted)."""
        toks = self.word_re.findall((text or "").lower())
        if len(toks) < self.n:
            return np.empty(0, dtype=np.uint64)
        th = np.fromiter((self._th(t) for t in toks), dtype=np.uint64,
                         count=len(toks))
        win = np.lib.stride_tricks.sliding_window_view(th, self.n)
        return np.unique((win * self._pows).sum(axis=1, dtype=np.uint64))


def build_ngram_index(ds, text_col: str = "text", n: int = 4,
                      max_grams: int = 32_000_000) -> np.ndarray:
    """Fold the benchmark corpus to a sorted unique uint64 gram-hash
    array.  Distributed per-batch unique first, then a bounded driver
    stream — ``max_grams`` (default 32M ≈ 256 MB) guards the pull; a
    real eval suite is orders of magnitude below it."""

    def grams(batch: pa.Table) -> pa.Table:
        # plain task: the token memo only needs batch lifetime to pay
        # off (zipfian within a batch), and warm general-pool workers
        # beat an actor pool's cold start
        h = _GramHasher(n)
        txt = pc.fill_null(batch[text_col], "").to_pylist()
        if txt:
            g = np.unique(np.concatenate([h.doc_grams(t) for t in txt]))
        else:
            g = np.empty(0, dtype=np.uint64)
        return pa.table({"gram": pa.array(g, type=pa.uint64())})

    parts, total = [], 0
    per_batch = ds.select_columns([text_col]).map_batches(
        grams, batch_format="pyarrow")
    for b in per_batch.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
        a = b["gram"].to_numpy(zero_copy_only=False)
        total += len(a)
        if total > max_grams:
            raise DecontamIndexTooLarge(
                f"benchmark gram set exceeds max_grams={max_grams}; "
                "pre-reduce the benchmark or use bloom_from_index")
        parts.append(a)
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def bloom_from_index(index: np.ndarray, bits_per_gram: int = 16,
                     k: int = 4) -> dict:
    """Pack a gram-hash array into a Bloom filter (~``bits_per_gram``
    bits per gram → FP ≈ 0.0005 at 16/4).  Returns a plain dict so it
    ``ray.put``s as one plasma object."""
    m = int(max(64, len(index) * bits_per_gram))
    words = np.zeros((m + 63) // 64, dtype=np.uint64)
    g = index.astype(np.uint64, copy=False)
    h2 = (g * _BLOOM_MIX) | np.uint64(1)  # odd → full-period stepping
    for i in range(k):
        pos = (g + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return {"words": words, "m": m, "k": k}


def _bloom_hits(grams: np.ndarray, bloom: dict) -> np.ndarray:
    """Boolean mask of grams that pass the Bloom filter (vectorized)."""
    if not len(grams):
        return np.zeros(0, dtype=bool)
    words, m, k = bloom["words"], np.uint64(bloom["m"]), bloom["k"]
    g = grams.astype(np.uint64, copy=False)
    h2 = (g * _BLOOM_MIX) | np.uint64(1)
    hit = np.ones(len(g), dtype=bool)
    for i in range(k):
        pos = (g + np.uint64(i) * h2) % m
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        hit &= bit.astype(bool)
    return hit


def decontaminate(ds, index, text_col: str = "text", n: int = 4,
                  mode: str = "annotate", out_col: str = "n_hit"):
    """Flag (``mode="annotate"``: adds ``out_col`` = count of distinct
    benchmark grams present) or drop (``mode="drop"``: keeps only
    clean rows) contaminated documents.

    ``index`` is a sorted uint64 array, a Bloom dict from
    ``bloom_from_index``, or a ``ray.ObjectRef`` to either —
    pass the ref for real corpora so the index ships to plasma once,
    not once per task pickle."""
    if mode not in ("annotate", "drop"):
        raise ValueError(f"unknown decontaminate mode {mode!r}")

    def decon(batch: pa.Table) -> pa.Table:
        # plain task, not an actor pool: ray.get of an already-local
        # plasma object is ~µs, the token memo pays off within one
        # batch, and warm general-pool workers beat actor cold start
        idx = index
        try:
            import ray

            if isinstance(idx, ray.ObjectRef):
                idx = ray.get(idx)
        except ImportError:
            pass

        def hits_of(grams: np.ndarray) -> int:
            if isinstance(idx, dict):
                return int(_bloom_hits(grams, idx).sum())
            if not len(idx) or not len(grams):
                return 0
            pos = np.searchsorted(idx, grams)
            pos[pos == len(idx)] = 0
            return int((idx[pos] == grams).sum())

        h = _GramHasher(n)
        txt = pc.fill_null(batch[text_col], "").to_pylist()
        hits = np.fromiter(
            (hits_of(h.doc_grams(t)) for t in txt),
            dtype=np.int64, count=len(txt))
        if mode == "drop":
            return batch.filter(pa.array(hits == 0))
        return batch.append_column(
            out_col, pa.array(hits, type=pa.int64()))

    return ds.map_batches(decon, batch_format="pyarrow")
