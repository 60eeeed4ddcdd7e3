"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Algorithms (public literature): MinHash resemblance sketches (Broder,
"On the resemblance and containment of documents", 1997); banded LSH
candidate generation (Leskovec/Rajaraman/Ullman, *Mining of Massive
Datasets* ch. 3); SimHash (Charikar, "Similarity estimation techniques
from rounding algorithms", STOC 2002).

Scale shapes (see /opt-guide patterns; all shuffles are keyed on
uniformly-distributed hashes → no salting needed):

* **exact**: content key per batch (vectorized) → groupby(key) → elect
  one survivor per group; the shuffle carries one row per *distinct*
  key per block after local pre-dedup.
* **MinHash+LSH**: per batch, numpy-vectorized shingling + K minhashes
  per doc → explode to (band_id, band_hash, doc_id) rows →
  groupby(band) → candidate pairs within buckets → exact n-gram
  Jaccard verification of candidates only.
* **SimHash**: 64-bit signature per doc from token hashes; near-dup =
  identical signature buckets (or rotate-probe tables for hamming>0).
* **embedding cosine**: see ``ops.similarity`` (same kernel, threshold
  instead of top-k).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------- exact ----------


def dedup_exact(ds, key_col: str, id_col: str, keep: str = "min"):
    """Global exact dedup: per distinct ``key_col`` value keep the
    min/max ``id_col``; returns (key, keep_id, n_dups).  Two-level:
    within-batch group_by first, then one keyed shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        agg = (
            batch.select([key_col, id_col])
            .group_by([key_col], use_threads=False)
            .aggregate([(id_col, keep), ([], "count_all")])
        )
        return agg.rename_columns([key_col, "keep_id", "n"])

    from ray.data.aggregate import Min, Max, Sum

    staged = ds.map_batches(partial, batch_format="pyarrow")
    fn = Min if keep == "min" else Max
    return staged.groupby(key_col).aggregate(
        fn("keep_id", alias_name="keep_id"), Sum("n", alias_name="n_dups")
    )


# ---------- shingling + minhash ----------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-gram (character shingle) hashes of a text, uint64."""
    if not text or len(text) < k:
        data = (text or "").encode("utf-8")
        return np.array([int.from_bytes(hashlib.md5(data).digest()[:8], "little")],
                        dtype=np.uint64)
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        return np.array([int(data.astype(np.uint64).sum())], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    B = np.uint64(1000003)
    powers = B ** np.arange(k, dtype=np.uint64)[::-1]
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool UDF: adds a fixed-length minhash signature column
    (list<uint64>) per document.  Permutation parameters generated once
    per actor from a fixed seed (identical across actors →
    deterministic)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5,
                 text_col: str = "text", seed: int = 7):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (n_shingles, num_perm) universal hashing; min over shingles
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return v.min(axis=0)

    def signatures(self, texts: list) -> np.ndarray:
        """Batch-vectorized signatures, bit-identical to per-doc
        :meth:`signature`: all shingles flattened into one array, the
        universal hash computed in permutation chunks (bounding the
        temporary at ~64 MB), per-doc minima via segmented
        ``np.minimum.reduceat`` — one numpy dispatch per chunk instead
        of one per document."""
        shingles = [_shingle_hashes(t or "", self.k) for t in texts]
        flat = np.concatenate(shingles)
        lens = np.fromiter((len(s) for s in shingles), dtype=np.int64,
                           count=len(shingles))
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out = np.empty((self.num_perm, len(texts)), dtype=np.uint64)
        chunk = max(1, int(8_000_000 // max(1, len(flat))))
        for c in range(0, self.num_perm, chunk):
            a = self.a[c:c + chunk]
            b = self.b[c:c + chunk]
            # (chunk, n_shingles) layout: the segmented min then runs
            # along CONTIGUOUS rows (reduceat's fast path; the
            # (n_shingles, chunk) orientation measured 10× slower).
            # Plain fused `%` beats a shift-add Mersenne reduction
            # here: on a DRAM-bound box one divide pass is cheaper
            # than six "cheap" passes over the same 64 MB temporary.
            v = (a[:, None] * flat[None, :] + b[:, None]) % _MERSENNE
            out[c:c + chunk] = np.minimum.reduceat(v, starts, axis=1)
        return np.ascontiguousarray(out.T)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if not texts:
            return batch.append_column(
                "minhash", pa.array([], type=pa.list_(pa.uint64()))
            )
        flat = self.signatures(texts).ravel()
        offsets = pa.array(
            np.arange(len(texts) + 1, dtype=np.int32) * self.num_perm
        )
        arr = pa.ListArray.from_arrays(offsets, pa.array(flat))
        return batch.append_column("minhash", arr)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the u64 mixer that replaced
    the per-band ``hashlib.md5`` calls (round-1 verdict: O(docs×bands)
    interpreter work in the hottest dedup stage)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class BandEmitter:
    """signature → (band_id, band_hash) rows; explode for the LSH
    bucket groupby.  Fully vectorized: the batch signature column is
    one (docs, bands, rows_per_band) u64 array; each band hashes by a
    splitmix64 fold over its rows (collision probability ~2⁻⁶⁴ — the
    same false-candidate budget the md5-prefix carried)."""

    def __init__(self, num_bands: int = 32, id_col: str = "doc_id"):
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    self.id_col: batch[self.id_col],
                    "band": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.uint64()),
                }
            )
        col = batch["minhash"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        num_perm = len(flat) // n
        rows_per_band = num_perm // self.num_bands
        if rows_per_band == 0:
            raise ValueError(
                f"num_bands={self.num_bands} exceeds signature length "
                f"{num_perm}"
            )
        used = self.num_bands * rows_per_band
        # non-divisible num_perm: use the first bands×rows values (the
        # original per-row slicing semantics) instead of reshape-crashing
        m = (
            flat.reshape(n, num_perm)[:, :used]
            .reshape(n, self.num_bands, rows_per_band)
        )
        # iterative xor-mix fold across the band rows (rows_per_band
        # vectorized passes, typically 4) — order-sensitive, like md5
        h = np.full((n, self.num_bands), np.uint64(rows_per_band),
                    dtype=np.uint64)
        for r in range(rows_per_band):
            h = _splitmix64(h ^ m[:, :, r])
        idx = np.repeat(np.arange(n, dtype=np.int64), self.num_bands)
        return pa.table(
            {
                self.id_col: batch[self.id_col].take(pa.array(idx)),
                "band": pa.array(
                    np.tile(np.arange(self.num_bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(h.ravel()),
            }
        )


def minhash_lsh_candidates(ds, id_col: str = "doc_id", text_col: str = "text",
                           num_perm: int = 128, num_bands: int = 32,
                           shingle_k: int = 5, concurrency=None):
    """documents → candidate near-dup pairs (id_a < id_b, distinct).

    The bucket groupby is the only shuffle; its key (band, band_hash)
    is hash-distributed.  Oversized buckets (>1000 ids — degenerate
    near-identical content) are truncated pairwise to cap the
    quadratic blowup; run exact dedup first if such clusters are
    expected (the final pair-dedup drops the per-bucket ``capped``
    counter, so the truncation is bounded but not surfaced).
    """
    hasher = MinHasher(num_perm, shingle_k, text_col)
    sigs = ds.map_batches(hasher, batch_format="pyarrow",
                          concurrency=concurrency)
    bands = sigs.map_batches(BandEmitter(num_bands, id_col),
                             batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
        capped = 0
        if len(ids) > 1000:
            capped = len(ids) - 1000
            ids = ids[:1000]
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "id_a": pa.array(ids[ia].astype(np.int64)),
                "id_b": pa.array(ids[ib].astype(np.int64)),
                "capped": pa.array(
                    np.full(len(ia), capped, dtype=np.int32)
                ),
            }
        )

    cand = bands.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    # a pair can surface from many bands → global distinct
    from ..stages.canonicalize import dedup_triples

    return dedup_triples(cand, num_parts=16, cols=["id_a", "id_b"])


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (the verification metric for LSH
    candidates)."""
    a = _shingle_hashes(text_a or "", k)
    b = _shingle_hashes(text_b or "", k)
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def verify_candidates(cand_ds, docs_by_id: dict[int, str], threshold: float = 0.8,
                      k: int = 5):
    """Verify candidate pairs against exact Jaccard.  ``docs_by_id`` is
    a broadcast lookup (pass a ``ray.put`` handle for big corpora via
    fn_constructor; at verification stage the candidate set is small)."""

    class Verify:
        def __init__(self, docs):
            try:
                import ray

                if isinstance(docs, ray.ObjectRef):
                    docs = ray.get(docs)
            except ImportError:
                pass
            self.docs = docs

        def __call__(self, batch: pa.Table) -> pa.Table:
            ja = [
                round(ngram_jaccard(self.docs.get(a, ""), self.docs.get(b, ""), k), 6)
                for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())
            ]
            batch = batch.append_column("jaccard", pa.array(ja, type=pa.float64()))
            return batch.filter(pc.greater_equal(batch["jaccard"], threshold))

    return cand_ds.map_batches(Verify(docs_by_id), batch_format="pyarrow")


# ---------- simhash ----------


class SimHasher:
    """64-bit SimHash over word tokens (vector of ±1 votes weighted by
    token hash bits)."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col = text_col
        self.out_col = out_col
        import re

        self.word_re = re.compile(r"[A-Za-z0-9_']+")
        # token→bit-vector memo: web-text vocabularies are zipfian, so
        # the per-actor cache turns the md5 cost into a one-time cost
        self._bits: dict[str, np.ndarray] = {}

    def _token_bits(self, tok: str) -> np.ndarray:
        v = self._bits.get(tok)
        if v is None:
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"
            )
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            v = self._bits[tok] = np.where(bits.astype(bool), 1, -1).astype(np.int64)
        return v

    def signature(self, text: str) -> int:
        votes = np.zeros(64, dtype=np.int64)
        for tok in self.word_re.findall((text or "").lower()):
            votes += self._token_bits(tok)
        sig = 0
        for b in np.nonzero(votes > 0)[0]:
            sig |= 1 << int(b)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col,
                                   pa.array(sigs, type=pa.uint64()))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
