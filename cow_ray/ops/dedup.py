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
        # select by NAME before renaming (pyarrow ordering drift guard)
        return agg.select([key_col, f"{id_col}_{keep}", "count_all"]
                          ).rename_columns([key_col, "keep_id", "n"])

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
        lens = np.fromiter((len(s) for s in shingles), dtype=np.int64,
                           count=len(shingles))
        out = np.empty((self.num_perm, len(texts)), dtype=np.uint64)
        # Tile over (doc-subrange × perm-chunk) with ONE reused ≤4 MB
        # buffer and in-place ops.  Large fresh temporaries are the
        # enemy here: the original 64 MB-per-pass layout made 16
        # concurrent fresh workers each spend ~5.5 s in first-touch
        # page faults (kernel fault-path contention), dwarfing the
        # 57 ms of real compute per batch.  (chunk, n_shingles)
        # orientation: the segmented min runs along CONTIGUOUS rows —
        # reduceat's fast path; one fused `%` beats a shift-add
        # Mersenne reduction on this DRAM-bound box.
        TILE = 1 << 19  # 0.5M u64 elements = 4 MB
        buf = np.empty(TILE, dtype=np.uint64)
        csum = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=csum[1:])
        d0 = 0
        while d0 < len(texts):
            # grow the doc subrange to ~TILE/8 shingles (≥1 doc)
            d1 = int(np.searchsorted(csum, csum[d0] + (TILE >> 3),
                                     side="left"))
            d1 = min(max(d1, d0 + 1), len(texts))
            flat = np.concatenate(shingles[d0:d1]) if d1 - d0 > 1 \
                else shingles[d0]
            m = len(flat)
            starts = (csum[d0:d1] - csum[d0])
            chunk = max(1, min(self.num_perm, TILE // max(1, m)))
            if chunk * m > len(buf):
                # a single huge document (distinct shingles > TILE)
                # needs one full permutation row — grow the buffer
                # once instead of crashing on the reshape
                buf = np.empty(chunk * m, dtype=np.uint64)
            for c in range(0, self.num_perm, chunk):
                a = self.a[c:c + chunk]
                b = self.b[c:c + chunk]
                v = buf[: len(a) * m].reshape(len(a), m)
                np.multiply(a[:, None], flat[None, :], out=v)
                v += b[:, None]
                v %= _MERSENNE
                np.minimum.reduceat(v, starts, axis=1,
                                    out=out[c:c + len(a), d0:d1])
            d0 = d1
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

    def __init__(self, num_bands: int = 32, id_col: str = "doc_id",
                 num_parts: int = 0):
        self.num_bands = num_bands
        self.id_col = id_col
        # num_parts > 0: also emit __part = band_hash % num_parts so the
        # downstream bucket grouping shuffles on a SMALL int key (one
        # group per partition, vectorized pair emission inside) instead
        # of one Python map_groups call per (band, band_hash) bucket —
        # measured 8.4 s of pure per-group call overhead at 80k buckets
        self.num_parts = num_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            out = pa.table(
                {
                    self.id_col: batch[self.id_col],
                    "band": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.uint64()),
                }
            )
            if self.num_parts:
                out = out.append_column(
                    "__part", pa.array([], type=pa.int32())
                )
            return out
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
        hr = h.ravel()
        cols = {
            self.id_col: batch[self.id_col].take(pa.array(idx)),
            "band": pa.array(
                np.tile(np.arange(self.num_bands, dtype=np.int32), n)
            ),
            "band_hash": pa.array(hr),
        }
        if self.num_parts:
            cols["__part"] = pa.array(
                (hr % np.uint64(self.num_parts)).astype(np.int32)
            )
        return pa.table(cols)


def minhash_lsh_candidates(ds, id_col: str = "doc_id", text_col: str = "text",
                           num_perm: int = 128, num_bands: int = 32,
                           shingle_k: int = 5, concurrency=None,
                           num_parts: int = 16, bucket_cap: int = 1000):
    """documents → candidate near-dup pairs (id_a < id_b, distinct),
    schema ``(id_a, id_b, capped)``.

    Two keyed shuffles, both on SMALL int keys (``num_parts`` distinct
    values each, uniform by construction):

    1. bucket grouping — partition on ``band_hash % num_parts`` (every
       row of one (band, band_hash) bucket lands in one partition);
       inside each partition pairs are emitted VECTORIZED (lexsort +
       boundary scan; Python loop only over the rare ≥2-id buckets),
       replacing the one-Python-call-per-bucket ``map_groups`` that
       cost 8.4 s of pure call overhead at 80k buckets (round-2
       driver-bench regression);
    2. pair distinct — partition on a content hash of (id_a, id_b)
       with a per-partition ``group_by`` keeping ``max(capped)``.

    Oversized buckets (> ``bucket_cap`` ids — degenerate near-identical
    content) are truncated to their ``bucket_cap`` smallest ids to cap
    the quadratic blowup; the surviving pairs carry the bucket's
    dropped-id count in ``capped`` so callers can warn or raise ("no
    silent caps").  Run exact dedup first if such clusters are expected.
    """
    hasher = MinHasher(num_perm, shingle_k, text_col)
    sigs = ds.map_batches(hasher, batch_format="pyarrow",
                          concurrency=concurrency)
    bands = sigs.map_batches(
        BandEmitter(num_bands, id_col, num_parts=num_parts),
        batch_format="pyarrow",
    )

    def part_pairs(group: pa.Table) -> pa.Table:
        return _bucket_pairs(group, id_col, bucket_cap)

    cand = bands.groupby("__part").map_groups(
        part_pairs, batch_format="pyarrow"
    )

    # a pair can surface from many bands (in different partitions) →
    # global distinct keyed on a content hash of the pair, keeping the
    # max capped count
    return pair_distinct(cand, num_parts)


def pair_distinct(cand, num_parts: int = 16):
    """Hash-partitioned global distinct over candidate pairs, keeping
    ``max(capped)`` per (id_a, id_b).  Shared by the LSH pipelines and
    the bench's per-stage walls (so the benchmark always measures the
    stage the real operator runs)."""
    from ..stages.canonicalize import content_key, hash_mod

    def prep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__p2", pa.array([], type=pa.int32()))
        part = hash_mod(content_key(batch, ["id_a", "id_b"]), num_parts)
        return batch.append_column("__p2", part)

    def per_part(group: pa.Table) -> pa.Table:
        agg = (
            group.drop_columns(["__p2"])
            .group_by(["id_a", "id_b"], use_threads=False)
            .aggregate([("capped", "max")])
        )
        # select by NAME: pyarrow has moved key-vs-aggregate column
        # ordering across versions
        return agg.select(["id_a", "id_b", "capped_max"]).rename_columns(
            ["id_a", "id_b", "capped"]
        )

    return (
        cand.map_batches(prep, batch_format="pyarrow")
        .groupby("__p2")
        .map_groups(per_part, batch_format="pyarrow")
    )


_PAIRS_EMPTY = pa.table(
    {
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "capped": pa.array([], type=pa.int32()),
    }
)


def _bucket_pairs(group: pa.Table, id_col: str, bucket_cap: int) -> pa.Table:
    """Vectorized within-partition LSH pair emission: lexsort rows by
    (band_hash, band, id), find bucket boundaries with one diff scan,
    emit triu pairs only for buckets with ≥2 ids (ids sorted → capping
    keeps the smallest ``bucket_cap``, matching the old np.unique
    slice), then a local pair distinct keeping max(capped)."""
    n = group.num_rows
    if n == 0:
        return _PAIRS_EMPTY

    def col_np(name):
        c = group[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c.to_numpy(zero_copy_only=False)

    bh = col_np("band_hash").astype(np.uint64)
    bd = col_np("band").astype(np.int64)
    ids = col_np(id_col).astype(np.int64)
    order = np.lexsort((ids, bd, bh))
    bh, bd, ids = bh[order], bd[order], ids[order]
    newb = np.r_[True, (bh[1:] != bh[:-1]) | (bd[1:] != bd[:-1])]
    starts = np.flatnonzero(newb)
    lens = np.diff(np.r_[starts, n])
    multi = lens >= 2
    out_a, out_b, out_c = [], [], []
    for s, ln in zip(starts[multi], lens[multi]):
        cap = 0
        if ln > bucket_cap:
            cap = int(ln - bucket_cap)
            ln = bucket_cap
        ia, ib = np.triu_indices(int(ln), k=1)
        seg = ids[s:s + ln]
        out_a.append(seg[ia])
        out_b.append(seg[ib])
        out_c.append(np.full(len(ia), cap, dtype=np.int32))
    if not out_a:
        return _PAIRS_EMPTY
    t = pa.table(
        {
            "id_a": pa.array(np.concatenate(out_a)),
            "id_b": pa.array(np.concatenate(out_b)),
            "capped": pa.array(np.concatenate(out_c)),
        }
    )
    agg = t.group_by(["id_a", "id_b"], use_threads=False).aggregate(
        [("capped", "max")]
    )
    return agg.select(["id_a", "id_b", "capped_max"]).rename_columns(
        ["id_a", "id_b", "capped"]
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (the verification metric for LSH
    candidates)."""
    a = _shingle_hashes(text_a or "", k)
    b = _shingle_hashes(text_b or "", k)
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def verify_candidates(cand_ds, docs_by_id: dict[int, str], threshold: float = 0.8,
                      k: int = 5, metric: str = "jaccard"):
    """Verify candidate pairs against exact Jaccard.  ``docs_by_id`` is
    a broadcast lookup (pass a ``ray.put`` handle for big corpora via
    fn_constructor; at verification stage the candidate set is small).
    ``metric``: ``"jaccard"`` or max-directional ``"containment"``."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown verify metric {metric!r}")
    score_fn = (ngram_jaccard if metric == "jaccard"
                else lambda x, y, kk: max(ngram_containment(x, y, kk),
                                          ngram_containment(y, x, kk)))

    class Verify:
        def __init__(self, docs):
            # resolve ObjectRef handles lazily on first __call__ IN THE
            # WORKER — a driver-side ray.get here would embed the texts
            # dict in the pickled UDF and defeat the plasma broadcast
            self._handle = docs
            self.docs = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.docs is None:
                docs = self._handle
                try:
                    import ray

                    if isinstance(docs, ray.ObjectRef):
                        docs = ray.get(docs)
                except ImportError:
                    pass
                self.docs = docs
            ja = [
                round(score_fn(self.docs.get(a, ""), self.docs.get(b, ""), k), 6)
                for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())
            ]
            batch = batch.append_column(metric, pa.array(ja, type=pa.float64()))
            return batch.filter(pc.greater_equal(batch[metric], threshold))

    return cand_ds.map_batches(Verify(docs_by_id), batch_format="pyarrow")


def verify_candidates_distributed(cand_ds, docs_ds, threshold: float = 0.8,
                                  k: int = 5, id_col: str = "doc_id",
                                  text_col: str = "text",
                                  num_parts: int = 16,
                                  strategy: str = "auto",
                                  max_bcast_pairs: int = 4_000_000,
                                  metric: str = "jaccard"):
    """Distributed exact-Jaccard verification of candidate pairs —
    the no-texts-broadcast path for corpora too big for a driver texts
    dict (``verify_candidates`` is the small/fast path).

    Two backends, routed by ``strategy``:

    * ``"bcast"`` — broadcast the candidate PAIR LIST (ids only, tiny
      next to the corpus), emit each candidate doc's text to its
      pairs' partitions map-side, and verify in ONE keyed exchange.
      The corpus side is semijoin-pruned for free: a doc that is in no
      pair emits nothing.  Bounded by ``max_bcast_pairs`` (~64 MB of
      ids at the default) — the pair list rides ``ray.put`` once.
    * ``"exchange"`` — no driver pull at all: two reduce-side
      exchanges on small int keys (texts onto pair sides via a union +
      per-partition searchsorted join, then a pair-keyed pivot).  The
      unbounded-candidates fallback.
    * ``"auto"`` (default) — ``bcast`` when the materialized candidate
      count fits ``max_bcast_pairs``, else ``exchange``.

    Returns (id_a, id_b, jaccard) for DISTINCT pairs with jaccard ≥
    threshold; a pair id absent from the corpus verifies against the
    empty text (both-absent ⇒ jaccard 1.0), identically in both
    backends.
    """
    if strategy not in ("auto", "bcast", "exchange"):
        raise ValueError(f"unknown verify strategy {strategy!r}")
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown verify metric {metric!r}")
    if strategy == "exchange":
        return _verify_exchange(cand_ds, docs_ds, threshold, k, id_col,
                                text_col, num_parts, metric)
    cand_mat = cand_ds.materialize()
    n_cand = cand_mat.count()
    if n_cand > max_bcast_pairs:
        if strategy == "bcast":
            raise ValueError(
                f"{n_cand} candidate pairs exceed max_bcast_pairs="
                f"{max_bcast_pairs}; use strategy='exchange'")
        return _verify_exchange(cand_mat, docs_ds, threshold, k, id_col,
                                text_col, num_parts, metric)
    a_parts, b_parts = [], []
    for b in cand_mat.select_columns(["id_a", "id_b"]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        a_parts.append(b["id_a"].to_numpy(zero_copy_only=False))
        b_parts.append(b["id_b"].to_numpy(zero_copy_only=False))
    if not a_parts or not sum(len(a) for a in a_parts):
        import ray.data

        return ray.data.from_arrow(pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             (metric, pa.float64())]).empty_table())
    pa_arr = np.concatenate(a_parts).astype(np.int64)
    pb_arr = np.concatenate(b_parts).astype(np.int64)
    o = np.lexsort((pb_arr, pa_arr))
    pa_arr, pb_arr = pa_arr[o], pb_arr[o]
    keep = np.r_[True, (pa_arr[1:] != pa_arr[:-1])
                 | (pb_arr[1:] != pb_arr[:-1])]
    return _verify_bcast(pa_arr[keep], pb_arr[keep], docs_ds, threshold,
                         k, id_col, text_col, num_parts, metric)


def _verify_bcast(pair_a: np.ndarray, pair_b: np.ndarray, docs_ds,
                  threshold: float, k: int, id_col: str, text_col: str,
                  num_parts: int, metric: str = "jaccard"):
    """One-exchange verify: the distinct pair list is broadcast via
    ``ray.put``; each corpus task looks its doc ids up in the sorted
    pair-membership index (searchsorted) and ships the doc's text
    ONCE PER PARTITION that needs it — not once per pair (LSH emits
    many pairs per hot doc; per-pair duplication was measured 30×
    heavier at sf0.1).  Docs in no pair emit nothing (map-side
    semijoin).  Driver-built seed rows carry (pair, id_a, id_b) to
    their partition, so every pair verifies even when both texts are
    missing from the corpus.  Per partition, each doc is shingled
    exactly once and pairs intersect the cached shingle sets."""
    import ray
    import ray.data

    from ..ops.graph import _hash_part

    n_pairs = len(pair_a)
    ids = np.concatenate([pair_a, pair_b])
    pno = np.concatenate([np.arange(n_pairs, dtype=np.int64)] * 2)
    o = np.argsort(ids, kind="stable")
    bundle_ref = ray.put({"ids": ids[o], "pno": pno[o]})
    pno_all = np.arange(n_pairs, dtype=np.int64)
    minus1 = np.full(n_pairs, -1, dtype=np.int64)
    seed = pa.table(
        {"__part": pa.array(_hash_part(pno_all, num_parts)),
         "__pno": pa.array(pno_all),
         "id_a": pa.array(pair_a),
         "id_b": pa.array(pair_b),
         "did": pa.array(minus1),
         "text": pa.array([""] * n_pairs, type=pa.large_string())})

    staged_schema = pa.schema(
        [("__part", pa.int32()), ("__pno", pa.int64()),
         ("id_a", pa.int64()), ("id_b", pa.int64()),
         ("did", pa.int64()), ("text", pa.large_string())])

    def emit_docs(batch: pa.Table) -> pa.Table:
        # plain task (not an actor pool): the only state is the
        # broadcast bundle, and ray.get of an already-local plasma
        # object is ~µs — warm general-pool workers beat an actor
        # cold start
        bb = ray.get(bundle_ref)
        dids = batch[id_col]
        if isinstance(dids, pa.ChunkedArray):
            dids = dids.combine_chunks()
        dids_np = dids.to_numpy(zero_copy_only=False).astype(np.int64)
        left = np.searchsorted(bb["ids"], dids_np, "left")
        right = np.searchsorted(bb["ids"], dids_np, "right")
        counts = right - left
        total = int(counts.sum())
        if total == 0:
            return staged_schema.empty_table()
        rep = np.repeat(np.arange(len(dids_np)), counts)
        offs = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts)
        hit_part = _hash_part(bb["pno"][np.repeat(left, counts) + offs],
                              num_parts)
        # one row per DISTINCT (doc, partition)
        key = rep.astype(np.int64) * num_parts + hit_part
        uniq = np.unique(key, return_index=True)[1]
        drep = rep[uniq]
        texts = pc.cast(pc.fill_null(batch[text_col], ""),
                        pa.large_string()).take(pa.array(drep))
        z = np.full(len(uniq), -1, dtype=np.int64)
        return pa.table(
            {"__part": pa.array(hit_part[uniq]),
             "__pno": pa.array(z),
             "id_a": pa.array(z),
             "id_b": pa.array(z),
             "did": pa.array(dids_np[drep]),
             "text": texts})

    staged = ray.data.from_arrow(seed).union(
        docs_ds.select_columns([id_col, text_col]).map_batches(
            emit_docs, batch_format="pyarrow"))

    out_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         ("jaccard", pa.float64())])

    def verify_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        did = group["did"].to_numpy(zero_copy_only=False)
        is_doc = did >= 0
        tcol = group["text"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        shingles: dict[int, np.ndarray] = {}
        for i in np.flatnonzero(is_doc):
            d = int(did[i])
            if d not in shingles:
                shingles[d] = _shingle_hashes(tcol[i].as_py() or "", k)
        empty = _shingle_hashes("", k)
        ia = group["id_a"].to_numpy(zero_copy_only=False)
        ib = group["id_b"].to_numpy(zero_copy_only=False)
        rows = np.flatnonzero(~is_doc)
        out_a = ia[rows]
        out_b = ib[rows]
        out_j = np.empty(len(rows), dtype=np.float64)
        for j, r in enumerate(rows):
            a = shingles.get(int(ia[r]), empty)
            b = shingles.get(int(ib[r]), empty)
            inter = np.intersect1d(a, b, assume_unique=True).size
            if metric == "containment":
                out_j[j] = round(max(inter / a.size, inter / b.size), 6)
            else:
                union = a.size + b.size - inter
                out_j[j] = round(inter / union if union else 1.0, 6)
        t = pa.table(
            {"id_a": pa.array(out_a), "id_b": pa.array(out_b),
             metric: pa.array(out_j)})
        return t.filter(pc.greater_equal(t[metric], threshold))

    return staged.groupby("__part").map_groups(verify_part,
                                               batch_format="pyarrow")


def _verify_exchange(cand_ds, docs_ds, threshold: float, k: int,
                     id_col: str, text_col: str, num_parts: int,
                     metric: str = "jaccard"):
    """Two-exchange backend (no driver pull): texts onto pair sides
    via union + per-partition searchsorted join, then a pair-keyed
    pivot computing the exact char-k-gram metric (Jaccard or
    max-directional containment)."""
    from ..ops.graph import _hash_part

    staged_schema = pa.schema(
        [("__part", pa.int32()), ("__kind", pa.int8()),
         ("__key", pa.int64()), ("__id_a", pa.int64()),
         ("__id_b", pa.int64()), ("__text", pa.large_string())]
    )

    def col_np(batch, name):
        c = batch[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c.to_numpy(zero_copy_only=False)

    def stage_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return staged_schema.empty_table()
        a = col_np(batch, "id_a").astype(np.int64)
        b = col_np(batch, "id_b").astype(np.int64)
        key = np.concatenate([a, b])
        ia = np.concatenate([a, a])
        ib = np.concatenate([b, b])
        return pa.table(
            {
                "__part": pa.array(_hash_part(key, num_parts)),
                "__kind": pa.array(np.zeros(len(key), dtype=np.int8)),
                "__key": pa.array(key),
                "__id_a": pa.array(ia),
                "__id_b": pa.array(ib),
                "__text": pa.array([""] * len(key),
                                   type=pa.large_string()),
            }
        )

    def stage_docs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return staged_schema.empty_table()
        ids = col_np(batch, id_col).astype(np.int64)
        z = np.zeros(len(ids), dtype=np.int64)
        return pa.table(
            {
                "__part": pa.array(_hash_part(ids, num_parts)),
                "__kind": pa.array(np.ones(len(ids), dtype=np.int8)),
                "__key": pa.array(ids),
                "__id_a": pa.array(z),
                "__id_b": pa.array(z),
                "__text": pc.cast(
                    pc.fill_null(batch[text_col], ""), pa.large_string()
                ),
            }
        )

    staged = cand_ds.map_batches(stage_pairs, batch_format="pyarrow").union(
        docs_ds.select_columns([id_col, text_col]).map_batches(
            stage_docs, batch_format="pyarrow"
        )
    )

    sided_schema = pa.schema(
        [("__p2", pa.int32()), ("id_a", pa.int64()), ("id_b", pa.int64()),
         ("side", pa.int8()), ("text", pa.large_string())]
    )

    def attach(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return sided_schema.empty_table()
        kind = col_np(group, "__kind")
        key = col_np(group, "__key").astype(np.int64)
        is_doc = kind == 1
        dk = key[is_doc]
        o = np.argsort(dk, kind="stable")
        dk = dk[o]
        dtext = group["__text"].combine_chunks() if isinstance(
            group["__text"], pa.ChunkedArray) else group["__text"]
        doc_texts = np.asarray(dtext.to_pylist(), dtype=object)[is_doc][o]
        pk = key[~is_doc]
        ia = col_np(group, "__id_a")[~is_doc]
        ib = col_np(group, "__id_b")[~is_doc]
        if len(dk):
            idx = np.clip(np.searchsorted(dk, pk), 0, len(dk) - 1)
            hit = dk[idx] == pk
            texts = np.where(hit, doc_texts[idx], "")
        else:
            texts = np.full(len(pk), "", dtype=object)
        side = (pk != ia).astype(np.int8)  # 0 = a-side, 1 = b-side
        pair_key = ia * np.int64(0x9E3779B1) + ib
        return pa.table(
            {
                "__p2": pa.array(_hash_part(pair_key, num_parts)),
                "id_a": pa.array(ia),
                "id_b": pa.array(ib),
                "side": pa.array(side),
                "text": pa.array(list(texts), type=pa.large_string()),
            }
        )

    sided = staged.groupby("__part").map_groups(attach,
                                                batch_format="pyarrow")

    out_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         (metric, pa.float64())]
    )

    def pivot(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        ia = col_np(group, "id_a").astype(np.int64)
        ib = col_np(group, "id_b").astype(np.int64)
        side = col_np(group, "side")
        tcol = group["text"].combine_chunks() if isinstance(
            group["text"], pa.ChunkedArray) else group["text"]
        texts = np.asarray(tcol.to_pylist(), dtype=object)
        order = np.lexsort((side, ib, ia))
        ia, ib, side, texts = ia[order], ib[order], side[order], texts[order]
        newp = np.r_[True, (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])]
        starts = np.flatnonzero(newp)
        score_fn = (ngram_jaccard if metric == "jaccard"
                    else lambda x, y, kk: max(
                        ngram_containment(x, y, kk),
                        ngram_containment(y, x, kk)))
        out_a, out_b, out_j = [], [], []
        ends = np.r_[starts[1:], len(ia)]
        for s, e in zip(starts, ends):
            # rows are side-sorted within the pair group; duplicate
            # input pairs stack extra copies of each side — verify the
            # pair ONCE from the first row of each side (a skip here
            # would silently drop duplicated candidates, diverging
            # from the broadcast backend)
            if side[s] != 0 or side[e - 1] != 1:
                continue  # one side genuinely absent
            b_first = s + int(np.searchsorted(side[s:e], 1))
            out_a.append(ia[s])
            out_b.append(ib[s])
            out_j.append(
                round(score_fn(texts[s], texts[b_first], k), 6)
            )
        t = pa.table(
            {
                "id_a": pa.array(np.array(out_a, dtype=np.int64)),
                "id_b": pa.array(np.array(out_b, dtype=np.int64)),
                metric: pa.array(np.array(out_j, dtype=np.float64)),
            }
        )
        return t.filter(pc.greater_equal(t[metric], threshold))

    return sided.groupby("__p2").map_groups(pivot, batch_format="pyarrow")


# ---------- simhash ----------


class SimHasher:
    """64-bit SimHash over word tokens (vector of ±1 votes weighted by
    token hash bits)."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col = text_col
        self.out_col = out_col
        import re

        self.word_re = re.compile(r"[A-Za-z0-9_']+")
        # token→md5-u64 memo: web-text vocabularies are zipfian, so the
        # per-actor cache turns the md5 cost into a one-time cost
        self._hash: dict[str, int] = {}

    def _token_hash(self, tok: str) -> int:
        v = self._hash.get(tok)
        if v is None:
            v = self._hash[tok] = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"
            )
        return v

    def signature(self, text: str) -> int:
        """Per-document reference kernel (kept for tests; ``__call__``
        is the vectorized batch path, asserted bit-identical)."""
        votes = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in self.word_re.findall((text or "").lower()):
            bits = (np.uint64(self._token_hash(tok)) >> shifts) & np.uint64(1)
            votes += np.where(bits.astype(bool), 1, -1)
        sig = 0
        for b in np.nonzero(votes > 0)[0]:
            sig |= 1 << int(b)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized batch signature, bit-identical to
        :meth:`signature`: tokenize per doc (C regex), md5 only the
        DISTINCT tokens of the batch (memoized across batches), expand
        hashes to a (tokens, 64) ±1 int8 vote matrix, segment-sum per
        doc with ``np.add.reduceat``, pack the positive-vote bits."""
        texts = batch[self.text_col].to_pylist()
        if not texts:
            return batch.append_column(
                self.out_col, pa.array([], type=pa.uint64())
            )
        toks_per_doc = [
            self.word_re.findall((t or "").lower()) for t in texts
        ]
        lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                           count=len(toks_per_doc))
        flat = [t for toks in toks_per_doc for t in toks]
        shifts = np.arange(64, dtype=np.uint64)
        if flat:
            vocab, inv = np.unique(np.asarray(flat, dtype=object),
                                   return_inverse=True)
            h_vocab = np.fromiter(
                (self._token_hash(t) for t in vocab), dtype=np.uint64,
                count=len(vocab),
            )
            # (tokens, 64) ±1 votes; int8 keeps the temporary small
            sign = np.where(
                ((h_vocab[:, None] >> shifts[None, :]) & np.uint64(1))
                .astype(bool),
                np.int8(1), np.int8(-1),
            )[inv]
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            # reduceat over NON-EMPTY segments only (zero-length
            # segments both corrupt the neighbor's range and echo a
            # stray row instead of zeros), then scatter back; empty
            # docs keep all-zero votes → signature 0 like the per-doc
            # kernel.  Consecutive non-empty starts still bound each
            # doc's own tokens exactly — empty docs occupy zero rows.
            votes = np.zeros((len(texts), 64), dtype=np.int32)
            nz = lens > 0
            votes[nz] = np.add.reduceat(
                sign.astype(np.int32), starts[nz], axis=0
            )
        else:
            votes = np.zeros((len(texts), 64), dtype=np.int32)
        sigs = ((votes > 0).astype(np.uint64)
                << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        return batch.append_column(self.out_col,
                                   pa.array(sigs, type=pa.uint64()))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR — Hacker's Delight §5-1)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def simhash_near_dup_pairs(ds, id_col: str = "doc_id",
                           text_col: str = "text", max_hamming: int = 3,
                           num_parts: int = 16, bucket_cap: int = 1000):
    """Near-duplicate pairs by SimHash pigeonhole banding (Manku,
    Jain, Das Sarma, "Detecting near-duplicates for web crawling",
    WWW 2007): split the 64-bit signature into ``max_hamming + 1``
    bands — two signatures within ``max_hamming`` bits must agree on
    at least one whole band — bucket on (band, band_value), emit and
    VERIFY pairs inside each hash partition (vectorized SWAR
    popcount), then a global pair distinct.  Returns
    ``(id_a, id_b, hamming, capped)`` with hamming ≤ ``max_hamming``;
    recall is exact (pigeonhole) UP TO the bucket cap — degenerate
    >``bucket_cap``-id identical-band clusters are truncated and the
    surviving pairs carry the dropped-id count in ``capped`` ("no
    silent caps"), precision is enforced by the verification.

    Same scale shape as :func:`minhash_lsh_candidates`: two keyed
    exchanges on small int keys, vectorized partition kernels, bucket
    cap on degenerate identical-signature clusters."""
    sigs = ds.map_batches(SimHasher(text_col), batch_format="pyarrow")
    cand = sigs.map_batches(
        simhash_band_emitter(max_hamming, num_parts, id_col),
        batch_format="pyarrow",
    ).groupby("__part").map_groups(
        simhash_part_pairs(max_hamming, bucket_cap, id_col),
        batch_format="pyarrow",
    )

    # global distinct (a pair can agree on bands in different parts)
    from ..ops.graph import _hash_part

    def prep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__p2", pa.array([], type=pa.int32()))
        key = (batch["id_a"].to_numpy(zero_copy_only=False)
               * np.int64(0x9E3779B1)
               + batch["id_b"].to_numpy(zero_copy_only=False))
        return batch.append_column(
            "__p2", pa.array(_hash_part(key, num_parts))
        )

    def per_part(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["__p2"])
            .group_by(["id_a", "id_b"], use_threads=False)
            .aggregate([("hamming", "min"), ("capped", "max")])
            .select(["id_a", "id_b", "hamming_min", "capped_max"])
            .rename_columns(["id_a", "id_b", "hamming", "capped"])
        )

    return cand.map_batches(prep, batch_format="pyarrow").groupby(
        "__p2"
    ).map_groups(per_part, batch_format="pyarrow")


def simhash_band_emitter(max_hamming: int, num_parts: int,
                         id_col: str = "doc_id"):
    """Module-level factory (bench times each stage separately): maps
    a (id, simhash) batch to one row per (band, band_value) keyed on a
    hash partition — the pigeonhole banding exchange."""
    n_bands = max_hamming + 1
    if n_bands > 64:
        raise ValueError("max_hamming must be < 64")
    width = 64 // n_bands

    def emit_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.schema(
            [("__part", pa.int32()), ("band", pa.int32()),
             ("bval", pa.uint64()), (id_col, pa.int64()),
             ("sig", pa.uint64())]
        )
        if n == 0:
            return empty.empty_table()
        sig = batch["simhash"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        sv = sig.to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bands = np.arange(n_bands, dtype=np.uint64)
        # band b = bits [b*width, (b+1)*width); the remainder bits ride
        # in the last band
        widths = np.full(n_bands, width, dtype=np.uint64)
        widths[-1] = 64 - width * (n_bands - 1)
        shifts = (bands * np.uint64(width))
        masks = np.where(widths == 64, np.uint64(0xFFFFFFFFFFFFFFFF),
                         (np.uint64(1) << widths) - np.uint64(1))
        bval = ((sv[:, None] >> shifts[None, :]) & masks[None, :]).ravel()
        from .graph import _mix64

        part = (_mix64(bval ^ (np.tile(bands, n) * np.uint64(0x9E37)))
                % np.uint64(num_parts)).astype(np.int32)
        return pa.table(
            {"__part": pa.array(part),
             "band": pa.array(np.tile(bands.astype(np.int32), n)),
             "bval": pa.array(bval),
             id_col: pa.array(np.repeat(ids, n_bands)),
             "sig": pa.array(np.repeat(sv, n_bands))}
        )

    return emit_bands


def simhash_part_pairs(max_hamming: int, bucket_cap: int = 1000,
                       id_col: str = "doc_id"):
    """Module-level factory: per-partition pair emission + SWAR
    popcount verification for the simhash banding exchange."""
    out_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         ("hamming", pa.int64()), ("capped", pa.int32())]
    )

    def part_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()

        def col(name, dt):
            c = group[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return c.to_numpy(zero_copy_only=False).astype(dt)

        bd = col("band", np.int64)
        bv = col("bval", np.uint64)
        ids = col(id_col, np.int64)
        sg = col("sig", np.uint64)
        order = np.lexsort((ids, bv, bd))
        bd, bv, ids, sg = bd[order], bv[order], ids[order], sg[order]
        newb = np.r_[True, (bd[1:] != bd[:-1]) | (bv[1:] != bv[:-1])]
        starts = np.flatnonzero(newb)
        lens = np.diff(np.r_[starts, len(bd)])
        multi = lens >= 2
        out_a, out_b, out_h, out_c = [], [], [], []
        for s, ln in zip(starts[multi], lens[multi]):
            cap = int(max(0, ln - bucket_cap))
            ln = int(min(ln, bucket_cap))
            ia, ib = np.triu_indices(ln, k=1)
            sa, sb = sg[s:s + ln][ia], sg[s:s + ln][ib]
            h = _popcount64(sa ^ sb).astype(np.int64)
            keep = h <= max_hamming
            out_a.append(ids[s:s + ln][ia][keep])
            out_b.append(ids[s:s + ln][ib][keep])
            out_h.append(h[keep])
            out_c.append(np.full(int(keep.sum()), cap, dtype=np.int32))
        if not out_a:
            return out_schema.empty_table()
        t = pa.table(
            {"id_a": pa.array(np.concatenate(out_a)),
             "id_b": pa.array(np.concatenate(out_b)),
             "hamming": pa.array(np.concatenate(out_h)),
             "capped": pa.array(np.concatenate(out_c))}
        )
        return (
            t.group_by(["id_a", "id_b"], use_threads=False)
            .aggregate([("hamming", "min"), ("capped", "max")])
            .select(["id_a", "id_b", "hamming_min", "capped_max"])
            .rename_columns(["id_a", "id_b", "hamming", "capped"])
        )

    return part_pairs


def ngram_containment(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram CONTAINMENT ``|A∩B| / |A|`` — Broder's
    second resemblance measure ("On the resemblance and containment of
    documents", SEQUENCES 1997).  Asymmetric by design: a short quote
    fully inside a long page scores ~1.0 here while its symmetric
    Jaccard is near 0 — the measure for quote/subset duplication."""
    a = _shingle_hashes(text_a or "", k)
    b = _shingle_hashes(text_b or "", k)
    # _shingle_hashes gives sub-k texts a whole-text sentinel shingle
    # (module-wide contract, see ngram_jaccard), so a is never empty:
    # containment('', x) = 0 unless x is also empty (sentinels match)
    return np.intersect1d(a, b, assume_unique=True).size / a.size


def containment_candidates(cand_ds, docs_by_id, threshold: float = 0.9,
                           k: int = 5):
    """Max-directional containment verify over a broadcast texts
    lookup — a thin alias of :func:`verify_candidates` with
    ``metric="containment"`` (one shared broadcast-resolve / filter
    implementation)."""
    return verify_candidates(cand_ds, docs_by_id, threshold, k,
                             metric="containment")


def keep_latest(ds, key_cols, ts_col: str, tie_col: str | None = None,
                num_partitions: int = 16):
    """Latest-snapshot-per-key dedup — the crawl recrawl rule (of the
    many fetches of one URL across snapshots, keep the newest; every
    Common-Crawl-derived corpus applies this before content dedup).

    Max-by is associative, so the shape is the events_first pattern:
    each batch keeps one row per key map-side (first_per_key on
    descending order), ONE key-hashed exchange carries only the local
    winners, and each partition picks the global winner with the same
    kernel.  Ties break on descending ``tie_col`` (give a unique id
    for determinism).  Pure Arrow end to end."""
    from ..stages.canonicalize import content_key, first_per_key, hash_mod

    keys = list(key_cols)
    order = [(ts_col, "descending")]
    if tie_col is not None:
        order.append((tie_col, "descending"))

    def local_latest(batch: pa.Table) -> pa.Table:
        t = first_per_key(batch, keys, order)
        return t.append_column(
            "__part", hash_mod(content_key(t, keys), num_partitions))

    def latest_part(g: pa.Table) -> pa.Table:
        return first_per_key(g, keys, order).drop_columns(["__part"])

    return (ds.map_batches(local_latest, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(latest_part, batch_format="pyarrow"))
