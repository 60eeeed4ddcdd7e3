"""Substring-level (span) duplicate detection — the within-document
dedup family of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022): find character spans that occur
more than once across (or within) documents, so a curation pipeline
can cut duplicated boilerplate out of otherwise-unique pages.

Lee et al. build one suffix array over the concatenated corpus — exact
but inherently single-machine (the suffix array is a global sorted
structure).  The distributed re-expression here uses **winnowing
fingerprints** (Schleimer, Wilkerson, Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003 — public
literature, the MOSS algorithm):

1. per document, hash every ``k``-gram (Rabin-Karp rolling hash,
   vectorized: mod-2^64 arithmetic with an odd base is invertible, so
   the rolling window is two cumsum-style passes, no per-char Python);
2. winnow: in every window of ``w`` consecutive k-gram hashes keep the
   RIGHTMOST minimum — position-independent, so two copies of the same
   text select the same fingerprints regardless of alignment.
   **Guarantee** (the paper's): any common substring of length
   ≥ ``w + k - 1`` shares at least one selected fingerprint;
3. one keyed exchange on the fingerprint: buckets with ≥ 2 occurrences
   mark duplicate-span hits (``uniq_docs`` distinguishes cross-doc
   from within-doc repeats);
4. one keyed exchange on doc id: per-doc hit positions merge into
   maximal spans (gap ≤ ``w + k`` — the winnowing sampling pitch).

Output: ``(doc_id, span_start, span_end, n_fps, cross_doc)`` character
spans.  Precision: a reported span is built only from fingerprints
whose 64-bit hash occurred ≥ 2 times; at 2^64 the collision rate is
negligible and hits are NOT re-verified against text (documented
contract; the verification join of :mod:`~cow_ray.ops.dedup` shows the
shape if a consumer needs it).  Recall: exact above the
``w + k - 1`` length floor, by the winnowing guarantee.

Scale: fingerprints are ~n/w per document (density is the knob), both
exchanges key on small ints, per-partition kernels are vectorized, and
nothing materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .graph import _hash_part

_B = np.uint64(0x100000001B3)  # odd ⇒ invertible mod 2^64
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))

_FP_SCHEMA = pa.schema(
    [("__part", pa.int32()), ("fp", pa.int64()), ("doc_id", pa.int64()),
     ("pos", pa.int32())]
)


def _doc_fingerprints(data: np.ndarray, k: int, w: int) -> tuple:
    """(positions, hashes) of the winnowing-selected k-grams of one
    document (uint8 array).  Vectorized: rolling hash via invertible
    mod-2^64 cumsum, rightmost-window-min via a reversed
    sliding-window argmin."""
    n = data.size
    if n < k:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    x = data.astype(np.uint64)
    # h[i] = sum_{j<k} x[i+j] * B^(k-1-j)  (mod 2^64), all i at once:
    # A[i] = x[i] * B^(-i); h[i] = (cumsum(A)[i+k] - cumsum(A)[i]) * B^(i+k-1)
    ipow = np.empty(n, np.uint64)
    ipow[0] = 1
    np.multiply.accumulate(np.full(n - 1, _BINV, np.uint64), out=ipow[1:])
    csum = np.zeros(n + 1, np.uint64)
    np.cumsum(x * ipow, out=csum[1:])
    fwd = np.empty(n, np.uint64)
    fwd[0] = 1
    np.multiply.accumulate(np.full(n - 1, _B, np.uint64), out=fwd[1:])
    m = n - k + 1
    h = (csum[k:k + m] - csum[:m]) * (fwd[:m] * (_B ** np.uint64(k - 1)))
    if m <= w:
        # one window over the whole doc: single rightmost min
        p = m - 1 - int(np.argmin(h[::-1]))
        return (np.array([p], np.int64), h[p:p + 1])
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost min: argmin over the reversed window
    idx = w - 1 - np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(m - w + 1, dtype=np.int64) + idx
    pos = np.unique(pos)
    return (pos, h[pos])


class WinnowFingerprinter:
    """map_batches stage: (doc_id, text) → one row per selected
    fingerprint, keyed for the bucket exchange.

    ``unit`` picks the position coordinate system: ``"byte"`` hashes
    the UTF-8 bytes (positions are byte offsets — what the removal
    cutter consumes), ``"char"`` hashes the UTF-32 codepoint sequence
    (positions are character offsets — what SQL ``substr`` semantics
    and the cross-engine oracle use).  The rolling-hash kernel is
    unit-agnostic; only the decode differs."""

    def __init__(self, k: int = 20, w: int = 30, num_parts: int = 16,
                 id_col: str = "doc_id", text_col: str = "text",
                 unit: str = "byte"):
        if unit not in ("byte", "char"):
            raise ValueError(f"unit must be 'byte' or 'char', got {unit!r}")
        self.k, self.w, self.num_parts = k, w, num_parts
        self.id_col, self.text_col = id_col, text_col
        self.unit = unit

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _FP_SCHEMA.empty_table()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        all_pos, all_fp, all_id = [], [], []
        for did, t in zip(ids, texts):
            if self.unit == "byte":
                data = np.frombuffer((t or "").encode("utf-8"),
                                     dtype=np.uint8)
            else:
                data = np.frombuffer((t or "").encode("utf-32-le"),
                                     dtype=np.uint32)
            pos, fp = _doc_fingerprints(data, self.k, self.w)
            if pos.size:
                all_pos.append(pos.astype(np.int32))
                all_fp.append(fp.astype(np.int64))  # two's-complement view
                all_id.append(np.full(pos.size, did, np.int64))
        if not all_pos:
            return _FP_SCHEMA.empty_table()
        fp = np.concatenate(all_fp)
        return pa.table(
            {"__part": pa.array(_hash_part(fp, self.num_parts)),
             "fp": pa.array(fp),
             "doc_id": pa.array(np.concatenate(all_id)),
             "pos": pa.array(np.concatenate(all_pos))}
        )


_HIT_SCHEMA = pa.schema(
    [("__dpart", pa.int32()), ("doc_id", pa.int64()), ("pos", pa.int32()),
     ("cross", pa.int8())]
)

_SPAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("span_start", pa.int32()),
     ("span_end", pa.int32()), ("n_fps", pa.int32()),
     ("cross_doc", pa.int8())]
)


def duplicate_spans(ds, *, k: int = 20, w: int = 30, min_len: int | None = None,
                    num_parts: int = 16, id_col: str = "doc_id",
                    text_col: str = "text", cross_doc_only: bool = False,
                    merge_gap: int | None = None, unit: str = "byte"):
    """Duplicated character spans across a documents Dataset (see
    module docstring).  ``min_len`` defaults to the winnowing guarantee
    floor ``w + k - 1``; spans shorter than it after merging are
    dropped.  ``cross_doc_only`` keeps only spans whose every
    fingerprint also occurs in ANOTHER document (pure within-doc
    repetition filtered out).  ``merge_gap`` (default ``w + k``, the
    winnowing sampling pitch) is the largest start-position gap merged
    into one span; :func:`exact_dup_spans` overrides it.  ``unit``
    selects byte vs character offsets (see WinnowFingerprinter)."""
    if min_len is None:
        min_len = w + k - 1
    if merge_gap is None:
        merge_gap = w + k

    def bucket_hits(group: pa.Table) -> pa.Table:
        # one hash partition of fingerprints: mark occurrences of any
        # fp seen ≥2 times; cross=1 when ≥2 distinct docs share it
        if group.num_rows == 0:
            return _HIT_SCHEMA.empty_table()
        fp = group["fp"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, did, fp))
        fp, did, pos = fp[order], did[order], pos[order]
        new = np.r_[True, fp[1:] != fp[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, fp.size])
        seg = np.cumsum(new) - 1
        # occurrences per fp, distinct docs per fp (docs sorted within runs)
        newd = new | np.r_[True, did[1:] != did[:-1]]
        uniq_docs = np.add.reduceat(newd.astype(np.int64), starts)
        dup = lens >= 2
        keep = dup[seg]
        cross = (uniq_docs >= 2)[seg]
        if not keep.any():
            return _HIT_SCHEMA.empty_table()
        did_k, pos_k, cross_k = did[keep], pos[keep], cross[keep]
        return pa.table(
            {"__dpart": pa.array(_hash_part(did_k, num_parts)),
             "doc_id": pa.array(did_k),
             "pos": pa.array(pos_k),
             "cross": pa.array(cross_k.astype(np.int8))}
        )

    def merge_spans(group: pa.Table) -> pa.Table:
        # one hash partition of docs: sort (doc, pos), cut runs on doc
        # change or gap > merge_gap, emit [first, last + k) spans
        if group.num_rows == 0:
            return _SPAN_SCHEMA.empty_table()
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        cross = group["cross"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, did))
        did, pos, cross = did[order], pos[order], cross[order]
        brk = np.ones(did.size, dtype=bool)
        brk[1:] = (did[1:] != did[:-1]) | ((pos[1:] - pos[:-1]) > merge_gap)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], did.size]
        s_start = pos[starts]
        s_end = pos[ends - 1] + k
        n_fps = (ends - starts).astype(np.int32)
        # a span is cross-doc when ALL its fps are cross-doc (min over run)
        cross_min = np.minimum.reduceat(cross.astype(np.int8), starts)
        length_ok = (s_end - s_start) >= min_len
        m = length_ok & (cross_min.astype(bool) if cross_doc_only
                         else np.ones(starts.size, dtype=bool))
        return pa.table(
            {"doc_id": pa.array(did[starts][m]),
             "span_start": pa.array(s_start[m].astype(np.int32)),
             "span_end": pa.array(s_end[m].astype(np.int32)),
             "n_fps": pa.array(n_fps[m]),
             "cross_doc": pa.array(cross_min[m])}
        )

    fps = ds.map_batches(
        WinnowFingerprinter(k, w, num_parts, id_col, text_col, unit),
        batch_format="pyarrow",
    )
    hits = fps.groupby("__part").map_groups(bucket_hits,
                                            batch_format="pyarrow")
    return hits.groupby("__dpart").map_groups(merge_spans,
                                              batch_format="pyarrow")


def exact_dup_spans(ds, *, min_len: int = 40, num_parts: int = 16,
                    id_col: str = "doc_id", text_col: str = "text",
                    cross_doc_only: bool = False, unit: str = "char"):
    """EXACT substring-duplicate detection — Lee et al. ACL'22's
    ExactSubstr semantics without the global suffix array, removing the
    winnowing ``w + k - 1`` recall floor of :func:`duplicate_spans`.

    Identity that makes this a degenerate winnowing run: a position is
    covered by SOME duplicated substring of length ≥ L **iff** it lies
    inside a duplicated L-gram (⇒: any length-≥L duplicate contains an
    L-window through each of its positions, and that window occurs
    wherever the duplicate does; ⇐: a duplicated L-gram IS a duplicated
    substring of length L).  So ``w = 1`` (every L-gram emits — the
    rightmost-min of a width-1 window is the element itself), ``k = L``,
    and merging runs of duplicated start positions with
    ``merge_gap = L`` yields exactly the maximal duplicated regions:
    starts ``i ≤ j`` with ``j - i ≤ L`` have overlapping-or-adjacent
    covered intervals ``[i, i+L) ∪ [j, j+L)``; a gap ``> L`` leaves an
    uncovered point between them.

    Compared to Lee et al.'s suffix array (a single global sorted
    structure) this is two keyed exchanges — the same shape as the
    winnowing detector, but the fingerprint exchange carries one row
    per POSITION instead of one per ~w positions: exactness costs a
    ~w× bigger (still u64-keyed, still partitioned) shuffle.  That is
    the honest trade — the sampled detector is the 100-TB default,
    this is the floor-free audit pass.  Collision contract is the
    module's: 64-bit rolling hashes are not re-verified against text.

    Default ``unit="char"`` emits character offsets (SQL ``substr``
    coordinates, cross-engine-oracle-friendly); pass ``"byte"`` for
    byte offsets compatible with :func:`remove_duplicate_spans`'s
    cutter.

    Output: ``(doc_id, span_start, span_end, n_fps, cross_doc)`` where
    ``n_fps`` counts duplicated L-gram start positions in the span."""
    return duplicate_spans(
        ds, k=min_len, w=1, min_len=min_len, num_parts=num_parts,
        id_col=id_col, text_col=text_col, cross_doc_only=cross_doc_only,
        merge_gap=min_len, unit=unit)


_CLEAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.large_string()),
     ("n_spans_removed", pa.int32()), ("n_bytes_removed", pa.int64())]
)

_STAGE_SCHEMA = pa.schema(
    [("__jpart", pa.int32()), ("kind", pa.int8()), ("doc_id", pa.int64()),
     ("s", pa.int32()), ("e", pa.int32()), ("text", pa.large_string())]
)


def remove_duplicate_spans(ds, *, k: int = 20, w: int = 30,
                           min_len: int | None = None,
                           num_parts: int = 16, id_col: str = "doc_id",
                           text_col: str = "text",
                           cross_doc_only: bool = True,
                           merge_gap: int | None = None):
    """The REMOVAL step of Lee et al. ACL'22: cut every detected
    duplicate span out of each document.  One extra keyed exchange on
    a doc-id hash: spans meet their documents reduce-side (every doc
    crosses the wire once — inherent, the text must meet its cut
    list; a broadcast-spans variant would shrink this when the span
    list is small, at the cost of a driver pull).

    Span offsets are UTF-8 BYTE positions from the fingerprinter;
    boundaries are snapped OUTWARD to character boundaries so the
    cleaned text is always valid UTF-8 (a snap moves ≤3 bytes — noise
    against the ``w + k - 1`` span floor).

    Removes ALL occurrences of a duplicated span: the winnowing
    detector is symmetric and has no canonical-keeper notion (Lee et
    al. likewise cut every repeat of a cluster beyond the first found
    in suffix order; choosing a keeper needs a global order the
    distributed form deliberately avoids).  Default
    ``cross_doc_only=True`` leaves pure within-doc repetition intact.

    Output: (doc_id, text, n_spans_removed, n_bytes_removed) for
    EVERY input document (untouched docs pass through with 0s).

    Pass ``w=1, merge_gap=k`` for the exact (floor-free) variant — the
    span source is then :func:`exact_dup_spans` in byte units."""
    spans = duplicate_spans(
        ds, k=k, w=w, min_len=min_len, num_parts=num_parts,
        id_col=id_col, text_col=text_col, cross_doc_only=cross_doc_only,
        merge_gap=merge_gap)

    def stage_docs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _STAGE_SCHEMA.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z32 = np.zeros(len(ids), dtype=np.int32)
        import pyarrow.compute as pc

        return pa.table(
            {"__jpart": pa.array(_hash_part(ids, num_parts)),
             "kind": pa.array(np.zeros(len(ids), dtype=np.int8)),
             "doc_id": pa.array(ids),
             "s": pa.array(z32), "e": pa.array(z32),
             "text": pc.cast(pc.fill_null(batch[text_col], ""),
                             pa.large_string())})

    def stage_spans(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _STAGE_SCHEMA.empty_table()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"__jpart": pa.array(_hash_part(ids, num_parts)),
             "kind": pa.array(np.ones(len(ids), dtype=np.int8)),
             "doc_id": pa.array(ids),
             "s": batch["span_start"], "e": batch["span_end"],
             "text": pa.array([""] * len(ids), type=pa.large_string())})

    def cut(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _CLEAN_SCHEMA.empty_table()
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        kind = group["kind"].to_numpy(zero_copy_only=False)
        s_arr = group["s"].to_numpy(zero_copy_only=False)
        e_arr = group["e"].to_numpy(zero_copy_only=False)
        tcol = group["text"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        # span rows sorted by doc for a searchsorted range lookup
        sp = np.flatnonzero(kind == 1)
        sp = sp[np.argsort(did[sp], kind="stable")]
        sp_did = did[sp]
        out_id, out_txt, out_n, out_b = [], [], [], []
        for i in np.flatnonzero(kind == 0):
            d = int(did[i])
            lo = np.searchsorted(sp_did, d, "left")
            hi = np.searchsorted(sp_did, d, "right")
            text = tcol[i].as_py() or ""
            if lo == hi:
                out_id.append(d); out_txt.append(text)
                out_n.append(0); out_b.append(0)
                continue
            data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            keep = np.ones(len(data), dtype=bool)
            n_sp = 0
            for j in sp[lo:hi]:
                s, e = int(s_arr[j]), int(e_arr[j])
                while s > 0 and (data[s] & 0xC0) == 0x80:
                    s -= 1  # snap start left to a char boundary
                while e < len(data) and (data[e] & 0xC0) == 0x80:
                    e += 1  # snap end right past continuations
                keep[s:e] = False
                n_sp += 1
            cleaned = data[keep].tobytes().decode("utf-8")
            out_id.append(d); out_txt.append(cleaned)
            out_n.append(n_sp)
            out_b.append(int(len(data) - keep.sum()))
        return pa.table(
            {"doc_id": pa.array(np.array(out_id, dtype=np.int64)),
             "text": pa.array(out_txt, type=pa.large_string()),
             "n_spans_removed": pa.array(np.array(out_n, np.int32)),
             "n_bytes_removed": pa.array(np.array(out_b, np.int64))})

    staged = ds.map_batches(stage_docs, batch_format="pyarrow").union(
        spans.map_batches(stage_spans, batch_format="pyarrow"))
    return staged.groupby("__jpart").map_groups(cut,
                                                batch_format="pyarrow")
