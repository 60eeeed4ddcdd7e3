"""Corpus-level exact line deduplication — the boilerplate-removal
recipe of the published web-corpus pipelines (C4 removes repeated
lines corpus-wide, Raffel et al. 2020 §2.2; Dolma's exact paragraph
dedup drops paragraphs seen before, Soldaini et al. 2024; RefinedWeb
likewise).  Here: drop EVERY occurrence of any non-blank line whose
corpus-wide occurrence count reaches ``min_count``, then reassemble
each document from its surviving lines.

Scale shape:

* count pass: per-batch vectorized line split + u64 line-hash
  ``np.unique`` partials (a boilerplate-heavy batch collapses to its
  distinct lines before anything crosses the wire), ONE small
  hash-keyed exchange of ``(hash, count)``, per-partition sum +
  threshold filter;
* the offending hash set broadcasts ONCE via ``ray.put`` (bounded by
  ``max_bad`` — a loud error, not an OOM, when a corpus has more
  repeated-line variety than the broadcast budget; the repo's
  decontam.py contract);
* rebuild pass: a single streaming scan — split, hash, sorted-array
  membership, then per-doc reassembly with ``pc.binary_join`` over a
  rebuilt ListArray (no Python per-line loop anywhere).

Blank/whitespace-only lines are structural and are NEVER counted or
dropped.  Line hashing is the repo's internal polars u64 primitive
(ops/lm.py) — counts and membership are hash-based with the usual
negligible-collision caveat; the SQL oracle counts literal line
strings, so the gate would surface a collision as a hash mismatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lm import _hash64

_BAD_DEFAULT_MAX = 5_000_000  # 40 MB of u64 — a deliberate budget


def _split_lines(batch: pa.Table, text_col: str, sep: str = "\n"):
    """(ListArray of units, flat unit array, per-doc unit counts).
    ``sep`` is a LITERAL separator — ``"\n"`` for lines (C4),
    ``"\n\n"`` for paragraphs (Dolma's exact paragraph dedup)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern(pc.fill_null(col, ""), pattern=sep)
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    return lists, flat, lens.astype(np.int64)


def _nonblank(flat) -> np.ndarray:
    return pc.not_equal(
        pc.utf8_trim_whitespace(flat), "").to_numpy(
        zero_copy_only=False)


def count_repeated_lines(ds, text_col: str = "text",
                         min_count: int = 3, num_parts: int = 32,
                         max_bad: int = _BAD_DEFAULT_MAX,
                         sep: str = "\n") -> np.ndarray:
    """Corpus-wide line census → SORTED u64 hashes of every non-blank
    line occurring ≥ ``min_count`` times.  One small keyed exchange;
    the driver pull is the offending set only (≤ ``max_bad``)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _split_lines(batch, text_col, sep)
        if len(flat):
            flat = flat.filter(pa.array(_nonblank(flat)))
        h = _hash64(flat) if len(flat) else np.empty(0, np.uint64)
        uh, uc = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(uh, type=pa.uint64()),
            "c": pa.array(uc.astype(np.int64)),
            "__part": pa.array((uh % num_parts).astype(np.int32)),
        })

    def per_part(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        uh, starts = np.unique(h, return_index=True)
        sums = np.add.reduceat(c, starts) if len(c) else c
        bad = uh[sums >= min_count]
        return pa.table({"h": pa.array(bad, type=pa.uint64())})

    parts = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("__part")
             .map_groups(per_part, batch_format="pyarrow"))
    out: list = []
    total = 0
    for b in parts.iter_batches(batch_format="pyarrow",
                                batch_size=None):
        a = b["h"].to_numpy(zero_copy_only=False)
        total += len(a)
        if total > max_bad:
            raise ValueError(
                f"count_repeated_lines: >{max_bad} distinct repeated "
                "lines — raise max_bad (broadcast budget) or raise "
                "min_count")
        out.append(a)
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(out))


def dedup_lines(ds, text_col: str = "text", out_col: str = "clean_text",
                removed_col: str = "n_lines_removed",
                min_count: int = 3, num_parts: int = 32,
                max_bad: int = _BAD_DEFAULT_MAX, bad_hashes=None,
                sep: str = "\n"):
    """Drop every occurrence of corpus-repeated lines and reassemble.

    Appends ``out_col`` (surviving lines joined with ``\\n``) and
    ``removed_col``.  ``bad_hashes`` (a sorted u64 array or a
    ``ray.ObjectRef`` to one) lets callers reuse a census; otherwise
    one is computed from ``ds`` itself."""
    import ray

    if bad_hashes is None:
        bad_hashes = count_repeated_lines(
            ds, text_col, min_count=min_count, num_parts=num_parts,
            max_bad=max_bad, sep=sep)
    bad_ref = (bad_hashes if isinstance(bad_hashes, ray.ObjectRef)
               else ray.put(bad_hashes))

    def rebuild(batch: pa.Table) -> pa.Table:
        bad = ray.get(bad_ref) if isinstance(
            bad_ref, ray.ObjectRef) else bad_ref
        lists, flat, lens = _split_lines(batch, text_col, sep)
        n = batch.num_rows
        if len(flat) == 0:
            return batch.append_column(
                out_col, pa.array([""] * n, type=pa.string()),
            ).append_column(
                removed_col, pa.array(np.zeros(n, dtype=np.int64)))
        if len(bad) == 0:
            drop = np.zeros(len(flat), dtype=bool)
        else:
            h = _hash64(flat)
            pos = np.minimum(np.searchsorted(bad, h), len(bad) - 1)
            drop = (bad[pos] == h) & _nonblank(flat)
        keep = ~drop
        # rebuild a ListArray over the kept lines; per-doc counts via
        # segment sums of the keep mask
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        kept_per_doc = np.bincount(doc_idx[keep], minlength=n)
        offsets = np.concatenate(
            ([0], np.cumsum(kept_per_doc))).astype(np.int32)
        kept_list = pa.ListArray.from_arrays(
            pa.array(offsets), flat.filter(pa.array(keep)))
        clean = pc.binary_join(kept_list, sep)
        removed = (lens - kept_per_doc).astype(np.int64)
        return batch.append_column(
            out_col, clean.cast(pa.string())).append_column(
            removed_col, pa.array(removed))

    return ds.map_batches(rebuild, batch_format="pyarrow")
