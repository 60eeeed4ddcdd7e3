"""Doc-level cross-corpus deduplication — remove training documents
whose EXACT text appears in a reference corpus (benchmark/test-set
decontamination at document granularity; the published recipes pair
this with n-gram overlap removal, Brown et al. 2020 §C / Dodge et al.
2021's C4 benchmark-contamination audit — ops/decontam.py is the
n-gram sibling).

Scale shape mirrors decontam.py: the REFERENCE side (benchmark/val
sets — small next to a training corpus) collapses map-side to
distinct md5 digests, is pulled under a loud ``max_ref`` budget, and
broadcasts ONCE via ``ray.put`` as a sorted 16-byte array; the
training corpus takes a single streaming scan (vectorized md5 lanes,
``np.searchsorted`` membership) and NEVER shuffles.  For a reference
too large for the broadcast budget, partition both sides by text hash
and anti-join reduce-side instead (the queries.py anti-join pattern)
— this module implements the common broadcast case and refuses
loudly beyond it.

md5 (ops/md5np.py vectorized lanes) rather than an internal 64-bit
hash: the digest is the cross-engine contract (DuckDB ``md5``), so
the oracle can verify membership semantics exactly, and 128 bits
keeps the collision probability negligible at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .md5np import md5_digests

_REF_DEFAULT_MAX = 50_000_000  # 800 MB of digests — a loud budget


def _digests16(values) -> np.ndarray:
    """(n,) 'S16' byte-string digests (sortable/searchable)."""
    d = md5_digests(values)
    if d.shape[0] == 0:
        return np.empty(0, dtype="S16")
    return np.ascontiguousarray(d).view("S16").ravel()


def ref_digest_set(ref, text_col: str = "text",
                   max_ref: int = _REF_DEFAULT_MAX) -> np.ndarray:
    """Distinct md5 digests of the reference corpus, sorted, as an
    'S16' array ready to broadcast.  Map-side distinct keeps the
    driver pull at the reference's distinct-text count (≤ ``max_ref``,
    loud error above)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = np.unique(_digests16(col.drop_null()))
        # one contiguous blob per batch — no per-digest Python object
        return pa.table({"blob": pa.array([u.tobytes()],
                                          type=pa.large_binary())})

    out: list = []
    total = 0
    for b in ref.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        a = np.frombuffer(b"".join(b["blob"].to_pylist()),
                          dtype="S16")
        total += len(a)
        if total > max_ref:
            raise ValueError(
                f"ref_digest_set: reference has >{max_ref} distinct "
                "texts — beyond the broadcast budget; use a "
                "hash-partitioned anti-join instead")
        out.append(a)
    if not out:
        return np.empty(0, dtype="S16")
    return np.unique(np.concatenate(out))


def dedup_against(ds, ref=None, text_col: str = "text",
                  ref_digests=None, max_ref: int = _REF_DEFAULT_MAX):
    """Keep only rows of ``ds`` whose ``text_col`` does NOT appear
    verbatim in the reference corpus.  Pass either ``ref`` (a Dataset
    — its digest set is computed here) or a precomputed
    ``ref_digests`` ('S16' array or ``ray.ObjectRef``).  Null text
    never matches (kept)."""
    import ray

    if ref_digests is None:
        if ref is None:
            raise ValueError("dedup_against: need ref or ref_digests")
        ref_digests = ref_digest_set(ref, text_col, max_ref=max_ref)
    ref_ref = (ref_digests if isinstance(ref_digests, ray.ObjectRef)
               else ray.put(ref_digests))

    def scan(batch: pa.Table) -> pa.Table:
        bad = ray.get(ref_ref) if isinstance(
            ref_ref, ray.ObjectRef) else ref_ref
        if len(bad) == 0 or batch.num_rows == 0:
            return batch
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nulls = col.is_null().to_numpy(zero_copy_only=False)
        d = _digests16(col.fill_null(""))
        pos = np.minimum(np.searchsorted(bad, d), len(bad) - 1)
        hit = (bad[pos] == d) & ~nulls
        return batch.filter(pa.array(~hit))

    return ds.map_batches(scan, batch_format="pyarrow")
