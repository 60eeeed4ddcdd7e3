"""Blocked fuzzy join — record linkage on approximate string
equality, the canonicalization tool for dirty entity names (classic
blocking + compare design: Fellegi & Sunter, JASA 1969; Christen,
"Data Matching", 2012).

Semantics (the CONTRACT, mirrored by the SQL oracle):

* candidate pairs are rows whose **blocking key** matches — either
  ``lower(substr(col, block_start, block_len))`` (``block="substr"``)
  or the American Soundex of the value (``block="soundex"``, the
  classic phonetic recall lever — see :mod:`cow_ray.ops.phonetic`);
  blocking is part of the operator's definition, not an approximation
  to hide: pairs in different blocks are *defined* out, exactly as in
  production record linkage (recall is the caller's blocking-key
  design lever);
* a candidate matches when Levenshtein edit distance ≤ ``max_edits``
  (exact DP, identical to DuckDB's ``levenshtein``).

Scale shape: both sides tag their blocking key map-side, ONE
block-keyed exchange co-locates candidates, and each block verifies
its own pairs.  A numpy length-difference prefilter (|len_a − len_b| >
max_edits ⇒ distance > max_edits) prunes the pair grid before any DP
runs; the DP itself is the irreducible per-pair work (same status as
the md5 fingerprint contract).  A per-block pair cap refuses
quadratic blowup loudly — an oversized block means the blocking key
is wrong, and silently truncating would corrupt the result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_BLOCK_PAIRS = 10_000_000


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Exact edit distance (insert/delete/substitute, unit costs —
    DuckDB-identical).  ``cap`` enables early exit once every cell in
    a row exceeds it."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[lb]


def fuzzy_join(left, right, col_l: str, col_r: str, id_l: str,
               id_r: str, max_edits: int = 2, block_start: int = 1,
               block_len: int = 3, block: str = "substr"):
    """→ Dataset ``(id_l, id_r, edits)`` for every blocked pair within
    ``max_edits``.  Column names must differ between sides (rename
    upstream if needed).  Id columns may be integers or strings
    (e.g. the matched values themselves)."""
    if {col_l, id_l} & {col_r, id_r}:
        raise ValueError("left/right column names must be disjoint")
    if block not in ("substr", "soundex"):
        raise ValueError(f"unknown blocking strategy {block!r}")

    def tag(col, idc, side):
        def f(batch: pa.Table) -> pa.Table:
            v = pc.cast(pc.fill_null(batch[col], ""), pa.string())
            if block == "soundex":
                from .phonetic import soundex_arrow

                key = soundex_arrow(v)
            else:
                key = pc.utf8_lower(
                    pc.utf8_slice_codeunits(v, block_start - 1,
                                            block_start - 1 + block_len))
            ids = batch[idc]
            if (pa.types.is_string(ids.type)
                    or pa.types.is_large_string(ids.type)):
                ids = pc.cast(ids, pa.string())
            else:
                ids = ids.cast(pa.int64())
            return pa.table(
                {"__blk": key, "id": ids,
                 "val": v,
                 "side": pa.array(np.full(batch.num_rows, side,
                                          dtype=np.int8))})

        return f

    u = (left.map_batches(tag(col_l, id_l, 0), batch_format="pyarrow")
         .union(right.map_batches(tag(col_r, id_r, 1),
                                  batch_format="pyarrow")))

    def per_block(g: pa.Table) -> pa.Table:
        # derive the id type from the group's SCHEMA, not its rows:
        # map_groups may invoke on empty partitions, and an int64
        # guess there would emit schema-mismatched empty blocks when
        # ids are strings (e.g. the soundex vocab join)
        id_type = (g.schema.field("id").type
                   if "id" in g.schema.names else pa.null())
        if pa.types.is_null(id_type):
            id_type = pa.int64()
        out_schema = pa.schema([(id_l, id_type), (id_r, id_type),
                                ("edits", pa.int64())])
        if g.num_rows == 0:
            return out_schema.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_pylist()
        vals = g["val"].to_pylist()
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if li.size == 0 or ri.size == 0:
            return out_schema.empty_table()
        if li.size * ri.size > MAX_BLOCK_PAIRS:
            raise ValueError(
                f"fuzzy_join: block {g['__blk'][0].as_py()!r} has "
                f"{li.size}×{ri.size} candidate pairs (> "
                f"{MAX_BLOCK_PAIRS}); refine the blocking key")
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        # vectorized length prefilter before any DP
        dl = np.abs(lens[li][:, None] - lens[ri][None, :])
        ii, jj = np.nonzero(dl <= max_edits)
        out_l, out_r, out_e = [], [], []
        for i, j in zip(li[ii], ri[jj]):
            d = levenshtein(vals[i], vals[j], cap=max_edits)
            if d <= max_edits:
                out_l.append(ids[i])
                out_r.append(ids[j])
                out_e.append(d)
        return pa.table(
            {id_l: pa.array(out_l, type=id_type),
             id_r: pa.array(out_r, type=id_type),
             "edits": pa.array(np.asarray(out_e, dtype=np.int64))})

    return u.groupby("__blk").map_groups(per_block,
                                         batch_format="pyarrow")
