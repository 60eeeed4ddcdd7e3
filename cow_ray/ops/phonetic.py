"""Phonetic encoding — American (NARA standard) Soundex, vectorized.

Soundex is the classic recall lever for record-linkage blocking
(Russell 1918; Knuth TAOCP vol. 3 §5 sorting-and-searching; Christen,
"Data Matching", 2012): names that sound alike share a 4-character
key, so typos that change letters but not phonetics stay in the same
block.  Used by :func:`cow_ray.ops.fuzzy.fuzzy_join` as the
``block="soundex"`` strategy.

The CONTRACT (mirrored exactly by the SQL oracle expression
:func:`soundex_sql` — DuckDB has no soundex builtin, so the oracle
reproduces the algorithm with translate + RE2-safe regexp chains,
no backreferences or lookahead):

1. uppercase; characters outside ``[A-Za-z]`` are removed; an empty
   result encodes as ``''``;
2. letters map to codes: BFPV→1, CGJKQSXZ→2, DT→3, L→4, MN→5, R→6;
   AEIOUY→0 (separators), HW→9 (transparent);
3. a digit is dropped when the nearest preceding non-transparent
   character carries the same digit (equal codes separated only by
   H/W collapse; separated by a vowel they count twice);
4. the first letter is kept verbatim and its own code emits no digit;
5. key = first letter + first three surviving digits, zero-padded.

Verified against the canonical examples (Robert→R163, Rupert→R163,
Ashcraft→A261, Tymczak→T522, Pfister→P236, Honeyman→H555) and fuzzed
against a pure-Python reference in tests.

The kernel is one numpy pass over the concatenated ASCII bytes of the
whole batch (code lookup table, prefix-max "previous non-transparent
index" scan, run-boundary digit mask, scatter into fixed-width rows)
— no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# A B C D E F G H I J K L M N O P Q R S T U V W X Y Z
_CODES = "01230129022455012623019202"
_LUT = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(_CODES):
    _LUT[ord("A") + _i] = ord(_c) - ord("0")


def soundex_arrow(arr) -> pa.Array:
    """Soundex keys for a pyarrow string array (or ChunkedArray) —
    4-ASCII-char keys, ``''`` where no letter survives the strip."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    clean = pc.replace_substring_regex(
        pc.utf8_upper(pc.fill_null(arr, "")), pattern="[^A-Z]",
        replacement="")
    clean = clean.combine_chunks() if isinstance(
        clean, pa.ChunkedArray) else clean
    n = len(clean)
    if n == 0:
        return pa.array([], type=pa.string())
    off = np.frombuffer(clean.buffers()[1], dtype=np.int32)[
        clean.offset:clean.offset + n + 1].astype(np.int64)
    data = np.frombuffer(clean.buffers()[2], dtype=np.uint8)
    lens = off[1:] - off[:-1]
    total = int(off[-1]) - int(off[0])
    letters = data[int(off[0]):int(off[-1])]  # contiguous A-Z bytes
    starts = off[:-1] - off[0]

    out4 = np.full((n, 4), ord("0"), dtype=np.uint8)
    nonempty = lens > 0
    if total:
        codes = _LUT[letters]
        pos = np.arange(total, dtype=np.int64)
        sid = np.repeat(np.arange(n, dtype=np.int64), lens)
        # index of the nearest preceding non-transparent (code != 9)
        # character, inclusive prefix-max then shifted right one
        non9 = codes != 9
        last_incl = np.maximum.accumulate(np.where(non9, pos, -1))
        prev_idx = np.concatenate(
            [np.full(1, -1, dtype=np.int64), last_incl[:-1]])
        in_string = prev_idx >= starts[sid]
        prev_code = np.where(in_string, codes[np.maximum(prev_idx, 0)],
                             255)
        is_digit = (codes >= 1) & (codes <= 6)
        emit = is_digit & (prev_code != codes) & (pos != starts[sid])
        # ordinal of each emitted digit within its string
        cum = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(emit)])
        ordinal = cum[pos] - cum[starts[sid]]
        take = emit & (ordinal < 3)
        out4[sid[take], 1 + ordinal[take]] = codes[take] + ord("0")
        out4[np.flatnonzero(nonempty), 0] = letters[starts[nonempty]]

    out_lens = np.where(nonempty, 4, 0).astype(np.int64)
    out_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(out_lens, out=out_off[1:])
    packed = out4[nonempty].reshape(-1)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(out_off.tobytes()),
        pa.py_buffer(packed.tobytes()))


def soundex_sql(col: str) -> str:
    """DuckDB SQL expression computing the identical soundex key —
    translate for the code map, one RE2-safe ``'d(9*d)*' → 'd'``
    collapse per digit (no backreferences: RE2 has none), then H/W
    and vowel removal and the first-letter rule as CASE arithmetic."""
    u = f"regexp_replace(upper({col}), '[^A-Z]', '', 'g')"
    c = (f"translate({u}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
         f"'{_CODES}')")
    for d in range(1, 7):
        c = f"regexp_replace({c}, '{d}(9*{d})*', '{d}', 'g')"
    digits_all = f"replace(replace({c}, '9', ''), '0', '')"
    digits = (f"CASE WHEN substr({c}, 1, 1) BETWEEN '1' AND '6' "
              f"THEN substr({digits_all}, 2) ELSE {digits_all} END")
    return (f"CASE WHEN length({u}) = 0 THEN '' "
            f"ELSE substr({u}, 1, 1) || substr({digits} || '000', 1, 3) "
            f"END")
