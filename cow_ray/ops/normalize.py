"""Unicode text normalization + mojibake repair — the first stage of
any web-text pipeline (reference analogue: the CSV reader's encoding
cleanup, /root/reference/src/converter/csvw.py chardet path; here it
is a corpus-scale operator rather than a file-ingest fixup).

``normalize_text`` is pure vectorized Arrow:

* NFC canonical composition — vectorized via polars'
  ``str.normalize`` (Rust unicode-normalization).  NOT pyarrow:
  this build's ``pc.utf8_normalize`` decomposes but never composes
  (NFC of ``e + U+0301`` stays two codepoints — verified broken),
  while polars and DuckDB's utf8proc-backed ``nfc_normalize`` agree
  codepoint-exact (NFC is a deterministic Unicode algorithm; parity
  is pinned by the oracle hash).  Arrow→polars→Arrow is zero-copy;
* C0/DEL control stripping (RE2 char class, shared engine semantics
  with DuckDB ``regexp_replace … 'g'``);
* ASCII-whitespace collapse to single spaces + edge trim (``\\s+`` is
  the byte-oriented RE2 class in BOTH engines; after collapse every
  edge run is exactly one ``' '``; the trim strips exactly that
  ASCII space — mirrored by ``trim(x, ' ')`` in SQL (DuckDB's BARE
  ``trim()`` strips unicode spaces like NBSP, a divergence the
  parity fuzz test caught), matching
  DuckDB ``trim``).

Order is fixed (strip → NFC → collapse → trim) and mirrored verbatim
in the SQL oracle.  Strip precedes NFC deliberately: a control char
inside a combining sequence no longer blocks composition, and NUL
never reaches DuckDB's ``nfc_normalize`` (which C-truncates at NUL
whenever it performs real normalization work).

``fix_mojibake`` repairs UTF-8 bytes mis-decoded as cp1252/latin-1
(``é`` → ``Ã©``, ``’`` → ``â€™``) — ftfy's core case (Speer 2019,
public tool; the heuristic is reimplemented from its published
description, no ftfy code).  Scale shape: a vectorized RE2 marker
prefilter selects candidate rows (a tiny fraction of a real crawl);
only those take the per-row strict ``cp1252-encode → utf-8-decode``
round-trip, accepted only when it succeeds AND strictly reduces the
marker count (so legitimate ``Ã`` text is never mangled).  Repair
iterates to a fixpoint (≤3 passes) to unwind double-encoding.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# C0 controls minus \t \n \r (kept: they are whitespace, handled by
# the collapse step), plus DEL.  Raw RE2 class — identical string is
# embedded in the SQL oracle (single-quoted, DuckDB passes it raw).
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

# cp1252-mojibake signature: a char that is the cp1252 decode of a
# UTF-8 LEAD byte (0xC2-0xF4 -> U+00C2-U+00F4; cp1252 = latin-1 over
# that range) immediately followed by the cp1252 decode of a
# CONTINUATION byte (0x80-0xBF): either U+0080-U+00BF directly
# (the latin-1 fallback chars and the A0-BF half) or one of cp1252's
# 0x80-0x9F remaps (euro, curly quotes, dashes, dagger, trademark,
# S/Z-caron, OE, f-hook, permille, guillemets, Y-diaeresis).  Covers
# 2-byte leads for all of Latin-1/Cyrillic/Greek/CEE and 3/4-byte
# leads (curly-punctuation, CJK, emoji).  Prefilter + improvement
# metric only -- the strict round-trip does the real validation.
_CP1252_REMAPS = "".join(
    bytes([b]).decode("cp1252") for b in range(0x80, 0xA0)
    if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D))
# plain \xNN escapes parse identically in RE2 (pyarrow prefilter)
# and Python re (_repair_one's improvement metric)
MOJIBAKE_RE = ("[\\xc2-\\xf4]"
               "[\\x80-\\xbf" + _CP1252_REMAPS + "]")

_MAX_MOJIBAKE_PASSES = 3


def normalize_batch(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str = "norm_text",
    *,
    form: str = "NFC",
    strip_controls: bool = True,
    collapse_ws: bool = True,
) -> pa.Table:
    """Append ``out_col`` = normalized ``text_col``.  Pure Arrow."""
    import polars as pl

    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = arr
    # controls FIRST: a stray control no longer blocks recombination
    # of a split combining sequence, and NUL never reaches DuckDB's
    # nfc_normalize, which C-truncates at NUL when it has real work
    # to do (caught by the parity fuzz test)
    if strip_controls:
        out = pc.replace_substring_regex(out, pattern=CONTROL_RE,
                                         replacement="")
    out = pl.from_arrow(out).str.normalize(form).to_arrow().cast(
        pa.string())
    if collapse_ws:
        out = pc.replace_substring_regex(out, pattern="\\s+",
                                         replacement=" ")
        # after collapse every edge whitespace run is exactly ' ' —
        # ASCII-space trim only — SQL mirror must be trim(x, ' ')
        # (DuckDB's bare trim() strips unicode spaces like NBSP)
        out = pc.utf8_trim(out, characters=" ")
    return batch.append_column(out_col, out)


def normalize_text(
    ds,
    text_col: str = "text",
    out_col: str = "norm_text",
    *,
    form: str = "NFC",
    strip_controls: bool = True,
    collapse_ws: bool = True,
):
    """Dataset wrapper: one streaming ``map_batches`` pass, zero-copy
    Arrow in/out, no shuffle."""
    return ds.map_batches(
        lambda b: normalize_batch(
            b, text_col, out_col, form=form,
            strip_controls=strip_controls, collapse_ws=collapse_ws),
        batch_format="pyarrow",
    )


def _sloppy_cp1252_encode(s: str) -> bytes:
    """cp1252 encode with latin-1 fallback for the five codepoints
    cp1252 leaves unmapped (U+0081/8D/8F/90/9D appear when the
    original mis-decode was latin-1 rather than cp1252 — ftfy's
    "sloppy" codec case).  Raises UnicodeEncodeError past latin-1."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        out = bytearray()
        for ch in s:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                cp = ord(ch)
                if 0x80 <= cp <= 0x9F:
                    out.append(cp)
                else:
                    raise
        return bytes(out)


def sloppy_cp1252_decode(b: bytes) -> str:
    """cp1252 decode with latin-1 fallback for the five unmapped
    bytes (0x81/8D/8F/90/9D) — the inverse of
    :func:`_sloppy_cp1252_encode`.  Exposed for fixture planting
    (tests, the ``mojibake_docs`` query) so corruption can be planted
    on ANY text, not only byte streams that happen to be strictly
    cp1252-decodable."""
    try:
        return b.decode("cp1252")
    except UnicodeDecodeError:
        bad = (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        return "".join(
            chr(x) if x in bad else bytes([x]).decode("cp1252")
            for x in b)


def _repair_one(s: str) -> tuple[str, int]:
    """Iterated strict cp1252/latin-1→utf-8 round-trip on one flagged
    string.  Returns (repaired, n_passes); 0 = left unchanged."""
    import re

    marker = re.compile(MOJIBAKE_RE)
    cur = s
    applied = 0
    for _ in range(_MAX_MOJIBAKE_PASSES):
        n_before = len(marker.findall(cur))
        if n_before == 0:
            break
        try:
            cand = _sloppy_cp1252_encode(cur).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            break
        if len(marker.findall(cand)) >= n_before:
            break
        cur = cand
        applied += 1
    return cur, applied


def fix_mojibake_batch(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str = "fixed_text",
    flag_col: str = "mojibake_fixed",
) -> pa.Table:
    """Append ``out_col`` (repaired text) and ``flag_col`` (bool).

    Vectorized marker prefilter; the per-row round-trip runs ONLY on
    flagged rows (loop bounded by the flagged count, not batch size).
    """
    import numpy as np

    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    hit = pc.fill_null(
        pc.match_substring_regex(arr, pattern=MOJIBAKE_RE), False)
    hit_idx = pc.indices_nonzero(hit)
    flags_np = np.zeros(len(arr), dtype=bool)
    out = arr
    if len(hit_idx):
        # only the flagged rows leave Arrow (scatter back via
        # replace_with_mask); unflagged rows stay zero-copy
        repaired = []
        fixed_any = False
        for i, s in zip(hit_idx.to_pylist(),
                        arr.take(hit_idx).to_pylist()):
            r, n = _repair_one(s)
            repaired.append(r)
            if n:
                flags_np[i] = True
                fixed_any = True
        if fixed_any:
            out = pc.replace_with_mask(
                arr, hit, pa.array(repaired, type=arr.type))
    return batch.append_column(
        out_col, out.cast(pa.string())).append_column(
        flag_col, pa.array(flags_np))


def fix_mojibake(
    ds,
    text_col: str = "text",
    out_col: str = "fixed_text",
    flag_col: str = "mojibake_fixed",
):
    """Dataset wrapper: streaming single pass, no shuffle."""
    return ds.map_batches(
        lambda b: fix_mojibake_batch(b, text_col, out_col, flag_col),
        batch_format="pyarrow",
    )


def fold_key_batch(batch: pa.Table, text_col: str = "text",
                   out_col: str = "fold_key") -> pa.Table:
    """CCNet-style dedup-key folding (Wenzek et al., LREC 2020 §3.1:
    paragraphs are hashed AFTER lowercasing, accent removal and
    digit→0 folding, so cosmetic variation never defeats dedup).

    One vectorized chain, order fixed and mirrored by the SQL oracle:
    NFD decomposition (polars, zero-copy from Arrow) → lowercase →
    strip combining marks (RE2 ``\\p{Mn}`` — after NFD this IS accent
    removal) → ASCII digits → ``0`` → whitespace collapse + ASCII-space
    trim (the ``normalize_text`` contract).  DuckDB mirrors with
    ``strip_accents(lower(…))`` — utf8proc's accent strip agrees with
    NFD+drop-Mn on the Latin range (pinned by the oracle hash); text
    outside that range folds fine here but callers should not expect
    cross-engine parity for e.g. precomposed Hangul."""
    import polars as pl

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    nfd = (pl.from_arrow(pa.chunked_array([col.cast(pa.large_string())]))
           .to_frame("t")["t"].str.normalize("NFD").to_arrow())
    if isinstance(nfd, pa.ChunkedArray):
        nfd = nfd.combine_chunks()
    x = pc.utf8_lower(pc.fill_null(nfd, ""))
    x = pc.replace_substring_regex(x, r"\p{Mn}", "")
    x = pc.replace_substring_regex(x, "[0-9]", "0")
    x = pc.replace_substring_regex(x, r"\s+", " ")
    x = pc.utf8_trim(x, " ")
    return batch.append_column(out_col, x.cast(pa.string()))


def fold_keys(ds, text_col: str = "text", out_col: str = "fold_key"):
    """Dataset wrapper for :func:`fold_key_batch` — a single
    streaming scan, no shuffle; feed ``out_col`` to ``dedup_exact`` /
    ``dedup_lines`` for fold-invariant deduplication."""
    return ds.map_batches(
        lambda b: fold_key_batch(b, text_col, out_col),
        batch_format="pyarrow")
