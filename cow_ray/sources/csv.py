"""Dialect-aware CSV source (reference S1–S3, SURVEY.md §2.1).

The reference reads CSV via ``unicodecsv.DictReader`` with
encoding/delimiter/quotechar taken from the schema dialect
(``csvw.py:369-374``, dialect override ``csvw.py:263-271``), detects
encoding with chardet (``csvw.py:64-74``) and sniffs the delimiter from
the header line (``csvw.py:76-82``).

Here:

* every cell is read as a **string** (the reference's model — typing
  happens only at triple-object construction), nulls → empty string;
* ``_row`` is the global 0-based data-row index, derived from byte
  ranges planned on the driver — execution-order independent;
* encoding detection is a small stdlib heuristic (BOM → utf-8/16,
  strict-utf-8 probe, latin-1 fallback) since chardet is not available
  in this environment; the detected name is reported so a caller can
  override;
* delimiter sniffing uses ``csv.Sniffer`` on the header line, exactly
  like the reference.

Scale shape: one read task per byte chunk (the planner cuts at line
boundaries after the header), same ReadTask pattern as the parquet
source.
"""

from __future__ import annotations

import csv as _csv
import io
import os

import numpy as np
import pyarrow as pa


# single-byte candidates for the coherence scorer, most-specific
# first; latin-1 is the lossless fallback (every byte decodes)
_SB_CANDIDATES = ("cp1252", "cp1251", "koi8-r", "iso-8859-7",
                  "cp1255", "cp1256", "latin-1")


_SB_SCRIPT_BLOCK = {  # expected non-ASCII letter block per encoding
    "cp1251": (0x0400, 0x04FF),      # Cyrillic
    "koi8-r": (0x0400, 0x04FF),      # Cyrillic (different byte map)
    "iso-8859-7": (0x0370, 0x03FF),  # Greek
    "cp1255": (0x0590, 0x05FF),      # Hebrew
    "cp1256": (0x0600, 0x06FF),      # Arabic
}
# highest-frequency letters of each family's languages — real text in
# the right decoding hits these densely; mojibake from a wrong
# single-byte guess maps to essentially random letters and does not
# (the miniature version of chardet's language models, which is what
# breaks the cp1251-vs-iso-8859-7 symmetry: both decode every high
# byte to *some* in-block letter)
_SB_COMMON = {
    "cp1251": set("оеаинтсрвлкм"),
    "koi8-r": set("оеаинтсрвлкм"),
    "iso-8859-7": set("αοειτνσρηυκπ"),
    "cp1255": set("יוהאלמרתשבנע"),
    "cp1256": set("اليمونرتبةهدع"),
    "cp1252": set("éèêàâçùûüöäëñïíóúã"),
    "latin-1": set("éèêàâçùûüöäëñïíóúã"),
}
_SB_SCORE_CHARS = 1 << 16  # letter statistics converge long before 1 MiB


def _score_probe(text: str) -> str:
    """Slice the decoded sample for scoring: head + middle + tail
    windows, so non-ASCII content that starts late (e.g. 100 KB of
    ASCII ids before the first Cyrillic column) still reaches the
    scorer, while the per-character Python loop stays bounded."""
    if len(text) <= _SB_SCORE_CHARS:
        return text
    h = _SB_SCORE_CHARS // 2
    q = _SB_SCORE_CHARS // 4
    mid = len(text) // 2
    return text[:h] + text[mid:mid + q] + text[-q:]


def _coherence(enc: str, text: str) -> float:
    """Score a decoded sample the way chardet's statistics do in
    miniature.  Control characters (what a wrong single-byte guess
    makes of the 0x80-0x9F range) count strongly against.  Latin
    candidates expect accented letters to be SPARSE among ASCII
    letters (café, naïve); non-Latin-script candidates expect their
    block to dominate the NON-ASCII letters (ASCII headers/ids mixed
    with Cyrillic values are normal); common-letter frequency breaks
    the remaining ties."""
    ascii_a = hi_a = in_block = common = bad = runs = lower_blk = 0
    prev_hi = False
    lo, hi = _SB_SCRIPT_BLOCK.get(enc, (0, -1))
    common_set = _SB_COMMON.get(enc, ())
    for ch in _score_probe(text):
        o = ord(ch)
        if o < 128:
            prev_hi = False
            if o < 32 and ch not in "\t\r\n":
                bad += 5
            elif ch.isalpha():
                ascii_a += 1
            continue
        if 0x80 <= o <= 0x9F:
            prev_hi = False
            bad += 5
            continue
        if ch.isalpha():
            hi_a += 1
            if not prev_hi:
                runs += 1
            prev_hi = True
            if ch.lower() in common_set:
                common += 1
            if lo <= o <= hi:
                in_block += 1
                # caseless scripts (Hebrew/Arabic) count as
                # lowercase-coherent — the case signal only exists
                # for bicameral alphabets
                if not ch.isupper():
                    lower_blk += 1
        else:
            prev_hi = False
    if enc in ("cp1252", "latin-1"):
        shape = hi_a if hi_a <= max(1, ascii_a) else -hi_a
        return ascii_a + shape + 2 * common - bad
    stray = hi_a - in_block
    # a non-Latin-script reading is plausible only when the block
    # dominates the non-ASCII letters AND they arrive in word-length
    # RUNS (mean run ≥ 2): real Cyrillic/Greek words are wholly
    # non-ASCII, while Western accents are isolated chars inside ASCII
    # words — without the run test, 'Café Noël' maps wholesale into
    # the Greek block and detects as iso-8859-7
    if in_block >= 3 * stray and hi_a >= 2 * runs:
        # case coherence: real text is lowercase-dominant, and the
        # Cyrillic code pages invert case between themselves (koi8-r
        # lower 0xC0-0xDF = cp1251 UPPER) and against Greek — a wrong
        # guess reads as SHOUTING and loses here
        case = 2 * lower_blk - (in_block - lower_blk)
        return ascii_a + 2 * in_block + 2 * common + case - 5 * stray - bad
    return -(stray + max(ascii_a - in_block, 0)) - bad


# --- multi-byte CJK detection (shift-jis / euc-kr / gb2312) ---------
#
# Structure + miniature frequency models, the same recipe as the
# single-byte scorer: (1) a byte-level gate — double-byte text makes
# high-byte runs of mostly EVEN length, while Cyrillic/Greek words
# have arbitrary lengths; (2) strict decode per candidate; (3) score
# script-block membership plus a small set of highest-frequency
# characters per language, which is what breaks the euc-kr-vs-gb2312
# symmetry (both decode each other's byte pairs into plausible-looking
# blocks; random mappings miss the frequent characters).  Pathological
# cross-CJK inputs can still misdetect — chardet-grade language models
# are out of scope; the detected name is reported for override.

_CJK_CANDIDATES = ("shift_jis", "euc_jp", "euc_kr", "gb2312", "big5")
_JP_BLOCKS = ((0x3040, 0x30FF), (0x4E00, 0x9FFF), (0xFF61, 0xFF9F),
              (0x3000, 0x303F))
_CJK_BLOCKS = {
    "shift_jis": _JP_BLOCKS,
    "euc_jp": _JP_BLOCKS,
    "euc_kr": ((0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x4E00, 0x9FFF),
               (0x3000, 0x303F)),
    "gb2312": ((0x4E00, 0x9FFF), (0x3000, 0x303F), (0xFF00, 0xFF65)),
    # traditional Chinese: CJK unified + compatibility punctuation
    "big5": ((0x4E00, 0x9FFF), (0x3000, 0x303F), (0xFF00, 0xFF65)),
}
_JP_COMMON = set("のにはをたがでてとしれさあるいうんます年月日本語今")
_CJK_COMMON = {
    "shift_jis": _JP_COMMON,
    "euc_jp": _JP_COMMON,
    "euc_kr": set("이다의는을를에가하고지서도로는한국어입니년월일"),
    "gb2312": set("的一是不了人我在有他这中大来上国年月日文本天"),
    # same frequency idea in TRADITIONAL forms (這/來/國 vs 这/来/国)
    # — this asymmetry is what breaks the gb2312-vs-big5 tie
    "big5": set("的一是不了人我在有他這中大來上國年月日文本天"),
}


def _high_runs_mostly_even(head: bytes, max_scan: int = 1 << 16) -> bool:
    import numpy as np

    arr = np.frombuffer(head[:max_scan], dtype=np.uint8)
    hi = (arr >= 0x80).astype(np.int8)
    if hi.sum() < 20:
        return False
    d = np.diff(np.concatenate([[0], hi, [0]]))
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]
    lens = ends - starts
    return (lens % 2 == 0).mean() >= 0.75


def _byte_gates(head: bytes, max_scan: int = 1 << 16) -> tuple[float, float]:
    """Cheap byte-level preconditions so non-CJK files never pay a full
    decode+score pass (ADVICE r3: Cyrillic/Greek files paid a 1 MB
    shift_jis decode per detection):

    * ``sjis_lead`` — fraction of high bytes in 0x81-0x9F, the
      Shift-JIS lead-byte range that single-byte Cyrillic/Greek text
      barely touches (cp1251/koi8/iso-8859-7 letters live ≥ 0xB0);
    * ``mixed_trail`` — fraction of high bytes immediately followed by
      an ASCII 0x40-0x7E byte: Big5/Shift-JIS trail bytes reach into
      ASCII mid-word, while Cyrillic words are unbroken high-byte runs.
    """
    import numpy as np

    arr = np.frombuffer(head[:max_scan], dtype=np.uint8)
    hi = arr >= 0x80
    n_hi = int(hi.sum())
    if n_hi < 20:
        return 0.0, 0.0
    sjis_lead = float(((arr >= 0x81) & (arr <= 0x9F)).sum()) / n_hi
    nxt_ascii = np.zeros(arr.size, dtype=bool)
    nxt_ascii[:-1] = (arr[1:] >= 0x40) & (arr[1:] <= 0x7E)
    mixed_trail = float((hi & nxt_ascii).sum()) / n_hi
    return sjis_lead, mixed_trail


def _cjk_detect(head: bytes) -> str | None:
    # EUC-family pairs are both-high → the even-run gate applies;
    # Shift-JIS / Big5 trail bytes reach into ASCII (0x40-0x7E) and
    # break the run structure, so their gates are byte-level
    # (lead-range / mixed-trail fractions) plus, for the Japanese
    # candidates, kana presence (real Japanese text is kana-dense;
    # mojibake from a wrong guess is not)
    even_runs = _high_runs_mostly_even(head)
    sjis_lead, mixed_trail = _byte_gates(head)
    best, best_score = None, 0.0
    for enc in _CJK_CANDIDATES:
        if enc in ("euc_jp", "euc_kr", "gb2312") and not even_runs:
            continue
        if enc == "shift_jis" and sjis_lead < 0.05:
            continue
        if enc == "big5" and mixed_trail < 0.05 and not even_runs:
            continue
        try:
            text = head.decode(enc)
        except (UnicodeDecodeError, LookupError):
            # forgive a truncated trailing sequence, like the utf-8 probe
            try:
                text = head[:-2].decode(enc) if len(head) > 2 else ""
            except (UnicodeDecodeError, LookupError):
                continue
        probe = _score_probe(text)
        blocks = _CJK_BLOCKS[enc]
        common_set = _CJK_COMMON[enc]
        in_blk = common = non_ascii = kana = 0
        for ch in probe:
            o = ord(ch)
            if o < 128:
                continue
            non_ascii += 1
            if any(lo <= o <= hi for lo, hi in blocks):
                in_blk += 1
                if ch in common_set:
                    common += 1
                if 0x3040 <= o <= 0x30FF:
                    kana += 1
        if non_ascii == 0 or in_blk < 10 or common < 3:
            continue
        if in_blk / non_ascii < 0.7:
            continue
        if enc in ("shift_jis", "euc_jp") and kana < max(3, in_blk * 0.15):
            continue
        score = in_blk + 4 * common - 3 * (non_ascii - in_blk)
        if score > best_score:
            best, best_score = enc, score
    return best


def detect_encoding(path: str, sample_bytes: int = 1 << 20) -> str:
    """BOM + strict-utf-8 probe, then a letter-coherence scorer over
    common single-byte encodings (a small, deterministic stand-in for
    chardet, which is absent from this environment; reference
    ``csvw.py:64-74``).  A wrong single-byte guess maps the 0x80-0x9F
    range to control characters — the scorer penalizes exactly that,
    which is chardet's core signal for cp125x vs latin-1 families."""
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        return "utf-16"
    try:
        head.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError as e:
        # a TRUNCATED sample (file larger than the window) can end
        # mid-multibyte-sequence — forgive a failure in the last 4
        # bytes then.  A complete small file ending in non-UTF8 bytes
        # must NOT take this path (its tail is data, not truncation).
        if len(head) == sample_bytes and e.start >= len(head) - 4:
            try:
                head[: e.start].decode("utf-8")
                return "utf-8"
            except UnicodeDecodeError:
                pass
    cjk = _cjk_detect(head)
    if cjk:
        return cjk
    best, best_score = "latin-1", float("-inf")
    for enc in _SB_CANDIDATES:
        try:
            text = head.decode(enc)
        except UnicodeDecodeError:
            continue
        score = _coherence(enc, text)
        if score > best_score:
            best, best_score = enc, score
    return best


def sniff_delimiter(path: str, encoding: str | None = None) -> str:
    """``csv.Sniffer().sniff(header_line)`` (reference
    ``csvw.py:76-82``)."""
    encoding = encoding or detect_encoding(path)
    with open(path, "r", encoding=encoding, errors="ignore") as f:
        header = f.readline()
    try:
        return _csv.Sniffer().sniff(header).delimiter
    except _csv.Error:
        return ","


def read_header(path: str, delimiter: str = ",", quotechar: str = '"',
                encoding: str | None = None) -> list[str]:
    encoding = encoding or detect_encoding(path)
    with open(path, "r", encoding=encoding, newline="") as f:
        return next(_csv.reader(f, delimiter=delimiter, quotechar=quotechar))


def _plan_chunks(
    path: str, target_bytes: int, quotechar: str = '"'
) -> tuple[list[tuple[int, int]], list[int]]:
    """Cut the file into byte ranges at *record* boundaries after the
    header AND count the data rows of each chunk — in ONE sequential
    driver byte scan.

    A newline is a safe cut only when the number of quote characters
    seen so far is even (otherwise it sits inside a quoted field —
    embedded newlines would silently corrupt a naive line-boundary
    cut).  Row counting rides the same scan: every safe newline
    terminates a record, minus the truly-empty ones (bare ``\\n`` /
    ``\\r\\n`` lines, which ``csv.reader`` yields as ``[]`` and the
    chunk reader drops).  Round-1 verdict: the previous separate
    ``_count_rows`` CSV-parsed the whole file a second time on the
    driver.

    Returns ``(chunks, counts)`` with ``len(counts) == len(chunks)``.
    """
    import numpy as np

    size = os.path.getsize(path)
    q = quotechar.encode()[0]
    cuts: list[int] = []
    counts: list[int] = []
    cur = 0  # non-empty records accumulated for the open chunk
    with open(path, "rb") as f:
        header_end = len(f.readline())
        cuts.append(header_end)
        f.seek(header_end)
        pos = header_end
        quotes = 0  # parity carried across blocks
        next_cut = header_end + target_bytes
        rec_start = header_end  # absolute start of the open record
        last_byte = 0x0A        # final byte of the previous block
        while True:
            block = f.read(8 << 20)
            if not block:
                break
            arr = np.frombuffer(block, dtype=np.uint8)
            is_q = arr == q
            nl_idx = np.nonzero(arr == 0x0A)[0]
            if nl_idx.size:
                parity = (quotes + np.cumsum(is_q)[nl_idx]) % 2
                safe = nl_idx[parity == 0]
                if safe.size:
                    abs_nl = pos + safe
                    starts = np.empty_like(abs_nl)
                    starts[0] = rec_start
                    starts[1:] = abs_nl[:-1] + 1
                    lens = abs_nl - starts
                    # byte before each newline (block-boundary safe)
                    pb = np.where(safe > 0,
                                  arr[np.maximum(safe - 1, 0)], last_byte)
                    nonempty = ~((lens == 0) | ((lens == 1) & (pb == 0x0D)))
                    cum = np.cumsum(nonempty)
                    base = 0
                    # greedy: first safe newline at/after each needed cut
                    while True:
                        j = int(np.searchsorted(abs_nl, next_cut - 1))
                        if j >= safe.size:
                            break
                        cut = int(abs_nl[j]) + 1
                        cuts.append(cut)
                        counts.append(cur + int(cum[j]) - base)
                        cur = 0
                        base = int(cum[j])
                        next_cut = cut + target_bytes
                    cur += int(cum[-1]) - base
                    rec_start = int(abs_nl[-1]) + 1
            quotes = (quotes + int(is_q.sum())) % 2
            pos += len(block)
            last_byte = int(arr[-1])
    # tail record without a trailing newline
    if size > rec_start and not (size - rec_start == 1
                                 and last_byte == 0x0D):
        cur += 1
    if not cuts or cuts[-1] != size:
        cuts.append(size)
        counts.append(cur)
    elif cur:
        counts[-1] += cur
    chunks = []
    chunk_counts = []
    for i in range(len(cuts) - 1):
        if cuts[i + 1] > cuts[i]:
            chunks.append((cuts[i], cuts[i + 1]))
            chunk_counts.append(counts[i])
    return chunks, chunk_counts


# ---------------------------------------------------------------------
# Distributed (wave) planner — TB-scale path.
#
# _plan_chunks above is exact but O(file bytes) ON THE DRIVER.  For
# large files the scan moves to a wave of Ray tasks over raw byte
# ranges: quote parity at an arbitrary offset is locally unknowable
# (the classic distributed-CSV problem), so every task computes its
# chunk's stats under BOTH entry-parity assumptions (speculative
# parsing) plus the chunk's own parity flip; the driver then chains
# parities p_{i+1} = p_i XOR flip_i and selects the valid stat set per
# chunk — O(1) driver bytes and O(#chunks) driver work, mirroring the
# parquet row-group metadata wave.
#
# Record-ownership convention: a record belongs to the chunk containing
# its FIRST byte.  Records spanning chunks (quoted newlines, giant
# fields) are tracked by the driver as a running "span" of per-chunk
# scalars; read tasks extend past their chunk end to the span's
# terminating safe newline.


def _scan_chunk_stats(data: bytes, quotechar: str = '"') -> dict:
    """Pure per-chunk kernel (unit-testable): newline/record stats
    under both entry parities.  All outputs are scalars."""
    import numpy as np

    q = quotechar.encode()[0]
    n = len(data)
    out: dict = {"flip": 0, "tail_last": -1, "size": n}
    if n == 0:
        for s in (0, 1):
            out[s] = {"n_nl": 0, "first": -1, "last": -1,
                      "n_started": 0, "pre_first": -1}
        return out
    arr = np.frombuffer(data, dtype=np.uint8)
    is_q = arr == q
    cs = np.cumsum(is_q)
    out["flip"] = int(cs[-1] % 2)
    out["tail_last"] = int(arr[-1])
    nl = np.nonzero(arr == 0x0A)[0]
    for s in (0, 1):
        if nl.size == 0:
            out[s] = {"n_nl": 0, "first": -1, "last": -1,
                      "n_started": 0, "pre_first": -1}
            continue
        safe = nl[(cs[nl] + s) % 2 == 0]
        if safe.size == 0:
            out[s] = {"n_nl": 0, "first": -1, "last": -1,
                      "n_started": 0, "pre_first": -1}
            continue
        first, last = int(safe[0]), int(safe[-1])
        n_started = 0
        if safe.size >= 2:
            starts = safe[:-1] + 1
            ends = safe[1:]
            lens = ends - starts
            pb = arr[ends - 1]
            nonempty = ~((lens == 0) | ((lens == 1) & (pb == 0x0D)))
            n_started = int(nonempty.sum())
        out[s] = {
            "n_nl": int(safe.size), "first": first, "last": last,
            "n_started": n_started,
            "pre_first": int(arr[first - 1]) if first > 0 else -1,
        }
    return out


def _chain_chunk_stats(stats: list[dict]) -> tuple[list[int], list[int],
                                                   list[bool]]:
    """Driver-side combiner: per-chunk stats → (entry parities, exact
    per-chunk nonempty-record counts, starts-at-begin flags).  Chunk 0
    is assumed to begin exactly at a record start (after the header)."""
    n = len(stats)
    counts = [0] * n
    parities: list[int] = []
    begin_flags = [False] * n
    if n:
        begin_flags[0] = True
    p = 0
    span_chunk, span_len, span_last = 0, 0, 0x0A
    for i, st in enumerate(stats):
        parities.append(p)
        s = st[p]
        size = st["size"]
        if s["n_nl"] > 0:
            # the running span record terminates at this chunk's first
            # safe newline — attribute it to the chunk it STARTED in
            tl = span_len + s["first"]
            lb = s["pre_first"] if s["first"] > 0 else span_last
            if not (tl == 0 or (tl == 1 and lb == 0x0D)):
                counts[span_chunk] += 1
            counts[i] += s["n_started"]
            span_len = size - (s["last"] + 1)
            if span_len > 0:
                span_chunk, span_last = i, st["tail_last"]
            else:
                # next record starts exactly at the next chunk's first
                # byte — it owns the span, and its task parses from
                # byte 0 without skipping to a newline
                span_chunk, span_last = i + 1, 0x0A
                if i + 1 < n:
                    begin_flags[i + 1] = True
        else:
            span_len += size
            if size > 0:
                span_last = st["tail_last"]
        p ^= st["flip"]
    # EOF: tail record without trailing newline
    if span_len > 0 and not (span_len == 1 and span_last == 0x0D):
        counts[span_chunk] += 1
    return parities, counts, begin_flags


def _find_safe_newlines(data: bytes, parity: int, quotechar: str):
    """Safe-newline local offsets of ``data`` given the entry quote
    parity; also returns the exit parity."""
    import numpy as np

    q = quotechar.encode()[0]
    arr = np.frombuffer(data, dtype=np.uint8)
    is_q = arr == q
    cs = np.cumsum(is_q)
    nl = np.nonzero(arr == 0x0A)[0]
    exit_parity = (parity + int(cs[-1])) % 2 if len(arr) else parity
    if nl.size == 0:
        return nl, exit_parity
    return nl[(cs[nl] + parity) % 2 == 0], exit_parity


def _read_chunk_rows_wave(path: str, start: int, end: int, parity: int,
                          starts_at_begin: bool, delimiter: str,
                          quotechar: str, encoding: str) -> list[list[str]]:
    """Parse the records STARTING in ``[start, end)``: seek, find the
    first record boundary (immediately at ``start`` when the driver
    flagged it, else after the first safe newline), and extend past
    ``end`` to the final record's terminating safe newline.  Only this
    chunk's bytes (+ the spill of its tail record) are read."""
    BLOCK = 8 << 20
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
        safe, exit_parity = _find_safe_newlines(data, parity, quotechar)
        if starts_at_begin:
            rs0 = 0
        else:
            if safe.size == 0:
                return []
            rs0 = int(safe[0]) + 1
            safe = safe[1:]
        # last record boundary still inside the chunk: nl with nl+1 <
        # len(data); later starts belong to the next chunk
        inside = safe[safe + 1 < len(data)]
        s_max = int(inside[-1]) + 1 if inside.size else rs0
        if rs0 >= len(data):
            return []
        # terminator: first safe newline at/after s_max (spills past
        # the chunk end for boundary-spanning tail records)
        term_rel = None
        after = safe[safe >= s_max]
        if after.size:
            term_rel = int(after[0])
        buf = [data]
        total = len(data)
        while term_rel is None:
            block = f.read(BLOCK)
            if not block:
                term_rel = total  # EOF terminates the tail record
                break
            more, exit_parity = _find_safe_newlines(block, exit_parity,
                                                    quotechar)
            if more.size:
                term_rel = total + int(more[0])
            buf.append(block)
            total += len(block)
        blob = b"".join(buf)[rs0:term_rel]
    text = blob.decode(encoding, "replace")
    rows = list(_csv.reader(io.StringIO(text), delimiter=delimiter,
                            quotechar=quotechar))
    return [r for r in rows if r]


def _plan_file_wave(path: str, delim: str, quotechar: str, enc: str,
                    target_chunk_bytes: int):
    """Distributed planning: raw byte cuts + a Ray scan wave + the
    driver chain.  Driver reads only the header line."""
    import ray

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        header_end = len(f.readline())

    cuts = list(range(header_end, size, target_chunk_bytes)) + [size]
    spans = [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]
    if not spans:
        return [], [], [], []

    @ray.remote(num_cpus=1)
    def scan(p: str, s: int, e: int, qc: str) -> dict:
        with open(p, "rb") as fh:
            fh.seek(s)
            return _scan_chunk_stats(fh.read(e - s), qc)

    stats = ray.get([scan.remote(path, s, e, quotechar)
                     for s, e in spans])
    parities, counts, begin_flags = _chain_chunk_stats(stats)
    return spans, parities, counts, begin_flags


def _read_chunk_rows(path: str, start: int, end: int, delimiter: str,
                     quotechar: str, encoding: str) -> list[list[str]]:
    """Parse one chunk to rows.  start == -1 means "whole file in text
    mode, skipping the header" (multi-byte encodings).  Blank lines are
    dropped — ``csv.DictReader`` (the reference's reader) skips them."""
    if start == -1:
        with open(path, "r", encoding=encoding, errors="replace",
                  newline="") as f:
            rows = list(_csv.reader(f, delimiter=delimiter,
                                    quotechar=quotechar))[1:]
    else:
        with open(path, "rb") as f:
            f.seek(start)
            data = f.read(end - start)
        text = data.decode(encoding, "replace")
        rows = list(_csv.reader(io.StringIO(text), delimiter=delimiter,
                                quotechar=quotechar))
    return [r for r in rows if r]


_MULTIBYTE_ENCODINGS = ("utf-16", "utf-16-le", "utf-16-be",
                        "utf-32", "utf-32-le", "utf-32-be")


def _plan_file(path: str, delimiter: str | None, quotechar: str,
               encoding: str | None, target_chunk_bytes: int):
    """Per-file planning: dialect detection + chunk cuts + row counts
    (one driver byte pass — see ``_plan_chunks``)."""
    enc = encoding or detect_encoding(path)
    delim = delimiter or sniff_delimiter(path, enc)
    header = read_header(path, delim, quotechar, enc)
    if enc.lower().replace("_", "-") in _MULTIBYTE_ENCODINGS:
        # multi-byte code units: 0x0A bytes are NOT newlines, so byte
        # chunking would shear code units.  Single whole-file task
        # (the reference's reader is single-stream anyway); the count
        # needs a text-mode parse, but only of this degenerate path.
        chunks = [(-1, os.path.getsize(path))]
        counts = [len(_read_chunk_rows(path, -1, chunks[0][1], delim,
                                       quotechar, enc))]
    else:
        chunks, counts = _plan_chunks(path, target_chunk_bytes, quotechar)
    return header, delim, enc, chunks, counts


def read_csv_with_row_ids(
    path: str | list[str],
    *,
    delimiter: str | None = None,
    quotechar: str = '"',
    encoding: str | None = None,
    target_chunk_bytes: int = 16 << 20,
    planner: str = "auto",
    driver_scan_max_bytes: int = 256 << 20,
):
    """CSV file(s) → ONE Dataset of all-string columns + deterministic
    global ``_row`` (file order × in-file order — a multi-file glob
    converts as a single job with one unified row space).  Chunk cuts
    are quote-parity-aware, so quoted fields may contain newlines — a
    cut never lands inside a quoted field.  All files must share the
    header; dialect/encoding are detected per file unless given.

    ``planner``: ``"driver"`` = exact single-pass driver byte scan
    (record-boundary cuts + counts); ``"wave"`` = distributed
    speculative scan (raw byte cuts, a Ray task wave computes per-chunk
    stats under both quote parities, the driver chains O(1) scalars per
    chunk — the TB-scale path); ``"auto"`` = driver below
    ``driver_scan_max_bytes`` per file, wave above (the driver scan
    runs ~400 MB/s, so 256 MB ≈ a sub-second driver stall; the wave
    pays one extra distributed pass and wins only when the driver
    pass itself is the bottleneck)."""
    import ray.data
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    files = list(path) if isinstance(path, (list, tuple)) else [path]
    if not files:
        raise ValueError("no input CSV files")
    header: list[str] | None = None
    # (path, start, end, delim, enc, row_start, n_rows, mode, parity,
    #  starts_at_begin)
    task_specs = []
    row_base = 0
    total_bytes = 0
    for p in files:
        enc = encoding or detect_encoding(p)
        delim = delimiter or sniff_delimiter(p, enc)
        hdr = read_header(p, delim, quotechar, enc)
        multibyte = enc.lower().replace("_", "-") in _MULTIBYTE_ENCODINGS
        use_wave = (
            not multibyte
            and (planner == "wave"
                 or (planner == "auto"
                     and os.path.getsize(p) > driver_scan_max_bytes))
        )
        if header is None:
            header = hdr
        elif hdr != header:
            raise ValueError(
                f"{p} header {hdr} does not match the job header "
                f"{header} — a multi-file CSV job needs identical "
                "headers (convert per-file otherwise)"
            )
        off = row_base
        if use_wave:
            spans, parities, counts, begin_flags = _plan_file_wave(
                p, delim, quotechar, enc, target_chunk_bytes
            )
            for (s, e), par, n, bf in zip(spans, parities, counts,
                                          begin_flags):
                task_specs.append((p, s, e, delim, enc, off, n,
                                   "wave", par, bf))
                off += n
        else:
            _, delim, enc, chunks, counts = _plan_file(
                p, delim, quotechar, enc, target_chunk_bytes
            )
            for (s, e), n in zip(chunks, counts):
                task_specs.append((p, s, e, delim, enc, off, n,
                                   "driver", 0, True))
                off += n
        row_base = off
        total_bytes += os.path.getsize(p)

    hdr_final = header or []

    def make_read(fpath: str, start: int, end: int, delim: str, enc: str,
                  row_start: int, mode: str, parity: int,
                  starts_at_begin: bool):
        def read() -> list[pa.Table]:
            if mode == "wave":
                rows = _read_chunk_rows_wave(
                    fpath, start, end, parity, starts_at_begin, delim,
                    quotechar, enc,
                )
            else:
                rows = _read_chunk_rows(fpath, start, end, delim,
                                        quotechar, enc)
            cols: dict[str, list[str]] = {h: [] for h in hdr_final}
            for r in rows:
                for j, h in enumerate(hdr_final):
                    cols[h].append(r[j] if j < len(r) else "")
            arrays = [pa.array(cols[h], type=pa.string())
                      for h in hdr_final]
            t = pa.Table.from_arrays(arrays, names=hdr_final)
            return [
                t.append_column(
                    "_row",
                    pa.array(np.arange(row_start, row_start + t.num_rows,
                                       dtype=np.int64)),
                )
            ]

        return read

    class _CsvSource(Datasource):
        def get_name(self):
            return "RowIdCsv"

        def estimate_inmemory_data_size(self):
            return total_bytes * 2

        def get_read_tasks(self, parallelism: int):
            tasks = []
            for (fpath, s, e, delim, enc, off, n, mode, par,
                 bf) in task_specs:
                meta = BlockMetadata(num_rows=n, size_bytes=(e - s) * 2,
                                     exec_stats=None, input_files=[fpath])
                tasks.append(
                    ReadTask(
                        make_read(fpath, s, e, delim, enc, off, mode,
                                  par, bf),
                        meta,
                    )
                )
            return tasks

    return ray.data.read_datasource(_CsvSource())


def convert_csv(
    csv_path: str | list[str],
    rule_doc,
    out_dir: str | None = None,
    *,
    config=None,
):
    """The reference's ``cow_tool convert`` path: CSV(s) + one rule
    document → triple store.  A list of files converts as ONE job with
    a unified global ``_row`` space (file order × in-file order).
    Dialect comes from the rule doc when present (reference
    ``csvw.py:263-271``)."""
    from ..pipelines.convert import ConvertConfig
    from ..rules import RuleDoc, parse_rules
    from ..triples import EmitTriples

    doc = rule_doc if isinstance(rule_doc, RuleDoc) else parse_rules(rule_doc)
    dialect = getattr(doc, "dialect", None) or {}
    ds = read_csv_with_row_ids(
        csv_path,
        delimiter=dialect.get("delimiter"),
        quotechar=dialect.get("quoteChar", '"'),
        encoding=dialect.get("encoding"),
    )
    cfg = config or ConvertConfig()
    triples = ds.map_batches(
        EmitTriples(doc, error_markers=out_dir is not None),
        batch_format="pyarrow", batch_size=cfg.batch_size,
    )
    if out_dir is None:
        return triples, None
    from ..nanopub import Nanopub, job_hash
    from ..stages.materialize import materialize_triples

    file_list = (list(csv_path) if isinstance(csv_path, (list, tuple))
                 else [csv_path])
    jh = job_hash(doc.doc_hash, file_list)
    np_ = Nanopub(doc.base, doc.dataset_name, jh)
    if cfg.append:
        from ..stages.materialize import append_triples, read_triple_store

        manifests = append_triples(triples, out_dir, dedup=cfg.dedup,
                                   input_desc=";".join(file_list))
        return read_triple_store(out_dir), manifests
    manifests = materialize_triples(
        triples, out_dir, num_parts=cfg.num_parts, job=jh, nanopub=np_,
        resume=cfg.resume, dedup=cfg.dedup, input_desc=";".join(file_list),
    )
    # returned Dataset: real triples only (markers are store-internal)
    import pyarrow.compute as pc

    from ..triples import MARKER_KIND

    def strip_markers(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(
                pc.fill_null(pc.equal(batch["obj_kind"], MARKER_KIND), False)
            )
        )

    return triples.map_batches(strip_markers, batch_format="pyarrow"), \
        manifests
