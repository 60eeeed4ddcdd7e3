"""Soundex kernel: canonical NARA examples, fuzz vs an independent
per-string reference, and DuckDB-expression equivalence (the SQL
oracle for the soundex-blocked fuzzy join rides on it)."""

import duckdb
import numpy as np
import pyarrow as pa

from cow_ray.ops.phonetic import soundex_arrow, soundex_sql

CANON = {
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Lloyd": "L300", "Jackson": "J250",
    "Gutierrez": "G362", "VanDeusen": "V532", "Washington": "W252",
}


def ref_soundex(s: str) -> str:
    """Independent reference implementation (straight from the NARA
    prose rules)."""
    s = "".join(ch for ch in s.upper() if "A" <= ch <= "Z")
    if not s:
        return ""
    code = lambda ch: "01230129022455012623019202"[ord(ch) - 65]  # noqa: E731
    out = []
    prev = code(s[0])
    for ch in s[1:]:
        c = code(ch)
        if c == "9":  # H/W: transparent, previous code survives
            continue
        if c != "0" and c != prev:
            out.append(c)
        prev = c
    return s[0] + ("".join(out) + "000")[:3]


def test_canonical_examples():
    got = soundex_arrow(pa.array(list(CANON))).to_pylist()
    assert got == list(CANON.values())
    assert [ref_soundex(k) for k in CANON] == list(CANON.values())


def test_edge_inputs():
    vals = ["", None, "123", "a", "h", "w", "Ab-Cd", "ph", "AAAA"]
    got = soundex_arrow(pa.array(vals)).to_pylist()
    want = [ref_soundex(v or "") for v in vals]
    assert got == want
    assert got[0] == "" and got[1] == "" and got[2] == ""


def test_fuzz_vs_reference():
    rng = np.random.default_rng(5)
    alphabet = list("abcdefghijklmnopqrstuvwxyzHW'- ")
    vals = ["".join(rng.choice(alphabet, size=int(k)))
            for k in rng.integers(0, 14, size=500)]
    got = soundex_arrow(pa.array(vals)).to_pylist()
    assert got == [ref_soundex(v) for v in vals]


def test_sql_expression_matches_kernel():
    rng = np.random.default_rng(6)
    alphabet = list("abcdefghijklmnopqrstuvwxyz")
    vals = list(CANON) + ["".join(rng.choice(alphabet, size=int(k)))
                          for k in rng.integers(1, 12, size=300)]
    con = duckdb.connect()
    tbl = pa.table({"w": pa.array(vals)})  # noqa: F841 (duckdb scans it)
    want = [r[0] for r in con.execute(
        f"SELECT {soundex_sql('w')} FROM tbl").fetchall()]
    got = soundex_arrow(pa.array(vals)).to_pylist()
    assert got == want
