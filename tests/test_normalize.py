"""Unicode normalization + mojibake repair (cow_ray/ops/normalize.py).

Parity discipline: the normalize kernel's contract is codepoint
equality with DuckDB's ``nfc_normalize`` + RE2 ``regexp_replace``
chain (asserted here on adversarial strings, and end-to-end by the
``normalized_docs`` oracle in the gate)."""

import duckdb
import pyarrow as pa
import pytest

from cow_ray.ops.normalize import (
    _repair_one,
    _sloppy_cp1252_encode,
    fix_mojibake,
    fix_mojibake_batch,
    normalize_batch,
    normalize_text,
)

NASTY = [
    "plain ascii",
    "café composed?",          # NFD -> must compose to é
    "Å ring",             # A + combining ring -> Å
    "already é composed",
    "tabs\tand\nnewlines\r\nand  runs",
    "ctrl\x00\x07\x1f\x7fchars",
    " edge  space ",
    "",
    None,
    "mixed \x0b\x0c café́ \x01x",  # é + extra acute stays NFC-stable
]


def _oracle(texts):
    con = duckdb.connect()
    con.register("d", pa.table({"i": range(len(texts)), "text": texts}))
    sql = r"""SELECT trim(regexp_replace(nfc_normalize(
      regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '',
                     'g')), '\s+', ' ', 'g'), ' ') AS t
      FROM d ORDER BY i"""
    return [r[0] for r in con.sql(sql).fetchall()]


def test_normalize_batch_matches_duckdb_codepoint_exact():
    t = pa.table({"text": NASTY})
    got = normalize_batch(t)["norm_text"].to_pylist()
    assert got == _oracle(NASTY)


def test_normalize_batch_composes_nfc():
    t = pa.table({"text": ["café"]})
    out = normalize_batch(t)["norm_text"].to_pylist()[0]
    assert out == "café" and len(out) == 4


def test_normalize_steps_toggle():
    t = pa.table({"text": ["a\x07b  c"]})
    keep = normalize_batch(t, strip_controls=False, collapse_ws=False)
    assert keep["norm_text"].to_pylist() == ["a\x07b  c"]
    no_ws = normalize_batch(t, collapse_ws=False)
    assert no_ws["norm_text"].to_pylist() == ["ab  c"]


def test_sloppy_encode_latin1_fallback():
    # U+009D is unmapped in cp1252 -> latin-1 byte fallback
    assert _sloppy_cp1252_encode("\x9d") == b"\x9d"
    assert _sloppy_cp1252_encode("€") == b"\x80"  # cp1252 euro
    with pytest.raises(UnicodeEncodeError):
        _sloppy_cp1252_encode("中")  # not in cp1252 or latin-1


def _corrupt(s: str) -> str:
    """UTF-8 bytes mis-read as cp1252 (latin-1 for unmapped bytes)."""
    from cow_ray.ops.normalize import sloppy_cp1252_decode

    return sloppy_cp1252_decode(s.encode("utf-8"))


def test_repair_single_and_double_mojibake():
    good = "résumé — naïve ’quote’ 中?"
    good = good.replace("中?", "")  # keep repairable via cp1252
    bad1 = _corrupt(good)
    bad2 = _corrupt(bad1)
    assert _repair_one(bad1) == (good, 1)
    assert _repair_one(bad2) == (good, 2)


def test_repair_covers_marker_breadth():
    # cp1252 0x80-0x9F remap continuations (euro, trademark, curly
    # quote) and 2-byte leads beyond Ã (Cyrillic, Greek, CEE)
    for good in ("€100 fee", "Acme™ corp", "Привет мир", "καλημέρα",
                 "Dvořák čapek", "emoji 🙂 end"):
        bad = _corrupt(good)
        assert _repair_one(bad) == (good, 1), good


def test_repair_leaves_legit_text_alone():
    # 'Ã ' encodes to C3 20 which is invalid UTF-8 -> no repair
    s = "legit Ã tilde then text"
    assert _repair_one(s) == (s, 0)
    assert _repair_one("plain") == ("plain", 0)


def test_repair_pass_cap():
    good = "é"
    bad = good
    for _ in range(5):
        bad = _corrupt(bad)
    # deeper than the 3-pass cap: repaired partially, never worse
    out, n = _repair_one(bad)
    assert n == 3 and out == _corrupt(_corrupt("é"))


def test_fix_mojibake_batch_flags_and_nulls():
    good = "résumé — naïve"
    t = pa.table({"text": [good, _corrupt(good), "ascii", None]})
    out = fix_mojibake_batch(t)
    assert out["fixed_text"].to_pylist() == [good, good, "ascii", None]
    assert out["mojibake_fixed"].to_pylist() == [False, True, False,
                                                 False]


def test_dataset_wrappers(ray_session):
    import ray.data

    good = "résumé test"
    ds = ray.data.from_arrow(pa.table({
        "text": ["café  x", _corrupt(good)]}))
    norm = normalize_text(ds).take_all()
    assert norm[0]["norm_text"] == "café x"
    fixed = fix_mojibake(ds).take_all()
    assert fixed[1]["fixed_text"] == good and fixed[1]["mojibake_fixed"]


def test_mojibake_query_invariants(ray_session):
    from cow_ray.pipelines.queries import q_mojibake_docs

    rows = q_mojibake_docs("/root/testdata/sf0.001").take_all()
    planted = [r for r in rows if r["class"] == "planted"]
    clean = [r for r in rows if r["class"] == "clean"]
    assert planted and clean
    assert all(r["mojibake_fixed"] and r["recovered"] for r in planted)
    assert all(not r["mojibake_fixed"] and r["recovered"]
               for r in clean)


def test_normalize_parity_fuzz():
    """Randomized cross-engine parity: the Arrow normalize chain must
    equal the DuckDB nfc_normalize + regexp_replace chain on
    adversarial unicode (combining marks, controls, whitespace runs,
    astral chars)."""
    from hypothesis import given, settings, strategies as st

    piece = st.sampled_from(
        ["a", " ", "  ", "\t", "\n", "\x07", "\x00", "é",
         "é", "Å", "Å", "한", "🙂", " ", "ﬁ", "'",
         "‍", "ß", "—", "\x7f", "\x1f"])
    texts_st = st.lists(
        st.lists(piece, min_size=0, max_size=12).map("".join),
        min_size=1, max_size=24)

    @settings(max_examples=60, deadline=None)
    @given(texts_st)
    def run(texts):
        got = normalize_batch(
            pa.table({"text": texts}))["norm_text"].to_pylist()
        assert got == _oracle(texts)

    run()


class TestFoldKey:
    def test_folding(self, ray_session):
        import ray.data

        from cow_ray.ops.normalize import fold_keys

        rows = [
            {"doc_id": 0, "text": "Café  №42\tNaïve"},
            {"doc_id": 1, "text": "cafe  №00 naive"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": None},
        ]
        out = {r["doc_id"]: r["fold_key"] for r in fold_keys(
            ray.data.from_items(rows).repartition(2)).take_all()}
        assert out[0] == "cafe №00 naive"
        assert out[0] == out[1]  # fold-invariant duplicate detection
        assert out[2] == "" and out[3] == ""

    def test_feeds_exact_dedup(self, ray_session):
        """The CCNet use: exact dedup keyed on the folded text catches
        cosmetic variants."""
        import ray.data

        from cow_ray.ops.dedup import dedup_exact
        from cow_ray.ops.normalize import fold_keys

        rows = [
            {"doc_id": 0, "text": "Hello Wörld 1"},
            {"doc_id": 1, "text": "hello world 2"},   # fold-duplicate
            {"doc_id": 2, "text": "different text"},
        ]
        ds = fold_keys(ray.data.from_items(rows).repartition(2))
        kept = sorted(r["keep_id"] for r in dedup_exact(
            ds, key_col="fold_key", id_col="doc_id").take_all())
        assert kept == [0, 2]
