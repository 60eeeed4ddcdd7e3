"""The numpy MD5 kernel must be bit-identical to hashlib (and thus to
DuckDB's md5()) — every content-addressed decision rides on it."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from cow_ray.ops.md5np import md5_first_byte, md5_hex


BOUNDARY_LENGTHS = [0, 1, 54, 55, 56, 57, 63, 64, 65, 118, 119, 120,
                    121, 127, 128, 200]


def ref_hex(vals):
    return [hashlib.md5(v).hexdigest() for v in vals]


def test_padding_boundaries_match_hashlib():
    vals = [b"x" * n for n in BOUNDARY_LENGTHS]
    assert list(md5_hex(vals)) == ref_hex(vals)


def test_fuzzed_lengths_match_hashlib():
    rng = np.random.default_rng(7)
    vals = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8))
            for n in rng.integers(0, 300, size=200)]
    assert list(md5_hex(vals)) == ref_hex(vals)


def test_arrow_string_input_utf8():
    texts = ["", "a", "héllo wörld", "漢字テスト", "x" * 77, "doc-00042"]
    arr = pa.array(texts, type=pa.string())
    assert list(md5_hex(arr)) == ref_hex([t.encode("utf-8")
                                          for t in texts])


def test_arrow_int_cast_matches_str():
    arr = pa.chunked_array([pa.array([0, 7, 123456789], type=pa.int64()),
                            pa.array([42], type=pa.int64())])
    assert list(md5_hex(arr)) == ref_hex([b"0", b"7", b"123456789",
                                          b"42"])


def test_sliced_arrow_array_offset_honored():
    arr = pa.array(["aaa", "bbb", "ccc", "ddd"]).slice(1, 2)
    assert list(md5_hex(arr)) == ref_hex([b"bbb", b"ccc"])


def test_first_byte_is_hex_prefix():
    vals = [str(i).encode() for i in range(64)]
    got = md5_first_byte(vals)
    want = [int(hashlib.md5(v).hexdigest()[:2], 16) for v in vals]
    assert got.tolist() == want


def test_null_arrow_input_raises():
    with pytest.raises(ValueError, match="null"):
        md5_hex(pa.array(["a", None]))


def test_large_string_native_offsets():
    """large_string hashes through its own int64 offsets — never
    down-cast to 32-bit string offsets (a >2 GiB batch would
    overflow the cast; review finding)."""
    texts = ["", "a", "héllo wörld", "x" * 150, "doc-00042"]
    arr = pa.array(texts, type=pa.large_string())
    assert list(md5_hex(arr)) == ref_hex([t.encode("utf-8")
                                          for t in texts])
    # sliced large_string honors its offset too
    sl = pa.array(["aaa", "bbb", "ccc"], type=pa.large_string()).slice(1)
    assert list(md5_hex(sl)) == ref_hex([b"bbb", b"ccc"])


def test_float_key_refused():
    """Arrow renders 3.0 as '3' where DuckDB CAST and str() give
    '3.0' — a silent cross-engine divergence, so non-integer
    non-string keys are refused (review finding)."""
    with pytest.raises(TypeError, match="pre-format"):
        md5_hex(pa.array([3.0, 1.5], type=pa.float64()))
    with pytest.raises(TypeError, match="pre-format"):
        md5_hex(pa.array([True, False]))
