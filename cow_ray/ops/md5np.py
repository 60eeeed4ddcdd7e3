"""Vectorized MD5 (RFC 1321) over a batch of strings, in numpy.

The md5-of-string digest is a cross-engine CONTRACT in this repo —
DuckDB's ``md5()`` must reproduce every content-addressed decision
(sample membership, split assignment, stratified rank, doc
fingerprints) bit-for-bit — so the hash *function* cannot change.
What can change is the execution shape: ``hashlib.md5`` per row costs
~1 µs of interpreter round-trip per value, which dominates the actual
hashing for short keys (a split bucket hashes a ~10-byte id).  This
kernel runs the 64 MD5 steps once per 64-byte block with every message
of the batch in a numpy lane: a batch of N single-block keys costs 64
vector ops total instead of N Python calls.  Mixed lengths stay dense
by grouping messages on padded block count.

Input is a pyarrow string array (its UTF-8 data buffer is consumed
directly — no per-row Python string is ever created) or a list of
``bytes``.  Verified bit-identical to ``hashlib.md5`` across the
padding boundaries (0, 55, 56, 63, 64, 119, 120 bytes) and on fuzzed
lengths in tests/test_md5np.py.

Algorithm constants and structure follow the public RFC 1321 spec.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# per-step left-rotate amounts (RFC 1321 §3.4)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
# sine-derived additive constants
_K = np.array(
    [int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
# message-word schedule per step
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


# lanes per tile: 6 live uint32 arrays × 32 KB stay inside L2, so the
# 64-step loop streams from cache instead of DRAM (untiled, the same
# loop over 200k lanes is 2× slower than the hashlib-per-row baseline
# it is meant to beat)
_TILE = 8192


def _md5_tile(blocks: np.ndarray) -> np.ndarray:
    """MD5 over one lane tile: blocks (n, nblocks, 16) uint32 already
    padded (little-endian words) → (n, 16) uint8 digests.  Every step
    is an in-place numpy op over the n lanes; the 6 working arrays
    rotate (the retiring state array becomes the next step's scratch)
    so the inner loop allocates nothing."""
    n, nblocks, _ = blocks.shape
    # (nblocks, 16, n): x[g] is one contiguous row per schedule word
    xs = np.ascontiguousarray(blocks.transpose(1, 2, 0))
    a0 = np.full(n, 0x67452301, dtype=np.uint32)
    b0 = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c0 = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d0 = np.full(n, 0x10325476, dtype=np.uint32)
    f = np.empty(n, dtype=np.uint32)
    t = np.empty(n, dtype=np.uint32)
    for blk in range(nblocks):
        x = xs[blk]
        a, b, c, d = a0.copy(), b0.copy(), c0.copy(), d0.copy()
        for i in range(64):
            if i < 16:  # (b & c) | (~b & d) == d ^ (b & (c ^ d))
                np.bitwise_xor(c, d, out=f)
                np.bitwise_and(f, b, out=f)
                np.bitwise_xor(f, d, out=f)
            elif i < 32:  # (d & b) | (~d & c) == c ^ (d & (b ^ c))
                np.bitwise_xor(b, c, out=f)
                np.bitwise_and(f, d, out=f)
                np.bitwise_xor(f, c, out=f)
            elif i < 48:
                np.bitwise_xor(b, c, out=f)
                np.bitwise_xor(f, d, out=f)
            else:  # c ^ (b | ~d)
                np.bitwise_not(d, out=f)
                np.bitwise_or(f, b, out=f)
                np.bitwise_xor(f, c, out=f)
            f += a
            f += _K[i]
            f += x[_G[i]]
            s = int(_S[i])
            np.left_shift(f, s, out=t)
            np.right_shift(f, 32 - s, out=f)
            np.bitwise_or(t, f, out=t)
            t += b
            # new state (a,b,c,d) = (d, t, b, c); retired a -> scratch
            a, b, c, d, t = d, t, b, c, a
        a0 += a
        b0 += b
        c0 += c
        d0 += d
    out = np.empty((n, 16), dtype=np.uint8)
    out[:, 0:4] = a0.view(np.uint8).reshape(n, 4)
    out[:, 4:8] = b0.view(np.uint8).reshape(n, 4)
    out[:, 8:12] = c0.view(np.uint8).reshape(n, 4)
    out[:, 12:16] = d0.view(np.uint8).reshape(n, 4)
    return out


def _digests_from_buffers(data: np.ndarray, offsets: np.ndarray
                          ) -> np.ndarray:
    """(n,16) uint8 digests for n messages stored back-to-back in
    ``data`` with int offsets (len n+1).

    Both the padded-message packing (a vectorized repeat/cumsum
    scatter — a per-row copy loop costs more than the hash itself) and
    the lane kernel run per ≤``_TILE``-lane tile so every temporary
    stays a few MB and the allocator recycles it across tiles: this
    box (and any busy multi-tenant node) makes first-touch page faults
    on fresh multi-10-MB arrays cost ~1 s each (same pathology the
    round-2 minhash kernel hit; same fix)."""
    n = len(offsets) - 1
    if n == 0:
        return np.empty((0, 16), dtype=np.uint8)
    lens = offsets[1:] - offsets[:-1]
    nblocks = (lens + 8) // 64 + 1  # 1 pad byte + 8 length bytes fit
    out = np.empty((n, 16), dtype=np.uint8)
    # multi-block messages go to OpenSSL: its per-block C loop beats
    # numpy lanes once each message carries ≥2 blocks (measured 2.5×
    # at 2 blocks, 7× at 7) — the lane kernel's win is short keys,
    # where the per-row interpreter round-trip dominates the hash
    long_idx = np.flatnonzero(nblocks > 1)
    if len(long_idx):
        import hashlib

        mv = memoryview(data)
        for j in long_idx:
            out[j] = np.frombuffer(
                hashlib.md5(mv[int(offsets[j]):int(offsets[j + 1])]
                            ).digest(), dtype=np.uint8)
    # everything left is exactly one padded block (the OpenSSL routing
    # above took nblocks > 1), so the lane kernel runs one fixed
    # 64-byte stride per message
    idx = np.flatnonzero(nblocks == 1)
    stride = 64
    buf = None
    for s in range(0, len(idx), _TILE):
        sub = idx[s:s + _TILE]
        m = len(sub)
        if buf is None or buf.shape[0] != m:
            buf = np.zeros((m, stride), dtype=np.uint8)
        else:
            buf[:] = 0
        lens_g = lens[sub]
        total = int(lens_g.sum())
        if total:
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(lens_g) - lens_g, lens_g)
            tgt = np.repeat(
                np.arange(m, dtype=np.int64) * stride, lens_g
            ) + within
            src = np.repeat(offsets[sub], lens_g) + within
            buf.ravel()[tgt] = data[src]
        buf[np.arange(m), lens_g] = 0x80
        bitlen = (lens_g.astype(np.uint64) * 8).astype("<u8")
        buf[:, -8:] = bitlen.view(np.uint8).reshape(-1, 8)
        out[sub] = _md5_tile(buf.view("<u4").reshape(m, 1, 16))
    return out


def _as_buffers(values) -> tuple[np.ndarray, np.ndarray]:
    """Normalize input (pa.Array/ChunkedArray of strings, or list of
    bytes) to (data, offsets).  Arrow nulls must be handled by the
    caller (fill or raise) — this layer treats every slot as a
    message."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(
            values, pa.ChunkedArray) else values
        if not (pa.types.is_string(arr.type)
                or pa.types.is_large_string(arr.type)):
            # only integer keys cast losslessly to the same text both
            # engines render ("3") — Arrow prints float 3.0 as "3"
            # where DuckDB CAST(3.0 AS VARCHAR) and str() give "3.0",
            # silently changing every content-addressed decision
            if not pa.types.is_integer(arr.type):
                raise TypeError(
                    f"md5np: key column of type {arr.type} — only "
                    "string and integer keys render identically in "
                    "Arrow and DuckDB; pre-format the column to "
                    "string explicitly to define the contract")
            arr = pc.cast(arr, pa.string())
        if arr.null_count:
            raise ValueError("md5np: null values reached the hash "
                             "kernel — fill or filter nulls first")
        # slice-safety: honor the array's offset into its buffers;
        # large_string carries int64 offsets natively (no down-cast —
        # a >2 GiB batch must not overflow 32-bit string offsets)
        otype = (np.int64 if pa.types.is_large_string(arr.type)
                 else np.int32)
        off = np.frombuffer(arr.buffers()[1], dtype=otype)[
            arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        return data, off
    lens = np.fromiter((len(v) for v in values), dtype=np.int64,
                       count=len(values))
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.empty(int(offsets[-1]), dtype=np.uint8)
    for i, v in enumerate(values):
        data[offsets[i]:offsets[i + 1]] = np.frombuffer(v, dtype=np.uint8)
    return data, offsets


def md5_digests(values) -> np.ndarray:
    """(n, 16) uint8 raw digests."""
    data, offsets = _as_buffers(values)
    return _digests_from_buffers(data, offsets)


def _hex_bytes(dig: np.ndarray) -> np.ndarray:
    hx = np.empty((dig.shape[0], 32), dtype=np.uint8)
    hx[:, 0::2] = _HEX[dig >> 4]
    hx[:, 1::2] = _HEX[dig & 0x0F]
    return hx


def md5_hex(values) -> np.ndarray:
    """Lowercase 32-char hex digests as a numpy ``U32`` array (matches
    ``hashlib.md5(v).hexdigest()`` / DuckDB ``md5()``)."""
    return _hex_bytes(md5_digests(values)).view("S32").ravel().astype(
        "U32")


def md5_hex_arrow(values) -> pa.Array:
    """Hex digests as a pyarrow string array, built zero-copy from the
    fixed-width hex byte matrix (every digest is exactly 32 ASCII
    bytes, so offsets are just ``arange * 32``) — no per-row Python
    string is ever created."""
    hx = _hex_bytes(md5_digests(values))
    n = hx.shape[0]
    offsets = np.arange(n + 1, dtype=np.int32) * 32
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(np.ascontiguousarray(hx).tobytes()))


def md5_first_byte(values) -> np.ndarray:
    """First digest byte (== the first two hex digits, 0..255) — the
    content-address bucket used by hash_split."""
    return md5_digests(values)[:, 0]
