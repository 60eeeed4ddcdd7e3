"""Pure-numpy media codecs for the self-describing uncompressed
formats (BMP, PPM, WAV) — no PIL/ffmpeg dependency, so the multimodal
decode stages exercise a REAL bytes→pixels/PCM path in this
environment.  Formats with entropy coding (JPEG/PNG/MP3/...) stay
behind the documented fake-codec contract
(:mod:`cow_ray.ops.multimodal`).

Format references are the public specifications:
* BMP — Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout
  (uncompressed BI_RGB, 8/24/32 bpp, bottom-up or top-down);
* PPM — netpbm P6 (binary) and P3 (ASCII), maxval ≤ 255,
  ``#`` comments;
* WAV — RIFF/WAVE chunks, PCM (format 1: 8/16/32-bit int) and
  IEEE float (format 3), any channel count (downmixed by mean).

Encoders exist so tests can round-trip without fixtures on disk.
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Malformed or unsupported media payload (named, so pipelines can
    route decode failures to an error column instead of dying)."""


# --------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB.  Supports uncompressed BI_RGB
    8-bit (palette), 24-bit and 32-bit, bottom-up (height > 0) and
    top-down (height < 0) row order."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise CodecError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise CodecError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise CodecError(f"compressed BMP (type {compression}) unsupported")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise CodecError("degenerate BMP dimensions")
    row_bytes = (width * bpp // 8 + 3) & ~3
    need = data_off + row_bytes * height
    if len(payload) < need:
        raise CodecError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)
    if bpp == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        img = px[:, :, ::-1]  # BGR → RGB
    elif bpp == 32:
        px = rows[:, : width * 4].reshape(height, width, 4)
        img = px[:, :, 2::-1]  # BGRA → RGB
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRX → RGB
        img = pal[rows[:, :width]]
    else:
        raise CodecError(f"unsupported BMP bit depth {bpp}")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    h, w, c = img.shape
    if c != 3:
        raise CodecError("encode_bmp wants (h, w, 3)")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    pix = rows.tobytes()
    data_off = 54
    file_size = data_off + len(pix)
    hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return hdr + info + pix


# --------------------------------------------------------------- PPM


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset just past the
    single whitespace that ends the last token)."""
    toks: list[int] = []
    i = 2  # past magic
    cur = b""
    while i < len(payload) and len(toks) < n:
        ch = payload[i:i + 1]
        if ch == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
        elif ch.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
                if len(toks) == n:
                    i += 1
                    return toks, i
        else:
            if not ch.isdigit():
                raise CodecError(f"bad PPM header byte {ch!r}")
            cur += ch
        i += 1
    if cur and len(toks) < n:
        toks.append(int(cur))
    if len(toks) < n:
        raise CodecError("truncated PPM header")
    return toks, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM bytes (P6 binary or P3 ASCII, maxval ≤ 255) → (h, w, 3)
    uint8 RGB."""
    magic = payload[:2]
    if magic not in (b"P6", b"P3"):
        raise CodecError("not a PPM payload")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval > 255 or maxval <= 0 or w <= 0 or h <= 0:
        raise CodecError(f"unsupported PPM geometry {w}x{h} maxval={maxval}")
    n = w * h * 3
    if magic == b"P6":
        if len(payload) < off + n:
            raise CodecError("truncated PPM pixel data")
        img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
    else:
        vals = payload[off - 1:].split()
        if len(vals) < n:
            raise CodecError("truncated P3 pixel data")
        img = np.array([int(v) for v in vals[:n]], dtype=np.uint8)
    if maxval != 255:
        img = (img.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    return img.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    if c != 3:
        raise CodecError("encode_ppm wants (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


# --------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 PCM in [-1, 1], sample_rate).
    PCM 8/16/32-bit int (format 1) and 32/64-bit IEEE float (format
    3); multi-channel downmixed by mean."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise CodecError("not a WAV payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise CodecError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise CodecError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if channels <= 0:
        raise CodecError("zero channels")
    if audio_fmt == 1:
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise CodecError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise CodecError(f"unsupported float bit depth {bits}")
    else:
        raise CodecError(f"unsupported WAV format {audio_fmt}")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x, rate


def encode_wav(pcm: np.ndarray, sample_rate: int,
               channels: int = 1) -> bytes:
    """float PCM in [-1, 1] (1-D, or (n, channels)) → 16-bit PCM WAV."""
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1 and channels > 1:
        x = np.repeat(x[:, None], channels, axis=1)
    elif x.ndim == 2:
        channels = x.shape[1]
    q = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    data = q.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def sniff_media(payload: bytes) -> str | None:
    """Magic-byte dispatch: which real codec (if any) can decode this
    payload."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P6", b"P3"):
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None
