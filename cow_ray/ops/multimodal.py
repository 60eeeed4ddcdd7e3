"""Multimodal column plumbing: images / audio / video as opaque
``binary`` columns with typed metadata.

The container has no entropy-coded codecs (no PIL/ffmpeg).  Round 4:
self-describing uncompressed formats (BMP, PPM, WAV) decode through
REAL pure-numpy codecs (:mod:`cow_ray.ops.codecs`), dispatched by
magic bytes; JPEG/PNG/MP3-class payloads remain **stubs by contract**
(BASELINE instructions) behind the deterministic fake codec /
``FakeCodecError``.  The Ray-side plumbing — schemas, actor-pool
signatures, batch sizing, output layout — is identical on both paths;
swapping in PIL/ffmpeg is a one-method change (``_decode_impl``).

Conventions:

* media column: ``binary`` payload + sibling metadata columns
  (``media_type``, ``width``/``height`` or ``sample_rate``/...).
* decode stages are **actor pools** (codecs have warm state) with
  *small* batch sizes — payload bytes are wide; set
  ``batch_size ≈ target_batch_bytes / avg_payload`` and keep
  ``DataContext.target_max_block_size`` at its default so Ray splits
  blocks sanely.
* features come out as fixed-length ``list<float>`` columns that feed
  straight into ``ops.similarity``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "image/png", "audio/wav", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class FakeCodecError(NotImplementedError):
    pass


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: expands payload bytes into an
    (h, w, 3) uint8 array by seeded tiling.  Real systems replace this
    with PIL/turbojpeg; everything around it stays identical."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool UDF: payload → decoded pixels → mean-pool feature
    vector (``list<float>``, length 3*grid*grid) + decoded
    ``dec_width``/``dec_height`` columns.

    Decode path (round-4): payloads whose magic bytes identify a
    self-describing uncompressed format (BMP, PPM) go through the REAL
    pure-numpy codecs in :mod:`cow_ray.ops.codecs` — no PIL needed.
    Anything else falls back to the deterministic fake codec when
    ``use_fake_codec`` is on, and raises the documented
    ``FakeCodecError`` otherwise (JPEG/PNG need entropy coders this
    environment doesn't ship)."""

    def __init__(self, grid: int = 4, use_fake_codec: bool = True,
                 payload_col: str = "payload"):
        self.grid = grid
        self.use_fake_codec = use_fake_codec
        self.payload_col = payload_col

    def _decode_impl(self, payload: bytes, width: int, height: int) -> np.ndarray:
        from .codecs import decode_bmp, decode_ppm, sniff_media

        kind = sniff_media(payload or b"")
        if kind == "bmp":
            return decode_bmp(payload)
        if kind == "ppm":
            return decode_ppm(payload)
        if self.use_fake_codec:
            return _fake_decode_image(payload, width, height)
        raise FakeCodecError(
            "payload is not BMP/PPM and no entropy-coded image codec "
            "exists in this environment; construct with "
            "use_fake_codec=True or plug a real decoder into _decode_impl"
        )

    def _features(self, img: np.ndarray) -> np.ndarray:
        g = self.grid
        h, w, _ = img.shape
        ys = np.linspace(0, h, g + 1, dtype=int)
        xs = np.linspace(0, w, g + 1, dtype=int)
        out = np.empty((g, g, 3), dtype=np.float64)
        for i in range(g):
            for j in range(g):
                cell = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                out[i, j] = cell.mean(axis=(0, 1)) if cell.size else 0.0
        return (out / 255.0).reshape(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, dw, dh = [], [], []
        for payload, w, h in zip(
            batch[self.payload_col].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = self._decode_impl(payload, w, h)
            feats.append(self._features(img).tolist())
            dh.append(img.shape[0])
            dw.append(img.shape[1])
        batch = batch.drop_columns([self.payload_col])  # bytes stop here
        return (
            batch.append_column(
                "features", pa.array(feats, type=pa.list_(pa.float64()))
            )
            .append_column("dec_width", pa.array(dw, type=pa.int32()))
            .append_column("dec_height", pa.array(dh, type=pa.int32()))
        )


class SampleFrames:
    """Actor-pool UDF for video-shaped media: emits one row per sampled
    frame index (flat-map), payload decoding stubbed like DecodeImage."""

    def __init__(self, every_n: int = 10, frames_col: str = "n_frames",
                 id_col: str = "media_id"):
        self.every_n = every_n
        self.frames_col = frames_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, n in zip(batch[self.id_col].to_pylist(),
                          batch[self.frames_col].to_pylist()):
            for f in range(0, int(n or 0), self.every_n):
                ids.append(mid)
                frames.append(f)
        return pa.table(
            {self.id_col: pa.array(ids, type=pa.int64()),
             "frame_index": pa.array(frames, type=pa.int64())}
        )


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "audio/wav", ...
        ("payload", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
    ]
)


_BAND_CAP_HZ = 8000.0  # fixed absolute band range → features are
# comparable ACROSS sample rates (the similarity contract)


def spectral_features(pcm: np.ndarray, sample_rate: int,
                      n_bands: int = 8, frame: int = 512) -> np.ndarray:
    """REAL audio feature math (numpy FFT — no codec needed): Hann-
    windowed frames → power spectrum → log energies in ``n_bands``
    linear bands over the FIXED 0–8 kHz range (mapped to bins via the
    sample rate, so the same tone lands in the same band at 8 kHz and
    48 kHz), mean-pooled over frames.  Pure function so it is testable
    with synthesized tones; the only stubbed piece of the audio path
    is the bytes→PCM codec."""
    if len(pcm) < frame:
        pcm = np.pad(pcm, (0, frame - len(pcm)))
    n_frames = len(pcm) // frame
    x = pcm[: n_frames * frame].reshape(n_frames, frame)
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(x * win, axis=1)) ** 2
    bin_hz = np.arange(spec.shape[1]) * (sample_rate / frame)
    hz_edges = np.linspace(0.0, _BAND_CAP_HZ, n_bands + 1)
    edges = np.searchsorted(bin_hz, hz_edges)
    bands = np.stack(
        [spec[:, lo:hi].sum(axis=1) for lo, hi in zip(edges, edges[1:])],
        axis=1,
    )
    return np.log1p(bands).mean(axis=0)


def _fake_decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in codec: payload bytes → seeded float PCM
    in [-1, 1].  Real systems replace this with soundfile/ffmpeg."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=n_samples)


class DecodeAudio:
    """Actor-pool UDF: audio payload → PCM (stubbed codec) → REAL
    spectral band-energy features (``list<float>``, length
    ``n_bands``).  Same conventions as DecodeImage: payload bytes are
    dropped after decode; run with small batch sizes (payloads are
    wide)."""

    def __init__(self, n_bands: int = 8, use_fake_codec: bool = True,
                 payload_col: str = "payload"):
        self.n_bands = n_bands
        self.use_fake_codec = use_fake_codec
        self.payload_col = payload_col

    def _decode_impl(self, payload: bytes,
                     n_samples: int) -> tuple[np.ndarray, int | None]:
        """→ (pcm, sample_rate_from_payload_or_None).  RIFF/WAVE
        payloads decode through the REAL pure-numpy codec (round-4,
        :mod:`cow_ray.ops.codecs`); everything else uses the fake
        codec (metadata sample rate) or raises the documented error."""
        from .codecs import decode_wav, sniff_media

        if sniff_media(payload or b"") == "wav":
            pcm, rate = decode_wav(payload)
            return pcm, rate
        if self.use_fake_codec:
            return _fake_decode_audio(payload, n_samples), None
        raise FakeCodecError(
            "payload is not WAV and no compressed-audio codec exists "
            "in this environment; subclass DecodeAudio and override "
            "_decode_impl with soundfile/ffmpeg"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, dec_sr, dec_dur = [], [], []
        for payload, sr, n in zip(
            batch[self.payload_col].to_pylist(),
            batch["sample_rate"].to_pylist(),
            batch["n_samples"].to_pylist(),
        ):
            pcm, rate = self._decode_impl(payload, int(n or 0))
            rate = int(rate or sr or 16000)
            feats.append(
                spectral_features(pcm, rate, self.n_bands).tolist()
            )
            dec_sr.append(rate)
            dec_dur.append(len(pcm) / rate if rate else 0.0)
        batch = batch.drop_columns([self.payload_col])  # bytes stop here
        return (
            batch.append_column(
                "features", pa.array(feats, type=pa.list_(pa.float64()))
            )
            .append_column("dec_sample_rate", pa.array(dec_sr,
                                                       type=pa.int32()))
            .append_column("dec_duration_s", pa.array(dec_dur,
                                                      type=pa.float64()))
        )


def make_fake_audio_table(n: int, seed: int = 4) -> pa.Table:
    """Deterministic audio fixture (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        n_samples = int(rng.integers(1024, 8192))
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append(
            {"media_id": i, "media_type": "audio/fake", "payload": payload,
             "sample_rate": 16000, "n_samples": n_samples}
        )
    return pa.Table.from_pylist(rows, schema=AUDIO_SCHEMA)


def make_fake_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic media fixture (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(8, 32))
        h = int(rng.integers(8, 32))
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append(
            {"media_id": i, "media_type": "image/fake", "payload": payload,
             "width": w, "height": h}
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
